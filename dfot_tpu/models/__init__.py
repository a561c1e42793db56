"""Denoiser backbones (Flax). Registry mirrors the reference's backbone
factory (reference: algorithms/dfot/diffusion/discrete_diffusion.py:64-92)."""

from . import embeddings
from .dit import DiT3D, DiTBase, DiTBlock, DiTSpec, FinalLayer
from .dit1d import DiT1D, DiT1DSpec
from .far import FARDiT, FARSpec
from .matrix import MatrixAttention, MatrixDiTBlock
from .unet3d import UNet3D, UNet3DSpec
from .uvit import UViT3D, UViT3DPose, UViTSpec

__all__ = [
    "DiT3D", "DiTBase", "DiTBlock", "DiTSpec", "FinalLayer",
    "DiT1D", "DiT1DSpec", "FARDiT", "FARSpec",
    "MatrixAttention", "MatrixDiTBlock",
    "UNet3D", "UNet3DSpec", "UViT3D", "UViT3DPose", "UViTSpec",
    "embeddings",
]
