"""Denoiser backbones (Flax). Registry mirrors the reference's backbone
factory (reference: algorithms/dfot/diffusion/discrete_diffusion.py:64-92)."""

from .dit import DiT3D, DiTBase, DiTBlock, DiTSpec, FinalLayer
from . import embeddings

__all__ = ["DiT3D", "DiTBase", "DiTBlock", "DiTSpec", "FinalLayer", "embeddings"]
