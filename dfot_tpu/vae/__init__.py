"""VAE / tokenizer subsystem (reference: algorithms/vae/).

Families:
- ImageVAE: SD-style KL image autoencoder (per-frame latents),
- VideoVAE: causal chunk-wise 3D tokenizer (temporal factor 4),
- DC-AE / AutoencoderKL / TiTok wrappers: planned (weight-import shims).
"""

from .distribution import DiagonalGaussian
from .image_vae import Decoder, Encoder, ImageVAE, ImageVAEConfig
from .losses import (
    LPIPS,
    NLayerDiscriminator,
    adopt_weight,
    hinge_d_loss,
    vae_discriminator_loss,
    vae_generator_loss,
    vanilla_d_loss,
)
from .stats import estimate_latent_stats
from .video_vae import VideoVAE, VideoVAEConfig
