"""VAE / tokenizer subsystem (reference: algorithms/vae/).

Families:
- ImageVAE: SD-style KL image autoencoder (per-frame latents),
- VideoVAE: causal chunk-wise 3D tokenizer (temporal factor 4),
- DC-AE: deep-compression autoencoder, torch-importable (frozen preprocessor),
- AutoencoderKL (diffusers-importable), TiTok-KL (1-D ViT tokenizer).
"""

from .autoencoder_kl import AutoencoderKL, KL_F8_CONFIG, import_diffusers_vae_params
from .dc_ae import DCAE, DCAEConfig, import_dc_ae_params
from .distribution import DiagonalGaussian
from .image_vae import Decoder, Encoder, ImageVAE, ImageVAEConfig
from .titok import TiTokConfig, TiTokKL, import_titok_params
from .losses import (
    LPIPS,
    import_lpips_params,
    NLayerDiscriminator,
    adopt_weight,
    calculate_adaptive_weight,
    decoder_last_kernel_path,
    hinge_d_loss,
    vae_discriminator_loss,
    vae_generator_loss,
    vanilla_d_loss,
)
from .stats import estimate_latent_stats
from .video_vae import VideoVAE, VideoVAEConfig
