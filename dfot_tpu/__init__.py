"""dfot_tpu — a TPU-native (JAX/XLA/Pallas/pjit) framework for the
Diffusion Forcing Transformer (DFoT) video-diffusion stack.

Re-designed from scratch for TPU hardware with the same capabilities as the
reference implementation (`ktncktnc/diffusion-forcing-transformer`):

- Per-token (frame) independent noise levels throughout training & sampling.
- History Guidance: compositional classifier-free guidance over history
  subsets / frequency bands, executed as batched guidance branches inside a
  single jitted sampler scan.
- DiT3D / U-ViT3D (+pose) / U-Net3D / FAR-DiT / DiT1D / matrix-attention /
  difference-DiT denoiser backbones in Flax, with Pallas flash-attention.
- Keyframe-prediction -> interpolation long-rollout scheduler.
- Data-parallel + FSDP sharding via jax.sharding.Mesh / NamedSharding.

Layout:
    config        hydra-compatible config engine + CLI surface
    diffusion     schedules, discrete/continuous diffusion math (pure fns)
    guidance      history-guidance planner and jittable prepare/compose
    sampling      scheduling matrices, rollout planners, jitted sampler
    models        flax denoiser backbones
    ops           pallas kernels (flash attention, fused adaLN, patchify)
    parallel      mesh / sharding helpers
    training      optax trainer, EMA, orbax checkpointing
    data          dataset clip indexing + host data pipeline
    vae           image/video VAE (latent diffusion) in flax
    metrics       FVD / FID / LPIPS / PSNR / SSIM ... evaluation suite
"""

__version__ = "0.1.0"
