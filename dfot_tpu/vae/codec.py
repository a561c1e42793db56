"""LatentCodec: the algorithm-facing VAE encode/decode wrapper.

Counterpart of the reference's VAE usage inside BaseVideoAlgo
(base_pytorch_video_algo.py:507-629): online tokenization of video batches
(latent.type == 'online'), chunked encode/decode to bound memory, posterior
sampling on encode, pixel decoding of sampled latents for metrics/logging.

The VAE family is chosen by the latent config: temporal downsampling 1 ->
ImageVAE (per-frame), > 1 -> causal VideoVAE. Pretrained weights load from
orbax dirs or torch/diffusers files (vae.pretrained_path); without weights a
seeded random VAE keeps the pipeline runnable for smoke tests (flagged).
"""

from __future__ import annotations

import os
from typing import Optional

import jax
import jax.numpy as jnp
import numpy as np

__all__ = ["LatentCodec"]


class LatentCodec:
    def __init__(self, algo_cfg, dataset_cfg, batch_size: Optional[int] = None):
        latent = dataset_cfg.latent
        self.temporal_factor = latent.downsampling_factor[0]
        self.spatial_factor = latent.downsampling_factor[1]
        self.num_channels = latent.num_channels
        self.resolution = dataset_cfg.resolution
        self.batch_size = batch_size or algo_cfg.vae.get("batch_size", 2)
        self.pretrained = bool(algo_cfg.vae.get("pretrained_path"))
        self.is_video = self.temporal_factor > 1
        self._build(algo_cfg)

    def _build(self, algo_cfg) -> None:
        rng = jax.random.PRNGKey(0)
        vae_name = str(algo_cfg.vae.get("name", "") or "")
        if "dc_ae" in vae_name:
            # deep-compression autoencoder (deterministic latents; reference
            # dataset_experiment/dmlab_video_generation.yaml uses it online)
            from .dc_ae import DCAE, DCAEConfig

            self.vae = DCAE(DCAEConfig.from_config(algo_cfg.vae))
            x0 = jnp.zeros((1, self.resolution, self.resolution, 3))
            self.variables = self.vae.init(rng, x0)
            path = algo_cfg.vae.get("pretrained_path")
            if path and os.path.exists(str(path)):
                from ..utils.torch_ckpt import load_state_dict
                from .dc_ae import import_dc_ae_params

                self.variables = {
                    "params": import_dc_ae_params(load_state_dict(str(path)))
                }
            vae = self.vae

            @jax.jit
            def encode_det(variables, x, rng):
                return vae.apply(variables, x, method=vae.encode)

            @jax.jit
            def decode_det(variables, z):
                return vae.apply(variables, z, method=vae.decode)

            self._encode, self._decode = encode_det, decode_det
            return
        if self.is_video:
            from .video_vae import VideoVAE, VideoVAEConfig

            n_levels = int(np.log2(self.spatial_factor)) + 1
            cfg = VideoVAEConfig(
                hidden_size=algo_cfg.vae.get("hidden_size", 128),
                hidden_size_mult=tuple([1, 2, 4, 4][:n_levels]),
                z_channels=self.num_channels,
                embed_dim=self.num_channels,
                resolution=self.resolution,
            )
            self.vae = VideoVAE(cfg)
            x0 = jnp.zeros((1, 1 + self.temporal_factor, self.resolution, self.resolution, 3))
        else:
            from .image_vae import ImageVAE, ImageVAEConfig

            n_levels = int(np.log2(self.spatial_factor)) + 1
            cfg = ImageVAEConfig(
                ch=algo_cfg.vae.get("ch", 128),
                ch_mult=tuple([1, 2, 4, 4][:n_levels]),
                z_channels=self.num_channels,
                embed_dim=self.num_channels,
                resolution=self.resolution,
            )
            self.vae = ImageVAE(cfg)
            x0 = jnp.zeros((1, self.resolution, self.resolution, 3))

        self.variables = self.vae.init(
            {"params": rng, "dropout": jax.random.fold_in(rng, 1)}, x0, rng
        )
        path = algo_cfg.vae.get("pretrained_path")
        if path and os.path.exists(str(path)):
            self._load_pretrained(str(path))

        vae = self.vae

        @jax.jit
        def encode(variables, x, rng):
            return vae.apply(variables, x, method=vae.encode).sample(rng)

        @jax.jit
        def decode(variables, z):
            return vae.apply(variables, z, method=vae.decode)

        self._encode, self._decode = encode, decode

    def _load_pretrained(self, path: str) -> None:
        if os.path.isdir(path):
            from ..training.checkpoint import restore_checkpoint

            restored = restore_checkpoint(path)
            self.variables = {"params": restored.get("params", restored)}
        elif path.endswith((".safetensors", ".ckpt", ".pt", ".bin")):
            from ..utils.torch_ckpt import load_state_dict
            from .autoencoder_kl import import_diffusers_vae_params

            state = load_state_dict(path)
            state = {k: np.asarray(v) for k, v in state.items()}
            self.variables = {"params": import_diffusers_vae_params(state)}

    # ------------------------------------------------------------------
    def encode_video(self, videos: jax.Array, rng: jax.Array) -> jax.Array:
        """(B, T, H, W, 3) in [0, 1] -> (B, T', h, w, z) latents."""
        x = jnp.asarray(videos) * 2.0 - 1.0
        if self.is_video:
            return self._encode(self.variables, x, rng)
        B, T = x.shape[:2]
        flat = x.reshape((B * T,) + x.shape[2:])
        outs = []
        for i in range(0, flat.shape[0], self.batch_size * 8):
            rng, r = jax.random.split(rng)
            outs.append(self._encode(self.variables, flat[i : i + self.batch_size * 8], r))
        z = jnp.concatenate(outs, 0)
        return z.reshape((B, T) + z.shape[1:])

    def decode_video(self, latents: jax.Array) -> jax.Array:
        """(B, T', h, w, z) -> (B, T, H, W, 3) in [0, 1]."""
        z = jnp.asarray(latents)
        if self.is_video:
            out = self._decode(self.variables, z)
        else:
            B, T = z.shape[:2]
            flat = z.reshape((B * T,) + z.shape[2:])
            outs = []
            for i in range(0, flat.shape[0], self.batch_size * 8):
                outs.append(self._decode(self.variables, flat[i : i + self.batch_size * 8]))
            out = jnp.concatenate(outs, 0).reshape((B, T) + outs[0].shape[1:])
        return jnp.clip(out * 0.5 + 0.5, 0.0, 1.0)
