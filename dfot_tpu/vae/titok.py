"""TiTok-KL: 1-D ViT tokenizer with a KL latent (Flax).

Counterpart of the reference TiTok_KL port (algorithms/vae/tiktok_kl/): the
encoder patchifies the image, appends N learned latent-query tokens, runs a
ViT, and keeps only the latent tokens' outputs as a (N, z) 1-D code (with
diagonal-Gaussian moments); the decoder appends learned mask tokens for the
patch positions, runs a ViT over [latent tokens | mask tokens], and projects
the patch positions back to pixels. Downstream DFoT models use x_shape
(z, 1, N) and the DiT1D backbone.
"""

from __future__ import annotations

import dataclasses
from typing import Optional, Tuple

import flax.linen as nn
import jax
import jax.numpy as jnp

from ..models.embeddings import timestep_embedding
from .distribution import DiagonalGaussian

__all__ = ["TiTokConfig", "TiTokKL"]


class ViTBlock(nn.Module):
    dim: int
    heads: int
    mlp_ratio: float = 4.0
    dtype: jnp.dtype = jnp.float32

    @nn.compact
    def __call__(self, x: jax.Array) -> jax.Array:
        B, N, C = x.shape
        d = self.dim // self.heads
        h = nn.LayerNorm(name="norm1")(x)
        qkv = nn.Dense(3 * self.dim, dtype=self.dtype, name="qkv")(h)
        qkv = qkv.reshape(B, N, 3, self.heads, d)
        q, k, v = [jnp.moveaxis(qkv[:, :, i], 1, 2) for i in range(3)]
        s = jnp.einsum("bhnd,bhmd->bhnm", q, k).astype(jnp.float32) * d**-0.5
        a = jax.nn.softmax(s, axis=-1).astype(x.dtype)
        o = jnp.moveaxis(jnp.einsum("bhnm,bhmd->bhnd", a, v), 1, 2).reshape(B, N, C)
        x = x + nn.Dense(self.dim, dtype=self.dtype, name="proj")(o)
        h = nn.LayerNorm(name="norm2")(x)
        h = nn.Dense(int(self.dim * self.mlp_ratio), dtype=self.dtype, name="fc1")(h)
        h = nn.gelu(h)
        return x + nn.Dense(self.dim, dtype=self.dtype, name="fc2")(h)


@dataclasses.dataclass(frozen=True)
class TiTokConfig:
    resolution: int = 256
    patch_size: int = 16
    num_latent_tokens: int = 32
    z_channels: int = 4
    hidden_size: int = 512
    depth: int = 8
    heads: int = 8

    @property
    def num_patches(self) -> int:
        return (self.resolution // self.patch_size) ** 2

    @classmethod
    def from_config(cls, cfg) -> "TiTokConfig":
        return cls(
            resolution=cfg.get("resolution", 256),
            patch_size=cfg.get("patch_size", 16),
            num_latent_tokens=cfg.get("num_latent_tokens", 32),
            z_channels=cfg.get("z_channels", 4),
            hidden_size=cfg.get("hidden_size", 512),
            depth=cfg.get("depth", 8),
            heads=cfg.get("heads", 8),
        )


class _TiTokEncoder(nn.Module):
    cfg: TiTokConfig
    dtype: jnp.dtype = jnp.float32

    @nn.compact
    def __call__(self, x: jax.Array) -> jax.Array:
        c = self.cfg
        B, H, W, C = x.shape
        p = c.patch_size
        patches = x.reshape(B, H // p, p, W // p, p, C)
        patches = patches.transpose(0, 1, 3, 2, 4, 5).reshape(B, c.num_patches, -1)
        h = nn.Dense(c.hidden_size, dtype=self.dtype, name="patch_embed")(patches)
        pos = timestep_embedding(
            jnp.arange(c.num_patches, dtype=jnp.float32), c.hidden_size,
            flip_sin_to_cos=False,
        )
        h = h + pos[None].astype(h.dtype)
        latent_q = self.param(
            "latent_tokens", nn.initializers.normal(0.02),
            (1, c.num_latent_tokens, c.hidden_size),
        )
        h = jnp.concatenate([h, jnp.broadcast_to(latent_q, (B,) + latent_q.shape[1:])], 1)
        for i in range(c.depth):
            h = ViTBlock(c.hidden_size, c.heads, dtype=self.dtype, name=f"block_{i}")(h)
        lat = nn.LayerNorm(name="norm_out")(h[:, c.num_patches :])
        return nn.Dense(2 * c.z_channels, dtype=self.dtype, name="to_moments")(lat)


class _TiTokDecoder(nn.Module):
    cfg: TiTokConfig
    dtype: jnp.dtype = jnp.float32

    @nn.compact
    def __call__(self, z: jax.Array) -> jax.Array:
        c = self.cfg
        B = z.shape[0]
        h_lat = nn.Dense(c.hidden_size, dtype=self.dtype, name="from_z")(z)
        mask = self.param(
            "mask_tokens", nn.initializers.normal(0.02),
            (1, c.num_patches, c.hidden_size),
        )
        pos = timestep_embedding(
            jnp.arange(c.num_patches, dtype=jnp.float32), c.hidden_size,
            flip_sin_to_cos=False,
        )
        patches = jnp.broadcast_to(mask, (B,) + mask.shape[1:]) + pos[None].astype(
            self.dtype
        )
        h = jnp.concatenate([patches, h_lat], 1)
        for i in range(c.depth):
            h = ViTBlock(c.hidden_size, c.heads, dtype=self.dtype, name=f"block_{i}")(h)
        h = nn.LayerNorm(name="norm_out")(h[:, : c.num_patches])
        p = c.patch_size
        out = nn.Dense(p * p * 3, dtype=self.dtype, name="to_pixels")(h)
        g = c.resolution // p
        out = out.reshape(B, g, g, p, p, 3).transpose(0, 1, 3, 2, 4, 5)
        return out.reshape(B, c.resolution, c.resolution, 3)


class TiTokKL(nn.Module):
    """encode: (B, H, W, 3) -> DiagonalGaussian over (B, N, z) 1-D tokens;
    decode: (B, N, z) -> (B, H, W, 3)."""

    cfg: TiTokConfig
    dtype: jnp.dtype = jnp.float32

    def setup(self):
        self.encoder = _TiTokEncoder(self.cfg, self.dtype)
        self.decoder = _TiTokDecoder(self.cfg, self.dtype)

    def encode(self, x: jax.Array) -> DiagonalGaussian:
        return DiagonalGaussian.from_parameters(self.encoder(x))

    def decode(self, z: jax.Array) -> jax.Array:
        return self.decoder(z)

    def __call__(self, x, rng=None, sample_posterior: bool = True):
        posterior = self.encode(x)
        z = posterior.sample(rng) if sample_posterior else posterior.mode()
        return self.decode(z), posterior
