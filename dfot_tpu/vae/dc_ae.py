"""DC-AE: deep-compression autoencoder (SANA family) — Flax.

Counterpart of the reference's MyAutoencoderDC port
(algorithms/vae/dc_ae/autoencoder_dc_model.py): a deterministic (no-KL)
autoencoder reaching very high spatial compression (f32/f64) by pairing
residual conv stages with **space-to-depth residual shortcuts** around every
down/upsample (the "residual autoencoding" trick that makes deep compression
trainable) and linear-attention (LiteMLA) blocks at low resolution.
"""

from __future__ import annotations

import dataclasses
from typing import Optional, Tuple

import flax.linen as nn
import jax
import jax.numpy as jnp

__all__ = ["DCAEConfig", "DCAE"]


def _space_to_depth(x: jax.Array, r: int = 2) -> jax.Array:
    B, H, W, C = x.shape
    x = x.reshape(B, H // r, r, W // r, r, C)
    return x.transpose(0, 1, 3, 2, 4, 5).reshape(B, H // r, W // r, r * r * C)


def _depth_to_space(x: jax.Array, r: int = 2) -> jax.Array:
    B, H, W, C = x.shape
    x = x.reshape(B, H, W, r, r, C // (r * r))
    return x.transpose(0, 1, 3, 2, 4, 5).reshape(B, H * r, W * r, C // (r * r))


def _channel_avg(x: jax.Array, out_ch: int) -> jax.Array:
    """Non-parametric channel resize: average groups (reduce) or tile
    (expand) — the shortcut path of residual autoencoding."""
    C = x.shape[-1]
    if C == out_ch:
        return x
    if C > out_ch:
        assert C % out_ch == 0
        return x.reshape(*x.shape[:-1], out_ch, C // out_ch).mean(-1)
    assert out_ch % C == 0
    return jnp.repeat(x, out_ch // C, axis=-1)


class ConvBlock(nn.Module):
    ch: int
    dtype: jnp.dtype = jnp.float32

    @nn.compact
    def __call__(self, x: jax.Array) -> jax.Array:
        h = nn.Conv(self.ch, (3, 3), dtype=self.dtype, name="conv1")(x)
        h = nn.silu(nn.RMSNorm(name="norm1")(h))
        h = nn.Conv(self.ch, (3, 3), dtype=self.dtype, name="conv2")(h)
        h = nn.RMSNorm(name="norm2")(h)
        if x.shape[-1] != self.ch:
            x = nn.Conv(self.ch, (1, 1), dtype=self.dtype, name="shortcut")(x)
        return x + h


class LiteMLA(nn.Module):
    """Linear multi-scale attention (EfficientViT): O(N d^2)."""

    ch: int
    heads: int = 8
    dtype: jnp.dtype = jnp.float32

    @nn.compact
    def __call__(self, x: jax.Array) -> jax.Array:
        B, H, W, C = x.shape
        d = self.ch // self.heads
        qkv = nn.Conv(3 * self.ch, (1, 1), use_bias=False, dtype=self.dtype, name="qkv")(x)
        qkv = qkv.reshape(B, H * W, 3, self.heads, d)
        q, k, v = [jnp.moveaxis(qkv[:, :, i], 1, 2) for i in range(3)]
        q = nn.relu(q)
        k = nn.relu(k)
        ctx = jnp.einsum("bhnd,bhne->bhde", k, v)
        norm = jnp.einsum("bhnd,bhd->bhn", q, k.sum(axis=2)) + 1e-6
        o = jnp.einsum("bhnd,bhde->bhne", q, ctx) / norm[..., None]
        o = jnp.moveaxis(o, 1, 2).reshape(B, H, W, self.ch)
        o = nn.Conv(self.ch, (1, 1), dtype=self.dtype, name="proj")(o)
        return x + o


@dataclasses.dataclass(frozen=True)
class DCAEConfig:
    in_channels: int = 3
    latent_channels: int = 32
    width_list: Tuple[int, ...] = (64, 128, 256, 512, 512)
    depth_list: Tuple[int, ...] = (1, 2, 2, 2, 2)
    attention_levels: Tuple[int, ...] = (3, 4)

    @property
    def spatial_compression(self) -> int:
        return 2 ** (len(self.width_list) - 1) * 2  # stem + per-stage downs

    @classmethod
    def from_config(cls, cfg) -> "DCAEConfig":
        return cls(
            latent_channels=cfg.get("latent_channels", 32),
            width_list=tuple(cfg.get("width_list", [64, 128, 256, 512, 512])),
            depth_list=tuple(cfg.get("depth_list", [1, 2, 2, 2, 2])),
            attention_levels=tuple(cfg.get("attention_levels", [3, 4])),
        )


class DCAE(nn.Module):
    """Deterministic deep-compression autoencoder (encode/decode)."""

    cfg: DCAEConfig
    dtype: jnp.dtype = jnp.float32

    def setup(self):
        self.encoder = _DCAEEncoder(self.cfg, self.dtype)
        self.decoder = _DCAEDecoder(self.cfg, self.dtype)

    def encode(self, x: jax.Array) -> jax.Array:
        return self.encoder(x)

    def decode(self, z: jax.Array) -> jax.Array:
        return self.decoder(z)

    def __call__(self, x: jax.Array) -> jax.Array:
        return self.decode(self.encode(x))


class _DCAEEncoder(nn.Module):
    cfg: DCAEConfig
    dtype: jnp.dtype = jnp.float32

    @nn.compact
    def __call__(self, x: jax.Array) -> jax.Array:
        c = self.cfg
        # stem: space-to-depth + conv (2x down)
        h = nn.Conv(c.width_list[0], (3, 3), dtype=self.dtype, name="stem")(
            _space_to_depth(x)
        )
        for i, (w, depth) in enumerate(zip(c.width_list, c.depth_list)):
            for j in range(depth):
                h = ConvBlock(w, self.dtype, name=f"stage{i}_block{j}")(h)
                if i in c.attention_levels:
                    h = LiteMLA(w, dtype=self.dtype, name=f"stage{i}_attn{j}")(h)
            if i != len(c.width_list) - 1:
                # residual downsample: strided conv + space-to-depth shortcut
                nxt = c.width_list[i + 1]
                down = nn.Conv(nxt, (3, 3), strides=(2, 2), dtype=self.dtype,
                               name=f"down{i}")(h)
                h = down + _channel_avg(_space_to_depth(h), nxt)
        # residual latent projection
        proj = nn.Conv(c.latent_channels, (3, 3), dtype=self.dtype, name="latent_proj")(h)
        return proj + _channel_avg(h, c.latent_channels)


class _DCAEDecoder(nn.Module):
    cfg: DCAEConfig
    dtype: jnp.dtype = jnp.float32

    @nn.compact
    def __call__(self, z: jax.Array) -> jax.Array:
        c = self.cfg
        w_last = c.width_list[-1]
        h = nn.Conv(w_last, (3, 3), dtype=self.dtype, name="latent_in")(z) + _channel_avg(
            z, w_last
        )
        for idx, i in enumerate(reversed(range(len(c.width_list)))):
            w = c.width_list[i]
            for j in range(c.depth_list[i]):
                h = ConvBlock(w, self.dtype, name=f"stage{i}_block{j}")(h)
                if i in c.attention_levels:
                    h = LiteMLA(w, dtype=self.dtype, name=f"stage{i}_attn{j}")(h)
            if i != 0:
                nxt = c.width_list[i - 1]
                up = nn.Conv(nxt * 4, (3, 3), dtype=self.dtype, name=f"up{i}")(h)
                h = _depth_to_space(up) + _depth_to_space(_channel_avg(h, nxt * 4))
        out = nn.Conv(c.in_channels * 4, (3, 3), dtype=self.dtype, name="head")(h)
        return _depth_to_space(out)
