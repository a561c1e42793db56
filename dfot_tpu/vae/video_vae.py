"""Causal 3D video VAE (Flax, channel-last NTHWC).

Chunk-wise causal tokenizer with the reference's frame->token contract
(algorithms/vae/video_vae/ + base_pytorch_video_algo.py:986-998): the first
frame maps to the first token, then every ``temporal_downsampling_factor``
frames map to one more token — so T = 1 + k*f frames -> 1 + k tokens, and the
first token depends only on the first frame (causality), which is what lets
image contexts condition video generation.

Implementation: causal 3D convs (left-only temporal padding, 'same' pads by
replicating the first frame), two stride-2 temporal downsamples (factor 4),
spatial down/upsampling like the image VAE, temporal upsampling by
repeat-and-trim (2T-1) so token 0 decodes frame 0 exactly once.
"""

from __future__ import annotations

import dataclasses
from typing import Optional, Tuple

import flax.linen as nn
import jax
import jax.numpy as jnp

from .distribution import DiagonalGaussian

__all__ = ["VideoVAEConfig", "VideoVAE"]


class CausalConv3d(nn.Module):
    """3D conv with causal (left-only) temporal padding."""

    features: int
    kernel: Tuple[int, int, int] = (3, 3, 3)
    strides: Tuple[int, int, int] = (1, 1, 1)
    first_padding_mode: str = "same"  # same (replicate frame 0) | constant
    dtype: jnp.dtype = jnp.float32

    @nn.compact
    def __call__(self, x: jax.Array) -> jax.Array:
        kt, kh, kw = self.kernel
        pad_t = kt - 1
        if pad_t:
            if self.first_padding_mode == "same":
                first = jnp.repeat(x[:, :1], pad_t, axis=1)
            else:
                first = jnp.zeros_like(x[:, :1]).repeat(pad_t, axis=1)
            x = jnp.concatenate([first, x], axis=1)
        return nn.Conv(
            self.features,
            self.kernel,
            strides=self.strides,
            padding=[(0, 0), (kh // 2, kh // 2), (kw // 2, kw // 2)],
            dtype=self.dtype,
            name="conv",
        )(x)


class FrameGroupNorm(nn.Module):
    """GroupNorm applied per frame: normalizing over the time axis would leak
    future frames and break causality."""

    num_groups: int = 32

    @nn.compact
    def __call__(self, x: jax.Array) -> jax.Array:
        B, T = x.shape[:2]
        y = x.reshape(B * T, *x.shape[2:])
        y = nn.GroupNorm(num_groups=self.num_groups, epsilon=1e-6, name="gn")(y)
        return y.reshape(x.shape)


class ResBlock3D(nn.Module):
    out_ch: int
    dropout: float = 0.0
    first_padding_mode: str = "same"
    dtype: jnp.dtype = jnp.float32

    @nn.compact
    def __call__(self, x: jax.Array, train: bool = False) -> jax.Array:
        h = FrameGroupNorm(name="norm1")(x)
        h = nn.swish(h)
        h = CausalConv3d(self.out_ch, first_padding_mode=self.first_padding_mode,
                         dtype=self.dtype, name="conv1")(h)
        h = FrameGroupNorm(name="norm2")(h)
        h = nn.swish(h)
        h = nn.Dropout(self.dropout, deterministic=not train)(h)
        h = CausalConv3d(self.out_ch, first_padding_mode=self.first_padding_mode,
                         dtype=self.dtype, name="conv2")(h)
        if x.shape[-1] != self.out_ch:
            x = nn.Conv(self.out_ch, (1, 1, 1), dtype=self.dtype, name="shortcut")(x)
        return x + h


def _temporal_down(x: jax.Array, features: int, dtype, name: str, mode: str) -> jax.Array:
    """Causal stride-2 temporal conv: T -> (T-1)//2 + 1 (frame 0 -> token 0)."""
    return CausalConv3d(
        features, kernel=(3, 1, 1), strides=(2, 1, 1),
        first_padding_mode=mode, dtype=dtype, name=name,
    )(x)


def _temporal_up(x: jax.Array) -> jax.Array:
    """T -> 2T - 1: repeat each token twice then drop the leading duplicate,
    so token 0 still decodes exactly frame 0."""
    return jnp.repeat(x, 2, axis=1)[:, 1:]


def _spatial_down(x: jax.Array, features: int, dtype, name: str) -> jax.Array:
    B, T = x.shape[:2]
    y = x.reshape(B * T, *x.shape[2:])
    y = jnp.pad(y, ((0, 0), (0, 1), (0, 1), (0, 0)))
    y = nn.Conv(features, (3, 3), strides=(2, 2), padding="VALID", dtype=dtype, name=name)(y)
    return y.reshape(B, T, *y.shape[1:])


@dataclasses.dataclass(frozen=True)
class VideoVAEConfig:
    """Config surface (reference configurations/algorithm/video_vae.yaml)."""

    hidden_size: int = 128
    z_channels: int = 8
    embed_dim: int = 8
    hidden_size_mult: Tuple[int, ...] = (1, 2, 4, 4)
    num_res_blocks: int = 2
    dropout: float = 0.0
    resolution: int = 128
    temporal_length: int = 17
    is_causal: bool = True
    first_padding_mode: str = "same"
    in_channels: int = 3

    @property
    def temporal_downsampling_factor(self) -> int:
        # two causal stride-2 halvings (when depth allows): 17 frames -> 5 tokens
        return 2 ** min(2, len(self.hidden_size_mult) - 1)

    @property
    def spatial_downsampling_factor(self) -> int:
        return 2 ** (len(self.hidden_size_mult) - 1)

    @classmethod
    def from_config(cls, cfg) -> "VideoVAEConfig":
        m = cfg.model
        return cls(
            hidden_size=m.hidden_size,
            z_channels=m.z_channels,
            embed_dim=m.embed_dim,
            hidden_size_mult=tuple(m.hidden_size_mult),
            num_res_blocks=m.num_res_blocks,
            dropout=m.dropout,
            resolution=m.resolution,
            temporal_length=m.temporal_length,
            is_causal=m.is_causal,
            first_padding_mode=m.first_padding_mode,
        )


class VideoEncoder(nn.Module):
    cfg: VideoVAEConfig
    dtype: jnp.dtype = jnp.float32

    @nn.compact
    def __call__(self, x: jax.Array, train: bool = False) -> jax.Array:
        """(B, T, H, W, C) with T = 1 + 4k -> (B, 1+k, H/8, W/8, 2*embed)."""
        c = self.cfg

        def block(h, ch, name):
            return ResBlock3D(
                ch, c.dropout, c.first_padding_mode, self.dtype, name=name
            )(h, train)

        h = CausalConv3d(c.hidden_size, first_padding_mode=c.first_padding_mode,
                         dtype=self.dtype, name="conv_in")(x)
        n_levels = len(c.hidden_size_mult)
        for i, mult in enumerate(c.hidden_size_mult):
            for j in range(c.num_res_blocks):
                h = block(h, c.hidden_size * mult, f"down_{i}_{j}")
            if i != n_levels - 1:
                h = _spatial_down(h, h.shape[-1], self.dtype, f"sdown_{i}")
                if i < 2:  # two temporal halvings -> factor 4
                    h = _temporal_down(
                        h, h.shape[-1], self.dtype, f"tdown_{i}", c.first_padding_mode
                    )
        h = block(h, h.shape[-1], "mid_1")
        h = block(h, h.shape[-1], "mid_2")
        h = FrameGroupNorm(name="norm_out")(h)
        h = nn.swish(h)
        h = CausalConv3d(2 * c.z_channels, first_padding_mode=c.first_padding_mode,
                         dtype=self.dtype, name="conv_out")(h)
        return nn.Conv(2 * c.embed_dim, (1, 1, 1), dtype=self.dtype, name="quant_conv")(h)


class VideoDecoder(nn.Module):
    cfg: VideoVAEConfig
    dtype: jnp.dtype = jnp.float32

    @nn.compact
    def __call__(self, z: jax.Array, train: bool = False) -> jax.Array:
        c = self.cfg

        def block(h, ch, name):
            return ResBlock3D(
                ch, c.dropout, c.first_padding_mode, self.dtype, name=name
            )(h, train)

        h = nn.Conv(c.z_channels, (1, 1, 1), dtype=self.dtype, name="post_quant_conv")(z)
        ch = c.hidden_size * c.hidden_size_mult[-1]
        h = CausalConv3d(ch, first_padding_mode=c.first_padding_mode,
                         dtype=self.dtype, name="conv_in")(h)
        h = block(h, ch, "mid_1")
        h = block(h, ch, "mid_2")
        n_levels = len(c.hidden_size_mult)
        for i in reversed(range(n_levels)):
            for j in range(c.num_res_blocks):
                h = block(h, c.hidden_size * c.hidden_size_mult[i], f"up_{i}_{j}")
            if i != 0:
                # invert: spatial 2x everywhere, temporal 2x at the last two ups
                B, T = h.shape[:2]
                y = h.reshape(B * T, *h.shape[2:])
                y = jnp.repeat(jnp.repeat(y, 2, axis=1), 2, axis=2)
                y = nn.Conv(h.shape[-1], (3, 3), dtype=self.dtype, name=f"sup_{i}")(y)
                h = y.reshape(B, T, *y.shape[1:])
                if 1 <= i <= 2:
                    h = _temporal_up(h)
        h = FrameGroupNorm(name="norm_out")(h)
        h = nn.swish(h)
        return CausalConv3d(c.in_channels, first_padding_mode=c.first_padding_mode,
                            dtype=self.dtype, name="conv_out")(h)


class VideoVAE(nn.Module):
    """Causal chunk-wise video tokenizer with a KL latent."""

    cfg: VideoVAEConfig
    dtype: jnp.dtype = jnp.float32

    def setup(self):
        self.encoder = VideoEncoder(self.cfg, self.dtype)
        self.decoder = VideoDecoder(self.cfg, self.dtype)

    def __call__(self, x, rng=None, sample_posterior: bool = True, train: bool = False):
        posterior = self.encode(x, train)
        z = posterior.sample(rng) if sample_posterior else posterior.mode()
        return self.decode(z, train), posterior

    def encode(self, x: jax.Array, train: bool = False) -> DiagonalGaussian:
        return DiagonalGaussian.from_parameters(self.encoder(x, train))

    def decode(self, z: jax.Array, train: bool = False) -> jax.Array:
        return self.decoder(z, train)
