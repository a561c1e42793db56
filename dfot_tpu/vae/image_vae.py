"""SD-style KL image autoencoder (Flax, channel-last NHWC).

First-stage model for latent diffusion: CompVis-architecture encoder/decoder
(the reference ports it in algorithms/vae/image_vae/model.py) — conv stem,
ch_mult resnet down blocks with optional attention, mid (res-attn-res),
symmetric decoder, quant/post-quant 1x1 convs, diagonal-Gaussian posterior.

TPU notes: NHWC convs, GroupNorm(32) in fp32, single-head spatial attention
expressed as matmuls (fused by XLA; these resolutions are small).
"""

from __future__ import annotations

import dataclasses
from typing import Optional, Tuple

import flax.linen as nn
import jax
import jax.numpy as jnp

from .distribution import DiagonalGaussian

__all__ = ["ImageVAEConfig", "Encoder", "Decoder", "ImageVAE"]


def _norm(name: str):
    return nn.GroupNorm(num_groups=32, epsilon=1e-6, name=name)


class ResnetBlock(nn.Module):
    out_ch: int
    dropout: float = 0.0
    dtype: jnp.dtype = jnp.float32

    @nn.compact
    def __call__(self, x: jax.Array, train: bool = False) -> jax.Array:
        h = _norm("norm1")(x)
        h = nn.swish(h)
        h = nn.Conv(self.out_ch, (3, 3), dtype=self.dtype, name="conv1")(h)
        h = _norm("norm2")(h)
        h = nn.swish(h)
        h = nn.Dropout(self.dropout, deterministic=not train)(h)
        h = nn.Conv(self.out_ch, (3, 3), dtype=self.dtype, name="conv2")(h)
        if x.shape[-1] != self.out_ch:
            x = nn.Conv(self.out_ch, (1, 1), dtype=self.dtype, name="nin_shortcut")(x)
        return x + h


class AttnBlock(nn.Module):
    """Single-head spatial self-attention over (H*W) tokens."""

    dtype: jnp.dtype = jnp.float32

    @nn.compact
    def __call__(self, x: jax.Array) -> jax.Array:
        B, H, W, C = x.shape
        h = _norm("norm")(x).reshape(B, H * W, C)
        q = nn.Dense(C, dtype=self.dtype, name="q")(h)
        k = nn.Dense(C, dtype=self.dtype, name="k")(h)
        v = nn.Dense(C, dtype=self.dtype, name="v")(h)
        w = jnp.einsum("bnc,bmc->bnm", q, k).astype(jnp.float32) * (C**-0.5)
        w = jax.nn.softmax(w, axis=-1).astype(x.dtype)
        h = jnp.einsum("bnm,bmc->bnc", w, v)
        h = nn.Dense(C, dtype=self.dtype, name="proj_out")(h)
        return x + h.reshape(B, H, W, C)


class Downsample(nn.Module):
    dtype: jnp.dtype = jnp.float32

    @nn.compact
    def __call__(self, x: jax.Array) -> jax.Array:
        # asymmetric pad (0,1) like CompVis, stride-2 valid conv
        x = jnp.pad(x, ((0, 0), (0, 1), (0, 1), (0, 0)))
        return nn.Conv(
            x.shape[-1], (3, 3), strides=(2, 2), padding="VALID",
            dtype=self.dtype, name="conv",
        )(x)


class Upsample(nn.Module):
    dtype: jnp.dtype = jnp.float32

    @nn.compact
    def __call__(self, x: jax.Array) -> jax.Array:
        x = jnp.repeat(jnp.repeat(x, 2, axis=1), 2, axis=2)
        return nn.Conv(x.shape[-1], (3, 3), dtype=self.dtype, name="conv")(x)


@dataclasses.dataclass(frozen=True)
class ImageVAEConfig:
    """ddconfig surface (reference configurations/algorithm/image_vae.yaml)."""

    in_channels: int = 3
    out_ch: int = 3
    ch: int = 128
    ch_mult: Tuple[int, ...] = (1, 2, 4, 4)
    num_res_blocks: int = 2
    attn_resolutions: Tuple[int, ...] = ()
    dropout: float = 0.0
    resolution: int = 256
    z_channels: int = 4
    double_z: bool = True
    embed_dim: int = 4

    @property
    def downsampling_factor(self) -> int:
        return 2 ** (len(self.ch_mult) - 1)

    @classmethod
    def from_config(cls, cfg) -> "ImageVAEConfig":
        dd = cfg.ddconfig
        return cls(
            in_channels=dd.in_channels,
            out_ch=dd.out_ch,
            ch=dd.ch,
            ch_mult=tuple(dd.ch_mult),
            num_res_blocks=dd.num_res_blocks,
            attn_resolutions=tuple(dd.attn_resolutions),
            dropout=dd.dropout,
            resolution=dd.resolution,
            z_channels=dd.z_channels,
            double_z=dd.double_z,
            embed_dim=cfg.embed_dim,
        )


class Encoder(nn.Module):
    cfg: ImageVAEConfig
    dtype: jnp.dtype = jnp.float32

    @nn.compact
    def __call__(self, x: jax.Array, train: bool = False) -> jax.Array:
        c = self.cfg
        h = nn.Conv(c.ch, (3, 3), dtype=self.dtype, name="conv_in")(x)
        res = c.resolution
        for i, mult in enumerate(c.ch_mult):
            for j in range(c.num_res_blocks):
                h = ResnetBlock(c.ch * mult, c.dropout, self.dtype, name=f"down_{i}_{j}")(h, train)
                if res in c.attn_resolutions:
                    h = AttnBlock(self.dtype, name=f"down_attn_{i}_{j}")(h)
            if i != len(c.ch_mult) - 1:
                h = Downsample(self.dtype, name=f"downsample_{i}")(h)
                res //= 2
        h = ResnetBlock(h.shape[-1], c.dropout, self.dtype, name="mid_block_1")(h, train)
        h = AttnBlock(self.dtype, name="mid_attn")(h)
        h = ResnetBlock(h.shape[-1], c.dropout, self.dtype, name="mid_block_2")(h, train)
        h = _norm("norm_out")(h)
        h = nn.swish(h)
        out_ch = c.z_channels * (2 if c.double_z else 1)
        return nn.Conv(out_ch, (3, 3), dtype=self.dtype, name="conv_out")(h)


class Decoder(nn.Module):
    cfg: ImageVAEConfig
    dtype: jnp.dtype = jnp.float32

    @nn.compact
    def __call__(self, z: jax.Array, train: bool = False) -> jax.Array:
        c = self.cfg
        ch = c.ch * c.ch_mult[-1]
        h = nn.Conv(ch, (3, 3), dtype=self.dtype, name="conv_in")(z)
        h = ResnetBlock(ch, c.dropout, self.dtype, name="mid_block_1")(h, train)
        h = AttnBlock(self.dtype, name="mid_attn")(h)
        h = ResnetBlock(ch, c.dropout, self.dtype, name="mid_block_2")(h, train)
        res = c.resolution // c.downsampling_factor
        for i in reversed(range(len(c.ch_mult))):
            for j in range(c.num_res_blocks + 1):
                h = ResnetBlock(c.ch * c.ch_mult[i], c.dropout, self.dtype, name=f"up_{i}_{j}")(h, train)
                if res in c.attn_resolutions:
                    h = AttnBlock(self.dtype, name=f"up_attn_{i}_{j}")(h)
            if i != 0:
                h = Upsample(self.dtype, name=f"upsample_{i}")(h)
                res *= 2
        h = _norm("norm_out")(h)
        h = nn.swish(h)
        return nn.Conv(c.out_ch, (3, 3), dtype=self.dtype, name="conv_out")(h)


class ImageVAE(nn.Module):
    """KL autoencoder: encode -> DiagonalGaussian over latents, decode back.

    Input/output images are channel-last in [-1, 1] (callers map from [0, 1]
    like the reference's 2x-1 preprocessing).
    """

    cfg: ImageVAEConfig
    dtype: jnp.dtype = jnp.float32

    def setup(self):
        self.encoder = Encoder(self.cfg, self.dtype)
        self.decoder = Decoder(self.cfg, self.dtype)
        factor = 2 if self.cfg.double_z else 1
        self.quant_conv = nn.Conv(self.cfg.embed_dim * factor, (1, 1), dtype=self.dtype)
        self.post_quant_conv = nn.Conv(self.cfg.z_channels, (1, 1), dtype=self.dtype)

    def encode(self, x: jax.Array, train: bool = False) -> DiagonalGaussian:
        moments = self.quant_conv(self.encoder(x, train))
        return DiagonalGaussian.from_parameters(moments)

    def decode(self, z: jax.Array, train: bool = False) -> jax.Array:
        return self.decoder(self.post_quant_conv(z), train)

    def __call__(
        self, x: jax.Array, rng: Optional[jax.Array] = None,
        sample_posterior: bool = True, train: bool = False,
    ):
        posterior = self.encode(x, train)
        z = posterior.sample(rng) if sample_posterior else posterior.mode()
        return self.decode(z, train), posterior
