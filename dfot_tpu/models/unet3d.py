"""U-Net3D video denoiser (Flax, channel-last): factorized spatial conv +
temporal attention, with optional causal masking.

Counterpart of the reference Unet3D (algorithms/dfot/backbones/u_net/):
pseudo-3D ResNet blocks (per-frame spatial convs + per-frame FiLM from the
(noise, action) embedding), spatial attention at configured resolutions
(linear-attention option), temporal attention with rotary time embeddings
(causal mask supported — this is the causal backbone family), U-Net skips by
channel concatenation.

Checkpoint-parity notes (verified by tests/test_reference_parity.py):
- GroupNorm statistics span (T, H, W) exactly like the reference's
  Conv3d-layout GroupNorm (u_net_blocks.py:26) — this leaks future frames
  through the normalizer even under causal attention, a quirk the
  reference has. ``UNet3DSpec.frame_local_norm=True`` switches every
  GroupNorm to per-frame statistics for leak-free causal generation (our
  extension; incompatible with reference checkpoints' exact outputs).
- attention blocks pre-norm with LayerNorm (u_net_blocks.py:198),
- the mid block is res / spatial attn / temporal attn / res
  (u_net3d.py:135-140),
- Downsample is a stride-2 3x3 conv; Upsample nearest-2x + 3x3 conv.
"""

from __future__ import annotations

import dataclasses
from typing import Optional, Sequence, Tuple

import flax.linen as nn
import jax
import jax.numpy as jnp

from ..ops.attention import attention
from .embeddings import RoPE, StochasticTimeEmbedding, apply_rope, make_rope_1d
from .embeddings import RandomDropoutCondEmbedding

__all__ = ["UNet3DSpec", "UNet3D"]


class VideoGroupNorm(nn.Module):
    """GroupNorm over (B, T, H, W, C). frame_local=False matches the
    reference's Conv3d GroupNorm (statistics over T, H, W — leaks time);
    frame_local=True normalizes each frame independently."""

    groups: int = 8
    frame_local: bool = False
    eps: float = 1e-6

    @nn.compact
    def __call__(self, x: jax.Array) -> jax.Array:
        gn = nn.GroupNorm(num_groups=self.groups, epsilon=self.eps, name="gn")
        if self.frame_local:
            B, T = x.shape[:2]
            return gn(x.reshape(B * T, *x.shape[2:])).reshape(x.shape)
        return gn(x)


class ResnetBlock(nn.Module):
    """Per-frame conv ResNet block with optional FiLM embedding
    (u_net_blocks.py:14-65)."""

    out_ch: int
    groups: int = 8
    use_emb: bool = True
    frame_local_norm: bool = False
    dtype: jnp.dtype = jnp.float32

    @nn.compact
    def __call__(self, x: jax.Array, emb: Optional[jax.Array] = None) -> jax.Array:
        # x: (B, T, H, W, C); emb: (B, T, E)
        B, T, H, W, C = x.shape

        def conv(h, name):
            h = h.reshape(B * T, H, W, -1)
            h = nn.Conv(self.out_ch, (3, 3), dtype=self.dtype, name=name)(h)
            return h.reshape(B, T, H, W, self.out_ch)

        norm = lambda name: VideoGroupNorm(
            self.groups, self.frame_local_norm, name=name
        )
        h = norm("norm1")(x)
        h = nn.silu(h)
        h = conv(h, "conv1")
        if self.use_emb and emb is not None:
            mod = nn.Dense(2 * self.out_ch, dtype=self.dtype, name="emb_proj")(
                nn.silu(emb)
            )
            scale, shift = jnp.split(mod[:, :, None, None, :], 2, axis=-1)
            h = norm("norm2")(h) * (1 + scale) + shift
        else:
            h = norm("norm2")(h)
        h = nn.silu(h)
        h = conv(h, "conv2")
        if C != self.out_ch:
            x = nn.Dense(self.out_ch, dtype=self.dtype, name="shortcut")(x)
        return x + h


class SpatialAttention(nn.Module):
    """Pre-LayerNorm residual spatial attention over (H*W) per frame
    (UnetSpatialAttentionBlock; u_net_blocks.py:89-257, 324-326)."""

    heads: int
    dim_head: int
    use_linear: bool = False
    dtype: jnp.dtype = jnp.float32

    @nn.compact
    def __call__(self, x: jax.Array) -> jax.Array:
        B, T, H, W, C = x.shape
        inner = self.heads * self.dim_head
        h = nn.LayerNorm(epsilon=1e-5, name="norm")(x).reshape(B * T, H * W, C)
        qkv = nn.Dense(3 * inner, use_bias=False, dtype=self.dtype, name="qkv")(h)
        q, k, v = jnp.split(qkv.reshape(B * T, H * W, 3, self.heads, self.dim_head), 3, 2)
        q, k, v = [jnp.moveaxis(a[:, :, 0], 1, 2) for a in (q, k, v)]
        if self.use_linear:
            # linear attention: softmax(q) (softmax(k)^T v) — O(N d^2)
            q = jax.nn.softmax(q, axis=-1) * self.dim_head**-0.5
            k = jax.nn.softmax(k, axis=-2)
            ctx = jnp.einsum("bhnd,bhne->bhde", k, v)
            o = jnp.einsum("bhnd,bhde->bhne", q, ctx)
        else:
            o = attention(q, k, v)
        o = jnp.moveaxis(o, 1, 2).reshape(B * T, H * W, inner)
        o = nn.Dense(C, dtype=self.dtype, name="proj")(o)
        return x + o.reshape(B, T, H, W, C)


class TemporalAttention(nn.Module):
    """Pre-LayerNorm residual temporal attention over T per pixel with
    rotary time embeddings (UnetTemporalAttentionBlock)."""

    heads: int
    dim_head: int
    causal: bool = False
    rope: Optional[RoPE] = None
    dtype: jnp.dtype = jnp.float32

    @nn.compact
    def __call__(self, x: jax.Array) -> jax.Array:
        B, T, H, W, C = x.shape
        inner = self.heads * self.dim_head
        h = nn.LayerNorm(epsilon=1e-5, name="norm")(x)
        h = h.transpose(0, 2, 3, 1, 4).reshape(B * H * W, T, C)
        qkv = nn.Dense(3 * inner, use_bias=False, dtype=self.dtype, name="qkv")(h)
        q, k, v = jnp.split(qkv.reshape(-1, T, 3, self.heads, self.dim_head), 3, 2)
        q, k, v = [jnp.moveaxis(a[:, :, 0], 1, 2) for a in (q, k, v)]
        if self.rope is not None:
            q, k = apply_rope(q, self.rope), apply_rope(k, self.rope)
        o = attention(q, k, v, causal=self.causal)
        o = jnp.moveaxis(o, 1, 2).reshape(B * H * W, T, inner)
        o = nn.Dense(C, dtype=self.dtype, name="proj")(o)
        o = o.reshape(B, H, W, T, C).transpose(0, 3, 1, 2, 4)
        return x + o


def _downsample(x, features, dtype, name):
    """Stride-2 3x3 per-frame conv (u_net_blocks.py:68-76)."""
    B, T = x.shape[:2]
    y = x.reshape(B * T, *x.shape[2:])
    y = nn.Conv(features, (3, 3), strides=(2, 2), padding=1, dtype=dtype, name=name)(y)
    return y.reshape(B, T, *y.shape[1:])


def _upsample(x, features, dtype, name):
    """Nearest-2x + 3x3 per-frame conv (u_net_blocks.py:79-86)."""
    B, T = x.shape[:2]
    y = x.reshape(B * T, *x.shape[2:])
    y = jnp.repeat(jnp.repeat(y, 2, axis=1), 2, axis=2)
    y = nn.Conv(features, (3, 3), dtype=dtype, name=name)(y)
    return y.reshape(B, T, *y.shape[1:])


@dataclasses.dataclass(frozen=True)
class UNet3DSpec:
    network_size: int = 64
    num_res_blocks: int = 2
    resnet_block_groups: int = 8
    dim_mults: Tuple[int, ...] = (1, 2, 4, 8)
    attn_resolutions: Tuple[int, ...] = (8, 16, 32, 64)
    attn_dim_head: int = 32
    attn_heads: int = 4
    use_linear_attn: bool = True
    use_init_temporal_attn: bool = True
    init_kernel_size: int = 7
    dropout: float = 0.0
    max_temporal_length: int = 16
    # per-frame GroupNorm statistics (causal-leak-free; our extension —
    # reference checkpoints require False)
    frame_local_norm: bool = False

    @classmethod
    def from_config(cls, cfg, max_tokens: int) -> "UNet3DSpec":
        return cls(
            network_size=cfg.network_size,
            num_res_blocks=cfg.num_res_blocks,
            resnet_block_groups=cfg.get("resnet_block_groups", 8),
            dim_mults=tuple(cfg.get("dim_mults", [1, 2, 4, 8])),
            attn_resolutions=tuple(cfg.attn_resolutions),
            attn_dim_head=cfg.get("attn_dim_head", 32),
            attn_heads=cfg.attn_heads,
            use_linear_attn=cfg.use_linear_attn,
            use_init_temporal_attn=cfg.use_init_temporal_attn,
            init_kernel_size=cfg.init_kernel_size,
            dropout=cfg.dropout,
            max_temporal_length=max_tokens,
            frame_local_norm=cfg.get("frame_local_norm", False),
        )


class UNet3D(nn.Module):
    """Input (B, T, H, W, C); supports causal temporal attention."""

    spec: UNet3DSpec
    x_channels: int
    resolution: int
    use_causal_mask: bool = True
    external_cond_type: Optional[str] = None
    external_cond_dim: int = 0
    external_cond_num_classes: Optional[int] = None
    external_cond_dropout: float = 0.0
    use_fourier_noise_emb: bool = False
    dtype: jnp.dtype = jnp.float32

    @nn.compact
    def __call__(
        self,
        x: jax.Array,
        noise_levels: jax.Array,
        external_cond: Optional[jax.Array] = None,
        external_cond_mask: Optional[jax.Array] = None,
        train: bool = False,
    ) -> jax.Array:
        s = self.spec
        B, T, H, W, C = x.shape
        dim = s.network_size
        dims = [dim] + [dim * m for m in s.dim_mults]
        # attn_resolutions are given in image pixels; convert to downsampling
        # level factors like the reference (u_net3d.py:48)
        attn_factors = {self.resolution // r for r in s.attn_resolutions}
        rope = make_rope_1d(s.attn_dim_head, s.max_temporal_length)

        emb = StochasticTimeEmbedding(
            dim=max(dim, 32), emb_dim=dim * 4,
            use_fourier=self.use_fourier_noise_emb, dtype=self.dtype, name="noise_emb",
        )(noise_levels, train=train)
        if external_cond is not None and self.external_cond_dim:
            cond = RandomDropoutCondEmbedding(
                dim * 2, self.external_cond_dropout, self.dtype, name="cond_emb"
            )(external_cond, external_cond_mask, train)
            emb = jnp.concatenate([emb, cond.astype(emb.dtype)], axis=-1)

        def res_block(h, emb, out_ch, name, use_emb=True):
            return ResnetBlock(
                out_ch, s.resnet_block_groups, use_emb, s.frame_local_norm,
                self.dtype, name=name,
            )(h, emb)

        def sattn(h, name, use_linear):
            return SpatialAttention(
                s.attn_heads, s.attn_dim_head, use_linear=use_linear,
                dtype=self.dtype, name=name,
            )(h)

        def tattn(h, name):
            return TemporalAttention(
                s.attn_heads, s.attn_dim_head, self.use_causal_mask, rope,
                self.dtype, name=name,
            )(h)

        # init conv (1, k, k) + optional temporal attention
        k0 = s.init_kernel_size
        h0 = x.reshape(B * T, H, W, C)
        h0 = nn.Conv(dim, (k0, k0), dtype=self.dtype, name="init_conv")(h0)
        h0 = h0.reshape(B, T, H, W, dim)
        if s.use_init_temporal_attn:
            h0 = tattn(h0, "init_temporal_attn")

        def level(h, emb, dim_out, use_attn, prefix, use_linear):
            for j in range(s.num_res_blocks):
                h = res_block(h, emb, dim_out, f"{prefix}_res{j}")
            if use_attn:
                h = sattn(h, f"{prefix}_sattn", s.use_linear_attn and use_linear)
                h = tattn(h, f"{prefix}_tattn")
            return h

        h = h0
        hs = []
        factor = 1
        n = len(s.dim_mults)
        for i in range(n):
            is_last = i == n - 1
            h = level(h, emb, dims[i + 1], factor in attn_factors, f"down_{i}",
                      not is_last)
            hs.append(h)
            if not is_last:
                h = _downsample(h, dims[i + 1], self.dtype, f"down_{i}_ds")
                factor *= 2

        # mid: res / spatial attn / temporal attn / res (u_net3d.py:135-140)
        h = res_block(h, emb, dims[-1], "mid_res0")
        h = sattn(h, "mid_sattn", False)
        h = tattn(h, "mid_tattn")
        h = res_block(h, emb, dims[-1], "mid_res1")

        for idx, i in enumerate(reversed(range(n))):
            is_last = idx == n - 1
            h = jnp.concatenate([h, hs.pop()], axis=-1)
            h = level(h, emb, dims[i], factor in attn_factors, f"up_{i}",
                      idx > 0)
            if not is_last:
                h = _upsample(h, dims[i], self.dtype, f"up_{i}_us")
                factor //= 2

        h = jnp.concatenate([h, h0], axis=-1)
        h = ResnetBlock(dim, s.resnet_block_groups, use_emb=False,
                        frame_local_norm=s.frame_local_norm,
                        dtype=self.dtype, name="out_res")(h)
        h = h.reshape(B * T, H, W, dim)
        out = nn.Conv(self.x_channels, (1, 1), dtype=self.dtype, name="out_conv")(h)
        return out.reshape(B, T, H, W, self.x_channels).astype(jnp.float32)
