"""U-ViT3D backbone (Flax): SiD2-style residual U-ViT video denoiser.

The flagship DFoT_RE10K architecture (reference:
algorithms/dfot/backbones/u_vit/u_vit3d.py, u_vit_blocks.py, u_vit3d_pose.py):
conv ResBlocks at high resolution, full 3D-RoPE transformer blocks at low
resolution, single subtract/add residual skip per down/upsample, FiLM
conditioning on a (noise-level + camera-pose) embedding map.

TPU-first notes:
- channel-last NHWC convs (TPU native layout),
- patchify/unpatchify as reshape+matmul,
- parallel attention+MLP blocks issue one fused qkv+mlp matmul (ViT-22B
  style, like the reference) — a single large MXU op per block,
- attention via ops.attention (Pallas flash kernel on TPU),
- remat per level via ``use_checkpointing``.
"""

from __future__ import annotations

import dataclasses
from typing import Optional, Sequence, Tuple

import flax.linen as nn
import jax
import jax.numpy as jnp

from ..ops.attention import attention
from .embeddings import (
    RoPE,
    StochasticTimeEmbedding,
    apply_rope,
    make_rope_1d,
    make_rope_2d,
    make_rope_3d,
)

__all__ = ["UViTSpec", "UViT3D", "UViT3DPose"]


class RMSNorm(nn.Module):
    """RMSNorm with fp32 accumulation (reference: modules/normalization.py)."""

    eps: float = 1e-6

    @nn.compact
    def __call__(self, x: jax.Array) -> jax.Array:
        dim = x.shape[-1]
        scale = self.param("weight", nn.initializers.ones, (dim,))
        xf = x.astype(jnp.float32)
        normed = xf * jax.lax.rsqrt(jnp.mean(xf * xf, axis=-1, keepdims=True) + self.eps)
        return normed.astype(x.dtype) * scale.astype(x.dtype)


class FiLMNorm(nn.Module):
    """RMSNorm + FiLM from a per-token embedding
    (reference NormalizeWithCond, u_vit_blocks.py:99-122)."""

    dtype: jnp.dtype = jnp.float32

    @nn.compact
    def __call__(self, x: jax.Array, emb: jax.Array) -> jax.Array:
        dim = x.shape[-1]
        mod = nn.Dense(2 * dim, dtype=self.dtype, name="emb_layer")(emb)
        scale, shift = jnp.split(mod, 2, axis=-1)
        return RMSNorm(name="norm")(x) * (1 + scale) + shift


class ResBlock(nn.Module):
    """GroupNorm conv ResBlock with FiLM emb injection
    (reference: u_vit_blocks.py:57-97). x: (B, H, W, C); emb: (B, h, w, E)
    broadcastable map (h, w in {1, H} etc.)."""

    channels: int
    dtype: jnp.dtype = jnp.float32

    @nn.compact
    def __call__(self, x: jax.Array, emb: jax.Array) -> jax.Array:
        h = nn.GroupNorm(num_groups=32, epsilon=1e-6, name="in_norm")(x)
        h = nn.silu(h)
        h = nn.Conv(self.channels, (3, 3), dtype=self.dtype, name="in_conv")(h)
        mod = nn.Conv(2 * self.channels, (1, 1), dtype=self.dtype, name="emb_layer")(emb)
        scale, shift = jnp.split(mod, 2, axis=-1)
        h = nn.GroupNorm(num_groups=32, epsilon=1e-6, name="out_norm")(h)
        h = h * (1 + scale) + shift
        h = nn.silu(h)
        h = nn.Conv(
            self.channels, (3, 3),
            kernel_init=nn.initializers.zeros, bias_init=nn.initializers.zeros,
            dtype=self.dtype, name="out_conv",
        )(h)
        return x + h


class AxialAttention(nn.Module):
    """Secondary (temporal) attention used inside axial transformer blocks
    (reference AttentionBlock, u_vit_blocks.py:125-171)."""

    dim: int
    heads: int
    rope: Optional[RoPE] = None
    dtype: jnp.dtype = jnp.float32

    @nn.compact
    def __call__(self, x: jax.Array, emb: jax.Array) -> jax.Array:
        B, N, C = x.shape
        d = self.dim // self.heads
        h = FiLMNorm(self.dtype, name="norm")(x, emb)
        qkv = nn.Dense(3 * self.dim, use_bias=False, dtype=self.dtype, name="proj")(h)
        qkv = qkv.reshape(B, N, 3, self.heads, d)
        q, k, v = [jnp.moveaxis(qkv[:, :, i], 1, 2) for i in range(3)]
        q = RMSNorm(name="q_norm")(q)
        k = RMSNorm(name="k_norm")(k)
        if self.rope is not None:
            q, k = apply_rope(q, self.rope), apply_rope(k, self.rope)
        o = attention(q, k, v)
        o = jnp.moveaxis(o, 1, 2).reshape(B, N, C)
        out = nn.Dense(
            self.dim, use_bias=False,
            kernel_init=nn.initializers.zeros, dtype=self.dtype, name="out",
        )(o)
        # reference adds the zero-init projection to the *attention output*
        # (not the block input); the outer block handles the residual
        return o + out


class TransformerBlock(nn.Module):
    """Parallel attention+MLP block with QK-norm (ViT-22B style; reference
    u_vit_blocks.py:203-289). Optional axial mode: spatial attention here,
    temporal attention via AxialAttention."""

    dim: int
    heads: int
    dropout: float = 0.0
    use_axial: bool = False
    ax1_len: Optional[int] = None
    rope: Optional[RoPE] = None       # full rope (non-axial)
    rope_ax1: Optional[RoPE] = None   # temporal rope (axial)
    rope_ax2: Optional[RoPE] = None   # spatial rope (axial)
    dtype: jnp.dtype = jnp.float32

    @nn.compact
    def __call__(self, x: jax.Array, emb: jax.Array, train: bool = False) -> jax.Array:
        dim, heads = self.dim, self.heads
        d = dim // heads
        mlp_dim = 4 * dim

        if self.use_axial:
            B0, N0, C0 = x.shape
            E0 = emb.shape[-1]
            ax1 = self.ax1_len
            ax2 = N0 // ax1
            x = x.reshape(B0 * ax1, ax2, C0)
            emb = emb.reshape(B0 * ax1, ax2, E0) if emb.shape[1] == N0 else emb

        B, N, C = x.shape
        residual = x
        h = FiLMNorm(self.dtype, name="norm")(x, emb)
        fused = nn.Dense(3 * dim + mlp_dim, dtype=self.dtype, name="fused_proj")(h)
        qkv, mlp_h = fused[..., : 3 * dim], fused[..., 3 * dim :]
        qkv = qkv.reshape(B, N, 3, heads, d)
        q, k, v = [jnp.moveaxis(qkv[:, :, i], 1, 2) for i in range(3)]
        q = RMSNorm(name="q_norm")(q)
        k = RMSNorm(name="k_norm")(k)
        rope = self.rope_ax2 if self.use_axial else self.rope
        if rope is not None:
            q, k = apply_rope(q, rope), apply_rope(k, rope)
        o = attention(q, k, v)
        o = jnp.moveaxis(o, 1, 2).reshape(B, N, C)
        x = residual + nn.Dense(
            dim, kernel_init=nn.initializers.zeros, bias_init=nn.initializers.zeros,
            dtype=self.dtype, name="attn_out",
        )(o)

        if self.use_axial:
            # temporal attention: (B*ax1, ax2, C) -> (B*ax2, ax1, C)
            x = x.reshape(B0, ax1, ax2, C).swapaxes(1, 2).reshape(B0 * ax2, ax1, C)
            e = emb.reshape(B0, ax1, ax2, E0).swapaxes(1, 2).reshape(B0 * ax2, ax1, E0)
            x = AxialAttention(
                dim, heads, self.rope_ax1, self.dtype, name="temporal_attn"
            )(x, e)
            x = x.reshape(B0, ax2, ax1, C).swapaxes(1, 2).reshape(B0 * ax1, ax2, C)

        m = nn.silu(mlp_h)
        m = nn.Dropout(self.dropout, deterministic=not train)(m)
        x = x + nn.Dense(
            dim, kernel_init=nn.initializers.zeros, bias_init=nn.initializers.zeros,
            dtype=self.dtype, name="mlp_out",
        )(m)

        if self.use_axial:
            x = x.reshape(B0, N0, C0)
        return x


class Downsample(nn.Module):
    """avg-pool 2x then conv (reference: u_vit_blocks.py:292-305)."""

    out_channels: int
    dtype: jnp.dtype = jnp.float32

    @nn.compact
    def __call__(self, x: jax.Array) -> jax.Array:
        x = nn.avg_pool(x, (2, 2), strides=(2, 2))
        return nn.Conv(self.out_channels, (3, 3), dtype=self.dtype, name="conv")(x)


class Upsample(nn.Module):
    """conv then 2x nearest upsample (reference: u_vit_blocks.py:308-322)."""

    out_channels: int
    dtype: jnp.dtype = jnp.float32

    @nn.compact
    def __call__(self, x: jax.Array) -> jax.Array:
        x = nn.Conv(self.out_channels, (3, 3), dtype=self.dtype, name="conv")(x)
        B, H, W, C = x.shape
        x = jnp.repeat(jnp.repeat(x, 2, axis=1), 2, axis=2)
        return x


@dataclasses.dataclass(frozen=True)
class UViTSpec:
    channels: Tuple[int, ...] = (128, 256, 512, 1024)
    emb_channels: int = 1024
    patch_size: int = 2
    block_types: Tuple[str, ...] = (
        "ResBlock", "ResBlock", "TransformerBlock", "TransformerBlock",
    )
    block_dropouts: Tuple[float, ...] = (0.0, 0.0, 0.1, 0.1)
    num_updown_blocks: Tuple[int, ...] = (3, 3, 3)
    num_mid_blocks: int = 16
    num_heads: int = 4
    pos_emb_type: str = "rope"
    use_checkpointing: Tuple[bool, ...] = (False, False, False, False)
    max_temporal_length: int = 8

    @classmethod
    def from_config(cls, cfg, max_tokens: int) -> "UViTSpec":
        return cls(
            channels=tuple(cfg.channels),
            emb_channels=cfg.emb_channels,
            patch_size=cfg.patch_size,
            block_types=tuple(cfg.block_types),
            block_dropouts=tuple(cfg.block_dropouts),
            num_updown_blocks=tuple(cfg.num_updown_blocks),
            num_mid_blocks=cfg.num_mid_blocks,
            num_heads=cfg.num_heads,
            pos_emb_type=cfg.pos_emb_type,
            use_checkpointing=tuple(cfg.use_checkpointing),
            max_temporal_length=max_tokens,
        )


class UViT3D(nn.Module):
    """Residual U-ViT video denoiser. Input (B, T, H, W, C) channel-last.

    external_cond (actions): (B, T, D) embedded and added to the noise-level
    embedding (reference u_vit3d.py:295-300).
    """

    spec: UViTSpec
    x_channels: int
    resolution: int
    external_cond_type: Optional[str] = None
    external_cond_dim: int = 0
    external_cond_dropout: float = 0.0
    use_fourier_noise_emb: bool = False
    dtype: jnp.dtype = jnp.float32

    @property
    def num_levels(self) -> int:
        return len(self.spec.channels)

    @property
    def is_transformers(self) -> Tuple[bool, ...]:
        return tuple(bt != "ResBlock" for bt in self.spec.block_types)

    def level_resolution(self, i_level: int) -> int:
        return self.resolution // self.spec.patch_size // (2**i_level)

    # -- building blocks ----------------------------------------------------
    def _ropes(self, i_level: int):
        s = self.spec
        if s.pos_emb_type != "rope" or not self.is_transformers[i_level]:
            return {}
        d = s.channels[i_level] // s.num_heads
        r = self.level_resolution(i_level)
        if s.block_types[i_level] == "TransformerBlock":
            return {"rope": make_rope_3d(d, (s.max_temporal_length, r, r))}
        return {
            "rope_ax1": make_rope_1d(d, s.max_temporal_length),
            "rope_ax2": make_rope_2d(d, (r, r)),
        }

    def _block(self, i_level: int, name: str):
        s = self.spec
        bt = s.block_types[i_level]
        drop = s.block_dropouts[i_level]
        ch = s.channels[i_level]
        if bt == "ResBlock":
            return ResBlock(ch, self.dtype, name=name)
        cls = TransformerBlock
        if s.use_checkpointing[i_level]:
            cls = nn.remat(TransformerBlock, static_argnums=(3,))  # (self, x, emb, train)
        return cls(
            ch,
            s.num_heads,
            dropout=drop,
            use_axial=bt == "AxialTransformerBlock",
            ax1_len=s.max_temporal_length,
            dtype=self.dtype,
            name=name,
            **self._ropes(i_level),
        )

    def _run_block(self, block, x, emb, i_level: int, train: bool):
        """Reshape to token or map form depending on the block type."""
        if self.spec.block_types[i_level] == "ResBlock":
            return block(x, emb)
        # transformer: (BT, h, w, C) -> (B, T*h*w, C); emb map (BT, he, we, E)
        s = self.spec
        T = s.max_temporal_length
        BT, h, w, C = x.shape
        B = BT // T
        E = emb.shape[-1]
        xt = x.reshape(B, T * h * w, C)
        if emb.shape[1] == 1 and emb.shape[2] == 1:  # vector emb map
            et = jnp.broadcast_to(
                emb.reshape(B, T, 1, E), (B, T, h * w, E)
            ).reshape(B, T * h * w, E)
        else:
            et = emb.reshape(B, T * h * w, E)
        xt = block(xt, et, train)
        return xt.reshape(BT, h, w, C)

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
        assert T == s.max_temporal_length, (
            f"U-ViT temporal length fixed at {s.max_temporal_length}, got {T}"
        )
        p = s.patch_size

        # embed_input: patchify + matmul (== stride-p conv)
        x = x.reshape(B * T, H, W, C)
        x = x.reshape(B * T, H // p, p, W // p, p, C)
        x = jnp.moveaxis(x, 2, 3).reshape(B * T, H // p, W // p, p * p * C)
        x = nn.Dense(s.channels[0], dtype=self.dtype, name="embed_input")(x)

        # conditioning embedding (B, T, E) -> per-level maps
        emb = StochasticTimeEmbedding(
            dim=256, emb_dim=s.emb_channels,
            use_fourier=self.use_fourier_noise_emb, dtype=self.dtype,
            name="noise_emb",
        )(noise_levels, train=train)
        emb = self._add_external_cond(emb, external_cond, external_cond_mask, train)
        embs = self._level_embs(emb, B, T)

        hs_before, hs_after = [], []
        blocks_per_level = list(s.num_updown_blocks) + [s.num_mid_blocks]

        # down path
        for i_level in range(self.num_levels - 1):
            for j in range(s.num_updown_blocks[i_level]):
                x = self._run_block(
                    self._block(i_level, f"down_{i_level}_{j}"), x, embs[i_level],
                    i_level, train,
                )
            hs_before.append(x)
            x = Downsample(
                s.channels[i_level + 1], self.dtype, name=f"downsample_{i_level}"
            )(x)
            hs_after.append(x)

        # mid
        for j in range(s.num_mid_blocks):
            x = self._run_block(
                self._block(self.num_levels - 1, f"mid_{j}"), x,
                embs[self.num_levels - 1], self.num_levels - 1, train,
            )

        # up path with single subtract/add skips (SiD2; reference
        # u_vit3d.py:316-332)
        for _i in range(self.num_levels - 1):
            i_level = self.num_levels - 2 - _i
            x = x - hs_after.pop()
            x = Upsample(s.channels[i_level], self.dtype, name=f"upsample_{i_level}")(x)
            x = x + hs_before.pop()
            for j in range(s.num_updown_blocks[i_level]):
                x = self._run_block(
                    self._block(i_level, f"up_{i_level}_{j}"), x, embs[i_level],
                    i_level, train,
                )

        # project_output: matmul + unpatchify (zero-init == zeroed convT)
        x = nn.Dense(
            p * p * self.x_channels,
            kernel_init=nn.initializers.zeros, bias_init=nn.initializers.zeros,
            dtype=self.dtype, name="project_output",
        )(x)
        hh, ww = H // p, W // p
        x = x.reshape(B * T, hh, ww, p, p, self.x_channels)
        x = jnp.moveaxis(x, 3, 2).reshape(B * T, H, W, self.x_channels)
        return x.reshape(B, T, H, W, self.x_channels).astype(jnp.float32)

    # -- conditioning hooks (overridden by the pose variant) -----------------
    def _add_external_cond(self, emb, external_cond, external_cond_mask, train):
        if external_cond is None or not self.external_cond_dim:
            return emb
        from .embeddings import RandomDropoutCondEmbedding

        cond = RandomDropoutCondEmbedding(
            self.spec.emb_channels, self.external_cond_dropout, self.dtype,
            name="cond_emb",
        )(external_cond, external_cond_mask, train)
        return emb + cond.astype(emb.dtype)

    def _level_embs(self, emb, B, T):
        """(B, T, E) vector embedding -> per-level (BT, 1, 1, E) maps."""
        e = emb.reshape(B * T, 1, 1, -1)
        return [e] * self.num_levels


class UViT3DPose(UViT3D):
    """U-ViT with spatial camera-pose conditioning: the pose map (rays /
    ray encodings / Plücker, (B, T, H, W, C')) is patch-embedded, added to
    the noise embedding as a spatial map, and average-pooled per level
    (reference: u_vit3d_pose.py:63-131)."""

    @nn.compact
    def __call__(
        self,
        x: jax.Array,
        noise_levels: jax.Array,
        external_cond: Optional[jax.Array] = None,
        external_cond_mask: Optional[jax.Array] = None,
        train: bool = False,
    ) -> jax.Array:
        assert external_cond is not None, "UViT3DPose requires camera-pose cond"
        return super().__call__(
            x, noise_levels, external_cond, external_cond_mask, train
        )

    def _add_external_cond(self, emb, external_cond, external_cond_mask, train):
        from .embeddings import PatchEmbed, RandomDropoutCondEmbedding

        s = self.spec
        B, T = external_cond.shape[:2]
        pose = PatchEmbed(s.patch_size, s.emb_channels, self.dtype, name="pose_embed")(
            external_cond
        )  # (B, T, h*w, E)
        h = w = self.level_resolution(0)
        pose = pose.reshape(B, T, h, w, s.emb_channels)
        # whole-sample dropout of the pose conditioning (CFG)
        if self.external_cond_dropout > 0 and train:
            rng = self.make_rng("dropout")
            drop = jax.random.uniform(rng, (B,)) < self.external_cond_dropout
            pose = jnp.where(drop[:, None, None, None, None], 0.0, pose)
        elif external_cond_mask is not None:
            m = external_cond_mask.reshape(
                external_cond_mask.shape + (1,) * (pose.ndim - external_cond_mask.ndim)
            )
            pose = jnp.where(m, 0.0, pose)
        # emb: (B, T, E) + pose map -> (B, T, h, w, E)
        return emb[:, :, None, None, :] + pose.astype(emb.dtype)

    def _level_embs(self, emb, B, T):
        """(B, T, h, w, E) map -> avg-pooled per level (BT, h_l, w_l, E)."""
        e0 = emb.reshape(B * T, *emb.shape[2:])
        embs = [e0]
        for i_level in range(1, self.num_levels):
            k = 2**i_level
            embs.append(nn.avg_pool(e0, (k, k), strides=(k, k)))
        return embs
