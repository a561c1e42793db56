"""DiT1D: DiT over 1-D token latents (e.g. TiTok tokens) — Flax.

Counterpart of the reference DIT1D (algorithms/dfot/backbones/dit1d/
dit_model.py): each frame is a row of N latent tokens (x_shape = (C, 1, N),
e.g. taichi (4, 1, 32)); tokens are linearly embedded, the full (T*N)
sequence runs through AdaLN-Zero DiT blocks with per-frame conditioning,
with either full or frame-level temporal-causal attention.
"""

from __future__ import annotations

import dataclasses
import math
from typing import Optional

import flax.linen as nn
import jax
import jax.numpy as jnp
import numpy as np

from .dit import AdaModulation, FinalLayer, Mlp, modulate
from .embeddings import (
    LabelEmbedding,
    StochasticTimeEmbedding,
    timestep_embedding,
)

__all__ = ["DiT1DSpec", "DiT1D"]


@dataclasses.dataclass(frozen=True)
class DiT1DSpec:
    hidden_size: int = 768
    depth: int = 12
    num_heads: int = 12
    mlp_ratio: float = 4.0
    attn_mask_type: str = "full"  # full | temporal_causal
    pos_emb_type: str = "sinusoidal_1d"
    max_temporal_length: int = 16
    use_gradient_checkpointing: bool = False

    @classmethod
    def from_config(cls, cfg, max_tokens: int) -> "DiT1DSpec":
        return cls(
            hidden_size=cfg.hidden_size,
            depth=cfg.depth,
            num_heads=cfg.num_heads,
            mlp_ratio=cfg.mlp_ratio,
            attn_mask_type=cfg.get("attn_mask_type", "full"),
            pos_emb_type=cfg.get("pos_emb_type", "sinusoidal_1d"),
            max_temporal_length=max_tokens,
            use_gradient_checkpointing=cfg.get("use_gradient_checkpointing", False),
        )


class MaskedDiTBlock(nn.Module):
    """DiTBlock with an additive attention-bias input (for causal masks)."""

    dim: int
    num_heads: int
    mlp_ratio: float
    dtype: jnp.dtype = jnp.float32

    @nn.compact
    def __call__(self, x, c, bias):
        B, N, C = x.shape
        d = self.dim // self.num_heads
        ln = nn.LayerNorm(use_bias=False, use_scale=False, epsilon=1e-6, dtype=self.dtype)
        shift, scale, gate = AdaModulation(self.dim, 3, self.dtype, name="mod_attn")(c)
        h = modulate(ln(x), shift, scale)
        qkv = nn.Dense(3 * self.dim, dtype=self.dtype, name="qkv")(h)
        qkv = qkv.reshape(B, N, 3, self.num_heads, d)
        q, k, v = [jnp.moveaxis(qkv[:, :, i], 1, 2) for i in range(3)]
        s = jnp.einsum("bhnd,bhmd->bhnm", q, k).astype(jnp.float32) / math.sqrt(d)
        if bias is not None:
            s = s + bias
        a = jax.nn.softmax(s, axis=-1).astype(x.dtype)
        o = jnp.moveaxis(jnp.einsum("bhnm,bhmd->bhnd", a, v), 1, 2).reshape(B, N, C)
        x = x + gate * nn.Dense(self.dim, dtype=self.dtype, name="proj")(o)
        shift2, scale2, gate2 = AdaModulation(self.dim, 3, self.dtype, name="mod_mlp")(c)
        h = modulate(ln(x), shift2, scale2)
        return x + gate2 * Mlp(self.dim, int(self.dim * self.mlp_ratio), self.dtype, name="mlp")(h)


class DiT1D(nn.Module):
    """Input (B, T, 1, N, C) (or (B, T, N, C)); output same shape."""

    spec: DiT1DSpec
    x_channels: int
    n_tokens: int
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
        orig_shape = x.shape
        if x.ndim == 5:  # (B, T, 1, N, C)
            x = x[:, :, 0]
        B, T, N, C = x.shape

        h = nn.Dense(s.hidden_size, dtype=self.dtype, name="x_embedder")(x)
        h = h.reshape(B, T * N, s.hidden_size)
        pos = timestep_embedding(
            jnp.arange(T * N, dtype=jnp.float32), s.hidden_size, flip_sin_to_cos=False
        )
        h = h + pos[None].astype(h.dtype)

        emb = StochasticTimeEmbedding(
            dim=256, emb_dim=s.hidden_size,
            use_fourier=self.use_fourier_noise_emb, dtype=self.dtype, name="noise_emb",
        )(noise_levels, train=train)
        if external_cond is not None and self.external_cond_type == "label":
            cond = LabelEmbedding(
                self.external_cond_num_classes, s.hidden_size,
                self.external_cond_dropout, name="cond_emb",
            )(external_cond, external_cond_mask, train)
            if cond.ndim == 2:
                cond = cond[:, None]
            emb = emb + cond.astype(emb.dtype)
        c = jnp.repeat(emb, N, axis=1)

        bias = None
        if s.attn_mask_type == "temporal_causal":
            frame = np.arange(T * N) // N
            allowed = frame[:, None] >= frame[None, :]
            bias = jnp.asarray(np.where(allowed, 0.0, -1e30)[None, None], jnp.float32)

        block = MaskedDiTBlock
        if s.use_gradient_checkpointing:
            block = nn.remat(MaskedDiTBlock)
        for i in range(s.depth):
            h = block(
                s.hidden_size, s.num_heads, s.mlp_ratio, self.dtype, name=f"block_{i}"
            )(h, c, bias)

        out = FinalLayer(s.hidden_size, C, self.dtype, name="final_layer")(h, c)
        out = out.reshape(B, T, N, C).astype(jnp.float32)
        return out.reshape(orig_shape)
