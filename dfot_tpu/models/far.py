"""FAR-DiT: frame-autoregressive DiT (Flax).

Counterpart of the reference FARDiT (algorithms/dfot/backbones/far/
far_model.py): linear patch embedding, Flux-style 3-axis RoPE over
(frame, h, w) ids, AdaLN-Zero-single blocks, frame-level causal attention
with an ALiBi-like linear bias (slope_scale * frame distance), continuous
AdaLN output head. The causal structure makes it suitable for
chunked autoregressive rollout (chunk_size capping in the sampler).
"""

from __future__ import annotations

import dataclasses
import math
from typing import Optional, Tuple

import flax.linen as nn
import jax
import jax.numpy as jnp
import numpy as np

from .dit import AdaModulation, Mlp, modulate
from .embeddings import (
    LabelEmbedding,
    RoPE,
    TimestepEmbedding,
    apply_rope,
    make_rope_nd,
    timestep_embedding,
)

__all__ = ["FARSpec", "FARDiT"]


@dataclasses.dataclass(frozen=True)
class FARSpec:
    hidden_size: int = 768
    depth: int = 12
    num_heads: int = 12
    mlp_ratio: float = 4.0
    patch_size: int = 2
    axes_dims_rope: Tuple[int, int, int] = (16, 24, 24)
    slope_scale: float = 0.0
    max_temporal_length: int = 16
    use_gradient_checkpointing: bool = False
    remat_policy: Optional[str] = None  # none|dots|attn|dots_attn (models/remat.py)

    @classmethod
    def from_config(cls, cfg, max_tokens: int) -> "FARSpec":
        return cls(
            hidden_size=cfg.hidden_size,
            depth=cfg.depth,
            num_heads=cfg.num_heads,
            mlp_ratio=cfg.mlp_ratio,
            patch_size=cfg.patch_size,
            axes_dims_rope=tuple(cfg.get("axes_dims_rope", (16, 24, 24))),
            slope_scale=cfg.get("slope_scale", 0.0),
            max_temporal_length=max_tokens,
            use_gradient_checkpointing=cfg.get("use_gradient_checkpointing", False),
            remat_policy=cfg.get("remat_policy"),
        )


class FARBlock(nn.Module):
    """AdaLN-Zero-single attention + FF with frame-causal biased attention."""

    dim: int
    num_heads: int
    mlp_ratio: float
    rope: RoPE
    dtype: jnp.dtype = jnp.float32

    @nn.compact
    def __call__(self, x: jax.Array, c: jax.Array, bias: jax.Array) -> jax.Array:
        B, N, C = x.shape
        d = self.dim // self.num_heads
        ln = nn.LayerNorm(use_bias=False, use_scale=False, epsilon=1e-6, dtype=self.dtype)

        shift, scale, gate = AdaModulation(self.dim, 3, self.dtype, name="norm1")(c)
        h = modulate(ln(x), shift, scale)
        qkv = nn.Dense(3 * self.dim, dtype=self.dtype, name="qkv")(h)
        qkv = qkv.reshape(B, N, 3, self.num_heads, d)
        q, k, v = [jnp.moveaxis(qkv[:, :, i], 1, 2) for i in range(3)]
        # per-head RMS q/k norm (reference Attention(qk_norm='rms_norm'))
        from .uvit import RMSNorm

        q = RMSNorm(name="q_norm")(q)
        k = RMSNorm(name="k_norm")(k)
        q, k = apply_rope(q, self.rope), apply_rope(k, self.rope)
        s = jnp.einsum("bhnd,bhmd->bhnm", q, k).astype(jnp.float32) / math.sqrt(d)
        s = s + bias  # frame-causal mask + ALiBi slope
        a = jax.nn.softmax(s, axis=-1).astype(x.dtype)
        from .remat import tag_attn_out

        o = tag_attn_out(jnp.einsum("bhnm,bhmd->bhnd", a, v))
        o = jnp.moveaxis(o, 1, 2).reshape(B, N, C)
        x = x + gate * nn.Dense(self.dim, dtype=self.dtype, name="attn_out")(o)

        shift2, scale2, gate2 = AdaModulation(self.dim, 3, self.dtype, name="norm2")(c)
        h = modulate(ln(x), shift2, scale2)
        # the reference constructs FeedForward without forwarding mlp_ratio,
        # so the hidden width is ALWAYS 4x dim (far_model.py:175-177)
        x = x + gate2 * Mlp(self.dim, int(self.dim * 4.0), self.dtype, name="ff")(h)
        return x


class FARDiT(nn.Module):
    spec: FARSpec
    x_channels: int
    resolution: Tuple[int, int]
    external_cond_type: Optional[str] = None
    external_cond_dim: int = 0
    external_cond_num_classes: Optional[int] = None
    external_cond_dropout: float = 0.1
    use_fourier_noise_emb: bool = False
    dtype: jnp.dtype = jnp.float32

    def _causal_bias(self, T: int, P: int) -> np.ndarray:
        """Frame-level causal mask + slope bias (reference far_model.py:361-384)."""
        N = T * P
        frame = np.arange(N) // P
        allowed = frame[:, None] >= frame[None, :]
        bias = np.where(allowed, 0.0, -1e30)
        rel = self.spec.slope_scale * (frame[None, :] - frame[:, None])
        bias = bias + np.where(allowed, rel, 0.0)
        return bias[None, None].astype(np.float32)  # (1, 1, N, N)

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
        B, T, H, W, Cin = x.shape
        p = s.patch_size
        gh, gw = H // p, W // p
        P = gh * gw

        # pack: (B, T*P, p*p*C) -> linear embed
        tok = x.reshape(B, T, gh, p, gw, p, Cin).transpose(0, 1, 2, 4, 6, 3, 5)
        tok = tok.reshape(B, T * P, Cin * p * p)
        h = nn.Dense(s.hidden_size, dtype=self.dtype, name="x_embedder")(tok)

        # per-frame conditioning embedding, broadcast to patches
        emb = timestep_embedding(noise_levels, 256, downscale_freq_shift=1.0)
        emb = TimestepEmbedding(s.hidden_size, dtype=self.dtype, name="t_embedder")(emb)
        if external_cond is not None and self.external_cond_type is not None:
            cond = LabelEmbedding(
                self.external_cond_num_classes,
                s.hidden_size,
                self.external_cond_dropout,
                name="cond_emb",
            )(external_cond, external_cond_mask, train)
            if cond.ndim == 2:
                cond = cond[:, None]
            emb = emb + cond.astype(emb.dtype)
        c = jnp.repeat(emb, P, axis=1)  # (B, T*P, C)

        head_dim = s.hidden_size // s.num_heads
        if sum(s.axes_dims_rope) != head_dim:
            raise ValueError(
                f"axes_dims_rope {s.axes_dims_rope} must sum to the head dim "
                f"{head_dim} (hidden_size {s.hidden_size} / num_heads "
                f"{s.num_heads}); set ++algorithm.backbone.axes_dims_rope"
            )
        rope = make_rope_nd(s.axes_dims_rope, (s.max_temporal_length, gh, gw))
        bias = jnp.asarray(self._causal_bias(T, P))

        block = FARBlock
        if s.use_gradient_checkpointing:
            from .remat import remat_policy

            block = nn.remat(FARBlock, policy=remat_policy(s.remat_policy))
        for i in range(s.depth):
            h = block(
                s.hidden_size, s.num_heads, s.mlp_ratio, rope, self.dtype,
                name=f"block_{i}",
            )(h, c, bias)

        # continuous AdaLN output head (zero-init)
        mod = nn.Dense(
            2 * s.hidden_size,
            kernel_init=nn.initializers.zeros, bias_init=nn.initializers.zeros,
            dtype=self.dtype, name="norm_out",
        )(nn.silu(c))
        scale, shift = jnp.split(mod, 2, axis=-1)
        ln = nn.LayerNorm(use_bias=False, use_scale=False, epsilon=1e-6, dtype=self.dtype)
        h = ln(h) * (1 + scale) + shift
        out = nn.Dense(
            p * p * Cin,
            kernel_init=nn.initializers.zeros, bias_init=nn.initializers.zeros,
            dtype=self.dtype, name="proj_out",
        )(h)

        out = out.reshape(B, T, gh, gw, Cin, p, p).transpose(0, 1, 2, 5, 3, 6, 4)
        return out.reshape(B, T, H, W, Cin).astype(jnp.float32)
