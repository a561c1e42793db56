"""DiT1D: DiT over 1-D token latents (e.g. TiTok tokens) — Flax.

Counterpart of the reference DIT1D (algorithms/dfot/backbones/dit1d/
dit_model.py): each frame is a row of N latent tokens (x_shape = (C, 1, N),
e.g. taichi (4, 1, 32)); tokens are linearly embedded, a FIXED 1-D sincos
position table is added (dit_model.py:472-475), and the full (T*N) sequence
runs through DiT blocks with one fused 6-chunk adaLN modulation per block,
per-frame conditioning, and frame-level temporal-causal attention masks.

Reference quirks reproduced exactly (checkpoint parity):
- "share_norm" blocks REPLACE the residual stream with the normed tensor
  before each sub-layer (x = norm(x); ...; x = x + attn_x,
  dit_model.py:248-271),
- the timestep embedder uses the DiT cos-first sinusoid (dit_model.py:141-151),
- the final layer is a plain LayerNorm + zero-init Linear (no AdaLN;
  dit_model.py:453-456),
- rotary mode applies 1-D RoPE over the flattened (T*N) sequence.
"""

from __future__ import annotations

import dataclasses
import math
from typing import Optional

import flax.linen as nn
import jax
import jax.numpy as jnp
import numpy as np

from .dit import Mlp
from .embeddings import (
    LabelEmbedding,
    TimestepEmbedding,
    apply_rope,
    get_nd_sincos_pos_embed,
    make_rope_1d,
    timestep_embedding,
)

__all__ = ["DiT1DSpec", "DiT1D"]


@dataclasses.dataclass(frozen=True)
class DiT1DSpec:
    hidden_size: int = 1152
    depth: int = 28
    num_heads: int = 16
    mlp_ratio: float = 4.0
    learn_sigma: bool = False
    merge_mode: str = "share_norm"  # share_norm | reproduce
    # None | temporal_causal | video_temporal_causal (identical with 0 context
    # tokens; reference dit_model.py:383-433)
    causal_attn_mode: Optional[str] = "video_temporal_causal"
    use_rotary_emb: bool = False
    qk_norm: bool = False
    max_temporal_length: int = 16
    use_gradient_checkpointing: bool = False
    remat_policy: Optional[str] = None  # none|dots|attn|dots_attn (models/remat.py)

    @classmethod
    def from_config(cls, cfg, max_tokens: int) -> "DiT1DSpec":
        return cls(
            hidden_size=cfg.hidden_size,
            depth=cfg.depth,
            num_heads=cfg.num_heads,
            mlp_ratio=cfg.mlp_ratio,
            learn_sigma=cfg.get("learn_sigma", False),
            merge_mode=cfg.get("merge_mode", "share_norm"),
            causal_attn_mode=cfg.get("causal_attn_mode"),
            use_rotary_emb=cfg.get("use_rotary_emb", False),
            qk_norm=cfg.get("qk_norm", False),
            max_temporal_length=max_tokens,
            use_gradient_checkpointing=cfg.get("use_gradient_checkpointing", False),
            remat_policy=cfg.get("remat_policy"),
        )


def _per_frame_modulate(x, shift, scale, N):
    """x (B, T*N, D) modulated with per-frame (B, T, D) tensors."""
    B, TN, D = x.shape
    T = TN // N
    x = x.reshape(B, T, N, D)
    x = x * (1 + scale[:, :, None]) + shift[:, :, None]
    return x.reshape(B, TN, D)


def _per_frame_gate(x, g, N):
    B, TN, D = x.shape
    T = TN // N
    return (x.reshape(B, T, N, D) * g[:, :, None]).reshape(B, TN, D)


class DiT1DBlock(nn.Module):
    """One fused-adaLN DiT block (reference dit_model.py:190-280)."""

    dim: int
    num_heads: int
    mlp_ratio: float
    merge_mode: str
    n_tokens_per_frame: int
    qk_norm: bool = False
    rope: Optional[object] = None
    dtype: jnp.dtype = jnp.float32

    @nn.compact
    def __call__(self, x, t, bias):
        B, TN, D = x.shape
        N = self.n_tokens_per_frame
        d = self.dim // self.num_heads
        ln = nn.LayerNorm(use_bias=False, use_scale=False, epsilon=1e-6, dtype=self.dtype)

        # one fused modulation: 6 chunks from per-frame cond (zero-init)
        mod = nn.Dense(
            6 * self.dim,
            kernel_init=nn.initializers.zeros, bias_init=nn.initializers.zeros,
            dtype=self.dtype, name="adaLN_modulation",
        )(nn.silu(t))
        sh_msa, sc_msa, g_msa, sh_mlp, sc_mlp, g_mlp = jnp.split(mod, 6, axis=-1)

        def attention(h):
            qkv = nn.Dense(3 * self.dim, dtype=self.dtype, name="qkv")(h)
            qkv = qkv.reshape(B, TN, 3, self.num_heads, d)
            q, k, v = [jnp.moveaxis(qkv[:, :, i], 1, 2) for i in range(3)]
            if self.qk_norm:
                # torch nn.LayerNorm defaults: eps=1e-5, elementwise affine
                qn = nn.LayerNorm(epsilon=1e-5, dtype=self.dtype, name="q_norm")
                kn = nn.LayerNorm(epsilon=1e-5, dtype=self.dtype, name="k_norm")
                q, k = qn(q), kn(k)
            if self.rope is not None:
                q, k = apply_rope(q, self.rope), apply_rope(k, self.rope)
            s = jnp.einsum("bhnd,bhmd->bhnm", q, k).astype(jnp.float32) / math.sqrt(d)
            if bias is not None:
                s = s + bias
            a = jax.nn.softmax(s, axis=-1).astype(h.dtype)
            from .remat import tag_attn_out

            o = jnp.moveaxis(
                tag_attn_out(jnp.einsum("bhnm,bhmd->bhnd", a, v)), 1, 2
            )
            return nn.Dense(self.dim, dtype=self.dtype, name="proj")(
                o.reshape(B, TN, D)
            )

        mlp = Mlp(self.dim, int(self.dim * self.mlp_ratio), self.dtype, name="mlp")

        if self.merge_mode == "share_norm":
            # residual-overwrite + msa-modulation-reuse quirks, see module doc
            x = ln(x)
            attn_x = attention(_per_frame_modulate(x, sh_msa, sc_msa, N))
            x = x + _per_frame_gate(attn_x, g_msa, N)
            x = ln(x)
            mlp_x = mlp(_per_frame_modulate(x, sh_mlp, sc_mlp, N))
            x = x + _per_frame_gate(mlp_x, g_mlp, N)
        elif self.merge_mode == "reproduce":
            # standard DiT residuals with whole-sample (first-frame) cond
            # (reference dit_model.py:273-277)
            h = _per_frame_modulate(ln(x), sh_msa[:, :1], sc_msa[:, :1], TN)
            x = x + _per_frame_gate(attention(h), g_msa[:, :1], TN)
            h = _per_frame_modulate(ln(x), sh_mlp[:, :1], sc_mlp[:, :1], TN)
            x = x + _per_frame_gate(mlp(h), g_mlp[:, :1], TN)
        else:
            raise NotImplementedError(f"merge_mode {self.merge_mode!r}")
        return x


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
        if s.learn_sigma:
            # the loss contract expects C output channels; the 2C
            # mean+sigma head has no consumer in this framework (nor does
            # the reference's loss split it) — reject rather than emit
            # shapes that break downstream
            raise NotImplementedError(
                "DiT1D learn_sigma=True has no downstream sigma consumer"
            )
        orig_shape = x.shape
        if x.ndim == 5:  # (B, T, 1, N, C)
            x = x[:, :, 0]
        B, T, N, C = x.shape

        h = nn.Dense(s.hidden_size, dtype=self.dtype, name="x_embedder")(x)
        h = h.reshape(B, T * N, s.hidden_size)
        rope = None
        if s.use_rotary_emb:
            rope = make_rope_1d(s.hidden_size // s.num_heads, T * N)
        else:
            # fixed (non-learnable) sin||cos table over the full token grid
            pos = get_nd_sincos_pos_embed(
                s.hidden_size, (s.max_temporal_length * N,)
            )
            h = h + jnp.asarray(pos[: T * N], h.dtype)[None]

        # DiT-style cos-first timestep embedding (dit_model.py:133-156)
        emb = timestep_embedding(noise_levels, 256, flip_sin_to_cos=True)
        emb = TimestepEmbedding(s.hidden_size, dtype=self.dtype, name="t_embedder")(emb)
        if external_cond is not None and self.external_cond_type == "label":
            cond = LabelEmbedding(
                self.external_cond_num_classes, s.hidden_size,
                self.external_cond_dropout, name="cond_emb",
            )(external_cond, external_cond_mask, train)
            if cond.ndim == 2:
                cond = cond[:, None]
            emb = emb + cond.astype(emb.dtype)

        bias = None
        if s.causal_attn_mode in ("temporal_causal", "video_temporal_causal"):
            frame = np.arange(T * N) // N
            allowed = frame[:, None] >= frame[None, :]
            bias = jnp.asarray(np.where(allowed, 0.0, -np.inf)[None, None], jnp.float32)

        block = DiT1DBlock
        if s.use_gradient_checkpointing:
            from .remat import remat_policy

            block = nn.remat(DiT1DBlock, policy=remat_policy(s.remat_policy))
        for i in range(s.depth):
            h = block(
                s.hidden_size, s.num_heads, s.mlp_ratio, s.merge_mode, N,
                s.qk_norm, rope, self.dtype, name=f"block_{i}",
            )(h, emb, bias)

        # plain LN + zero-init linear head (reference dit_model.py:453-456)
        out_ch = C * (2 if s.learn_sigma else 1)
        ln = nn.LayerNorm(use_bias=False, use_scale=False, epsilon=1e-6, dtype=self.dtype)
        out = nn.Dense(
            out_ch,
            kernel_init=nn.initializers.zeros, bias_init=nn.initializers.zeros,
            dtype=self.dtype, name="final_linear",
        )(ln(h))
        out = out.reshape(B, T, N, out_ch).astype(jnp.float32)
        if len(orig_shape) == 5:
            out = out[:, :, None]
        return out
