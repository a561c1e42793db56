"""Matrix attention blocks (Flax): factorized column x row attention.

Counterpart of the reference's MatrixAttention / MatrixDiTBlock
(algorithms/dfot/backbones/dit/dit_blocks.py:215-650): tokens are arranged
as a (frames L x patches N x channels D) grid; learned projections U (over
the patch axis) and V (over channels) embed the grid, attention runs over
the frame axis treating each (n, d) matrix (or each row, in multi-token
mode) as one attention element, and U/V projections map back.

This is a single large einsum chain — MXU-friendly by construction.
"""

from __future__ import annotations

from typing import Optional

import flax.linen as nn
import jax
import jax.numpy as jnp

from .embeddings import RoPE, apply_rope

__all__ = ["MatrixAttention", "MatrixDiTBlock"]


class MatrixAttention(nn.Module):
    col_dim: int           # N: patches per frame
    row_dim: int           # D: channel dim
    embed_col_dim: int
    embed_row_dim: int
    num_col_heads: int = 4
    num_row_heads: int = 4
    multi_token: bool = False
    flatten_rope: bool = False
    use_bias: bool = False
    fixed_u: Optional[str] = None  # 'identity' or None (learned)
    rope: Optional[RoPE] = None    # temporal RoPE over frames
    dtype: jnp.dtype = jnp.float32

    @nn.compact
    def __call__(self, x: jax.Array) -> jax.Array:
        """x: (B, L, N, D) -> (B, L, N, D)."""
        B, L, N, D = x.shape
        c, r = self.num_col_heads, self.num_row_heads
        n = self.embed_col_dim // c  # head_col_dim
        d = self.embed_row_dim // r  # head_row_dim
        xavier = nn.initializers.xavier_uniform()

        if self.fixed_u == "identity":
            qkv_u = jnp.eye(N, dtype=x.dtype)
            proj_u = jnp.eye(N, dtype=x.dtype)
        else:
            qkv_u = self.param("qkv_u", xavier, (N, self.embed_col_dim))
            proj_u = self.param("proj_u", xavier, (self.embed_col_dim, N))
        qkv_v = self.param("qkv_v", xavier, (D, self.embed_row_dim * 3))
        proj_v = self.param("proj_v", xavier, (self.embed_row_dim, D))

        qkv = jnp.einsum("nm,blnd,dk->blmk", qkv_u, x, qkv_v)
        if self.use_bias:
            qkv = qkv + self.param(
                "qkv_bias", nn.initializers.zeros,
                (self.embed_col_dim, self.embed_row_dim * 3),
            )
        # (B, L, c*n, 3*r*d) -> (3, B, c, r, L, n, d)
        qkv = qkv.reshape(B, L, c, n, 3, r, d)
        qkv = qkv.transpose(4, 0, 2, 5, 1, 3, 6)
        q, k, v = qkv[0], qkv[1], qkv[2]

        if self.rope is not None:
            if self.flatten_rope:
                qf = q.reshape(B, c, r, L, n * d)
                kf = k.reshape(B, c, r, L, n * d)
                q = apply_rope(qf, self.rope).reshape(q.shape)
                k = apply_rope(kf, self.rope).reshape(k.shape)
            else:
                # per-(n) temporal rope over L on the last dim d
                qt = q.transpose(0, 1, 2, 4, 3, 5)  # (B, c, r, n, L, d)
                kt = k.transpose(0, 1, 2, 4, 3, 5)
                q = apply_rope(qt, self.rope).transpose(0, 1, 2, 4, 3, 5)
                k = apply_rope(kt, self.rope).transpose(0, 1, 2, 4, 3, 5)

        if self.multi_token:
            scale = d**-0.5
            qm = q.transpose(0, 1, 2, 4, 3, 5) * scale  # (B, c, r, n, L, d)
            km = k.transpose(0, 1, 2, 4, 3, 5)
            vm = v.transpose(0, 1, 2, 4, 3, 5)
            s = jnp.einsum("bcrnld,bcrnkd->bcrnlk", qm, km).astype(jnp.float32)
            a = jax.nn.softmax(s, axis=-1).astype(x.dtype)
            o = jnp.einsum("bcrnlk,bcrnkd->bcrnld", a, vm)
            o = o.transpose(0, 1, 2, 4, 3, 5)  # back to (B, c, r, L, n, d)
        else:
            scale = (n * d) ** -0.5
            s = jnp.einsum("bcrlnd,bcrknd->bcrlk", q * scale, k).astype(jnp.float32)
            a = jax.nn.softmax(s, axis=-1).astype(x.dtype)
            o = jnp.einsum("bcrlk,bcrknd->bcrlnd", a, v)

        # (B, c, r, L, n, d) -> (B, L, c*n, r*d)
        o = o.transpose(0, 3, 1, 4, 2, 5).reshape(B, L, c * n, r * d)
        out = jnp.einsum("nm,blnd,dk->blmk", proj_u, o, proj_v)
        if self.use_bias:
            out = out + self.param("proj_bias", nn.initializers.zeros, (N, D))
        return out


class MatrixDiTBlock(nn.Module):
    """AdaLN-Zero block whose mixer is MatrixAttention over the frame axis
    (reference: dit_blocks.py:549-650). Input (B, T*P, C) tokens."""

    col_hidden_size: int   # patches per frame
    row_hidden_size: int   # channels
    embed_col_dim: int
    embed_row_dim: int
    num_col_heads: int
    num_row_heads: int
    mlp_ratio: Optional[float] = 4.0
    matrix_rope: Optional[RoPE] = None
    flatten_matrix_rope: bool = False
    matrix_multi_token: bool = False
    use_bias: bool = False
    fixed_u: Optional[str] = None
    dtype: jnp.dtype = jnp.float32

    @nn.compact
    def __call__(self, x: jax.Array, c: jax.Array) -> jax.Array:
        from .dit import AdaModulation, Mlp, modulate

        B, TP, C = x.shape
        T = TP // self.col_hidden_size
        # like the reference DiTBlock, the residual adds onto the AdaLN-normed
        # tensor, not the block input (dit_blocks.py:643-650)
        ln = nn.LayerNorm(use_bias=False, use_scale=False, epsilon=1e-6, dtype=self.dtype)
        shift, scale, gate = AdaModulation(C, 3, self.dtype, name="mod_attn")(c)
        h = modulate(ln(x), shift, scale)
        attn_out = MatrixAttention(
            col_dim=self.col_hidden_size,
            row_dim=self.row_hidden_size,
            embed_col_dim=self.embed_col_dim,
            embed_row_dim=self.embed_row_dim,
            num_col_heads=self.num_col_heads,
            num_row_heads=self.num_row_heads,
            multi_token=self.matrix_multi_token,
            flatten_rope=self.flatten_matrix_rope,
            use_bias=self.use_bias,
            fixed_u=self.fixed_u,
            rope=self.matrix_rope,
            dtype=self.dtype,
            name="attn",
        )(h.reshape(B, T, self.col_hidden_size, C)).reshape(B, TP, C)
        x = h + gate * attn_out
        if self.mlp_ratio is not None and self.mlp_ratio > 0:
            shift2, scale2, gate2 = AdaModulation(C, 3, self.dtype, name="mod_mlp")(c)
            h = modulate(ln(x), shift2, scale2)
            x = h + gate2 * Mlp(C, int(C * self.mlp_ratio), self.dtype, name="mlp")(h)
        return x
