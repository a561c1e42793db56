"""Embedding modules (Flax linen): noise-level, conditions, RoPE, patchify.

TPU-first choices vs the reference (algorithms/dfot/backbones/modules/embeddings.py):
- Patchify is a reshape + one dense matmul instead of a Conv2d — identical
  math for stride==kernel, but it is a single large MXU matmul with no
  im2col, and maps 1:1 onto the torch conv weights for checkpoint import.
- RoPE cos/sin tables are precomputed host-side (numpy) and closed over as
  device constants; application is two fused elementwise ops.
- All modules take an explicit rng where the reference used global torch
  RNG (dropout of conditions / unknown-noise-token).

Compute dtype is configurable (bf16 on TPU); params stay fp32.
"""

from __future__ import annotations

import math
from typing import Optional, Sequence, Tuple

import flax.linen as nn
import jax
import jax.numpy as jnp
import numpy as np

__all__ = [
    "timestep_embedding",
    "TimestepEmbedding",
    "StochasticTimeEmbedding",
    "FourierEmbedding",
    "LabelEmbedding",
    "RandomDropoutCondEmbedding",
    "PatchEmbed",
    "RoPE",
    "make_rope_nd",
    "make_rope_1d",
    "make_rope_2d",
    "make_rope_3d",
    "apply_rope",
]


def timestep_embedding(
    t: jax.Array,
    dim: int,
    flip_sin_to_cos: bool = True,
    downscale_freq_shift: float = 0.0,
    max_period: float = 10000.0,
) -> jax.Array:
    """DDPM sinusoidal embedding of (possibly fractional) timesteps.

    Accepts any leading shape; returns (..., dim). Matches the diffusers
    convention used by the reference (embeddings.py:115-160) including the
    sin/cos flip.
    """
    half = dim // 2
    # freqs are static: compute in float64 on host (numpy) and embed as an
    # fp32 device constant. Device-side fp32 exp differs from libm by ~1ulp,
    # which multiplied by t<=1000 would shift the sin/cos args by ~1e-3 —
    # enough to break torch-checkpoint forward parity at 1e-4.
    exponent = -math.log(max_period) * np.arange(half, dtype=np.float64)
    exponent = exponent / (half - downscale_freq_shift)
    freqs = jnp.asarray(np.exp(exponent).astype(np.float32))
    emb = t.astype(jnp.float32)[..., None] * freqs
    emb = jnp.concatenate([jnp.sin(emb), jnp.cos(emb)], axis=-1)
    if flip_sin_to_cos:
        emb = jnp.concatenate([emb[..., half:], emb[..., :half]], axis=-1)
    if dim % 2 == 1:
        emb = jnp.pad(emb, [(0, 0)] * (emb.ndim - 1) + [(0, 1)])
    return emb


class TimestepEmbedding(nn.Module):
    """Two-layer SiLU MLP over a sinusoidal (or raw) embedding."""

    emb_dim: int
    dtype: jnp.dtype = jnp.float32

    @nn.compact
    def __call__(self, x: jax.Array) -> jax.Array:
        x = nn.Dense(self.emb_dim, dtype=self.dtype, name="linear_1")(x)
        x = nn.silu(x)
        return nn.Dense(self.emb_dim, dtype=self.dtype, name="linear_2")(x)


class FourierEmbedding(nn.Module):
    """EDM2-style random Fourier features for continuous noise levels
    (reference: embeddings.py:93-110). Frequencies/phases are fixed
    (non-trainable) random draws."""

    dim: int
    bandwidth: float = 1.0

    @nn.compact
    def __call__(self, x: jax.Array) -> jax.Array:
        freqs = self.variable(
            "buffers",
            "freqs",
            lambda: 2 * jnp.pi * jax.random.normal(jax.random.PRNGKey(0), (self.dim,))
            * self.bandwidth,
        ).value
        phases = self.variable(
            "buffers",
            "phases",
            lambda: 2 * jnp.pi * jax.random.uniform(jax.random.PRNGKey(1), (self.dim,)),
        ).value
        y = x.astype(jnp.float32)[..., None] * freqs + phases
        return (jnp.cos(y) * math.sqrt(2.0)).astype(x.dtype)


class StochasticTimeEmbedding(nn.Module):
    """Noise-level embedding with an optional learnable "unknown level" token.

    With probability ``p`` (during training), or wherever ``mask`` is True
    (during inference), the sinusoidal embedding is replaced by a learned
    token (reference: embeddings.py:34-91). ``use_fourier`` switches to
    continuous Fourier features (continuous diffusion).
    """

    dim: int
    emb_dim: int
    use_fourier: bool = False
    p: float = 0.0
    dtype: jnp.dtype = jnp.float32

    @nn.compact
    def __call__(
        self,
        noise_levels: jax.Array,
        mask: Optional[jax.Array] = None,
        train: bool = False,
    ) -> jax.Array:
        if self.use_fourier:
            emb = FourierEmbedding(self.dim, name="fourier")(noise_levels)
        else:
            emb = timestep_embedding(noise_levels, self.dim)
            if self.p > 0.0:
                unknown = self.param(
                    "unknown_token", nn.initializers.normal(1.0), (1, self.dim)
                )
                if train or self.p == 1.0 or mask is None:
                    rng = self.make_rng("dropout")
                    mask = jax.random.uniform(rng, emb.shape[:-1]) < self.p
                emb = jnp.where(mask[..., None], unknown, emb)
        return TimestepEmbedding(self.emb_dim, dtype=self.dtype, name="mlp")(emb)


class LabelEmbedding(nn.Module):
    """Class-label embedding table with CFG dropout to a null class
    (diffusers LabelEmbedding semantics; reference base_backbone.py:46-51)."""

    num_classes: int
    emb_dim: int
    dropout_prob: float = 0.0

    @nn.compact
    def __call__(
        self,
        labels: jax.Array,
        mask: Optional[jax.Array] = None,
        train: bool = False,
    ) -> jax.Array:
        use_null = self.dropout_prob > 0
        table = self.param(
            "embedding_table",
            nn.initializers.normal(0.02),
            (self.num_classes + int(use_null), self.emb_dim),
        )
        labels = labels.astype(jnp.int32)
        if use_null:
            if train:
                rng = self.make_rng("dropout")
                drop = jax.random.uniform(rng, labels.shape) < self.dropout_prob
                labels = jnp.where(drop, self.num_classes, labels)
            elif mask is not None:
                labels = jnp.where(mask, self.num_classes, labels)
        return jnp.take(table, labels, axis=0)


class RandomDropoutCondEmbedding(nn.Module):
    """Continuous condition (e.g. action / camera pose) embedding with
    whole-sample dropout for CFG (reference: embeddings.py:336-407)."""

    emb_dim: int
    dropout_prob: float = 0.0
    dtype: jnp.dtype = jnp.float32

    @nn.compact
    def __call__(
        self,
        cond: jax.Array,
        mask: Optional[jax.Array] = None,
        train: bool = False,
    ) -> jax.Array:
        emb = TimestepEmbedding(self.emb_dim, dtype=self.dtype, name="embedding")(cond)
        if self.dropout_prob > 0 and train:
            rng = self.make_rng("dropout")
            mask = jax.random.uniform(rng, emb.shape[:1]) < self.dropout_prob
        if mask is not None:
            mask = mask.reshape(mask.shape + (1,) * (emb.ndim - mask.ndim))
            emb = jnp.where(mask, 0.0, emb)
        return emb


class PatchEmbed(nn.Module):
    """Patchify + linear projection as reshape + one MXU matmul.

    Input (..., H, W, C) channel-last; output (..., H/p * W/p, dim).
    Equivalent to a stride-p conv (the torch PatchEmbed); the conv kernel
    (out, in, p, p) maps to our dense kernel by transpose/reshape.
    """

    patch_size: int
    dim: int
    dtype: jnp.dtype = jnp.float32

    @nn.compact
    def __call__(self, x: jax.Array) -> jax.Array:
        p = self.patch_size
        *lead, H, W, C = x.shape
        x = x.reshape(*lead, H // p, p, W // p, p, C)
        x = jnp.moveaxis(x, -4, -3)  # (..., H/p, W/p, p, p, C)
        x = x.reshape(*lead, (H // p) * (W // p), p * p * C)
        return nn.Dense(
            self.dim,
            dtype=self.dtype,
            kernel_init=nn.initializers.xavier_uniform(),
            name="proj",
        )(x)


def get_nd_sincos_pos_embed(embed_dim: int, shape: Sequence[int]) -> np.ndarray:
    """N-D sinusoidal position table, (prod(shape), embed_dim) float32.

    Matches the reference's get_nd_sincos_pos_embed (dit_base.py:528-573):
    per-axis 1-D sin||cos tables of dim/ndim channels, concatenated — note
    the reference builds its grid with np.meshgrid's default 'xy' indexing,
    which swaps the first two axes; replicated here for table parity.
    """
    ndim = len(shape)
    assert embed_dim % (2 * ndim) == 0
    grid = np.meshgrid(*[np.arange(s, dtype=np.float32) for s in shape])
    grid = np.stack(grid, axis=0)

    def _1d(dim, pos):
        omega = np.arange(dim // 2, dtype=np.float64) / (dim / 2.0)
        omega = 1.0 / 10000**omega
        out = np.einsum("m,d->md", pos.reshape(-1), omega)
        return np.concatenate([np.sin(out), np.cos(out)], axis=1)

    return np.concatenate(
        [_1d(embed_dim // ndim, grid[i]) for i in range(ndim)], axis=1
    ).astype(np.float32)


# ---------------------------------------------------------------------------
# Rotary position embeddings (axial, N-dimensional)
# ---------------------------------------------------------------------------


class RoPE:
    """Precomputed rotary tables: cos/sin of shape (N_flat, dim).

    Kept as host numpy arrays: modules may be constructed inside a jit trace
    (flax setup), where eager jnp conversion would capture tracers; XLA
    lifts them to device constants at the use site instead."""

    __slots__ = ("cos", "sin", "sizes")

    def __init__(self, cos: np.ndarray, sin: np.ndarray, sizes: Tuple[int, ...]):
        self.cos = np.asarray(cos, dtype=np.float32)
        self.sin = np.asarray(sin, dtype=np.float32)
        self.sizes = sizes


def _axis_freqs(dim: int, seq_len: int, theta: float) -> np.ndarray:
    """Per-axis angles (seq_len, dim), each frequency repeated twice for the
    adjacent-pair rotation convention (reference: embeddings.py:156-215)."""
    freqs = 1.0 / (theta ** (np.arange(0, dim, 2)[: dim // 2] / dim))
    angles = np.outer(np.arange(seq_len, dtype=np.float64), freqs)  # (L, dim//2)
    return np.repeat(angles, 2, axis=-1)  # (L, dim)


def make_rope_nd(
    dims: Sequence[int], sizes: Sequence[int], theta: float = 10000.0
) -> RoPE:
    """Axial RoPE over an N-D grid, flattened row-major to (prod(sizes), sum(dims))."""
    grids = []
    for i, (dim, size) in enumerate(zip(dims, sizes)):
        ang = _axis_freqs(dim, size, theta)  # (size, dim)
        shape = [1] * len(sizes) + [dim]
        shape[i] = size
        ang = ang.reshape(shape)
        ang = np.broadcast_to(ang, tuple(sizes) + (dim,))
        grids.append(ang)
    angles = np.concatenate(grids, axis=-1).reshape(-1, sum(dims))
    return RoPE(np.cos(angles), np.sin(angles), tuple(sizes))


def make_rope_1d(dim: int, seq_len: int, theta: float = 10000.0) -> RoPE:
    return make_rope_nd((dim,), (seq_len,), theta)


def make_rope_2d(dim: int, sizes: Tuple[int, int], theta: float = 10000.0) -> RoPE:
    assert dim % 2 == 0
    return make_rope_nd((dim // 2, dim // 2), sizes, theta)


def make_rope_3d(
    dim: int,
    sizes: Tuple[int, int, int],
    theta: float = 10000.0,
    double_merge: Optional[str] = None,
) -> RoPE:
    """3-axis split matching the reference's uneven-dim rule
    (embeddings.py:243-263): head_dim//2 frequencies split across (T, H, W)
    with H/W getting equal counts.

    double_merge ('concat' | 'interleaved') duplicates the table for twin
    (difference, frame) token streams (reference DoubleRotaryEmbedding3D):
    both streams share positions; concat lays them out [stream0 | stream1]
    along time, interleaved alternates per frame.
    """
    assert dim % 2 == 0
    half = dim // 2
    r = half % 3
    if r == 0:
        parts = (half // 3,) * 3
    elif r == 1:
        parts = (half // 3 + 1, half // 3, half // 3)
    else:
        parts = (half // 3, half // 3 + 1, half // 3 + 1)
    rope = make_rope_nd(tuple(p * 2 for p in parts), sizes, theta)
    if double_merge is None:
        return rope
    T = sizes[0]
    cos = np.asarray(rope.cos).reshape(T, -1, dim)
    sin = np.asarray(rope.sin).reshape(T, -1, dim)
    if double_merge == "concat":
        cos2, sin2 = np.concatenate([cos, cos], 0), np.concatenate([sin, sin], 0)
    elif double_merge == "interleaved":
        cos2, sin2 = np.repeat(cos, 2, axis=0), np.repeat(sin, 2, axis=0)
    else:
        raise ValueError(f"unknown double-rope merge {double_merge}")
    return RoPE(cos2.reshape(-1, dim), sin2.reshape(-1, dim), rope.sizes)


def _rotate_half(x: jax.Array) -> jax.Array:
    """Adjacent-pair rotation: (x0, x1) -> (-x1, x0), interleaved."""
    x = x.reshape(x.shape[:-1] + (-1, 2))
    x1, x2 = x[..., 0], x[..., 1]
    return jnp.stack([-x2, x1], axis=-1).reshape(x.shape[:-2] + (-1,))


def apply_rope(x: jax.Array, rope: RoPE, seq_axis: int = -2) -> jax.Array:
    """Rotate queries/keys: x (..., N, D) with N <= rope table length.

    The table is sliced to the leading N positions (matches the reference's
    freqs[:seq_len] behavior for flattened inputs, embeddings.py:216-227).
    """
    assert seq_axis == -2, "apply_rope expects (..., N, D) layout"
    n = x.shape[-2]
    cos = jnp.asarray(rope.cos[:n], dtype=x.dtype)
    sin = jnp.asarray(rope.sin[:n], dtype=x.dtype)
    return x * cos + _rotate_half(x) * sin
