"""Fused LayerNorm + AdaLN modulate for DiT blocks.

The DiT block computes ``modulate(ln(x), shift, scale)`` with a scale-free
LayerNorm (reference dit_blocks.py:440-510; models/dit.py:DiTBlock). XLA
splits this into a stats+normalize fusion and a multiply-add fusion, and
the stats fusion is the slow one: on the K600 @DiT/XL b8 train step it
runs at ~80-120 GB/s (0.58 ms per (8, 1280, 1152) block — 28 of them,
traces/latent_xl_b8_r5.json) because the lane-dim reduction and the
normalize re-read sit in one badly-pipelined fusion. This kernel does
LN + modulate in a single pass at HBM bandwidth; the VJP recomputes the
stats from the saved input, so nothing extra is materialized.

Math (VJP), with y_n = (x - mu) * rstd and g_ln = g * (1 + scale):
    dx     = rstd * (g_ln - mean(g_ln) - y_n * mean(g_ln * y_n))
    dscale = g * y_n_bf16
    dshift = g
All blocks are independent per token — no cross-grid accumulation.
"""

from __future__ import annotations

import functools
import os
from typing import NamedTuple

import jax
import jax.numpy as jnp
from jax.experimental import pallas as pl

try:  # TPU backend only; tests run interpret mode on CPU
    from jax.experimental.pallas import tpu as pltpu

    _VMEM = pltpu.VMEM
except Exception:  # pragma: no cover
    pltpu = None
    _VMEM = None

_FUSED_LN = os.environ.get("DFOT_FUSED_LN", "1") != "0"
_TEST_INTERPRET = False


def set_fused_ln(enabled: bool) -> None:
    global _FUSED_LN
    _FUSED_LN = enabled


def force_ln_interpret(enabled: bool) -> None:
    global _TEST_INTERPRET
    _TEST_INTERPRET = enabled


class _Spec(NamedTuple):
    eps: float
    block_n: int
    interpret: bool


def _stats(xf, eps):
    mu = jnp.mean(xf, axis=-1, keepdims=True)
    var = jnp.mean(xf * xf, axis=-1, keepdims=True) - mu * mu
    return mu, jax.lax.rsqrt(var + eps)


def _fwd_kernel(x_ref, sh_ref, sc_ref, y_ref, *, spec: _Spec):
    x = x_ref[0]
    xf = x.astype(jnp.float32)
    mu, rstd = _stats(xf, spec.eps)
    yn = ((xf - mu) * rstd).astype(x.dtype)
    y_ref[0] = yn * (1 + sc_ref[0]) + sh_ref[0]


def _bwd_kernel(x_ref, sc_ref, g_ref, dx_ref, dsh_ref, dsc_ref, *, spec: _Spec):
    x = x_ref[0]
    g = g_ref[0]
    xf = x.astype(jnp.float32)
    mu, rstd = _stats(xf, spec.eps)
    yn = (xf - mu) * rstd
    yb = yn.astype(x.dtype)
    gl = (g * (1 + sc_ref[0])).astype(jnp.float32)
    dx = rstd * (
        gl
        - jnp.mean(gl, axis=-1, keepdims=True)
        - yn * jnp.mean(gl * yn, axis=-1, keepdims=True)
    )
    dx_ref[0] = dx.astype(x.dtype)
    dsh_ref[0] = g
    dsc_ref[0] = g * yb


def _pick_bn(n: int, c: int) -> int:
    """Largest 128-multiple divisor of n whose bwd working set (6 blocks
    of (bn, c) — x/scale/g in, dx/dshift/dscale out — double-buffered by
    Mosaic) fits the 16 MB scoped-VMEM limit with headroom."""
    for bn in range(min(n, 1024), 0, -128):
        if n % bn == 0 and 6 * bn * c * 2 <= 7 * 2 ** 20:
            return bn
    return 0


@functools.partial(jax.custom_vjp, nondiff_argnums=(0,))
def _ln_mod_p(spec: _Spec, x, shift, scale):
    return _ln_mod_fwd(spec, x, shift, scale)[0]


def _ln_mod_fwd(spec: _Spec, x, shift, scale):
    B, N, C = x.shape
    bn = spec.block_n
    blk = pl.BlockSpec((1, bn, C), lambda b, j: (b, j, 0), memory_space=_VMEM)
    y = pl.pallas_call(
        functools.partial(_fwd_kernel, spec=spec),
        grid=(B, N // bn),
        in_specs=[blk, blk, blk],
        out_specs=blk,
        out_shape=jax.ShapeDtypeStruct((B, N, C), x.dtype),
        interpret=spec.interpret,
    )(x, shift, scale)
    return y, (x, scale)


def _ln_mod_bwd(spec: _Spec, res, g):
    x, scale = res
    B, N, C = x.shape
    bn = spec.block_n
    blk = pl.BlockSpec((1, bn, C), lambda b, j: (b, j, 0), memory_space=_VMEM)
    shp = jax.ShapeDtypeStruct((B, N, C), x.dtype)
    dx, dsh, dsc = pl.pallas_call(
        functools.partial(_bwd_kernel, spec=spec),
        grid=(B, N // bn),
        in_specs=[blk, blk, blk],
        out_specs=(blk, blk, blk),
        out_shape=(shp, shp, shp),
        interpret=spec.interpret,
    )(x, scale, g)
    return dx, dsh, dsc


_ln_mod_p.defvjp(_ln_mod_fwd, _ln_mod_bwd)


def ln_modulate_eligible(n: int, c: int) -> bool:
    if _TEST_INTERPRET:
        return _pick_bn(n, c) > 0 and c % 128 == 0
    return (
        _FUSED_LN
        and jax.default_backend() == "tpu"
        and _pick_bn(n, c) > 0
        and c % 128 == 0
    )


def ln_modulate(x: jax.Array, shift: jax.Array, scale: jax.Array,
                eps: float = 1e-6) -> jax.Array:
    """modulate(LayerNorm_{no scale/bias}(x), shift, scale) in one pass.

    x/shift/scale: (B, N, C). Caller must check :func:`ln_modulate_eligible`
    (the model keeps ln+modulate as the fallback branch).
    """
    B, N, C = x.shape
    assert shift.shape == x.shape and scale.shape == x.shape, (
        "token-wise conditioning only; broadcast shapes use the fallback"
    )
    spec = _Spec(eps, _pick_bn(N, C), _TEST_INTERPRET)
    return _ln_mod_p(spec, x, shift, scale)
