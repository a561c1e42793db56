"""Fused qkv preparation: packed projection -> per-head q/k/v in kernel layout.

The UViT/DiT attention path between the qkv matmul and the flash kernel is
pure data movement, and XLA materializes every step of it in HBM:

    (B, N, 3*H*D) --reshape--> (B, N, 3, H, D) --moveaxis--> (B, H, N, D)
    --[per-head RMSNorm (f32 stats)]--> --RoPE (rotate-half: slice/negate/
    pad/add)--> --lane-pad D -> 128 (d=72 models)--> kernel operands

On the K600 @DiT/XL train step that chain is ~35 ms of copies/pads per
step (traces/latent_xl_b8_r5.json: 8.4 ms of d->128 pads, 4.5 ms of
rotate-half slice/negate fusions, ~7 ms of RoPE pair pads, ~15 ms of head
layout copies); on the flagship sampling window it is ~0.7 s of the 1.43 s
copy class (COVERAGE.md round-5 decomposition). This kernel does the whole
chain in ONE HBM pass: read a (bn, 3*H*D) token block (contiguous DMA),
norm + rotate in VMEM, write three padded head-major operands.

Two algebraic folds keep the in-kernel work to rolls and multiplies:

- rotate_half((x0,x1) -> (-x1,x0), models/embeddings.py:347-351) is an
  adjacent-lane SWAP times a (-1,+1) sign pattern; the sign is folded into
  the sin table once at trace time (``signed_sin``), so the kernel applies
  RoPE as  y = x*cos + swap(x)*sin_signed  with swap = two lane-rolls and a
  parity select. Head windows start at even lane offsets, so one swap of
  the full (bn, 3HD) tile serves every head.
- the learned RMSNorm scale (UViT q_norm/k_norm, u_vit_blocks.py:203-289)
  commutes through the rotation pairwise:  rope(u*s) = u*(s*cos) +
  swap(u)*(swap(s)*sin_signed). The scale is folded into the tables
  OUTSIDE the kernel (differentiably), so the kernel's norm is pure
  1/rms(x) and scale gradients flow through the fold by autodiff.

The custom VJP re-reads the packed qkv block, recomputes the norm, and
writes the packed gradient in one pass; table cotangents (needed only when
the fold carries a learned scale) accumulate across the batch grid
dimension in f32.

Reference behavior covered: dit_blocks.py qkv split + RotaryEmbedding
apply; u_vit_blocks.py qk RMSNorm + rope (the reference runs these as
separate torch ops; there is no kernel counterpart to cite).
"""

from __future__ import annotations

import functools
import math
import os
from typing import NamedTuple, Optional

import jax
import jax.numpy as jnp
import numpy as np
from jax.experimental import pallas as pl

try:  # TPU backend only; tests run interpret mode on CPU
    from jax.experimental.pallas import tpu as pltpu

    _VMEM = pltpu.VMEM
except Exception:  # pragma: no cover
    pltpu = None
    _VMEM = None


def signed_sin(sin: np.ndarray) -> np.ndarray:
    """Fold rotate_half's (-1,+1) pair sign into the sin table."""
    out = np.array(sin, copy=True)
    out[..., 0::2] = -out[..., 0::2]
    return out


def swap_pairs(x: jax.Array, axis: int = -1) -> jax.Array:
    """Adjacent-pair swap along ``axis`` (pure jnp; used outside kernels)."""
    x = jnp.moveaxis(x, axis, -1)
    y = x.reshape(x.shape[:-1] + (-1, 2))[..., ::-1].reshape(x.shape)
    return jnp.moveaxis(y, -1, axis)


def _swap_matrix(d: int, dtype) -> jax.Array:
    """(d, d) adjacent-pair permutation matrix from XOR-iota (in-kernel)."""
    r = jax.lax.broadcasted_iota(jnp.int32, (d, d), 0)
    c = jax.lax.broadcasted_iota(jnp.int32, (d, d), 1)
    return ((r ^ 1) == c).astype(dtype)


def _kernel_swap(x, P):
    """Adjacent-lane swap inside a kernel, as a one-hot MXU dot.

    Measured on v5e at (8, 1280, 3456) bf16: lane rotates fail to lower
    (tpu.dynamic_rotate on multi-tile vectors is an unimplemented Mosaic
    path) and the slice+concat shift runs at crossbar speed (~43 GB/s);
    the permutation dot rides the otherwise-idle MXU and is exact (each
    output lane sums exactly one product)."""
    return jax.lax.dot_general(
        x, P, (((1,), (0,)), ((), ())), preferred_element_type=jnp.float32
    ).astype(x.dtype)


class _Spec(NamedTuple):
    heads: int
    head_dim: int
    d_out: int
    norm: bool
    eps: float
    tables_diff: bool
    block_n: int
    interpret: bool
    aug_v: bool = False  # append a ones lane to v (flash normalizer column)
    # bwd kernel block (0 -> pure-JAX VJP fallback). The bwd keeps far more
    # live f32 rows than the fwd (unrolled per-head rotate/norm cotangents +
    # the dqkv concat), so it needs its own, smaller, VMEM-calibrated block:
    # Mosaic measured 26.64 MB scoped at (bn=512, W=1728, H=9, DP=64) — the
    # fwd-derived bn=512 OOMs the 16 MB limit (r5 flagship-train regression).
    block_n_bwd: int = 0


def _prep_kernel(qkv_ref, cq_ref, sq_ref, ck_ref, sk_ref,
                 qo_ref, ko_ref, vo_ref, *, spec: _Spec):
    H, D, DP = spec.heads, spec.head_dim, spec.d_out
    tile = qkv_ref[0]  # (bn, 3*H*D)
    P = _swap_matrix(D, tile.dtype)
    tabs = ((cq_ref[...], sq_ref[...]), (ck_ref[...], sk_ref[...]), None)
    outs = (qo_ref, ko_ref, vo_ref)
    pad = [(0, 0), (0, DP - D)]
    for s in range(3):
        heads = []
        for h in range(H):
            off = (s * H + h) * D
            x = tile[:, off:off + D]
            if s < 2:
                if spec.norm:
                    xf = x.astype(jnp.float32)
                    r = jax.lax.rsqrt(
                        jnp.mean(xf * xf, axis=-1, keepdims=True) + spec.eps
                    )
                    x = (xf * r).astype(tile.dtype)
                cos, sin = tabs[s]
                x = x * cos + _kernel_swap(x, P) * sin
            if s == 2 and spec.aug_v:
                # ones normalizer lane for the flash pv dot — written in the
                # same store the kernel already does (no HBM pad op)
                x = jnp.pad(x, [(0, 0), (0, 1)], constant_values=1.0)
            elif DP > D:
                x = jnp.pad(x, pad)
            heads.append(x)
        outs[s][0] = jnp.stack(heads, axis=0)


def _bwd_kernel(qkv_ref, cq_ref, sq_ref, ck_ref, sk_ref,
                dq_ref, dk_ref, dv_ref,
                dqkv_ref, dcq_ref, dsq_ref, dck_ref, dsk_ref,
                *, spec: _Spec):
    # grid is (N // bn, B) — batch INNERMOST so every revisit of a table-
    # cotangent block is consecutive and the accumulation buffer persists
    H, D = spec.heads, spec.head_dim
    b = pl.program_id(1)
    tile = qkv_ref[0]
    P = _swap_matrix(D, tile.dtype)
    tabs = ((cq_ref[...], sq_ref[...]), (ck_ref[...], sk_ref[...]))
    drefs = (dq_ref, dk_ref)
    pieces = []
    taccs = [None, None]  # (dC, dS) f32 accumulators per stream
    for s in range(3):
        for h in range(H):
            off = (s * H + h) * D
            if s == 2:
                pieces.append(dv_ref[0, h][:, :D])
                continue
            dy = drefs[s][0, h][:, :D]
            cos, sin = tabs[s]
            du = dy * cos + _kernel_swap(dy * sin, P)
            if spec.norm:
                xf = tile[:, off:off + D].astype(jnp.float32)
                r = jax.lax.rsqrt(
                    jnp.mean(xf * xf, axis=-1, keepdims=True) + spec.eps
                )
                gf = du.astype(jnp.float32)
                dx = r * gf - xf * (
                    r * r * r * jnp.mean(gf * xf, axis=-1, keepdims=True)
                )
                pieces.append(dx.astype(tile.dtype))
            else:
                pieces.append(du)
            if spec.tables_diff:
                if spec.norm:
                    u = (xf * r).astype(tile.dtype)
                else:
                    u = tile[:, off:off + D]
                swu = _kernel_swap(u, P)
                dyf = dy.astype(jnp.float32)
                dc = u.astype(jnp.float32) * dyf
                ds = swu.astype(jnp.float32) * dyf
                if taccs[s] is None:
                    taccs[s] = [dc, ds]
                else:
                    taccs[s][0] += dc
                    taccs[s][1] += ds
    dqkv_ref[0] = jnp.concatenate(pieces, axis=1)
    if spec.tables_diff:
        for s, (dc_ref, ds_ref) in enumerate(
            ((dcq_ref, dsq_ref), (dck_ref, dsk_ref))
        ):
            dc, ds = taccs[s]

            @pl.when(b == 0)
            def _init(dc_ref=dc_ref, ds_ref=ds_ref, dc=dc, ds=ds):
                dc_ref[...] = dc
                ds_ref[...] = ds

            @pl.when(b > 0)
            def _acc(dc_ref=dc_ref, ds_ref=ds_ref, dc=dc, ds=ds):
                dc_ref[...] += dc
                ds_ref[...] += ds
    else:
        # constant tables: cotangents unused; still must be written once
        @pl.when(b == 0)
        def _zero():
            for ref in (dcq_ref, dsq_ref, dck_ref, dsk_ref):
                ref[...] = jnp.zeros_like(ref)


def _pick_bn(n: int, bytes_per_token: int = 0,
             budget: int = 7 * 2 ** 20) -> int:
    """Largest 128-multiple divisor of n whose per-block working set fits
    scoped VMEM. ``bytes_per_token`` is the sum over all in/out block rows
    of one grid step; Mosaic double-buffers every block, so the budget is
    half the 16 MB scoped limit (minus headroom for stack temporaries —
    measured OOM at 23.4 MB total for bn=640, W=3456, H=16, DP=128)."""
    for bn in range(min(n, 1024), 0, -128):
        if n % bn == 0 and bn * bytes_per_token <= budget:
            return bn
    return 0


def _prep_bytes_per_token(W: int, H: int, D: int, DP: int,
                          itemsize: int = 2) -> int:
    """Forward-pass working set per token row: qkv in + 3 head-major out
    blocks + 4 bf16 tables (each double-buffered — covered by the halved
    budget in :func:`_pick_bn`)."""
    return (2 * W + 3 * H * DP + 4 * D) * itemsize + 4 * D * 4


def _bwd_bytes_per_token(W: int, H: int, DP: int) -> int:
    """TOTAL scoped-VMEM bytes per token row of the bwd kernel (block
    buffers incl. double-buffering + Mosaic stack temporaries), calibrated
    against two chip measurements: 26.64 MB at (bn=512, W=1728, H=9,
    DP=64) -> 53.3 KB/token (this model: 55.3, conservative), and the
    known-compiling XL-latent config (bn=128, W=3456, H=16, DP=128)
    <= 16 MB (this model: 15.5 MB). Use with ``budget=_BWD_VMEM_BUDGET``
    (NOT the halved fwd budget — double-buffering is already counted)."""
    return 28 * W + 12 * H * DP


_BWD_VMEM_BUDGET = 15_750_000  # just under the 16 MB scoped limit


@functools.partial(jax.custom_vjp, nondiff_argnums=(0,))
def _qkv_prep_p(spec: _Spec, qkv, cq, sq, ck, sk):
    return _qkv_prep_fwd(spec, qkv, cq, sq, ck, sk)[0]


def _pallas_prep(spec: _Spec, qkv, cq, sq, ck, sk):
    B, N, W = qkv.shape
    H, D, DP, bn = spec.heads, spec.head_dim, spec.d_out, spec.block_n
    DV = DP + 1 if spec.aug_v else DP
    grid = (B, N // bn)
    tab_spec = pl.BlockSpec((bn, D), lambda b, j: (j, 0), memory_space=_VMEM)
    qk_spec = pl.BlockSpec((1, H, bn, DP), lambda b, j: (b, 0, j, 0),
                           memory_space=_VMEM)
    v_spec = pl.BlockSpec((1, H, bn, DV), lambda b, j: (b, 0, j, 0),
                          memory_space=_VMEM)
    return pl.pallas_call(
        functools.partial(_prep_kernel, spec=spec),
        grid=grid,
        in_specs=[
            pl.BlockSpec((1, bn, W), lambda b, j: (b, j, 0), memory_space=_VMEM),
            tab_spec, tab_spec, tab_spec, tab_spec,
        ],
        out_specs=(qk_spec, qk_spec, v_spec),
        out_shape=(
            jax.ShapeDtypeStruct((B, H, N, DP), qkv.dtype),
            jax.ShapeDtypeStruct((B, H, N, DP), qkv.dtype),
            jax.ShapeDtypeStruct((B, H, N, DV), qkv.dtype),
        ),
        interpret=spec.interpret,
    )(qkv, cq, sq, ck, sk)


def _qkv_prep_fwd(spec: _Spec, qkv, cq, sq, ck, sk):
    out = _pallas_prep(spec, qkv, cq, sq, ck, sk)
    return out, (qkv, cq, sq, ck, sk)


def _bwd_jax(spec: _Spec, res, g):
    """Pure-JAX VJP of :func:`_pallas_prep` — the fallback when no bwd
    block fits scoped VMEM. Mirrors :func:`_bwd_kernel` exactly: rotate the
    cotangent back (dy*cos + swap(dy*sin)), RMSNorm backward in f32, padded
    lanes and the aug-v ones lane dropped (constants), table cotangents
    summed over batch and heads."""
    qkv, cq, sq, ck, sk = res
    dq, dk, dv = g
    B, N, W = qkv.shape
    H, D = spec.heads, spec.head_dim
    x = qkv.reshape(B, N, 3, H, D)
    streams, dtabs = [], []
    for s, (dy, cos, sin) in enumerate(((dq, cq, sq), (dk, ck, sk))):
        dy = jnp.moveaxis(dy[..., :D], 1, 2)  # (B, H, N, DP) -> (B, N, H, D)
        cosb = cos[None, :, None, :].astype(dy.dtype)
        sinb = sin[None, :, None, :].astype(dy.dtype)
        du = dy * cosb + swap_pairs(dy * sinb)
        xs_ = x[:, :, s]
        if spec.norm:
            xf = xs_.astype(jnp.float32)
            r = jax.lax.rsqrt(
                jnp.mean(xf * xf, axis=-1, keepdims=True) + spec.eps
            )
            gf = du.astype(jnp.float32)
            dx = r * gf - xf * (
                r * r * r * jnp.mean(gf * xf, axis=-1, keepdims=True)
            )
            streams.append(dx.astype(qkv.dtype))
            u = (xf * r).astype(qkv.dtype)
        else:
            streams.append(du)
            u = xs_
        if spec.tables_diff:
            dyf = dy.astype(jnp.float32)
            dtabs.append(jnp.sum(u.astype(jnp.float32) * dyf, axis=(0, 2)))
            dtabs.append(
                jnp.sum(swap_pairs(u).astype(jnp.float32) * dyf, axis=(0, 2))
            )
    streams.append(jnp.moveaxis(dv[..., :D], 1, 2))
    dqkv = jnp.stack(streams, axis=2).reshape(B, N, W)
    if spec.tables_diff:
        dcq, dsq, dck, dsk = dtabs
        return dqkv, dcq.astype(cq.dtype), dsq.astype(sq.dtype), \
            dck.astype(ck.dtype), dsk.astype(sk.dtype)
    z = jnp.zeros_like
    return dqkv, z(cq), z(sq), z(ck), z(sk)


def _qkv_prep_bwd(spec: _Spec, res, g):
    if not spec.block_n_bwd and not spec.interpret:
        return _bwd_jax(spec, res, g)
    qkv, cq, sq, ck, sk = res
    dq, dk, dv = g
    B, N, W = qkv.shape
    H, D, DP = spec.heads, spec.head_dim, spec.d_out
    bn = spec.block_n_bwd or spec.block_n
    DV = DP + 1 if spec.aug_v else DP
    grid = (N // bn, B)  # batch innermost: table-grad blocks accumulate
    tab_spec = pl.BlockSpec((bn, D), lambda j, b: (j, 0), memory_space=_VMEM)
    g_spec = pl.BlockSpec((1, H, bn, DP), lambda j, b: (b, 0, j, 0),
                          memory_space=_VMEM)
    gv_spec = pl.BlockSpec((1, H, bn, DV), lambda j, b: (b, 0, j, 0),
                           memory_space=_VMEM)
    dtab_shape = jax.ShapeDtypeStruct((N, D), jnp.float32)
    dqkv, dcq, dsq, dck, dsk = pl.pallas_call(
        functools.partial(_bwd_kernel, spec=spec),
        grid=grid,
        in_specs=[
            pl.BlockSpec((1, bn, W), lambda j, b: (b, j, 0), memory_space=_VMEM),
            tab_spec, tab_spec, tab_spec, tab_spec,
            g_spec, g_spec, gv_spec,
        ],
        out_specs=(
            pl.BlockSpec((1, bn, W), lambda j, b: (b, j, 0), memory_space=_VMEM),
            tab_spec, tab_spec, tab_spec, tab_spec,
        ),
        out_shape=(
            jax.ShapeDtypeStruct((B, N, W), qkv.dtype),
            dtab_shape, dtab_shape, dtab_shape, dtab_shape,
        ),
        interpret=spec.interpret,
    )(qkv, cq, sq, ck, sk, dq, dk, dv)
    if spec.tables_diff:
        return dqkv, dcq.astype(cq.dtype), dsq.astype(sq.dtype), \
            dck.astype(ck.dtype), dsk.astype(sk.dtype)
    z = jnp.zeros_like
    return dqkv, z(cq), z(sq), z(ck), z(sk)


_qkv_prep_p.defvjp(_qkv_prep_fwd, _qkv_prep_bwd)


def qkv_prep(
    qkv: jax.Array,
    heads: int,
    head_dim: int,
    cos: jax.Array,
    sin_signed: jax.Array,
    *,
    q_scale: Optional[jax.Array] = None,
    k_scale: Optional[jax.Array] = None,
    norm: bool = False,
    eps: float = 1e-6,
    d_out: Optional[int] = None,
    aug_v: bool = False,
    interpret: bool = False,
):
    """(B, N, 3*H*D) packed qkv -> q, k (B, H, N, d_out), v (B, H, N,
    d_out [+1 with ``aug_v``]).

    ``cos``/``sin_signed``: (N, D) tables, sign already folded
    (:func:`signed_sin`). With ``norm`` the kernel applies per-head
    1/rms(x) to q and k; a learned scale must be passed via
    ``q_scale``/``k_scale`` (folded into the tables here, differentiably).
    ``d_out`` lane-pads each head with zeros (e.g. 72 -> 128); pass the
    TRUE-scale sm_scale = 1/sqrt(head_dim) to the attention kernel after.
    ``aug_v`` appends the flash kernels' ones normalizer lane to v in the
    same store (otherwise a per-eval HBM concat in _flash_forward,
    ~88 ms/window in the flagship rollout trace); requires d_out == D.
    """
    B, N, W = qkv.shape
    assert W == 3 * heads * head_dim, (W, heads, head_dim)
    assert head_dim % 2 == 0
    DP = d_out or head_dim
    assert not (aug_v and DP != head_dim), "aug_v is for unpadded heads only"
    bn = _pick_bn(N, _prep_bytes_per_token(W, heads, head_dim, DP))
    assert bn, f"N={N} not divisible by a VMEM-feasible 128-multiple block"
    bn_bwd = _pick_bn(N, _bwd_bytes_per_token(W, heads, DP),
                      budget=_BWD_VMEM_BUDGET)
    dt = qkv.dtype
    cos = cos.astype(jnp.float32)
    sin = sin_signed.astype(jnp.float32)
    if q_scale is not None:
        cq = (cos * q_scale).astype(dt)
        sq = (sin * swap_pairs(q_scale)).astype(dt)
    else:
        cq, sq = cos.astype(dt), sin.astype(dt)
    if k_scale is not None:
        ck = (cos * k_scale).astype(dt)
        sk = (sin * swap_pairs(k_scale)).astype(dt)
    else:
        ck, sk = cos.astype(dt), sin.astype(dt)
    tables_diff = q_scale is not None or k_scale is not None
    spec = _Spec(heads, head_dim, DP, norm, eps, tables_diff, bn, interpret,
                 aug_v, bn_bwd)
    return _qkv_prep_p(spec, qkv, cq, sq, ck, sk)


_FUSED_QKV = os.environ.get("DFOT_FUSED_QKV", "1") != "0"
_TEST_INTERPRET = False  # tests force the fused branch in interpret mode


def set_fused_qkv(enabled: bool) -> None:
    """A/B knob (also DFOT_FUSED_QKV=0). Read at trace time."""
    global _FUSED_QKV
    _FUSED_QKV = enabled


def force_fused_interpret(enabled: bool) -> None:
    """CPU tests: take the fused model branch with interpret-mode kernels."""
    global _TEST_INTERPRET
    _TEST_INTERPRET = enabled


def fused_qkv_eligible(n: int, head_dim: int, heads: int) -> bool:
    """True when attention_from_packed_qkv will take the fused kernel path
    (mirrors the gates of ops.attention's Pallas dispatch)."""
    from . import attention as A

    dp = head_dim + (-head_dim % 64)
    bpt = _prep_bytes_per_token(3 * heads * head_dim, heads, head_dim, dp)
    if _TEST_INTERPRET:
        return _pick_bn(n, bpt) > 0
    if not _FUSED_QKV or jax.default_backend() != "tpu":
        return False
    if A.attention_capture_enabled():
        return False
    if A._SEQUENCE_PARALLEL is not None:
        mesh, axis = A._SEQUENCE_PARALLEL
        size = mesh.shape[axis]
        if size > 1 and n % size == 0 and n // size >= 128:
            return False  # ring attention owns this shape
    return _pick_bn(n, bpt) > 0 and A._blocks_ok(n, dp)


def attention_from_packed_qkv(
    qkv: jax.Array,
    heads: int,
    head_dim: int,
    rope=None,
    *,
    q_scale: Optional[jax.Array] = None,
    k_scale: Optional[jax.Array] = None,
    norm: bool = False,
    eps: float = 1e-6,
    causal: bool = False,
) -> jax.Array:
    """Packed (B, N, 3*H*D) qkv -> attention output (B, N, H*D).

    One fused Pallas pass replaces reshape/moveaxis/norm/rope/lane-pad;
    the flash kernel then runs with the TRUE softmax scale. Caller must
    check :func:`fused_qkv_eligible` first (the model keeps its reference
    chain as the fallback branch so CPU tests and capture paths are
    unchanged).
    """
    from .attention import _pick_blocks, flash_attention

    B, N, W = qkv.shape
    D = head_dim
    DP = D + (-D % 64)
    if rope is not None:
        cos = jnp.asarray(np.asarray(rope.cos)[:N], jnp.float32)
        sin = jnp.asarray(signed_sin(np.asarray(rope.sin)[:N]), jnp.float32)
    else:
        cos = jnp.ones((N, D), jnp.float32)
        sin = jnp.zeros((N, D), jnp.float32)
    # for d % 128 == 64 heads the flash kernel wants v with a ones
    # normalizer lane (see _flash_kernel aug) — write it here for free
    aug_v = DP == D and (DP % 128) == 64
    q, k, v = qkv_prep(
        qkv, heads, D, cos, sin,
        q_scale=q_scale, k_scale=k_scale, norm=norm, eps=eps, d_out=DP,
        aug_v=aug_v, interpret=_TEST_INTERPRET,
    )
    bq, bk = _pick_blocks(N)
    out = flash_attention(
        q, k, v, causal, bq, bk, _TEST_INTERPRET, sm_scale=1.0 / math.sqrt(D)
    )
    return attn_out_collect(out, D, interpret=_TEST_INTERPRET)


# ---------------------------------------------------------------------------
# output side: (B, H, N, DP) attention out -> (B, N, H*D) merged tokens
# ---------------------------------------------------------------------------


def _collect_kernel(o_ref, m_ref, *, H, D):
    m_ref[0] = jnp.concatenate(
        [o_ref[0, h][:, :D] for h in range(H)], axis=1
    )


def _scatter_kernel(g_ref, do_ref, *, H, D, DP):
    pieces = [
        jnp.pad(g_ref[0][:, h * D:(h + 1) * D], [(0, 0), (0, DP - D)])
        if DP > D else g_ref[0][:, h * D:(h + 1) * D]
        for h in range(H)
    ]
    do_ref[0] = jnp.stack(pieces, axis=0)


class _CSpec(NamedTuple):
    heads: int
    head_dim: int
    d_in: int
    block_n: int
    interpret: bool


@functools.partial(jax.custom_vjp, nondiff_argnums=(0,))
def _collect_p(spec: _CSpec, o):
    return _collect_fwd(spec, o)[0]


def _collect_fwd(spec: _CSpec, o):
    B, H, N, DP = o.shape
    D, bn = spec.head_dim, spec.block_n
    out = pl.pallas_call(
        functools.partial(_collect_kernel, H=H, D=D),
        grid=(B, N // bn),
        in_specs=[pl.BlockSpec((1, H, bn, DP), lambda b, j: (b, 0, j, 0),
                               memory_space=_VMEM)],
        out_specs=pl.BlockSpec((1, bn, H * D), lambda b, j: (b, j, 0),
                               memory_space=_VMEM),
        out_shape=jax.ShapeDtypeStruct((B, N, H * D), o.dtype),
        interpret=spec.interpret,
    )(o)
    return out, (B, N)


def _collect_bwd(spec: _CSpec, res, g):
    B, N = res
    H, D, DP, bn = spec.heads, spec.head_dim, spec.d_in, spec.block_n
    do = pl.pallas_call(
        functools.partial(_scatter_kernel, H=H, D=D, DP=DP),
        grid=(B, N // bn),
        in_specs=[pl.BlockSpec((1, bn, H * D), lambda b, j: (b, j, 0),
                               memory_space=_VMEM)],
        out_specs=pl.BlockSpec((1, H, bn, DP), lambda b, j: (b, 0, j, 0),
                               memory_space=_VMEM),
        out_shape=jax.ShapeDtypeStruct((B, H, N, DP), g.dtype),
        interpret=spec.interpret,
    )(g)
    return (do,)


_collect_p.defvjp(_collect_fwd, _collect_bwd)


def attn_out_collect(o: jax.Array, head_dim: int,
                     interpret: bool = False) -> jax.Array:
    """(B, H, N, DP) flash output -> (B, N, H*head_dim): the lane-slice +
    head transpose + merge in one pass (XLA otherwise materializes each)."""
    B, H, N, DP = o.shape
    bn = _pick_bn(N, (H * DP + H * head_dim) * o.dtype.itemsize)
    assert bn, N
    spec = _CSpec(H, head_dim, DP, bn, interpret)
    return _collect_p(spec, o)


def reference_qkv_prep(
    qkv, heads, head_dim, cos, sin_signed,
    *, q_scale=None, k_scale=None, norm=False, eps=1e-6, d_out=None,
    aug_v=False,
):
    """Pure-jnp mirror of :func:`qkv_prep` (CPU fallback + parity oracle)."""
    B, N, W = qkv.shape
    D = head_dim
    DP = d_out or D
    x = qkv.reshape(B, N, 3, heads, D)
    q, k, v = [jnp.moveaxis(x[:, :, i], 1, 2) for i in range(3)]

    def one(t, scale):
        if norm:
            tf = t.astype(jnp.float32)
            r = jax.lax.rsqrt(jnp.mean(tf * tf, axis=-1, keepdims=True) + eps)
            t = (tf * r).astype(qkv.dtype)
        c = cos.astype(jnp.float32)
        s = sin_signed.astype(jnp.float32)
        if scale is not None:
            cs, ss = (c * scale).astype(t.dtype), (s * swap_pairs(scale)).astype(t.dtype)
        else:
            cs, ss = c.astype(t.dtype), s.astype(t.dtype)
        return t * cs + swap_pairs(t) * ss

    q, k = one(q, q_scale), one(k, k_scale)
    if DP > D:
        pad = [(0, 0)] * 3 + [(0, DP - D)]
        q, k, v = (jnp.pad(a, pad) for a in (q, k, v))
    if aug_v:
        v = jnp.pad(v, [(0, 0)] * 3 + [(0, 1)], constant_values=1.0)
    return q, k, v
