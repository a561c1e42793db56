"""Attention ops: Pallas flash-attention (TPU) with an XLA fallback.

The denoiser's hot loop is attention over N = T * H * W / p**2 tokens
(e.g. 8 x 32 x 32 = 8192 for 64px latents at patch 2). The reference uses a
naive O(N^2)-memory SDPA that also materializes attention weights for its
hook system (reference: dit_blocks.py:21-44). Here:

- ``flash_attention``: Pallas TPU kernels for BOTH directions —
  online-softmax forward saving per-row log-sum-exp, blockwise-recomputing
  backward (dq / dk+dv) — O(N) memory, fp32 accumulation, bf16-friendly.
  (XLA's attention VJP materializes the N x N scores, which OOMs HBM at
  video token counts.)
- ``attention``: dispatcher — Pallas on TPU for aligned shapes, XLA's fused
  ``jax.nn.dot_product_attention`` otherwise (also used under
  ``interpret=True`` tests on CPU).
- ``attention_with_weights``: debug path returning the full weight tensor for
  the attention-statistics capture system (parity with the reference's
  attn-map hooks).

Layout notes (v5e): in the forward and dq kernels the per-row statistics
(lse, delta) are carried as (N, 1) column vectors — keepdims reductions keep
them in the sublane dimension with no relayout casts, and (block, 1) tiles
stay tiny in VMEM. The dkv kernel works in the TRANSPOSED orientation
(scores as (block_k, block_q): k along sublanes, q along lanes) so that the
q-block statistics enter as (1, block_q) ROW vectors: they broadcast along
sublanes natively and are DMA'd from HBM as 1 KB rows. The previous design
lane-broadcast lse/delta to the k-block width, which made the kernel
HBM-bound on statistics traffic (256 KB of the 384 KB streamed per q-block
was broadcast copies of two scalars-per-row). All dots take the inputs in
their native dtype (bf16 in production) with fp32 accumulation via
preferred_element_type — pre-casting operands to fp32 forces half-rate fp32
MXU passes. The forward has a second orientation, ``pvt``
(set_flash_forward_variant), that computes o^T = v^T @ p^T so the pv dot's
output width is BLK_Q instead of D — with D = 64 heads that fills all 128
MXU lanes instead of half of them (the qk dot is capped by its D-wide
contraction either way).
"""

from __future__ import annotations

import functools
import math
import os
from typing import Optional

import jax
import jax.numpy as jnp
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu

__all__ = [
    "attention",
    "small_n_attention",
    "flash_attention",
    "set_flash_forward_variant",
    "attention_with_weights",
    "set_attention_capture",
    "attention_capture_enabled",
]

# debug switch: when on, attention modules take the weights-returning path and
# sow the maps into flax 'intermediates' (see utils/attn_capture.py). Changing
# it invalidates jit caches — debug only, like the reference's naive-SDPA
# hook path (dit_blocks.py:21-44).
_CAPTURE_ATTENTION = False


def set_attention_capture(enabled: bool) -> None:
    global _CAPTURE_ATTENTION
    _CAPTURE_ATTENTION = bool(enabled)


def attention_capture_enabled() -> bool:
    return _CAPTURE_ATTENTION


_NEG_INF = -1e30

# exp(x) = exp2(x * log2(e)): folding log2(e) into the softmax scale lets the
# kernels call exp2 directly — one fewer full-tile VPU multiply per score
# block than exp (which lowers to exp2(x * LOG2E) internally anyway).
_LOG2E = 1.4426950408889634

# VMEM budget for holding full k/v in the dq backward kernel; beyond this
# the streaming (HBM DMA) variant is used. Tests shrink it to force streaming.
_DQ_STREAM_BYTES = 6 * 2**20

# backward block caps (see _flash_backward). Chip-swept at the flagship
# shapes (v5e, 2026-08): long (n=8192, d=64) fwd+vjp 12.86 ms @256 ->
# 9.36 @512 -> 8.98 @1024; short/mid (n=2048, d=128) 0.708 ms @512 ->
# 0.359 @1024 (2048 regresses to 0.487 — the full-n score tile starves
# double buffering). Blocks are fitted to divisors of n (_fit_block), so
# these are upper bounds, not exact sizes.
_BWD_CAP_SHORT = 1024  # n <= 4096
_BWD_CAP_LONG = 1024   # longer sequences


def _fit_block(n: int, want: int) -> int:
    """Largest block <= want that divides n (pallas grids drop remainders).

    Prefers the largest power-of-two divisor; falls back to any divisor so
    odd sequence lengths (already block-aligned by callers) stay exact.
    """
    want = min(want, n)
    blk = 1
    while blk * 2 <= want and n % (blk * 2) == 0:
        blk *= 2
    for cand in range(want, blk, -1):
        if n % cand == 0:
            return cand
    return blk


def _flash_kernel(
    q_ref, k_ref, v_ref, o_ref, lse_ref, *, block_k: int, seq_len: int,
    causal: bool, sm_scale: float, aug: bool
):
    """One (batch*head, q-block) program: stream K/V blocks with online softmax.

    Refs are (1, BLK_Q, D) for q/o, (1, N, D) for k/v (whole in VMEM: a few
    thousand tokens * 64-128 dims is well under the ~16MB budget; block
    streaming still bounds the score matrix), (1, BLK_Q, 1) for lse.

    Dots take q/k/v in their NATIVE dtype (bf16 in production) with fp32
    accumulation, like the backward kernels — pre-casting to f32 forces
    half-rate fp32 MXU passes. The softmax scale is folded with log2(e) into
    the max-subtraction and exp2 is called directly (the running max is
    tracked on RAW scores), so no extra full-tile multiply is paid; the
    emitted lse is in scaled natural-log units, as the backward expects.

    When ``aug`` is set, v arrives with a ones column appended (D+1 lanes)
    and the pv dot computes the softmax normalizer l as its last output
    column — the MXU absorbs what was a full-tile VPU reduction per block,
    and l drops out of the carry entirely (the alpha correction applied to
    acc covers it). For d % 128 == 64 the extra column is free: the pv
    output was already padded to the next 128-lane tile. The kernel is
    VPU-bound at these shapes (MXU-ideal is ~2.4 of the measured 4.2 ms at
    (2, 9, 8192, 64) on v5e), so removing one of its three full-tile passes
    is the direct lever.
    """
    q = q_ref[0]
    blk_q, d = q.shape
    num_kb = seq_len // block_k
    q_block_start = pl.program_id(1) * blk_q
    a2 = sm_scale * _LOG2E
    dv = d + 1 if aug else d

    def body(i, carry):
        acc, m_i, l_i = carry  # (blk_q, dv), (blk_q, 1), (blk_q, 1)
        k = k_ref[0, pl.ds(i * block_k, block_k), :]
        v = v_ref[0, pl.ds(i * block_k, block_k), :]
        s = jax.lax.dot_general(
            q, k, (((1,), (1,)), ((), ())), preferred_element_type=jnp.float32
        )  # (blk_q, block_k) — RAW (unscaled) scores
        if causal:
            q_pos = q_block_start + jax.lax.broadcasted_iota(
                jnp.int32, (blk_q, block_k), 0
            )
            k_pos = i * block_k + jax.lax.broadcasted_iota(
                jnp.int32, (blk_q, block_k), 1
            )
            s = jnp.where(q_pos >= k_pos, s, _NEG_INF)
        m_new = jnp.maximum(m_i, jnp.max(s, axis=-1, keepdims=True))
        alpha = jnp.exp2((m_i - m_new) * a2)
        p = jnp.exp2((s - m_new) * a2)
        if not aug:
            l_i = l_i * alpha + jnp.sum(p, axis=-1, keepdims=True)
        acc = acc * alpha + jax.lax.dot_general(
            p.astype(v.dtype), v, (((1,), (0,)), ((), ())),
            preferred_element_type=jnp.float32,
        )
        return acc, m_new, l_i

    acc0 = jnp.zeros((blk_q, dv), jnp.float32)
    m0 = jnp.full((blk_q, 1), _NEG_INF, jnp.float32)
    l0 = jnp.zeros((blk_q, 1), jnp.float32)
    acc, m_i, l_i = jax.lax.fori_loop(0, num_kb, body, (acc0, m0, l0))
    l_i = acc[:, d:] if aug else l_i
    o_ref[0] = (acc[:, :d] * (1.0 / l_i)).astype(o_ref.dtype)
    lse_ref[0] = m_i * sm_scale + jnp.log(l_i)  # (blk_q, 1), scaled units


def _flash_kernel_pvt(
    q_ref, k_ref, vt_ref, ot_ref, lse_ref, *, block_k: int, seq_len: int,
    causal: bool, sm_scale: float, aug: bool
):
    """Transposed-pv forward: one (batch*head, q-block) program computing
    o^T = v^T @ p^T with scores held as (block_k, BLK_Q).

    The row-oriented pv dot has output width D = 64 — half the 128 MXU lanes
    idle. Here the pv dot is (D, block_k) @ (block_k, BLK_Q): contraction
    block_k >= 128 fills the systolic rows and output width BLK_Q >= 512
    fills every lane, lifting the pv dot from ~50% to ~100% MXU utilization
    (the qk dot stays capped by the D=64 contraction either way — same
    orientation trick as the dkv backward kernel). Per-row statistics are
    (1, BLK_Q) ROW vectors that broadcast along sublanes natively. v arrives
    pre-transposed as (1, D, N); o leaves as (1, D, BLK_Q) and is transposed
    back by XLA outside the kernel (a few-MB relayout per call, amortized
    against the pv-dot speedup at video token counts).

    ``aug``: v^T arrives with a ones ROW appended (D+1 sublanes) and the pv
    dot emits the normalizer l as its last output row — one fewer full-tile
    VPU reduction per block (see _flash_kernel). Here the extra row costs
    one more 8-sublane output tile on the pv dot (~12% at D=64) where the
    row orientation gets it free, but the kernel is VPU-bound, so it still
    wins.
    """
    q = q_ref[0]  # (blk_q, d) native dtype
    blk_q = q.shape[0]
    dv = vt_ref.shape[1]  # true head dim, +1 when aug (ones row appended)
    d = dv - 1 if aug else dv
    num_kb = seq_len // block_k
    q_block_start = pl.program_id(1) * blk_q
    a2 = sm_scale * _LOG2E

    def body(i, carry):
        acc, m_i, l_i = carry  # (dv, blk_q), (1, blk_q), (1, blk_q)
        kb = k_ref[0, pl.ds(i * block_k, block_k), :]  # (block_k, d)
        s_t = jax.lax.dot_general(
            kb, q, (((1,), (1,)), ((), ())), preferred_element_type=jnp.float32
        )  # (block_k, blk_q) — RAW scores, transposed
        if causal:
            k_pos = i * block_k + jax.lax.broadcasted_iota(
                jnp.int32, (block_k, blk_q), 0
            )
            q_pos = q_block_start + jax.lax.broadcasted_iota(
                jnp.int32, (block_k, blk_q), 1
            )
            s_t = jnp.where(q_pos >= k_pos, s_t, _NEG_INF)
        m_new = jnp.maximum(m_i, jnp.max(s_t, axis=0, keepdims=True))
        alpha = jnp.exp2((m_i - m_new) * a2)
        p_t = jnp.exp2((s_t - m_new) * a2)
        if not aug:
            l_i = l_i * alpha + jnp.sum(p_t, axis=0, keepdims=True)
        vtb = vt_ref[0, :, pl.ds(i * block_k, block_k)]  # (dv, block_k)
        acc = acc * alpha + jax.lax.dot_general(
            vtb, p_t.astype(vtb.dtype), (((1,), (0,)), ((), ())),
            preferred_element_type=jnp.float32,
        )
        return acc, m_new, l_i

    acc0 = jnp.zeros((dv, blk_q), jnp.float32)
    m0 = jnp.full((1, blk_q), _NEG_INF, jnp.float32)
    l0 = jnp.zeros((1, blk_q), jnp.float32)
    acc, m_i, l_i = jax.lax.fori_loop(0, num_kb, body, (acc0, m0, l0))
    l_i = acc[d:] if aug else l_i
    ot_ref[0] = (acc[:d] * (1.0 / l_i)).astype(ot_ref.dtype)
    lse_ref[0] = m_i * sm_scale + jnp.log(l_i)  # (1, blk_q), scaled units


# forward kernel orientation: "row" (scores (BLK_Q, block_k), o = p @ v) or
# "pvt" (transposed pv, see _flash_kernel_pvt). Module default, overridable
# via DFOT_ATTN_FWD for on-chip A/B; the variants bench
# (scripts/bench_attention_variants.py) measures both.
_FWD_VARIANT = os.environ.get("DFOT_ATTN_FWD", "row")
if _FWD_VARIANT not in ("row", "pvt"):
    _FWD_VARIANT = "row"


def set_flash_forward_variant(name: str) -> None:
    """Switch the default forward orientation for SUBSEQUENT traces.

    Like _CAPTURE_ATTENTION, this is read at trace time: functions already
    jit-compiled keep the orientation they were traced with (jit cache keys
    do not include module globals). Set it before building jitted callables
    (or use DFOT_ATTN_FWD before process start); for an in-process A/B,
    construct separate jitted functions after each switch.
    """
    global _FWD_VARIANT
    if name not in ("row", "pvt"):
        raise ValueError(f"unknown flash forward variant {name!r}")
    _FWD_VARIANT = name


def _flash_forward(
    q: jax.Array,
    k: jax.Array,
    v: jax.Array,
    causal: bool,
    block_q: int,
    block_k: int,
    interpret: bool,
    return_lse: bool = False,
    variant: Optional[str] = None,
    sm_scale: Optional[float] = None,
):
    """q, k, v: (B, H, N, D) -> (B, H, N, D) [, lse (B, H, N, 1)]."""
    b, h, n, d = q.shape
    if sm_scale is None:
        sm_scale = 1.0 / math.sqrt(d)
    block_q = min(block_q, n)
    block_k = min(block_k, n)
    assert n % block_q == 0 and n % block_k == 0, "pad sequence to block multiple"
    variant = variant or _FWD_VARIANT

    qf = q.reshape(b * h, n, d)
    kf = k.reshape(b * h, n, d)
    vf = v.reshape(b * h, n, v.shape[-1])
    # MXU-computed normalizer (see _flash_kernel): free for d % 128 == 64
    # (the pv output tile was already lane-padded); for full-width heads the
    # extra column would double the pv dot's lane tiles, so keep the VPU sum.
    # v may arrive with the ones lane ALREADY appended (qkv_prep aug_v writes
    # it in the same store) — skip the per-eval HBM concat then.
    pre_aug = v.shape[-1] == d + 1
    aug = pre_aug or (d % 128) == 64
    dv = d + 1 if aug else d

    if variant == "pvt":
        vt = jnp.swapaxes(vf, 1, 2)  # (b*h, d[+1], n)
        if aug and not pre_aug:
            vt = jnp.concatenate(
                [vt, jnp.ones((b * h, 1, n), vt.dtype)], axis=1
            )  # (b*h, d+1, n), ones row -> l
        kernel = functools.partial(
            _flash_kernel_pvt, block_k=block_k, seq_len=n, causal=causal,
            sm_scale=sm_scale, aug=aug,
        )
        out_t, lse = pl.pallas_call(
            kernel,
            out_shape=(
                jax.ShapeDtypeStruct((b * h, d, n), q.dtype),
                jax.ShapeDtypeStruct((b * h, 1, n), jnp.float32),
            ),
            grid=(b * h, n // block_q),
            in_specs=[
                pl.BlockSpec((1, block_q, d), lambda i, j: (i, j, 0), memory_space=pltpu.VMEM),
                pl.BlockSpec((1, n, d), lambda i, j: (i, 0, 0), memory_space=pltpu.VMEM),
                pl.BlockSpec((1, dv, n), lambda i, j: (i, 0, 0), memory_space=pltpu.VMEM),
            ],
            out_specs=(
                pl.BlockSpec((1, d, block_q), lambda i, j: (i, 0, j), memory_space=pltpu.VMEM),
                pl.BlockSpec((1, 1, block_q), lambda i, j: (i, 0, j), memory_space=pltpu.VMEM),
            ),
            interpret=interpret,
        )(qf, kf, vt)
        out = jnp.swapaxes(out_t, 1, 2).reshape(b, h, n, d)
        if return_lse:
            return out, jnp.swapaxes(lse, 1, 2).reshape(b, h, n, 1)
        return out

    if aug and not pre_aug:
        vf = jnp.concatenate(
            [vf, jnp.ones((b * h, n, 1), vf.dtype)], axis=-1
        )  # (b*h, n, d+1), ones column -> l
    kernel = functools.partial(
        _flash_kernel, block_k=block_k, seq_len=n, causal=causal,
        sm_scale=sm_scale, aug=aug,
    )
    out, lse = pl.pallas_call(
        kernel,
        out_shape=(
            jax.ShapeDtypeStruct((b * h, n, d), q.dtype),
            jax.ShapeDtypeStruct((b * h, n, 1), jnp.float32),
        ),
        grid=(b * h, n // block_q),
        in_specs=[
            pl.BlockSpec((1, block_q, d), lambda i, j: (i, j, 0), memory_space=pltpu.VMEM),
            pl.BlockSpec((1, n, d), lambda i, j: (i, 0, 0), memory_space=pltpu.VMEM),
            pl.BlockSpec((1, n, dv), lambda i, j: (i, 0, 0), memory_space=pltpu.VMEM),
        ],
        out_specs=(
            pl.BlockSpec((1, block_q, d), lambda i, j: (i, j, 0), memory_space=pltpu.VMEM),
            pl.BlockSpec((1, block_q, 1), lambda i, j: (i, j, 0), memory_space=pltpu.VMEM),
        ),
        interpret=interpret,
    )(qf, kf, vf)
    out = out.reshape(b, h, n, d)
    if return_lse:
        return out, lse.reshape(b, h, n, 1)
    return out


# ---------------------------------------------------------------------------
# flash backward — O(N) memory like the forward
# ---------------------------------------------------------------------------


def _flash_bwd_dq_kernel(
    q_ref, k_ref, v_ref, do_ref, lse_ref, delta_ref, dq_ref,
    *, block_k: int, seq_len: int, causal: bool, sm_scale: float,
):
    """One (batch*head, q-block): dq = sum_k ds @ k with
    ds = p * (dO v^T - delta) * sm_scale, p = exp(q k^T * scale - lse).

    Dots take q/k/v/dO in their NATIVE dtype (bf16 in production) with fp32
    accumulation — pre-casting to f32 halves MXU throughput. ds is computed
    in f32 and cast back to the input dtype for the final accumulation dot.
    """
    q = q_ref[0]
    do = do_ref[0]
    lse2 = lse_ref[0] * _LOG2E  # (blk_q, 1)
    delta = delta_ref[0]        # (blk_q, 1)
    blk_q, d = q.shape
    num_kb = seq_len // block_k
    q_start = pl.program_id(1) * blk_q
    a2 = sm_scale * _LOG2E

    def body(i, dq):
        kb = k_ref[0, pl.ds(i * block_k, block_k), :]
        vb = v_ref[0, pl.ds(i * block_k, block_k), :]
        s = jax.lax.dot_general(
            q, kb, (((1,), (1,)), ((), ())), preferred_element_type=jnp.float32
        )  # RAW scores
        if causal:
            q_pos = q_start + jax.lax.broadcasted_iota(jnp.int32, (blk_q, block_k), 0)
            k_pos = i * block_k + jax.lax.broadcasted_iota(jnp.int32, (blk_q, block_k), 1)
            s = jnp.where(q_pos >= k_pos, s, _NEG_INF)
        p = jnp.exp2(s * a2 - lse2)
        dp = jax.lax.dot_general(
            do, vb, (((1,), (1,)), ((), ())), preferred_element_type=jnp.float32
        )
        # sm_scale rides on the small (block_k, d) k tile, not the full tile
        ds = (p * (dp - delta)).astype(q.dtype)
        kb_s = (kb.astype(jnp.float32) * sm_scale).astype(q.dtype)
        return dq + jax.lax.dot_general(
            ds, kb_s, (((1,), (0,)), ((), ())), preferred_element_type=jnp.float32
        )

    dq = jax.lax.fori_loop(0, num_kb, body, jnp.zeros((blk_q, d), jnp.float32))
    dq_ref[0] = dq.astype(dq_ref.dtype)


def _flash_bwd_dq_stream_kernel(
    q_ref, k_hbm, v_hbm, do_ref, lse_ref, delta_ref, dq_ref,
    *, block_k: int, seq_len: int, causal: bool, sm_scale: float, kv_dtype,
):
    """Streaming variant of the dq kernel for sequences whose full k/v no
    longer fit in VMEM (>~12k tokens bf16): k/v stay in HBM (128-lane padded)
    and are DMA'd per k-block into double-buffered scratch, exactly like the
    dkv kernel streams q. Dots run in the native input dtype (see
    _flash_bwd_dq_kernel)."""
    q = q_ref[0]
    do = do_ref[0]
    lse2 = lse_ref[0] * _LOG2E  # (blk_q, 1)
    delta = delta_ref[0]        # (blk_q, 1)
    blk_q, d = q.shape    # d = 128-lane padded head dim
    num_kb = seq_len // block_k
    q_start = pl.program_id(1) * blk_q
    bh = pl.program_id(0)
    a2 = sm_scale * _LOG2E

    def scoped(k_buf, v_buf, sems):
        def get_copies(slot, i):
            src = pl.ds(i * block_k, block_k)
            return (
                pltpu.make_async_copy(k_hbm.at[bh, src, :], k_buf.at[slot], sems.at[slot, 0]),
                pltpu.make_async_copy(v_hbm.at[bh, src, :], v_buf.at[slot], sems.at[slot, 1]),
            )

        for c in get_copies(0, 0):
            c.start()

        def body(i, dq):
            slot = i % 2

            @pl.when(i + 1 < num_kb)
            def _():
                for c in get_copies((i + 1) % 2, i + 1):
                    c.start()

            for c in get_copies(slot, i):
                c.wait()

            kb = k_buf[slot]
            vb = v_buf[slot]
            s = jax.lax.dot_general(
                q, kb, (((1,), (1,)), ((), ())), preferred_element_type=jnp.float32
            )  # RAW scores
            if causal:
                q_pos = q_start + jax.lax.broadcasted_iota(
                    jnp.int32, (blk_q, block_k), 0
                )
                k_pos = i * block_k + jax.lax.broadcasted_iota(
                    jnp.int32, (blk_q, block_k), 1
                )
                s = jnp.where(q_pos >= k_pos, s, _NEG_INF)
            p = jnp.exp2(s * a2 - lse2)
            dp = jax.lax.dot_general(
                do, vb, (((1,), (1,)), ((), ())), preferred_element_type=jnp.float32
            )
            # sm_scale rides on the small (block_k, d) k tile (see
            # _flash_bwd_dq_kernel)
            ds = (p * (dp - delta)).astype(q.dtype)
            kb_s = (kb.astype(jnp.float32) * sm_scale).astype(q.dtype)
            return dq + jax.lax.dot_general(
                ds, kb_s, (((1,), (0,)), ((), ())), preferred_element_type=jnp.float32
            )

        dq = jax.lax.fori_loop(0, num_kb, body, jnp.zeros((blk_q, d), jnp.float32))
        dq_ref[0] = dq.astype(dq_ref.dtype)

    pl.run_scoped(
        scoped,
        k_buf=pltpu.VMEM((2, block_k, d), kv_dtype),
        v_buf=pltpu.VMEM((2, block_k, d), kv_dtype),
        sems=pltpu.SemaphoreType.DMA((2, 2)),
    )


def _flash_bwd_dkv_kernel(
    q_hbm, k_ref, v_ref, do_hbm, lse_hbm, delta_hbm, dk_ref, dv_ref,
    *, block_q: int, seq_len: int, causal: bool, sm_scale: float,
    q_dtype,
):
    """One (batch*head, k-block): dv = sum_q p^T dO, dk = sum_q ds^T q.

    Works in the TRANSPOSED orientation — scores as (blk_k, block_q), k along
    sublanes and q along lanes — so the q-block statistics enter as
    (1, block_q) ROW vectors that broadcast along sublanes natively and DMA
    from HBM as 1 KB rows (the untransposed layout needed them lane-broadcast
    to the k-block width: 256 KB of redundant HBM traffic per q-block). All
    four dots are natural MXU orientations (no dim-0 contractions) and take
    their operands in the native input dtype with fp32 accumulation.

    q/dO/lse/delta stay in HBM and are DMA'd per q-block into double-buffered
    scratch — full-length VMEM inputs (padded to 128 lanes) would blow the
    scoped budget at video sequence lengths.
    """
    kb = k_ref[0]  # (blk_k, d), native dtype; d is the 128-lane padded head dim
    vb = v_ref[0]
    blk_k, d = kb.shape
    num_qb = seq_len // block_q
    k_start = pl.program_id(1) * blk_k
    bh = pl.program_id(0)
    a2 = sm_scale * _LOG2E  # p = exp2(s_raw * a2 - lse * LOG2E), see dq kernel

    def scoped(q_buf, do_buf, lse_buf, delta_buf, sems):
        def get_copies(slot, i):
            src = pl.ds(i * block_q, block_q)
            return (
                pltpu.make_async_copy(q_hbm.at[bh, src, :], q_buf.at[slot], sems.at[slot, 0]),
                pltpu.make_async_copy(do_hbm.at[bh, src, :], do_buf.at[slot], sems.at[slot, 1]),
                pltpu.make_async_copy(lse_hbm.at[bh, :, src], lse_buf.at[slot], sems.at[slot, 2]),
                pltpu.make_async_copy(delta_hbm.at[bh, :, src], delta_buf.at[slot], sems.at[slot, 3]),
            )

        for c in get_copies(0, 0):
            c.start()

        def body(i, carry):
            dk, dv = carry
            slot = i % 2

            @pl.when(i + 1 < num_qb)
            def _():
                for c in get_copies((i + 1) % 2, i + 1):
                    c.start()

            for c in get_copies(slot, i):
                c.wait()

            q = q_buf[slot]        # (block_q, d) native dtype
            do = do_buf[slot]
            lse = lse_buf[slot]    # (1, block_q) — broadcasts over sublanes
            delta = delta_buf[slot]
            s_t = jax.lax.dot_general(
                kb, q, (((1,), (1,)), ((), ())), preferred_element_type=jnp.float32
            )                      # (blk_k, block_q) — RAW scores
            if causal:
                k_pos = k_start + jax.lax.broadcasted_iota(
                    jnp.int32, (blk_k, block_q), 0
                )
                q_pos = i * block_q + jax.lax.broadcasted_iota(
                    jnp.int32, (blk_k, block_q), 1
                )
                s_t = jnp.where(q_pos >= k_pos, s_t, _NEG_INF)
            p_t = jnp.exp2(s_t * a2 - lse * _LOG2E)
            dv = dv + jax.lax.dot_general(
                p_t.astype(q_dtype), do, (((1,), (0,)), ((), ())),
                preferred_element_type=jnp.float32,
            )
            dp_t = jax.lax.dot_general(
                vb, do, (((1,), (1,)), ((), ())), preferred_element_type=jnp.float32
            )                      # (blk_k, block_q)
            # ds' = p * (dp - delta): the sm_scale factor rides on the small
            # (block_q, d) q tile instead of another full-tile multiply
            ds_t = (p_t * (dp_t - delta)).astype(q_dtype)
            q_s = (q.astype(jnp.float32) * sm_scale).astype(q_dtype)
            dk = dk + jax.lax.dot_general(
                ds_t, q_s, (((1,), (0,)), ((), ())),
                preferred_element_type=jnp.float32,
            )
            return dk, dv

        dk0 = jnp.zeros((blk_k, d), jnp.float32)
        dv0 = jnp.zeros((blk_k, d), jnp.float32)
        dk, dv = jax.lax.fori_loop(0, num_qb, body, (dk0, dv0))
        dk_ref[0] = dk.astype(dk_ref.dtype)
        dv_ref[0] = dv.astype(dv_ref.dtype)

    pl.run_scoped(
        scoped,
        q_buf=pltpu.VMEM((2, block_q, d), q_dtype),
        do_buf=pltpu.VMEM((2, block_q, d), q_dtype),
        lse_buf=pltpu.VMEM((2, 1, block_q), jnp.float32),
        delta_buf=pltpu.VMEM((2, 1, block_q), jnp.float32),
        sems=pltpu.SemaphoreType.DMA((2, 4)),
    )


def _flash_backward(q, k, v, out, lse, g, causal, block_q, block_k, interpret,
                    sm_scale=None):
    b, h, n, d = q.shape
    if sm_scale is None:
        sm_scale = 1.0 / math.sqrt(d)
    # v may carry the pre-appended ones normalizer lane (qkv_prep aug_v);
    # the math below wants the plain d lanes — slice it off, and pad the dv
    # cotangent back to the input shape at the end (the ones lane is a
    # constant, so its cotangent is discarded by every producer).
    pre_aug = v.shape[-1] == d + 1
    if pre_aug:
        v = v[..., :d]
    # the backward holds more live f32 tiles (s, p, dp, ds) than the forward;
    # cap blocks harder so long sequences stay inside scoped VMEM
    cap = _BWD_CAP_SHORT if n <= 4096 else _BWD_CAP_LONG
    block_q = _fit_block(n, min(block_q, cap))
    block_k = _fit_block(n, min(block_k, cap))
    qf, kf, vf = (a.reshape(b * h, n, d) for a in (q, k, v))
    dof = g.reshape(b * h, n, d)
    lsef = lse.reshape(b * h, n, 1)
    delta = jnp.sum(
        g.astype(jnp.float32) * out.astype(jnp.float32), axis=-1, keepdims=True
    ).reshape(b * h, n, 1)

    full = lambda i, j: (i, 0, 0)
    qblk = lambda i, j: (i, j, 0)

    # full k/v in VMEM costs 2 * n * 128 lanes regardless of d (narrow head
    # dims are lane-padded); past the budget, stream k/v from HBM instead
    kv_vmem_bytes = 2 * n * 128 * q.dtype.itemsize
    if kv_vmem_bytes <= _DQ_STREAM_BYTES:
        dq = pl.pallas_call(
            functools.partial(
                _flash_bwd_dq_kernel, block_k=block_k, seq_len=n, causal=causal,
                sm_scale=sm_scale,
            ),
            out_shape=jax.ShapeDtypeStruct((b * h, n, d), q.dtype),
            grid=(b * h, n // block_q),
            in_specs=[
                pl.BlockSpec((1, block_q, d), qblk, memory_space=pltpu.VMEM),
                pl.BlockSpec((1, n, d), full, memory_space=pltpu.VMEM),
                pl.BlockSpec((1, n, d), full, memory_space=pltpu.VMEM),
                pl.BlockSpec((1, block_q, d), qblk, memory_space=pltpu.VMEM),
                pl.BlockSpec((1, block_q, 1), qblk, memory_space=pltpu.VMEM),
                pl.BlockSpec((1, block_q, 1), qblk, memory_space=pltpu.VMEM),
            ],
            out_specs=pl.BlockSpec((1, block_q, d), qblk, memory_space=pltpu.VMEM),
            interpret=interpret,
        )(qf, kf, vf, dof, lsef, delta)
    else:
        # HBM DMA slices must be 128-lane aligned -> pad the head dim
        dq_pad = -d % 128
        qsp, ksp, vsp, dosp = (
            jnp.pad(a, ((0, 0), (0, 0), (0, dq_pad))) for a in (qf, kf, vf, dof)
        )
        dqp = pl.pallas_call(
            functools.partial(
                _flash_bwd_dq_stream_kernel, block_k=128, seq_len=n,
                causal=causal, sm_scale=sm_scale, kv_dtype=q.dtype,
            ),
            out_shape=jax.ShapeDtypeStruct((b * h, n, d + dq_pad), q.dtype),
            grid=(b * h, n // block_q),
            in_specs=[
                pl.BlockSpec((1, block_q, d + dq_pad), qblk, memory_space=pltpu.VMEM),
                pl.BlockSpec(memory_space=pltpu.ANY),  # k stays in HBM
                pl.BlockSpec(memory_space=pltpu.ANY),  # v stays in HBM
                pl.BlockSpec((1, block_q, d + dq_pad), qblk, memory_space=pltpu.VMEM),
                pl.BlockSpec((1, block_q, 1), qblk, memory_space=pltpu.VMEM),
                pl.BlockSpec((1, block_q, 1), qblk, memory_space=pltpu.VMEM),
            ],
            out_specs=pl.BlockSpec(
                (1, block_q, d + dq_pad), qblk, memory_space=pltpu.VMEM
            ),
            interpret=interpret,
        )(qsp, ksp, vsp, dosp, lsef, delta)
        dq = dqp[..., :d]

    # dk/dv: q/dO/lse/delta stay in HBM and are DMA'd per q-block, so every
    # HBM slice must be 128-lane aligned — pad the head dim to 128 (zero
    # lanes are inert through all the dots). The kernel runs transposed, so
    # lse/delta are passed as (b*h, 1, n) rows: the (n, 1) -> (1, n) reshape
    # is order-preserving and the per-q-block DMA slice is a slim f32 row.
    #
    # dkv blocks are picked INDEPENDENTLY of dq's block_q: the dkv kernel
    # streams q/dO from HBM in block_q-sized chunks (purely internal), and
    # each k-block program re-streams the ENTIRE q/dO — so bigger is better
    # on both axes until scoped VMEM runs out. r5 chip sweep
    # (scripts/bench_dkv_blocks.py, trace-timed, traces/dkv_blocks_r5.json):
    #   n=8192 d64 : (bk 512, bq 1024) 7.30 ms 169 TF/s (vs (512,256) 10.7)
    #   n=2048 d128: (bk 512, bq 1024) 0.48 ms 160 TF/s
    #   n=1280 d72 : (bk 640, bq  640) 1.56 ms 138 TF/s (vs (256,640) 2.0 —
    #                the non-pow2 divisor the r4 picker couldn't reach)
    # Rule derived: bq = largest 128-mult divisor <= 1024, bk = largest
    # 128-mult divisor whose scoped buffers (4 f32 score tiles + dbl-buffered
    # q/dO + lse/delta + dk/dv accumulators) fit the 13 MB budget.
    d_pad = -d % 128
    dp_ = d + d_pad
    dkv_block_q = _fit_block(n, 1024)

    def _dkv_vmem(bk, bq):
        return (4 * bk * bq * 4 + 2 * 2 * bq * dp_ * q.dtype.itemsize
                + 2 * 2 * 2 * bq * 4 + 2 * bk * dp_ * 4)

    dkv_block_k = next(
        (bk for bk in range(min(n, 1024), 127, -128)
         if n % bk == 0 and _dkv_vmem(bk, dkv_block_q) <= 13 * 2**20),
        _fit_block(n, 128),  # n < 128: one whole-sequence block
    )
    qp, kp, vp, dop = (
        jnp.pad(a, ((0, 0), (0, 0), (0, d_pad))) for a in (qf, kf, vf, dof)
    )
    lse_t = lsef.reshape(b * h, 1, n)
    delta_t = delta.reshape(b * h, 1, n)

    dk, dv = pl.pallas_call(
        functools.partial(
            _flash_bwd_dkv_kernel, block_q=dkv_block_q, seq_len=n,
            causal=causal, sm_scale=sm_scale, q_dtype=q.dtype,
        ),
        out_shape=(
            jax.ShapeDtypeStruct((b * h, n, d + d_pad), k.dtype),
            jax.ShapeDtypeStruct((b * h, n, d + d_pad), v.dtype),
        ),
        grid=(b * h, n // dkv_block_k),
        in_specs=[
            pl.BlockSpec(memory_space=pltpu.ANY),  # q stays in HBM
            pl.BlockSpec((1, dkv_block_k, d + d_pad), qblk, memory_space=pltpu.VMEM),
            pl.BlockSpec((1, dkv_block_k, d + d_pad), qblk, memory_space=pltpu.VMEM),
            pl.BlockSpec(memory_space=pltpu.ANY),  # dO stays in HBM
            pl.BlockSpec(memory_space=pltpu.ANY),  # lse (1, n) rows
            pl.BlockSpec(memory_space=pltpu.ANY),  # delta (1, n) rows
        ],
        out_specs=(
            pl.BlockSpec((1, dkv_block_k, d + d_pad), qblk, memory_space=pltpu.VMEM),
            pl.BlockSpec((1, dkv_block_k, d + d_pad), qblk, memory_space=pltpu.VMEM),
        ),
        interpret=interpret,
    )(qp, kp, vp, dop, lse_t, delta_t)

    shape = (b, h, n, d)
    dv = dv[..., :d].reshape(shape)
    if pre_aug:
        dv = jnp.pad(dv, [(0, 0)] * 3 + [(0, 1)])
    return (dq.reshape(shape), dk[..., :d].reshape(shape), dv)


def _xla_attention(q, k, v, causal):
    """Fused XLA attention; fp32 softmax accumulation."""
    return jax.nn.dot_product_attention(
        # jax.nn API expects (B, N, H, D)
        q.swapaxes(1, 2),
        k.swapaxes(1, 2),
        v.swapaxes(1, 2),
        is_causal=causal,
    ).swapaxes(1, 2)


@functools.partial(jax.custom_vjp, nondiff_argnums=(3, 4, 5, 6, 7))
def flash_attention(
    q: jax.Array,
    k: jax.Array,
    v: jax.Array,
    causal: bool = False,
    block_q: int = 256,
    block_k: int = 256,
    interpret: bool = False,
    sm_scale: Optional[float] = None,
) -> jax.Array:
    """Pallas flash attention, (B, H, N, D) layout, differentiable.

    ``sm_scale`` defaults to 1/sqrt(D); pass it explicitly when D is a
    LANE-PADDED head dim (e.g. 72 -> 128 for DiT/XL) so the softmax keeps
    the model's true scale — zero pad columns are inert through every dot
    in both directions.
    """
    return _flash_forward(
        q, k, v, causal, block_q, block_k, interpret, sm_scale=sm_scale
    )


def _flash_fwd(q, k, v, causal, block_q, block_k, interpret, sm_scale):
    out, lse = _flash_forward(
        q, k, v, causal, block_q, block_k, interpret, return_lse=True,
        sm_scale=sm_scale,
    )
    return out, (q, k, v, out, lse)


def _flash_bwd(causal, block_q, block_k, interpret, sm_scale, res, g):
    q, k, v, out, lse = res
    return _flash_backward(
        q, k, v, out, lse, g, causal, block_q, block_k, interpret,
        sm_scale=sm_scale,
    )


flash_attention.defvjp(_flash_fwd, _flash_bwd)


def _small_n_kernel(q_ref, k_ref, v_ref, o_ref, *, scale):
    """Whole-sequence attention for tiny N, fully VMEM-resident.

    One batched dot per tile — no online softmax, no HBM round trips
    between score/softmax/output. XLA's batched-GEMM lowering of the same
    op moves q/k/v through HBM between stages; for axial TEMPORAL
    attention (N = 8 frames, tens of thousands of independent items) this
    kernel is ~25% faster end-to-end on v5e and the op is ~1/3 of the
    flagship forward's attention time."""
    q = q_ref[...]   # (G, N, D), native dtype — f32 pre-casting forces
    k = k_ref[...]   # multi-pass fp32 MXU dots (see module docstring)
    v = v_ref[...]
    s = jax.lax.dot_general(
        q, k, (((2,), (2,)), ((0,), (0,))), preferred_element_type=jnp.float32
    ) * scale
    s = s - s.max(axis=-1, keepdims=True)
    p = jnp.exp(s)
    p = p / p.sum(axis=-1, keepdims=True)
    o = jax.lax.dot_general(
        p.astype(v.dtype), v, (((2,), (1,)), ((0,), (0,))),
        preferred_element_type=jnp.float32,
    )
    o_ref[...] = o.astype(o_ref.dtype)


def _small_n_impl(
    q: jax.Array, k: jax.Array, v: jax.Array,
    block_z: int = 0, interpret: bool = False,
) -> jax.Array:
    B, H, N, D = q.shape
    Z = B * H
    if not block_z:
        # scale the item-tile so the kernel's fp32 staging (4 tensors of
        # block_z x N x D plus the block_z x N x N scores) stays well under
        # the ~16MB scoped-VMEM budget; 512 is the measured sweet spot at
        # the reference temporal shape N=8, D=64
        block_z = max(128, 512 * (8 * 64) // (N * D))
    while block_z > 1 and Z % block_z:
        block_z //= 2
    qf, kf, vf = (a.reshape(Z, N, D) for a in (q, k, v))
    spec = pl.BlockSpec((block_z, N, D), lambda i: (i, 0, 0))
    out = pl.pallas_call(
        functools.partial(_small_n_kernel, scale=1.0 / math.sqrt(D)),
        grid=(Z // block_z,),
        in_specs=[spec, spec, spec],
        out_specs=spec,
        out_shape=jax.ShapeDtypeStruct((Z, N, D), q.dtype),
        interpret=interpret,
    )(qf, kf, vf)
    return out.reshape(B, H, N, D)


@jax.custom_vjp
def small_n_attention(q: jax.Array, k: jax.Array, v: jax.Array) -> jax.Array:
    """(B, H, N, D) attention with N small enough that the full row fits a
    VMEM tile (N <= ~32). Grid over the flattened (B*H) item axis.
    Backward delegates to XLA's attention VJP — at these row lengths the
    N x N score tensor is tiny, so recomputation there is free."""
    return _small_n_impl(q, k, v)


def _small_n_fwd(q, k, v):
    return _small_n_impl(q, k, v), (q, k, v)


def _small_n_bwd(res, g):
    q, k, v = res
    _, vjp = jax.vjp(lambda a, b, c: _xla_attention(a, b, c, False), q, k, v)
    return vjp(g)


small_n_attention.defvjp(_small_n_fwd, _small_n_bwd)


def _pick_block(n: int) -> int:
    """Forward q-block size; see _pick_blocks for the (q, k) pair rule.

    Any 128-multiple divisor of n qualifies (the kernels have no
    power-of-two requirement — blocks only index `pl.ds` slices and size
    iotas): n=1280 (the DiT/XL latent shape) gets 640, not 256. Chip sweep
    at (8,16,1280,128): 640-blocks run the forward 2.4x faster than
    256-blocks (128 vs 54 TF/s)."""
    cap = 1024 if n <= 4096 else 512
    for b in range(cap, 127, -128):
        if b <= n and n % b == 0:
            return b
    return 0


def _pick_blocks(n: int) -> tuple:
    """(block_q, block_k) for the forward kernel. v5e in-graph measurements
    at (2, 9, 8192, 64) with the MXU-normalizer kernels: 512x2048 = 3.62 ms
    (85.5 TF/s), 1024x1024 = 3.82, 512x1024 = 3.94, 256x2048 = 3.77,
    512x512 = 4.36. The wide-k shape amortizes the per-block running-max /
    rescale corrections over 4x fewer iterations; its 4MB fp32 score tile
    + whole-sequence k/v still fits scoped VMEM inside the full flagship
    window scan (verified via profile_forward --batch 2), unlike the
    1024x1024 q-tile which blew the budget there."""
    bq = _pick_block(n)
    if n > 4096 and n % 2048 == 0:
        return bq, 2048
    if n > 4096 and n % 1024 == 0:
        return bq, 1024
    if bq and bq < min(n, 1024):
        # the q block was divisor-limited (non-power-of-two n): widen the k
        # block toward whole-sequence so the running-max/rescale corrections
        # amortize over fewer iterations. v5e at (8,16,1280,128):
        # (640,1280) fwd 0.787 ms vs (640,640) 0.838 vs (256,256) 1.985.
        for bk in range(2048, bq, -128):
            if bk <= n and n % bk == 0:
                return bq, bk
    return bq, bq


def _blocks_ok(n: int, d: int) -> bool:
    # head dim must be a multiple of the 64-wide sublane packing; sequence
    # must split into aligned blocks. Below 512 tokens the launch overhead
    # of the (B*H, n/blk) grid loses to XLA's fused attention (measured on
    # v5e at (16, 9, 256, 64): flash 1.2 ms vs XLA 0.66 ms).
    return d % 64 == 0 and _pick_block(n) >= 128 and n >= 512


def _padded_flash(q, k, v, causal, interpret=False):
    """Flash attention for head dims that are NOT 64-multiples (e.g. the
    K600 @DiT/XL recipe: hidden 1152 / 16 heads -> d = 72).

    Lane-pads D to the next multiple of 64, runs the kernels with the TRUE
    softmax scale (1/sqrt(d), not 1/sqrt(d_padded)), and slices back. Zero
    pad columns are inert through every dot in both directions (the padded
    columns of dq/dk/dv come out exactly zero), and JAX transposes the
    pad/slice pair automatically, so the composite is differentiable
    end-to-end. Without this, d=72 models fell back to XLA attention whose
    VJP materializes the (B, H, N, N) scores — at the XL latent recipe's
    n=1280, B=8 that is ~0.8 GB of score traffic per layer per step.
    """
    d = q.shape[-1]
    pad = -d % 64
    qp, kp, vp = (
        jnp.pad(a, ((0, 0), (0, 0), (0, 0), (0, pad))) for a in (q, k, v)
    )
    bq, bk = _pick_blocks(q.shape[-2])
    out = flash_attention(
        qp, kp, vp, causal, bq, bk, interpret, 1.0 / math.sqrt(d)
    )
    return out[..., :d]


# sequence-parallel context: when set (mesh, axis_name), eligible non-causal
# attention calls route through ring attention with the token axis sharded
# over that mesh axis (ops/ring_attention.py). Read at TRACE time, like
# _FWD_VARIANT.
_SEQUENCE_PARALLEL: Optional[tuple] = None


def set_sequence_parallel(mesh, axis_name: str = "tensor") -> None:
    """Route big non-causal attentions through ring attention over one mesh
    axis for SUBSEQUENT traces (pass mesh=None to disable)."""
    global _SEQUENCE_PARALLEL
    if mesh is None:
        _SEQUENCE_PARALLEL = None
        return
    if axis_name not in mesh.shape:
        raise ValueError(f"mesh has no axis {axis_name!r}: {dict(mesh.shape)}")
    _SEQUENCE_PARALLEL = (mesh, axis_name)


def attention(
    q: jax.Array,
    k: jax.Array,
    v: jax.Array,
    causal: bool = False,
    force_pallas: Optional[bool] = None,
) -> jax.Array:
    """Attention dispatcher, (B, H, N, D) layout.

    Uses the Pallas kernel on TPU when shapes are tile-aligned (lane-padding
    non-64-multiple head dims), otherwise the fused XLA path (which is also
    what CPU tests exercise).
    """
    n, d = q.shape[-2], q.shape[-1]
    if _SEQUENCE_PARALLEL is not None and not causal:
        mesh, axis = _SEQUENCE_PARALLEL
        size = mesh.shape[axis]
        # ring only pays when each device holds a sizeable Q block
        if size > 1 and n % size == 0 and n // size >= 128:
            from .ring_attention import sequence_parallel_attention

            return sequence_parallel_attention(q, k, v, mesh, axis_name=axis)
    on_tpu = jax.default_backend() == "tpu"
    if (
        force_pallas is None
        and on_tpu
        and not causal
        and n <= 32
        and d % 64 == 0
        and (q.shape[0] * q.shape[1]) % 128 == 0
    ):
        return small_n_attention(q, k, v)
    use_pallas = (
        force_pallas
        if force_pallas is not None
        else on_tpu and _blocks_ok(n, d)
    )
    if use_pallas:
        bq, bk = _pick_blocks(n)
        return flash_attention(q, k, v, causal, bq, bk)
    if (
        force_pallas is None
        and on_tpu
        and d % 64 != 0
        and _blocks_ok(n, d + (-d % 64))
    ):
        return _padded_flash(q, k, v, causal)
    return _xla_attention(q, k, v, causal)


def attention_with_weights(q, k, v, causal: bool = False):
    """Naive attention that also returns the (B, H, N, N) weight tensor.

    Debug/introspection only — feeds the attention-statistics capture
    (reference keeps a naive SDPA for its attn-map hooks, dit_blocks.py:21-44).
    """
    d = q.shape[-1]
    s = jnp.einsum("bhnd,bhmd->bhnm", q, k).astype(jnp.float32) / math.sqrt(d)
    if causal:
        n, m = s.shape[-2:]
        mask = jnp.tril(jnp.ones((n, m), bool))
        s = jnp.where(mask, s, _NEG_INF)
    w = jax.nn.softmax(s, axis=-1)
    return jnp.einsum("bhnm,bhmd->bhnd", w.astype(q.dtype), v), w
