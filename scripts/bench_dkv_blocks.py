"""Chip sweep of the dkv kernel's k-block / q-block widths (in-graph timed).

The dkv picker hardcodes pow-2 candidates (512, 256, 128); at the DiT/XL
latent shape n=1280 that lands on 256 while every other block picker in the
module was taught non-pow2 divisors (640). This times the dkv pallas_call at
candidate (dkv_block_k, block_q) pairs so the picker can be fixed from
measurement, not guesswork.

Timing discipline (r5): the r4 scan-subtraction method — report
(t(ITERS) - t(1)) / (ITERS - 1) — produced a flat ~24-30 ms/iter across a
2.8x FLOP spread, i.e. it measured launch overhead, not the kernel (r4
ADVICE.md, medium). The r5 method reads the kernel's DEVICE time straight
from an xplane trace of the chained scan (profile_forward.parse_xplane,
self-time parse): per-iter = the dkv custom-call's summed self time /
ITERS, immune to tunnel round trips and host gaps. A FLOP-proportionality
cross-check (--iters vs --iters/2) is printed per shape.

All shapes run at the 128-lane-padded head dim exactly like production
(_flash_backward pads d to -d % 128 before the dkv call; unpadded d=64 HBM
DMA slices fail Mosaic's lane-alignment requirement).

Usage: python scripts/bench_dkv_blocks.py [--out traces/dkv_blocks.json]
"""

import argparse
import functools
import json
import math
import os
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

import jax
import jax.numpy as jnp

jax.config.update(
    "jax_compilation_cache_dir",
    os.environ.get("DFOT_COMPILE_CACHE", os.path.expanduser("~/.cache/dfot_jax")),
)
jax.config.update("jax_persistent_cache_min_compile_time_secs", 1.0)

from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu

from dfot_tpu.ops import attention as A

V5E_PEAK = 197e12

# (B, H, N, D_logical, label); the kernel runs at the 128-lane padded dim.
SHAPES = [
    (8, 16, 1280, 72, "ditxl_latent"),
    (2, 9, 8192, 64, "flagship_l2"),
    (2, 9, 2048, 128, "flagship_mid"),
]


def dkv_call(qf, kf, vf, dof, lse_t, delta_t, n, d_log, dkv_block_k, block_q):
    bh, _, dp = qf.shape  # dp = padded head dim
    qblk = lambda i, j: (i, j, 0)
    return pl.pallas_call(
        functools.partial(
            A._flash_bwd_dkv_kernel, block_q=block_q, seq_len=n, causal=False,
            sm_scale=1.0 / math.sqrt(d_log), q_dtype=qf.dtype,
        ),
        out_shape=(
            jax.ShapeDtypeStruct((bh, n, dp), kf.dtype),
            jax.ShapeDtypeStruct((bh, n, dp), vf.dtype),
        ),
        grid=(bh, n // dkv_block_k),
        in_specs=[
            pl.BlockSpec(memory_space=pltpu.ANY),
            pl.BlockSpec((1, dkv_block_k, dp), qblk, memory_space=pltpu.VMEM),
            pl.BlockSpec((1, dkv_block_k, dp), qblk, memory_space=pltpu.VMEM),
            pl.BlockSpec(memory_space=pltpu.ANY),
            pl.BlockSpec(memory_space=pltpu.ANY),
            pl.BlockSpec(memory_space=pltpu.ANY),
        ],
        out_specs=(
            pl.BlockSpec((1, dkv_block_k, dp), qblk, memory_space=pltpu.VMEM),
            pl.BlockSpec((1, dkv_block_k, dp), qblk, memory_space=pltpu.VMEM),
        ),
    )(qf, kf, vf, dof, lse_t, delta_t)


def candidates(n, dp=128):
    """All (dkv_block_k, block_q) pairs worth timing at this n.

    ``dp`` is the PADDED head dim the kernel actually allocates (r4 ADVICE
    low: the gate hardcoded 128-lane scratch and omitted the lse/delta
    buffers, silently admitting over-budget pairs for dp > 128 shapes)."""
    ks = sorted(
        {bk for bk in (128, 256, 320, 512, 640, 1024) if n % bk == 0},
        reverse=True,
    )
    qs = sorted({bq for bq in (256, 512, 640, 1024, 1280) if n % bq == 0})
    pairs = []
    for bk in ks:
        for bq in qs:
            # scoped VMEM: 4 f32 score tiles + double-buffered q/dO (bf16)
            # + double-buffered lse/delta f32 rows + dk/dv f32 accumulators
            vmem = (4 * bk * bq * 4 + 2 * 2 * bq * dp * 2
                    + 2 * 2 * 2 * bq * 4 + 2 * bk * dp * 4)
            if vmem <= 13 * 2**20:
                pairs.append((bk, bq))
    return pairs


def device_ms_per_iter(fn, args, iters):
    """Run fn once under an xplane trace; return the dkv custom-call's
    summed device SELF time / iters (ms), plus total device ms."""
    import tempfile

    sys.path.insert(0, os.path.dirname(os.path.abspath(__file__)))
    from profile_forward import parse_xplane
    from recompute_floor import _is_attention_op

    out = fn(*args)
    jax.block_until_ready(out)  # compile + settle
    td = tempfile.mkdtemp(prefix="dkv_sweep_")
    with jax.profiler.trace(td):
        out = fn(*args)
        jax.block_until_ready(out)
    per_op, _, total, _ = parse_xplane(td)
    kern_us = sum(us for name, us in per_op.items() if _is_attention_op(name))
    return kern_us / 1e3 / iters, total / 1e3


def main():
    ap = argparse.ArgumentParser()
    ap.add_argument("--out", default=None)
    ap.add_argument("--reps", type=int, default=5)
    ap.add_argument("--iters", type=int, default=16)
    args = ap.parse_args()

    rows = []
    for b, h, n, d_log, label in SHAPES:
        dp = d_log + (-d_log % 128)
        key = jax.random.PRNGKey(0)
        ks = jax.random.split(key, 6)
        bh = b * h
        mk = lambda k: jax.random.normal(k, (bh, n, dp), jnp.bfloat16)
        kf, vf, dof = mk(ks[1]), mk(ks[2]), mk(ks[3])
        q0 = mk(ks[0])
        lse_t = jax.random.normal(ks[4], (bh, 1, n), jnp.float32) * 0.1 + 5.0
        delta_t = jax.random.normal(ks[5], (bh, 1, n), jnp.float32)
        flops = 4 * 2 * bh * n * n * dp  # executed (padded-dim) FLOPs
        first = True
        for bk, bq in candidates(n, dp):
            def chained(iters, bk=bk, bq=bq):
                def step(q, _):
                    dk, dv = dkv_call(q, kf, vf, dof, lse_t, delta_t,
                                      n=n, d_log=d_log, dkv_block_k=bk,
                                      block_q=bq)
                    # feed dk back so successive iterations chain; fold dv in
                    # so neither output is DCE'd
                    return (dk + 0.125 * dv).astype(q.dtype), None

                def run(q):
                    out, _ = jax.lax.scan(step, q, None, length=iters)
                    return (out,)

                return jax.jit(run)

            try:
                per_ms, _dev = device_ms_per_iter(
                    chained(args.iters), (q0,), args.iters
                )
                if first:
                    # FLOP-proportionality check: halving iters must halve
                    # the kernel's device time (catches overhead-dominated
                    # readings like the r4 scan-subtraction artifact)
                    half_ms, _ = device_ms_per_iter(
                        chained(max(args.iters // 2, 1)), (q0,),
                        max(args.iters // 2, 1),
                    )
                    ratio = half_ms / per_ms if per_ms else float("nan")
                    print(f"{label}: per-iter stability check "
                          f"(iters/2 vs iters): {ratio:.3f}x (want ~1.0)")
                    first = False
            except Exception as e:  # noqa: BLE001 — record and move on
                rows.append({"shape": [b, h, n, dp], "bk": bk, "bq": bq,
                             "error": str(e)[:200]})
                print(f"{label} bk={bk} bq={bq}: ERROR {str(e)[:120]}")
                continue
            per = per_ms * 1e-3
            tfs = flops / per / 1e12
            rows.append({"shape": [b, h, n, dp], "label": label, "bk": bk,
                         "bq": bq, "ms": per_ms, "tfs": tfs})
            print(f"{label} bk={bk:5d} bq={bq:5d}: {per_ms:7.3f} ms "
                  f"{tfs:6.1f} TF/s ({tfs/V5E_PEAK*1e12*100:.0f}% peak)")
    if args.out:
        with open(args.out, "w") as f:
            json.dump({"rows": rows}, f, indent=1)
        print("wrote", args.out)


if __name__ == "__main__":
    main()
