"""Chip sweep of the dkv kernel's k-block / q-block widths.

The dkv picker hardcodes pow-2 candidates (512, 256, 128); at the DiT/XL
latent shape n=1280 that lands on 256 while every other block picker in the
module was taught non-pow2 divisors (640). This times the dkv pallas_call in
isolation at candidate (dkv_block_k, block_q) pairs so the picker can be
fixed from measurement, not guesswork.

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

# (B, H, N, D_padded, label). The latent recipe's d=72 runs the kernels
# through the 128-lane padded path, so time at d=128 directly.
SHAPES = [
    (8, 16, 1280, 128, "ditxl_latent"),
    (2, 9, 8192, 64, "flagship_l2"),
    (2, 9, 2048, 128, "flagship_mid"),
]


def dkv_call(qf, kf, vf, dof, lse_t, delta_t, n, d, dkv_block_k, block_q):
    bh = qf.shape[0]
    qblk = lambda i, j: (i, j, 0)
    return pl.pallas_call(
        functools.partial(
            A._flash_bwd_dkv_kernel, block_q=block_q, seq_len=n, causal=False,
            sm_scale=1.0 / math.sqrt(d), q_dtype=qf.dtype,
        ),
        out_shape=(
            jax.ShapeDtypeStruct((bh, n, d), kf.dtype),
            jax.ShapeDtypeStruct((bh, n, d), vf.dtype),
        ),
        grid=(bh, n // dkv_block_k),
        in_specs=[
            pl.BlockSpec(memory_space=pltpu.ANY),
            pl.BlockSpec((1, dkv_block_k, d), qblk, memory_space=pltpu.VMEM),
            pl.BlockSpec((1, dkv_block_k, d), qblk, memory_space=pltpu.VMEM),
            pl.BlockSpec(memory_space=pltpu.ANY),
            pl.BlockSpec(memory_space=pltpu.ANY),
            pl.BlockSpec(memory_space=pltpu.ANY),
        ],
        out_specs=(
            pl.BlockSpec((1, dkv_block_k, d), qblk, memory_space=pltpu.VMEM),
            pl.BlockSpec((1, dkv_block_k, d), qblk, memory_space=pltpu.VMEM),
        ),
    )(qf, kf, vf, dof, lse_t, delta_t)


def candidates(n):
    """All (dkv_block_k, block_q) pairs worth timing at this n."""
    ks = sorted(
        {bk for bk in (128, 256, 320, 512, 640, 1024) if n % bk == 0},
        reverse=True,
    )
    qs = sorted({bq for bq in (256, 512, 640, 1024, 1280) if n % bq == 0})
    pairs = []
    for bk in ks:
        for bq in qs:
            # scoped VMEM: 4 f32 score tiles + double-buffered q/dO + dk/dv acc
            vmem = 4 * bk * bq * 4 + 2 * 2 * bq * 128 * 2 + 2 * bk * 128 * 4
            if vmem <= 13 * 2**20:
                pairs.append((bk, bq))
    return pairs


def main():
    ap = argparse.ArgumentParser()
    ap.add_argument("--out", default=None)
    ap.add_argument("--reps", type=int, default=10)
    args = ap.parse_args()

    rows = []
    for b, h, n, d, label in SHAPES:
        key = jax.random.PRNGKey(0)
        ks = jax.random.split(key, 6)
        bh = b * h
        mk = lambda k: jax.random.normal(k, (bh, n, d), jnp.bfloat16)
        qf, kf, vf, dof = mk(ks[0]), mk(ks[1]), mk(ks[2]), mk(ks[3])
        lse_t = jax.random.normal(ks[4], (bh, 1, n), jnp.float32) * 0.1 + 5.0
        delta_t = jax.random.normal(ks[5], (bh, 1, n), jnp.float32)
        flops = 4 * 2 * bh * n * n * d
        for bk, bq in candidates(n):
            fn = jax.jit(
                functools.partial(dkv_call, n=n, d=d, dkv_block_k=bk, block_q=bq)
            )
            try:
                out = fn(qf, kf, vf, dof, lse_t, delta_t)
                jax.block_until_ready(out)
            except Exception as e:  # noqa: BLE001 — record and move on
                rows.append({"shape": [b, h, n, d], "bk": bk, "bq": bq,
                             "error": str(e)[:200]})
                print(f"{label} bk={bk} bq={bq}: ERROR {str(e)[:120]}")
                continue
            best = float("inf")
            for _ in range(args.reps):
                t0 = time.perf_counter()
                r = fn(qf, kf, vf, dof, lse_t, delta_t)
                jax.device_get(r[0][0, 0, 0])  # one fetch: tunnel-proof sync
                best = min(best, time.perf_counter() - t0)
            tfs = flops / best / 1e12
            rows.append({"shape": [b, h, n, d], "label": label, "bk": bk,
                         "bq": bq, "ms": best * 1e3, "tfs": tfs})
            print(f"{label} bk={bk:5d} bq={bq:5d}: {best*1e3:7.3f} ms "
                  f"{tfs:6.1f} TF/s ({tfs/V5E_PEAK*1e12*100:.0f}% peak)")
    if args.out:
        with open(args.out, "w") as f:
            json.dump({"rows": rows}, f, indent=1)
        print("wrote", args.out)


if __name__ == "__main__":
    main()
