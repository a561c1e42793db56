"""Amortized in-graph flash-attention variant timings (tunnel-proof).

The per-dispatch timing in bench_attention_variants.py pays a ~20 ms
host<->chip round trip over the tunneled runtime, which drowns a ~4 ms
kernel — stage-1 r4 showed row/pvt/legacy all within 0.4% of each other at
26 ms/call. This script instead chains ITERS kernel invocations inside one
jitted lax.scan (the output feeds the next q, so nothing is DCE'd or
overlapped away), then reports (t(ITERS) - t(1)) / (ITERS - 1): the fixed
dispatch cost cancels and the per-iteration device time survives the tunnel.

Usage:
    python scripts/bench_attention_inloop.py [--iters 32] [--reps 5]
        [--out traces/attn_inloop_r4.json]
"""

import argparse
import json
import math
import os
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

import jax
import jax.numpy as jnp

if "--tiny" in sys.argv:
    jax.config.update("jax_platforms", "cpu")
else:
    jax.config.update(
        "jax_compilation_cache_dir",
        os.environ.get("DFOT_COMPILE_CACHE", os.path.expanduser("~/.cache/dfot_jax")),
    )
    jax.config.update("jax_persistent_cache_min_compile_time_secs", 1.0)

from dfot_tpu.ops import attention as A

V5E_PEAK = 197e12

SHAPES = [
    (2, 9, 8192, 64),   # UViT3DPose level-2: the 50%-capped d=64 case
    (2, 9, 2048, 128),  # mid level: full MXU width already
]


def chained(fn, iters):
    """scan fn iters times, feeding o back as q (same shape/dtype)."""

    def step(q, _):
        o = fn(q)
        return o.astype(q.dtype), None

    def run(q):
        out, _ = jax.lax.scan(step, q, None, length=iters)
        return out

    return jax.jit(run)


def wall(fn, q, reps):
    out = fn(q)
    jax.device_get(out[0, 0, 0])
    best = float("inf")
    for _ in range(reps):
        t0 = time.perf_counter()
        out = fn(q)
        jax.device_get(out[0, 0, 0])
        best = min(best, time.perf_counter() - t0)
    return best


def main():
    ap = argparse.ArgumentParser()
    ap.add_argument("--iters", type=int, default=32)
    ap.add_argument("--reps", type=int, default=5)
    ap.add_argument("--out", default="")
    ap.add_argument("--dtype", default="bfloat16")
    ap.add_argument("--tiny", action="store_true")
    args = ap.parse_args()

    interp = args.tiny
    shapes = [(1, 2, 512, 64)] if args.tiny else SHAPES
    iters = 3 if args.tiny else args.iters
    dtype = jnp.dtype(args.dtype)
    rows = []
    for (b, h, n, d) in shapes:
        ks = jax.random.split(jax.random.PRNGKey(0), 3)
        q, k, v = (jax.random.normal(r, (b, h, n, d), jnp.float32).astype(dtype)
                   for r in ks)
        fwd_flops = 4.0 * b * h * n * n * d
        bq, bk = A._pick_blocks(n)
        for variant in ("row", "pvt"):
            fn = lambda x, _v=variant: A._flash_forward(
                x, k, v, False, bq, bk, interp, variant=_v)
            try:
                t1 = wall(chained(fn, 1), q, args.reps)
                tN = wall(chained(fn, iters), q, args.reps)
            except Exception as e:  # noqa: BLE001 — record, keep sweeping
                rows.append({"shape": [b, h, n, d], "variant": variant,
                             "error": repr(e)[:160]})
                print(f"({b},{h},{n},{d}) {variant:4s} ERROR {e!r}"[:120],
                      flush=True)
                continue
            per = (tN - t1) / (iters - 1) if iters > 1 else tN
            tfs = fwd_flops / per / 1e12 if per > 0 else float("nan")
            rows.append({
                "shape": [b, h, n, d], "variant": variant,
                "blocks": [bq, bk], "iters": iters,
                "ms_per_iter": round(per * 1e3, 3),
                "ms_dispatch_overhead": round(t1 * 1e3, 3),
                "tflops_per_sec": round(tfs, 1),
                "pct_v5e_peak": round(100 * tfs * 1e12 / V5E_PEAK, 1),
            })
            print(f"({b},{h},{n},{d}) {variant:4s} {per*1e3:8.3f} ms/iter "
                  f"{tfs:6.1f} TF/s ({100*tfs*1e12/V5E_PEAK:4.1f}% peak)  "
                  f"[1-iter call {t1*1e3:.1f} ms]", flush=True)

    if args.out:
        os.makedirs(os.path.dirname(args.out) or ".", exist_ok=True)
        with open(args.out, "w") as fh:
            json.dump({"device": str(jax.devices()[0]), "dtype": str(dtype),
                       "iters": iters, "rows": rows}, fh, indent=1)
        print(f"wrote {args.out}")


if __name__ == "__main__":
    main()
