"""Standalone flash-attention kernel variant timings at flagship shapes.

Measures the forward orientations ("row" native-dtype, "pvt" transposed-pv,
and the legacy f32-precast kernel as a baseline) plus optionally the full
VJP, at the UViT3DPose transformer-level shapes (n = T*H*W tokens, d = 64).
Prints achieved TF/s against the v5e bf16 peak so the roofline's in-kernel
gap (VERDICT r3: 71 TF/s achieved vs 98 cap; pvt lifts the structural cap
to ~131) is directly checkable.

Usage:
    python scripts/bench_attention_variants.py [--bwd] [--reps 20]
        [--out traces/attn_variants.json]

Timing discipline: one jax.device_get fetch per repetition (block_until_ready
can return at dispatch over the tunneled runtime), min over reps.
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

if "--tiny" in sys.argv:
    # the image's sitecustomize pins jax_platforms to the axon TPU plugin at
    # interpreter start; env vars are too late — override before backend init
    jax.config.update("jax_platforms", "cpu")
else:
    jax.config.update(
        "jax_compilation_cache_dir",
        os.environ.get("DFOT_COMPILE_CACHE", os.path.expanduser("~/.cache/dfot_jax")),
    )
    jax.config.update("jax_persistent_cache_min_compile_time_secs", 1.0)

from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu

from dfot_tpu.ops import attention as A

V5E_PEAK = 197e12

# flagship UViT3DPose transformer levels at 256px/T=8 (patch 2), B=2 = the
# NFE-expanded sampling batch. Level 2 (576 ch / 9 heads): n=8192, d=64 —
# the 50%-capped case pvt targets. Mid (1152 ch / 9 heads): n=2048, d=128 —
# full MXU width already, pvt should be ~neutral there.
SHAPES = [
    (2, 9, 8192, 64),
    (2, 9, 2048, 128),
    (1, 9, 8192, 64),
]

# K600 @DiT/XL latent recipe (hidden 1152 / 16 heads -> d=72, n=5*16*16) at
# the recipe batch: exercises the lane-padded flash path vs the XLA fallback
PADDED_SHAPES = [
    (8, 16, 1280, 72),
]


def _legacy_f32_kernel(q_ref, k_ref, v_ref, o_ref, lse_ref, *, block_k,
                       seq_len, sm_scale):
    """The pre-r4 forward body: operands pre-cast to f32 (baseline)."""
    q = q_ref[0].astype(jnp.float32) * sm_scale
    blk_q, d = q.shape
    num_kb = seq_len // block_k

    def body(i, carry):
        acc, m_i, l_i = carry
        k = k_ref[0, pl.ds(i * block_k, block_k), :].astype(jnp.float32)
        v = v_ref[0, pl.ds(i * block_k, block_k), :].astype(jnp.float32)
        s = jax.lax.dot_general(
            q, k, (((1,), (1,)), ((), ())), preferred_element_type=jnp.float32
        )
        m_new = jnp.maximum(m_i, jnp.max(s, axis=-1, keepdims=True))
        alpha = jnp.exp(m_i - m_new)
        p = jnp.exp(s - m_new)
        l_new = l_i * alpha + jnp.sum(p, axis=-1, keepdims=True)
        acc = acc * alpha + jax.lax.dot_general(
            p, v, (((1,), (0,)), ((), ())), preferred_element_type=jnp.float32
        )
        return acc, m_new, l_new

    acc0 = jnp.zeros((blk_q, d), jnp.float32)
    m0 = jnp.full((blk_q, 1), A._NEG_INF, jnp.float32)
    l0 = jnp.zeros((blk_q, 1), jnp.float32)
    acc, m_i, l_i = jax.lax.fori_loop(0, num_kb, body, (acc0, m0, l0))
    o_ref[0] = (acc / l_i).astype(o_ref.dtype)
    lse_ref[0] = m_i + jnp.log(l_i)


def legacy_f32_forward(q, k, v, block_q, block_k, interpret=False):
    b, h, n, d = q.shape
    qf, kf, vf = (a.reshape(b * h, n, d) for a in (q, k, v))
    out, _ = pl.pallas_call(
        functools.partial(
            _legacy_f32_kernel, block_k=block_k, seq_len=n,
            sm_scale=1.0 / math.sqrt(d),
        ),
        out_shape=(
            jax.ShapeDtypeStruct((b * h, n, d), q.dtype),
            jax.ShapeDtypeStruct((b * h, n, 1), jnp.float32),
        ),
        grid=(b * h, n // block_q),
        in_specs=[
            pl.BlockSpec((1, block_q, d), lambda i, j: (i, j, 0), memory_space=pltpu.VMEM),
            pl.BlockSpec((1, n, d), lambda i, j: (i, 0, 0), memory_space=pltpu.VMEM),
            pl.BlockSpec((1, n, d), lambda i, j: (i, 0, 0), memory_space=pltpu.VMEM),
        ],
        out_specs=(
            pl.BlockSpec((1, block_q, d), lambda i, j: (i, j, 0), memory_space=pltpu.VMEM),
            pl.BlockSpec((1, block_q, 1), lambda i, j: (i, j, 0), memory_space=pltpu.VMEM),
        ),
        interpret=interpret,
    )(qf, kf, vf)
    return out.reshape(b, h, n, d)


def time_fn(fn, args, reps):
    out = fn(*args)
    jax.device_get(jax.tree_util.tree_leaves(out)[0][0, 0, 0])  # settle
    best = float("inf")
    for _ in range(reps):
        t0 = time.perf_counter()
        out = fn(*args)
        jax.device_get(jax.tree_util.tree_leaves(out)[0][0, 0, 0])
        best = min(best, time.perf_counter() - t0)
    return best


def main():
    ap = argparse.ArgumentParser()
    ap.add_argument("--reps", type=int, default=20)
    ap.add_argument("--bwd", action="store_true",
                    help="also time the full VJP per forward variant")
    ap.add_argument("--out", default="")
    ap.add_argument("--dtype", default="bfloat16")
    ap.add_argument("--tiny", action="store_true",
                    help="CPU smoke: one small shape, interpret-mode kernels")
    args = ap.parse_args()

    interp = args.tiny
    shapes = [(1, 2, 512, 64)] if args.tiny else SHAPES
    if args.tiny:
        args.reps = min(args.reps, 2)
    dtype = jnp.dtype(args.dtype)
    rows = []
    for (b, h, n, d) in shapes:
        ks = jax.random.split(jax.random.PRNGKey(0), 3)
        q, k, v = (jax.random.normal(r, (b, h, n, d), jnp.float32).astype(dtype)
                   for r in ks)
        fwd_flops = 4.0 * b * h * n * n * d  # qk + pv, 2 MACs each
        bq, bk = A._pick_blocks(n)

        cases = {
            "row": jax.jit(lambda q, k, v: A._flash_forward(
                q, k, v, False, bq, bk, interp, variant="row")),
            "pvt": jax.jit(lambda q, k, v: A._flash_forward(
                q, k, v, False, bq, bk, interp, variant="pvt")),
            "legacy_f32": jax.jit(lambda q, k, v: legacy_f32_forward(
                q, k, v, bq, bk, interp)),
        }
        for name, fn in cases.items():
            try:
                sec = time_fn(fn, (q, k, v), args.reps)
            except Exception as e:  # noqa: BLE001 — record, keep sweeping
                rows.append({"shape": [b, h, n, d], "variant": name,
                             "error": repr(e)[:160]})
                print(f"({b},{h},{n},{d}) {name:12s} ERROR {e!r}"[:120],
                      flush=True)
                continue
            tfs = fwd_flops / sec / 1e12
            rows.append({
                "shape": [b, h, n, d], "variant": name, "blocks": [bq, bk],
                "ms": round(sec * 1e3, 3), "tflops_per_sec": round(tfs, 1),
                "pct_v5e_peak": round(100 * tfs * 1e12 / V5E_PEAK, 1),
            })
            print(f"({b},{h},{n},{d}) {name:12s} {sec*1e3:8.3f} ms "
                  f"{tfs:6.1f} TF/s ({100*tfs*1e12/V5E_PEAK:4.1f}% peak)",
                  flush=True)

        if args.bwd:
            for variant in ("row", "pvt"):
                def f(q, k, v, _v=variant):
                    A._FWD_VARIANT = _v  # trace-time switch
                    return A.flash_attention(q, k, v, False, bq, bk, interp)

                def vjp_fn(q, k, v, g):
                    out, pull = jax.vjp(f, q, k, v)
                    return pull(g)

                g = jax.random.normal(
                    jax.random.PRNGKey(9), (b, h, n, d), jnp.float32
                ).astype(dtype)
                jf = jax.jit(vjp_fn)
                try:
                    sec = time_fn(jf, (q, k, v, g), max(args.reps // 2, 5))
                except Exception as e:  # noqa: BLE001
                    rows.append({"shape": [b, h, n, d],
                                 "variant": f"vjp_{variant}",
                                 "error": repr(e)[:160]})
                    continue
                finally:
                    A._FWD_VARIANT = "row"
                # the timed jax.vjp executes the primal forward (2 dots) plus
                # the dq kernel (3) and dkv kernel (4): 9 dots = 4.5x the
                # forward's FLOPs — same accounting as recompute_train_floor
                tfs = 4.5 * fwd_flops / sec / 1e12
                rows.append({
                    "shape": [b, h, n, d], "variant": f"vjp_{variant}",
                    "ms": round(sec * 1e3, 3),
                    "tflops_per_sec": round(tfs, 1),
                    "pct_v5e_peak": round(100 * tfs * 1e12 / V5E_PEAK, 1),
                })
                print(f"({b},{h},{n},{d}) vjp_{variant:8s} {sec*1e3:8.3f} ms "
                      f"{tfs:6.1f} TF/s(fwd+bwd)", flush=True)

    # padded-head-dim path (d=72) vs the XLA fallback it replaces
    for (b, h, n, d) in ([] if args.tiny else PADDED_SHAPES):
        ks = jax.random.split(jax.random.PRNGKey(1), 3)
        q, k, v = (jax.random.normal(r, (b, h, n, d), jnp.float32).astype(dtype)
                   for r in ks)
        fwd_flops = 4.0 * b * h * n * n * d
        pcases = {
            "padded_row": jax.jit(lambda q, k, v: A._padded_flash(
                q, k, v, False)),
            "xla": jax.jit(lambda q, k, v: A._xla_attention(q, k, v, False)),
        }
        for name, fn in pcases.items():
            try:
                sec = time_fn(fn, (q, k, v), args.reps)
            except Exception as e:  # noqa: BLE001
                rows.append({"shape": [b, h, n, d], "variant": name,
                             "error": repr(e)[:160]})
                continue
            tfs = fwd_flops / sec / 1e12
            rows.append({"shape": [b, h, n, d], "variant": name,
                         "ms": round(sec * 1e3, 3),
                         "tflops_per_sec": round(tfs, 1)})
            print(f"({b},{h},{n},{d}) {name:12s} {sec*1e3:8.3f} ms "
                  f"{tfs:6.1f} TF/s", flush=True)

    if args.out:
        os.makedirs(os.path.dirname(args.out) or ".", exist_ok=True)
        with open(args.out, "w") as fh:
            json.dump({"device": str(jax.devices()[0]),
                       "dtype": str(dtype), "rows": rows}, fh, indent=1)
        print(f"wrote {args.out}")


if __name__ == "__main__":
    main()
