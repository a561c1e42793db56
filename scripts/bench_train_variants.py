"""Time flagship train-step remat variants on the TPU (one-off tuning aid).

Runs bench.bench_train for each requested remat pattern on the full 467M
flagship, sharing one forward compile for the FLOPs accounting. Spec syntax
NAME[+POLICY][+rbg][:bN][:aM] — NAME in {mid, none, all}, POLICY in
{dots, attn, dots_attn} (jax.checkpoint saveable policy, models/remat.py),
rbg = hardware-bit-generator RNG for the dropout/noise draws (threefry cost
probe), bN = micro-batch size, aM = gradient-accumulation steps
(recipe-equivalent global batch N*M when B=8 doesn't fit HBM). Usage:

    python scripts/bench_train_variants.py mid none mid+dots:b2 mid+rbg mid:b2:a4
"""

import os
import sys

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

import jax

jax.config.update(
    "jax_compilation_cache_dir",
    os.environ.get("DFOT_COMPILE_CACHE", os.path.expanduser("~/.cache/dfot_jax")),
)
jax.config.update("jax_persistent_cache_min_compile_time_secs", 1.0)

import bench
from dfot_tpu.diffusion import DiffusionConfig, make_schedule


def main():
    variants = sys.argv[1:] or ["mid"]
    model, variables, res, T, pose_dim = bench.build_flagship(tiny=False)
    dcfg = DiffusionConfig(timesteps=1000, sampling_timesteps=50,
                           objective="pred_v", clip_noise=20.0)
    sched = make_schedule(dcfg)
    flops_per_fwd, fwd_sec = bench.bench_forward(
        model, variables, res, T, pose_dim
    )
    print(f"# forward {fwd_sec*1e3:.1f} ms, {flops_per_fwd:.3e} FLOPs",
          flush=True)
    patterns = {"all": True, "none": False, "mid": (False, False, False, True)}
    for spec in variants:
        try:
            name, *parts = spec.split(":")
            batch, accumulate = 1, 1
            for p in parts:
                if p.startswith("b"):
                    batch = int(p[1:])
                elif p.startswith("a"):
                    accumulate = int(p[1:])
                else:
                    raise ValueError(
                        f"bad spec {spec!r}: want NAME[+POLICY][+rbg][:bN][:aM]"
                    )
            name, *mods = name.split("+")
            rng_impl = "rbg" if "rbg" in mods else "threefry2x32"
            policy = next((m for m in mods if m != "rbg"), "")
            line = bench.bench_train(
                {"tiny": False}, variables, res, T, pose_dim, dcfg, sched,
                flops_per_fwd, batch=batch, remat=patterns[name],
                remat_policy=policy or None, rng_impl=rng_impl,
                accumulate=accumulate,
            )
            bench.emit({"variant": spec, **line})
        except Exception as e:  # noqa: BLE001 — keep timing the rest
            bench.emit({"variant": spec, "error": repr(e)[:300]})


if __name__ == "__main__":
    main()
