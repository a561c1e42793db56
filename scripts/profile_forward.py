"""Profile one flagship denoiser forward on the TPU and print an op-level
time breakdown from the xplane trace.

Usage: python scripts/profile_forward.py [--batch N] [--steps N] [--tiny]

Parses the .xplane.pb directly with tensorflow's bundled proto (the
tensorboard_plugin_profile converters are version-broken on this image);
run with PROTOCOL_BUFFERS_PYTHON_IMPLEMENTATION=python if the C++ proto
runtime rejects the schema.
"""

import argparse
import collections
import glob
import json
import os
import sys
import tempfile
import time

sys.path.insert(0, os.path.join(os.path.dirname(__file__), ".."))


def parse_xplane(trace_dir: str, min_us: float = 5.0):
    """Aggregate TPU op durations (us) by HLO op name from an xplane dump."""
    os.environ.setdefault("PROTOCOL_BUFFERS_PYTHON_IMPLEMENTATION", "python")
    from tensorflow.tsl.profiler.protobuf import xplane_pb2

    files = sorted(
        glob.glob(os.path.join(trace_dir, "**", "*.xplane.pb"), recursive=True)
    )
    if not files:
        raise FileNotFoundError(f"no xplane.pb under {trace_dir}")
    xs = xplane_pb2.XSpace()
    with open(files[-1], "rb") as f:
        xs.ParseFromString(f.read())

    per_op = collections.Counter()
    per_cat = collections.Counter()
    total = 0.0
    for plane in xs.planes:
        if "TPU" not in plane.name and "tpu" not in plane.name.lower():
            continue
        stat_md = {k: v.name for k, v in plane.stat_metadata.items()}
        for line in plane.lines:
            lname = line.name.lower()
            # ONLY the synchronous 'XLA Ops' line: 'Async XLA Ops' events
            # (DMA prefetches) overlap compute and would double-count
            if lname != "xla ops":
                continue
            for ev in line.events:
                md = plane.event_metadata[ev.metadata_id]
                dur_us = ev.duration_ps / 1e6
                name = md.name
                per_op[name] += dur_us
                total += dur_us
                cat = None
                for st in ev.stats:
                    if stat_md.get(st.metadata_id) in ("hlo_category", "category"):
                        cat = st.str_value or None
                if cat is None:
                    cat = md.display_name or name.split(".")[0]
                per_cat[cat] += dur_us
    return per_op, per_cat, total


def main():
    ap = argparse.ArgumentParser()
    ap.add_argument("--batch", type=int, default=1)
    ap.add_argument("--steps", type=int, default=3)
    ap.add_argument("--tiny", action="store_true")
    ap.add_argument("--train", action="store_true",
                    help="profile a train step instead of the forward")
    ap.add_argument("--out", default="")
    args = ap.parse_args()

    import jax
    import jax.numpy as jnp

    if args.tiny:
        jax.config.update("jax_platforms", "cpu")
    else:
        jax.config.update(
            "jax_compilation_cache_dir", os.path.expanduser("~/.cache/dfot_jax")
        )
        jax.config.update("jax_persistent_cache_min_compile_time_secs", 1.0)

    from bench import build_flagship

    model, variables, res, T, pose_dim = build_flagship(args.tiny)
    B = args.batch
    fwd = jax.jit(lambda v, x, k, c: model.apply(v, x, k, c, None))
    x = jnp.zeros((B, T, res, res, 3))
    k = jnp.full((B, T), 500.0)
    p = jnp.zeros((B, T, res, res, pose_dim))
    out = fwd(variables, x, k, p)
    float(jnp.mean(out))  # compile + settle

    trace_dir = args.out or tempfile.mkdtemp(prefix="dfot_prof_")
    t0 = time.perf_counter()
    with jax.profiler.trace(trace_dir):
        xc = x
        for _ in range(args.steps):
            xc = fwd(variables, xc, k, p)
        float(jnp.mean(xc))
    wall = (time.perf_counter() - t0) / args.steps

    per_op, per_cat, total = parse_xplane(trace_dir)
    n = args.steps
    print(json.dumps({
        "batch": B,
        "wall_ms_per_step": round(wall * 1e3, 2),
        "traced_device_ms_per_step": round(total / 1e3 / n, 2),
    }))
    print("\n== by category (ms/step) ==")
    for cat, us in per_cat.most_common(20):
        print(f"{us / 1e3 / n:9.3f}  {cat}")
    print("\n== top ops (ms/step) ==")
    for name, us in per_op.most_common(40):
        print(f"{us / 1e3 / n:9.3f}  {name[:110]}")
    print(f"\ntrace dir: {trace_dir}")


if __name__ == "__main__":
    main()
