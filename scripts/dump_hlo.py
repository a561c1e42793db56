"""Dump the optimized (post-layout) TPU HLO of the in-scan flagship eval
and print every copy/transpose/pad with its producer and consumer ops.

The xplane trace gives per-op cost but not dataflow; layout-assignment
copies can only be attributed by reading the compiled module. Usage:

    python scripts/dump_hlo.py [--batch 2] [--out /tmp/eval.hlo.txt]

Compile-only (no execution): safe to run while the chip is busy.
"""

import argparse
import os
import re
import sys

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))


def main():
    ap = argparse.ArgumentParser()
    ap.add_argument("--batch", type=int, default=2)
    ap.add_argument("--out", default="/tmp/eval.hlo.txt")
    ap.add_argument("--grep", default="copy|transpose|pad",
                    help="instruction-name regex to report")
    args = ap.parse_args()

    import jax
    import jax.numpy as jnp

    jax.config.update(
        "jax_compilation_cache_dir", os.path.expanduser("~/.cache/dfot_jax")
    )

    from bench import build_flagship
    from dfot_tpu.models.uvit import precompute_pose_conditioning
    from dfot_tpu.utils.geometry import expand_pose_conditions_jax

    import numpy as np

    model, variables, res, T, pose_dim = build_flagship(False)
    B = args.batch
    pose = np.zeros((B, T, 16), np.float32)
    pose[..., :4] = [1.0, 1.0, 0.5, 0.5]
    pose[..., 4] = pose[..., 9] = pose[..., 14] = 1.0
    ctype = "ray_encoding" if pose_dim == 180 else "ray"

    def cond_transform(c, v):
        maps = expand_pose_conditions_jax(c, ctype, res).astype(jnp.bfloat16)
        return precompute_pose_conditioning(model, v, maps)

    p = jax.jit(cond_transform)(jnp.asarray(pose), variables)
    fwd = jax.jit(lambda v, x, k, c: model.apply(v, x, k, c, None))
    x = jnp.zeros((B, T, res, res, 3))
    k = jnp.full((B, T), 500.0)
    txt = fwd.lower(variables, x, k, p).compile().as_text()
    with open(args.out, "w") as f:
        f.write(txt)
    print(f"wrote {args.out} ({len(txt) / 1e6:.1f} MB)")

    # index: name -> (line, shape)
    defs = {}
    uses = {}
    for line in txt.splitlines():
        m = re.match(r"\s*(?:ROOT )?%?([\w.\-]+) = (\S+)", line)
        if not m:
            continue
        name, shape = m.group(1), m.group(2)
        defs[name] = (line.strip(), shape)
        for opnd in re.findall(r"%([\w.\-]+)", line.split("(", 1)[-1]):
            uses.setdefault(opnd, []).append(name)

    pat = re.compile(rf"^({args.grep})", re.I)
    rows = []
    for name, (line, shape) in defs.items():
        if not pat.match(name):
            continue
        # operands of this instr
        opnds = re.findall(r"%([\w.\-]+)", line.split("(", 1)[-1])
        prod = [f"{o}:{defs[o][1][:46]}" for o in opnds[:2] if o in defs]
        cons = [f"{u}:{defs[u][1][:46]}" for u in (uses.get(name) or [])[:2]]
        rows.append((shape, name, prod, cons))
    rows.sort()
    for shape, name, prod, cons in rows:
        print(f"{name}  {shape}")
        for p_ in prod:
            print(f"   <- {p_}")
        for c_ in cons:
            print(f"   -> {c_}")


if __name__ == "__main__":
    main()
