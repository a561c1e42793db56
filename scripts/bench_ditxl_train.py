"""Training throughput for the latent recipes (BASELINE.md rows 5-6).

Thin CLI over ``bench.bench_latent_train`` (the same code path bench.py folds
into its default driver output):

- ``--model xl``: K600 @DiT/XL (depth 28 / hidden 1152 / 16 heads, patch 1)
  on VideoVAE latents (5, 16, 16, 16) — reference README.md:95-99.
- ``--model b``: Minecraft @DiT/B (depth 12 / hidden 768 / 12 heads) on
  latents (16, 8, 8, 32) — reference README.md:101-106.

    python scripts/bench_ditxl_train.py [--model xl|b] [--batch 8] [--steps 3]
"""

import argparse
import json
import os
import sys

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))


def main():
    ap = argparse.ArgumentParser()
    ap.add_argument("--batch", type=int, default=8)
    ap.add_argument("--steps", type=int, default=3)
    ap.add_argument("--model", choices=("xl", "b"), default="xl",
                    help="xl: K600 @DiT/XL latents; b: Minecraft @DiT/B latents")
    ap.add_argument("--tiny", action="store_true", help="CPU smoke shapes")
    ap.add_argument("--remat-policy", default=None,
                    choices=("dots", "attn", "dots_attn"),
                    help="jax.checkpoint saveable policy for the remated "
                    "DiT blocks (models/remat.py); default recomputes all")
    ap.add_argument("--no-remat", action="store_true",
                    help="disable per-block gradient checkpointing (latent "
                    "activations are small; recompute may be pure overhead)")
    ap.add_argument("--flat-opt", action="store_true",
                    help="optax.flatten the optimizer (one raveled vector "
                    "instead of per-leaf updates — small-op tail probe)")
    args = ap.parse_args()

    import jax

    if args.tiny:
        jax.config.update("jax_platforms", "cpu")
    else:
        jax.config.update(
            "jax_compilation_cache_dir",
            os.environ.get("DFOT_COMPILE_CACHE",
                           os.path.expanduser("~/.cache/dfot_jax")),
        )
        jax.config.update("jax_persistent_cache_min_compile_time_secs", 1.0)

    from bench import bench_latent_train

    print(json.dumps(bench_latent_train(
        model_kind=args.model, batch=args.batch, steps=args.steps,
        tiny=args.tiny, remat_policy=args.remat_policy,
        remat=not args.no_remat, flat_opt=args.flat_opt,
    )), flush=True)


if __name__ == "__main__":
    main()
