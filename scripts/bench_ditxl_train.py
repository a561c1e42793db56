"""Training throughput for the K600 @DiT/XL latent recipe (BASELINE.md row 5).

Reference recipe (README.md:95-99, configurations/shortcut/DiT/XL.yaml +
dataset/kinetics_600.yaml + dataset_experiment/kinetics_600_video_generation
.yaml): DiT3D depth 28 / hidden 1152 / 16 heads, patch_size 1, trained on
VideoVAE latents of 17x128px clips — (T=5, 16, 16) spatial grid with 16
channels (downsampling_factor [4, 8]) — on 12x80GB GPUs. The reference
publishes no steps/sec, so vs_baseline is the same A100@35%-MFU roofline
ratio bench.py uses for the flagship train line.

Also covers BASELINE.md row 6 with --model b: the Minecraft @DiT/B latent
recipe (README.md:101-106; dataset/minecraft.yaml: 16x128px clips, latent
downsampling [1, 16] with 32 channels -> (16, 8, 8, 32); shortcut/DiT/B.yaml:
depth 12 / hidden 768 / 12 heads).

    python scripts/bench_ditxl_train.py [--model xl|b] [--batch 8] [--steps 3]
"""

import argparse
import json
import os
import sys
import time

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

    import jax.numpy as jnp
    import optax

    from bench import V5E_PEAK_FLOPS, A100_PEAK_FLOPS, _flops_of
    from dfot_tpu.diffusion import DiffusionConfig, make_schedule
    from dfot_tpu.models.dit import DiT3D, DiTSpec
    from dfot_tpu.training import make_train_step
    from dfot_tpu.training.noise_levels import NoiseLevelConfig
    from dfot_tpu.training.state import create_train_state

    if args.tiny:
        spec = DiTSpec(hidden_size=64, depth=2, num_heads=2, patch_size=1,
                       max_temporal_length=5, use_gradient_checkpointing=True,
                       remat_policy=args.remat_policy)
        T, res, C = 3, 4, 16
    elif args.model == "xl":
        spec = DiTSpec(hidden_size=1152, depth=28, num_heads=16, patch_size=1,
                       max_temporal_length=5, use_gradient_checkpointing=True,
                       remat_policy=args.remat_policy)
        T, res, C = 5, 16, 16  # K600 latents: 17x128px -> (5, 16, 16, 16)
    else:
        spec = DiTSpec(hidden_size=768, depth=12, num_heads=12, patch_size=1,
                       max_temporal_length=16, use_gradient_checkpointing=True,
                       remat_policy=args.remat_policy)
        T, res, C = 16, 8, 32  # Minecraft latents: 16x128px -> (16, 8, 8, 32)
    dtype = jnp.bfloat16 if not args.tiny else jnp.float32
    model = DiT3D(spec=spec, x_channels=C, resolution=(res, res),
                  dtype=dtype)

    B = args.batch
    rk = jax.random.PRNGKey
    x0 = jnp.zeros((1, T, res, res, C))
    params = jax.jit(lambda: model.init(
        {"params": rk(0), "dropout": rk(1)}, x0, jnp.full((1, T), 500.0)
    ))()

    dcfg = DiffusionConfig(timesteps=1000, sampling_timesteps=50,
                           objective="pred_v", clip_noise=20.0)
    sched = make_schedule(dcfg)
    nl_cfg = NoiseLevelConfig(noise_level="random_independent",
                              timesteps=dcfg.timesteps,
                              is_continuous=dcfg.is_continuous)

    # forward FLOPs for MFU accounting (fwd+bwd ~= 3x forward)
    fwd = jax.jit(lambda v, x, k: model.apply(v, x, k))
    xB = jnp.zeros((B, T, res, res, C), dtype)
    kB = jnp.full((B, T), 500.0)
    flops_fwd_B = _flops_of(fwd.lower(params, xB, kB).compile())

    def model_apply(p, x, k, cond, cond_mask, rngs=None, train=False):
        return model.apply(p, x, k, rngs=rngs, train=train)

    tx = optax.chain(
        optax.clip_by_global_norm(1.0),
        optax.adamw(1e-4, b1=0.9, b2=0.99, weight_decay=0.0),
    )
    state = create_train_state(params, tx, use_ema=True)
    train_step = make_train_step(model_apply, dcfg, sched, nl_cfg,
                                 compute_dtype=dtype)
    batch = {"xs": xB, "masks": jnp.ones((B, T), bool)}
    rngs = jax.random.split(rk(0), args.steps + 1)
    state, m = train_step(state, batch, rngs[0])
    jax.block_until_ready(m["loss"])
    t0 = time.perf_counter()
    for i in range(args.steps):
        state, m = train_step(state, batch, rngs[i + 1])
    float(m["loss"])
    step_sec = (time.perf_counter() - t0) / args.steps

    train_flops = 3.0 * flops_fwd_B
    print(json.dumps({
        "metric": (
            f"dit{args.model}_"
            + ("k600" if args.model == "xl" else "minecraft")
            + f"_train_steps_per_sec_b{B}_latent{T}x{res}x{res}x{C}"
        ),
        "value": round(1.0 / step_sec, 3),
        "unit": "steps/sec/chip",
        "vs_baseline": round((train_flops / step_sec) / (A100_PEAK_FLOPS * 0.35), 2),
        "train_step_ms": round(step_sec * 1e3, 1),
        "train_mfu": round(train_flops / step_sec / V5E_PEAK_FLOPS, 4),
        "videos_per_sec": round(B / step_sec, 2),
        "remat_policy": args.remat_policy or "none",
        "baseline_note": "A100 torch @35% MFU roofline (no published ref steps/sec)",
    }), flush=True)


if __name__ == "__main__":
    main()
