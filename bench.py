"""Benchmark: DFoT long-video sampling throughput (frames/sec/chip).

Default workload mirrors the reference's headline task (BASELINE.md row 1):
single image -> 200-frame long video via the keyframe (density 0.0625,
sliding-window) pass + batched interpolation passes, 50 DDIM steps per
window, NFE=2 vanilla history guidance — the full jitted sampling stack.
Backbone: DiT-S/2 over 8x32x32x4 latent tokens per window (2048 tokens).

Baseline: the reference takes ~10 min for the 200-frame rollout on one
A100-class GPU (README.md:66-69) => 0.333 frames/sec/GPU. vs_baseline is our
frames/sec/chip over that. (--window8 benches the 8-frame quick-start
instead; baseline 8 frames / 60 s.)

Prints ONE JSON line: {"metric", "value", "unit", "vs_baseline"}.
"""

import argparse
import json
import time

import numpy as np


def main():
    ap = argparse.ArgumentParser()
    ap.add_argument("--tiny", action="store_true", help="CPU smoke test")
    ap.add_argument("--window8", action="store_true", help="8-frame quick-start bench")
    ap.add_argument("--repeats", type=int, default=3)
    ap.add_argument("--interp-batch", type=int, default=8,
                    help="interpolation max_batch_size (tuning knob)")
    args = ap.parse_args()

    import jax
    import jax.numpy as jnp

    import os as _os

    if not (args.tiny or _os.environ.get("JAX_PLATFORMS", "").startswith("cpu")):
        # cache only device compiles (XLA:CPU AOT reload is feature-sensitive)
        jax.config.update(
            "jax_compilation_cache_dir",
            _os.environ.get("DFOT_COMPILE_CACHE", _os.path.expanduser("~/.cache/dfot_jax")),
        )
        jax.config.update("jax_persistent_cache_min_compile_time_secs", 1.0)

    if args.tiny:
        jax.config.update("jax_platforms", "cpu")

    from dfot_tpu.diffusion import DiffusionConfig, make_schedule
    from dfot_tpu.guidance.history_guidance import HistoryGuidance
    from dfot_tpu.models.dit import DiT3D, DiTSpec
    from dfot_tpu.sampling import DFoTRollout, RolloutConfig

    if args.tiny:
        spec = DiTSpec(hidden_size=64, depth=2, num_heads=2, mlp_ratio=2.0,
                       variant="full", pos_emb_type="rope_3d", patch_size=2,
                       max_temporal_length=4)
        res, ch, T, steps = (8, 8), 4, 4, 5
    else:
        spec = DiTSpec(hidden_size=384, depth=12, num_heads=6, mlp_ratio=4.0,
                       variant="full", pos_emb_type="rope_3d", patch_size=2,
                       max_temporal_length=8)
        res, ch, T, steps = (32, 32), 4, 8, 50

    dcfg = DiffusionConfig(timesteps=1000, sampling_timesteps=steps,
                           objective="pred_v", clip_noise=20.0)
    sched = make_schedule(dcfg)
    model = DiT3D(spec=spec, x_channels=ch, resolution=res, dtype=jnp.bfloat16)

    x0 = jnp.zeros((1, T, res[0], res[1], ch))
    k0 = jnp.zeros((1, T))
    variables = model.init(
        {"params": jax.random.PRNGKey(0), "dropout": jax.random.PRNGKey(1)}, x0, k0
    )

    def model_apply(variables, x, noise_levels, cond, cond_mask):
        return model.apply(variables, x, noise_levels, cond, cond_mask)

    n_context = 1
    if args.window8 or args.tiny:
        ro = DFoTRollout(
            RolloutConfig(max_tokens=T, x_shape=(res[0], res[1], ch)),
            dcfg, sched, model_apply,
        )
        hg = HistoryGuidance.vanilla(guidance_scale=4.0, timesteps=dcfg.timesteps)
        ctx = jnp.zeros((1, T, res[0], res[1], ch))
        mask = np.zeros((1, T), dtype=np.int64)
        mask[:, :n_context] = 1

        def run(seed):
            out = ro.sample_sequence(
                variables, jax.random.PRNGKey(seed), 1, length=T,
                context=ctx, context_mask=mask, history_guidance=hg,
            )
            jax.block_until_ready(out)

        gen_frames = T - n_context
        metric = "frames_per_sec_chip_8f_window_50ddim_nfe2"
        baseline_fps = 8.0 / 60.0  # reference: 8 frames in <1 min on 1 GPU
    else:
        # 200-frame rollout: keyframes (density 0.0625) + interpolation
        # (BASELINE config #3; stabilized-vanilla HG like the README recipe)
        total_frames = 200
        ro = DFoTRollout(
            RolloutConfig(
                max_tokens=T, x_shape=(res[0], res[1], ch),
                keyframe_density=0.0625, sliding_context_len=T // 2,
                interpolation_max_batch_size=args.interp_batch,
            ),
            dcfg, sched, model_apply,
        )
        pred_hg = HistoryGuidance.stabilized_vanilla(
            guidance_scale=4.0, stabilization_level=0.02, timesteps=dcfg.timesteps
        )
        interp_hg = HistoryGuidance.vanilla(
            guidance_scale=1.5, timesteps=dcfg.timesteps
        )
        xs = jnp.zeros((1, total_frames, res[0], res[1], ch))

        def run(seed):
            out = ro.predict_videos(
                variables, jax.random.PRNGKey(seed), xs, n_context,
                prediction_hg=pred_hg, interpolation_hg=interp_hg,
            )
            jax.block_until_ready(out)

        gen_frames = total_frames - n_context
        metric = "frames_per_sec_chip_200f_rollout_50ddim_nfe2"
        baseline_fps = 200.0 / 600.0  # reference: ~10 min on 1 GPU

    run(0)  # compile
    times = []
    for i in range(args.repeats):
        t0 = time.perf_counter()
        run(i + 1)
        times.append(time.perf_counter() - t0)

    fps = gen_frames / min(times)
    print(json.dumps({
        "metric": metric,
        "value": round(fps, 3),
        "unit": "frames/sec/chip",
        "vs_baseline": round(fps / baseline_fps, 2),
    }))


if __name__ == "__main__":
    main()
