"""Benchmark: DFoT flagship long-video sampling throughput + MFU.

Default workload is the reference's NORTH-STAR task (BASELINE.md row 1,
reference README.md:66-69): the DFoT_RE10K flagship model — U-ViT3DPose,
channels (128, 256, 576, 1152), 3/3/6 up-down blocks, 20 mid blocks,
~467M params (configurations/dataset_experiment/
realestate10k_video_generation.yaml) — generating a 200-frame 256x256 video
from a single image: keyframe pass (density 0.0625, sliding windows of 8)
with stabilized-vanilla history guidance, then batched interpolation with
vanilla HG; 50 DDIM steps per window.

Baseline: the reference takes ~10 min for this rollout on one A100-class GPU
=> 0.333 frames/sec/GPU. vs_baseline = our frames/sec/chip over that.

FLOPs accounting: XLA cost analysis of ONE jitted denoiser forward (B=1)
times the exact number of B=1-equivalent denoiser evals the rollout issues
(DFoTRollout.stats). MFU = achieved FLOP/s divided by the 197 TFLOP/s bf16
peak of one TPU v5e chip.

Prints ONE JSON line: {"metric", "value", "unit", "vs_baseline", ...extras}.

Flags: --tiny (CPU smoke), --window8 (8-frame quick-start, README.md:72-74),
--frames N, --repeats N, --interp-batch N.
"""

import argparse
import json
import os
import time

import numpy as np

V5E_PEAK_FLOPS = 197e12  # bf16 peak, one TPU v5e chip


def _flops_of(compiled) -> float:
    ca = compiled.cost_analysis()
    if isinstance(ca, dict):
        return float(ca.get("flops", 0.0))
    if ca:
        return float(ca[0].get("flops", 0.0))
    return 0.0


def build_flagship(tiny: bool):
    """The DFoT_RE10K model (or a tiny CPU stand-in with the same code path)."""
    import jax
    import jax.numpy as jnp

    from dfot_tpu.models.uvit import UViT3DPose, UViTSpec

    if tiny:
        spec = UViTSpec(
            channels=(32, 64), emb_channels=64, patch_size=2,
            block_types=("ResBlock", "TransformerBlock"),
            block_dropouts=(0.0, 0.0), num_updown_blocks=(1,),
            num_mid_blocks=1, num_heads=2, pos_emb_type="rope",
            use_checkpointing=(False, False), max_temporal_length=4,
        )
        res, T, pose_dim = 16, 4, 6
    else:
        # configurations/dataset_experiment/realestate10k_video_generation.yaml
        spec = UViTSpec(
            channels=(128, 256, 576, 1152), emb_channels=1152, patch_size=2,
            block_types=(
                "ResBlock", "ResBlock", "TransformerBlock", "TransformerBlock",
            ),
            block_dropouts=(0.0, 0.0, 0.1, 0.1), num_updown_blocks=(3, 3, 6),
            num_mid_blocks=20, num_heads=9, pos_emb_type="rope",
            use_checkpointing=(False,) * 4, max_temporal_length=8,
        )
        res, T, pose_dim = 256, 8, 180  # ray_encoding conditioning

    model = UViT3DPose(
        spec=spec, x_channels=3, resolution=res, external_cond_dim=pose_dim,
        external_cond_dropout=0.1, dtype=jnp.float32 if tiny else jnp.bfloat16,
    )
    rk = jax.random.PRNGKey
    init = jax.jit(
        lambda: model.init(
            {"params": rk(0), "dropout": rk(1)},
            jnp.zeros((1, T, res, res, 3)),
            jnp.full((1, T), 500.0),
            jnp.zeros((1, T, res, res, pose_dim)),
        )
    )
    variables = init()
    if not tiny:
        # inference-cast the weights: bf16 params halve HBM weight traffic
        # and remove the per-matmul f32->bf16 convert temps XLA otherwise
        # materializes (the compute dtype is already bf16)
        variables = jax.tree_util.tree_map(
            lambda a: a.astype(jnp.bfloat16)
            if isinstance(a, jax.Array) and a.dtype == jnp.float32
            else a,
            variables,
        )
    jax.block_until_ready(variables)
    return model, variables, res, T, pose_dim


def main():
    ap = argparse.ArgumentParser()
    ap.add_argument("--tiny", action="store_true", help="CPU smoke test")
    ap.add_argument("--window8", action="store_true", help="8-frame quick-start bench")
    ap.add_argument("--frames", type=int, default=200)
    ap.add_argument("--repeats", type=int, default=1)
    ap.add_argument("--interp-batch", type=int, default=1,
                    help="interpolation max_batch_size (the flagship forward "
                    "anti-scales with batch at 256px on one v5e; 1 is fastest)")
    ap.add_argument("--conds", choices=["host_bf16", "device_bf16", "host_f32"],
                    default="host_bf16",
                    help="where/how the per-frame ray encodings live (bf16 "
                    "halves the ~188 MB-per-window upload; device-resident "
                    "OOMs on one 16G chip)")
    args = ap.parse_args()

    import jax
    import jax.numpy as jnp

    if args.tiny:
        jax.config.update("jax_platforms", "cpu")
    elif not os.environ.get("JAX_PLATFORMS", "").startswith("cpu"):
        # cache only device compiles (XLA:CPU AOT reload is feature-sensitive)
        jax.config.update(
            "jax_compilation_cache_dir",
            os.environ.get("DFOT_COMPILE_CACHE", os.path.expanduser("~/.cache/dfot_jax")),
        )
        jax.config.update("jax_persistent_cache_min_compile_time_secs", 1.0)

    from dfot_tpu.diffusion import DiffusionConfig, make_schedule
    from dfot_tpu.guidance.history_guidance import HistoryGuidance
    from dfot_tpu.sampling import DFoTRollout, RolloutConfig

    model, variables, res, T, pose_dim = build_flagship(args.tiny)

    steps = 5 if args.tiny else 50
    dcfg = DiffusionConfig(timesteps=1000, sampling_timesteps=steps,
                           objective="pred_v", clip_noise=20.0)
    sched = make_schedule(dcfg)

    def model_apply(variables, x, noise_levels, cond, cond_mask):
        return model.apply(variables, x, noise_levels, cond, cond_mask)

    # -- auditable FLOPs: one jitted denoiser forward at B=1 ---------------
    fwd = jax.jit(model_apply)
    x1 = jnp.zeros((1, T, res, res, 3))
    k1 = jnp.full((1, T), 500.0)
    p1 = jnp.zeros((1, T, res, res, pose_dim))
    compiled = fwd.lower(variables, x1, k1, p1, None).compile()
    flops_per_fwd = _flops_of(compiled)
    out = fwd(variables, x1, k1, p1, None)
    float(jnp.mean(out))  # force one full execution before timing
    # chain the forwards (each consumes the previous output) and fetch one
    # scalar at the end: on the tunneled platform block_until_ready can
    # return at dispatch and per-call device_get pays a slow transfer path
    n_fwd = 5
    t0 = time.perf_counter()
    x_c = x1
    for _ in range(n_fwd):
        x_c = fwd(variables, x_c, k1, p1, None)
    float(jnp.mean(x_c))
    fwd_sec = (time.perf_counter() - t0) / n_fwd
    fwd_mfu = flops_per_fwd / fwd_sec / V5E_PEAK_FLOPS

    # -- the rollout --------------------------------------------------------
    n_context = 1
    total_frames = T if (args.window8 or args.tiny) else args.frames
    ro = DFoTRollout(
        RolloutConfig(
            max_tokens=T, x_shape=(res, res, 3),
            external_cond_type="action",  # per-frame pose maps, sliced per window
            keyframe_density=None if total_frames <= T else 0.0625,
            sliding_context_len=T // 2,
            interpolation_max_batch_size=args.interp_batch,
        ),
        dcfg, sched, model_apply,
    )
    rngk = jax.random.PRNGKey

    if total_frames <= T:
        hg = HistoryGuidance.vanilla(guidance_scale=4.0, timesteps=dcfg.timesteps)
        ctx = jnp.zeros((1, T, res, res, 3))
        mask = np.zeros((1, T), dtype=np.int64)
        mask[:, :n_context] = 1
        # conditions stay HOST-side numpy; the rollout slices per window
        conds = np.zeros((1, T, res, res, pose_dim), np.float32)

        def run(seed):
            out = ro.sample_sequence(
                variables, rngk(seed), 1, length=T, context=ctx,
                context_mask=mask, conditions=conds, history_guidance=hg,
            )
            jax.block_until_ready(out)

        metric = f"flagship_frames_per_sec_chip_{T}f_window_{steps}ddim_nfe2"
        baseline_fps = 8.0 / 60.0  # reference: 8 frames in <1 min on 1 GPU
    else:
        pred_hg = HistoryGuidance.stabilized_vanilla(
            guidance_scale=4.0, stabilization_level=0.02, timesteps=dcfg.timesteps
        )
        interp_hg = HistoryGuidance.vanilla(
            guidance_scale=1.5, timesteps=dcfg.timesteps
        )
        xs = jnp.zeros((1, total_frames, res, res, 3))
        # 200 frames x 256^2 x 180ch of ray encodings: fp32 (9.4 GB) blows
        # HBM, and host-side slices cost a ~188 MB upload per window over
        # the tunnel. bf16 device-resident (4.7 GB) fits beside the bf16
        # weights and makes per-window slicing a free device op.
        if args.conds == "device_bf16":
            # 4.7 GB resident: OOMs beside the window working set on 16G v5e
            conds = jnp.zeros(
                (1, total_frames, res, res, pose_dim), jnp.bfloat16
            )
        elif args.conds == "host_bf16":
            import ml_dtypes

            conds = np.zeros(
                (1, total_frames, res, res, pose_dim), ml_dtypes.bfloat16
            )
        else:
            conds = np.zeros((1, total_frames, res, res, pose_dim), np.float32)

        def run(seed):
            out = ro.predict_videos(
                variables, rngk(seed), xs, n_context,
                conditions=conds,
                prediction_hg=pred_hg, interpolation_hg=interp_hg,
            )
            jax.block_until_ready(out)

        metric = f"flagship_frames_per_sec_chip_{total_frames}f_rollout_{steps}ddim"
        baseline_fps = 200.0 / 600.0  # reference: ~10 min on 1 GPU

    run(0)  # compile
    ro.stats = {"denoiser_evals_b1": 0, "windows": 0}
    times = []
    for i in range(args.repeats):
        t0 = time.perf_counter()
        run(i + 1)
        times.append(time.perf_counter() - t0)

    gen_frames = total_frames - n_context
    fps = gen_frames / min(times)
    evals = ro.stats["denoiser_evals_b1"] // args.repeats
    rollout_flops = evals * flops_per_fwd
    rollout_mfu = rollout_flops / min(times) / V5E_PEAK_FLOPS

    extras = {}
    for k in ("keyframe_sec", "interp_sec", "keyframe_evals_b1"):
        if k in ro.stats:
            v = ro.stats[k]
            extras[k] = round(v, 2) if isinstance(v, float) else v // args.repeats

    print(json.dumps({
        "metric": metric,
        "value": round(fps, 3),
        "unit": "frames/sec/chip",
        "vs_baseline": round(fps / baseline_fps, 2),
        "model": "UViT3DPose-467M" if not args.tiny else "UViT3DPose-tiny",
        "flops_per_forward": flops_per_fwd,
        "forward_ms": round(fwd_sec * 1e3, 2),
        "forward_mfu": round(fwd_mfu, 4),
        "denoiser_evals_b1": evals,
        "rollout_mfu": round(rollout_mfu, 4),
        "peak_flops_ref": V5E_PEAK_FLOPS,
        **extras,
    }))


if __name__ == "__main__":
    main()
