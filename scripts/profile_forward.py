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
    """Aggregate TPU op durations (us) by HLO op name from an xplane dump.

    Returns ``(per_op, per_cat, total, op_info)``. ``op_info`` maps the op
    name to ``{"cat", "flops", "bytes"}`` read from the event METADATA stats
    (the TPU xplane stores ``hlo_category`` / ``flops`` / ``bytes_accessed``
    on XEventMetadata.stats, not on the per-occurrence event stats — the r4
    parser looked at the wrong level, which is why the committed r4
    summaries' per_category_ms degenerated to op names).
    """
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
    per_op_count = collections.Counter()
    per_cat = collections.Counter()
    op_info = {}
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
            # The XLA Ops line NESTS control-flow wrappers (while /
            # conditional / call) around their body ops as time-enclosing
            # events — summing raw durations double-counts every op inside
            # a scan. Compute SELF time with an interval stack: a parent's
            # self time is its span minus its children's spans (= the
            # loop's own bookkeeping, which we want to see as overhead).
            evs = sorted(
                ((ev.offset_ps, ev.duration_ps, ev.metadata_id)
                 for ev in line.events),
                key=lambda t: (t[0], -t[1]),
            )
            stack = []  # (end_ps, child_span_accum_index)
            child_span = []
            self_us = []  # (metadata_id, self_us) in visit order
            for off, dur, mid in evs:
                while stack and off >= stack[-1][0]:
                    end, idx = stack.pop()
                    self_us[idx] = (self_us[idx][0], self_us[idx][1]
                                    - child_span[idx] / 1e6)
                if stack:
                    child_span[stack[-1][1]] += dur
                self_us.append((mid, dur / 1e6))
                child_span.append(0.0)
                stack.append((off + dur, len(self_us) - 1))
            while stack:
                end, idx = stack.pop()
                self_us[idx] = (self_us[idx][0], self_us[idx][1]
                                - child_span[idx] / 1e6)
            for mid, dur_us in self_us:
                md = plane.event_metadata[mid]
                name = md.name
                per_op[name] += dur_us
                per_op_count[name] += 1
                total += dur_us
                if name not in op_info:
                    info = {"cat": "", "flops": 0, "bytes": 0}
                    for st in md.stats:
                        sn = stat_md.get(st.metadata_id)
                        if sn == "hlo_category":
                            info["cat"] = st.str_value
                        elif sn == "flops":
                            info["flops"] = int(
                                st.int64_value or st.uint64_value
                            )
                        elif sn == "bytes_accessed":
                            info["bytes"] = int(
                                st.int64_value or st.uint64_value
                            )
                    op_info[name] = info
                per_cat[op_info[name]["cat"] or md.display_name] += dur_us
    for name, c in per_op_count.items():
        op_info[name]["count"] = c
    return per_op, per_cat, total, op_info


def build_summary(workload, batch, steps, wall_ms, per_op, per_cat, total,
                  op_info, **extra):
    """Committed-artifact JSON: EVERY op (no top-200 truncation — the r4
    summaries silently folded 16% of device time into 'unattributed'), with
    the xplane's own hlo_category / flops / bytes_accessed per op so
    recompute_floor.py can roofline each op class instead of accepting the
    tail at its measured rate."""
    return {
        "workload": workload,
        "batch": batch,
        "steps": steps,
        "wall_ms_per_step": round(wall_ms, 3),
        "traced_device_ms_per_step": round(total / 1e3 / steps, 3),
        "per_category_ms": {
            c: round(us / 1e3 / steps, 4) for c, us in per_cat.most_common()
        },
        "per_op": [
            {
                "name": name[:500],
                "ms": round(us / 1e3 / steps, 4),
                "cat": op_info.get(name, {}).get("cat", ""),
                # occurrences per traced step (scan bodies execute the same
                # op S times per step); gflops/mbytes are PER OCCURRENCE
                "count": op_info.get(name, {}).get("count", steps) / steps,
                "gflops": round(
                    op_info.get(name, {}).get("flops", 0) / 1e9, 3
                ),
                "mbytes": round(
                    op_info.get(name, {}).get("bytes", 0) / 1e6, 3
                ),
            }
            for name, us in per_op.most_common()
        ],
        # legacy key for older floor scripts (now un-truncated)
        "per_op_ms": {
            name[:500]: round(us / 1e3 / steps, 4)
            for name, us in per_op.most_common()
        },
        **extra,
    }


def main():
    ap = argparse.ArgumentParser()
    ap.add_argument("--batch", type=int, default=1)
    ap.add_argument("--steps", type=int, default=3)
    ap.add_argument("--tiny", action="store_true")
    ap.add_argument("--train", action="store_true",
                    help="profile a train step instead of the forward")
    ap.add_argument("--train-remat", choices=("all", "mid", "none"),
                    default="mid",
                    help="jax.checkpoint pattern — keep in sync with "
                    "bench.py --train-remat so the trace matches the "
                    "benchmarked configuration")
    ap.add_argument("--train-remat-policy",
                    choices=("none", "dots", "attn", "dots_attn"),
                    default="none",
                    help="saveable policy for the remated levels (match "
                    "bench.py --train-remat-policy)")
    ap.add_argument("--latent", choices=("xl", "b"), default="",
                    help="trace a LATENT-recipe train step (bench.py "
                    "bench_latent_train: xl = K600 @DiT/XL, b = Minecraft "
                    "@DiT/B) instead of the flagship; combine with --batch "
                    "and --latent-remat/--train-remat-policy")
    ap.add_argument("--latent-remat", action="store_true",
                    help="per-block gradient checkpointing for --latent "
                    "(default off — the b8 no-remat config is the measured "
                    "winner)")
    ap.add_argument("--flat-opt", action="store_true",
                    help="optax.flatten the --latent optimizer (one raveled "
                    "vector instead of per-leaf updates; small-op-tail A/B)")
    ap.add_argument("--out", default="")
    ap.add_argument("--precomputed-cond", action="store_true",
                    help="trace the in-scan eval (precomputed pose "
                    "conditioning) instead of the raw standalone forward")
    ap.add_argument("--window", choices=("interp", "keyframe"), default="",
                    help="trace ONE FULL jitted sampling window — the "
                    "program the 200-frame rollout actually executes "
                    "(precomputed-cond eval + HG compose + DDIM update, "
                    "all 50 scan steps): 'interp' = B x vanilla-HG "
                    "interpolation window (the rollout's dominant program), "
                    "'keyframe' = B=1 stabilized-vanilla sliding window. "
                    "One profiled 'step' = one window = "
                    "S*NFE*B B=1-equivalent denoiser evals")
    ap.add_argument("--summary-out", default="",
                    help="write a compact committed-artifact JSON (per-op / "
                    "per-category ms + wall clock) that "
                    "scripts/recompute_floor.py can re-derive the forward "
                    "floor from")
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

    B = args.batch
    trace_dir = args.out or tempfile.mkdtemp(prefix="dfot_prof_")

    if args.latent:
        from bench import bench_latent_train

        policy = (None if args.train_remat_policy == "none"
                  else args.train_remat_policy)
        line = bench_latent_train(
            model_kind=args.latent, batch=B, steps=args.steps,
            tiny=args.tiny, remat_policy=policy, remat=args.latent_remat,
            flat_opt=args.flat_opt, trace_dir=trace_dir,
        )
        wall = line["train_step_ms"] / 1e3
        workload = f"latent_train_{args.latent}"
        per_op, per_cat, total, op_info = parse_xplane(trace_dir)
        n = args.steps
        print(json.dumps({
            "batch": B,
            "wall_ms_per_step": round(wall * 1e3, 2),
            "traced_device_ms_per_step": round(total / 1e3 / n, 2),
            "train_mfu": line["train_mfu"],
        }))
        if args.summary_out:
            summary = build_summary(
                workload, B, n, wall * 1e3, per_op, per_cat, total, op_info,
                bench_line=line,
            )
            os.makedirs(os.path.dirname(args.summary_out) or ".",
                        exist_ok=True)
            with open(args.summary_out, "w") as f:
                json.dump(summary, f, indent=1)
            print(f"summary written: {args.summary_out}")
        print("\n== by category (ms/step) ==")
        for cat, us in per_cat.most_common(20):
            print(f"{us / 1e3 / n:9.3f}  {cat}")
        print("\n== top ops (ms/step) ==")
        for name, us in per_op.most_common(40):
            print(f"{us / 1e3 / n:9.3f}  {name[:110]}")
        print(f"\ntrace dir: {trace_dir}")
        return

    from bench import build_flagship

    model, variables, res, T, pose_dim = build_flagship(args.tiny)
    extra_summary = {}

    if args.window:
        # the exact rollout-window program from bench.py's 200-frame
        # workload: hoisted pose conditioning, HG-expanded batch, 50-step
        # DDIM lax.scan with HG compose + update inside — NOT the raw
        # standalone forward (which executes ~1.4e12 extra FLOPs of pose
        # conditioning per eval that the rollout never runs per step)
        import numpy as _np

        from dfot_tpu.diffusion import DiffusionConfig, make_schedule
        from dfot_tpu.guidance.history_guidance import HistoryGuidance
        from dfot_tpu.models.uvit import (
            patchify_tokens,
            precompute_pose_conditioning,
            unpatchify_tokens,
        )
        from dfot_tpu.sampling import DFoTRollout, RolloutConfig
        from dfot_tpu.utils.geometry import expand_pose_conditions_jax

        steps_ddim = 5 if args.tiny else 50
        dcfg = DiffusionConfig(timesteps=1000, sampling_timesteps=steps_ddim,
                               objective="pred_v", clip_noise=20.0)
        sched = make_schedule(dcfg)
        cdt = jnp.float32 if args.tiny else jnp.bfloat16
        ctype = "ray_encoding" if pose_dim == 180 else "ray"

        def cond_transform(c, v):
            maps = expand_pose_conditions_jax(c, ctype, res).astype(cdt)
            return precompute_pose_conditioning(model, v, maps)

        # token-layout scan state, exactly like bench.py's rollout
        p_sz = model.spec.patch_size
        model_tok = model.clone(token_io=True)
        ro = DFoTRollout(
            RolloutConfig(
                max_tokens=T, x_shape=(res, res, 3),
                external_cond_type="action",
                keyframe_density=0.0625, sliding_context_len=T // 2,
                interpolation_max_batch_size=B,
                cond_transform=cond_transform,
                state_codec=(
                    lambda x: patchify_tokens(x, p_sz),
                    lambda x: unpatchify_tokens(x, p_sz, res, res),
                ),
            ),
            dcfg, sched,
            lambda v, x, k, c, m: model_tok.apply(v, x, k, c, m),
        )
        if args.window == "interp":
            hg = HistoryGuidance.vanilla(
                guidance_scale=1.5, timesteps=dcfg.timesteps)
            mask = _np.zeros((B, T), dtype=_np.int64)
            mask[:, 0] = mask[:, -1] = 1
        else:
            B = 1
            hg = HistoryGuidance.stabilized_vanilla(
                guidance_scale=4.0, stabilization_level=0.02,
                timesteps=dcfg.timesteps)
            mask = _np.zeros((B, T), dtype=_np.int64)
            mask[:, : T // 2] = 1
        ctx = jnp.zeros((B, T, res, res, 3))
        pose = _np.zeros((B, T, 16), _np.float32)
        pose[..., :4] = [1.0, 1.0, 0.5, 0.5]
        pose[..., 4] = pose[..., 9] = pose[..., 14] = 1.0

        def run_window(seed):
            out = ro.sample_sequence(
                variables, jax.random.PRNGKey(seed), B, length=T,
                context=ctx, context_mask=mask, conditions=jnp.asarray(pose),
                history_guidance=hg,
            )
            jax.block_until_ready(out)

        ro.stats = {"denoiser_evals_b1": 0, "windows": 0}
        run_window(0)  # compile + settle
        evals_per_window = ro.stats["denoiser_evals_b1"]
        extra_summary["evals_b1_per_step"] = evals_per_window
        extra_summary["window_kind"] = args.window
        extra_summary["ddim_steps"] = steps_ddim
        t0 = time.perf_counter()
        with jax.profiler.trace(trace_dir):
            for i in range(args.steps):
                run_window(i + 1)
        wall = (time.perf_counter() - t0) / args.steps
    elif args.train:
        import optax

        from dfot_tpu.diffusion import DiffusionConfig, make_schedule
        from dfot_tpu.training import make_train_step
        from dfot_tpu.training.noise_levels import NoiseLevelConfig
        from dfot_tpu.training.state import create_train_state

        dcfg = DiffusionConfig(timesteps=1000, sampling_timesteps=50,
                               objective="pred_v", clip_noise=20.0)
        sched = make_schedule(dcfg)
        n_levels = 2 if args.tiny else 4
        remat = {
            "all": True,
            "none": False,
            "mid": (False,) * (n_levels - 1) + (True,),
        }[args.train_remat]
        tmodel, _, _, _, _ = build_flagship(
            args.tiny, remat=remat, remat_policy=args.train_remat_policy,
        )
        params = jax.tree_util.tree_map(
            lambda a: a.astype(jnp.float32)
            if isinstance(a, jax.Array) and a.dtype == jnp.bfloat16
            else a,
            variables,
        )

        def model_apply(p_, x, k, cond, cond_mask, rngs=None, train=False):
            return tmodel.apply(p_, x, k, cond, cond_mask, train, rngs=rngs)

        nl_cfg = NoiseLevelConfig(
            noise_level="random_independent", timesteps=dcfg.timesteps,
            is_continuous=dcfg.is_continuous,
        )
        tx = optax.chain(
            optax.clip_by_global_norm(1.0),
            optax.adamw(5e-5, b1=0.9, b2=0.999, weight_decay=1e-2),
        )
        state = create_train_state(params, tx, use_ema=True)
        del params, variables
        train_step = make_train_step(
            model_apply, dcfg, sched, nl_cfg, compute_dtype=jnp.bfloat16
        )
        batch = {
            "xs": jnp.zeros((B, T, res, res, 3), jnp.bfloat16),
            "conditions": jnp.zeros((B, T, res, res, pose_dim), jnp.bfloat16),
            "masks": jnp.ones((B, T), bool),
        }
        rngs = jax.random.split(jax.random.PRNGKey(0), args.steps + 1)
        state, m = train_step(state, batch, rngs[0])
        jax.block_until_ready(m["loss"])
        t0 = time.perf_counter()
        with jax.profiler.trace(trace_dir):
            for i in range(args.steps):
                state, m = train_step(state, batch, rngs[i + 1])
            float(m["loss"])
        wall = (time.perf_counter() - t0) / args.steps
    else:
        fwd = jax.jit(lambda v, x, k, c: model.apply(v, x, k, c, None))
        x = jnp.zeros((B, T, res, res, 3))
        k = jnp.full((B, T), 500.0)
        if args.precomputed_cond:
            # trace the program the rollout scan actually executes: the
            # step-invariant pose FiLM projections are hoisted out of the
            # scan (bench.py cond_transform), so the in-scan eval consumes
            # PRECOMPUTED conditioning
            from dfot_tpu.models.uvit import precompute_pose_conditioning
            from dfot_tpu.utils.geometry import expand_pose_conditions_jax

            import numpy as _np
            pose = _np.zeros((B, T, 16), _np.float32)
            pose[..., :4] = [1.0, 1.0, 0.5, 0.5]
            pose[..., 4] = pose[..., 9] = pose[..., 14] = 1.0
            ctype = "ray_encoding" if pose_dim == 180 else "ray"
            cdt = jnp.float32 if args.tiny else jnp.bfloat16

            def cond_transform(c, v):
                maps = expand_pose_conditions_jax(c, ctype, res).astype(cdt)
                return precompute_pose_conditioning(model, v, maps)

            p = jax.jit(cond_transform)(jnp.asarray(pose), variables)
        else:
            p = jnp.zeros((B, T, res, res, pose_dim))
        out = fwd(variables, x, k, p)
        float(jnp.mean(out))  # compile + settle

        t0 = time.perf_counter()
        with jax.profiler.trace(trace_dir):
            xc = x
            for _ in range(args.steps):
                xc = fwd(variables, xc, k, p)
            float(jnp.mean(xc))
        wall = (time.perf_counter() - t0) / args.steps

    per_op, per_cat, total, op_info = parse_xplane(trace_dir)
    n = args.steps
    print(json.dumps({
        "batch": B,
        "wall_ms_per_step": round(wall * 1e3, 2),
        "traced_device_ms_per_step": round(total / 1e3 / n, 2),
    }))
    if args.summary_out:
        workload = ("train_step" if args.train
                    else "window" if args.window else "forward")
        summary = build_summary(
            workload, B, n, wall * 1e3, per_op, per_cat, total, op_info,
            **extra_summary,
        )
        if not total:
            print(
                "WARNING: zero traced device time — no TPU op plane in the "
                "xplane (CPU run?); the summary will fail floor recompute",
                file=sys.stderr,
            )
        os.makedirs(os.path.dirname(args.summary_out) or ".", exist_ok=True)
        with open(args.summary_out, "w") as f:
            json.dump(summary, f, indent=1)
        print(f"summary written: {args.summary_out}")
    print("\n== by category (ms/step) ==")
    for cat, us in per_cat.most_common(20):
        print(f"{us / 1e3 / n:9.3f}  {cat}")
    print("\n== top ops (ms/step) ==")
    for name, us in per_op.most_common(40):
        print(f"{us / 1e3 / n:9.3f}  {name[:110]}")
    print(f"\ntrace dir: {trace_dir}")


if __name__ == "__main__":
    main()
