"""Certify the FSDP escape hatch at FLAGSHIP shapes (r4 verdict, missing #3).

The reference trains the 467M UViT3DPose at batch 8 per 80GB GPU
(/root/reference/configurations/dataset_experiment/
realestate10k_video_generation.yaml:19-23). One 16 GB v5e OOMs at b2-b8
under every remat pattern (measured, r4), so the training-parity claim is
"the recipe batch lives in FSDP across chips". This script PROVES it instead
of asserting it: it AOT-lowers and compiles the full flagship train step —
467M params, B=8 global, 256px x 8 frames, 180-ch ray conditioning, the
recipe's mid-level remat — over an 8-device (1 data x 8 fsdp) mesh and
records XLA's own compiled memory analysis per device.

Everything is ABSTRACT (jax.eval_shape init + ShapeDtypeStruct batch): no
parameter or activation memory is allocated on this host; the artifact is
the compiler's buffer-assignment accounting, the same machinery that
decides a real HBM OOM.

The certificate is RELATIVE, not absolute: XLA:CPU's temp accounting does
not schedule for peak memory (it reports ~91 GB of temps for the b1
single-chip step that MEASURED-fits and runs inside the real 16 GiB v5e),
so instead of comparing CPU temps against 16 GiB the script compiles BOTH
programs under the same compiler — the global-b8 ZeRO-3 8-chip step and
the b1 single-device step — and certifies that the b8 program's per-chip
temps do not exceed the measured-fits b1 reference's while its sharded
state (arguments) is 1/fsdp the size. Per-chip activations are b1 in both
by construction (batch sharded over the same devices as the params), so
"fits where the measured b1 step fits" follows.

    JAX_PLATFORMS=cpu XLA_FLAGS=--xla_force_host_platform_device_count=8 \
        PYTHONPATH= python scripts/certify_fsdp_flagship.py \
        [--batch 8] [--fsdp 8] [--out traces/fsdp_flagship_b8_memory.json]

The driver-facing summary also runs inside dryrun_multichip (asserts
fits_v5e_vs_measured_b1).
"""

from __future__ import annotations

import argparse
import json
import os
import sys
import time

sys.path.insert(0, os.path.join(os.path.dirname(__file__), ".."))

V5E_HBM_BYTES = 16 * 1024**3


def certify(batch: int = 8, fsdp: int = 8, data: int = 1, verbose: bool = True):
    import jax
    import jax.numpy as jnp
    import optax

    from bench import build_flagship_spec
    from dfot_tpu.diffusion import DiffusionConfig, make_schedule
    from dfot_tpu.models.uvit import UViT3DPose
    from dfot_tpu.parallel import make_mesh
    from dfot_tpu.parallel.mesh import replicated, shard_params
    from dfot_tpu.training import (
        NoiseLevelConfig,
        create_train_state,
        make_optimizer,
        make_train_step,
    )

    n = data * fsdp
    if len(jax.devices()) < n:
        raise SystemExit(
            f"need {n} devices (run with JAX_PLATFORMS=cpu "
            f"XLA_FLAGS=--xla_force_host_platform_device_count={n})"
        )
    # ZeRO-3 geometry: the BATCH is sharded over the fsdp axis too — batch
    # and parameters ride the same devices, so each chip holds b/(data*fsdp)
    # activations AND 1/fsdp of the params/EMA/Adam state, with XLA
    # all-gathering each layer's weights on the fly. (data=1, fsdp=8 with a
    # replicated batch would put the FULL b8 activations on every chip —
    # 576 GiB/device, measured — which is why plain "FSDP the params" does
    # not, by itself, make the recipe batch fit.)
    mesh = make_mesh((data, fsdp), devices=jax.devices()[:n])

    spec, res, T, pose_dim = build_flagship_spec(tiny=False, remat=(
        False, False, False, True))  # recipe: mid-level remat only
    model = UViT3DPose(
        spec=spec, x_channels=3, resolution=res, external_cond_dim=pose_dim,
        external_cond_dropout=0.1, dtype=jnp.bfloat16,
    )
    rk = jax.random.PRNGKey

    # abstract init: parameter SHAPES only, no host allocation
    a_vars = jax.eval_shape(
        lambda: model.init(
            {"params": rk(0), "dropout": rk(1)},
            jnp.zeros((1, T, res, res, 3)),
            jnp.full((1, T), 500.0),
            jnp.zeros((1, T, res, res, pose_dim)),
        )
    )
    # training keeps an f32 master copy (bench.py bench_train does the same)
    a_params = jax.tree_util.tree_map(
        lambda a: jax.ShapeDtypeStruct(
            a.shape, jnp.float32 if a.dtype == jnp.bfloat16 else a.dtype
        ),
        a_vars["params"],
    )
    n_params = sum(
        int(jnp.prod(jnp.asarray(a.shape)))
        for a in jax.tree_util.tree_leaves(a_params)
    )

    dcfg = DiffusionConfig(timesteps=1000, sampling_timesteps=50,
                           objective="pred_v", clip_noise=20.0)
    sched = make_schedule(dcfg)
    nl_cfg = NoiseLevelConfig(
        noise_level="random_independent", timesteps=dcfg.timesteps,
        is_continuous=dcfg.is_continuous,
    )
    tx = make_optimizer(lr=5e-5, num_warmup_steps=10_000)

    def model_apply(p, x, k, cond, cond_mask, rngs=None, train=False):
        return model.apply({"params": p}, x, k, cond, cond_mask, train,
                           rngs=rngs)

    train_step = make_train_step(
        model_apply, dcfg, sched, nl_cfg, compute_dtype=jnp.bfloat16
    )

    from jax.sharding import NamedSharding, PartitionSpec as P

    a_state = jax.eval_shape(
        lambda p: create_train_state(p, tx, use_ema=True), a_params
    )
    a_rng = jax.ShapeDtypeStruct((2,), jnp.uint32)

    def compile_once(m, bsz):
        with m:
            b_sh = NamedSharding(m, P(("data", "fsdp")))
            r_sh = replicated(m)
            # the FSDP path rule applied across the WHOLE state tree shards
            # params, EMA, and the Adam m/v moments alike (ZeRO-3: the
            # optimizer state lives sharded); scalars stay replicated
            st_sh = shard_params(a_state, m, min_size=1024)
            a_batch = {
                "xs": jax.ShapeDtypeStruct((bsz, T, res, res, 3),
                                           jnp.float32),
                "conditions": jax.ShapeDtypeStruct(
                    (bsz, T, res, res, pose_dim), jnp.bfloat16
                ),
                "masks": jax.ShapeDtypeStruct((bsz, T), jnp.bool_),
            }
            bt_sh = {k: b_sh for k in a_batch}
            t0 = time.perf_counter()
            lowered = jax.jit(
                train_step,
                in_shardings=(st_sh, bt_sh, r_sh),
                out_shardings=(st_sh, r_sh),
                donate_argnums=(0,),  # new state aliases the old in place
            ).lower(a_state, a_batch, a_rng)
            t_lower = time.perf_counter() - t0
            t0 = time.perf_counter()
            compiled = lowered.compile()
            t_compile = time.perf_counter() - t0
            ma = compiled.memory_analysis()
        return {
            "lower_sec": round(t_lower, 1),
            "compile_sec": round(t_compile, 1),
            "argument": int(ma.argument_size_in_bytes),
            "output": int(ma.output_size_in_bytes),
            "temp": int(ma.temp_size_in_bytes),
            "alias": int(ma.alias_size_in_bytes),
            "peak_gib": round(
                (ma.argument_size_in_bytes + ma.temp_size_in_bytes
                 + ma.output_size_in_bytes - ma.alias_size_in_bytes)
                / 1024**3, 3,
            ),
        }

    main_ma = compile_once(mesh, batch)
    # the calibration reference: the SAME train step at b1 on ONE device —
    # the program that measured-fits and runs on the real 16 GiB v5e
    # (bench.py flagship train line, r3/r4). XLA:CPU's temp accounting
    # overstates absolute HBM (~91 GB for that measured-fits program: CPU
    # buffer assignment doesn't schedule for peak memory), so the honest
    # certificate is RELATIVE: per-chip temps of the n-device global-b8
    # program must not exceed the b1 reference's, and the sharded state
    # must be smaller — then the b8/fsdp program fits wherever b1 fits.
    ref_ma = compile_once(
        make_mesh((1, 1), devices=jax.devices()[:1]), max(batch // n, 1)
    )
    fits_vs_b1 = (
        main_ma["temp"] <= ref_ma["temp"] * 1.02
        and main_ma["argument"] <= ref_ma["argument"]
    )

    out = {
        "model": "UViT3DPose-flagship",
        "params": n_params,
        "global_batch": batch,
        "mesh": {"data": data, "fsdp": fsdp},
        "remat": "mid",
        "resolution": res,
        "frames": T,
        "pose_dim": pose_dim,
        "backend": jax.default_backend(),
        "per_device": main_ma,
        "reference_b1_single_device": ref_ma,
        "v5e_hbm_gib": 16.0,
        # RELATIVE certificate (see compile_once comment): the global-b8
        # n-chip program's per-chip temps match the measured-fits b1
        # program's, and its sharded state is 1/fsdp of b1's — so it fits
        # a 16 GiB v5e wherever the (measured) b1 step does.
        "fits_v5e_vs_measured_b1": bool(fits_vs_b1),
        "state_bytes_saved_per_chip": int(
            ref_ma["argument"] - main_ma["argument"]
        ),
    }
    if verbose:
        print(json.dumps(out, indent=1))
    return out


def main():
    ap = argparse.ArgumentParser(description=__doc__)
    ap.add_argument("--batch", type=int, default=8)
    ap.add_argument("--fsdp", type=int, default=8)
    ap.add_argument("--data", type=int, default=1)
    ap.add_argument("--out", default="traces/fsdp_flagship_b8_memory.json")
    args = ap.parse_args()
    out = certify(args.batch, args.fsdp, args.data)
    if args.out:
        with open(args.out, "w") as f:
            json.dump(out, f, indent=1)
        print(f"artifact written: {args.out}")


if __name__ == "__main__":
    main()
