"""CLI entry point — reference-compatible surface (reference: main.py:252-327).

Usage:
    python main.py +name=EXPERIMENT_NAME dataset=... algorithm=... \
        experiment=... [@shortcut/...] [key.sub=value] [++forced=value]

Supports:
    +name=...       required experiment name (like the reference)
    load=PATH       checkpoint dir (checkpoint_<step>/) or run output dir
    resume=PATH     resume training from a checkpoint/run dir
    experiment.tasks=[training|validation|test]
"""

import os
import sys
from datetime import datetime


def run(argv):
    from dfot_tpu.config import load_config
    from dfot_tpu.experiments import build_experiment

    # persistent XLA compilation cache: repeat runs (bench, validation
    # sweeps, requeued jobs) skip the multi-minute compiles
    import jax

    # multi-host wiring must happen before ANY backend query (reference gets
    # this from Accelerate's init_process_group, simple_video_generation.py
    # :153-158); no-op for single-process launches
    from dfot_tpu.parallel.multihost import initialize as _mh_init

    _mh_init()

    if not os.environ.get("JAX_PLATFORMS", "").startswith("cpu"):
        # XLA:CPU AOT cache entries are machine-feature-sensitive (reload
        # warnings / potential SIGILL); cache only device compiles
        jax.config.update(
            "jax_compilation_cache_dir",
            os.environ.get("DFOT_COMPILE_CACHE", os.path.expanduser("~/.cache/dfot_jax")),
        )
        jax.config.update("jax_persistent_cache_min_compile_time_secs", 1.0)

    cfg = load_config(argv)
    if "name" not in cfg:
        raise ValueError(
            "must specify a name for the run with command line argument '+name=[name]'"
        )

    # cluster dispatch (reference main.py:162-249): when a cluster config is
    # selected and we're on a login node, render + submit the launch script
    # that re-runs this exact command on the compute node
    if cfg.get("cluster") is not None:
        from dfot_tpu.utils.cluster import is_compute_node, submit_cluster_job

        if not is_compute_node():
            command = "python main.py " + " ".join(argv)
            script = submit_cluster_job(
                cfg.cluster, str(cfg.name), command, str(cfg.output_dir)
            )
            print(f"submitted cluster job: {script}")
            return None

    choices = cfg.get("_choices", {})
    stamp = datetime.now().strftime("%Y-%m-%d/%H-%M-%S")
    if jax.process_count() > 1:
        # every host must resolve the SAME run dir: checkpoint saves are a
        # cross-process collective into one directory, and a per-host
        # datetime stamp diverges whenever launches straddle a second
        import numpy as _np

        from dfot_tpu.parallel.multihost import broadcast_from_zero

        t0 = int(
            _np.asarray(
                broadcast_from_zero(
                    _np.asarray([int(datetime.now().timestamp())], _np.int64)
                )
            ).item()
        )
        stamp = datetime.fromtimestamp(t0).strftime("%Y-%m-%d/%H-%M-%S")
    output_dir = os.path.join(
        str(cfg.output_dir),
        str(choices.get("experiment", "exp")),
        str(cfg.experiment.tasks[0]),
        str(choices.get("dataset", "data")),
        str(choices.get("algorithm", "algo")),
        stamp,
    )

    from dfot_tpu.training.checkpoint import register_run, resolve_run_checkpoint

    # resolve load= BEFORE registering this run: registering first would make
    # the fresh (checkpoint-less) run the latest match for its own name and
    # shadow the trained run the user is pointing at
    load = cfg.get("load") or cfg.get("resume")
    if load and not os.path.exists(str(load)) and not str(load).startswith("pretrained:"):
        # reference: load=<wandb-run-id> resolves through the run registry
        # (utils/ckpt_utils.py:85-121); here the local registry.jsonl
        resolved = resolve_run_checkpoint(str(load), str(cfg.output_dir))
        if resolved is not None:
            print(f"resolved load={load} -> {resolved}")
            load = resolved

    if jax.process_index() == 0:
        run_id = register_run(str(cfg.output_dir), str(cfg.name), output_dir)
        print(f"run id: {run_id} (load={run_id} resumes this run's checkpoints)")
    experiment = build_experiment(cfg, output_dir, load)
    for task in cfg.experiment.tasks:
        experiment.exec_task(task)
    return experiment


if __name__ == "__main__":
    run(sys.argv[1:])
