"""End-to-end CLI integration: train a tiny model, then validate with it.

Drives the same surface a user drives (main.run with reference-style
overrides) on the synthetic dataset fallback.
"""

import json
import os

import numpy as np
import pytest


TINY_OVERRIDES = [
    "+name=e2e_smoke",
    "dataset=ucf_101",  # no data on disk -> synthetic fallback
    "algorithm=dfot_video",
    "experiment=video_generation",
    "dataset.resolution=16",
    "dataset.max_frames=4",
    "dataset.context_length=1",
    "++dataset.latent.enabled=false",
    "++experiment.training.data.num_workers=0",
    "++algorithm.backbone.hidden_size=64",
    "++algorithm.backbone.depth=2",
    "++algorithm.backbone.num_heads=2",
    "++algorithm.backbone.use_gradient_checkpointing=false",
    "++algorithm.diffusion.sampling_timesteps=3",
    "++algorithm.lr_scheduler.num_warmup_steps=2",
    "experiment.training.batch_size=2",
    "experiment.training.max_steps=3",
    "experiment.training.max_epochs=1",
    "++experiment.training.checkpointing.every_n_train_steps=2",
    "experiment.validation.batch_size=2",
    "experiment.validation.limit_batch=1",
    "++algorithm.logging.max_num_videos=2",
]


@pytest.fixture(scope="module")
def trained_run(tmp_path_factory):
    import main as cli

    out_root = tmp_path_factory.mktemp("e2e")
    overrides = TINY_OVERRIDES + [
        f"output_dir={out_root}",
        "experiment.tasks=[training]",
    ]
    exp = cli.run(overrides)
    return exp


def test_training_produces_checkpoints_and_metrics(trained_run):
    exp = trained_run
    assert int(trained_run.state.step) == 3
    ckpts = os.listdir(exp.ckpt_dir)
    assert any(c.startswith("checkpoint_") for c in ckpts)
    with open(os.path.join(exp.output_dir, "metrics.jsonl")) as f:
        lines = [json.loads(l) for l in f]
    assert not lines or all(np.isfinite(l.get("loss", 0.0)) for l in lines)


def test_validation_from_checkpoint(trained_run, tmp_path):
    import main as cli

    ckpt = os.path.join(
        trained_run.ckpt_dir,
        sorted(os.listdir(trained_run.ckpt_dir))[-1],
    )
    overrides = TINY_OVERRIDES + [
        f"output_dir={tmp_path}",
        "experiment.tasks=[validation]",
        f"load={ckpt}",
    ]
    exp = cli.run(overrides)
    videos_dir = os.path.join(exp.output_dir, "videos")
    assert os.path.isdir(videos_dir) and len(os.listdir(videos_dir)) > 0
    with open(os.path.join(exp.output_dir, "metrics.jsonl")) as f:
        lines = [json.loads(l) for l in f]
    keys = set().union(*(l.keys() for l in lines))
    assert any("prediction/mse" in k for k in keys)
    assert any("prediction/fvd" in k for k in keys)


def test_mid_training_sampled_validation(tmp_path):
    """val_every_n_step fires during training: denoising loss + denoising-vis
    GIF always; with validate_sample=true also sampled videos + metrics
    (reference run_validation, simple_video_generation.py:385-514)."""
    import main as cli

    overrides = TINY_OVERRIDES + [
        f"output_dir={tmp_path}",
        "experiment.tasks=[training]",
        "++experiment.validation.val_every_n_step=2",
        "++experiment.validation.validate_sample=true",
        "++algorithm.tasks.interpolation.enabled=false",
    ]
    exp = cli.run(overrides)
    with open(os.path.join(exp.output_dir, "metrics.jsonl")) as f:
        lines = [json.loads(l) for l in f]
    keys = set().union(*(l.keys() for l in lines))
    assert "validation/loss" in keys
    assert any(k.startswith("validation/prediction/") for k in keys)
    videos = os.listdir(os.path.join(exp.output_dir, "videos"))
    assert any(v.startswith("denoising_vis_step") for v in videos)
    assert any(v.startswith("prediction_validation_step") for v in videos)


def test_load_by_run_id_and_name(trained_run, tmp_path):
    """load=<run-id> / load=<name> resolve through the local run registry
    (offline counterpart of the reference's wandb-run-id checkpoint
    resolution, utils/ckpt_utils.py:85-121)."""
    import json

    from dfot_tpu.training.checkpoint import resolve_run_checkpoint

    root = os.path.dirname(
        os.path.dirname(os.path.dirname(os.path.dirname(
            os.path.dirname(os.path.dirname(trained_run.output_dir))
        )))
    )
    reg = os.path.join(root, "registry.jsonl")
    assert os.path.exists(reg)
    with open(reg) as f:
        recs = [json.loads(l) for l in f]
    rec = [r for r in recs if r["output_dir"] == os.path.abspath(trained_run.output_dir)][-1]

    by_id = resolve_run_checkpoint(rec["run_id"], root)
    by_name = resolve_run_checkpoint("e2e_smoke", root)
    assert by_id is not None and by_id.startswith(os.path.abspath(trained_run.output_dir))
    assert by_name == by_id
    assert resolve_run_checkpoint("no-such-run", root) is None

    # full CLI drive: validate from the run id
    import main as cli

    overrides = TINY_OVERRIDES + [
        f"output_dir={root}",
        "experiment.tasks=[validation]",
        f"load={rec['run_id']}",
        "++algorithm.logging.metrics=[mse]",
        "++algorithm.tasks.interpolation.enabled=false",
    ]
    exp = cli.run(overrides)
    with open(os.path.join(exp.output_dir, "metrics.jsonl")) as f:
        lines = [json.loads(l) for l in f]
    assert any("prediction/mse" in k for l in lines for k in l)


def test_training_with_tensor_parallel_mesh(tmp_path):
    """CLI training with experiment.training.mesh.tensor=2 (+ ring-attention
    routing enabled) builds a (data, fsdp, tensor) mesh and trains; the tiny
    attentions fall below the ring threshold, so sequence_parallel here
    certifies the config path, not the routing itself."""
    import main as cli

    from dfot_tpu.ops import attention as att_mod

    overrides = TINY_OVERRIDES + [
        f"output_dir={tmp_path}",
        "experiment.tasks=[training]",
        "++experiment.training.mesh.tensor=2",
        "++experiment.training.mesh.sequence_parallel=true",
    ]
    try:
        exp = cli.run(overrides)
    finally:
        att_mod.set_sequence_parallel(None)
    assert int(exp.state.step) == 3
    # the mesh actually carried the tensor axis
    assert dict(exp.mesh.shape).get("tensor") == 2


def test_validation_with_tensor_parallel_sampling_mesh(trained_run, tmp_path):
    """validation.mesh.tensor=2: the sampling mesh carries a tensor axis and
    validation still produces metrics (tiny attentions stay below the ring
    threshold — this certifies the config path + mesh plumbing)."""
    import main as cli

    from dfot_tpu.ops import attention as att_mod

    ckpt = os.path.join(
        trained_run.ckpt_dir,
        sorted(os.listdir(trained_run.ckpt_dir))[-1],
    )
    overrides = TINY_OVERRIDES + [
        f"output_dir={tmp_path}",
        "experiment.tasks=[validation]",
        f"load={ckpt}",
        "++experiment.validation.mesh.tensor=2",
        "++experiment.validation.mesh.sequence_parallel=true",
    ]
    try:
        exp = cli.run(overrides)
    finally:
        att_mod.set_sequence_parallel(None)
    with open(os.path.join(exp.output_dir, "metrics.jsonl")) as f:
        lines = [json.loads(l) for l in f]
    assert any("prediction/mse" in k for l in lines for k in l)
    mesh = exp.algo.rollout_cfg.mesh
    assert mesh is not None and dict(mesh.shape).get("tensor") == 2
