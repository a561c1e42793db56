"""End-to-end online-latent training/validation (kinetics-style config)."""

import os

import numpy as np
import pytest


OVERRIDES = [
    "+name=latent_smoke",
    "dataset=kinetics_600",  # latent.type=online
    "algorithm=dfot_video",
    "experiment=video_generation",
    "dataset.resolution=8",
    "dataset.max_frames=5",   # 1 + 4k frames -> 2 tokens at temporal factor 4
    "dataset.n_frames=5",
    "dataset.context_length=1",
    "++experiment.training.data.num_workers=0",
    "++dataset.latent.num_channels=4",
    "dataset.latent.downsampling_factor=[4,4]",
    "dataset.data_mean=null",
    "dataset.data_std=null",
    "++algorithm.vae.hidden_size=32",
    "++algorithm.backbone.hidden_size=32",
    "++algorithm.backbone.depth=1",
    "++algorithm.backbone.num_heads=2",
    "++algorithm.backbone.use_gradient_checkpointing=false",
    "++algorithm.backbone.patch_size=1",
    "++algorithm.diffusion.sampling_timesteps=2",
    "++algorithm.lr_scheduler.num_warmup_steps=1",
    "experiment.training.batch_size=2",
    "experiment.training.max_steps=2",
    "experiment.training.max_epochs=1",
    "experiment.validation.batch_size=2",
    "experiment.validation.limit_batch=1",
    "++algorithm.logging.metrics=[mse,psnr]",
    "++algorithm.logging.max_num_videos=1",
]


def test_online_latent_training_and_validation(tmp_path):
    import main as cli

    exp = cli.run(OVERRIDES + [f"output_dir={tmp_path}", "experiment.tasks=[training]"])
    assert int(exp.state.step) == 2
    # token shape check: 5 frames -> 2 tokens, 8px -> 2x2 latents
    assert exp.algo.x_shape == (2, 2, 4)
    assert exp.algo.max_tokens == 2

    exp2 = cli.run(
        OVERRIDES
        + [
            f"output_dir={tmp_path}/val",
            "experiment.tasks=[validation]",
            f"load={exp.ckpt_dir}/" + sorted(os.listdir(exp.ckpt_dir))[-1],
        ]
    )
    # decoded pixel-space videos were logged
    vids = os.listdir(os.path.join(exp2.output_dir, "videos"))
    assert vids
    assert exp2.last_metrics
