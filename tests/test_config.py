"""Config engine tests: composition, interpolation, overrides, shortcuts.

Exercises the same CLI surface the reference exposes
(reference: main.py:252-327, utils/hydra_utils.py:43-113).
"""

from dfot_tpu.config import load_config, unwrap_shortcuts
import os

CONFIG_DIR = os.path.join(os.path.dirname(__file__), "..", "configurations")


def test_default_composition():
    cfg = load_config([])
    assert cfg.algorithm.backbone.name == "dit3d"
    assert cfg.experiment.tasks == ["training"]
    assert cfg.dataset._name == "kinetics_600"
    assert cfg.algorithm.diffusion.timesteps == 1000
    assert cfg.algorithm.diffusion.sampling_timesteps == 50


def test_interpolation_follows_overrides():
    cfg = load_config(["dataset=realestate10k_mini"])
    # x_shape interpolates dataset.observation_shape -> dataset.resolution
    assert cfg.algorithm.x_shape == [3, 256, 256]
    cfg.dataset.resolution = 64
    assert cfg.algorithm.x_shape == [3, 64, 64]
    # max_frames follows the dataset group
    assert cfg.algorithm.max_frames == 8


def test_dataset_experiment_overlay():
    cfg = load_config(["dataset=realestate10k_mini", "experiment=video_generation"])
    # overlay must override algorithm + experiment values globally
    assert cfg.algorithm.diffusion.beta_schedule == "cosine_simple_diffusion"
    assert cfg.algorithm.diffusion.loss_weighting.strategy == "sigmoid"
    assert cfg.experiment.training.lr == 5e-5
    assert cfg.algorithm.backbone.num_mid_blocks == 20


def test_value_overrides():
    cfg = load_config(
        [
            "algorithm.diffusion.sampling_timesteps=10",
            "+name=test_run",
            "++algorithm.tasks.prediction.history_guidance.name=vanilla",
            "++algorithm.tasks.prediction.history_guidance.guidance_scale=4.0",
        ]
    )
    assert cfg.algorithm.diffusion.sampling_timesteps == 10
    assert cfg.name == "test_run"
    hg = cfg.algorithm.tasks.prediction.history_guidance
    assert hg.name == "vanilla" and hg.guidance_scale == 4.0


def test_group_reselection():
    cfg = load_config(["algorithm=dfot_video_pose"])
    assert cfg.algorithm.backbone.name == "u_vit3d_pose"
    assert cfg.algorithm.camera_pose_conditioning.type == "ray_encoding"
    cfg2 = load_config(["algorithm=dfot_video_pose", "algorithm/backbone=dit3d_pose"])
    assert cfg2.algorithm.backbone.name == "dit3d_pose"


def test_shortcut_expansion():
    args = unwrap_shortcuts(["@DiT/XL", "dataset=ucf_101"], CONFIG_DIR)
    assert "++algorithm.backbone.depth=28" in args
    cfg = load_config(["@DiT/XL"])
    assert cfg.algorithm.backbone.hidden_size == 1152
    assert cfg.algorithm.backbone.depth == 28


def test_continuous_diffusion_shortcut():
    cfg = load_config(["@diffusion/continuous", "dataset=realestate10k_mini"])
    assert cfg.algorithm.diffusion.is_continuous is True
    assert cfg.algorithm.diffusion.precond_scale == 0.125
    assert cfg.algorithm.backbone.use_fourier_noise_embedding is True


def test_missing_override_key_raises():
    import pytest

    with pytest.raises(KeyError):
        load_config(["nonexistent.key=1"])


def test_every_shortcut_preset_expands():
    """All @shortcut presets (model-size tables mirrored from the reference)
    flatten to forced overrides without error."""
    import glob

    presets = [
        os.path.relpath(p, os.path.join(CONFIG_DIR, "shortcut"))[:-5]
        for p in glob.glob(
            os.path.join(CONFIG_DIR, "shortcut", "**", "*.yaml"), recursive=True
        )
    ]
    assert len(presets) >= 45
    for name in presets:
        out = unwrap_shortcuts([f"@{name}"], CONFIG_DIR)
        assert out and all(o.startswith("++") for o in out), name


def test_sd_video_baseline_leaves():
    """algorithm=sd_video / sd_video_3d: the reference's standard-diffusion
    baseline leaves (configurations/algorithm/sd_video{,_3d}.yaml) — same
    algorithm classes with full-sequence noise + fixed-context training."""
    cfg = load_config([
        "+name=x", "dataset=ucf_101", "algorithm=sd_video",
        "experiment=video_generation",
    ])
    assert cfg.algorithm._name == "sd_video"
    assert cfg.algorithm.noise_level == "random_uniform"
    assert cfg.algorithm.fixed_context.enabled is True
    assert cfg.algorithm.fixed_context.dropout == 0.1
    assert cfg.algorithm.diffusion.loss_weighting.strategy == "min_snr"

    cfg3 = load_config([
        "+name=x", "dataset=realestate10k_mini", "algorithm=sd_video_3d",
        "experiment=video_generation",
    ])
    assert cfg3.algorithm._name == "sd_video_3d"
    assert cfg3.algorithm.noise_level == "random_uniform"
    assert cfg3.algorithm.camera_pose_conditioning.type == "ray_encoding"
