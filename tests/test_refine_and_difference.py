"""Tests: go-back refinement sampling + Difference-DFoT algorithm."""

import jax
import jax.numpy as jnp
import numpy as np
import pytest

from dfot_tpu.config import load_config
from dfot_tpu.diffusion import DiffusionConfig, make_schedule, predict_v
from dfot_tpu.diffusion.core import _gather
from dfot_tpu.sampling import DFoTRollout, RolloutConfig
from dfot_tpu.sampling.sampler import plan_sampling
from dfot_tpu.guidance.history_guidance import HistoryGuidance

X_SHAPE = (4, 4, 1)
DCFG = DiffusionConfig(timesteps=1000, sampling_timesteps=8, objective="pred_v")
SCHED = make_schedule(DCFG)


def oracle_apply(variables, x, noise_input, cond, cond_mask):
    B, T = x.shape[:2]
    k = noise_input.astype(jnp.int32)
    tgt = (jnp.arange(T, dtype=jnp.float32) / 10.0).reshape(1, T, 1, 1, 1)
    tgt = jnp.broadcast_to(tgt, x.shape)
    sq_ac = _gather(SCHED.sqrt_alphas_cumprod, k, x.ndim)
    sq_om = _gather(SCHED.sqrt_one_minus_alphas_cumprod, k, x.ndim)
    eps = (x - sq_ac * tgt) / jnp.where(sq_om == 0, 1.0, sq_om)
    return predict_v(SCHED, tgt, k, eps)


def test_refine_plan_marks_goback_steps():
    hg = HistoryGuidance.conditional(timesteps=1000)
    mask = np.zeros((1, 4), dtype=np.int64)
    plan = plan_sampling(
        mask, hg, "full_sequence", 1000, 8, 4, 0,
        refine={"goback_length": 3, "n_goback": 1},
    )
    assert plan.renoise.any() and not plan.renoise.all()
    # on renoise steps, levels increase; on others they decrease
    up = (plan.to_levels > plan.from_levels).any(axis=(1, 2))
    np.testing.assert_array_equal(up, plan.renoise)


def test_refinement_sampling_converges():
    ro = DFoTRollout(
        RolloutConfig(
            max_tokens=4, x_shape=X_SHAPE,
            refinement={"goback_length": 3, "n_goback": 1},
        ),
        DCFG, SCHED, oracle_apply,
    )
    out = ro.sample_sequence({}, jax.random.PRNGKey(0), batch_size=1, length=4)
    vals = np.asarray(out).mean(axis=(2, 3, 4))
    np.testing.assert_allclose(vals[0], np.arange(4) / 10.0, atol=5e-3)


TINY_DIFF_OVERRIDES = [
    "+name=diff_smoke",
    "dataset=ucf_101",
    "algorithm=difference_dfot_video",
    "experiment=video_generation",
    "dataset.resolution=8",
    "dataset.max_frames=2",
    "dataset.context_length=1",
    "++dataset.latent.enabled=false",
    "++algorithm.backbone.hidden_size=32",
    "++algorithm.backbone.depth=1",
    "++algorithm.backbone.num_heads=2",
    "++algorithm.backbone.use_gradient_checkpointing=false",
    "++algorithm.diffusion.sampling_timesteps=3",
]


@pytest.mark.parametrize("merge", ["concat", "interleaved"])
def test_difference_algo_train_and_sample(merge):
    from dfot_tpu.algorithms import build_algorithm

    cfg = load_config(TINY_DIFF_OVERRIDES + [f"++algorithm.backbone.merge_type={merge}"])
    algo = build_algorithm(cfg, compute_dtype=jnp.float32)
    state = algo.make_train_state(jax.random.PRNGKey(0))
    step = algo.make_train_step()
    batch = {
        "xs": jnp.ones((2, 2, 8, 8, 3)) * 0.4,
        "masks": jnp.ones((2, 2), bool),
    }
    state, metrics = step(state, batch, jax.random.PRNGKey(1))
    assert np.isfinite(float(metrics["loss"]))
    assert "diff_loss" in metrics and "xs_loss" in metrics

    # context > 0 requires interleaved merge (reference :184)
    nct = 1 if merge == "interleaved" else 0
    out = algo.sample_videos(
        state.params, jax.random.PRNGKey(2), batch["xs"], n_context_tokens=nct
    )
    assert out["prediction"].shape == batch["xs"].shape
    assert out["prediction_diff"].shape == batch["xs"].shape
    if merge == "concat":
        with pytest.raises(ValueError):
            algo.sample_videos(
                state.params, jax.random.PRNGKey(2), batch["xs"], n_context_tokens=1
            )


def test_difference_algo_sliding_window_sampling():
    """Windows slide over the MERGED stream: 3 frames -> 6 merged tokens
    through 4-token windows (reference difference_dfot_video.py:463-531)."""
    from dfot_tpu.algorithms import build_algorithm

    cfg = load_config(
        TINY_DIFF_OVERRIDES
        + [
            "++algorithm.backbone.merge_type=interleaved",
            "++algorithm.tasks.prediction.sliding_context_len=2",
        ]
    )
    algo = build_algorithm(cfg, compute_dtype=jnp.float32)
    state = algo.make_train_state(jax.random.PRNGKey(0))
    xs = jnp.ones((1, 3, 8, 8, 3)) * 0.4  # 3 > max_tokens = 2
    out = algo.sample_videos(
        state.params, jax.random.PRNGKey(2), xs, n_context_tokens=1
    )
    assert out["prediction"].shape == xs.shape
    # context frame is returned unchanged
    np.testing.assert_allclose(
        np.asarray(out["prediction"][:, 0]), np.asarray(xs[:, 0]), atol=1e-5
    )


def test_difference_factorized_matrix_train_and_sample():
    """The difference+matrix-attention recipe (reference configurations/
    algorithm/backbone/difference_dit3d_factorized_matrix.yaml): config leaf
    loads, one train step + one sampling pass run."""
    from dfot_tpu.algorithms import build_algorithm

    cfg = load_config(
        TINY_DIFF_OVERRIDES
        + [
            "algorithm/backbone=difference_dit3d_factorized_matrix",
            "++algorithm.backbone.hidden_size=32",
            "++algorithm.backbone.embed_row_dim=32",
            "++algorithm.backbone.num_heads=2",
            "++algorithm.backbone.num_row_heads=2",
            "++algorithm.backbone.depth=1",
            "++algorithm.backbone.use_gradient_checkpointing=false",
        ]
    )
    assert cfg.algorithm.backbone.variant == "factorized_matrix_attention"
    assert cfg.algorithm.backbone.merge_type == "interleaved"
    algo = build_algorithm(cfg, compute_dtype=jnp.float32)
    state = algo.make_train_state(jax.random.PRNGKey(0))
    step = algo.make_train_step()
    batch = {
        "xs": jnp.ones((2, 2, 8, 8, 3)) * 0.4,
        "masks": jnp.ones((2, 2), bool),
    }
    state, metrics = step(state, batch, jax.random.PRNGKey(1))
    assert np.isfinite(float(metrics["loss"]))
    out = algo.sample_videos(
        state.params, jax.random.PRNGKey(2), batch["xs"], n_context_tokens=1
    )
    assert out["prediction"].shape == batch["xs"].shape
