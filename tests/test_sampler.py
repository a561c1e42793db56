"""End-to-end sampler tests with an oracle denoiser.

The oracle predicts the exact v toward a known target video, so the full
pipeline (scheduling -> history guidance -> denoise -> DDIM -> compose ->
context revert) must transport noise to the target. This exercises the same
seams the reference's sampling stack wires together (dfot_video.py:516-763).
"""

import jax
import jax.numpy as jnp
import numpy as np
import pytest

from dfot_tpu.diffusion import DiffusionConfig, make_schedule, predict_v
from dfot_tpu.diffusion.core import _gather
from dfot_tpu.guidance.history_guidance import HistoryGuidance
from dfot_tpu.sampling import DFoTRollout, RolloutConfig

X_SHAPE = (4, 4, 1)
DCFG = DiffusionConfig(timesteps=1000, sampling_timesteps=5, objective="pred_v")
SCHED = make_schedule(DCFG)

# the "video" the oracle denoises toward: frame t has constant value t/10
TARGET_FRAME_VALUES = jnp.arange(16, dtype=jnp.float32) / 10.0


def oracle_apply(variables, x, noise_input, cond, cond_mask):
    """Exact v-prediction toward a target.

    If ``cond`` (B, T, 1) is given, the per-frame target value is the
    condition (this lets sliding windows know absolute positions and also
    exercises the rollout's condition-slicing path); otherwise the target is
    the window-local frame index / 10.
    """
    B, T = x.shape[:2]
    k = noise_input.astype(jnp.int32)
    if cond is not None:
        tgt = cond.reshape(B, T, 1, 1, 1)
    else:
        tgt = TARGET_FRAME_VALUES[:T].reshape(1, T, 1, 1, 1)
    tgt = jnp.broadcast_to(tgt, x.shape).astype(x.dtype)
    sq_ac = _gather(SCHED.sqrt_alphas_cumprod, k, x.ndim)
    sq_om = _gather(SCHED.sqrt_one_minus_alphas_cumprod, k, x.ndim)
    eps = (x - sq_ac * tgt) / jnp.where(sq_om == 0, 1.0, sq_om)
    return predict_v(SCHED, tgt, k, eps)


def _rollout(**kw):
    cfg = dict(
        max_tokens=4,
        x_shape=X_SHAPE,
        scheduling_matrix="full_sequence",
    )
    cfg.update(kw)
    return DFoTRollout(RolloutConfig(**cfg), DCFG, SCHED, oracle_apply)


def _frame_values(xs):
    return np.asarray(xs).mean(axis=(2, 3, 4))


def test_sample_sequence_unconditional_converges():
    ro = _rollout()
    out = ro.sample_sequence({}, jax.random.PRNGKey(0), batch_size=2, length=4)
    assert out.shape == (2, 4) + X_SHAPE
    np.testing.assert_allclose(
        _frame_values(out), np.tile(np.arange(4) / 10.0, (2, 1)), atol=1e-3
    )


def test_sample_sequence_with_context_and_vanilla_hg():
    ro = _rollout()
    B, L = 1, 4
    ctx = jnp.zeros((B, L) + X_SHAPE).at[:, 0].set(7.7)
    mask = np.zeros((B, L), dtype=np.int64)
    mask[:, 0] = 1
    hg = HistoryGuidance.vanilla(guidance_scale=2.0, timesteps=DCFG.timesteps)
    out = ro.sample_sequence(
        {}, jax.random.PRNGKey(0), B, length=L, context=ctx, context_mask=mask,
        history_guidance=hg,
    )
    vals = _frame_values(out)
    # context frame preserved exactly
    assert vals[0, 0] == pytest.approx(7.7, abs=1e-6)
    # generated frames converge to the oracle target
    np.testing.assert_allclose(vals[0, 1:], np.arange(1, 4) / 10.0, atol=1e-3)


def test_sample_sequence_padding_window():
    ro = _rollout()
    B, L = 1, 2  # shorter than max_tokens -> padded to 4 internally
    ctx = jnp.zeros((B, L) + X_SHAPE).at[:, 0].set(3.0)
    mask = np.zeros((B, L), dtype=np.int64)
    mask[:, 0] = 1
    out = ro.sample_sequence(
        {}, jax.random.PRNGKey(1), B, length=L, context=ctx, context_mask=mask
    )
    assert out.shape == (B, L) + X_SHAPE
    assert _frame_values(out)[0, 0] == pytest.approx(3.0, abs=1e-6)
    assert _frame_values(out)[0, 1] == pytest.approx(0.1, abs=1e-3)


def test_predict_sequence_sliding_window():
    ro = _rollout(sliding_context_len=2, external_cond_type="action")
    B = 1
    ctx = jnp.full((B, 1) + X_SHAPE, 0.0)
    # absolute-position targets delivered via the action-condition channel
    conds = (jnp.arange(8, dtype=jnp.float32) / 10.0).reshape(1, 8, 1)
    out = ro.predict_sequence(
        {}, jax.random.PRNGKey(0), ctx, length=8, conditions=conds,
        history_guidance=HistoryGuidance.conditional(timesteps=DCFG.timesteps),
    )
    assert out.shape == (B, 8) + X_SHAPE
    # windows: ctx 1 + 3 new, then slide with context 2
    np.testing.assert_allclose(
        _frame_values(out)[0], np.arange(8) / 10.0, atol=2e-3
    )


def test_interpolate_videos():
    ro = _rollout(external_cond_type="action")
    B, T = 1, 7
    xs = jnp.zeros((B, T) + X_SHAPE)
    xs = xs.at[:, 0].set(0.0).at[:, 6].set(0.6)
    mask = np.zeros((B, T), dtype=bool)
    mask[:, [0, 6]] = True
    conds = (jnp.arange(T, dtype=jnp.float32) / 10.0).reshape(1, T, 1)
    out = ro.interpolate_videos({}, jax.random.PRNGKey(0), xs, mask, conditions=conds)
    vals = _frame_values(out)[0]
    np.testing.assert_allclose(vals, np.arange(7) / 10.0, atol=2e-3)


@pytest.mark.parametrize("B,max_bs", [(1, 2), (2, 3)])
def test_interpolate_videos_max_batch_size(B, max_bs):
    """interpolation_max_batch_size splits a round's chunks into several
    dispatches. max_bs % B == 0 takes the grouped whole-chunk path; a
    non-multiple falls back to row slicing — both must converge to the
    oracle target (reference: dfot_video.py max_batch_size chunking)."""
    ro = _rollout(
        external_cond_type="action", interpolation_max_batch_size=max_bs
    )
    T = 13  # round 0: 3 chunks of the 4-token window -> multiple dispatches
    xs = jnp.zeros((B, T) + X_SHAPE)
    xs = xs.at[:, 0].set(0.0).at[:, 12].set(1.2)
    mask = np.zeros((B, T), dtype=bool)
    mask[:, [0, 12]] = True
    conds = jnp.broadcast_to(
        (jnp.arange(T, dtype=jnp.float32) / 10.0).reshape(1, T, 1), (B, T, 1)
    )
    out = ro.interpolate_videos({}, jax.random.PRNGKey(0), xs, mask, conditions=conds)
    vals = _frame_values(out)
    np.testing.assert_allclose(
        vals, np.broadcast_to(np.arange(T) / 10.0, (B, T)), atol=2e-3
    )


def test_predict_videos_keyframes_plus_interpolation():
    ro = _rollout(
        keyframe_density=0.5, sliding_context_len=2, external_cond_type="action"
    )
    B, T = 1, 8
    xs = jnp.zeros((B, T) + X_SHAPE)
    conds = (jnp.arange(T, dtype=jnp.float32) / 10.0).reshape(1, T, 1)
    out = ro.predict_videos(
        {}, jax.random.PRNGKey(0), xs, n_context_tokens=1, conditions=conds,
        prediction_hg=HistoryGuidance.conditional(timesteps=DCFG.timesteps),
        interpolation_hg=HistoryGuidance.conditional(timesteps=DCFG.timesteps),
    )
    assert out.shape == (B, T) + X_SHAPE
    np.testing.assert_allclose(
        _frame_values(out)[0], np.arange(8) / 10.0, atol=3e-3
    )


def test_pyramid_scheduling_window():
    ro = _rollout(scheduling_matrix="autoregressive")
    out = ro.sample_sequence({}, jax.random.PRNGKey(0), batch_size=1, length=4)
    np.testing.assert_allclose(
        _frame_values(out)[0], np.arange(4) / 10.0, atol=2e-3
    )


def test_gibbs_scheduling_window():
    ro = _rollout(scheduling_matrix="gibbs")
    out = ro.sample_sequence({}, jax.random.PRNGKey(0), batch_size=1, length=4)
    np.testing.assert_allclose(
        _frame_values(out)[0], np.arange(4) / 10.0, atol=2e-3
    )


def test_interleaved_scheduling_window():
    ro = _rollout(scheduling_matrix="interleaved")
    out = ro.sample_sequence({}, jax.random.PRNGKey(0), batch_size=1, length=4)
    np.testing.assert_allclose(
        _frame_values(out)[0], np.arange(4) / 10.0, atol=2e-3
    )


def test_mesh_sharded_sampling_matches_unsharded():
    """NFE-expanded sampling sharded over an 8-device 'data' axis produces
    the same result as single-device sampling (multi-chip sampling — the
    parallelism the reference leaves unused, SURVEY.md §5)."""
    from jax.sharding import Mesh

    mesh = Mesh(np.asarray(jax.devices()).reshape(8), ("data",))
    B, L = 4, 4  # vanilla HG: NFE=2 -> expanded batch 8 == mesh size
    ctx = jnp.zeros((B, L) + X_SHAPE).at[:, 0].set(0.5)
    mask = np.zeros((B, L), dtype=np.int64)
    mask[:, 0] = 1
    hg = HistoryGuidance.vanilla(guidance_scale=2.0, timesteps=DCFG.timesteps)

    out_ref = _rollout().sample_sequence(
        {}, jax.random.PRNGKey(0), B, length=L, context=ctx, context_mask=mask,
        history_guidance=hg,
    )
    out_mesh = _rollout(mesh=mesh).sample_sequence(
        {}, jax.random.PRNGKey(0), B, length=L, context=ctx, context_mask=mask,
        history_guidance=hg,
    )
    np.testing.assert_allclose(
        np.asarray(out_mesh), np.asarray(out_ref), atol=1e-5
    )

    # non-divisible expanded batch (B=3 -> 6 % 8 != 0) falls back gracefully
    out_odd = _rollout(mesh=mesh).sample_sequence(
        {}, jax.random.PRNGKey(0), 3, length=L, context=ctx[:3],
        context_mask=mask[:3], history_guidance=hg,
    )
    assert np.isfinite(np.asarray(out_odd)).all()


def test_sampling_rng_discipline():
    """Same key -> bit-identical samples; different keys -> different
    (reference relies on per-rank generator seeding for deterministic eval,
    base_pytorch_video_algo.py:385-390)."""
    ro = _rollout()
    hg = HistoryGuidance.vanilla(guidance_scale=2.0, timesteps=DCFG.timesteps)
    ctx = jnp.zeros((1, 4) + X_SHAPE).at[:, 0].set(0.5)
    mask = np.zeros((1, 4), dtype=np.int64)
    mask[:, 0] = 1

    def run(seed):
        return np.asarray(
            ro.sample_sequence(
                {}, jax.random.PRNGKey(seed), 1, length=4, context=ctx,
                context_mask=mask, history_guidance=hg,
            )
        )

    a, b, c = run(0), run(0), run(1)
    np.testing.assert_array_equal(a, b)
    # the oracle denoiser converges to its target from ANY init noise
    # (DDIM eta=0), so different seeds agree up to rounding — but the
    # trajectories differ: bit-identity across seeds would mean the key
    # is being ignored
    assert not np.array_equal(a, c)


def test_scan_bucket_padding_preserves_samples():
    """scan_bucket pads S with identity noop rows: same compiled signature
    across differing context masks, identical samples to the unpadded run
    (VERDICT weak #6 — recompile-per-window-signature)."""
    import dataclasses

    import jax
    import jax.numpy as jnp

    from dfot_tpu.diffusion import DiffusionConfig, make_schedule
    from dfot_tpu.sampling import DFoTRollout, RolloutConfig

    dcfg = DiffusionConfig(timesteps=40, sampling_timesteps=5, objective="pred_v")
    sched = make_schedule(dcfg)

    def model_apply(variables, x, k, cond, cond_mask):
        return 0.1 * x

    base = RolloutConfig(max_tokens=4, x_shape=(2, 2, 1))
    ro_exact = DFoTRollout(base, dcfg, sched, model_apply)
    ro_bucket = DFoTRollout(
        dataclasses.replace(base, scan_bucket=8), dcfg, sched, model_apply
    )

    ctx = jnp.zeros((1, 4, 2, 2, 1))
    mask = np.zeros((1, 4), dtype=np.int64)
    mask[:, 0] = 1
    rng = jax.random.PRNGKey(0)
    a = ro_exact.sample_sequence(
        None, rng, 1, length=4, context=ctx, context_mask=mask
    )
    b = ro_bucket.sample_sequence(
        None, rng, 1, length=4, context=ctx, context_mask=mask
    )
    np.testing.assert_allclose(np.asarray(a), np.asarray(b), atol=1e-6)
    # eval accounting ignores the identity rows
    assert (
        ro_exact.stats["denoiser_evals_b1"] == ro_bucket.stats["denoiser_evals_b1"]
    )


def test_state_codec_matches_pixel_state(monkeypatch):
    """Token-layout scan state (RolloutConfig.state_codec) must produce the
    same samples as the pixel-layout state: every scan-body op except the
    model call is elementwise / per-frame-broadcast, so the pixel->patch
    permutation commutes exactly. Internal noise draws are pinned to zeros
    so both layouts see identical values (the live stream differs only in
    placement — see sampler.make_window_sampler)."""
    from dfot_tpu.diffusion import core as dc_mod
    from dfot_tpu.models.uvit import patchify_tokens, unpatchify_tokens

    monkeypatch.setattr(
        dc_mod, "clipped_normal",
        lambda rng, shape, clip, dtype=jnp.float32: jnp.zeros(shape, dtype),
    )
    p = 2
    H = W = X_SHAPE[0]

    def oracle_apply_tok(variables, x, noise_input, cond, cond_mask):
        B, T, N, D = x.shape
        k = noise_input.astype(jnp.int32)
        if cond is not None:
            tgt = cond.reshape(B, T, 1, 1)
        else:
            tgt = TARGET_FRAME_VALUES[:T].reshape(1, T, 1, 1)
        tgt = jnp.broadcast_to(tgt, x.shape).astype(x.dtype)
        sq_ac = _gather(SCHED.sqrt_alphas_cumprod, k, x.ndim)
        sq_om = _gather(SCHED.sqrt_one_minus_alphas_cumprod, k, x.ndim)
        eps = (x - sq_ac * tgt) / jnp.where(sq_om == 0, 1.0, sq_om)
        return predict_v(SCHED, tgt, k, eps)

    codec = (
        lambda x: patchify_tokens(x, p),
        lambda x: unpatchify_tokens(x, p, H, W),
    )
    ro_pix = _rollout()
    ro_tok = DFoTRollout(
        RolloutConfig(max_tokens=4, x_shape=X_SHAPE,
                      scheduling_matrix="full_sequence", state_codec=codec),
        DCFG, SCHED, oracle_apply_tok,
    )
    B, L = 1, 4
    ctx = jnp.zeros((B, L) + X_SHAPE).at[:, 0].set(5.5)
    mask = np.zeros((B, L), dtype=np.int64)
    mask[:, 0] = 1
    hg = HistoryGuidance.vanilla(guidance_scale=2.0, timesteps=DCFG.timesteps)
    kw = dict(length=L, context=ctx, context_mask=mask, history_guidance=hg)
    out_pix = ro_pix.sample_sequence({}, jax.random.PRNGKey(3), B, **kw)
    out_tok = ro_tok.sample_sequence({}, jax.random.PRNGKey(3), B, **kw)
    assert out_tok.shape == out_pix.shape == (B, L) + X_SHAPE
    np.testing.assert_allclose(
        np.asarray(out_tok), np.asarray(out_pix), atol=1e-6
    )
