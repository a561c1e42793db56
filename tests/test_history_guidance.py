"""Tests for the history-guidance planner and device prepare/compose."""

import jax
import jax.numpy as jnp
import numpy as np
import pytest

from dfot_tpu.guidance.history_guidance import (
    HistoryGuidance,
    HistorySegment,
    hg_compose,
    hg_prepare,
)

T = 1000  # diffusion timesteps


def mask(*codes):
    return np.asarray(codes, dtype=np.int64)


# ---------------------------------------------------------------------------
# planner / dedup tables
# ---------------------------------------------------------------------------


def test_conditional_dedupes_to_single_condition():
    hg = HistoryGuidance.conditional(timesteps=T)
    tab = hg.plan(mask(1, 1, 0, 0))
    assert tab.num_hist == 1 and tab.num_gen == 1 and tab.nfe == 1
    np.testing.assert_allclose(tab.weights, [1.0])
    # the single condition is the clean history (level -1)
    assert (tab.override_levels[0, 0, :2] == -1).all()
    assert tab.override_mask[0, 0, :2].all() and not tab.override_mask[0, 0, 2:].any()
    assert not tab.cond_mask[0]


def test_vanilla_cfg_table():
    g = 4.0
    hg = HistoryGuidance.vanilla(guidance_scale=g, timesteps=T)
    tab = hg.plan(mask(1, 1, 0, 0))
    assert tab.num_hist == 2 and tab.nfe == 2
    # order: uncond first (inserted first), then the conditional branch
    w = dict(zip([tuple(l) for l in tab.override_levels[0, :, :2]], tab.weights))
    assert w[(T - 1, T - 1)] == pytest.approx(1 - g)  # fully-noised history
    assert w[(-1, -1)] == pytest.approx(g)  # clean history
    # external-cond guidance: uncond branch drops the conditioning
    cm = dict(zip([tuple(l) for l in tab.override_levels[0, :, :2]], tab.cond_mask))
    assert cm[(T - 1, T - 1)] and not cm[(-1, -1)]


def test_stabilized_vanilla_uses_generated_bands():
    hg = HistoryGuidance.stabilized_vanilla(
        guidance_scale=2.0, stabilization_level=0.02, timesteps=T
    )
    # token 0 is GT (1), token 1 was generated (2)
    tab = hg.plan(mask(1, 2, 0))
    assert tab.num_hist == 2
    cond_levels = tab.override_levels[0, np.argmax(tab.weights), :2]
    assert cond_levels[0] == -1  # GT history stays clean
    assert cond_levels[1] == int(0.02 * T - 1)  # generated history re-noised


def test_fractional_three_conditions():
    g, f = 4.0, 0.5
    hg = HistoryGuidance.fractional(guidance_scale=g, freq_scale=f, timesteps=T)
    tab = hg.plan(mask(1, 0, 0))
    assert tab.num_hist == 3
    w = dict(zip([int(l) for l in tab.override_levels[0, :, 0]], tab.weights))
    assert w[-1] == pytest.approx(1.0)  # full clean history
    assert w[int(f * T - 1)] == pytest.approx(g - 1)  # partial band
    assert w[T - 1] == pytest.approx(1 - g)  # uncond
    assert sum(tab.weights) == pytest.approx(1.0)


def test_no_history_collapses():
    # all tokens generated: conditional collapses to 1 condition, vanilla to 2
    assert HistoryGuidance.conditional(timesteps=T).plan(mask(0, 0, 0)).num_hist == 1
    tab = HistoryGuidance.vanilla(4.0, timesteps=T).plan(mask(0, 0, 0))
    assert tab.num_hist == 2  # external-cond CFG remains
    assert sorted(tab.weights) == pytest.approx([-3.0, 4.0])


def test_temporal_gen_segments_and_coverage():
    hg = HistoryGuidance.temporal(
        hist_subsequences=[[0], [1]],
        hist_weights=[2.0, 2.0],
        gen_segments=[[0], [1]],
        timesteps=T,
    )
    tab = hg.plan(mask(1, 1, 0, 0))
    assert tab.num_gen == 2
    # each gen segment excludes the other gen token
    assert tab.gen_excluded[0, 0, 3] and not tab.gen_excluded[0, 0, 2]
    assert tab.gen_excluded[0, 1, 2] and not tab.gen_excluded[0, 1, 3]
    np.testing.assert_array_equal(tab.gen_coverage[0], [1, 1, 1, 1])
    # conditions: uncond, {h0 clean}, {h1 clean} each +2 / full-noise -2 merges
    assert tab.num_hist == 3
    assert tab.nfe == 6


def test_padding_tokens_not_touched():
    hg = HistoryGuidance.vanilla(4.0, timesteps=T)
    tab = hg.plan(mask(1, 0, -1, -1))
    assert not tab.override_mask[0, :, 2:].any()
    assert not tab.gen_excluded[0, :, 2:].any()


def test_plan_batched_heterogeneous_masks():
    hg = HistoryGuidance.vanilla(4.0, timesteps=T)
    tab = hg.plan_batched(np.stack([mask(1, 1, 0, 0), mask(1, 0, 0, -1)]))
    assert tab.override_mask.shape == (2, 2, 4)
    assert tab.override_mask[0, 0, 1] and not tab.override_mask[1, 0, 1]


def test_from_config():
    class FakeCfg(dict):
        def to_dict(self):
            return dict(self)

    hg = HistoryGuidance.from_config(
        FakeCfg(name="vanilla", guidance_scale=4.0), timesteps=T
    )
    assert hg.hist_weights == (4.0,)


# ---------------------------------------------------------------------------
# device prepare / compose
# ---------------------------------------------------------------------------


def _fake_q_sample(x, k, rng):
    # deterministic stand-in: scale by the noise level so effects are visible
    from dfot_tpu.diffusion.core import bcast_right

    return x * 0.0 + bcast_right(k.astype(jnp.float32), x.ndim)


def test_prepare_conditional_keeps_input():
    hg = HistoryGuidance.conditional(timesteps=T)
    m = mask(1, 1, 0, 0)
    tab = hg.plan(m)
    x = jnp.arange(2 * 4 * 3, dtype=jnp.float32).reshape(2, 4, 3)
    fk = jnp.full((2, 4), 500, jnp.int32)
    tk = jnp.full((2, 4), 400, jnp.int32)
    xo, fo, to, cm = hg_prepare(
        x, fk, tk, jnp.asarray(m)[None].repeat(2, 0), tab, _fake_q_sample,
        jax.random.PRNGKey(0), T,
    )
    assert xo.shape == (2, 4, 3)  # NFE = 1, no expansion
    # history levels overridden to -1 -> no replacement, x untouched there
    np.testing.assert_array_equal(np.asarray(fo[:, :2]), -1)
    np.testing.assert_allclose(np.asarray(xo[:, :2]), np.asarray(x[:, :2]))
    # gen tokens keep their schedule levels
    np.testing.assert_array_equal(np.asarray(fo[:, 2:]), 500)
    np.testing.assert_array_equal(np.asarray(to[:, 2:]), 400)


def test_prepare_vanilla_renoises_uncond_branch():
    hg = HistoryGuidance.vanilla(4.0, timesteps=T)
    m = mask(1, 1, 0, 0)
    tab = hg.plan(m)
    B = 1
    x = jnp.ones((B, 4, 3))
    fk = jnp.full((B, 4), 500, jnp.int32)
    tk = jnp.full((B, 4), 400, jnp.int32)
    xo, fo, to, cm = hg_prepare(
        x, fk, tk, jnp.asarray(m)[None], tab, _fake_q_sample, jax.random.PRNGKey(0), T
    )
    assert xo.shape == (2, 4, 3)
    fo = np.asarray(fo)
    # one branch has history at 999 (replaced with "q_sample" output = 999),
    # the other at -1 (clean)
    branches = {tuple(fo[i, :2]) for i in range(2)}
    assert branches == {(999, 999), (-1, -1)}
    xo = np.asarray(xo)
    uncond = 0 if fo[0, 0] == 999 else 1
    np.testing.assert_allclose(xo[uncond, :2], 999.0)  # re-noised
    np.testing.assert_allclose(xo[1 - uncond, :2], 1.0)  # clean
    # cond_mask marks the branch whose external conditioning is dropped
    assert np.asarray(cm)[uncond] and not np.asarray(cm)[1 - uncond]


def test_compose_matches_manual_cfg():
    g = 4.0
    hg = HistoryGuidance.vanilla(g, timesteps=T)
    m = mask(1, 0, 0)
    tab = hg.plan(m)
    B = 2
    # fabricate per-branch outputs: batch-major (b, h) flatten
    x_uncond = jnp.ones((B, 3, 2)) * 2.0
    x_cond = jnp.ones((B, 3, 2)) * 5.0
    # ordering follows the table: find which h is uncond
    uncond_first = tab.weights[0] < 0
    per_branch = [x_uncond, x_cond] if uncond_first else [x_cond, x_uncond]
    x = jnp.stack(per_branch, axis=1).reshape(B * 2, 3, 2)
    out = hg_compose(x, tab, B)
    expected = g * 5.0 - (g - 1) * 2.0
    np.testing.assert_allclose(np.asarray(out), expected, atol=1e-5)


def test_compose_gen_segment_averaging():
    hg = HistoryGuidance.temporal(
        hist_subsequences=[ALL_ := "all"],
        hist_weights=[1.0],
        gen_segments=[[0], [1]],
        timesteps=T,
    )
    m = mask(1, 0, 0)
    tab = hg.plan(m)
    assert tab.num_gen == 2 and tab.num_hist == 1
    B = 1
    # branch for gen segment 0 predicts 10 on token1; segment 1 predicts 20 on token2
    xg0 = jnp.asarray([[0.0, 10.0, 99.0]])[..., None]
    xg1 = jnp.asarray([[0.0, 99.0, 20.0]])[..., None]
    x = jnp.stack([xg0, xg1], axis=1).reshape(2, 3, 1)
    out = np.asarray(hg_compose(x, tab, B))
    # excluded positions zeroed; each gen token covered exactly once
    assert out[0, 1, 0] == pytest.approx(10.0)
    assert out[0, 2, 0] == pytest.approx(20.0)


def test_prepare_excluded_gen_tokens_get_fresh_noise_and_max_level():
    hg = HistoryGuidance.temporal(
        hist_subsequences=["all"],
        hist_weights=[1.0],
        gen_segments=[[0], [1]],
        timesteps=T,
    )
    m = mask(1, 0, 0)
    tab = hg.plan(m)
    x = jnp.zeros((1, 3, 2))
    fk = jnp.full((1, 3), 500, jnp.int32)
    tk = jnp.full((1, 3), 400, jnp.int32)
    xo, fo, to, _ = hg_prepare(
        x, fk, tk, jnp.asarray(m)[None], tab, _fake_q_sample, jax.random.PRNGKey(0), T
    )
    fo = np.asarray(fo)
    # branch 0 (gen segment {token1}): token2 excluded -> level 999
    assert fo[0, 2] == T - 1 and fo[0, 1] == 500
    # branch 1 (gen segment {token2}): token1 excluded, token2 keeps schedule
    assert fo[1, 1] == T - 1 and fo[1, 2] == 500
    # excluded tokens replaced with fresh (non-zero) noise
    assert abs(float(jnp.asarray(xo)[0, 2].sum())) > 0
