"""Tests for scheduling matrices and rollout planners (pure host logic)."""

import numpy as np
import pytest

from dfot_tpu.sampling.planner import (
    interpolation_plan,
    keyframe_indices,
    pad_to_length,
    sliding_window_plan,
)
from dfot_tpu.sampling.scheduling import (
    compile_sampling_schedule,
    full_sequence_scheduling_matrix,
    generate_refine_scheduling_matrix,
    generate_scheduling_matrix,
    gibbs_expand,
    interleaved_scheduling_matrix,
    pyramid_scheduling_matrix,
    refine_index_sequence,
)


# ---------------------------------------------------------------------------
# matrices
# ---------------------------------------------------------------------------


def test_full_sequence_matrix():
    m = full_sequence_scheduling_matrix(4, 3)
    assert m.shape == (4, 4)
    np.testing.assert_array_equal(m[:, 0], [3, 2, 1, 0])
    assert (m == m[:, :1]).all()


def test_pyramid_matrix():
    m = pyramid_scheduling_matrix(3, 4, uncertainty_scale=1.0)
    # height = 4 + 2 + 1 = 7; token t starts t rows later
    assert m.shape == (7, 3)
    np.testing.assert_array_equal(m[:, 0], [4, 3, 2, 1, 0, 0, 0])
    np.testing.assert_array_equal(m[:, 2], [4, 4, 4, 3, 2, 1, 0])
    assert m.min() == 0 and m.max() == 4


def test_interleaved_matrix_columns_descend():
    m = interleaved_scheduling_matrix(4, 3, 12)
    assert m.shape[1] == 4
    # every column is non-increasing, starts at S, ends at 0
    assert (np.diff(m, axis=0) <= 0).all()
    assert (m[0] == 12).all() and (m[-1] == 0).all()
    # parity staggering: consecutive tokens start descending at different rows
    first_drop = (m < 12).argmax(axis=0)
    assert first_drop[0] != first_drop[1]


def test_gibbs_expand_sweeps_tokens_one_at_a_time():
    base = full_sequence_scheduling_matrix(3, 2)  # rows: 2,1,0
    g = gibbs_expand(base, 3)
    assert g.shape == (9, 3)
    # row 0..2 : initial sweep of level 2 -> rows stay [2,2,2] until updates land
    np.testing.assert_array_equal(g[0], [2, 2, 2])
    # during the sweep to level 1, token 0 updates first while others stay at 2
    np.testing.assert_array_equal(g[3], [1, 2, 2])
    np.testing.assert_array_equal(g[4], [1, 1, 2])
    np.testing.assert_array_equal(g[5], [1, 1, 1])
    np.testing.assert_array_equal(g[8], [0, 0, 0])


def test_generate_scheduling_matrix_levels_and_padding():
    m = generate_scheduling_matrix("full_sequence", 4, 1000, 50, padding=2)
    assert m.shape == (51, 6)
    assert m[0, 0] == 999 and m[-1, 0] == -1
    # padded columns pinned to pure noise
    assert (m[:, 4:] == 999).all()


def test_refine_sequence_goes_back_and_returns():
    seq = refine_index_sequence(10, goback_length=3, n_goback=1)
    # descend from 10; at anchors {1, 4}, excursion up 3 then back down
    assert seq[0] == 10 and seq[-1] == 0
    # net effect: every level still reached; excursions are symmetric
    s = list(seq)
    i4 = s.index(4)
    assert s[i4 : i4 + 8] == [4, 5, 6, 7, 6, 5, 4, 3]


def test_generate_refine_matrix_shape():
    m = generate_refine_scheduling_matrix(3, 1000, 50, goback_length=20, n_goback=5, padding=1)
    assert m.shape[1] == 4
    assert (m[:, -1] == 999).all()


# ---------------------------------------------------------------------------
# compiled schedule
# ---------------------------------------------------------------------------


def test_compile_schedule_pins_context_and_prunes():
    mat = generate_scheduling_matrix("full_sequence", 4, 1000, 10)
    ctx = np.array([1, 1, 0, 0])
    cs = compile_sampling_schedule(mat, ctx, is_full_sequence=False)
    # context columns pinned to -1 everywhere
    assert (cs.from_levels[:, :2] == -1).all() and (cs.to_levels[:, :2] == -1).all()
    # no pruning needed here: gen tokens change every row
    assert cs.num_steps == 10
    # context mask constant: GT context never changes, gen stays 0 until done
    assert (cs.context_masks[:, :2] == 1).all()
    assert (cs.context_masks[:-1, 2:] == 0).all()


def test_compile_schedule_prunes_identical_prefix_rows():
    # pyramid: token 0 leads; with token 0 as context (-1), the first rows
    # where only token 0 would have changed become identical and are pruned
    mat = generate_scheduling_matrix("autoregressive", 3, 1000, 5)
    ctx = np.array([1, 0, 0])
    cs = compile_sampling_schedule(mat, ctx, is_full_sequence=False)
    # first step must differ somewhere
    assert (cs.from_levels[0] != cs.to_levels[0]).any()
    assert cs.num_steps < mat.shape[0] - 1


def test_compile_schedule_mask_evolution_0_to_2():
    # pyramid matrix: token 0 finishes before token 2 -> its mask flips to 2
    mat = generate_scheduling_matrix("autoregressive", 3, 1000, 5)
    ctx = np.array([0, 0, 0])
    cs = compile_sampling_schedule(mat, ctx, is_full_sequence=False)
    final = cs.context_masks[-1]
    assert final[0] == 2  # token 0 fully generated before the last step
    assert final[2] == 0  # token 2 still being generated at the last step
    # monotone: once 2, stays 2
    flips = (cs.context_masks == 2).astype(int)
    assert (np.diff(flips, axis=0) >= 0).all()


def test_compile_schedule_full_sequence_keeps_context_levels():
    mat = generate_scheduling_matrix("full_sequence", 3, 1000, 5)
    ctx = np.array([1, 0, 0])
    cs = compile_sampling_schedule(mat, ctx, is_full_sequence=True)
    assert (cs.from_levels[:, 0] != -1).any()


# ---------------------------------------------------------------------------
# planners
# ---------------------------------------------------------------------------


def test_keyframe_indices():
    keys = keyframe_indices(0.0625, 200, 1)
    assert keys[0] == 0 and keys[-1] == 199
    assert len(keys) == len(np.unique(keys))
    # ~0.0625 * 200 = 12.5 -> 12 keyframes, with context merged in
    assert 12 <= len(keys) <= 13


def test_interpolation_plan_small_gap():
    # 9 frames, keys at 0 and 8, max_tokens 9: single chunk covers everything
    mask = np.zeros(9, dtype=bool)
    mask[[0, 8]] = True
    plan = interpolation_plan(mask, 9)
    assert len(plan) == 1 and len(plan[0]) == 1
    np.testing.assert_array_equal(plan[0][0], np.arange(9))


def test_interpolation_plan_large_gap_recurses():
    # keys at 0 and 32, max_tokens 8: first round places equally spaced frames,
    # later rounds fill in between
    mask = np.zeros(33, dtype=bool)
    mask[[0, 32]] = True
    plan = interpolation_plan(mask, 8)
    assert len(plan) >= 2
    covered = mask.copy()
    for rnd in plan:
        for frames in rnd:
            assert len(frames) <= 8
            # chunk endpoints must already be known
            assert covered[frames[0]] and covered[frames[-1]]
            covered[frames] = True
    assert covered.all()


def test_interpolation_plan_merges_adjacent_chunks():
    # keys every 3 frames, max_tokens 8 -> chunks get merged up to 8 tokens
    mask = np.zeros(13, dtype=bool)
    mask[[0, 3, 6, 9, 12]] = True
    plan = interpolation_plan(mask, 8)
    assert len(plan) == 1
    sizes = [len(f) for f in plan[0]]
    assert all(s <= 8 for s in sizes)
    assert sum(s - 1 for s in sizes) >= 12 - len(np.flatnonzero(mask)) + 1


def test_sliding_window_plan_basic():
    # 1 GT token, want 13, window 8, sliding context 4
    ws = sliding_window_plan(gt_len=1, length=13, max_tokens=8, sliding_context_len=4)
    total = 1 + sum(w.gen_len for w in ws)
    assert total == 13
    assert ws[0].context_len == 1 and ws[0].generated_context_len == 0
    assert ws[1].context_len == 4 and ws[1].generated_context_len > 0
    for w in ws:
        assert w.length <= 8


def test_sliding_window_plan_no_window_needed():
    ws = sliding_window_plan(gt_len=4, length=8, max_tokens=8)
    assert len(ws) == 1
    assert ws[0].context_len == 4 and ws[0].gen_len == 4


def test_sliding_window_requires_context_param():
    with pytest.raises(ValueError):
        sliding_window_plan(gt_len=1, length=20, max_tokens=8, sliding_context_len=None)
    with pytest.raises(ValueError):
        sliding_window_plan(gt_len=5, length=20, max_tokens=8, sliding_context_len=2)


def test_pad_to_length():
    x = np.ones((2, 3))
    y = pad_to_length(x, 5, axis=1, value=-1)
    assert y.shape == (2, 5) and (y[:, 3:] == -1).all()
