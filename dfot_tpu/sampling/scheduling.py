"""Sampling scheduling matrices — host-side numpy, fully precomputed.

A scheduling matrix is an (num_rows, horizon) int array of noise levels: row m
holds every token's noise level before step m; consecutive rows define one
denoising step. Families (reference: base_pytorch_video_algo.py:877-976):

- full_sequence: all tokens share one DDIM grid
- autoregressive (pyramid): later tokens lag behind earlier ones
- interleaved: odd/even tokens alternate steps
- gibbs: full_sequence expanded so tokens are swept one at a time per level
- refine ("go-back"): full_sequence with periodic re-noising excursions

TPU design note: everything data-dependent about the schedule — the matrix,
the -1 substitution for context tokens, the 0->2 context-mask evolution, and
row pruning — is resolved *here on host*, producing dense per-step tables that
a single jitted ``lax.scan`` consumes with static shapes.
"""

from __future__ import annotations

from typing import NamedTuple, Optional

import numpy as np

from ..diffusion.core import ddim_idx_to_noise_level

__all__ = [
    "full_sequence_scheduling_matrix",
    "pyramid_scheduling_matrix",
    "interleaved_scheduling_matrix",
    "gibbs_expand",
    "refine_index_sequence",
    "generate_scheduling_matrix",
    "generate_refine_scheduling_matrix",
    "CompiledSchedule",
    "compile_sampling_schedule",
]


def full_sequence_scheduling_matrix(horizon: int, sampling_timesteps: int) -> np.ndarray:
    """All tokens denoise in lockstep: rows S, S-1, ..., 0."""
    col = np.arange(sampling_timesteps, -1, -1, dtype=np.int64)
    return np.repeat(col[:, None], horizon, axis=1)


def pyramid_scheduling_matrix(
    horizon: int, sampling_timesteps: int, uncertainty_scale: float = 1.0
) -> np.ndarray:
    """Autoregressive pyramid: token t starts uncertainty_scale*t steps later
    (reference: base_pytorch_video_algo.py:940-947)."""
    height = sampling_timesteps + int((horizon - 1) * uncertainty_scale) + 1
    m = np.arange(height, dtype=np.int64)[:, None]
    t = np.arange(horizon, dtype=np.int64)[None, :]
    mat = sampling_timesteps + (t * uncertainty_scale).astype(np.int64) - m
    return np.clip(mat, 0, sampling_timesteps)


def interleaved_scheduling_matrix(
    horizon: int, interleaved_size: int = 3, sampling_timesteps: int = 50
) -> np.ndarray:
    """Tokens advance in interleaved bursts of ``interleaved_size`` steps,
    staggered by position parity (reference: base_pytorch_video_algo.py:915-938)."""
    rows = []
    max_length = sampling_timesteps + interleaved_size
    for i in range(horizon):
        start_idx = i % interleaved_size + 1
        levels = [sampling_timesteps] * start_idx
        for j in range(sampling_timesteps):
            idx = max(sampling_timesteps - start_idx - interleaved_size * j, 0)
            if idx == 0:
                levels += [idx] * (max_length - len(levels))
                break
            levels += [idx] * interleaved_size
        rows.append(levels)
    return np.asarray(rows, dtype=np.int64).T


def gibbs_expand(matrix: np.ndarray, horizon: int) -> np.ndarray:
    """Expand a full-sequence matrix into a Gibbs sweep: within each level
    transition, tokens update one at a time left-to-right while tokens to the
    right stay at the previous level (reference: base_pytorch_video_algo.py:899-906)."""
    n_rows = matrix.shape[0]
    out = np.repeat(matrix, horizon, axis=0)
    for i in range(1, n_rows):
        for j in range(horizon):
            out[i * horizon + j, j + 1:] = out[(i - 1) * horizon + horizon - 1, j + 1:]
    return out


def refine_index_sequence(
    sampling_timesteps: int, goback_length: int, n_goback: int
) -> np.ndarray:
    """DDIM-grid index sequence with periodic go-back excursions
    (reference: base_pytorch_video_algo.py:949-976): descend S..0; at each
    go-back anchor, repeat n_goback times an up-excursion of goback_length
    then back down."""
    goback_idxs = set(range(1, sampling_timesteps - goback_length, goback_length))
    seq = []
    for t in range(sampling_timesteps, -1, -1):
        seq.append(t)
        if t in goback_idxs:
            for _ in range(n_goback):
                seq.extend(range(t + 1, t + goback_length + 1))
                seq.extend(range(t + goback_length - 1, t - 1, -1))
    return np.asarray(seq, dtype=np.int64)


def generate_scheduling_matrix(
    name: str,
    horizon: int,
    timesteps: int,
    sampling_timesteps: int,
    padding: int = 0,
) -> np.ndarray:
    """Build the noise-level scheduling matrix for a sampling run.

    Returns int64 (num_rows, horizon + padding); padded columns are pure
    noise (timesteps - 1). Mirrors _generate_scheduling_matrix
    (base_pytorch_video_algo.py:877-913)."""
    if name in ("full_sequence", "gibbs"):
        mat = full_sequence_scheduling_matrix(horizon, sampling_timesteps)
    elif name == "autoregressive":
        mat = pyramid_scheduling_matrix(horizon, sampling_timesteps)
    elif name == "interleaved":
        mat = interleaved_scheduling_matrix(horizon, 3, sampling_timesteps)
    else:
        raise ValueError(f"unknown scheduling matrix {name!r}")

    mat = ddim_idx_to_noise_level(timesteps, sampling_timesteps, mat)
    if name == "gibbs":
        mat = gibbs_expand(mat, horizon)
    if padding > 0:
        pad = np.full((mat.shape[0], padding), timesteps - 1, dtype=np.int64)
        mat = np.concatenate([mat, pad], axis=1)
    return mat


def generate_refine_scheduling_matrix(
    horizon: int,
    timesteps: int,
    sampling_timesteps: int,
    goback_length: int,
    n_goback: int,
    padding: int = 0,
) -> np.ndarray:
    """Full-sequence matrix with go-back resampling excursions."""
    idx = refine_index_sequence(sampling_timesteps, goback_length, n_goback)
    levels = ddim_idx_to_noise_level(timesteps, sampling_timesteps, idx)
    mat = np.repeat(levels[:, None], horizon, axis=1)
    if padding > 0:
        pad = np.full((mat.shape[0], padding), timesteps - 1, dtype=np.int64)
        mat = np.concatenate([mat, pad], axis=1)
    return mat


class CompiledSchedule(NamedTuple):
    """Host-precomputed, shape-static schedule for one _sample_sequence call.

    All arrays have leading dim num_steps (rows - 1 after pruning):
      from_levels / to_levels : (S, horizon) int32 noise levels per step
      context_masks           : (S, horizon) int32 mask BEFORE each step,
                                with 0->2 promotion already applied
                                (0=generate, 1=GT ctx, 2=generated ctx, -1=pad)
    """

    from_levels: np.ndarray
    to_levels: np.ndarray
    context_masks: np.ndarray

    @property
    def num_steps(self) -> int:
        return self.from_levels.shape[0]


def compile_sampling_schedule(
    scheduling_matrix: np.ndarray,
    context_mask: np.ndarray,
    is_full_sequence: bool,
    goback_to_levels_rule: bool = False,
) -> CompiledSchedule:
    """Resolve the full per-step schedule for a sampling run on host.

    Reproduces the reference's in-loop bookkeeping (dfot_video.py:641-679)
    ahead of time:
    1. context tokens' levels forced to -1 (unless full-sequence training),
    2. identical adjacent rows pruned from the front (skip),
    3. per-step context-mask evolution (0 -> 2 where the *from* level is -1).

    Args:
        scheduling_matrix: (rows, horizon) int noise levels.
        context_mask: (horizon,) int in {-1, 0, 1, 2}; assumed batch-constant
            (the reference asserts the same; history_guidance.py:366-368).
        is_full_sequence: if True, context levels are not pinned to -1
            (full-sequence models re-noise context instead).
        goback_to_levels_rule: if True, keep every row (refinement sampling
            includes up-steps, where pruning does not apply).
    """
    mat = scheduling_matrix.astype(np.int64).copy()
    ctx = context_mask.astype(np.int64).copy()
    if not is_full_sequence:
        mat = np.where(ctx[None, :] >= 1, -1, mat)

    if not goback_to_levels_rule:
        # prune identical adjacent rows from the front (reference prunes with
        # argmax of first nonzero diff; equivalent here)
        diff = mat[1:] != mat[:-1]
        nonzero = diff.any(axis=1)
        skip = int(np.argmax(nonzero)) if nonzero.any() else len(nonzero)
        mat = mat[skip:]

    num_steps = mat.shape[0] - 1
    from_levels = mat[:-1]
    to_levels = mat[1:]

    ctx_masks = np.empty((num_steps, ctx.shape[0]), dtype=np.int64)
    cur = ctx
    for m in range(num_steps):
        cur = np.where((cur == 0) & (from_levels[m] == -1), 2, cur)
        ctx_masks[m] = cur

    return CompiledSchedule(
        from_levels.astype(np.int32),
        to_levels.astype(np.int32),
        ctx_masks.astype(np.int32),
    )
