"""The jitted sampling engine: one denoising window as a single lax.scan.

Reference behavior being reproduced (dfot_video.py:516-763): per sampling
step, (1) evolve the context mask, (2) expand the batch by the history-
guidance NFE, re-noising history tokens, (3) run the denoiser, (4) take a
per-token DDIM/DDPM step, (5) compose guidance branches, (6) revert context
tokens.

TPU-first structure: everything data-dependent — scheduling matrix, context
pinning/pruning, mask evolution, HG condition tables — is precomputed on host
into a :class:`SamplingPlan` of dense arrays (see scheduling.py and
guidance/history_guidance.py). The device function is then a pure
``lax.scan`` over the plan's leading (step) axis with fully static shapes:
one compilation per (B, T, H, G, S) signature, reused across all windows of
the rollout.
"""

from __future__ import annotations

import dataclasses
import functools
from typing import Callable, NamedTuple, Optional

import jax
import jax.numpy as jnp
import numpy as np

from ..diffusion import core as dc
from ..diffusion.continuous import continuous_model_noise_input
from ..guidance.history_guidance import HGTable, HistoryGuidance, hg_compose, hg_prepare
from .scheduling import generate_scheduling_matrix, generate_refine_scheduling_matrix

__all__ = ["SamplingPlan", "plan_sampling", "make_window_sampler"]


def _takes_variables(fn) -> bool:
    """True if a cond_transform accepts a second (variables) argument.

    Deliberately uncached: it runs once per TRACE (not per step), and an
    lru_cache keyed on closure objects would pin every cond_transform —
    and the model/variables each closes over — for the process lifetime.
    """
    import inspect

    try:
        return len(inspect.signature(fn).parameters) >= 2
    except (TypeError, ValueError):
        return False


class SamplingPlan(NamedTuple):
    """Host-precomputed per-step tables for one sampling window.

    Leading axis S = number of denoising steps; B = batch; T = horizon;
    H = max history-conditions per step; G = gen segments.
    """

    from_levels: np.ndarray      # (S, B, T) int32
    to_levels: np.ndarray        # (S, B, T) int32
    context_masks: np.ndarray    # (S, B, T) int32 (mask before each step)
    override_mask: np.ndarray    # (S, B, H, T) bool
    override_levels: np.ndarray  # (S, B, H, T) int32
    cond_mask: np.ndarray        # (S, H) bool
    weights: np.ndarray          # (S, H) float32
    gen_excluded: np.ndarray     # (S, B, G, T) bool
    gen_coverage: np.ndarray     # (S, B, T) int32
    renoise: np.ndarray          # (S,) bool — go-back re-noising steps
    # (refinement sampling: levels increase, no denoiser call;
    # reference dfot_video.py:994-999)
    noop: np.ndarray             # (S,) bool — identity padding rows
    # (scan-length bucketing: pads S up to a bucket so heterogeneous
    # context masks reuse one compiled (B, T, S, H, G) signature)

    @property
    def num_steps(self) -> int:
        return self.from_levels.shape[0]

    @property
    def num_hist(self) -> int:
        return self.weights.shape[1]

    @property
    def num_gen(self) -> int:
        return self.gen_excluded.shape[2]

    @property
    def nfe(self) -> int:
        return self.num_hist * self.num_gen


def plan_sampling(
    context_mask: np.ndarray,
    history_guidance: HistoryGuidance,
    scheduling_matrix: str,
    timesteps: int,
    sampling_timesteps: int,
    horizon: int,
    padding: int = 0,
    is_full_sequence: bool = False,
    refine: Optional[dict] = None,
    pad_steps_to: Optional[int] = None,
) -> SamplingPlan:
    """Resolve the entire window schedule on host.

    context_mask: (B, T) int in {-1, 0, 1, 2} (T = horizon incl. padding).
    Mirrors the reference's in-loop bookkeeping (dfot_video.py:641-679) but
    ahead-of-time and per batch element (the reference's full HG manager
    requires batch-constant masks; we lift that).
    """
    ctx = np.asarray(context_mask, dtype=np.int64)
    if ctx.ndim != 2:
        raise ValueError("context_mask must be (B, T)")
    B, T = ctx.shape
    if T != horizon + padding:
        raise ValueError(f"context_mask width {T} != horizon+padding {horizon + padding}")

    if refine is not None:
        mat = generate_refine_scheduling_matrix(
            horizon, timesteps, sampling_timesteps,
            refine["goback_length"], refine["n_goback"], padding,
        )
    else:
        mat = generate_scheduling_matrix(
            scheduling_matrix, horizon, timesteps, sampling_timesteps, padding
        )

    # pin context tokens to -1 (per batch element), reference dfot_video.py:648-652
    mat_b = np.broadcast_to(mat[:, None, :], (mat.shape[0], B, T)).copy()
    if not is_full_sequence:
        mat_b = np.where(ctx[None] >= 1, -1, mat_b)

    if refine is None:
        # prune identical adjacent leading rows across the whole batch
        diff = (mat_b[1:] != mat_b[:-1]).any(axis=(1, 2))
        skip = int(np.argmax(diff)) if diff.any() else len(diff)
        mat_b = mat_b[skip:]

    S = mat_b.shape[0] - 1
    from_levels = mat_b[:-1]
    to_levels = mat_b[1:]

    # go-back steps: levels increase -> re-noise instead of denoise
    # (reference compares the last gen token's levels, dfot_video.py:910)
    renoise = (to_levels > from_levels).any(axis=(1, 2))

    # evolve context masks (0 -> 2 where from == -1) per denoising step
    context_masks = np.empty((S, B, T), dtype=np.int64)
    cur = ctx.copy()
    for s in range(S):
        if not renoise[s]:
            cur = np.where((cur == 0) & (from_levels[s] == -1), 2, cur)
        context_masks[s] = cur

    # per-(step, batch) HG tables, padded to the max num_hist
    tables = [[history_guidance.plan(context_masks[s, b]) for b in range(B)] for s in range(S)]
    H = max(t.num_hist for row in tables for t in row)
    G = tables[0][0].num_gen

    override_mask = np.zeros((S, B, H, T), dtype=bool)
    override_levels = np.full((S, B, H, T), timesteps - 1, dtype=np.int32)
    cond_mask = np.zeros((S, H), dtype=bool)
    weights = np.zeros((S, H), dtype=np.float32)
    gen_excluded = np.zeros((S, B, G, T), dtype=bool)
    gen_coverage = np.ones((S, B, T), dtype=np.int32)

    for s in range(S):
        h_s = tables[s][0].num_hist
        for b in range(B):
            t = tables[s][b]
            if t.num_hist != h_s:
                raise ValueError("HG table size must be batch-constant per step")
            override_mask[s, b, :h_s] = t.override_mask[0]
            override_levels[s, b, :h_s] = t.override_levels[0]
            # padded conditions (h >= h_s) keep zero weight; mark their
            # history as fully-noised so they are inert either way
            gen_excluded[s, b] = t.gen_excluded[0]
            gen_coverage[s, b] = t.gen_coverage[0]
        cond_mask[s, :h_s] = tables[s][0].cond_mask
        weights[s, :h_s] = tables[s][0].weights

    noop = np.zeros(S, dtype=bool)
    if pad_steps_to is not None and pad_steps_to > S:
        # identity rows executed by the scan's noop branch: pruning leading
        # rows made S mask-dependent, so distinct context masks otherwise
        # force one compile each (VERDICT weak #6); padding S to a bucket
        # lets them share one (B, T, S, H, G) signature
        extra = pad_steps_to - S

        def pad0(a):
            return np.concatenate([a, np.repeat(a[-1:], extra, axis=0)], axis=0)

        from_levels = pad0(from_levels)
        to_levels = pad0(to_levels)
        context_masks = pad0(context_masks)
        override_mask = pad0(override_mask)
        override_levels = pad0(override_levels)
        cond_mask = pad0(cond_mask)
        weights = pad0(weights)
        gen_excluded = pad0(gen_excluded)
        gen_coverage = pad0(gen_coverage)
        renoise = np.concatenate([renoise, np.zeros(extra, dtype=bool)])
        noop = np.concatenate([noop, np.ones(extra, dtype=bool)])

    return SamplingPlan(
        from_levels.astype(np.int32),
        to_levels.astype(np.int32),
        context_masks.astype(np.int32),
        override_mask,
        override_levels,
        cond_mask,
        weights,
        gen_excluded,
        gen_coverage,
        renoise,
        noop,
    )


def make_window_sampler(
    model_apply: Callable,
    dcfg: dc.DiffusionConfig,
    sched: dc.Schedule,
    replacement_only: bool = False,
    use_ddpm: bool = False,
    reconstruction_guidance: float = 0.0,
    mesh=None,
    data_axis: str = "data",
    cond_transform: Optional[Callable] = None,
    state_codec=None,
):
    """Build the jitted one-window sampler.

    model_apply(variables, x, noise_input, cond, cond_mask) -> model output
        x: (N, T, H, W, C); noise_input: (N, T) float (discrete k or scaled
        logSNR); cond: (N, ...) or None; cond_mask: (N,) bool or None.

    Returns sample_window(variables, x_init, context, plan, conditions, rng)
    -> final (B, T, ...) samples. ``x_init`` is the noise-initialized window
    with context already installed; ``context`` is the clean context tensor
    used for re-noising / reconstruction guidance.

    ``mesh``: optional jax.sharding.Mesh. The history-guidance NFE expansion
    multiplies the batch to B*NFE inside the scan — the natural data-parallel
    axis DFoT exposes at sampling time (the reference runs it on one GPU,
    SURVEY.md §5 long-context). When the expanded batch divides the mesh's
    ``data_axis``, a sharding constraint splits every denoiser call across
    chips and XLA inserts the (cheap, (B*NFE)-sized) collectives at compose.
    """

    def shard_expanded(x_e):
        if mesh is None or data_axis not in mesh.shape:
            return x_e
        if x_e.shape[0] % mesh.shape[data_axis] != 0:
            return x_e
        from jax.sharding import NamedSharding, PartitionSpec

        return jax.lax.with_sharding_constraint(
            x_e, NamedSharding(mesh, PartitionSpec(data_axis))
        )

    def q_sample_fn(x, k, rng):
        noise = dc.clipped_normal(rng, x.shape, dcfg.clip_noise, x.dtype)
        return dc.q_sample(sched, x, jnp.clip(k, 0, None), noise)

    def noise_input(k_clipped):
        if dcfg.is_continuous:
            return continuous_model_noise_input(dcfg, sched, k_clipped)
        return k_clipped.astype(jnp.float32)

    def denoise(variables, x, k_clipped, cond, cond_mask):
        return model_apply(variables, x, noise_input(k_clipped), cond, cond_mask)

    @functools.partial(jax.jit, static_argnames=("num_hist", "num_gen"))
    def sample_window(
        variables,
        x_init: jax.Array,          # (B, T, *xs)
        context: jax.Array,         # (B, T, *xs) clean context (zeros elsewhere)
        plan: SamplingPlan,         # device arrays, leading dim S
        conditions: Optional[jax.Array],
        rng: jax.Array,
        num_hist: int,
        num_gen: int,
    ) -> jax.Array:
        if state_codec is not None:
            # keep the scan state in the model's native token layout (e.g.
            # patchify_tokens for U-ViT): the pixel<->patch transpose runs
            # ONCE per window here instead of inside every scan step, and
            # every elementwise step op (HG expand/re-noise, DDIM update,
            # compose) runs on a contiguous layout. model_apply must take
            # token-layout x (UViT3D token_io=True). Everything in the scan
            # body except the model is an elementwise/per-frame-broadcast
            # op, so the permutation commutes exactly; only the placement
            # of internally drawn noise differs (a different, equally valid
            # sample stream — the rng stream already differs from torch).
            to_state, from_state = state_codec
            x_init = to_state(x_init)
            context = to_state(context)
        B, T = x_init.shape[:2]
        nfe = num_hist * num_gen
        # NFE-expand the conditions and clean context outside the scan:
        # they are step-invariant, and for map-shaped conditions (ray
        # encodings: ~190 MB at 256px) a repeat inside the body would rely
        # on XLA loop-invariant code motion to avoid a fresh materialization
        # per step. The repeat happens on the COMPACT form, before the
        # optional expansion below, so the big maps never exist in both
        # un-expanded and expanded batch shapes at once.
        cond_e = None if conditions is None else jnp.repeat(conditions, nfe, axis=0)
        if cond_e is not None and cond_transform is not None:
            # e.g. camera-pose -> per-pixel ray maps (and, for U-ViT pose
            # models, the per-block FiLM pose projections): expanded ONCE
            # per window here (inside jit, outside the scan) so the result
            # is a device-resident scan invariant and the host/rollout only
            # ever handles the compact vectors (utils/geometry.py:
            # normalize_camera_conditions). Transforms may take (conditions)
            # or (conditions, variables) — the latter for weight-dependent
            # precomputation (models/uvit.py:precompute_pose_conditioning).
            cond_e = (
                cond_transform(cond_e, variables)
                if _takes_variables(cond_transform)
                else cond_transform(cond_e)
            )
        ctx_e = (
            jnp.repeat(context, nfe, axis=0) if reconstruction_guidance > 0 else None
        )

        def step(carry, scan_in):
            xs, rng = carry
            (fl, tl, cmask, ov_m, ov_l, c_m, w, g_ex, g_cov, is_renoise,
             is_noop) = scan_in
            rng, r_prep, r_step, r_renoise = jax.random.split(rng, 4)

            def renoise_step(xs):
                # go-back: re-noise from fl up to tl (no denoiser call)
                noise = dc.clipped_normal(r_renoise, xs.shape, dcfg.clip_noise, xs.dtype)
                return dc.q_sample_from_x_k(
                    sched, dcfg.timesteps, xs, jnp.clip(fl, 0, None),
                    jnp.clip(tl, 0, None), noise,
                )

            def denoise_step(xs):
                return _denoise_body(xs, fl, tl, cmask, ov_m, ov_l, c_m, w, g_ex, g_cov,
                                     r_prep, r_step)

            xs = jax.lax.switch(
                jnp.where(is_noop, 2, is_renoise.astype(jnp.int32)),
                [denoise_step, renoise_step, lambda x: x],
                xs,
            )
            return (xs, rng), None

        def _denoise_body(xs, fl, tl, cmask, ov_m, ov_l, c_m, w, g_ex, g_cov,
                          r_prep, r_step):

            table = HGTable(ov_m, ov_l, c_m, w, g_ex, g_cov)
            x_e, from_e, to_e, condmask_e = hg_prepare(
                xs, fl, tl, cmask, table, q_sample_fn, r_prep,
                dcfg.timesteps, replacement_only,
            )
            x_e = shard_expanded(x_e)
            k_clip = jnp.clip(from_e, 0, None)

            if reconstruction_guidance > 0:
                # grads of the reconstruction loss wrt x flow through the
                # denoiser (reference: discrete_diffusion.py:485-513)
                alpha = dc.bcast_right(
                    jnp.take(sched.alphas_cumprod, k_clip, axis=0), x_e.ndim
                )
                ctxmask_e = jnp.repeat(cmask, nfe, axis=0)

                def guidance_loss(x_in):
                    out = denoise(variables, x_in, k_clip, cond_e, condmask_e)
                    pred_in = dc.model_predictions(sched, dcfg, x_in, k_clip, out)
                    mse = (pred_in.pred_x_start - ctx_e) ** 2 * jnp.sqrt(alpha)
                    m = dc.bcast_right((ctxmask_e > 0).astype(mse.dtype), mse.ndim)
                    denom = jnp.clip(m.sum(axis=1, keepdims=True), 1, None)
                    loss = jnp.sum(mse * m / denom)
                    return -reconstruction_guidance * 0.5 * loss, out

                (likelihood, model_out), grad = jax.value_and_grad(
                    guidance_loss, has_aux=True
                )(x_e)
                grad = jnp.nan_to_num(-grad)
                pred = dc.model_predictions(sched, dcfg, x_e, k_clip, model_out)
                pred_noise = pred.pred_noise + jnp.sqrt(1 - alpha) * grad
                x_start = jnp.where(
                    alpha > 0,
                    dc.predict_start_from_noise(sched, x_e, k_clip, pred_noise),
                    pred.pred_x_start,
                )
                pred = dc.ModelPrediction(pred_noise, x_start, model_out)
            else:
                model_out = denoise(variables, x_e, k_clip, cond_e, condmask_e)
                pred = dc.model_predictions(sched, dcfg, x_e, k_clip, model_out)

            noise = dc.clipped_normal(r_step, x_e.shape, dcfg.clip_noise, x_e.dtype)
            if use_ddpm:
                x_pred = dc.ddpm_step(sched, dcfg, x_e, from_e, pred, noise)
            else:
                x_pred = dc.ddim_step(sched, dcfg, x_e, from_e, to_e, pred, noise)

            composed = hg_compose(x_pred, table, B)
            # revert everything except the tokens being generated
            return jnp.where(dc.bcast_right(cmask == 0, xs.ndim), composed, xs)

        scan_in = (
            plan.from_levels,
            plan.to_levels,
            plan.context_masks,
            plan.override_mask,
            plan.override_levels,
            plan.cond_mask,
            plan.weights,
            plan.gen_excluded,
            plan.gen_coverage,
            plan.renoise,
            plan.noop,
        )
        (xs, _), _ = jax.lax.scan(step, (x_init, rng), scan_in)
        return from_state(xs) if state_codec is not None else xs

    return sample_window
