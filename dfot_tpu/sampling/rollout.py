"""Long-video rollout orchestration: windows, keyframes, interpolation.

Host-side driver around the jitted window sampler (sampler.py). Reproduces
the DFoT sampling API (reference: algorithms/dfot/dfot_video.py:80-514):

- ``sample_sequence``: one window (<= max_tokens), arbitrary context mask.
- ``predict_sequence``: sliding-window autoregressive rollout.
- ``interpolate_videos``: greedy-plan parallel infilling.
- ``predict_videos``: keyframe pass + interpolation hierarchy.

Shapes are padded to the model horizon so each distinct (B, T, S, H, G)
signature compiles once; all plan math is numpy (see planner.py).

The long-video bookkeeping (window slicing, keyframe scatter, interpolation
chunk gather/scatter) is HOST NUMPY by design: every ``xs[:, frames]``
gather or ``.at[frames].set`` scatter expressed in jax would compile a
fresh tiny XLA program per distinct frame tuple — measured at ~10 s each
through the remote compile service, ~320 s of stalls across a 200-frame
rollout (round-3 bench). The device executes exactly one program: the
window-sampler scan; windows within an interpolation round still dispatch
ahead asynchronously (outputs are fetched per round, not per window).
"""

from __future__ import annotations

import dataclasses
from typing import Callable, Dict, Optional, Tuple

import jax
import jax.numpy as jnp
import numpy as np

from ..diffusion import core as dc
from ..guidance.history_guidance import HistoryGuidance
from .planner import interpolation_plan, keyframe_indices, sliding_window_plan
from .sampler import make_window_sampler, plan_sampling

__all__ = ["RolloutConfig", "DFoTRollout"]


def _take_frames(conditions, frames):
    """Gather frames along axis 1. Host arrays use per-frame slice concat:
    numpy fancy indexing on a non-leading axis of a multi-GB array runs
    ~20x slower than contiguous slice copies (measured 1.35s vs 0.07s for a
    94 MB window of bf16 ray encodings)."""
    if isinstance(conditions, np.ndarray):
        return np.concatenate([conditions[:, f : f + 1] for f in frames], axis=1)
    return conditions[:, jnp.asarray(frames)]


@dataclasses.dataclass(frozen=True)
class RolloutConfig:
    max_tokens: int
    x_shape: Tuple[int, ...]  # channel-last token shape, e.g. (H, W, C)
    scheduling_matrix: str = "full_sequence"
    is_full_sequence: bool = False
    chunk_size: int = -1
    use_causal_mask: bool = False
    external_cond_type: Optional[str] = None  # label | action | None
    sliding_context_len: Optional[int] = None
    keyframe_density: Optional[float] = None
    interpolation_max_batch_size: Optional[int] = None
    refinement: Optional[dict] = None
    # optional device-side condition expansion (applied once per window
    # inside the jitted sampler, e.g. camera poses -> ray-encoding maps)
    cond_transform: Optional[Callable] = None
    # round the scan length S up to a multiple of this bucket (0 = exact):
    # heterogeneous context masks then share one compiled (B, T, S, H, G)
    # signature instead of recompiling per distinct mask, at the cost of a
    # few identity scan rows
    scan_bucket: int = 0
    # optional jax.sharding.Mesh: shards the NFE-expanded denoiser batch over
    # its 'data' axis (multi-chip sampling; see sampler.make_window_sampler)
    mesh: Optional[object] = None
    # optional (to_state, from_state) pair keeping the scan state in the
    # model's token layout (sampler.make_window_sampler state_codec);
    # model_apply must then accept token-layout x (UViT3D token_io=True)
    state_codec: Optional[Tuple[Callable, Callable]] = None


class DFoTRollout:
    """Stateless (parameters passed per call) sampling driver."""

    def __init__(
        self,
        cfg: RolloutConfig,
        dcfg: dc.DiffusionConfig,
        sched: dc.Schedule,
        model_apply: Callable,
    ):
        self.cfg = cfg
        self.dcfg = dcfg
        self.sched = sched
        # denoiser-eval accounting (B=1-equivalent forward passes) for
        # auditable FLOPs/MFU reporting in bench.py
        self.stats = {"denoiser_evals_b1": 0, "windows": 0}
        # optional progress callback: progress(phase: str, info: dict).
        # bench.py uses it to emit incremental throughput lines during long
        # rollouts so a timeout still leaves a parsable JSON tail
        self.progress = None
        self._window_fn = make_window_sampler(
            model_apply,
            dcfg,
            sched,
            replacement_only=cfg.is_full_sequence,
            use_ddpm=not dcfg.is_ddim_sampling,
            reconstruction_guidance=dcfg.reconstruction_guidance,
            mesh=cfg.mesh,
            cond_transform=cfg.cond_transform,
            state_codec=cfg.state_codec,
        )

    # ------------------------------------------------------------------
    # one window
    # ------------------------------------------------------------------
    def sample_sequence(
        self,
        variables,
        rng: jax.Array,
        batch_size: int,
        length: Optional[int] = None,
        context: Optional[jax.Array] = None,
        context_mask: Optional[np.ndarray] = None,
        conditions: Optional[jax.Array] = None,
        history_guidance: Optional[HistoryGuidance] = None,
    ) -> jax.Array:
        """Sample one window of up to max_tokens tokens.

        context: (B, length, *x_shape) or None; context_mask: (B, length)
        int {0, 1, 2} (padding added here). Returns (B, length, *x_shape).
        """
        cfg, dcfg = self.cfg, self.dcfg
        if length is None:
            length = cfg.max_tokens if context is None else context.shape[1]
        if length > cfg.max_tokens:
            raise ValueError(f"length {length} exceeds max_tokens {cfg.max_tokens}")
        if (context is None) != (context_mask is None):
            raise ValueError("context and context_mask must be given together")

        horizon = length if cfg.use_causal_mask else cfg.max_tokens
        padding = horizon - length
        xs_shape = (batch_size, horizon) + tuple(cfg.x_shape)

        rng, r_init, r_run = jax.random.split(rng, 3)
        x_init = dc.clipped_normal(r_init, xs_shape, dcfg.clip_noise)

        if context is None:
            ctx_arr = jnp.zeros(xs_shape, x_init.dtype)
            mask = np.zeros((batch_size, horizon), dtype=np.int64)
        else:
            ctx_arr = jnp.zeros(xs_shape, x_init.dtype).at[:, :length].set(context)
            mask = np.full((batch_size, horizon), -1, dtype=np.int64)
            mask[:, :length] = np.asarray(context_mask)

        mask_dev = jnp.asarray(mask)
        x_init = jnp.where(dc.bcast_right(mask_dev >= 1, x_init.ndim), ctx_arr, x_init)

        if history_guidance is None:
            history_guidance = HistoryGuidance.conditional(timesteps=dcfg.timesteps)

        plan = plan_sampling(
            mask,
            history_guidance,
            cfg.scheduling_matrix,
            dcfg.timesteps,
            dcfg.sampling_timesteps,
            horizon - padding,
            padding,
            is_full_sequence=cfg.is_full_sequence,
            refine=cfg.refinement,
        )
        if cfg.scan_bucket and cfg.scan_bucket > 0:
            S = plan.num_steps
            bucket = -(-S // cfg.scan_bucket) * cfg.scan_bucket
            if bucket > S:
                plan = plan_sampling(
                    mask, history_guidance, cfg.scheduling_matrix,
                    dcfg.timesteps, dcfg.sampling_timesteps,
                    horizon - padding, padding,
                    is_full_sequence=cfg.is_full_sequence,
                    refine=cfg.refinement, pad_steps_to=bucket,
                )
        n_eval_rows = int(
            plan.num_steps
            - int(np.asarray(plan.renoise).sum())
            - int(np.asarray(plan.noop).sum())
        )
        self.stats["denoiser_evals_b1"] += n_eval_rows * batch_size * plan.nfe
        self.stats["windows"] += 1
        plan_dev = jax.tree_util.tree_map(jnp.asarray, plan)
        out = self._window_fn(
            variables,
            x_init,
            ctx_arr,
            plan_dev,
            conditions,
            r_run,
            num_hist=plan.num_hist,
            num_gen=plan.num_gen,
        )
        if length == out.shape[1]:
            # full-horizon window: hand back the device array untouched so
            # callers can keep dispatching ahead (no device slice op — a
            # jnp slice would compile one tiny program per distinct length)
            return out
        return np.asarray(out)[:, :length]

    # ------------------------------------------------------------------
    # sliding-window prediction
    # ------------------------------------------------------------------
    def predict_sequence(
        self,
        variables,
        rng: jax.Array,
        context: jax.Array,  # (B, gt_len, *x_shape)
        length: Optional[int] = None,
        conditions: Optional[jax.Array] = None,
        history_guidance: Optional[HistoryGuidance] = None,
        sliding_context_len: Optional[int] = None,
    ) -> jax.Array:
        cfg = self.cfg
        if length is None:
            length = cfg.max_tokens
        batch_size, gt_len = context.shape[:2]
        windows = sliding_window_plan(
            gt_len,
            length,
            cfg.max_tokens,
            sliding_context_len
            if sliding_context_len is not None
            else (cfg.sliding_context_len if length > cfg.max_tokens else None),
            cfg.chunk_size,
            cfg.use_causal_mask,
        )
        # xs_pred stays HOST numpy: the per-window concat/slice shapes vary,
        # so jnp here would compile a fresh program per window
        xs_pred = np.asarray(context, np.float32)
        for w in windows:
            rng, r_w = jax.random.split(rng)
            c, h = w.context_len, w.gen_len
            win_ctx = np.concatenate(
                [
                    xs_pred[:, -c:],
                    np.zeros((batch_size, h) + tuple(cfg.x_shape), xs_pred.dtype),
                ],
                axis=1,
            )
            win_mask = np.zeros((batch_size, c + h), dtype=np.int64)
            win_mask[:, :c] = 1
            if w.generated_context_len > 0:
                win_mask[:, c - w.generated_context_len : c] = 2

            cond_slice = self._slice_conditions(
                conditions, w.start_token, c + h if cfg.use_causal_mask else cfg.max_tokens
            )
            new = self.sample_sequence(
                variables,
                r_w,
                batch_size,
                length=c + h,
                context=win_ctx,
                context_mask=win_mask,
                conditions=cond_slice,
                history_guidance=history_guidance,
            )
            xs_pred = np.concatenate([xs_pred, np.asarray(new)[:, -h:]], axis=1)
        return xs_pred

    # ------------------------------------------------------------------
    # interpolation
    # ------------------------------------------------------------------
    def interpolate_videos(
        self,
        variables,
        rng: jax.Array,
        context: jax.Array,  # (B, T, *x_shape)
        context_mask: Optional[np.ndarray] = None,  # (B, T) bool
        conditions: Optional[jax.Array] = None,
        history_guidance: Optional[HistoryGuidance] = None,
    ) -> jax.Array:
        """Fill all unknown frames; see planner.interpolation_plan.

        The plan is derived from batch element 0's mask (assumed shared, as
        in the reference, dfot_video.py:198).
        """
        cfg = self.cfg
        B, T = context.shape[:2]
        if context_mask is None:
            context_mask = np.zeros((B, T), dtype=bool)
            context_mask[:, [0, -1]] = True
        context_mask = np.asarray(context_mask).astype(bool)

        plan = interpolation_plan(context_mask[0], cfg.max_tokens)
        # the full sequence lives on HOST; only per-window contexts go to
        # device (see module docstring — avoids per-frame-tuple compiles).
        # copy: np.asarray of a jax array is a read-only view
        xs = np.array(context, np.float32, copy=True)
        known = context_mask.copy()
        max_bs = cfg.interpolation_max_batch_size
        if conditions is not None:
            conditions = np.asarray(conditions)  # one fetch if device-resident

        import time as _time

        for rnd in plan:
            # batch all chunks of this round together
            _tb = _time.perf_counter()
            chunk_ctx, chunk_mask, chunk_cond = [], [], []
            for frames in rnd:
                n = len(frames)
                ctx = _take_frames(xs, frames)
                pad = cfg.max_tokens - n
                if pad:
                    ctx = np.concatenate(
                        [ctx, np.zeros((B, pad) + tuple(cfg.x_shape), ctx.dtype)], 1
                    )
                m = np.full((B, cfg.max_tokens), -1, dtype=np.int64)
                m[:, :n] = known[:, frames].astype(np.int64)
                chunk_ctx.append(ctx)
                chunk_mask.append(m)
                if conditions is not None:
                    if cfg.external_cond_type == "label":
                        chunk_cond.append(conditions)
                    else:
                        csel = _take_frames(conditions, frames)
                        if pad:
                            cz = np.zeros((B, pad) + conditions.shape[2:], csel.dtype)
                            csel = np.concatenate([csel, cz], 1)
                        chunk_cond.append(csel)

            # split into max_batch_size dispatches to bound NFE-expanded
            # memory. Dispatch directly from the per-chunk host arrays:
            # a round-wide np.concatenate + re-slice would copy the whole
            # round's contexts twice more — ~10 s/round of pure host memcpy
            # on the single-core TPU host (~60 MB/s contended), serial with
            # the device. Outputs stay on device until the whole round has
            # dispatched (fetching group 0 then overlaps later groups).
            self.stats["interp_host_build_sec"] = (
                self.stats.get("interp_host_build_sec", 0.0)
                + _time.perf_counter() - _tb
            )
            n_chunks = len(rnd)
            N = n_chunks * B
            bs = max_bs or N
            # ONE generic dispatch path: the round's flat (chunk-major) batch
            # of N rows is cut into [i0, i1) groups of <= bs rows; each group
            # slices its rows straight from the per-chunk host arrays (no
            # round-wide concatenation — that copies the whole round's
            # contexts twice more, ~10 s/round of pure host memcpy on the
            # single-core TPU host). When bs is a multiple of B the group
            # boundaries land on whole chunks and nothing is ever split.
            cat = lambda parts: parts[0] if len(parts) == 1 else np.concatenate(parts, 0)

            def chunk_rows(i0, i1):
                """(ci, r0, r1) spans covering flat rows [i0, i1)."""
                return [
                    (ci, max(0, i0 - ci * B), min(B, i1 - ci * B))
                    for ci in range(i0 // B, -(-i1 // B))
                ]

            def row_parts(arrs, i0, i1):
                return cat([arrs[ci][r0:r1] for ci, r0, r1 in chunk_rows(i0, i1)])

            groups = [(i0, min(i0 + bs, N)) for i0 in range(0, N, bs)]
            outs = []
            for i0, i1 in groups:
                rng, r_c = jax.random.split(rng)
                outs.append(
                    self.sample_sequence(
                        variables,
                        r_c,
                        i1 - i0,
                        length=cfg.max_tokens,
                        context=row_parts(chunk_ctx, i0, i1),
                        context_mask=row_parts(chunk_mask, i0, i1),
                        conditions=row_parts(chunk_cond, i0, i1)
                        if chunk_cond
                        else None,
                        history_guidance=history_guidance,
                    )
                )
                try:
                    # queue the D2H transfer NOW: PJRT schedules it after the
                    # group's compute completes, so group i's fetch rides
                    # under group i+1's compute instead of serializing after
                    # the round (the fetch is the bulk of the ~12.5 s
                    # interp_host_scatter_sec in the r5 200-frame rollout)
                    outs[-1].copy_to_host_async()
                except AttributeError:
                    pass  # non-jax output (CPU/test paths)
                if self.progress is not None:
                    # non-blocking heartbeat (dispatch-time, not completion)
                    self.progress("window", {"windows": self.stats["windows"]})
            _tf = _time.perf_counter()
            # device wait: the round's in-flight windows finish here; the
            # host share (array fetch + scatter into xs) is timed separately
            # so the emitted stats can't be misread as 94% host overhead.
            for o in outs:
                jax.block_until_ready(o)
            _tw = _time.perf_counter()
            self.stats["interp_device_wait_sec"] = (
                self.stats.get("interp_device_wait_sec", 0.0) + _tw - _tf
            )
            for (i0, i1), o in zip(groups, outs):
                pred = np.asarray(o)
                for ci, r0, r1 in chunk_rows(i0, i1):
                    frames = rnd[ci]
                    po = ci * B + r0 - i0
                    for j, f in enumerate(frames):
                        xs[r0:r1, f] = pred[po : po + (r1 - r0), j]
                    known[r0:r1, frames] = True
            self.stats["interp_host_scatter_sec"] = (
                self.stats.get("interp_host_scatter_sec", 0.0)
                + _time.perf_counter() - _tw
            )
            # legacy combined stat (device wait + host scatter), kept for
            # cross-round comparability of BENCH artifacts
            self.stats["interp_fetch_scatter_sec"] = (
                self.stats.get("interp_fetch_scatter_sec", 0.0)
                + _time.perf_counter() - _tf
            )
            if self.progress is not None:
                self.progress(
                    "interp_round", {"frames_known": int(known[0].sum())}
                )
        return xs

    # ------------------------------------------------------------------
    # full prediction task (keyframes + interpolation)
    # ------------------------------------------------------------------
    def predict_videos(
        self,
        variables,
        rng: jax.Array,
        xs: jax.Array,  # (B, T, *x_shape) — context frames at the front
        n_context_tokens: int,
        conditions: Optional[jax.Array] = None,
        prediction_hg: Optional[HistoryGuidance] = None,
        interpolation_hg: Optional[HistoryGuidance] = None,
    ) -> jax.Array:
        cfg = self.cfg
        B, T = xs.shape[:2]
        density = cfg.keyframe_density or 1.0
        keys = keyframe_indices(density, T, n_context_tokens)

        key_conditions = conditions
        if conditions is not None and cfg.external_cond_type == "action":
            key_conditions = _take_frames(conditions, keys)

        import time as _time

        rng, r_pred = jax.random.split(rng)
        t0 = _time.perf_counter()
        ev0 = self.stats["denoiser_evals_b1"]
        xs_key = self.predict_sequence(
            variables,
            r_pred,
            xs[:, :n_context_tokens],
            length=len(keys),
            conditions=key_conditions,
            history_guidance=prediction_hg,
            sliding_context_len=cfg.sliding_context_len or cfg.max_tokens // 2,
        )
        jax.block_until_ready(xs_key)
        self.stats["keyframe_sec"] = (
            self.stats.get("keyframe_sec", 0.0) + _time.perf_counter() - t0
        )
        self.stats["keyframe_evals_b1"] = (
            self.stats.get("keyframe_evals_b1", 0)
            + self.stats["denoiser_evals_b1"] - ev0
        )
        if self.progress is not None:
            self.progress("keyframes", {"frames_known": len(keys)})
        xs_pred = np.asarray(xs, np.float32).copy()
        xs_key = np.asarray(xs_key, np.float32)
        for j, f in enumerate(keys):
            xs_pred[:, f] = xs_key[:, j]

        if len(keys) < T:
            mask = np.zeros((B, T), dtype=bool)
            mask[:, keys] = True
            rng, r_interp = jax.random.split(rng)
            t1 = _time.perf_counter()
            xs_pred = self.interpolate_videos(
                variables,
                r_interp,
                xs_pred,
                mask,
                conditions=conditions,
                history_guidance=interpolation_hg,
            )
            self.stats["interp_sec"] = (
                self.stats.get("interp_sec", 0.0) + _time.perf_counter() - t1
            )
        return xs_pred

    # ------------------------------------------------------------------
    def _slice_conditions(self, conditions, start: int, length: int):
        # conditions may be HOST numpy: large per-frame maps (e.g. 180-channel
        # ray encodings over hundreds of frames) must not be materialized on
        # device in full — only the per-window slice is transferred
        if conditions is None:
            return None
        if self.cfg.external_cond_type == "label":
            return conditions
        xp = np if isinstance(conditions, np.ndarray) else jnp
        sl = conditions[:, start : start + length]
        if sl.shape[1] < length:  # pad tail windows
            pad = xp.zeros(
                (sl.shape[0], length - sl.shape[1]) + sl.shape[2:], sl.dtype
            )
            sl = xp.concatenate([sl, pad], 1)
        return sl
