"""Difference-DFoT: models (frame-difference, frame) token pairs.

Counterpart of the reference DifferenceDFoTVideo
(algorithms/dfot/difference_dfot_video.py): the sequence is augmented with
first-order temporal differences (diff[t] = x[t] - x[t-1], diff[0] = 0),
merged 'concat' ([diffs | frames]) or 'interleaved' along time into 2T
tokens; noise levels / masks / conditions are tiled across both streams,
and the diff and frame halves get separately-logged losses.
"""

from __future__ import annotations

from typing import Dict, Optional, Tuple

import jax
import jax.numpy as jnp

from ..diffusion import core as dc
from ..diffusion.continuous import continuous_training_fields, continuous_v_loss
from ..guidance.history_guidance import HistoryGuidance
from ..training.noise_levels import training_noise_levels
from ..training.state import gated_ema_update
from ..training.trainer import optax_global_norm
from .dfot_video import DFoTVideoAlgo

__all__ = ["DifferenceDFoTVideoAlgo"]


class DifferenceDFoTVideoAlgo(DFoTVideoAlgo):
    def __init__(self, cfg, compute_dtype=jnp.bfloat16):
        if cfg.backbone.get("merge_type", "concat") not in ("concat", "interleaved"):
            raise ValueError(f"unsupported merge type {cfg.backbone.merge_type}")
        super().__init__(cfg, compute_dtype)
        self.merge_type = cfg.backbone.get("merge_type", "concat")

    # -- merge helpers (reference :46-78) --------------------------------
    def merge(self, a: jax.Array, b: jax.Array) -> jax.Array:
        if self.merge_type == "concat":
            return jnp.concatenate([a, b], axis=1)
        stacked = jnp.stack([a, b], axis=2)  # (B, T, 2, ...)
        return stacked.reshape((a.shape[0], a.shape[1] * 2) + a.shape[2:])

    def unmerge(self, x: jax.Array) -> Tuple[jax.Array, jax.Array]:
        if self.merge_type == "concat":
            return jnp.split(x, 2, axis=1)
        y = x.reshape((x.shape[0], x.shape[1] // 2, 2) + x.shape[2:])
        return y[:, :, 0], y[:, :, 1]

    # -- training ----------------------------------------------------------
    def make_train_step(self, ema_decay: float = 0.9999, accumulate_steps: int = 1):
        sched, dcfg, nl_cfg = self.sched, self.dcfg, self.nl_cfg
        model_apply = self._train_apply
        merge, unmerge = self.merge, self.unmerge

        def loss_fn(params, xs, conditions, frame_mask, rng):
            r_k, r_noise, r_drop = jax.random.split(rng, 3)
            # per-frame noise levels, tiled over both streams (reference :88-93)
            k, loss_mask = training_noise_levels(r_k, nl_cfg, frame_mask, train=True)
            diff = jnp.diff(xs, axis=1, prepend=xs[:, :1])
            merged = merge(diff, xs).astype(jnp.float32)
            k2 = merge(k, k)
            mask2 = merge(loss_mask, loss_mask)
            cond2 = merge(conditions, conditions) if conditions is not None else None

            if dcfg.is_continuous:
                noise = dc.clipped_normal(r_noise, merged.shape, dcfg.clip_noise)
                x_t, logsnr, a_t, s_t = continuous_training_fields(dcfg, merged, k2, noise)
                out = model_apply(params, x_t, dcfg.precond_scale * logsnr, cond2,
                                  None, rngs={"dropout": r_drop}, train=True)
                _, loss = continuous_v_loss(dcfg, out, x_t, noise, logsnr, a_t, s_t)
            else:
                noise = dc.clipped_normal(r_noise, merged.shape, dcfg.clip_noise)
                noised, target = dc.training_targets(sched, dcfg, merged, k2, noise)
                out = model_apply(params, noised, k2.astype(jnp.float32), cond2,
                                  None, rngs={"dropout": r_drop}, train=True)
                loss = dc.training_loss(sched, dcfg, out, target, k2)

            w2 = dc.bcast_right(mask2.astype(loss.dtype), loss.ndim)
            diff_loss, xs_loss = unmerge(loss)
            w1 = dc.bcast_right(loss_mask.astype(loss.dtype), loss.ndim)
            return jnp.mean(loss * w2), {
                "diff_loss": jnp.mean(jax.lax.stop_gradient(diff_loss) * w1),
                "xs_loss": jnp.mean(jax.lax.stop_gradient(xs_loss) * w1),
            }

        import functools

        @functools.partial(jax.jit, donate_argnums=(0,))
        def train_step(state, batch, rng):
            (loss, parts), grads = jax.value_and_grad(loss_fn, has_aux=True)(
                state.params, batch["xs"], batch.get("conditions"), batch["masks"], rng
            )
            gn = optax_global_norm(grads)
            state = state.apply_gradients(grads)
            if state.ema_params is not None:
                state = state.replace(
                    ema_params=gated_ema_update(
                        state.ema_params, state.params, ema_decay,
                        state.step, accumulate_steps,
                    )
                )
            return state, {"loss": loss, "grad_norm": gn, **parts}

        return train_step

    # -- sampling ------------------------------------------------------------
    def sample_videos(self, params, rng, xs, conditions=None, tasks=None,
                      n_context_tokens=None):
        """Prediction on the merged (diff, frame) stream.

        The reference merges BEFORE rolling out (difference_dfot_video.py
        :166-195): the merged 2T-token sequence is what slides through
        windows of ``2 * max_tokens`` tokens (sliding_context_len is used
        as-is — "not divided by 2", :262), context tokens are doubled
        (:182-184, interleaved merge only when context > 0), and the output
        is unmerged at the end (the diff half is logged as ``*_diff``).
        """
        nct = n_context_tokens if n_context_tokens is not None else self.n_context_tokens
        nct2 = 2 * nct  # context doubled on the merged stream (reference :183)
        if nct2 > 0 and self.merge_type != "interleaved":
            raise ValueError(
                "context tokens > 0 require interleaved merge (reference :184)"
            )
        diff = jnp.diff(xs, axis=1, prepend=xs[:, :1])
        merged = self.merge(diff, xs)
        conds = self.process_conditions(conditions)
        if conds is not None:
            conds = self.merge(jnp.asarray(conds), jnp.asarray(conds))

        # rollout over the doubled horizon (sliding windows + keyframes)
        from ..sampling import DFoTRollout
        import dataclasses as _dc

        ro = DFoTRollout(
            _dc.replace(self.rollout_cfg, max_tokens=2 * self.max_tokens),
            self.dcfg, self.sched, self._sample_apply,
        )
        hg = HistoryGuidance.from_config(
            self.prediction_hg_cfg, timesteps=self.dcfg.timesteps
        )
        interp_hg = HistoryGuidance.from_config(
            self.interpolation_hg_cfg, timesteps=self.dcfg.timesteps
        )
        out = ro.predict_videos(
            self._variables(params), rng, merged, nct2, conds,
            prediction_hg=hg, interpolation_hg=interp_hg,
        )
        gen_diff, frames = self.unmerge(out)
        return {"gt": xs, "prediction": frames, "prediction_diff": gen_diff}

    def init_params(self, rng: jax.Array):
        B, T = 1, 2 * self.max_tokens
        h, w, c = self.x_shape
        x = jnp.zeros((B, T, h, w, c))
        k = jnp.zeros((B, T))
        cond = self._dummy_condition(B, T)
        rngs = {"params": rng, "dropout": jax.random.fold_in(rng, 1)}
        variables = self.model.init(rngs, x, k, cond, None)
        self._extra_cols = {k_: v for k_, v in variables.items() if k_ != "params"}
        return variables
