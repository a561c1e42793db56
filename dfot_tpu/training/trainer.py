"""The jitted train step and its mesh-sharded wrapper.

One pure function replaces the reference's Lightning/Accelerate training loop
body (simple_video_generation.py:252-317 + dfot_video.py:41-75): draw
per-token noise levels, diffuse, run the denoiser, weighted-MSE loss with
frame-mask reweighting, AdamW update, EMA update. Under ``jit`` with a
(data, fsdp) mesh, XLA emits the DP gradient all-reduce and FSDP
gather/scatter collectives automatically.
"""

from __future__ import annotations

import functools
from typing import Callable, Dict, Tuple

import jax
import jax.numpy as jnp

from ..diffusion import core as dc
from ..diffusion.continuous import continuous_training_fields, continuous_v_loss
from .noise_levels import NoiseLevelConfig, training_noise_levels
from .state import TrainState, gated_ema_update

__all__ = ["make_train_step"]


def make_train_step(
    model_apply: Callable,
    dcfg: dc.DiffusionConfig,
    sched: dc.Schedule,
    nl_cfg: NoiseLevelConfig,
    ema_decay: float = 0.9999,
    compute_dtype=jnp.float32,
    accumulate_steps: int = 1,
):
    """Build train_step(state, batch, rng) -> (state, metrics).

    model_apply(params, x, noise_levels, cond, cond_mask, rngs, train) is the
    denoiser's apply function (noise_levels: raw k for discrete models,
    precond-scaled logSNR for continuous ones).

    batch: {"xs": (B, T, *xs), "conditions": optional, "masks": (B, T) bool}.
    """

    def loss_fn(params, xs, conditions, frame_mask, rng):
        r_k, r_noise, r_drop = jax.random.split(rng, 3)
        k, loss_mask = training_noise_levels(r_k, nl_cfg, frame_mask, train=True)
        xs = xs.astype(compute_dtype)

        if dcfg.is_continuous:
            noise = dc.clipped_normal(r_noise, xs.shape, dcfg.clip_noise, xs.dtype)
            x_t, logsnr, alpha_t, sigma_t = continuous_training_fields(
                dcfg, xs, k, noise
            )
            model_out = model_apply(
                params,
                x_t,
                dcfg.precond_scale * logsnr,
                conditions,
                None,
                rngs={"dropout": r_drop},
                train=True,
            )
            x_pred, loss = continuous_v_loss(
                dcfg, model_out, x_t, noise, logsnr, alpha_t, sigma_t
            )
        else:
            noise = dc.clipped_normal(r_noise, xs.shape, dcfg.clip_noise, xs.dtype)
            noised, target = dc.training_targets(sched, dcfg, xs, k, noise)
            model_out = model_apply(
                params,
                noised,
                k.astype(jnp.float32),
                conditions,
                None,
                rngs={"dropout": r_drop},
                train=True,
            )
            loss = dc.training_loss(sched, dcfg, model_out, target, k)
            x_pred = dc.model_predictions(sched, dcfg, noised, k, model_out).pred_x_start

        # frame-mask reweighting then global mean (reference
        # base_pytorch_video_algo.py:684-693)
        w = dc.bcast_right(loss_mask.astype(loss.dtype), loss.ndim)
        loss = jnp.mean(loss * w)
        return loss, x_pred

    # donate the train state: params/opt/EMA buffers are updated in place
    # instead of double-buffered in HBM (2x memory headroom for big models)
    @functools.partial(jax.jit, donate_argnums=(0,))
    def train_step(
        state: TrainState, batch: Dict, rng: jax.Array
    ) -> Tuple[TrainState, Dict]:
        xs = batch["xs"]
        conditions = batch.get("conditions")
        frame_mask = batch["masks"]

        (loss, _), grads = jax.value_and_grad(loss_fn, has_aux=True)(
            state.params, xs, conditions, frame_mask, rng
        )
        grad_norm = optax_global_norm(grads)
        state = state.apply_gradients(grads)
        if state.ema_params is not None:
            state = state.replace(
                ema_params=gated_ema_update(
                    state.ema_params, state.params, ema_decay,
                    state.step, accumulate_steps,
                )
            )
        return state, {"loss": loss, "grad_norm": grad_norm}

    return train_step


def optax_global_norm(tree) -> jax.Array:
    leaves = jax.tree_util.tree_leaves(tree)
    return jnp.sqrt(sum(jnp.sum(jnp.square(l.astype(jnp.float32))) for l in leaves))
