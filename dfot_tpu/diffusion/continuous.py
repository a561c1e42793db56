"""Continuous-time diffusion (logSNR parameterization) — pure JAX.

Minimal continuous-time extension matching the reference
(algorithms/dfot/diffusion/continuous_diffusion.py): training draws t in
[0, 1] per token and converts through a (shifted) cosine logSNR schedule;
sampling still runs on the discrete DDIM grid, but the network's noise-level
input is ``precond_scale * logsnr`` instead of the integer timestep.
"""

from __future__ import annotations

import math
from typing import Tuple

import jax
import jax.numpy as jnp

from .core import DiffusionConfig, Schedule, bcast_right

__all__ = [
    "continuous_logsnr",
    "continuous_training_fields",
    "continuous_model_noise_input",
]


def continuous_logsnr(cfg: DiffusionConfig, t: jax.Array) -> jax.Array:
    """Cosine logSNR schedule with resolution shift (Simple Diffusion).

    ``t`` in [0, 1]; returns logSNR(t). shift = base_res / target_res enters
    as +2 log(shift) (reference: continuous_diffusion.py:46-91).
    """
    if cfg.training_schedule_name != "cosine":
        raise ValueError(f"unknown continuous schedule {cfg.training_schedule_name}")
    t_min = math.atan(math.exp(-0.5 * cfg.logsnr_max))
    t_max = math.atan(math.exp(-0.5 * cfg.logsnr_min))
    shift = 2.0 * math.log(cfg.training_schedule_shift)
    return -2.0 * jnp.log(jnp.tan(t_min + t * (t_max - t_min))) + shift


def continuous_training_fields(
    cfg: DiffusionConfig, x: jax.Array, t: jax.Array, noise: jax.Array
) -> Tuple[jax.Array, jax.Array, jax.Array, jax.Array]:
    """Build the continuous-time v-prediction training quantities.

    Returns (x_t, logsnr, alpha_t, sigma_t) with alpha/sigma broadcast to x
    (reference: continuous_diffusion.py:140-158). t: (B, T) floats in [0,1].
    """
    logsnr = continuous_logsnr(cfg, t)
    alpha_t = bcast_right(jnp.sqrt(jax.nn.sigmoid(logsnr)), x.ndim)
    sigma_t = bcast_right(jnp.sqrt(jax.nn.sigmoid(-logsnr)), x.ndim)
    x_t = alpha_t * x + sigma_t * noise
    return x_t, logsnr, alpha_t, sigma_t


def continuous_model_noise_input(
    cfg: DiffusionConfig, sched: Schedule, k: jax.Array
) -> jax.Array:
    """Noise-level input the network sees during *sampling* in continuous
    mode: precond_scale * logsnr[k] (reference: continuous_diffusion.py:118-121).
    """
    return cfg.precond_scale * jnp.take(sched.logsnr, jnp.clip(k, 0, None), axis=0)


def continuous_v_loss(
    cfg: DiffusionConfig,
    v_pred: jax.Array,
    x_t: jax.Array,
    noise: jax.Array,
    logsnr: jax.Array,
    alpha_t: jax.Array,
    sigma_t: jax.Array,
) -> Tuple[jax.Array, jax.Array]:
    """Sigmoid-weighted epsilon-MSE loss of the v-prediction
    (Kingma & Gao 2023; reference: continuous_diffusion.py:153-167).

    Returns (x_pred, elementwise weighted loss).
    """
    noise_pred = alpha_t * v_pred + sigma_t * x_t
    x_pred = alpha_t * x_t - sigma_t * v_pred
    loss = (noise_pred - jax.lax.stop_gradient(noise)) ** 2
    w = jax.nn.sigmoid(cfg.sigmoid_bias - logsnr)
    return x_pred, loss * bcast_right(w, loss.ndim)
