"""Training noise-level generation — pure JAX, per-token (B, T).

Mirrors the reference's training-time noise assignment
(base_pytorch_video_algo.py:779-874):

- random_independent : iid per token (Diffusion Forcing)
- random_uniform     : one level per video (classic video diffusion)
- interleaved        : one level for odd, one for even tokens
- uniform_future     : context keeps iid levels, future shares one level
- fixed/variable context masks for the SD/BD CFG baselines, with context
  dropout (context tokens forced to max noise with prob ``dropout``),
- unavailable frames (mask False) forced to max noise.
"""

from __future__ import annotations

import dataclasses
from typing import Optional, Tuple

import jax
import jax.numpy as jnp

__all__ = ["NoiseLevelConfig", "training_noise_levels"]


@dataclasses.dataclass(frozen=True)
class NoiseLevelConfig:
    noise_level: str = "random_independent"
    timesteps: int = 1000
    is_continuous: bool = False
    n_context_tokens: int = 0
    uniform_future: bool = False
    fixed_context: bool = False
    fixed_context_indices: Optional[Tuple[int, ...]] = None
    fixed_context_dropout: float = 0.0
    variable_context: bool = False
    variable_context_prob: float = 0.25
    variable_context_dropout: float = 0.3

    @classmethod
    def from_config(cls, algo_cfg, timesteps: int, n_context_tokens: int):
        fc, vc = algo_cfg.fixed_context, algo_cfg.variable_context
        idx = fc.get("indices")
        return cls(
            noise_level=algo_cfg.noise_level,
            timesteps=timesteps,
            is_continuous=algo_cfg.diffusion.get("is_continuous", False),
            n_context_tokens=n_context_tokens,
            uniform_future=algo_cfg.uniform_future.enabled,
            fixed_context=fc.enabled,
            fixed_context_indices=tuple(idx) if idx else None,
            fixed_context_dropout=fc.get("dropout", 0.0),
            variable_context=vc.enabled,
            variable_context_prob=vc.get("prob", 0.25),
            variable_context_dropout=vc.get("dropout", 0.3),
        )


def _rand_levels(rng: jax.Array, shape, cfg: NoiseLevelConfig) -> jax.Array:
    if cfg.is_continuous:
        return jax.random.uniform(rng, shape, dtype=jnp.float32)
    return jax.random.randint(rng, shape, 0, cfg.timesteps)


def training_noise_levels(
    rng: jax.Array,
    cfg: NoiseLevelConfig,
    frame_mask: jax.Array,  # (B, T) bool — frame available?
    train: bool = True,
) -> Tuple[jax.Array, jax.Array]:
    """Returns (noise_levels (B, T), loss_mask (B, T) bool)."""
    B, T = frame_mask.shape
    r_levels, r_ctx, r_drop, r_future = jax.random.split(rng, 4)

    if cfg.noise_level == "random_independent":
        levels = _rand_levels(r_levels, (B, T), cfg)
    elif cfg.noise_level == "random_uniform":
        levels = jnp.broadcast_to(_rand_levels(r_levels, (B, 1), cfg), (B, T))
    elif cfg.noise_level == "interleaved":
        pair = _rand_levels(r_levels, (B, 2), cfg)
        parity = jnp.arange(T) % 2
        levels = jnp.take_along_axis(pair, jnp.broadcast_to(parity[None], (B, T)), axis=1)
    else:
        raise ValueError(f"unknown noise_level {cfg.noise_level}")

    if cfg.uniform_future:
        future = jnp.broadcast_to(_rand_levels(r_future, (B, 1), cfg), (B, T))
        is_future = jnp.arange(T)[None] >= cfg.n_context_tokens
        levels = jnp.where(is_future, future, levels)

    max_level = 1.0 if cfg.is_continuous else cfg.timesteps - 1
    levels = jnp.where(frame_mask, levels, jnp.full_like(levels, max_level))

    loss_mask = frame_mask
    context_mask = None
    if cfg.variable_context:
        context_mask = jax.random.bernoulli(
            r_ctx, cfg.variable_context_prob, (B, T)
        )
        dropout = cfg.variable_context_dropout
    elif cfg.fixed_context:
        idx = (
            jnp.asarray(cfg.fixed_context_indices)
            if cfg.fixed_context_indices is not None
            else jnp.arange(cfg.n_context_tokens)
        )
        context_mask = jnp.zeros((B, T), bool).at[:, idx].set(True)
        dropout = cfg.fixed_context_dropout

    if context_mask is not None:
        # per-video context dropout -> context forced to max noise (CFG)
        p = dropout if train else 0.0
        ctx_levels = jax.random.bernoulli(r_drop, p, (B, 1)).astype(levels.dtype)
        if not cfg.is_continuous:
            ctx_levels = (ctx_levels * (cfg.timesteps - 1)).astype(levels.dtype)
        levels = jnp.where(context_mask, jnp.broadcast_to(ctx_levels, (B, T)), levels)
        # context frames excluded from the loss
        loss_mask = jnp.logical_and(loss_mask, ~context_mask)

    return levels, loss_mask
