"""Train state: params + optimizer + EMA as one pytree.

The EMA shadow lives inside the state (pure-functional counterpart of the
reference's EMAModel shadow dict, algorithms/common/ema.py:4-104), so a
single jitted train_step updates parameters, optimizer, and EMA together and
the whole state shards uniformly over the mesh.
"""

from __future__ import annotations

from typing import Any, Optional

import flax.struct
import jax
import jax.numpy as jnp
import optax

__all__ = ["TrainState", "create_train_state", "ema_update", "gated_ema_update"]


class TrainState(flax.struct.PyTreeNode):
    step: jax.Array
    params: Any
    opt_state: Any
    ema_params: Optional[Any] = None
    tx: optax.GradientTransformation = flax.struct.field(pytree_node=False, default=None)

    def apply_gradients(self, grads) -> "TrainState":
        updates, new_opt_state = self.tx.update(grads, self.opt_state, self.params)
        new_params = optax.apply_updates(self.params, updates)
        return self.replace(
            step=self.step + 1, params=new_params, opt_state=new_opt_state
        )


def create_train_state(
    params, tx: optax.GradientTransformation, use_ema: bool = True
) -> TrainState:
    return TrainState(
        step=jnp.zeros((), jnp.int32),
        params=params,
        opt_state=tx.init(params),
        ema_params=jax.tree_util.tree_map(jnp.copy, params) if use_ema else None,
        tx=tx,
    )


def ema_update(ema_params, params, decay: float):
    """shadow <- decay * shadow + (1 - decay) * params."""
    return jax.tree_util.tree_map(
        lambda e, p: e * decay + p.astype(e.dtype) * (1.0 - decay), ema_params, params
    )


def gated_ema_update(ema_params, params, decay: float, step, accumulate_steps: int = 1):
    """EMA update applied once per OPTIMIZER step under gradient accumulation.

    ``step`` is the post-increment micro-step counter; with optax.MultiSteps
    params only change on micro-steps k, 2k, ... — the reference steps EMA
    right after optimizer.step (simple_video_generation.py:307-309), so we
    keep the shadow unchanged on the intermediate micro-steps.
    """
    decayed = ema_update(ema_params, params, decay)
    if accumulate_steps <= 1:
        return decayed
    did_update = (step % accumulate_steps) == 0
    return jax.tree_util.tree_map(
        lambda d, e: jnp.where(did_update, d, e), decayed, ema_params
    )
