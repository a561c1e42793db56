"""Optimizer + LR schedule factory (optax).

Matches the reference's training setup (base_pytorch_video_algo.py:1061-1082):
AdamW over all diffusion-model params, configurable betas/weight decay, and
the transformers.get_scheduler family of step-interval LR schedules.
"""

from __future__ import annotations

from typing import Optional

import optax

__all__ = ["make_lr_schedule", "make_optimizer"]


def make_lr_schedule(
    name: str,
    base_lr: float,
    num_warmup_steps: int = 0,
    num_training_steps: Optional[int] = None,
):
    warmup = optax.linear_schedule(0.0, base_lr, max(num_warmup_steps, 1))
    if name in ("constant", "constant_with_warmup"):
        main = optax.constant_schedule(base_lr)
    elif name == "linear":
        assert num_training_steps is not None
        main = optax.linear_schedule(
            base_lr, 0.0, max(num_training_steps - num_warmup_steps, 1)
        )
    elif name == "cosine":
        assert num_training_steps is not None
        main = optax.cosine_decay_schedule(
            base_lr, max(num_training_steps - num_warmup_steps, 1)
        )
    else:
        raise ValueError(f"unknown lr schedule {name}")
    if name == "constant":
        return main
    return optax.join_schedules([warmup, main], [num_warmup_steps])


def make_optimizer(
    lr: float,
    weight_decay: float = 1e-3,
    betas=(0.9, 0.99),
    grad_clip: float = 1.0,
    lr_schedule_name: str = "constant_with_warmup",
    num_warmup_steps: int = 5000,
    num_training_steps: Optional[int] = None,
    accumulate_steps: int = 1,
) -> optax.GradientTransformation:
    schedule = make_lr_schedule(
        lr_schedule_name, lr, num_warmup_steps, num_training_steps
    )
    chain = []
    if grad_clip and grad_clip > 0:
        chain.append(optax.clip_by_global_norm(grad_clip))
    chain.append(
        optax.adamw(schedule, b1=betas[0], b2=betas[1], weight_decay=weight_decay)
    )
    tx = optax.chain(*chain)
    if accumulate_steps > 1:
        tx = optax.MultiSteps(tx, accumulate_steps)
    return tx
