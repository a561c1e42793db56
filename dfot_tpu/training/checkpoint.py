"""Checkpoint save/resume: orbax, step-dir layout, top-k pruning.

Mirrors the reference's Accelerate checkpoint scheme
(simple_video_generation.py:602-657): ``{ckpt_dir}/checkpoint_<step>/``
directories holding model/EMA/optimizer state, pruned to the most recent
``save_top_k``; resume picks the highest step.
"""

from __future__ import annotations

import os
import re
import shutil
from typing import Any, Dict, Optional

import numpy as np
import orbax.checkpoint as ocp

__all__ = ["save_checkpoint", "latest_checkpoint", "restore_checkpoint"]

_STEP_RE = re.compile(r"checkpoint_(\d+)$")


def _checkpointer() -> ocp.StandardCheckpointer:
    return ocp.StandardCheckpointer()


def save_checkpoint(
    ckpt_dir: str,
    step: int,
    state,
    save_top_k: int = 3,
) -> str:
    """Save {params, ema_params, opt_state, step} under checkpoint_<step>/."""
    os.makedirs(ckpt_dir, exist_ok=True)
    path = os.path.abspath(os.path.join(ckpt_dir, f"checkpoint_{step}"))
    payload = {
        "params": state.params,
        "opt_state": state.opt_state,
        "step": np.asarray(step),
    }
    if state.ema_params is not None:
        payload["ema_params"] = state.ema_params
    ckptr = _checkpointer()
    ckptr.save(path, payload, force=True)
    ckptr.wait_until_finished()

    # prune to most recent save_top_k (reference save_top_k dir pruning)
    if save_top_k and save_top_k > 0:
        steps = sorted(
            int(m.group(1))
            for name in os.listdir(ckpt_dir)
            if (m := _STEP_RE.search(name))
        )
        for old in steps[:-save_top_k]:
            shutil.rmtree(os.path.join(ckpt_dir, f"checkpoint_{old}"), ignore_errors=True)
    return path


def latest_checkpoint(ckpt_dir: str) -> Optional[str]:
    if not os.path.isdir(ckpt_dir):
        return None
    steps = [
        int(m.group(1))
        for name in os.listdir(ckpt_dir)
        if (m := _STEP_RE.search(name))
    ]
    if not steps:
        return None
    return os.path.abspath(os.path.join(ckpt_dir, f"checkpoint_{max(steps)}"))


def restore_checkpoint(path: str, target: Optional[Dict[str, Any]] = None) -> Dict[str, Any]:
    """Restore a checkpoint dir; ``target`` provides the pytree structure
    (use abstract arrays for sharded restore)."""
    ckptr = _checkpointer()
    path = os.path.abspath(path)
    if target is None:
        return ckptr.restore(path)
    return ckptr.restore(path, target)
