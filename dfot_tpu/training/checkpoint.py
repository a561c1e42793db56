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

__all__ = [
    "save_checkpoint", "latest_checkpoint", "restore_checkpoint",
    "register_run", "resolve_run_checkpoint",
]

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


def register_run(output_root: str, name: str, output_dir: str) -> str:
    """Append this run to the local run registry and return its run id.

    Offline counterpart of the reference's wandb run tracking
    (utils/ckpt_utils.py:85-121 resolves ``load=<wandb-run-id>`` to that
    run's checkpoints): every launch records {run_id, name, output_dir} in
    ``{output_root}/registry.jsonl`` so ``load=<run-id>`` / ``load=<name>``
    resolve without any network service."""
    import hashlib
    import json
    import time

    run_id = hashlib.sha1(
        f"{name}|{output_dir}|{time.time_ns()}".encode()
    ).hexdigest()[:8]
    os.makedirs(output_root, exist_ok=True)
    with open(os.path.join(output_root, "registry.jsonl"), "a") as f:
        f.write(
            json.dumps(
                {"run_id": run_id, "name": name, "output_dir": os.path.abspath(output_dir)}
            )
            + "\n"
        )
    return run_id


def resolve_run_checkpoint(load: str, output_root: str) -> Optional[str]:
    """Resolve ``load=<run-id-or-name>`` through the local run registry to
    that run's latest checkpoint dir (latest matching run wins). Returns
    None when nothing matches — callers fall back to treating ``load`` as a
    filesystem path."""
    import json

    reg = os.path.join(output_root, "registry.jsonl")
    if not os.path.exists(reg):
        return None
    match = None
    with open(reg) as f:
        for line in f:
            try:
                rec = json.loads(line)
            except json.JSONDecodeError:
                continue
            if load in (rec.get("run_id"), rec.get("name")):
                match = rec
    if match is None:
        return None
    return latest_checkpoint(os.path.join(match["output_dir"], "checkpoints"))


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
