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
    "save_checkpoint", "wait_for_checkpoints", "latest_checkpoint",
    "restore_checkpoint", "register_run", "resolve_run_checkpoint",
]

_STEP_RE = re.compile(r"checkpoint_(\d+)$")

_ASYNC_CKPTR: Optional[ocp.AsyncCheckpointer] = None


def _checkpointer() -> ocp.StandardCheckpointer:
    return ocp.StandardCheckpointer()


def _async_checkpointer() -> ocp.AsyncCheckpointer:
    global _ASYNC_CKPTR
    if _ASYNC_CKPTR is None:
        _ASYNC_CKPTR = ocp.AsyncCheckpointer(ocp.StandardCheckpointHandler())
    return _ASYNC_CKPTR


def _prune(ckpt_dir: str, keep: int) -> None:
    """Delete all but the newest ``keep`` COMPLETE checkpoint dirs (orbax
    in-flight tmp dirs have a suffix and never match the step regex)."""
    steps = sorted(
        int(m.group(1))
        for name in os.listdir(ckpt_dir)
        if (m := _STEP_RE.search(name))
    )
    for old in steps[:-keep] if keep > 0 else []:
        shutil.rmtree(
            os.path.join(ckpt_dir, f"checkpoint_{old}"), ignore_errors=True
        )


def save_checkpoint(
    ckpt_dir: str,
    step: int,
    state,
    save_top_k: int = 3,
    block: bool = True,
) -> str:
    """Save {params, ema_params, opt_state, step} under checkpoint_<step>/.

    ``block=False`` uses orbax's AsyncCheckpointer: the device->host copy is
    synchronous (so the caller may immediately reuse/donate the state's
    device buffers), while serialization and disk IO run in a background
    thread overlapping training — the reference's synchronous
    ``accelerator.save_state`` stalls the step loop for the whole write.
    Pruning in async mode runs after the PREVIOUS save has finished and only
    touches complete dirs, so a crash mid-write always leaves the newest
    finished checkpoint intact (disk transiently holds save_top_k + 1 dirs).
    """
    os.makedirs(ckpt_dir, exist_ok=True)
    path = os.path.abspath(os.path.join(ckpt_dir, f"checkpoint_{step}"))
    payload = {
        "params": state.params,
        "opt_state": state.opt_state,
        "step": np.asarray(step),
    }
    if state.ema_params is not None:
        payload["ema_params"] = state.ema_params
    if block:
        ckptr = _checkpointer()
        ckptr.save(path, payload, force=True)
        ckptr.wait_until_finished()
        if save_top_k and save_top_k > 0:
            _prune(ckpt_dir, save_top_k)
    else:
        ckptr = _async_checkpointer()
        ckptr.wait_until_finished()  # at most one save in flight
        if save_top_k and save_top_k > 0:
            _prune(ckpt_dir, save_top_k)
        ckptr.save(path, payload, force=True)
    return path


def wait_for_checkpoints() -> None:
    """Block until any in-flight async checkpoint save has committed."""
    if _ASYNC_CKPTR is not None:
        _ASYNC_CKPTR.wait_until_finished()


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
