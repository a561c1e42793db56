"""Multi-host utilities (reference: utils/distributed_utils.py:14-38 and the
Accelerate gather/barrier calls in simple_video_generation.py:313,422-467).

Under JAX SPMD these are thin wrappers: rank gating via process_index,
metric gathering via multihost_utils.process_allgather, barriers via
sync_global_devices. jax.distributed.initialize() wires a TPU pod slice.
"""

from __future__ import annotations

import os
from typing import Any, Optional

import jax
import numpy as np

__all__ = [
    "initialize",
    "detect_multiprocess_env",
    "is_rank_zero",
    "rank_zero_print",
    "barrier",
    "gather_for_metrics",
    "broadcast_from_zero",
]

_initialized = False


def detect_multiprocess_env() -> bool:
    """True when env vars indicate a multi-process launch — WITHOUT touching
    the jax backend (any backend query would lock in a single-process
    runtime before jax.distributed.initialize can run)."""
    if os.environ.get("JAX_COORDINATOR_ADDRESS") or os.environ.get(
        "COORDINATOR_ADDRESS"
    ):
        return True
    # SLURM multi-task job (jax's cluster auto-detection handles the rest)
    try:
        if int(os.environ.get("SLURM_NTASKS", "1")) > 1:
            return True
    except ValueError:
        pass
    # Cloud TPU pod slice: multiple workers per slice
    try:
        if int(os.environ.get("TPU_WORKER_ID", "-1")) >= 0 and (
            "TPU_WORKER_HOSTNAMES" in os.environ
            or int(os.environ.get("TPU_NUM_WORKERS", "1")) > 1
        ):
            return True
    except ValueError:
        pass
    return False


def initialize(
    coordinator_address: Optional[str] = None,
    num_processes: Optional[int] = None,
    process_id: Optional[int] = None,
    **kwargs,
) -> None:
    """Wire up multi-host JAX. Must run BEFORE any backend query
    (``jax.devices()`` / ``jax.process_count()``) — querying first initializes
    a single-process backend and multi-host training silently degrades into N
    independent jobs. Detection therefore uses env vars only.

    No-op when neither an explicit coordinator nor a multi-process
    environment (SLURM, TPU pod) is detected, and idempotent on repeat calls.
    jax.distributed.initialize auto-fills coordinator/rank from its cluster
    plugins (SLURM, Cloud TPU) when args are None.
    """
    global _initialized
    if _initialized:
        return
    if coordinator_address is None and not detect_multiprocess_env():
        return
    jax.distributed.initialize(
        coordinator_address=coordinator_address,
        num_processes=num_processes,
        process_id=process_id,
        **kwargs,
    )
    _initialized = True


def is_rank_zero() -> bool:
    return jax.process_index() == 0


def rank_zero_print(*args, **kwargs) -> None:
    if is_rank_zero():
        print(*args, **kwargs)


def barrier(name: str = "barrier") -> None:
    """Global device sync (== accelerator.wait_for_everyone)."""
    from jax.experimental import multihost_utils

    multihost_utils.sync_global_devices(name)


def gather_for_metrics(tree: Any) -> Any:
    """All-gather host-local arrays across processes, concatenated on the
    leading axis (== accelerator.gather_for_metrics)."""
    if jax.process_count() == 1:
        return jax.tree_util.tree_map(np.asarray, tree)
    from jax.experimental import multihost_utils

    return jax.tree_util.tree_map(
        lambda x: np.asarray(multihost_utils.process_allgather(x)).reshape(
            (-1,) + np.asarray(x).shape[1:]
        ),
        tree,
    )


def broadcast_from_zero(tree: Any) -> Any:
    """Broadcast host data from process 0 to all processes."""
    if jax.process_count() == 1:
        return tree
    from jax.experimental import multihost_utils

    return multihost_utils.broadcast_one_to_all(tree)
