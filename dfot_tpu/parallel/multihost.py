"""Multi-host utilities (reference: utils/distributed_utils.py:14-38 and the
Accelerate gather/barrier calls in simple_video_generation.py:313,422-467).

Under JAX SPMD these are thin wrappers: rank gating via process_index,
metric gathering via multihost_utils.process_allgather, barriers via
sync_global_devices. jax.distributed.initialize() wires a TPU pod slice.
"""

from __future__ import annotations

from typing import Any, Optional

import jax
import numpy as np

__all__ = [
    "initialize",
    "is_rank_zero",
    "rank_zero_print",
    "barrier",
    "gather_for_metrics",
    "broadcast_from_zero",
]


def initialize(coordinator_address: Optional[str] = None, **kwargs) -> None:
    """Initialize multi-host JAX (no-op on a single process)."""
    if jax.process_count() > 1 or coordinator_address is None:
        return
    jax.distributed.initialize(coordinator_address=coordinator_address, **kwargs)


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
