"""Device mesh + sharding helpers (jax.sharding / pjit SPMD).

The reference scales with DDP only (torch.distributed/NCCL via Accelerate;
reference: experiments/simple_video_generation.py:155-185). Under XLA SPMD we
get data parallelism *and* FSDP-style parameter sharding from the same
mechanism: lay out a ``Mesh`` over ICI, annotate shardings, and XLA inserts
the collectives (gradient psum for DP; all-gather/reduce-scatter for FSDP).

Axes:
    data  — batch sharding (DP). Gradient all-reduce rides ICI.
    fsdp  — optional parameter/optimizer sharding (ZeRO-3-like). Parameters
            are sharded along their largest divisible axis and gathered
            on-the-fly by XLA where consumed.
"""

from __future__ import annotations

from typing import Optional, Sequence, Tuple

import jax
import numpy as np
from jax.sharding import Mesh, NamedSharding, PartitionSpec as P

__all__ = [
    "make_mesh",
    "batch_sharding",
    "replicated",
    "param_sharding_rule",
    "shard_params",
    "shard_batch",
]


def make_mesh(
    shape: Optional[Tuple[int, int]] = None,
    devices: Optional[Sequence[jax.Device]] = None,
) -> Mesh:
    """Create a (data, fsdp) mesh. shape=None puts all devices on data."""
    devices = list(devices if devices is not None else jax.devices())
    if shape is None:
        shape = (len(devices), 1)
    d, f = shape
    if d * f != len(devices):
        raise ValueError(f"mesh shape {shape} != {len(devices)} devices")
    arr = np.asarray(devices).reshape(d, f)
    return Mesh(arr, ("data", "fsdp"))


def batch_sharding(mesh: Mesh) -> NamedSharding:
    """Batch tensors: sharded on the leading (batch) axis over 'data'."""
    return NamedSharding(mesh, P("data"))


def replicated(mesh: Mesh) -> NamedSharding:
    return NamedSharding(mesh, P())


def param_sharding_rule(path: str, shape: Tuple[int, ...], fsdp_size: int, min_size: int = 2**16):
    """FSDP rule: shard the largest axis divisible by the fsdp size.

    Small tensors (biases, norms, embeddings below min_size) stay replicated —
    the gather overhead would exceed the memory win.
    """
    if fsdp_size <= 1 or int(np.prod(shape)) < min_size:
        return P()
    order = sorted(range(len(shape)), key=lambda i: -shape[i])
    for axis in order:
        if shape[axis] % fsdp_size == 0:
            spec = [None] * len(shape)
            spec[axis] = "fsdp"
            return P(*spec)
    return P()


def shard_params(params, mesh: Mesh, min_size: int = 2**16):
    """Apply the FSDP rule to a parameter pytree -> tree of NamedShardings."""
    fsdp_size = mesh.shape["fsdp"]

    def rule(path, leaf):
        name = "/".join(str(p) for p in path)
        return NamedSharding(mesh, param_sharding_rule(name, leaf.shape, fsdp_size, min_size))

    return jax.tree_util.tree_map_with_path(rule, params)


def shard_batch(batch, mesh: Mesh):
    """Place a host batch onto the mesh, sharded along the batch axis.

    Single process: ``device_put`` of the global batch. Multi-process: each
    host passes only its LOCAL rows (from a ``process_shard``-ed loader, see
    data/loader.py) and the global device array is assembled from the
    per-host slices without any host ever materializing the full batch —
    the reference's per-rank DDP dataloader semantics.
    """
    sh = batch_sharding(mesh)
    if jax.process_count() > 1:
        return jax.tree_util.tree_map(
            lambda x: jax.make_array_from_process_local_data(sh, np.asarray(x)),
            batch,
        )
    return jax.tree_util.tree_map(lambda x: jax.device_put(x, sh), batch)
