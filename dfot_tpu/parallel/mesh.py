"""Device mesh + sharding helpers (jax.sharding / pjit SPMD).

The reference scales with DDP only (torch.distributed/NCCL via Accelerate;
reference: experiments/simple_video_generation.py:155-185). Under XLA SPMD we
get data parallelism *and* FSDP-style parameter sharding from the same
mechanism: lay out a ``Mesh`` over ICI, annotate shardings, and XLA inserts
the collectives (gradient psum for DP; all-gather/reduce-scatter for FSDP).

Axes:
    data   — batch sharding (DP). Gradient all-reduce rides ICI.
    fsdp   — optional parameter/optimizer sharding (ZeRO-3-like). Parameters
             are sharded along their largest divisible axis and gathered
             on-the-fly by XLA where consumed.
    tensor — optional Megatron-style tensor parallelism: the qkv / MLP-in
             projections are column-parallel (output dim sharded) and the
             attention-out / MLP-out projections are row-parallel (input dim
             sharded), so the attention + MLP inner math stays head/channel
             local and XLA inserts one reduce per residual write. Under
             ``jit`` these specs are layout hints, not semantics — results
             match the unsharded program.
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
    "tp_param_sharding_rule",
    "shard_params",
    "shard_batch",
]


def make_mesh(
    shape: Optional[Tuple[int, ...]] = None,
    devices: Optional[Sequence[jax.Device]] = None,
) -> Mesh:
    """Create a (data, fsdp[, tensor]) mesh. shape=None puts all devices on
    data; a 3-tuple adds a tensor-parallel axis."""
    devices = list(devices if devices is not None else jax.devices())
    if shape is None:
        shape = (len(devices), 1)
    if len(shape) not in (2, 3):
        raise ValueError(f"mesh shape must be (data, fsdp[, tensor]): {shape}")
    if int(np.prod(shape)) != len(devices):
        raise ValueError(f"mesh shape {shape} != {len(devices)} devices")
    arr = np.asarray(devices).reshape(shape)
    return Mesh(arr, ("data", "fsdp", "tensor")[: len(shape)])


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


# Megatron-style classification by parameter path suffix. Longer (more
# specific) suffixes first: UViT's axial temporal attention names its QKV
# projection "proj" (models/uvit.py:143) while DiT's "proj" is the attention
# OUTPUT projection (models/dit.py:81) — only the path disambiguates.
# Column-parallel = shard the kernel's OUTPUT dim (+ its bias); the qkv/head
# math downstream then stays tensor-local. Row-parallel = shard the INPUT
# dim; XLA emits one psum over 'tensor' at the residual write.
_TP_COLUMN_SUFFIXES = (
    "temporal_attn/proj/kernel",  # UViT axial QKV
    "qkv/kernel",
    "fused_proj/kernel",          # UViT fused qkv+mlp-in
    "fc1/kernel",                 # Mlp in (dit/far/dit1d)
)
_TP_ROW_SUFFIXES = (
    "temporal_attn/out/kernel",
    "attn/proj/kernel",           # DiT attention out
    "attn_out/kernel",
    "mlp_out/kernel",
    "fc2/kernel",
    "out/kernel",                 # UViT spatial-attn out
    "proj/kernel",                # dit1d attention out (generic fallback)
)


# IO projections whose "proj" is a patch/channel embed, not an attention out
_TP_EXCLUDE_MARKERS = ("patch_embed", "pose_embed", "final_layer", "x_embedder")


def tp_param_sharding_rule(path: str, shape: Tuple[int, ...], tp_size: int):
    """Tensor-parallel spec for one parameter, or None if TP doesn't apply."""
    if tp_size <= 1 or not shape:
        return None
    if any(m in path for m in _TP_EXCLUDE_MARKERS):
        return None
    for suf in _TP_COLUMN_SUFFIXES:
        if path.endswith(suf):
            if shape[-1] % tp_size == 0:
                return P(*([None] * (len(shape) - 1) + ["tensor"]))
            return None
    if path.endswith("bias"):
        # biases of column-parallel layers shard with their kernel's output
        kernel_path = path[: -len("bias")] + "kernel"
        for suf in _TP_COLUMN_SUFFIXES:
            if kernel_path.endswith(suf) and shape[-1] % tp_size == 0:
                return P(*([None] * (len(shape) - 1) + ["tensor"]))
        return None
    for suf in _TP_ROW_SUFFIXES:
        if path.endswith(suf):
            if len(shape) >= 2 and shape[0] % tp_size == 0:
                return P(*(["tensor"] + [None] * (len(shape) - 1)))
            return None
    return None


def shard_params(params, mesh: Mesh, min_size: int = 2**16):
    """Parameter pytree -> tree of NamedShardings.

    FSDP rule over the 'fsdp' axis; when the mesh has a 'tensor' axis,
    attention/MLP projections get Megatron column/row specs first and the
    FSDP shard fills the kernel's other axis where divisible.
    """
    fsdp_size = mesh.shape["fsdp"]
    tp_size = mesh.shape.get("tensor", 1)

    def rule(path, leaf):
        name = "/".join(str(getattr(p, "key", p)) for p in path)
        tp_spec = tp_param_sharding_rule(name, leaf.shape, tp_size)
        if tp_spec is not None:
            spec = list(tp_spec)
            if fsdp_size > 1 and int(np.prod(leaf.shape)) >= min_size:
                for ax in sorted(range(len(spec)), key=lambda i: -leaf.shape[i]):
                    if spec[ax] is None and leaf.shape[ax] % fsdp_size == 0:
                        spec[ax] = "fsdp"
                        break
            return NamedSharding(mesh, P(*spec))
        return NamedSharding(
            mesh, param_sharding_rule(name, leaf.shape, fsdp_size, min_size)
        )

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
