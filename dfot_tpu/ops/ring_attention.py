"""Ring (sequence-parallel) attention over a mesh axis.

The TPU-native answer when one attention window outgrows a chip: shard the
token axis over the mesh, keep Q resident, and rotate K/V shards around the
ring with ``jax.lax.ppermute`` while accumulating an online softmax — each
hop overlaps the next shard's transfer (ICI) with the current block's MXU
work, and no device ever holds the full sequence. This is the "sp" axis the
reference cannot express at all (its attention is single-GPU
torch.nn.functional.scaled_dot_product_attention,
reference algorithms/dfot/backbones/dit/dit_blocks.py:120-160); here it
composes with the dp/fsdp/tensor axes of ``parallel/mesh.py``.

Used under ``jax.shard_map`` (or inside ``jit`` with shard_map nesting) with
q/k/v sequence-sharded on ``axis_name``. Forward-only math is plain jnp, so
JAX autodiff (ppermute has a transpose rule) provides the backward — each
hop's recompute stays O(N_local * N_local).

Numerics match dense attention: fp32 logits/softmax accumulation regardless
of input dtype, output cast back to the input dtype.
"""

from __future__ import annotations

import functools
from typing import Optional

import jax
import jax.numpy as jnp

__all__ = ["ring_attention", "sequence_parallel_attention"]


def _block(q, k, v, sm_scale):
    """One (q_local x kv_shard) block: unnormalized PV and softmax stats.

    Returns (acc, row_max, row_sum) in fp32; the caller folds blocks together
    with the standard online-softmax rescale.
    """
    s = jnp.einsum("bhqd,bhkd->bhqk", q, k, preferred_element_type=jnp.float32)
    s = s * sm_scale
    m = jnp.max(s, axis=-1)
    p = jnp.exp(s - m[..., None])
    l = jnp.sum(p, axis=-1)
    acc = jnp.einsum(
        "bhqk,bhkd->bhqd", p.astype(v.dtype), v,
        preferred_element_type=jnp.float32,
    )
    return acc, m, l


def ring_attention(
    q: jax.Array,
    k: jax.Array,
    v: jax.Array,
    axis_name: str,
    sm_scale: Optional[float] = None,
) -> jax.Array:
    """Non-causal attention with q/k/v sequence-sharded on ``axis_name``.

    Layout (B, H, N_local, D) per device, N_global = N_local * ring size.
    Must run inside shard_map (the axis must be a manual mesh axis).
    """
    if sm_scale is None:
        sm_scale = q.shape[-1] ** -0.5
    ring = jax.lax.psum(1, axis_name)

    acc, m, l = _block(q, k, v, sm_scale)
    if ring == 1:
        return (acc / l[..., None]).astype(q.dtype)

    perm = [(i, (i + 1) % ring) for i in range(ring)]

    def hop(carry, _):
        acc, m, l, ck, cv = carry
        # rotate the K/V shard one step around the ring, then fold the new
        # block into the online softmax (rescale both sides to the new max)
        ck = jax.lax.ppermute(ck, axis_name, perm)
        cv = jax.lax.ppermute(cv, axis_name, perm)
        b_acc, b_m, b_l = _block(q, ck, cv, sm_scale)
        new_m = jnp.maximum(m, b_m)
        r_old = jnp.exp(m - new_m)
        r_new = jnp.exp(b_m - new_m)
        acc = acc * r_old[..., None] + b_acc * r_new[..., None]
        l = l * r_old + b_l * r_new
        return (acc, new_m, l, ck, cv), None

    (acc, m, l, _, _), _ = jax.lax.scan(
        hop, (acc, m, l, k, v), None, length=ring - 1
    )
    return (acc / l[..., None]).astype(q.dtype)


def sequence_parallel_attention(
    q: jax.Array,
    k: jax.Array,
    v: jax.Array,
    mesh,
    axis_name: str = "tensor",
    sm_scale: Optional[float] = None,
) -> jax.Array:
    """Convenience wrapper: shard_map `ring_attention` over one mesh axis.

    Takes global (B, H, N, D) arrays, shards N over ``axis_name`` (batch and
    heads replicated along it — they may still be sharded over OTHER mesh
    axes by the surrounding jit), computes the exact global attention, and
    returns the global result. N must divide by the axis size.
    """
    from jax.sharding import PartitionSpec as P

    size = mesh.shape[axis_name]
    if q.shape[-2] % size != 0:
        raise ValueError(
            f"sequence length {q.shape[-2]} not divisible by mesh axis "
            f"{axis_name!r} of size {size}"
        )
    spec = P(None, None, axis_name, None)
    fn = jax.shard_map(
        functools.partial(ring_attention, axis_name=axis_name, sm_scale=sm_scale),
        mesh=mesh,
        in_specs=(spec, spec, spec),
        out_specs=spec,
    )
    return fn(q, k, v)
