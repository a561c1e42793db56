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
q/k/v sequence-sharded on ``axis_name``. Each hop computes its block with
the Pallas flash kernel when the local shapes tile (O(N_local) memory, MXU
dots), else a dense fp32-softmax block; blocks fold in (o, lse) space, so
autodiff (ppermute has a transpose rule) provides the backward with
O(N_local^2)-per-hop recompute.

Numerics match dense attention: fp32 softmax stats and fold regardless of
input dtype, output cast back to the input dtype.
"""

from __future__ import annotations

import functools
from typing import Optional

import jax
import jax.numpy as jnp

__all__ = ["ring_attention", "sequence_parallel_attention"]


def _block_dense(q, k, v, sm_scale):
    """One (q_local x kv_shard) block -> (o fp32 normalized, lse fp32)."""
    s = jnp.einsum("bhqd,bhkd->bhqk", q, k, preferred_element_type=jnp.float32)
    s = s * sm_scale
    m = jnp.max(s, axis=-1)
    p = jnp.exp(s - m[..., None])
    l = jnp.sum(p, axis=-1)
    acc = jnp.einsum(
        "bhqk,bhkd->bhqd", p.astype(v.dtype), v,
        preferred_element_type=jnp.float32,
    )
    return acc / l[..., None], m + jnp.log(l)


def _block_flash(q, k, v, sm_scale, interpret):
    """Flash-kernel block: O(N_local) memory, MXU dots, scaled-units lse."""
    from .attention import _flash_forward, _pick_blocks

    bq, bk = _pick_blocks(q.shape[-2])
    o, lse = _flash_forward(
        q, k, v, False, bq, bk, interpret, return_lse=True, sm_scale=sm_scale
    )
    return o.astype(jnp.float32), lse[..., 0].astype(jnp.float32)


def ring_attention(
    q: jax.Array,
    k: jax.Array,
    v: jax.Array,
    axis_name: str,
    sm_scale: Optional[float] = None,
    use_flash: Optional[bool] = None,
    interpret: bool = False,
) -> jax.Array:
    """Non-causal attention with q/k/v sequence-sharded on ``axis_name``.

    Layout (B, H, N_local, D) per device, N_global = N_local * ring size.
    Must run inside shard_map (the axis must be a manual mesh axis).
    ``use_flash=None`` picks the Pallas block on TPU when the local shapes
    tile; ``interpret=True`` forces the flash block in Pallas interpret mode
    (CPU tests).
    """
    if sm_scale is None:
        sm_scale = q.shape[-1] ** -0.5
    if use_flash is None:
        from .attention import _blocks_ok

        use_flash = interpret or (
            jax.default_backend() == "tpu"
            and _blocks_ok(q.shape[-2], q.shape[-1])
        )
    block = (
        functools.partial(_block_flash, interpret=interpret)
        if use_flash
        else _block_dense
    )

    ring = jax.lax.psum(1, axis_name)
    o, lse = block(q, k, v, sm_scale)
    if ring == 1:
        return o.astype(q.dtype)

    perm = [(i, (i + 1) % ring) for i in range(ring)]

    def hop(carry, _):
        o, lse, ck, cv = carry
        # rotate the K/V shard one step around the ring, then fold the new
        # block in (o, lse) space
        ck = jax.lax.ppermute(ck, axis_name, perm)
        cv = jax.lax.ppermute(cv, axis_name, perm)
        b_o, b_lse = block(q, ck, cv, sm_scale)
        new_lse = jnp.logaddexp(lse, b_lse)
        o = (
            o * jnp.exp(lse - new_lse)[..., None]
            + b_o * jnp.exp(b_lse - new_lse)[..., None]
        )
        return (o, new_lse, ck, cv), None

    (o, lse, _, _), _ = jax.lax.scan(hop, (o, lse, k, v), None, length=ring - 1)
    return o.astype(q.dtype)


def sequence_parallel_attention(
    q: jax.Array,
    k: jax.Array,
    v: jax.Array,
    mesh,
    axis_name: str = "tensor",
    sm_scale: Optional[float] = None,
    use_flash: Optional[bool] = None,
    interpret: bool = False,
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
        functools.partial(
            ring_attention, axis_name=axis_name, sm_scale=sm_scale,
            use_flash=use_flash, interpret=interpret,
        ),
        mesh=mesh,
        in_specs=(spec, spec, spec),
        out_specs=spec,
        # pallas_call out_shapes carry no vma annotations; the specs above
        # are uniform so the replication check adds nothing here
        check_vma=False,
    )
    return fn(q, k, v)
