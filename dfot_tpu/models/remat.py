"""Rematerialization policies for checkpointed backbone blocks.

The reference's activation checkpointing (torch.utils.checkpoint per
DiT block / UViT level) always recomputes the WHOLE block in the backward.
XLA's ``jax.checkpoint`` accepts a policy choosing which intermediates to
save instead — a TPU-native knob trading HBM for recompute FLOPs at a finer
grain than on/off:

- ``None`` / ``"none"``: recompute everything (reference semantics).
- ``"dots"``: save matmul outputs, recompute only elementwise ops (norms,
  activations) — most of a transformer block's FLOPs are the matmuls, so
  this removes most of the remat FLOP overhead for a modest HBM cost.
  The Pallas flash-attention call is not a dot, so its O(N^2) internals are
  never saved by this policy.
- ``"attn"``: save only tensors tagged ``checkpoint_name(..., "attn_out")``
  (the attention outputs, O(N*D)) so the flash forward kernel is not re-run
  in the backward.
- ``"dots_attn"``: union of the two.
"""

from __future__ import annotations

from typing import Callable, Optional

import jax

__all__ = ["remat_policy", "tag_attn_out"]


def remat_policy(name: Optional[str]) -> Optional[Callable]:
    """Map a policy name to a ``jax.checkpoint`` saveable-policy callable."""
    if name is None or name == "none":
        return None
    cp = jax.checkpoint_policies
    if name == "dots":
        return cp.dots_with_no_batch_dims_saveable
    if name == "attn":
        return cp.save_only_these_names("attn_out")
    if name == "dots_attn":
        return cp.save_from_both_policies(
            cp.dots_with_no_batch_dims_saveable,
            cp.save_only_these_names("attn_out"),
        )
    raise ValueError(
        f"unknown remat_policy {name!r}: want none|dots|attn|dots_attn"
    )


def tag_attn_out(o: jax.Array) -> jax.Array:
    """Mark an attention output as saveable by the "attn" policies."""
    from jax.ad_checkpoint import checkpoint_name

    return checkpoint_name(o, "attn_out")
