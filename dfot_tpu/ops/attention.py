"""Attention ops: Pallas flash-attention (TPU) with an XLA fallback.

The denoiser's hot loop is attention over N = T * H * W / p**2 tokens
(e.g. 8 x 32 x 32 = 8192 for 64px latents at patch 2). The reference uses a
naive O(N^2)-memory SDPA that also materializes attention weights for its
hook system (reference: dit_blocks.py:21-44). Here:

- ``flash_attention``: a Pallas TPU kernel, online-softmax tiling, O(N)
  memory, fp32 accumulation, bf16-friendly. Forward-only custom_vjp whose
  backward recomputes through the XLA path (sampling = forward only; training
  gets a correct, fused XLA backward).
- ``attention``: dispatcher — Pallas on TPU for aligned shapes, XLA's fused
  ``jax.nn.dot_product_attention`` otherwise (also used under
  ``interpret=True`` tests on CPU).
- ``attention_with_weights``: debug path returning the full weight tensor for
  the attention-statistics capture system (parity with the reference's
  attn-map hooks).
"""

from __future__ import annotations

import functools
import math
from typing import Optional

import jax
import jax.numpy as jnp
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu

__all__ = [
    "attention",
    "flash_attention",
    "attention_with_weights",
    "set_attention_capture",
    "attention_capture_enabled",
]

# debug switch: when on, attention modules take the weights-returning path and
# sow the maps into flax 'intermediates' (see utils/attn_capture.py). Changing
# it invalidates jit caches — debug only, like the reference's naive-SDPA
# hook path (dit_blocks.py:21-44).
_CAPTURE_ATTENTION = False


def set_attention_capture(enabled: bool) -> None:
    global _CAPTURE_ATTENTION
    _CAPTURE_ATTENTION = bool(enabled)


def attention_capture_enabled() -> bool:
    return _CAPTURE_ATTENTION

_NEG_INF = -1e30


def _flash_kernel(
    q_ref, k_ref, v_ref, o_ref, *, block_k: int, seq_len: int, causal: bool, sm_scale: float
):
    """One (batch*head, q-block) program: stream K/V blocks with online softmax.

    Refs are (1, BLK_Q, D) for q/o and (1, N, D) for k/v (kept whole in VMEM:
    the windows here are a few thousand tokens * 64-128 dims = well under the
    ~16MB VMEM budget; block streaming still bounds the score matrix).
    """
    q = q_ref[0].astype(jnp.float32) * sm_scale
    blk_q, d = q.shape
    num_kb = seq_len // block_k
    q_block_start = pl.program_id(1) * blk_q

    def body(i, carry):
        acc, m_i, l_i = carry
        k = k_ref[0, pl.ds(i * block_k, block_k), :].astype(jnp.float32)
        v = v_ref[0, pl.ds(i * block_k, block_k), :].astype(jnp.float32)
        s = jax.lax.dot_general(
            q, k, (((1,), (1,)), ((), ())), preferred_element_type=jnp.float32
        )  # (blk_q, block_k)
        if causal:
            q_pos = q_block_start + jax.lax.broadcasted_iota(
                jnp.int32, (blk_q, block_k), 0
            )
            k_pos = i * block_k + jax.lax.broadcasted_iota(
                jnp.int32, (blk_q, block_k), 1
            )
            s = jnp.where(q_pos >= k_pos, s, _NEG_INF)
        m_new = jnp.maximum(m_i, jnp.max(s, axis=-1))
        alpha = jnp.exp(m_i - m_new)
        p = jnp.exp(s - m_new[:, None])
        l_new = l_i * alpha + jnp.sum(p, axis=-1)
        acc = acc * alpha[:, None] + jax.lax.dot_general(
            p, v, (((1,), (0,)), ((), ())), preferred_element_type=jnp.float32
        )
        return acc, m_new, l_new

    acc0 = jnp.zeros((blk_q, d), jnp.float32)
    m0 = jnp.full((blk_q,), _NEG_INF, jnp.float32)
    l0 = jnp.zeros((blk_q,), jnp.float32)
    acc, _, l_i = jax.lax.fori_loop(0, num_kb, body, (acc0, m0, l0))
    o_ref[0] = (acc / l_i[:, None]).astype(o_ref.dtype)


def _flash_forward(
    q: jax.Array,
    k: jax.Array,
    v: jax.Array,
    causal: bool,
    block_q: int,
    block_k: int,
    interpret: bool,
) -> jax.Array:
    """q, k, v: (B, H, N, D) -> (B, H, N, D)."""
    b, h, n, d = q.shape
    sm_scale = 1.0 / math.sqrt(d)
    block_q = min(block_q, n)
    block_k = min(block_k, n)
    assert n % block_q == 0 and n % block_k == 0, "pad sequence to block multiple"

    qf = q.reshape(b * h, n, d)
    kf = k.reshape(b * h, n, d)
    vf = v.reshape(b * h, n, d)

    kernel = functools.partial(
        _flash_kernel, block_k=block_k, seq_len=n, causal=causal, sm_scale=sm_scale
    )
    out = pl.pallas_call(
        kernel,
        out_shape=jax.ShapeDtypeStruct((b * h, n, d), q.dtype),
        grid=(b * h, n // block_q),
        in_specs=[
            pl.BlockSpec((1, block_q, d), lambda i, j: (i, j, 0), memory_space=pltpu.VMEM),
            pl.BlockSpec((1, n, d), lambda i, j: (i, 0, 0), memory_space=pltpu.VMEM),
            pl.BlockSpec((1, n, d), lambda i, j: (i, 0, 0), memory_space=pltpu.VMEM),
        ],
        out_specs=pl.BlockSpec(
            (1, block_q, d), lambda i, j: (i, j, 0), memory_space=pltpu.VMEM
        ),
        interpret=interpret,
    )(qf, kf, vf)
    return out.reshape(b, h, n, d)


def _xla_attention(q, k, v, causal):
    """Fused XLA attention; fp32 softmax accumulation."""
    return jax.nn.dot_product_attention(
        # jax.nn API expects (B, N, H, D)
        q.swapaxes(1, 2),
        k.swapaxes(1, 2),
        v.swapaxes(1, 2),
        is_causal=causal,
    ).swapaxes(1, 2)


@functools.partial(jax.custom_vjp, nondiff_argnums=(3, 4, 5, 6))
def flash_attention(
    q: jax.Array,
    k: jax.Array,
    v: jax.Array,
    causal: bool = False,
    block_q: int = 256,
    block_k: int = 256,
    interpret: bool = False,
) -> jax.Array:
    """Pallas flash attention, (B, H, N, D) layout.

    Backward pass differentiates through the XLA attention (identical math);
    the Pallas kernel accelerates the forward/sampling path.
    """
    return _flash_forward(q, k, v, causal, block_q, block_k, interpret)


def _flash_fwd(q, k, v, causal, block_q, block_k, interpret):
    return _flash_forward(q, k, v, causal, block_q, block_k, interpret), (q, k, v)


def _flash_bwd(causal, block_q, block_k, interpret, res, g):
    q, k, v = res
    _, vjp = jax.vjp(lambda q, k, v: _xla_attention(q, k, v, causal), q, k, v)
    return vjp(g)


flash_attention.defvjp(_flash_fwd, _flash_bwd)


def _pick_block(n: int) -> int:
    """Largest power-of-two block <= 1024 dividing n (1024 measured fastest
    on v5e for the DFoT window shapes; smaller blocks add loop overhead)."""
    for b in (1024, 512, 256, 128):
        if n % b == 0:
            return b
    return 0


def _blocks_ok(n: int, d: int) -> bool:
    # head dim must be a multiple of the 64-wide sublane packing; sequence
    # must split into aligned blocks
    return d % 64 == 0 and _pick_block(n) >= 128 and n >= 256


def attention(
    q: jax.Array,
    k: jax.Array,
    v: jax.Array,
    causal: bool = False,
    force_pallas: Optional[bool] = None,
) -> jax.Array:
    """Attention dispatcher, (B, H, N, D) layout.

    Uses the Pallas kernel on TPU when shapes are tile-aligned, otherwise the
    fused XLA path (which is also what CPU tests exercise).
    """
    n, d = q.shape[-2], q.shape[-1]
    use_pallas = (
        force_pallas
        if force_pallas is not None
        else jax.default_backend() == "tpu" and _blocks_ok(n, d)
    )
    if use_pallas:
        b = _pick_block(n)
        return flash_attention(q, k, v, causal, b, b)
    return _xla_attention(q, k, v, causal)


def attention_with_weights(q, k, v, causal: bool = False):
    """Naive attention that also returns the (B, H, N, N) weight tensor.

    Debug/introspection only — feeds the attention-statistics capture
    (reference keeps a naive SDPA for its attn-map hooks, dit_blocks.py:21-44).
    """
    d = q.shape[-1]
    s = jnp.einsum("bhnd,bhmd->bhnm", q, k).astype(jnp.float32) / math.sqrt(d)
    if causal:
        n, m = s.shape[-2:]
        mask = jnp.tril(jnp.ones((n, m), bool))
        s = jnp.where(mask, s, _NEG_INF)
    w = jax.nn.softmax(s, axis=-1)
    return jnp.einsum("bhnm,bhmd->bhnd", w.astype(q.dtype), v), w
