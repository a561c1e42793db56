"""Fused LN+modulate kernel (ops/ln_modulate.py) vs the flax chain."""

import numpy as np
import pytest
import jax
import jax.numpy as jnp
import flax.linen as nn

from dfot_tpu.ops.ln_modulate import force_ln_interpret, ln_modulate


def _chain(x, shift, scale):
    ln = nn.LayerNorm(use_bias=False, use_scale=False, epsilon=1e-6,
                      dtype=x.dtype)
    y = ln.apply({}, x)
    return y * (1 + scale) + shift


@pytest.fixture(autouse=True)
def _interpret():
    force_ln_interpret(True)
    yield
    force_ln_interpret(False)


def test_forward_matches_flax_chain():
    rng = np.random.default_rng(0)
    B, N, C = 2, 256, 128
    x, sh, sc = (jnp.asarray(rng.standard_normal((B, N, C)), jnp.float32)
                 for _ in range(3))
    got = ln_modulate(x, sh, sc)
    want = _chain(x, sh, sc)
    np.testing.assert_allclose(np.asarray(got), np.asarray(want),
                               atol=1e-5, rtol=1e-5)


def test_grads_match_flax_chain():
    rng = np.random.default_rng(1)
    B, N, C = 1, 128, 128
    x, sh, sc = (jnp.asarray(rng.standard_normal((B, N, C)), jnp.float32)
                 for _ in range(3))
    w = jnp.asarray(rng.standard_normal((B, N, C)), jnp.float32)
    gk = jax.grad(lambda *a: (ln_modulate(*a) * w).sum(), (0, 1, 2))(x, sh, sc)
    gr = jax.grad(lambda *a: (_chain(*a) * w).sum(), (0, 1, 2))(x, sh, sc)
    for a, b in zip(gk, gr):
        np.testing.assert_allclose(np.asarray(a), np.asarray(b),
                                   atol=2e-5, rtol=1e-4)


def test_dit_block_fused_matches_fallback():
    from dfot_tpu.models.dit import DiTBlock
    from dfot_tpu.ops.ln_modulate import force_ln_interpret as force

    rng = np.random.default_rng(2)
    dim, N, B = 128, 256, 1
    blk = DiTBlock(dim=dim, num_heads=2, dtype=jnp.float32)
    x = jnp.asarray(rng.standard_normal((B, N, dim)), jnp.float32)
    c = jnp.asarray(rng.standard_normal((B, N, dim)), jnp.float32)
    params = blk.init(jax.random.PRNGKey(0), x, c)
    params = jax.tree_util.tree_map(
        lambda p: p + 0.1 * np.float32(rng.standard_normal()), params
    )
    fused = blk.apply(params, x, c)
    force(False)
    base = blk.apply(params, x, c)
    force(True)
    np.testing.assert_allclose(np.asarray(fused), np.asarray(base),
                               atol=1e-4, rtol=1e-3)
