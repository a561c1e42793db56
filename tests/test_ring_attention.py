"""Sequence-parallel (ring) attention vs the dense path, incl. gradients."""

import jax
import jax.numpy as jnp
import numpy as np
import pytest

from dfot_tpu.ops.attention import _xla_attention
from dfot_tpu.ops.ring_attention import sequence_parallel_attention
from dfot_tpu.parallel import make_mesh


@pytest.fixture()
def qkv():
    rng = np.random.RandomState(0)
    shp = (2, 3, 32, 8)  # (B, H, N, D), N divisible by 4-device ring
    return tuple(jnp.asarray(rng.randn(*shp).astype(np.float32)) for _ in range(3))


def test_ring_attention_matches_dense(cpu_mesh_devices, qkv):
    q, k, v = qkv
    mesh = make_mesh((2, 1, 4))  # ring over the 'tensor' axis
    ref = _xla_attention(q, k, v, causal=False)
    out = sequence_parallel_attention(q, k, v, mesh, axis_name="tensor")
    np.testing.assert_allclose(np.asarray(out), np.asarray(ref), rtol=2e-5, atol=2e-6)


def test_ring_attention_matches_dense_over_data_axis(cpu_mesh_devices, qkv):
    q, k, v = qkv
    mesh = make_mesh((8, 1))
    ref = _xla_attention(q, k, v, causal=False)
    out = sequence_parallel_attention(q, k, v, mesh, axis_name="data")
    np.testing.assert_allclose(np.asarray(out), np.asarray(ref), rtol=2e-5, atol=2e-6)


def test_ring_attention_grads_match_dense(cpu_mesh_devices, qkv):
    q, k, v = qkv
    mesh = make_mesh((2, 1, 4))

    def loss_ring(q, k, v):
        o = sequence_parallel_attention(q, k, v, mesh, axis_name="tensor")
        return jnp.sum(jnp.sin(o))

    def loss_dense(q, k, v):
        return jnp.sum(jnp.sin(_xla_attention(q, k, v, causal=False)))

    g_ring = jax.grad(loss_ring, argnums=(0, 1, 2))(q, k, v)
    g_dense = jax.grad(loss_dense, argnums=(0, 1, 2))(q, k, v)
    for a, b in zip(g_ring, g_dense):
        np.testing.assert_allclose(np.asarray(a), np.asarray(b), rtol=1e-4, atol=1e-5)


def test_ring_attention_rejects_indivisible(cpu_mesh_devices, qkv):
    q, k, v = qkv
    mesh = make_mesh((2, 1, 4))
    with pytest.raises(ValueError, match="not divisible"):
        sequence_parallel_attention(q[:, :, :30], k[:, :, :30], v[:, :, :30],
                                    mesh, axis_name="tensor")


def test_ring_attention_bf16_inputs(cpu_mesh_devices):
    rng = np.random.RandomState(1)
    q, k, v = (jnp.asarray(rng.randn(1, 2, 16, 8).astype(np.float32), jnp.bfloat16)
               for _ in range(3))
    mesh = make_mesh((2, 1, 4))
    out = sequence_parallel_attention(q, k, v, mesh, axis_name="tensor")
    ref = _xla_attention(q.astype(jnp.float32), k.astype(jnp.float32),
                         v.astype(jnp.float32), causal=False)
    assert out.dtype == jnp.bfloat16
    np.testing.assert_allclose(np.asarray(out, np.float32), np.asarray(ref),
                               rtol=2e-2, atol=2e-2)


def test_attention_dispatcher_routes_through_sequence_parallel(cpu_mesh_devices):
    """set_sequence_parallel: eligible non-causal calls ring-route and still
    match dense; causal and too-small calls do not route."""
    import dfot_tpu.ops.ring_attention as ra
    from dfot_tpu.ops import attention as att_mod

    rng = np.random.RandomState(2)
    q, k, v = (jnp.asarray(rng.randn(1, 2, 1024, 8).astype(np.float32))
               for _ in range(3))
    ref = _xla_attention(q, k, v, causal=False)

    calls = []
    orig = ra.sequence_parallel_attention

    def spy(*a, **kw):
        calls.append(kw.get("axis_name"))
        return orig(*a, **kw)

    mesh = make_mesh((2, 1, 4))
    att_mod.set_sequence_parallel(mesh, "tensor")
    try:
        ra.sequence_parallel_attention = spy
        out = att_mod.attention(q, k, v, causal=False)
        assert calls == ["tensor"]
        np.testing.assert_allclose(np.asarray(out), np.asarray(ref),
                                   rtol=2e-5, atol=2e-6)
        # causal: not routed
        att_mod.attention(q[:, :, :256], k[:, :, :256], v[:, :, :256], causal=True)
        # too small per-device Q block: not routed
        att_mod.attention(q[:, :, :256], k[:, :, :256], v[:, :, :256])
        assert calls == ["tensor"]
    finally:
        ra.sequence_parallel_attention = orig
        att_mod.set_sequence_parallel(None)
    # disabled again: plain path
    out2 = att_mod.attention(q, k, v)
    np.testing.assert_allclose(np.asarray(out2), np.asarray(ref),
                               rtol=2e-5, atol=2e-6)


def test_set_sequence_parallel_rejects_unknown_axis(cpu_mesh_devices):
    from dfot_tpu.ops import attention as att_mod

    mesh = make_mesh((8, 1))
    with pytest.raises(ValueError, match="no axis"):
        att_mod.set_sequence_parallel(mesh, "tensor")
    att_mod.set_sequence_parallel(None)


def test_ring_attention_flash_block_interpret_matches_dense(cpu_mesh_devices):
    """Per-hop Pallas flash block (interpret mode) under shard_map matches
    dense attention — the TPU execution path of the ring."""
    rng = np.random.RandomState(3)
    # local shard 256 tokens => flash block shapes tile (256x256)
    q, k, v = (jnp.asarray(rng.randn(1, 2, 1024, 64).astype(np.float32))
               for _ in range(3))
    mesh = make_mesh((2, 1, 4))
    ref = _xla_attention(q, k, v, causal=False)
    out = sequence_parallel_attention(
        q, k, v, mesh, axis_name="tensor", use_flash=True, interpret=True
    )
    np.testing.assert_allclose(np.asarray(out), np.asarray(ref),
                               rtol=2e-5, atol=2e-5)
