"""Fused qkv-prep kernel (ops/qkv_prep.py): parity vs the unfused chain.

The kernel replaces reshape/moveaxis/RMSNorm/RoPE/lane-pad between the
packed qkv projection and the flash kernel (reference runs these as
separate torch ops: dit_blocks.py qkv split + rotary apply,
u_vit_blocks.py:203-289 qk-norm). All tests run the Pallas kernel in
interpret mode on CPU against the pure-jnp mirror / the model's fallback
branch.
"""

import numpy as np
import pytest
import jax
import jax.numpy as jnp

from dfot_tpu.ops.qkv_prep import (
    attention_from_packed_qkv,
    force_fused_interpret,
    qkv_prep,
    reference_qkv_prep,
    signed_sin,
    swap_pairs,
)
from dfot_tpu.models.embeddings import RoPE, apply_rope, make_rope_2d


def _tables(rng, n, d):
    ang = rng.standard_normal((n, d // 2))
    cos = np.repeat(np.cos(ang), 2, axis=1)
    sin = np.repeat(np.sin(ang), 2, axis=1)
    return cos, sin


@pytest.mark.parametrize("d,d_out", [(72, 128), (64, 64)])
@pytest.mark.parametrize("norm,scaled", [(False, False), (True, False), (True, True)])
def test_prep_forward_matches_reference(d, d_out, norm, scaled):
    rng = np.random.default_rng(0)
    B, N, H = 2, 256, 3
    qkv = jnp.asarray(rng.standard_normal((B, N, 3 * H * d)), jnp.float32)
    cos, sin = _tables(rng, N, d)
    cj = jnp.asarray(cos, jnp.float32)
    sj = jnp.asarray(signed_sin(sin), jnp.float32)
    qs = jnp.asarray(rng.standard_normal(d), jnp.float32) if scaled else None
    ks = jnp.asarray(rng.standard_normal(d), jnp.float32) if scaled else None
    kw = dict(q_scale=qs, k_scale=ks, norm=norm, d_out=d_out)
    out = qkv_prep(qkv, H, d, cj, sj, interpret=True, **kw)
    ref = reference_qkv_prep(qkv, H, d, cj, sj, **kw)
    for a, b in zip(out, ref):
        assert a.shape == (B, H, N, d_out)
        np.testing.assert_allclose(np.asarray(a), np.asarray(b), atol=1e-6)


def test_signed_sin_reproduces_rotate_half():
    """x*cos + swap(x)*signed_sin == apply_rope (the fold identity)."""
    rng = np.random.default_rng(1)
    N, d = 64, 16
    rope = make_rope_2d(d, (8, 8))
    x = jnp.asarray(rng.standard_normal((1, 1, N, d)), jnp.float32)
    want = apply_rope(x, rope)
    cos = jnp.asarray(rope.cos[:N], jnp.float32)
    ssin = jnp.asarray(signed_sin(rope.sin[:N]), jnp.float32)
    got = x * cos + swap_pairs(x) * ssin
    np.testing.assert_allclose(np.asarray(got), np.asarray(want), atol=1e-6)


@pytest.mark.parametrize("norm,scaled", [(False, False), (True, True)])
def test_prep_grads_match_reference(norm, scaled):
    rng = np.random.default_rng(2)
    B, N, H, d = 1, 128, 2, 72
    qkv = jnp.asarray(rng.standard_normal((B, N, 3 * H * d)), jnp.float32)
    cos, sin = _tables(rng, N, d)
    cj = jnp.asarray(cos, jnp.float32)
    sj = jnp.asarray(signed_sin(sin), jnp.float32)
    qs = jnp.asarray(rng.standard_normal(d), jnp.float32) if scaled else None
    ks = jnp.asarray(rng.standard_normal(d), jnp.float32) if scaled else None
    w = jnp.asarray(rng.standard_normal((B, H, N, 128)), jnp.float32)

    def mk(fn):
        def loss(qkv_, qs_, ks_):
            o = fn(qkv_, H, d, cj, sj, q_scale=qs_, k_scale=ks_,
                   norm=norm, d_out=128)
            return sum((a * w).sum() for a in o)
        return loss

    kernel = mk(lambda *a, **k: qkv_prep(*a, interpret=True, **k))
    oracle = mk(reference_qkv_prep)
    argnums = (0, 1, 2) if scaled else (0,)
    gk = jax.grad(kernel, argnums)(qkv, qs, ks)
    gr = jax.grad(oracle, argnums)(qkv, qs, ks)
    for a, b in zip(gk, gr):
        scale = np.abs(np.asarray(b)).max() + 1e-9
        np.testing.assert_allclose(
            np.asarray(a) / scale, np.asarray(b) / scale, atol=1e-5
        )


@pytest.mark.parametrize("norm,aug_v,d,dp", [
    (True, False, 72, 128),   # padded heads (UViT q/k-norm path)
    (True, True, 64, 64),     # flagship: unpadded + flash ones-lane
    (False, False, 64, 64),
])
def test_bwd_jax_matches_kernel_bwd(norm, aug_v, d, dp):
    """The pure-JAX VJP fallback (used when no bwd block fits scoped VMEM —
    the r5 flagship-train OOM) must equal the Pallas bwd kernel."""
    from dfot_tpu.ops.qkv_prep import _Spec, _bwd_jax, _qkv_prep_bwd

    rng = np.random.default_rng(7)
    B, N, H = 2, 256, 3
    dv_lanes = dp + 1 if aug_v else dp
    qkv = jnp.asarray(rng.standard_normal((B, N, 3 * H * d)), jnp.float32)
    cos, sin = _tables(rng, N, d)
    cq = jnp.asarray(cos * rng.standard_normal(d), jnp.float32)
    sq = jnp.asarray(signed_sin(sin) * rng.standard_normal(d), jnp.float32)
    ck = jnp.asarray(cos, jnp.float32)
    sk = jnp.asarray(signed_sin(sin), jnp.float32)
    dq = jnp.asarray(rng.standard_normal((B, H, N, dp)), jnp.float32)
    dk = jnp.asarray(rng.standard_normal((B, H, N, dp)), jnp.float32)
    dv = jnp.asarray(rng.standard_normal((B, H, N, dv_lanes)), jnp.float32)
    res, g = (qkv, cq, sq, ck, sk), (dq, dk, dv)
    spec = _Spec(H, d, dp, norm, 1e-6, True, 128, True, aug_v,
                 block_n_bwd=128)
    out_kernel = _qkv_prep_bwd(spec, res, g)   # interpret-mode Pallas bwd
    out_jax = _bwd_jax(spec, res, g)
    for a, b in zip(out_kernel, out_jax):
        scale = np.abs(np.asarray(a)).max() + 1e-9
        np.testing.assert_allclose(
            np.asarray(b) / scale, np.asarray(a) / scale, atol=1e-5
        )


def test_model_fused_branch_matches_fallback():
    """UViT ParallelBlock: fused kernel branch vs the reference chain."""
    from dfot_tpu.models.uvit import TransformerBlock

    rng = np.random.default_rng(3)
    dim, heads, N, B = 64, 2, 256, 1
    rope = make_rope_2d(dim // heads, (16, 16))
    blk = TransformerBlock(dim=dim, heads=heads, rope=rope, dtype=jnp.float32)
    x = jnp.asarray(rng.standard_normal((B, N, dim)), jnp.float32)
    emb = jnp.asarray(rng.standard_normal((B, N, dim)), jnp.float32)
    params = blk.init(jax.random.PRNGKey(0), x, emb)
    # make the q/k norm scales non-trivial so the fold is exercised
    params = jax.tree_util.tree_map(
        lambda p: p + 0.1 * np.float32(rng.standard_normal()), params
    )
    base = blk.apply(params, x, emb)
    force_fused_interpret(True)
    try:
        fused = blk.apply(params, x, emb)
    finally:
        force_fused_interpret(False)
    np.testing.assert_allclose(
        np.asarray(fused), np.asarray(base), atol=2e-5, rtol=1e-4
    )


def test_dit_attention_fused_branch_matches_fallback():
    from dfot_tpu.models.dit import Attention

    rng = np.random.default_rng(4)
    dim, heads, N, B = 64, 2, 256, 2
    rope = make_rope_2d(dim // heads, (16, 16))
    attn = Attention(dim=dim, num_heads=heads, rope=rope, dtype=jnp.float32)
    x = jnp.asarray(rng.standard_normal((B, N, dim)), jnp.float32)
    params = attn.init(jax.random.PRNGKey(0), x)
    base = attn.apply(params, x)
    force_fused_interpret(True)
    try:
        fused = attn.apply(params, x)
    finally:
        force_fused_interpret(False)
    np.testing.assert_allclose(
        np.asarray(fused), np.asarray(base), atol=2e-5, rtol=1e-4
    )


@pytest.mark.parametrize("d,dp", [(72, 128), (64, 64)])
def test_attn_out_collect_matches_slice_moveaxis(d, dp):
    from dfot_tpu.ops.qkv_prep import attn_out_collect

    rng = np.random.default_rng(5)
    B, H, N = 2, 3, 256
    o = jnp.asarray(rng.standard_normal((B, H, N, dp)), jnp.float32)
    got = attn_out_collect(o, d, interpret=True)
    want = jnp.moveaxis(o[..., :d], 1, 2).reshape(B, N, H * d)
    np.testing.assert_allclose(np.asarray(got), np.asarray(want), atol=0)

    w = jnp.asarray(rng.standard_normal((B, N, H * d)), jnp.float32)
    g_got = jax.grad(lambda x: (attn_out_collect(x, d, interpret=True) * w).sum())(o)
    g_want = jax.grad(
        lambda x: (jnp.moveaxis(x[..., :d], 1, 2).reshape(B, N, H * d) * w).sum()
    )(o)
    np.testing.assert_allclose(np.asarray(g_got), np.asarray(g_want), atol=0)


def test_eligibility_is_off_on_cpu():
    from dfot_tpu.ops.qkv_prep import fused_qkv_eligible

    if jax.default_backend() != "tpu":
        assert not fused_qkv_eligible(8192, 64, 9)


def test_prep_aug_v_ones_lane():
    """aug_v appends the flash normalizer ones lane to v in-kernel."""
    rng = np.random.default_rng(6)
    B, N, H, d = 2, 256, 3, 64
    qkv = jnp.asarray(rng.standard_normal((B, N, 3 * H * d)), jnp.float32)
    cos, sin = _tables(rng, N, d)
    cj = jnp.asarray(cos, jnp.float32)
    sj = jnp.asarray(signed_sin(sin), jnp.float32)
    out = qkv_prep(qkv, H, d, cj, sj, norm=True, aug_v=True, interpret=True)
    ref = reference_qkv_prep(qkv, H, d, cj, sj, norm=True, aug_v=True)
    assert out[2].shape == (B, H, N, d + 1)
    np.testing.assert_allclose(np.asarray(out[2][..., -1]), 1.0)
    for a, b in zip(out, ref):
        np.testing.assert_allclose(np.asarray(a), np.asarray(b), atol=1e-6)


def test_flash_accepts_pre_augmented_v():
    """flash_attention with qkv_prep's pre-aug v == plain v, fwd and grads."""
    from dfot_tpu.ops.attention import flash_attention

    rng = np.random.default_rng(7)
    B, H, N, d = 1, 2, 256, 64
    q = jnp.asarray(rng.standard_normal((B, H, N, d)), jnp.float32)
    k = jnp.asarray(rng.standard_normal((B, H, N, d)), jnp.float32)
    v = jnp.asarray(rng.standard_normal((B, H, N, d)), jnp.float32)
    va = jnp.pad(v, [(0, 0)] * 3 + [(0, 1)], constant_values=1.0)
    w = jnp.asarray(rng.standard_normal((B, H, N, d)), jnp.float32)

    def loss_plain(q_, k_, v_):
        return (flash_attention(q_, k_, v_, False, 128, 128, True) * w).sum()

    def loss_aug(q_, k_, v_):
        vv = jnp.pad(v_, [(0, 0)] * 3 + [(0, 1)], constant_values=1.0)
        return (flash_attention(q_, k_, vv, False, 128, 128, True) * w).sum()

    out_plain = flash_attention(q, k, v, False, 128, 128, True)
    out_aug = flash_attention(q, k, va, False, 128, 128, True)
    np.testing.assert_allclose(
        np.asarray(out_aug), np.asarray(out_plain), atol=1e-6
    )
    gp = jax.grad(loss_plain, (0, 1, 2))(q, k, v)
    ga = jax.grad(loss_aug, (0, 1, 2))(q, k, v)
    for a, b in zip(ga, gp):
        np.testing.assert_allclose(np.asarray(a), np.asarray(b), atol=1e-5)


def test_packed_attention_d64_aug_route_matches_dense():
    """attention_from_packed_qkv at d=64 (the flagship aug route) vs the
    dense oracle: rope+norm+flash end to end, fwd + packed-qkv grads."""
    from dfot_tpu.ops.attention import flash_attention

    rng = np.random.default_rng(8)
    B, N, H, d = 1, 256, 2, 64
    qkv = jnp.asarray(rng.standard_normal((B, N, 3 * H * d)), jnp.float32)
    cos, sin = _tables(rng, N, d)
    cj = jnp.asarray(cos, jnp.float32)
    sj = jnp.asarray(signed_sin(sin), jnp.float32)

    force_fused_interpret(True)
    try:
        got = attention_from_packed_qkv(qkv, H, d, None, norm=True)

        def loss(qkv_):
            return attention_from_packed_qkv(qkv_, H, d, None, norm=True).sum()

        g_got = jax.grad(loss)(qkv)
    finally:
        force_fused_interpret(False)

    q, k, v = reference_qkv_prep(qkv, H, d, cj * 0 + 1, sj * 0, norm=True)

    def dense(qkv_):
        q, k, v = reference_qkv_prep(qkv_, H, d, cj * 0 + 1, sj * 0, norm=True)
        o = flash_attention(q, k, v, False, 128, 128, True)
        return jnp.moveaxis(o, 1, 2).reshape(B, N, H * d)

    want = dense(qkv)
    np.testing.assert_allclose(np.asarray(got), np.asarray(want), atol=1e-5)
    g_want = jax.grad(lambda x: dense(x).sum())(qkv)
    np.testing.assert_allclose(np.asarray(g_got), np.asarray(g_want),
                               atol=1e-4, rtol=1e-4)
