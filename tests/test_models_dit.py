"""Tests for embeddings, attention ops, and the DiT3D backbone."""

import jax
import jax.numpy as jnp
import numpy as np
import pytest

from dfot_tpu.models.dit import DiT3D, DiTSpec
from dfot_tpu.models.embeddings import (
    PatchEmbed,
    apply_rope,
    make_rope_1d,
    make_rope_3d,
    timestep_embedding,
)
from dfot_tpu.ops.attention import attention_with_weights, flash_attention

SPEC = DiTSpec(
    hidden_size=64,
    depth=2,
    num_heads=2,
    mlp_ratio=2.0,
    variant="full",
    pos_emb_type="rope_3d",
    patch_size=2,
    max_temporal_length=4,
)


def _make_model(**kw):
    cfg = dict(
        spec=SPEC,
        x_channels=3,
        resolution=(8, 8),
    )
    cfg.update(kw)
    return DiT3D(**cfg)


def _init_and_run(model, x, k, cond=None, cond_mask=None):
    rngs = {"params": jax.random.PRNGKey(0), "dropout": jax.random.PRNGKey(1)}
    variables = model.init(rngs, x, k, cond, cond_mask)
    return variables, model.apply(variables, x, k, cond, cond_mask)


# ---------------------------------------------------------------------------
# embeddings
# ---------------------------------------------------------------------------


def test_timestep_embedding_shapes_and_range():
    t = jnp.asarray([[0.0, 10.0], [999.0, 500.0]])
    e = timestep_embedding(t, 32)
    assert e.shape == (2, 2, 32)
    assert float(jnp.abs(e).max()) <= 1.0 + 1e-6
    # distinct timesteps -> distinct embeddings
    assert float(jnp.abs(e[0, 0] - e[0, 1]).max()) > 0.1


def test_rope_preserves_norm_and_relative_property():
    rope = make_rope_1d(16, 32)
    x = jax.random.normal(jax.random.PRNGKey(0), (1, 1, 32, 16))
    rx = apply_rope(x, rope)
    # rotation preserves per-pair norms
    np.testing.assert_allclose(
        np.linalg.norm(np.asarray(x), axis=-1),
        np.linalg.norm(np.asarray(rx), axis=-1),
        rtol=1e-5,
    )
    # relative property: <R(q,i), R(k,j)> depends only on i - j
    q = jax.random.normal(jax.random.PRNGKey(1), (16,))
    k = jax.random.normal(jax.random.PRNGKey(2), (16,))
    def dot_at(i, j):
        qi = apply_rope(q[None, None, None, :].repeat(32, 2), rope)[0, 0, i]
        kj = apply_rope(k[None, None, None, :].repeat(32, 2), rope)[0, 0, j]
        return float(qi @ kj)
    assert dot_at(5, 3) == pytest.approx(dot_at(12, 10), abs=1e-4)
    assert dot_at(5, 3) != pytest.approx(dot_at(10, 3), abs=1e-3)


def test_rope_3d_dim_split():
    rope = make_rope_3d(24, (2, 4, 4))
    assert rope.cos.shape == (32, 24)


def test_patch_embed_matches_conv_math():
    """PatchEmbed (reshape+dense) must equal a stride-p conv with the
    corresponding kernel layout."""
    p, C, D = 2, 3, 8
    pe = PatchEmbed(p, D)
    x = jax.random.normal(jax.random.PRNGKey(0), (1, 4, 4, C))
    variables = pe.init(jax.random.PRNGKey(1), x)
    out = pe.apply(variables, x)
    kernel = variables["params"]["proj"]["kernel"]  # (p*p*C, D)
    bias = variables["params"]["proj"]["bias"]
    # manual: extract patches in the same (p, p, C) order and matmul
    xn = np.asarray(x).reshape(1, 2, p, 2, p, C).transpose(0, 1, 3, 2, 4, 5)
    xn = xn.reshape(1, 4, p * p * C)
    expected = xn @ np.asarray(kernel) + np.asarray(bias)
    np.testing.assert_allclose(np.asarray(out), expected, atol=1e-5)


# ---------------------------------------------------------------------------
# attention
# ---------------------------------------------------------------------------


def test_flash_attention_matches_exact():
    # interpret mode emulates the MXU's reduced-precision f32 dots, so the
    # tolerance is bf16-scale, not fp32-scale
    q, k, v = [
        jax.random.normal(jax.random.PRNGKey(i), (1, 2, 256, 64)) for i in range(3)
    ]
    exact, w = attention_with_weights(q, k, v)
    out = flash_attention(q, k, v, False, 128, 128, True)
    assert float(jnp.abs(out - exact).max()) < 2e-2
    np.testing.assert_allclose(np.asarray(w.sum(-1)), 1.0, atol=1e-5)


def test_flash_attention_causal():
    q, k, v = [
        jax.random.normal(jax.random.PRNGKey(i), (1, 1, 256, 64)) for i in range(3)
    ]
    exact, w = attention_with_weights(q, k, v, causal=True)
    out = flash_attention(q, k, v, True, 128, 128, True)
    assert float(jnp.abs(out - exact).max()) < 2e-2
    # no attention to the future
    assert float(np.triu(np.asarray(w[0, 0]), 1).max()) == 0.0


def test_flash_attention_pvt_variant_matches_row():
    """Transposed-pv forward orientation: same outputs AND same lse (the
    backward consumes lse, so the variants must be drop-in equivalent)."""
    from dfot_tpu.ops.attention import _flash_forward

    q, k, v = [
        jax.random.normal(jax.random.PRNGKey(30 + i), (1, 2, 256, 64))
        for i in range(3)
    ]
    for causal in (False, True):
        o_row, lse_row = _flash_forward(
            q, k, v, causal, 128, 128, True, return_lse=True, variant="row"
        )
        o_pvt, lse_pvt = _flash_forward(
            q, k, v, causal, 128, 128, True, return_lse=True, variant="pvt"
        )
        np.testing.assert_allclose(
            np.asarray(o_row), np.asarray(o_pvt), atol=1e-5
        )
        np.testing.assert_allclose(
            np.asarray(lse_row), np.asarray(lse_pvt), atol=1e-5
        )
        exact, _ = attention_with_weights(q, k, v, causal=causal)
        assert float(jnp.abs(o_pvt - exact).max()) < 2e-2


def test_flash_attention_pvt_backward_matches_dense():
    """VJP through the pvt forward (its lse feeds the same backward kernels)."""
    from dfot_tpu.ops import attention as A

    q, k, v = [
        jax.random.normal(jax.random.PRNGKey(40 + i), (1, 2, 256, 64))
        for i in range(3)
    ]
    g = jax.random.normal(jax.random.PRNGKey(43), (1, 2, 256, 64))

    def dense(q, k, v):
        return attention_with_weights(q, k, v)[0]

    def flash(q, k, v):
        return flash_attention(q, k, v, False, 128, 128, True)

    _, vjp_d = jax.vjp(dense, q, k, v)
    A.set_flash_forward_variant("pvt")
    try:
        _, vjp_f = jax.vjp(flash, q, k, v)
    finally:
        A.set_flash_forward_variant("row")
    for a, b_ in zip(vjp_d(g), vjp_f(g)):
        np.testing.assert_allclose(np.asarray(a), np.asarray(b_), atol=2e-2)


def test_flash_attention_padded_head_dim():
    """d=72 (the K600 @DiT/XL head dim) through the lane-padded flash path:
    forward and VJP must match dense attention with the true 1/sqrt(72)
    scale — zero pad columns must be inert in both directions."""
    from dfot_tpu.ops.attention import _padded_flash

    q, k, v = [
        jax.random.normal(jax.random.PRNGKey(60 + i), (1, 2, 256, 72))
        for i in range(3)
    ]
    g = jax.random.normal(jax.random.PRNGKey(63), (1, 2, 256, 72))

    def dense(q, k, v):
        return attention_with_weights(q, k, v)[0]

    for variant in ("row", "pvt"):
        from dfot_tpu.ops import attention as A

        A.set_flash_forward_variant(variant)
        try:
            out, vjp_f = jax.vjp(
                lambda q, k, v: _padded_flash(q, k, v, False, interpret=True),
                q, k, v,
            )
        finally:
            A.set_flash_forward_variant("row")
        ref, vjp_d = jax.vjp(dense, q, k, v)
        assert float(jnp.abs(out - ref).max()) < 2e-2, variant
        for a, b_ in zip(vjp_d(g), vjp_f(g)):
            np.testing.assert_allclose(
                np.asarray(a), np.asarray(b_), atol=2e-2, err_msg=variant
            )


def test_flash_attention_bf16_native_dots():
    """bf16 inputs (the production dtype) stay within bf16-scale error of the
    fp32 dense result through the native-dtype dots + bf16 p downcast."""
    qf, kf, vf = [
        jax.random.normal(jax.random.PRNGKey(50 + i), (1, 2, 256, 64))
        for i in range(3)
    ]
    exact, _ = attention_with_weights(qf, kf, vf)
    q, k, v = (a.astype(jnp.bfloat16) for a in (qf, kf, vf))
    for variant in ("row", "pvt"):
        from dfot_tpu.ops.attention import _flash_forward

        out = _flash_forward(q, k, v, False, 128, 128, True, variant=variant)
        assert out.dtype == jnp.bfloat16
        err = float(jnp.abs(out.astype(jnp.float32) - exact).max())
        assert err < 5e-2, (variant, err)


# ---------------------------------------------------------------------------
# DiT3D
# ---------------------------------------------------------------------------


def test_dit3d_forward_shape_and_zero_init():
    model = _make_model()
    x = jax.random.normal(jax.random.PRNGKey(0), (2, 4, 8, 8, 3))
    k = jnp.full((2, 4), 500.0)
    _, out = _init_and_run(model, x, k)
    assert out.shape == (2, 4, 8, 8, 3)
    # final layer is zero-initialized: network output at init is exactly 0
    np.testing.assert_allclose(np.asarray(out), 0.0, atol=1e-6)


def test_dit3d_tokenwise_conditioning():
    """Changing one frame's noise level must change that frame's output
    (and, with full attention, may affect others), but leaving all levels
    equal must keep the computation deterministic."""
    model = _make_model()
    x = jax.random.normal(jax.random.PRNGKey(0), (1, 4, 8, 8, 3))
    rngs = {"params": jax.random.PRNGKey(0), "dropout": jax.random.PRNGKey(1)}
    variables = model.init(rngs, x, jnp.zeros((1, 4)))
    # perturb params so outputs are non-zero
    variables = jax.tree_util.tree_map(
        lambda a: a + 0.01 if a.dtype == jnp.float32 else a, variables
    )
    k1 = jnp.asarray([[100.0, 100.0, 100.0, 100.0]])
    k2 = jnp.asarray([[100.0, 900.0, 100.0, 100.0]])
    o1 = model.apply(variables, x, k1)
    o2 = model.apply(variables, x, k2)
    assert float(jnp.abs(o1 - o2)[0, 1].max()) > 1e-6
    o1b = model.apply(variables, x, k1)
    np.testing.assert_allclose(np.asarray(o1), np.asarray(o1b))


def test_dit3d_action_conditioning():
    model = _make_model(external_cond_type="action", external_cond_dim=4)
    x = jax.random.normal(jax.random.PRNGKey(0), (1, 4, 8, 8, 3))
    k = jnp.zeros((1, 4))
    cond = jax.random.normal(jax.random.PRNGKey(2), (1, 4, 4))
    variables, out = _init_and_run(model, x, k, cond)
    variables = jax.tree_util.tree_map(
        lambda a: a + 0.01 if a.dtype == jnp.float32 else a, variables
    )
    o1 = model.apply(variables, x, k, cond)
    o2 = model.apply(variables, x, k, cond * 2)
    assert float(jnp.abs(o1 - o2).max()) > 1e-6
    # cond_mask drops the conditioning for masked batch elements
    om = model.apply(variables, x, k, cond, jnp.asarray([True]))
    om2 = model.apply(variables, x, k, cond * 2, jnp.asarray([True]))
    np.testing.assert_allclose(np.asarray(om), np.asarray(om2), atol=1e-6)


def test_dit3d_label_conditioning():
    model = _make_model(
        external_cond_type="label",
        external_cond_dim=1,
        external_cond_num_classes=10,
        external_cond_dropout=0.1,
    )
    x = jax.random.normal(jax.random.PRNGKey(0), (2, 4, 8, 8, 3))
    k = jnp.zeros((2, 4))
    labels = jnp.asarray([3, 7])
    variables, out = _init_and_run(model, x, k, labels)
    assert out.shape == x.shape


def test_dit3d_factorized_variant():
    spec = DiTSpec(
        hidden_size=64,
        depth=2,
        num_heads=2,
        mlp_ratio=2.0,
        spatial_mlp_ratio=2.0,
        variant="factorized_attention",
        pos_emb_type="learned_1d",
        patch_size=2,
        max_temporal_length=4,
    )
    model = _make_model(spec=spec)
    x = jax.random.normal(jax.random.PRNGKey(0), (1, 4, 8, 8, 3))
    _, out = _init_and_run(model, x, jnp.zeros((1, 4)))
    assert out.shape == x.shape


def test_dit3d_gradients_flow():
    model = _make_model()
    x = jax.random.normal(jax.random.PRNGKey(0), (1, 4, 8, 8, 3))
    k = jnp.full((1, 4), 100.0)
    rngs = {"params": jax.random.PRNGKey(0), "dropout": jax.random.PRNGKey(1)}
    variables = model.init(rngs, x, k)

    def loss(params):
        out = model.apply({"params": params}, x, k)
        return jnp.mean((out - x) ** 2)

    g = jax.grad(loss)(variables["params"])
    leaves = jax.tree_util.tree_leaves(g)
    assert all(np.all(np.isfinite(np.asarray(l))) for l in leaves)
    # zero-init output layer still lets gradients reach the trunk via the
    # final-layer weight gradient; trunk grads are zero only at exact init
    total = sum(float(jnp.abs(l).sum()) for l in leaves)
    assert total > 0


def test_dit3d_joint_image_video_training():
    """Tokens beyond max_temporal_length are processed as independent
    single-frame images (reference dit_base.py:326-343)."""
    model = _make_model()  # max_temporal_length = 4
    x = jax.random.normal(jax.random.PRNGKey(0), (1, 6, 8, 8, 3))  # 4 video + 2 img
    k = jnp.full((1, 6), 100.0)
    rngs = {"params": jax.random.PRNGKey(0), "dropout": jax.random.PRNGKey(1)}
    variables = model.init(rngs, x, k)
    variables = jax.tree_util.tree_map(lambda a: a + 0.05, variables)
    out = model.apply(variables, x, k)
    assert out.shape == x.shape
    # image frames are independent: perturbing image frame 5 leaves image
    # frame 4 (and all video frames) unchanged
    o2 = model.apply(variables, x.at[:, 5].add(1.0), k)
    np.testing.assert_allclose(np.asarray(out[:, :5]), np.asarray(o2[:, :5]), atol=1e-4)
    assert float(jnp.abs(out[:, 5] - o2[:, 5]).max()) > 1e-6
    # video frames attend to each other: perturbing video frame 0 changes
    # video frame 1 but not the image frames
    o3 = model.apply(variables, x.at[:, 0].add(1.0), k)
    assert float(jnp.abs(out[:, 1] - o3[:, 1]).max()) > 1e-7
    np.testing.assert_allclose(np.asarray(out[:, 4:]), np.asarray(o3[:, 4:]), atol=1e-4)


def test_flash_attention_backward_matches_dense():
    """flash_attention VJP (dq/dk/dv kernels) == dense-softmax autodiff."""
    q, k, v = [
        jax.random.normal(jax.random.PRNGKey(10 + i), (1, 2, 256, 64))
        for i in range(3)
    ]
    g = jax.random.normal(jax.random.PRNGKey(13), (1, 2, 256, 64))

    def dense(q, k, v):
        return attention_with_weights(q, k, v)[0]

    def flash(q, k, v):
        return flash_attention(q, k, v, False, 128, 128, True)

    _, vjp_d = jax.vjp(dense, q, k, v)
    _, vjp_f = jax.vjp(flash, q, k, v)
    for a, b_ in zip(vjp_d(g), vjp_f(g)):
        np.testing.assert_allclose(np.asarray(a), np.asarray(b_), atol=2e-2)


def test_flash_attention_backward_streaming_dq(monkeypatch):
    """The HBM-streaming dq variant (long sequences) matches the VMEM one."""
    from dfot_tpu.ops import attention as A

    q, k, v = [
        jax.random.normal(jax.random.PRNGKey(20 + i), (1, 1, 256, 64))
        for i in range(3)
    ]
    g = jax.random.normal(jax.random.PRNGKey(23), (1, 1, 256, 64))

    def flash(q, k, v):
        return flash_attention(q, k, v, False, 128, 128, True)

    _, vjp_vmem = jax.vjp(flash, q, k, v)
    ref = vjp_vmem(g)
    monkeypatch.setattr(A, "_DQ_STREAM_BYTES", 0)  # force the streaming path
    _, vjp_stream = jax.vjp(flash, q, k, v)
    got = vjp_stream(g)
    for a, b_ in zip(ref, got):
        np.testing.assert_allclose(np.asarray(a), np.asarray(b_), atol=1e-5)

    # causal masking through the streaming path too
    def flash_c(q, k, v):
        return flash_attention(q, k, v, True, 128, 128, True)

    _, vjp_c = jax.vjp(flash_c, q, k, v)
    assert all(np.isfinite(np.asarray(t)).all() for t in vjp_c(g))


def test_small_n_attention_matches_xla():
    """VMEM-resident small-N kernel (axial temporal attention path): forward
    matches XLA attention; backward (XLA-delegated VJP) differentiates."""
    import jax
    import jax.numpy as jnp

    from dfot_tpu.ops.attention import _small_n_impl, _xla_attention, small_n_attention

    rng = jax.random.PRNGKey(0)
    q, k, v = (
        jax.random.normal(r, (16, 4, 8, 64), jnp.float32)
        for r in jax.random.split(rng, 3)
    )
    ref = _xla_attention(q, k, v, False)
    out = _small_n_impl(q, k, v, interpret=True)
    np.testing.assert_allclose(np.asarray(out), np.asarray(ref), atol=2e-5)

    # grad path must be defined (delegates to the XLA VJP)
    def loss(q):
        return jnp.sum(_xla_attention(q, k, v, False) ** 2)

    g_ref = jax.grad(loss)(q)

    def loss2(q):
        # interpret-mode forward through the custom-vjp wrapper
        out, vjp = jax.vjp(lambda a: small_n_attention(a, k, v), q)
        return out, vjp

    # on CPU the pallas interpret path isn't wired through the public
    # dispatcher; check the custom bwd directly
    from dfot_tpu.ops.attention import _small_n_bwd

    (gq,) = ( _small_n_bwd((q, k, v), 2 * ref)[0], )
    np.testing.assert_allclose(np.asarray(gq), np.asarray(g_ref), atol=2e-4)


def test_flash_block_picker_vmem_rule():
    """Past 4096 tokens only the k block widens (a 1024-wide q block's fp32
    score tile blows the scoped-VMEM budget inside large programs); the k
    block widens to 2048 (v5e-measured optimum, see _pick_blocks) with a
    1024 fallback for sequences that only split by 1024."""
    from dfot_tpu.ops.attention import _pick_blocks

    assert _pick_blocks(1024) == (1024, 1024)
    assert _pick_blocks(4096) == (1024, 1024)
    assert _pick_blocks(8192) == (512, 2048)
    assert _pick_blocks(16384) == (512, 2048)
    assert _pick_blocks(5120) == (512, 1024)


def test_flash_attention_backward_wide_dkv_block():
    """The adaptive dkv k-block (512-wide at block-multiple lengths, cutting
    the kernel's q/dO HBM re-streaming 4x) matches dense autodiff at a
    sequence long enough to select it."""
    q, k, v = [
        jax.random.normal(jax.random.PRNGKey(30 + i), (1, 1, 512, 64))
        for i in range(3)
    ]
    g = jax.random.normal(jax.random.PRNGKey(33), (1, 1, 512, 64))

    def dense(q, k, v):
        return attention_with_weights(q, k, v)[0]

    def flash(q, k, v):
        return flash_attention(q, k, v, False, 128, 128, True)

    _, vjp_d = jax.vjp(dense, q, k, v)
    _, vjp_f = jax.vjp(flash, q, k, v)
    for a, b_ in zip(vjp_d(g), vjp_f(g)):
        np.testing.assert_allclose(np.asarray(a), np.asarray(b_), atol=2e-2)


def test_bwd_block_fitter_divides_sequence():
    """Backward blocks must DIVIDE the sequence length: pallas grids drop
    remainders silently (n // block blocks), so a non-divisor block would
    skip trailing rows. _fit_block returns the largest divisor <= the cap
    (chip-swept caps: 1024 long and short — see _BWD_CAP_* in attention)."""
    from dfot_tpu.ops.attention import (_BWD_CAP_LONG, _BWD_CAP_SHORT,
                                        _fit_block)

    for n in (512, 1280, 2048, 4096, 8192, 16384, 100, 7):
        for want in (128, 256, 512, 640, 768, 1024, 2048):
            blk = _fit_block(n, want)
            assert n % blk == 0 and blk <= min(want, n), (n, want, blk)
    # the flagship shapes get exactly the swept winners
    assert _fit_block(8192, min(2048, _BWD_CAP_LONG)) == 1024
    assert _fit_block(2048, min(1024, _BWD_CAP_SHORT)) == 1024
    # the DiT/XL latent shape (n=1280) keeps its exact 256 split
    assert _fit_block(1280, 256) == 256


def test_block_picker_non_pow2_sequences():
    """Non-power-of-two sequences (DiT/XL latents: n=1280) get the widest
    128-multiple divisor blocks, with the k block widened toward
    whole-sequence when the q block is divisor-limited (chip-swept: 2.4x
    forward win over the old 256-block fallback)."""
    from dfot_tpu.ops.attention import _pick_block, _pick_blocks

    assert _pick_block(1280) == 640
    assert _pick_blocks(1280) == (640, 1280)
    assert _pick_blocks(1536) == (768, 1536)
    # power-of-two behavior unchanged
    assert _pick_blocks(2048) == (1024, 1024)
    assert _pick_blocks(8192) == (512, 2048)
