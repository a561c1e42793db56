"""MUSIQ imaging-quality model: architecture + registry + importer tests.

No pyiqa / pretrained weights exist on this host (zero egress), so unlike
raft/amt there is no torch forward-parity test; these tests pin the
multi-scale tokenization math (pure numpy-checkable), the transformer's
masking semantics, the registry/vbench wiring, and the importer's
name-mapping against a synthetic pyiqa-style state dict.
"""

import numpy as np
import pytest

jax = pytest.importorskip("jax")
import jax.numpy as jnp  # noqa: E402

from dfot_tpu.metrics.musiq import (  # noqa: E402
    MUSIQ,
    import_musiq_params,
    multiscale_tokens,
)

TINY = dict(hidden=32, layers=2, heads=2, mlp_dim=64, patch=32)


def test_multiscale_tokens_shapes_and_hash():
    imgs = jnp.zeros((2, 256, 256, 3))
    patches, hse, scale, valid = multiscale_tokens(imgs, 32, 10, (384, 224))
    # native 8x8 + 384-scale 12x12 + 224-scale 7x7 patches
    assert patches.shape == (2, 64 + 144 + 49, 32, 32, 3)
    assert hse.shape == scale.shape == valid.shape == (257,)
    assert valid.all()  # all three scales divide evenly at 256x256
    assert set(scale) == {0, 1, 2}
    # hash rule t = floor(i * G / n): 8x8 grid -> last cell (8,8) = 88;
    # 12x12 grid -> last cell (9,9) = 99
    assert hse[0] == 0 and hse[63] == 88
    assert hse[64] == 0 and hse[64 + 143] == 99
    # 7x7 grid maps into the 10x10 hash grid monotonically
    s2 = hse[64 + 144 :]
    assert s2.min() == 0 and s2.max() == 88


def test_multiscale_tokens_pads_and_masks_nonmultiple():
    imgs = jnp.ones((1, 200, 300, 3))
    patches, hse, scale, valid = multiscale_tokens(imgs, 32, 10, ())
    rows, cols = -(-200 // 32), -(-300 // 32)
    assert patches.shape[1] == rows * cols
    # every top-left corner lies inside a 200x300 image -> all valid
    assert valid.all()


def test_musiq_forward_shape_and_finite():
    model = MUSIQ(**TINY)
    x = jax.random.uniform(jax.random.PRNGKey(0), (2, 64, 96, 3))
    params = model.init(jax.random.PRNGKey(1), x)
    out = model.apply(params, x)
    assert out.shape == (2,)
    assert np.isfinite(np.asarray(out)).all()


def test_attention_mask_semantics():
    """Masked tokens must not influence unmasked ones: replacing a masked
    token's content leaves every other output row unchanged (the masking
    path matters when sequences are padded; with this static-shape
    tokenizer every grid patch overlaps the image so valid is all-ones,
    asserted in test_multiscale_tokens_pads_and_masks_nonmultiple)."""
    from dfot_tpu.metrics.musiq import Block

    blk = Block(dim=16, heads=2, mlp_dim=32)
    x = jax.random.normal(jax.random.PRNGKey(0), (1, 5, 16))
    mask = jnp.asarray([[True, True, True, True, False]])
    params = blk.init(jax.random.PRNGKey(1), x, mask)
    out1 = blk.apply(params, x, mask)
    x2 = x.at[:, 4].set(123.0)
    out2 = blk.apply(params, x2, mask)
    np.testing.assert_allclose(
        np.asarray(out1[:, :4]), np.asarray(out2[:, :4]), rtol=1e-5
    )


def test_registry_musiq_none_without_weights(tmp_path):
    from dfot_tpu.metrics.registry import SharedMetricModelRegistry

    reg = SharedMetricModelRegistry(weights_dir=str(tmp_path))
    assert reg.musiq() is None
    assert reg.comparable["musiq"] is False


def test_vbench_uses_musiq_when_available():
    """With a musiq callable on the registry, the imaging_quality dim uses
    it (0-100 -> [0,1] normalization, reference imaging_quality.py:22-23)
    and drops the _uncalibrated suffix."""
    from dfot_tpu.metrics.vbench import VBenchQuality

    class FakeReg:
        comparable = {"musiq": True}

        def musiq(self):
            return lambda frames: np.full((frames.shape[0],), 80.0)

    vb = VBenchQuality(dimensions=("imaging_quality",), registry=FakeReg())
    vb.update(np.random.default_rng(0).random((2, 3, 32, 32, 3), np.float32))
    out = vb.log()
    assert out["vbench/imaging_quality"] == pytest.approx(0.8)


def _synthetic_pyiqa_state(layers=2, hidden=32, mlp=64, grid=10):
    """pyiqa/TF-MUSIQ-style key names with torch layouts."""
    rng = np.random.default_rng(0)
    st = {
        "conv_root.weight": rng.normal(size=(64, 3, 7, 7)),
        "gn_root.weight": rng.normal(size=(64,)),
        "gn_root.bias": rng.normal(size=(64,)),
        "embedding.weight": rng.normal(size=(hidden, 64 * 8 * 8)),
        "embedding.bias": rng.normal(size=(hidden,)),
        "cls_token": rng.normal(size=(1, 1, 384)),
        "pos_emb": rng.normal(size=(1, grid * grid, 384)),
        "scale_emb": rng.normal(size=(3, 384)),
        "transformer.encoder_norm.weight": rng.normal(size=(hidden,)),
        "transformer.encoder_norm.bias": rng.normal(size=(hidden,)),
        "head.weight": rng.normal(size=(1, hidden)),
        "head.bias": rng.normal(size=(1,)),
    }
    for i in range(layers):
        p = f"transformer.encoder_layers.{i}."
        st[p + "attention_norm.weight"] = rng.normal(size=(hidden,))
        st[p + "attention_norm.bias"] = rng.normal(size=(hidden,))
        for n in ("query", "key", "value"):
            st[p + f"attn.{n}.weight"] = rng.normal(size=(hidden, hidden))
            st[p + f"attn.{n}.bias"] = rng.normal(size=(hidden,))
        st[p + "attn.out.weight"] = rng.normal(size=(hidden, hidden))
        st[p + "attn.out.bias"] = rng.normal(size=(hidden,))
        st[p + "ffn_norm.weight"] = rng.normal(size=(hidden,))
        st[p + "ffn_norm.bias"] = rng.normal(size=(hidden,))
        st[p + "fc1.weight"] = rng.normal(size=(mlp, hidden))
        st[p + "fc1.bias"] = rng.normal(size=(mlp,))
        st[p + "fc2.weight"] = rng.normal(size=(hidden, mlp))
        st[p + "fc2.bias"] = rng.normal(size=(hidden,))
    return st


def test_import_musiq_params_maps_synthetic_state():
    st = _synthetic_pyiqa_state()
    tree = import_musiq_params(st)
    assert tree["patch_encoder"]["conv_root"]["kernel"].shape == (7, 7, 3, 64)
    assert tree["patch_encoder"]["embedding"]["kernel"].shape == (64 * 8 * 8, 32)
    assert tree["cls_token"].shape == (1, 1, 384)
    assert tree["hse_embedding"].shape == (100, 384)
    assert tree["scale_embedding"].shape == (3, 384)
    b0 = tree["block_0"]
    assert b0["qkv"]["kernel"].shape == (32, 96)
    # q/k/v concat order: q rows first
    np.testing.assert_allclose(
        b0["qkv"]["kernel"][:, :32],
        np.asarray(st["transformer.encoder_layers.0.attn.query.weight"]).T,
    )
    assert b0["mlp_in"]["kernel"].shape == (32, 64)
    assert b0["mlp_out"]["kernel"].shape == (64, 32)
    assert tree["head"]["kernel"].shape == (32, 1)


def test_import_musiq_params_fused_qkv_variant():
    st = _synthetic_pyiqa_state()
    # rewrite to fused-qkv naming
    for i in range(2):
        p = f"transformer.encoder_layers.{i}."
        qw = np.concatenate(
            [st.pop(p + f"attn.{n}.weight") for n in ("query", "key", "value")], 0
        )
        qb = np.concatenate(
            [st.pop(p + f"attn.{n}.bias") for n in ("query", "key", "value")], 0
        )
        st[p + "attn.qkv.weight"] = qw
        st[p + "attn.qkv.bias"] = qb
    tree = import_musiq_params(st)
    assert tree["block_1"]["qkv"]["kernel"].shape == (32, 96)


def test_registry_musiq_loads_matching_npz(tmp_path):
    """End-to-end: a correctly-shaped npz loads, passes _check_tree, and
    the jitted apply returns finite scores."""
    from dfot_tpu.metrics.registry import SharedMetricModelRegistry

    model = MUSIQ()
    x = jnp.zeros((1, 224, 224, 3))
    params = model.init(jax.random.PRNGKey(0), x)["params"]
    flat = {}

    def flatten(tree, path=""):
        for k, v in tree.items():
            p = f"{path}/{k}" if path else k
            if isinstance(v, dict):
                flatten(v, p)
            else:
                flat[p] = np.asarray(v)

    flatten(params)
    np.savez(tmp_path / "musiq.npz", **flat)
    reg = SharedMetricModelRegistry(weights_dir=str(tmp_path))
    fn = reg.musiq()
    assert fn is not None and reg.comparable["musiq"]
    out = np.asarray(fn(jnp.full((2, 224, 224, 3), 0.5)))
    assert out.shape == (2,) and np.isfinite(out).all()
