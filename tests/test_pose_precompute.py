"""Precomputed pose conditioning (models/uvit.py:precompute_pose_conditioning)
must be numerically equivalent to the raw in-model path: the FiLM modulation
is linear in the (noise-emb vector + pose map) sum, so projecting the pose
map once per window and adding the per-step vector term is the same math
(reference semantics: u_vit3d_pose.py:63-131)."""

import jax
import jax.numpy as jnp
import numpy as np
import pytest

from dfot_tpu.models.uvit import (
    UViT3D,
    UViT3DPose,
    UViTSpec,
    precompute_pose_conditioning,
)


def _build(block_types, num_heads=2):
    spec = UViTSpec(
        channels=(32, 64),
        emb_channels=64,
        patch_size=2,
        block_types=block_types,
        block_dropouts=(0.0, 0.0),
        num_updown_blocks=(2,),
        num_mid_blocks=2,
        num_heads=num_heads,
        pos_emb_type="rope",
        use_checkpointing=(False, False),
        max_temporal_length=4,
    )
    model = UViT3DPose(
        spec=spec, x_channels=3, resolution=16, external_cond_dim=6,
        external_cond_dropout=0.1,
    )
    rk = jax.random.PRNGKey
    x = jax.random.normal(rk(0), (2, 4, 16, 16, 3))
    k = jnp.full((2, 4), 500.0)
    pose = jax.random.normal(rk(1), (2, 4, 16, 16, 6))
    variables = model.init({"params": rk(2), "dropout": rk(3)}, x, k, pose, None)
    # zero-init layers (project_output, attn_out, ...) make a fresh-init
    # model output exactly zero — randomize every leaf so the comparison
    # actually exercises the whole network
    leaves, treedef = jax.tree_util.tree_flatten(variables)
    keys = jax.random.split(rk(4), len(leaves))
    variables = jax.tree_util.tree_unflatten(
        treedef,
        [0.05 * jax.random.normal(kk, l.shape, l.dtype) for kk, l in zip(keys, leaves)],
    )
    return model, variables, x, k, pose


@pytest.mark.parametrize(
    "block_types",
    [("ResBlock", "TransformerBlock"), ("ResBlock", "AxialTransformerBlock")],
)
def test_precomputed_matches_raw(block_types):
    model, variables, x, k, pose = _build(block_types)
    raw = model.apply(variables, x, k, pose, None)
    pre = precompute_pose_conditioning(model, variables, pose)
    if block_types[1] == "TransformerBlock":
        assert pre["mods"] and not pre["levels"]
    else:
        assert "1" in pre["levels"]  # axial level falls back to the map
    fast = model.apply(variables, x, k, pre, None)
    np.testing.assert_allclose(np.asarray(raw), np.asarray(fast), atol=2e-4)


@pytest.mark.parametrize("mask_shape", ["b", "bt"])
def test_precomputed_respects_cond_mask(mask_shape):
    """external_cond_mask (CFG pose dropout) must zero the pose contribution
    identically in both paths, for (B,) and (B, T) masks."""
    model, variables, x, k, pose = _build(("ResBlock", "TransformerBlock"))
    if mask_shape == "b":
        mask = jnp.array([True, False])
    else:
        mask = jnp.array([[True, True, False, False], [False] * 4])
    raw = model.apply(variables, x, k, pose, mask)
    pre = precompute_pose_conditioning(model, variables, pose)
    fast = model.apply(variables, x, k, pre, mask)
    np.testing.assert_allclose(np.asarray(raw), np.asarray(fast), atol=2e-4)
    # masked-everywhere must differ from unmasked (the mask actually acts)
    raw_off = model.apply(variables, x, k, pose, jnp.ones((2,), bool))
    assert not np.allclose(np.asarray(raw), np.asarray(raw_off), atol=1e-3)


def test_frame_rate_film_matches_token_rate():
    """The (B, F, E) frame-rate FiLM path (vector embeddings projected then
    broadcast) must equal the old token-broadcast path — checked via the
    plain UViT3D whose emb is per-frame."""
    spec = UViTSpec(
        channels=(32, 64), emb_channels=64, patch_size=2,
        block_types=("ResBlock", "TransformerBlock"),
        block_dropouts=(0.0, 0.0), num_updown_blocks=(1,), num_mid_blocks=1,
        num_heads=2, pos_emb_type="rope", use_checkpointing=(False, False),
        max_temporal_length=4,
    )
    model = UViT3D(spec=spec, x_channels=3, resolution=16)
    rk = jax.random.PRNGKey
    x = jax.random.normal(rk(0), (1, 4, 16, 16, 3))
    k = jnp.broadcast_to(jnp.arange(4.0) * 100, (1, 4))
    variables = model.init({"params": rk(1), "dropout": rk(2)}, x, k, None)
    leaves, treedef = jax.tree_util.tree_flatten(variables)
    keys = jax.random.split(rk(3), len(leaves))
    variables = jax.tree_util.tree_unflatten(
        treedef,
        [0.05 * jax.random.normal(kk, l.shape, l.dtype) for kk, l in zip(keys, leaves)],
    )
    out = model.apply(variables, x, k, None)
    assert out.shape == x.shape
    # per-frame noise levels must produce per-frame-distinct outputs
    assert not np.allclose(np.asarray(out[0, 0]), np.asarray(out[0, 1]))


def test_precompute_inside_window_sampler():
    """End-to-end: a window sampler whose cond_transform takes
    (conditions, variables) and returns the precomputed dict must sample
    finitely and match the raw-conditions sampler."""
    from dfot_tpu.diffusion import DiffusionConfig, make_schedule
    from dfot_tpu.guidance.history_guidance import HistoryGuidance
    from dfot_tpu.sampling import DFoTRollout, RolloutConfig

    model, variables, x, k, pose = _build(("ResBlock", "TransformerBlock"))
    dcfg = DiffusionConfig(timesteps=20, sampling_timesteps=3, objective="pred_v")
    sched = make_schedule(dcfg)

    def model_apply(v, xx, kk, cond, cond_mask):
        return model.apply(v, xx, kk, cond, cond_mask)

    def make_ro(ct):
        return DFoTRollout(
            RolloutConfig(
                max_tokens=4, x_shape=(16, 16, 3), external_cond_type="action",
                cond_transform=ct,
            ),
            dcfg, sched, model_apply,
        )

    hg = HistoryGuidance.vanilla(guidance_scale=2.0, timesteps=dcfg.timesteps)
    ctx = jnp.zeros((1, 4, 16, 16, 3))
    mask = np.zeros((1, 4), np.int64)
    mask[:, 0] = 1
    conds = np.asarray(jax.random.normal(jax.random.PRNGKey(7), (1, 4, 16, 16, 6)))

    outs = {}
    for name, ct in {
        "raw": None,
        "pre": lambda c, v: precompute_pose_conditioning(model, v, c),
    }.items():
        out = make_ro(ct).sample_sequence(
            variables, jax.random.PRNGKey(3), 1, length=4, context=ctx,
            context_mask=mask, conditions=jnp.asarray(conds),
            history_guidance=hg,
        )
        outs[name] = np.asarray(out)
        assert np.isfinite(outs[name]).all()
    np.testing.assert_allclose(outs["raw"], outs["pre"], atol=2e-4)


def test_token_io_matches_pixel_io():
    """UViT3D(token_io=True) on patchified tokens must equal the pixel path
    exactly: the entry/exit differ only by where the pixel<->patch
    transpose happens (models/uvit.py patchify_tokens)."""
    from dfot_tpu.models.uvit import patchify_tokens, unpatchify_tokens

    model, variables, x, k, pose = _build(("ResBlock", "TransformerBlock"))
    out_pix = model.apply(variables, x, k, pose, None)
    tok = model.clone(token_io=True)
    p = model.spec.patch_size
    out_tok = tok.apply(variables, patchify_tokens(x, p), k, pose, None)
    assert out_tok.shape == (2, 4, 8 * 8, p * p * 3)
    np.testing.assert_array_equal(
        np.asarray(unpatchify_tokens(out_tok, p, 16, 16)), np.asarray(out_pix)
    )
