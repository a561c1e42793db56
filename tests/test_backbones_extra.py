"""Tests for U-Net3D, FAR-DiT, DiT1D, matrix attention, difference-DiT."""

import dataclasses

import jax
import jax.numpy as jnp
import numpy as np
import pytest

from dfot_tpu.models import (
    DiT1D,
    DiT1DSpec,
    DiT3D,
    DiTSpec,
    FARDiT,
    FARSpec,
    MatrixAttention,
    UNet3D,
    UNet3DSpec,
)


def _init_run(model, *args):
    rngs = {"params": jax.random.PRNGKey(0), "dropout": jax.random.PRNGKey(1)}
    variables = model.init(rngs, *args)
    return variables, model.apply(variables, *args)


# ---------------------------------------------------------------------------
# U-Net3D
# ---------------------------------------------------------------------------

UNET_SPEC = UNet3DSpec(
    network_size=16, num_res_blocks=1, resnet_block_groups=4,
    dim_mults=(1, 2), attn_resolutions=(8,), attn_dim_head=8, attn_heads=2,
    use_linear_attn=True, use_init_temporal_attn=True, init_kernel_size=3,
    max_temporal_length=4,
)


def test_unet3d_shapes():
    model = UNet3D(spec=UNET_SPEC, x_channels=3, resolution=16, use_causal_mask=False)
    x = jax.random.normal(jax.random.PRNGKey(0), (1, 4, 16, 16, 3))
    k = jnp.full((1, 4), 10.0)
    _, out = _init_run(model, x, k)
    assert out.shape == x.shape
    assert np.isfinite(np.asarray(out)).all()


def test_unet3d_causal_temporal_attention():
    # frame_local_norm: the reference's GroupNorm statistics span time and
    # leak future frames even under causal attention; this flag is our
    # leak-free variant, required for strict causality to hold
    spec = dataclasses.replace(UNET_SPEC, frame_local_norm=True)
    model = UNet3D(spec=spec, x_channels=3, resolution=16, use_causal_mask=True)
    x = jax.random.normal(jax.random.PRNGKey(0), (1, 4, 16, 16, 3))
    k = jnp.full((1, 4), 10.0)
    variables, o1 = _init_run(model, x, k)
    # perturbing the last frame must not change earlier frames' outputs
    x2 = x.at[:, -1].add(1.0)
    o2 = model.apply(variables, x2, k)
    np.testing.assert_allclose(np.asarray(o1[:, :3]), np.asarray(o2[:, :3]), atol=1e-5)
    # note: noise levels stay equal across frames here, so conditioning can't leak


def test_unet3d_action_conditioning():
    model = UNet3D(
        spec=UNET_SPEC, x_channels=3, resolution=16, use_causal_mask=False,
        external_cond_type="action", external_cond_dim=4,
    )
    x = jax.random.normal(jax.random.PRNGKey(0), (1, 4, 16, 16, 3))
    k = jnp.zeros((1, 4))
    cond = jax.random.normal(jax.random.PRNGKey(2), (1, 4, 4))
    variables, _ = _init_run(model, x, k, cond)
    o1 = model.apply(variables, x, k, cond)
    o2 = model.apply(variables, x, k, cond * 2)
    assert float(jnp.abs(o1 - o2).max()) > 1e-6


# ---------------------------------------------------------------------------
# FAR-DiT
# ---------------------------------------------------------------------------

FAR_SPEC = FARSpec(
    hidden_size=64, depth=2, num_heads=2, mlp_ratio=2.0, patch_size=2,
    axes_dims_rope=(12, 10, 10), slope_scale=0.1, max_temporal_length=4,
)


def test_far_dit_shapes_and_zero_init():
    model = FARDiT(spec=FAR_SPEC, x_channels=3, resolution=(8, 8))
    x = jax.random.normal(jax.random.PRNGKey(0), (1, 4, 8, 8, 3))
    k = jnp.full((1, 4), 100.0)
    _, out = _init_run(model, x, k)
    assert out.shape == x.shape
    np.testing.assert_allclose(np.asarray(out), 0.0, atol=1e-6)  # zero-init head


def test_far_dit_frame_causality():
    model = FARDiT(spec=FAR_SPEC, x_channels=3, resolution=(8, 8))
    x = jax.random.normal(jax.random.PRNGKey(0), (1, 4, 8, 8, 3))
    k = jnp.full((1, 4), 100.0)
    rngs = {"params": jax.random.PRNGKey(0), "dropout": jax.random.PRNGKey(1)}
    variables = model.init(rngs, x, k)
    # zero-init gates attenuate signals cubically; use a larger perturbation
    variables = jax.tree_util.tree_map(lambda a: a + 0.1, variables)
    o1 = model.apply(variables, x, k)
    o2 = model.apply(variables, x.at[:, -1].add(1.0), k)
    np.testing.assert_allclose(np.asarray(o1[:, :3]), np.asarray(o2[:, :3]), atol=1e-4)
    assert float(jnp.abs(o1[:, 3] - o2[:, 3]).max()) > 1e-5


# ---------------------------------------------------------------------------
# DiT1D
# ---------------------------------------------------------------------------


def test_dit1d_shapes():
    spec = DiT1DSpec(hidden_size=32, depth=2, num_heads=2, mlp_ratio=2.0,
                     max_temporal_length=3)
    model = DiT1D(spec=spec, x_channels=4, n_tokens=8)
    x = jax.random.normal(jax.random.PRNGKey(0), (2, 3, 1, 8, 4))
    k = jnp.zeros((2, 3))
    _, out = _init_run(model, x, k)
    assert out.shape == x.shape
    np.testing.assert_allclose(np.asarray(out), 0.0, atol=1e-6)


def test_dit1d_temporal_causal():
    spec = DiT1DSpec(hidden_size=32, depth=2, num_heads=2, mlp_ratio=2.0,
                     causal_attn_mode="temporal_causal", max_temporal_length=3)
    model = DiT1D(spec=spec, x_channels=4, n_tokens=8)
    x = jax.random.normal(jax.random.PRNGKey(0), (1, 3, 1, 8, 4))
    k = jnp.zeros((1, 3))
    rngs = {"params": jax.random.PRNGKey(0), "dropout": jax.random.PRNGKey(1)}
    variables = model.init(rngs, x, k)
    variables = jax.tree_util.tree_map(lambda a: a + 0.01, variables)
    o1 = model.apply(variables, x, k)
    o2 = model.apply(variables, x.at[:, -1].add(1.0), k)
    np.testing.assert_allclose(np.asarray(o1[:, :2]), np.asarray(o2[:, :2]), atol=1e-5)


# ---------------------------------------------------------------------------
# matrix attention
# ---------------------------------------------------------------------------


def test_matrix_attention_shapes():
    attn = MatrixAttention(
        col_dim=16, row_dim=32, embed_col_dim=8, embed_row_dim=16,
        num_col_heads=2, num_row_heads=2, use_bias=True,
    )
    x = jax.random.normal(jax.random.PRNGKey(0), (2, 4, 16, 32))
    variables = attn.init(jax.random.PRNGKey(1), x)
    out = attn.apply(variables, x)
    assert out.shape == x.shape
    assert np.isfinite(np.asarray(out)).all()


def test_matrix_dit3d_variants():
    for variant in ("full_matrix_attention", "factorized_matrix_attention"):
        spec = DiTSpec(
            hidden_size=32, depth=1, num_heads=2, mlp_ratio=2.0,
            spatial_mlp_ratio=2.0, variant=variant, pos_emb_type="rope_2d",
            patch_size=2, max_temporal_length=2,
            embed_col_dim=8, embed_row_dim=16, num_col_heads=2, num_row_heads=2,
        )
        model = DiT3D(spec=spec, x_channels=3, resolution=(8, 8))
        x = jax.random.normal(jax.random.PRNGKey(0), (1, 2, 8, 8, 3))
        k = jnp.zeros((1, 2))
        _, out = _init_run(model, x, k)
        assert out.shape == x.shape, variant


# ---------------------------------------------------------------------------
# difference-DiT (double RoPE)
# ---------------------------------------------------------------------------


def test_difference_dit3d_double_streams():
    spec = DiTSpec(
        hidden_size=32, depth=1, num_heads=2, mlp_ratio=2.0, variant="full",
        pos_emb_type="rope_3d", patch_size=2, max_temporal_length=2,
        double_rope_merge="concat",
    )
    model = DiT3D(spec=spec, x_channels=3, resolution=(8, 8))
    # 2*T frames: [frames | differences]
    x = jax.random.normal(jax.random.PRNGKey(0), (1, 4, 8, 8, 3))
    k = jnp.zeros((1, 4))
    _, out = _init_run(model, x, k)
    assert out.shape == x.shape


# ---------------------------------------------------------------------------
# DiT3DPose
# ---------------------------------------------------------------------------


@pytest.mark.parametrize("ctype", ["film", "concat"])
def test_dit3d_pose_conditioning(ctype):
    from dfot_tpu.models.dit import DiT3DPose

    spec = DiTSpec(hidden_size=32, depth=1, num_heads=2, mlp_ratio=2.0,
                   variant="full", pos_emb_type="rope_3d", patch_size=2,
                   max_temporal_length=2)
    model = DiT3DPose(spec=spec, x_channels=3, resolution=(8, 8),
                      conditioning_type=ctype, external_cond_dim=6)
    x = jax.random.normal(jax.random.PRNGKey(0), (1, 2, 8, 8, 3))
    k = jnp.zeros((1, 2))
    cond = jax.random.normal(jax.random.PRNGKey(2), (1, 2, 8, 8, 6))
    rngs = {"params": jax.random.PRNGKey(0), "dropout": jax.random.PRNGKey(1)}
    variables = model.init(rngs, x, k, cond)
    out = model.apply(variables, x, k, cond)
    assert out.shape == x.shape
    variables = jax.tree_util.tree_map(lambda a: a + 0.05, variables)
    o1 = model.apply(variables, x, k, cond)
    o2 = model.apply(variables, x, k, cond * 2)
    assert float(jnp.abs(o1 - o2).max()) > 1e-6


def test_pose_algo_with_dit3d_pose_backbone():
    from dfot_tpu.algorithms import build_algorithm
    from dfot_tpu.config import load_config

    cfg = load_config([
        "+name=x", "dataset=realestate10k_mini", "algorithm=dfot_video_pose",
        "algorithm/backbone=dit3d_pose",
        "dataset.resolution=8", "dataset.max_frames=2", "dataset.n_frames=2",
        "dataset.context_length=1", "dataset.subdataset_size=null",
        "++algorithm.backbone.hidden_size=32", "++algorithm.backbone.depth=1",
        "++algorithm.backbone.num_heads=2",
        "++algorithm.backbone.use_gradient_checkpointing=false",
        "++algorithm.diffusion.sampling_timesteps=2",
    ])
    algo = build_algorithm(cfg, compute_dtype=jnp.float32)
    state = algo.make_train_state(jax.random.PRNGKey(0))
    step = algo.make_train_step()
    # raw pose vectors (B, T, 16) -> processed to ray maps by the algo
    raw = np.zeros((2, 2, 16), np.float32)
    raw[..., :4] = [1, 1, 0.5, 0.5]
    raw[..., 4:] = np.concatenate([np.eye(3), np.zeros((3, 1))], 1).reshape(12)
    batch = {
        "xs": jnp.ones((2, 2, 8, 8, 3)) * 0.3,
        "masks": jnp.ones((2, 2), bool),
        "conditions": jnp.asarray(algo.process_conditions(raw)),
    }
    state, metrics = step(state, batch, jax.random.PRNGKey(1))
    assert np.isfinite(float(metrics["loss"]))
