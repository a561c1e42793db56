"""Tests for the U-ViT3D backbone and camera geometry."""

import jax
import jax.numpy as jnp
import numpy as np
import pytest

from dfot_tpu.models.uvit import UViT3D, UViT3DPose, UViTSpec
from dfot_tpu.utils.geometry import (
    CameraPose,
    conditioning_dim,
    process_camera_conditions,
    quat_slerp,
    quat_to_rotmat,
    rotmat_to_quat,
)

SPEC = UViTSpec(
    channels=(32, 64),
    emb_channels=64,
    patch_size=2,
    block_types=("ResBlock", "TransformerBlock"),
    block_dropouts=(0.0, 0.1),
    num_updown_blocks=(2,),
    num_mid_blocks=2,
    num_heads=2,
    pos_emb_type="rope",
    use_checkpointing=(False, False),
    max_temporal_length=2,
)


# ---------------------------------------------------------------------------
# geometry
# ---------------------------------------------------------------------------


def _random_rotation(rng, n):
    # QR of random gaussians -> uniform-ish rotations
    A = rng.standard_normal((n, 3, 3))
    Q, R = np.linalg.qr(A)
    det = np.linalg.det(Q)
    Q[..., :, 0] *= np.sign(det)[..., None]
    return Q.astype(np.float32)


def test_quat_roundtrip():
    rng = np.random.RandomState(0)
    R = _random_rotation(rng, 16).reshape(4, 4, 3, 3)
    q = rotmat_to_quat(R)
    np.testing.assert_allclose(np.linalg.norm(q, axis=-1), 1.0, atol=1e-5)
    R2 = quat_to_rotmat(q)
    np.testing.assert_allclose(R, R2, atol=1e-5)


def test_quat_slerp_endpoints():
    rng = np.random.RandomState(1)
    R = _random_rotation(rng, 2)
    q = rotmat_to_quat(R[None])[0]
    steps = np.asarray([0.0, 0.5, 1.0], dtype=np.float32)
    out = quat_slerp(q[0], q[1], steps)
    np.testing.assert_allclose(np.abs(np.dot(out[0], q[0])), 1.0, atol=1e-5)
    np.testing.assert_allclose(np.abs(np.dot(out[2], q[1])), 1.0, atol=1e-5)
    np.testing.assert_allclose(np.linalg.norm(out, axis=-1), 1.0, atol=1e-5)


def _random_raw_poses(rng, B, T):
    R = _random_rotation(rng, B * T).reshape(B, T, 3, 3)
    Tr = rng.standard_normal((B, T, 3)).astype(np.float32)
    K = np.tile(np.asarray([1.0, 1.0, 0.5, 0.5], np.float32), (B, T, 1))
    ext = np.concatenate([R, Tr[..., None]], -1).reshape(B, T, 12)
    return np.concatenate([K, ext], -1)


def test_normalize_by_first_gives_identity_first_pose():
    raw = _random_raw_poses(np.random.RandomState(0), 2, 4)
    poses = CameraPose.from_vectors(raw)
    poses.normalize_by_first()
    np.testing.assert_allclose(
        poses.R[:, 0], np.tile(np.eye(3, dtype=np.float32), (2, 1, 1)), atol=1e-5
    )
    np.testing.assert_allclose(poses.T[:, 0], 0.0, atol=1e-5)


def test_relative_pose_invariance():
    """Normalization must remove any global rigid transform."""
    rng = np.random.RandomState(3)
    raw = _random_raw_poses(rng, 1, 3)
    poses1 = CameraPose.from_vectors(raw)
    poses1.normalize_by_first()
    # apply a global world-frame transform: R' = R G^T, T' = T + R G^T g
    G = _random_rotation(rng, 1)[0]
    g = rng.standard_normal(3).astype(np.float32)
    poses2 = CameraPose.from_vectors(raw)
    poses2.R = np.einsum("btij,kj->btik", poses2.R, G)
    poses2.T = poses2.T + np.einsum("btij,j->bti", poses2.R, g)
    poses2.normalize_by_first()
    np.testing.assert_allclose(poses1.R, poses2.R, atol=1e-4)
    np.testing.assert_allclose(poses1.T, poses2.T, atol=1e-4)


def test_identity_camera_rays_point_forward():
    B, T, res = 1, 1, 4
    K = np.asarray([[[1.0, 1.0, 0.5, 0.5]]], np.float32)
    ext = np.concatenate([np.eye(3), np.zeros((3, 1))], -1).reshape(1, 1, 12)
    raw = np.concatenate([K, ext.astype(np.float32)], -1)
    rays = CameraPose.from_vectors(raw).rays(res)
    np.testing.assert_allclose(rays.origin, 0.0, atol=1e-6)
    assert (rays.direction[..., 2] == 1.0).all()
    # central pixels point near the axis
    c = rays.direction[0, 0, res // 2, res // 2]
    assert abs(c[0]) < 0.5 and abs(c[1]) < 0.5


def test_process_camera_conditions_shapes():
    raw = _random_raw_poses(np.random.RandomState(0), 2, 3)
    out = process_camera_conditions(raw, "global", resolution=8)
    assert out.shape == (2, 3, 12)
    for kind in ("ray", "plucker"):
        out = process_camera_conditions(raw, kind, resolution=8)
        assert out.shape == (2, 3, 8, 8, 6)
    out = process_camera_conditions(raw, "ray_encoding", resolution=8)
    assert out.shape == (2, 3, 8, 8, conditioning_dim("ray_encoding"))
    assert np.abs(out).max() <= 1.0 + 1e-5  # sin-encoded


def test_plucker_moment_orthogonal_to_direction():
    raw = _random_raw_poses(np.random.RandomState(5), 1, 2)
    out = process_camera_conditions(raw, "plucker", resolution=4)
    d, m = out[..., :3], out[..., 3:]
    np.testing.assert_allclose(np.linalg.norm(d, axis=-1), 1.0, atol=1e-5)
    dots = np.abs((d * m).sum(-1))
    assert dots.max() < 1e-4


def test_pose_interpolation_fills_masked():
    raw = _random_raw_poses(np.random.RandomState(6), 1, 5)
    poses = CameraPose.from_vectors(raw)
    orig_R = poses.R.copy()
    mask = np.asarray([[False, True, True, True, False]])
    poses.replace_with_interpolation(mask)
    # endpoints unchanged
    np.testing.assert_allclose(poses.R[:, 0], orig_R[:, 0], atol=1e-4)
    np.testing.assert_allclose(poses.R[:, 4], orig_R[:, 4], atol=1e-4)
    # interior replaced by valid rotations
    RtR = np.einsum("btij,btik->btjk", poses.R, poses.R)
    np.testing.assert_allclose(RtR, np.broadcast_to(np.eye(3), RtR.shape), atol=1e-4)


# ---------------------------------------------------------------------------
# U-ViT3D
# ---------------------------------------------------------------------------


def test_uvit3d_forward_and_zero_init():
    model = UViT3D(spec=SPEC, x_channels=3, resolution=16)
    x = jax.random.normal(jax.random.PRNGKey(0), (1, 2, 16, 16, 3))
    k = jnp.full((1, 2), 500.0)
    rngs = {"params": jax.random.PRNGKey(0), "dropout": jax.random.PRNGKey(1)}
    variables = model.init(rngs, x, k)
    out = model.apply(variables, x, k)
    assert out.shape == x.shape
    np.testing.assert_allclose(np.asarray(out), 0.0, atol=1e-6)  # zero-init output


def test_uvit3d_axial_block():
    spec = UViTSpec(
        channels=(32, 64),
        emb_channels=64,
        patch_size=2,
        block_types=("ResBlock", "AxialTransformerBlock"),
        block_dropouts=(0.0, 0.0),
        num_updown_blocks=(1,),
        num_mid_blocks=1,
        num_heads=2,
        max_temporal_length=2,
    )
    model = UViT3D(spec=spec, x_channels=3, resolution=16)
    x = jax.random.normal(jax.random.PRNGKey(0), (1, 2, 16, 16, 3))
    k = jnp.zeros((1, 2))
    rngs = {"params": jax.random.PRNGKey(0), "dropout": jax.random.PRNGKey(1)}
    variables = model.init(rngs, x, k)
    out = model.apply(variables, x, k)
    assert out.shape == x.shape


def test_uvit3d_pose_conditioning_changes_output():
    model = UViT3DPose(
        spec=SPEC,
        x_channels=3,
        resolution=16,
        external_cond_type="pose",
        external_cond_dim=conditioning_dim("ray"),
        external_cond_dropout=0.1,
    )
    x = jax.random.normal(jax.random.PRNGKey(0), (1, 2, 16, 16, 3))
    k = jnp.full((1, 2), 100.0)
    raw = _random_raw_poses(np.random.RandomState(0), 1, 2)
    cond = jnp.asarray(process_camera_conditions(raw, "ray", resolution=16))
    rngs = {"params": jax.random.PRNGKey(0), "dropout": jax.random.PRNGKey(1)}
    variables = model.init(rngs, x, k, cond)
    # perturb so output nonzero
    variables = jax.tree_util.tree_map(lambda a: a + 0.01, variables)
    o1 = model.apply(variables, x, k, cond)
    o2 = model.apply(variables, x, k, cond * 1.5)
    assert float(jnp.abs(o1 - o2).max()) > 1e-6
    # pose dropout mask nullifies the conditioning
    om1 = model.apply(variables, x, k, cond, jnp.asarray([True]))
    om2 = model.apply(variables, x, k, cond * 1.5, jnp.asarray([True]))
    np.testing.assert_allclose(np.asarray(om1), np.asarray(om2), atol=1e-5)


def test_uvit3d_gradients():
    model = UViT3D(spec=SPEC, x_channels=3, resolution=16)
    x = jax.random.normal(jax.random.PRNGKey(0), (1, 2, 16, 16, 3))
    k = jnp.full((1, 2), 100.0)
    rngs = {"params": jax.random.PRNGKey(0), "dropout": jax.random.PRNGKey(1)}
    variables = model.init(rngs, x, k)

    def loss(params):
        return jnp.mean(
            (model.apply({"params": params}, x, k) - x) ** 2
        )

    g = jax.grad(loss)(variables["params"])
    leaves = jax.tree_util.tree_leaves(g)
    assert all(np.all(np.isfinite(np.asarray(l))) for l in leaves)
    assert sum(float(jnp.abs(l).sum()) for l in leaves) > 0


def _random_valid_poses(B, T, seed=0):
    rng = np.random.RandomState(seed)
    pose = np.zeros((B, T, 16), np.float32)
    pose[..., :4] = [0.9, 0.9, 0.5, 0.5]
    for b in range(B):
        for t in range(T):
            a, bb, c = rng.uniform(-0.5, 0.5, 3)
            Rz = np.array([[np.cos(a), -np.sin(a), 0], [np.sin(a), np.cos(a), 0], [0, 0, 1]])
            Ry = np.array([[np.cos(bb), 0, np.sin(bb)], [0, 1, 0], [-np.sin(bb), 0, np.cos(bb)]])
            Rx = np.array([[1, 0, 0], [0, np.cos(c), -np.sin(c)], [0, np.sin(c), np.cos(c)]])
            R = (Rz @ Ry @ Rx).astype(np.float32)
            Tv = rng.uniform(-1, 1, 3).astype(np.float32)
            pose[b, t, 4:] = np.concatenate([R, Tv[:, None]], 1).reshape(-1)
    return pose


@pytest.mark.parametrize("ctype", ["ray", "plucker", "ray_encoding"])
def test_device_ray_expansion_matches_host(ctype):
    """The jnp ray expansion (runs inside the jitted sampler) must match the
    host numpy path bit-for-tolerance: normalize on host (compact vectors),
    expand on device == full host process_camera_conditions."""
    from dfot_tpu.utils.geometry import (
        expand_pose_conditions_jax,
        normalize_camera_conditions,
        process_camera_conditions,
    )

    raw = _random_valid_poses(2, 3)
    host = process_camera_conditions(
        raw, conditioning_type=ctype, normalize_by="first", resolution=8
    )
    compact = normalize_camera_conditions(raw, normalize_by="first")
    assert compact.shape == (2, 3, 16)
    dev = np.asarray(expand_pose_conditions_jax(jnp.asarray(compact), ctype, 8))
    assert dev.shape == host.shape
    if ctype == "ray_encoding":
        # the top NeRF octaves multiply coords by 2^14*pi, so fp32
        # evaluation-order differences (jnp einsum vs numpy) shift the sin
        # argument by ~1e-2 rad — inherent to the encoding, not a port bug
        # (the reference's GPU fp32 differs from host numpy identically)
        assert np.mean(np.abs(dev - host) < 1e-3) > 0.97
        np.testing.assert_allclose(dev, host, atol=0.05)
    else:
        np.testing.assert_allclose(dev, host, atol=2e-4, rtol=2e-4)


def test_normalize_camera_conditions_roundtrip_fields():
    """normalize(..)[:, 0] has identity extrinsics under normalize_by=first
    and preserves intrinsics."""
    from dfot_tpu.utils.geometry import normalize_camera_conditions

    raw = _random_valid_poses(1, 4, seed=3)
    out = normalize_camera_conditions(raw, normalize_by="first")
    np.testing.assert_allclose(out[..., :4], raw[..., :4], atol=1e-6)
    E0 = out[0, 0, 4:].reshape(3, 4)
    np.testing.assert_allclose(E0[:, :3], np.eye(3), atol=1e-5)
    np.testing.assert_allclose(E0[:, 3], 0.0, atol=1e-5)


def test_pose_algo_uses_compact_conditions():
    """DFoTVideoPoseAlgo: process_conditions returns (B, T, 16); the
    rollout's cond_transform expands to the model's map format on device."""
    from dfot_tpu.algorithms import build_algorithm
    from dfot_tpu.config import load_config

    cfg = load_config([
        "+name=pose_smoke", "dataset=realestate10k_mini",
        "algorithm=dfot_video_pose", "experiment=video_generation",
        "++dataset.resolution=16", "++dataset.n_frames=4",
        "++dataset.context_length=1", "++dataset.frame_skip=1",
        "++algorithm.backbone.channels=[32,32]",
        "++algorithm.backbone.num_updown_blocks=[1]",
        "++algorithm.backbone.num_mid_blocks=1",
        "++algorithm.backbone.block_types=[ResBlock,TransformerBlock]",
        "++algorithm.backbone.block_dropouts=[0,0]",
        "++algorithm.backbone.num_heads=2",
        "++algorithm.backbone.use_checkpointing=[false,false]",
        "++algorithm.backbone.emb_channels=32",
        "++algorithm.diffusion.sampling_timesteps=2",
    ])
    algo = build_algorithm(cfg, compute_dtype=jnp.float32)
    raw = _random_valid_poses(1, 4)
    conds = algo.process_conditions(raw)
    assert conds.shape == (1, 4, 16)
    ct = algo._cond_transform()
    assert ct is not None
    maps = ct(jnp.asarray(conds))
    assert maps.shape == (1, 4, 16, 16, 180)
    # end-to-end: one sampled window through the compact-cond path
    out = algo.sample_videos(
        algo.init_params(jax.random.PRNGKey(0))["params"],
        jax.random.PRNGKey(1),
        jnp.zeros((1, 4, 16, 16, 3)),
        conditions=raw,
        n_context_tokens=1,
        tasks=("prediction",),
    )
    assert out["prediction"].shape == (1, 4, 16, 16, 3)
    assert np.isfinite(np.asarray(out["prediction"])).all()
