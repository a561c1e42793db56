"""End-to-end numerical parity vs the ACTUAL reference torch modules.

The reference source is mounted at /root/reference and torch-CPU is
installed; the missing pip deps (omegaconf/timm/diffusers/
rotary_embedding_torch) are provided as faithful stubs
(tests/reference_stubs.py). Each test:

1. instantiates the real reference module with RANDOM weights,
2. exports its state_dict through our torch-checkpoint importer
   (dfot_tpu/utils/torch_ckpt.py),
3. runs both implementations on identical inputs,
4. asserts forward outputs agree to <= 1e-4.

This is the zero-egress route to the BASELINE north-star claim "load
DFoT_RE10K.ckpt and reproduce samples within tolerance": any drift in
layouts, chunk ordering, RoPE conventions, or norm placement fails here.
"""

import os
import sys

import numpy as np
import pytest

import jax
import jax.numpy as jnp

torch = pytest.importorskip("torch")

sys.path.insert(0, os.path.dirname(os.path.abspath(__file__)))

from reference_stubs import load_reference_module  # noqa: E402

from dfot_tpu.utils.torch_ckpt import (  # noqa: E402
    import_dit3d_params,
    import_uvit3d_params,
)


def _to_np(state_dict):
    return {k: v.detach().cpu().numpy().astype(np.float32) for k, v in state_dict.items()}


def _randomize(module: "torch.nn.Module", seed: int = 0) -> None:
    """Replace every param/buffer with non-degenerate random values so zero-init
    layers (AdaLN modulations, final projections) exercise real compute."""
    g = torch.Generator().manual_seed(seed)
    with torch.no_grad():
        for p in module.parameters():
            p.copy_(torch.randn(p.shape, generator=g) * 0.05)


# ---------------------------------------------------------------------------
# DiT3D
# ---------------------------------------------------------------------------


def _make_ref_dit3d(variant: str, pos_emb_type: str, T: int = 4,
                    spatial_mlp_ratio=None):
    dit3d = load_reference_module("refalg.dfot.backbones.dit.dit3d")
    from omegaconf import DictConfig  # the stub

    d = dict(
        patch_size=2,
        variant=variant,
        pos_emb_type=pos_emb_type,
        hidden_size=64,
        depth=2,
        num_heads=4,
        mlp_ratio=2.0,
        use_gradient_checkpointing=False,
    )
    if spatial_mlp_ratio is not None:
        d["spatial_mlp_ratio"] = spatial_mlp_ratio
    cfg = DictConfig(d)
    ref = dit3d.DiT3D(
        cfg,
        x_shape=torch.Size([3, 8, 8]),
        max_tokens=T,
        external_cond_type="action",
        external_cond_num_classes=None,
        external_cond_dim=0,
        use_causal_mask=False,
    )
    ref.eval()
    _randomize(ref)
    return ref


def _our_dit3d(variant: str, pos_emb_type: str, T: int = 4,
               spatial_mlp_ratio=None):
    from dfot_tpu.models.dit import DiT3D, DiTSpec

    spec = DiTSpec(
        hidden_size=64,
        depth=2,
        num_heads=4,
        mlp_ratio=2.0,
        spatial_mlp_ratio=spatial_mlp_ratio,
        variant=variant,
        pos_emb_type=pos_emb_type,
        patch_size=2,
        max_temporal_length=T,
    )
    return DiT3D(spec=spec, x_channels=3, resolution=(8, 8))


@pytest.mark.parametrize(
    "variant,pos_emb_type,spatial_mlp_ratio",
    [
        ("full", "rope_3d", None),  # reference full blocks have NO MLP
        ("full", "rope_3d", 2.0),
        ("full", "learned_1d", None),
        ("factorized_attention", "learned_1d", 2.0),
    ],
)
def test_dit3d_forward_parity(variant, pos_emb_type, spatial_mlp_ratio):
    B, T = 2, 4
    ref = _make_ref_dit3d(variant, pos_emb_type, T, spatial_mlp_ratio)
    ours = _our_dit3d(variant, pos_emb_type, T, spatial_mlp_ratio)

    params = import_dit3d_params(_to_np(ref.state_dict()))

    rng = np.random.RandomState(0)
    x = rng.randn(B, T, 3, 8, 8).astype(np.float32)
    k = rng.randint(0, 1000, size=(B, T)).astype(np.int64)

    with torch.no_grad():
        ref_out = ref(torch.from_numpy(x), torch.from_numpy(k)).numpy()

    x_cl = np.transpose(x, (0, 1, 3, 4, 2))  # (B, T, H, W, C)
    out = ours.apply({"params": params}, jnp.asarray(x_cl), jnp.asarray(k, jnp.float32))
    out = np.transpose(np.asarray(out), (0, 1, 4, 2, 3))

    np.testing.assert_allclose(out, ref_out, atol=1e-4, rtol=1e-4)


# ---------------------------------------------------------------------------
# Matrix-attention DiT variants
# ---------------------------------------------------------------------------


@pytest.mark.parametrize(
    "variant,use_temporal_rope,multi_token,fixed_u",
    [
        ("full_matrix_attention", False, False, None),
        ("full_matrix_attention", True, True, None),
        ("factorized_matrix_attention", True, False, None),
        ("factorized_matrix_attention", False, False, "identity"),
    ],
)
def test_matrix_dit3d_forward_parity(variant, use_temporal_rope, multi_token,
                                     fixed_u):
    """Matrix attention variants (reference dit3d_full_matrix.yaml /
    dit3d_factorized_matrix.yaml shapes, scaled down)."""
    dit3d = load_reference_module("refalg.dfot.backbones.dit.dit3d")
    from omegaconf import DictConfig

    # fixed_u=identity keeps the col dim unembedded: the reference only
    # supports it with embed_col_dim == num_patches (and no bias)
    use_bias = fixed_u is None
    embed_col_dim = 4 if fixed_u is None else 16  # num_patches = (8/2)^2 = 16
    B, T = 2, 4
    d = dict(
        patch_size=2,
        variant=variant,
        pos_emb_type="sinusoidal_2d",
        hidden_size=None if variant.startswith("factorized") else 64,
        embed_col_dim=embed_col_dim,
        embed_row_dim=64,
        num_heads=4,
        num_col_heads=2,
        num_row_heads=4,
        depth=2,
        mlp_ratio=2.0,
        spatial_mlp_ratio=2.0,
        use_bias=use_bias,
        matrix_block="matrix",
        flatten_matrix_rope=False,
        matrix_multi_token=multi_token,
        fixed_u=fixed_u,
        use_temporal_rope=use_temporal_rope,
        use_gradient_checkpointing=False,
    )
    ref = dit3d.DiT3D(
        DictConfig(d),
        x_shape=torch.Size([3, 8, 8]),
        max_tokens=T,
        external_cond_type="action",
        external_cond_num_classes=None,
        external_cond_dim=0,
        use_causal_mask=False,
    )
    ref.eval()
    _randomize(ref, seed=9)

    from dfot_tpu.models.dit import DiT3D, DiTSpec

    spec = DiTSpec(
        hidden_size=64,  # == embed_row_dim (reference hidden_size property)
        depth=2,
        num_heads=4,
        mlp_ratio=2.0,
        spatial_mlp_ratio=2.0,
        variant=variant,
        pos_emb_type="sinusoidal_2d",
        patch_size=2,
        max_temporal_length=T,
        embed_col_dim=embed_col_dim,
        embed_row_dim=64,
        num_col_heads=2,
        num_row_heads=4,
        matrix_multi_token=multi_token,
        flatten_matrix_rope=False,
        matrix_use_bias=use_bias,
        fixed_u=fixed_u,
        use_temporal_rope=use_temporal_rope,
    )
    ours = DiT3D(spec=spec, x_channels=3, resolution=(8, 8))
    params = import_dit3d_params(_to_np(ref.state_dict()))

    rng = np.random.RandomState(10)
    x = rng.randn(B, T, 3, 8, 8).astype(np.float32)
    k = rng.randint(0, 1000, size=(B, T)).astype(np.int64)
    with torch.no_grad():
        ref_out = ref(torch.from_numpy(x), torch.from_numpy(k)).numpy()

    x_cl = np.transpose(x, (0, 1, 3, 4, 2))
    out = ours.apply({"params": params}, jnp.asarray(x_cl), jnp.asarray(k, jnp.float32))
    out = np.transpose(np.asarray(out), (0, 1, 4, 2, 3))
    np.testing.assert_allclose(out, ref_out, atol=1e-4, rtol=1e-4)


# ---------------------------------------------------------------------------
# FARDiT
# ---------------------------------------------------------------------------


# NOTE: the reference FARDiT crashes when external_cond_dim == 0 (its weight
# init dereferences the None embedding), so both cases are label-conditioned
@pytest.mark.parametrize("slope_scale,with_label", [(0.0, True), (0.05, True)])
def test_far_dit_forward_parity(slope_scale, with_label):
    """Frame-autoregressive DiT: Flux 3-axis RoPE, RMS q/k norm, frame-causal
    attention with ALiBi-like slope bias (reference far_model.py)."""
    far = load_reference_module("refalg.dfot.backbones.far.far_model")
    from omegaconf import DictConfig

    # patch_size=1 like the reference far_dit.yaml (its output head produces
    # p^2 * (p^2 * C) channels, which only type-checks against x at p=1)
    B, T, H, D = 2, 4, 4, 64
    cfg = DictConfig(
        dict(
            hidden_size=D,
            depth=2,
            num_heads=2,
            mlp_ratio=2.0,
            patch_size=1,
            axes_dims_rope=(8, 12, 12),
            slope_scale=slope_scale,
            external_cond_dropout=0.1,
        )
    )
    cfg["external_cond_dropout"] = 0.0
    ref = far.FARDiT(
        cfg,
        x_shape=torch.Size([3, H, H]),
        max_tokens=T,
        external_cond_type="label",
        external_cond_num_classes=5 if with_label else None,
        external_cond_dim=1 if with_label else 0,
        use_causal_mask=True,
    )
    # eval-mode reference FAR slices to the LAST frame only (its AR-generation
    # API, far_model.py:526-529); full-sequence parity needs train mode, with
    # cond dropout disabled so it stays deterministic
    ref.train()
    _randomize(ref, seed=12)

    from dfot_tpu.models.far import FARDiT, FARSpec
    from dfot_tpu.utils.torch_ckpt import import_far_params

    spec = FARSpec(
        hidden_size=D, depth=2, num_heads=2, mlp_ratio=2.0, patch_size=1,
        axes_dims_rope=(8, 12, 12), slope_scale=slope_scale,
        max_temporal_length=T,
    )
    ours = FARDiT(
        spec=spec, x_channels=3, resolution=(H, H),
        external_cond_type="label" if with_label else None,
        external_cond_dim=1 if with_label else 0,
        external_cond_num_classes=5 if with_label else None,
        external_cond_dropout=0.0,
    )
    params = import_far_params(_to_np(ref.state_dict()))

    rng = np.random.RandomState(13)
    x = rng.randn(B, T, 3, H, H).astype(np.float32)
    k = rng.randint(0, 1000, size=(B, T)).astype(np.int64)
    label = rng.randint(0, 5, size=(B, 1)).astype(np.int64)

    with torch.no_grad():
        ref_out = ref(
            torch.from_numpy(x),
            torch.from_numpy(k),
            torch.from_numpy(label) if with_label else None,
        )
        ref_out = (ref_out[0] if isinstance(ref_out, tuple) else ref_out).numpy()

    x_cl = np.transpose(x, (0, 1, 3, 4, 2))
    out = ours.apply(
        {"params": params},
        jnp.asarray(x_cl),
        jnp.asarray(k, jnp.float32),
        jnp.asarray(label) if with_label else None,
    )
    out = np.transpose(np.asarray(out), (0, 1, 4, 2, 3))
    np.testing.assert_allclose(out, ref_out, atol=1e-4, rtol=1e-4)


# ---------------------------------------------------------------------------
# DIT1D (1-D token latents)
# ---------------------------------------------------------------------------


@pytest.mark.parametrize(
    "merge_mode,causal,rotary,qk_norm",
    [
        ("share_norm", "video_temporal_causal", False, False),  # dit1d.yaml
        ("share_norm", None, False, True),
        ("reproduce", "temporal_causal", False, False),
        ("share_norm", None, True, False),
    ],
)
def test_dit1d_forward_parity(merge_mode, causal, rotary, qk_norm):
    dit1d = load_reference_module("refalg.dfot.backbones.dit1d.dit_model")
    from omegaconf import DictConfig

    B, T, L, C, D = 2, 4, 8, 4, 64
    cfg = DictConfig(
        dict(
            hidden_size=D,
            depth=2,
            num_heads=4,
            mlp_ratio=2.0,
            learn_sigma=False,
            merge_mode=merge_mode,
            causal_attn_mode=causal,
            use_rotary_emb=rotary,
            qk_norm=qk_norm,
        )
    )
    ref = dit1d.DIT1D(
        cfg,
        x_shape=torch.Size([C, 1, L]),
        max_tokens=T,
        external_cond_type="label",
        external_cond_num_classes=None,
        external_cond_dim=0,
        use_causal_mask=False,
    )
    ref.eval()
    _randomize(ref, seed=14)
    if not rotary:
        # pos_embed is a FROZEN sincos buffer in real checkpoints
        # (dit_model.py:472-475); _randomize scrambled it (it is an
        # nn.Parameter), so restore the table our importer regenerates
        pe = dit1d.get_1d_sincos_pos_embed(D, T * L)
        with torch.no_grad():
            ref.pos_embed.copy_(torch.from_numpy(pe).float().unsqueeze(0))

    from dfot_tpu.models.dit1d import DiT1D, DiT1DSpec
    from dfot_tpu.utils.torch_ckpt import import_dit1d_params

    spec = DiT1DSpec(
        hidden_size=D, depth=2, num_heads=4, mlp_ratio=2.0, learn_sigma=False,
        merge_mode=merge_mode, causal_attn_mode=causal, use_rotary_emb=rotary,
        qk_norm=qk_norm, max_temporal_length=T,
    )
    ours = DiT1D(spec=spec, x_channels=C, n_tokens=L)
    params = import_dit1d_params(_to_np(ref.state_dict()))

    rng = np.random.RandomState(15)
    x = rng.randn(B, T, C, L).astype(np.float32)
    k = rng.randint(0, 1000, size=(B, T)).astype(np.int64)
    with torch.no_grad():
        ref_out = ref(torch.from_numpy(x), torch.from_numpy(k)).numpy()

    x_cl = np.transpose(x, (0, 1, 3, 2))  # (B, T, L, C)
    out = ours.apply({"params": params}, jnp.asarray(x_cl), jnp.asarray(k, jnp.float32))
    out = np.transpose(np.asarray(out), (0, 1, 3, 2))
    np.testing.assert_allclose(out, ref_out, atol=1e-4, rtol=1e-4)


# ---------------------------------------------------------------------------
# UViT3D / UViT3DPose
# ---------------------------------------------------------------------------


def _uvit_cfgs(pose: bool):
    """Tiny 2-level U-ViT mirroring the DFoT_RE10K architecture shape
    (reference configurations/algorithm/backbone/u_vit3d_pose.yaml)."""
    from omegaconf import DictConfig

    cfg = DictConfig(
        dict(
            patch_size=2,
            channels=[32, 64],
            emb_channels=64,
            num_updown_blocks=[2],
            num_mid_blocks=2,
            num_heads=4,
            pos_emb_type="rope",
            use_checkpointing=[False, False],
            block_types=["ResBlock", "TransformerBlock"],
            block_dropouts=[0.0, 0.0],
            temporal_length=4,
            external_cond_dropout=0.1,
            conditioning=dict(dim=6),  # UViT3DPose reads cfg.conditioning.dim
        )
    )
    return cfg


def _our_uvit_spec():
    from dfot_tpu.models.uvit import UViTSpec

    return UViTSpec(
        channels=(32, 64),
        emb_channels=64,
        patch_size=2,
        num_updown_blocks=(2,),
        num_mid_blocks=2,
        num_heads=4,
        pos_emb_type="rope",
        block_types=("ResBlock", "TransformerBlock"),
        block_dropouts=(0.0, 0.0),
        use_checkpointing=(False, False),
        max_temporal_length=4,
    )


def test_uvit3d_forward_parity():
    uvit3d = load_reference_module("refalg.dfot.backbones.u_vit.u_vit3d")
    B, T, H = 2, 4, 8
    ref = uvit3d.UViT3D(
        _uvit_cfgs(pose=False),
        x_shape=torch.Size([3, H, H]),
        max_tokens=T,
        external_cond_dim=0,
        use_causal_mask=False,
    )
    ref.eval()
    _randomize(ref, seed=1)

    from dfot_tpu.models.uvit import UViT3D as OurUViT3D

    ours = OurUViT3D(spec=_our_uvit_spec(), x_channels=3, resolution=H)
    params = import_uvit3d_params(
        _to_np(ref.state_dict()), num_updown_blocks=(2,), num_levels=2, patch_size=2
    )

    rng = np.random.RandomState(2)
    x = rng.randn(B, T, 3, H, H).astype(np.float32)
    k = rng.randint(0, 1000, size=(B, T)).astype(np.int64)

    with torch.no_grad():
        ref_out = ref(torch.from_numpy(x), torch.from_numpy(k)).numpy()

    x_cl = np.transpose(x, (0, 1, 3, 4, 2))
    out = ours.apply({"params": params}, jnp.asarray(x_cl), jnp.asarray(k, jnp.float32))
    out = np.transpose(np.asarray(out), (0, 1, 4, 2, 3))

    np.testing.assert_allclose(out, ref_out, atol=1e-4, rtol=1e-4)


def test_uvit3d_pose_forward_parity():
    """The DFoT_RE10K checkpoint architecture (pose-conditioned U-ViT)."""
    uvit3d_pose = load_reference_module("refalg.dfot.backbones.u_vit.u_vit3d_pose")
    B, T, H, PD = 2, 4, 8, 6  # PD = pose channels (e.g. Pluecker = 6)
    ref = uvit3d_pose.UViT3DPose(
        cfg=_uvit_cfgs(pose=True),
        x_shape=torch.Size([3, H, H]),
        max_tokens=T,
        external_cond_dim=PD,
        use_causal_mask=False,
    )
    ref.eval()
    _randomize(ref, seed=3)

    from dfot_tpu.models.uvit import UViT3DPose as OurUViT3DPose

    ours = OurUViT3DPose(
        spec=_our_uvit_spec(),
        x_channels=3,
        resolution=H,
        external_cond_dim=PD,
        external_cond_dropout=0.1,
    )
    params = import_uvit3d_params(
        _to_np(ref.state_dict()), num_updown_blocks=(2,), num_levels=2, patch_size=2
    )

    rng = np.random.RandomState(4)
    x = rng.randn(B, T, 3, H, H).astype(np.float32)
    pose = rng.randn(B, T, PD, H, H).astype(np.float32)
    k = rng.randint(0, 1000, size=(B, T)).astype(np.int64)

    with torch.no_grad():
        ref_out = ref(
            torch.from_numpy(x), torch.from_numpy(k), torch.from_numpy(pose)
        ).numpy()

    x_cl = np.transpose(x, (0, 1, 3, 4, 2))
    pose_cl = np.transpose(pose, (0, 1, 3, 4, 2))
    out = ours.apply(
        {"params": params},
        jnp.asarray(x_cl),
        jnp.asarray(k, jnp.float32),
        jnp.asarray(pose_cl),
    )
    out = np.transpose(np.asarray(out), (0, 1, 4, 2, 3))

    np.testing.assert_allclose(out, ref_out, atol=1e-4, rtol=1e-4)


# ---------------------------------------------------------------------------
# Diffusion core: schedules / loss weights / DDIM step
# ---------------------------------------------------------------------------


def _make_ref_diffusion(objective="pred_v", strategy="fused_min_snr",
                        use_causal=False):
    dd = load_reference_module("refalg.dfot.diffusion.discrete_diffusion")
    from omegaconf import DictConfig

    cfg = DictConfig(
        dict(
            timesteps=100,
            sampling_timesteps=10,
            beta_schedule="cosine",
            schedule_fn_kwargs={},
            objective=objective,
            loss_weighting=dict(
                strategy=strategy, snr_clip=5.0, cum_snr_decay=0.9,
                sigmoid_bias=-1.0,
            ),
            ddim_sampling_eta=0.0,
            clip_noise=20.0,
            use_causal_mask=False,
        )
    )
    backbone_cfg = DictConfig(
        dict(
            name="dit3d",
            patch_size=2,
            variant="full",
            pos_emb_type="rope_3d",
            hidden_size=32,
            depth=1,
            num_heads=2,
            mlp_ratio=2.0,
            use_gradient_checkpointing=False,
        )
    )
    ref = dd.DiscreteDiffusion(
        cfg,
        backbone_cfg,
        x_shape=torch.Size([2, 8, 8]),
        max_tokens=4,
        external_cond_type="action",
        external_cond_num_classes=None,
        external_cond_dim=0,
    )
    ref.eval()
    _randomize(ref, seed=7)
    # the causal flag only affects fused-min-SNR direction, not the backbone
    ref.use_causal_mask = use_causal
    return ref


def _our_dcfg(objective="pred_v", strategy="fused_min_snr", use_causal=False):
    from dfot_tpu.diffusion import DiffusionConfig

    return DiffusionConfig(
        timesteps=100,
        sampling_timesteps=10,
        objective=objective,
        beta_schedule="cosine",
        loss_weighting_strategy=strategy,
        snr_clip=5.0,
        cum_snr_decay=0.9,
        sigmoid_bias=-1.0,
        ddim_sampling_eta=0.0,
        clip_noise=20.0,
        use_causal_mask=use_causal,
    )


@pytest.mark.parametrize(
    "schedule,kwargs",
    [
        ("cosine", {}),
        ("sigmoid", {}),
        ("sd", {}),
        ("linear", {}),
        ("alphas_cumprod_linear", {}),
        ("cosine_simple_diffusion", dict(shifted=0.125, interpolated=False)),
    ],
)
@pytest.mark.parametrize("zero_terminal_snr", [True, False])
def test_beta_schedule_parity(schedule, kwargs, zero_terminal_snr):
    ref_ns = load_reference_module("refalg.dfot.diffusion.noise_schedule")
    from dfot_tpu.diffusion.schedules import make_beta_schedule

    ref = ref_ns.make_beta_schedule(
        schedule=schedule, timesteps=50, zero_terminal_snr=zero_terminal_snr,
        **kwargs,
    )
    ours = make_beta_schedule(
        schedule=schedule, timesteps=50, zero_terminal_snr=zero_terminal_snr,
        **kwargs,
    )
    np.testing.assert_allclose(np.asarray(ours), ref.numpy(), atol=1e-6, rtol=1e-5)


def test_schedule_buffers_parity():
    from dfot_tpu.diffusion import make_schedule

    ref = _make_ref_diffusion()
    sched = make_schedule(_our_dcfg())
    for name in (
        "betas", "alphas_cumprod", "alphas_cumprod_prev", "sqrt_alphas_cumprod",
        "sqrt_one_minus_alphas_cumprod", "sqrt_recip_alphas_cumprod",
        "sqrt_recipm1_alphas_cumprod", "posterior_variance",
        "posterior_log_variance_clipped", "posterior_mean_coef1",
        "posterior_mean_coef2", "snr", "clipped_snr",
    ):
        np.testing.assert_allclose(
            np.asarray(getattr(sched, name)),
            getattr(ref, name).numpy(),
            atol=1e-5,
            rtol=1e-4,
            err_msg=name,
        )


@pytest.mark.parametrize("objective", ["pred_noise", "pred_x0", "pred_v"])
@pytest.mark.parametrize(
    "strategy", ["uniform", "sigmoid", "min_snr", "fused_min_snr"]
)
@pytest.mark.parametrize("use_causal", [False, True])
def test_loss_weights_parity(objective, strategy, use_causal):
    from dfot_tpu.diffusion import core as dc
    from dfot_tpu.diffusion import make_schedule

    ref = _make_ref_diffusion(objective, strategy, use_causal)
    # reference reads objective off self at weight time
    ref.objective = objective
    dcfg = _our_dcfg(objective, strategy, use_causal)
    sched = make_schedule(dcfg)

    k = np.random.RandomState(11).randint(0, 100, size=(3, 8))
    with torch.no_grad():
        ref_w = ref.compute_loss_weights(torch.from_numpy(k), strategy)
        ref_w = ref_w.float().numpy()
    ours = np.asarray(dc.compute_loss_weights(sched, dcfg, jnp.asarray(k)))
    np.testing.assert_allclose(ours, ref_w, atol=1e-5, rtol=1e-4)


def test_ddim_idx_to_noise_level_parity():
    from dfot_tpu.diffusion.core import ddim_idx_to_noise_level

    ref = _make_ref_diffusion()
    idx = np.arange(11).reshape(1, -1)
    ref_k = ref.ddim_idx_to_noise_level(torch.from_numpy(idx)).numpy()
    ours = ddim_idx_to_noise_level(100, 10, idx)
    np.testing.assert_array_equal(np.asarray(ours), ref_k)


def test_q_sample_parity():
    from dfot_tpu.diffusion import core as dc
    from dfot_tpu.diffusion import make_schedule

    ref = _make_ref_diffusion()
    sched = make_schedule(_our_dcfg())
    rng = np.random.RandomState(5)
    x = rng.randn(2, 4, 2, 8, 8).astype(np.float32)
    noise = rng.randn(*x.shape).astype(np.float32)
    k = rng.randint(0, 100, size=(2, 4))
    with torch.no_grad():
        ref_q = ref.q_sample(
            torch.from_numpy(x), torch.from_numpy(k), torch.from_numpy(noise)
        ).numpy()
    ours = np.asarray(
        dc.q_sample(sched, jnp.asarray(x), jnp.asarray(k), jnp.asarray(noise))
    )
    np.testing.assert_allclose(ours, ref_q, atol=1e-5, rtol=1e-4)

    # re-noising for go-back sampling (q_sample_from_x_k)
    k_next = np.minimum(k + rng.randint(0, 30, size=k.shape), 99)
    with torch.no_grad():
        ref_r = ref.q_sample_from_x_k(
            torch.from_numpy(x), torch.from_numpy(k), torch.from_numpy(k_next),
            torch.from_numpy(noise),
        ).numpy()
    # the reference hardcodes the ==999 guard (written for timesteps=1000);
    # pass timesteps=1000 so our parametrized guard matches it
    ours_r = np.asarray(
        dc.q_sample_from_x_k(
            sched, 1000, jnp.asarray(x), jnp.asarray(k), jnp.asarray(k_next),
            jnp.asarray(noise),
        )
    )
    np.testing.assert_allclose(ours_r, ref_r, atol=1e-5, rtol=1e-4)


def test_ddim_sample_step_parity():
    """Full network-in-the-loop DDIM step (eta=0) with per-token levels,
    including frozen (curr==next) and fully-denoised (next=-1) tokens
    (reference discrete_diffusion.py:454-538)."""
    from dfot_tpu.diffusion import core as dc
    from dfot_tpu.diffusion import make_schedule
    from dfot_tpu.models.dit import DiT3D, DiTSpec

    ref = _make_ref_diffusion()
    dcfg = _our_dcfg()
    sched = make_schedule(dcfg)

    # our backbone with the reference's weights (strip the 'model.' prefix)
    state = {
        key[len("model."):]: val.detach().numpy().astype(np.float32)
        for key, val in ref.state_dict().items()
        if key.startswith("model.")
    }
    params = import_dit3d_params(state)
    spec = DiTSpec(
        hidden_size=32, depth=1, num_heads=2, mlp_ratio=2.0, variant="full",
        pos_emb_type="rope_3d", patch_size=2, max_temporal_length=4,
    )
    model = DiT3D(spec=spec, x_channels=2, resolution=(8, 8))

    rng = np.random.RandomState(6)
    B, T = 2, 4
    x = rng.randn(B, T, 2, 8, 8).astype(np.float32)
    curr = np.array([[88, 55, 55, 0], [99, 88, 11, 11]], np.int64)
    nxt = np.array([[55, 33, 55, -1], [88, 55, -1, 11]], np.int64)

    with torch.no_grad():
        ref_out = ref.ddim_sample_step(
            torch.from_numpy(x), torch.from_numpy(curr), torch.from_numpy(nxt),
            None,
        ).numpy()

    x_cl = jnp.asarray(np.transpose(x, (0, 1, 3, 4, 2)))
    kc = jnp.clip(jnp.asarray(curr), 0, None)
    model_out = model.apply({"params": params}, x_cl, kc.astype(jnp.float32))
    pred = dc.model_predictions(sched, dcfg, x_cl, kc, model_out)
    out = dc.ddim_step(
        sched, dcfg, x_cl, jnp.asarray(curr), jnp.asarray(nxt), pred,
        jnp.zeros_like(x_cl),
    )
    out = np.transpose(np.asarray(out), (0, 1, 4, 2, 3))
    np.testing.assert_allclose(out, ref_out, atol=1e-4, rtol=1e-4)


# ---------------------------------------------------------------------------
# RAFT optical flow (eval model)
# ---------------------------------------------------------------------------


def test_raft_forward_parity():
    """Flax RAFT vs the reference torch RAFT (metrics/video/models/raft):
    identical random weights, identical images -> same flow field. Covers
    the encoders (instance + frozen batch norm), the correlation pyramid
    lookup, the scanned GRU refinement, and convex upsampling."""
    raft_ref = load_reference_module(
        "algorithms.common.metrics.video.models.raft.raft"
    )

    class Args(dict):
        __getattr__ = dict.__getitem__
        __setattr__ = dict.__setitem__

    args = Args(small=False, mixed_precision=False, alternate_corr=False)
    ref = raft_ref.RAFT(args)
    ref.eval()
    _randomize(ref, seed=21)
    # batch-norm running stats are buffers (not parameters): give them
    # non-degenerate values too, as a real checkpoint would
    g = torch.Generator().manual_seed(22)
    with torch.no_grad():
        for name, b in ref.named_buffers():
            if name.endswith("running_mean"):
                b.copy_(torch.randn(b.shape, generator=g) * 0.05)
            elif name.endswith("running_var"):
                b.copy_(1.0 + 0.1 * torch.rand(b.shape, generator=g))

    from dfot_tpu.metrics.raft import RAFT, import_raft_params

    iters = 4
    ours = RAFT(iters=iters)
    params = import_raft_params(
        {k: v.detach().numpy() for k, v in ref.state_dict().items()}
    )

    rng = np.random.RandomState(23)
    img1 = (rng.rand(1, 3, 128, 128) * 255).astype(np.float32)
    img2 = (rng.rand(1, 3, 128, 128) * 255).astype(np.float32)

    with torch.no_grad():
        _, flow_ref = ref(
            torch.from_numpy(img1), torch.from_numpy(img2),
            iters=iters, test_mode=True,
        )
    flow_ref = flow_ref.numpy()  # (1, 2, H, W)

    out = ours.apply(
        {"params": params},
        jnp.asarray(np.transpose(img1, (0, 2, 3, 1))),
        jnp.asarray(np.transpose(img2, (0, 2, 3, 1))),
    )
    out = np.transpose(np.asarray(out), (0, 3, 1, 2))
    np.testing.assert_allclose(out, flow_ref, atol=1e-3, rtol=1e-3)


# ---------------------------------------------------------------------------
# AMT-S frame interpolation (eval model)
# ---------------------------------------------------------------------------


def test_amt_s_forward_parity():
    """Flax AMT-S vs the reference torch AMT-S (metrics/video/models/amt):
    identical random weights + frames -> same interpolated middle frame.
    Covers the instance-norm feature encoder, the bidirectional correlation
    pyramid, all four decoder levels with warping, the per-level update
    blocks (incl. their internal resizes), and multi-flow combination."""
    amt_ref = load_reference_module(
        "algorithms.common.metrics.video.models.amt.amt_s"
    )
    ref = amt_ref.AMT_S(corr_radius=3, corr_lvls=4, num_flows=3)
    ref.eval()
    _randomize(ref, seed=31)

    from dfot_tpu.metrics.amt import AMT_S, import_amt_params

    ours = AMT_S()
    params = import_amt_params(
        {k: v.detach().numpy() for k, v in ref.state_dict().items()}
    )

    rng = np.random.RandomState(32)
    img0 = rng.rand(1, 3, 128, 128).astype(np.float32)
    img1 = rng.rand(1, 3, 128, 128).astype(np.float32)
    embt = torch.ones(1, 1, 1, 1) * 0.5

    with torch.no_grad():
        ref_out = ref(
            torch.from_numpy(img0), torch.from_numpy(img1), embt, eval=True
        )["imgt_pred"].numpy()

    out = ours.apply(
        {"params": params},
        jnp.asarray(np.transpose(img0, (0, 2, 3, 1))),
        jnp.asarray(np.transpose(img1, (0, 2, 3, 1))),
        jnp.full((1,), 0.5),
    )
    out = np.transpose(np.asarray(out), (0, 3, 1, 2))
    np.testing.assert_allclose(out, ref_out, atol=1e-4, rtol=1e-4)


# ---------------------------------------------------------------------------
# PIPS2 point tracking (eval model)
# ---------------------------------------------------------------------------


def test_pips2_forward_parity():
    """Flax Pips vs the reference torch Pips (metrics/video/models/pips2):
    identical random weights + frames + query grid -> same trajectories.
    Covers the multi-scale instance-norm encoder (align-corners resizes),
    per-iteration correlation pyramids with temporal context (t, t-2, t-4),
    the 1-D ResNet delta block, and the beautify/lock-frame-0 loop."""
    pips_ref = load_reference_module(
        "algorithms.common.metrics.video.models.pips2"
    )
    ref = pips_ref.Pips(stride=8)
    ref.eval()
    _randomize(ref, seed=41)

    from dfot_tpu.metrics.pips import Pips, import_pips_params

    params = import_pips_params(
        {k: v.detach().numpy() for k, v in ref.state_dict().items()}
    )

    rng = np.random.RandomState(42)
    S, N, H = 6, 16, 128
    rgbs = (rng.rand(1, S, 3, H, H) * 2 - 1).astype(np.float32)
    side = 4
    lin = 8 + np.arange(side, dtype=np.float32) / (side - 1) * (H - 16)
    gy, gx = np.meshgrid(lin, lin, indexing="ij")
    pts = np.stack([gx.reshape(-1), gy.reshape(-1)], -1)  # (N, 2)
    trajs0 = np.broadcast_to(pts[None, None], (1, S, N, 2)).copy()

    # NOTE on tolerances: with random (untrained) weights the refinement
    # loop is chaotic — a float-level delta difference moves the next
    # iteration's correlation-window sample points, so trajectory error
    # grows multiplicatively per iteration. iters=1 checks the whole
    # pipeline tightly; iters=2 additionally exercises the t-2/t-4
    # temporal-context resampling path (itr >= 1) at a looser tolerance.
    for iters, atol in ((1, 1e-2), (2, 0.2)):
        with torch.no_grad():
            preds = ref(
                torch.from_numpy(trajs0.copy()), torch.from_numpy(rgbs),
                iters=iters, feat_init=None, beautify=True,
            )
        ref_out = preds[-1].numpy()[0]  # (S, N, 2)

        out = Pips(iters=iters, beautify=True).apply(
            {"params": params},
            jnp.asarray(trajs0[0]),
            jnp.asarray(np.transpose(rgbs[0], (0, 2, 3, 1))),
        )
        np.testing.assert_allclose(np.asarray(out), ref_out, atol=atol)


# ---------------------------------------------------------------------------
# Unet3D
# ---------------------------------------------------------------------------


@pytest.mark.parametrize("use_causal_mask", [True, False])
def test_unet3d_forward_parity(use_causal_mask):
    """Flax UNet3D vs the reference torch Unet3D (backbones/u_net): pseudo-3D
    res blocks with FiLM, time-spanning GroupNorm, LayerNorm'd spatial
    (incl. linear) + rotary temporal attention, nearest-up/strided-down."""
    # the reference Attention probes CUDA properties at construction; fake it
    class _Props:
        major, minor = 8, 0

    orig = torch.cuda.get_device_properties
    torch.cuda.get_device_properties = lambda *_: _Props()
    try:
        unet = load_reference_module("refalg.dfot.backbones.u_net.u_net3d")
        from omegaconf import DictConfig

        B, T, H = 2, 4, 16
        cfg = DictConfig(
            dict(
                network_size=16,
                num_res_blocks=2,
                resnet_block_groups=4,
                dim_mults=[1, 2],
                attn_resolutions=[8, 16],
                attn_dim_head=8,
                attn_heads=2,
                use_linear_attn=True,
                use_init_temporal_attn=True,
                init_kernel_size=7,
                dropout=0.0,
                noise_level_dropout=0.0,
                external_cond_dropout=0.0,
                use_fourier_noise_embedding=False,
            )
        )
        # NOTE: the reference Unet3D passes its args POSITIONALLY into a
        # BaseBackbone whose signature gained external_cond_type/
        # num_classes in between (u_net3d.py:34-40 vs base_backbone.py:
        # 14-23), so any external_cond_dim > 0 crashes at construction
        # ("Unknown external condition type: True") — the action-cond path
        # is dead code there. Parity is therefore tested unconditioned;
        # the cond-embedding import rules are covered by the DiT3D/UViT3D
        # parity tests which share them.
        ref = unet.Unet3D(
            cfg,
            x_shape=torch.Size([3, H, H]),
            max_tokens=T,
            external_cond_dim=0,
            use_causal_mask=use_causal_mask,
        )
        ref.eval()
        _randomize(ref, seed=51)
    finally:
        torch.cuda.get_device_properties = orig

    from dfot_tpu.models.unet3d import UNet3D, UNet3DSpec
    from dfot_tpu.utils.torch_ckpt import import_unet3d_params

    spec = UNet3DSpec(
        network_size=16, num_res_blocks=2, resnet_block_groups=4,
        dim_mults=(1, 2), attn_resolutions=(8, 16), attn_dim_head=8,
        attn_heads=2, use_linear_attn=True, use_init_temporal_attn=True,
        init_kernel_size=7, max_temporal_length=T,
    )
    ours = UNet3D(
        spec=spec, x_channels=3, resolution=H, use_causal_mask=use_causal_mask,
    )
    params = import_unet3d_params(
        _to_np(ref.state_dict()), num_res_blocks=2, num_levels=2
    )

    rng = np.random.RandomState(52)
    x = rng.randn(B, T, 3, H, H).astype(np.float32)
    k = rng.randint(0, 1000, size=(B, T)).astype(np.int64)
    with torch.no_grad():
        ref_out = ref(torch.from_numpy(x), torch.from_numpy(k)).numpy()

    x_cl = np.transpose(x, (0, 1, 3, 4, 2))
    out = ours.apply(
        {"params": params},
        jnp.asarray(x_cl),
        jnp.asarray(k, jnp.float32),
    )
    out = np.transpose(np.asarray(out), (0, 1, 4, 2, 3))
    np.testing.assert_allclose(out, ref_out, atol=1e-4, rtol=1e-4)
