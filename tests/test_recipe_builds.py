"""Every (algorithm, backbone) recipe must build from its config and run one
forward through the real factory — the CLI path, not hand-constructed specs.

Guards against factory/config drift (e.g. a kwarg one backbone family does
not accept), which unit tests on the models themselves cannot catch.
"""

import jax
import jax.numpy as jnp
import numpy as np
import pytest

from dfot_tpu.config import load_config

# per-family tiny-size overrides (GroupNorm needs channels >= 32)
_DIT_TINY = [
    "++algorithm.backbone.hidden_size=32",
    "++algorithm.backbone.depth=1",
    "++algorithm.backbone.num_heads=2",
    "++algorithm.backbone.use_gradient_checkpointing=false",
]
_UVIT_TINY = [
    "++algorithm.backbone.channels=[32,64]",
    "++algorithm.backbone.emb_channels=64",
    "++algorithm.backbone.num_updown_blocks=[1]",
    "++algorithm.backbone.num_mid_blocks=1",
    "++algorithm.backbone.num_heads=2",
    "++algorithm.backbone.block_types=[ResBlock,TransformerBlock]",
    "++algorithm.backbone.block_dropouts=[0.0,0.0]",
    "++algorithm.backbone.use_checkpointing=[false,false]",
]
_UNET_TINY = [
    "++algorithm.backbone.network_size=32",
    "++algorithm.backbone.num_res_blocks=1",
    "++algorithm.backbone.attn_heads=2",
]

RECIPES = [
    ("dfot_video", "dit3d", _DIT_TINY, "ucf_101"),
    ("dfot_video", "dit3d_factorized_attention", _DIT_TINY, "ucf_101"),
    ("dfot_video", "dit3d_full_matrix", _DIT_TINY, "ucf_101"),
    ("dfot_video", "dit3d_factorized_matrix", _DIT_TINY, "ucf_101"),
    ("dfot_video", "u_vit3d", _UVIT_TINY, "ucf_101"),
    ("dfot_video", "u_net3d", _UNET_TINY, "ucf_101"),
    ("dfot_video", "far_dit",
     _DIT_TINY + ["++algorithm.backbone.axes_dims_rope=[4,6,6]"], "ucf_101"),
    ("dfot_video_pose", "dit3d_pose", _DIT_TINY, "realestate10k_mini"),
    ("dfot_video_pose", "u_vit3d_pose", _UVIT_TINY, "realestate10k_mini"),
    ("difference_dfot_video", "difference_dit3d", _DIT_TINY, "ucf_101"),
    # standard-diffusion baselines: same classes, full-sequence noise +
    # fixed context (reference registry experiments/video_generation.py:25-26)
    ("sd_video", "dit3d", _DIT_TINY, "ucf_101"),
    ("sd_video_3d", "u_vit3d_pose", _UVIT_TINY, "realestate10k_mini"),
]


@pytest.mark.parametrize(
    "algo,backbone,tiny,dataset",
    RECIPES,
    ids=[f"{a}-{b}" for a, b, _, d in RECIPES],
)
def test_recipe_builds_and_forwards(algo, backbone, tiny, dataset):
    from dfot_tpu.algorithms import build_algorithm

    cfg = load_config(
        [
            "+name=build_smoke",
            f"dataset={dataset}",
            f"algorithm={algo}",
            f"algorithm/backbone={backbone}",
            "experiment=video_generation",
            "dataset.resolution=16",
            "dataset.max_frames=4",
            "dataset.context_length=1",
            "++dataset.latent.enabled=false",
            "++dataset.subdataset_size=null",
            "++dataset.augmentation=null",
        ]
        + tiny
    )
    a = build_algorithm(cfg, compute_dtype=jnp.float32)
    variables = a.init_params(jax.random.PRNGKey(0))
    # one denoiser forward through the algo's sampling apply fn
    T = 2 * a.max_tokens if algo == "difference_dfot_video" else a.max_tokens
    h, w, c = a.x_shape
    x = jnp.zeros((1, T, h, w, c))
    k = jnp.zeros((1, T))
    cond = a._dummy_condition(1, T)
    out = a._sample_apply(variables, x, k, cond, None)
    assert out.shape == x.shape
    assert np.isfinite(np.asarray(out)).all()
