"""Torch-checkpoint importer tests.

Two layers of validation:
1. numerical: the layout converters reproduce torch conv / convT / linear
   semantics exactly (checked against torch.nn.functional on CPU),
2. structural: a synthetic reference-shaped state dict (torch module names +
   torch tensor layouts) imports onto the flax param tree with every leaf
   present and shape-correct, and the imported network runs.
"""

import numpy as np
import pytest

import jax
import jax.numpy as jnp

from dfot_tpu.models.dit import DiT3D, DiTSpec
from dfot_tpu.models.uvit import UViT3D, UViTSpec
from dfot_tpu.utils.torch_ckpt import (
    import_dit3d_params,
    import_uvit3d_params,
    linear_w,
    patchify_conv_w,
    unpatchify_convT_w,
)

torch = pytest.importorskip("torch")


# ---------------------------------------------------------------------------
# numerical layout conversions vs torch ops
# ---------------------------------------------------------------------------


def test_patchify_conv_equivalence():
    rng = np.random.RandomState(0)
    C, D, p, H = 3, 8, 2, 6
    w = rng.randn(D, C, p, p).astype(np.float32)
    b = rng.randn(D).astype(np.float32)
    x = rng.randn(1, C, H, H).astype(np.float32)
    ref = torch.nn.functional.conv2d(
        torch.from_numpy(x), torch.from_numpy(w), torch.from_numpy(b), stride=p
    ).numpy()  # (1, D, H/p, H/p)

    # ours: channel-last patches @ converted kernel
    xl = x.transpose(0, 2, 3, 1)  # (1, H, H, C)
    xp = xl.reshape(1, H // p, p, H // p, p, C).transpose(0, 1, 3, 2, 4, 5)
    xp = xp.reshape(1, (H // p) ** 2, p * p * C)
    out = xp @ patchify_conv_w(w) + b
    out = out.reshape(1, H // p, H // p, D).transpose(0, 3, 1, 2)
    np.testing.assert_allclose(out, ref, atol=1e-5)


def test_unpatchify_convT_equivalence():
    rng = np.random.RandomState(1)
    C_in, C_out, p, h = 8, 3, 2, 3
    w = rng.randn(C_in, C_out, p, p).astype(np.float32)
    b = rng.randn(C_out).astype(np.float32)
    x = rng.randn(1, C_in, h, h).astype(np.float32)
    ref = torch.nn.functional.conv_transpose2d(
        torch.from_numpy(x), torch.from_numpy(w), torch.from_numpy(b), stride=p
    ).numpy()  # (1, C_out, h*p, h*p)

    xl = x.transpose(0, 2, 3, 1)  # (1, h, h, C_in)
    out = xl @ unpatchify_convT_w(w) + np.tile(b, p * p)
    out = out.reshape(1, h, h, p, p, C_out)
    out = np.moveaxis(out, 3, 2).reshape(1, h * p, h * p, C_out)
    out = out.transpose(0, 3, 1, 2)
    np.testing.assert_allclose(out, ref, atol=1e-5)


def test_linear_equivalence():
    rng = np.random.RandomState(2)
    w = rng.randn(5, 7).astype(np.float32)
    x = rng.randn(2, 7).astype(np.float32)
    ref = torch.nn.functional.linear(torch.from_numpy(x), torch.from_numpy(w)).numpy()
    np.testing.assert_allclose(x @ linear_w(w), ref, atol=1e-5)


# ---------------------------------------------------------------------------
# structural import: synthetic reference-shaped state dicts
# ---------------------------------------------------------------------------


def _shapes(tree, prefix=""):
    out = {}
    for k, v in tree.items():
        path = f"{prefix}/{k}" if prefix else k
        if isinstance(v, dict):
            out.update(_shapes(v, path))
        else:
            out[path] = tuple(v.shape)
    return out


def _rand(shape):
    return np.random.RandomState(abs(hash(shape)) % 2**31).randn(*shape).astype(np.float32)


def test_import_dit3d_structural():
    # spatial_mlp_ratio drives the MLPs of full-variant blocks (the reference
    # full variant has none unless it is set, dit_base.py:189-194)
    spec = DiTSpec(
        hidden_size=64, depth=2, num_heads=2, mlp_ratio=2.0,
        spatial_mlp_ratio=2.0,
        variant="full", pos_emb_type="rope_3d", patch_size=2, max_temporal_length=2,
    )
    model = DiT3D(spec=spec, x_channels=3, resolution=(8, 8))
    target = model.init(
        {"params": jax.random.PRNGKey(0), "dropout": jax.random.PRNGKey(1)},
        jnp.zeros((1, 2, 8, 8, 3)), jnp.zeros((1, 2)),
    )["params"]

    D, mlp = 64, 128
    state = {
        "patch_embedder.proj.weight": _rand((D, 3, 2, 2)),
        "patch_embedder.proj.bias": _rand((D,)),
        "noise_level_pos_embedding.embedding.linear_1.weight": _rand((D, 256)),
        "noise_level_pos_embedding.embedding.linear_1.bias": _rand((D,)),
        "noise_level_pos_embedding.embedding.linear_2.weight": _rand((D, D)),
        "noise_level_pos_embedding.embedding.linear_2.bias": _rand((D,)),
        "dit_base.final_layer.norm_final.modulation.1.weight": _rand((2 * D, D)),
        "dit_base.final_layer.norm_final.modulation.1.bias": _rand((2 * D,)),
        "dit_base.final_layer.linear.weight": _rand((12, D)),
        "dit_base.final_layer.linear.bias": _rand((12,)),
    }
    for i in range(2):
        state.update({
            f"dit_base.blocks.{i}.norm1.modulation.1.weight": _rand((3 * D, D)),
            f"dit_base.blocks.{i}.norm1.modulation.1.bias": _rand((3 * D,)),
            f"dit_base.blocks.{i}.norm2.modulation.1.weight": _rand((3 * D, D)),
            f"dit_base.blocks.{i}.norm2.modulation.1.bias": _rand((3 * D,)),
            f"dit_base.blocks.{i}.attn.qkv.weight": _rand((3 * D, D)),
            f"dit_base.blocks.{i}.attn.qkv.bias": _rand((3 * D,)),
            f"dit_base.blocks.{i}.attn.proj.weight": _rand((D, D)),
            f"dit_base.blocks.{i}.attn.proj.bias": _rand((D,)),
            f"dit_base.blocks.{i}.mlp.fc1.weight": _rand((mlp, D)),
            f"dit_base.blocks.{i}.mlp.fc1.bias": _rand((mlp,)),
            f"dit_base.blocks.{i}.mlp.fc2.weight": _rand((D, mlp)),
            f"dit_base.blocks.{i}.mlp.fc2.bias": _rand((D,)),
        })

    params = import_dit3d_params(state)
    assert _shapes(params) == _shapes(target)

    # imported params must run
    out = model.apply({"params": params}, jnp.ones((1, 2, 8, 8, 3)), jnp.zeros((1, 2)))
    assert np.isfinite(np.asarray(out)).all()


def test_import_uvit3d_structural():
    spec = UViTSpec(
        channels=(32, 64), emb_channels=64, patch_size=2,
        block_types=("ResBlock", "TransformerBlock"),
        block_dropouts=(0.0, 0.0), num_updown_blocks=(2,), num_mid_blocks=1,
        num_heads=2, max_temporal_length=2,
    )
    model = UViT3D(spec=spec, x_channels=3, resolution=16)
    target = model.init(
        {"params": jax.random.PRNGKey(0), "dropout": jax.random.PRNGKey(1)},
        jnp.zeros((1, 2, 16, 16, 3)), jnp.zeros((1, 2)),
    )["params"]

    E = 64

    def resblock(prefix, ch):
        return {
            f"{prefix}.in_layers.0.weight": _rand((ch,)),
            f"{prefix}.in_layers.0.bias": _rand((ch,)),
            f"{prefix}.in_layers.2.weight": _rand((ch, ch, 3, 3)),
            f"{prefix}.in_layers.2.bias": _rand((ch,)),
            f"{prefix}.emb_layer.weight": _rand((2 * ch, E, 1, 1)),
            f"{prefix}.emb_layer.bias": _rand((2 * ch,)),
            f"{prefix}.out_norm.weight": _rand((ch,)),
            f"{prefix}.out_norm.bias": _rand((ch,)),
            f"{prefix}.out_rest.1.weight": _rand((ch, ch, 3, 3)),
            f"{prefix}.out_rest.1.bias": _rand((ch,)),
        }

    def txblock(prefix, ch):
        return {
            f"{prefix}.norm.emb_layer.weight": _rand((2 * ch, E)),
            f"{prefix}.norm.emb_layer.bias": _rand((2 * ch,)),
            f"{prefix}.norm.norm.weight": _rand((ch,)),
            f"{prefix}.fused_attn_mlp_proj.weight": _rand((3 * ch + 4 * ch, ch)),
            f"{prefix}.fused_attn_mlp_proj.bias": _rand((3 * ch + 4 * ch,)),
            f"{prefix}.q_norm.weight": _rand((ch // 2,)),
            f"{prefix}.k_norm.weight": _rand((ch // 2,)),
            f"{prefix}.attn_out.weight": _rand((ch, ch)),
            f"{prefix}.attn_out.bias": _rand((ch,)),
            f"{prefix}.mlp_out.2.weight": _rand((ch, 4 * ch)),
            f"{prefix}.mlp_out.2.bias": _rand((ch,)),
        }

    state = {
        "embed_input.proj.weight": _rand((32, 3, 2, 2)),
        "embed_input.proj.bias": _rand((32,)),
        "project_output.proj.weight": _rand((32, 3, 2, 2)),
        "project_output.proj.bias": _rand((3,)),
        "noise_level_pos_embedding.embedding.linear_1.weight": _rand((E, 256)),
        "noise_level_pos_embedding.embedding.linear_1.bias": _rand((E,)),
        "noise_level_pos_embedding.embedding.linear_2.weight": _rand((E, E)),
        "noise_level_pos_embedding.embedding.linear_2.bias": _rand((E,)),
        "down_blocks.0.2.conv.weight": _rand((64, 32, 3, 3)),  # Downsample
        "down_blocks.0.2.conv.bias": _rand((64,)),
        "up_blocks.0.0.conv.weight": _rand((32, 64, 3, 3)),  # Upsample
        "up_blocks.0.0.conv.bias": _rand((32,)),
    }
    state.update(resblock("down_blocks.0.0", 32))
    state.update(resblock("down_blocks.0.1", 32))
    state.update(txblock("mid_blocks.0", 64))
    state.update(resblock("up_blocks.0.1", 32))
    state.update(resblock("up_blocks.0.2", 32))

    params = import_uvit3d_params(state, num_updown_blocks=(2,), num_levels=2)
    assert _shapes(params) == _shapes(target)

    out = model.apply({"params": params}, jnp.ones((1, 2, 16, 16, 3)), jnp.zeros((1, 2)))
    assert np.isfinite(np.asarray(out)).all()
