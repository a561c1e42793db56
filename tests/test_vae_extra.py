"""Tests for the extra tokenizer families: AutoencoderKL import, DC-AE, TiTok."""

import jax
import jax.numpy as jnp
import numpy as np
import pytest

from dfot_tpu.vae import (
    DCAE,
    AutoencoderKL,
    DCAEConfig,
    ImageVAEConfig,
    TiTokConfig,
    TiTokKL,
    import_diffusers_vae_params,
)


def test_dcae_roundtrip_shapes():
    cfg = DCAEConfig(
        latent_channels=8, width_list=(32, 64, 64), depth_list=(1, 1, 1),
        attention_levels=(2,),
    )
    model = DCAE(cfg)
    x = jax.random.normal(jax.random.PRNGKey(0), (1, 32, 32, 3))
    variables = model.init(jax.random.PRNGKey(1), x)
    z = model.apply(variables, x, method=model.encode)
    # stem 2x + 2 stage downs = 8x spatial compression
    assert z.shape == (1, 4, 4, 8)
    out = model.apply(variables, z, method=model.decode)
    assert out.shape == x.shape
    assert np.isfinite(np.asarray(out)).all()


def test_titok_roundtrip_shapes():
    cfg = TiTokConfig(resolution=32, patch_size=8, num_latent_tokens=8,
                      z_channels=4, hidden_size=64, depth=2, heads=2)
    model = TiTokKL(cfg)
    x = jax.random.normal(jax.random.PRNGKey(0), (2, 32, 32, 3))
    variables = model.init(jax.random.PRNGKey(1), x, jax.random.PRNGKey(2))
    posterior = model.apply(variables, x, method=model.encode)
    assert posterior.mean.shape == (2, 8, 4)  # N 1-D tokens of z channels
    out = model.apply(variables, posterior.mode(), method=model.decode)
    assert out.shape == x.shape


def _rand(shape):
    return np.random.RandomState(abs(hash(shape)) % 2**31).randn(*shape).astype(np.float32) * 0.05


def test_diffusers_vae_import_structural():
    """A synthetic diffusers-format state dict maps exactly onto the flax tree."""
    cfg = ImageVAEConfig(
        ch=32, ch_mult=(1, 2), num_res_blocks=1, resolution=16, z_channels=4,
        embed_dim=4,
    )
    model = AutoencoderKL(cfg)
    x = jnp.zeros((1, 16, 16, 3))
    target = model.init(jax.random.PRNGKey(0), x, jax.random.PRNGKey(1))["params"]

    def resnet(prefix, cin, cout):
        d = {
            f"{prefix}.norm1.weight": _rand((cin,)),
            f"{prefix}.norm1.bias": _rand((cin,)),
            f"{prefix}.conv1.weight": _rand((cout, cin, 3, 3)),
            f"{prefix}.conv1.bias": _rand((cout,)),
            f"{prefix}.norm2.weight": _rand((cout,)),
            f"{prefix}.norm2.bias": _rand((cout,)),
            f"{prefix}.conv2.weight": _rand((cout, cout, 3, 3)),
            f"{prefix}.conv2.bias": _rand((cout,)),
        }
        if cin != cout:
            d[f"{prefix}.conv_shortcut.weight"] = _rand((cout, cin, 1, 1))
            d[f"{prefix}.conv_shortcut.bias"] = _rand((cout,))
        return d

    def attn(prefix, ch):
        d = {
            f"{prefix}.group_norm.weight": _rand((ch,)),
            f"{prefix}.group_norm.bias": _rand((ch,)),
        }
        for n in ("to_q", "to_k", "to_v", "to_out.0"):
            d[f"{prefix}.{n}.weight"] = _rand((ch, ch))
            d[f"{prefix}.{n}.bias"] = _rand((ch,))
        return d

    state = {
        "encoder.conv_in.weight": _rand((32, 3, 3, 3)),
        "encoder.conv_in.bias": _rand((32,)),
        "encoder.conv_out.weight": _rand((8, 64, 3, 3)),
        "encoder.conv_out.bias": _rand((8,)),
        "encoder.conv_norm_out.weight": _rand((64,)),
        "encoder.conv_norm_out.bias": _rand((64,)),
        "decoder.conv_in.weight": _rand((64, 4, 3, 3)),
        "decoder.conv_in.bias": _rand((64,)),
        "decoder.conv_out.weight": _rand((3, 32, 3, 3)),
        "decoder.conv_out.bias": _rand((3,)),
        "decoder.conv_norm_out.weight": _rand((32,)),
        "decoder.conv_norm_out.bias": _rand((32,)),
        "quant_conv.weight": _rand((8, 8, 1, 1)),
        "quant_conv.bias": _rand((8,)),
        "post_quant_conv.weight": _rand((4, 4, 1, 1)),
        "post_quant_conv.bias": _rand((4,)),
        # encoder downs: level0 (32->32) + channel-preserving downsampler;
        # level1's first resnet changes channels (32->64, conv_shortcut)
        **resnet("encoder.down_blocks.0.resnets.0", 32, 32),
        "encoder.down_blocks.0.downsamplers.0.conv.weight": _rand((32, 32, 3, 3)),
        "encoder.down_blocks.0.downsamplers.0.conv.bias": _rand((32,)),
        **resnet("encoder.down_blocks.1.resnets.0", 32, 64),
        # mid blocks both sides
        **resnet("encoder.mid_block.resnets.0", 64, 64),
        **resnet("encoder.mid_block.resnets.1", 64, 64),
        **attn("encoder.mid_block.attentions.0", 64),
        **resnet("decoder.mid_block.resnets.0", 64, 64),
        **resnet("decoder.mid_block.resnets.1", 64, 64),
        **attn("decoder.mid_block.attentions.0", 64),
        # decoder ups: diffusers up_blocks.0 = top level (our i=1), .1 = i=0
        **resnet("decoder.up_blocks.0.resnets.0", 64, 64),
        **resnet("decoder.up_blocks.0.resnets.1", 64, 64),
        "decoder.up_blocks.0.upsamplers.0.conv.weight": _rand((64, 64, 3, 3)),
        "decoder.up_blocks.0.upsamplers.0.conv.bias": _rand((64,)),
        **resnet("decoder.up_blocks.1.resnets.0", 64, 32),
        **resnet("decoder.up_blocks.1.resnets.1", 32, 32),
    }
    params = import_diffusers_vae_params(state)

    def shapes(tree, prefix=""):
        out = {}
        for k, v in tree.items():
            p = f"{prefix}/{k}" if prefix else k
            if isinstance(v, dict):
                out.update(shapes(v, p))
            else:
                out[p] = tuple(v.shape)
        return out

    si, st = shapes(params), shapes(target)
    # our encoder/decoder use nin_shortcut only when channels change; the
    # diffusers dict matches the same structure
    assert si == st, set(si) ^ set(st)
    # imported weights must run
    recon, post = model.apply({"params": params}, x, jax.random.PRNGKey(2))
    assert np.isfinite(np.asarray(recon)).all()
