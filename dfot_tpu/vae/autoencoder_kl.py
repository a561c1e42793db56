"""AutoencoderKL: diffusers kl-f8 first-stage wrapper.

The reference wraps diffusers' AutoencoderKL (algorithms/vae/autoencoder_kl/)
— architecturally the same CompVis KL autoencoder as our ImageVAE. This
module provides (a) the class alias with the kl-f8 default config and (b) an
importer translating diffusers' torch state-dict names onto our flax tree so
public checkpoints (sd-vae-ft-*, kl-f8) load directly.
"""

from __future__ import annotations

import re
from typing import Any, Dict

import numpy as np

from ..utils.torch_ckpt import conv_w, linear_w
from .image_vae import ImageVAE, ImageVAEConfig

__all__ = ["AutoencoderKL", "KL_F8_CONFIG", "import_diffusers_vae_params"]

KL_F8_CONFIG = ImageVAEConfig(
    in_channels=3, out_ch=3, ch=128, ch_mult=(1, 2, 4, 4), num_res_blocks=2,
    attn_resolutions=(), dropout=0.0, resolution=256, z_channels=4,
    double_z=True, embed_dim=4,
)


class AutoencoderKL(ImageVAE):
    """Alias with the standard kl-f8 layout (stride-8, 4 latent channels)."""


def _resnet_rules(t_prefix: str, f_prefix: str):
    return [
        (t_prefix + r"\.norm1\.weight", f_prefix + r"/norm1/scale", np.asarray),
        (t_prefix + r"\.norm1\.bias", f_prefix + r"/norm1/bias", np.asarray),
        (t_prefix + r"\.conv1\.weight", f_prefix + r"/conv1/kernel", conv_w),
        (t_prefix + r"\.conv1\.bias", f_prefix + r"/conv1/bias", np.asarray),
        (t_prefix + r"\.norm2\.weight", f_prefix + r"/norm2/scale", np.asarray),
        (t_prefix + r"\.norm2\.bias", f_prefix + r"/norm2/bias", np.asarray),
        (t_prefix + r"\.conv2\.weight", f_prefix + r"/conv2/kernel", conv_w),
        (t_prefix + r"\.conv2\.bias", f_prefix + r"/conv2/bias", np.asarray),
        (t_prefix + r"\.conv_shortcut\.weight", f_prefix + r"/nin_shortcut/kernel", conv_w),
        (t_prefix + r"\.conv_shortcut\.bias", f_prefix + r"/nin_shortcut/bias", np.asarray),
        (t_prefix + r"\.nin_shortcut\.weight", f_prefix + r"/nin_shortcut/kernel", conv_w),
        (t_prefix + r"\.nin_shortcut\.bias", f_prefix + r"/nin_shortcut/bias", np.asarray),
    ]


def _attn_qkv(w):
    # diffusers attention q/k/v/proj are 1x1 convs or linears; squeeze to dense
    w = np.asarray(w)
    if w.ndim == 4:
        w = w[:, :, 0, 0]
    return linear_w(w)


def import_diffusers_vae_params(state: Dict[str, np.ndarray]) -> Dict[str, Any]:
    """diffusers AutoencoderKL state dict -> our ImageVAE param tree."""
    rules = []
    for side in ("encoder", "decoder"):
        rules += [
            (side + r"\.conv_in\.weight", side + r"/conv_in/kernel", conv_w),
            (side + r"\.conv_in\.bias", side + r"/conv_in/bias", np.asarray),
            (side + r"\.conv_out\.weight", side + r"/conv_out/kernel", conv_w),
            (side + r"\.conv_out\.bias", side + r"/conv_out/bias", np.asarray),
            (side + r"\.conv_norm_out\.weight", side + r"/norm_out/scale", np.asarray),
            (side + r"\.conv_norm_out\.bias", side + r"/norm_out/bias", np.asarray),
        ]
        # mid block
        for j in (0, 1):
            rules += _resnet_rules(
                side + rf"\.mid_block\.resnets\.{j}", side + rf"/mid_block_{j + 1}"
            )
        for name, ours in (("to_q", "q"), ("to_k", "k"), ("to_v", "v"),
                           ("to_out\\.0", "proj_out")):
            rules += [
                (side + rf"\.mid_block\.attentions\.0\.{name}\.weight",
                 side + rf"/mid_attn/{ours}/kernel", _attn_qkv),
                (side + rf"\.mid_block\.attentions\.0\.{name}\.bias",
                 side + rf"/mid_attn/{ours}/bias", np.asarray),
            ]
        rules += [
            (side + r"\.mid_block\.attentions\.0\.group_norm\.weight",
             side + r"/mid_attn/norm/scale", np.asarray),
            (side + r"\.mid_block\.attentions\.0\.group_norm\.bias",
             side + r"/mid_attn/norm/bias", np.asarray),
        ]
    # encoder down blocks
    rules += _resnet_rules(
        r"encoder\.down_blocks\.(\d+)\.resnets\.(\d+)", r"encoder/down_\1_\2"
    )
    rules += [
        (r"encoder\.down_blocks\.(\d+)\.downsamplers\.0\.conv\.weight",
         r"encoder/downsample_\1/conv/kernel", conv_w),
        (r"encoder\.down_blocks\.(\d+)\.downsamplers\.0\.conv\.bias",
         r"encoder/downsample_\1/conv/bias", np.asarray),
    ]
    # decoder up blocks: diffusers orders them reversed (up_blocks[0] = top)
    rules += _resnet_rules(
        r"decoder\.up_blocks\.(\d+)\.resnets\.(\d+)", r"DECUP.\1.\2"
    )
    rules += [
        (r"decoder\.up_blocks\.(\d+)\.upsamplers\.0\.conv\.weight",
         r"DECUPS.\1/conv/kernel", conv_w),
        (r"decoder\.up_blocks\.(\d+)\.upsamplers\.0\.conv\.bias",
         r"DECUPS.\1/conv/bias", np.asarray),
        (r"quant_conv\.weight", r"quant_conv/kernel", conv_w),
        (r"quant_conv\.bias", r"quant_conv/bias", np.asarray),
        (r"post_quant_conv\.weight", r"post_quant_conv/kernel", conv_w),
        (r"post_quant_conv\.bias", r"post_quant_conv/bias", np.asarray),
    ]

    flat: Dict[str, np.ndarray] = {}
    unmatched = []
    for key, value in state.items():
        for pattern, template, conv in rules:
            m = re.fullmatch(pattern, key)
            if m:
                flat[m.expand(template)] = conv(value)
                break
        else:
            unmatched.append(key)
    if unmatched:
        raise KeyError(f"unmapped diffusers keys: {unmatched[:8]}")

    # resolve decoder up-block index reversal: diffusers index d -> our level
    # i = n_levels - 1 - d
    n_levels = 1 + max(
        int(re.match(r"DECUP\.(\d+)", k).group(1))
        for k in flat
        if k.startswith("DECUP.")
    )
    resolved: Dict[str, np.ndarray] = {}
    for key, value in flat.items():
        m = re.match(r"DECUP\.(\d+)\.(\d+)/(.*)", key)
        if m:
            i = n_levels - 1 - int(m.group(1))
            resolved[f"decoder/up_{i}_{m.group(2)}/{m.group(3)}"] = value
            continue
        m = re.match(r"DECUPS\.(\d+)/(.*)", key)
        if m:
            i = n_levels - 1 - int(m.group(1))
            resolved[f"decoder/upsample_{i}/{m.group(2)}"] = value
            continue
        resolved[key] = value

    tree: Dict[str, Any] = {}
    for path, value in resolved.items():
        node = tree
        parts = path.split("/")
        for p in parts[:-1]:
            node = node.setdefault(p, {})
        node[parts[-1]] = value
    return tree
