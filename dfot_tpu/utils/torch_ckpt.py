"""Torch checkpoint importer: reference state dicts -> flax param pytrees.

The reference publishes checkpoints (e.g. ``DFoT_RE10K.ckpt``) as torch
state dicts with keys ``diffusion_model.model.*`` (only the denoiser is
saved; reference base_pytorch_video_algo.py:1112-1125), with optional
``_orig_mod.`` segments from torch.compile (:1096-1110) and EMA weights kept
in ``optimizer_states[0]['ema']`` (:1185-1201).

Layout conversions (torch -> flax):
- Linear  W (out, in)            -> kernel (in, out)           [transpose]
- Conv2d  W (out, in, kh, kw)    -> kernel (kh, kw, in, out)
- patchify Conv2d stride==kernel -> our reshape+Dense kernel
  (p*p*C, D): W.reshape(D, C, p, p).transpose(2, 3, 1, 0) flattened in our
  (p_h, p_w, C) patch order
- ConvTranspose2d stride==kernel (project_output) -> Dense (C, p*p*out):
  W (in, out, kh, kw).transpose(0, 2, 3, 1)
- GroupNorm/LayerNorm/RMSNorm weight/bias -> scale/bias unchanged.
"""

from __future__ import annotations

import re
from typing import Any, Callable, Dict, Optional, Tuple

import numpy as np

__all__ = [
    "load_state_dict",
    "strip_checkpoint",
    "linear_w",
    "conv_w",
    "patchify_conv_w",
    "unpatchify_convT_w",
    "import_dit3d_params",
    "import_uvit3d_params",
    "import_far_params",
    "import_unet3d_params",
    "import_dit1d_params",
]


def load_state_dict(path: str) -> Dict[str, np.ndarray]:
    """Load a torch .ckpt/.pt/.safetensors into numpy arrays."""
    if path.endswith(".safetensors"):
        from safetensors.numpy import load_file

        return dict(load_file(path))
    import torch

    obj = torch.load(path, map_location="cpu", weights_only=False)
    return obj


def strip_checkpoint(ckpt: Dict[str, Any]) -> Dict[str, np.ndarray]:
    """Apply the reference's checkpoint surgery: promote EMA weights, keep
    ``diffusion_model.model.*`` keys, drop ``_orig_mod.`` segments."""
    state = ckpt.get("state_dict", ckpt)
    # EMA promotion (reference :1185-1201)
    opt_states = ckpt.get("optimizer_states") if isinstance(ckpt, dict) else None
    if opt_states and "ema" in opt_states[0]:
        ema = opt_states[0]["ema"]
        keys = [k for k in state if _is_model_key(k)]
        assert len(keys) == len(ema), "EMA weight count mismatch"
        state = dict(state)
        for k, v in zip(keys, ema):
            state[k] = v

    out = {}
    for key, value in state.items():
        key = key.replace("_orig_mod.", "")
        if not _is_model_key(key):
            continue
        key = key.split("diffusion_model.model.", 1)[-1]
        out[key] = np.asarray(
            value.float().numpy() if hasattr(value, "numpy") else value,
            dtype=np.float32,
        )
    return out


def _is_model_key(key: str) -> bool:
    return "diffusion_model.model" in key or not ("." in key and key.split(".")[0] in (
        "vae", "metrics", "registry"
    ))


# -- layout converters --------------------------------------------------------


def linear_w(w: np.ndarray) -> np.ndarray:
    return np.ascontiguousarray(w.T)


def conv_w(w: np.ndarray) -> np.ndarray:
    return np.ascontiguousarray(w.transpose(2, 3, 1, 0))


def patchify_conv_w(w: np.ndarray) -> np.ndarray:
    """(D, C, p, p) stride-p conv -> (p*p*C, D) dense in (p_h, p_w, C) order."""
    D, C, p, _ = w.shape
    return np.ascontiguousarray(w.transpose(2, 3, 1, 0).reshape(p * p * C, D))


def unpatchify_convT_w(w: np.ndarray) -> np.ndarray:
    """(C_in, C_out, p, p) stride-p convT -> (C_in, p*p*C_out) dense in
    (p_h, p_w, C_out) output order."""
    C_in, C_out, p, _ = w.shape
    return np.ascontiguousarray(w.transpose(0, 2, 3, 1).reshape(C_in, p * p * C_out))


def _unpatchify_convT_b_factory(patch_size: int):
    def convert(b: np.ndarray) -> np.ndarray:
        # torch convT bias (C_out,) -> dense bias (p*p*C_out,) in (p, p, c) order
        return np.tile(b, patch_size * patch_size)

    return convert


# -- generic mapping machinery -------------------------------------------------

Rule = Tuple[str, str, Callable[[np.ndarray], np.ndarray]]


def _apply_rules(state: Dict[str, np.ndarray], rules) -> Dict[str, np.ndarray]:
    """Translate torch keys to flax paths via (regex, template, converter)."""
    out: Dict[str, np.ndarray] = {}
    unmatched = []
    for key, value in state.items():
        for pattern, template, conv in rules:
            m = re.fullmatch(pattern, key)
            if m:
                out[m.expand(template)] = conv(value)
                break
        else:
            unmatched.append(key)
    if unmatched:
        raise KeyError(f"unmapped torch keys: {unmatched[:10]} (+{len(unmatched)-10 if len(unmatched)>10 else 0} more)")
    return out


def _unflatten(flat: Dict[str, np.ndarray]) -> Dict[str, Any]:
    tree: Dict[str, Any] = {}
    for path, value in flat.items():
        node = tree
        parts = path.split("/")
        for p in parts[:-1]:
            node = node.setdefault(p, {})
        node[parts[-1]] = value
    return tree


_ID = lambda x: np.asarray(x)

# noise-level embedding (shared by all backbones; reference base_backbone.py)
_NOISE_EMB_RULES = [
    (r"noise_level_pos_embedding\.embedding\.linear_(\d)\.weight",
     r"noise_emb/mlp/linear_\1/kernel", linear_w),
    (r"noise_level_pos_embedding\.embedding\.linear_(\d)\.bias",
     r"noise_emb/mlp/linear_\1/bias", _ID),
    (r"noise_level_pos_embedding\.timesteps\.unknown_token",
     r"noise_emb/unknown_token", _ID),
]

_EXT_COND_RULES = [
    (r"external_cond_embedding\.linear_(\d)\.weight",
     r"cond_emb/embedding/linear_\1/kernel", linear_w),
    (r"external_cond_embedding\.linear_(\d)\.bias",
     r"cond_emb/embedding/linear_\1/bias", _ID),
    (r"external_cond_embedding\.embedding\.linear_(\d)\.weight",
     r"cond_emb/embedding/linear_\1/kernel", linear_w),
    (r"external_cond_embedding\.embedding\.linear_(\d)\.bias",
     r"cond_emb/embedding/linear_\1/bias", _ID),
    (r"external_cond_embedding\.embedding_table\.weight",
     r"cond_emb/embedding_table", _ID),
]


def import_dit3d_params(state: Dict[str, np.ndarray]) -> Dict[str, Any]:
    """Map a reference DiT3D state dict (dit3d.py/dit_base.py/dit_blocks.py
    torch module names) onto our models/dit.DiT3D param tree."""
    rules = [
        (r"patch_embedder\.proj\.weight", r"patch_embed/proj/kernel", patchify_conv_w),
        (r"patch_embedder\.proj\.bias", r"patch_embed/proj/bias", _ID),
        *_NOISE_EMB_RULES,
        *_EXT_COND_RULES,
        (r"dit_base\.pos_emb\.pos_emb", r"dit/pos_emb", _ID),
        # DiT blocks: AdaLN-Zero modulations
        (r"dit_base\.blocks\.(\d+)\.norm1\.modulation\.1\.weight",
         r"dit/block_\1/mod_attn/linear/kernel", linear_w),
        (r"dit_base\.blocks\.(\d+)\.norm1\.modulation\.1\.bias",
         r"dit/block_\1/mod_attn/linear/bias", _ID),
        (r"dit_base\.blocks\.(\d+)\.norm2\.modulation\.1\.weight",
         r"dit/block_\1/mod_mlp/linear/kernel", linear_w),
        (r"dit_base\.blocks\.(\d+)\.norm2\.modulation\.1\.bias",
         r"dit/block_\1/mod_mlp/linear/bias", _ID),
        (r"dit_base\.blocks\.(\d+)\.attn\.qkv\.weight",
         r"dit/block_\1/attn/qkv/kernel", linear_w),
        (r"dit_base\.blocks\.(\d+)\.attn\.qkv\.bias",
         r"dit/block_\1/attn/qkv/bias", _ID),
        (r"dit_base\.blocks\.(\d+)\.attn\.proj\.weight",
         r"dit/block_\1/attn/proj/kernel", linear_w),
        (r"dit_base\.blocks\.(\d+)\.attn\.proj\.bias",
         r"dit/block_\1/attn/proj/bias", _ID),
        (r"dit_base\.blocks\.(\d+)\.mlp\.fc(\d)\.weight",
         r"dit/block_\1/mlp/fc\2/kernel", linear_w),
        (r"dit_base\.blocks\.(\d+)\.mlp\.fc(\d)\.bias",
         r"dit/block_\1/mlp/fc\2/bias", _ID),
        # temporal blocks (factorized variants)
        (r"dit_base\.temporal_blocks\.(\d+)\.norm1\.modulation\.1\.weight",
         r"dit/temporal_block_\1/mod_attn/linear/kernel", linear_w),
        (r"dit_base\.temporal_blocks\.(\d+)\.norm1\.modulation\.1\.bias",
         r"dit/temporal_block_\1/mod_attn/linear/bias", _ID),
        (r"dit_base\.temporal_blocks\.(\d+)\.norm2\.modulation\.1\.weight",
         r"dit/temporal_block_\1/mod_mlp/linear/kernel", linear_w),
        (r"dit_base\.temporal_blocks\.(\d+)\.norm2\.modulation\.1\.bias",
         r"dit/temporal_block_\1/mod_mlp/linear/bias", _ID),
        (r"dit_base\.temporal_blocks\.(\d+)\.attn\.qkv\.weight",
         r"dit/temporal_block_\1/attn/qkv/kernel", linear_w),
        (r"dit_base\.temporal_blocks\.(\d+)\.attn\.qkv\.bias",
         r"dit/temporal_block_\1/attn/qkv/bias", _ID),
        (r"dit_base\.temporal_blocks\.(\d+)\.attn\.proj\.weight",
         r"dit/temporal_block_\1/attn/proj/kernel", linear_w),
        (r"dit_base\.temporal_blocks\.(\d+)\.attn\.proj\.bias",
         r"dit/temporal_block_\1/attn/proj/bias", _ID),
        (r"dit_base\.temporal_blocks\.(\d+)\.mlp\.fc(\d)\.weight",
         r"dit/temporal_block_\1/mlp/fc\2/kernel", linear_w),
        (r"dit_base\.temporal_blocks\.(\d+)\.mlp\.fc(\d)\.bias",
         r"dit/temporal_block_\1/mlp/fc\2/bias", _ID),
        # matrix-attention blocks (MatrixDiTBlock, dit_blocks.py:549-650):
        # qkv_u/qkv_v/proj_u/proj_v einsum factors share our exact layouts
        (r"dit_base\.(temporal_)?blocks\.(\d+)\.attn\.(qkv_u|qkv_v|proj_u|proj_v|qkv_bias|proj_bias)",
         r"dit/\1block_\2/attn/\3", _ID),
        # final layer
        (r"dit_base\.final_layer\.norm_final\.modulation\.1\.weight",
         r"dit/final_layer/mod/linear/kernel", linear_w),
        (r"dit_base\.final_layer\.norm_final\.modulation\.1\.bias",
         r"dit/final_layer/mod/linear/bias", _ID),
        (r"dit_base\.final_layer\.linear\.weight",
         r"dit/final_layer/proj/kernel", linear_w),
        (r"dit_base\.final_layer\.linear\.bias",
         r"dit/final_layer/proj/bias", _ID),
    ]
    return _unflatten(_apply_rules(state, rules))


def conv3d_1kk_w(w: np.ndarray) -> np.ndarray:
    """torch Conv3d (O, I, 1, kH, kW) -> flax per-frame Conv (kH, kW, I, O)."""
    return np.ascontiguousarray(w[:, :, 0].transpose(2, 3, 1, 0))


def conv3d_111_to_dense(w: np.ndarray) -> np.ndarray:
    """torch Conv3d 1x1x1 (O, I, 1, 1, 1) -> Dense kernel (I, O)."""
    return np.ascontiguousarray(w[:, :, 0, 0, 0].T)


def import_unet3d_params(
    state: Dict[str, np.ndarray], num_res_blocks: int = 2, num_levels: int = 4
) -> Dict[str, Any]:
    """Map a reference Unet3D state dict (u_net3d.py / u_net_blocks.py torch
    module names) onto our models/unet3d.UNet3D param tree."""
    nrb = num_res_blocks
    state = {
        k: v for k, v in state.items() if "rotary_time_pos_embedding" not in k
    }

    def res_rules(t_prefix: str, f_prefix: str):
        return [
            (rf"{t_prefix}\.in_layers\.0\.weight", rf"{f_prefix}/norm1/gn/scale", _ID),
            (rf"{t_prefix}\.in_layers\.0\.bias", rf"{f_prefix}/norm1/gn/bias", _ID),
            (rf"{t_prefix}\.in_layers\.2\.weight", rf"{f_prefix}/conv1/kernel", conv3d_1kk_w),
            (rf"{t_prefix}\.in_layers\.2\.bias", rf"{f_prefix}/conv1/bias", _ID),
            (rf"{t_prefix}\.out_layers\.0\.weight", rf"{f_prefix}/norm2/gn/scale", _ID),
            (rf"{t_prefix}\.out_layers\.0\.bias", rf"{f_prefix}/norm2/gn/bias", _ID),
            (rf"{t_prefix}\.out_layers\.2\.weight", rf"{f_prefix}/conv2/kernel", conv3d_1kk_w),
            (rf"{t_prefix}\.out_layers\.2\.bias", rf"{f_prefix}/conv2/bias", _ID),
            (rf"{t_prefix}\.emb_layers\.1\.weight", rf"{f_prefix}/emb_proj/kernel", linear_w),
            (rf"{t_prefix}\.emb_layers\.1\.bias", rf"{f_prefix}/emb_proj/bias", _ID),
            (rf"{t_prefix}\.skip_conv\.weight", rf"{f_prefix}/shortcut/kernel", conv3d_111_to_dense),
            (rf"{t_prefix}\.skip_conv\.bias", rf"{f_prefix}/shortcut/bias", _ID),
        ]

    def sattn_rules(t_prefix: str, f_prefix: str):
        # UnetSpatialAttentionBlock -> wrapper.module = AttentionBlock
        return [
            (rf"{t_prefix}\.wrapper\.module\.norm\.weight", rf"{f_prefix}/norm/scale", _ID),
            (rf"{t_prefix}\.wrapper\.module\.norm\.bias", rf"{f_prefix}/norm/bias", _ID),
            (rf"{t_prefix}\.wrapper\.module\.attn\.to_qkv\.weight", rf"{f_prefix}/qkv/kernel", linear_w),
            (rf"{t_prefix}\.wrapper\.module\.attn\.to_out\.weight", rf"{f_prefix}/proj/kernel", linear_w),
            (rf"{t_prefix}\.wrapper\.module\.attn\.to_out\.bias", rf"{f_prefix}/proj/bias", _ID),
        ]

    def tattn_rules(t_prefix: str, f_prefix: str):
        # UnetTemporalAttentionBlock -> wrapper.module = TemporalAttentionBlock
        return [
            (rf"{t_prefix}\.wrapper\.module\.attn_block\.norm\.weight", rf"{f_prefix}/norm/scale", _ID),
            (rf"{t_prefix}\.wrapper\.module\.attn_block\.norm\.bias", rf"{f_prefix}/norm/bias", _ID),
            (rf"{t_prefix}\.wrapper\.module\.attn_block\.attn\.to_qkv\.weight", rf"{f_prefix}/qkv/kernel", linear_w),
            (rf"{t_prefix}\.wrapper\.module\.attn_block\.attn\.to_out\.weight", rf"{f_prefix}/proj/kernel", linear_w),
            (rf"{t_prefix}\.wrapper\.module\.attn_block\.attn\.to_out\.bias", rf"{f_prefix}/proj/bias", _ID),
        ]

    rules = list(_NOISE_EMB_RULES) + list(_EXT_COND_RULES) + [
        (r"init_conv\.weight", r"init_conv/kernel", conv3d_1kk_w),
        (r"init_conv\.bias", r"init_conv/bias", _ID),
        (r"out\.1\.weight", r"out_conv/kernel", conv3d_1kk_w),
        (r"out\.1\.bias", r"out_conv/bias", _ID),
    ]
    rules += tattn_rules(r"init_temporal_attn", "init_temporal_attn")
    rules += res_rules(r"out\.0", "out_res")
    for i in range(num_levels):
        for j in range(nrb):
            rules += res_rules(rf"down_blocks\.{i}\.0\.{j}", f"down_{i}_res{j}")
        rules += sattn_rules(rf"down_blocks\.{i}\.0\.{nrb}", f"down_{i}_sattn")
        rules += tattn_rules(rf"down_blocks\.{i}\.0\.{nrb + 1}", f"down_{i}_tattn")
        rules += [
            (rf"down_blocks\.{i}\.1\.conv\.weight", rf"down_{i}_ds/kernel", conv3d_1kk_w),
            (rf"down_blocks\.{i}\.1\.conv\.bias", rf"down_{i}_ds/bias", _ID),
        ]
        # torch up_blocks.0 is the DEEPEST level == our up_{num_levels-1}
        our = num_levels - 1 - i
        for j in range(nrb):
            rules += res_rules(rf"up_blocks\.{i}\.{j}", f"up_{our}_res{j}")
        rules += sattn_rules(rf"up_blocks\.{i}\.{nrb}", f"up_{our}_sattn")
        rules += tattn_rules(rf"up_blocks\.{i}\.{nrb + 1}", f"up_{our}_tattn")
        rules += [
            (rf"up_blocks\.{i}\.{nrb + 2}\.conv\.weight", rf"up_{our}_us/kernel", conv3d_1kk_w),
            (rf"up_blocks\.{i}\.{nrb + 2}\.conv\.bias", rf"up_{our}_us/bias", _ID),
        ]
    mid = [
        (r"mid_block\.0", "mid_res0", res_rules),
        (r"mid_block\.1", "mid_sattn", sattn_rules),
        (r"mid_block\.2", "mid_tattn", tattn_rules),
        (r"mid_block\.3", "mid_res1", res_rules),
    ]
    for t, f, fn in mid:
        rules += fn(t, f)
    return _unflatten(_apply_rules(state, rules))


def import_far_params(state: Dict[str, np.ndarray]) -> Dict[str, Any]:
    """Map a reference FARDiT state dict (far_model.py torch module names)
    onto our models/far.FARDiT param tree. The separate to_q/to_k/to_v
    projections are fused into our packed qkv Dense."""
    fused: Dict[str, np.ndarray] = {}
    for key, value in state.items():
        # FARDiT inherits BaseBackbone's noise_level_pos_embedding but uses
        # its own time_proj/timestep_embedder instead — dead parameters
        if key.startswith("noise_level_pos_embedding."):
            continue
        m = re.fullmatch(
            r"transformer_blocks\.(\d+)\.attn\.to_([qkv])\.(weight|bias)", key
        )
        if m:
            i, which, kind = m.groups()
            if which == "q":
                parts = [
                    state[f"transformer_blocks.{i}.attn.to_{c}.{kind}"]
                    for c in "qkv"
                ]
                fused[f"QKV.{i}.{kind}"] = np.concatenate(parts, axis=0)
            continue
        fused[key] = value

    rules = [
        (r"x_embedder\.weight", r"x_embedder/kernel", linear_w),
        (r"x_embedder\.bias", r"x_embedder/bias", _ID),
        (r"timestep_embedder\.linear_(\d)\.weight", r"t_embedder/linear_\1/kernel", linear_w),
        (r"timestep_embedder\.linear_(\d)\.bias", r"t_embedder/linear_\1/bias", _ID),
        (r"external_cond_embedding\.embedding_table\.weight", r"cond_emb/embedding_table", _ID),
        (r"transformer_blocks\.(\d+)\.norm(\d)\.linear\.weight",
         r"block_\1/norm\2/linear/kernel", linear_w),
        (r"transformer_blocks\.(\d+)\.norm(\d)\.linear\.bias",
         r"block_\1/norm\2/linear/bias", _ID),
        (r"QKV\.(\d+)\.weight", r"block_\1/qkv/kernel", linear_w),
        (r"QKV\.(\d+)\.bias", r"block_\1/qkv/bias", _ID),
        (r"transformer_blocks\.(\d+)\.attn\.norm_q\.weight", r"block_\1/q_norm/weight", _ID),
        (r"transformer_blocks\.(\d+)\.attn\.norm_k\.weight", r"block_\1/k_norm/weight", _ID),
        (r"transformer_blocks\.(\d+)\.attn\.to_out\.0\.weight",
         r"block_\1/attn_out/kernel", linear_w),
        (r"transformer_blocks\.(\d+)\.attn\.to_out\.0\.bias",
         r"block_\1/attn_out/bias", _ID),
        (r"transformer_blocks\.(\d+)\.mlp\.net\.0\.proj\.weight",
         r"block_\1/ff/fc1/kernel", linear_w),
        (r"transformer_blocks\.(\d+)\.mlp\.net\.0\.proj\.bias",
         r"block_\1/ff/fc1/bias", _ID),
        (r"transformer_blocks\.(\d+)\.mlp\.net\.2\.weight",
         r"block_\1/ff/fc2/kernel", linear_w),
        (r"transformer_blocks\.(\d+)\.mlp\.net\.2\.bias",
         r"block_\1/ff/fc2/bias", _ID),
        (r"norm_out\.linear\.weight", r"norm_out/kernel", linear_w),
        (r"norm_out\.linear\.bias", r"norm_out/bias", _ID),
        (r"proj_out\.weight", r"proj_out/kernel", linear_w),
        (r"proj_out\.bias", r"proj_out/bias", _ID),
    ]
    return _unflatten(_apply_rules(fused, rules))


def import_dit1d_params(state: Dict[str, np.ndarray]) -> Dict[str, Any]:
    """Map a reference DIT1D state dict (dit1d/dit_model.py torch module
    names) onto our models/dit1d.DiT1D param tree."""
    # pos_embed is a frozen sincos table we regenerate exactly; drop it
    state = {k: v for k, v in state.items() if k != "pos_embed"}
    rules = [
        (r"x_embedder\.weight", r"x_embedder/kernel", linear_w),
        (r"x_embedder\.bias", r"x_embedder/bias", _ID),
        (r"t_embedder\.mlp\.0\.weight", r"t_embedder/linear_1/kernel", linear_w),
        (r"t_embedder\.mlp\.0\.bias", r"t_embedder/linear_1/bias", _ID),
        (r"t_embedder\.mlp\.2\.weight", r"t_embedder/linear_2/kernel", linear_w),
        (r"t_embedder\.mlp\.2\.bias", r"t_embedder/linear_2/bias", _ID),
        (r"c_embedder\.weight", r"c_embedder/kernel", linear_w),
        (r"c_embedder\.bias", r"c_embedder/bias", _ID),
        (r"blocks\.(\d+)\.adaLN_modulation\.1\.weight",
         r"block_\1/adaLN_modulation/kernel", linear_w),
        (r"blocks\.(\d+)\.adaLN_modulation\.1\.bias",
         r"block_\1/adaLN_modulation/bias", _ID),
        (r"blocks\.(\d+)\.attn\.qkv\.weight", r"block_\1/qkv/kernel", linear_w),
        (r"blocks\.(\d+)\.attn\.qkv\.bias", r"block_\1/qkv/bias", _ID),
        (r"blocks\.(\d+)\.attn\.proj\.weight", r"block_\1/proj/kernel", linear_w),
        (r"blocks\.(\d+)\.attn\.proj\.bias", r"block_\1/proj/bias", _ID),
        (r"blocks\.(\d+)\.attn\.(q|k)_norm\.weight", r"block_\1/\2_norm/scale", _ID),
        (r"blocks\.(\d+)\.attn\.(q|k)_norm\.bias", r"block_\1/\2_norm/bias", _ID),
        (r"blocks\.(\d+)\.mlp\.fc(\d)\.weight", r"block_\1/mlp/fc\2/kernel", linear_w),
        (r"blocks\.(\d+)\.mlp\.fc(\d)\.bias", r"block_\1/mlp/fc\2/bias", _ID),
        (r"final_layer\.1\.weight", r"final_linear/kernel", linear_w),
        (r"final_layer\.1\.bias", r"final_linear/bias", _ID),
    ]
    return _unflatten(_apply_rules(state, rules))


def _uvit_block_rules(prefix_t: str, prefix_f: str):
    """Shared ResBlock/TransformerBlock rules under a torch/flax prefix pair."""
    return [
        # ResBlock (u_vit_blocks.py:57-97)
        (prefix_t + r"\.in_layers\.0\.weight", prefix_f + r"/in_norm/scale", _ID),
        (prefix_t + r"\.in_layers\.0\.bias", prefix_f + r"/in_norm/bias", _ID),
        (prefix_t + r"\.in_layers\.2\.weight", prefix_f + r"/in_conv/kernel", conv_w),
        (prefix_t + r"\.in_layers\.2\.bias", prefix_f + r"/in_conv/bias", _ID),
        (prefix_t + r"\.emb_layer\.weight", prefix_f + r"/emb_layer/kernel", conv_w),
        (prefix_t + r"\.emb_layer\.bias", prefix_f + r"/emb_layer/bias", _ID),
        (prefix_t + r"\.out_norm\.weight", prefix_f + r"/out_norm/scale", _ID),
        (prefix_t + r"\.out_norm\.bias", prefix_f + r"/out_norm/bias", _ID),
        (prefix_t + r"\.out_rest\.1\.weight", prefix_f + r"/out_conv/kernel", conv_w),
        (prefix_t + r"\.out_rest\.1\.bias", prefix_f + r"/out_conv/bias", _ID),
        # TransformerBlock (u_vit_blocks.py:203-289)
        (prefix_t + r"\.norm\.emb_layer\.weight", prefix_f + r"/norm/emb_layer/kernel", linear_w),
        (prefix_t + r"\.norm\.emb_layer\.bias", prefix_f + r"/norm/emb_layer/bias", _ID),
        (prefix_t + r"\.norm\.norm\.weight", prefix_f + r"/norm/norm/weight", _ID),
        (prefix_t + r"\.fused_attn_mlp_proj\.weight", prefix_f + r"/fused_proj/kernel", linear_w),
        (prefix_t + r"\.fused_attn_mlp_proj\.bias", prefix_f + r"/fused_proj/bias", _ID),
        (prefix_t + r"\.q_norm\.weight", prefix_f + r"/q_norm/weight", _ID),
        (prefix_t + r"\.k_norm\.weight", prefix_f + r"/k_norm/weight", _ID),
        (prefix_t + r"\.attn_out\.weight", prefix_f + r"/attn_out/kernel", linear_w),
        (prefix_t + r"\.attn_out\.bias", prefix_f + r"/attn_out/bias", _ID),
        (prefix_t + r"\.mlp_out\.2\.weight", prefix_f + r"/mlp_out/kernel", linear_w),
        (prefix_t + r"\.mlp_out\.2\.bias", prefix_f + r"/mlp_out/bias", _ID),
        # axial temporal attention (AttentionBlock, u_vit_blocks.py:125-171)
        (prefix_t + r"\.another_attn\.norm\.emb_layer\.weight",
         prefix_f + r"/temporal_attn/norm/emb_layer/kernel", linear_w),
        (prefix_t + r"\.another_attn\.norm\.emb_layer\.bias",
         prefix_f + r"/temporal_attn/norm/emb_layer/bias", _ID),
        (prefix_t + r"\.another_attn\.norm\.norm\.weight",
         prefix_f + r"/temporal_attn/norm/norm/weight", _ID),
        (prefix_t + r"\.another_attn\.proj\.weight",
         prefix_f + r"/temporal_attn/proj/kernel", linear_w),
        (prefix_t + r"\.another_attn\.q_norm\.weight",
         prefix_f + r"/temporal_attn/q_norm/weight", _ID),
        (prefix_t + r"\.another_attn\.k_norm\.weight",
         prefix_f + r"/temporal_attn/k_norm/weight", _ID),
        (prefix_t + r"\.another_attn\.out\.weight",
         prefix_f + r"/temporal_attn/out/kernel", linear_w),
    ]


def import_uvit3d_params(
    state: Dict[str, np.ndarray],
    num_updown_blocks: Tuple[int, ...],
    num_levels: int,
    patch_size: int = 2,
) -> Dict[str, Any]:
    """Map a reference UViT3D(+Pose) state dict onto our models/uvit tree.

    up_blocks index conversion: reference up_blocks[_i] has [0]=Upsample and
    [1+j]=blocks for level i = num_levels - 2 - _i (u_vit3d.py:160-182).
    """
    # pre-translate up/down block indices into our level-based names
    renamed: Dict[str, np.ndarray] = {}
    for key, value in state.items():
        m = re.match(r"down_blocks\.(\d+)\.(\d+)\.(.*)", key)
        if m:
            i, j, rest = int(m.group(1)), int(m.group(2)), m.group(3)
            if j == num_updown_blocks[i]:  # last entry = Downsample
                renamed[f"DOWNSAMPLE.{i}.{rest}"] = value
            else:
                renamed[f"BLOCK.down_{i}_{j}.{rest}"] = value
            continue
        m = re.match(r"up_blocks\.(\d+)\.(\d+)\.(.*)", key)
        if m:
            _i, j, rest = int(m.group(1)), int(m.group(2)), m.group(3)
            i = num_levels - 2 - _i
            if j == 0:
                renamed[f"UPSAMPLE.{i}.{rest}"] = value
            else:
                renamed[f"BLOCK.up_{i}_{j - 1}.{rest}"] = value
            continue
        m = re.match(r"mid_blocks\.(\d+)\.(.*)", key)
        if m:
            renamed[f"BLOCK.mid_{m.group(1)}.{m.group(2)}"] = value
            continue
        renamed[key] = value

    rules = [
        (r"embed_input\.proj\.weight", r"embed_input/kernel", patchify_conv_w),
        (r"embed_input\.proj\.bias", r"embed_input/bias", _ID),
        (r"project_output\.proj\.weight", r"project_output/kernel", unpatchify_convT_w),
        (r"project_output\.proj\.bias", r"project_output/bias",
         _unpatchify_convT_b_factory(patch_size)),
        *_NOISE_EMB_RULES,
        *_EXT_COND_RULES,
        # pose patch embedding (u_vit3d_pose.py:37-46)
        (r"external_cond_embedding\.patch_embedder\.proj\.weight",
         r"pose_embed/proj/kernel", patchify_conv_w),
        (r"external_cond_embedding\.patch_embedder\.proj\.bias",
         r"pose_embed/proj/bias", _ID),
        (r"DOWNSAMPLE\.(\d+)\.conv\.weight", r"downsample_\1/conv/kernel", conv_w),
        (r"DOWNSAMPLE\.(\d+)\.conv\.bias", r"downsample_\1/conv/bias", _ID),
        (r"UPSAMPLE\.(\d+)\.conv\.weight", r"upsample_\1/conv/kernel", conv_w),
        (r"UPSAMPLE\.(\d+)\.conv\.bias", r"upsample_\1/conv/bias", _ID),
        *_uvit_block_rules(r"BLOCK\.([a-z]+_\d+(?:_\d+)?)", r"\1"),
        # learned_1d positional embeddings (if configured)
        (r"pos_embs\.(\d+)\.pos_emb", r"pos_emb_\1", _ID),
    ]
    return _unflatten(_apply_rules(renamed, rules))
