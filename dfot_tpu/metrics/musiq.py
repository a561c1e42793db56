"""MUSIQ — Multi-scale Image Quality transformer (Flax port).

The reference scores the VBench ``imaging_quality`` dimension with a
pretrained MUSIQ model via pyiqa
(reference: algorithms/common/metrics/video/models/musiq.py:10-22,
vbench/imaging_quality.py:14-22, shared_registry.py:78-79; architecture
from pyiqa ``musiq_arch.py`` / the original google-research MUSIQ,
Ke et al., ICCV 2021 — the ``musiq_spaq`` checkpoint).

Architecture (SPAQ configuration):

- **Multi-scale input**: the native-resolution image plus aspect-ratio-
  preserving resizes with longer side 384 and 224.
- **Patch encoding**: each scale is cut into 32x32 patches; every patch
  runs through a weight-standardized 7x7/2 conv root + GroupNorm(32) +
  ReLU + 3x3/2 max-pool (the ResNet root stem), is flattened and linearly
  projected to the 384-d token width.
- **HSE / SCE**: a hash-based spatial embedding (10x10 learnable grid,
  indexed by the patch's normalized grid position) plus a learnable
  per-scale embedding are added to each token.
- **Transformer**: CLS token + 14 pre-norm blocks (384 wide, 6 heads,
  MLP 1152, GELU), final LayerNorm; the head is a single Linear on the
  CLS token producing the 0-100 quality score.

TPU-first notes: all three scales are static shapes under jit (resize
targets derive from the input shape), patches of all scales run through
the conv stem as ONE batched conv, and the attention is a single dense
MXU matmul (a few hundred tokens — no flash kernel needed).

Without converted ``musiq.npz`` weights the registry returns None and the
VBench dim falls back to the classical proxy (flagged ``_uncalibrated``),
matching the raft/amt convention: random-init MUSIQ scores would be
strictly less informative than the proxy.
"""

from __future__ import annotations

from typing import Optional, Sequence, Tuple

import flax.linen as nn
import jax
import jax.numpy as jnp
import numpy as np

__all__ = ["MUSIQ", "multiscale_tokens"]


class StdConv(nn.Module):
    """Weight-standardized conv (pyiqa musiq_arch ``StdConv``): the kernel
    is standardized over its (kh, kw, in) axes before the convolution."""

    features: int
    kernel_size: Tuple[int, int]
    strides: Tuple[int, int] = (1, 1)

    @nn.compact
    def __call__(self, x: jax.Array) -> jax.Array:
        kh, kw = self.kernel_size
        kernel = self.param(
            "kernel",
            nn.initializers.lecun_normal(),
            (kh, kw, x.shape[-1], self.features),
        )
        mean = kernel.mean(axis=(0, 1, 2), keepdims=True)
        var = kernel.var(axis=(0, 1, 2), keepdims=True)
        kernel = (kernel - mean) / jnp.sqrt(var + 1e-10)
        return jax.lax.conv_general_dilated(
            x, kernel, self.strides, "SAME",
            dimension_numbers=("NHWC", "HWIO", "NHWC"),
        )


class PatchEncoder(nn.Module):
    """ResNet root stem on 32x32 patches -> token vectors.

    Input (N, P, P, 3) -> conv7x7/2 -> GN(32) -> ReLU -> maxpool3x3/2 ->
    (N, P/4, P/4, 64) -> flatten -> Dense(hidden)."""

    hidden: int = 384
    root_dim: int = 64

    @nn.compact
    def __call__(self, patches: jax.Array) -> jax.Array:
        h = StdConv(self.root_dim, (7, 7), (2, 2), name="conv_root")(patches)
        h = nn.GroupNorm(num_groups=32, epsilon=1e-6, name="gn_root")(h)
        h = nn.relu(h)
        h = nn.max_pool(h, (3, 3), strides=(2, 2), padding="SAME")
        h = h.reshape(h.shape[0], -1)
        return nn.Dense(self.hidden, name="embedding")(h)


class Block(nn.Module):
    """Pre-norm ViT block: x + MHA(LN(x)); x + MLP(LN(x))."""

    dim: int
    heads: int
    mlp_dim: int

    @nn.compact
    def __call__(self, x: jax.Array, mask: Optional[jax.Array] = None) -> jax.Array:
        h = nn.LayerNorm(epsilon=1e-6, name="ln1")(x)
        B, N, C = h.shape
        d = self.dim // self.heads
        qkv = nn.Dense(3 * self.dim, name="qkv")(h)
        q, k, v = [
            qkv[..., i * self.dim : (i + 1) * self.dim]
            .reshape(B, N, self.heads, d)
            .transpose(0, 2, 1, 3)
            for i in range(3)
        ]
        att = jnp.einsum("bhqd,bhkd->bhqk", q, k) / np.sqrt(d)
        if mask is not None:  # mask: (B, N) True = valid token
            att = jnp.where(mask[:, None, None, :], att, -1e9)
        att = jax.nn.softmax(att, axis=-1)
        o = jnp.einsum("bhqk,bhkd->bhqd", att, v)
        o = o.transpose(0, 2, 1, 3).reshape(B, N, C)
        x = x + nn.Dense(self.dim, name="attn_out")(o)
        h = nn.LayerNorm(epsilon=1e-6, name="ln2")(x)
        h = nn.Dense(self.mlp_dim, name="mlp_in")(h)
        h = nn.gelu(h)
        return x + nn.Dense(self.dim, name="mlp_out")(h)


def _scale_sizes(H: int, W: int, longer_sides: Sequence[int]) -> list:
    """ARP-resize targets: native + one (h, w) per longer-side length."""
    sizes = [(H, W)]
    for L in longer_sides:
        if H >= W:
            sizes.append((L, max(1, round(W * L / H))))
        else:
            sizes.append((max(1, round(H * L / W)), L))
    return sizes


def multiscale_tokens(
    images: jax.Array, patch: int, grid: int, longer_sides: Sequence[int]
):
    """images (B, H, W, 3) -> (patches (B, N, patch, patch, 3),
    hse_idx (N,), scale_idx (N,), valid (N,)).

    Per scale: pad to a patch multiple, cut a patch grid; HSE index =
    floor(row * G / rows) * G + floor(col * G / cols) (the MUSIQ hash);
    ``valid`` marks patches whose top-left corner lies inside the
    unpadded image (padding-only patches are masked out of attention)."""
    B, H, W, _ = images.shape
    all_patches, hse, scale_idx, valid = [], [], [], []
    for s, (h, w) in enumerate(_scale_sizes(H, W, longer_sides)):
        img = images if s == 0 else jax.image.resize(
            images, (B, h, w, images.shape[-1]), "bilinear"
        )
        ph, pw = (-h) % patch, (-w) % patch
        if ph or pw:
            img = jnp.pad(img, ((0, 0), (0, ph), (0, pw), (0, 0)))
        rows, cols = (h + ph) // patch, (w + pw) // patch
        p = img.reshape(B, rows, patch, cols, patch, images.shape[-1])
        p = jnp.moveaxis(p, 2, 3).reshape(B, rows * cols, patch, patch, -1)
        all_patches.append(p)
        r = np.arange(rows)[:, None] * np.ones((1, cols), np.int64)
        c = np.ones((rows, 1), np.int64) * np.arange(cols)[None]
        hse.append(
            (
                np.minimum(r * grid // rows, grid - 1) * grid
                + np.minimum(c * grid // cols, grid - 1)
            ).reshape(-1)
        )
        scale_idx.append(np.full(rows * cols, s, np.int64))
        v = (r * patch < h) & (c * patch < w)
        valid.append(v.reshape(-1))
    return (
        jnp.concatenate(all_patches, axis=1),
        np.concatenate(hse),
        np.concatenate(scale_idx),
        np.concatenate(valid),
    )


class MUSIQ(nn.Module):
    """(B, H, W, 3) images in [0, 1] -> (B,) quality scores (0-100)."""

    hidden: int = 384
    layers: int = 14
    heads: int = 6
    mlp_dim: int = 1152
    patch: int = 32
    grid: int = 10
    num_scales: int = 3
    longer_sides: Tuple[int, ...] = (384, 224)
    num_class: int = 1

    @nn.compact
    def __call__(self, images: jax.Array) -> jax.Array:
        B = images.shape[0]
        x = images * 2.0 - 1.0  # [-1, 1] like the torch preprocessing
        patches, hse_idx, scale_idx, valid = multiscale_tokens(
            x, self.patch, self.grid, self.longer_sides
        )
        N = patches.shape[1]
        tok = PatchEncoder(self.hidden, name="patch_encoder")(
            patches.reshape(B * N, self.patch, self.patch, -1)
        ).reshape(B, N, self.hidden)

        hse = self.param(
            "hse_embedding",
            nn.initializers.normal(0.02),
            (self.grid * self.grid, self.hidden),
        )
        sce = self.param(
            "scale_embedding",
            nn.initializers.normal(0.02),
            (self.num_scales, self.hidden),
        )
        tok = tok + hse[jnp.asarray(hse_idx)] + sce[jnp.asarray(scale_idx)]

        cls = self.param(
            "cls_token", nn.initializers.normal(0.02), (1, 1, self.hidden)
        )
        tok = jnp.concatenate([jnp.broadcast_to(cls, (B, 1, self.hidden)), tok], 1)
        mask = jnp.concatenate(
            [jnp.ones((B, 1), bool), jnp.broadcast_to(jnp.asarray(valid), (B, N))], 1
        )
        for i in range(self.layers):
            tok = Block(self.hidden, self.heads, self.mlp_dim, name=f"block_{i}")(
                tok, mask
            )
        tok = nn.LayerNorm(epsilon=1e-6, name="encoder_norm")(tok)
        out = nn.Dense(self.num_class, name="head")(tok[:, 0])
        return out[:, 0] if self.num_class == 1 else out


def import_musiq_params(state) -> dict:
    """Map a pyiqa ``musiq_spaq_ckpt`` torch state dict onto this Flax tree.

    pyiqa naming has drifted across versions, so every leaf accepts a list
    of candidate torch names (BERT-style ``query/key/value`` like the
    original TF MUSIQ, or fused ``qkv``); unmatched leaves raise with the
    remaining torch keys listed so a rename is a one-line fix when real
    weights first flow (this host has no pyiqa and zero egress, so the
    mapping is shape-checked by the registry's ``_check_tree`` only).
    """
    import re

    s = {
        re.sub(r"^(model\.|module\.)+", "", k): np.asarray(v)
        for k, v in state.items()
    }
    used = set()

    def find(*patterns, optional=False):
        for pat in patterns:
            for k in s:
                if k not in used and re.fullmatch(pat, k):
                    used.add(k)
                    return s[k]
        if optional:
            return None
        raise KeyError(
            f"MUSIQ import: no key matching {patterns}; "
            f"unused keys: {sorted(set(s) - used)[:10]}"
        )

    conv = lambda w: w.transpose(2, 3, 1, 0)
    lin = lambda w: w.T
    tree: dict = {
        "patch_encoder": {
            "conv_root": {"kernel": conv(find(r"conv_root\.weight", r".*conv_root.*weight"))},
            "gn_root": {
                "scale": find(r"gn_root\.weight", r".*gn_root.*weight"),
                "bias": find(r"gn_root\.bias", r".*gn_root.*bias"),
            },
            "embedding": {
                "kernel": lin(find(r"embedding\.weight", r".*patch_embedding.*weight")),
                "bias": find(r"embedding\.bias", r".*patch_embedding.*bias"),
            },
        },
        "cls_token": find(r"cls_token", r".*cls_token.*").reshape(1, 1, -1),
        "hse_embedding": find(
            r"pos_emb", r".*hse.*emb.*", r".*pos_embedding.*weight", r".*pos_emb.*"
        ).reshape(-1, 384),
        "scale_embedding": find(
            r"scale_emb", r".*scale_emb.*weight", r".*scale_emb.*"
        ).reshape(-1, 384),
        "encoder_norm": {
            "scale": find(r".*encoder_norm\.weight", r"norm\.weight"),
            "bias": find(r".*encoder_norm\.bias", r"norm\.bias"),
        },
        "head": {
            "kernel": lin(find(r"head\.weight", r".*head.*weight")),
            "bias": find(r"head\.bias", r".*head.*bias"),
        },
    }

    # transformer blocks: group remaining keys by layer index
    layer_ids = sorted(
        {
            int(m.group(1))
            for k in s
            for m in [re.search(r"(?:layers?|blocks?|encoder_layer)\.(\d+)\.", k)]
            if m
        }
    )
    for i in layer_ids:
        p = rf".*(?:layers?|blocks?|encoder_layer)\.{i}\."
        qw = find(rf"{p}.*(?:query|q_proj)\.weight", optional=True)
        if qw is not None:  # separate q/k/v (TF-MUSIQ style)
            kw = find(rf"{p}.*(?:key|k_proj)\.weight")
            vw = find(rf"{p}.*(?:value|v_proj)\.weight")
            qkv_w = np.concatenate([qw, kw, vw], axis=0)
            qb = find(rf"{p}.*(?:query|q_proj)\.bias")
            kb = find(rf"{p}.*(?:key|k_proj)\.bias")
            vb = find(rf"{p}.*(?:value|v_proj)\.bias")
            qkv_b = np.concatenate([qb, kb, vb], axis=0)
        else:  # fused qkv
            qkv_w = find(rf"{p}.*qkv\.weight")
            qkv_b = find(rf"{p}.*qkv\.bias")
        tree[f"block_{i}"] = {
            "ln1": {
                "scale": find(
                    rf"{p}.*(?:attention_norm|layernorm_before|norm1|ln_?1)\.weight"
                ),
                "bias": find(
                    rf"{p}.*(?:attention_norm|layernorm_before|norm1|ln_?1)\.bias"
                ),
            },
            "qkv": {"kernel": lin(qkv_w), "bias": qkv_b},
            "attn_out": {
                "kernel": lin(find(rf"{p}.*(?:attn\.out|attention\.out|proj|out)\.weight")),
                "bias": find(rf"{p}.*(?:attn\.out|attention\.out|proj|out)\.bias"),
            },
            "ln2": {
                "scale": find(
                    rf"{p}.*(?:ffn_norm|layernorm_after|norm2|ln_?2)\.weight"
                ),
                "bias": find(rf"{p}.*(?:ffn_norm|layernorm_after|norm2|ln_?2)\.bias"),
            },
            "mlp_in": {
                "kernel": lin(find(rf"{p}.*(?:fc1|intermediate\.dense|mlp\.0)\.weight")),
                "bias": find(rf"{p}.*(?:fc1|intermediate\.dense|mlp\.0)\.bias"),
            },
            "mlp_out": {
                "kernel": lin(find(rf"{p}.*(?:fc2|output\.dense|mlp\.3)\.weight")),
                "bias": find(rf"{p}.*(?:fc2|output\.dense|mlp\.3)\.bias"),
            },
        }
    return tree
