"""Frozen image encoders for model-based metrics (CLIP / DINO / LAION).

Counterparts of the reference's eval-model wrappers
(algorithms/common/metrics/video/models/{clip.py,dino.py,laion.py}):

- CLIP visual tower (OpenAI ViT-B/32 and ViT-L/14): bicubic 224 resize, CLIP
  normalization, patch conv -> CLS + positional embeddings -> pre-norm
  transformer with QuickGELU -> ln_post(CLS) @ proj.
- DINO ViT-B/16 (timm layout): ImageNet normalization, CLS feature after the
  final norm.
- LAION aesthetic predictor: a single linear head on l2-normalized CLIP-L/14
  embeddings (models/laion.py:9-20).

Weight import from torch state dicts via :func:`import_clip_vision_params` /
:func:`import_dino_params`; without weights the registry marks these
non-comparable (fixed-seed random init still orders models within a run).
"""

from __future__ import annotations

import dataclasses
from typing import Any, Dict

import flax.linen as nn
import jax
import jax.numpy as jnp
import numpy as np

__all__ = [
    "CLIPVisionConfig",
    "CLIPVisionEncoder",
    "DINOConfig",
    "DINOEncoder",
    "CLIP_B32",
    "CLIP_L14",
    "DINO_B16",
    "clip_preprocess",
    "dino_preprocess",
    "import_clip_vision_params",
    "import_dino_params",
]

CLIP_MEAN = (0.48145466, 0.4578275, 0.40821073)
CLIP_STD = (0.26862954, 0.26130258, 0.27577711)
IMAGENET_MEAN = (0.485, 0.456, 0.406)
IMAGENET_STD = (0.229, 0.224, 0.225)


def _resize_normalize(x: jax.Array, size: int, mean, std) -> jax.Array:
    """(B, H, W, 3) in [0,1] -> resized + normalized (reference clip.py:16-26)."""
    B = x.shape[0]
    x = jax.image.resize(x, (B, size, size, 3), "cubic")
    return (x - jnp.asarray(mean)) / jnp.asarray(std)


def clip_preprocess(x: jax.Array, size: int = 224) -> jax.Array:
    return _resize_normalize(x, size, CLIP_MEAN, CLIP_STD)


def dino_preprocess(x: jax.Array, size: int = 224) -> jax.Array:
    return _resize_normalize(x, size, IMAGENET_MEAN, IMAGENET_STD)


def _quick_gelu(x: jax.Array) -> jax.Array:
    return x * jax.nn.sigmoid(1.702 * x)


class _Attention(nn.Module):
    """Packed-qkv multi-head attention (torch MultiheadAttention / timm qkv)."""

    dim: int
    heads: int
    qkv_name: str = "in_proj"
    out_name: str = "out_proj"

    @nn.compact
    def __call__(self, x: jax.Array) -> jax.Array:
        B, L, C = x.shape
        d = self.dim // self.heads
        qkv = nn.Dense(3 * self.dim, name=self.qkv_name)(x)
        qkv = qkv.reshape(B, L, 3, self.heads, d)
        q, k, v = [jnp.moveaxis(qkv[:, :, i], 1, 2) for i in range(3)]
        s = jnp.einsum("bhnd,bhmd->bhnm", q, k).astype(jnp.float32) * d**-0.5
        a = jax.nn.softmax(s, axis=-1).astype(x.dtype)
        o = jnp.moveaxis(jnp.einsum("bhnm,bhmd->bhnd", a, v), 1, 2).reshape(B, L, C)
        return nn.Dense(self.dim, name=self.out_name)(o)


# ---------------------------------------------------------------------------
# CLIP visual tower (OpenAI layout: visual.* keys)
# ---------------------------------------------------------------------------


@dataclasses.dataclass(frozen=True)
class CLIPVisionConfig:
    image_size: int = 224
    patch_size: int = 32
    width: int = 768
    layers: int = 12
    heads: int = 12
    output_dim: int = 512


CLIP_B32 = CLIPVisionConfig()
CLIP_L14 = CLIPVisionConfig(patch_size=14, width=1024, layers=24, heads=16,
                            output_dim=768)


class _CLIPBlock(nn.Module):
    dim: int
    heads: int

    @nn.compact
    def __call__(self, x: jax.Array) -> jax.Array:
        x = x + _Attention(self.dim, self.heads, name="attn")(
            nn.LayerNorm(epsilon=1e-5, name="ln_1")(x)
        )
        h = nn.LayerNorm(epsilon=1e-5, name="ln_2")(x)
        h = nn.Dense(4 * self.dim, name="mlp_c_fc")(h)
        h = _quick_gelu(h)
        return x + nn.Dense(self.dim, name="mlp_c_proj")(h)


class CLIPVisionEncoder(nn.Module):
    """(B, 224, 224, 3) CLIP-normalized -> (B, output_dim) image embedding."""

    cfg: CLIPVisionConfig = CLIP_B32

    @nn.compact
    def __call__(self, x: jax.Array) -> jax.Array:
        c = self.cfg
        grid = c.image_size // c.patch_size
        B = x.shape[0]
        h = nn.Conv(
            c.width, (c.patch_size, c.patch_size),
            strides=(c.patch_size, c.patch_size), use_bias=False, name="conv1",
        )(x)
        h = h.reshape(B, grid * grid, c.width)
        cls = self.param(
            "class_embedding", nn.initializers.normal(c.width**-0.5), (c.width,)
        )
        h = jnp.concatenate(
            [jnp.broadcast_to(cls[None, None], (B, 1, c.width)), h], 1
        )
        pos = self.param(
            "positional_embedding", nn.initializers.normal(c.width**-0.5),
            (grid * grid + 1, c.width),
        )
        h = h + pos[None].astype(h.dtype)
        h = nn.LayerNorm(epsilon=1e-5, name="ln_pre")(h)
        for i in range(c.layers):
            h = _CLIPBlock(c.width, c.heads, name=f"resblocks_{i}")(h)
        h = nn.LayerNorm(epsilon=1e-5, name="ln_post")(h[:, 0])
        proj = self.param(
            "proj", nn.initializers.normal(c.width**-0.5), (c.width, c.output_dim)
        )
        return h @ proj


# ---------------------------------------------------------------------------
# DINO ViT (timm layout: patch_embed/blocks/norm keys)
# ---------------------------------------------------------------------------


@dataclasses.dataclass(frozen=True)
class DINOConfig:
    image_size: int = 224
    patch_size: int = 16
    width: int = 768
    layers: int = 12
    heads: int = 12


DINO_B16 = DINOConfig()


class _DINOBlock(nn.Module):
    dim: int
    heads: int

    @nn.compact
    def __call__(self, x: jax.Array) -> jax.Array:
        h = nn.LayerNorm(epsilon=1e-6, name="norm1")(x)
        x = x + _Attention(
            self.dim, self.heads, qkv_name="qkv", out_name="proj", name="attn"
        )(h)
        h = nn.LayerNorm(epsilon=1e-6, name="norm2")(x)
        h = nn.Dense(4 * self.dim, name="mlp_fc1")(h)
        h = nn.gelu(h, approximate=False)
        return x + nn.Dense(self.dim, name="mlp_fc2")(h)


class DINOEncoder(nn.Module):
    """(B, 224, 224, 3) ImageNet-normalized -> (B, width) CLS feature."""

    cfg: DINOConfig = DINO_B16

    @nn.compact
    def __call__(self, x: jax.Array) -> jax.Array:
        c = self.cfg
        grid = c.image_size // c.patch_size
        B = x.shape[0]
        h = nn.Conv(
            c.width, (c.patch_size, c.patch_size),
            strides=(c.patch_size, c.patch_size), name="patch_embed",
        )(x)
        h = h.reshape(B, grid * grid, c.width)
        cls = self.param("cls_token", nn.initializers.zeros, (1, 1, c.width))
        h = jnp.concatenate([jnp.broadcast_to(cls, (B, 1, c.width)), h], 1)
        pos = self.param(
            "pos_embed", nn.initializers.normal(0.02), (1, grid * grid + 1, c.width)
        )
        h = h + pos.astype(h.dtype)
        for i in range(c.layers):
            h = _DINOBlock(c.width, c.heads, name=f"blocks_{i}")(h)
        return nn.LayerNorm(epsilon=1e-6, name="norm")(h)[:, 0]


# ---------------------------------------------------------------------------
# torch weight import
# ---------------------------------------------------------------------------


def _put(tree: Dict[str, Any], path, value):
    node = tree
    for p in path[:-1]:
        node = node.setdefault(p, {})
    node[path[-1]] = jnp.asarray(np.asarray(value, dtype=np.float32))


def import_clip_vision_params(state: Dict[str, np.ndarray]) -> Dict[str, Any]:
    """Map an OpenAI CLIP state dict's ``visual.*`` keys onto
    :class:`CLIPVisionEncoder`. Non-visual keys are ignored."""
    tree: Dict[str, Any] = {}
    for key, val in state.items():
        if not key.startswith("visual."):
            continue
        v = np.asarray(val, dtype=np.float32)
        parts = key.split(".")[1:]  # drop 'visual'
        out: list = []
        i = 0
        while i < len(parts):
            p = parts[i]
            if p == "transformer" and parts[i + 1] == "resblocks":
                out.append(f"resblocks_{parts[i + 2]}")
                i += 3
                continue
            if p == "mlp":
                out.append(f"mlp_{parts[i + 1]}")
                i += 2
                continue
            if p == "attn" and parts[i + 1].startswith("in_proj"):
                out += ["attn", "in_proj", parts[i + 1].split("in_proj_")[1]]
                i += 2
                continue
            out.append(p)
            i += 1
        leaf = out[-1]
        if leaf == "proj" and len(out) == 1:
            _put(tree, ["proj"], v)  # stored as (width, out): used as x @ proj
        elif leaf == "weight" and v.ndim == 4:
            _put(tree, out[:-1] + ["kernel"], np.transpose(v, (2, 3, 1, 0)))
        elif leaf == "weight" and v.ndim == 2:
            _put(tree, out[:-1] + ["kernel"], v.T)
        elif leaf == "weight":  # LayerNorm
            _put(tree, out[:-1] + ["scale"], v)
        else:
            _put(tree, out, v)
    return tree


def import_dino_params(state: Dict[str, np.ndarray]) -> Dict[str, Any]:
    """Map a timm/facebookresearch DINO ViT state dict onto
    :class:`DINOEncoder` (head keys ignored)."""
    tree: Dict[str, Any] = {}
    for key, val in state.items():
        if key.startswith("head."):
            continue
        v = np.asarray(val, dtype=np.float32)
        parts = key.split(".")
        out: list = []
        i = 0
        while i < len(parts):
            p = parts[i]
            if p == "blocks" and parts[i + 1].isdigit():
                out.append(f"blocks_{parts[i + 1]}")
                i += 2
                continue
            if p == "mlp":
                out.append(f"mlp_{parts[i + 1]}")
                i += 2
                continue
            if p == "patch_embed" and parts[i + 1] == "proj":
                out.append("patch_embed")
                i += 2
                continue
            out.append(p)
            i += 1
        leaf = out[-1]
        if leaf == "weight" and v.ndim == 4:
            _put(tree, out[:-1] + ["kernel"], np.transpose(v, (2, 3, 1, 0)))
        elif leaf == "weight" and v.ndim == 2:
            _put(tree, out[:-1] + ["kernel"], v.T)
        elif leaf == "weight" and out[-2] in ("norm", "norm1", "norm2"):
            _put(tree, out[:-1] + ["scale"], v)
        else:
            _put(tree, out, v)
    return tree
