"""InceptionV3 (FID variant) — Flax, torchvision-weight-importable.

Counterpart of the reference's NoTrainInceptionV3 feature extractor
(shared_registry.py:63-65, via torchmetrics/pytorch-fid): the classic FID
Inception — torchvision inception_v3 layout with the FID quirks: pool
branches use count_include_pad=False average pooling, the final InceptionE
uses max pooling, and the classifier has 1008 outputs.

Returns (features (B, 2048), logits (B, 1008)). Import weights from a
torchvision-style state dict (``Conv2d_1a_3x3.conv.weight``,
``Mixed_5b.branch1x1.bn.running_mean``, ``fc.weight``, ...) with
:func:`import_inception_params`. Inference-only (BN running stats held as
parameters, like the DC-AE port).
"""

from __future__ import annotations

from typing import Any, Dict, Tuple

import flax.linen as nn
import jax
import jax.numpy as jnp
import numpy as np

from ..vae.dc_ae import BatchNorm2dInf

__all__ = ["InceptionV3", "inception_preprocess", "import_inception_params"]


def inception_preprocess(x: jax.Array) -> jax.Array:
    """(B, H, W, 3) in [0, 1] -> 299px, [-1, 1] (pytorch-fid convention)."""
    B = x.shape[0]
    x = jax.image.resize(x, (B, 299, 299, 3), "bilinear")
    return x * 2.0 - 1.0


def _avg_pool3(x: jax.Array) -> jax.Array:
    """3x3 stride-1 SAME average pool with count_include_pad=False."""
    s = jax.lax.reduce_window(
        x, 0.0, jax.lax.add, (1, 3, 3, 1), (1, 1, 1, 1), "SAME"
    )
    ones = jnp.ones(x.shape[:3] + (1,), x.dtype)
    n = jax.lax.reduce_window(
        ones, 0.0, jax.lax.add, (1, 3, 3, 1), (1, 1, 1, 1), "SAME"
    )
    return s / n


def _max_pool(x: jax.Array, window: int = 3, stride: int = 2) -> jax.Array:
    return jax.lax.reduce_window(
        x, -jnp.inf, jax.lax.max, (1, window, window, 1), (1, stride, stride, 1),
        "VALID",
    )


class BasicConv2d(nn.Module):
    features: int
    kernel: Tuple[int, int]
    strides: Tuple[int, int] = (1, 1)
    padding: Any = "VALID"

    @nn.compact
    def __call__(self, x: jax.Array) -> jax.Array:
        x = nn.Conv(
            self.features, self.kernel, strides=self.strides,
            padding=self.padding, use_bias=False, name="conv",
        )(x)
        x = BatchNorm2dInf(self.features, eps=1e-3, name="bn")(x)
        return nn.relu(x)


class InceptionA(nn.Module):
    pool_features: int

    @nn.compact
    def __call__(self, x):
        b1 = BasicConv2d(64, (1, 1), name="branch1x1")(x)
        b5 = BasicConv2d(48, (1, 1), name="branch5x5_1")(x)
        b5 = BasicConv2d(64, (5, 5), padding=((2, 2), (2, 2)), name="branch5x5_2")(b5)
        b3 = BasicConv2d(64, (1, 1), name="branch3x3dbl_1")(x)
        b3 = BasicConv2d(96, (3, 3), padding=((1, 1), (1, 1)), name="branch3x3dbl_2")(b3)
        b3 = BasicConv2d(96, (3, 3), padding=((1, 1), (1, 1)), name="branch3x3dbl_3")(b3)
        bp = BasicConv2d(self.pool_features, (1, 1), name="branch_pool")(_avg_pool3(x))
        return jnp.concatenate([b1, b5, b3, bp], axis=-1)


class InceptionB(nn.Module):
    @nn.compact
    def __call__(self, x):
        b3 = BasicConv2d(384, (3, 3), strides=(2, 2), name="branch3x3")(x)
        bd = BasicConv2d(64, (1, 1), name="branch3x3dbl_1")(x)
        bd = BasicConv2d(96, (3, 3), padding=((1, 1), (1, 1)), name="branch3x3dbl_2")(bd)
        bd = BasicConv2d(96, (3, 3), strides=(2, 2), name="branch3x3dbl_3")(bd)
        return jnp.concatenate([b3, bd, _max_pool(x)], axis=-1)


class InceptionC(nn.Module):
    channels_7x7: int

    @nn.compact
    def __call__(self, x):
        c7 = self.channels_7x7
        p17 = ((0, 0), (3, 3))
        p71 = ((3, 3), (0, 0))
        b1 = BasicConv2d(192, (1, 1), name="branch1x1")(x)
        b7 = BasicConv2d(c7, (1, 1), name="branch7x7_1")(x)
        b7 = BasicConv2d(c7, (1, 7), padding=p17, name="branch7x7_2")(b7)
        b7 = BasicConv2d(192, (7, 1), padding=p71, name="branch7x7_3")(b7)
        bd = BasicConv2d(c7, (1, 1), name="branch7x7dbl_1")(x)
        bd = BasicConv2d(c7, (7, 1), padding=p71, name="branch7x7dbl_2")(bd)
        bd = BasicConv2d(c7, (1, 7), padding=p17, name="branch7x7dbl_3")(bd)
        bd = BasicConv2d(c7, (7, 1), padding=p71, name="branch7x7dbl_4")(bd)
        bd = BasicConv2d(192, (1, 7), padding=p17, name="branch7x7dbl_5")(bd)
        bp = BasicConv2d(192, (1, 1), name="branch_pool")(_avg_pool3(x))
        return jnp.concatenate([b1, b7, bd, bp], axis=-1)


class InceptionD(nn.Module):
    @nn.compact
    def __call__(self, x):
        b3 = BasicConv2d(192, (1, 1), name="branch3x3_1")(x)
        b3 = BasicConv2d(320, (3, 3), strides=(2, 2), name="branch3x3_2")(b3)
        b7 = BasicConv2d(192, (1, 1), name="branch7x7x3_1")(x)
        b7 = BasicConv2d(192, (1, 7), padding=((0, 0), (3, 3)), name="branch7x7x3_2")(b7)
        b7 = BasicConv2d(192, (7, 1), padding=((3, 3), (0, 0)), name="branch7x7x3_3")(b7)
        b7 = BasicConv2d(192, (3, 3), strides=(2, 2), name="branch7x7x3_4")(b7)
        return jnp.concatenate([b3, b7, _max_pool(x)], axis=-1)


class InceptionE(nn.Module):
    use_max_pool: bool = False  # FID quirk: the LAST E block max-pools

    @nn.compact
    def __call__(self, x):
        p13 = ((0, 0), (1, 1))
        p31 = ((1, 1), (0, 0))
        b1 = BasicConv2d(320, (1, 1), name="branch1x1")(x)
        b3 = BasicConv2d(384, (1, 1), name="branch3x3_1")(x)
        b3 = jnp.concatenate(
            [
                BasicConv2d(384, (1, 3), padding=p13, name="branch3x3_2a")(b3),
                BasicConv2d(384, (3, 1), padding=p31, name="branch3x3_2b")(b3),
            ],
            axis=-1,
        )
        bd = BasicConv2d(448, (1, 1), name="branch3x3dbl_1")(x)
        bd = BasicConv2d(384, (3, 3), padding=((1, 1), (1, 1)), name="branch3x3dbl_2")(bd)
        bd = jnp.concatenate(
            [
                BasicConv2d(384, (1, 3), padding=p13, name="branch3x3dbl_3a")(bd),
                BasicConv2d(384, (3, 1), padding=p31, name="branch3x3dbl_3b")(bd),
            ],
            axis=-1,
        )
        if self.use_max_pool:
            pooled = jax.lax.reduce_window(
                x, -jnp.inf, jax.lax.max, (1, 3, 3, 1), (1, 1, 1, 1), "SAME"
            )
        else:
            pooled = _avg_pool3(x)
        bp = BasicConv2d(192, (1, 1), name="branch_pool")(pooled)
        return jnp.concatenate([b1, b3, bd, bp], axis=-1)


class InceptionV3(nn.Module):
    """(B, 299, 299, 3) in [-1, 1] -> (pooled (B, 2048), logits (B, 1008))."""

    num_classes: int = 1008

    @nn.compact
    def __call__(self, x: jax.Array):
        x = BasicConv2d(32, (3, 3), strides=(2, 2), name="Conv2d_1a_3x3")(x)
        x = BasicConv2d(32, (3, 3), name="Conv2d_2a_3x3")(x)
        x = BasicConv2d(64, (3, 3), padding=((1, 1), (1, 1)), name="Conv2d_2b_3x3")(x)
        x = _max_pool(x)
        x = BasicConv2d(80, (1, 1), name="Conv2d_3b_1x1")(x)
        x = BasicConv2d(192, (3, 3), name="Conv2d_4a_3x3")(x)
        x = _max_pool(x)
        x = InceptionA(32, name="Mixed_5b")(x)
        x = InceptionA(64, name="Mixed_5c")(x)
        x = InceptionA(64, name="Mixed_5d")(x)
        x = InceptionB(name="Mixed_6a")(x)
        x = InceptionC(128, name="Mixed_6b")(x)
        x = InceptionC(160, name="Mixed_6c")(x)
        x = InceptionC(160, name="Mixed_6d")(x)
        x = InceptionC(192, name="Mixed_6e")(x)
        x = InceptionD(name="Mixed_7a")(x)
        x = InceptionE(name="Mixed_7b")(x)
        x = InceptionE(use_max_pool=True, name="Mixed_7c")(x)
        pooled = jnp.mean(x, axis=(1, 2))  # adaptive avg pool to 1x1
        logits = nn.Dense(self.num_classes, name="fc")(pooled)
        return pooled, logits


def import_inception_params(state: Dict[str, np.ndarray]) -> Dict[str, Any]:
    """Map a torchvision-style InceptionV3 state dict (the pt-inception FID
    weights use this naming) onto the flax tree. AuxLogits keys ignored."""
    tree: Dict[str, Any] = {}

    def put(path, value):
        node = tree
        for p in path[:-1]:
            node = node.setdefault(p, {})
        node[path[-1]] = jnp.asarray(np.asarray(value, dtype=np.float32))

    for key, val in state.items():
        if key.startswith("AuxLogits") or key.endswith("num_batches_tracked"):
            continue
        v = np.asarray(val, dtype=np.float32)
        parts = key.split(".")
        leaf = parts[-1]
        if leaf == "weight" and v.ndim == 4:
            put(parts[:-1] + ["kernel"], np.transpose(v, (2, 3, 1, 0)))
        elif leaf == "weight" and v.ndim == 2:
            put(parts[:-1] + ["kernel"], v.T)
        else:  # bn weight/bias/running stats, fc bias
            put(parts, v)
    return tree
