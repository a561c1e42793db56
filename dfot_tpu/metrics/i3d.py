"""I3D (inflated Inception-v1) video feature extractor for FVD (Flax).

The FVD convention (reference: metrics/video/fvd.py) scores videos of >= 9
frames by the 400-way logits of an I3D trained on Kinetics-400. The
architecture here matches the standard I3D so the public FVD weights can be
imported; without weights, the registry falls back to deterministic random
features (scores then track relative quality only, not published tables —
callers are warned via ``registry.comparable``).
"""

from __future__ import annotations

from typing import Tuple

import flax.linen as nn
import jax
import jax.numpy as jnp

__all__ = ["I3D"]


class Unit3D(nn.Module):
    features: int
    kernel: Tuple[int, int, int] = (1, 1, 1)
    strides: Tuple[int, int, int] = (1, 1, 1)
    use_bn: bool = True
    activation: bool = True
    dtype: jnp.dtype = jnp.float32

    @nn.compact
    def __call__(self, x: jax.Array, train: bool = False) -> jax.Array:
        x = nn.Conv(
            self.features, self.kernel, strides=self.strides, padding="SAME",
            use_bias=not self.use_bn, dtype=self.dtype, name="conv",
        )(x)
        if self.use_bn:
            x = nn.BatchNorm(use_running_average=not train, epsilon=1e-3, name="bn")(x)
        if self.activation:
            x = nn.relu(x)
        return x


class Mixed(nn.Module):
    """Inception block: four parallel branches concatenated on channels."""

    b0: int
    b1: Tuple[int, int]
    b2: Tuple[int, int]
    b3: int
    dtype: jnp.dtype = jnp.float32

    @nn.compact
    def __call__(self, x: jax.Array, train: bool = False) -> jax.Array:
        y0 = Unit3D(self.b0, dtype=self.dtype, name="b0")(x, train)
        y1 = Unit3D(self.b1[0], dtype=self.dtype, name="b1a")(x, train)
        y1 = Unit3D(self.b1[1], (3, 3, 3), dtype=self.dtype, name="b1b")(y1, train)
        y2 = Unit3D(self.b2[0], dtype=self.dtype, name="b2a")(x, train)
        y2 = Unit3D(self.b2[1], (3, 3, 3), dtype=self.dtype, name="b2b")(y2, train)
        y3 = nn.max_pool(x, (3, 3, 3), strides=(1, 1, 1), padding="SAME")
        y3 = Unit3D(self.b3, dtype=self.dtype, name="b3")(y3, train)
        return jnp.concatenate([y0, y1, y2, y3], axis=-1)


class I3D(nn.Module):
    """Input (B, T, H, W, 3) in [0, 1] (rescaled internally to [-1, 1]).

    Returns (logits (B, 400), pooled features (B, 1024)).
    """

    num_classes: int = 400
    dtype: jnp.dtype = jnp.float32

    @nn.compact
    def __call__(self, x: jax.Array, train: bool = False):
        x = x * 2.0 - 1.0
        h = Unit3D(64, (7, 7, 7), (2, 2, 2), dtype=self.dtype, name="conv1")(x, train)
        h = nn.max_pool(h, (1, 3, 3), strides=(1, 2, 2), padding="SAME")
        h = Unit3D(64, dtype=self.dtype, name="conv2")(h, train)
        h = Unit3D(192, (3, 3, 3), dtype=self.dtype, name="conv3")(h, train)
        h = nn.max_pool(h, (1, 3, 3), strides=(1, 2, 2), padding="SAME")
        h = Mixed(64, (96, 128), (16, 32), 32, self.dtype, name="mixed_3b")(h, train)
        h = Mixed(128, (128, 192), (32, 96), 64, self.dtype, name="mixed_3c")(h, train)
        h = nn.max_pool(h, (3, 3, 3), strides=(2, 2, 2), padding="SAME")
        h = Mixed(192, (96, 208), (16, 48), 64, self.dtype, name="mixed_4b")(h, train)
        h = Mixed(160, (112, 224), (24, 64), 64, self.dtype, name="mixed_4c")(h, train)
        h = Mixed(128, (128, 256), (24, 64), 64, self.dtype, name="mixed_4d")(h, train)
        h = Mixed(112, (144, 288), (32, 64), 64, self.dtype, name="mixed_4e")(h, train)
        h = Mixed(256, (160, 320), (32, 128), 128, self.dtype, name="mixed_4f")(h, train)
        h = nn.max_pool(h, (2, 2, 2), strides=(2, 2, 2), padding="SAME")
        h = Mixed(256, (160, 320), (32, 128), 128, self.dtype, name="mixed_5b")(h, train)
        h = Mixed(384, (192, 384), (48, 128), 128, self.dtype, name="mixed_5c")(h, train)
        pooled = jnp.mean(h, axis=(1, 2, 3))  # (B, 1024)
        logits = nn.Dense(self.num_classes, dtype=self.dtype, name="logits")(pooled)
        return logits, pooled
