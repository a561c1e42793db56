"""Frame-wise functional metrics: MSE, PSNR, SSIM (pure JAX).

Computed on videos in [0, 1]; frame-wise metrics are averaged over
non-context frames only by the VideoMetric wrapper (reference:
algorithms/common/metrics/video/video_metric.py).
"""

from __future__ import annotations

import jax
import jax.numpy as jnp

__all__ = ["mse", "psnr", "ssim"]


def mse(pred: jax.Array, target: jax.Array) -> jax.Array:
    """Per-frame MSE: (B, T, H, W, C) -> (B, T)."""
    return jnp.mean((pred - target) ** 2, axis=(-1, -2, -3))


def psnr(pred: jax.Array, target: jax.Array, data_range: float = 1.0) -> jax.Array:
    m = mse(pred, target)
    return 10.0 * jnp.log10(data_range**2 / jnp.clip(m, 1e-12, None))


def _gaussian_kernel(size: int = 11, sigma: float = 1.5) -> jax.Array:
    x = jnp.arange(size, dtype=jnp.float32) - (size - 1) / 2.0
    g = jnp.exp(-0.5 * (x / sigma) ** 2)
    g = g / g.sum()
    return jnp.outer(g, g)


def ssim(
    pred: jax.Array,
    target: jax.Array,
    data_range: float = 1.0,
    kernel_size: int = 11,
    sigma: float = 1.5,
) -> jax.Array:
    """Per-frame SSIM with a gaussian window: (B, T, H, W, C) -> (B, T)."""
    c1 = (0.01 * data_range) ** 2
    c2 = (0.03 * data_range) ** 2
    k = _gaussian_kernel(kernel_size, sigma)

    B, T, H, W, C = pred.shape
    x = pred.reshape(B * T, H, W, C)
    y = target.reshape(B * T, H, W, C)

    kern = k[:, :, None, None]  # (kh, kw, 1, 1)

    def filt(v):
        # depthwise gaussian filter
        return jax.lax.conv_general_dilated(
            v,
            jnp.tile(kern, (1, 1, 1, C)),
            window_strides=(1, 1),
            padding="VALID",
            dimension_numbers=("NHWC", "HWIO", "NHWC"),
            feature_group_count=C,
        )

    mu_x, mu_y = filt(x), filt(y)
    sxx = filt(x * x) - mu_x**2
    syy = filt(y * y) - mu_y**2
    sxy = filt(x * y) - mu_x * mu_y
    num = (2 * mu_x * mu_y + c1) * (2 * sxy + c2)
    den = (mu_x**2 + mu_y**2 + c1) * (sxx + syy + c2)
    s = num / den
    return jnp.mean(s.reshape(B, T, -1), axis=-1)
