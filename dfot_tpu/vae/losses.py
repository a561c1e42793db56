"""VAE training losses: LPIPS perceptual + PatchGAN adversarial + KL.

Counterpart of the reference's loss stack (algorithms/vae/common/losses/):
- LPIPS: VGG16 feature distances with learned linear heads. Pretrained VGG
  weights load from ``weights_path`` (torch-format converted); without them
  the module still runs (random features) but scores are not comparable —
  callers are warned.
- NLayerDiscriminator: PatchGAN over NHWC images.
- LPIPSWithDiscriminator: recon (l1/l2) + perceptual + KL + adversarial with
  the adaptive generator weight  ||grad_rec|| / ||grad_gan||  computed wrt
  the decoder's final conv params (reference perceptual_loss.py).
"""

from __future__ import annotations

import dataclasses
from typing import Dict, Optional, Tuple

import flax.linen as nn
import jax
import jax.numpy as jnp

__all__ = [
    "VGG16Features",
    "LPIPS",
    "NLayerDiscriminator",
    "hinge_d_loss",
    "vanilla_d_loss",
    "adopt_weight",
    "vae_generator_loss",
    "vae_discriminator_loss",
    "calculate_adaptive_weight",
    "decoder_last_kernel_path",
    "tree_get",
    "tree_set",
]

_VGG_SLICES = ((2, 64), (2, 128), (3, 256), (3, 512), (3, 512))


class VGG16Features(nn.Module):
    """VGG16 feature pyramid (5 relu stages) over NHWC in [-1, 1]."""

    dtype: jnp.dtype = jnp.float32

    @nn.compact
    def __call__(self, x: jax.Array):
        # imagenet normalization (LPIPS 'scaling layer')
        shift = jnp.asarray([-0.030, -0.088, -0.188])
        scale = jnp.asarray([0.458, 0.448, 0.450])
        h = (x - shift) / scale
        feats = []
        for i, (n_convs, ch) in enumerate(_VGG_SLICES):
            for j in range(n_convs):
                h = nn.Conv(ch, (3, 3), dtype=self.dtype, name=f"conv{i}_{j}")(h)
                h = nn.relu(h)
            feats.append(h)
            if i != len(_VGG_SLICES) - 1:
                h = nn.max_pool(h, (2, 2), strides=(2, 2))
        return feats


class LPIPS(nn.Module):
    """Learned perceptual distance; returns (B,) per-pair distances."""

    dtype: jnp.dtype = jnp.float32

    @nn.compact
    def __call__(self, x: jax.Array, y: jax.Array) -> jax.Array:
        vgg = VGG16Features(self.dtype, name="vgg")
        fx, fy = vgg(x), vgg(y)
        total = 0.0
        for i, (a, b) in enumerate(zip(fx, fy)):
            a = a / jnp.clip(jnp.linalg.norm(a, axis=-1, keepdims=True), 1e-10)
            b = b / jnp.clip(jnp.linalg.norm(b, axis=-1, keepdims=True), 1e-10)
            d = (a - b) ** 2
            lin = nn.Conv(
                1, (1, 1), use_bias=False, dtype=self.dtype, name=f"lin{i}"
            )(d)
            total = total + jnp.mean(lin, axis=(1, 2, 3))
        return total


class NLayerDiscriminator(nn.Module):
    """PatchGAN discriminator (pix2pix-style), NHWC."""

    ndf: int = 64
    n_layers: int = 3
    dtype: jnp.dtype = jnp.float32

    @nn.compact
    def __call__(self, x: jax.Array, train: bool = False) -> jax.Array:
        h = nn.Conv(self.ndf, (4, 4), strides=(2, 2), dtype=self.dtype, name="conv0")(x)
        h = nn.leaky_relu(h, 0.2)
        nf = 1
        for n in range(1, self.n_layers + 1):
            nf = min(2**n, 8)
            stride = (2, 2) if n < self.n_layers else (1, 1)
            h = nn.Conv(
                self.ndf * nf, (4, 4), strides=stride, use_bias=False,
                dtype=self.dtype, name=f"conv{n}",
            )(h)
            h = nn.BatchNorm(
                use_running_average=not train, dtype=self.dtype, name=f"bn{n}"
            )(h)
            h = nn.leaky_relu(h, 0.2)
        return nn.Conv(1, (4, 4), dtype=self.dtype, name="conv_out")(h)


def hinge_d_loss(logits_real: jax.Array, logits_fake: jax.Array) -> jax.Array:
    return 0.5 * (
        jnp.mean(nn.relu(1.0 - logits_real)) + jnp.mean(nn.relu(1.0 + logits_fake))
    )


def vanilla_d_loss(logits_real: jax.Array, logits_fake: jax.Array) -> jax.Array:
    return 0.5 * (
        jnp.mean(jax.nn.softplus(-logits_real)) + jnp.mean(jax.nn.softplus(logits_fake))
    )


def adopt_weight(weight: float, global_step: jax.Array, threshold: int) -> jax.Array:
    """Zero the adversarial weight before disc_start (reference)."""
    return jnp.where(global_step >= threshold, weight, 0.0)


def vae_generator_loss(
    recon: jax.Array,
    target: jax.Array,
    kl: jax.Array,
    logits_fake: Optional[jax.Array],
    *,
    kl_weight: float,
    disc_weight: jax.Array,
    perceptual: Optional[jax.Array] = None,
    perceptual_weight: float = 1.0,
    loss_type: str = "l1",
    adaptive_weight: Optional[jax.Array] = None,
) -> Tuple[jax.Array, Dict[str, jax.Array]]:
    """Combined autoencoder loss (reference LPIPSWithDiscriminator forward)."""
    if loss_type == "l1":
        rec = jnp.abs(recon - target)
    else:
        rec = (recon - target) ** 2
    if perceptual is not None:
        rec_total = jnp.mean(rec) + perceptual_weight * jnp.mean(perceptual)
    else:
        rec_total = jnp.mean(rec)
    kl_loss = jnp.mean(kl)
    g_loss = -jnp.mean(logits_fake) if logits_fake is not None else 0.0
    aw = adaptive_weight if adaptive_weight is not None else 1.0
    total = rec_total + kl_weight * kl_loss + disc_weight * aw * g_loss
    return total, {
        "rec_loss": rec_total,
        "kl_loss": kl_loss,
        "g_loss": jnp.asarray(g_loss),
    }


def decoder_last_kernel_path(params) -> Tuple[str, ...]:
    """Path to the decoder's final conv kernel inside a VAE param tree.

    The reference's adaptive generator weight differentiates wrt the
    decoder's LAST LAYER weight (``get_last_layer()`` returns
    ``decoder.conv_out.weight``; perceptual_loss.py:77-90, 227-236). Both
    ImageVAE and VideoVAE scope it under ``decoder/conv_out``; VideoVAE's
    CausalConv3d nests an inner ``nn.Conv``, so descend to the ``kernel``
    leaf.
    """

    from collections.abc import Mapping

    def find(tree, path):
        # Mapping (not dict): flax FrozenDict trees must recurse too
        if isinstance(tree, Mapping):
            k = tree.get("kernel")
            if k is not None and not isinstance(k, Mapping):
                return path + ("kernel",)
            for key in tree:
                r = find(tree[key], path + (key,))
                if r is not None:
                    return r
        return None

    path = find(params["decoder"]["conv_out"], ("decoder", "conv_out"))
    if path is None:
        raise ValueError("no kernel leaf under decoder/conv_out")
    return path


def tree_get(tree, path: Tuple[str, ...]):
    for k in path:
        tree = tree[k]
    return tree


def tree_set(tree, path: Tuple[str, ...], value):
    """Copy-on-path functional set (plain-dict param trees)."""
    if not path:
        return value
    return {**tree, path[0]: tree_set(tree[path[0]], path[1:], value)}


def calculate_adaptive_weight(
    nll_grads: jax.Array, g_grads: jax.Array, disc_weight: float = 1.0
) -> jax.Array:
    """Reference ``calculate_adaptive_weight`` (perceptual_loss.py:77-90):
    ``||grad(nll, last_layer)|| / (||grad(gan, last_layer)|| + 1e-4)``,
    clipped to [0, 1e4], detached, scaled by ``disc_weight``."""
    d = jnp.linalg.norm(nll_grads.ravel()) / (
        jnp.linalg.norm(g_grads.ravel()) + 1e-4
    )
    return jax.lax.stop_gradient(jnp.clip(d, 0.0, 1e4)) * disc_weight


def vae_discriminator_loss(
    logits_real: jax.Array, logits_fake: jax.Array,
    disc_weight: jax.Array, loss_type: str = "hinge",
) -> jax.Array:
    fn = hinge_d_loss if loss_type == "hinge" else vanilla_d_loss
    return disc_weight * fn(logits_real, logits_fake)


# torchvision vgg16 `features.{idx}` conv indices per (stage, conv-in-stage)
_VGG_TORCHVISION_IDX = (
    (0, 0, 0), (0, 1, 2),
    (1, 0, 5), (1, 1, 7),
    (2, 0, 10), (2, 1, 12), (2, 2, 14),
    (3, 0, 17), (3, 1, 19), (3, 2, 21),
    (4, 0, 24), (4, 1, 26), (4, 2, 28),
)


def import_lpips_params(lin_state, vgg_state):
    """Build the LPIPS flax param tree from torch checkpoints.

    lin_state: the official ``lpips`` package vgg.pth (keys
    ``lin{i}.model.1.weight`` — 1x1 convs over normalized feature diffs).
    vgg_state: torchvision ``vgg16`` state dict (``features.{idx}.weight``).
    """
    import numpy as np

    tree = {"vgg": {}}
    for stage, j, idx in _VGG_TORCHVISION_IDX:
        w = np.asarray(vgg_state[f"features.{idx}.weight"], dtype=np.float32)
        b = np.asarray(vgg_state[f"features.{idx}.bias"], dtype=np.float32)
        tree["vgg"][f"conv{stage}_{j}"] = {
            "kernel": jnp.asarray(np.transpose(w, (2, 3, 1, 0))),
            "bias": jnp.asarray(b),
        }
    for i in range(5):
        w = np.asarray(lin_state[f"lin{i}.model.1.weight"], dtype=np.float32)
        tree[f"lin{i}"] = {"kernel": jnp.asarray(np.transpose(w, (2, 3, 1, 0)))}
    return tree
