"""PIPS2 point tracking (Zheng et al. 2023) — eval-only Flax port, NHWC.

TPU-native re-implementation of the reference's torch Pips
(algorithms/common/metrics/video/models/pips2.py, after the FVMD repo),
the tracker behind the Frechet Video Motion Distance: a grid of query
points is tracked through a 16-frame segment by iteratively refining all
S x N coordinates at once.

Structure per iteration (pips2.py:475-609):
- a multi-scale instance-norm ResNet encodes every frame to 1/8-resolution
  features once,
- point features are sampled at the query coords of frames t, t-2, t-4
  (temporal context) and correlated against every frame's feature map —
  S x N x (H8*W8) MXU matmuls,
- a 1-D ResNet over the TIME axis (per point) maps correlation windows +
  sincos-embedded flow to coordinate deltas.

The iteration count is static so the whole tracker jits into one program.
Weights (pips2_weights.pth) load via ``import_pips_params``.
"""

from __future__ import annotations

from typing import Any, Dict

import flax.linen as nn
import jax
import jax.numpy as jnp
import numpy as np

from .raft import _bilinear_sample

__all__ = ["Pips", "import_pips_params"]


def _instance_norm(x, axes, eps=1e-5):
    mu = x.mean(axis=axes, keepdims=True)
    var = x.var(axis=axes, keepdims=True)
    return (x - mu) * jax.lax.rsqrt(var + eps)


def _resize_align_corners(x: jax.Array, out_hw) -> jax.Array:
    """F.interpolate(mode='bilinear', align_corners=True): output pixel i
    samples input coordinate i * (in-1)/(out-1)."""
    B, H, W, C = x.shape
    oh, ow = out_hw
    ys = jnp.arange(oh, dtype=jnp.float32) * ((H - 1) / max(oh - 1, 1))
    xs = jnp.arange(ow, dtype=jnp.float32) * ((W - 1) / max(ow - 1, 1))
    gy, gx = jnp.meshgrid(ys, xs, indexing="ij")
    coords = jnp.broadcast_to(jnp.stack([gx, gy], -1)[None], (B, oh, ow, 2))
    return _bilinear_sample(x, coords)


def _bilinear_sample2d(fmap: jax.Array, x: jax.Array, y: jax.Array) -> jax.Array:
    """pips2.py:624-700: bilinear with edge-clamped indices but RAW corner
    weights (unlike grid_sample's zero padding). fmap (B, H, W, C);
    x/y (B, N) pixel coords -> (B, N, C)."""
    B, H, W, C = fmap.shape
    x0 = jnp.floor(x)
    y0 = jnp.floor(y)
    flat = fmap.reshape(B, H * W, C)

    def gather(xi, yi):
        xc = jnp.clip(xi, 0, W - 1).astype(jnp.int32)
        yc = jnp.clip(yi, 0, H - 1).astype(jnp.int32)
        return jnp.take_along_axis(flat, (yc * W + xc)[..., None], axis=1)

    w00 = ((x0 + 1 - x) * (y0 + 1 - y))[..., None]
    w01 = ((x - x0) * (y0 + 1 - y))[..., None]
    w10 = ((x0 + 1 - x) * (y - y0))[..., None]
    w11 = ((x - x0) * (y - y0))[..., None]
    return (
        w00 * gather(x0, y0)
        + w01 * gather(x0 + 1, y0)
        + w10 * gather(x0, y0 + 1)
        + w11 * gather(x0 + 1, y0 + 1)
    )


class ResidualBlock2d(nn.Module):
    """pips2.py:141-200, norm_fn='instance' (parameter-free norms)."""

    planes: int
    stride: int = 1

    @nn.compact
    def __call__(self, x):
        y = nn.Conv(self.planes, (3, 3), strides=self.stride, padding=1, name="conv1")(x)
        y = nn.relu(_instance_norm(y, (1, 2)))
        y = nn.Conv(self.planes, (3, 3), padding=1, name="conv2")(y)
        y = nn.relu(_instance_norm(y, (1, 2)))
        if self.stride != 1:
            x = nn.Conv(self.planes, (1, 1), strides=self.stride, name="down_conv")(x)
            x = _instance_norm(x, (1, 2))
        return nn.relu(x + y)


class BasicEncoder(nn.Module):
    """pips2.py:203-305: 4-stage ResNet whose per-stage features are all
    align-corners-resized to 1/8 resolution and fused."""

    output_dim: int = 128
    stride: int = 8

    @nn.compact
    def __call__(self, x):
        H, W = x.shape[1:3]
        out_hw = (H // self.stride, W // self.stride)
        x = nn.Conv(64, (7, 7), strides=2, padding=3, name="conv1")(x)
        x = nn.relu(_instance_norm(x, (1, 2)))
        feats = []
        for i, (dim, stride) in enumerate(((64, 1), (96, 2), (128, 2), (128, 2))):
            x = ResidualBlock2d(dim, stride, name=f"layer{i + 1}_0")(x)
            x = ResidualBlock2d(dim, 1, name=f"layer{i + 1}_1")(x)
            feats.append(_resize_align_corners(x, out_hw))
        x = nn.Conv(
            self.output_dim * 2, (3, 3), padding=1, name="conv2"
        )(jnp.concatenate(feats, -1))
        x = nn.relu(_instance_norm(x, (1, 2)))
        return nn.Conv(self.output_dim, (1, 1), name="conv3")(x)


class ResidualBlock1d(nn.Module):
    """pips2.py:44-118: pre-norm 1-D residual block over the time axis with
    zero-padded channel growth. Input (B, S, C)."""

    in_channels: int
    out_channels: int
    is_first_block: bool = False

    @nn.compact
    def __call__(self, x):
        identity = x
        out = x
        if not self.is_first_block:
            # InstanceNorm1d normalizes over the length axis per channel
            out = nn.relu(_instance_norm(out, (1,)))
        out = nn.Conv(self.out_channels, (3,), padding=1, name="conv1")(out)
        out = nn.relu(_instance_norm(out, (1,)))
        out = nn.Conv(self.out_channels, (3,), padding=1, name="conv2")(out)
        if self.out_channels != self.in_channels:
            ch1 = (self.out_channels - self.in_channels) // 2
            ch2 = self.out_channels - self.in_channels - ch1
            identity = jnp.pad(identity, ((0, 0), (0, 0), (ch1, ch2)))
        return out + identity


def _posemb_sincos_2d_xy(xy: jax.Array, C: int, temperature=10000.0) -> jax.Array:
    """pips2.py:724-743 with cat_coords=True. xy (B, S, 2) -> (B, S, C+2)."""
    omega = jnp.arange(C // 4, dtype=jnp.float32) / (C // 4 - 1)
    omega = 1.0 / (temperature**omega)
    x = xy[..., 0, None] * omega
    y = xy[..., 1, None] * omega
    pe = jnp.concatenate([jnp.sin(x), jnp.cos(x), jnp.sin(y), jnp.cos(y)], -1)
    return jnp.concatenate([pe, xy], -1)


class DeltaBlock(nn.Module):
    """pips2.py:308-390: ResNet1D over (B*N, S, kitchen) -> per-step 2-D
    coordinate deltas. (The torch module defines first_block_norm and
    final_norm but never applies them — reproduced.)"""

    latent_dim: int = 128
    n_block: int = 8

    @nn.compact
    def __call__(self, fcorr, flow):
        pe = _posemb_sincos_2d_xy(flow, self.latent_dim)
        x = jnp.concatenate([fcorr, pe], -1)
        x = nn.relu(nn.Conv(128, (3,), padding=1, name="first_block_conv")(x))
        in_ch = 128
        for i in range(self.n_block):
            if i == 0:
                out_ch = in_ch = 128
            else:
                in_ch = int(128 * 2 ** ((i - 1) // 2))
                out_ch = in_ch * 2 if (i % 2 == 0) else in_ch
            x = ResidualBlock1d(
                in_ch, out_ch, is_first_block=(i == 0), name=f"block_{i}"
            )(x)
        x = nn.relu(x)
        return nn.Dense(2, name="dense")(x)


def _fmap_pyramid(fmaps, num_levels=4):
    """Per-frame feature pyramid (pips2.py CorrBlock.__init__). fmaps
    (S, H, W, C) -> list of (S, h, w, C)."""
    pyr = [fmaps]
    for _ in range(num_levels - 1):
        fmaps = nn.avg_pool(fmaps, (2, 2), strides=(2, 2))
        pyr.append(fmaps)
    return pyr


def _corr_sample(pyramid, feats, coords, radius):
    """corr + windowed sample (pips2.py:431-472) fused: feats (S, N, C)
    against each pyramid level, sampled in a (2r+1)^2 window around coords
    (S, N, 2). Returns (S, N, L*(2r+1)^2)."""
    S, N, C = feats.shape
    r = radius
    d = jnp.arange(-r, r + 1, dtype=jnp.float32)
    dy, dx = jnp.meshgrid(d, d, indexing="ij")
    delta = jnp.stack([dy, dx], axis=-1)  # (2r+1, 2r+1, 2) — dy perturbs x
    out = []
    for i, fmaps in enumerate(pyramid):
        h, w = fmaps.shape[1:3]
        corr = jnp.einsum("snc,shwc->snhw", feats, fmaps) / jnp.sqrt(
            jnp.float32(C)
        )
        corr = corr.reshape(S * N, h, w, 1)
        window = coords.reshape(S * N, 1, 1, 2) / (2**i) + delta[None]
        out.append(_bilinear_sample(corr, window).reshape(S, N, (2 * r + 1) ** 2))
    return jnp.concatenate(out, -1)


class Pips(nn.Module):
    """Track query points through a frame sequence. Inputs: trajs0
    (S, N, 2) initial pixel coords (usually frame-0 grid repeated), rgbs
    (S, H, W, 3) in [-1, 1]. Returns final trajectories (S, N, 2).
    Batch dim is intentionally absent (the reference requires B == 1);
    vmap externally if needed."""

    stride: int = 8
    latent_dim: int = 128
    corr_levels: int = 4
    corr_radius: int = 3
    iters: int = 16
    beautify: bool = True

    @nn.compact
    def __call__(self, trajs0, rgbs):
        S, N, _ = trajs0.shape
        H, W = rgbs.shape[1:3]
        fmaps = BasicEncoder(self.latent_dim, self.stride, name="fnet")(rgbs)
        pyramid = _fmap_pyramid(fmaps, self.corr_levels)

        coords0 = trajs0 / float(self.stride)
        delta_block = DeltaBlock(self.latent_dim, name="delta_block")

        # frame-0 features at the query points, shared across time
        feat1 = _bilinear_sample2d(
            fmaps[:1], coords0[:1, :, 0], coords0[:1, :, 1]
        )[0]  # (N, C)
        feats1 = jnp.broadcast_to(feat1[None], (S, N, self.latent_dim))

        inds2 = np.clip(np.arange(S) - 2, 0, None)
        inds4 = np.clip(np.arange(S) - 4, 0, None)

        coords = coords0
        for itr in range(self.iters):
            if itr >= 1:
                c2 = coords[inds2]
                c4 = coords[inds4]
                feats2 = _bilinear_sample2d(fmaps[inds2], c2[..., 0], c2[..., 1])
                feats4 = _bilinear_sample2d(fmaps[inds4], c4[..., 0], c4[..., 1])
            else:
                feats2 = feats1
                feats4 = feats1

            fcorrs = jnp.concatenate(
                [
                    _corr_sample(pyramid, feats1, coords, self.corr_radius),
                    _corr_sample(pyramid, feats2, coords, self.corr_radius),
                    _corr_sample(pyramid, feats4, coords, self.corr_radius),
                ],
                -1,
            )  # (S, N, 3*LRR)
            flows = coords[1:] - coords[:-1]
            flows = jnp.concatenate([flows, flows[-1:]], 0)  # (S, N, 2)

            # DeltaBlock wants (B*N, S, ·)
            delta = delta_block(
                fcorrs.transpose(1, 0, 2), flows.transpose(1, 0, 2)
            ).transpose(1, 0, 2)
            if self.beautify and itr > 3 * self.iters // 4:
                delta = delta * 0.5
            coords = coords + delta
            # lock frame 0 to the query points
            coords = coords.at[0].set(coords0[0])

        return coords * float(self.stride)


# ---------------------------------------------------------------------------
# torch checkpoint import
# ---------------------------------------------------------------------------


def import_pips_params(state: Dict[str, np.ndarray]) -> Dict[str, Any]:
    """Map the published PIPS2 checkpoint (pips2_weights.pth, torch module
    names as in the reference pips2.py) onto this Flax tree."""
    import re

    from ..utils.torch_ckpt import _unflatten, conv_w, linear_w

    def conv1d_w(v):  # torch (O, I, K) -> flax (K, I, O)
        return np.ascontiguousarray(v.transpose(2, 1, 0))

    state = {
        k: np.asarray(v)
        for k, v in state.items()
        if not k.endswith("num_batches_tracked")
    }
    out: Dict[str, np.ndarray] = {}
    for key, v in state.items():
        k = key
        k = re.sub(r"^fnet\.layer(\d)\.(\d)\.", r"fnet/layer\1_\2/", k)
        k = k.replace("downsample.0", "down_conv")
        k = k.replace("fnet.", "fnet/")
        k = re.sub(
            r"delta_block\.basicblock_list\.(\d+)\.conv(\d)\.conv\.",
            r"delta_block/block_\1/conv\2/", k,
        )
        k = k.replace("delta_block.first_block_conv.conv.", "delta_block/first_block_conv/")
        k = k.replace("delta_block.dense.", "delta_block/dense/")
        k = k.replace(".", "/")
        if k.startswith("norm/"):
            # Pips defines self.norm = GroupNorm(1, 128) but never uses it
            continue
        if k.endswith("/weight"):
            base = k[: -len("/weight")]
            if v.ndim == 4:
                out[f"{base}/kernel"] = conv_w(v)
            elif v.ndim == 3:
                out[f"{base}/kernel"] = conv1d_w(v)
            elif v.ndim == 2:
                out[f"{base}/kernel"] = linear_w(v)
            else:
                raise KeyError(f"unexpected weight shape for {key}: {v.shape}")
        elif k.endswith("/bias"):
            out[k] = v
        else:
            raise KeyError(f"unmapped PIPS key {key!r}")
    return _unflatten(out)
