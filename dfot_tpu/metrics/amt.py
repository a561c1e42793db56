"""AMT-S frame interpolation (Li et al. 2023) — eval-only Flax port, NHWC.

TPU-native re-implementation of the reference's torch AMT-S
(algorithms/common/metrics/video/models/amt/{amt_s,feat_enc,ifrnet,
multi_flow,raft}.py), the interpolator behind VBench motion_smoothness:
given frames I0, I1 and a time embedding t, predict the middle frame.

One feed-forward coarse-to-fine pass (no iteration loop): an IFRNet-style
4-level pyramid encoder/decoder chain with a bidirectional RAFT-style
correlation lookup and per-level update blocks, then multi-flow warping
combined by a small conv head. All convs run NHWC; the bidirectional
all-pairs correlation is two MXU matmuls (forward + transposed volume
share one einsum); warping/lookup reuse the gather-based bilinear sampler
from the RAFT port.

Weights (amt-s.pth) load via ``import_amt_params``.
"""

from __future__ import annotations

from typing import Any, Dict, Sequence

import flax.linen as nn
import jax
import jax.numpy as jnp
import numpy as np

from .raft import _bilinear_sample

__all__ = ["AMT_S", "import_amt_params"]


def _resize(x: jax.Array, scale: float) -> jax.Array:
    """F.interpolate(mode='bilinear', align_corners=False) — half-pixel
    centers, which is jax.image.resize's 'linear' convention."""
    B, H, W, C = x.shape
    return jax.image.resize(
        x, (B, int(round(H * scale)), int(round(W * scale)), C),
        method="linear",
        antialias=False,  # torch interpolate never antialiases by default
    )


def _warp(img: jax.Array, flow: jax.Array) -> jax.Array:
    """Backward warp with border padding (amt/utils.py:6-26). img/flow NHWC;
    flow in pixels."""
    B, H, W, _ = img.shape
    gy, gx = jnp.meshgrid(
        jnp.arange(H, dtype=jnp.float32),
        jnp.arange(W, dtype=jnp.float32),
        indexing="ij",
    )
    x = gx[None] + flow[..., 0]
    y = gy[None] + flow[..., 1]
    # border padding == clamp coordinates into the valid range
    x = jnp.clip(x, 0.0, W - 1.0)
    y = jnp.clip(y, 0.0, H - 1.0)
    return _bilinear_sample(img, jnp.stack([x, y], axis=-1))


class PReLU(nn.Module):
    """Per-channel PReLU (torch nn.PReLU(num_parameters=C))."""

    features: int

    @nn.compact
    def __call__(self, x):
        a = self.param(
            "alpha", nn.initializers.constant(0.25), (self.features,)
        )
        return jnp.where(x >= 0, x, a * x)


class ConvPReLU(nn.Module):
    """ifrnet.py convrelu: Conv + PReLU."""

    features: int
    kernel: int = 3
    stride: int = 1
    padding: int = 1

    @nn.compact
    def __call__(self, x):
        x = nn.Conv(
            self.features, (self.kernel, self.kernel), strides=self.stride,
            padding=self.padding, name="conv",
        )(x)
        return PReLU(self.features, name="prelu")(x)


class ConvT4x4(nn.Module):
    """torch ConvTranspose2d(k=4, s=2, p=1) == 2x-dilated conv with the
    spatially-flipped kernel and symmetric padding 2."""

    features: int

    @nn.compact
    def __call__(self, x):
        kernel = self.param(
            "kernel",
            nn.initializers.lecun_normal(),
            (4, 4, x.shape[-1], self.features),
        )
        bias = self.param("bias", nn.initializers.zeros, (self.features,))
        y = jax.lax.conv_general_dilated(
            x, kernel,
            window_strides=(1, 1),
            padding=[(2, 2), (2, 2)],
            lhs_dilation=(2, 2),
            dimension_numbers=("NHWC", "HWIO", "NHWC"),
        )
        return y + bias


def _instance_norm(x, eps=1e-5):
    mu = x.mean(axis=(1, 2), keepdims=True)
    var = x.var(axis=(1, 2), keepdims=True)
    return (x - mu) * jax.lax.rsqrt(var + eps)


class BottleneckBlock(nn.Module):
    """feat_enc.py:5-63, norm_fn='instance' (normalizations carry no
    parameters)."""

    planes: int
    stride: int = 1

    @nn.compact
    def __call__(self, x):
        y = nn.Conv(self.planes // 4, (1, 1), name="conv1")(x)
        y = nn.relu(_instance_norm(y))
        y = nn.Conv(
            self.planes // 4, (3, 3), strides=self.stride, padding=1, name="conv2"
        )(y)
        y = nn.relu(_instance_norm(y))
        y = nn.Conv(self.planes, (1, 1), name="conv3")(y)
        y = nn.relu(_instance_norm(y))
        if self.stride != 1:
            x = nn.Conv(self.planes, (1, 1), strides=self.stride, name="down_conv")(x)
            x = _instance_norm(x)
        return nn.relu(x + y)


class SmallEncoder(nn.Module):
    """feat_enc.py:121-194 (instance norm): 1/8-resolution features."""

    output_dim: int = 84

    @nn.compact
    def __call__(self, x):
        x = nn.Conv(32, (7, 7), strides=2, padding=3, name="conv1")(x)
        x = nn.relu(_instance_norm(x))
        for i, (dim, stride) in enumerate(((32, 1), (64, 2), (96, 2))):
            x = BottleneckBlock(dim, stride, name=f"layer{i + 1}_0")(x)
            x = BottleneckBlock(dim, 1, name=f"layer{i + 1}_1")(x)
        return nn.Conv(self.output_dim, (1, 1), name="conv2")(x)


class ResBlock(nn.Module):
    """ifrnet.py:38-95: residual block with a narrow side channel."""

    channels: int
    side_channels: int

    @nn.compact
    def __call__(self, x):
        s = self.side_channels
        out = ConvPReLU(self.channels, name="conv1")(x)
        side = ConvPReLU(s, name="conv2")(out[..., -s:])
        out = ConvPReLU(self.channels, name="conv3")(
            jnp.concatenate([out[..., :-s], side], -1)
        )
        side = ConvPReLU(s, name="conv4")(out[..., -s:])
        out = nn.Conv(self.channels, (3, 3), padding=1, name="conv5")(
            jnp.concatenate([out[..., :-s], side], -1)
        )
        return PReLU(self.channels, name="prelu")(x + out)


class PyramidEncoder(nn.Module):
    """ifrnet.py Encoder: 4 stride-2 stages of (convrelu, convrelu)."""

    channels: Sequence[int] = (20, 32, 44, 56)

    @nn.compact
    def __call__(self, x):
        feats = []
        for i, ch in enumerate(self.channels, 1):
            x = ConvPReLU(ch, 3, 2, 1, name=f"pyramid{i}_0")(x)
            x = ConvPReLU(ch, 3, 1, 1, name=f"pyramid{i}_1")(x)
            feats.append(x)
        return feats


class InitDecoder(nn.Module):
    """ifrnet.py:123-138."""

    in_ch: int
    out_ch: int
    skip_ch: int

    @nn.compact
    def __call__(self, f0, f1, embt):
        B, h, w, _ = f0.shape
        embt = jnp.broadcast_to(embt.reshape(B, 1, 1, 1), (B, h, w, 1))
        x = jnp.concatenate([f0, f1, embt], -1)
        x = ConvPReLU(self.in_ch * 2, name="block0")(x)
        x = ResBlock(self.in_ch * 2, self.skip_ch, name="block1")(x)
        out = ConvT4x4(self.out_ch + 4, name="block2")(x)
        flow0, flow1 = out[..., :2], out[..., 2:4]
        return flow0, flow1, out[..., 4:]


class IntermediateDecoder(nn.Module):
    """ifrnet.py:141-159."""

    in_ch: int
    out_ch: int
    skip_ch: int

    @nn.compact
    def __call__(self, ft_, f0, f1, flow0_in, flow1_in):
        f0w = _warp(f0, flow0_in)
        f1w = _warp(f1, flow1_in)
        x = jnp.concatenate([ft_, f0w, f1w, flow0_in, flow1_in], -1)
        x = ConvPReLU(self.in_ch * 3, name="block0")(x)
        x = ResBlock(self.in_ch * 3, self.skip_ch, name="block1")(x)
        out = ConvT4x4(self.out_ch + 4, name="block2")(x)
        flow0 = out[..., :2] + 2.0 * _resize(flow0_in, 2.0)
        flow1 = out[..., 2:4] + 2.0 * _resize(flow1_in, 2.0)
        return flow0, flow1, out[..., 4:]


class MultiFlowDecoder(nn.Module):
    """multi_flow.py:57-84."""

    in_ch: int
    skip_ch: int
    num_flows: int = 3

    @nn.compact
    def __call__(self, ft_, f0, f1, flow0, flow1):
        n = self.num_flows
        f0w = _warp(f0, flow0)
        f1w = _warp(f1, flow1)
        x = jnp.concatenate([ft_, f0w, f1w, flow0, flow1], -1)
        x = ConvPReLU(self.in_ch * 3, name="block0")(x)
        x = ResBlock(self.in_ch * 3, self.skip_ch, name="block1")(x)
        out = ConvT4x4(8 * n, name="block2")(x)
        d0, d1, mask, img_res = jnp.split(out, [2 * n, 4 * n, 5 * n], axis=-1)
        mask = jax.nn.sigmoid(mask)
        flow0 = d0 + 2.0 * jnp.tile(_resize(flow0, 2.0), (1, 1, 1, n))
        flow1 = d1 + 2.0 * jnp.tile(_resize(flow1, 2.0), (1, 1, 1, n))
        return flow0, flow1, mask, img_res


class SmallUpdateBlock(nn.Module):
    """amt/raft.py:37-99 (conv-only GRU stand-in with feat/flow heads)."""

    cdim: int
    hidden_dim: int = 76
    flow_dim: int = 20
    corr_dim: int = 64
    fc_dim: int = 68
    scale_factor: float | None = None

    @nn.compact
    def __call__(self, net, flow, corr):
        lrelu = lambda v: nn.leaky_relu(v, 0.1)
        if self.scale_factor is not None:
            net = _resize(net, 1.0 / self.scale_factor)
        cor = lrelu(nn.Conv(self.corr_dim, (1, 1), name="convc1")(corr))
        flo = lrelu(nn.Conv(self.flow_dim * 2, (7, 7), padding=3, name="convf1")(flow))
        flo = lrelu(nn.Conv(self.flow_dim, (3, 3), padding=1, name="convf2")(flo))
        inp = lrelu(
            nn.Conv(self.fc_dim, (3, 3), padding=1, name="conv")(
                jnp.concatenate([cor, flo], -1)
            )
        )
        inp = jnp.concatenate([inp, flow, net], -1)
        out = nn.Conv(self.hidden_dim, (3, 3), padding=1, name="gru_0")(inp)
        out = nn.Conv(self.hidden_dim, (3, 3), padding=1, name="gru_2")(lrelu(out))
        d = lrelu(nn.Conv(self.hidden_dim, (3, 3), padding=1, name="feat_head_0")(out))
        delta_net = nn.Conv(self.cdim, (3, 3), padding=1, name="feat_head_2")(d)
        f = lrelu(nn.Conv(self.hidden_dim, (3, 3), padding=1, name="flow_head_0")(out))
        delta_flow = nn.Conv(4, (3, 3), padding=1, name="flow_head_2")(f)
        if self.scale_factor is not None:
            delta_net = _resize(delta_net, self.scale_factor)
            delta_flow = self.scale_factor * _resize(delta_flow, self.scale_factor)
        return delta_net, delta_flow


def _bidir_corr_pyramid(fmap0, fmap1, num_levels=4):
    """amt/raft.py:170-191: forward + transposed correlation pyramids."""
    B, H, W, D = fmap0.shape
    corr = jnp.einsum(
        "bxd,byd->bxy", fmap0.reshape(B, H * W, D), fmap1.reshape(B, H * W, D)
    ) / jnp.sqrt(jnp.float32(D))
    fwd = corr.reshape(B * H * W, H, W, 1)
    bwd = corr.transpose(0, 2, 1).reshape(B * H * W, H, W, 1)
    pyr, pyr_T = [fwd], [bwd]
    for _ in range(num_levels - 1):
        fwd = nn.avg_pool(fwd, (2, 2), strides=(2, 2))
        bwd = nn.avg_pool(bwd, (2, 2), strides=(2, 2))
        pyr.append(fwd)
        pyr_T.append(bwd)
    return pyr, pyr_T


def _corr_lookup(pyramid, coords, radius):
    """Window lookup (amt/raft.py:193-230, same windowing quirk as RAFT:
    delta's first channel perturbs x)."""
    B, H, W, _ = coords.shape
    r = radius
    d = jnp.arange(-r, r + 1, dtype=jnp.float32)
    dy, dx = jnp.meshgrid(d, d, indexing="ij")
    delta = jnp.stack([dy, dx], axis=-1)
    out = []
    for i, corr in enumerate(pyramid):
        centroid = coords.reshape(B * H * W, 1, 1, 2) / (2**i)
        window = centroid + delta[None]
        out.append(_bilinear_sample(corr, window).reshape(B, H, W, (2 * r + 1) ** 2))
    return jnp.concatenate(out, axis=-1)


class AMT_S(nn.Module):
    """Input frames (B, H, W, 3) in [0, 1] (H, W divisible by 16) and time
    embedding embt (B,); returns the interpolated frame (B, H, W, 3)."""

    corr_radius: int = 3
    corr_levels: int = 4
    num_flows: int = 3
    channels: Sequence[int] = (20, 32, 44, 56)
    skip_channels: int = 20

    @nn.compact
    def __call__(self, img0, img1, embt):
        ch = self.channels
        mean_ = jnp.concatenate([img0, img1], 2).mean(
            axis=(1, 2, 3), keepdims=True
        )
        img0 = img0 - mean_
        img1 = img1 - mean_
        B, h, w, _ = img0.shape
        gy, gx = jnp.meshgrid(
            jnp.arange(h // 8, dtype=jnp.float32),
            jnp.arange(w // 8, dtype=jnp.float32),
            indexing="ij",
        )
        coord = jnp.broadcast_to(
            jnp.stack([gx, gy], -1)[None], (B, h // 8, w // 8, 2)
        )

        feat_enc = SmallEncoder(84, name="feat_encoder")
        fmap0 = feat_enc(img0)
        fmap1 = feat_enc(img1)
        pyr, pyr_T = _bidir_corr_pyramid(fmap0, fmap1, self.corr_levels)

        enc = PyramidEncoder(ch, name="encoder")
        f0_1, f0_2, f0_3, f0_4 = enc(img0)
        f1_1, f1_2, f1_3, f1_4 = enc(img1)

        embt = jnp.asarray(embt, jnp.float32).reshape(B)
        t1_scale = 1.0 / embt.reshape(B, 1, 1, 1)
        t0_scale = 1.0 / (1.0 - embt.reshape(B, 1, 1, 1))

        def corr_scale_lookup(flow0, flow1, downsample):
            if downsample != 1:
                inv = 1.0 / downsample
                flow0 = inv * _resize(flow0, inv)
                flow1 = inv * _resize(flow1, inv)
            corr0 = _corr_lookup(pyr, coord + flow1 * t1_scale, self.corr_radius)
            corr1 = _corr_lookup(pyr_T, coord + flow0 * t0_scale, self.corr_radius)
            return (
                jnp.concatenate([corr0, corr1], -1),
                jnp.concatenate([flow0, flow1], -1),
            )

        # level 4 (1/16) -> 3 -> 2 -> full-res multi-flow decoder
        up_flow0, up_flow1, ft_ = InitDecoder(
            ch[3], ch[2], self.skip_channels, name="decoder4"
        )(f0_4, f1_4, embt)
        corr, flow = corr_scale_lookup(up_flow0, up_flow1, 1)
        d_ft, d_flow = SmallUpdateBlock(ch[2], name="update4")(ft_, flow, corr)
        up_flow0 = up_flow0 + d_flow[..., :2]
        up_flow1 = up_flow1 + d_flow[..., 2:]
        ft_ = ft_ + d_ft

        up_flow0, up_flow1, ft_ = IntermediateDecoder(
            ch[2], ch[1], self.skip_channels, name="decoder3"
        )(ft_, f0_3, f1_3, up_flow0, up_flow1)
        corr, flow = corr_scale_lookup(up_flow0, up_flow1, 2)
        d_ft, d_flow = SmallUpdateBlock(ch[1], scale_factor=2.0, name="update3")(
            ft_, flow, corr
        )
        up_flow0 = up_flow0 + d_flow[..., :2]
        up_flow1 = up_flow1 + d_flow[..., 2:]
        ft_ = ft_ + d_ft

        up_flow0, up_flow1, ft_ = IntermediateDecoder(
            ch[1], ch[0], self.skip_channels, name="decoder2"
        )(ft_, f0_2, f1_2, up_flow0, up_flow1)
        corr, flow = corr_scale_lookup(up_flow0, up_flow1, 4)
        d_ft, d_flow = SmallUpdateBlock(ch[0], scale_factor=4.0, name="update2")(
            ft_, flow, corr
        )
        up_flow0 = up_flow0 + d_flow[..., :2]
        up_flow1 = up_flow1 + d_flow[..., 2:]
        ft_ = ft_ + d_ft

        up_flow0, up_flow1, mask, img_res = MultiFlowDecoder(
            ch[0], self.skip_channels, self.num_flows, name="decoder1"
        )(ft_, f0_1, f1_1, up_flow0, up_flow1)

        # multi_flow_combine (multi_flow.py:11-54)
        n = self.num_flows
        H, W = img0.shape[1:3]
        f0 = up_flow0.reshape(B, H, W, n, 2)
        f1 = up_flow1.reshape(B, H, W, n, 2)
        m = mask  # already sigmoided in MultiFlowDecoder
        warps = []
        for k in range(n):
            w0 = _warp(img0, f0[..., k, :])
            w1 = _warp(img1, f1[..., k, :])
            mk = m[..., k : k + 1]
            warps.append(
                mk * w0 + (1 - mk) * w1 + mean_ + img_res[..., 3 * k : 3 * k + 3]
            )
        img_warps = jnp.stack(warps, axis=3)  # (B, H, W, n, 3)
        comb = ConvPReLU(6 * n, name="comb_block_0")(
            img_warps.reshape(B, H, W, n * 3)
        )
        comb = nn.Conv(3, (3, 3), padding=1, name="comb_block_2")(comb)
        pred = img_warps.mean(axis=3) + comb
        return jnp.clip(pred, 0.0, 1.0)


# ---------------------------------------------------------------------------
# torch checkpoint import
# ---------------------------------------------------------------------------


def import_amt_params(state: Dict[str, np.ndarray]) -> Dict[str, Any]:
    """Map the published AMT-S checkpoint (amt-s.pth, torch module names as
    in the reference amt/ package) onto this Flax tree."""
    import re

    from ..utils.torch_ckpt import _unflatten, conv_w

    def convT_w(v):
        # torch ConvTranspose2d (in, out, kH, kW) -> flipped HWIO
        return np.ascontiguousarray(v[:, :, ::-1, ::-1].transpose(2, 3, 0, 1))

    state = {
        (k[len("model.") :] if k.startswith("model.") else k): np.asarray(v)
        for k, v in state.items()
        if not k.endswith("num_batches_tracked")
    }

    out: Dict[str, np.ndarray] = {}
    for key, v in state.items():
        k = key
        # feat encoder (instance norm -> conv params only)
        k = re.sub(r"^feat_encoder\.layer(\d)\.(\d)\.", r"feat_encoder/layer\1_\2/", k)
        k = k.replace("feat_encoder.", "feat_encoder/")
        k = k.replace("downsample.0", "down_conv")
        # ifrnet pyramid encoder: pyramidN.M is a convrelu (conv=.0, prelu=.1)
        k = re.sub(r"encoder\.pyramid(\d)\.(\d)\.0\.", r"encoder/pyramid\1_\2/conv.", k)
        k = re.sub(r"encoder\.pyramid(\d)\.(\d)\.1\.", r"encoder/pyramid\1_\2/prelu.", k)
        # decoders: convblock.0 convrelu, .1 ResBlock, .2 ConvTranspose
        k = re.sub(r"(decoder\d)\.convblock\.0\.0\.", r"\1/block0/conv.", k)
        k = re.sub(r"(decoder\d)\.convblock\.0\.1\.", r"\1/block0/prelu.", k)
        k = re.sub(
            r"(decoder\d)\.convblock\.1\.conv(\d)\.0\.", r"\1/block1/conv\2/conv.", k
        )
        k = re.sub(
            r"(decoder\d)\.convblock\.1\.conv(\d)\.1\.", r"\1/block1/conv\2/prelu.", k
        )
        k = re.sub(r"(decoder\d)\.convblock\.1\.conv5\.", r"\1/block1/conv5.", k)
        k = re.sub(r"(decoder\d)\.convblock\.1\.prelu\.", r"\1/block1/prelu.", k)
        k = re.sub(r"(decoder\d)\.convblock\.2\.", r"\1/block2.", k)
        # update blocks: Sequential indices -> explicit names
        k = re.sub(r"(update\d)\.(gru|feat_head|flow_head)\.(\d)\.", r"\1/\2_\3/", k)
        k = re.sub(r"(update\d)\.(convc1|convf1|convf2|conv)\.", r"\1/\2/", k)
        # comb block
        k = k.replace("comb_block.0.", "comb_block_0/conv.")
        k = k.replace("comb_block.1.", "comb_block_0/prelu.")
        k = k.replace("comb_block.2.", "comb_block_2.")
        k = k.replace(".", "/")

        if k.endswith("/weight"):
            base = k[: -len("/weight")]
            if "prelu" in base.rsplit("/", 1)[-1]:
                out[f"{base}/alpha"] = v
            elif "block2" in base.rsplit("/", 1)[-1]:
                out[f"{base}/kernel"] = convT_w(v)
            elif v.ndim == 4:
                out[f"{base}/kernel"] = conv_w(v)
            else:
                raise KeyError(f"unexpected weight shape for {key}: {v.shape}")
        elif k.endswith("/bias"):
            out[k] = v
        else:
            raise KeyError(f"unmapped AMT key {key!r}")
    return _unflatten(out)
