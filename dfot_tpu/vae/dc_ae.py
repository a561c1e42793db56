"""DC-AE: deep-compression autoencoder (SANA family) — Flax, weight-importable.

Faithful counterpart of the reference's MyAutoencoderDC
(algorithms/vae/dc_ae/autoencoder_dc_model.py, a vendored diffusers
AutoencoderDC): a deterministic (no-KL) autoencoder reaching high spatial
compression by pairing residual conv stages with pixel-(un)shuffle residual
shortcuts around every down/upsample (the "residual autoencoding" trick) and
linear-attention EfficientViT blocks at low resolution.

The module tree mirrors the torch one parameter-for-parameter so pretrained
``encoder.*`` / ``decoder.*`` safetensors checkpoints (reference :704-721)
import exactly — see :func:`import_dc_ae_params`.  Layout is NHWC (TPU
channel-last); pixel shuffles keep torch's channel-major ordering so imported
conv weights see identical channel semantics.
"""

from __future__ import annotations

import dataclasses
from typing import Any, Dict, Sequence, Tuple

import flax.linen as nn
import jax
import jax.numpy as jnp
import numpy as np

__all__ = ["DCAEConfig", "DCAE", "import_dc_ae_params"]


# ---------------------------------------------------------------------------
# pixel shuffles (torch channel-major ordering: out channel = (C, r, r))
# ---------------------------------------------------------------------------


def pixel_unshuffle(x: jax.Array, r: int = 2) -> jax.Array:
    """NHWC pixel_unshuffle matching torch.F.pixel_unshuffle channel order."""
    B, H, W, C = x.shape
    x = x.reshape(B, H // r, r, W // r, r, C)
    x = x.transpose(0, 1, 3, 5, 2, 4)  # (B, H/r, W/r, C, r, r)
    return x.reshape(B, H // r, W // r, C * r * r)


def pixel_shuffle(x: jax.Array, r: int = 2) -> jax.Array:
    """NHWC pixel_shuffle matching torch.F.pixel_shuffle channel order."""
    B, H, W, C = x.shape
    c = C // (r * r)
    x = x.reshape(B, H, W, c, r, r)
    x = x.transpose(0, 1, 4, 2, 5, 3)  # (B, H, r, W, r, c)
    return x.reshape(B, H * r, W * r, c)


def _act(name: str):
    return {"relu": nn.relu, "relu6": nn.relu6, "silu": nn.silu}[name]


# ---------------------------------------------------------------------------
# norms (torch-parameterized)
# ---------------------------------------------------------------------------


class RMSNormT(nn.Module):
    """diffusers RMSNorm: fp32 variance, affine weight (+ bias)."""

    features: int
    eps: float = 1e-5
    use_bias: bool = True

    @nn.compact
    def __call__(self, x: jax.Array) -> jax.Array:
        dtype = x.dtype
        xf = x.astype(jnp.float32)
        var = jnp.mean(xf * xf, axis=-1, keepdims=True)
        xf = xf * jax.lax.rsqrt(var + self.eps)
        w = self.param("weight", nn.initializers.ones, (self.features,))
        out = xf.astype(dtype) * w
        if self.use_bias:
            out = out + self.param("bias", nn.initializers.zeros, (self.features,))
        return out


class BatchNorm2dInf(nn.Module):
    """Inference-mode BatchNorm2d over NHWC with importable running stats.

    DC-AE is used as a frozen pretrained preprocessor in the reference
    (configurations/algorithm/dc_ae_preprocessor.yaml), so running statistics
    are held as parameters and always applied (no batch-stat updates).
    """

    features: int
    eps: float = 1e-5

    @nn.compact
    def __call__(self, x: jax.Array) -> jax.Array:
        w = self.param("weight", nn.initializers.ones, (self.features,))
        b = self.param("bias", nn.initializers.zeros, (self.features,))
        mean = self.param("running_mean", nn.initializers.zeros, (self.features,))
        var = self.param("running_var", nn.initializers.ones, (self.features,))
        inv = jax.lax.rsqrt(var + self.eps) * w
        return (x - mean) * inv + b


def _norm(norm_type: str, features: int, name: str):
    if norm_type == "rms_norm":
        return RMSNormT(features, name=name)
    if norm_type == "batch_norm":
        return BatchNorm2dInf(features, name=name)
    raise ValueError(f"unsupported norm {norm_type}")


# ---------------------------------------------------------------------------
# blocks (reference autoencoder_dc_model.py:108-284)
# ---------------------------------------------------------------------------


class ResBlock(nn.Module):
    """conv1 -> act -> conv2(no bias) -> norm, + residual (reference :108)."""

    channels: int
    norm_type: str = "rms_norm"
    act_fn: str = "silu"

    @nn.compact
    def __call__(self, x: jax.Array) -> jax.Array:
        h = nn.Conv(self.channels, (3, 3), name="conv1")(x)
        h = _act(self.act_fn)(h)
        h = nn.Conv(self.channels, (3, 3), use_bias=False, name="conv2")(h)
        h = _norm(self.norm_type, self.channels, "norm")(h)
        return h + x


class SanaMultiscaleAttentionProjection(nn.Module):
    """Depthwise conv + per-(head,stream) grouped 1x1 (reference import from
    diffusers attention_processor.SanaMultiscaleAttentionProjection)."""

    inner_dim: int
    num_heads: int
    kernel_size: int

    @nn.compact
    def __call__(self, qkv: jax.Array) -> jax.Array:
        ch = 3 * self.inner_dim
        h = nn.Conv(
            ch, (self.kernel_size, self.kernel_size),
            feature_group_count=ch, use_bias=False, name="proj_in",
        )(qkv)
        return nn.Conv(
            ch, (1, 1), feature_group_count=3 * self.num_heads,
            use_bias=False, name="proj_out",
        )(h)


class SanaMultiscaleLinearAttention(nn.Module):
    """ReLU linear attention with multiscale conv aggregation (reference
    :45-105 + diffusers SanaMultiscaleAttnProcessor2_0).

    Head grouping replicates torch's channel-major ``reshape(B, -1, 3*d, HW)``
    exactly so imported projections compute identical outputs.
    """

    in_channels: int
    out_channels: int
    attention_head_dim: int = 32
    mult: float = 1.0
    norm_type: str = "rms_norm"
    kernel_sizes: Tuple[int, ...] = (5,)
    eps: float = 1e-15
    residual_connection: bool = True

    @nn.compact
    def __call__(self, x: jax.Array) -> jax.Array:
        B, H, W, _ = x.shape
        d = self.attention_head_dim
        num_heads = int(self.in_channels // d * self.mult)
        inner = num_heads * d
        residual = x
        orig_dtype = x.dtype

        q = nn.Dense(inner, use_bias=False, name="to_q")(x)
        k = nn.Dense(inner, use_bias=False, name="to_k")(x)
        v = nn.Dense(inner, use_bias=False, name="to_v")(x)
        qkv = jnp.concatenate([q, k, v], axis=-1)  # (B, H, W, 3*inner)

        multi = [qkv]
        for i, ks in enumerate(self.kernel_sizes):
            multi.append(
                SanaMultiscaleAttentionProjection(
                    inner, num_heads, ks, name=f"to_qkv_multiscale_{i}"
                )(qkv)
            )
        h = jnp.concatenate(multi, axis=-1)  # (B, H, W, 3*inner*(1+s))

        use_linear = H * W > d
        if use_linear:
            h = h.astype(jnp.float32)
        # torch: (B, C, H, W).reshape(B, -1, 3d, HW) — channel-major groups
        h = h.transpose(0, 3, 1, 2).reshape(B, -1, 3 * d, H * W)
        qh, kh, vh = jnp.split(h, 3, axis=2)  # each (B, n, d, HW)
        qh = nn.relu(qh)
        kh = nn.relu(kh)

        if use_linear:  # reference :88-96
            vh = jnp.pad(vh, ((0, 0), (0, 0), (0, 1), (0, 0)), constant_values=1.0)
            scores = jnp.einsum("bnij,bnkj->bnik", vh, kh)  # (B,n,d+1,d)
            out = jnp.einsum("bnik,bnkj->bnij", scores, qh)  # (B,n,d+1,HW)
            out = out[:, :, :-1] / (out[:, :, -1:] + self.eps)
            out = out.astype(orig_dtype)
        else:  # reference :98-102
            scores = jnp.einsum("bnji,bnjk->bnik", kh, qh).astype(jnp.float32)
            scores = scores / (jnp.sum(scores, axis=2, keepdims=True) + self.eps)
            out = jnp.einsum("bnij,bnjk->bnik", vh.astype(scores.dtype), scores)
            out = out.astype(orig_dtype)

        out = out.reshape(B, -1, H, W).transpose(0, 2, 3, 1)  # NHWC
        out = nn.Dense(self.out_channels, use_bias=False, name="to_out")(out)
        out = _norm(self.norm_type, self.out_channels, "norm_out")(out)
        if self.residual_connection:
            out = out + residual
        return out


class GLUMBConv(nn.Module):
    """Gated inverted-bottleneck conv (diffusers sana_transformer.GLUMBConv)."""

    in_channels: int
    out_channels: int
    expand_ratio: float = 4.0
    norm_type: str = "rms_norm"
    residual_connection: bool = True

    @nn.compact
    def __call__(self, x: jax.Array) -> jax.Array:
        hidden = int(self.expand_ratio * self.in_channels)
        h = nn.Conv(2 * hidden, (1, 1), name="conv_inverted")(x)
        h = nn.silu(h)
        h = nn.Conv(
            2 * hidden, (3, 3), feature_group_count=2 * hidden, name="conv_depth"
        )(h)
        h, gate = jnp.split(h, 2, axis=-1)
        h = h * nn.silu(gate)
        h = nn.Conv(self.out_channels, (1, 1), use_bias=False, name="conv_point")(h)
        if self.norm_type == "rms_norm":
            h = RMSNormT(self.out_channels, name="norm")(h)
        if self.residual_connection:
            h = h + x
        return h


class EfficientViTBlock(nn.Module):
    """Linear attention + GLUMBConv (reference :141-171)."""

    channels: int
    attention_head_dim: int = 32
    norm_type: str = "rms_norm"
    qkv_multiscales: Tuple[int, ...] = ()

    @nn.compact
    def __call__(self, x: jax.Array) -> jax.Array:
        x = SanaMultiscaleLinearAttention(
            self.channels, self.channels,
            attention_head_dim=self.attention_head_dim,
            norm_type=self.norm_type, kernel_sizes=self.qkv_multiscales,
            residual_connection=True, name="attn",
        )(x)
        return GLUMBConv(self.channels, self.channels, name="conv_out")(x)


class DCDownBlock2d(nn.Module):
    """conv + pixel_unshuffle, group-mean shortcut (reference :196-241)."""

    in_channels: int
    out_channels: int
    downsample: bool = False  # True = pixel_unshuffle type
    shortcut: bool = True

    @nn.compact
    def __call__(self, x: jax.Array) -> jax.Array:
        factor = 2
        out_ratio = factor**2
        conv_out = (
            self.out_channels // out_ratio if self.downsample else self.out_channels
        )
        stride = 1 if self.downsample else 2
        h = nn.Conv(conv_out, (3, 3), strides=(stride, stride), name="conv")(x)
        if self.downsample:
            h = pixel_unshuffle(h, factor)
        if self.shortcut:
            group_size = self.in_channels * out_ratio // self.out_channels
            y = pixel_unshuffle(x, factor)
            y = y.reshape(y.shape[:-1] + (-1, group_size)).mean(-1)
            h = h + y
        return h


class DCUpBlock2d(nn.Module):
    """conv + pixel_shuffle, channel-repeat shortcut (reference :243-284)."""

    in_channels: int
    out_channels: int
    interpolate: bool = False
    shortcut: bool = True

    @nn.compact
    def __call__(self, x: jax.Array) -> jax.Array:
        factor = 2
        if self.interpolate:
            B, H, W, C = x.shape
            h = jax.image.resize(x, (B, H * factor, W * factor, C), "nearest")
            h = nn.Conv(self.out_channels, (3, 3), name="conv")(h)
        else:
            h = nn.Conv(self.out_channels * factor**2, (3, 3), name="conv")(x)
            h = pixel_shuffle(h, factor)
        if self.shortcut:
            repeats = self.out_channels * factor**2 // self.in_channels
            y = jnp.repeat(x, repeats, axis=-1)
            y = pixel_shuffle(y, factor)
            h = h + y
        return h


# ---------------------------------------------------------------------------
# config / encoder / decoder (reference :286-467)
# ---------------------------------------------------------------------------


def _per_level(v, n: int) -> Tuple:
    return tuple(v) if isinstance(v, (list, tuple)) else (v,) * n


@dataclasses.dataclass(frozen=True)
class DCAEConfig:
    """Mirrors the reference dc_ae_preprocessor.yaml fields."""

    in_channels: int = 3
    latent_channels: int = 32
    attention_head_dim: int = 32
    encoder_block_types: Tuple[str, ...] = ("ResBlock",) * 3 + ("EfficientViTBlock",)
    decoder_block_types: Tuple[str, ...] = ("ResBlock",) * 3 + ("EfficientViTBlock",)
    encoder_block_out_channels: Tuple[int, ...] = (128, 256, 512, 512)
    decoder_block_out_channels: Tuple[int, ...] = (128, 256, 512, 512)
    encoder_layers_per_block: Tuple[int, ...] = (0, 4, 8, 2)
    decoder_layers_per_block: Tuple[int, ...] = (0, 5, 10, 2)
    encoder_qkv_multiscales: Tuple[Tuple[int, ...], ...] = ((), (), (), ())
    decoder_qkv_multiscales: Tuple[Tuple[int, ...], ...] = ((), (), (), ())
    decoder_norm_types: Tuple[str, ...] = ("batch_norm",) * 3 + ("rms_norm",)
    decoder_act_fns: Tuple[str, ...] = ("relu",) * 3 + ("silu",)
    downsample_block_type: str = "pixel_unshuffle"
    upsample_block_type: str = "pixel_shuffle"
    scaling_factor: float = 0.2889

    @property
    def spatial_compression(self) -> int:
        return 2 ** (len(self.encoder_block_out_channels) - 1)

    @classmethod
    def from_config(cls, cfg) -> "DCAEConfig":
        n = len(cfg.get("encoder_block_out_channels", [128, 256, 512, 512]))

        def get(key, default):
            v = cfg.get(key, default)
            return v if not isinstance(v, (list, tuple)) else tuple(
                tuple(e) if isinstance(e, (list, tuple)) else e for e in v
            )

        return cls(
            in_channels=cfg.get("in_channels", 3),
            latent_channels=cfg.get("latent_channels", 32),
            attention_head_dim=cfg.get("attention_head_dim", 32),
            encoder_block_types=_per_level(get("encoder_block_types", ["ResBlock"] * 3 + ["EfficientViTBlock"]), n),
            decoder_block_types=_per_level(get("decoder_block_types", ["ResBlock"] * 3 + ["EfficientViTBlock"]), n),
            encoder_block_out_channels=get("encoder_block_out_channels", [128, 256, 512, 512]),
            decoder_block_out_channels=get("decoder_block_out_channels", [128, 256, 512, 512]),
            encoder_layers_per_block=get("encoder_layers_per_block", [0, 4, 8, 2]),
            decoder_layers_per_block=get("decoder_layers_per_block", [0, 5, 10, 2]),
            encoder_qkv_multiscales=get("encoder_qkv_multiscales", [(), (), (), ()]),
            decoder_qkv_multiscales=get("decoder_qkv_multiscales", [(), (), (), ()]),
            decoder_norm_types=_per_level(get("decoder_norm_types", ["batch_norm"] * 3 + ["rms_norm"]), n),
            decoder_act_fns=_per_level(get("decoder_act_fns", ["relu"] * 3 + ["silu"]), n),
            downsample_block_type=cfg.get("downsample_block_type", "pixel_unshuffle"),
            upsample_block_type=cfg.get("upsample_block_type", "pixel_shuffle"),
            scaling_factor=cfg.get("scaling_factor", 0.2889),
        )


def _make_block(block_type, ch, head_dim, norm_type, act_fn, multiscales, name):
    if block_type == "ResBlock":
        return ResBlock(ch, norm_type, act_fn, name=name)
    if block_type == "EfficientViTBlock":
        return EfficientViTBlock(
            ch, attention_head_dim=head_dim, norm_type=norm_type,
            qkv_multiscales=tuple(multiscales), name=name,
        )
    raise ValueError(f"unsupported block type {block_type}")


class _DCAEEncoder(nn.Module):
    cfg: DCAEConfig

    @nn.compact
    def __call__(self, x: jax.Array) -> jax.Array:
        c = self.cfg
        chs, lpb = c.encoder_block_out_channels, c.encoder_layers_per_block
        n = len(chs)
        stem_out = chs[0] if lpb[0] > 0 else chs[1]
        if lpb[0] > 0:
            h = nn.Conv(stem_out, (3, 3), name="conv_in")(x)
        else:
            h = DCDownBlock2d(
                c.in_channels, stem_out,
                downsample=c.downsample_block_type == "pixel_unshuffle",
                shortcut=False, name="conv_in",
            )(x)
        for i in range(n):
            j = 0
            for _ in range(lpb[i]):
                h = _make_block(
                    c.encoder_block_types[i], chs[i], c.attention_head_dim,
                    "rms_norm", "silu", c.encoder_qkv_multiscales[i],
                    name=f"down_blocks_{i}_{j}",
                )(h)
                j += 1
            if i < n - 1 and lpb[i] > 0:
                h = DCDownBlock2d(
                    chs[i], chs[i + 1],
                    downsample=c.downsample_block_type == "pixel_unshuffle",
                    shortcut=True, name=f"down_blocks_{i}_{j}",
                )(h)
        z = nn.Conv(c.latent_channels, (3, 3), name="conv_out")(h)
        # out_shortcut: contiguous channel-group mean (reference :356-372)
        group = chs[-1] // c.latent_channels
        return z + h.reshape(h.shape[:-1] + (-1, group)).mean(-1)


class _DCAEDecoder(nn.Module):
    cfg: DCAEConfig

    @nn.compact
    def __call__(self, z: jax.Array) -> jax.Array:
        c = self.cfg
        chs, lpb = c.decoder_block_out_channels, c.decoder_layers_per_block
        n = len(chs)
        # in_shortcut: channel repeat (reference :448-452)
        repeats = chs[-1] // c.latent_channels
        h = nn.Conv(chs[-1], (3, 3), name="conv_in")(z) + jnp.repeat(z, repeats, -1)
        for i in reversed(range(n)):
            j = 0
            if i < n - 1 and lpb[i] > 0:
                h = DCUpBlock2d(
                    chs[i + 1], chs[i],
                    interpolate=c.upsample_block_type == "interpolate",
                    shortcut=True, name=f"up_blocks_{i}_{j}",
                )(h)
                j += 1
            for _ in range(lpb[i]):
                h = _make_block(
                    c.decoder_block_types[i], chs[i], c.attention_head_dim,
                    c.decoder_norm_types[i], c.decoder_act_fns[i],
                    c.decoder_qkv_multiscales[i], name=f"up_blocks_{i}_{j}",
                )(h)
                j += 1
        out_ch = chs[0] if lpb[0] > 0 else chs[1]
        h = RMSNormT(out_ch, name="norm_out")(h)
        h = nn.relu(h)
        if lpb[0] > 0:
            return nn.Conv(c.in_channels, (3, 3), name="conv_out")(h)
        return DCUpBlock2d(
            out_ch, c.in_channels,
            interpolate=c.upsample_block_type == "interpolate",
            shortcut=False, name="conv_out",
        )(h)


class DCAE(nn.Module):
    """Deterministic deep-compression autoencoder (encode/decode).

    ``encode`` returns the raw latent (scale with ``cfg.scaling_factor``
    downstream, as the reference preprocessor does)."""

    cfg: DCAEConfig

    def setup(self):
        self.encoder = _DCAEEncoder(self.cfg)
        self.decoder = _DCAEDecoder(self.cfg)

    def encode(self, x: jax.Array) -> jax.Array:
        return self.encoder(x)

    def decode(self, z: jax.Array) -> jax.Array:
        return self.decoder(z)

    def __call__(self, x: jax.Array) -> jax.Array:
        return self.decode(self.encode(x))


# ---------------------------------------------------------------------------
# torch checkpoint import
# ---------------------------------------------------------------------------


def _conv_w(w: np.ndarray) -> np.ndarray:
    return np.transpose(w, (2, 3, 1, 0))  # OIHW -> HWIO


def import_dc_ae_params(state: Dict[str, np.ndarray]) -> Dict[str, Any]:
    """Map a torch DC-AE state dict (``encoder.*``/``decoder.*`` keys, as
    loaded by the reference :704-721) onto this module's param tree."""
    tree: Dict[str, Any] = {}

    def put(path, value):
        node = tree
        for p in path[:-1]:
            node = node.setdefault(p, {})
        node[path[-1]] = jnp.asarray(value)

    for key, val in state.items():
        if key.endswith("num_batches_tracked"):
            continue
        v = np.asarray(val, dtype=np.float32)
        parts = key.split(".")
        # flatten torch Sequential indices into flax's name_{i}_{j} scheme
        out: list = []
        i = 0
        while i < len(parts):
            p = parts[i]
            if p in ("down_blocks", "up_blocks"):
                out.append(f"{p}_{parts[i + 1]}_{parts[i + 2]}")
                i += 3
                continue
            if p == "to_qkv_multiscale":
                out.append(f"to_qkv_multiscale_{parts[i + 1]}")
                i += 2
                continue
            out.append(p)
            i += 1
        leaf = out[-1]
        if leaf == "weight" and v.ndim == 4:
            put(out[:-1] + ["kernel"], _conv_w(v))
        elif leaf == "weight" and v.ndim == 2:
            put(out[:-1] + ["kernel"], v.T)
        elif leaf == "weight":  # norm scales keep torch's name
            put(out, v)
        else:
            put(out, v)
    return tree
