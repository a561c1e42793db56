"""TiTok-KL: 1-D ViT tokenizer with a KL latent — Flax, weight-importable.

Faithful counterpart of the reference TiTok_KL port
(algorithms/vae/tiktok_kl/titok_kl.py + blocks_kl.py + maskgit_vqgan.py):

- encoder (blocks_kl.py:96-168): patchify conv + CLS token + learned
  positional embeddings, N learned latent-query tokens appended, open_clip
  ResidualAttentionBlocks, ln_post over the latent tokens only, 1x1 conv to
  2*token_size diagonal-Gaussian moments — a (N,)-token 1-D code.
- decoder (blocks_kl.py:171-244): latent tokens embedded and concatenated
  after [CLS | grid mask tokens], ViT, ffn (1x1 -> tanh -> 1x1) to 1024
  logits per patch.
- pixel path (titok_kl.py:50-62, 101-110): softmax over the 1024 logits,
  1x1 quantize conv to 256 channels, then a MaskGIT-VQGAN CNN decoder
  (maskgit_vqgan.py:53-246) back to pixels.

The module tree mirrors the torch one so pretrained checkpoints import
exactly (:func:`import_titok_params`), including maskgit's shortcut quirk
(ResnetBlock applies nin_shortcut to the block OUTPUT, maskgit_vqgan.py:87-88).
Layout is channel-last; torch's 1x1 convs become Dense layers.

Downstream DFoT models use x_shape (token_size, 1, N) with the DiT1D
backbone; ``encode`` returns a posterior over (B, N, token_size).
"""

from __future__ import annotations

import dataclasses
from typing import Any, Dict, Sequence, Tuple

import flax.linen as nn
import jax
import jax.numpy as jnp
import numpy as np

from .distribution import DiagonalGaussian

__all__ = ["TiTokConfig", "TiTokKL", "import_titok_params"]

_VIT_SIZES = {  # blocks_kl.py:104-118
    "small": (512, 8, 8),
    "base": (768, 12, 12),
    "large": (1024, 24, 16),
}


# ---------------------------------------------------------------------------
# open_clip-style transformer block (blocks_kl.py:39-90)
# ---------------------------------------------------------------------------


class MultiheadAttention(nn.Module):
    """torch.nn.MultiheadAttention with packed qkv (in_proj) + out_proj."""

    dim: int
    heads: int

    @nn.compact
    def __call__(self, x: jax.Array) -> jax.Array:
        B, L, C = x.shape
        d = self.dim // self.heads
        qkv = nn.Dense(3 * self.dim, name="in_proj")(x)
        qkv = qkv.reshape(B, L, 3, self.heads, d)
        q, k, v = [jnp.moveaxis(qkv[:, :, i], 1, 2) for i in range(3)]
        s = jnp.einsum("bhnd,bhmd->bhnm", q, k).astype(jnp.float32) * d**-0.5
        a = jax.nn.softmax(s, axis=-1).astype(x.dtype)
        o = jnp.moveaxis(jnp.einsum("bhnm,bhmd->bhnd", a, v), 1, 2).reshape(B, L, C)
        return nn.Dense(self.dim, name="out_proj")(o)


class ResidualAttentionBlock(nn.Module):
    dim: int
    heads: int
    mlp_ratio: float = 4.0

    @nn.compact
    def __call__(self, x: jax.Array) -> jax.Array:
        x = x + MultiheadAttention(self.dim, self.heads, name="attn")(
            nn.LayerNorm(epsilon=1e-5, name="ln_1")(x)
        )
        h = nn.LayerNorm(epsilon=1e-5, name="ln_2")(x)
        h = nn.Dense(int(self.dim * self.mlp_ratio), name="mlp_c_fc")(h)
        h = nn.gelu(h, approximate=False)
        return x + nn.Dense(self.dim, name="mlp_c_proj")(h)


# ---------------------------------------------------------------------------
# config
# ---------------------------------------------------------------------------


@dataclasses.dataclass(frozen=True)
class TiTokConfig:
    """Mirrors TiTok_KL's constructor (titok_kl.py:26-62)."""

    image_size: int = 256
    token_size: int = 12
    use_l2_norm: bool = True
    vit_enc_model_size: str = "large"
    vit_dec_model_size: str = "large"
    vit_enc_patch_size: int = 16
    vit_dec_patch_size: int = 16
    num_latent_tokens: int = 32
    # pixel decoder (maskgit VQGAN; titok_kl.py:52-61)
    pixel_hidden_channels: int = 128
    pixel_channel_mult: Tuple[int, ...] = (1, 1, 2, 2, 4)
    pixel_num_res_blocks: int = 2
    pixel_z_channels: int = 256
    pixel_quantize_dim: int = 1024
    group_norm_groups: int = 32
    # explicit (width, layers, heads) override for tests/small models;
    # None selects the reference's model_size table
    vit_override: Tuple[int, int, int] | None = None

    def vit(self, which: str) -> Tuple[int, int, int]:
        if self.vit_override is not None:
            return self.vit_override
        size = self.vit_enc_model_size if which == "enc" else self.vit_dec_model_size
        return _VIT_SIZES[size]

    @classmethod
    def from_config(cls, cfg) -> "TiTokConfig":
        kw = {}
        for f in dataclasses.fields(cls):
            if cfg.get(f.name) is not None:
                v = cfg.get(f.name)
                kw[f.name] = tuple(v) if isinstance(v, (list, tuple)) else v
        return cls(**kw)


# ---------------------------------------------------------------------------
# ViT encoder / decoder (blocks_kl.py:96-244)
# ---------------------------------------------------------------------------


class _TiTokEncoder(nn.Module):
    cfg: TiTokConfig

    @nn.compact
    def __call__(self, x: jax.Array, latent_tokens: jax.Array) -> jax.Array:
        c = self.cfg
        width, layers, heads = c.vit("enc")
        p = c.vit_enc_patch_size
        grid = c.image_size // p
        B = x.shape[0]
        scale_init = nn.initializers.normal(width**-0.5)

        h = nn.Conv(width, (p, p), strides=(p, p), name="patch_embed")(x)
        h = h.reshape(B, grid * grid, width)
        cls = self.param("class_embedding", scale_init, (1, width))
        h = jnp.concatenate([jnp.broadcast_to(cls[None], (B, 1, width)), h], 1)
        pos = self.param("positional_embedding", scale_init, (grid * grid + 1, width))
        h = h + pos[None, : h.shape[1]].astype(h.dtype)

        lat_pos = self.param(
            "latent_token_positional_embedding", scale_init,
            (c.num_latent_tokens, width),
        )
        lat = jnp.broadcast_to(
            latent_tokens[None], (B,) + latent_tokens.shape
        ) + lat_pos[None].astype(h.dtype)
        h = jnp.concatenate([h, lat], 1)

        h = nn.LayerNorm(epsilon=1e-5, name="ln_pre")(h)
        for i in range(layers):
            h = ResidualAttentionBlock(width, heads, name=f"transformer_{i}")(h)
        lat = h[:, 1 + grid * grid :]
        lat = nn.LayerNorm(epsilon=1e-5, name="ln_post")(lat)
        # torch conv_out is a 1x1 conv over the fake-2D (width, N, 1) map
        return nn.Dense(2 * c.token_size, name="conv_out")(lat)  # (B, N, 2z)


class _TiTokDecoder(nn.Module):
    cfg: TiTokConfig

    @nn.compact
    def __call__(self, z: jax.Array) -> jax.Array:
        c = self.cfg
        width, layers, heads = c.vit("dec")
        grid = c.image_size // c.vit_dec_patch_size
        B, N, _ = z.shape
        scale_init = nn.initializers.normal(width**-0.5)

        x = nn.Dense(width, name="decoder_embed")(z)
        mask = self.param("mask_token", scale_init, (1, 1, width))
        cls = self.param("class_embedding", scale_init, (1, width))
        pos = self.param("positional_embedding", scale_init, (grid * grid + 1, width))
        mask_tokens = jnp.broadcast_to(mask, (B, grid * grid, width))
        mask_tokens = jnp.concatenate(
            [jnp.broadcast_to(cls[None], (B, 1, width)), mask_tokens], 1
        )
        mask_tokens = mask_tokens + pos[None, : mask_tokens.shape[1]].astype(x.dtype)
        lat_pos = self.param(
            "latent_token_positional_embedding", scale_init,
            (c.num_latent_tokens, width),
        )
        x = x + lat_pos[:N].astype(x.dtype)
        x = jnp.concatenate([mask_tokens, x], 1)

        x = nn.LayerNorm(epsilon=1e-5, name="ln_pre")(x)
        for i in range(layers):
            x = ResidualAttentionBlock(width, heads, name=f"transformer_{i}")(x)
        x = x[:, 1 : 1 + grid * grid]
        x = nn.LayerNorm(epsilon=1e-5, name="ln_post")(x)
        x = x.reshape(B, grid, grid, width)
        # ffn: 1x1 -> tanh -> 1x1 (blocks_kl.py:219-224)
        x = nn.Dense(2 * width, name="ffn_0")(x)
        x = jnp.tanh(x)
        return nn.Dense(c.pixel_quantize_dim, name="ffn_2")(x)  # (B, g, g, 1024)


# ---------------------------------------------------------------------------
# MaskGIT-VQGAN pixel decoder (maskgit_vqgan.py:53-246)
# ---------------------------------------------------------------------------


class _MaskGitResBlock(nn.Module):
    in_channels: int
    out_channels: int
    groups: int = 32

    @nn.compact
    def __call__(self, x: jax.Array) -> jax.Array:
        residual = x
        h = nn.GroupNorm(self.groups, epsilon=1e-6, name="norm1")(x)
        h = nn.silu(h)
        h = nn.Conv(self.out_channels, (3, 3), use_bias=False, name="conv1")(h)
        h = nn.GroupNorm(self.groups, epsilon=1e-6, name="norm2")(h)
        h = nn.silu(h)
        h = nn.Conv(self.out_channels, (3, 3), use_bias=False, name="conv2")(h)
        if self.in_channels != self.out_channels:
            # quirk preserved from the reference (maskgit_vqgan.py:87-88):
            # the 1x1 shortcut is applied to the block OUTPUT, not the input
            residual = nn.Dense(
                self.out_channels, use_bias=False, name="nin_shortcut"
            )(h)
        return h + residual


class _MaskGitUpBlock(nn.Module):
    block_idx: int
    hidden_channels: int
    channel_mult: Tuple[int, ...]
    num_res_blocks: int
    groups: int = 32

    @nn.compact
    def __call__(self, x: jax.Array) -> jax.Array:
        n = len(self.channel_mult)
        if self.block_idx == n - 1:
            block_in = self.hidden_channels * self.channel_mult[-1]
        else:
            block_in = self.hidden_channels * self.channel_mult[self.block_idx + 1]
        block_out = self.hidden_channels * self.channel_mult[self.block_idx]
        for j in range(self.num_res_blocks):
            x = _MaskGitResBlock(
                block_in, block_out, self.groups, name=f"block_{j}"
            )(x)
            block_in = block_out
        if self.block_idx != 0:
            B, H, W, C = x.shape
            x = jax.image.resize(x, (B, 2 * H, 2 * W, C), "nearest")
            x = nn.Conv(block_out, (3, 3), name="upsample_conv")(x)
        return x


class _PixelDecoder(nn.Module):
    cfg: TiTokConfig

    @nn.compact
    def __call__(self, z: jax.Array) -> jax.Array:
        c = self.cfg
        mult = c.pixel_channel_mult
        n = len(mult)
        block_in = c.pixel_hidden_channels * mult[-1]
        h = nn.Conv(block_in, (3, 3), name="conv_in")(z)
        for j in range(c.pixel_num_res_blocks):
            h = _MaskGitResBlock(
                block_in, block_in, c.group_norm_groups, name=f"mid_{j}"
            )(h)
        # execution order: block_idx n-1 down to 0 (maskgit_vqgan.py:239-241)
        for i in reversed(range(n)):
            h = _MaskGitUpBlock(
                i, c.pixel_hidden_channels, mult, c.pixel_num_res_blocks,
                c.group_norm_groups, name=f"up_{i}",
            )(h)
        h = nn.GroupNorm(c.group_norm_groups, epsilon=1e-6, name="norm_out")(h)
        h = nn.silu(h)
        return nn.Conv(3, (3, 3), name="conv_out")(h)


# ---------------------------------------------------------------------------
# wrapper (titok_kl.py:26-131)
# ---------------------------------------------------------------------------


class TiTokKL(nn.Module):
    """encode: (B, H, W, 3) -> DiagonalGaussian over (B, N, token_size);
    decode: (B, N, token_size) -> (B, H, W, 3)."""

    cfg: TiTokConfig

    def setup(self):
        c = self.cfg
        width, _, _ = c.vit("enc")
        self.latent_tokens = self.param(
            "latent_tokens", nn.initializers.normal(width**-0.5),
            (c.num_latent_tokens, width),
        )
        self.encoder = _TiTokEncoder(c, name="encoder")
        self.decoder = _TiTokDecoder(c, name="decoder")
        self.pixel_quantize_conv = nn.Dense(
            c.pixel_z_channels, name="pixel_quantize_conv"
        )
        self.pixel_decoder = _PixelDecoder(c, name="pixel_decoder")

    def encode(self, x: jax.Array) -> DiagonalGaussian:
        moments = self.encoder(x, self.latent_tokens)
        return DiagonalGaussian.from_parameters(moments)

    def decode(self, z: jax.Array) -> jax.Array:
        if self.cfg.use_l2_norm:  # over the token_size channel (titok_kl.py:105)
            z = z / jnp.clip(
                jnp.linalg.norm(z, axis=-1, keepdims=True), 1e-12, None
            )
        logits = self.decoder(z)
        latent = self.pixel_quantize_conv(jax.nn.softmax(logits, axis=-1))
        return self.pixel_decoder(latent)

    def __call__(self, x, rng=None, sample_posterior: bool = True):
        posterior = self.encode(x)
        z = posterior.sample(rng) if sample_posterior else posterior.mode()
        return self.decode(z), posterior


# ---------------------------------------------------------------------------
# torch checkpoint import
# ---------------------------------------------------------------------------

_NORM_LEAVES = ("ln_1", "ln_2", "ln_pre", "ln_post", "norm1", "norm2", "norm_out")


def import_titok_params(state: Dict[str, np.ndarray]) -> Dict[str, Any]:
    """Map a torch TiTok_KL state dict onto this module's param tree."""
    tree: Dict[str, Any] = {}

    def put(path: Sequence[str], value):
        node = tree
        for p in path[:-1]:
            node = node.setdefault(p, {})
        node[path[-1]] = jnp.asarray(np.asarray(value, dtype=np.float32))

    for key, val in state.items():
        v = np.asarray(val, dtype=np.float32)
        parts = key.split(".")
        out: list = []
        i = 0
        while i < len(parts):
            p = parts[i]
            if p in ("transformer", "mid", "block", "up") and i + 1 < len(parts) and parts[i + 1].isdigit():
                out.append(f"{p}_{parts[i + 1]}")
                i += 2
                continue
            if p == "mlp" and parts[i + 1] in ("c_fc", "c_proj"):
                out.append(f"mlp_{parts[i + 1]}")
                i += 2
                continue
            if p == "ffn" and parts[i + 1].isdigit():
                out.append(f"ffn_{parts[i + 1]}")
                i += 2
                continue
            if p == "attn" and parts[i + 1].startswith("in_proj"):
                out += ["attn", "in_proj", parts[i + 1].split("in_proj_")[1]]
                i += 2
                continue
            out.append(p)
            i += 1
        leaf = out[-1]
        parent = out[-2] if len(out) > 1 else ""
        if leaf == "weight" and v.ndim == 4:
            if v.shape[2] == v.shape[3] == 1:  # 1x1 conv ported as Dense
                put(out[:-1] + ["kernel"], v[:, :, 0, 0].T)
            else:
                put(out[:-1] + ["kernel"], np.transpose(v, (2, 3, 1, 0)))
        elif leaf == "weight" and v.ndim == 2:
            put(out[:-1] + ["kernel"], v.T)
        elif leaf == "weight" and parent in _NORM_LEAVES:
            put(out[:-1] + ["scale"], v)
        else:
            put(out, v)
    return tree
