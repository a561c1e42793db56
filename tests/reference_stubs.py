"""Faithful stubs for the reference's missing pip deps + a package loader.

The reference source tree at /root/reference imports omegaconf, timm,
diffusers and rotary_embedding_torch, none of which are installed here. For
forward-output parity testing we only need the handful of symbols the
backbone/diffusion modules actually use; each stub below reproduces the real
library's module structure, parameter names (state_dict compatibility) and
forward math exactly for those symbols.

load_reference_module() then imports reference submodules under a synthetic
package name ("refalg.dfot....") without executing the heavy top-level
algorithms/__init__.py (which pulls in lightning and the full algo stack).
"""

from __future__ import annotations

import importlib
import importlib.machinery
import importlib.util
import sys
import types

REF_ROOT = "/root/reference"


def install_stubs() -> None:
    """Install omegaconf / timm / diffusers / rotary_embedding_torch stubs
    into sys.modules (idempotent; no-op when the real libs are present)."""
    if "omegaconf" in sys.modules:
        return
    import torch
    from torch import nn

    # -- omegaconf ----------------------------------------------------------
    omegaconf = types.ModuleType("omegaconf")

    class DictConfig(dict):
        """dict with attribute access; nested dicts wrapped recursively."""

        def __init__(self, data=None, **kw):
            super().__init__()
            for k, v in dict(data or {}, **kw).items():
                self[k] = DictConfig(v) if isinstance(v, dict) else v

        def __getattr__(self, key):
            try:
                return self[key]
            except KeyError as e:
                raise AttributeError(key) from e

        def __setattr__(self, key, value):
            self[key] = DictConfig(value) if isinstance(value, dict) else value

    class OmegaConf:
        @staticmethod
        def create(data=None):
            return DictConfig(data)

        @staticmethod
        def to_container(cfg, resolve=True):
            def un(v):
                return {k: un(x) for k, x in v.items()} if isinstance(v, dict) else v

            return un(cfg)

    omegaconf.DictConfig = DictConfig
    omegaconf.OmegaConf = OmegaConf
    sys.modules["omegaconf"] = omegaconf

    # -- timm ---------------------------------------------------------------
    class PatchEmbed(nn.Module):
        """timm.models.vision_transformer.PatchEmbed (conv + flatten)."""

        def __init__(self, img_size=224, patch_size=16, in_chans=3,
                     embed_dim=768, norm_layer=None, flatten=True, bias=True,
                     **kwargs):
            super().__init__()
            img_size = (img_size, img_size) if isinstance(img_size, int) else tuple(img_size)
            patch_size = (patch_size, patch_size) if isinstance(patch_size, int) else tuple(patch_size)
            self.img_size = img_size
            self.patch_size = patch_size
            self.grid_size = (img_size[0] // patch_size[0], img_size[1] // patch_size[1])
            self.num_patches = self.grid_size[0] * self.grid_size[1]
            self.flatten = flatten
            self.proj = nn.Conv2d(in_chans, embed_dim, kernel_size=patch_size,
                                  stride=patch_size, bias=bias)
            self.norm = norm_layer(embed_dim) if norm_layer else nn.Identity()

        def forward(self, x):
            x = self.proj(x)
            if self.flatten:
                x = x.flatten(2).transpose(1, 2)  # NCHW -> NLC
            return self.norm(x)

    class Mlp(nn.Module):
        """timm Mlp: fc1 -> act -> drop -> norm -> fc2 -> drop."""

        def __init__(self, in_features, hidden_features=None, out_features=None,
                     act_layer=nn.GELU, norm_layer=None, bias=True, drop=0.0,
                     **kwargs):
            super().__init__()
            out_features = out_features or in_features
            hidden_features = hidden_features or in_features
            self.fc1 = nn.Linear(in_features, hidden_features, bias=bias)
            self.act = act_layer()
            self.drop1 = nn.Dropout(drop)
            self.norm = norm_layer(hidden_features) if norm_layer else nn.Identity()
            self.fc2 = nn.Linear(hidden_features, out_features, bias=bias)
            self.drop2 = nn.Dropout(drop)

        def forward(self, x):
            return self.drop2(self.fc2(self.norm(self.drop1(self.act(self.fc1(x))))))

    timm = types.ModuleType("timm")
    timm_models = types.ModuleType("timm.models")
    timm_vit = types.ModuleType("timm.models.vision_transformer")
    timm_layers = types.ModuleType("timm.layers")
    timm_vit.PatchEmbed = PatchEmbed
    timm_vit.Mlp = Mlp
    timm_layers.use_fused_attn = lambda: True  # F.sdpa: same math as manual
    timm.models = timm_models
    timm_models.vision_transformer = timm_vit
    timm.layers = timm_layers
    sys.modules["timm"] = timm
    sys.modules["timm.models"] = timm_models
    sys.modules["timm.models.vision_transformer"] = timm_vit
    sys.modules["timm.layers"] = timm_layers

    # -- diffusers ----------------------------------------------------------
    import math

    def get_timestep_embedding(timesteps, embedding_dim, flip_sin_to_cos=False,
                               downscale_freq_shift=1, scale=1, max_period=10000):
        half_dim = embedding_dim // 2
        exponent = -math.log(max_period) * torch.arange(
            half_dim, dtype=torch.float32, device=timesteps.device
        )
        exponent = exponent / (half_dim - downscale_freq_shift)
        emb = timesteps.float()[..., None] * torch.exp(exponent)
        emb = scale * emb
        emb = torch.cat([torch.sin(emb), torch.cos(emb)], dim=-1)
        if flip_sin_to_cos:
            emb = torch.cat([emb[..., half_dim:], emb[..., :half_dim]], dim=-1)
        if embedding_dim % 2 == 1:
            emb = torch.nn.functional.pad(emb, (0, 1, 0, 0))
        return emb

    class Timesteps(nn.Module):
        def __init__(self, num_channels, flip_sin_to_cos, downscale_freq_shift, scale=1):
            super().__init__()
            self.num_channels = num_channels
            self.flip_sin_to_cos = flip_sin_to_cos
            self.downscale_freq_shift = downscale_freq_shift
            self.scale = scale

        def forward(self, timesteps):
            return get_timestep_embedding(
                timesteps, self.num_channels,
                flip_sin_to_cos=self.flip_sin_to_cos,
                downscale_freq_shift=self.downscale_freq_shift,
                scale=self.scale,
            )

    class TimestepEmbedding(nn.Module):
        """diffusers TimestepEmbedding: linear_1 -> SiLU -> linear_2."""

        def __init__(self, in_channels, time_embed_dim, act_fn="silu",
                     out_dim=None, post_act_fn=None, cond_proj_dim=None,
                     sample_proj_bias=True):
            super().__init__()
            assert act_fn == "silu" and post_act_fn is None and cond_proj_dim is None
            self.linear_1 = nn.Linear(in_channels, time_embed_dim, sample_proj_bias)
            self.act = nn.SiLU()
            self.linear_2 = nn.Linear(
                time_embed_dim, out_dim or time_embed_dim, sample_proj_bias
            )

        def forward(self, sample, condition=None):
            return self.linear_2(self.act(self.linear_1(sample)))

    class LabelEmbedding(nn.Module):
        """diffusers LabelEmbedding incl. CFG null-class dropout."""

        def __init__(self, num_classes, hidden_size, dropout_prob):
            super().__init__()
            use_cfg_embedding = dropout_prob > 0
            self.embedding_table = nn.Embedding(num_classes + use_cfg_embedding, hidden_size)
            self.num_classes = num_classes
            self.dropout_prob = dropout_prob

        def token_drop(self, labels, force_drop_ids=None):
            if force_drop_ids is None:
                drop_ids = torch.rand(labels.shape[0], device=labels.device) < self.dropout_prob
            else:
                drop_ids = torch.tensor(force_drop_ids == 1)
            return torch.where(drop_ids, self.num_classes, labels)

        def forward(self, labels, force_drop_ids=None):
            if (self.training and self.dropout_prob > 0) or (force_drop_ids is not None):
                labels = self.token_drop(labels, force_drop_ids)
            return self.embedding_table(labels)

    class RMSNorm(nn.Module):
        def __init__(self, dim, eps, elementwise_affine=True, bias=False):
            super().__init__()
            self.eps = eps
            self.weight = nn.Parameter(torch.ones(dim)) if elementwise_affine else None
            self.bias = nn.Parameter(torch.zeros(dim)) if (elementwise_affine and bias) else None

        def forward(self, x):
            dt = x.dtype
            v = x.to(torch.float32).pow(2).mean(-1, keepdim=True)
            x = x.to(torch.float32) * torch.rsqrt(v + self.eps)
            if self.weight is not None:
                x = x.to(self.weight.dtype) * self.weight
                if self.bias is not None:
                    x = x + self.bias
            return x.to(dt)

    class _NotNeeded(nn.Module):
        """Placeholder for diffusers symbols only needed at import time; any
        use raises so parity tests cannot silently rely on it."""

        def __init__(self, *a, **k):
            super().__init__()
            raise NotImplementedError(
                f"{type(self).__name__} stub was instantiated; implement it "
                "faithfully before testing this code path"
            )

    # --- faithful diffusers pieces used by FARDiT ----------------------------

    def get_1d_rotary_pos_embed(dim, pos, theta=10000.0, use_real=False,
                                linear_factor=1.0, ntk_factor=1.0,
                                repeat_interleave_real=True,
                                freqs_dtype=torch.float32):
        assert dim % 2 == 0
        theta = theta * ntk_factor
        freqs = (
            1.0 / (theta ** (torch.arange(0, dim, 2, dtype=freqs_dtype)[: dim // 2] / dim))
            / linear_factor
        )
        freqs = torch.outer(pos, freqs)
        if use_real and repeat_interleave_real:
            freqs_cos = freqs.cos().repeat_interleave(2, dim=1).float()
            freqs_sin = freqs.sin().repeat_interleave(2, dim=1).float()
            return freqs_cos, freqs_sin
        raise NotImplementedError("only the use_real interleaved form is stubbed")

    class FluxPosEmbed(nn.Module):
        """diffusers FluxPosEmbed: per-axis 1-D rope tables over integer ids."""

        def __init__(self, theta, axes_dim):
            super().__init__()
            self.theta = theta
            self.axes_dim = axes_dim

        def forward(self, ids):
            n_axes = ids.shape[-1]
            cos_out, sin_out = [], []
            pos = ids.float()
            for i in range(n_axes):
                cos, sin = get_1d_rotary_pos_embed(
                    self.axes_dim[i], pos[:, i], theta=self.theta,
                    repeat_interleave_real=True, use_real=True,
                    freqs_dtype=torch.float64,
                )
                cos_out.append(cos)
                sin_out.append(sin)
            return torch.cat(cos_out, dim=-1), torch.cat(sin_out, dim=-1)

    def apply_rotary_emb(x, freqs_cis, use_real=True, use_real_unbind_dim=-1):
        cos, sin = freqs_cis
        cos = cos[None, None]
        sin = sin[None, None]
        cos, sin = cos.to(x.device), sin.to(x.device)
        x_real, x_imag = x.reshape(*x.shape[:-1], -1, 2).unbind(-1)
        x_rotated = torch.stack([-x_imag, x_real], dim=-1).flatten(3)
        return (x.float() * cos + x_rotated.float() * sin).to(x.dtype)

    class GELUProj(nn.Module):
        """diffusers GELU: Linear then gelu (state_dict key: proj)."""

        def __init__(self, dim_in, dim_out, approximate="none", bias=True):
            super().__init__()
            self.proj = nn.Linear(dim_in, dim_out, bias=bias)
            self.approximate = approximate

        def forward(self, x):
            return torch.nn.functional.gelu(self.proj(x), approximate=self.approximate)

    class FeedForward(nn.Module):
        """diffusers FeedForward: net.0 = GELU(proj), net.1 = Dropout, net.2 = Linear."""

        def __init__(self, dim, dim_out=None, mult=4, dropout=0.0,
                     activation_fn="geglu", final_dropout=False, inner_dim=None,
                     bias=True):
            super().__init__()
            inner_dim = inner_dim or int(dim * mult)
            dim_out = dim_out or dim
            if activation_fn == "gelu-approximate":
                act = GELUProj(dim, inner_dim, approximate="tanh", bias=bias)
            elif activation_fn == "gelu":
                act = GELUProj(dim, inner_dim, bias=bias)
            else:
                raise NotImplementedError(activation_fn)
            self.net = nn.ModuleList(
                [act, nn.Dropout(dropout), nn.Linear(inner_dim, dim_out, bias=bias)]
            )

        def forward(self, x):
            for m in self.net:
                x = m(x)
            return x

    class Attention(nn.Module):
        """diffusers Attention, restricted to the self-attention configuration
        FARDiT uses (to_q/to_k/to_v + to_out.0 linears, optional RMS q/k norm,
        a custom processor)."""

        def __init__(self, query_dim, cross_attention_dim=None, heads=8,
                     dim_head=64, dropout=0.0, bias=False, out_dim=None,
                     qk_norm=None, eps=1e-5, processor=None, **kwargs):
            super().__init__()
            assert cross_attention_dim is None, "only self-attention stubbed"
            self.inner_dim = out_dim if out_dim is not None else dim_head * heads
            self.heads = out_dim // dim_head if out_dim is not None else heads
            self.to_q = nn.Linear(query_dim, self.inner_dim, bias=bias)
            self.to_k = nn.Linear(query_dim, self.inner_dim, bias=bias)
            self.to_v = nn.Linear(query_dim, self.inner_dim, bias=bias)
            if qk_norm == "rms_norm":
                self.norm_q = RMSNorm(dim_head, eps=eps)
                self.norm_k = RMSNorm(dim_head, eps=eps)
            elif qk_norm is None:
                self.norm_q = None
                self.norm_k = None
            else:
                raise NotImplementedError(qk_norm)
            self.to_out = nn.ModuleList(
                [nn.Linear(self.inner_dim, out_dim or query_dim, bias=True),
                 nn.Dropout(dropout)]
            )
            self.processor = processor

        def forward(self, hidden_states, **kwargs):
            return self.processor(self, hidden_states, **kwargs)

    diffusers = types.ModuleType("diffusers")
    diffusers.__path__ = []  # mark as package so submodule imports resolve
    d_utils = types.ModuleType("diffusers.utils")
    d_utils.is_torch_version = lambda op, version: True
    d_models = types.ModuleType("diffusers.models")
    d_emb = types.ModuleType("diffusers.models.embeddings")
    d_attn = types.ModuleType("diffusers.models.attention")
    d_attnp = types.ModuleType("diffusers.models.attention_processor")
    d_mutils = types.ModuleType("diffusers.models.modeling_utils")
    d_norm = types.ModuleType("diffusers.models.normalization")
    d_emb.get_timestep_embedding = get_timestep_embedding
    d_emb.Timesteps = Timesteps
    d_emb.TimestepEmbedding = TimestepEmbedding
    d_emb.LabelEmbedding = LabelEmbedding
    d_emb.FluxPosEmbed = FluxPosEmbed
    d_emb.get_1d_rotary_pos_embed = get_1d_rotary_pos_embed
    d_emb.apply_rotary_emb = apply_rotary_emb
    d_attn.FeedForward = FeedForward
    d_attnp.Attention = Attention
    d_mutils.ModelMixin = nn.Module
    d_norm.LayerNorm = nn.LayerNorm
    d_norm.RMSNorm = RMSNorm
    diffusers.models = d_models
    diffusers.utils = d_utils
    sys.modules["diffusers.utils"] = d_utils
    d_models.embeddings = d_emb
    d_models.attention = d_attn
    d_models.attention_processor = d_attnp
    d_models.modeling_utils = d_mutils
    d_models.normalization = d_norm
    sys.modules["diffusers"] = diffusers
    sys.modules["diffusers.models"] = d_models
    sys.modules["diffusers.models.embeddings"] = d_emb
    sys.modules["diffusers.models.attention"] = d_attn
    sys.modules["diffusers.models.attention_processor"] = d_attnp
    sys.modules["diffusers.models.modeling_utils"] = d_mutils
    sys.modules["diffusers.models.normalization"] = d_norm

    # -- rotary_embedding_torch ----------------------------------------------
    from einops import rearrange

    def rotate_half(x):
        x = rearrange(x, "... (d r) -> ... d r", r=2)
        x1, x2 = x.unbind(dim=-1)
        x = torch.stack((-x2, x1), dim=-1)
        return rearrange(x, "... d r -> ... (d r)")

    ret = types.ModuleType("rotary_embedding_torch")
    ret_inner = types.ModuleType("rotary_embedding_torch.rotary_embedding_torch")
    class RotaryEmbedding(nn.Module):
        """Faithful rotary_embedding_torch.RotaryEmbedding for the default
        configuration DIT1D uses (lang-style freqs, full-dim rotation,
        rotate_queries_or_keys over seq_dim=-2)."""

        def __init__(self, dim, theta=10000):
            super().__init__()
            freqs = 1.0 / (
                theta ** (torch.arange(0, dim, 2)[: dim // 2].float() / dim)
            )
            self.register_buffer("freqs", freqs, persistent=False)

        def rotate_queries_or_keys(self, t, seq_dim=-2, offset=0):
            seq_len = t.shape[seq_dim]
            seq = torch.arange(seq_len, dtype=self.freqs.dtype) + offset
            freqs = torch.einsum("i,j->ij", seq, self.freqs)
            freqs = torch.repeat_interleave(freqs, 2, dim=-1)
            return t * freqs.cos() + rotate_half(t) * freqs.sin()

    ret_inner.rotate_half = rotate_half
    ret.rotate_half = rotate_half
    ret.RotaryEmbedding = RotaryEmbedding
    ret.rotary_embedding_torch = ret_inner
    sys.modules["rotary_embedding_torch"] = ret
    sys.modules["rotary_embedding_torch.rotary_embedding_torch"] = ret_inner


def _register_namespace(name: str, path: str) -> None:
    """Register a package in sys.modules WITHOUT executing its __init__.py."""
    if name in sys.modules:
        return
    spec = importlib.machinery.ModuleSpec(name, None, is_package=True)
    spec.submodule_search_locations = [path]
    sys.modules[name] = importlib.util.module_from_spec(spec)


def load_reference_module(dotted: str):
    """Import e.g. 'refalg.dfot.backbones.dit.dit3d' from /root/reference.

    'refalg' maps to /root/reference/algorithms and 'refalg.dfot' to its dfot
    subdir; both are registered as namespace packages so their heavyweight
    __init__.py files never run. Deeper packages (backbones, diffusion, ...)
    execute their real __init__.py — with the stubs above that is safe.
    """
    install_stubs()
    _register_namespace("refalg", f"{REF_ROOT}/algorithms")
    _register_namespace("refalg.dfot", f"{REF_ROOT}/algorithms/dfot")
    # the metrics model files use absolute `algorithms.common...` imports and
    # live under heavyweight __init__ packages — register the chain as
    # namespaces so only the leaf modules execute
    chain = "algorithms/common/metrics/video/models/raft".split("/")
    for i in range(len(chain)):
        _register_namespace(
            ".".join(chain[: i + 1]), f"{REF_ROOT}/" + "/".join(chain[: i + 1])
        )
    return importlib.import_module(dotted)
