"""DiT backbone family (Flax): token-wise AdaLN-Zero video transformers.

Re-designed TPU-first from the reference DiT stack
(algorithms/dfot/backbones/dit/dit_base.py, dit_blocks.py, dit3d.py):

- channel-last (B, T, H, W, C) tensors throughout (TPU conv/matmul layout),
- patchify = reshape + one MXU matmul (see models/embeddings.PatchEmbed),
- attention through ops.attention (Pallas flash kernel on TPU),
- per-block rematerialization with ``nn.remat`` instead of torch checkpoint,
- bf16 compute / fp32 params via the ``dtype`` field,
- token-wise conditioning: the AdaLN modulation is computed from a (B, N, C)
  conditioning stream, so every token (frame) can carry its own noise level —
  the Diffusion Forcing mechanism.

Variants: "full" (all T*P tokens in one attention), "factorized_encoder"
(alternating spatial/temporal blocks), "factorized_attention" (spatial then
temporal attention inside one block sequence).
"""

from __future__ import annotations

import dataclasses
from typing import Optional, Tuple

import flax.linen as nn
import jax
import jax.numpy as jnp
import numpy as np

from ..ops.attention import attention
from .embeddings import (
    LabelEmbedding,
    PatchEmbed,
    RandomDropoutCondEmbedding,
    RoPE,
    StochasticTimeEmbedding,
    apply_rope,
    make_rope_2d,
    make_rope_3d,
    timestep_embedding,
)

__all__ = ["DiTBlock", "DiTBase", "DiT3D", "FinalLayer"]


def modulate(x: jax.Array, shift: jax.Array, scale: jax.Array) -> jax.Array:
    return x * (1 + scale) + shift


class Attention(nn.Module):
    """Multi-head self-attention with optional RoPE (packed qkv matmul)."""

    dim: int
    num_heads: int
    rope: Optional[RoPE] = None
    causal: bool = False
    dtype: jnp.dtype = jnp.float32

    @nn.compact
    def __call__(self, x: jax.Array) -> jax.Array:
        B, N, C = x.shape
        head_dim = self.dim // self.num_heads
        qkv = nn.Dense(3 * self.dim, dtype=self.dtype, name="qkv")(x)
        from ..ops.qkv_prep import attention_from_packed_qkv, fused_qkv_eligible

        if fused_qkv_eligible(N, head_dim, self.num_heads):
            # one Pallas pass for split + RoPE + lane-pad (see ops/qkv_prep.py)
            from .remat import tag_attn_out

            out = tag_attn_out(attention_from_packed_qkv(
                qkv, self.num_heads, head_dim, self.rope, causal=self.causal
            ))
            return nn.Dense(self.dim, dtype=self.dtype, name="proj")(out)
        qkv = qkv.reshape(B, N, 3, self.num_heads, head_dim)
        q, k, v = [
            jnp.moveaxis(qkv[:, :, i], 1, 2) for i in range(3)
        ]  # (B, H, N, D)
        if self.rope is not None:
            q = apply_rope(q, self.rope)
            k = apply_rope(k, self.rope)
        from ..ops.attention import attention_capture_enabled, attention_with_weights

        if attention_capture_enabled():
            out, weights = attention_with_weights(q, k, v, causal=self.causal)
            self.sow("intermediates", "attn_weights", weights)
        else:
            from .remat import tag_attn_out

            out = tag_attn_out(attention(q, k, v, causal=self.causal))
        out = jnp.moveaxis(out, 1, 2).reshape(B, N, C)
        return nn.Dense(self.dim, dtype=self.dtype, name="proj")(out)


class Mlp(nn.Module):
    dim: int
    hidden: int
    dtype: jnp.dtype = jnp.float32

    @nn.compact
    def __call__(self, x: jax.Array) -> jax.Array:
        x = nn.Dense(self.hidden, dtype=self.dtype, name="fc1")(x)
        x = nn.gelu(x, approximate=True)
        return nn.Dense(self.dim, dtype=self.dtype, name="fc2")(x)


class AdaModulation(nn.Module):
    """SiLU + zero-initialized linear producing n_chunks modulation tensors."""

    dim: int
    n_chunks: int
    dtype: jnp.dtype = jnp.float32

    @nn.compact
    def __call__(self, c: jax.Array) -> Tuple[jax.Array, ...]:
        m = nn.Dense(
            self.n_chunks * self.dim,
            kernel_init=nn.initializers.zeros,
            bias_init=nn.initializers.zeros,
            dtype=self.dtype,
            name="linear",
        )(nn.silu(c))
        return tuple(jnp.split(m, self.n_chunks, axis=-1))


class DiTBlock(nn.Module):
    """AdaLN-Zero transformer block with token-wise conditioning
    (reference: dit_blocks.py:440-510)."""

    dim: int
    num_heads: int
    mlp_ratio: Optional[float] = 4.0
    rope: Optional[RoPE] = None
    causal: bool = False
    dtype: jnp.dtype = jnp.float32

    @nn.compact
    def __call__(self, x: jax.Array, c: jax.Array) -> jax.Array:
        # NOTE: the reference block REPLACES the residual stream with the
        # AdaLN-normed tensor: `x, gate = norm1(x, c); x = x + gate*attn(x)`
        # (dit_blocks.py:505-510) — i.e. the skip adds to modulate(ln(x)),
        # NOT to the block input. Checkpoint parity requires matching this.
        ln = nn.LayerNorm(use_bias=False, use_scale=False, epsilon=1e-6, dtype=self.dtype)
        from ..ops.ln_modulate import ln_modulate, ln_modulate_eligible

        def norm_mod(t, sh, sc):
            # fused single-pass LN+modulate (ops/ln_modulate.py) when the
            # conditioning is token-wise and shapes tile; else the chain
            if sh.shape == t.shape and ln_modulate_eligible(t.shape[1], t.shape[2]):
                return ln_modulate(t, sh, sc)
            return modulate(ln(t), sh, sc)

        shift, scale, gate = AdaModulation(self.dim, 3, self.dtype, name="mod_attn")(c)
        h = norm_mod(x, shift, scale)
        x = h + gate * Attention(
            self.dim, self.num_heads, self.rope, self.causal, self.dtype, name="attn"
        )(h)
        if self.mlp_ratio is not None and self.mlp_ratio > 0:
            shift2, scale2, gate2 = AdaModulation(self.dim, 3, self.dtype, name="mod_mlp")(c)
            h = norm_mod(x, shift2, scale2)
            x = h + gate2 * Mlp(
                self.dim, int(self.dim * self.mlp_ratio), self.dtype, name="mlp"
            )(h)
        return x


class FinalLayer(nn.Module):
    """AdaLN + zero-init projection (reference: dit_blocks.py:513-542)."""

    dim: int
    out_dim: int
    dtype: jnp.dtype = jnp.float32

    @nn.compact
    def __call__(self, x: jax.Array, c: jax.Array) -> jax.Array:
        shift, scale = AdaModulation(self.dim, 2, self.dtype, name="mod")(c)
        ln = nn.LayerNorm(use_bias=False, use_scale=False, epsilon=1e-6, dtype=self.dtype)
        from ..ops.ln_modulate import ln_modulate, ln_modulate_eligible

        if shift.shape == x.shape and ln_modulate_eligible(x.shape[1], x.shape[2]):
            x = ln_modulate(x, shift, scale)
        else:
            x = modulate(ln(x), shift, scale)
        return nn.Dense(
            self.out_dim,
            kernel_init=nn.initializers.zeros,
            bias_init=nn.initializers.zeros,
            dtype=self.dtype,
            name="proj",
        )(x)


@dataclasses.dataclass(frozen=True)
class DiTSpec:
    """Static architecture spec shared by DiT variants."""

    hidden_size: int = 384
    depth: int = 12
    num_heads: int = 6
    mlp_ratio: float = 4.0
    spatial_mlp_ratio: Optional[float] = None
    variant: str = "full"  # full | factorized_encoder | factorized_attention
    #        | full_matrix_attention | factorized_matrix_attention
    pos_emb_type: str = "rope_3d"
    patch_size: int = 2
    max_temporal_length: int = 16
    use_gradient_checkpointing: bool = False
    # jax.checkpoint saveable policy for remated blocks
    # (none|dots|attn|dots_attn, models/remat.py)
    remat_policy: Optional[str] = None
    causal: bool = False
    # matrix-attention variants (reference dit_base.py:129-149)
    embed_col_dim: Optional[int] = None
    embed_row_dim: Optional[int] = None
    num_col_heads: Optional[int] = None
    num_row_heads: Optional[int] = None
    matrix_multi_token: bool = False
    flatten_matrix_rope: bool = False
    matrix_use_bias: bool = False
    fixed_u: Optional[str] = None
    # reference default is False (dit_base.py kwargs.get("use_temporal_rope",
    # False)); configs enable it explicitly for factorized matrix attention
    use_temporal_rope: bool = False
    # difference-DiT double RoPE (concat | interleaved | None)
    double_rope_merge: Optional[str] = None

    @property
    def is_matrix(self) -> bool:
        return self.variant in ("full_matrix_attention", "factorized_matrix_attention")


class DiTBase(nn.Module):
    """Shared transformer trunk over (B, N, C) tokens with (B, N, C) cond.

    num_patches: tokens per frame (None for 1-D latents).
    """

    spec: DiTSpec
    num_patches: Optional[int]
    spatial_grid: Optional[Tuple[int, int]]
    out_channels: int
    dtype: jnp.dtype = jnp.float32

    def setup(self):
        from .embeddings import get_nd_sincos_pos_embed

        s = self.spec
        self.rope = None
        self.pos_emb = None
        self.pos_table = None          # (N, C) numpy, added once over (t p)
        self.spatial_pos_table = None  # (P, C) numpy, added per frame
        self.temporal_pos_table = None  # (T, C) numpy, added before 1st temporal block
        if s.pos_emb_type == "rope_3d":
            assert s.variant == "full", "rope_3d requires the full variant"
            head_dim = s.hidden_size // s.num_heads
            self.rope = make_rope_3d(
                head_dim,
                (s.max_temporal_length,) + tuple(self.spatial_grid),
                double_merge=s.double_rope_merge,
            )
        elif s.pos_emb_type == "rope_2d":
            head_dim = s.hidden_size // s.num_heads
            self.rope = make_rope_2d(head_dim, tuple(self.spatial_grid))
        elif s.pos_emb_type == "learned_1d":
            max_tokens = s.max_temporal_length * (self.num_patches or 1)
            self.pos_emb = self.param(
                "pos_emb", nn.initializers.normal(0.02), (1, max_tokens, s.hidden_size)
            )
        elif s.pos_emb_type == "sinusoidal_1d":
            max_tokens = s.max_temporal_length * (self.num_patches or 1)
            self.pos_table = get_nd_sincos_pos_embed(s.hidden_size, (max_tokens,))
        elif s.pos_emb_type == "sinusoidal_3d":
            self.pos_table = get_nd_sincos_pos_embed(
                s.hidden_size, (s.max_temporal_length,) + tuple(self.spatial_grid)
            )
        elif s.pos_emb_type == "sinusoidal_2d":
            # spatial-only table, applied per frame (temporal position comes
            # from the matrix blocks' rope1d; reference dit_base.py:355-362)
            self.spatial_pos_table = get_nd_sincos_pos_embed(
                s.hidden_size, tuple(self.spatial_grid)
            )
        elif s.pos_emb_type == "sinusoidal_factorized":
            self.spatial_pos_table = get_nd_sincos_pos_embed(
                s.hidden_size, tuple(self.spatial_grid)
            )
            self.temporal_pos_table = get_nd_sincos_pos_embed(
                s.hidden_size, (s.max_temporal_length,)
            )
        else:
            raise ValueError(f"unsupported pos_emb_type {s.pos_emb_type}")

        block = DiTBlock
        if s.use_gradient_checkpointing:
            from .remat import remat_policy

            block = nn.remat(
                DiTBlock, static_argnums=(), policy=remat_policy(s.remat_policy)
            )

        def matrix_block(name):
            from .matrix import MatrixDiTBlock
            from .embeddings import make_rope_1d

            mrope = None
            if s.use_temporal_rope:
                n = s.embed_col_dim // s.num_col_heads
                d = s.embed_row_dim // s.num_row_heads
                dim = n * d if s.flatten_matrix_rope else d
                mrope = make_rope_1d(dim, s.max_temporal_length)
            return MatrixDiTBlock(
                col_hidden_size=self.num_patches,
                row_hidden_size=s.hidden_size,
                embed_col_dim=s.embed_col_dim,
                embed_row_dim=s.embed_row_dim,
                num_col_heads=s.num_col_heads,
                num_row_heads=s.num_row_heads,
                mlp_ratio=s.mlp_ratio,
                matrix_rope=mrope,
                flatten_matrix_rope=s.flatten_matrix_rope,
                matrix_multi_token=s.matrix_multi_token,
                use_bias=s.matrix_use_bias,
                fixed_u=s.fixed_u,
                dtype=self.dtype,
                name=name,
            )

        spatial_rope = self.rope if s.pos_emb_type.startswith("rope") else None
        if s.variant == "full_matrix_attention":
            self.blocks = [matrix_block(f"block_{i}") for i in range(s.depth)]
        else:
            # NOTE: the reference passes spatial_mlp_ratio (None unless
            # configured -> NO MLP) to these blocks for every non-matrix
            # variant INCLUDING "full" (dit_base.py:180-194, where even the
            # full variant's blocks receive self.spatial_mlp_ratio); only the
            # temporal blocks of factorized variants get mlp_ratio. Matching
            # this exactly is required for checkpoint parity.
            self.blocks = [
                block(
                    s.hidden_size,
                    s.num_heads,
                    s.spatial_mlp_ratio,
                    spatial_rope,
                    s.causal and s.variant == "full",
                    self.dtype,
                    name=f"block_{i}",
                )
                for i in range(s.depth)
            ]
        if self.is_factorized:
            if s.variant == "factorized_matrix_attention":
                self.temporal_blocks = [
                    matrix_block(f"temporal_block_{i}") for i in range(s.depth)
                ]
            else:
                self.temporal_blocks = [
                    block(
                        s.hidden_size,
                        s.num_heads,
                        s.mlp_ratio,
                        None,
                        s.causal,
                        self.dtype,
                        name=f"temporal_block_{i}",
                    )
                    for i in range(s.depth)
                ]
        self.final_layer = FinalLayer(
            s.hidden_size, self.out_channels, self.dtype, name="final_layer"
        )

    @property
    def is_factorized(self) -> bool:
        return self.spec.variant in (
            "factorized_encoder",
            "factorized_attention",
            "factorized_matrix_attention",
        )

    def __call__(self, x: jax.Array, c: jax.Array) -> jax.Array:
        """x, c: (B, N, C) with N = T * num_patches (flattened row-major).

        Joint image-video training (reference dit_base.py:326-343): tokens
        beyond max_temporal_length * P are treated as single-frame images —
        reshaped to (B * T_img, P) length-1 sequences, run through the same
        blocks, and concatenated back.
        """
        s = self.spec
        P = self.num_patches or 1
        max_tokens = s.max_temporal_length * P
        if x.shape[1] > max_tokens:
            x_vid, x_img = x[:, :max_tokens], x[:, max_tokens:]
            c_vid, c_img = c[:, :max_tokens], c[:, max_tokens:]
            B0 = x.shape[0]
            t_img = x_img.shape[1] // P
            out_vid = self(x_vid, c_vid)
            out_img = self(
                x_img.reshape(B0 * t_img, P, x.shape[-1]),
                c_img.reshape(B0 * t_img, P, c.shape[-1]),
            )
            return jnp.concatenate(
                [out_vid, out_img.reshape(B0, t_img * P, -1)], axis=1
            )

        B, N, C = x.shape
        T = N // P

        if self.pos_emb is not None:
            x = x + self.pos_emb[:, :N].astype(x.dtype)
        elif self.pos_table is not None:  # sinusoidal_1d / sinusoidal_3d
            x = x + jnp.asarray(self.pos_table[:N], x.dtype)[None]
        if self.spatial_pos_table is not None:  # sinusoidal_2d / _factorized
            sp = jnp.asarray(self.spatial_pos_table, x.dtype)  # (P, C)
            x = (x.reshape(B, T, P, C) + sp).reshape(B, N, C)
        if self.temporal_pos_table is not None and not self.is_factorized:
            # full variant with factorized PE: temporal added immediately
            # (reference dit_base.py:372-379)
            tp = jnp.asarray(self.temporal_pos_table[:T], x.dtype)  # (T, C)
            x = (x.reshape(B, T, P, C) + tp[:, None]).reshape(B, N, C)

        if not self.is_factorized:
            for block in self.blocks:
                x = block(x, c)
        else:
            # spatial over (B*T, P); temporal over (B*P, T) for standard
            # blocks, or over the full (B, T*P) grid for matrix blocks
            # (reference dit_base.py:392-414); XLA fuses the transposes into
            # the surrounding matmuls
            matrix_temporal = s.variant == "factorized_matrix_attention"
            for i, block in enumerate(self.blocks):
                xs = x.reshape(B * T, P, C)
                cs = c.reshape(B * T, P, C)
                xs = block(xs, cs)
                if i == 0 and self.temporal_pos_table is not None:
                    # factorized PE: temporal table added once, after the
                    # first spatial block (reference dit_base.py:399-421)
                    tp = jnp.asarray(self.temporal_pos_table[:T], xs.dtype)
                    xs = (
                        xs.reshape(B, T, P, C) + tp[:, None]
                    ).reshape(B * T, P, C)
                if matrix_temporal:
                    x = self.temporal_blocks[i](xs.reshape(B, N, C), c)
                else:
                    xt = xs.reshape(B, T, P, C).swapaxes(1, 2).reshape(B * P, T, C)
                    ct = c.reshape(B, T, P, C).swapaxes(1, 2).reshape(B * P, T, C)
                    xt = self.temporal_blocks[i](xt, ct)
                    x = xt.reshape(B, P, T, C).swapaxes(1, 2).reshape(B, N, C)

        return self.final_layer(x, c)


class DiT3D(nn.Module):
    """Video DiT: patchify -> DiTBase -> unpatchify, per-frame AdaLN cond
    (reference: dit3d.py). Input (B, T, H, W, C_in) channel-last; noise_levels
    (B, T) (integer levels or continuous logSNR).
    """

    spec: DiTSpec
    x_channels: int
    resolution: Tuple[int, int]
    external_cond_type: Optional[str] = None  # label | action | None
    external_cond_dim: int = 0
    external_cond_num_classes: Optional[int] = None
    external_cond_dropout: float = 0.0
    use_fourier_noise_emb: bool = False
    dtype: jnp.dtype = jnp.float32

    @property
    def grid(self) -> Tuple[int, int]:
        p = self.spec.patch_size
        return (self.resolution[0] // p, self.resolution[1] // p)

    @nn.compact
    def __call__(
        self,
        x: jax.Array,
        noise_levels: jax.Array,
        external_cond: Optional[jax.Array] = None,
        external_cond_mask: Optional[jax.Array] = None,
        train: bool = False,
        extra_emb: Optional[jax.Array] = None,
    ) -> jax.Array:
        s = self.spec
        B, T, H, W, Cin = x.shape
        p = s.patch_size
        gh, gw = self.grid
        P = gh * gw

        tokens = PatchEmbed(p, s.hidden_size, self.dtype, name="patch_embed")(x)
        tokens = tokens.reshape(B, T * P, s.hidden_size)

        emb = StochasticTimeEmbedding(
            dim=256,
            emb_dim=s.hidden_size,
            use_fourier=self.use_fourier_noise_emb,
            dtype=self.dtype,
            name="noise_emb",
        )(noise_levels, train=train)  # (B, T, C)
        if extra_emb is not None:
            emb = emb + extra_emb.astype(emb.dtype)

        if external_cond is not None and self.external_cond_type is not None:
            if self.external_cond_type == "label":
                cond = LabelEmbedding(
                    self.external_cond_num_classes,
                    s.hidden_size,
                    self.external_cond_dropout,
                    name="cond_emb",
                )(external_cond, external_cond_mask, train)
                if cond.ndim == 2:  # per-video label -> broadcast over frames
                    cond = cond[:, None]
            elif self.external_cond_type == "action":
                cond = RandomDropoutCondEmbedding(
                    s.hidden_size,
                    self.external_cond_dropout,
                    self.dtype,
                    name="cond_emb",
                )(external_cond, external_cond_mask, train)
            else:
                raise ValueError(f"unknown external_cond_type {self.external_cond_type}")
            emb = emb + cond.astype(emb.dtype)

        # broadcast per-frame conditioning to all patches of the frame
        c = jnp.repeat(emb, P, axis=1)  # (B, T*P, C)

        out = DiTBase(
            spec=s,
            num_patches=P,
            spatial_grid=self.grid,
            out_channels=p * p * Cin,
            dtype=self.dtype,
            name="dit",
        )(tokens, c)

        # unpatchify: (B, T*P, p*p*Cin) -> (B, T, H, W, Cin)
        out = out.reshape(B, T, gh, gw, p, p, Cin)
        out = out.transpose(0, 1, 2, 4, 3, 5, 6)
        return out.reshape(B, T, H, W, Cin).astype(jnp.float32)


class DiT3DPose(nn.Module):
    """Camera-pose conditioned DiT3D (reference: dit3d_pose.py:13-119).

    Pose conditioning (a (B, T, H, W, C') ray/ray-encoding/Pluecker map):
    - 'concat': channel-concatenated to x before patchify (output keeps the
      original x channels),
    - 'film': patch-embedded with whole-sample dropout, average-pooled per
      frame, and added to the AdaLN conditioning stream.
    """

    spec: DiTSpec
    x_channels: int
    resolution: Tuple[int, int]
    conditioning_type: str = "film"  # concat | film
    external_cond_type: Optional[str] = "pose"
    external_cond_dim: int = 0
    external_cond_num_classes: Optional[int] = None
    external_cond_dropout: float = 0.1
    use_fourier_noise_emb: bool = False
    dtype: jnp.dtype = jnp.float32

    @nn.compact
    def __call__(
        self,
        x: jax.Array,
        noise_levels: jax.Array,
        external_cond: Optional[jax.Array] = None,
        external_cond_mask: Optional[jax.Array] = None,
        train: bool = False,
    ) -> jax.Array:
        assert external_cond is not None, "DiT3DPose requires camera-pose cond"
        s = self.spec
        B, T = x.shape[:2]

        pose_emb = None
        if self.conditioning_type == "concat":
            x_in = jnp.concatenate([x, external_cond.astype(x.dtype)], axis=-1)
        else:  # film: pose patch-embedded -> per-frame vector
            from .embeddings import PatchEmbed

            x_in = x
            pose = PatchEmbed(s.patch_size, s.hidden_size, self.dtype, name="pose_embed")(
                external_cond
            )  # (B, T, P, C)
            pose_emb = jnp.mean(pose, axis=2)  # (B, T, C)
            if self.external_cond_dropout > 0 and train:
                rng = self.make_rng("dropout")
                drop = jax.random.uniform(rng, (B,)) < self.external_cond_dropout
                pose_emb = jnp.where(drop[:, None, None], 0.0, pose_emb)
            elif external_cond_mask is not None:
                m = external_cond_mask.reshape(
                    external_cond_mask.shape + (1,) * (pose_emb.ndim - external_cond_mask.ndim)
                )
                pose_emb = jnp.where(m, 0.0, pose_emb)

        out = DiT3D(
            spec=s,
            x_channels=x_in.shape[-1],
            resolution=self.resolution,
            use_fourier_noise_emb=self.use_fourier_noise_emb,
            dtype=self.dtype,
            name="trunk",
        )(x_in, noise_levels, None, None, train=train, extra_emb=pose_emb)
        return out[..., : self.x_channels]
