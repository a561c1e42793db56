"""DFoT video algorithm: config -> model + trainer + sampler wiring.

Functional counterpart of the reference's LightningModule stack
(algorithms/dfot/dfot_video.py + algorithms/common/base_pytorch_video_algo.py):
owns frame<->token bookkeeping, data normalization, the denoiser backbone,
the diffusion schedule, training noise levels, and the rollout driver. All
state lives in explicit pytrees; methods are thin wrappers over the pure
jitted functions in diffusion/, sampling/, training/.
"""

from __future__ import annotations

from typing import Any, Dict, Optional, Tuple

import jax
import jax.numpy as jnp
import numpy as np

from ..config import Config
from ..diffusion import DiffusionConfig, make_schedule
from ..guidance.history_guidance import HistoryGuidance
from ..sampling import DFoTRollout, RolloutConfig
from ..training import (
    NoiseLevelConfig,
    create_train_state,
    make_optimizer,
    make_train_step,
)
from ..utils.geometry import (
    conditioning_dim,
    expand_pose_conditions_jax,
    normalize_camera_conditions,
    process_camera_conditions,
)

__all__ = ["DFoTVideoAlgo", "DFoTVideoPoseAlgo", "build_algorithm"]


class DFoTVideoAlgo:
    """Diffusion Forcing Transformer for video generation."""

    is_pose_conditioned = False

    def __init__(self, cfg: Config, compute_dtype=jnp.bfloat16):
        self.cfg = cfg
        self.compute_dtype = compute_dtype

        # ---- frame/token bookkeeping (reference
        # base_pytorch_video_algo.py:986-1033) --------------------------------
        latent = cfg.latent
        self.is_latent = bool(latent.enabled)
        self.temporal_downsampling = (
            latent.downsampling_factor[0] if self.is_latent else 1
        )
        c, h, w = cfg.x_shape
        if self.is_latent:
            ds = latent.downsampling_factor[1]
            c = latent.num_channels
            h, w = h // ds, w // ds
        self.x_shape = (h, w, c)  # channel-last token shape
        self.max_tokens = self._frames_to_tokens(cfg.max_frames)
        self.n_tokens = self._frames_to_tokens(cfg.n_frames)
        self.n_context_tokens = self._frames_to_tokens(cfg.context_frames) if cfg.context_frames else 0

        # data normalization buffers (channel-last)
        self.data_mean = self._stat(cfg.get("data_mean"))
        self.data_std = self._stat(cfg.get("data_std"))

        # ---- diffusion -------------------------------------------------------
        self.dcfg = DiffusionConfig.from_config(cfg.diffusion)
        self.sched = make_schedule(self.dcfg)

        # ---- backbone --------------------------------------------------------
        self.model = self._build_backbone()

        # token-layout sampling state for U-ViT backbones: the scan state
        # stays in patch-token layout, so the pixel<->patch transpose runs
        # once per window instead of per denoising step (same wiring as
        # bench.py's flagship rollout; exactness: tests/test_sampler.py::
        # test_state_codec_matches_pixel_state)
        self._sample_model = self.model
        self._state_codec = None
        from ..models.uvit import UViT3D, patchify_tokens, unpatchify_tokens

        if isinstance(self.model, UViT3D):
            _p = self.model.spec.patch_size
            if h == w and h % _p == 0:
                self._sample_model = self.model.clone(token_io=True)
                self._state_codec = (
                    lambda x, p=_p: patchify_tokens(x, p),
                    lambda x, p=_p: unpatchify_tokens(x, p, h, w),
                )

        # ---- rollout ---------------------------------------------------------
        pred = cfg.tasks.prediction
        interp = cfg.tasks.interpolation
        self.rollout_cfg = RolloutConfig(
            max_tokens=self.max_tokens,
            x_shape=self.x_shape,
            scheduling_matrix=cfg.scheduling_matrix,
            is_full_sequence=self.is_full_sequence,
            chunk_size=cfg.chunk_size,
            use_causal_mask=self.dcfg.use_causal_mask,
            external_cond_type=cfg.get("external_cond_type"),
            sliding_context_len=pred.get("sliding_context_len"),
            keyframe_density=pred.get("keyframe_density"),
            interpolation_max_batch_size=interp.get("max_batch_size"),
            scan_bucket=cfg.get("scan_bucket", 0) or 0,
            cond_transform=self._sampling_cond_transform(),
            state_codec=self._state_codec,
            refinement=(
                dict(cfg.refinement_sampling.to_dict())
                if cfg.refinement_sampling.enabled
                else None
            ),
        )
        self.rollout = DFoTRollout(
            self.rollout_cfg, self.dcfg, self.sched, self._rollout_apply
        )
        self.prediction_hg_cfg = pred.history_guidance
        self.interpolation_hg_cfg = interp.history_guidance

        # ---- training --------------------------------------------------------
        self.nl_cfg = NoiseLevelConfig.from_config(
            cfg, self.dcfg.timesteps, self.n_context_tokens
        )

    def set_sampling_mesh(self, mesh) -> None:
        """Shard the NFE-expanded sampling batch over ``mesh``'s 'data' axis
        (multi-chip sampling — see sampler.make_window_sampler)."""
        import dataclasses as _dc

        self.rollout_cfg = _dc.replace(self.rollout_cfg, mesh=mesh)
        self.rollout = DFoTRollout(
            self.rollout_cfg, self.dcfg, self.sched, self._rollout_apply
        )

    # ------------------------------------------------------------------
    # bookkeeping
    # ------------------------------------------------------------------
    def _frames_to_tokens(self, n_frames: int) -> int:
        return (n_frames - 1) // self.temporal_downsampling + 1

    def _tokens_to_frames(self, n_tokens: int) -> int:
        return (n_tokens - 1) * self.temporal_downsampling + 1

    @property
    def is_full_sequence(self) -> bool:
        """Full-sequence baseline: uniform noise + full_sequence matrix
        (context is re-noised rather than pinned; reference semantics)."""
        return (
            self.cfg.noise_level == "random_uniform"
            and self.cfg.scheduling_matrix == "full_sequence"
            and not self.cfg.fixed_context.enabled
            and not self.cfg.variable_context.enabled
        )

    def _stat(self, value) -> Optional[np.ndarray]:
        if value is None:
            return None
        if isinstance(value, str):
            # path to an .npy produced by estimate_latent_stats
            import os

            if not os.path.exists(value):
                return None
            arr = np.load(value).astype(np.float32)
            return arr.reshape(1, 1, -1)  # channel vector -> (1, 1, C)
        arr = np.asarray(value, dtype=np.float32)  # (C, 1, 1) in the configs
        if arr.ndim == 3:
            arr = arr.transpose(1, 2, 0)  # -> (1, 1, C)
        return arr

    def normalize(self, x: jax.Array) -> jax.Array:
        if self.data_mean is None:
            return x
        return (x - self.data_mean) / self.data_std

    def unnormalize(self, x: jax.Array) -> jax.Array:
        if self.data_mean is None:
            return x
        return x * self.data_std + self.data_mean

    # ------------------------------------------------------------------
    # backbone
    # ------------------------------------------------------------------
    def _build_backbone(self):
        """Backbone factory (reference: discrete_diffusion.py:64-92)."""
        bcfg = self.cfg.backbone
        name = bcfg.name
        h, w, c = self.x_shape
        common = dict(
            x_channels=c,
            external_cond_type=self.cfg.get("external_cond_type"),
            external_cond_dim=self.cfg.get("external_cond_dim") or 0,
            external_cond_num_classes=self.cfg.get("external_cond_num_classes"),
            external_cond_dropout=bcfg.get("external_cond_dropout", 0.0),
            use_fourier_noise_emb=bcfg.get("use_fourier_noise_embedding", False),
            dtype=self.compute_dtype,
        )
        if name in ("dit3d", "dit3d_pose", "difference_dit3d"):
            from ..models.dit import DiT3D, DiTSpec

            spec = DiTSpec(
                # matrix variants may leave hidden_size null; the effective
                # width is embed_row_dim (reference dit3d.py hidden_size prop)
                hidden_size=(
                    bcfg.get("hidden_size") or bcfg.get("embed_row_dim")
                ),
                depth=bcfg.depth,
                num_heads=bcfg.get("num_heads"),
                mlp_ratio=bcfg.mlp_ratio,
                spatial_mlp_ratio=bcfg.get("spatial_mlp_ratio"),
                variant=bcfg.variant,
                pos_emb_type=bcfg.pos_emb_type,
                patch_size=bcfg.patch_size,
                max_temporal_length=self.max_tokens,
                use_gradient_checkpointing=bcfg.get("use_gradient_checkpointing", False),
                remat_policy=bcfg.get("remat_policy"),
                causal=self.dcfg.use_causal_mask,
                embed_col_dim=bcfg.get("embed_col_dim"),
                embed_row_dim=bcfg.get("embed_row_dim"),
                num_col_heads=bcfg.get("num_col_heads"),
                num_row_heads=bcfg.get("num_row_heads"),
                matrix_multi_token=bcfg.get("matrix_multi_token") or False,
                flatten_matrix_rope=bcfg.get("flatten_matrix_rope") or False,
                matrix_use_bias=bcfg.get("use_bias") or False,
                fixed_u=bcfg.get("fixed_u"),
                use_temporal_rope=bcfg.get("use_temporal_rope", False),
                double_rope_merge=(
                    bcfg.get("merge_type", "concat") if name == "difference_dit3d" else None
                ),
            )
            if name == "dit3d_pose":
                from ..models.dit import DiT3DPose

                common["external_cond_dim"] = conditioning_dim(
                    self.cfg.camera_pose_conditioning.type
                )
                common["external_cond_type"] = "pose"
                common.pop("use_fourier_noise_emb", None)
                return DiT3DPose(
                    spec=spec,
                    resolution=(h, w),
                    conditioning_type=bcfg.get("conditioning", {}).get("type", "film")
                    if bcfg.get("conditioning") is not None
                    else "film",
                    use_fourier_noise_emb=bcfg.get("use_fourier_noise_embedding", False),
                    **common,
                )
            return DiT3D(spec=spec, resolution=(h, w), **common)
        if name == "u_net3d":
            from ..models.unet3d import UNet3D, UNet3DSpec

            spec = UNet3DSpec.from_config(bcfg, self.max_tokens)
            return UNet3D(
                spec=spec, resolution=h, use_causal_mask=self.dcfg.use_causal_mask,
                **common,
            )
        if name == "far_dit":
            from ..models.far import FARDiT, FARSpec

            spec = FARSpec.from_config(bcfg, self.max_tokens)
            return FARDiT(spec=spec, resolution=(h, w), **common)
        if name == "dit1d":
            from ..models.dit1d import DiT1D, DiT1DSpec

            spec = DiT1DSpec.from_config(bcfg, self.max_tokens)
            # x_shape (C, 1, N) -> tokens per frame = N
            return DiT1D(spec=spec, n_tokens=w, **common)
        if name in ("u_vit3d", "u_vit3d_pose"):
            from ..models.uvit import UViT3D, UViT3DPose, UViTSpec

            spec = UViTSpec.from_config(bcfg, self.max_tokens)
            cls = UViT3DPose if name == "u_vit3d_pose" else UViT3D
            # UViT has no label classifier-embedding table (reference
            # u_vit3d.py signature takes actions/poses only)
            common.pop("external_cond_num_classes", None)
            if name == "u_vit3d_pose":
                common["external_cond_dim"] = conditioning_dim(
                    self.cfg.camera_pose_conditioning.type
                )
                common["external_cond_type"] = "pose"
            return cls(spec=spec, resolution=h, **common)
        raise NotImplementedError(f"backbone {name!r} not yet available")

    def init_params(self, rng: jax.Array) -> Dict:
        B, T = 1, self.max_tokens
        h, w, c = self.x_shape
        x = jnp.zeros((B, T, h, w, c))
        k = jnp.zeros((B, T))
        cond = self._dummy_condition(B, T)
        rngs = {"params": rng, "dropout": jax.random.fold_in(rng, 1)}
        variables = self.model.init(rngs, x, k, cond, None)
        # capture non-trainable collections (e.g. the continuous-diffusion
        # FourierEmbedding's "buffers": fixed random freqs/phases, reference
        # embeddings.py:94-102) so params-only apply paths can re-attach them
        self._extra_cols = {k_: v for k_, v in variables.items() if k_ != "params"}
        return variables

    def _variables(self, params) -> Dict:
        """Full variables dict for ``model.apply`` from a params tree."""
        if getattr(self, "_extra_cols", None) is None:
            if self.cfg.backbone.get("use_fourier_noise_embedding", False):
                self.init_params(jax.random.PRNGKey(0))  # sets _extra_cols
            else:
                self._extra_cols = {}
        return {"params": params, **self._extra_cols}

    def _dummy_condition(self, B: int, T: int):
        ect = self.cfg.get("external_cond_type")
        if not ect:
            return None
        if ect == "label":
            return jnp.zeros((B,), jnp.int32)
        dim = self.cfg.get("external_cond_dim") or 0
        return jnp.zeros((B, T, dim))

    # ------------------------------------------------------------------
    # model apply adapters
    # ------------------------------------------------------------------
    def _sample_apply(self, variables, x, noise_levels, cond, cond_mask):
        return self.model.apply(variables, x, noise_levels, cond, cond_mask)

    def _rollout_apply(self, variables, x, noise_levels, cond, cond_mask):
        # like _sample_apply, but _sample_model may be the token_io clone
        # (identical parameter tree) when the rollout runs with a
        # state_codec — x is then (B, T, h*w, p*p*C) patch tokens
        return self._sample_model.apply(variables, x, noise_levels, cond, cond_mask)

    def _train_apply(self, params, x, noise_levels, cond, cond_mask, rngs=None, train=False):
        ct = self._cond_transform()
        if cond is not None and ct is not None:
            cond = ct(cond)
        return self.model.apply(
            self._variables(params), x, noise_levels, cond, cond_mask,
            train=train, rngs=rngs,
        )

    def _cond_transform(self):
        """Optional device-side condition expansion (pose subclass: compact
        camera vectors -> per-pixel ray maps, traced inside jit)."""
        return None

    def _sampling_cond_transform(self):
        """Condition transform for the sampling path; subclasses may extend
        the training-time expansion with weight-dependent precomputation
        (the extended form takes (conditions, variables))."""
        return self._cond_transform()

    # ------------------------------------------------------------------
    # conditions
    # ------------------------------------------------------------------
    def process_conditions(
        self, conditions: Optional[np.ndarray], noise_levels: Optional[np.ndarray] = None
    ):
        """Hook for condition preprocessing (identity here; pose subclass
        converts raw camera vectors to rays)."""
        return conditions

    # ------------------------------------------------------------------
    # training
    # ------------------------------------------------------------------
    def make_train_state(self, rng: jax.Array, accumulate_steps: int = 1,
                         num_training_steps: Optional[int] = None,
                         grad_clip: float = 1.0):
        variables = self.init_params(rng)
        exp = self.cfg
        tx = make_optimizer(
            lr=exp.lr,
            weight_decay=exp.weight_decay,
            betas=tuple(exp.optimizer_beta),
            grad_clip=grad_clip,
            lr_schedule_name=exp.lr_scheduler.name,
            num_warmup_steps=exp.lr_scheduler.num_warmup_steps,
            num_training_steps=exp.lr_scheduler.get("num_training_steps", num_training_steps),
            accumulate_steps=accumulate_steps,
        )
        return create_train_state(variables["params"], tx, use_ema=True)

    def make_eval_denoise(self):
        """Jitted denoising evaluator returning (mean loss, x0 reconstruction)
        — the reference's validation_step denoising output (``recons``,
        simple_video_generation.py:434-445) used for both the in-training
        validation loss and the ``*_denoising_vis`` video panels."""

        @jax.jit
        def eval_denoise(params, batch, rng):
            r_k, r_noise, r_drop = jax.random.split(rng, 3)
            from ..training.noise_levels import training_noise_levels
            from ..diffusion import core as _dc
            from ..diffusion.continuous import (
                continuous_training_fields, continuous_v_loss,
            )

            xs = batch["xs"]
            k, loss_mask = training_noise_levels(
                r_k, self.nl_cfg, batch["masks"], train=False
            )
            noise = _dc.clipped_normal(r_noise, xs.shape, self.dcfg.clip_noise, xs.dtype)
            if self.dcfg.is_continuous:
                x_t, logsnr, a_t, s_t = continuous_training_fields(
                    self.dcfg, xs, k, noise
                )
                out = self._train_apply(
                    params, x_t, self.dcfg.precond_scale * logsnr,
                    batch.get("conditions"), None, rngs={"dropout": r_drop},
                )
                recons, loss = continuous_v_loss(
                    self.dcfg, out, x_t, noise, logsnr, a_t, s_t
                )
            else:
                noised, target = _dc.training_targets(self.sched, self.dcfg, xs, k, noise)
                out = self._train_apply(
                    params, noised, k.astype(jnp.float32),
                    batch.get("conditions"), None, rngs={"dropout": r_drop},
                )
                loss = _dc.training_loss(self.sched, self.dcfg, out, target, k)
                if self.dcfg.objective == "pred_x0":
                    recons = out
                elif self.dcfg.objective == "pred_noise":
                    recons = _dc.predict_start_from_noise(self.sched, noised, k, out)
                else:  # pred_v
                    recons = _dc.predict_start_from_v(self.sched, noised, k, out)
            w = _dc.bcast_right(loss_mask.astype(loss.dtype), loss.ndim)
            return jnp.mean(loss * w), recons

        return eval_denoise

    def make_eval_loss(self):
        """Jitted denoising-loss evaluator (for in-training validation,
        reference run_validation with validate_sample=False)."""
        eval_denoise = self.make_eval_denoise()

        def eval_loss(params, batch, rng):
            loss, _ = eval_denoise(params, batch, rng)
            return loss

        return eval_loss

    def make_train_step(self, ema_decay: float = 0.9999, accumulate_steps: int = 1):
        return make_train_step(
            self._train_apply, self.dcfg, self.sched, self.nl_cfg, ema_decay,
            accumulate_steps=accumulate_steps,
        )

    # ------------------------------------------------------------------
    # sampling (validation / generation)
    # ------------------------------------------------------------------
    def sample_videos(
        self,
        params: Dict,
        rng: jax.Array,
        xs: jax.Array,  # (B, T, h, w, c) normalized tokens
        conditions: Optional[np.ndarray] = None,
        tasks: Optional[Tuple[str, ...]] = None,
        n_context_tokens: Optional[int] = None,
    ) -> Dict[str, jax.Array]:
        """Run the configured generation tasks (reference dfot_video.py:80-112)."""
        if tasks is None:
            tasks = tuple(
                t for t in ("prediction", "interpolation")
                if self.cfg.tasks[t].enabled
            )
        nct = n_context_tokens if n_context_tokens is not None else self.n_context_tokens
        variables = self._variables(params)
        conds = self.process_conditions(conditions)
        if conds is not None and not isinstance(conds, jax.Array):
            conds = np.asarray(conds)
            if (
                self.compute_dtype == jnp.bfloat16
                and conds.dtype == np.float32
                and conds.ndim >= 4
            ):
                # dense per-frame condition maps (e.g. 180-channel ray
                # encodings): the model's bf16 Dense casts them anyway, so a
                # host-side bf16 cast is numerically identical and halves
                # both HBM residency and the per-window host->device bytes
                # on long rollouts (the rollout slices host arrays lazily)
                import ml_dtypes

                conds = conds.astype(ml_dtypes.bfloat16)
            elif conds.ndim <= 3:
                conds = jnp.asarray(conds)

        out: Dict[str, jax.Array] = {"gt": xs}
        for task in tasks:
            rng, r_t = jax.random.split(rng)
            if task == "prediction":
                hg = HistoryGuidance.from_config(
                    self.prediction_hg_cfg, timesteps=self.dcfg.timesteps
                )
                interp_hg = HistoryGuidance.from_config(
                    self.interpolation_hg_cfg, timesteps=self.dcfg.timesteps
                )
                out[task] = self.rollout.predict_videos(
                    variables, r_t, xs, nct, conds,
                    prediction_hg=hg, interpolation_hg=interp_hg,
                )
            elif task == "interpolation":
                hg = HistoryGuidance.from_config(
                    self.interpolation_hg_cfg, timesteps=self.dcfg.timesteps
                )
                out[task] = self.rollout.interpolate_videos(
                    variables, r_t, xs, None, conds, history_guidance=hg
                )
            else:
                raise ValueError(f"unknown task {task}")
        return out


class DFoTVideoPoseAlgo(DFoTVideoAlgo):
    """Camera-pose conditioned DFoT (reference: dfot_video_pose.py)."""

    is_pose_conditioned = True

    def __init__(self, cfg: Config, compute_dtype=jnp.bfloat16):
        if cfg.backbone.name not in ("dit3d_pose", "u_vit3d_pose"):
            raise ValueError(
                "pose-conditioned DFoT requires a pose backbone, got "
                f"{cfg.backbone.name}"
            )
        super().__init__(cfg, compute_dtype)

    def process_conditions(self, conditions, noise_levels=None):
        if conditions is None:
            return None
        cpc = self.cfg.camera_pose_conditioning
        interp_mask = None
        if (
            noise_levels is not None
            and self.prediction_hg_cfg.name == "temporal"
        ):
            interp_mask = np.asarray(noise_levels) == self.dcfg.timesteps - 1
        if cpc.type == "global":
            return process_camera_conditions(
                np.asarray(conditions, dtype=np.float32),
                conditioning_type="global",
                normalize_by=cpc.normalize_by,
                bound=cpc.get("bound"),
                interpolation_mask=interp_mask,
            )
        # ray formats: only the sequence-level normalization happens on host
        # (fp32 quaternion math); the per-pixel expansion to ray / plucker /
        # ray-encoding maps runs ON DEVICE inside the jitted sampler and
        # train step (_cond_transform) — the compact (B, T, 16) vectors are
        # all the rollout ever copies or uploads
        return normalize_camera_conditions(
            np.asarray(conditions, dtype=np.float32),
            normalize_by=cpc.normalize_by,
            bound=cpc.get("bound"),
            interpolation_mask=interp_mask,
        )

    def _pose_resolution(self) -> int:
        return self.cfg.x_shape[1] if not self.is_latent else self.x_shape[0]

    def _cond_transform(self):
        cpc = self.cfg.camera_pose_conditioning
        if cpc.type == "global":
            return None
        ctype, res, dtype = cpc.type, self._pose_resolution(), self.compute_dtype

        def expand(cond):
            return expand_pose_conditions_jax(cond, ctype, res).astype(dtype)

        return expand

    def _sampling_cond_transform(self):
        expand = self._cond_transform()
        if expand is None:
            return None
        from ..models.uvit import UViT3DPose, precompute_pose_conditioning

        if not isinstance(self.model, UViT3DPose):
            return expand

        def expand_precompute(cond, variables):
            # ray maps -> per-block FiLM pose projections, once per window
            # (step-invariant; ~25 ms/step of the flagship forward if left
            # inside the scan — models/uvit.py:precompute_pose_conditioning)
            return precompute_pose_conditioning(self.model, variables, expand(cond))

        return expand_precompute

    def _dummy_condition(self, B, T):
        res = self.cfg.x_shape[1] if not self.is_latent else self.x_shape[0]
        return jnp.zeros(
            (B, T, res, res, conditioning_dim(self.cfg.camera_pose_conditioning.type))
        )


def build_algorithm(cfg: Config, compute_dtype=jnp.bfloat16):
    """Algorithm registry (reference: algorithms/__init__.py)."""
    name = cfg.algorithm.get("_name", "dfot_video")
    algo_cfg = cfg.algorithm
    # "sd_video*" = the standard-diffusion baselines, same classes with
    # full-sequence noise + fixed context (reference registry,
    # experiments/video_generation.py:25-26)
    if name in ("dfot_video", "gibbs_dfot_video", "sd_video"):
        return DFoTVideoAlgo(algo_cfg, compute_dtype)
    if name in ("dfot_video_pose", "sd_video_3d"):
        return DFoTVideoPoseAlgo(algo_cfg, compute_dtype)
    if name == "difference_dfot_video":
        from .difference_dfot import DifferenceDFoTVideoAlgo

        return DifferenceDFoTVideoAlgo(algo_cfg, compute_dtype)
    raise NotImplementedError(f"algorithm {name!r} not yet available")
