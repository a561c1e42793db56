"""Video-generation experiment: the training/validation driver.

Replaces the reference's HF-Accelerate loop
(experiments/simple_video_generation.py:152-514) with a thin host loop
around the jitted train_step / sampler: mesh setup, batch tokenization +
normalization, gradient accumulation, EMA, periodic loss logging, step-dir
checkpoints with top-k pruning, periodic validation with sampled-video
logging and metrics.
"""

from __future__ import annotations

import os
import time
from typing import Dict, Optional

import jax
import jax.numpy as jnp
import numpy as np

from ..algorithms.dfot_video import build_algorithm
from ..config import Config
from ..data.loader import DataLoader
from ..data.video_dataset import build_dataset
from ..parallel import make_mesh, shard_batch
from ..training.checkpoint import (
    latest_checkpoint,
    restore_checkpoint,
    save_checkpoint,
    wait_for_checkpoints,
)
from ..utils.logging import MetricsLogger, log_video

__all__ = ["VideoGenerationExperiment"]


class VideoGenerationExperiment:
    """Orchestrates training and validation for DFoT video models."""

    def __init__(self, cfg: Config, output_dir: Optional[str] = None, load: Optional[str] = None):
        self.cfg = cfg
        self.output_dir = output_dir or str(cfg.get("output_dir", "outputs"))
        os.makedirs(self.output_dir, exist_ok=True)
        self.ckpt_dir = os.path.join(self.output_dir, "checkpoints")
        self.load_path = load
        self.algo = build_algorithm(cfg)
        self._codec = None
        if self.algo.is_latent:
            from ..vae.codec import LatentCodec

            self._codec = LatentCodec(cfg.algorithm, cfg.dataset)
        self.logger = MetricsLogger(
            self.output_dir,
            cfg.get("wandb").to_dict() if cfg.get("wandb") else None,
            name=str(cfg.get("name", "")),
        )

    # ------------------------------------------------------------------
    def exec_task(self, task: str) -> None:
        if task == "training":
            self.training()
        elif task in ("validation", "test"):
            self.validation(namespace=task)
        else:
            raise ValueError(f"unknown task {task}")

    # ------------------------------------------------------------------
    # batch -> model tokens (reference on_after_batch_transfer,
    # base_pytorch_video_algo.py:93-137)
    # ------------------------------------------------------------------
    def _tokenize_batch(self, batch: Dict[str, np.ndarray]) -> Dict:
        algo = self.algo
        if algo.is_latent:
            if "latents" in batch:
                xs = batch["latents"]
            elif str(self.cfg.dataset.latent.type) == "online":
                # online VAE tokenization (reference on_after_batch_transfer,
                # base_pytorch_video_algo.py:93-137)
                self._rng_codec, r = jax.random.split(
                    getattr(self, "_rng_codec", jax.random.PRNGKey(7))
                )
                xs = self._codec.encode_video(batch["videos"], r)
            else:
                raise FileNotFoundError(
                    "pre-sampled latents missing; run "
                    "experiment=video_latent_preprocessing first"
                )
        else:
            xs = batch["videos"]
        if jax.process_count() > 1:
            # multi-host: keep the local rows on HOST — shard_batch assembles
            # the global device array from host memory
            # (make_array_from_process_local_data), so normalizing on device
            # here would just force a D2H round trip per step. numpy
            # broadcasting computes the same (x - mean) / std.
            xs = np.asarray(xs)
            if algo.data_mean is not None:
                xs = (xs - np.asarray(algo.data_mean)) / np.asarray(algo.data_std)
            masks = np.asarray(batch["nonterminal"])
        else:
            xs = algo.normalize(jnp.asarray(xs))
            masks = jnp.asarray(batch["nonterminal"])
        conds = batch.get("conds")
        # frame -> token conversion under temporal compression (token i maps
        # to frames ((i-1)*f, i*f]; reference _n_frames_to_n_tokens contract)
        f = algo.temporal_downsampling
        if f > 1:
            if masks.shape[1] != xs.shape[1]:
                masks = masks[:, ::f]
            if conds is not None and np.ndim(conds) > 1 and conds.shape[1] != xs.shape[1]:
                conds = conds[:, ::f]
        out = {"xs": xs, "masks": masks}
        if conds is not None:
            out["conditions"] = conds
        if "videos" in batch:
            out["gt_videos"] = batch["videos"]
        return out

    # ------------------------------------------------------------------
    def training(self) -> None:
        cfg, algo = self.cfg, self.algo
        tcfg = cfg.experiment.training
        accumulate = tcfg.optim.get("accumulate_grad_batches", 1)

        # sub-epoch resumable data: with subdataset_size set, each epoch is a
        # deterministic slice of a seeded global shuffle (reference
        # resumable_data_module.py:14-54)
        sub = cfg.dataset.get("subdataset_size")
        use_subdataset = isinstance(sub, int)

        # multi-host: each host loads only its 1/P slice of the global batch
        # (reference per-rank DDP dataloaders); shard_batch reassembles the
        # global device array from the per-host rows
        n_proc = jax.process_count()
        local_batch = tcfg.batch_size
        process_shard = None
        if n_proc > 1:
            assert tcfg.batch_size % n_proc == 0, (
                f"batch_size {tcfg.batch_size} must divide over "
                f"{n_proc} processes"
            )
            local_batch = tcfg.batch_size // n_proc
            process_shard = (jax.process_index(), n_proc)

        def make_loader(epoch: int):
            from ..data.loader import make_loader as _make

            dataset = build_dataset(
                cfg.dataset, "training",
                current_epoch=epoch if use_subdataset else None,
            )
            return _make(
                dataset,
                batch_size=local_batch,
                shuffle=tcfg.data.get("shuffle", True),
                seed=tcfg.get("manual_seed", 0),
                num_workers=tcfg.data.get("num_workers", 0) or 0,
                process_shard=process_shard,
            )

        loader = make_loader(0)

        # data axis must divide the global batch; spare devices go to fsdp.
        # experiment.training.mesh.tensor > 1 reserves a tensor-parallel axis
        # (Megatron specs in parallel/mesh.py); mesh.sequence_parallel routes
        # big attentions through ring attention over that axis.
        import math

        mesh_cfg = tcfg.get("mesh", {}) or {}
        tp = int(mesh_cfg.get("tensor", 1) or 1)
        ndev = len(jax.devices())
        if ndev % tp != 0:
            raise ValueError(
                f"mesh.tensor={tp} does not divide {ndev} devices"
            )
        avail = ndev // tp
        data_axis = math.gcd(tcfg.batch_size, avail)
        shape = (data_axis, avail // data_axis) + ((tp,) if tp > 1 else ())
        mesh = self.mesh = make_mesh(shape)
        if mesh_cfg.get("sequence_parallel", False):
            from ..ops.attention import set_sequence_parallel

            if tp <= 1:
                raise ValueError("mesh.sequence_parallel needs mesh.tensor > 1")
            set_sequence_parallel(mesh, "tensor")
        rng = jax.random.PRNGKey(tcfg.get("manual_seed", 0))
        rng, r_init = jax.random.split(rng)
        state = algo.make_train_state(
            r_init,
            accumulate_steps=accumulate,
            num_training_steps=tcfg.max_steps if tcfg.max_steps > 0 else None,
            grad_clip=tcfg.optim.get("gradient_clip_val", 1.0) or 0.0,
        )
        train_step = algo.make_train_step(
            ema_decay=cfg.experiment.ema.get("decay", 0.9999),
            accumulate_steps=accumulate,
        )

        # resume
        resume_path = self.load_path or latest_checkpoint(self.ckpt_dir)
        if resume_path and (
            str(resume_path).startswith("pretrained:")
            or str(resume_path).endswith((".ckpt", ".pt", ".pth", ".safetensors"))
        ):
            # warm-start from imported torch weights (fresh optimizer)
            params = self._load_eval_params()
            state = state.replace(
                params=params,
                ema_params=jax.tree_util.tree_map(jnp.copy, params),
            )
            resume_path = None
        if resume_path:
            restored = restore_checkpoint(
                resume_path,
                {
                    "params": state.params,
                    "opt_state": state.opt_state,
                    "step": np.asarray(0),
                    **(
                        {"ema_params": state.ema_params}
                        if state.ema_params is not None
                        else {}
                    ),
                },
            )
            state = state.replace(
                params=restored["params"],
                opt_state=restored["opt_state"],
                step=jnp.asarray(int(restored["step"])),
                ema_params=restored.get("ema_params", state.ema_params),
            )

        max_steps = tcfg.max_steps if tcfg.max_steps > 0 else None
        max_epochs = (
            tcfg.max_epochs
            if tcfg.max_epochs is not None and tcfg.max_epochs > 0
            else None
        )
        ckpt_every = tcfg.checkpointing.get("every_n_train_steps") or 0
        save_top_k = tcfg.checkpointing.get("save_top_k", 3)
        loss_freq = cfg.algorithm.logging.get("loss_freq", 100)

        # in-training validation: denoising loss on held-out batches using
        # EMA weights (reference run_validation, validate_sample=False)
        vcfg_val = cfg.experiment.validation
        val_every = vcfg_val.get("val_every_n_step")
        val_every = val_every if isinstance(val_every, int) and val_every > 1 else 0
        val_epoch_every = vcfg_val.get("val_every_n_epoch") or 0
        val_loader = None
        eval_denoise_fn = None
        if val_every or val_epoch_every:
            try:
                val_dataset = build_dataset(cfg.dataset, "validation")
                # batch_size is GLOBAL (same convention as training)
                val_loader = DataLoader(
                    val_dataset, max(vcfg_val.batch_size // n_proc, 1),
                    shuffle=False, drop_last=False,
                    process_shard=process_shard,
                )
                eval_denoise_fn = algo.make_eval_denoise()
            except FileNotFoundError:
                val_every = 0
                val_epoch_every = 0
        # how many val batches per mid-training pass (reference limit_batch,
        # simple_video_generation.py:397)
        val_limit = vcfg_val.get("limit_batch")
        val_limit = val_limit if isinstance(val_limit, int) and val_limit > 0 else 4
        # validate_sample: also sample videos + score metrics mid-training
        # (reference run_validation's validate_sample path,
        # simple_video_generation.py:385-514; its training loop defaults this
        # off at line 315 — opt in via experiment.validation.validate_sample)
        val_sample = bool(vcfg_val.get("validate_sample"))
        max_vis = cfg.algorithm.logging.get("max_num_videos", 8)

        def run_mid_validation(at_step: int) -> None:
            if val_loader is None:
                return
            losses = []
            eval_params = (
                state.ema_params if state.ema_params is not None else state.params
            )
            nonlocal rng
            sample_batch = None
            for j, vb in enumerate(val_loader):
                if j >= val_limit:
                    break
                vt = self._tokenize_batch(vb)
                vt.pop("gt_videos", None)
                if "conditions" in vt:
                    vt["conditions"] = jnp.asarray(
                        algo.process_conditions(vt["conditions"])
                    )
                rng, r_v = jax.random.split(rng)
                loss, recons = eval_denoise_fn(eval_params, vt, r_v)
                losses.append(float(loss))
                if j == 0:
                    sample_batch = vb
                    # denoising-vis panel: one-step x0 reconstruction | gt
                    # (reference *_denoising_vis, simple_video_generation.py:434-445)
                    vis = algo.unnormalize(recons[:max_vis])
                    gt = algo.unnormalize(vt["xs"][:max_vis])
                    if algo.is_latent:
                        vis = self._codec.decode_video(vis)
                        gt = (
                            jnp.asarray(vb["videos"][:max_vis])
                            if "videos" in vb
                            else self._codec.decode_video(gt)
                        )
                    log_video(
                        np.asarray(vis), np.asarray(gt),
                        os.path.join(
                            self.output_dir, "videos",
                            f"denoising_vis_step{at_step}.gif",
                        ),
                        context_frames=0,
                    )
            if losses:
                if jax.process_count() > 1:
                    # reference gathers per-rank losses before averaging
                    # (simple_video_generation.py:422-430)
                    from ..parallel import gather_for_metrics

                    losses = list(
                        gather_for_metrics(
                            {"l": np.asarray(losses, np.float32)}
                        )["l"].ravel()
                    )
                self.logger.log({"validation/loss": float(np.mean(losses))}, at_step)
            if val_sample and sample_batch is not None:
                self._score_sampled_batch(
                    eval_params, sample_batch, at_step, max_vis
                )


        step = step0 = int(state.step)
        t_start = time.time()
        epoch = 0
        with mesh:
            done = False
            while not done:
                for batch in loader:
                    tokens = self._tokenize_batch(batch)
                    tokens.pop("gt_videos", None)
                    if "conditions" in tokens:
                        tokens["conditions"] = jnp.asarray(
                            algo.process_conditions(tokens["conditions"])
                        )
                    tokens = shard_batch(tokens, mesh)
                    rng, r_step = jax.random.split(rng)
                    # jax.profiler trace of a few post-warmup steps
                    # (TPU-native counterpart of the reference's per-step
                    # timing logs; experiment.training.profile_dir)
                    profile_dir = tcfg.get("profile_dir")
                    if profile_dir and step == tcfg.get("profile_at_step", 10):
                        from ..utils.profiling import trace

                        with trace(profile_dir):
                            state, metrics = train_step(state, tokens, r_step)
                            jax.block_until_ready(metrics["loss"])
                    else:
                        state, metrics = train_step(state, tokens, r_step)
                    # host-side step counter (state.step increments by exactly
                    # 1 per call): an int(state.step) here would block on the
                    # device every step and serialize host batch prep with
                    # device compute — counting locally keeps dispatch async
                    step += 1

                    if step % max(loss_freq, 1) == 0:
                        m = {k: float(v) for k, v in metrics.items()}
                        m["steps_per_sec"] = (step - step0) / max(
                            time.time() - t_start, 1e-9
                        )
                        self.logger.log(m, step)
                    if ckpt_every and step % ckpt_every == 0:
                        # async: IO overlaps the next steps (the D2H copy
                        # inside save() is synchronous, so donating the state
                        # to the next train_step is safe)
                        save_checkpoint(
                            self.ckpt_dir, step, state, save_top_k, block=False
                        )
                    if val_every and step % val_every == 0:
                        run_mid_validation(step)
                    if max_steps is not None and step >= max_steps:
                        done = True
                        break
                epoch += 1
                # epoch-based cadences (reference val_every_n_epoch /
                # checkpointing.every_n_epochs)
                if val_epoch_every and not done and epoch % val_epoch_every == 0:
                    run_mid_validation(step)
                ckpt_epochs = tcfg.checkpointing.get("every_n_epochs") or 0
                if ckpt_epochs and not done and epoch % ckpt_epochs == 0:
                    save_checkpoint(
                        self.ckpt_dir, step, state, save_top_k, block=False
                    )
                if use_subdataset and not done:
                    loader = make_loader(epoch)
                if max_epochs is not None and epoch >= max_epochs:
                    done = True
        wait_for_checkpoints()
        save_checkpoint(self.ckpt_dir, step, state, save_top_k)
        self.state = state

    # ------------------------------------------------------------------
    def validation(self, namespace: str = "validation") -> None:
        cfg = self.cfg
        vcfg = cfg.experiment.validation
        # val_all_ckpt: sweep every checkpoint_<step>/ dir under load= (or
        # this run's own checkpoints) — reference val_all_ckpt
        if vcfg.get("val_all_ckpt"):
            sweep = str(self.load_path) if self.load_path else self.ckpt_dir
            if os.path.isdir(os.path.join(sweep, "checkpoints")):
                sweep = os.path.join(sweep, "checkpoints")
            ckpts = sorted(
                (d for d in os.listdir(sweep) if d.startswith("checkpoint_")),
                key=lambda d: int(d.split("_")[1]),
            ) if os.path.isdir(sweep) else []
            if not ckpts:
                raise FileNotFoundError(
                    f"val_all_ckpt: no checkpoint_<step> dirs under {sweep}"
                )
            for ckpt in ckpts:
                self.load_path = os.path.join(sweep, ckpt)
                step = int(ckpt.split("_")[1])
                self._validate_once(f"{namespace}/step_{step}")
            return
        self._validate_once(namespace)
        # extra validation passes (reference data_modules/base_data_module.py
        # :103-144 — history-free repeats with 0 context tokens; optionally
        # also score the training split)
        has_context = self.algo.n_context_tokens > 0
        if vcfg.get("validate_history_free") and has_context:
            self._validate_once(f"{namespace}_history_free", n_context_override=0)
        if vcfg.get("validate_training_set"):
            self._validate_once("val_on_training", split="training")
            if vcfg.get("validate_history_free") and has_context:
                self._validate_once(
                    "val_on_training_history_free", split="training",
                    n_context_override=0,
                )

    def _score_sampled_batch(
        self, params, batch, at_step: int, max_vis: int = 8
    ) -> None:
        """Mid-training sampled validation: generate videos for one val batch
        with the EMA weights, score the configured metric suite, and log GIFs
        (reference run_validation's validate_sample path,
        simple_video_generation.py:446-514 + update_metrics/log)."""
        from ..metrics import SharedMetricModelRegistry, VideoMetric

        cfg, algo = self.cfg, self.algo
        tokens = self._tokenize_batch(batch)
        rng = jax.random.PRNGKey(at_step)
        videos = algo.sample_videos(
            params, rng, tokens["xs"], conditions=batch.get("conds")
        )
        videos = {k: algo.unnormalize(v) for k, v in videos.items()}
        if algo.is_latent:
            videos = {
                k: (
                    jnp.asarray(batch["videos"])
                    if k == "gt" and "videos" in batch
                    else self._codec.decode_video(v)
                )
                for k, v in videos.items()
            }
        # multi-host: score the global batch once (reference
        # accelerator.gather_for_metrics semantics)
        if jax.process_count() > 1:
            from ..parallel import gather_for_metrics, is_rank_zero

            videos = gather_for_metrics(videos)
            if not is_rank_zero():
                return
        gt = np.asarray(videos["gt"])
        B, T = gt.shape[:2]
        nct = algo.n_context_tokens
        metric_types = tuple(cfg.algorithm.logging.get("metrics", ["mse", "psnr"]))
        # the registry caches frozen eval models; rebuild-per-call would
        # reload weights and re-jit every validation tick
        if not hasattr(self, "_mid_val_registry"):
            self._mid_val_registry = SharedMetricModelRegistry(
                weights_dir=cfg.algorithm.logging.get("metrics_weights_dir")
            )
        registry = self._mid_val_registry
        results: Dict[str, float] = {}
        for task, vid in videos.items():
            if task == "gt":
                continue
            ctx = np.zeros((B, T), dtype=bool)
            if task.startswith("interpolation"):
                ctx[:, [0, -1]] = True
            else:
                ctx[:, :nct] = True
            vm = VideoMetric(
                metric_types, registry,
                n_metrics_frames=cfg.algorithm.logging.get("n_metrics_frames"),
            )
            vm.update(np.asarray(vid)[:max_vis], gt[:max_vis], ctx[:max_vis])
            results.update(vm.log(f"validation/{task}"))
            log_video(
                np.asarray(vid)[:max_vis], gt[:max_vis],
                os.path.join(
                    self.output_dir, "videos",
                    f"{task}_validation_step{at_step}.gif",
                ),
                context_frames=nct,
            )
        if results:
            self.logger.log(results, at_step)

    def _validate_once(
        self,
        namespace: str = "validation",
        split: str = "validation",
        n_context_override: Optional[int] = None,
    ) -> None:
        cfg, algo = self.cfg, self.algo
        vcfg = cfg.experiment.validation
        # multi-chip sampling: shard the NFE-expanded denoiser batch over all
        # devices (no effect on a single chip). validation.mesh.tensor splits
        # off a tensor axis; validation.mesh.sequence_parallel additionally
        # ring-shards big attention windows over it — useful when the NFE
        # expansion alone can't fill the mesh (e.g. vanilla HG's NFE=2 on 8
        # chips)
        ndev = len(jax.devices())
        if ndev > 1 and hasattr(algo, "set_sampling_mesh"):
            mesh_cfg = vcfg.get("mesh", {}) or {}
            tp = int(mesh_cfg.get("tensor", 1) or 1)
            if ndev % tp != 0:
                raise ValueError(f"mesh.tensor={tp} does not divide {ndev}")
            shape = (ndev // tp, 1) + ((tp,) if tp > 1 else ())
            mesh = make_mesh(shape)
            if mesh_cfg.get("sequence_parallel", False):
                from ..ops.attention import set_sequence_parallel

                if tp <= 1:
                    raise ValueError(
                        "mesh.sequence_parallel needs mesh.tensor > 1"
                    )
                set_sequence_parallel(mesh, "tensor")
            algo.set_sampling_mesh(mesh)
        # the sequence-parallel context is trace-time global: restore it
        # after validation so later re-traces (e.g. mid-training validation
        # followed by more training) don't inherit the sampling mesh
        from ..ops import attention as _att

        prior_sp = _att._SEQUENCE_PARALLEL
        try:
            return self._validate_once_body(
                namespace, split, n_context_override
            )
        finally:
            _att._SEQUENCE_PARALLEL = prior_sp

    def _validate_once_body(
        self,
        namespace: str = "validation",
        split: str = "validation",
        n_context_override: Optional[int] = None,
    ) -> None:
        cfg, algo = self.cfg, self.algo
        vcfg = cfg.experiment.validation
        nct = (
            n_context_override
            if n_context_override is not None
            else algo.n_context_tokens
        )
        dataset = build_dataset(cfg.dataset, split)
        # multi-host: each host scores a disjoint shard; gather_for_metrics
        # below reassembles the global batch on rank zero (reference
        # per-rank DDP val loaders + accelerator.gather_for_metrics).
        # batch_size is GLOBAL — same convention as training
        n_proc = jax.process_count()
        loader = DataLoader(
            dataset, batch_size=max(vcfg.batch_size // n_proc, 1),
            shuffle=False, drop_last=False,
            process_shard=(jax.process_index(), n_proc) if n_proc > 1 else None,
        )

        params = self._load_eval_params()
        rng = jax.random.PRNGKey(vcfg.get("manual_seed", 0))

        limit = vcfg.get("limit_batch")
        n_batches = len(loader)
        if isinstance(limit, float):
            n_batches = max(int(n_batches * limit), 1)
        elif isinstance(limit, int) and limit > 0:
            n_batches = min(n_batches, limit)

        max_videos = cfg.algorithm.logging.get("max_num_videos", 8)
        num_logged = 0

        # metric suite with the shared frozen-model registry (reference
        # simple_video_generation.py:113-147)
        from ..metrics import SharedMetricModelRegistry, VideoMetric

        metric_types = tuple(cfg.algorithm.logging.get("metrics", ["mse", "psnr"]))
        registry = SharedMetricModelRegistry(
            weights_dir=cfg.algorithm.logging.get("metrics_weights_dir")
        )
        task_metrics: Dict[str, VideoMetric] = {}

        attn_cfg = cfg.algorithm.get("save_attn_map")
        for i, batch in enumerate(loader):
            if i >= n_batches:
                break
            tokens = self._tokenize_batch(batch)
            rng, r_s = jax.random.split(rng)
            if i == 0 and attn_cfg is not None and attn_cfg.get("enabled"):
                self._save_attention_maps(params, tokens, batch, attn_cfg)
            videos = algo.sample_videos(
                params,
                r_s,
                tokens["xs"],
                conditions=batch.get("conds"),
                n_context_tokens=nct,
            )
            videos = {k: algo.unnormalize(v) for k, v in videos.items()}
            if algo.is_latent:
                # decode latents to pixels for metrics/logging (reference
                # _decode, base_pytorch_video_algo.py:598-629); GT prefers the
                # original pixel videos when the batch carries them
                videos = {
                    k: (
                        jnp.asarray(batch["videos"])
                        if k == "gt" and "videos" in batch
                        else self._codec.decode_video(v)
                    )
                    for k, v in videos.items()
                }
            # multi-host eval: gather each host's videos before scoring, so
            # the metric suite sees the global batch (reference
            # accelerator.gather_for_metrics, simple_video_generation.py:422-452)
            if jax.process_count() > 1:
                from ..parallel import gather_for_metrics, is_rank_zero

                videos = gather_for_metrics(videos)
                if not is_rank_zero():
                    continue
            gt = np.asarray(videos["gt"])
            B, T = gt.shape[:2]
            for task, vid in videos.items():
                if task == "gt":
                    continue
                # per-task context frames: prediction conditions on the
                # prefix; interpolation on both endpoints (rollout
                # interpolate_videos default mask)
                ctx = np.zeros((B, T), dtype=bool)
                if task.startswith("interpolation"):
                    ctx[:, [0, -1]] = True
                else:
                    ctx[:, :nct] = True
                if task not in task_metrics:
                    task_metrics[task] = VideoMetric(
                        metric_types, registry,
                        n_metrics_frames=cfg.algorithm.logging.get(
                            "n_metrics_frames"
                        ),
                    )
                task_metrics[task].update(np.asarray(vid), gt, ctx)
                if num_logged < max_videos:
                    log_video(
                        np.asarray(vid),
                        gt,
                        os.path.join(
                            self.output_dir, "videos", f"{task}_{namespace}_{i}.gif"
                        ),
                        context_frames=nct,
                        raw_dir=cfg.algorithm.logging.get("raw_dir"),
                    )
            num_logged += gt.shape[0]

        results: Dict[str, float] = {}
        for task, vm in task_metrics.items():
            results.update(vm.log(f"{namespace}/{task}"))
        return self._finish_validation(results, namespace)

    def _save_attention_maps(self, params, tokens, batch, attn_cfg) -> None:
        """Capture per-layer attention heatmaps on one denoiser forward at a
        few noise levels (reference attn_hook/hook.py:15-149; enabled by
        ``algorithm.save_attn_map.enabled``)."""
        from ..diffusion import core as dc
        from ..ops.attention import set_attention_capture
        from ..utils.attn_capture import capture_attention_maps, save_attention_heatmaps

        algo = self.algo
        out_dir = attn_cfg.get("attn_map_dir") or os.path.join(
            self.output_dir, "attn_maps"
        )
        xs = jnp.asarray(tokens["xs"][:1])
        conds = algo.process_conditions(batch.get("conds"))
        if conds is not None:
            conds = jnp.asarray(conds)[:1]
            ct = algo._cond_transform()
            if ct is not None:  # pose vectors -> device-side ray maps
                conds = ct(conds)
        rng = jax.random.PRNGKey(0)
        set_attention_capture(True)
        try:
            for t in (int(algo.dcfg.timesteps * 0.1), int(algo.dcfg.timesteps * 0.7)):
                k = jnp.full(xs.shape[:2], t, dtype=jnp.int32)
                noise = dc.clipped_normal(rng, xs.shape, algo.dcfg.clip_noise)
                x_t = dc.q_sample(algo.sched, xs, k, noise)
                _, maps = capture_attention_maps(
                    algo.model, algo._variables(params), x_t, k.astype(jnp.float32),
                    conds, None,
                )
                paths = save_attention_heatmaps(maps, out_dir, timestep=t)
            self.logger.log({"attn_maps_saved": float(len(paths))}, 0)
        finally:
            set_attention_capture(False)

    def _finish_validation(self, results, namespace):
        if results:
            self.logger.log(results, 0)
        self.last_metrics = results

    # ------------------------------------------------------------------
    def _load_eval_params(self):
        """Prefer EMA weights from the latest/loaded checkpoint
        (reference: ema.store/copy_to before validation). Torch checkpoints
        (.ckpt/.pt/.safetensors, incl. ``pretrained:NAME.ckpt``) are
        converted through the importer."""
        path = self.load_path or latest_checkpoint(self.ckpt_dir)
        if path is None:
            if hasattr(self, "state"):
                return self.state.ema_params or self.state.params
            # fresh init (sanity runs)
            return self.algo.init_params(jax.random.PRNGKey(0))["params"]
        if str(path).startswith("pretrained:"):
            # reference downloads from HF (ckpt_utils.py:111-121); zero-egress
            # hosts look under data/ckpts/
            path = os.path.join("data", "ckpts", str(path).split(":", 1)[1])
        if str(path).endswith((".ckpt", ".pt", ".pth", ".safetensors")):
            return self._import_torch_checkpoint(str(path))
        restored = restore_checkpoint(path)
        return restored.get("ema_params") or restored["params"]

    def _import_torch_checkpoint(self, path: str):
        from ..utils.torch_ckpt import (
            import_dit1d_params,
            import_dit3d_params,
            import_far_params,
            import_unet3d_params,
            import_uvit3d_params,
            load_state_dict,
            strip_checkpoint,
        )

        state = strip_checkpoint(load_state_dict(path))
        # continuous-diffusion checkpoints carry the FourierEmbedding's fixed
        # random freqs/phases as torch buffers (reference embeddings.py:
        # 100-102, noise_level_pos_embedding.timesteps.*) — install them so
        # imported models reproduce the checkpoint bit-for-bit instead of
        # using our deterministic re-draws
        import numpy as _np

        fr = {
            k: _np.asarray(v)
            for k, v in state.items()
            if k.endswith((".freqs", ".phases"))
        }
        if fr:
            buf = {
                name.rsplit(".", 1)[-1]: jnp.asarray(v) for name, v in fr.items()
            }
            self.algo._extra_cols = {
                "buffers": {"noise_emb": {"fourier": buf}}
            }
        bcfg = self.cfg.algorithm.backbone
        name = bcfg.name
        if name.startswith("dit3d") or name.startswith("difference_dit3d"):
            return import_dit3d_params(state)
        if name.startswith("u_vit3d"):
            return import_uvit3d_params(
                state,
                num_updown_blocks=tuple(bcfg.num_updown_blocks),
                num_levels=len(bcfg.channels),
                patch_size=bcfg.patch_size,
            )
        if name == "far_dit":
            return import_far_params(state)
        if name == "u_net3d":
            return import_unet3d_params(
                state,
                num_res_blocks=bcfg.num_res_blocks,
                num_levels=len(bcfg.dim_mults),
            )
        if name == "dit1d":
            return import_dit1d_params(state)
        raise NotImplementedError(f"torch import for backbone {name!r} not wired")
