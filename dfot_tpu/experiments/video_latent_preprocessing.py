"""Latent preprocessing: encode every video to fp16 latents on disk.

Reference flow (experiments/video_latent_preprocessing.py +
algorithms/vae/*/preprocessor.py): run the VAE encoder over each full video,
sample the posterior, save per-video latents, skip finished ones; afterwards
compute channel-wise latent stats for the dataset config.
"""

from __future__ import annotations

import os
from typing import Optional

import jax
import jax.numpy as jnp
import numpy as np

from ..config import Config
from ..data.video_dataset import VideoDataset
from ..utils.logging import MetricsLogger
from ..vae import ImageVAE, ImageVAEConfig, VideoVAE, VideoVAEConfig, estimate_latent_stats

__all__ = ["VideoLatentPreprocessingExperiment"]


def _local_diffusers_weights(name_or_path: Optional[str]) -> Optional[str]:
    """Resolve pretrained_model_name_or_path to a local weights file when it
    points at a diffusers checkpoint on disk (HF hub names need egress)."""
    if not name_or_path:
        return None
    p = str(name_or_path)
    if os.path.isfile(p):
        return p
    if os.path.isdir(p):
        for fname in (
            "diffusion_pytorch_model.safetensors",
            "diffusion_pytorch_model.bin",
        ):
            cand = os.path.join(p, fname)
            if os.path.exists(cand):
                return cand
    return None


class VideoLatentPreprocessingExperiment:
    def __init__(self, cfg: Config, output_dir: Optional[str] = None, load: Optional[str] = None):
        self.cfg = cfg
        self.output_dir = output_dir or "outputs"
        os.makedirs(self.output_dir, exist_ok=True)
        self.load_path = load
        self.logger = MetricsLogger(self.output_dir)
        self.max_encode_length = cfg.algorithm.get("max_encode_length", 16)
        self._build_vae()

    def _restore_params(self, pretrained: Optional[str], importer) -> bool:
        """Load weights (priority: explicit ``load=`` checkpoint, then a
        torch checkpoint through ``importer``). Returns False when the VAE
        keeps its random init."""
        if self.load_path:
            from ..training.checkpoint import restore_checkpoint

            restored = restore_checkpoint(self.load_path)
            self.variables = {"params": restored.get("params", restored)}
            return True
        if pretrained:
            from ..utils.torch_ckpt import load_state_dict

            self.variables = {"params": importer(load_state_dict(pretrained))}
            return True
        return False

    def _mode_encode(self):
        """Posterior-MODE encode closure (titok / kl_autoencoder)."""

        def encode(variables, x, rng):
            posterior = self.vae.apply(variables, x, method=self.vae.encode)
            return posterior.mode()

        return jax.jit(encode)

    def _build_vae(self):
        acfg = self.cfg.algorithm
        name = acfg.get("_name", "image_vae_preprocessor")
        rng = jax.random.PRNGKey(0)
        self.is_deterministic = False
        self.normalize_input = True
        if "titok" in name:
            # frozen TiTok-KL preprocessor (reference tiktok_kl/preprocessor.py):
            # posterior MODE latents, videos kept in [0, 1] (:134-136)
            from ..vae import TiTokConfig, TiTokKL, import_titok_params

            self.vae_cfg = TiTokConfig.from_config(acfg)
            self.vae = TiTokKL(self.vae_cfg)
            s = self.vae_cfg.image_size
            x = jnp.zeros((1, s, s, 3))
            self.is_video_vae = False
            self.normalize_input = False
            self.variables = self.vae.init(rng, x, rng)
            self._restore_params(acfg.get("pretrained_path"), import_titok_params)
            self._encode = self._mode_encode()
            return
        if "kl_autoencoder" in name:
            # frozen diffusers kl-f8 preprocessor (reference
            # autoencoder_kl/preprocessor.py:66-70): posterior MODE latents
            from ..vae import KL_F8_CONFIG, AutoencoderKL, import_diffusers_vae_params

            self.vae_cfg = (
                ImageVAEConfig.from_config(acfg)
                if acfg.get("ddconfig") is not None
                else KL_F8_CONFIG
            )
            self.vae = AutoencoderKL(self.vae_cfg)
            s = self.vae_cfg.resolution
            x = jnp.zeros((1, s, s, 3))
            self.is_video_vae = False
            self.variables = self.vae.init(rng, x, rng, method=None)
            # the reference loads from the HF hub name
            # (pretrained_model_name_or_path, preprocessor.py:21-32); in the
            # zero-egress environment that only works when it points at a
            # LOCAL diffusers checkpoint file/directory
            pretrained = acfg.get("pretrained_path") or _local_diffusers_weights(
                acfg.get("pretrained_model_name_or_path")
            )
            if not self._restore_params(pretrained, import_diffusers_vae_params):
                print(
                    "WARNING: kl_autoencoder preprocessor has NO weights "
                    "(pretrained_path unset and pretrained_model_name_or_path "
                    "is not a local checkpoint) — latents will come from a "
                    "randomly initialized VAE. Point "
                    "algorithm.pretrained_path at a diffusers "
                    "sd-vae-ft-* checkpoint before real preprocessing."
                )
            self._encode = self._mode_encode()
            return
        if "video" in name:
            self.vae_cfg = VideoVAEConfig.from_config(acfg)
            self.vae = VideoVAE(self.vae_cfg)
            x = jnp.zeros((1, 5, self.vae_cfg.resolution, self.vae_cfg.resolution, 3))
            self.is_video_vae = True
        elif "dc_ae" in name:
            # frozen DC-AE preprocessor (reference dc_ae_preprocessor.yaml):
            # deterministic latents, torch safetensors importable
            from ..vae import DCAE, DCAEConfig

            self.vae_cfg = DCAEConfig.from_config(acfg)
            self.vae = DCAE(self.vae_cfg)
            res = 2 * self.vae_cfg.spatial_compression
            x = jnp.zeros((1, res, res, 3))
            self.is_video_vae = False
            self.is_deterministic = True
        else:
            self.vae_cfg = ImageVAEConfig.from_config(acfg)
            self.vae = ImageVAE(self.vae_cfg)
            x = jnp.zeros((1, self.vae_cfg.resolution, self.vae_cfg.resolution, 3))
            self.is_video_vae = False
        if self.is_deterministic:
            self.variables = self.vae.init(rng, x)
        else:
            self.variables = self.vae.init(rng, x, rng, method=None)
        if "dc_ae" in name:
            from ..vae import import_dc_ae_params

            self._restore_params(acfg.get("pretrained_path"), import_dc_ae_params)
        else:
            self._restore_params(None, None)  # load= checkpoint only

        def encode(variables, x, rng):
            if self.is_deterministic:
                return self.vae.apply(variables, x, method=self.vae.encode)
            posterior = self.vae.apply(variables, x, method=self.vae.encode)
            return posterior.sample(rng)

        self._encode = jax.jit(encode)

    def exec_task(self, task: str) -> None:
        if task != "validation":
            raise ValueError("latent preprocessing runs as a validation task")
        self.validation()

    def validation(self) -> None:
        dcfg = self.cfg.dataset
        for split in ("training", "validation"):
            try:
                dataset = VideoDataset(dcfg, split)
            except FileNotFoundError:
                continue
            latent_dir = os.path.join(
                f"{dcfg.save_dir}_latent_{dcfg.resolution}", split
            )
            os.makedirs(latent_dir, exist_ok=True)
            rng = jax.random.PRNGKey(0)
            done = 0
            for meta in dataset.metadata:
                base = os.path.splitext(os.path.basename(meta["path"]))[0]
                out_path = os.path.join(latent_dir, base + ".npy")
                if os.path.exists(out_path):
                    continue
                video = dataset._load_video(meta, 0, meta["length"])
                rng, r = jax.random.split(rng)
                latent = self._encode_video(video, r)
                np.save(out_path, latent.astype(np.float16))
                done += 1
            self.logger.log({f"{split}/videos_encoded": done}, 0)

            # channel-wise stats for the dataset config
            paths = [
                os.path.join(latent_dir, f)
                for f in sorted(os.listdir(latent_dir))
                if f.endswith(".npy")
            ]
            if paths:
                mean, std = estimate_latent_stats(paths)
                np.save(os.path.join(latent_dir, "data_mean.npy"), mean)
                np.save(os.path.join(latent_dir, "data_std.npy"), std)

    def _encode_video(self, video: np.ndarray, rng: jax.Array) -> np.ndarray:
        """video (T, H, W, C) in [0, 1] -> latents; chunked to bound memory."""
        x = jnp.asarray(video)
        if self.normalize_input:
            x = x * 2.0 - 1.0
        chunks = []
        if self.is_video_vae:
            f = self.vae_cfg.temporal_downsampling_factor
            step = 1 + (self.max_encode_length - 1) // f * f
            t = 0
            while t < x.shape[0]:
                seg = x[t : t + step]
                n = (seg.shape[0] - 1) // f * f + 1  # valid causal length
                rng, r = jax.random.split(rng)
                chunks.append(np.asarray(self._encode(self.variables, seg[None, :n], r))[0])
                t += n
        else:
            for t in range(0, x.shape[0], self.max_encode_length):
                seg = x[t : t + self.max_encode_length]
                rng, r = jax.random.split(rng)
                chunks.append(np.asarray(self._encode(self.variables, seg, r)))
        return np.concatenate(chunks, axis=0)
