"""Experiment registry (reference: experiments/__init__.py:13-40)."""

from typing import Optional

from ..config import Config
from .video_generation import VideoGenerationExperiment


def build_experiment(cfg: Config, output_dir: Optional[str] = None, load: Optional[str] = None):
    name = cfg.experiment.get("_name", "video_generation")
    if name == "video_generation":
        return VideoGenerationExperiment(cfg, output_dir, load)
    if name == "video_latent_preprocessing":
        from .video_latent_preprocessing import VideoLatentPreprocessingExperiment

        return VideoLatentPreprocessingExperiment(cfg, output_dir, load)
    if name == "video_latent_learning":
        from .video_latent_learning import VideoLatentLearningExperiment

        return VideoLatentLearningExperiment(cfg, output_dir, load)
    raise ValueError(f"unknown experiment {name!r}")
