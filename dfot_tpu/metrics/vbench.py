"""VBench-style video quality dimensions (quality-only suite).

Counterpart of the reference's VBench wrapper
(algorithms/common/metrics/video/vbench/vbench.py:21-144): per-dimension
scores normalized to [0, 1] and combined by a weighted mean.

Native dimensions (pure pixel/flow-proxy math — no pretrained
models needed): temporal_flickering, motion_smoothness, dynamic_degree.
Dimensions requiring frozen pretrained models (subject/background
consistency via DINO/CLIP, aesthetic via LAION, imaging quality via MUSIQ)
plug in through the shared registry when their weights are provided;
otherwise they are skipped and the weighted mean renormalizes over the
available dimensions.
"""

from __future__ import annotations

from typing import Dict, Optional, Sequence

import numpy as np

__all__ = ["VBenchQuality"]

# reference weights (vbench.py): dimension -> weight in the quality score
_WEIGHTS = {
    "subject_consistency": 1.0,
    "background_consistency": 1.0,
    "temporal_flickering": 1.0,
    "motion_smoothness": 1.0,
    "dynamic_degree": 0.5,
    "aesthetic_quality": 1.0,
    "imaging_quality": 1.0,
}

_NATIVE = ("temporal_flickering", "motion_smoothness", "dynamic_degree")


def temporal_flickering(videos: np.ndarray) -> float:
    """1 - normalized mean absolute frame-to-frame difference (higher =
    less flicker). videos (B, T, H, W, C) in [0, 1]."""
    mafd = np.abs(np.diff(videos * 255.0, axis=1)).mean()
    return float(np.clip(1.0 - mafd / 255.0, 0.0, 1.0))


def motion_smoothness(videos: np.ndarray) -> float:
    """Interpolation residual: reconstruct odd frames as the average of their
    neighbors and score the error (proxy for the AMT-S interpolation check)."""
    if videos.shape[1] < 3:
        return 1.0
    interp = 0.5 * (videos[:, :-2] + videos[:, 2:])
    err = np.abs(interp - videos[:, 1:-1]).mean()
    return float(np.clip(1.0 - err * 255.0 / 255.0, 0.0, 1.0))


def dynamic_degree(videos: np.ndarray, threshold: float = 0.01) -> float:
    """Fraction of videos with non-trivial motion energy (RAFT-flow proxy:
    mean absolute temporal gradient)."""
    if videos.shape[1] < 2:
        return 0.0
    energy = np.abs(np.diff(videos, axis=1)).mean(axis=(1, 2, 3, 4))
    return float((energy > threshold).mean())


class VBenchQuality:
    """Accumulates per-dimension scores over batches; log() returns the
    normalized weighted quality score plus per-dimension values."""

    def __init__(self, dimensions: Optional[Sequence[str]] = None, registry=None):
        self.dimensions = tuple(dimensions or _NATIVE)
        unknown = set(self.dimensions) - set(_WEIGHTS)
        if unknown:
            raise ValueError(f"unknown VBench dimensions {sorted(unknown)}")
        self.registry = registry
        self.reset()

    def reset(self) -> None:
        self._scores: Dict[str, list] = {d: [] for d in self.dimensions}

    def update(self, videos: np.ndarray) -> None:
        videos = np.clip(np.asarray(videos, np.float32), 0, 1)
        for dim in self.dimensions:
            if dim == "temporal_flickering":
                self._scores[dim].append(temporal_flickering(videos))
            elif dim == "motion_smoothness":
                self._scores[dim].append(motion_smoothness(videos))
            elif dim == "dynamic_degree":
                self._scores[dim].append(dynamic_degree(videos))
            elif self.registry is not None and dim in (
                "subject_consistency", "background_consistency",
                "aesthetic_quality",
            ):
                self._scores[dim].append(self._model_dim(dim, videos))
            # imaging_quality (MUSIQ) stays weight-gated

    def _model_dim(self, dim: str, videos: np.ndarray) -> float:
        """Model-based dimensions (reference vbench/*.py). Scores are only
        comparable to published tables when the registry has real weights
        (``registry.comparable``)."""
        import jax.numpy as jnp

        from .encoders import clip_preprocess, dino_preprocess

        B, T = videos.shape[:2]
        frames = jnp.asarray(videos.reshape((B * T,) + videos.shape[2:]))
        if dim == "aesthetic_quality":
            # LAION head on l2-normalized CLIP-L/14 (aesthetic_quality.py:22-25)
            feats = self.registry.clip_l14()(clip_preprocess(frames))
            feats = feats / jnp.clip(
                jnp.linalg.norm(feats, axis=-1, keepdims=True), 1e-12, None
            )
            scores = np.asarray(self.registry.laion()(feats)).reshape(B, T)
            # 0-10 rating -> [0, 1] (aesthetic_quality.py:25); clamped so the
            # random-weights fallback also stays in range
            return float(np.clip(scores.mean(axis=1).mean() / 10.0, 0.0, 1.0))
        if dim == "subject_consistency":
            feats = self.registry.dino()(dino_preprocess(frames))
        else:  # background_consistency
            feats = self.registry.clip_b32()(clip_preprocess(frames))
        f = np.asarray(feats).reshape(B, T, -1)
        f = f / np.clip(np.linalg.norm(f, axis=-1, keepdims=True), 1e-12, None)
        # mean of clamped consecutive-frame and first-frame cosine sims
        # (cosine_similarity_dimension.py:19-40)
        consec = np.clip((f[:, :-1] * f[:, 1:]).sum(-1), 0, None)
        first = np.clip((f[:, :1] * f[:, 1:]).sum(-1), 0, None)
        return float(((consec + first) / 2.0).mean())

    def log(self, prefix: str = "vbench") -> Dict[str, float]:
        out: Dict[str, float] = {}
        total_w = 0.0
        acc = 0.0
        for dim, scores in self._scores.items():
            if not scores:
                continue
            val = float(np.mean(scores))
            out[f"{prefix}/{dim}"] = val
            acc += _WEIGHTS[dim] * val
            total_w += _WEIGHTS[dim]
        if total_w > 0:
            out[f"{prefix}/quality_score"] = acc / total_w
        self.reset()
        return out
