"""VideoMetric: the umbrella evaluation module.

Counterpart of the reference's VideoMetric (metrics/video/video_metric.py):
- context frames are overwritten with ground truth before scoring,
- frame-wise metrics (mse/psnr/ssim/lpips) average over non-context frames,
- video-wise metrics (fvd/is/fid) accumulate features over the whole run,
- videos shorter than 9 frames are padded by repetition for FVD,
- ``log(prefix)`` computes everything and resets the accumulators.
"""

from __future__ import annotations

from typing import Dict, List, Optional, Sequence

import jax.numpy as jnp
import numpy as np

from .frechet import FrechetDistance, InceptionScore
from .functional import mse, psnr, ssim
from .registry import SharedMetricModelRegistry

__all__ = ["VideoMetric"]

FRAME_WISE = ("mse", "psnr", "ssim", "lpips")
VIDEO_WISE = ("fvd", "is", "fid", "fvmd", "vbench", "real_vbench")

# vbench dims scored through VideoMetric (imaging_quality stays MUSIQ-gated)
_VBENCH_DIMS = (
    "subject_consistency", "background_consistency", "temporal_flickering",
    "motion_smoothness", "dynamic_degree", "aesthetic_quality",
)


class VideoMetric:
    def __init__(
        self,
        metric_types: Sequence[str] = ("fvd", "mse", "psnr", "ssim"),
        registry: Optional[SharedMetricModelRegistry] = None,
        n_metrics_frames: Optional[int] = None,
    ):
        unknown = set(metric_types) - set(FRAME_WISE) - set(VIDEO_WISE)
        if unknown:
            raise ValueError(f"unknown metrics {sorted(unknown)}")
        self.metric_types = tuple(metric_types)
        self.registry = registry or SharedMetricModelRegistry()
        self.n_metrics_frames = n_metrics_frames
        self.reset()

    def reset(self) -> None:
        from .vbench import VBenchQuality

        self._frame_acc: Dict[str, List[float]] = {m: [] for m in FRAME_WISE}
        self._fvd = FrechetDistance(400)
        self._fid = FrechetDistance(2048)
        self._fvmd = FrechetDistance(1024)
        self._is = InceptionScore()
        # vbench on predictions, real_vbench on ground truth (reference
        # video_metric.py:81, 213-215)
        self._vbench = {
            m: VBenchQuality(_VBENCH_DIMS, registry=self.registry)
            for m in ("vbench", "real_vbench")
            if m in self.metric_types
        }
        self._count = 0

    # ------------------------------------------------------------------
    def update(
        self,
        preds: np.ndarray,
        targets: np.ndarray,
        context_mask: Optional[np.ndarray] = None,
    ) -> None:
        """preds/targets (B, T, H, W, C) in [0, 1]; context_mask (B, T) bool
        marks frames that were given as context (scored frames exclude them,
        and predictions have context overwritten by GT)."""
        preds = np.nan_to_num(np.clip(np.asarray(preds, np.float32), 0, 1))
        targets = np.nan_to_num(np.clip(np.asarray(targets, np.float32), 0, 1))
        B, T = preds.shape[:2]
        if context_mask is None:
            context_mask = np.zeros((B, T), dtype=bool)
        # context frames replaced by ground truth (reference :118-141)
        preds = np.where(context_mask[..., None, None, None], targets, preds)
        if self.n_metrics_frames is not None:
            preds = preds[:, -self.n_metrics_frames :]
            targets = targets[:, -self.n_metrics_frames :]
            context_mask = context_mask[:, -self.n_metrics_frames :]
        eval_mask = ~context_mask

        p, t = jnp.asarray(preds), jnp.asarray(targets)
        if "mse" in self.metric_types:
            self._acc_frame("mse", mse(p, t), eval_mask)
        if "psnr" in self.metric_types:
            self._acc_frame("psnr", psnr(p, t), eval_mask)
        if "ssim" in self.metric_types:
            self._acc_frame("ssim", ssim(p, t), eval_mask)
        if "lpips" in self.metric_types:
            fn = self.registry.lpips()
            B_, T_ = preds.shape[:2]
            d = fn(
                (p * 2 - 1).reshape((-1,) + p.shape[2:]),
                (t * 2 - 1).reshape((-1,) + t.shape[2:]),
            )
            self._acc_frame("lpips", jnp.asarray(d).reshape(B_, T_), eval_mask)

        if "fvd" in self.metric_types or "is" in self.metric_types:
            i3d = self.registry.i3d()
            for vids, real in ((targets, True), (preds, False)):
                v = self._pad_to_min_frames(vids, 9)
                logits, _ = i3d(jnp.asarray(v))
                logits = np.asarray(logits)
                if "fvd" in self.metric_types:
                    self._fvd.update(logits, real)
                if "is" in self.metric_types and not real:
                    self._is.update(logits)
        if "fid" in self.metric_types:
            inc = self.registry.inception()
            for vids, real in ((targets, True), (preds, False)):
                frames = vids.reshape((-1,) + vids.shape[2:])
                self._fid.update(np.asarray(inc(jnp.asarray(frames))), real)
        if "vbench" in self._vbench:
            self._vbench["vbench"].update(preds)
        if "real_vbench" in self._vbench:
            self._vbench["real_vbench"].update(targets)
        if "fvmd" in self.metric_types and preds.shape[1] >= 16:
            # Frechet video MOTION distance (reference fvmd.py requires
            # >= 16 frames and skips otherwise, :36-40): velocity +
            # acceleration histograms over tracked points. With converted
            # PIPS2 weights (pips.npz) tracking matches the reference;
            # otherwise a weight-free LK tracker substitutes and the score
            # is flagged non-comparable to published FVMD tables.
            from .motion import motion_features

            track_fn = self.registry.pips()
            self.registry.comparable["fvmd"] = track_fn is not None
            for vids, real in ((targets, True), (preds, False)):
                self._fvmd.update(motion_features(vids, track_fn=track_fn), real)
        self._count += B

    def _acc_frame(self, name: str, per_frame, eval_mask: np.ndarray) -> None:
        per_frame = np.asarray(per_frame)
        m = eval_mask.astype(np.float64)
        denom = np.clip(m.sum(), 1, None)
        self._frame_acc[name].append(float((per_frame * m).sum() / denom))

    @staticmethod
    def _pad_to_min_frames(videos: np.ndarray, min_frames: int) -> np.ndarray:
        T = videos.shape[1]
        if T >= min_frames:
            return videos
        reps = -(-min_frames // T)
        return np.tile(videos, (1, reps, 1, 1, 1))[:, :min_frames]

    # metric -> frozen model whose weights decide value comparability
    _METRIC_MODELS = {
        "fvd": ("i3d",),
        "fid": ("inception",),
        "is": ("inception",),
        "lpips": ("lpips",),
        "fvmd": ("fvmd",),
    }

    def _key_fn(self, prefix: str):
        """Metric-name mapper that suffixes ``_uncalibrated`` when the
        backing frozen model ran with random fallback weights
        (registry.comparable[model] is False) — so an FVD scored without
        real I3D weights can never be mistaken for a published-table value."""

        def key(m: str) -> str:
            models = self._METRIC_MODELS.get(m, ())
            comp = self.registry.comparable if self.registry else {}
            if models and not all(comp.get(name, False) for name in models):
                m = f"{m}_uncalibrated"
            return f"{prefix}/{m}" if prefix else m

        return key

    # ------------------------------------------------------------------
    def log(self, prefix: str = "") -> Dict[str, float]:
        """Compute all configured metrics, then reset (reference :233-264)."""
        out: Dict[str, float] = {}
        key = self._key_fn(prefix)
        for m in FRAME_WISE:
            if m in self.metric_types and self._frame_acc[m]:
                out[key(m)] = float(np.mean(self._frame_acc[m]))
        if "fvd" in self.metric_types and self._count:
            out[key("fvd")] = self._fvd.compute()
        if "fid" in self.metric_types and self._count:
            out[key("fid")] = self._fid.compute()
        if "fvmd" in self.metric_types and self._count:
            out[key("fvmd")] = self._fvmd.compute()
        if "is" in self.metric_types and self._count:
            out[key("is")] = self._is.compute()
        for name, vb in self._vbench.items():
            if self._count:
                out.update(vb.log(prefix=f"{prefix}/{name}" if prefix else name))
        self.reset()
        return out
