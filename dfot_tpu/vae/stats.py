"""Channel-wise latent statistics (reference: algorithms/vae/estimate_latent_stats.py).

Computes per-channel mean/std over saved latents; the results are pasted into
dataset configs as ``data_mean`` / ``data_std`` for latent normalization.
"""

from __future__ import annotations

import os
from typing import List, Tuple

import numpy as np

__all__ = ["estimate_latent_stats"]


def estimate_latent_stats(latent_paths: List[str], max_files: int = 1000) -> Tuple[np.ndarray, np.ndarray]:
    """Streaming mean/std over channel-last latent files (.npy)."""
    count = 0.0
    s1 = s2 = None
    for path in latent_paths[:max_files]:
        arr = np.load(path).astype(np.float64)
        flat = arr.reshape(-1, arr.shape[-1])
        if s1 is None:
            s1 = flat.sum(0)
            s2 = (flat**2).sum(0)
        else:
            s1 += flat.sum(0)
            s2 += (flat**2).sum(0)
        count += flat.shape[0]
    mean = s1 / count
    std = np.sqrt(np.clip(s2 / count - mean**2, 1e-12, None))
    return mean.astype(np.float32), std.astype(np.float32)
