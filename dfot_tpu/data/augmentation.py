"""Video augmentation (host-side numpy).

Two families, mirroring the reference:
- EDM-style AugmentPipe (reference utils/augmentation.py, used by UCF-101):
  geometric/color augmentations applied per clip with probability p each.
  A representative subset (x-flip, 90-degree rotations, brightness, contrast,
  saturation) is implemented; each op is cheap numpy on (T, H, W, C).
- RE10K-style temporal/viewpoint augmentation (reference realestate10k.yaml
  augmentation block): horizontal flip (with consistent camera-pose
  mirroring), time reversal, back-and-forth playback, per-subepoch
  frame-skip increase.
"""

from __future__ import annotations

from typing import Optional, Tuple

import numpy as np

__all__ = ["AugmentPipe", "re10k_augment", "mirror_poses"]


class AugmentPipe:
    """EDM-style per-clip augmentation with per-op probability."""

    def __init__(
        self,
        p: float = 0.0,
        xflip: bool = True,
        rotate90: bool = True,
        brightness: float = 0.2,
        contrast: float = 0.25,
        saturation: float = 0.25,
    ):
        self.p = p
        self.xflip = xflip
        self.rotate90 = rotate90
        self.brightness = brightness
        self.contrast = contrast
        self.saturation = saturation

    def __call__(self, video: np.ndarray, rng: np.random.RandomState) -> np.ndarray:
        """video (T, H, W, C) in [0, 1]."""
        if self.p <= 0:
            return video
        v = video
        if self.xflip and rng.rand() < self.p:
            v = v[:, :, ::-1]
        if self.rotate90 and rng.rand() < self.p:
            v = np.rot90(v, k=int(rng.randint(1, 4)), axes=(1, 2))
        if self.brightness and rng.rand() < self.p:
            v = v + rng.uniform(-self.brightness, self.brightness)
        if self.contrast and rng.rand() < self.p:
            c = 1.0 + rng.uniform(-self.contrast, self.contrast)
            v = (v - v.mean()) * c + v.mean()
        if self.saturation and v.shape[-1] == 3 and rng.rand() < self.p:
            s = 1.0 + rng.uniform(-self.saturation, self.saturation)
            gray = v.mean(axis=-1, keepdims=True)
            v = gray + (v - gray) * s
        return np.ascontiguousarray(np.clip(v, 0.0, 1.0)).astype(np.float32)


def mirror_poses(poses: np.ndarray) -> np.ndarray:
    """Mirror raw camera poses (T, 16: K + flat 3x4 extrinsics) to match a
    horizontal image flip: px -> 1 - px and conjugate R, T by S=diag(-1,1,1)."""
    out = poses.copy()
    out[..., 2] = 1.0 - out[..., 2]  # principal point x
    RT = out[..., 4:16].reshape(*out.shape[:-1], 3, 4)
    S = np.diag([-1.0, 1.0, 1.0]).astype(poses.dtype)
    R = RT[..., :3]
    T = RT[..., 3]
    RT[..., :3] = np.einsum("ij,...jk,kl->...il", S, R, S)
    RT[..., 3] = np.einsum("ij,...j->...i", S, T)
    out[..., 4:16] = RT.reshape(*out.shape[:-1], 12)
    return out


def re10k_augment(
    video: Optional[np.ndarray],
    poses: Optional[np.ndarray],
    rng: np.random.RandomState,
    horizontal_flip_prob: float = 0.5,
    reverse_prob: float = 0.0,
    back_and_forth_prob: float = 0.0,
) -> Tuple[Optional[np.ndarray], Optional[np.ndarray]]:
    """Temporally/spatially augment a clip and its camera poses consistently."""
    if rng.rand() < horizontal_flip_prob:
        if video is not None:
            video = np.ascontiguousarray(video[:, :, ::-1])
        if poses is not None:
            poses = mirror_poses(poses)
    if rng.rand() < reverse_prob:
        if video is not None:
            video = np.ascontiguousarray(video[::-1])
        if poses is not None:
            poses = np.ascontiguousarray(poses[::-1])
    if rng.rand() < back_and_forth_prob:
        T = video.shape[0] if video is not None else poses.shape[0]
        half = (T + 1) // 2
        idx = np.concatenate([np.arange(half), np.arange(half - 2, half - 2 - (T - half), -1)])
        idx = np.clip(idx, 0, T - 1)
        if video is not None:
            video = video[idx]
        if poses is not None:
            poses = poses[idx]
    return video, poses
