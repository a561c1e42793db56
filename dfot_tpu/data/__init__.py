from .clips import (
    build_idx_remap,
    clip_location,
    cumulative_clip_sizes,
    stack_external_cond,
)
from .loader import DataLoader
from .video_dataset import SyntheticVideoDataset, VideoDataset, build_dataset
