"""Dataset layer tests: clip indexing parity, npz loading, labels, poses,
augmentation consistency, sub-epoch resume."""

import os

import numpy as np
import pytest

from dfot_tpu.config import load_config
from dfot_tpu.data import (
    DataLoader,
    SyntheticVideoDataset,
    VideoDataset,
    build_dataset,
    build_idx_remap,
    clip_location,
    cumulative_clip_sizes,
    stack_external_cond,
)
from dfot_tpu.data.augmentation import AugmentPipe, mirror_poses, re10k_augment


def test_cumulative_clip_sizes():
    assert cumulative_clip_sizes([10, 5, 3], 4) == [7, 9, 10]
    # short video still yields one clip
    assert cumulative_clip_sizes([2], 4) == [1]


def test_idx_remap_subdataset_resume():
    cs = list(np.cumsum([5] * 20))  # 100 clips
    r0 = build_idx_remap(cs, subdataset_size=30, current_subepoch=0)
    r1 = build_idx_remap(cs, subdataset_size=30, current_subepoch=1)
    r2 = build_idx_remap(cs, subdataset_size=30, current_subepoch=2)
    assert len(r0) == len(r1) == 30
    # consecutive subepochs are disjoint slices of the same epoch shuffle
    assert not (set(r0) & set(r1))
    # deterministic
    assert r0 == build_idx_remap(cs, subdataset_size=30, current_subepoch=0)
    # subepoch 3 wraps into the next epoch's shuffle (covers 90..120 > 100)
    r3 = build_idx_remap(cs, subdataset_size=30, current_subepoch=3)
    assert len(r3) == 30


def test_idx_remap_eval_one_clip_per_video():
    import bisect

    cs = list(np.cumsum([5, 5, 5, 5]))
    remap = build_idx_remap(cs, num_eval_videos=3)
    assert len(remap) == 3
    videos = {bisect.bisect_right(cs, r) for r in remap}
    assert len(videos) == 3  # one clip from each of 3 distinct videos


def test_stack_external_cond():
    cond = np.arange(12, dtype=np.float32).reshape(6, 2)
    out = stack_external_cond(cond, 2)
    assert out.shape == (3, 4)
    # frame 0 carries [pad, cond0]
    np.testing.assert_array_equal(out[0], [0, 0, 0, 1])
    np.testing.assert_array_equal(out[1], [2, 3, 4, 5])


def _make_npz_dataset(root, n_videos=3, length=10, with_poses=False, classes=None):
    for split in ("training", "validation"):
        for i in range(n_videos):
            cls = classes[i % len(classes)] if classes else ""
            d = os.path.join(root, split, cls)
            os.makedirs(d, exist_ok=True)
            rng = np.random.RandomState(i)
            data = {"video": (rng.rand(length, 8, 8, 3) * 255).astype(np.uint8)}
            if with_poses:
                K = np.tile([1.0, 1.0, 0.5, 0.5], (length, 1))
                ext = np.tile(
                    np.concatenate([np.eye(3), np.zeros((3, 1))], 1).reshape(12),
                    (length, 1),
                )
                data["poses"] = np.concatenate([K, ext], -1).astype(np.float32)
            np.savez(os.path.join(d, f"v{i}.npz"), **data)


def test_video_dataset_poses(tmp_path):
    _make_npz_dataset(str(tmp_path), with_poses=True)
    cfg = load_config([
        "dataset=realestate10k", f"dataset.save_dir={tmp_path}",
        "dataset.resolution=8", "dataset.max_frames=4", "dataset.n_frames=4",
        "dataset.frame_skip=1", "dataset.subdataset_size=null",
        "++dataset.augmentation.horizontal_flip_prob=0",
    ]).dataset
    ds = VideoDataset(cfg, "training")
    item = ds[0]
    assert item["videos"].shape == (4, 8, 8, 3)
    assert item["conds"].shape == (4, 16)
    assert item["nonterminal"].all()


def test_video_dataset_labels(tmp_path):
    _make_npz_dataset(str(tmp_path), classes=["cat", "dog"])
    cfg = load_config([
        "dataset=cond_ucf_101", f"dataset.save_dir={tmp_path}",
        "dataset.resolution=8", "dataset.max_frames=4", "dataset.n_frames=4",
    ]).dataset
    ds = VideoDataset(cfg, "training")
    labels = {int(ds[i]["conds"]) for i in range(len(ds))}
    assert labels <= {0, 1} and len(labels) == 2


def test_augment_pipe_and_pose_mirror():
    rng = np.random.RandomState(0)
    v = np.random.RandomState(1).rand(3, 8, 8, 3).astype(np.float32)
    out = AugmentPipe(p=1.0)(v, rng)
    assert out.shape == v.shape and out.min() >= 0 and out.max() <= 1
    # pose mirror is an involution
    poses = np.random.RandomState(2).rand(2, 4, 16).astype(np.float32)
    np.testing.assert_allclose(mirror_poses(mirror_poses(poses)), poses, atol=1e-6)


def test_re10k_augment_consistency():
    rng = np.random.RandomState(0)
    video = np.random.RandomState(1).rand(4, 8, 8, 3).astype(np.float32)
    K = np.tile([1.0, 1.0, 0.25, 0.5], (4, 1)).astype(np.float32)
    ext = np.tile(
        np.concatenate([np.eye(3), np.ones((3, 1))], 1).reshape(12), (4, 1)
    ).astype(np.float32)
    poses = np.concatenate([K, ext], -1)
    v2, p2 = re10k_augment(video, poses, rng, horizontal_flip_prob=1.0)
    np.testing.assert_allclose(v2, video[:, :, ::-1])
    assert p2[0, 2] == 0.75  # px mirrored
    # reversal keeps pairing
    v3, p3 = re10k_augment(video, poses, np.random.RandomState(3),
                           horizontal_flip_prob=0.0, reverse_prob=1.0)
    np.testing.assert_allclose(v3, video[::-1])
    np.testing.assert_allclose(p3, poses[::-1])


def test_re10k_back_and_forth():
    """Back-and-forth must match the reference permutation: even frames
    forward then odd frames reversed (realestate10k.py:291-297,
    cat([x[::2], x[1::2].flip(0)])) — for both even and odd lengths."""
    for T in (7, 8):
        video = np.random.RandomState(T).rand(T, 4, 4, 3).astype(np.float32)
        poses = np.random.RandomState(T + 1).rand(T, 16).astype(np.float32)
        v, p = re10k_augment(
            video, poses, np.random.RandomState(0), back_and_forth_prob=1.0
        )
        np.testing.assert_allclose(
            v, np.concatenate([video[::2], video[1::2][::-1]])
        )
        np.testing.assert_allclose(
            p, np.concatenate([poses[::2], poses[1::2][::-1]])
        )
        assert not np.allclose(v, video)  # genuinely reorders the clip


def test_dataloader_epochs():
    ds = SyntheticVideoDataset(num_videos=32, n_frames=2, resolution=4)
    loader = DataLoader(ds, batch_size=4, shuffle=True, drop_last=True, seed=0)
    e1 = np.concatenate([b["videos"] for b in loader])
    e2 = np.concatenate([b["videos"] for b in loader])
    assert e1.shape == (32, 2, 4, 4, 3)
    # same multiset of items, different order across epochs
    assert not np.allclose(e1, e2)
    np.testing.assert_allclose(np.sort(e1.reshape(32, -1), 0), np.sort(e2.reshape(32, -1), 0))


def test_grain_loader_backend():
    """make_loader(num_workers>0) returns the grain-backed loader producing
    the same batch protocol as the threaded loader."""
    from dfot_tpu.data.loader import DataLoader, GrainDataLoader, make_loader
    from dfot_tpu.data.video_dataset import SyntheticVideoDataset

    ds = SyntheticVideoDataset(num_videos=10, n_frames=3, resolution=8)
    threaded = make_loader(ds, batch_size=4, shuffle=True, seed=3)
    grain_l = make_loader(ds, batch_size=4, shuffle=True, seed=3, num_workers=1)
    assert isinstance(threaded, DataLoader) and isinstance(grain_l, GrainDataLoader)
    assert len(threaded) == len(grain_l) == 2  # drop_last

    batches = list(grain_l)
    assert len(batches) == 2
    for b in batches:
        assert set(b) == {"videos", "nonterminal"}
        assert b["videos"].shape == (4, 3, 8, 8, 3)
        assert b["nonterminal"].dtype == np.bool_
    # next epoch reshuffles but keeps the protocol
    again = next(iter(grain_l))
    assert again["videos"].shape == (4, 3, 8, 8, 3)


def test_grain_loader_no_per_worker_batch_loss():
    """Regression: grain applies operations per worker shard — batching must
    happen outside the pool or big batches with many workers silently drop
    every record (found live: 11 workers x batch 64 over 256 records -> 0)."""
    from dfot_tpu.data.loader import make_loader
    from dfot_tpu.data.video_dataset import SyntheticVideoDataset

    ds = SyntheticVideoDataset(num_videos=256, n_frames=2, resolution=8)
    # 5 workers: 256/5 ~ 51 records/worker < batch 64 -> the old per-shard
    # Batch would starve; fewer spawns keep the test fast
    l = make_loader(ds, batch_size=64, shuffle=True, seed=0, num_workers=5)
    batches = list(l)
    assert len(batches) == 4
    assert all(b["videos"].shape[0] == 64 for b in batches)


def test_mp4_video_dataset(tmp_path):
    """mp4 videos decode via OpenCV with rescale-and-crop to the dataset
    resolution; class labels come from the parent directory (UCF layout)."""
    import cv2

    from dfot_tpu.config import load_config
    from dfot_tpu.data.video_dataset import VideoDataset

    for cls in ("ApplyLipstick", "Basketball"):
        d = tmp_path / "training" / cls
        os.makedirs(d)
        w = cv2.VideoWriter(
            str(d / f"{cls}_v0.mp4"), cv2.VideoWriter_fourcc(*"mp4v"), 10, (48, 36)
        )
        rng = np.random.RandomState(hash(cls) % 100)
        for _ in range(10):
            w.write((rng.rand(36, 48, 3) * 255).astype(np.uint8))
        w.release()

    cfg = load_config([
        "+name=t", "dataset=cond_ucf_101", "experiment=video_generation",
        f"dataset.save_dir={tmp_path}", "dataset.resolution=16",
        "dataset.max_frames=4", "++dataset.latent.enabled=false",
    ]).dataset
    ds = VideoDataset(cfg, "training")
    assert len(ds.metadata) == 2 and all(m["length"] == 10 for m in ds.metadata)
    item = ds[0]
    assert item["videos"].shape == (4, 16, 16, 3)  # rescale-and-crop applied
    assert item["videos"].dtype == np.float32
    assert 0.0 <= item["videos"].min() and item["videos"].max() <= 1.0
    assert item["conds"].shape == ()  # class label from the parent dir
    labels = {int(ds[i]["conds"]) for i in (0, len(ds) - 1)}
    assert labels == {0, 1}
    # metadata cache round-trips, including per-frame pts + fps
    # (reference base_video.py:95-160 metadata build)
    ds2 = VideoDataset(cfg, "training")
    assert [m["length"] for m in ds2.metadata] == [10, 10]
    for m in ds2.metadata:
        assert m["fps"] == 10.0
        assert len(m["pts"]) == 10
        assert np.all(np.diff(m["pts"]) > 0)  # monotonic timestamps


def test_loader_process_shard_partition_and_tail():
    """process_shard slices are disjoint, equal-length, and cover every
    sample: truncated under drop_last, padded-with-wrap (DistributedSampler
    semantics) when drop_last=False so the tail is never silently skipped."""
    from dfot_tpu.data.loader import DataLoader

    class DS:
        def __len__(self):
            return 7

        def __getitem__(self, i):
            return {"x": np.full((2,), i, np.float32)}

    def ids(loader):
        return [int(v) for b in loader for v in b["x"][:, 0]]

    # drop_last=True: common length 6, shards {3, 3}, sample 7 dropped
    shards = [
        ids(DataLoader(DS(), 1, shuffle=False, drop_last=True, process_shard=(r, 2)))
        for r in range(2)
    ]
    assert [len(s) for s in shards] == [3, 3]
    assert sorted(shards[0] + shards[1]) == [0, 1, 2, 3, 4, 5]

    # drop_last=False: padded to 8 with a wrapped duplicate — every sample
    # seen, shards stay equal so multi-host collectives stay in lockstep
    shards = [
        ids(DataLoader(DS(), 1, shuffle=False, drop_last=False, process_shard=(r, 2)))
        for r in range(2)
    ]
    assert [len(s) for s in shards] == [4, 4]
    assert set(shards[0] + shards[1]) == set(range(7))
    assert len(shards[0] + shards[1]) == 8  # exactly one wrapped duplicate
    assert not set(shards[0]) & set(shards[1]) - {0}  # disjoint except pad
