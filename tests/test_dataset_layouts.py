"""Per-dataset on-disk layout tests: tiny synthetic fixture trees in each
reference layout, loaded through the real adapter classes (VERDICT r2
missing #4 — prove the 7 real layouts load before real data shows up).

Reference layouts: realestate10k.py:44-47/273-279, kinetics_600.py:49-73,
dmlab.py:19-104, minecraft.py:99-104, ucf_101.py:99-116, bair.py:53-71,
taichi.py:31-92.
"""

import json
import os

import numpy as np
import pytest

from dfot_tpu.config import load_config
from dfot_tpu.data.layouts import (
    BAIRDataset,
    DMLabDataset,
    Kinetics600Dataset,
    MinecraftDataset,
    RealEstate10KDataset,
    TaichiDataset,
    UCF101Dataset,
)
from dfot_tpu.data.video_dataset import build_dataset

T_FIX = 12  # frames per fixture video


def _cfg(save_dir, name, **over):
    overrides = [
        f"dataset={name}",
        "algorithm=dfot_video",
        "experiment=video_generation",
        f"++dataset.save_dir={save_dir}",
        "++dataset.max_frames=4",
        "++dataset.n_frames=4",
        "++dataset.frame_skip=1",
        "++dataset.resolution=16",
        "++dataset.latent.enabled=false",
        "++dataset.metadata_timestamps=false",
        "++dataset.subdataset_size=null",
        # layout tests exercise storage, not augmentation
        "++dataset.augmentation=null",
    ] + [f"++dataset.{k}={v}" for k, v in over.items()]
    return load_config(overrides).dataset


def _write_mp4(path, frames=T_FIX, res=16):
    import cv2

    os.makedirs(os.path.dirname(path), exist_ok=True)
    vw = cv2.VideoWriter(
        path, cv2.VideoWriter_fourcc(*"mp4v"), 10, (res, res)
    )
    rng = np.random.default_rng(0)
    for _ in range(frames):
        vw.write(rng.integers(0, 255, (res, res, 3), dtype=np.uint8))
    vw.release()
    assert os.path.exists(path)


def _check(ds, cond_shape=None, expect_videos=True):
    assert len(ds) > 0
    item = ds[0]
    if expect_videos:
        v = item["videos"]
        assert v.shape[0] == 4 and v.shape[-1] == 3
        assert v.dtype == np.float32 and 0.0 <= v.min() and v.max() <= 1.0
    if cond_shape is not None:
        assert item["conds"].shape == cond_shape
    assert item["nonterminal"].all()
    return item


def test_re10k_npz_layout(tmp_path):
    """64px RE10K: npz with CHW-ordered video + {split}_poses/*.pt."""
    import torch

    d = tmp_path / "re10k"
    (d / "training_16").mkdir(parents=True)
    (d / "training_poses").mkdir()
    rng = np.random.default_rng(1)
    for stem in ("vidA", "vidB"):
        video = rng.integers(0, 255, (T_FIX, 3, 16, 16), dtype=np.uint8)
        np.savez(d / "training_16" / f"{stem}.npz", video=video)
        torch.save(
            torch.from_numpy(rng.normal(size=(T_FIX, 18)).astype(np.float32)),
            d / "training_poses" / f"{stem}.pt",
        )
    cfg = _cfg(d, "realestate10k")
    ds = RealEstate10KDataset(cfg, "training")
    item = _check(ds, cond_shape=(4, 16))
    # CHW -> HWC transpose happened (channels last, uint8 -> [0,1])
    assert item["videos"].shape == (4, 16, 16, 3)


def test_re10k_zero_prob_augmentation_is_noop(tmp_path):
    """An RE10K augmentation dict with every prob overridden to 0 must stay
    on the (no-op) re10k path — NOT fall through to AugmentPipe(**aug),
    whose kwargs differ (frame_skip_increase -> TypeError)."""
    import torch

    d = tmp_path / "re10k"
    (d / "training_16").mkdir(parents=True)
    (d / "training_poses").mkdir()
    rng = np.random.default_rng(1)
    video = rng.integers(0, 255, (T_FIX, 3, 16, 16), dtype=np.uint8)
    np.savez(d / "training_16" / "vidA.npz", video=video)
    torch.save(
        torch.from_numpy(rng.normal(size=(T_FIX, 18)).astype(np.float32)),
        d / "training_poses" / "vidA.pt",
    )
    cfg = _cfg(
        d, "realestate10k",
        **{
            "augmentation.horizontal_flip_prob": 0.0,
            "augmentation.reverse_prob": 0.0,
            "augmentation.back_and_forth_prob": 0.0,
        },
    )
    ds = RealEstate10KDataset(cfg, "training")
    _check(ds, cond_shape=(4, 16))


def test_re10k_metadata_cache_keys_on_resolution(tmp_path):
    """The metadata cache must key on the walked directory (training_16 vs
    training_8), not the bare split — switching dataset.resolution must not
    serve the other resolution's file list."""
    d = tmp_path / "re10k"
    for res in (16, 8):
        (d / f"training_{res}").mkdir(parents=True)
        (d / "training_poses").mkdir(exist_ok=True)
        video = np.random.default_rng(res).integers(
            0, 255, (T_FIX, 3, res, res), dtype=np.uint8
        )
        np.savez(d / f"training_{res}" / f"vid{res}.npz", video=video)
    ds16 = RealEstate10KDataset(
        _cfg(d, "realestate10k", **{"external_cond_dim": 0}), "training"
    )
    ds8 = RealEstate10KDataset(
        _cfg(d, "realestate10k", resolution=8, **{"external_cond_dim": 0}),
        "training",
    )
    assert ds16[0]["videos"].shape[1:3] == (16, 16)
    assert ds8[0]["videos"].shape[1:3] == (8, 8)


def test_re10k_mp4_layout(tmp_path):
    """256px RE10K layout uses mp4 under {split}_{res}."""
    pytest.importorskip("cv2")
    d = tmp_path / "re10k"
    _write_mp4(str(d / "training_16" / "vidA.mp4"))
    import torch

    (d / "training_poses").mkdir()
    torch.save(
        torch.zeros(T_FIX, 18), d / "training_poses" / "vidA.pt"
    )
    ds = RealEstate10KDataset(_cfg(d, "realestate10k"), "training")
    _check(ds, cond_shape=(4, 16))


def test_k600_preprocessed_npz_layout(tmp_path):
    pytest.importorskip("cv2")
    d = tmp_path / "k600"
    _write_mp4(str(d / "training" / "clip0.mp4"))
    pre = d / "training_preprocessed_16_npz"
    pre.mkdir()
    video = np.random.default_rng(2).integers(
        0, 255, (T_FIX, 3, 16, 16), dtype=np.uint8
    )
    np.savez(pre / "clip0.npz", video=video)
    # the K600 recipe defaults to mp4 preprocessing (kinetics_600.yaml:17);
    # exercise the npz branch explicitly
    cfg = _cfg(d, "kinetics_600", video_preprocessing="npz")
    ds = Kinetics600Dataset(cfg, "training")
    item = _check(ds)
    # the preprocessed npz (CHW) was used, not the raw mp4 (compare at the
    # actual clip start — training idx_remap shuffles clips)
    from dfot_tpu.data.clips import clip_location

    _vi, start = clip_location(ds.cumulative_sizes, ds.idx_remap, 0)
    ref = np.moveaxis(video[start : start + 4], 1, -1).astype(np.float32) / 255.0
    np.testing.assert_allclose(item["videos"], ref)


def test_dmlab_layout(tmp_path):
    d = tmp_path / "dmlab"
    (d / "validation").mkdir(parents=True)
    rng = np.random.default_rng(3)
    for i in range(2):
        np.savez(
            d / "validation" / f"ep{i}.npz",
            video=rng.integers(0, 255, (T_FIX, 16, 16, 3), dtype=np.uint8),
            actions=rng.integers(0, 3, (T_FIX,)),
        )
    cfg = _cfg(d, "dmlab")
    ds = DMLabDataset(cfg, "test")  # reference maps test -> validation
    assert ds.split == "validation"
    item = _check(ds, cond_shape=(4, 3))
    assert set(np.unique(item["conds"])) <= {0.0, 1.0}  # one-hot(3)


def test_minecraft_layout(tmp_path):
    pytest.importorskip("cv2")
    d = tmp_path / "minecraft"
    _write_mp4(str(d / "training" / "ep0.mp4"))
    np.savez(
        d / "training" / "ep0.npz",
        actions=np.random.default_rng(4).integers(0, 4, (T_FIX,)),
    )
    cfg = _cfg(d, "minecraft")
    ds = MinecraftDataset(cfg, "training")
    # the sibling npz must not be indexed as a video
    assert len(ds.metadata) == 1
    _check(ds, cond_shape=(4, 4))


def test_ucf101_json_layout(tmp_path):
    pytest.importorskip("cv2")
    d = tmp_path / "ucf"
    _write_mp4(str(d / "videos" / "ApplyEyeMakeup" / "v0.mp4"))
    _write_mp4(str(d / "videos" / "Archery" / "v1.mp4"))
    index = [
        {"video_path": "datasets/ucf101/videos/ApplyEyeMakeup/v0.mp4", "label": 0},
        {"video_path": "datasets/ucf101/videos/Archery/v1.mp4", "label": 1},
    ]
    with open(d / "training03.json", "w") as f:
        json.dump(index, f)
    cfg = _cfg(d, "cond_ucf_101")
    ds = UCF101Dataset(cfg, "training")
    labels = {int(ds[i]["conds"]) for i in range(len(ds))}
    assert labels == {0, 1}
    _check(ds, cond_shape=())


def test_ucf101_preprocessed_layout(tmp_path):
    """UCF with K600-style preprocessed npz dirs next to the class dirs."""
    pytest.importorskip("cv2")
    d = tmp_path / "ucf"
    _write_mp4(str(d / "videos" / "Archery" / "v1.mp4"))
    pre = d / "videos" / "Archery_preprocessed_16_npz"
    pre.mkdir(parents=True)
    video = np.random.default_rng(5).integers(
        0, 255, (T_FIX, 3, 16, 16), dtype=np.uint8
    )
    np.savez(pre / "v1.npz", video=video)
    with open(d / "training03.json", "w") as f:
        json.dump(
            [{"video_path": "datasets/ucf101/videos/Archery/v1.mp4", "label": 3}], f
        )
    ds = UCF101Dataset(_cfg(d, "cond_ucf_101"), "training")
    item = _check(ds, cond_shape=())
    from dfot_tpu.data.clips import clip_location

    _vi, start = clip_location(ds.cumulative_sizes, ds.idx_remap, 0)
    ref = np.moveaxis(video[start : start + 4], 1, -1).astype(np.float32) / 255.0
    np.testing.assert_allclose(item["videos"], ref)
    assert int(item["conds"]) == 3


def test_bair_layout(tmp_path):
    pytest.importorskip("cv2")
    d = tmp_path / "bair"
    _write_mp4(str(d / "softmotion30_44k" / "train" / "video_aux1" / "traj0.mp4"))
    # reference BAIR load_cond raises NotImplementedError (bair.py:137-140):
    # the corpus is used unconditionally
    cfg = _cfg(d, "bair", external_cond_dim=0)
    ds = BAIRDataset(cfg, "training")
    _check(ds)


def test_taichi_layout(tmp_path):
    pytest.importorskip("cv2")
    d = tmp_path / "taichi"
    _write_mp4(str(d / "training" / "t0.mp4"))
    cfg = _cfg(d, "taichi")
    ds = TaichiDataset(cfg, "training")
    _check(ds)


def test_build_dataset_dispatches_layouts(tmp_path):
    """build_dataset routes dataset._name to the matching adapter."""
    d = tmp_path / "dmlab"
    (d / "training").mkdir(parents=True)
    rng = np.random.default_rng(6)
    np.savez(
        d / "training" / "ep0.npz",
        video=rng.integers(0, 255, (T_FIX, 16, 16, 3), dtype=np.uint8),
        actions=rng.integers(0, 3, (T_FIX,)),
    )
    cfg = _cfg(d, "dmlab")
    ds = build_dataset(cfg, "training")
    assert isinstance(ds, DMLabDataset)
