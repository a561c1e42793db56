"""Metrics tests: functional metrics, Frechet math, VideoMetric orchestration."""

import jax
import jax.numpy as jnp
import numpy as np
import pytest

from dfot_tpu.metrics import (
    FrechetDistance,
    I3D,
    InceptionScore,
    SharedMetricModelRegistry,
    VideoMetric,
    frechet_distance,
    mse,
    psnr,
    ssim,
)


def test_mse_psnr_identity_and_noise():
    x = jax.random.uniform(jax.random.PRNGKey(0), (2, 3, 16, 16, 3))
    assert float(mse(x, x).max()) == 0.0
    assert float(psnr(x, x).min()) > 100.0
    y = jnp.clip(x + 0.1, 0, 1)
    assert float(mse(x, y).mean()) > 0.0
    assert float(psnr(x, y).mean()) < 30.0


def test_ssim_properties():
    x = jax.random.uniform(jax.random.PRNGKey(0), (1, 2, 32, 32, 3))
    np.testing.assert_allclose(np.asarray(ssim(x, x)), 1.0, atol=1e-4)
    noise = jax.random.uniform(jax.random.PRNGKey(1), x.shape)
    assert float(ssim(x, noise).mean()) < 0.5


def test_frechet_distance_identical_and_shifted():
    rng = np.random.RandomState(0)
    a = rng.randn(512, 16)
    fd = FrechetDistance(16)
    fd.update(a, real=True)
    fd.update(a, real=False)
    assert fd.compute() == pytest.approx(0.0, abs=1e-6)
    fd.reset()
    fd.update(a, real=True)
    fd.update(a + 3.0, real=False)
    assert fd.compute() == pytest.approx(9.0 * 16, rel=0.05)  # ||mu diff||^2


def test_frechet_closed_form():
    # isotropic case: d = ||m1-m2||^2 + (s1 + s2 - 2 sqrt(s1 s2)) * dim
    d = frechet_distance(
        np.zeros(4), np.eye(4) * 4.0, np.zeros(4), np.eye(4) * 1.0
    )
    assert d == pytest.approx((4 + 1 - 2 * 2) * 4, rel=1e-6)


def test_inception_score_bounds():
    s = InceptionScore()
    # one-hot confident, diverse predictions -> high IS
    logits = np.eye(10)[np.arange(10) % 10] * 20
    s.update(np.tile(logits, (5, 1)))
    assert s.compute() == pytest.approx(10.0, rel=0.05)
    s.reset()
    s.update(np.zeros((50, 10)))  # uniform -> IS = 1
    assert s.compute() == pytest.approx(1.0, abs=1e-5)


def test_i3d_shapes():
    model = I3D()
    x = jnp.zeros((1, 9, 32, 32, 3))
    variables = model.init(jax.random.PRNGKey(0), x)
    logits, feats = model.apply(variables, x)
    assert logits.shape == (1, 400) and feats.shape == (1, 1024)


def test_video_metric_end_to_end():
    registry = SharedMetricModelRegistry()
    vm = VideoMetric(("mse", "psnr", "ssim", "fvd", "is"), registry)
    rng = np.random.RandomState(0)
    gt = rng.rand(2, 4, 32, 32, 3).astype(np.float32)
    good = np.clip(gt + 0.01 * rng.randn(*gt.shape), 0, 1).astype(np.float32)
    bad = rng.rand(*gt.shape).astype(np.float32)
    ctx = np.zeros((2, 4), dtype=bool)
    ctx[:, 0] = True

    vm.update(good, gt, ctx)
    out_good = vm.log("val")
    vm.update(bad, gt, ctx)
    out_bad = vm.log("val")

    assert out_good["val/mse"] < out_bad["val/mse"]
    assert out_good["val/psnr"] > out_bad["val/psnr"]
    assert out_good["val/ssim"] > out_bad["val/ssim"]
    assert out_good["val/fvd"] < out_bad["val/fvd"]
    # registry flags non-comparable fallback weights
    assert registry.comparable["i3d"] is False


def test_video_metric_context_overwrite():
    vm = VideoMetric(("mse",))
    gt = np.random.RandomState(0).rand(1, 3, 8, 8, 3).astype(np.float32)
    pred = gt.copy()
    pred[:, 0] = 0.0  # context frame wrong, but it must be overwritten by GT
    ctx = np.zeros((1, 3), dtype=bool)
    ctx[:, 0] = True
    vm.update(pred, gt, ctx)
    assert vm.log()["mse"] == pytest.approx(0.0, abs=1e-8)


def test_vbench_quality_orders_videos():
    from dfot_tpu.metrics import VBenchQuality

    rng = np.random.RandomState(0)
    base = rng.rand(1, 1, 16, 16, 3).astype(np.float32)
    smooth = np.repeat(base, 8, axis=1)  # static video: no flicker
    noisy = rng.rand(1, 8, 16, 16, 3).astype(np.float32)

    vb = VBenchQuality()
    vb.update(smooth)
    s_smooth = vb.log()
    vb.update(noisy)
    s_noisy = vb.log()
    assert s_smooth["vbench/temporal_flickering"] > s_noisy["vbench/temporal_flickering"]
    assert s_smooth["vbench/motion_smoothness"] > s_noisy["vbench/motion_smoothness"]
    # static video has no motion; noise has high dynamic degree
    assert s_smooth["vbench/dynamic_degree"] == 0.0
    assert s_noisy["vbench/dynamic_degree"] == 1.0
    assert 0 <= s_noisy["vbench/quality_score"] <= 1


def test_fvmd_orders_motion_fidelity():
    from dfot_tpu.metrics import SharedMetricModelRegistry, VideoMetric

    vm = VideoMetric(("fvmd",), SharedMetricModelRegistry())
    rng = np.random.RandomState(0)
    gt = np.clip(rng.rand(2, 6, 32, 32, 3), 0, 1).astype(np.float32)
    same_motion = np.clip(gt + 0.02 * rng.randn(*gt.shape), 0, 1).astype(np.float32)
    static = np.repeat(gt[:, :1], 6, axis=1)  # motion completely wrong

    vm.update(same_motion, gt)
    good = vm.log()["fvmd"]
    vm.update(static, gt)
    bad = vm.log()["fvmd"]
    assert good < bad
