"""EDM AugmentPipe: op-for-op parity vs the reference torch pipeline.

The reference pipe (/root/reference/utils/augmentation.py:154-414) is loaded
directly and driven with injected random draws (its fork routes every draw
through ``execute_and_repeat``, so monkeypatching that one function makes it
fully deterministic); our numpy pipe gets the equivalent AugmentParams and
must reproduce the pixels — including the sym6-wavelet supersampled affine
warp and the homogeneous color matrix path.
"""

import importlib.util
import sys

import numpy as np
import pytest

torch = pytest.importorskip("torch")

from dfot_tpu.data.augmentation import AugmentParams, AugmentPipe  # noqa: E402

REF = "/root/reference/utils/augmentation.py"


@pytest.fixture(scope="module")
def ref_mod():
    spec = importlib.util.spec_from_file_location("ref_augmentation", REF)
    mod = importlib.util.module_from_spec(spec)
    sys.modules["ref_augmentation"] = mod
    spec.loader.exec_module(mod)
    return mod


def run_ref(ref_mod, pipe_kwargs, draws, images_nchw):
    """Run the reference AugmentPipe with a scripted draw queue."""
    queue = list(draws)

    def fake_execute_and_repeat(func, dim, repeats, **args):
        val = queue.pop(0)
        size = args["size"]
        t = torch.as_tensor(np.broadcast_to(np.asarray(val, np.float32), size).copy())
        if func is torch.randint:
            t = t.to(torch.int64)
        return torch.repeat_interleave(t, repeats=repeats, dim=dim)

    orig = ref_mod.execute_and_repeat
    ref_mod.execute_and_repeat = fake_execute_and_repeat
    try:
        pipe = ref_mod.AugmentPipe(**pipe_kwargs)
        out, _labels = pipe(torch.as_tensor(images_nchw, dtype=torch.float32))
    finally:
        ref_mod.execute_and_repeat = orig
    assert not queue, f"{len(queue)} unused draws"
    return out.numpy()


@pytest.fixture()
def images():
    return np.random.default_rng(0).random((3, 3, 32, 32)).astype(np.float32)


def _compare(ref_mod, images, pipe_kwargs, draws, params, rtol=2e-3, atol=2e-4):
    ref_out = run_ref(ref_mod, pipe_kwargs, draws, images)
    ours = AugmentPipe(p=1.0, **pipe_kwargs).apply(images, params)
    assert ref_out.shape == ours.shape
    np.testing.assert_allclose(ours, ref_out, rtol=rtol, atol=atol)


def test_parity_blits(ref_mod, images):
    # draws: xflip(w,prob) yflip(w,prob) rot(w,prob) trans(w2,prob)
    _compare(
        ref_mod, images,
        dict(xflip=1, yflip=1, rotate_int=1, translate_int=1),
        [1, 0.0, 1, 0.0, 3, 0.0, np.array([1, 1]).reshape(2, 1, 1, 1, 1), 0.0],
        AugmentParams(xflip=1, yflip=1, rotate_int=3, translate_int=(1, 1)),
    )


def test_parity_int_translation_reflection(ref_mod, images):
    # the reflect-wrap index math (reference :233-241)
    _compare(
        ref_mod, images,
        dict(translate_int=1, translate_int_max=0.25),
        [np.array([1, 0]).reshape(2, 1, 1, 1, 1), 0.0],
        AugmentParams(translate_int=(1, 0)),
    )


def test_parity_isotropic_scale(ref_mod, images):
    _compare(
        ref_mod, images, dict(scale=1), [0.7, 0.0], AugmentParams(scale=0.7)
    )


def test_parity_fractional_rotation(ref_mod, images):
    raw = 0.3  # module computes w = (raw*2-1)*pi*rotate_frac_max
    w = (raw * 2 - 1) * np.pi
    _compare(
        ref_mod, images, dict(rotate_frac=1), [raw, 0.0],
        AugmentParams(rotate_frac=w),
    )


def test_parity_aniso(ref_mod, images):
    raw_r = 0.8
    r = (raw_r * 2 - 1) * np.pi
    _compare(
        ref_mod, images, dict(aniso=1), [0.5, raw_r, 0.0, 0.0],
        AugmentParams(aniso=0.5, aniso_angle=r),
    )


def test_parity_fractional_translation(ref_mod, images):
    _compare(
        ref_mod, images, dict(translate_frac=1),
        [np.array([[0.3], [-0.6]]), 0.0],
        AugmentParams(translate_frac=(0.3, -0.6)),
    )


def test_parity_color(ref_mod, images):
    raw_hue = 0.25
    _compare(
        ref_mod, images,
        dict(brightness=1, contrast=1, lumaflip=1, hue=1, saturation=1),
        [1.2, 0.0, -0.8, 0.0, 1, 0.0, raw_hue, 0.0, 0.9, 0.0],
        AugmentParams(
            brightness=1.2, contrast=-0.8, lumaflip=1,
            hue=(raw_hue * 2 - 1) * np.pi, saturation=0.9,
        ),
    )


def test_parity_combined_ucf_recipe(ref_mod, images):
    """All ops of the UCF-101 recipe at once (multipliers from
    reference configurations/dataset/ucf_101.yaml:15-26), every gate open."""
    kwargs = dict(
        xflip=0.5, yflip=0.5, rotate_int=0.5, translate_int=0.5, scale=0.3,
        contrast=0.125, brightness=0.3, lumaflip=0.5, hue=0.3, saturation=0.3,
    )
    raw_hue = 0.9
    draws = [
        1, 0.0,                 # xflip
        1, 0.0,                 # yflip
        2, 0.0,                 # rotate_int
        np.array([1, 1]).reshape(2, 1, 1, 1, 1), 0.0,  # translate_int
        -0.4, 0.0,              # scale
        0.6, 0.0,               # brightness
        0.5, 0.0,               # contrast
        1, 0.0,                 # lumaflip
        raw_hue, 0.0,           # hue
        -1.1, 0.0,              # saturation
    ]
    params = AugmentParams(
        xflip=1, yflip=1, rotate_int=2, translate_int=(1, 1), scale=-0.4,
        brightness=0.6, contrast=0.5, lumaflip=1,
        hue=(raw_hue * 2 - 1) * np.pi, saturation=-1.1,
    )
    _compare(ref_mod, images, kwargs, draws, params)


def test_parity_grayscale_color_path(ref_mod):
    imgs = np.random.default_rng(1).random((2, 1, 16, 16)).astype(np.float32)
    _compare(
        ref_mod, imgs, dict(brightness=1, saturation=1),
        [0.8, 0.0, 1.3, 0.0],
        AugmentParams(brightness=0.8, saturation=1.3),
    )


def test_gating_distribution():
    """sample() honors the multiplier*p gates and repeats one param set per
    clip (the fork's execute_and_repeat semantics)."""
    pipe = AugmentPipe(p=1.0, xflip=1.0, brightness=0.0)
    rng = np.random.RandomState(0)
    flips = [pipe.sample(rng).xflip for _ in range(200)]
    assert 0.3 < np.mean(flips) < 0.7  # randint(2) always gated on
    assert all(p.brightness == 0.0 for p in [pipe.sample(rng) for _ in range(10)])
    pipe0 = AugmentPipe(p=0.0, xflip=1.0)
    assert all(pipe0.sample(rng).xflip == 0 for _ in range(20))


def test_call_shapes_and_dtype():
    pipe = AugmentPipe(
        p=1.0, xflip=1, yflip=1, rotate_int=1, translate_int=1, scale=1,
        brightness=1, contrast=1, lumaflip=1, hue=1, saturation=1,
    )
    v = np.random.default_rng(2).random((4, 24, 24, 3)).astype(np.float32)
    out = pipe(v, np.random.RandomState(3))
    assert out.shape == v.shape and out.dtype == np.float32
    # identity when nothing enabled
    out2 = AugmentPipe(p=1.0)(v, np.random.RandomState(4))
    np.testing.assert_allclose(out2, v)
