"""Numerics substrate tests: resize, color, windows, pixel shuffle, metrics."""

from pathlib import Path

import numpy as np
import pytest

import jax.numpy as jnp

from sisr_tpu.ops.resize import (imresize_matlab, imresize_matlab_np,
                                 nearest_upsample, bilinear_resize)
from sisr_tpu.ops.color import rgb_to_y
from sisr_tpu.ops.windows import window_partition, window_reverse, pad_to_multiple
from sisr_tpu.ops.pixel_shuffle import pixel_shuffle, pixel_unshuffle
from sisr_tpu.ops.metrics import psnr, ssim, psnr_jax, ssim_jax

GOLDEN = Path(__file__).parent / "golden"


# --------------------------------------------------------------------------
# MATLAB bicubic resize: golden parity with the reference implementation
# --------------------------------------------------------------------------

@pytest.mark.parametrize("key", ["scale_0.25", "scale_0.5", "scale_0.3",
                                 "scale_2.0", "scale_1.7", "scale_4.0",
                                 "scale_0.25_noaa"])
def test_imresize_matches_reference(key):
    blob = np.load(GOLDEN / "imresize.npz")
    img = blob["input"].transpose(1, 2, 0)  # CHW -> HWC
    scale = float(key.split("_")[1])
    antialias = not key.endswith("noaa")
    ref = blob[key].transpose(1, 2, 0)

    out_np = imresize_matlab_np(img, scale, antialias)
    assert out_np.shape == ref.shape
    np.testing.assert_allclose(out_np, ref, atol=2e-6)

    out_jax = np.asarray(imresize_matlab(jnp.asarray(img), scale, antialias))
    np.testing.assert_allclose(out_jax, ref, atol=1e-5)


def test_nearest_upsample_matches_torch():
    import torch

    x = np.random.default_rng(0).random((2, 5, 7, 3), dtype=np.float32)
    got = np.asarray(nearest_upsample(jnp.asarray(x), 2))
    ref = torch.nn.functional.interpolate(
        torch.from_numpy(x.transpose(0, 3, 1, 2)), scale_factor=2, mode="nearest"
    ).numpy().transpose(0, 2, 3, 1)
    np.testing.assert_allclose(got, ref, atol=0)


def test_bilinear_matches_torch():
    import torch

    x = np.random.default_rng(1).random((2, 6, 5, 4), dtype=np.float32)
    got = np.asarray(bilinear_resize(jnp.asarray(x), 12, 10))
    ref = torch.nn.functional.interpolate(
        torch.from_numpy(x.transpose(0, 3, 1, 2)), scale_factor=2,
        mode="bilinear", align_corners=False).numpy().transpose(0, 2, 3, 1)
    np.testing.assert_allclose(got, ref, atol=1e-6)


# --------------------------------------------------------------------------
# color / windows / shuffle
# --------------------------------------------------------------------------

def test_rgb_to_y_formula():
    img = np.random.default_rng(2).random((2, 4, 4, 3), dtype=np.float32)
    y = np.asarray(rgb_to_y(jnp.asarray(img)))
    ref = 16.0 / 255 + (65.738 * img[..., 0] + 129.057 * img[..., 1]
                        + 25.064 * img[..., 2]) / 256.0
    np.testing.assert_allclose(y, ref, atol=1e-6)


def test_window_roundtrip():
    x = jnp.arange(2 * 8 * 12 * 3, dtype=jnp.float32).reshape(2, 8, 12, 3)
    w = window_partition(x, (4, 4))
    assert w.shape == (2 * 2 * 3, 16, 3)
    back = window_reverse(w, (4, 4), 8, 12)
    np.testing.assert_array_equal(np.asarray(back), np.asarray(x))


def test_pad_to_multiple_reflect_matches_torch():
    import torch

    x = np.random.default_rng(3).random((1, 5, 7, 2), dtype=np.float32)
    got = np.asarray(pad_to_multiple(jnp.asarray(x), (4, 4)))
    t = torch.from_numpy(x.transpose(0, 3, 1, 2))
    ref = torch.nn.functional.pad(t, (0, 1, 0, 3), "reflect").numpy().transpose(0, 2, 3, 1)
    np.testing.assert_array_equal(got, ref)


def test_pixel_shuffle_matches_torch():
    import torch

    x = np.random.default_rng(4).random((2, 3, 5, 12), dtype=np.float32)
    got = np.asarray(pixel_shuffle(jnp.asarray(x), 2))
    ref = torch.pixel_shuffle(torch.from_numpy(x.transpose(0, 3, 1, 2)), 2)
    np.testing.assert_array_equal(got, ref.numpy().transpose(0, 2, 3, 1))

    back = np.asarray(pixel_unshuffle(jnp.asarray(got), 2))
    np.testing.assert_array_equal(back, x)


# --------------------------------------------------------------------------
# metrics
# --------------------------------------------------------------------------

def test_psnr_basic():
    a = np.zeros((8, 8))
    b = np.full((8, 8), 0.1)
    assert abs(psnr(a, b, 1.0) - 20.0) < 1e-9
    assert psnr(a, a) == float("inf")


def test_ssim_self_is_one():
    rng = np.random.default_rng(5)
    a = rng.random((32, 32))
    assert abs(ssim(a, a) - 1.0) < 1e-9
    assert abs(ssim(a, a, gaussian_weights=True) - 1.0) < 1e-9


def test_ssim_decreases_with_noise():
    rng = np.random.default_rng(6)
    a = rng.random((48, 48))
    s1 = ssim(a, np.clip(a + rng.normal(0, 0.02, a.shape), 0, 1))
    s2 = ssim(a, np.clip(a + rng.normal(0, 0.2, a.shape), 0, 1))
    assert 0 < s2 < s1 < 1


def test_jax_metrics_match_numpy():
    rng = np.random.default_rng(7)
    a = rng.random((40, 40)).astype(np.float32)
    b = np.clip(a + rng.normal(0, 0.05, a.shape), 0, 1).astype(np.float32)
    # jax variants run float32; the numpy oracles run float64
    assert abs(float(psnr_jax(jnp.asarray(a), jnp.asarray(b))) - psnr(a, b)) < 1e-3
    for gauss in (False, True):
        sj = float(ssim_jax(jnp.asarray(a), jnp.asarray(b), gaussian_weights=gauss))
        sn = ssim(a, b, gaussian_weights=gauss)
        assert abs(sj - sn) < 2e-4, (gauss, sj, sn)
