"""Data pipeline: transforms, degradation statistics, dataset/loader wiring."""

import os
import random

import numpy as np
import pytest
from PIL import Image

from sisr_tpu.configs.dataset_config import DatasetConfig
from sisr_tpu.data.dataset import DataLoader, SRDataset
from sisr_tpu.data.degradation import (add_jpeg_noise, anisotropic_gaussian_kernel,
                                       degradation_bsrgan, gaussian_kernel,
                                       paired_random_crop)
from sisr_tpu.data.transforms import ImageTransforms, augment, convert_image


@pytest.fixture(scope="module")
def image_dir(tmp_path_factory):
    """Tiny on-disk dataset fixture (Real-ESRGAN test style)."""
    d = tmp_path_factory.mktemp("imgs")
    rng = np.random.default_rng(0)
    for i, size in enumerate([(300, 280), (320, 300)]):
        arr = (rng.random((size[1], size[0], 3)) * 255).astype(np.uint8)
        Image.fromarray(arr).save(d / f"img{i}.png")
    return str(d)


def test_convert_image_roundtrip():
    rng = np.random.default_rng(1)
    img = rng.random((8, 8, 3)).astype(np.float32)
    np.testing.assert_allclose(
        convert_image(convert_image(img, "[0,1]", "[-1,1]"), "[-1,1]", "[0,1]"),
        img, atol=1e-6)
    y = convert_image(img, "[0,1]", "y-channel")
    assert y.shape == (8, 8)


def test_image_transforms_shared_box():
    img = Image.fromarray((np.random.default_rng(2).random((300, 300, 3)) * 255)
                          .astype(np.uint8))
    hr_t = ImageTransforms("train", 256, 4, "[0,1]", is_lr=False, is_lr_amplify=False)
    lr_t = ImageTransforms("train", 256, 4, "[0,1]", is_lr=True, is_lr_amplify=False)
    hr, box = hr_t(img)
    lr, _ = lr_t(img, box=box)
    assert hr.shape == (256, 256, 3)
    assert lr.shape == (64, 64, 3)


def test_image_transforms_eval_modcrop():
    img = Image.fromarray(np.zeros((107, 205, 3), dtype=np.uint8))
    t = ImageTransforms("eval|test", 256, 4, "[0,1]", is_lr=False, is_lr_amplify=False)
    out, box = t(img)
    assert out.shape[0] % 4 == 0 and out.shape[1] % 4 == 0
    assert out.shape == (104, 204, 3)


def test_augment_ops():
    rng = np.random.default_rng(3)
    img = rng.random((16, 16, 3)).astype(np.float32)
    np.testing.assert_array_equal(augment(img, True, False, False), img[:, ::-1, :])
    np.testing.assert_array_equal(augment(img, False, True, False), img[::-1, :, :])
    np.testing.assert_array_equal(augment(img, False, False, True),
                                  img.transpose(1, 0, 2))
    # hflip/vflip are involutions
    np.testing.assert_array_equal(
        augment(augment(img, True, True, False), True, True, False), img)


def test_gaussian_kernels_normalized():
    k = gaussian_kernel(15, 2.0)
    assert abs(k.sum() - 1) < 1e-9
    ka = anisotropic_gaussian_kernel(15, 0.7, 4.0, 1.0)
    assert abs(ka.sum() - 1) < 1e-9
    assert ka.min() >= 0
    # anisotropic: not rotation symmetric
    assert not np.allclose(ka, ka.T, atol=1e-6)


def test_jpeg_noise_changes_image_but_stays_close():
    rng = random.Random(0)
    img = np.clip(np.random.default_rng(4).random((64, 64, 3)).astype(np.float32), 0, 1)
    out = add_jpeg_noise(img, rng)
    assert out.shape == img.shape
    assert 0 <= out.min() and out.max() <= 1
    assert not np.allclose(out, img)


def test_paired_random_crop_alignment():
    rng = random.Random(1)
    hq = np.arange(128 * 128 * 3, dtype=np.float32).reshape(128, 128, 3)
    lq = hq[::4, ::4] / 16.0
    lq_c, hq_c = paired_random_crop(lq, hq, 4, 16, rng)
    assert lq_c.shape == (16, 16, 3)
    assert hq_c.shape == (64, 64, 3)
    np.testing.assert_allclose(hq_c[::4, ::4] / 16.0, lq_c)


def test_degradation_bsrgan_shapes_and_range():
    rng = random.Random(5)
    nrng = np.random.default_rng(5)
    hr = np.clip(np.random.default_rng(6).random((280, 300, 3)).astype(np.float32), 0, 1)
    for _ in range(4):  # multiple draws hit different stage orders
        lq, hq = degradation_bsrgan(hr, sf=4, lq_patchsize=64, rng=rng, nrng=nrng)
        assert lq.shape == (64, 64, 3)
        assert hq.shape == (256, 256, 3)
        assert 0 <= lq.min() and lq.max() <= 1
        # the degraded patch differs substantially from plain bicubic
        assert lq.std() > 0.01


def test_degradation_statistics():
    """Distribution-level checks over many draws (exact stochastic replay of
    the reference is impossible — SURVEY.md §7 'stochasticity parity')."""
    from sisr_tpu.ops.resize import imresize_matlab_np

    rng = random.Random(42)
    nrng = np.random.default_rng(42)
    base = np.clip(np.random.default_rng(7).random((280, 300, 3)).astype(np.float32),
                   0, 1)
    psnrs = []
    for _ in range(12):
        lq, hq = degradation_bsrgan(base, sf=4, lq_patchsize=64, rng=rng, nrng=nrng)
        clean = imresize_matlab_np(hq, 0.25)
        mse = float(np.mean((lq - np.clip(clean, 0, 1)) ** 2))
        psnrs.append(10 * np.log10(1.0 / max(mse, 1e-12)))
    psnrs = np.asarray(psnrs)
    # degraded patches differ from clean bicubic, but are still related
    assert psnrs.mean() < 40.0, "degradation too weak"
    assert psnrs.mean() > 5.0, "degradation destroyed the signal"
    assert psnrs.std() > 0.1, "no stochastic variety across draws"


def test_degradation_too_small_raises():
    with pytest.raises(ValueError):
        degradation_bsrgan(np.zeros((64, 64, 3), np.float32), sf=4, lq_patchsize=64)


def test_dataset_train_items(image_dir):
    cfg = DatasetConfig(split="train", crop_size=64, scaling_factor=4, is_augment=True)
    ds = SRDataset(cfg, image_dir)
    assert len(ds) == 2
    lr, hr, (name, suffix) = ds[0]
    assert lr.shape == (64, 64, 3)
    assert hr.shape == (256, 256, 3)
    assert suffix == "png"


def test_dataset_seeded_items_reproducible(image_dir):
    """With a seed, item randomness (crop/augment/degradation) is a pure
    function of (seed, epoch, index) — and epochs differ."""
    cfg = DatasetConfig(split="train", crop_size=64, scaling_factor=4, is_augment=True)
    ds_a = SRDataset(cfg, image_dir, seed=7)
    ds_b = SRDataset(cfg, image_dir, seed=7)
    lr_a, hr_a, _ = ds_a[0]
    lr_b, hr_b, _ = ds_b[0]
    np.testing.assert_array_equal(lr_a, lr_b)
    np.testing.assert_array_equal(hr_a, hr_b)
    ds_b.epoch = 1
    lr_c, _, _ = ds_b[0]
    assert not np.array_equal(lr_a, lr_c)
    # unseeded datasets draw fresh randomness per call
    ds_u = SRDataset(cfg, image_dir)
    assert not np.array_equal(ds_u[0][0], ds_u[0][0])


def test_dataset_eval_items(image_dir):
    cfg = DatasetConfig(split="eval|test", crop_size=64, scaling_factor=4)
    ds = SRDataset(cfg, image_dir)
    lr, hr, _ = ds[0]
    assert hr.shape[0] == lr.shape[0] * 4
    assert hr.shape[1] == lr.shape[1] * 4


def test_device_prefetch_passthrough():
    from sisr_tpu.data.prefetch import device_prefetch

    items = [(np.ones((2, 4, 4, 3), np.float32) * i,
              np.ones((2, 8, 8, 3), np.float32) * i,
              ([f"n{i}"], ["png"])) for i in range(5)]
    out = list(device_prefetch(iter(items), size=2))
    assert len(out) == 5
    for i, (lr, hr, names) in enumerate(out):
        assert float(np.asarray(lr).mean()) == i
        assert names == ([f"n{i}"], ["png"])
        assert hasattr(lr, "devices") or hasattr(lr, "device")  # on device


def test_dataloader_process_pool_matches_threads(image_dir):
    """The spawn-based degradation worker pool yields the exact batches of
    the in-process path (seeded dataset => order + values reproducible)."""
    cfg = DatasetConfig(split="train", crop_size=64, scaling_factor=4)
    mk = lambda wt: DataLoader(SRDataset(cfg, image_dir, seed=5), batch_size=2,
                               shuffle=True, drop_last=True, num_workers=2,
                               seed=3, worker_type=wt)
    thread_loader, proc_loader = mk("thread"), mk("process")
    try:
        a = list(thread_loader)
        b = list(proc_loader)
        assert len(a) == len(b) == 1
        np.testing.assert_array_equal(a[0][0], b[0][0])
        np.testing.assert_array_equal(a[0][1], b[0][1])
        assert a[0][2] == b[0][2]
        # second epoch draws fresh randomness and still matches
        a2, b2 = next(iter(thread_loader)), next(iter(proc_loader))
        np.testing.assert_array_equal(a2[0], b2[0])
        assert not np.array_equal(a[0][0], a2[0])
    finally:
        proc_loader.close()


@pytest.mark.parametrize("workers", [0, 2])
def test_dataloader_batches(image_dir, workers):
    cfg = DatasetConfig(split="train", crop_size=64, scaling_factor=4)
    ds = SRDataset(cfg, image_dir)
    loader = DataLoader(ds, batch_size=2, shuffle=True, drop_last=True,
                        num_workers=workers, seed=0)
    batches = list(loader)
    assert len(batches) == len(loader) == 1
    lr, hr, names = batches[0]
    assert lr.shape == (2, 64, 64, 3)
    assert hr.shape == (2, 256, 256, 3)
    assert lr.dtype == np.float32


def test_degradation_bsrgan_plus_shapes_and_variety():
    """Extended BSRGAN+Real-ESRGAN recipe (KAIR utils_blindsr.py:521-605):
    aligned pair shapes, stochastic variety, sharpening branch."""
    import random as pyrandom
    from sisr_tpu.data.degradation import degradation_bsrgan_plus

    rng = pyrandom.Random(0)
    nrng = np.random.default_rng(0)
    img = np.random.default_rng(1).random((280, 300, 3)).astype(np.float32)
    lqs = []
    for i in range(3):
        lq, hq = degradation_bsrgan_plus(img, sf=4, lq_patchsize=64,
                                         use_sharp=(i == 2), rng=rng, nrng=nrng)
        assert lq.shape == (64, 64, 3) and hq.shape == (256, 256, 3)
        assert lq.min() >= 0.0 and lq.max() <= 1.0
        lqs.append(lq)
    assert not np.array_equal(lqs[0], lqs[1])
    with pytest.raises(ValueError):
        degradation_bsrgan_plus(np.zeros((64, 64, 3), np.float32), sf=4,
                                lq_patchsize=64)
