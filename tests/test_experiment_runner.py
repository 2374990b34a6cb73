"""End-to-end experiment runner test: tiny model + tiny disk dataset, one
epoch of train+eval, checkpoint/log contract, resume semantics, test stage.

Pattern follows the Real-ESRGAN test suite the reference bundles (build the
full experiment from config, feed tiny fixtures, assert wiring + outputs).
"""

import os
from pathlib import Path

import numpy as np
import pytest
from PIL import Image

from sisr_tpu.experiments.hitsir_pro_experiment import hitsir_pro_experiment

TINY_KW = dict(
    loss="l1",
    is_mult_size_conv_feat_extract=True,
    is_channel_spatial_attn=True,
    is_fusion=True,
    is_augment=True,
    batch_size=2,
    test_model_name="best_psnr_ssim_lpips_model.pth",
    embed_dim=20,
    base_win_size=[4, 4],
    depths=[2],
    num_heads=[2],
    mlp_ratio=2,
    upsampler="nearest+conv",
    hier_win_ratios=[0.5, 1],
    train_data_name_list=["setA"],
    eval_data_name_list=["setB"],
    test_data_name_list=["setB"],
    progress=False,
    eval_tile=64,
    eval_tile_overlap=8,
)


def _make_data(root):
    rng = np.random.default_rng(0)
    for split, name, n, size in [("train", "setA", 2, (300, 280)),
                                 ("eval", "setB", 1, (96, 84)),
                                 ("test", "setB", 1, (96, 84))]:
        d = root / "data" / split / name
        d.mkdir(parents=True)
        for i in range(n):
            arr = (rng.random((size[1], size[0], 3)) * 255).astype(np.uint8)
            Image.fromarray(arr).save(d / f"im{i}.png")
    return root


@pytest.fixture(scope="module")
def workdir(tmp_path_factory):
    return _make_data(tmp_path_factory.mktemp("exp"))


def test_eval_mode_whole_vs_tiled(ran_experiment):
    """Default eval follows the reference whole-image protocol; the tiled
    serving path must stay metrically close (seam blending, same weights)."""
    exp, _ = ran_experiment
    lr = np.random.default_rng(3).random((1, 24, 20, 3), dtype=np.float32)
    exp.eval_mode = "whole"
    whole = exp._infer_one(lr)
    exp.eval_mode = "tiled"
    tiled = exp._infer_one(lr)
    exp.eval_mode = "whole"
    assert whole.shape == tiled.shape == (1, 96, 80, 3)
    mse = float(np.mean((whole - tiled) ** 2))
    psnr = 10 * np.log10(1.0 / max(mse, 1e-12))
    # untrained weights are the worst case for seam agreement (measured
    # ~26 dB); trained smooth models sit far above — metric-parity claims
    # use the default whole-image protocol, tiled is the serving path
    assert psnr > 20.0, f"tiled-vs-whole PSNR {psnr:.1f} dB"


def test_eval_precision_exact(ran_experiment):
    """eval_precision='exact' (f32 + matmul precision 'highest' + kernels
    off — utils/precision.py) must reproduce a plain f32 forward of the same
    weights and restore the kernel gates afterwards."""
    exp, root = ran_experiment
    lr = np.random.default_rng(7).random((1, 24, 20, 3), dtype=np.float32)

    import jax.numpy as jnp
    f32_model = exp.model.clone(dtype=jnp.float32, parent=None)
    want = np.clip(np.asarray(
        f32_model.apply({"params": exp.state.params}, jnp.asarray(lr))), 0, 1)

    cwd = os.getcwd()
    os.chdir(root)  # init_model writes the param-count log (relative path)
    exp.eval_precision = "exact"
    try:
        exp.init_model()  # rebuilds _whole_eval/tiled with the exact model
        got = exp._infer_one(lr)
    finally:
        exp.eval_precision = "fast"
        exp.init_model()
        os.chdir(cwd)
    np.testing.assert_allclose(got, want, atol=1e-6)
    assert os.environ.get("SISR_FUSED_FFN", "1") == "1"  # gate restored


def test_eval_band_area_routing_boundary(ran_experiment):
    """Whole-image eval routes through the banded-head runner exactly at
    eval_band_area (inclusive); both paths produce the same pixels."""
    exp, _ = ran_experiment
    lr = np.random.default_rng(5).random((1, 24, 20, 3), dtype=np.float32)
    area = 24 * 20

    assert exp._banded_eval is not None  # nearest+conv upsampler
    calls = []
    real = exp._banded_eval

    def spy(variables, x):
        calls.append(x.shape)
        return real(variables, x)

    exp.eval_mode = "whole"
    old = exp._band_area
    try:
        exp._banded_eval = spy
        exp._band_area = area + 1  # just above -> plain whole forward
        a = exp._infer_one(lr)
        assert calls == []
        exp._band_area = area      # at the threshold -> banded (>= inclusive)
        b = exp._infer_one(lr)
        assert len(calls) == 1
    finally:
        exp._band_area = old
        exp._banded_eval = real
    np.testing.assert_allclose(a, b, atol=1e-5)


def test_eval_bucket_bounds_compiles(ran_experiment):
    """eval_bucket pads whole-image eval shapes up to bucket multiples: one
    compiled program serves many image sizes, and the cropped metrics stay
    within a small tolerance of the exact-shape protocol (this model is not
    padding-invariant, so exact equality is impossible by construction)."""
    exp, _ = ran_experiment
    rng = np.random.default_rng(11)
    sizes = [(20, 24), (22, 21), (24, 18), (17, 23)]
    imgs = [rng.random((1, h, w, 3), dtype=np.float32) for h, w in sizes]

    exp.eval_mode = "whole"
    exp.eval_bucket = None
    exact = [exp._infer_one(im) for im in imgs]

    exp.eval_bucket = 24
    before = exp._whole_eval._cache_size()
    bucketed = [exp._infer_one(im) for im in imgs]
    compiles = exp._whole_eval._cache_size() - before
    exp.eval_bucket = None
    # 4 distinct shapes -> at most 1 new program (24x24); all others pad to it
    assert compiles <= 1, compiles
    for (h, w), a, b in zip(sizes, exact, bucketed):
        assert b.shape == a.shape == (1, h * 4, w * 4, 3)
        mse = float(np.mean((a - b) ** 2))
        psnr = 10 * np.log10(1.0 / max(mse, 1e-12))
        # random-init weights are the worst case (same bar as the
        # tiled-vs-whole test); trained smooth models sit far above
        assert psnr > 20.0, f"bucketed-vs-exact PSNR {psnr:.1f} dB at {(h, w)}"


def test_runner_process_pool_matches_thread_loader(ran_experiment,
                                                   tmp_path_factory):
    """The default train loader is the process pool (ModelConfig
    loader_worker_type='process'); per-item seeding makes the epoch
    identical to a thread-loader run — same loss, same logs."""
    exp, _ = ran_experiment  # ran with the process-pool default
    assert exp.train_loaders[0].worker_type == "process"
    root = _make_data(tmp_path_factory.mktemp("thr"))
    cwd = os.getcwd()
    os.chdir(root)
    try:
        thr = hitsir_pro_experiment(is_test=False, epochs=1,
                                    loader_worker_type="thread", **TINY_KW)
    finally:
        os.chdir(cwd)
    assert thr.train_loaders[0].worker_type == "thread"
    np.testing.assert_allclose(float(exp.epoch_loss.avg),
                               float(thr.epoch_loss.avg), rtol=1e-5)
    folder = ("hitsir_pro_loss(l1)_mulsizeconvextract(True)_casa(True)"
              "_fusion_embed_dim(20)_len(depths)(1)_augment")
    a = (ran_experiment[1] / "logs" / folder / "loss_log.txt").read_text()
    b = (root / "logs" / folder / "loss_log.txt").read_text()
    assert a.splitlines()[0] == b.splitlines()[0]


def test_runner_data_parallel_matches_single_device(tmp_path_factory):
    """The n_devices knob trains on the CPU mesh and reproduces the
    single-device run (same seeds): same loss, same params, same artifacts."""
    import jax

    def run(n_devices):
        root = _make_data(tmp_path_factory.mktemp(f"dp{n_devices or 1}"))
        cwd = os.getcwd()
        os.chdir(root)
        try:
            exp = hitsir_pro_experiment(is_test=False, epochs=1,
                                        n_devices=n_devices, **TINY_KW)
        finally:
            os.chdir(cwd)
        return exp, root

    single, root1 = run(None)
    dp, root2 = run(2)
    assert dp.mesh is not None
    assert len(dp.state.params["norm"]["scale"].sharding.device_set) == 2
    np.testing.assert_allclose(float(single.epoch_loss.avg),
                               float(dp.epoch_loss.avg), rtol=1e-4)
    for a, b in zip(jax.tree.leaves(single.state.params),
                    jax.tree.leaves(dp.state.params)):
        np.testing.assert_allclose(np.asarray(a), np.asarray(b),
                                   atol=3e-5, rtol=1e-3)
    folder = ("hitsir_pro_loss(l1)_mulsizeconvextract(True)_casa(True)"
              "_fusion_embed_dim(20)_len(depths)(1)_augment")
    for root in (root1, root2):
        assert (root / "weights" / folder / "new_epoch_model.pth").exists()
        assert (root / "logs" / folder / "loss_log.txt").exists()


@pytest.fixture(scope="module")
def ran_experiment(workdir):
    cwd = os.getcwd()
    os.chdir(workdir)
    try:
        exp = hitsir_pro_experiment(is_test=False, epochs=1, **TINY_KW)
    finally:
        os.chdir(cwd)
    return exp, workdir


def test_train_eval_artifacts(ran_experiment):
    exp, root = ran_experiment
    folder = ("hitsir_pro_loss(l1)_mulsizeconvextract(True)_casa(True)"
              "_fusion_embed_dim(20)_len(depths)(1)_augment")
    weights = root / "weights" / folder
    logs = root / "logs" / folder
    assert (weights / "new_epoch_model.pth").exists()
    assert (weights / "best_psnr_model.pth").exists()
    assert (weights / "best_psnr_ssim_lpips_model.pth").exists()
    for log in ["loss_log.txt", "lr_log.txt", "psnr_ssim_lpips_log.txt",
                "best_epoch_psnr_ssim_lpips_log.txt",
                "train_eval_seconds_consume_log.txt",
                "total_seconds_consume_log.txt", "模型参数量.txt"]:
        assert (logs / log).exists(), log
    rows = (logs / "psnr_ssim_lpips_log.txt").read_text().splitlines()
    assert len(rows) == 1 and rows[0].startswith("epoch:00001")
    psnr = float(rows[0].split()[1])
    assert 3 < psnr < 60


def test_resume_continues_from_checkpoint(ran_experiment):
    _, root = ran_experiment
    cwd = os.getcwd()
    os.chdir(root)
    try:
        exp2 = hitsir_pro_experiment(is_test=False, epochs=2, run=False, **TINY_KW)
        assert exp2.start_epoch == 2  # resumed past epoch 1
        exp2.run()
    finally:
        os.chdir(cwd)
    folder = ("hitsir_pro_loss(l1)_mulsizeconvextract(True)_casa(True)"
              "_fusion_embed_dim(20)_len(depths)(1)_augment")
    rows = (root / "logs" / folder / "loss_log.txt").read_text().splitlines()
    assert len(rows) == 2
    assert rows[1].startswith("epoch:00002")


def test_interrupted_eval_repair(ran_experiment):
    """If the loss log is one epoch ahead of the metric log (training was
    killed mid-eval), run() backfills the missing eval before training
    (reference experiment.py:826-833)."""
    _, root = ran_experiment
    folder = ("hitsir_pro_loss(l1)_mulsizeconvextract(True)_casa(True)"
              "_fusion_embed_dim(20)_len(depths)(1)_augment")
    logs = root / "logs" / folder
    metrics_path = logs / "psnr_ssim_lpips_log.txt"
    saved = metrics_path.read_text()
    try:
        # simulate the interruption: drop the last epoch's metric row
        rows = saved.splitlines()
        metrics_path.write_text("\n".join(rows[:-1]) + ("\n" if rows[:-1] else ""))
        cwd = os.getcwd()
        os.chdir(root)
        try:
            exp = hitsir_pro_experiment(is_test=False, epochs=len(rows),
                                        run=False, **TINY_KW)
            assert exp.start_epoch - 2 == len(exp.psnr_ssim_lpips_log)
            exp.run()
        finally:
            os.chdir(cwd)
        repaired = metrics_path.read_text().splitlines()
        assert len(repaired) >= len(rows)
        assert repaired[len(rows) - 1].startswith(f"epoch:{len(rows):05d}")
    finally:
        metrics_path.write_text(saved)


def test_test_stage_outputs(ran_experiment):
    _, root = ran_experiment
    cwd = os.getcwd()
    os.chdir(root)
    try:
        hitsir_pro_experiment(is_test=True, epochs=2, **TINY_KW)
    finally:
        os.chdir(cwd)
    folder = ("hitsir_pro_loss(l1)_mulsizeconvextract(True)_casa(True)"
              "_fusion_embed_dim(20)_len(depths)(1)_augment")
    result = root / "results" / folder / "best_psnr_ssim_lpips_model" / "setB"
    assert (result / "im0_hr.png").exists()
    assert (result / "im0_sr.png").exists()
    assert (result / "test_log.txt").exists()
    sr = np.asarray(Image.open(result / "im0_sr.png"))
    hr = np.asarray(Image.open(result / "im0_hr.png"))
    assert sr.shape == hr.shape
