"""End-to-end GAN fine-tune experiment: one epoch of the two-optimizer step
through the real runner (parity with the reference's GAN training lifecycle:
G pre-seeded from a PSNR run, D checkpoint drives resume epoch)."""

import os

import numpy as np
import pytest
from PIL import Image

from sisr_tpu.experiments.hitsir_pro_gan_experiment import hitsir_pro_gan_experiment

TINY_KW = dict(
    loss="l1",
    is_mult_size_conv_feat_extract=False,
    is_channel_spatial_attn=False,
    is_fusion=False,
    is_augment=False,
    batch_size=2,
    test_model_name="best_psnr_ssim_lpips_model.pth",
    embed_dim=20,
    base_win_size=[4, 4],
    depths=[1],
    num_heads=[2],
    mlp_ratio=1,
    upsampler="nearest+conv",
    hier_win_ratios=[1],
    train_data_name_list=["setA"],
    eval_data_name_list=["setB"],
    test_data_name_list=["setB"],
    progress=False,
    eval_tile=64,
    eval_tile_overlap=8,
)


@pytest.fixture(scope="module")
def workdir(tmp_path_factory):
    root = tmp_path_factory.mktemp("gan_exp")
    rng = np.random.default_rng(0)
    for split, name, n, size in [("train", "setA", 2, (300, 280)),
                                 ("eval", "setB", 1, (72, 68)),
                                 ("test", "setB", 1, (72, 68))]:
        d = root / "data" / split / name
        d.mkdir(parents=True)
        for i in range(n):
            arr = (rng.random((size[1], size[0], 3)) * 255).astype(np.uint8)
            Image.fromarray(arr).save(d / f"im{i}.png")
    return root


def test_gan_one_epoch(workdir):
    cwd = os.getcwd()
    os.chdir(workdir)
    try:
        exp = hitsir_pro_gan_experiment(is_test=False, epochs=1, **TINY_KW)
    finally:
        os.chdir(cwd)

    folder = ("hitsir_pro_gan_loss(l1)_mulsizeconvextract(False)_casa(False)"
              "_embed_dim(20)_len(depths)(1)")
    weights = workdir / "weights" / folder
    assert (weights / "new_epoch_model.pth").exists()
    assert (weights / "discriminator_new_epoch_model.pth").exists()
    loss_rows = (workdir / "logs" / folder / "loss_log.txt").read_text().splitlines()
    assert len(loss_rows) == 1
    # GAN loss log carries both generator and discriminator losses
    assert "d_loss:" in loss_rows[0]
    g_loss = float(loss_rows[0].split()[1].split("loss:")[1])
    assert np.isfinite(g_loss) and g_loss > 0
