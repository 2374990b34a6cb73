"""Pretrained-weights intake, end to end on synthetic weights.

The build environment has no egress, so real torchvision-VGG / lpips
checkpoints cannot exist here; these tests prove the *pipeline* a user runs
the day they have the files (VERDICT r2 #7): the ``tools/convert_vgg.py``
CLI converts torch ``.pth`` checkpoints into framework msgpack files, and
``Experiment(lpips_weights_path=...)`` picks the file up and logs a real
LPIPS instead of the gated 1.0 sentinel.  Value-level converter parity
against recorded torch activations is covered by tests/test_vgg_parity.py.
"""

import os
import sys
from pathlib import Path

import numpy as np
import pytest

torch = pytest.importorskip("torch")

# torchvision vgg16 "features" conv layer indices and their out-channels
VGG16_CONVS = [(0, 3, 64), (2, 64, 64), (5, 64, 128), (7, 128, 128),
               (10, 128, 256), (12, 256, 256), (14, 256, 256),
               (17, 256, 512), (19, 512, 512), (21, 512, 512),
               (24, 512, 512), (26, 512, 512), (28, 512, 512)]
LPIPS_TAP_CH = [64, 128, 256, 512, 512]


def _write_synthetic_pths(tmp: Path):
    g = torch.Generator().manual_seed(7)
    vgg = {}
    for idx, cin, cout in VGG16_CONVS:
        vgg[f"features.{idx}.weight"] = torch.randn(
            (cout, cin, 3, 3), generator=g) * 0.05
        vgg[f"features.{idx}.bias"] = torch.randn((cout,), generator=g) * 0.05
    lpips = {f"lin{i}.model.1.weight":
             torch.rand((1, c, 1, 1), generator=g) + 0.01
             for i, c in enumerate(LPIPS_TAP_CH)}
    vgg_path, lpips_path = tmp / "vgg16.pth", tmp / "lpips_vgg.pth"
    torch.save(vgg, vgg_path)
    torch.save(lpips, lpips_path)
    return vgg_path, lpips_path


@pytest.fixture(scope="module")
def converted_lpips(tmp_path_factory):
    tmp = tmp_path_factory.mktemp("weights")
    vgg_path, lpips_path = _write_synthetic_pths(tmp)
    out = tmp / "lpips_vgg.msgpack"
    from tools import convert_vgg

    argv = sys.argv
    sys.argv = ["convert_vgg.py", "lpips", str(vgg_path), str(lpips_path),
                str(out)]
    try:
        convert_vgg.main()
    finally:
        sys.argv = argv
    assert out.exists() and out.stat().st_size > 1_000_000
    return out


def test_convert_vgg_cli_output_loads(converted_lpips):
    import jax
    import jax.numpy as jnp
    from flax import serialization
    from sisr_tpu.models.vgg import LPIPSVgg

    with open(converted_lpips, "rb") as f:
        variables = serialization.msgpack_restore(f.read())
    model = LPIPSVgg()
    a = jnp.zeros((1, 32, 32, 3))
    b = jnp.full((1, 32, 32, 3), 0.25)
    same = model.apply({"params": variables["params"]}, a, a)
    diff = model.apply({"params": variables["params"]}, a, b)
    assert abs(float(same[0])) < 1e-6
    assert float(diff[0]) > 0  # positive lin heads -> positive distance


def test_experiment_logs_real_lpips(converted_lpips, tmp_path_factory):
    """eval with a weights file logs a real LPIPS, not the 1.0 sentinel, and
    the combined-best rule sees the genuine metric."""
    from tests.test_experiment_runner import TINY_KW, _make_data
    from sisr_tpu.experiments.hitsir_pro_experiment import hitsir_pro_experiment

    root = _make_data(tmp_path_factory.mktemp("lpipsexp"))
    cwd = os.getcwd()
    os.chdir(root)
    try:
        exp = hitsir_pro_experiment(
            is_test=False, epochs=1, lpips_weights_path=str(converted_lpips),
            **TINY_KW)
    finally:
        os.chdir(cwd)
    assert exp.lpips is not None
    folder = ("hitsir_pro_loss(l1)_mulsizeconvextract(True)_casa(True)"
              "_fusion_embed_dim(20)_len(depths)(1)_augment")
    row = (root / "logs" / folder / "psnr_ssim_lpips_log.txt") \
        .read_text().splitlines()[0].split()
    lpips_val = float(row[3])
    assert 0 < lpips_val < 1.0 and lpips_val != 1.0
    assert (root / "weights" / folder / "best_lpips_model.pth").exists()
