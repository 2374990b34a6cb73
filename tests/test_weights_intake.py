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


# torchvision vgg19 "features" conv layer indices (16 convs; pattern
# 2-2-4-4-4 with maxpools between stages)
VGG19_CONVS = [(0, 3, 64), (2, 64, 64), (5, 64, 128), (7, 128, 128),
               (10, 128, 256), (12, 256, 256), (14, 256, 256), (16, 256, 256),
               (19, 256, 512), (21, 512, 512), (23, 512, 512), (25, 512, 512),
               (28, 512, 512), (30, 512, 512), (32, 512, 512), (34, 512, 512)]


def test_gan_perceptual_weights_intake(tmp_path_factory):
    """The GAN leg of the intake: a torch-format VGG19 features.N.* file →
    convert_vgg.py perceptual → hitsir_pro_gan_experiment trains one epoch
    with the converted weights actually loaded into the perceptual loss
    (reference counterpart: KAIR loss.py:54-96 pretrained VGG19)."""
    from tests.test_gan_experiment_runner import TINY_KW as GAN_KW
    from tools import convert_vgg
    from sisr_tpu.experiments.hitsir_pro_gan_experiment import (
        hitsir_pro_gan_experiment)

    tmp = tmp_path_factory.mktemp("vgg19w")
    g = torch.Generator().manual_seed(11)
    sd = {}
    for idx, cin, cout in VGG19_CONVS:
        sd[f"features.{idx}.weight"] = torch.randn(
            (cout, cin, 3, 3), generator=g) * 0.05
        sd[f"features.{idx}.bias"] = torch.randn((cout,), generator=g) * 0.05
    pth = tmp / "vgg19.pth"
    torch.save(sd, pth)
    out = tmp / "vgg19_features.msgpack"

    argv = sys.argv
    sys.argv = ["convert_vgg.py", "perceptual", str(pth), str(out)]
    try:
        convert_vgg.main()
    finally:
        sys.argv = argv
    assert out.exists()

    root = tmp_path_factory.mktemp("ganwexp")
    rng = np.random.default_rng(0)
    from PIL import Image
    for split, name, n, size in [("train", "setA", 2, (300, 280)),
                                 ("eval", "setB", 1, (72, 68))]:
        d = root / "data" / split / name
        d.mkdir(parents=True)
        for i in range(n):
            arr = (rng.random((size[1], size[0], 3)) * 255).astype(np.uint8)
            Image.fromarray(arr).save(d / f"im{i}.png")

    cwd = os.getcwd()
    os.chdir(root)
    try:
        exp = hitsir_pro_gan_experiment(
            is_test=False, epochs=1, perceptual_weights_path=str(out),
            **GAN_KW)
    finally:
        os.chdir(cwd)

    # the converted torch weights are live inside the perceptual loss
    got = np.asarray(exp.f_loss_function.variables["params"]["conv0"]["kernel"])
    want = sd["features.0.weight"].numpy().transpose(2, 3, 1, 0)
    np.testing.assert_allclose(got, want, rtol=1e-6)

    folder = ("hitsir_pro_gan_loss(l1)_mulsizeconvextract(False)_casa(False)"
              "_embed_dim(20)_len(depths)(1)")
    loss_rows = (root / "logs" / folder / "loss_log.txt").read_text().splitlines()
    g_loss = float(loss_rows[0].split()[1].split("loss:")[1])
    assert np.isfinite(g_loss) and g_loss > 0


def test_gan_random_vgg_warns():
    """Without perceptual weights the GAN experiment must warn loudly that
    the VGG19 is random-init (quality-meaningless outside tests)."""
    from sisr_tpu.experiments.hitsir_pro_gan_experiment import (
        load_perceptual_variables)

    with pytest.warns(UserWarning, match="RANDOM-INIT VGG19"):
        assert load_perceptual_variables(None) is None
    with pytest.warns(UserWarning, match="RANDOM-INIT VGG19"):
        assert load_perceptual_variables("/nonexistent/vgg19.msgpack") is None


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
