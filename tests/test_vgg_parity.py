"""VGG converter / perceptual / LPIPS golden parity (torch random-weight
fixtures from tools/make_vgg_goldens.py).

Proves convert_torchvision_vgg / convert_lpips map torch state_dicts to
numerically identical features — so pretrained torchvision/lpips weights are
drop-in once available (reference KAIR models/loss.py:54-130; lpips vgg).
"""

import os

import numpy as np
import pytest

import jax.numpy as jnp

from sisr_tpu.models.vgg import (LPIPSVgg, PerceptualLoss, VGGFeatures,
                                 convert_lpips, convert_torchvision_vgg)

GOLDEN = os.path.join(os.path.dirname(__file__), "golden")

# the golden ladders: torchvision cfgs / 8 (same layer/index structure)
CFG19 = tuple(c if c == "M" else c // 8 for c in
              (64, 64, "M", 128, 128, "M", 256, 256, 256, 256, "M",
               512, 512, 512, 512, "M", 512, 512, 512, 512, "M"))
CFG16 = tuple(c if c == "M" else c // 8 for c in
              (64, 64, "M", 128, 128, "M", 256, 256, 256, "M",
               512, 512, 512, "M", 512, 512, 512, "M"))


def _state_dict(z, prefix="sd.features."):
    return {k[len("sd."):]: z[k] for k in z.files if k.startswith(prefix)}


@pytest.fixture(scope="module")
def vgg19_golden():
    return np.load(os.path.join(GOLDEN, "vgg19_random.npz"))


def test_vgg19_tap_parity(vgg19_golden):
    z = vgg19_golden
    variables = convert_torchvision_vgg(_state_dict(z))
    model = VGGFeatures(cfg=CFG19, taps=(2, 7, 16, 25, 34))
    x = jnp.asarray(z["x"].transpose(0, 2, 3, 1))  # NCHW -> NHWC
    taps = model.apply(variables, x)
    for i, tap in enumerate(taps):
        ref = z[f"tap{i}"].transpose(0, 2, 3, 1)
        np.testing.assert_allclose(np.asarray(tap), ref, atol=1e-5, rtol=1e-4)


def test_perceptual_loss_parity(vgg19_golden):
    z = vgg19_golden
    variables = convert_torchvision_vgg(_state_dict(z))
    loss = PerceptualLoss(variables=variables, cfg=CFG19)
    x = jnp.asarray(z["x"].transpose(0, 2, 3, 1))
    gt = jnp.asarray(z["gt"].transpose(0, 2, 3, 1))
    got = float(loss(x, gt))
    np.testing.assert_allclose(got, float(z["perceptual"]), atol=1e-6, rtol=1e-4)


def test_lpips_parity():
    z = np.load(os.path.join(GOLDEN, "lpips_vgg_random.npz"))
    lin_sd = {k: z[k] for k in z.files if k.startswith("lin")}
    variables = convert_lpips(lin_sd, _state_dict(z))
    model = LPIPSVgg(cfg=CFG16)
    a = jnp.asarray(z["a"].transpose(0, 2, 3, 1))
    b = jnp.asarray(z["b"].transpose(0, 2, 3, 1))
    got = model.apply(variables, a, b, normalize=True)
    np.testing.assert_allclose(np.asarray(got), z["lpips"], atol=1e-6, rtol=1e-4)
