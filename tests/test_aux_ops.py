"""Tests for the auxiliary library surfaces: the CUDA-op equivalents
(ops/stylegan_ops.py vs a numpy oracle of BasicSR's pure-torch fallback,
basicsr/ops/upfirdn2d/upfirdn2d.py:162-192) and models/arch_util.py."""

import numpy as np
import pytest

import jax
import jax.numpy as jnp

from sisr_tpu.ops.stylegan_ops import fused_bias_leaky_relu, upfirdn2d


def _upfirdn2d_oracle(x, kernel, up, down, pad0, pad1):
    """numpy replica of the reference upfirdn2d_native (NHWC)."""
    b, h, w, c = x.shape
    kh, kw = kernel.shape
    # zero-stuff: up-1 zeros AFTER each sample
    out = np.zeros((b, h * up, w * up, c), x.dtype)
    out[:, ::up, ::up] = x
    out = np.pad(out, ((0, 0), (pad0, pad1), (pad0, pad1), (0, 0)))
    kf = kernel[::-1, ::-1]
    oh = out.shape[1] - kh + 1
    ow = out.shape[2] - kw + 1
    conv = np.zeros((b, oh, ow, c), np.float64)
    for i in range(kh):
        for j in range(kw):
            conv += kf[i, j] * out[:, i:i + oh, j:j + ow, :]
    return conv[:, ::down, ::down, :].astype(x.dtype)


@pytest.mark.parametrize("up,down,pad", [(1, 1, (1, 1)), (2, 1, (2, 1)),
                                         (1, 2, (2, 2)), (2, 2, (3, 2))])
def test_upfirdn2d_matches_reference_semantics(up, down, pad):
    rng = np.random.default_rng(0)
    x = rng.normal(size=(2, 7, 9, 3)).astype(np.float32)
    kernel = rng.normal(size=(4, 4)).astype(np.float32)  # asymmetric: catches flips
    ref = _upfirdn2d_oracle(x, kernel, up, down, pad[0], pad[1])
    got = np.asarray(upfirdn2d(jnp.asarray(x), jnp.asarray(kernel),
                               up=up, down=down, pad=pad))
    assert got.shape == ref.shape
    np.testing.assert_allclose(got, ref, atol=1e-5, rtol=1e-5)


def test_fused_bias_leaky_relu():
    rng = np.random.default_rng(1)
    x = jnp.asarray(rng.normal(size=(1, 4, 4, 8)).astype(np.float32))
    b = jnp.asarray(rng.normal(size=(8,)).astype(np.float32))
    got = np.asarray(fused_bias_leaky_relu(x, b))
    y = np.asarray(x) + np.asarray(b)
    ref = np.where(y >= 0, y, 0.2 * y) * np.sqrt(2.0)
    np.testing.assert_allclose(got, ref, atol=1e-6)


def test_arch_util_shapes_and_residual():
    from sisr_tpu.models.arch_util import (ResidualBlockNoBN, Upsample,
                                           make_layer, pixel_unshuffle)

    x = jnp.asarray(np.random.default_rng(2).normal(size=(1, 8, 8, 16))
                    .astype(np.float32))
    stack = make_layer(ResidualBlockNoBN, 2, num_feat=16)
    v = stack.init(jax.random.PRNGKey(0), x)
    y = stack.apply(v, x)
    assert y.shape == x.shape
    # res_scale=0 must be the identity
    ident = ResidualBlockNoBN(num_feat=16, res_scale=0.0)
    vi = ident.init(jax.random.PRNGKey(0), x)
    np.testing.assert_allclose(np.asarray(ident.apply(vi, x)), np.asarray(x))

    for scale in (2, 3, 4):
        up = Upsample(scale=scale, num_feat=16)
        vu = up.init(jax.random.PRNGKey(0), x)
        assert up.apply(vu, x).shape == (1, 8 * scale, 8 * scale, 16)
    with pytest.raises(ValueError):
        Upsample(scale=5, num_feat=16).init(jax.random.PRNGKey(0), x)

    pu = pixel_unshuffle(x, 2)
    assert pu.shape == (1, 4, 4, 64)
    np.testing.assert_allclose(
        np.asarray(jax.jit(lambda t: pixel_unshuffle(t, 2))(x)), np.asarray(pu))


def test_gaussian_ssim_matches_matlab_oracle():
    """ops/metrics.py gaussian SSIM vs KAIR's MATLAB-parity calculate_ssim
    (tests/golden/metrics_matlab.npz) — same Wang-et-al algorithm skimage's
    gaussian_weights mode implements."""
    import os
    from sisr_tpu.ops.metrics import psnr as psnr_fn, ssim as ssim_fn

    z = np.load(os.path.join(os.path.dirname(__file__), "golden",
                             "metrics_matlab.npz"))
    a = z["a"].astype(np.float64)
    for name in ("noisy", "shifted", "blurred"):
        b = z[f"b_{name}"].astype(np.float64)
        got = float(ssim_fn(a, b, 1.0, gaussian_weights=True))
        np.testing.assert_allclose(got, float(z[f"ssim_{name}"]),
                                   atol=2e-4, rtol=2e-4)
        got_p = float(psnr_fn(a, b, 1.0))
        np.testing.assert_allclose(got_p, float(z[f"psnr_{name}"]),
                                   atol=1e-3, rtol=1e-4)
