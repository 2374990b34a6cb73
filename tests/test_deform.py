"""Deformable conv (ops/deform.py) vs a direct numpy oracle, plus the
zero-offset == plain-conv identity and torchvision value parity when
available (the reference counterpart is the inert CUDA extension
BasicSR_master/basicsr/ops/dcn/)."""

import numpy as np
import jax.numpy as jnp
import pytest

from sisr_tpu.ops.deform import deform_conv2d


def _oracle(x, offset, weight, bias, mask, stride, padding, dilation, dg):
    """Straight-loop modulated deform conv, NHWC."""
    b, h, w, cin = x.shape
    kh, kw, _, cout = weight.shape
    k = kh * kw
    hout = (h + 2 * padding - dilation * (kh - 1) - 1) // stride + 1
    wout = (w + 2 * padding - dilation * (kw - 1) - 1) // stride + 1
    cpg = cin // dg

    def sample(img, y, xx):
        hh, ww, cc = img.shape
        y0, x0 = int(np.floor(y)), int(np.floor(xx))
        out = np.zeros(cc, np.float64)
        for (yi, xi, wgt) in [(y0, x0, (1 - (y - y0)) * (1 - (xx - x0))),
                              (y0, x0 + 1, (1 - (y - y0)) * (xx - x0)),
                              (y0 + 1, x0, (y - y0) * (1 - (xx - x0))),
                              (y0 + 1, x0 + 1, (y - y0) * (xx - x0))]:
            if 0 <= yi <= hh - 1 and 0 <= xi <= ww - 1:
                out += wgt * img[yi, xi]
        return out

    y = np.zeros((b, hout, wout, cout), np.float64)
    for bi in range(b):
        for i in range(hout):
            for j in range(wout):
                acc = np.zeros(cout, np.float64)
                for g in range(dg):
                    for ki in range(kh):
                        for kj in range(kw):
                            kk = ki * kw + kj
                            dy = offset[bi, i, j, 2 * (g * k + kk)]
                            dx = offset[bi, i, j, 2 * (g * k + kk) + 1]
                            sy = i * stride - padding + ki * dilation + dy
                            sx = j * stride - padding + kj * dilation + dx
                            v = sample(x[bi, :, :, g * cpg:(g + 1) * cpg], sy, sx)
                            if mask is not None:
                                v = v * mask[bi, i, j, g * k + kk]
                            acc += v @ weight[ki, kj, g * cpg:(g + 1) * cpg]
                y[bi, i, j] = acc + (bias if bias is not None else 0)
    return y


@pytest.mark.parametrize("stride,padding,dilation,dg,mod", [
    (1, 1, 1, 1, True),
    (2, 1, 1, 1, False),
    (1, 2, 2, 2, True),
])
def test_deform_conv_matches_oracle(stride, padding, dilation, dg, mod):
    rng = np.random.default_rng(3)
    b, h, w, cin, cout, kh = 2, 7, 6, 4, 5, 3
    x = rng.standard_normal((b, h, w, cin), np.float32)
    weight = rng.standard_normal((kh, kh, cin, cout), np.float32) * 0.3
    bias = rng.standard_normal((cout,), np.float32)
    hout = (h + 2 * padding - dilation * (kh - 1) - 1) // stride + 1
    wout = (w + 2 * padding - dilation * (kh - 1) - 1) // stride + 1
    offset = rng.standard_normal(
        (b, hout, wout, 2 * dg * kh * kh), np.float32) * 1.5
    mask = (rng.random((b, hout, wout, dg * kh * kh), np.float32)
            if mod else None)

    got = np.asarray(deform_conv2d(
        jnp.asarray(x), jnp.asarray(offset), jnp.asarray(weight),
        jnp.asarray(bias), None if mask is None else jnp.asarray(mask),
        stride=stride, padding=padding, dilation=dilation,
        deformable_groups=dg))
    want = _oracle(x, offset, weight, bias, mask,
                   stride, padding, dilation, dg)
    np.testing.assert_allclose(got, want, rtol=2e-4, atol=2e-4)


def test_zero_offset_is_plain_conv():
    """offset=0, mask=1 must reduce to an ordinary 3x3 conv."""
    import jax
    rng = np.random.default_rng(0)
    x = rng.standard_normal((1, 8, 9, 6), np.float32)
    weight = rng.standard_normal((3, 3, 6, 4), np.float32) * 0.2
    offset = np.zeros((1, 8, 9, 2 * 9), np.float32)
    mask = np.ones((1, 8, 9, 9), np.float32)

    got = np.asarray(deform_conv2d(
        jnp.asarray(x), jnp.asarray(offset), jnp.asarray(weight),
        mask=jnp.asarray(mask)))
    want = np.asarray(jax.lax.conv_general_dilated(
        jnp.asarray(x), jnp.asarray(weight), (1, 1), ((1, 1), (1, 1)),
        dimension_numbers=("NHWC", "HWIO", "NHWC")))
    np.testing.assert_allclose(got, want, rtol=1e-4, atol=1e-5)


def test_matches_torchvision():
    """Value parity with torchvision.ops.deform_conv2d (the public oracle
    for the reference's DCN semantics), layouts converted NCHW<->NHWC."""
    torch = pytest.importorskip("torch")
    torchvision = pytest.importorskip("torchvision")

    rng = np.random.default_rng(5)
    b, h, w, cin, cout = 2, 6, 5, 4, 3
    x = rng.standard_normal((b, h, w, cin), np.float32)
    weight = rng.standard_normal((3, 3, cin, cout), np.float32) * 0.3
    bias = rng.standard_normal((cout,), np.float32)
    offset = rng.standard_normal((b, h, w, 18), np.float32)
    mask = rng.random((b, h, w, 9), np.float32)

    got = np.asarray(deform_conv2d(
        jnp.asarray(x), jnp.asarray(offset), jnp.asarray(weight),
        jnp.asarray(bias), jnp.asarray(mask)))

    tv = torchvision.ops.deform_conv2d(
        torch.from_numpy(x.transpose(0, 3, 1, 2)),
        torch.from_numpy(offset.transpose(0, 3, 1, 2)),
        torch.from_numpy(weight.transpose(3, 2, 0, 1)),
        torch.from_numpy(bias), stride=1, padding=1, dilation=1,
        mask=torch.from_numpy(mask.transpose(0, 3, 1, 2)))
    want = tv.numpy().transpose(0, 2, 3, 1)
    np.testing.assert_allclose(got, want, rtol=2e-4, atol=2e-4)
