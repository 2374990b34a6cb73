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


def _attn_oracle(q, kv, offset, kh, kw, pad, dil, heads, dg):
    """Straight-loop deformable attention, NHWC (reference math:
    KAIR_master/models/op/deform_attn_cuda_pt110.cpp:103-112)."""
    b, h, w, c = q.shape
    clip = kv.shape[1]
    k = kh * kw
    cpg = c // dg
    d = c // heads

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

    out = np.zeros((b, h, w, c), np.float64)
    for bi in range(b):
        for i in range(h):
            for j in range(w):
                ks = np.zeros((clip * k, c), np.float64)
                vs = np.zeros((clip * k, c), np.float64)
                for n in range(clip):
                    for g in range(dg):
                        for ki in range(kh):
                            for kj in range(kw):
                                kk = ki * kw + kj
                                dy = offset[bi, n, i, j, 2 * (g * k + kk)]
                                dx = offset[bi, n, i, j, 2 * (g * k + kk) + 1]
                                sy = i - pad + ki * dil + dy
                                sx = j - pad + kj * dil + dx
                                sl = slice(g * cpg, (g + 1) * cpg)
                                ks[n * k + kk, sl] = sample(
                                    kv[bi, n, :, :, :c][:, :, sl], sy, sx)
                                vs[n * k + kk, sl] = sample(
                                    kv[bi, n, :, :, c:][:, :, sl], sy, sx)
                for a in range(heads):
                    sl = slice(a * d, (a + 1) * d)
                    logit = ks[:, sl] @ (q[bi, i, j, sl] * d ** -0.5)
                    att = np.exp(logit - logit.max())
                    att /= att.sum()
                    out[bi, i, j, sl] = att @ vs[:, sl]
    return out


def test_deform_attn_matches_numpy_oracle():
    from sisr_tpu.ops.deform import deform_attn

    rng = np.random.default_rng(11)
    b, h, w, c = 1, 5, 6, 8
    clip, heads, dg = 2, 2, 2
    q = rng.standard_normal((b, h, w, c)).astype(np.float32)
    kv = rng.standard_normal((b, clip, h, w, 2 * c)).astype(np.float32)
    off = (rng.standard_normal((b, clip, h, w, dg * 9 * 2)) * 1.5).astype(np.float32)

    got = np.asarray(deform_attn(jnp.asarray(q), jnp.asarray(kv),
                                 jnp.asarray(off), window=(3, 3),
                                 attention_heads=heads,
                                 deformable_groups=dg))
    ref = _attn_oracle(q, kv, off, 3, 3, 1, 1, heads, dg)
    np.testing.assert_allclose(got, ref, atol=1e-4, rtol=1e-4)


def test_deform_attn_zero_offset_is_window_softmax():
    """Zero offsets reduce to plain window attention over the 3x3
    neighbourhood — spot-check the center position against direct math."""
    from sisr_tpu.ops.deform import deform_attn

    rng = np.random.default_rng(12)
    b, h, w, c = 1, 5, 5, 4
    q = rng.standard_normal((b, h, w, c)).astype(np.float32)
    kv = rng.standard_normal((b, 1, h, w, 2 * c)).astype(np.float32)
    off = np.zeros((b, 1, h, w, 18), np.float32)
    out = np.asarray(deform_attn(jnp.asarray(q), jnp.asarray(kv),
                                 jnp.asarray(off)))
    i = j = 2
    ks = kv[0, 0, i - 1:i + 2, j - 1:j + 2, :c].reshape(9, c)
    vs = kv[0, 0, i - 1:i + 2, j - 1:j + 2, c:].reshape(9, c)
    logit = ks @ (q[0, i, j] * c ** -0.5)
    att = np.exp(logit - logit.max()); att /= att.sum()
    np.testing.assert_allclose(out[0, i, j], att @ vs, atol=1e-5)
