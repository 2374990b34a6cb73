"""Deformable convolution (DCNv1/v2) — TPU-native gather formulation.

Library-surface counterpart of the reference's CUDA extension
(`BasicSR_master/basicsr/ops/dcn/deform_conv.py`,
`.../src/deform_conv_cuda.cpp:1`), which is inert even in the reference
(EDVR-class models only).  Instead of the im2col+custom-kernel CUDA design,
the TPU formulation samples every (output position, kernel tap) bilinearly
with one vectorized gather and contracts taps x channels against the weight
in a single matmul — static shapes, no data-dependent control flow, XLA
lowers the gathers to dynamic-slice fusions and the contraction to the MXU.

Layouts are NHWC (framework convention):
  x       (B, H, W, Cin)
  offset  (B, Hout, Wout, 2*dg*Kh*Kw)   — torch channel order per
                                          deformable group g, tap k: (dy, dx)
  mask    (B, Hout, Wout, dg*Kh*Kw)     — DCNv2 modulation (None = v1)
  weight  (Kh, Kw, Cin, Cout)
"""

from __future__ import annotations

from typing import Optional, Tuple

import jax.numpy as jnp


def _pair(v) -> Tuple[int, int]:
    return (v, v) if isinstance(v, int) else tuple(v)


def _bilinear_gather(x: jnp.ndarray, py: jnp.ndarray, px: jnp.ndarray
                     ) -> jnp.ndarray:
    """Sample x (B,H,W,C) at fractional (py, px) of shape (B, P, K).

    Out-of-bounds samples contribute zero (matches the CUDA kernel's
    zero-padding semantics at the sampled-coordinate level).
    Returns (B, P, K, C).
    """
    b, h, w, c = x.shape

    y0 = jnp.floor(py)
    x0 = jnp.floor(px)
    wy = py - y0
    wx = px - x0

    # gather the four integer corners
    p_shape = py.shape  # (B, P, K)
    flat = x.reshape(b, h * w, c)

    def corner(yi, xi):
        valid = ((yi >= 0) & (yi <= h - 1) & (xi >= 0) & (xi <= w - 1))
        yc = jnp.clip(yi, 0, h - 1).astype(jnp.int32)
        xc = jnp.clip(xi, 0, w - 1).astype(jnp.int32)
        idx = (yc * w + xc).reshape(b, -1)  # (B, P*K)
        vals = jnp.take_along_axis(flat, idx[..., None], axis=1)
        vals = vals.reshape(*p_shape, c)
        return vals * valid[..., None].astype(x.dtype)

    v00 = corner(y0, x0)
    v01 = corner(y0, x0 + 1)
    v10 = corner(y0 + 1, x0)
    v11 = corner(y0 + 1, x0 + 1)

    wy = wy[..., None].astype(x.dtype)
    wx = wx[..., None].astype(x.dtype)
    return ((1 - wy) * (1 - wx) * v00 + (1 - wy) * wx * v01
            + wy * (1 - wx) * v10 + wy * wx * v11)


def deform_conv2d(
    x: jnp.ndarray,
    offset: jnp.ndarray,
    weight: jnp.ndarray,
    bias: Optional[jnp.ndarray] = None,
    mask: Optional[jnp.ndarray] = None,
    stride: int | Tuple[int, int] = 1,
    padding: int | Tuple[int, int] = 1,
    dilation: int | Tuple[int, int] = 1,
    deformable_groups: int = 1,
) -> jnp.ndarray:
    """Modulated (mask given) or plain deformable 2-D convolution.

    Semantics match `torchvision.ops.deform_conv2d` / BasicSR's
    ModulatedDeformConv (`basicsr/ops/dcn/deform_conv.py:244-285`), with
    NHWC layouts as documented in the module docstring.
    """
    b, h, w, cin = x.shape
    kh, kw, wcin, cout = weight.shape
    assert wcin == cin, (wcin, cin)
    sy, sx = _pair(stride)
    py_, px_ = _pair(padding)
    dy_, dx_ = _pair(dilation)
    k = kh * kw
    dg = deformable_groups
    assert cin % dg == 0

    hout = (h + 2 * py_ - dy_ * (kh - 1) - 1) // sy + 1
    wout = (w + 2 * px_ - dx_ * (kw - 1) - 1) // sx + 1
    assert offset.shape == (b, hout, wout, 2 * dg * k), offset.shape
    p = hout * wout

    # base sampling grid: output position * stride - pad + dilation * tap
    oy = jnp.arange(hout) * sy - py_
    ox = jnp.arange(wout) * sx - px_
    ty = jnp.arange(kh) * dy_
    tx = jnp.arange(kw) * dx_
    base_y = (oy[:, None, None, None] + ty[None, None, :, None])  # Ho,1,Kh,1
    base_x = (ox[None, :, None, None] + tx[None, None, None, :])  # 1,Wo,1,Kw
    base_y = jnp.broadcast_to(base_y, (hout, wout, kh, kw)).reshape(1, p, 1, k)
    base_x = jnp.broadcast_to(base_x, (hout, wout, kh, kw)).reshape(1, p, 1, k)

    # offsets: (B, P, dg, K, 2) with torch's (dy, dx) interleave
    off = offset.reshape(b, p, dg, k, 2).astype(jnp.float32)
    samp_y = base_y.astype(jnp.float32) + off[..., 0]  # (B, P, dg, K)
    samp_x = base_x.astype(jnp.float32) + off[..., 1]

    cpg = cin // dg
    cols = []
    for g in range(dg):
        xg = x[..., g * cpg:(g + 1) * cpg]
        v = _bilinear_gather(xg, samp_y[:, :, g], samp_x[:, :, g])  # B,P,K,cpg
        if mask is not None:
            m = mask.reshape(b, p, dg, k)[:, :, g]
            v = v * m[..., None].astype(v.dtype)
        cols.append(v)
    col = jnp.concatenate(cols, axis=-1) if dg > 1 else cols[0]  # B,P,K,cin

    # contract taps x channels on the MXU: (B, P, K*cin) @ (K*cin, cout)
    wmat = weight.reshape(k, cin, cout).reshape(k * cin, cout)
    y = col.reshape(b, p, k * cin) @ wmat.astype(col.dtype)
    if bias is not None:
        y = y + bias.astype(y.dtype)
    return y.reshape(b, hout, wout, cout)
