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

import jax
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


def deform_attn(
    q: jnp.ndarray,
    kv: jnp.ndarray,
    offset: jnp.ndarray,
    window: Tuple[int, int] = (3, 3),
    stride: int = 1,
    padding: Optional[int] = None,
    dilation: int = 1,
    attention_heads: int = 1,
    deformable_groups: int = 1,
) -> jnp.ndarray:
    """Deformable attention — TPU-native counterpart of the reference's CUDA
    extension (`KAIR_master/models/op/deform_attn_cuda_kernel.cu:1`,
    python wrapper `models/op/deform_attn.py:53-104`), inert in the reference
    (VRT-class models only); library surface here.

    Per output position p and clip n, K = kh*kw points are bilinearly
    sampled from k and v at the deform-conv grid (p - pad + tap*dilation +
    learned offset, per deformable group); each attention head then
    softmax-attends q(p)/sqrt(d) over the clip_size*K sampled keys and
    averages the sampled values (deform_attn_cuda_pt110.cpp:103-112).

    NHWC layouts:
      q       (B, H, W, C)
      kv      (B, clip_size, H, W, 2*C)         k | v on the channel axis
      offset  (B, clip_size, H, W, dg*K*2)      per group g, tap t: (dy, dx)
    Returns (B, H, W, C).
    """
    b, h, w, c = q.shape
    clip = kv.shape[1]
    kh, kw = _pair(window)
    k = kh * kw
    dg = deformable_groups
    heads = attention_heads
    pad = kh // 2 if padding is None else padding
    assert stride == 1, "the reference module only instantiates stride 1"
    assert kv.shape == (b, clip, h, w, 2 * c), kv.shape
    assert offset.shape == (b, clip, h, w, dg * k * 2), offset.shape
    assert c % dg == 0 and c % heads == 0
    d = c // heads
    p = h * w
    f32 = jnp.float32

    oy = jnp.arange(h) - pad
    ox = jnp.arange(w) - pad
    ty = jnp.arange(kh) * dilation
    tx = jnp.arange(kw) * dilation
    base_y = (oy[:, None, None, None] + ty[None, None, :, None])
    base_x = (ox[None, :, None, None] + tx[None, None, None, :])
    base_y = jnp.broadcast_to(base_y, (h, w, kh, kw)).reshape(1, p, 1, k)
    base_x = jnp.broadcast_to(base_x, (h, w, kh, kw)).reshape(1, p, 1, k)

    cpg = c // dg
    ks_list, vs_list = [], []
    for n in range(clip):
        off = offset[:, n].reshape(b, p, dg, k, 2).astype(f32)
        sy = base_y.astype(f32) + off[..., 0]
        sx = base_x.astype(f32) + off[..., 1]
        kcols, vcols = [], []
        for g in range(dg):
            kg = kv[:, n, :, :, g * cpg:(g + 1) * cpg]
            vg = kv[:, n, :, :, c + g * cpg:c + (g + 1) * cpg]
            kcols.append(_bilinear_gather(kg, sy[:, :, g], sx[:, :, g]))
            vcols.append(_bilinear_gather(vg, sy[:, :, g], sx[:, :, g]))
        ks_list.append(jnp.concatenate(kcols, -1) if dg > 1 else kcols[0])
        vs_list.append(jnp.concatenate(vcols, -1) if dg > 1 else vcols[0])
    ks = jnp.stack(ks_list, axis=2).reshape(b, p, clip * k, heads, d)
    vs = jnp.stack(vs_list, axis=2).reshape(b, p, clip * k, heads, d)

    qh = q.reshape(b, p, heads, d).astype(f32) * (float(d) ** -0.5)
    logits = jnp.einsum("bphd,bpshd->bphs", qh, ks.astype(f32))
    attn = jax.nn.softmax(logits, axis=-1)
    out = jnp.einsum("bphs,bpshd->bphd", attn, vs.astype(f32))
    return out.reshape(b, h, w, c).astype(q.dtype)
