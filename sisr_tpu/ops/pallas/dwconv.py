"""Pallas TPU kernel: 5x5 depthwise convolution (NHWC, same-padding, bias).

Why a kernel: the ConvFFN of every transformer block runs a 5x5 depthwise
conv (reference models/hit_sir_pro.py:12-24).  XLA lowers grouped convs with
group size 1 on TPU one group at a time, so each 1-channel slice is padded to
the 128-lane register width — measured 3.4 GB of HBM traffic per 192x192
tile *per block* (~120 GB per flagship forward), which made the whole model
memory-bound.  This kernel reads the activation once: channel-tiled,
row-tiled with a halo, 25-tap multiply-accumulate on the VPU in fp32.

Layout: channels ride the 128-wide lane dimension; rows are pre-overlapped
outside the kernel (a (n_rows, TH+4, W+4, C) gather, ~12% duplication) so the
grid uses plain BlockSpecs and gets Pallas' automatic double-buffered
pipelining.  Backward is a custom VJP: dx is the same kernel with a flipped
kernel; dw/db are small einsums.
"""

from __future__ import annotations

import functools

import numpy as np
import jax
import jax.numpy as jnp
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu

K = 5  # kernel width
PAD = K - 1  # total halo per spatial dim


def _channel_tile(c: int) -> int:
    """Divisor of c with minimal 128-lane padding waste (then largest), <= 160."""
    best, best_score = c, float("inf")
    for ct in range(1, min(c, 160) + 1):
        if c % ct:
            continue
        score = (-(-ct // 128) * 128) / ct
        if score < best_score or (score == best_score and ct > best):
            best, best_score = ct, score
    return best


def _row_tile(h: int) -> int:
    # 16 rows keeps input + K materialized column shifts + f32 accumulator +
    # double-buffered in/out inside the 16 MB VMEM budget
    for th in (16, 8, 4, 2, 1):
        if h % th == 0:
            return th
    return h


def _dwconv_kernel(x_ref, w_ref, b_ref, o_ref):
    """x (1,1,1,TH+4,W+4,CT), w (1,K,K,CT), b (1,1,CT) -> o (1,1,1,TH,W,CT).

    Two-stage tap structure: W rides the sublane axis, so column slices are
    unaligned relayouts — materialize the K column shifts ONCE, then the
    K row shifts per column are slices of the leading (untiled) dim, free.
    25 unaligned slices -> 5.
    """
    th = o_ref.shape[3]
    wd = o_ref.shape[4]
    x = x_ref[0, 0, 0]  # (TH+4, W+4, CT)
    cols = [x[:, j:j + wd, :] for j in range(K)]  # K unaligned shifts, once
    acc = jnp.zeros((th, wd, o_ref.shape[5]), jnp.float32)
    for i in range(K):
        for j in range(K):
            tap = cols[j][i:i + th].astype(jnp.float32)
            acc += tap * w_ref[0, i, j, :].astype(jnp.float32)
    acc += b_ref[0, 0, :].astype(jnp.float32)
    o_ref[0, 0, 0] = acc.astype(o_ref.dtype)


def _dwconv_pallas(x: jnp.ndarray, w: jnp.ndarray, b: jnp.ndarray,
                   interpret: bool = False) -> jnp.ndarray:
    """x (B,H,W,C), w (K,K,C), b (C,) -> (B,H,W,C); zero same-padding.

    Channel groups ride a leading grid axis (the minor dim must equal the
    full array dim for Mosaic); rows are pre-overlapped so plain BlockSpecs
    give automatic double-buffered pipelining.
    """
    bsz, h, wd, c = x.shape
    th = _row_tile(h)
    ct = _channel_tile(c)
    n_rt = h // th
    n_ct = c // ct

    xp = jnp.pad(x, ((0, 0), (PAD // 2, PAD // 2), (PAD // 2, PAD // 2), (0, 0)))
    # (B, Hp, Wp, n_ct, ct) -> (B, n_ct, Hp, Wp, ct)
    xp = xp.reshape(bsz, h + PAD, wd + PAD, n_ct, ct).transpose(0, 3, 1, 2, 4)
    # pre-overlapped row tiles: (B, n_ct, n_rt, TH+4, W+4, ct)
    xov = jnp.stack([xp[:, :, r * th:r * th + th + PAD] for r in range(n_rt)],
                    axis=2)

    out = pl.pallas_call(
        _dwconv_kernel,
        grid=(bsz, n_ct, n_rt),
        in_specs=[
            pl.BlockSpec((1, 1, 1, th + PAD, wd + PAD, ct),
                         lambda bi, ci, ri: (bi, ci, ri, 0, 0, 0)),
            pl.BlockSpec((1, K, K, ct), lambda bi, ci, ri: (ci, 0, 0, 0)),
            pl.BlockSpec((1, 1, ct), lambda bi, ci, ri: (ci, 0, 0)),
        ],
        out_specs=pl.BlockSpec((1, 1, 1, th, wd, ct),
                               lambda bi, ci, ri: (bi, ci, ri, 0, 0, 0)),
        out_shape=jax.ShapeDtypeStruct((bsz, n_ct, n_rt, th, wd, ct), x.dtype),
        interpret=interpret,
    )(xov, w.reshape(K, K, n_ct, ct).transpose(2, 0, 1, 3),
      b.reshape(n_ct, 1, ct))
    return out.transpose(0, 2, 3, 4, 1, 5).reshape(bsz, h, wd, c)


def depthwise_conv_reference(x: jnp.ndarray, w: jnp.ndarray, b: jnp.ndarray) -> jnp.ndarray:
    """XLA grouped-conv path (used on CPU and as the test oracle)."""
    c = x.shape[-1]
    y = jax.lax.conv_general_dilated(
        x, w.reshape(K, K, 1, c), (1, 1),
        ((PAD // 2, PAD // 2), (PAD // 2, PAD // 2)),
        feature_group_count=c,
        dimension_numbers=("NHWC", "HWIO", "NHWC"))
    return y + b


@functools.partial(jax.custom_vjp, nondiff_argnums=(3,))
def dwconv5x5(x: jnp.ndarray, w: jnp.ndarray, b: jnp.ndarray,
              use_pallas: bool = True) -> jnp.ndarray:
    """5x5 depthwise conv + bias, NHWC, stride 1, zero same-padding.

    w: (5, 5, C); b: (C,).  ``use_pallas`` selects the TPU kernel; the XLA
    grouped conv is used otherwise (CPU tests, parity oracle).
    """
    if use_pallas:
        return _dwconv_pallas(x, w, b)
    return depthwise_conv_reference(x, w, b)


def _dwconv_fwd(x, w, b, use_pallas):
    return dwconv5x5(x, w, b, use_pallas), (x, w)


def _dwconv_bwd(use_pallas, res, dy):
    x, w = res
    # dx: correlate dy with the spatially flipped kernel (same dwconv shape)
    w_flip = w[::-1, ::-1, :]
    dx = dwconv5x5(dy, w_flip, jnp.zeros((w.shape[-1],), dy.dtype), use_pallas)
    # dw[i,j,c] = sum_{b,y,x} xpad[b,y+i,x+j,c] * dy[b,y,x,c]
    xp = jnp.pad(x, ((0, 0), (PAD // 2, PAD // 2), (PAD // 2, PAD // 2), (0, 0)))
    h, wd = dy.shape[1], dy.shape[2]
    taps = [xp[:, i:i + h, j:j + wd, :] for i in range(K) for j in range(K)]
    taps = jnp.stack(taps)  # (25, B, H, W, C)
    dw = jnp.einsum("sbhwc,bhwc->sc", taps.astype(jnp.float32),
                    dy.astype(jnp.float32)).reshape(K, K, -1).astype(w.dtype)
    db = dy.sum(axis=(0, 1, 2)).astype(jnp.float32).astype(dy.dtype)
    return dx, dw, db


dwconv5x5.defvjp(_dwconv_fwd, _dwconv_bwd)
