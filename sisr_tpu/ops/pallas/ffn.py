"""Fused HTB-tail Pallas kernel: LN1 + residual + ConvFFN + LN2 + residual.

The post-attention part of every HierarchicalTransformerBlock
(reference models/hit_sir_pro.py:696-704 with the ConvFFN of :12-46,208-233):

    x   = shortcut + LN1(attn)
    h   = gelu(x @ W1 + b1)
    h2  = h + gelu(dwconv5x5(h))
    y   = h2 @ W2 + b2
    out = x + LN2(y)

Lowered through XLA this subsystem costs ~26 ms of the 73.9 ms flagship tile
(profiled on v5e): the 5x5 depthwise conv lowering alone is 15.3 ms (XLA pads
each 1-channel group to the 128-lane width) and the 2x-wide hidden
activations bounce through HBM between each elementwise stage.  This kernel
runs the whole chain in VMEM per row band: the only HBM traffic is reading
``attn``/``shortcut`` once (with a 2-row halo) and writing ``out`` once.

Layout: grid over (batch, row bands).  Row bands carry a 2-row halo so the
depthwise conv needs no cross-invocation exchange; the halo rows of ``h`` are
recomputed (fc1 on th+4 rows instead of th: 25% extra fc1 FLOPs at th=16,
negligible vs the saved memory passes).  Rows outside the image are masked to
zero before the conv taps, reproducing the conv's zero same-padding.  Column
halo stays inside the band (bands span the full width).

Backward falls back to ``jax.vjp`` over the identical jnp reference
(``htb_tail_reference``) — numerically the same function.
"""

from __future__ import annotations

import functools
from typing import Tuple

import jax
import jax.numpy as jnp
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu

from sisr_tpu.ops.pallas.dwconv import depthwise_conv_reference

K = 5
PAD = K - 1


def _gelu(x):
    # torch nn.GELU() default = exact erf formulation
    return jax.nn.gelu(x, approximate=False)


# erf(t)/t as an even polynomial in t^2 (degree-8 Chebyshev fit on [0, 9]):
# max |erf - t*P(t^2)| = 3.3e-5 on [-3, 3], giving gelu abs err <= 7e-5 —
# below bf16 resolution.  Mosaic has no erf/erfc lowering; unlike the
# Abramowitz-Stegun form this needs no exp and no divide (8 FMAs on the VPU
# vs ~40 ops — the two gelus were the largest VPU cost of the FFN kernel).
_ERF_COEFS = (1.1283629554e+00, -3.7581868199e-01, 1.1186261684e-01,
              -2.5649685325e-02, 4.4378858745e-03, -5.5356157295e-04,
              4.6147735394e-05, -2.2677540384e-06, 4.9183248842e-08)


def _gelu_kernel(x):
    """erf-gelu for inside Pallas kernels; computed in f32.

    |t| saturates at 3 (erf(3) = 1 - 2.2e-5): gelu(x) = x for t > 3 and
    0 for t < -3, exact to below bf16 resolution.
    """
    xf = x.astype(jnp.float32)
    t = jnp.clip(xf * 0.7071067811865476, -3.0, 3.0)
    u = t * t
    p = jnp.float32(_ERF_COEFS[-1])
    for c in _ERF_COEFS[-2::-1]:
        p = p * u + jnp.float32(c)
    return (0.5 * xf * (1.0 + t * p)).astype(x.dtype)


def layer_norm(x, scale, bias, eps: float = 1e-5):
    """LayerNorm over the trailing axis, f32 statistics (flax-compatible
    fast-variance form), result in x.dtype."""
    xf = x.astype(jnp.float32)
    mean = xf.mean(axis=-1, keepdims=True)
    var = jnp.maximum(0.0, (xf * xf).mean(axis=-1, keepdims=True) - mean * mean)
    y = (xf - mean) * jax.lax.rsqrt(var + eps)
    y = y * scale.astype(jnp.float32) + bias.astype(jnp.float32)
    return y.astype(x.dtype)


def htb_tail_reference(attn, shortcut, ln1_s, ln1_b, w1, b1, dw, dwb,
                       w2, b2, ln2_s, ln2_b):
    """jnp reference of the fused op (and the backward-pass function).

    attn/shortcut: (B, H, W, C); w1: (C, Ch); dw: (5, 5, Ch); w2: (Ch, C).
    """
    dt = attn.dtype
    x = shortcut + layer_norm(attn, ln1_s, ln1_b)
    h = _gelu(x @ w1.astype(dt) + b1.astype(dt))
    h2 = h + _gelu(depthwise_conv_reference(h, dw.astype(dt), dwb.astype(dt)))
    y = h2 @ w2.astype(dt) + b2.astype(dt)
    return x + layer_norm(y, ln2_s, ln2_b)


def _tail_kernel(a_ref, ah_ref, s_ref, sh_ref, ln1s_ref, ln1b_ref, w1_ref,
                 b1_ref, dw_ref, dwb_ref, w2_ref, b2_ref, ln2s_ref, ln2b_ref,
                 o_ref, *, h_img: int, th: int):
    """Blocks: a/s (1, th, W, C) zero-copy views of the full arrays; ah/sh
    (1, 1, 4, W, C) hold the 2-row top+bottom halos; o (1, th, W, C)."""
    wd = o_ref.shape[2]
    c = o_ref.shape[3]
    ch = w1_ref.shape[1]
    dt = o_ref.dtype
    f32 = jnp.float32

    a = jnp.concatenate([ah_ref[0, 0, 0:2], a_ref[0], ah_ref[0, 0, 2:4]], axis=0)
    s = jnp.concatenate([sh_ref[0, 0, 0:2], s_ref[0], sh_ref[0, 0, 2:4]], axis=0)
    x = s + layer_norm(a, ln1s_ref[0], ln1b_ref[0])  # (th+4, W, C)

    lin1 = jnp.dot(x.reshape((th + PAD) * wd, c), w1_ref[...],
                   preferred_element_type=f32) + b1_ref[0].astype(f32)
    h = _gelu_kernel(lin1).astype(dt).reshape(th + PAD, wd, ch)

    # rows outside the image are the conv's zero padding, NOT gelu(fc1(0))
    base = pl.program_id(1) * th - PAD // 2
    row = base + jax.lax.broadcasted_iota(jnp.int32, (th + PAD, 1, 1), 0)
    valid = jnp.logical_and(row >= 0, row < h_img)
    hm = jnp.where(valid, h, jnp.zeros_like(h))
    hp = jnp.pad(hm, ((0, 0), (PAD // 2, PAD // 2), (0, 0)))

    # materialize the K column shifts once (unaligned sublane relayouts);
    # row shifts are then free slices of the leading dim — 5 relayouts, not
    # 25.  The taps accumulate as per-column expression TREES rather than 25
    # sequential acc updates: Mosaic keeps a tree's partials in registers,
    # cutting the accumulator's VMEM read/write traffic ~5x (measured 0.10
    # ms/kernel, tools/bench_ffn_ablate.py).
    cols = [hp[:, j:j + wd, :] for j in range(K)]
    dwf = dw_ref[...]
    sj = [sum(cols[j][i:i + th].astype(f32) * dwf[i * K + j, :].astype(f32)
              for i in range(K)) for j in range(K)]
    acc = sj[0] + sj[1] + sj[2] + sj[3] + sj[4]
    dwout = (acc + dwb_ref[0].astype(f32)).astype(dt)

    h2 = h[PAD // 2:PAD // 2 + th] + _gelu_kernel(dwout)
    y = (jnp.dot(h2.reshape(th * wd, ch), w2_ref[...],
                 preferred_element_type=f32) + b2_ref[0].astype(f32)).astype(dt)
    out = x[PAD // 2:PAD // 2 + th] + layer_norm(y.reshape(th, wd, c),
                                                 ln2s_ref[0], ln2b_ref[0])
    o_ref[0] = out.astype(dt)


def _pipe_emit(edge_ref, hprev_ref, xprev_ref, top2, dw_ref, dwb_ref,
               w2_ref, b2_ref, ln2s_ref, ln2b_ref, th: int):
    """Emit one lagged band: dwconv(h) + gelu residual, fc2, LN2 residual.

    Shared by the FFN pipe kernel and the fused whole-HTB kernel
    (``htb_block.py``).  ``top2`` is the next band's first 2 h-rows (zeros at
    the bottom border); halos ride the VMEM scratch refs."""
    wd, ch = top2.shape[1], top2.shape[2]
    c = xprev_ref.shape[-1]
    dt = top2.dtype
    f32 = jnp.float32
    hstack = jnp.concatenate([edge_ref[...], hprev_ref[...], top2],
                             axis=0)                     # (th+4, W, Ch)
    hp = jnp.pad(hstack, ((0, 0), (PAD // 2, PAD // 2), (0, 0)))
    dwf = dw_ref[...]
    dwb = dwb_ref[0].astype(f32)

    def taps(lo: int, cw: int):
        # materialize the K column shifts once (unaligned sublane
        # relayouts); row shifts are then free slices of the leading dim
        # — K relayouts, not K*K.  The taps accumulate as per-column
        # expression TREES rather than 25 sequential acc updates: Mosaic
        # keeps a tree's partials in registers, cutting the
        # accumulator's VMEM read/write traffic ~5x (measured 0.10
        # ms/kernel, tools/bench_ffn_ablate.py).
        cols = [hp[:, lo + j:lo + j + cw, :] for j in range(K)]
        sj = [sum(cols[j][r:r + th].astype(f32)
                  * dwf[r * K + j, :].astype(f32)
                  for r in range(K)) for j in range(K)]
        return sj[0] + sj[1] + sj[2] + sj[3] + sj[4]

    # wide strip bands chunk the tap build over column blocks: the
    # full-width form holds ~9 (th, W, Ch) f32 partials live, which at
    # W=1920 spills ~45 MB past physical VMEM.  SISR_FFN_CHUNK tunes the
    # chunk width (512 default; th=8 at W=1920 needs 256 to fit).
    chunk = int(os.environ.get("SISR_FFN_CHUNK", "512"))
    if wd <= chunk:
        dwout = (taps(0, wd) + dwb).astype(dt)
        h2 = hprev_ref[...] + _gelu_kernel(dwout)
    else:
        parts = []
        for lo in range(0, wd, chunk):
            cw = min(chunk, wd - lo)
            dw_c = (taps(lo, cw) + dwb).astype(dt)
            parts.append(hprev_ref[:, lo:lo + cw, :]
                         + _gelu_kernel(dw_c))
        h2 = jnp.concatenate(parts, axis=1)
    y = (jnp.dot(h2.reshape(th * wd, ch), w2_ref[...],
                 preferred_element_type=f32) + b2_ref[0].astype(f32)).astype(dt)
    return xprev_ref[...] + layer_norm(y.reshape(th, wd, c),
                                       ln2s_ref[0], ln2b_ref[0])


def _write_stats(out, cmean_ref, cmax_ref, psum_ref, pmax_ref):
    """Per-band SCA pool stats (see ``htb_tail_stats``).  Mosaic requires
    8-divisible second-minor block dims, so each band's vectors ride
    row-replicated (8, N) blocks (consumers read row 0); the replication
    write is ~0.5 MB/step, trivial next to the band's 2.8 MB output."""
    of = out.astype(jnp.float32)
    rep = lambda v: jnp.broadcast_to(v.reshape(1, -1), (8, v.size))
    cmean_ref[0, 0] = rep(of.mean(-1))
    cmax_ref[0, 0] = rep(of.max(-1))
    psum_ref[0, 0] = rep(of.sum((0, 1)))
    pmax_ref[0, 0] = rep(of.max((0, 1)))


def _tail_pipe_kernel(a_ref, s_ref, ln1s_ref, ln1b_ref, w1_ref, b1_ref,
                      dw_ref, dwb_ref, w2_ref, b2_ref, ln2s_ref, ln2b_ref,
                      *refs, th: int, nb: int, stats: bool):
    """Lagged-pipeline variant: the row-band grid dim is sequential
    ("arbitrary"), so each band's fc1/gelu activations are computed ONCE and
    the depthwise conv's 2-row halos come from the neighbouring bands via
    VMEM scratch carried across grid steps — no halo recompute (the halo
    kernel pays (th+4)/th extra fc1+gelu), no XLA halo-stack builds, no halo
    DMA.  Step i computes band i's x/h, then emits band i-1's output from
    [h_{i-2} bottom 2 | h_{i-1} | h_i top 2]; the grid runs nb+1 steps with
    the output block index lagged by one.

    ``stats=True`` additionally emits, per band, the channel-mean/max maps
    (flattened (1, 1, th*wd) f32 — th can be < 8 at strip widths, so a
    (th, wd) block layout would break Mosaic's 8-aligned second-minor rule)
    and (1, 1, C) spatial sum/max partials.  The NEXT block's SCA re-derives
    all four of its global passes over this block's 13-133 MB output from
    these small tensors instead of re-reading it from HBM (those reduces
    cost ~0.65 ms/block of XLA reduce fusions at strip shapes, measured
    r3)."""
    if stats:
        (o_ref, cmean_ref, cmax_ref, psum_ref, pmax_ref,
         xcur_ref, xprev_ref, hcur_ref, hprev_ref, edge_ref) = refs
    else:
        (o_ref, xcur_ref, xprev_ref, hcur_ref, hprev_ref, edge_ref) = refs
    wd = o_ref.shape[2]
    c = o_ref.shape[3]
    ch = w1_ref.shape[1]
    dt = o_ref.dtype
    f32 = jnp.float32
    i = pl.program_id(1)

    @pl.when(i == 0)
    def _init():
        # rows -2/-1 above the image are the conv's zero padding
        edge_ref[...] = jnp.zeros_like(edge_ref)

    @pl.when(i < nb)
    def _compute():
        x = s_ref[0] + layer_norm(a_ref[0], ln1s_ref[0], ln1b_ref[0])
        lin1 = jnp.dot(x.reshape(th * wd, c), w1_ref[...],
                       preferred_element_type=f32) + b1_ref[0].astype(f32)
        xcur_ref[...] = x
        hcur_ref[...] = _gelu_kernel(lin1).astype(dt).reshape(th, wd, ch)

    @pl.when(i > 0)
    def _emit():
        # rows nb*th.. below the image are zero padding (i == nb step)
        top2 = jnp.where(i < nb, hcur_ref[0:2],
                         jnp.zeros((2, wd, ch), dt))
        out = _pipe_emit(edge_ref, hprev_ref, xprev_ref, top2, dw_ref,
                         dwb_ref, w2_ref, b2_ref, ln2s_ref, ln2b_ref, th)
        o_ref[0] = out.astype(dt)
        if stats:
            _write_stats(out, cmean_ref, cmax_ref, psum_ref, pmax_ref)

    @pl.when(i > 0)
    def _edge_rotate():
        # h_{i-1}'s bottom 2 rows become the top halo when emitting band i
        edge_ref[...] = hprev_ref[th - 2:th]

    @pl.when(i < nb)
    def _rotate():
        hprev_ref[...] = hcur_ref[...]
        xprev_ref[...] = xcur_ref[...]


def _tail_pipe_parity_kernel(a_ref, s_ref, ln1s_ref, ln1b_ref, w1_ref,
                             b1_ref, dw_ref, dwb_ref, w2_ref, b2_ref,
                             ln2s_ref, ln2b_ref, *refs, th: int, nb: int,
                             stats: bool):
    """Parity-slot variant of ``_tail_pipe_kernel``: bands write scratch
    slot ``i % 2`` and the emit reads slot ``(i-1) % 2`` directly — no
    hprev/xprev rotation copies (~10 MB of VMEM traffic per grid step at
    strip widths, ~1.4 ms/block across 272 steps).  The h_{i-2} bottom-2
    halo is read from slot ``i % 2`` BEFORE the compute overwrites it."""
    if stats:
        (o_ref, cmean_ref, cmax_ref, psum_ref, pmax_ref,
         x_scr, h_scr) = refs
    else:
        (o_ref, x_scr, h_scr) = refs
    wd = o_ref.shape[2]
    c = o_ref.shape[3]
    ch = w1_ref.shape[1]
    dt = o_ref.dtype
    f32 = jnp.float32
    i = pl.program_id(1)
    ic = jax.lax.rem(i, 2)
    ip = jax.lax.rem(i + 1, 2)

    # h_{i-2}'s bottom 2 rows live in slot ic until _compute overwrites it;
    # zeros above the image (bands -1/0 have no real top halo)
    edge = jnp.where(i >= 2, h_scr[ic, th - 2:th],
                     jnp.zeros((2, wd, ch), dt))

    @pl.when(i < nb)
    def _compute():
        x = s_ref[0] + layer_norm(a_ref[0], ln1s_ref[0], ln1b_ref[0])
        lin1 = jnp.dot(x.reshape(th * wd, c), w1_ref[...],
                       preferred_element_type=f32) + b1_ref[0].astype(f32)
        x_scr[ic] = x
        h_scr[ic] = _gelu_kernel(lin1).astype(dt).reshape(th, wd, ch)

    @pl.when(i > 0)
    def _emit():
        top2 = jnp.where(i < nb, h_scr[ic, 0:2],
                         jnp.zeros((2, wd, ch), dt))
        out = _pipe_emit(edge, h_scr[ip], x_scr[ip], top2, dw_ref,
                         dwb_ref, w2_ref, b2_ref, ln2s_ref, ln2b_ref, th)
        o_ref[0] = out.astype(dt)
        if stats:
            _write_stats(out, cmean_ref, cmax_ref, psum_ref, pmax_ref)


def _htb_tail_pipe(attn, shortcut, ln1_s, ln1_b, w1, b1, dw, dwb, w2, b2,
                   ln2_s, ln2_b, interpret: bool = False,
                   stats: bool = False):
    # ``attn`` may be TALLER than ``shortcut`` (a window-padded SCC output,
    # reference pads reflect then crops): the band grid only ever reads rows
    # [0, h), so the caller's 750 MB crop slice is free here via BlockSpec
    b, h, wd, c = shortcut.shape
    ch = w1.shape[1]
    th = _pick_row_tile(h, wd, attn.dtype.itemsize)
    assert th, f"no row tile for H={h}"
    if attn.shape[2] != wd:
        attn = attn[:, :, :wd]  # width pad: crop (no BlockSpec free lunch)
    if attn.shape[1] != h and attn.shape[1] % th != 0:
        attn = attn[:, :h]  # keep Mosaic's block tiling of the taller array
    nb = h // th
    dt = attn.dtype

    # parity-slot scratch is the measured default: whole-frame 1700.3 vs
    # 1710.1 ms median with rotation copies, bit-identical (r5 A/B)
    parity = os.environ.get("SISR_FFN_PARITY", "1") == "1"
    kernel = functools.partial(
        _tail_pipe_parity_kernel if parity else _tail_pipe_kernel,
        th=th, nb=nb, stats=stats)
    const = lambda bi, ri: (0, 0)
    body = pl.BlockSpec(
        (1, th, wd, c), lambda bi, ri: (bi, jnp.minimum(ri, nb - 1), 0, 0))
    out_spec = pl.BlockSpec(
        (1, th, wd, c), lambda bi, ri: (bi, jnp.maximum(ri - 1, 0), 0, 0))
    lag = lambda bi, ri: (bi, jnp.maximum(ri - 1, 0), 0, 0)
    out_shapes = jax.ShapeDtypeStruct((b, h, wd, c), dt)
    out_specs = out_spec
    if stats:
        assert (th * wd) % 128 == 0, (th, wd)  # minor block dim rule
        f32 = jnp.float32
        out_shapes = (
            out_shapes,
            jax.ShapeDtypeStruct((b, nb, 8, th * wd), f32),  # ch-mean map
            jax.ShapeDtypeStruct((b, nb, 8, th * wd), f32),  # ch-max map
            jax.ShapeDtypeStruct((b, nb, 8, c), f32),        # sp-sum part
            jax.ShapeDtypeStruct((b, nb, 8, c), f32),        # sp-max part
        )
        out_specs = (
            out_spec,
            pl.BlockSpec((1, 1, 8, th * wd), lag),
            pl.BlockSpec((1, 1, 8, th * wd), lag),
            pl.BlockSpec((1, 1, 8, c), lag),
            pl.BlockSpec((1, 1, 8, c), lag),
        )
    return pl.pallas_call(
        kernel,
        grid=(b, nb + 1),
        in_specs=[
            body, body,
            pl.BlockSpec((1, c), const),
            pl.BlockSpec((1, c), const),
            pl.BlockSpec((c, ch), const),
            pl.BlockSpec((1, ch), const),
            pl.BlockSpec((K * K, ch), const),
            pl.BlockSpec((1, ch), const),
            pl.BlockSpec((ch, c), const),
            pl.BlockSpec((1, c), const),
            pl.BlockSpec((1, c), const),
            pl.BlockSpec((1, c), const),
        ],
        out_specs=out_specs,
        out_shape=out_shapes,
        scratch_shapes=(
            [pltpu.VMEM((2, th, wd, c), dt),   # x2 parity slots
             pltpu.VMEM((2, th, wd, ch), dt)]  # h parity slots
            if parity else
            [pltpu.VMEM((th, wd, c), dt),      # x (current band)
             pltpu.VMEM((th, wd, c), dt),      # x (previous band)
             pltpu.VMEM((th, wd, ch), dt),     # h (current band)
             pltpu.VMEM((th, wd, ch), dt),     # h (previous band)
             pltpu.VMEM((2, wd, ch), dt)]      # h_{i-2} bottom 2 rows
        ),
        compiler_params=pltpu.CompilerParams(
            dimension_semantics=("parallel", "arbitrary"),
            vmem_limit_bytes=int(os.environ.get(
                "SISR_FFN_VMEM_MB", "100" if th * wd > 4096 else "64"))
            * 1024 * 1024),
        interpret=interpret,
    )(attn, shortcut,
      ln1_s.reshape(1, c), ln1_b.reshape(1, c),
      w1, b1.reshape(1, ch), dw.reshape(K * K, ch), dwb.reshape(1, ch),
      w2, b2.reshape(1, c), ln2_s.reshape(1, c), ln2_b.reshape(1, c))


import os


def _pick_row_tile(h: int, w: int = 192, itemsize: int = 2) -> int:
    # th in {6,8,12,16} is a wash at whole-flagship level once measured
    # *interleaved in one process* (30.3-30.9 ms for all three, r3); earlier
    # cross-process "wins" for 8/12 were environmental variance (see
    # CLAUDE.md measurement rules).  th=24 is a real loss (34.4).
    # SISR_FFN_TH overrides for A/B sweeps.
    # Wide bands (strip tiles, e.g. W=1920) must also fit VMEM: with the
    # lane padding 180->256 the pipe kernel carries ~9 KB per band token of
    # double-buffered windows + scratch + chunked tap temps against the
    # 100 MB raised limit — cap th*W near 8k tokens (th=4 at W=1920, th=8
    # at W=960); 192/512-wide tiles keep th=16.
    env = os.environ.get("SISR_FFN_TH")
    order = (int(env),) if env else (16, 8, 4, 2)
    for th in order:
        if h % th == 0 and (env or th * w <= 8192):
            return th
    return 0


def _htb_tail_pallas(attn, shortcut, ln1_s, ln1_b, w1, b1, dw, dwb, w2, b2,
                     ln2_s, ln2_b, interpret: bool = False):
    b, h, wd, c = attn.shape
    ch = w1.shape[1]
    th = _pick_row_tile(h, wd, attn.dtype.itemsize)
    assert th, f"no row tile for H={h}"
    nb = h // th

    def halo(t):
        """(B, nb, 4, W, C): the 2 rows above and below each band (zeros at
        image borders) — the only materialized copy; the band bodies are
        read straight from the source arrays by BlockSpec."""
        tp = jnp.pad(t, ((0, 0), (PAD // 2, PAD // 2), (0, 0), (0, 0)))
        tops = jnp.stack([tp[:, r * th:r * th + 2] for r in range(nb)], axis=1)
        bots = jnp.stack([tp[:, r * th + th + 2:r * th + th + 4]
                          for r in range(nb)], axis=1)
        return jnp.concatenate([tops, bots], axis=2)

    kernel = functools.partial(_tail_kernel, h_img=h, th=th)
    const = lambda bi, ri: (0, 0)
    body_spec = pl.BlockSpec((1, th, wd, c), lambda bi, ri: (bi, ri, 0, 0))
    halo_spec = pl.BlockSpec((1, 1, 4, wd, c), lambda bi, ri: (bi, ri, 0, 0, 0))
    out = pl.pallas_call(
        kernel,
        grid=(b, nb),
        in_specs=[
            body_spec,
            halo_spec,
            body_spec,
            halo_spec,
            pl.BlockSpec((1, c), const),
            pl.BlockSpec((1, c), const),
            pl.BlockSpec((c, ch), const),
            pl.BlockSpec((1, ch), const),
            pl.BlockSpec((K * K, ch), const),
            pl.BlockSpec((1, ch), const),
            pl.BlockSpec((ch, c), const),
            pl.BlockSpec((1, c), const),
            pl.BlockSpec((1, c), const),
            pl.BlockSpec((1, c), const),
        ],
        out_specs=pl.BlockSpec((1, th, wd, c), lambda bi, ri: (bi, ri, 0, 0)),
        out_shape=jax.ShapeDtypeStruct((b, h, wd, c), attn.dtype),
        compiler_params=pltpu.CompilerParams(
            dimension_semantics=("parallel", "arbitrary"),
            vmem_limit_bytes=int(os.environ.get("SISR_FFN_VMEM_MB", "64"))
            * 1024 * 1024),
        interpret=interpret,
    )(attn, halo(attn), shortcut, halo(shortcut),
      ln1_s.reshape(1, c), ln1_b.reshape(1, c),
      w1, b1.reshape(1, ch), dw.reshape(K * K, ch), dwb.reshape(1, ch),
      w2, b2.reshape(1, c), ln2_s.reshape(1, c), ln2_b.reshape(1, c))
    return out


@functools.partial(jax.custom_vjp, nondiff_argnums=(12,))
def htb_tail(attn, shortcut, ln1_s, ln1_b, w1, b1, dw, dwb, w2, b2,
             ln2_s, ln2_b, use_pallas: bool):
    """Fused HTB tail; see module docstring.  ``use_pallas=False`` runs the
    XLA composition (CPU tests, parity oracle, backward pass)."""
    if use_pallas:
        if os.environ.get("SISR_FFN_PIPE", "1") == "1":
            return _htb_tail_pipe(attn, shortcut, ln1_s, ln1_b, w1, b1, dw,
                                  dwb, w2, b2, ln2_s, ln2_b)
        return _htb_tail_pallas(attn, shortcut, ln1_s, ln1_b, w1, b1, dw, dwb,
                                w2, b2, ln2_s, ln2_b)
    return htb_tail_reference(attn, shortcut, ln1_s, ln1_b, w1, b1, dw, dwb,
                              w2, b2, ln2_s, ln2_b)


def _htb_tail_fwd(attn, shortcut, ln1_s, ln1_b, w1, b1, dw, dwb, w2, b2,
                  ln2_s, ln2_b, use_pallas):
    out = htb_tail(attn, shortcut, ln1_s, ln1_b, w1, b1, dw, dwb, w2, b2,
                   ln2_s, ln2_b, use_pallas)
    return out, (attn, shortcut, ln1_s, ln1_b, w1, b1, dw, dwb, w2, b2,
                 ln2_s, ln2_b)


def _htb_tail_bwd(use_pallas, res, dy):
    _, vjp = jax.vjp(htb_tail_reference, *res)
    return vjp(dy)


htb_tail.defvjp(_htb_tail_fwd, _htb_tail_bwd)


def supports_shape(h: int, w: int = 192) -> bool:
    """Whether the kernel's row banding divides this image height."""
    return _pick_row_tile(h, w) > 0


def stats_reference(out):
    """jnp reference of the folded SCA stats: (cmean (B,H,W), cmax (B,H,W),
    ssum (B,C), smax (B,C)), all f32, computed from the HTB output ``out``
    (= the next block's input x).  cmean/cmax feed the SCA 3x3-conv patch
    build (reference models/hit_sir_pro.py:337-344 channel pools); ssum/smax
    feed the squeeze-excite global pools (:346-353)."""
    of = out.astype(jnp.float32)
    return (of.mean(-1), of.max(-1),
            of.sum((1, 2)), of.max((1, 2)))


def htb_tail_stats(attn, shortcut, ln1_s, ln1_b, w1, b1, dw, dwb, w2, b2,
                   ln2_s, ln2_b, use_pallas: bool, interpret: bool = False):
    """Fused HTB tail that also emits the NEXT block's SCA input statistics
    (see ``stats_reference``) from VMEM, so XLA never re-reads this block's
    output from HBM for the 4 global passes.  Eval-only (no custom_vjp);
    training takes the plain ``htb_tail`` path.

    Returns (out, (cmean, cmax, ssum, smax)).

    ``attn`` may be the window-PADDED SCC output (taller/wider than
    ``shortcut``): the pipe kernel's band grid reads only rows [0, h), so
    the crop is free; the fallback paths slice."""
    b, h, wd, c = shortcut.shape
    th = _pick_row_tile(h, wd, attn.dtype.itemsize)
    if (use_pallas or interpret) and th and (th * wd) % 128 == 0:
        res = _htb_tail_pipe(attn, shortcut, ln1_s, ln1_b, w1, b1, dw, dwb,
                             w2, b2, ln2_s, ln2_b, interpret=interpret,
                             stats=True)
        out, cmean, cmax, psum, pmax = res
        cmean = cmean[:, :, 0, :].reshape(b, h, wd)
        cmax = cmax[:, :, 0, :].reshape(b, h, wd)
        return out, (cmean, cmax,
                     psum[:, :, 0, :].sum(axis=1), pmax[:, :, 0, :].max(axis=1))
    if attn.shape[1:3] != (h, wd):
        attn = attn[:, :h, :wd]
    if use_pallas:
        out = htb_tail(attn, shortcut, ln1_s, ln1_b, w1, b1, dw, dwb, w2, b2,
                       ln2_s, ln2_b, True)
    else:
        out = htb_tail_reference(attn, shortcut, ln1_s, ln1_b, w1, b1, dw,
                                 dwb, w2, b2, ln2_s, ln2_b)
    return out, stats_reference(out)
