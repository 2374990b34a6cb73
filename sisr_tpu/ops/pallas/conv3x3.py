"""Fused 3x3 same-conv (+bias, optional residual / leaky) Pallas TPU kernel.

Covers the stage-level convs of HiT-SIR-Pro: the RHTB residual squeeze
``x + conv3x3(blocks(x))`` (reference models/hit_sir_pro.py:928-936) and
``conv_after_body`` (:1299).  XLA's NHWC conv at (192^2, 180->180) runs at
~27 TF/s (~0.73 ms each, ~4.4 ms/tile over the 6 stages) because C=180 pads
to 256 lanes through the conv lowering; expressed as 9 shifted matmuls in
VMEM the same op runs at plain-matmul speed with one HBM read of the input
(+2 halo rows) and one write.

Layout: grid (batch, row bands); band body blocks are zero-copy BlockSpec
views; the 1-row top/bottom halos ride in a small side array (zeros at image
borders — the conv's zero 'same' padding).  Column zero-padding happens
in-VMEM.

Backward falls back to ``jax.vjp`` over the identical XLA reference.
"""

from __future__ import annotations

import functools

import jax
import jax.numpy as jnp
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu


def conv3x3_reference(y, res, kernel, bias, act: str = "none"):
    """XLA oracle: same-padded 3x3 conv + bias (+ optional residual, act)."""
    dt = y.dtype
    out = jax.lax.conv_general_dilated(
        y, kernel.astype(dt), (1, 1), ((1, 1), (1, 1)),
        dimension_numbers=("NHWC", "HWIO", "NHWC")) + bias.astype(dt)
    if act == "leaky":
        out = jax.nn.leaky_relu(out, 0.01)
    elif act == "leaky2":
        out = jax.nn.leaky_relu(out, 0.2)
    if res is not None:
        out = res + out
    return out


def _out_group(cout: int, w: int, cin: int = 64) -> int:
    """Output-pixel group size for tiny-Cout convs (see ``_conv_kernel``).
    conv_last's Cout=3 fills 3 of the MXU pass's 128 N lanes; grouping 8
    adjacent output pixels into lanes runs the same conv in ~40% the MXU
    passes (K = 3 x 12px x Cin over M/8 tokens vs 9 x Cin over M).
    Mosaic only supports column->lane merges from >=128-lane sources, so
    the kernel works on a host-side (W/2, 2*Cin) pixel-pair view — which
    needs 2*Cin to be a 128 multiple and even W.

    DEFAULT OFF (SISR_CONV_GROUP=1 to enable): measured a net LOSS on v5e
    — +2.7 ms/tile at 192-square and catastrophic at strip widths (the
    in-kernel 128->512 merge relayouts dwarf the saved MXU passes;
    whole-frame bench 1.95 s -> 3.12 s, r3)."""
    import os
    if (cout <= 16 and w % 16 == 0 and (2 * cin) % 128 == 0
            and os.environ.get("SISR_CONV_GROUP", "0") == "1"):
        return 8
    return 1


def _conv_kernel(*refs, th: int, with_res: bool, act: str, grp: int,
                 cout: int):
    if with_res:
        y_ref, hal_ref, res_ref, k_ref, b_ref, o_ref = refs
    else:
        y_ref, hal_ref, k_ref, b_ref, o_ref = refs
    f32 = jnp.float32
    dt = o_ref.dtype

    a = jnp.concatenate([hal_ref[0, 0, 0:1], y_ref[0], hal_ref[0, 0, 1:2]],
                        axis=0)
    if grp > 1:
        # grouped mode: refs carry the pixel-pair view (th, W/2, 2*Cin) and
        # the out array is group-packed (W/g, g*Cout); pad by 1 merged col
        # left (pixels -2,-1) and 3 right — the outermost pixels of each
        # group's 12-px K window are zero-weighted
        wd = o_ref.shape[2] * grp
        cin = y_ref.shape[3] // 2
        apm = jnp.pad(a, ((0, 0), (1, 3), (0, 0)))   # (th+2, W/2+4, 2Cin)
    else:
        wd = o_ref.shape[2]
        cin = y_ref.shape[3]
        ap = jnp.pad(a, ((0, 0), (1, 1), (0, 0)))    # (th+2, W+2, Cin)

    def band(lo: int, cw: int):
        if grp > 1:
            # tiny-Cout convs (conv_last: Cout=3) waste the MXU pass on the
            # N dim (3 of 128 lanes); group 8 adjacent output pixels into
            # lanes: each group's taps span 10 pixels, covered by two
            # even-aligned merged segments of 8+4 pixels (12-px K window,
            # ends zero-weighted).  Merges run at >=128 lanes (Mosaic
            # supports no narrower column->lane casts).
            g = grp
            lm = lo // 2
            ng = cw // g
            t0 = apm[:, lm:lm + cw // 2, :].reshape(th + 2, ng, g * cin)
            t1 = (apm[:, lm + g // 2:lm + g // 2 + cw // 2, :]
                  .reshape(th + 2, ng, g * cin)[:, :, :4 * cin])
            imc = jnp.concatenate([t0, t1], axis=-1)  # 12 px * Cin lanes
            im = jnp.concatenate([imc[i:i + th] for i in range(3)],
                                 axis=-1).reshape(th * ng, -1)
            acc = (jnp.dot(im, k_ref[...], preferred_element_type=f32)
                   + b_ref[0].astype(f32))
            if act == "leaky":
                acc = jax.nn.leaky_relu(acc, 0.01)
            elif act == "leaky2":
                acc = jax.nn.leaky_relu(acc, 0.2)
            # (th, cw/g, g*cout): lane->column split back to pixels happens
            # on the host (the out array stays group-packed)
            return acc.reshape(th, ng, g * cout)

        cols = [ap[:, lo + j:lo + j + cw, :] for j in range(3)]  # col shifts
        taps = [cols[j][i:i + th].reshape(th * cw, cin)
                for i in range(3) for j in range(3)]
        if cin < 128:
            # narrow channels (the x4-res head convs run Cin=64): nine K=cin
            # matmuls half-fill the MXU's 128-deep contraction; pack the taps
            # into one (th*cw, 9*cin) im2col block so K rides full 128 passes
            im = jnp.concatenate(taps, axis=-1)
            acc = (jnp.dot(im, k_ref[...].reshape(9 * cin, -1),
                           preferred_element_type=f32) + b_ref[0].astype(f32))
        else:
            acc = jnp.zeros((th * cw, k_ref.shape[2]), f32) + b_ref[0].astype(f32)
            for t in range(9):
                acc += jnp.dot(taps[t], k_ref[t], preferred_element_type=f32)
        if act == "leaky":
            acc = jax.nn.leaky_relu(acc, 0.01)
        elif act == "leaky2":
            acc = jax.nn.leaky_relu(acc, 0.2)
        return acc.reshape(th, cw, -1)

    # wide strip bands chunk the im2col build over 512-column blocks (the
    # full-width f32 im2col block would blow VMEM at W >= 1920)
    if wd <= 512:
        out = band(0, wd)
    else:
        out = jnp.concatenate([band(lo, min(512, wd - lo))
                               for lo in range(0, wd, 512)], axis=1)
    if with_res:
        out = res_ref[0].astype(f32) + out
    o_ref[0] = out.astype(dt)


def _pick_row_tile(h: int, w: int = 192, cin: int = 180,
                   cout: int = 180) -> int:
    """Largest row tile dividing ``h`` whose band fits VMEM.

    The im2col/accumulator temps are built per 512-column chunk (see
    ``_conv_kernel``), so the dominant VMEM residents are the
    double-buffered band windows (~2x2x(cin+cout) bytes per token with
    bf16 and 128-lane padding) plus the chunk temps.  Wide strips (up to
    7680 HR columns) shrink th; 192/768-wide square tiles keep th=16."""
    lanes = lambda n: -(-n // 128) * 128
    per_token = 6 * lanes(cin) + 4 * lanes(cout)
    chunk = (36 * lanes(cin) + 4 * lanes(cout)) * min(th_chunk_cols(), w)
    budget = 56 * 1024 * 1024
    for th in (16, 8, 4, 2):
        if h % th == 0 and th * (w * per_token + chunk) <= budget:
            return th
    return 0


def th_chunk_cols() -> int:
    """Column-chunk width used by the kernel's im2col build."""
    return 512


def _conv3x3_pallas(y, res, kernel, bias, act: str, interpret: bool = False):
    b, h, wd, cin = y.shape
    cout = kernel.shape[-1]
    th = _pick_row_tile(h, wd, cin, cout)
    assert th, f"no row tile for H={h}"
    nb = h // th
    dt = y.dtype

    grp = _out_group(cout, wd, cin)
    with_res = res is not None
    assert not (grp > 1 and with_res)
    kern = functools.partial(_conv_kernel, th=th, with_res=with_res, act=act,
                             grp=grp, cout=cout)
    if grp > 1:
        # pixel-pair view (free reshape): Mosaic can't column->lane-merge
        # from sub-128-lane sources, so the kernel gets (W/2, 2*Cin)
        y = y.reshape(b, h, wd // 2, 2 * cin)
    yp = jnp.pad(y, ((0, 0), (1, 1), (0, 0), (0, 0)))
    halo = jnp.stack([jnp.stack([yp[:, r * th], yp[:, r * th + th + 1]],
                                axis=1) for r in range(nb)], axis=1)
    # halo: (B, nb, 2, W(/2), Cin(*2)) — row above and below each band

    wdk, cink = y.shape[2], y.shape[3]
    body = pl.BlockSpec((1, th, wdk, cink), lambda bi, ri: (bi, ri, 0, 0))
    wdo, couto = (wd // grp, grp * cout) if grp > 1 else (wd, cout)
    obody = pl.BlockSpec((1, th, wdo, couto), lambda bi, ri: (bi, ri, 0, 0))
    hspec = pl.BlockSpec((1, 1, 2, wdk, cink), lambda bi, ri: (bi, ri, 0, 0, 0))
    const = lambda bi, ri: (0, 0, 0)

    ins = [y, halo]
    specs = [body, hspec]
    if with_res:
        ins.append(res)
        specs.append(obody)
    if grp > 1:
        # grouped weights (3*12*cin, g*cout): K = (row i, window pixel m,
        # fin) where pixel m covers group pixels [-2, 10); output pixel u's
        # tap t sits at m = u + t + 1 (m = 0 and m = 11 always zero)
        k3 = kernel.astype(dt)                      # (3, 3, cin, cout)
        wg = jnp.zeros((3, 12, cin, grp, cout), dt)
        for u in range(grp):
            for t in range(3):
                wg = wg.at[:, u + t + 1, :, u, :].set(k3[:, t])
        ins += [wg.reshape(3 * 12 * cin, grp * cout),
                jnp.tile(bias.astype(dt), grp).reshape(1, grp * cout)]
        specs += [pl.BlockSpec((3 * 12 * cin, grp * cout),
                               lambda bi, ri: (0, 0)),
                  pl.BlockSpec((1, grp * cout), lambda bi, ri: (0, 0))]
    else:
        ins += [kernel.reshape(9, cin, cout).astype(dt),
                bias.reshape(1, cout).astype(dt)]
        specs += [pl.BlockSpec((9, cin, cout), const),
                  pl.BlockSpec((1, cout), lambda bi, ri: (0, 0))]

    out = pl.pallas_call(
        kern,
        grid=(b, nb),
        in_specs=specs,
        out_specs=obody,
        out_shape=jax.ShapeDtypeStruct((b, h, wdo, couto), dt),
        compiler_params=pltpu.CompilerParams(
            dimension_semantics=("parallel", "arbitrary"),
            vmem_limit_bytes=64 * 1024 * 1024),
        interpret=interpret,
    )(*ins)
    if grp > 1:
        out = out.reshape(b, h, wd, cout)           # unpack pixel groups
    return out


@functools.partial(jax.custom_vjp, nondiff_argnums=(4, 5))
def conv3x3(y, res, kernel, bias, act: str, use_pallas: bool):
    """Fused 3x3 conv; ``res`` may be None.  ``use_pallas=False`` runs the
    XLA composition (CPU, backward, odd shapes)."""
    if use_pallas:
        return _conv3x3_pallas(y, res, kernel, bias, act)
    return conv3x3_reference(y, res, kernel, bias, act)


def _fwd(y, res, kernel, bias, act, use_pallas):
    return conv3x3(y, res, kernel, bias, act, use_pallas), (y, res, kernel, bias)


def _bwd(act, use_pallas, saved, dy):
    y, res, kernel, bias = saved
    if res is None:
        _, vjp = jax.vjp(lambda a, k, b: conv3x3_reference(a, None, k, b, act),
                         y, kernel, bias)
        dy_, dk, db = vjp(dy)
        return dy_, None, dk, db
    _, vjp = jax.vjp(lambda a, r, k, b: conv3x3_reference(a, r, k, b, act),
                     y, res, kernel, bias)
    return vjp(dy)


conv3x3.defvjp(_fwd, _bwd)


def supports_shape(h: int, w: int = 192, cin: int = 180,
                   cout: int = 180) -> bool:
    return _pick_row_tile(h, w, cin, cout) > 0


# ---------------------------------------------------------------------------
# Shuffled-input conv: conv3x3(pixel_shuffle_phase_major(y, 2)) without ever
# materializing the 2x-upsampled array in HBM.  The XLA pixel shuffle of the
# x4 head costs 7.4 ms/strip of transpose + layout copies (755 MB round trip
# measured r3); here the 2x2 interleave happens in VMEM per row band.
# ---------------------------------------------------------------------------

def conv3x3_shuffled_reference(yp, kernel, bias, act: str = "none"):
    from sisr_tpu.ops.pixel_shuffle import pixel_shuffle_phase_major
    return conv3x3_reference(pixel_shuffle_phase_major(yp, 2), None,
                             kernel, bias, act)


def _shuffled_conv_kernel(y_ref, hal_ref, k_ref, b_ref, o_ref, *, th: int,
                          act: str):
    """y_ref (1, th/2, W2, 4C) packed body; hal_ref (1, 1, 2, W2, 4C) the
    packed row above/below; o_ref (1, th, 2*W2, Cout).  Channels phase-major
    (128-aligned slices at C=64 bf16)."""
    w2 = y_ref.shape[2]
    c4 = y_ref.shape[3]
    cin = c4 // 4
    f32 = jnp.float32
    dt = o_ref.dtype

    slab = jnp.concatenate([hal_ref[0, 0, 0:1], y_ref[0], hal_ref[0, 0, 1:2]],
                           axis=0)                   # (th/2+2, W2, 4C)
    rows = slab.shape[0]

    # channels are column-phase-major (j*2 + i): interleave columns at the
    # 2C=128-lane width (the direct (W, 2C) -> (2W, C) cast is unsupported
    # Mosaic-side), then split row phases with aligned C-lane slices
    X = slab.reshape(rows, 2 * w2, 2 * cin)
    u = jnp.stack([X[:, :, :cin], X[:, :, cin:]],
                  axis=1).reshape(2 * rows, 2 * w2, cin)
    u = u[1:2 * rows - 1]                            # rows r0-1 .. r0+th+1
    up = jnp.pad(u, ((0, 0), (1, 1), (0, 0)))
    wd = 2 * w2

    def band(lo: int, cw: int):
        cols = [up[:, lo + j:lo + j + cw, :] for j in range(3)]
        taps = [cols[j][i:i + th].reshape(th * cw, cin)
                for i in range(3) for j in range(3)]
        im = jnp.concatenate(taps, axis=-1)
        acc = (jnp.dot(im, k_ref[...].reshape(9 * cin, -1),
                       preferred_element_type=f32) + b_ref[0].astype(f32))
        if act == "leaky":
            acc = jax.nn.leaky_relu(acc, 0.01)
        elif act == "leaky2":
            acc = jax.nn.leaky_relu(acc, 0.2)
        return acc.reshape(th, cw, -1)

    if wd <= 512:
        out = band(0, wd)
    else:
        out = jnp.concatenate([band(lo, min(512, wd - lo))
                               for lo in range(0, wd, 512)], axis=1)
    o_ref[0] = out.astype(dt)


def _conv3x3_shuffled_pallas(yp, kernel, bias, act: str,
                             interpret: bool = False):
    b, h2, w2, c4 = yp.shape
    cin = c4 // 4
    cout = kernel.shape[-1]
    hout, wout = 2 * h2, 2 * w2
    th = _pick_row_tile(hout, wout, cin, cout)
    assert th and th % 2 == 0, (hout, wout, th)
    thp = th // 2
    nb = hout // th
    dt = yp.dtype

    ypad = jnp.pad(yp, ((0, 0), (1, 1), (0, 0), (0, 0)))
    halo = jnp.stack([jnp.stack([ypad[:, r * thp], ypad[:, r * thp + thp + 1]],
                                axis=1) for r in range(nb)], axis=1)

    kern = functools.partial(_shuffled_conv_kernel, th=th, act=act)
    return pl.pallas_call(
        kern,
        grid=(b, nb),
        in_specs=[
            pl.BlockSpec((1, thp, w2, c4), lambda bi, ri: (bi, ri, 0, 0)),
            pl.BlockSpec((1, 1, 2, w2, c4), lambda bi, ri: (bi, ri, 0, 0, 0)),
            pl.BlockSpec((9, cin, cout), lambda bi, ri: (0, 0, 0)),
            pl.BlockSpec((1, cout), lambda bi, ri: (0, 0)),
        ],
        out_specs=pl.BlockSpec((1, th, wout, cout),
                               lambda bi, ri: (bi, ri, 0, 0)),
        out_shape=jax.ShapeDtypeStruct((b, hout, wout, cout), dt),
        compiler_params=pltpu.CompilerParams(
            dimension_semantics=("parallel", "arbitrary"),
            vmem_limit_bytes=100 * 1024 * 1024),
        interpret=interpret,
    )(yp, halo, kernel.reshape(9, cin, cout).astype(dt),
      bias.reshape(1, cout).astype(dt))


@functools.partial(jax.custom_vjp, nondiff_argnums=(3, 4))
def conv3x3_shuffled(yp, kernel, bias, act: str, use_pallas: bool):
    """conv3x3 over the phase-major pixel shuffle of ``yp`` (factor 2).
    ``use_pallas=False`` runs the XLA composition (CPU, backward)."""
    if use_pallas:
        return _conv3x3_shuffled_pallas(yp, kernel, bias, act)
    return conv3x3_shuffled_reference(yp, kernel, bias, act)


def _sfwd(yp, kernel, bias, act, use_pallas):
    return conv3x3_shuffled(yp, kernel, bias, act, use_pallas), (yp, kernel, bias)


def _sbwd(act, use_pallas, saved, dy):
    yp, kernel, bias = saved
    _, vjp = jax.vjp(lambda a, k, b: conv3x3_shuffled_reference(a, k, b, act),
                     yp, kernel, bias)
    return vjp(dy)


conv3x3_shuffled.defvjp(_sfwd, _sbwd)


# ---------------------------------------------------------------------------
# Shuffled conv + tail conv in ONE kernel: conv_last(act1(conv_hr(shuffle(y))))
# for the x4 head.  The standalone pair writes + re-reads the full 4x-res hr
# map (755 MB each way per 192x1920 strip) and runs conv_last as its own
# launch; here the hr bands stay in VMEM and the tail conv emits with a
# one-band lag (the 1-row halo of hr comes from the neighbouring bands via
# scratch, like the FFN pipe kernel) — grid runs nb+1 steps.
# ---------------------------------------------------------------------------

def conv3x3_shuffled_tail_reference(yp, k1, b1, act1, k2, b2):
    return conv3x3_reference(
        conv3x3_shuffled_reference(yp, k1, b1, act1), None, k2, b2, "none")


def _shuffled_tail_kernel(y_ref, hal_ref, k1_ref, b1_ref, k2_ref, b2_ref,
                          o_ref, hcur_ref, hprev_ref, edge_ref, *, th: int,
                          nb: int, act1: str):
    w2 = y_ref.shape[2]
    c4 = y_ref.shape[3]
    cin = c4 // 4
    c1 = hcur_ref.shape[2]
    f32 = jnp.float32
    dt = o_ref.dtype
    wd = 2 * w2
    i = pl.program_id(1)

    @pl.when(i == 0)
    def _init():
        # hr row -1 above the image is the tail conv's zero padding
        edge_ref[...] = jnp.zeros_like(edge_ref)

    @pl.when(i < nb)
    def _compute():
        # identical interleave + conv as _shuffled_conv_kernel
        slab = jnp.concatenate([hal_ref[0, 0, 0:1], y_ref[0],
                                hal_ref[0, 0, 1:2]], axis=0)
        rows = slab.shape[0]
        X = slab.reshape(rows, 2 * w2, 2 * cin)
        u = jnp.stack([X[:, :, :cin], X[:, :, cin:]],
                      axis=1).reshape(2 * rows, 2 * w2, cin)
        u = u[1:2 * rows - 1]
        up = jnp.pad(u, ((0, 0), (1, 1), (0, 0)))

        def band(lo: int, cw: int):
            cols = [up[:, lo + j:lo + j + cw, :] for j in range(3)]
            taps = [cols[j][r:r + th].reshape(th * cw, cin)
                    for r in range(3) for j in range(3)]
            im = jnp.concatenate(taps, axis=-1)
            acc = (jnp.dot(im, k1_ref[...].reshape(9 * cin, -1),
                           preferred_element_type=f32) + b1_ref[0].astype(f32))
            if act1 == "leaky":
                acc = jax.nn.leaky_relu(acc, 0.01)
            elif act1 == "leaky2":
                acc = jax.nn.leaky_relu(acc, 0.2)
            return acc.reshape(th, cw, -1)

        if wd <= 512:
            hr = band(0, wd)
        else:
            hr = jnp.concatenate([band(lo, min(512, wd - lo))
                                  for lo in range(0, wd, 512)], axis=1)
        hcur_ref[...] = hr.astype(hcur_ref.dtype)

    @pl.when(i > 0)
    def _emit():
        # rows below the image are zero padding (i == nb step)
        bot = jnp.where(i < nb, hcur_ref[0:1],
                        jnp.zeros((1, wd, c1), hcur_ref.dtype))
        hstack = jnp.concatenate([edge_ref[...], hprev_ref[...], bot],
                                 axis=0)                      # (th+2, wd, c1)
        hp2 = jnp.pad(hstack, ((0, 0), (1, 1), (0, 0)))

        def tail(lo: int, cw: int):
            cols = [hp2[:, lo + j:lo + j + cw, :] for j in range(3)]
            taps = [cols[j][r:r + th].reshape(th * cw, c1)
                    for r in range(3) for j in range(3)]
            im = jnp.concatenate(taps, axis=-1)
            acc = (jnp.dot(im, k2_ref[...].reshape(9 * c1, -1),
                           preferred_element_type=f32) + b2_ref[0].astype(f32))
            return acc.reshape(th, cw, -1)

        if wd <= 512:
            out = tail(0, wd)
        else:
            out = jnp.concatenate([tail(lo, min(512, wd - lo))
                                   for lo in range(0, wd, 512)], axis=1)
        o_ref[0] = out.astype(dt)

    @pl.when(i > 0)
    def _edge_rotate():
        edge_ref[...] = hprev_ref[th - 1:th]

    @pl.when(i < nb)
    def _rotate():
        hprev_ref[...] = hcur_ref[...]


def _conv3x3_shuffled_tail_pallas(yp, k1, b1, act1, k2, b2,
                                  interpret: bool = False):
    b, h2, w2, c4 = yp.shape
    cin = c4 // 4
    c1 = k1.shape[-1]
    cout = k2.shape[-1]
    hout, wout = 2 * h2, 2 * w2
    th = _pick_row_tile(hout, wout, cin, max(c1, cout))
    assert th and th % 2 == 0, (hout, wout, th)
    thp = th // 2
    nb = hout // th
    dt = yp.dtype

    ypad = jnp.pad(yp, ((0, 0), (1, 1), (0, 0), (0, 0)))
    halo = jnp.stack([jnp.stack([ypad[:, r * thp], ypad[:, r * thp + thp + 1]],
                                axis=1) for r in range(nb)], axis=1)

    kern = functools.partial(_shuffled_tail_kernel, th=th, nb=nb, act1=act1)
    clamp = lambda bi, ri: (bi, jnp.minimum(ri, nb - 1), 0, 0)
    clamp5 = lambda bi, ri: (bi, jnp.minimum(ri, nb - 1), 0, 0, 0)
    return pl.pallas_call(
        kern,
        grid=(b, nb + 1),
        in_specs=[
            pl.BlockSpec((1, thp, w2, c4), clamp),
            pl.BlockSpec((1, 1, 2, w2, c4), clamp5),
            pl.BlockSpec((9, cin, c1), lambda bi, ri: (0, 0, 0)),
            pl.BlockSpec((1, c1), lambda bi, ri: (0, 0)),
            pl.BlockSpec((9, c1, cout), lambda bi, ri: (0, 0, 0)),
            pl.BlockSpec((1, cout), lambda bi, ri: (0, 0)),
        ],
        out_specs=pl.BlockSpec((1, th, wout, cout),
                               lambda bi, ri: (bi, jnp.maximum(ri - 1, 0), 0, 0)),
        out_shape=jax.ShapeDtypeStruct((b, hout, wout, cout), dt),
        scratch_shapes=[
            pltpu.VMEM((th, wout, c1), dt),   # hr (current band)
            pltpu.VMEM((th, wout, c1), dt),   # hr (previous band)
            pltpu.VMEM((1, wout, c1), dt),    # hr band i-2, last row
        ],
        compiler_params=pltpu.CompilerParams(
            dimension_semantics=("parallel", "arbitrary"),
            vmem_limit_bytes=100 * 1024 * 1024),
        interpret=interpret,
    )(yp, halo, k1.reshape(9, cin, c1).astype(dt),
      b1.reshape(1, c1).astype(dt),
      k2.reshape(9, c1, cout).astype(dt), b2.reshape(1, cout).astype(dt))


# ---------------------------------------------------------------------------
# Packed-output tail kernel (v2): same math as conv3x3_shuffled_tail but the
# conv_last emits GROUP-PACKED output (B, H, W/G, G*3) instead of (B, H, W, 3).
#
# Two wins, both measured on the whole-frame profile (r5):
#   * XLA's TPU layout pads the minor dim to 128 lanes, so every (..., 3)
#     head output is 42x inflated in HBM — the banded head's per-band output
#     write, kept-slice and stack each move ~1 GB instead of ~26 MB.
#   * conv_last's matmul N=3 fills 3 of the MXU pass's 128 lanes; grouping
#     G=16 adjacent output pixels into the N axis (K widens to the union of
#     their taps) runs the same conv in ~2.7x fewer MXU passes.
#
# The kernel works in a PIXEL-PAIR representation throughout (Mosaic supports
# column<->lane merges only from >=128-lane sources, see ROADMAP): conv_hr is
# a pair-space conv (K = 3 rows x 3 pair-cols x 2cin, N = 2*c1 = 128 — also
# removing the old N=64 half-fill and halving the hr scratch), and conv_last
# groups g=8 hr pairs per output group.
# ---------------------------------------------------------------------------


def _pair_hr_weights(k1, b1, dt):
    """(3, 3, cin, c1) conv kernel -> pair-space (3*3*2cin, 2c1) weights.

    Input pair lanes: [col-phase 0 | col-phase 1] x cin; output pair lanes
    [out px 2u | out px 2u+1] x c1.  Pair-col tap j covers input pair u-1+j.
    """
    cin, c1 = k1.shape[2], k1.shape[3]
    k1 = k1.astype(jnp.float32)
    w = jnp.zeros((3, 3, 2, cin, 2, c1), jnp.float32)
    # out phase 0 (px 2u) taps px 2u-1..2u+1 = (j0,ph1) (j1,ph0) (j1,ph1)
    w = w.at[:, 0, 1, :, 0, :].set(k1[:, 0])
    w = w.at[:, 1, 0, :, 0, :].set(k1[:, 1])
    w = w.at[:, 1, 1, :, 0, :].set(k1[:, 2])
    # out phase 1 (px 2u+1) taps 2u..2u+2 = (j1,ph0) (j1,ph1) (j2,ph0)
    w = w.at[:, 1, 0, :, 1, :].set(k1[:, 0])
    w = w.at[:, 1, 1, :, 1, :].set(k1[:, 1])
    w = w.at[:, 2, 0, :, 1, :].set(k1[:, 2])
    return (w.reshape(3 * 3 * 2 * cin, 2 * c1).astype(dt),
            jnp.tile(b1, 2).reshape(1, 2 * c1).astype(dt))


def _group_last_weights(k2, b2, g: int, dt):
    """(3, 3, c1, cout) conv kernel -> grouped (3*(g+2)*2c1, 2g*cout) weights.

    K index (row r, window pair jp in [0, g+2), pair phase pin, channel);
    input pixel of (jp, pin) relative to the group start = 2*jp + pin - 2.
    Output column u*cout + m for group pixel u in [0, 2g)."""
    c1, cout = k2.shape[2], k2.shape[3]
    k2 = k2.astype(jnp.float32)
    w = jnp.zeros((3, g + 2, 2, c1, 2 * g, cout), jnp.float32)
    for jp in range(g + 2):
        for pin in range(2):
            for u in range(2 * g):
                t = 2 * jp + pin - 2 - u + 1
                if 0 <= t <= 2:
                    w = w.at[:, jp, pin, :, u, :].set(k2[:, t])
    return (w.reshape(3 * (g + 2) * 2 * c1, 2 * g * cout).astype(dt),
            jnp.tile(b2, 2 * g).reshape(1, 2 * g * cout).astype(dt))


def _shuffled_tail_kernel_v2(y_ref, hal_ref, k1_ref, b1_ref, k2_ref, b2_ref,
                             o_ref, hcur_ref, hprev_ref, edge_ref, *, th: int,
                             nb: int, act1: str, g: int):
    """Pair-form lagged tail: hr lives as (th, W/2, 2*c1) pixel pairs."""
    w2 = y_ref.shape[2]
    c4 = y_ref.shape[3]
    cin = c4 // 4
    c1p = hcur_ref.shape[2]          # 2 * c1
    cout = o_ref.shape[3] // (2 * g)
    f32 = jnp.float32
    dt = o_ref.dtype
    i = pl.program_id(1)

    @pl.when(i == 0)
    def _init():
        edge_ref[...] = jnp.zeros_like(edge_ref)

    @pl.when(i < nb)
    def _compute():
        slab = jnp.concatenate([hal_ref[0, 0, 0:1], y_ref[0],
                                hal_ref[0, 0, 1:2]], axis=0)
        # pair view with BOTH column phases on lanes, row phases interleaved:
        # slab lanes are (2b + a)-major cin blocks (a=row, b=col phase)
        pa = jnp.concatenate([slab[:, :, :cin], slab[:, :, 2 * cin:3 * cin]],
                             axis=-1)               # row phase 0, (r, w2, 2cin)
        pb = jnp.concatenate([slab[:, :, cin:2 * cin], slab[:, :, 3 * cin:]],
                             axis=-1)               # row phase 1
        rows = slab.shape[0]
        u2 = jnp.stack([pa, pb], axis=1).reshape(2 * rows, w2, 2 * cin)
        u2 = u2[1:2 * rows - 1]                     # rows r0-1 .. r0+th+1
        up = jnp.pad(u2, ((0, 0), (1, 1), (0, 0)))  # 1 zero PAIR each side

        def band(lo: int, cw: int):
            cols = [up[:, lo + j:lo + j + cw, :] for j in range(3)]
            taps = [cols[j][r:r + th].reshape(th * cw, 2 * cin)
                    for r in range(3) for j in range(3)]
            im = jnp.concatenate(taps, axis=-1)     # (th*cw, 18*cin)
            acc = (jnp.dot(im, k1_ref[...], preferred_element_type=f32)
                   + b1_ref[0].astype(f32))
            if act1 == "leaky":
                acc = jax.nn.leaky_relu(acc, 0.01)
            elif act1 == "leaky2":
                acc = jax.nn.leaky_relu(acc, 0.2)
            return acc.reshape(th, cw, c1p)

        if w2 <= 512:
            hr = band(0, w2)
        else:
            hr = jnp.concatenate([band(lo, min(512, w2 - lo))
                                  for lo in range(0, w2, 512)], axis=1)
        hcur_ref[...] = hr.astype(hcur_ref.dtype)

    @pl.when(i > 0)
    def _emit():
        bot = jnp.where(i < nb, hcur_ref[0:1],
                        jnp.zeros((1, w2, c1p), hcur_ref.dtype))
        hstack = jnp.concatenate([edge_ref[...], hprev_ref[...], bot],
                                 axis=0)            # (th+2, w2, 2c1)
        ng = w2 // g
        hg = hstack.reshape(th + 2, ng, g * c1p)    # merge from 128 lanes: OK
        z = jnp.zeros((th + 2, 1, c1p), hstack.dtype)
        prev_last = jnp.concatenate(
            [z, hg[:, :ng - 1, (g - 1) * c1p:]], axis=1)
        next_first = jnp.concatenate([hg[:, 1:, :c1p], z], axis=1)
        img = jnp.concatenate([prev_last, hg, next_first], axis=-1)

        def tail(lo: int, cg: int):
            blk = [img[r:r + th, lo:lo + cg].reshape(th * cg, -1)
                   for r in range(3)]
            im = jnp.concatenate(blk, axis=-1)      # (th*cg, 3*(g+2)*2c1)
            acc = (jnp.dot(im, k2_ref[...], preferred_element_type=f32)
                   + b2_ref[0].astype(f32))
            return acc.reshape(th, cg, 2 * g * cout)

        chunk = 128
        if ng <= chunk:
            out = tail(0, ng)
        else:
            out = jnp.concatenate([tail(lo, min(chunk, ng - lo))
                                   for lo in range(0, ng, chunk)], axis=1)
        o_ref[0] = out.astype(dt)

    @pl.when(i > 0)
    def _edge_rotate():
        edge_ref[...] = hprev_ref[th - 1:th]

    @pl.when(i < nb)
    def _rotate():
        hprev_ref[...] = hcur_ref[...]


def tail_pack_group() -> int:
    """Output-pixel group size of the packed tail (G px = 2*this many pairs)."""
    return 16


def supports_packed_tail(h2: int, w2: int, c4: int, cout: int = 3) -> bool:
    """Whether the packed tail kernel covers this packed head input."""
    import os
    cin = c4 // 4
    g = tail_pack_group() // 2
    th = _pick_row_tile(2 * h2, 2 * w2, cin, max(cin, cout))
    return (th > 0 and th % 2 == 0 and 2 * cin >= 128
            and (2 * w2) % (2 * g) == 0
            and os.environ.get("SISR_TAIL_PACK", "1") == "1")


def _conv3x3_shuffled_tail_packed_pallas(yp, k1, b1, act1, k2, b2,
                                         interpret: bool = False):
    b, h2, w2, c4 = yp.shape
    cin = c4 // 4
    c1 = k1.shape[-1]
    cout = k2.shape[-1]
    g = tail_pack_group() // 2
    hout, wout = 2 * h2, 2 * w2
    wpair = wout // 2
    ng = wpair // g
    th = _pick_row_tile(hout, wout, cin, max(c1, cout))
    assert th and th % 2 == 0 and 2 * c1 >= 128 and wpair % g == 0, (
        hout, wout, th, c1)
    thp = th // 2
    nb = hout // th
    dt = yp.dtype

    ypad = jnp.pad(yp, ((0, 0), (1, 1), (0, 0), (0, 0)))
    halo = jnp.stack([jnp.stack([ypad[:, r * thp], ypad[:, r * thp + thp + 1]],
                                axis=1) for r in range(nb)], axis=1)
    k1p, b1p = _pair_hr_weights(k1, b1, dt)
    k2g, b2g = _group_last_weights(k2, b2, g, dt)

    kern = functools.partial(_shuffled_tail_kernel_v2, th=th, nb=nb,
                             act1=act1, g=g)
    clamp = lambda bi, ri: (bi, jnp.minimum(ri, nb - 1), 0, 0)
    clamp5 = lambda bi, ri: (bi, jnp.minimum(ri, nb - 1), 0, 0, 0)
    return pl.pallas_call(
        kern,
        grid=(b, nb + 1),
        in_specs=[
            pl.BlockSpec((1, thp, w2, c4), clamp),
            pl.BlockSpec((1, 1, 2, w2, c4), clamp5),
            pl.BlockSpec(k1p.shape, lambda bi, ri: (0, 0)),
            pl.BlockSpec(b1p.shape, lambda bi, ri: (0, 0)),
            pl.BlockSpec(k2g.shape, lambda bi, ri: (0, 0)),
            pl.BlockSpec(b2g.shape, lambda bi, ri: (0, 0)),
        ],
        out_specs=pl.BlockSpec((1, th, ng, 2 * g * cout),
                               lambda bi, ri: (bi, jnp.maximum(ri - 1, 0), 0, 0)),
        out_shape=jax.ShapeDtypeStruct((b, hout, ng, 2 * g * cout), dt),
        scratch_shapes=[
            pltpu.VMEM((th, wpair, 2 * c1), dt),   # hr pairs (current band)
            pltpu.VMEM((th, wpair, 2 * c1), dt),   # hr pairs (previous band)
            pltpu.VMEM((1, wpair, 2 * c1), dt),    # hr band i-2, last row
        ],
        compiler_params=pltpu.CompilerParams(
            dimension_semantics=("parallel", "arbitrary"),
            vmem_limit_bytes=100 * 1024 * 1024),
        interpret=interpret,
    )(yp, halo, k1p, b1p, k2g, b2g)


def conv3x3_shuffled_tail_packed_reference(yp, k1, b1, act1, k2, b2,
                                           grp: int | None = None):
    """XLA oracle: the plain tail output reshaped to (B, H, W/G, G*cout)."""
    grp = grp if grp is not None else tail_pack_group()
    out = conv3x3_shuffled_tail_reference(yp, k1, b1, act1, k2, b2)
    b, h, w, cout = out.shape
    return out.reshape(b, h, w // grp, grp * cout)


@functools.partial(jax.custom_vjp, nondiff_argnums=(3, 6))
def conv3x3_shuffled_tail_packed(yp, k1, b1, act1, k2, b2, use_pallas: bool):
    """The x4 head's conv_hr + conv_last with GROUP-PACKED output
    (B, H, W/16, 16*cout) — see the v2 kernel comment for why.  Values equal
    ``conv3x3_shuffled_tail(...).reshape(B, H, W/16, 16*cout)`` exactly."""
    if use_pallas:
        return _conv3x3_shuffled_tail_packed_pallas(yp, k1, b1, act1, k2, b2)
    return conv3x3_shuffled_tail_packed_reference(yp, k1, b1, act1, k2, b2)


def _stpfwd(yp, k1, b1, act1, k2, b2, use_pallas):
    return (conv3x3_shuffled_tail_packed(yp, k1, b1, act1, k2, b2, use_pallas),
            (yp, k1, b1, k2, b2))


def _stpbwd(act1, use_pallas, saved, dy):
    yp, k1, b1, k2, b2 = saved
    _, vjp = jax.vjp(
        lambda a, ka, ba, kb, bb: conv3x3_shuffled_tail_packed_reference(
            a, ka, ba, act1, kb, bb), yp, k1, b1, k2, b2)
    return vjp(dy)


conv3x3_shuffled_tail_packed.defvjp(_stpfwd, _stpbwd)


@functools.partial(jax.custom_vjp, nondiff_argnums=(3, 6))
def conv3x3_shuffled_tail(yp, k1, b1, act1, k2, b2, use_pallas: bool):
    """conv3x3(act1(conv3x3(pixel_shuffle_phase_major(yp, 2), k1, b1)),
    k2, b2) — the x4 head's conv_hr + conv_last as one lagged-pipeline
    kernel.  ``use_pallas=False`` runs the XLA composition (CPU, backward)."""
    if use_pallas:
        return _conv3x3_shuffled_tail_pallas(yp, k1, b1, act1, k2, b2)
    return conv3x3_shuffled_tail_reference(yp, k1, b1, act1, k2, b2)


def _stfwd(yp, k1, b1, act1, k2, b2, use_pallas):
    return (conv3x3_shuffled_tail(yp, k1, b1, act1, k2, b2, use_pallas),
            (yp, k1, b1, k2, b2))


def _stbwd(act1, use_pallas, saved, dy):
    yp, k1, b1, k2, b2 = saved
    _, vjp = jax.vjp(
        lambda a, ka, ba, kb, bb: conv3x3_shuffled_tail_reference(
            a, ka, ba, act1, kb, bb), yp, k1, b1, k2, b2)
    return vjp(dy)


conv3x3_shuffled_tail.defvjp(_stfwd, _stbwd)
