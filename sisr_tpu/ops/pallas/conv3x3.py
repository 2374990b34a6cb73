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


def _conv_kernel(*refs, th: int, with_res: bool, act: str):
    if with_res:
        y_ref, hal_ref, res_ref, k_ref, b_ref, o_ref = refs
    else:
        y_ref, hal_ref, k_ref, b_ref, o_ref = refs
    wd = o_ref.shape[2]
    cin = y_ref.shape[3]
    f32 = jnp.float32
    dt = o_ref.dtype

    a = jnp.concatenate([hal_ref[0, 0, 0:1], y_ref[0], hal_ref[0, 0, 1:2]],
                        axis=0)                      # (th+2, W, Cin)
    ap = jnp.pad(a, ((0, 0), (1, 1), (0, 0)))

    def band(lo: int, cw: int):
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

    yp = jnp.pad(y, ((0, 0), (1, 1), (0, 0), (0, 0)))
    halo = jnp.stack([jnp.stack([yp[:, r * th], yp[:, r * th + th + 1]],
                                axis=1) for r in range(nb)], axis=1)
    # halo: (B, nb, 2, W, Cin) — row above and below each band

    kernel9 = kernel.reshape(9, cin, cout).astype(dt)
    with_res = res is not None
    kern = functools.partial(_conv_kernel, th=th, with_res=with_res, act=act)
    body = pl.BlockSpec((1, th, wd, cin), lambda bi, ri: (bi, ri, 0, 0))
    obody = pl.BlockSpec((1, th, wd, cout), lambda bi, ri: (bi, ri, 0, 0))
    hspec = pl.BlockSpec((1, 1, 2, wd, cin), lambda bi, ri: (bi, ri, 0, 0, 0))
    const = lambda bi, ri: (0, 0, 0)

    ins = [y, halo]
    specs = [body, hspec]
    if with_res:
        ins.append(res)
        specs.append(obody)
    ins += [kernel9, bias.reshape(1, cout).astype(dt)]
    specs += [pl.BlockSpec((9, cin, cout), const),
              pl.BlockSpec((1, cout), lambda bi, ri: (0, 0))]

    return pl.pallas_call(
        kern,
        grid=(b, nb),
        in_specs=specs,
        out_specs=obody,
        out_shape=jax.ShapeDtypeStruct((b, h, wd, cout), dt),
        compiler_params=pltpu.CompilerParams(
            dimension_semantics=("parallel", "arbitrary"),
            vmem_limit_bytes=64 * 1024 * 1024),
        interpret=interpret,
    )(*ins)


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
