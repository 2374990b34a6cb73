"""Fused Spatial-Channel Correlation attention kernel (Pallas TPU).

The SCC op (reference models/hit_sir_pro.py:362-602) is the hot path of every
transformer block.  Lowered through XLA it costs ~20 ms of synchronous layout
copies plus >100 ms of async copy traffic per 192x192 flagship tile (profiled
on v5e): the (windows, L, C) tensors bounce between C-minor layouts (for
elementwise) and L-minor layouts (for the MXU) through HBM.

This kernel computes the whole window-local pipeline in VMEM per window:

    window gather -> q/v split -> k synthesis -> learned pooling ->
    S-SC (bias-added correlation) -> C-SC (channel gram) -> concat

using an algebraic normal form where every step is a plain matmul:
  * k-generation: block-diagonal (C/2, C/2) weights (exact: cross-head
    blocks are zero)
  * pooling:      constant one-nonzero-per-column matrix P (l_base, L)
                  holding the learned pool weights
  * head-blocked S-SC: K/V tiled head-wise and masked block-diagonally so
    per-head correlation is ONE (L, C/2) @ (C/2, heads*l_base) matmul
  * C-SC:         (C/2, L) @ (L, C/2) gram + (L, C/2) @ (C/2, C/2)

The relative-position bias table is input-independent per block and is
computed outside (structured small gather) and streamed in.

Forward runs the kernel; backward falls back to jax.vjp over the identical
jnp reference (`scc_reference`) — numerically the same function.
Windows with wh or ww < 8 use the reference path (Mosaic requires the
second-minor block dim to be a multiple of 8).
"""

from __future__ import annotations

import functools
from typing import Tuple

import numpy as np
import jax
import jax.numpy as jnp
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu


# ---------------------------------------------------------------------------
# shared math (jnp reference == kernel semantics)
# ---------------------------------------------------------------------------

def scc_reference(x, w1, w2, bb, pmat, pb, mask, bias, heads: int):
    """jnp reference of the fused op.

    x:    (B, nWh, wh, nWw, ww, C)  [pure reshape of NHWC input]
    w1/w2:(C/2, C/2) block-diagonal k-gen weights (already halved)
    bb:   (1, C/2) combined k-gen bias (already halved)
    pmat: (l_base, L) learned-pooling matrix (weights only)
    pb:   (1, 1) scalar pooling bias, added to every pooled entry
    mask: (heads*l_base, C/2) 0/1 block-diagonal head mask
    bias: (L, heads*l_base) relative-position bias (per block, precomputed)
    returns (B, nWh, wh, nWw, ww, C) concat [S-SC | C-SC]
    """
    b, nwh, wh, nww, ww, c = x.shape
    half = c // 2
    l_full = wh * ww
    d = half // heads
    l_base = pmat.shape[0]

    xw = x.transpose(0, 1, 3, 2, 4, 5).reshape(-1, l_full, c)
    q, v = xw[..., :half], xw[..., half:]
    k = q @ w1 + v @ w2 + bb
    k_pool = jnp.einsum("ml,blc->bmc", pmat, k) + pb[0, 0]
    v_pool = jnp.einsum("ml,blc->bmc", pmat, v) + pb[0, 0]

    def big(t):  # (nwb, l_base, half) -> masked head-tiled (nwb, heads*l_base, half)
        return jnp.tile(t, (1, heads, 1)) * mask

    corr = jnp.einsum("blc,bmc->blm", q, big(k_pool)) / float(d) + bias
    out_s = jnp.einsum("blm,bmc->blc", corr, big(v_pool))

    gram = jnp.einsum("blc,bld->bcd", q, k) / float(l_full)
    out_c = jnp.einsum("bld,bcd->blc", v, gram)

    out = jnp.concatenate([out_s, out_c], axis=-1)
    out = out.reshape(b, nwh, nww, wh, ww, c).transpose(0, 1, 3, 2, 4, 5)
    return out


# ---------------------------------------------------------------------------
# pallas kernel
# ---------------------------------------------------------------------------

def _scc_kernel(x_ref, w1_ref, w2_ref, bb_ref, pmatT_ref, pb_ref, mask_ref,
                maskT_ref, bias_ref, o_ref, *, heads: int, chunk: int):
    wh, ww, c = x_ref.shape[1:]
    half = c // 2
    l_full = wh * ww
    d = half // heads
    l_base = pmatT_ref.shape[1]
    f32 = jnp.float32

    X = x_ref[0].reshape(l_full, c)
    q = X[:, :half]
    v = X[:, half:]
    w1 = w1_ref[...]
    w2 = w2_ref[...]
    bb = bb_ref[0, :]
    pmatT = pmatT_ref[...]  # (L, l_base)

    n_chunks = l_full // chunk

    def dotT(a, b):
        # a^T @ b without materializing the transpose (contract dim 0 of both)
        return jax.lax.dot_general(
            a, b, dimension_numbers=(((0,), (0,)), ((), ())),
            preferred_element_type=f32)

    # pass 1: k per chunk; accumulate gram and pooled K/V (transposed form,
    # half on the sublane axis, so pass 2 needs no operand transposes)
    gram = jnp.zeros((half, half), f32)
    k_poolT = jnp.zeros((half, l_base), f32)
    v_poolT = jnp.zeros((half, l_base), f32)
    for i in range(n_chunks):
        sl = slice(i * chunk, (i + 1) * chunk)
        q_c = q[sl]
        v_c = v[sl]
        k_c = (jnp.dot(q_c, w1, preferred_element_type=f32)
               + jnp.dot(v_c, w2, preferred_element_type=f32) + bb)
        k_c = k_c.astype(q_c.dtype)
        gram += dotT(q_c, k_c)
        p_c = pmatT[sl].astype(k_c.dtype)  # (chunk, l_base)
        k_poolT += dotT(k_c, p_c)
        v_poolT += dotT(v_c, p_c)
    pb = pb_ref[0, 0]
    gramT = (gram.T / float(l_full)).astype(X.dtype)

    # K/V in both orientations for pass 2, no in-loop transposes
    k_bigT = (jnp.tile((k_poolT + pb).astype(X.dtype), (1, heads))
              * maskT_ref[...])                      # (half, heads*l_base)
    v_big = (jnp.tile((v_poolT + pb).T.astype(X.dtype), (heads, 1))
             * mask_ref[...])                        # (heads*l_base, half)

    # pass 2: per-chunk correlation + outputs
    rows_per_chunk = chunk // ww
    for i in range(n_chunks):
        sl = slice(i * chunk, (i + 1) * chunk)
        q_c = q[sl]
        v_c = v[sl]
        corr = jnp.dot(q_c, k_bigT, preferred_element_type=f32) / float(d)
        corr = (corr + bias_ref[sl].astype(f32)).astype(X.dtype)
        out_s = jnp.dot(corr, v_big, preferred_element_type=f32)
        out_c = jnp.dot(v_c, gramT, preferred_element_type=f32)
        out = jnp.concatenate([out_s, out_c], axis=-1).astype(o_ref.dtype)
        r0 = i * rows_per_chunk
        o_ref[0, r0:r0 + rows_per_chunk, :, :] = out.reshape(
            rows_per_chunk, ww, c)


def _pick_chunk(l_full: int, ww: int) -> int:
    target = 2048
    chunk = min(l_full, max(ww, (target // ww) * ww))
    while l_full % chunk:
        chunk -= ww
    return chunk


def _scc_pallas(x6, w1, w2, bb, pmat, pb, mask, bias, heads: int,
                interpret: bool = False):
    b, nwh, wh, nww, ww, c = x6.shape
    l_full = wh * ww
    chunk = _pick_chunk(l_full, ww)

    x = x6.reshape(b, nwh * wh, nww * ww, c)
    pmatT = pmat.T  # (L, l_base): pass-1 rhs orientation, no in-kernel transpose
    maskT = mask.T
    kernel = functools.partial(_scc_kernel, heads=heads, chunk=chunk)
    out = pl.pallas_call(
        kernel,
        grid=(b, nwh, nww),
        in_specs=[
            pl.BlockSpec((1, wh, ww, c), lambda bi, i, j: (bi, i, j, 0)),
            pl.BlockSpec(w1.shape, lambda bi, i, j: (0, 0)),
            pl.BlockSpec(w2.shape, lambda bi, i, j: (0, 0)),
            pl.BlockSpec(bb.shape, lambda bi, i, j: (0, 0)),
            pl.BlockSpec(pmatT.shape, lambda bi, i, j: (0, 0)),
            pl.BlockSpec((1, 1), lambda bi, i, j: (0, 0),
                         memory_space=pltpu.SMEM),
            pl.BlockSpec(mask.shape, lambda bi, i, j: (0, 0)),
            pl.BlockSpec(maskT.shape, lambda bi, i, j: (0, 0)),
            pl.BlockSpec(bias.shape, lambda bi, i, j: (0, 0)),
        ],
        out_specs=pl.BlockSpec((1, wh, ww, c), lambda bi, i, j: (bi, i, j, 0)),
        out_shape=jax.ShapeDtypeStruct(x.shape, x.dtype),
        interpret=interpret,
    )(x, w1, w2, bb, pmatT, pb, mask, maskT, bias)
    return out.reshape(b, nwh, wh, nww, ww, c)


@functools.partial(jax.custom_vjp, nondiff_argnums=(8, 9))
def fused_scc(x6, w1, w2, bb, pmat, pb, mask, bias, heads: int, use_pallas: bool):
    """Fused SCC window attention; see module docstring.  All args as in
    ``scc_reference``; set use_pallas=False for the XLA path."""
    if use_pallas:
        return _scc_pallas(x6, w1, w2, bb, pmat, pb, mask, bias, heads)
    return scc_reference(x6, w1, w2, bb, pmat, pb, mask, bias, heads)


def _fused_scc_fwd(x6, w1, w2, bb, pmat, pb, mask, bias, heads, use_pallas):
    out = fused_scc(x6, w1, w2, bb, pmat, pb, mask, bias, heads, use_pallas)
    return out, (x6, w1, w2, bb, pmat, pb, mask, bias)


def _fused_scc_bwd(heads, use_pallas, res, dy):
    x6, w1, w2, bb, pmat, pb, mask, bias = res
    _, vjp = jax.vjp(
        lambda *a: scc_reference(*a, heads=heads),
        x6, w1, w2, bb, pmat, pb, mask, bias)
    return vjp(dy)


fused_scc.defvjp(_fused_scc_fwd, _fused_scc_bwd)


# ---------------------------------------------------------------------------
# parameter normal forms (built outside the kernel, tiny)
# ---------------------------------------------------------------------------

def blockdiag_kgen(k1_kernel, k1_bias, k2_kernel, k2_bias, heads: int):
    """(d,d)+(d,) per-head k-gen params -> halved block-diagonal
    (C/2, C/2) weights + combined (C/2,) bias for `k=(k1(q)+k2(v))/2`."""
    d = k1_kernel.shape[0]
    eye = jnp.eye(heads, dtype=k1_kernel.dtype)
    def expand(kk):
        return jnp.einsum("de,hg->hdge", kk, eye).reshape(heads * d, heads * d)
    w1 = expand(k1_kernel) * 0.5
    w2 = expand(k2_kernel) * 0.5
    bb = ((jnp.tile(k1_bias, heads) + jnp.tile(k2_bias, heads)) * 0.5)
    return w1, w2, bb.reshape(1, heads * d)


@functools.lru_cache(maxsize=64)
def _pool_structure(wh: int, ww: int, bh: int, bw: int):
    """(m_of_l, r_of_l) numpy index maps for the pooling matrix."""
    rh, rw = wh // bh, ww // bw
    y, x = np.meshgrid(np.arange(wh), np.arange(ww), indexing="ij")
    by, bx = y // rh, x // rw
    ry, rx = y % rh, x % rw
    m_of_l = (by * bw + bx).reshape(-1)
    r_of_l = (ry * rw + rx).reshape(-1)
    return m_of_l, r_of_l


def pooling_matrix(pool_kernel, pool_bias, wh, ww, bh, bw, dtype):
    """Learned pooling as a (l_base, L) matrix + (1,1) scalar bias.

    Every window pixel l belongs to exactly one base cell, so column l has a
    single nonzero: the learned pool weight of its in-block offset.  The
    scalar bias is added explicitly after the pooling matmul by both the
    kernel and the reference.
    """
    m_of_l, r_of_l = _pool_structure(wh, ww, bh, bw)
    l_full = wh * ww
    l_base = bh * bw
    weights = pool_kernel.reshape(-1)[r_of_l]  # (L,)
    pmat = jnp.zeros((l_base, l_full), dtype=dtype)
    pmat = pmat.at[m_of_l, np.arange(l_full)].set(weights.astype(dtype))
    return pmat, pool_bias.reshape(1, 1).astype(jnp.float32)


def head_mask(heads: int, l_base: int, half: int, dtype):
    """(heads*l_base, C/2) 0/1 block-diagonal mask."""
    d = half // heads
    m = np.zeros((heads, l_base, heads, d), np.float32)
    for h in range(heads):
        m[h, :, h, :] = 1.0
    return jnp.asarray(m.reshape(heads * l_base, half), dtype=dtype)
