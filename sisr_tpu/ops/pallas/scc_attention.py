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

This module holds the jnp reference (`scc_reference`) and the normal-form
parameter builders; the production kernels live in
sisr_tpu/ops/pallas/scc_block.py (per-window and row-band variants, with the
SpatialChannelAttention and output projection fused in).
"""

from __future__ import annotations

import functools

import numpy as np
import jax
import jax.numpy as jnp


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
    """Constant one-hot structure of the pooling matrix: ``sel`` (L, rh*rw)
    picks pixel l's in-block offset; ``oh`` (l_base, L) marks pixel l's base
    cell.  Both are trace-time numpy constants — building pmat from them
    with a multiply keeps the whole construction one fused XLA op per block
    (the previous ``.at[...].set`` scatter lowered to thousands of tiny
    iota/scatter fusions: 9.2 ms of the 192x1920 strip's 38 ms XLA glue,
    profiled r3)."""
    rh, rw = wh // bh, ww // bw
    y, x = np.meshgrid(np.arange(wh), np.arange(ww), indexing="ij")
    by, bx = y // rh, x // rw
    ry, rx = y % rh, x % rw
    m_of_l = (by * bw + bx).reshape(-1)
    r_of_l = (ry * rw + rx).reshape(-1)
    l_full = wh * ww
    sel = np.zeros((l_full, rh * rw), np.float32)
    sel[np.arange(l_full), r_of_l] = 1.0
    oh = np.zeros((bh * bw, l_full), np.float32)
    oh[m_of_l, np.arange(l_full)] = 1.0
    return sel, oh


def pooling_matrix(pool_kernel, pool_bias, wh, ww, bh, bw, dtype):
    """Learned pooling as a (l_base, L) matrix + (1,1) scalar bias.

    Every window pixel l belongs to exactly one base cell, so column l has a
    single nonzero: the learned pool weight of its in-block offset.  The
    scalar bias is added explicitly after the pooling matmul by both the
    kernel and the reference.
    """
    sel, oh = _pool_structure(wh, ww, bh, bw)
    weights = (jnp.asarray(sel, dtype=dtype)
               * pool_kernel.reshape(-1).astype(dtype)[None, :]).sum(-1)
    pmat = jnp.asarray(oh, dtype=dtype) * weights[None, :]
    return pmat, pool_bias.reshape(1, 1).astype(jnp.float32)


def head_mask(heads: int, l_base: int, half: int, dtype):
    """(heads*l_base, C/2) 0/1 block-diagonal mask."""
    d = half // heads
    m = np.zeros((heads, l_base, heads, d), np.float32)
    for h in range(heads):
        m[h, :, h, :] = 1.0
    return jnp.asarray(m.reshape(heads * l_base, half), dtype=dtype)
