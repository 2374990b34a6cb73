"""Fused SCA + SCC + projection window-attention kernel (Pallas TPU).

One kernel invocation per attention window computes the whole attention
subsystem of a HierarchicalTransformerBlock (reference
models/hit_sir_pro.py:317-359 SpatialChannelAttention, :362-602 SCC):

    SCA:  qkv = (leaky(conv3x3(ch_avg))*s1 + leaky(conv3x3(ch_max))*s2)/2 + x
    SCC:  q/v split -> k synthesis -> learned pooling -> S-SC (+pos bias)
          -> C-SC channel gram
    proj: out = [out_s | out_c] @ P + b   (folded as out_s@P1 + out_c@P2)

Everything between reading the block input ``x`` and writing the projected
attention output stays in VMEM.  Lowered through XLA the same pipeline costs
~27 ms of the 73.9 ms flagship tile (measured v5e): the (windows, L, C)
tensors bounce through HBM between C-minor elementwise layouts and L-minor
matmul layouts, the C/2=90 q/v split relayouts the whole array, and the
window partition/reverse transposes copy it twice more.  Here the window
gather/scatter is the BlockSpec index map (free), the q/v split happens once
per window in VMEM, and the correlation matrices never touch HBM.

The per-window pipeline uses the algebraic normal form of
``sisr_tpu.ops.pallas.scc_attention`` (block-diagonal k-gen, pooling matrix,
head-tiled masked K/V, relative-position bias table streamed in), further
reassociated because the S-SC correlation is linear attention (no softmax):
``out_s = q @ (k_bigᵀ v_big)/d + bias @ v_big`` where ``k_bigᵀ v_big``
collapses to a same-head-masked (C/2, C/2) gram — the (L, heads·l_base)
correlation intermediate is never formed (see ``_make_kernel``).  The
squeeze-excite vectors s1/s2 (global spatial pooling + two tiny Dense) are
computed outside — they need a global reduction over the tile.

Backward falls back to ``jax.vjp`` over the identical jnp reference
(``scc_block_reference``).  Windows with wh or ww not multiples of 8 (the
hierarchical ladder's 4x4 windows) use the reference path — Mosaic requires
8-aligned second-minor block dims.
"""

from __future__ import annotations

import functools

import numpy as np

import jax
import jax.numpy as jnp
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu

from sisr_tpu.ops.pallas.scc_attention import scc_reference


def _conv_patches(m: jnp.ndarray) -> jnp.ndarray:
    """(B, H, W) map -> (B, H, W, 9) zero-padded 3x3 im2col patches, taps in
    row-major order (matches the (3,3,1,C) kernel reshape to (9, C))."""
    b, h, w = m.shape
    mp = jnp.pad(m, ((0, 0), (1, 1), (1, 1)))
    return jnp.stack([mp[:, i:i + h, j:j + w]
                      for i in range(3) for j in range(3)], axis=-1)


def sca_reference(x, w9a, b9a, w9m, b9m, s1, s2, cmean=None, cmax=None):
    """SpatialChannelAttention (reference :317-359) with precomputed
    squeeze-excite vectors.  x: (B,H,W,C); w9*: (9, C); s1/s2: (B,1,1,C).

    ``cmean``/``cmax`` ((B,H,W)) optionally carry the channel-pool maps
    already computed by the previous block's fused tail kernel
    (``ffn.htb_tail_stats``), saving two full passes over x."""
    dt = x.dtype
    pa = _conv_patches(x.mean(axis=-1) if cmean is None
                       else cmean.astype(x.dtype)).astype(dt)
    pm = _conv_patches(x.max(axis=-1) if cmax is None
                       else cmax.astype(x.dtype)).astype(dt)
    ca = jax.nn.leaky_relu(pa @ w9a.astype(dt) + b9a.astype(dt), 0.2)
    cm = jax.nn.leaky_relu(pm @ w9m.astype(dt) + b9m.astype(dt), 0.2)
    return (ca * s1 + cm * s2) / 2.0 + x


def scc_block_reference(x, sca, w1, w2, bb, pmat, pb, mask, bias,
                        proj_k, proj_b, heads: int, window):
    """jnp reference of the fused op (and the backward-pass function).

    x: (B, Hp, Wp, C) padded to window multiples; sca: None or the
    ``sca_reference`` parameter tuple; remaining args as in
    ``scc_attention.scc_reference`` plus the (C, C) projection.
    """
    b, hp, wp, c = x.shape
    wh, ww = window
    dt = x.dtype
    qkv = sca_reference(x, *sca) if sca is not None else x
    x6 = qkv.reshape(b, hp // wh, wh, wp // ww, ww, c)
    out6 = scc_reference(x6, w1, w2, bb, pmat, pb, mask, bias, heads)
    # scc_reference promotes to f32 via the f32 pooling bias; cast back
    # before the projection (the nn.Dense it replaces did the same)
    out = out6.reshape(b, hp, wp, c).astype(dt)
    return out @ proj_k.astype(dt) + proj_b.astype(dt)


def _make_kernel(heads: int, with_sca: bool):
    """Per-window kernel in the reassociated linear-attention form.

    The S-SC correlation has no softmax, so
        out_s = (q @ k_bigT / d + bias) @ v_big
    reassociates to
        out_s = q @ M / d + bias @ v_big,
        M     = k_bigT @ v_big = headmask ⊙ (k_pool'ᵀ @ v_pool')
    (k_pool'/v_pool' are the pooled K/V with the scalar pooling bias; the
    block-diagonal head masks collapse to the (C/2, C/2) same-head mask).
    This kills the (L, heads·l_base) f32 correlation intermediate, its bias
    add/cast, and the k_big tile+mask build — the whole window is one pass of
    well-shaped matmuls with no chunking.
    """
    def kernel(*refs):
        if with_sca:
            (x_ref, p_ref, w9a_ref, b9a_ref, w9m_ref, b9m_ref, s1_ref, s2_ref,
             wkv_ref, bb_ref, pmatT_ref, pb_ref, mask_ref, maskT_ref,
             hmask_ref, bias_ref, p1_ref, p2_ref, pjb_ref, o_ref) = refs
        else:
            (x_ref, wkv_ref, bb_ref, pmatT_ref, pb_ref, mask_ref,
             maskT_ref, hmask_ref, bias_ref, p1_ref, p2_ref, pjb_ref,
             o_ref) = refs
        del maskT_ref  # only the legacy band-real branch contracts against it

        wh, ww, c = x_ref.shape[1:]
        half = c // 2
        l_full = wh * ww
        d = half // heads
        f32 = jnp.float32
        X = x_ref[0].reshape(l_full, c)
        dt = X.dtype

        if with_sca:
            P = p_ref[0].reshape(l_full, 18)
            ca = jax.nn.leaky_relu(
                jnp.dot(P[:, :9], w9a_ref[...], preferred_element_type=f32)
                + b9a_ref[0].astype(f32), 0.2)
            cm = jax.nn.leaky_relu(
                jnp.dot(P[:, 9:18], w9m_ref[...], preferred_element_type=f32)
                + b9m_ref[0].astype(f32), 0.2)
            qkv = ((ca * s1_ref[0].astype(f32) + cm * s2_ref[0].astype(f32))
                   * 0.5 + X.astype(f32)).astype(dt)
        else:
            qkv = X

        q = qkv[:, :half]
        v = qkv[:, half:]

        def dotT(a, b):
            # a^T @ b without materializing the transpose
            return jax.lax.dot_general(
                a, b, dimension_numbers=(((0,), (0,)), ((), ())),
                preferred_element_type=f32)

        # k = q@w1 + v@w2 == qkv @ [w1; w2] — one K=C matmul
        k = (jnp.dot(qkv, wkv_ref[...], preferred_element_type=f32)
             + bb_ref[0, :]).astype(dt)
        gramT = (dotT(k, q) / float(l_full)).astype(dt)    # == (qᵀk)ᵀ / L
        pmatT = pmatT_ref[...].astype(dt)                  # (L, l_base)
        pb = pb_ref[0, 0]
        k_pool = dotT(pmatT, k) + pb                       # (l_base, half) f32
        v_pool = (dotT(pmatT, v) + pb).astype(dt)
        m = dotT(k_pool.astype(dt), v_pool)                # (half, half) f32
        m = (m * hmask_ref[...].astype(f32) * (1.0 / d)).astype(dt)
        v_big = jnp.tile(v_pool, (heads, 1)) * mask_ref[...]
        out_s = (jnp.dot(q, m, preferred_element_type=f32)
                 + jnp.dot(bias_ref[...], v_big,
                           preferred_element_type=f32)).astype(dt)
        if l_full >= 1024:
            # fold proj2 through the gram: out_c@P2 == v@(gramT@P2) — the
            # (L, half) out_c matmul (L/128 MXU passes) becomes a constant
            # (half, c) build (2 passes); wins once L/128 > 2
            g2 = jnp.dot(gramT, p2_ref[...],
                         preferred_element_type=f32).astype(dt)
            out = (jnp.dot(out_s, p1_ref[...], preferred_element_type=f32)
                   + jnp.dot(v, g2, preferred_element_type=f32)
                   + pjb_ref[0].astype(f32))
        else:
            out_c = jnp.dot(v, gramT, preferred_element_type=f32).astype(dt)
            out = (jnp.dot(out_s, p1_ref[...], preferred_element_type=f32)
                   + jnp.dot(out_c, p2_ref[...], preferred_element_type=f32)
                   + pjb_ref[0].astype(f32))
        o_ref[0] = out.astype(dt).reshape(wh, ww, c)

    return kernel


def _make_band_kernel(heads: int, ww: int, with_sca: bool,
                      degenerate: bool = True):
    """Row-of-windows kernel: a full row of nW windows batches into one
    invocation with batched matmuls.

    ``degenerate=True`` (windows no larger than the base window, rh == rw ==
    1): the learned pooling collapses to the scalar affine ``k*pw + pb``;
    this serves the 4x4-window blocks (which Mosaic's 8-alignment rule
    excludes from the per-window kernel) and the tiny 8x8 windows (576 grid
    steps per block otherwise).

    ``degenerate=False`` (hierarchical windows larger than the base): the
    pooling is the real (l_base, L) matrix, applied as one batched matmul
    producing pooled K/V transposed per window.  Batching the row of windows
    into one invocation replaces the per-window grid (e.g. 144 grid steps
    for the 16x16-window blocks of a 192 tile) with nWh steps of
    MXU-friendlier batched matmuls."""

    def kernel(*refs):
        if with_sca:
            (x_ref, p_ref, w9a_ref, b9a_ref, w9m_ref, b9m_ref, s1_ref, s2_ref,
             wkv_ref, bb_ref, pmatT_ref, pb_ref, mask_ref, maskT_ref,
             hmask_ref, bias_ref, p1_ref, p2_ref, pjb_ref, o_ref) = refs
        else:
            (x_ref, wkv_ref, bb_ref, pmatT_ref, pb_ref, mask_ref,
             maskT_ref, hmask_ref, bias_ref, p1_ref, p2_ref, pjb_ref,
             o_ref) = refs

        wh, wd, c = x_ref.shape[1:]
        half = c // 2
        nw = wd // ww
        l = wh * ww
        d = half // heads
        f32 = jnp.float32
        t_all = wh * wd
        X = x_ref[0].reshape(t_all, c)
        dt = X.dtype

        if with_sca:
            P = p_ref[0].reshape(t_all, 18)
            ca = jax.nn.leaky_relu(
                jnp.dot(P[:, :9], w9a_ref[...], preferred_element_type=f32)
                + b9a_ref[0].astype(f32), 0.2)
            cm = jax.nn.leaky_relu(
                jnp.dot(P[:, 9:18], w9m_ref[...], preferred_element_type=f32)
                + b9m_ref[0].astype(f32), 0.2)
            qkv = ((ca * s1_ref[0].astype(f32) + cm * s2_ref[0].astype(f32))
                   * 0.5 + X.astype(f32)).astype(dt)
        else:
            qkv = X

        q = qkv[:, :half]
        v = qkv[:, half:]
        k = (jnp.dot(qkv, wkv_ref[...], preferred_element_type=f32)
             + bb_ref[0, :]).astype(dt)

        def towin(t):  # (T, F) -> (nW, L, F)
            f = t.shape[-1]
            return t.reshape(wh, nw, ww, f).transpose(1, 0, 2, 3).reshape(nw, l, f)

        def bdot(a, b, ca_, cb_):
            return jax.lax.dot_general(
                a, b, dimension_numbers=(((ca_,), (cb_,)), ((0,), (0,))),
                preferred_element_type=f32)

        qw, vw, kw = towin(q), towin(v), towin(k)
        pb = pb_ref[0, 0]
        if degenerate:
            # degenerate pooling: P = pw * I — pw arrives as an SMEM f32
            # scalar (the pmatT slot carries (1,1) pw, not the matrix); the
            # affine commutes with the window transpose, so pooled k/v are
            # derived post-transpose.  Reassociated linear-attention form
            # (see _make_kernel): no (nW, L, heads·L) correlation.
            pw = pmatT_ref[0, 0]
            kpw = (kw.astype(f32) * pw + pb).astype(dt)
            vpw = (vw.astype(f32) * pw + pb).astype(dt)
            m = bdot(kpw, vpw, 1, 1)                          # (nW, half, half)
            m = (m * hmask_ref[...].astype(f32)[None]
                 * (1.0 / d)).astype(dt)
            v_big = jnp.tile(vpw, (1, heads, 1)) * mask_ref[...][None]
            biasb = jnp.broadcast_to(bias_ref[...].astype(dt)[None],
                                     (nw, l, heads * l))
            out_s = bdot(qw, m, 2, 1) + bdot(biasb, v_big, 2, 1)  # (nW, L, half)
            import os
            if l < half and os.environ.get("SISR_SCC_SMALLL", "1") == "1":
                # small-L reassociation: out_c = v @ (q^T k)^T/L == (v k^T) q/L
                # — (L, L) grams instead of (half, half): fewer FLOPs and
                # 0.55 ms/call faster on the w=4 strip blocks (measured v5e)
                vk = bdot(vw, kw, 2, 2)                       # (nW, L, L)
                out_c = bdot((vk * (1.0 / l)).astype(dt), qw, 2, 1)
            else:
                gram = (bdot(qw, kw, 1, 1) / float(l)).astype(dt)
                out_c = bdot(vw, gram, 2, 2)
        else:
            # real (l_base, L) pooling as ONE batched matmul producing the
            # pooled K/V already transposed (nW, half, l_base) — the form
            # the correlation contracts against, so no in-VMEM transposes
            pmatT = pmatT_ref[...]                            # (L, l_base)
            def pool(t):  # (nW, L, half) -> (nW, half, l_base)
                return jax.lax.dot_general(
                    t, pmatT.astype(t.dtype),
                    dimension_numbers=(((1,), (0,)), ((), ())),
                    preferred_element_type=f32) + pb
            k_bigT = (jnp.tile(pool(kw).astype(dt), (1, 1, heads))
                      * maskT_ref[...][None])                 # (nW, half, hl)
            v_bigT = (jnp.tile(pool(vw).astype(dt), (1, 1, heads))
                      * maskT_ref[...][None])
            corr = (bdot(qw, k_bigT, 2, 1) / float(d)
                    + bias_ref[...].astype(f32)[None])        # (nW, L, hl)
            out_s = bdot(corr.astype(dt), v_bigT, 2, 2)       # (nW, L, half)
            gram = (bdot(qw, kw, 1, 1) / float(l)).astype(dt)  # (nW, half, half)
            out_c = bdot(vw, gram, 2, 2)                      # (nW, L, half)

        out = (jnp.dot(out_s.astype(dt).reshape(t_all, half), p1_ref[...],
                       preferred_element_type=f32)
               + jnp.dot(out_c.astype(dt).reshape(t_all, half), p2_ref[...],
                         preferred_element_type=f32)
               + pjb_ref[0].astype(f32))
        out = out.astype(dt).reshape(nw, wh, ww, c).transpose(1, 0, 2, 3)
        o_ref[0] = out.reshape(wh, wd, c)

    return kernel


def _scc_block_pallas(x, sca, w1, w2, bb, pmat, pb, mask, bias, proj_k,
                      proj_b, heads: int, window, interpret: bool = False):
    b, hp, wp, c = x.shape
    wh, ww = window
    nwh, nww = hp // wh, wp // ww
    l_full = wh * ww
    half = c // 2
    with_sca = sca is not None
    dt = x.dtype
    # windows no larger than the base window (pooling degenerate) batch a
    # whole row of windows per invocation.  Hierarchical windows default to
    # the per-window grid: row-of-windows batching with real pooling
    # (SISR_SCC_MODE=band) measures 8.5x SLOWER at w=16 (0.693 vs 0.081
    # ms/tile) and pathologically slow at w>=32 — Mosaic lowers the batched
    # dot_generals as per-window matmuls plus giant relayouts, while the
    # per-window grid's steps pipeline cleanly (measured v5e, round 3)
    import os
    degenerate = pmat.shape[0] == l_full
    band = degenerate or (os.environ.get("SISR_SCC_MODE", "window") == "band"
                          and wp % 8 == 0)

    if band:
        grid = (b, nwh)
        win_spec = lambda bi, i: (bi, i, 0, 0)
        const = lambda bi, i: (0, 0)
        x_block = (1, wh, wp, c)
        p_block = (1, wh, wp, 18)
        s_spec = lambda bi, i: (bi, 0, 0)
        kernel = _make_band_kernel(heads, ww, with_sca, degenerate)
    else:
        grid = (b, nwh, nww)
        win_spec = lambda bi, i, j: (bi, i, j, 0)
        const = lambda bi, i, j: (0, 0)
        x_block = (1, wh, ww, c)
        p_block = (1, wh, ww, 18)
        s_spec = lambda bi, i, j: (bi, 0, 0)
        kernel = _make_kernel(heads, with_sca)

    ins = [x]
    in_specs = [pl.BlockSpec(x_block, win_spec)]
    if with_sca:
        w9a, b9a, w9m, b9m, s1, s2 = sca[:6]
        cmean, cmax = sca[6:] if len(sca) > 6 else (None, None)
        patches = jnp.concatenate(
            [_conv_patches(x.mean(axis=-1) if cmean is None
                           else cmean.astype(dt)),
             _conv_patches(x.max(axis=-1) if cmax is None
                           else cmax.astype(dt))],
            axis=-1).astype(dt)
        # s1/s2 ride as (b, 1, c) with (1, 1, c) blocks: a (1, c) block of a
        # (b, c) array is an invalid Mosaic tiling for b > 1 (second-minor
        # block dim must divide 8 or equal the array dim)
        ins += [patches, w9a.astype(dt), b9a.reshape(1, c).astype(dt),
                w9m.astype(dt), b9m.reshape(1, c).astype(dt),
                s1.reshape(b, 1, c).astype(dt), s2.reshape(b, 1, c).astype(dt)]
        in_specs += [
            pl.BlockSpec(p_block, win_spec),
            pl.BlockSpec((9, c), const),
            pl.BlockSpec((1, c), const),
            pl.BlockSpec((9, c), const),
            pl.BlockSpec((1, c), const),
            pl.BlockSpec((1, 1, c), s_spec),
            pl.BlockSpec((1, 1, c), s_spec),
        ]
    # degenerate band mode: the pooling matrix is pw*I — ship just the
    # scalar via SMEM; otherwise the full (L, l_base) transposed matrix
    pmat_in = (pmat[:1, :1].astype(jnp.float32).reshape(1, 1) if degenerate
               else pmat.T)
    pmat_spec = (pl.BlockSpec((1, 1), const, memory_space=pltpu.SMEM)
                 if degenerate else pl.BlockSpec(pmat_in.shape, const))
    maskT = mask.T
    # (C/2, C/2) same-head mask for the reassociated M = headmask ⊙ (K'ᵀV')
    dhead = half // heads
    hmask = jnp.asarray(
        (np.arange(half)[:, None] // dhead
         == np.arange(half)[None, :] // dhead).astype(np.float32), dtype=dt)
    wkv = jnp.concatenate([w1, w2], axis=0).astype(dt)   # k = qkv @ [w1; w2]
    ins += [wkv, bb, pmat_in, pb, mask, maskT, hmask, bias,
            proj_k[:half].astype(dt), proj_k[half:].astype(dt),
            proj_b.reshape(1, c).astype(dt)]
    in_specs += [
        pl.BlockSpec(wkv.shape, const),
        pl.BlockSpec(bb.shape, const),
        pmat_spec,
        pl.BlockSpec((1, 1), const, memory_space=pltpu.SMEM),
        pl.BlockSpec(mask.shape, const),
        pl.BlockSpec(maskT.shape, const),
        pl.BlockSpec(hmask.shape, const),
        pl.BlockSpec(bias.shape, const),
        pl.BlockSpec((half, c), const),
        pl.BlockSpec((half, c), const),
        pl.BlockSpec((1, c), const),
    ]

    return pl.pallas_call(
        kernel,
        grid=grid,
        in_specs=in_specs,
        out_specs=pl.BlockSpec(x_block, win_spec),
        out_shape=jax.ShapeDtypeStruct(x.shape, dt),
        # v5e has 128 MB of physical VMEM; the 64-window blocks need more
        # than the compiler's default 16 MB scoped limit, and the band
        # kernels over wide strip tiles (480 windows/row at W=1920) need
        # more than 64 MB of f32 window intermediates
        compiler_params=pltpu.CompilerParams(
            dimension_semantics=("parallel",) * (len(grid) - 1) + ("arbitrary",),
            vmem_limit_bytes=(100 if band and wp > 512 else 64) * 1024 * 1024),
        interpret=interpret,
    )(*ins)


@functools.partial(jax.custom_vjp, nondiff_argnums=(11, 12, 13))
def scc_block(x, sca, w1, w2, bb, pmat, pb, mask, bias, proj_k, proj_b,
              heads: int, window, use_pallas: bool):
    """Fused SCA+SCC+proj; see module docstring.  ``use_pallas=False`` runs
    the XLA composition (CPU, 4x4 windows, backward pass)."""
    if use_pallas:
        return _scc_block_pallas(x, sca, w1, w2, bb, pmat, pb, mask, bias,
                                 proj_k, proj_b, heads, window)
    return scc_block_reference(x, sca, w1, w2, bb, pmat, pb, mask, bias,
                               proj_k, proj_b, heads, window)


def _scc_block_fwd(x, sca, w1, w2, bb, pmat, pb, mask, bias, proj_k, proj_b,
                   heads, window, use_pallas):
    out = scc_block(x, sca, w1, w2, bb, pmat, pb, mask, bias, proj_k, proj_b,
                    heads, window, use_pallas)
    return out, (x, sca, w1, w2, bb, pmat, pb, mask, bias, proj_k, proj_b)


def _scc_block_bwd(heads, window, use_pallas, res, dy):
    _, vjp = jax.vjp(
        lambda *a: scc_block_reference(*a, heads=heads, window=window), *res)
    return vjp(dy)


scc_block.defvjp(_scc_block_fwd, _scc_block_bwd)
