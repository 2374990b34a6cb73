"""Fused whole-HTB Pallas kernel: SCA + SCC + projection + LN1 + ConvFFN + LN2.

One kernel runs an ENTIRE HierarchicalTransformerBlock (reference
models/hit_sir_pro.py:605-710) for the degenerate-window blocks (window ==
base window, i.e. the w=4 and w=8 blocks of each stage — 12 of the flagship's
36 HTBs):

    attn = proj(SCC(SCA(x)))          # scc_block.py band form, degenerate
    x2   = x + LN1(attn)
    h    = gelu(x2 @ W1 + b1)
    h2   = h + gelu(dwconv5x5(h))
    out  = x2 + LN2(h2 @ W2 + b2)     # ffn.py pipe form

The two standalone kernels already share the same band structure at these
blocks: the SCC band kernel runs one row of windows (wh rows) per grid step,
and the FFN pipe kernel runs th-row bands — at th == wh the grids coincide,
so the whole block becomes ONE lagged pipeline: step i computes band i's
attention + x2 + fc1/gelu, then emits band i-1's output from the h halos
carried in VMEM scratch (exactly ``ffn._tail_pipe_kernel``'s emit).  What
this kills vs the two-kernel chain, per block: the attention round trip
through HBM (write + read of a (H, W, 180) map — ~1.5 GB at 1080p), one
custom-call boundary and its layout copies, and one kernel's worth of
launch/pipeline scaffold.

Eval-only (the training path keeps the unfused ops and their custom_vjps).
Numerics are identical to the two-kernel chain by construction: the SCC part
is ``scc_block._make_band_kernel``'s degenerate branch verbatim, the FFN part
is ``ffn._pipe_emit`` (shared helper).

Reference for parity: ``htb_fused_reference`` == scc_block_reference ∘
htb_tail_reference (tests/test_pallas_ops.py).
"""

from __future__ import annotations

import functools
import os

import numpy as np

import jax
import jax.numpy as jnp
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu

from sisr_tpu.ops.pallas.ffn import (_gelu_kernel, _pipe_emit, _write_stats,
                                     htb_tail_reference, layer_norm,
                                     stats_reference)
from sisr_tpu.ops.pallas.scc_block import _conv_patches, scc_block_reference


def htb_fused_reference(x, sca, w1, w2, bb, pmat, pb, mask, bias, proj_k,
                        proj_b, heads, window, ln1_s, ln1_b, fc1_k, fc1_b,
                        dw_k, dw_b, fc2_k, fc2_b, ln2_s, ln2_b):
    """jnp reference of the fused block (SCC chain then HTB tail)."""
    attn = scc_block_reference(x, sca, w1, w2, bb, pmat, pb, mask, bias,
                               proj_k, proj_b, heads, window)
    return htb_tail_reference(attn, x, ln1_s, ln1_b, fc1_k, fc1_b, dw_k,
                              dw_b, fc2_k, fc2_b, ln2_s, ln2_b)


def _make_fused_kernel(heads: int, ww: int, th: int, nb: int, stats: bool,
                       with_sca: bool):
    """Lagged-pipeline kernel over window-row bands (th == wh).

    Step i < nb: degenerate-window SCC on band i (small-L reassociated form,
    see scc_block._make_band_kernel) → x2 = x + LN1(attn) → fc1+gelu, stashed
    in VMEM scratch.  Step i > 0: emit band i-1 via the shared FFN emit
    (dwconv halos from the neighbouring bands' scratch)."""

    def kernel(*refs):
        if with_sca:
            (x_ref, p_ref, w9a_ref, b9a_ref, w9m_ref, b9m_ref, s1_ref,
             s2_ref, wkv_ref, bb_ref, pw_ref, pb_ref, mask_ref, hmask_ref,
             bias_ref, p1_ref, p2_ref, pjb_ref,
             ln1s_ref, ln1b_ref, w1_ref, b1_ref, dw_ref, dwb_ref, w2_ref,
             b2_ref, ln2s_ref, ln2b_ref, *rest) = refs
        else:
            (x_ref, wkv_ref, bb_ref, pw_ref, pb_ref, mask_ref, hmask_ref,
             bias_ref, p1_ref, p2_ref, pjb_ref,
             ln1s_ref, ln1b_ref, w1_ref, b1_ref, dw_ref, dwb_ref, w2_ref,
             b2_ref, ln2s_ref, ln2b_ref, *rest) = refs
        if stats:
            (o_ref, cmean_ref, cmax_ref, psum_ref, pmax_ref,
             xcur_ref, xprev_ref, hcur_ref, hprev_ref, edge_ref) = rest
        else:
            (o_ref, xcur_ref, xprev_ref, hcur_ref, hprev_ref,
             edge_ref) = rest

        wd = o_ref.shape[2]
        c = o_ref.shape[3]
        ch = w1_ref.shape[1]
        half = c // 2
        nw = wd // ww
        l = th * ww
        d = half // heads
        t_all = th * wd
        dt = o_ref.dtype
        f32 = jnp.float32
        i = pl.program_id(1)

        @pl.when(i == 0)
        def _init():
            edge_ref[...] = jnp.zeros_like(edge_ref)

        @pl.when(i < nb)
        def _compute():
            X = x_ref[0].reshape(t_all, c)
            if with_sca:
                P = p_ref[0].reshape(t_all, 18)
                ca = jax.nn.leaky_relu(
                    jnp.dot(P[:, :9], w9a_ref[...],
                            preferred_element_type=f32)
                    + b9a_ref[0].astype(f32), 0.2)
                cm = jax.nn.leaky_relu(
                    jnp.dot(P[:, 9:18], w9m_ref[...],
                            preferred_element_type=f32)
                    + b9m_ref[0].astype(f32), 0.2)
                qkv = ((ca * s1_ref[0].astype(f32)
                        + cm * s2_ref[0].astype(f32)) * 0.5
                       + X.astype(f32)).astype(dt)
            else:
                qkv = X

            q = qkv[:, :half]
            v = qkv[:, half:]
            k = (jnp.dot(qkv, wkv_ref[...], preferred_element_type=f32)
                 + bb_ref[0, :]).astype(dt)

            def towin(t):  # (T, F) -> (nW, L, F)
                f = t.shape[-1]
                return t.reshape(th, nw, ww, f).transpose(1, 0, 2, 3) \
                        .reshape(nw, l, f)

            def bdot(a, b, ca_, cb_):
                return jax.lax.dot_general(
                    a, b, dimension_numbers=(((ca_,), (cb_,)), ((0,), (0,))),
                    preferred_element_type=f32)

            qw, vw, kw = towin(q), towin(v), towin(k)
            pw = pw_ref[0, 0]
            pb = pb_ref[0, 0]
            kpw = (kw.astype(f32) * pw + pb).astype(dt)
            vpw = (vw.astype(f32) * pw + pb).astype(dt)
            m = bdot(kpw, vpw, 1, 1)                      # (nW, half, half)
            m = (m * hmask_ref[...].astype(f32)[None]
                 * (1.0 / d)).astype(dt)
            v_big = jnp.tile(vpw, (1, heads, 1)) * mask_ref[...][None]
            biasb = jnp.broadcast_to(bias_ref[...].astype(dt)[None],
                                     (nw, l, heads * l))
            out_s = bdot(qw, m, 2, 1) + bdot(biasb, v_big, 2, 1)
            if l < half and os.environ.get("SISR_SCC_SMALLL", "1") == "1":
                # small-L reassociation (see scc_block): (L, L) grams
                vk = bdot(vw, kw, 2, 2)                   # (nW, L, L)
                out_c = bdot((vk * (1.0 / l)).astype(dt), qw, 2, 1)
            else:
                gram = (bdot(qw, kw, 1, 1) / float(l)).astype(dt)
                out_c = bdot(vw, gram, 2, 2)

            out = (jnp.dot(out_s.astype(dt).reshape(t_all, half),
                           p1_ref[...], preferred_element_type=f32)
                   + jnp.dot(out_c.astype(dt).reshape(t_all, half),
                             p2_ref[...], preferred_element_type=f32)
                   + pjb_ref[0].astype(f32))
            attn = out.astype(dt).reshape(nw, th, ww, c) \
                      .transpose(1, 0, 2, 3).reshape(th, wd, c)

            x2 = x_ref[0] + layer_norm(attn, ln1s_ref[0], ln1b_ref[0])
            lin1 = jnp.dot(x2.reshape(t_all, c), w1_ref[...],
                           preferred_element_type=f32) + b1_ref[0].astype(f32)
            xcur_ref[...] = x2
            hcur_ref[...] = _gelu_kernel(lin1).astype(dt).reshape(th, wd, ch)

        @pl.when(i > 0)
        def _emit():
            top2 = jnp.where(i < nb, hcur_ref[0:2],
                             jnp.zeros((2, wd, ch), dt))
            out = _pipe_emit(edge_ref, hprev_ref, xprev_ref, top2, dw_ref,
                             dwb_ref, w2_ref, b2_ref, ln2s_ref, ln2b_ref, th)
            o_ref[0] = out.astype(dt)
            if stats:
                _write_stats(out, cmean_ref, cmax_ref, psum_ref, pmax_ref)

        @pl.when(i > 0)
        def _edge_rotate():
            edge_ref[...] = hprev_ref[th - 2:th]

        @pl.when(i < nb)
        def _rotate():
            hprev_ref[...] = hcur_ref[...]
            xprev_ref[...] = xcur_ref[...]

    return kernel


def supports_fused(window, base_win, shape, c: int) -> bool:
    """Whether the fused whole-HTB kernel covers this block: degenerate
    pooling (window <= base window), no window padding needed, and Mosaic's
    alignment rules (wp % 8, lane-minor stats rule)."""
    from sisr_tpu.ops.pallas.ffn import _pick_row_tile

    wh, ww = window
    bh, bw = min(wh, base_win[0]), min(ww, base_win[1])
    h, w = shape
    # Fuse only when wh equals the band height the standalone FFN pipe
    # would pick anyway: at narrow widths the FFN runs th=16 and forcing
    # th=wh=4 pipelines worse than the two-kernel chain (192-tile A/B:
    # fused 28.6 vs unfused 28.1 ms median, bit-identical outputs); at
    # strip/whole widths th=4 is already forced and fusing kills the attn
    # HBM round trip.  wh*w <= 8k tokens also mirrors _pick_row_tile's
    # VMEM cap (th=8 x W=1920 spills past physical VMEM, see ROADMAP).
    return (bh == wh and bw == ww and h % wh == 0 and w % ww == 0
            and w % 8 == 0 and (wh * w) % 128 == 0 and wh * w <= 8192
            and _pick_row_tile(h, w) == wh)


def htb_fused(x, sca, w1, w2, bb, pmat, pb, mask, bias, proj_k, proj_b,
              heads: int, window, ln1_s, ln1_b, fc1_k, fc1_b, dw_k, dw_b,
              fc2_k, fc2_b, ln2_s, ln2_b, emit_stats: bool = False,
              interpret: bool = False):
    """Fused whole-HTB forward (eval-only).  Args mirror ``scc_block`` then
    ``htb_tail``; ``sca`` may carry precomputed (cmean, cmax) maps from the
    previous block's stats (positions 6-7, as in scc_block).

    Returns ``out`` or ``(out, (cmean, cmax, ssum, smax))`` with
    ``emit_stats=True`` (the next block's SCA inputs, see
    ``ffn.htb_tail_stats``)."""
    b, h, wd, c = x.shape
    wh, ww = window
    th = wh
    nb = h // th
    half = c // 2
    ch = fc1_k.shape[1]
    with_sca = sca is not None
    dt = x.dtype

    kernel = _make_fused_kernel(heads, ww, th, nb, emit_stats, with_sca)
    const = lambda bi, ri: (0, 0)
    body = pl.BlockSpec(
        (1, th, wd, c), lambda bi, ri: (bi, jnp.minimum(ri, nb - 1), 0, 0))
    lag = lambda bi, ri: (bi, jnp.maximum(ri - 1, 0), 0, 0)
    out_spec = pl.BlockSpec((1, th, wd, c), lag)

    ins = [x]
    in_specs = [body]
    if with_sca:
        w9a, b9a, w9m, b9m, s1, s2 = sca[:6]
        cmean, cmax = sca[6:] if len(sca) > 6 else (None, None)
        patches = jnp.concatenate(
            [_conv_patches(x.mean(axis=-1) if cmean is None
                           else cmean.astype(dt)),
             _conv_patches(x.max(axis=-1) if cmax is None
                           else cmax.astype(dt))],
            axis=-1).astype(dt)
        ins += [patches, w9a.astype(dt), b9a.reshape(1, c).astype(dt),
                w9m.astype(dt), b9m.reshape(1, c).astype(dt),
                s1.reshape(b, 1, c).astype(dt), s2.reshape(b, 1, c).astype(dt)]
        s_spec = lambda bi, ri: (bi, 0, 0)
        in_specs += [
            pl.BlockSpec((1, th, wd, 18), body.index_map),
            pl.BlockSpec((9, c), const),
            pl.BlockSpec((1, c), const),
            pl.BlockSpec((9, c), const),
            pl.BlockSpec((1, c), const),
            pl.BlockSpec((1, 1, c), s_spec),
            pl.BlockSpec((1, 1, c), s_spec),
        ]

    dhead = half // heads
    hmask = jnp.asarray(
        (np.arange(half)[:, None] // dhead
         == np.arange(half)[None, :] // dhead).astype(np.float32), dtype=dt)
    wkv = jnp.concatenate([w1, w2], axis=0).astype(dt)
    pw_in = pmat[:1, :1].astype(jnp.float32).reshape(1, 1)
    ins += [wkv, bb, pw_in, pb, mask, hmask, bias,
            proj_k[:half].astype(dt), proj_k[half:].astype(dt),
            proj_b.reshape(1, c).astype(dt),
            ln1_s.reshape(1, c), ln1_b.reshape(1, c),
            fc1_k, fc1_b.reshape(1, ch),
            dw_k.reshape(25, ch), dw_b.reshape(1, ch),
            fc2_k, fc2_b.reshape(1, c),
            ln2_s.reshape(1, c), ln2_b.reshape(1, c)]
    in_specs += [
        pl.BlockSpec(wkv.shape, const),
        pl.BlockSpec(bb.shape, const),
        pl.BlockSpec((1, 1), const, memory_space=pltpu.SMEM),
        pl.BlockSpec((1, 1), const, memory_space=pltpu.SMEM),
        pl.BlockSpec(mask.shape, const),
        pl.BlockSpec(hmask.shape, const),
        pl.BlockSpec(bias.shape, const),
        pl.BlockSpec((half, c), const),
        pl.BlockSpec((half, c), const),
        pl.BlockSpec((1, c), const),
        pl.BlockSpec((1, c), const),
        pl.BlockSpec((1, c), const),
        pl.BlockSpec((c, ch), const),
        pl.BlockSpec((1, ch), const),
        pl.BlockSpec((25, ch), const),
        pl.BlockSpec((1, ch), const),
        pl.BlockSpec((ch, c), const),
        pl.BlockSpec((1, c), const),
        pl.BlockSpec((1, c), const),
        pl.BlockSpec((1, c), const),
    ]

    out_shapes = jax.ShapeDtypeStruct((b, h, wd, c), dt)
    out_specs = out_spec
    if emit_stats:
        assert (th * wd) % 128 == 0, (th, wd)
        f32 = jnp.float32
        out_shapes = (
            out_shapes,
            jax.ShapeDtypeStruct((b, nb, 8, th * wd), f32),
            jax.ShapeDtypeStruct((b, nb, 8, th * wd), f32),
            jax.ShapeDtypeStruct((b, nb, 8, c), f32),
            jax.ShapeDtypeStruct((b, nb, 8, c), f32),
        )
        out_specs = (
            out_spec,
            pl.BlockSpec((1, 1, 8, th * wd), lag),
            pl.BlockSpec((1, 1, 8, th * wd), lag),
            pl.BlockSpec((1, 1, 8, c), lag),
            pl.BlockSpec((1, 1, 8, c), lag),
        )

    res = pl.pallas_call(
        kernel,
        grid=(b, nb + 1),
        in_specs=in_specs,
        out_specs=out_specs,
        out_shape=out_shapes,
        scratch_shapes=[
            pltpu.VMEM((th, wd, c), dt),      # x2 (current band)
            pltpu.VMEM((th, wd, c), dt),      # x2 (previous band)
            pltpu.VMEM((th, wd, ch), dt),     # h (current band)
            pltpu.VMEM((th, wd, ch), dt),     # h (previous band)
            pltpu.VMEM((2, wd, ch), dt),      # h_{i-2} bottom 2 rows
        ],
        compiler_params=pltpu.CompilerParams(
            dimension_semantics=("parallel", "arbitrary"),
            vmem_limit_bytes=int(os.environ.get(
                "SISR_HTB_VMEM_MB", "100")) * 1024 * 1024),
        interpret=interpret,
    )(*ins)
    if not emit_stats:
        return res
    out, cmean_o, cmax_o, psum, pmax = res
    cmean_o = cmean_o[:, :, 0, :].reshape(b, h, wd)
    cmax_o = cmax_o[:, :, 0, :].reshape(b, h, wd)
    return out, (cmean_o, cmax_o,
                 psum[:, :, 0, :].sum(axis=1), pmax[:, :, 0, :].max(axis=1))
