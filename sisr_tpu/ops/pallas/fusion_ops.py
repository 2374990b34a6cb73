"""Fused pooling kernel for the deep/shallow Fusion gate (Pallas TPU).

The Fusion module (reference models/hit_sir_pro.py:136-162) runs three
UnionAttentions — on ``a``, ``a + b`` and ``b`` — and each UnionAttention
(:104-133) opens with three mean+max pool pairs (over C, H and W).  Lowered
through XLA those nine reductions each pick their own preferred layout, so
the 13 MB inputs are relayouted repeatedly (~5 ms of the flagship tile in
add_reduce / compare_select / transpose fusions).  This kernel reads ``a``
and ``b`` once per row band, forms ``a + b`` in VMEM, and emits all nine
pool pairs in one pass:

    cp3: (B, 6, H, W)  mean/max over C   per source  [a0,a1,ab0,ab1,b0,b1]
    hp3: (B, 6, W, C)  mean/max over H   per source  (f32: H-sum accumulates
                                                      across bands in-place)
    wp3: (B, 6, H, C)  mean/max over W   per source

Slot order: source-major, mean before max.  The H pools accumulate across
row-band grid steps into the same output block (sum slots then divide on the
last band; max slots fold with jnp.maximum).

Backward falls back to ``jax.vjp`` over the identical jnp reference.
"""

from __future__ import annotations

import functools

import jax
import jax.numpy as jnp
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu


def fusion_pools_reference(a, b):
    """jnp reference: cp3 (B,6,H,W) in a.dtype, hp3 (B,6,W,C) f32,
    wp3 (B,6,H,C) in a.dtype; slot order [a_mean, a_max, ab_mean, ab_max,
    b_mean, b_max]."""
    f32 = jnp.float32
    cps, hps, wps = [], [], []
    for s in (a, a + b, b):
        sf = s.astype(f32)
        cps += [sf.mean(-1).astype(a.dtype), s.max(-1)]
        hps += [sf.mean(1), s.max(1).astype(f32)]
        wps += [sf.mean(2).astype(a.dtype), s.max(2)]
    return (jnp.stack(cps, 1), jnp.stack(hps, 1), jnp.stack(wps, 1))


def _pools_kernel(a_ref, b_ref, cp_ref, hp_ref, wp_ref, *, nb: int, h: int):
    f32 = jnp.float32
    dt = a_ref.dtype
    ri = pl.program_id(1)
    wd = a_ref.shape[2]

    # Chunk the f32 slab temps (a, a+b, b) over 512-column blocks: the
    # full-width form at strip shapes (th=8, W=1920) holds ~113 MB of f32
    # temps past any scoped limit.  Input slices ride the sublane axis
    # (any 8-multiple offset/width is legal); the cp outputs put W on the
    # LANE axis, where ref slices must be 128-aligned.  When every chunk
    # width is a 128 multiple (e.g. 1920 = 3x512 + 384) cp chunks are
    # written as direct lane slices — deferring them to a final lane
    # concat extends the chunk lifetimes and blows the VMEM stack (89 MB
    # vs the 64 MB limit at 1920/th8, measured).  Widths whose tail chunk
    # misaligns (e.g. 960 = 512 + 448, and 448 % 128 != 0 crashes Mosaic
    # as a lane slice) fall back to the register concat.
    lane_aligned = (wd % 512) % 128 == 0
    wacc = [None] * 6                       # (th, C) W-pool accumulators
    cacc = [[] for _ in range(6)]           # (th, cw) C-pool chunks
    for lo in range(0, wd, 512):
        cw = min(512, wd - lo)
        a = a_ref[0][:, lo:lo + cw, :].astype(f32)
        b = b_ref[0][:, lo:lo + cw, :].astype(f32)
        ab = a + b
        for k, s in enumerate((a, ab, b)):
            if lane_aligned:
                cp_ref[0, 2 * k, :, lo:lo + cw] = s.mean(-1).astype(dt)
                cp_ref[0, 2 * k + 1, :, lo:lo + cw] = s.max(-1).astype(dt)
            else:
                cacc[2 * k].append(s.mean(-1).astype(dt))
                cacc[2 * k + 1].append(s.max(-1).astype(dt))
            ws, wm = s.sum(1), s.max(1)
            wacc[2 * k] = ws if wacc[2 * k] is None else wacc[2 * k] + ws
            wacc[2 * k + 1] = (wm if wacc[2 * k + 1] is None
                               else jnp.maximum(wacc[2 * k + 1], wm))
            hs, hm = s.sum(0), s.max(0)

            @pl.when(ri == 0)
            def _init(hs=hs, hm=hm, k=k, lo=lo, cw=cw):
                hp_ref[0, 2 * k, lo:lo + cw, :] = hs
                hp_ref[0, 2 * k + 1, lo:lo + cw, :] = hm

            @pl.when(ri > 0)
            def _fold(hs=hs, hm=hm, k=k, lo=lo, cw=cw):
                hp_ref[0, 2 * k, lo:lo + cw, :] += hs
                hp_ref[0, 2 * k + 1, lo:lo + cw, :] = jnp.maximum(
                    hp_ref[0, 2 * k + 1, lo:lo + cw, :], hm)

    for k in range(3):
        wp_ref[0, 2 * k] = (wacc[2 * k] * (1.0 / wd)).astype(dt)
        wp_ref[0, 2 * k + 1] = wacc[2 * k + 1].astype(dt)
    if not lane_aligned:
        for j in range(6):
            cp_ref[0, j] = (cacc[j][0] if len(cacc[j]) == 1
                            else jnp.concatenate(cacc[j], axis=1))

    @pl.when(ri == nb - 1)
    def _finish():
        for k in range(3):
            hp_ref[0, 2 * k] *= 1.0 / h


def _pick_row_tile(h: int, wd: int = 192) -> int:
    """Row tile for the pools and gate kernels.  Both carry blocks with th
    in the second-minor position (cp/wp outputs; wout/wcorr gate inputs),
    so Mosaic requires th % 8 == 0.  VMEM feasibility is NOT linear in
    th*wd: the pools kernel's f32 chunk slabs scale with th, so th=16
    compiles up to wd=768 but crashes the compiler at 960/1024 while th=8
    compiles at equal token counts (15360 = 8x1920, measured v5e matrix:
    960/8 OK, 768/16 OK, 640/16 OK, 960/16 FAIL, 1024/16 FAIL).  Caps per
    th stay inside the proven region; 192-wide tiles keep th=16, >=960
    strips pick th=8.  th=8 verified through W=2176 on hardware (r3 probe:
    compile + parity at 2048 and 2176 — covers DIV2K whole-image widths
    after the 64-multiple eval bucketing)."""
    for th, max_wd in ((16, 768), (8, 2176)):
        if h % th == 0 and wd <= max_wd:
            return th
    return 0


# the pools kernel shares the gate kernel's banding constraints
_pick_pools_tile = _pick_row_tile


def _fusion_pools_pallas(a, b, interpret: bool = False):
    bsz, h, wd, c = a.shape
    th = _pick_pools_tile(h, wd)
    assert th, f"no pools row tile for H={h}"
    nb = h // th
    dt = a.dtype

    kern = functools.partial(_pools_kernel, nb=nb, h=h)
    body = pl.BlockSpec((1, th, wd, c), lambda bi, ri: (bi, ri, 0, 0))
    return pl.pallas_call(
        kern,
        grid=(bsz, nb),
        in_specs=[body, body],
        out_specs=[
            pl.BlockSpec((1, 6, th, wd), lambda bi, ri: (bi, 0, ri, 0)),
            pl.BlockSpec((1, 6, wd, c), lambda bi, ri: (bi, 0, 0, 0)),
            pl.BlockSpec((1, 6, th, c), lambda bi, ri: (bi, 0, ri, 0)),
        ],
        out_shape=[
            jax.ShapeDtypeStruct((bsz, 6, h, wd), dt),
            jax.ShapeDtypeStruct((bsz, 6, wd, c), jnp.float32),
            jax.ShapeDtypeStruct((bsz, 6, h, c), dt),
        ],
        compiler_params=pltpu.CompilerParams(
            dimension_semantics=("parallel", "arbitrary"),
            vmem_limit_bytes=64 * 1024 * 1024),
        interpret=interpret,
    )(a, b)


@functools.partial(jax.custom_vjp, nondiff_argnums=(2,))
def fusion_pools(a, b, use_pallas: bool):
    """All nine Fusion pool pairs in one pass; see module docstring."""
    if use_pallas:
        return _fusion_pools_pallas(a, b)
    return fusion_pools_reference(a, b)


def _fwd(a, b, use_pallas):
    return fusion_pools(a, b, use_pallas), (a, b)


def _bwd(use_pallas, saved, dy):
    a, b = saved
    _, vjp = jax.vjp(fusion_pools_reference, a, b)
    return vjp(dy)


fusion_pools.defvjp(_fwd, _bwd)


def supports_shape(h: int, w: int | None = None) -> bool:
    """Fused-Fusion eligibility: row-tileable for the pools, maps and gate
    kernels (all three band over rows since r3 — the old single-invocation
    maps kernel capped the area at 640k px of full-image VMEM slabs; now
    only the width is capped by the proven pools-tile region)."""
    w = h if w is None else w
    return _pick_row_tile(h, w) > 0 and _pick_pools_tile(h, w) > 0


# ---------------------------------------------------------------------------
# Whole-Fusion fused path: pools -> UA maps -> gating.
#
# Each UnionAttention ends in ``conv_last(c_att + h_att + w_att)`` where
# c_att is (B,H,W,1), h_att is (B,1,W,C) and w_att is (B,H,1,C).  conv_last
# is linear, so it splits over the three broadcast terms:
#   * c_att (channel-constant input): a (3,3,C,C) conv of a channel-constant
#     image equals a 9-tap matmul with K1[t, c] = sum_cin K[t, cin, c].
#   * h_att (row-constant): collapses to a 1-D conv along W with the
#     row-summed kernels KH[j] = sum_i K[i, j]; the result is a (W, C) map
#     broadcast over rows.  Rows 0 and H-1 miss the i=0 / i=2 kernel rows
#     (zero 'same' padding) — corrected by subtracting K[0,j]/K[2,j] terms.
#   * w_att (column-constant): symmetric along H with KW[i] = sum_j K[i, j]
#     and column corrections at w=0 / w=W-1.
# This turns 3 x 21.5 GFLOP full convs + 13 MB broadcast materializations
# into ~100 MFLOP of small matmuls.  Reference: UA/Fusion math at
# models/hit_sir_pro.py (reference :104-162).
# ---------------------------------------------------------------------------


def _ua_raw_reference(x, pools, raw, dtype):
    """UnionAttention from raw params (same math as the module's jnp path)."""
    (c1k, c1b), (c2k, c2b), (c3k, c3b), (clk, clb) = raw
    dt = dtype
    cp, hp, wp = pools

    def conv(t, k, b):
        return jax.lax.conv_general_dilated(
            t.astype(dt), k.astype(dt), (1, 1), ((1, 1), (1, 1)),
            dimension_numbers=("NHWC", "HWIO", "NHWC")) + b.astype(dt)

    c_att = conv(cp, c1k, c1b)                       # (B,H,W,1)
    h_att = conv(hp.transpose(0, 2, 1, 3), c2k, c2b)[..., 0]  # (B,C,W)
    h_att = h_att.transpose(0, 2, 1)[:, None, :, :]  # (B,1,W,C)
    w_att = conv(wp.transpose(0, 2, 1, 3), c3k, c3b)[..., 0]  # (B,C,H)
    w_att = w_att.transpose(0, 2, 1)[:, :, None, :]  # (B,H,1,C)
    return conv(c_att + h_att + w_att, clk, clb)


def fused_fusion_reference(a, b, raws):
    """jnp reference of the fused Fusion (== the Fusion module's math)."""
    dt = a.dtype
    cp3, hp3, wp3 = fusion_pools_reference(a, b)

    def pk(k):
        sl = lambda t: t[:, 2 * k:2 * k + 2].astype(dt).transpose(0, 2, 3, 1)
        return (sl(cp3), sl(hp3), sl(wp3))

    a_att = _ua_raw_reference(a, pk(0), raws[0], dt)
    gate = jax.nn.sigmoid(_ua_raw_reference(a, pk(1), raws[1], dt))
    b_att = _ua_raw_reference(b, pk(2), raws[2], dt)
    return (a * jax.nn.sigmoid(a_att * gate)
            + b * jax.nn.sigmoid(b_att * (1.0 - gate)))


def _swap_ab(t: int) -> int:
    """Tap reindex for convs whose slab axes are transposed vs the conv grid
    (conv2/conv3): [ch*9 + a*3 + b] -> [ch*9 + b*3 + a]."""
    ch, r = divmod(t, 9)
    a, b = divmod(r, 3)
    return ch * 9 + b * 3 + a


def _maps_kernel(cp_ref, cph_ref, hp_ref, wp_ref, c1w_ref, c2w_ref, c3w_ref,
                 cb_ref, khw_ref, clb_ref,
                 catt_ref, hout_ref, wout_ref, hcorr_ref, wcorr_ref, *,
                 th: int):
    """UA map builder, banded over row bands (grid (B, H/th)) so the (H, W)
    conv1 work never holds full-image slabs — the single-invocation form
    capped the fused path at ~640k px of VMEM.  cp (1,6,th,W) band;
    cph (1,1,6,2,W) the row above/below the band (zeros at image borders);
    hp (1,6,W,C) f32 / wp (1,6,H,C) full const blocks; c*w (3,18) f32 SMEM
    tap weights [ch*9+a*3+b]; cb (9,) f32 SMEM biases [c1b0,c2b0,c3b0,...];
    khw (3,18,C,C) folded conv_last kernels [KH_j | K0_j | K2_j | KW_i |
    Ki0 | Ki2]; clb (3,C) conv_last biases.  catt is written per band; the
    (W,C)/(H,C) maps are computed once at band 0 (their blocks stay
    resident across the sequential band dim)."""
    f32 = jnp.float32
    big_h = wp_ref.shape[2]
    wd = cp_ref.shape[3]
    ri = pl.program_id(1)

    def conv2d18(m0, m1, w, bias, haloed=False):
        """3x3 2-in-1-out conv; m0/m1 (rows, cols) slabs, w(t) an SMEM scalar
        accessor with taps [ch*9 + a*3 + b]; returns (rows(-2), cols) f32.
        ``haloed``: the row halo is already present (no zero row padding)."""
        r, cc = m0.shape
        rp = ((0, 0), (1, 1)) if haloed else ((1, 1), (1, 1))
        p0 = jnp.pad(m0, rp)
        p1 = jnp.pad(m1, rp)
        n = r - 2 if haloed else r
        acc = sum(p0[i:i + n, j:j + cc] * w(i * 3 + j) for i in range(3)
                  for j in range(3))
        acc = acc + sum(p1[i:i + n, j:j + cc] * w(9 + i * 3 + j)
                        for i in range(3) for j in range(3))
        return acc + bias

    for k in range(3):
        # conv1 on the channel pools: (th, W) band with a 1-row halo
        m0 = jnp.concatenate([cph_ref[0, 0, 2 * k, 0:1], cp_ref[0, 2 * k],
                              cph_ref[0, 0, 2 * k, 1:2]], axis=0)
        m1 = jnp.concatenate([cph_ref[0, 0, 2 * k + 1, 0:1],
                              cp_ref[0, 2 * k + 1],
                              cph_ref[0, 0, 2 * k + 1, 1:2]], axis=0)
        catt_ref[0, k] = conv2d18(
            m0.astype(f32), m1.astype(f32),
            lambda t, k=k: c1w_ref[k, t], cb_ref[3 * k], haloed=True)

    @pl.when(ri == 0)
    def _small_maps():
        for k in range(3):
            # conv2/conv3 run on grid (C, W)/(C, H) but the slabs are (W, C)
            # / (H, C): the conv's 'row' tap a shifts the lane (C) axis and
            # 'col' tap b the sublane axis — swap the shift roles:
            # out[w, c] = sum slab[w+b-1, c+a-1, ch] * w[ch, a, b]
            h_att = conv2d18(hp_ref[0, 2 * k], hp_ref[0, 2 * k + 1],
                             lambda t, k=k: c2w_ref[k, _swap_ab(t)],
                             cb_ref[3 * k + 1])              # (W, C)
            w_att = conv2d18(wp_ref[0, 2 * k].astype(f32),
                             wp_ref[0, 2 * k + 1].astype(f32),
                             lambda t, k=k: c3w_ref[k, _swap_ab(t)],
                             cb_ref[3 * k + 2])              # (H, C)

            # folded conv_last: 1-D convs along W / H with summed kernel rows
            hpad = jnp.pad(h_att, ((1, 1), (0, 0)))
            wpad = jnp.pad(w_att, ((1, 1), (0, 0)))

            def shift3(pad, n, base, k=k):
                return [jnp.dot(pad[j:j + n], khw_ref[k, base + j].astype(f32),
                                preferred_element_type=f32) for j in range(3)]

            hout_ref[0, k] = (sum(shift3(hpad, wd, 0))
                              + clb_ref[k].astype(f32))      # + conv_last bias
            hcorr_ref[0, 0, k] = sum(shift3(hpad, wd, 3))    # missing at h=0
            hcorr_ref[0, 1, k] = sum(shift3(hpad, wd, 6))    # missing at h=H-1
            wout_ref[0, k] = sum(shift3(wpad, big_h, 9))
            wcorr_ref[0, 0, k] = sum(shift3(wpad, big_h, 12))  # missing at w=0
            wcorr_ref[0, 1, k] = sum(shift3(wpad, big_h, 15))  # missing at w=W-1


def _gate_kernel(a_ref, b_ref, p27_ref, k1_ref, hout_ref, wout_ref,
                 hcorr_ref, wcorr_ref, o_ref, *, th: int, h_img: int):
    f32 = jnp.float32
    wd = a_ref.shape[2]
    c = a_ref.shape[3]
    dt = o_ref.dtype
    ri = pl.program_id(1)
    row = ri * th + jax.lax.broadcasted_iota(jnp.int32, (th, 1, 1), 0)

    # Chunk over 512-column blocks: the full-width form at strip shapes
    # (th=8, W=1920) holds ~110 MB of f32 base/att temps on the stack.
    for lo in range(0, wd, 512):
        cw = min(512, wd - lo)
        p = p27_ref[0, 0][:, lo:lo + cw, :].reshape(th * cw, 27)
        base = jnp.dot(p, k1_ref[...], preferred_element_type=f32)
        col = lo + jax.lax.broadcasted_iota(jnp.int32, (1, cw, 1), 1)

        atts = []
        for k in range(3):
            att = (base[:, k * c:(k + 1) * c].reshape(th, cw, c)
                   + hout_ref[0, k][lo:lo + cw][None]
                   + wout_ref[0, k][:, None, :]
                   - jnp.where(row == 0,
                               hcorr_ref[0, 0, k][lo:lo + cw][None], 0.0)
                   - jnp.where(row == h_img - 1,
                               hcorr_ref[0, 1, k][lo:lo + cw][None], 0.0))
            if lo == 0:
                att -= jnp.where(col == 0,
                                 wcorr_ref[0, 0, k][:, None, :], 0.0)
            if lo + cw == wd:
                att -= jnp.where(col == wd - 1,
                                 wcorr_ref[0, 1, k][:, None, :], 0.0)
            atts.append(att)

        a = a_ref[0][:, lo:lo + cw, :].astype(f32)
        b = b_ref[0][:, lo:lo + cw, :].astype(f32)
        gate = jax.nn.sigmoid(atts[1])
        out = (a * jax.nn.sigmoid(atts[0] * gate)
               + b * jax.nn.sigmoid(atts[2] * (1.0 - gate)))
        o_ref[0, :, lo:lo + cw, :] = out.astype(dt)


def _pack_params(raws, c, dt):
    """Host/XLA-side packing of the three UAs' raw conv params."""
    f32 = jnp.float32
    c1w, c2w, c3w, cb, kh_list, clb, k1_list = [], [], [], [], [], [], []
    for (c1, c2, c3, cl) in raws:
        for (kk, _), dst in zip((c1, c2, c3), (c1w, c2w, c3w)):
            # (3,3,2,1) -> [ch*9 + a*3 + b]
            dst.append(kk[:, :, :, 0].transpose(2, 0, 1).reshape(18))
        cb.append(jnp.stack([c1[1][0], c2[1][0], c3[1][0]]))
        clk = cl[0].astype(f32)                              # (3,3,C,C)
        kh = [clk.sum(0)[j] for j in range(3)]               # KH_j
        kh += [clk[0, j] for j in range(3)]                  # K[0,j]
        kh += [clk[2, j] for j in range(3)]                  # K[2,j]
        kh += [clk.sum(1)[i] for i in range(3)]              # KW_i
        kh += [clk[i, 0] for i in range(3)]                  # K[i,0]
        kh += [clk[i, 2] for i in range(3)]                  # K[i,2]
        kh_list.append(jnp.stack(kh))
        clb.append(cl[1])
        k1_list.append(clk.sum(2).reshape(9, c))             # K1[t, c]
    k1blk = jnp.zeros((27, 3 * c), f32)
    for k in range(3):
        k1blk = k1blk.at[9 * k:9 * (k + 1), k * c:(k + 1) * c].set(k1_list[k])
    return (jnp.stack(c1w).astype(f32), jnp.stack(c2w).astype(f32),
            jnp.stack(c3w).astype(f32),
            jnp.stack(cb).reshape(9).astype(f32),
            jnp.stack(kh_list).astype(dt), jnp.stack(clb).astype(f32),
            k1blk.astype(dt))


def _fused_fusion_pallas(a, b, raws, interpret: bool = False):
    bsz, h, wd, c = a.shape
    th = _pick_row_tile(h, wd)
    nb = h // th
    dt = a.dtype
    f32 = jnp.float32

    cp3, hp3, wp3 = _fusion_pallas_or_interp(a, b, interpret)
    c1w, c2w, c3w, cb, khw, clb, k1blk = _pack_params(raws, c, dt)

    # 1-row halo above/below each conv1 band (zeros at the image borders)
    cpz = jnp.pad(cp3, ((0, 0), (0, 0), (1, 1), (0, 0)))
    cph = jnp.stack([jnp.stack([cpz[:, :, r * th], cpz[:, :, r * th + th + 1]],
                               axis=2) for r in range(nb)], axis=1)
    # cph: (B, nb, 6, 2, W)

    const2 = lambda bi, ri: (0, 0)
    catt3, hout3, wout3, hcorr, wcorr = pl.pallas_call(
        functools.partial(_maps_kernel, th=th),
        grid=(bsz, nb),
        in_specs=[
            pl.BlockSpec((1, 6, th, wd), lambda bi, ri: (bi, 0, ri, 0)),
            pl.BlockSpec((1, 1, 6, 2, wd), lambda bi, ri: (bi, ri, 0, 0, 0)),
            pl.BlockSpec((1, 6, wd, c), lambda bi, ri: (bi, 0, 0, 0)),
            pl.BlockSpec((1, 6, h, c), lambda bi, ri: (bi, 0, 0, 0)),
            pl.BlockSpec((3, 18), const2, memory_space=pltpu.SMEM),
            pl.BlockSpec((3, 18), const2, memory_space=pltpu.SMEM),
            pl.BlockSpec((3, 18), const2, memory_space=pltpu.SMEM),
            pl.BlockSpec((9,), lambda bi, ri: (0,), memory_space=pltpu.SMEM),
            pl.BlockSpec((3, 18, c, c), lambda bi, ri: (0, 0, 0, 0)),
            pl.BlockSpec((3, c), const2),
        ],
        out_specs=[
            pl.BlockSpec((1, 3, th, wd), lambda bi, ri: (bi, 0, ri, 0)),
            pl.BlockSpec((1, 3, wd, c), lambda bi, ri: (bi, 0, 0, 0)),
            pl.BlockSpec((1, 3, h, c), lambda bi, ri: (bi, 0, 0, 0)),
            pl.BlockSpec((1, 2, 3, wd, c), lambda bi, ri: (bi, 0, 0, 0, 0)),
            pl.BlockSpec((1, 2, 3, h, c), lambda bi, ri: (bi, 0, 0, 0, 0)),
        ],
        out_shape=[
            jax.ShapeDtypeStruct((bsz, 3, h, wd), f32),
            jax.ShapeDtypeStruct((bsz, 3, wd, c), f32),
            jax.ShapeDtypeStruct((bsz, 3, h, c), f32),
            jax.ShapeDtypeStruct((bsz, 2, 3, wd, c), f32),
            jax.ShapeDtypeStruct((bsz, 2, 3, h, c), f32),
        ],
        compiler_params=pltpu.CompilerParams(
            dimension_semantics=("parallel", "arbitrary"),
            vmem_limit_bytes=100 * 1024 * 1024),
        interpret=interpret,
    )(cp3, cph, hp3, wp3, c1w, c2w, c3w, cb, khw, clb)

    # 27-lane im2col of the three c_att maps (tap t = 9k + i*3 + j); kept
    # (th, wd)-shaped so the gate kernel's column chunks slice aligned
    cpad = jnp.pad(catt3, ((0, 0), (0, 0), (1, 1), (1, 1))).astype(dt)
    taps = jnp.stack([cpad[:, :, i:i + h, j:j + wd]
                      for i in range(3) for j in range(3)], axis=-1)
    p27 = taps.transpose(0, 2, 3, 1, 4).reshape(bsz, nb, th, wd, 27)

    body = pl.BlockSpec((1, th, wd, c), lambda bi, ri: (bi, ri, 0, 0))
    return pl.pallas_call(
        functools.partial(_gate_kernel, th=th, h_img=h),
        grid=(bsz, nb),
        in_specs=[
            body, body,
            pl.BlockSpec((1, 1, th, wd, 27), lambda bi, ri: (bi, ri, 0, 0, 0)),
            pl.BlockSpec((27, 3 * c), lambda bi, ri: (0, 0)),
            pl.BlockSpec((1, 3, wd, c), lambda bi, ri: (bi, 0, 0, 0)),
            pl.BlockSpec((1, 3, th, c), lambda bi, ri: (bi, 0, ri, 0)),
            pl.BlockSpec((1, 2, 3, wd, c), lambda bi, ri: (bi, 0, 0, 0, 0)),
            pl.BlockSpec((1, 2, 3, th, c), lambda bi, ri: (bi, 0, 0, ri, 0)),
        ],
        out_specs=body,
        out_shape=jax.ShapeDtypeStruct(a.shape, dt),
        compiler_params=pltpu.CompilerParams(
            dimension_semantics=("parallel", "arbitrary"),
            # 1080p whole-image eval (th=8, W=1920) measures 100.49 MB of
            # scoped vmem — the gate kernel alone gets headroom toward the
            # 128 MB physical (the other kernels stay at 100)
            vmem_limit_bytes=116 * 1024 * 1024),
        interpret=interpret,
    )(a, b, p27, k1blk, hout3, wout3, hcorr, wcorr)


def _fusion_pallas_or_interp(a, b, interpret):
    return _fusion_pools_pallas(a, b, interpret=interpret)


@functools.partial(jax.custom_vjp, nondiff_argnums=(3,))
def fused_fusion(a, b, raws, use_pallas: bool):
    """Whole Fusion module (3 UAs + gates) via three Pallas kernels."""
    if use_pallas:
        return _fused_fusion_pallas(a, b, raws)
    return fused_fusion_reference(a, b, raws)


def _ff_fwd(a, b, raws, use_pallas):
    return fused_fusion(a, b, raws, use_pallas), (a, b, raws)


def _ff_bwd(use_pallas, saved, dy):
    a, b, raws = saved
    _, vjp = jax.vjp(fused_fusion_reference, a, b, raws)
    return vjp(dy)


fused_fusion.defvjp(_ff_fwd, _ff_bwd)
