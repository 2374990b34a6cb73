"""Pallas kernel correctness vs the XLA oracle (interpret mode on CPU)."""

import numpy as np
import pytest

import jax
import jax.numpy as jnp

from sisr_tpu.ops.pallas.dwconv import (_dwconv_pallas, depthwise_conv_reference,
                                        dwconv5x5)


@pytest.mark.parametrize("shape", [(1, 8, 12, 16), (2, 16, 20, 24), (1, 32, 36, 120)])
def test_dwconv_kernel_matches_xla(shape):
    rng = np.random.default_rng(0)
    x = jnp.asarray(rng.normal(size=shape).astype(np.float32))
    w = jnp.asarray(rng.normal(size=(5, 5, shape[-1])).astype(np.float32))
    b = jnp.asarray(rng.normal(size=(shape[-1],)).astype(np.float32))
    ref = depthwise_conv_reference(x, w, b)
    got = _dwconv_pallas(x, w, b, interpret=True)
    np.testing.assert_allclose(np.asarray(got), np.asarray(ref), atol=1e-4, rtol=1e-4)


def _scc_block_args(win=8, base=8, heads=2, c=20, nw=2, b=1, with_sca=True,
                    seed=0):
    from sisr_tpu.ops.pallas.scc_attention import (
        blockdiag_kgen, head_mask, pooling_matrix)

    rng = np.random.default_rng(seed)
    mk = lambda *s: jnp.asarray(rng.normal(size=s).astype(np.float32) * 0.3)
    d = c // (2 * heads)
    bh = bw = min(win, base)
    rh = win // bh
    x = mk(b, nw * win, nw * win, c)
    sca = None
    if with_sca:
        sca = (mk(9, c), mk(c), mk(9, c), mk(c),
               mk(b, 1, 1, c), mk(b, 1, 1, c))
    w1, w2, bb = blockdiag_kgen(mk(d, d), mk(d), mk(d, d), mk(d), heads)
    pmat, pb = pooling_matrix(mk(rh * rh, 1), mk(1), win, win, bh, bw,
                              jnp.float32)
    mask = head_mask(heads, bh * bw, c // 2, jnp.float32)
    bias = mk(win * win, heads * bh * bw)
    return (x, sca, w1, w2, bb, pmat, pb, mask, bias, mk(c, c), mk(c),
            heads, (win, win))


@pytest.mark.parametrize("mode", ["band", "window"])
@pytest.mark.parametrize("win,base,heads,c,with_sca", [
    (8, 8, 2, 20, True), (8, 8, 2, 20, False), (16, 8, 2, 24, True),
    (32, 8, 1, 16, True),
    # windows <= base: the row-band kernel (degenerate pooling, batched)
    (4, 8, 2, 20, True), (4, 8, 2, 20, False),
    # L < C/2: the small-L out_c reassociation ((v k^T) q — q/k orientation
    # matters; the flagship hits this at w=4 (L=16) and w=8 (L=64) vs half=90)
    (4, 8, 2, 40, True), (8, 8, 2, 136, False)])
def test_scc_block_kernel_matches_reference(win, base, heads, c, with_sca,
                                            mode, monkeypatch):
    from sisr_tpu.ops.pallas.scc_block import (_scc_block_pallas,
                                               scc_block_reference)

    # hierarchical (win > base) windows run row-of-windows batched by
    # default; SISR_SCC_MODE=window selects the per-window grid (A/B)
    monkeypatch.setenv("SISR_SCC_MODE", mode)
    args = _scc_block_args(win=win, base=base, heads=heads, c=c,
                           nw=1 if win >= 32 else 2, with_sca=with_sca)
    ref = scc_block_reference(*args)
    got = _scc_block_pallas(*args, interpret=True)
    np.testing.assert_allclose(np.asarray(got), np.asarray(ref),
                               atol=2e-3, rtol=2e-3)


def test_scc_block_grad_runs():
    from sisr_tpu.ops.pallas.scc_block import scc_block

    args = _scc_block_args(win=8, heads=2, c=20, nw=1)

    def loss(x, sca):
        return (scc_block(x, sca, *args[2:11], args[11], args[12],
                          False) ** 2).sum()

    gx, gsca = jax.grad(loss, argnums=(0, 1))(args[0], args[1])
    assert np.isfinite(np.asarray(gx)).all()
    for g in gsca:
        assert np.isfinite(np.asarray(g)).all()


def _tail_args(h=12, w=20, c=16, ch=32, b=1, seed=0, dtype=np.float32):
    rng = np.random.default_rng(seed)
    mk = lambda *s: jnp.asarray(rng.normal(size=s).astype(dtype) * 0.3)
    return (mk(b, h, w, c), mk(b, h, w, c),          # attn, shortcut
            mk(c) + 1.0, mk(c),                      # ln1
            mk(c, ch), mk(ch),                       # fc1
            mk(5, 5, ch), mk(ch),                    # dwconv
            mk(ch, c), mk(c),                        # fc2
            mk(c) + 1.0, mk(c))                      # ln2


@pytest.mark.parametrize("variant", ["halo", "pipe"])
@pytest.mark.parametrize("h,w,c,ch", [(8, 12, 16, 24), (12, 20, 10, 20),
                                      (16, 8, 24, 48), (4, 8, 12, 24),
                                      (32, 8, 12, 24)])
def test_htb_tail_kernel_matches_reference(h, w, c, ch, variant):
    from sisr_tpu.ops.pallas.ffn import (_htb_tail_pallas, _htb_tail_pipe,
                                         htb_tail_reference)

    impl = _htb_tail_pipe if variant == "pipe" else _htb_tail_pallas
    args = _tail_args(h=h, w=w, c=c, ch=ch)
    ref = htb_tail_reference(*args)
    got = impl(*args, interpret=True)
    np.testing.assert_allclose(np.asarray(got), np.asarray(ref),
                               atol=1e-4, rtol=1e-4)


def test_htb_tail_pipe_batched():
    """Scratch carry must reset cleanly across batch items."""
    from sisr_tpu.ops.pallas.ffn import _htb_tail_pipe, htb_tail_reference

    args = _tail_args(h=8, w=12, c=16, ch=24, b=3, seed=5)
    ref = htb_tail_reference(*args)
    got = _htb_tail_pipe(*args, interpret=True)
    np.testing.assert_allclose(np.asarray(got), np.asarray(ref),
                               atol=1e-4, rtol=1e-4)


def test_htb_tail_matches_flax_composition():
    """The fused-op reference must equal the flax LayerNorm/Dense/dwconv
    composition it replaced (float32)."""
    from flax import linen as nn
    from sisr_tpu.ops.pallas.dwconv import depthwise_conv_reference
    from sisr_tpu.ops.pallas.ffn import htb_tail_reference

    (attn, short, ln1s, ln1b, w1, b1, dw, dwb, w2, b2, ln2s, ln2b) = _tail_args()

    class Old(nn.Module):
        @nn.compact
        def __call__(self, attn, short):
            x = nn.LayerNorm(epsilon=1e-5, name="n1")(attn)
            x = short + x
            y = nn.Dense(w1.shape[1], name="fc1")(x)
            y = nn.gelu(y, approximate=False)
            y = y + nn.gelu(depthwise_conv_reference(y, dw, dwb), approximate=False)
            y = nn.Dense(w2.shape[1], name="fc2")(y)
            return x + nn.LayerNorm(epsilon=1e-5, name="n2")(y)

    variables = {"params": {
        "n1": {"scale": ln1s, "bias": ln1b},
        "fc1": {"kernel": w1, "bias": b1},
        "fc2": {"kernel": w2, "bias": b2},
        "n2": {"scale": ln2s, "bias": ln2b},
    }}
    ref = Old().apply(variables, attn, short)
    got = htb_tail_reference(attn, short, ln1s, ln1b, w1, b1, dw, dwb,
                             w2, b2, ln2s, ln2b)
    np.testing.assert_allclose(np.asarray(got), np.asarray(ref),
                               atol=1e-5, rtol=1e-5)


def test_htb_tail_grad_matches_composition():
    from sisr_tpu.ops.pallas.ffn import htb_tail, htb_tail_reference

    args = _tail_args(h=8, w=8, c=10, ch=20)

    g_fused = jax.grad(lambda *a: (htb_tail(*a, False) ** 2).sum(),
                       argnums=tuple(range(12)))(*args)
    g_ref = jax.grad(lambda *a: (htb_tail_reference(*a) ** 2).sum(),
                     argnums=tuple(range(12)))(*args)
    for gf, gr in zip(g_fused, g_ref):
        np.testing.assert_allclose(np.asarray(gf), np.asarray(gr),
                                   atol=1e-4, rtol=1e-4)


def test_dwconv_vjp_matches_xla():
    rng = np.random.default_rng(1)
    x = jnp.asarray(rng.normal(size=(1, 8, 8, 8)).astype(np.float32))
    w = jnp.asarray(rng.normal(size=(5, 5, 8)).astype(np.float32))
    b = jnp.asarray(rng.normal(size=(8,)).astype(np.float32))

    def loss_custom(x, w, b):
        return (dwconv5x5(x, w, b, False) ** 2).sum()

    def loss_ref(x, w, b):
        return (depthwise_conv_reference(x, w, b) ** 2).sum()

    g_custom = jax.grad(loss_custom, argnums=(0, 1, 2))(x, w, b)
    g_ref = jax.grad(loss_ref, argnums=(0, 1, 2))(x, w, b)
    for gc, gr in zip(g_custom, g_ref):
        np.testing.assert_allclose(np.asarray(gc), np.asarray(gr),
                                   atol=2e-3, rtol=2e-3)


@pytest.mark.parametrize("shape,cout,act,with_res", [
    ((1, 16, 12, 20), 20, "none", True),
    ((2, 8, 24, 12), 8, "leaky", False),
    ((1, 32, 16, 16), 64, "none", False),
    ((1, 8, 16, 144), 32, "none", True),   # >=128 channels: 9-matmul path
    ((1, 16, 8, 12), 12, "leaky2", False),  # slope-0.2 head activation
])
def test_conv3x3_kernel_matches_xla(shape, cout, act, with_res):
    from sisr_tpu.ops.pallas.conv3x3 import _conv3x3_pallas, conv3x3_reference

    rng = np.random.default_rng(0)
    y = jnp.asarray(rng.normal(size=shape).astype(np.float32))
    k = jnp.asarray(rng.normal(size=(3, 3, shape[-1], cout)).astype(np.float32) * 0.2)
    b = jnp.asarray(rng.normal(size=(cout,)).astype(np.float32))
    res = (jnp.asarray(rng.normal(size=shape[:3] + (cout,)).astype(np.float32))
           if with_res else None)
    ref = conv3x3_reference(y, res, k, b, act)
    got = _conv3x3_pallas(y, res, k, b, act, interpret=True)
    np.testing.assert_allclose(np.asarray(got), np.asarray(ref), atol=1e-4, rtol=1e-4)


def test_conv3x3_grad_matches_reference():
    from sisr_tpu.ops.pallas.conv3x3 import conv3x3, conv3x3_reference

    rng = np.random.default_rng(1)
    y = jnp.asarray(rng.normal(size=(1, 8, 8, 6)).astype(np.float32))
    res = jnp.asarray(rng.normal(size=(1, 8, 8, 6)).astype(np.float32))
    k = jnp.asarray(rng.normal(size=(3, 3, 6, 6)).astype(np.float32) * 0.2)
    b = jnp.asarray(rng.normal(size=(6,)).astype(np.float32))
    g1 = jax.grad(lambda *a: (conv3x3(*a, "none", False) ** 2).sum(),
                  argnums=(0, 1, 2, 3))(y, res, k, b)
    g2 = jax.grad(lambda *a: (conv3x3_reference(*a, "none") ** 2).sum(),
                  argnums=(0, 1, 2, 3))(y, res, k, b)
    for a, bb in zip(g1, g2):
        np.testing.assert_allclose(np.asarray(a), np.asarray(bb),
                                   atol=1e-4, rtol=1e-4)


def test_fusion_pools_kernel_matches_reference():
    from sisr_tpu.ops.pallas.fusion_ops import (_fusion_pools_pallas,
                                                fusion_pools_reference)

    rng = np.random.default_rng(2)
    a = jnp.asarray(rng.normal(size=(2, 16, 12, 20)).astype(np.float32))
    b = jnp.asarray(rng.normal(size=(2, 16, 12, 20)).astype(np.float32))
    refs = fusion_pools_reference(a, b)
    gots = _fusion_pools_pallas(a, b, interpret=True)
    for got, ref in zip(gots, refs):
        np.testing.assert_allclose(np.asarray(got), np.asarray(ref),
                                   atol=1e-5, rtol=1e-5)


def test_fusion_pools_kernel_chunked_widths():
    """Column-chunked slab build parity on both cp-write paths: wd=640
    (tail 128 — 128-aligned direct lane-slice writes) and wd=576 (tail 64
    — misaligned, must lane-concat the cp chunks; a misaligned lane slice
    like 960's 448 tail crashes Mosaic, and deferring ALL widths to the
    concat blows the VMEM stack at 1920/th8 — both measured v5e)."""
    from sisr_tpu.ops.pallas.fusion_ops import (_fusion_pools_pallas,
                                                fusion_pools_reference)

    rng = np.random.default_rng(3)
    for wd in (640, 576):
        a = jnp.asarray(rng.normal(size=(1, 16, wd, 12)).astype(np.float32))
        b = jnp.asarray(rng.normal(size=(1, 16, wd, 12)).astype(np.float32))
        refs = fusion_pools_reference(a, b)
        gots = _fusion_pools_pallas(a, b, interpret=True)
        for got, ref in zip(gots, refs):
            np.testing.assert_allclose(np.asarray(got), np.asarray(ref),
                                       atol=1e-5, rtol=1e-5)


def test_union_attention_pools_path_equivalent():
    """UA fed precomputed pools == UA computing its own pools."""
    from sisr_tpu.models.hit_sir_pro import UnionAttention
    from sisr_tpu.ops.pallas.fusion_ops import fusion_pools_reference

    rng = np.random.default_rng(3)
    a = jnp.asarray(rng.normal(size=(1, 8, 8, 12)).astype(np.float32))
    b = jnp.asarray(rng.normal(size=(1, 8, 8, 12)).astype(np.float32))
    ua = UnionAttention(12)
    v = ua.init(jax.random.PRNGKey(0), a)
    cp3, hp3, wp3 = fusion_pools_reference(a, b)
    k = 1  # the a + b source
    pools = tuple(t[:, 2 * k:2 * k + 2].astype(a.dtype).transpose(0, 2, 3, 1)
                  for t in (cp3, hp3, wp3))
    ref = ua.apply(v, a + b)
    got = ua.apply(v, a, pools=pools)
    np.testing.assert_allclose(np.asarray(got), np.asarray(ref),
                               atol=1e-5, rtol=1e-5)


def _random_ua_raws(rng, c, n=3):
    raws = []
    for _ in range(n):
        mk = lambda *s: jnp.asarray(rng.normal(size=s).astype(np.float32) * 0.3)
        raws.append(((mk(3, 3, 2, 1), mk(1)), (mk(3, 3, 2, 1), mk(1)),
                     (mk(3, 3, 2, 1), mk(1)), (mk(3, 3, c, c), mk(c))))
    return raws


def test_fused_fusion_reference_matches_module():
    """The folded conv_last decomposition == the Fusion module math."""
    from sisr_tpu.models.hit_sir_pro import Fusion
    from sisr_tpu.ops.pallas.fusion_ops import fused_fusion_reference

    rng = np.random.default_rng(4)
    c = 12
    a = jnp.asarray(rng.normal(size=(1, 16, 8, c)).astype(np.float32))
    b = jnp.asarray(rng.normal(size=(1, 16, 8, c)).astype(np.float32))
    fus = Fusion(c)
    v = fus.init(jax.random.PRNGKey(0), a, b)
    ref = fus.apply(v, a, b)

    def ua_raw(name):
        p = v["params"][name]
        return tuple((p[k]["kernel"], p[k]["bias"])
                     for k in ("conv1", "conv2", "conv3", "conv_last"))

    got = fused_fusion_reference(
        a, b, tuple(ua_raw(f"union_attention{i}") for i in (1, 2, 3)))
    np.testing.assert_allclose(np.asarray(got), np.asarray(ref),
                               atol=1e-5, rtol=1e-5)


def test_fused_fusion_kernels_match_reference():
    from sisr_tpu.ops.pallas.fusion_ops import (_fused_fusion_pallas,
                                                fused_fusion_reference)

    rng = np.random.default_rng(5)
    c = 12
    a = jnp.asarray(rng.normal(size=(2, 16, 8, c)).astype(np.float32))
    b = jnp.asarray(rng.normal(size=(2, 16, 8, c)).astype(np.float32))
    raws = tuple(_random_ua_raws(rng, c))
    ref = fused_fusion_reference(a, b, raws)
    got = _fused_fusion_pallas(a, b, raws, interpret=True)
    np.testing.assert_allclose(np.asarray(got), np.asarray(ref),
                               atol=1e-4, rtol=1e-4)


def test_row_tile_picks_are_vmem_aware():
    """Wide strip tiles must shrink the row band; square tiles keep th=16."""
    from sisr_tpu.ops.pallas import conv3x3 as c3
    from sisr_tpu.ops.pallas import ffn as f

    # ffn: 192-wide tiles keep the measured th=16 default; 1920-wide strips
    # drop to th=4 (double-buffered windows + scratch + chunked tap temps
    # vs the 100 MB raised limit)
    assert f._pick_row_tile(192, 192) == 16
    assert f._pick_row_tile(192, 1920) == 4
    assert f._pick_row_tile(192, 960) == 8
    assert f.supports_shape(192, 1920)

    # conv3x3: square-tile picks unchanged (192 LR body, 768 HR head)
    assert c3._pick_row_tile(192, 192, 180, 180) == 16
    assert c3._pick_row_tile(768, 768, 64, 64) == 16
    # strips: LR body 1920-wide and HR head 7680-wide shrink the band
    assert c3._pick_row_tile(192, 1920, 180, 180) == 4
    assert c3._pick_row_tile(768, 7680, 64, 64) == 4
    assert c3.supports_shape(768, 7680, 64, 64)


def test_conv3x3_shuffled_parity():
    """Shuffled-input conv kernel (packed phase-major 4F channels, 2x2
    interleave in VMEM) == conv3x3 of the materialized pixel shuffle."""
    from sisr_tpu.ops.pallas.conv3x3 import (_conv3x3_shuffled_pallas,
                                             conv3x3_shuffled_reference)

    rng = np.random.default_rng(5)
    mk = lambda *s: jnp.asarray(rng.standard_normal(s).astype(np.float32) * 0.1)
    for (h2, w2, f) in [(8, 16, 8), (16, 32, 12), (4, 300, 8)]:
        yp, k, b = mk(1, h2, w2, 4 * f), mk(3, 3, f, f), mk(f)
        ref = conv3x3_shuffled_reference(yp, k, b, "leaky2")
        got = _conv3x3_shuffled_pallas(yp, k, b, "leaky2", interpret=True)
        np.testing.assert_allclose(np.asarray(got), np.asarray(ref),
                                   atol=1e-5, rtol=1e-5)


def test_conv3x3_shuffled_tail_parity():
    """Fused conv_hr + conv_last kernel (shuffled conv with the tail 3x3
    emitted one band behind via VMEM scratch) == the two-op composition,
    incl. multi-band (lagged pipeline engaged) and chunked widths."""
    from sisr_tpu.ops.pallas.conv3x3 import (
        _conv3x3_shuffled_tail_pallas, conv3x3_shuffled_tail_reference)

    rng = np.random.default_rng(6)
    mk = lambda *s: jnp.asarray(rng.standard_normal(s).astype(np.float32) * 0.1)
    for (h2, w2, f, cout) in [(8, 16, 8, 3), (16, 32, 12, 3),
                              (24, 300, 8, 3), (4, 300, 8, 5)]:
        yp = mk(1, h2, w2, 4 * f)
        k1, b1 = mk(3, 3, f, f), mk(f)
        k2, b2 = mk(3, 3, f, cout), mk(cout)
        ref = conv3x3_shuffled_tail_reference(yp, k1, b1, "leaky2", k2, b2)
        got = _conv3x3_shuffled_tail_pallas(yp, k1, b1, "leaky2", k2, b2,
                                            interpret=True)
        np.testing.assert_allclose(np.asarray(got), np.asarray(ref),
                                   atol=1e-5, rtol=1e-5)


def test_conv3x3_shuffled_tail_packed_parity():
    """Packed-output tail kernel (pair-form conv_hr + grouped conv_last,
    out (B, H, W/16, 16*cout)) == the two-op reference reshaped, incl.
    multi-band lagged pipeline and group borders."""
    from sisr_tpu.ops.pallas.conv3x3 import (
        _conv3x3_shuffled_tail_packed_pallas,
        conv3x3_shuffled_tail_packed_reference, supports_packed_tail)

    rng = np.random.default_rng(7)
    mk = lambda *s: jnp.asarray(rng.standard_normal(s).astype(np.float32) * 0.1)
    for (h2, w2, f, cout) in [(8, 16, 64, 3), (24, 64, 64, 3),
                              (8, 40, 64, 5)]:
        assert supports_packed_tail(h2, w2, 4 * f, cout)
        yp = mk(1, h2, w2, 4 * f)
        k1, b1 = mk(3, 3, f, f), mk(f)
        k2, b2 = mk(3, 3, f, cout), mk(cout)
        ref = conv3x3_shuffled_tail_packed_reference(yp, k1, b1, "leaky2",
                                                     k2, b2)
        got = _conv3x3_shuffled_tail_packed_pallas(yp, k1, b1, "leaky2",
                                                   k2, b2, interpret=True)
        assert got.shape == ref.shape
        np.testing.assert_allclose(np.asarray(got), np.asarray(ref),
                                   atol=1e-5, rtol=1e-5)
    # unsupported shapes are gated out (odd pair count / narrow channels)
    assert not supports_packed_tail(8, 20, 256, 3)   # wpair 20 % 8 != 0
    assert not supports_packed_tail(8, 16, 32, 3)    # 2*cin < 128


def test_conv3x3_grouped_cout_parity(monkeypatch):
    """Tiny-Cout convs (conv_last) can take the output-pixel-grouped matmul
    path (8 px x Cout lanes per token; SISR_CONV_GROUP=1, default-off after
    measuring a net loss on v5e); parity incl. the right-edge over-read
    padding, multi-chunk widths, and a non-grouped control."""
    from sisr_tpu.ops.pallas.conv3x3 import (_conv3x3_pallas, _out_group,
                                             conv3x3_reference)

    assert _out_group(3, 7680) == 1           # default off
    monkeypatch.setenv("SISR_CONV_GROUP", "1")
    assert _out_group(3, 7680) == 8
    assert _out_group(64, 7680) == 1
    rng = np.random.default_rng(7)
    for (h, w, cin, cout) in [(16, 64, 64, 3), (8, 1024, 64, 3),
                              (8, 48, 20, 3), (8, 64, 64, 12)]:
        y = jnp.asarray(rng.standard_normal((1, h, w, cin)).astype(np.float32) * 0.1)
        k = jnp.asarray(rng.standard_normal((3, 3, cin, cout)).astype(np.float32) * 0.1)
        b = jnp.asarray(rng.standard_normal((cout,)).astype(np.float32))
        ref = conv3x3_reference(y, None, k, b, "leaky2")
        got = _conv3x3_pallas(y, None, k, b, "leaky2", interpret=True)
        np.testing.assert_allclose(np.asarray(got), np.asarray(ref),
                                   atol=2e-5, rtol=2e-5)


def test_htb_tail_pipe_stats_parity():
    """stats=True pipe kernel: the 4 folded SCA pool outputs must match the
    jnp reference pools of the kernel's own output (the lagged out_specs must
    not skip or duplicate a band), and ``out`` must be unchanged."""
    from sisr_tpu.ops.pallas.ffn import (_htb_tail_pipe, htb_tail_reference,
                                         htb_tail_stats, stats_reference)

    args = _tail_args(h=32, w=64, c=12, ch=24, b=2, seed=3)
    ref = htb_tail_reference(*args)
    out, cmean, cmax, psum, pmax = _htb_tail_pipe(*args, interpret=True,
                                                  stats=True)
    np.testing.assert_allclose(np.asarray(out), np.asarray(ref),
                               atol=2e-4, rtol=2e-4)
    b, h, w, _ = ref.shape
    got = (cmean[:, :, 0].reshape(b, h, w), cmax[:, :, 0].reshape(b, h, w),
           psum[:, :, 0].sum(axis=1), pmax[:, :, 0].max(axis=1))
    for g, r in zip(got, stats_reference(out)):
        np.testing.assert_allclose(np.asarray(g), np.asarray(r),
                                   atol=1e-4, rtol=1e-4)
    # public entry reshapes/reduces the partials the same way
    out2, stats2 = htb_tail_stats(*args, False, interpret=True)
    for g, r in zip(stats2, stats_reference(out2)):
        np.testing.assert_allclose(np.asarray(g), np.asarray(r),
                                   atol=1e-4, rtol=1e-4)


def test_model_stats_threading_equivalent():
    """HiTSIR eval with block-to-block SCA stats threading (the RHTB default)
    == the unthreaded composition (forced via use_checkpoint, which disables
    threading), f32 CPU."""
    from sisr_tpu.models.hit_sir_pro import HiTSIR

    rng = np.random.default_rng(1)
    cfg = dict(embed_dim=20, depths=(2, 2), num_heads=(2, 2),
               base_win_size=(4, 4), hier_win_ratios=(0.5, 1), upscale=4)
    x = jnp.asarray(rng.random((1, 16, 16, 3), np.float32))
    m = HiTSIR(**cfg)
    v = m.init(jax.random.PRNGKey(0), x)
    y1 = m.apply(v, x, deterministic=True)
    y2 = HiTSIR(**cfg, use_checkpoint=True).apply(v, x, deterministic=True)
    np.testing.assert_allclose(np.asarray(y1), np.asarray(y2),
                               atol=1e-5, rtol=1e-5)


def test_ffn_pipe_kernel_rect_width_parity():
    """Pipe kernel at a non-square width (th chosen < h) vs the reference."""
    from sisr_tpu.ops.pallas.ffn import _htb_tail_pipe, htb_tail_reference

    rng = np.random.default_rng(11)
    h, w, c, ch = 16, 256, 32, 64
    mk = lambda *s: jnp.asarray(rng.standard_normal(s).astype(np.float32) * 0.1)
    attn, short = mk(1, h, w, c), mk(1, h, w, c)
    args = (attn, short, mk(c), mk(c), mk(c, ch), mk(ch), mk(5, 5, ch),
            mk(ch), mk(ch, c), mk(c), mk(c), mk(c))
    import os
    os.environ["SISR_FFN_TH"] = "8"   # force multi-band pipeline
    try:
        got = _htb_tail_pipe(*args, interpret=True)
    finally:
        del os.environ["SISR_FFN_TH"]
    want = htb_tail_reference(*args)
    np.testing.assert_allclose(np.asarray(got), np.asarray(want),
                               atol=2e-5, rtol=2e-5)


def test_fused_fusion_rect_strip_shape():
    """Wide-strip shape: gate and pools kernels pick different row tiles
    (pools needs th%8 for its output blocks); parity in interpret mode."""
    from sisr_tpu.ops.pallas.fusion_ops import (_fused_fusion_pallas,
                                                _pick_pools_tile,
                                                _pick_row_tile,
                                                fused_fusion_reference,
                                                supports_shape)

    assert _pick_pools_tile(192, 1920) == 8
    assert _pick_row_tile(192, 1920) == 8  # th%8: gate wout/wcorr blocks
    assert _pick_row_tile(192, 192) == 16
    # th=16 compiles only up to wd=768 (measured pools VMEM matrix); 960
    # strips must drop to th=8 even though 16*960 < 8*1920 tokens
    assert _pick_row_tile(192, 960) == 8
    assert _pick_row_tile(192, 768) == 16
    assert supports_shape(192, 1920)
    assert supports_shape(1152, 1920)   # banded maps kernel: no area cap (r3)
    assert supports_shape(192, 2048)    # hardware-probed through W=2176 (r3)
    assert not supports_shape(192, 2304)  # beyond the proven pools-width cap

    rng = np.random.default_rng(9)
    c = 12
    a = jnp.asarray(rng.normal(size=(1, 16, 48, c)).astype(np.float32))
    b = jnp.asarray(rng.normal(size=(1, 16, 48, c)).astype(np.float32))
    raws = tuple(_random_ua_raws(rng, c))
    ref = fused_fusion_reference(a, b, raws)
    got = _fused_fusion_pallas(a, b, raws, interpret=True)
    np.testing.assert_allclose(np.asarray(got), np.asarray(ref),
                               atol=1e-4, rtol=1e-4)


def test_ffn_pipe_kernel_chunked_taps_parity():
    """wd > 512 triggers the column-chunked tap build; parity incl. the
    ragged last chunk (768 = 512 + 256)."""
    from sisr_tpu.ops.pallas.ffn import _htb_tail_pipe, htb_tail_reference

    rng = np.random.default_rng(12)
    h, w, c, ch = 8, 768, 8, 16
    mk = lambda *s: jnp.asarray(rng.standard_normal(s).astype(np.float32) * 0.1)
    args = (mk(1, h, w, c), mk(1, h, w, c), mk(c), mk(c), mk(c, ch), mk(ch),
            mk(5, 5, ch), mk(ch), mk(ch, c), mk(c), mk(c), mk(c))
    import os
    os.environ["SISR_FFN_TH"] = "4"
    try:
        got = _htb_tail_pipe(*args, interpret=True)
    finally:
        del os.environ["SISR_FFN_TH"]
    want = htb_tail_reference(*args)
    np.testing.assert_allclose(np.asarray(got), np.asarray(want),
                               atol=2e-5, rtol=2e-5)


def test_conv3x3_kernel_chunked_im2col_parity():
    """wd > 512 triggers the column-chunked im2col build (both cin<128
    packed and cin>=128 9-matmul paths are chunk-parametric)."""
    from sisr_tpu.ops.pallas.conv3x3 import _conv3x3_pallas, conv3x3_reference

    rng = np.random.default_rng(13)
    y = jnp.asarray(rng.standard_normal((1, 8, 640, 6)).astype(np.float32))
    k = jnp.asarray(rng.standard_normal((3, 3, 6, 10)).astype(np.float32) * 0.2)
    b = jnp.asarray(rng.standard_normal((10,)).astype(np.float32))
    got = _conv3x3_pallas(y, None, k, b, "leaky", interpret=True)
    want = conv3x3_reference(y, None, k, b, "leaky")
    np.testing.assert_allclose(np.asarray(got), np.asarray(want),
                               atol=1e-4, rtol=1e-4)


def test_stats_threading_through_padding_window():
    """Folded SCA stats threaded into a block whose window PADS the feature
    map (HTB transforms them: reflect-padded maps, strip-summed global sum)
    must reproduce the unthreaded forward (use_checkpoint=True disables
    threading; same params, same math)."""
    from sisr_tpu.models.hit_sir_pro import HiTSIR

    kw = dict(is_mult_size_conv_feat_extract=False,
              is_channel_spatial_attn=True, is_fusion=False,
              embed_dim=16, depths=(3,), num_heads=(2,),
              base_win_size=(4, 4), mlp_ratio=1.0,
              upsampler="pixelshuffledirect", upscale=4,
              hier_win_ratios=(1, 3, 1))  # win 12 pads H=16 -> 24
    rng = np.random.default_rng(11)
    img = jnp.asarray(rng.random((1, 16, 20, 3), dtype=np.float32))
    threaded = HiTSIR(**kw)
    plain = HiTSIR(**kw, use_checkpoint=True)
    variables = threaded.init(jax.random.PRNGKey(2), img)
    a = np.asarray(threaded.apply(variables, img))
    b = np.asarray(plain.apply(variables, img))
    np.testing.assert_allclose(a, b, atol=2e-4, rtol=2e-4)


def test_htb_tail_stats_accepts_padded_attn():
    """htb_tail_stats fed the UNCROPPED window-padded SCC output (taller than
    shortcut) must equal the cropped call: the pipe kernel's band grid reads
    only rows [0, h) via BlockSpec — the caller's crop slice is free."""
    from sisr_tpu.ops.pallas.ffn import htb_tail_reference, htb_tail_stats

    args = _tail_args(h=32, w=64, c=12, ch=24, b=1, seed=5)
    ref = htb_tail_reference(*args)
    pad = jnp.pad(args[0], ((0, 0), (0, 16), (0, 0), (0, 0)), mode="reflect")
    for taller in (pad,                       # 48 % th == 0: BlockSpec path
                   pad[:, :37]):              # 37 % th != 0: internal crop
        out, stats = htb_tail_stats(taller, *args[1:], False, interpret=True)
        np.testing.assert_allclose(np.asarray(out), np.asarray(ref),
                                   atol=2e-4, rtol=2e-4)
        # jnp fallback path slices too
        out2, _ = htb_tail_stats(taller, *args[1:], False)
        np.testing.assert_allclose(np.asarray(out2), np.asarray(ref),
                                   atol=2e-4, rtol=2e-4)


def _htb_fused_args(win=4, heads=2, c=20, ch=40, nw=3, nh=4, b=1,
                    with_sca=True, seed=7):
    """Args for htb_fused: degenerate-window SCC bundle + FFN params.
    Image is (b, nh*win, nw*win, c)."""
    from sisr_tpu.ops.pallas.scc_attention import (
        blockdiag_kgen, head_mask, pooling_matrix)

    rng = np.random.default_rng(seed)
    mk = lambda *s: jnp.asarray(rng.normal(size=s).astype(np.float32) * 0.3)
    d = c // (2 * heads)
    x = mk(b, nh * win, nw * win, c)
    sca = None
    if with_sca:
        sca = (mk(9, c), mk(c), mk(9, c), mk(c),
               mk(b, 1, 1, c), mk(b, 1, 1, c))
    w1, w2, bb = blockdiag_kgen(mk(d, d), mk(d), mk(d, d), mk(d), heads)
    pmat, pb = pooling_matrix(mk(1, 1), mk(1), win, win, win, win,
                              jnp.float32)
    mask = head_mask(heads, win * win, c // 2, jnp.float32)
    bias = mk(win * win, heads * win * win)
    scc = (x, sca, w1, w2, bb, pmat, pb, mask, bias, mk(c, c), mk(c),
           heads, (win, win))
    ffn = (mk(c) + 1.0, mk(c),            # ln1
           mk(c, ch), mk(ch),             # fc1
           mk(5, 5, ch), mk(ch),          # dwconv
           mk(ch, c), mk(c),              # fc2
           mk(c) + 1.0, mk(c))            # ln2
    return scc + ffn


@pytest.mark.parametrize("win,heads,c,ch,with_sca,nh", [
    (4, 2, 20, 40, True, 4),     # small-L path (L=16 < half... no: half=10)
    (4, 2, 48, 96, True, 3),     # L=16 < half=24: small-L out_c form
    (8, 2, 20, 40, True, 2),     # w=8: L=64 >= half
    (4, 2, 20, 40, False, 3),    # no SCA
])
def test_htb_fused_kernel_matches_reference(win, heads, c, ch, with_sca, nh):
    from sisr_tpu.ops.pallas.htb_block import htb_fused, htb_fused_reference

    args = _htb_fused_args(win=win, heads=heads, c=c, ch=ch,
                           with_sca=with_sca, nh=nh)
    ref = htb_fused_reference(*args)
    got = htb_fused(*args, interpret=True)
    np.testing.assert_allclose(np.asarray(got), np.asarray(ref),
                               atol=3e-3, rtol=3e-3)


def test_htb_fused_stats_parity():
    """emit_stats=True: out unchanged and the 4 folded SCA pools match the
    reference pools of the kernel's own output."""
    from sisr_tpu.ops.pallas.ffn import stats_reference
    from sisr_tpu.ops.pallas.htb_block import htb_fused, htb_fused_reference

    args = _htb_fused_args(win=4, heads=2, c=24, ch=48, nh=4, nw=8, b=2)
    ref = htb_fused_reference(*args)
    out, stats = htb_fused(*args, emit_stats=True, interpret=True)
    np.testing.assert_allclose(np.asarray(out), np.asarray(ref),
                               atol=3e-3, rtol=3e-3)
    for g, r in zip(stats, stats_reference(out)):
        np.testing.assert_allclose(np.asarray(g), np.asarray(r),
                                   atol=1e-4, rtol=1e-4)


def test_htb_fused_consumes_threaded_stats():
    """sca carrying precomputed (cmean, cmax) maps must equal recomputing
    them from x (the RHTB stats-threading contract)."""
    from sisr_tpu.ops.pallas.htb_block import htb_fused

    args = _htb_fused_args(win=4, heads=2, c=20, ch=40, nh=4)
    x, sca = args[0], args[1]
    base = htb_fused(*args, interpret=True)
    cmean = x.astype(jnp.float32).mean(-1)
    cmax = x.astype(jnp.float32).max(-1)
    args2 = (x, sca + (cmean, cmax)) + args[2:]
    got = htb_fused(*args2, interpret=True)
    np.testing.assert_allclose(np.asarray(got), np.asarray(base),
                               atol=1e-5, rtol=1e-5)


@pytest.mark.parametrize("parity", ["0", "1"])
def test_htb_tail_pipe_scratch_variants(parity, monkeypatch):
    """Both pipe scratch schemes (parity slots / rotation copies) must match
    the reference; parity slots are the measured default (ROADMAP r5)."""
    from sisr_tpu.ops.pallas.ffn import _htb_tail_pipe, htb_tail_reference

    monkeypatch.setenv("SISR_FFN_PARITY", parity)
    args = _tail_args(h=24, w=16, c=12, ch=24, b=2, seed=9)
    ref = htb_tail_reference(*args)
    got = _htb_tail_pipe(*args, interpret=True)
    np.testing.assert_allclose(np.asarray(got), np.asarray(ref),
                               atol=2e-4, rtol=2e-4)
