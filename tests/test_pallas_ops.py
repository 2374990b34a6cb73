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


@pytest.mark.parametrize("win,base,heads,c,nw", [(8, 8, 2, 20, 2), (16, 8, 2, 24, 1)])
def test_fused_scc_kernel_matches_reference(win, base, heads, c, nw):
    from sisr_tpu.ops.pallas.scc_attention import (
        _scc_pallas, blockdiag_kgen, head_mask, pooling_matrix, scc_reference)

    rng = np.random.default_rng(0)
    d = c // (2 * heads)
    bh = bw = min(win, base)
    rh = win // bh
    x6 = jnp.asarray(rng.normal(size=(1, nw, win, nw, win, c)).astype(np.float32))
    w1, w2, bb = blockdiag_kgen(
        jnp.asarray(rng.normal(size=(d, d)).astype(np.float32)),
        jnp.asarray(rng.normal(size=(d,)).astype(np.float32)),
        jnp.asarray(rng.normal(size=(d, d)).astype(np.float32)),
        jnp.asarray(rng.normal(size=(d,)).astype(np.float32)), heads)
    pmat, pb = pooling_matrix(
        jnp.asarray(rng.normal(size=(rh * rh, 1)).astype(np.float32)),
        jnp.asarray(rng.normal(size=(1,)).astype(np.float32)),
        win, win, bh, bw, jnp.float32)
    mask = head_mask(heads, bh * bw, c // 2, jnp.float32)
    bias = jnp.asarray(rng.normal(
        size=(win * win, heads * bh * bw)).astype(np.float32))

    ref = scc_reference(x6, w1, w2, bb, pmat, pb, mask, bias, heads)
    got = _scc_pallas(x6, w1, w2, bb, pmat, pb, mask, bias, heads, interpret=True)
    np.testing.assert_allclose(np.asarray(got), np.asarray(ref), atol=2e-3, rtol=2e-3)


def test_fused_scc_grad_runs():
    """custom_vjp backward (jnp fallback) produces finite grads."""
    from sisr_tpu.ops.pallas.scc_attention import (
        blockdiag_kgen, fused_scc, head_mask, pooling_matrix)

    rng = np.random.default_rng(1)
    heads, c, win = 2, 20, 8
    d = c // (2 * heads)
    x6 = jnp.asarray(rng.normal(size=(1, 1, win, 1, win, c)).astype(np.float32))
    w1, w2, bb = blockdiag_kgen(
        jnp.asarray(rng.normal(size=(d, d)).astype(np.float32)),
        jnp.zeros((d,)), jnp.asarray(rng.normal(size=(d, d)).astype(np.float32)),
        jnp.zeros((d,)), heads)
    pmat, pb = pooling_matrix(jnp.ones((1, 1)), jnp.zeros((1,)),
                              win, win, win, win, jnp.float32)
    mask = head_mask(heads, win * win, c // 2, jnp.float32)
    bias = jnp.zeros((win * win, heads * win * win))

    def loss(x6):
        return (fused_scc(x6, w1, w2, bb, pmat, pb, mask, bias, heads, False) ** 2).sum()

    g = jax.grad(loss)(x6)
    assert np.isfinite(np.asarray(g)).all()


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
