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
