"""Minimal TPU repro: _conv3x3_shuffled_pallas (Mosaic) vs jnp reference."""

import sys

import numpy as np
import jax
import jax.numpy as jnp

jax.config.update("jax_compilation_cache_dir", "/root/repo/.jax_cache")
jax.config.update("jax_persistent_cache_min_compile_time_secs", 1.0)
sys.path.insert(0, "/root/repo")

from sisr_tpu.ops.pallas.conv3x3 import (  # noqa: E402
    _conv3x3_shuffled_pallas, conv3x3_shuffled_reference, _pick_row_tile)

rng = np.random.default_rng(5)
mk = lambda *s: jnp.asarray(rng.standard_normal(s).astype(np.float32) * 0.1)

for (h2, w2, f) in [(32, 32, 64), (96, 96, 64)]:
    print("th:", _pick_row_tile(2 * h2, 2 * w2, f, f))
    yp = mk(1, h2, w2, 4 * f).astype(jnp.bfloat16)
    k = mk(3, 3, f, f).astype(jnp.bfloat16)
    b = mk(f).astype(jnp.bfloat16)
    ref = np.asarray(conv3x3_shuffled_reference(yp, k, b, "leaky2"),
                     np.float32)
    got = np.asarray(jax.jit(
        lambda yp, k, b: _conv3x3_shuffled_pallas(yp, k, b, "leaky2"))(
            yp, k, b), np.float32)
    err = np.abs(got - ref)
    print((h2, w2, f), "max", err.max(), "mean", err.mean())
    # locate the divergence pattern
    bad = err > 0.05
    if bad.any():
        ii = np.argwhere(bad)
        print("bad frac", bad.mean(), "first", ii[:5], "last", ii[-3:])
        for ax, name in [(1, "rows"), (2, "cols"), (3, "chan")]:
            m = bad.any(axis=tuple(a for a in range(4) if a != ax))
            print(name, np.flatnonzero(m)[:20], "...", np.flatnonzero(m)[-5:])
