"""Tunnel-safe TPU timing: amortize the host<->device round-trip.

The axon tunnel adds ~30 ms to any synchronous fetch, so single-call timing
is meaningless.  Chain N dependent executions and fetch once; the per-call
device time is (t_chain - t_fetch) / N.
"""

import time

import jax
import jax.numpy as jnp


def device_time(fn, *args, n: int = 20) -> float:
    """Median-free min-of-3 per-call seconds for jitted fn(*args) -> array."""
    f = jax.jit(fn)
    out = f(*args)  # compile
    jax.block_until_ready(out)

    def chain(k):
        t0 = time.perf_counter()
        o = f(*args)
        for _ in range(k - 1):
            o = f(*args)
        _ = jnp.asarray(o).ravel()[0] + 0.0
        float(_)
        return time.perf_counter() - t0

    chain(2)  # warm
    best = min(chain(n + 1) - chain(1) for _ in range(3))
    return max(best, 1e-9) / n
