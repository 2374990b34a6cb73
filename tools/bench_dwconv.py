"""Micro-bench depthwise-conv implementations on (1,192,192,360)."""

import sys
import time

import numpy as np
import jax
import jax.numpy as jnp

jax.config.update("jax_compilation_cache_dir", "/root/repo/.jax_cache")
jax.config.update("jax_persistent_cache_min_compile_time_secs", 1.0)
sys.path.insert(0, "/root/repo")
from sisr_tpu.ops.pallas.dwconv import _dwconv_pallas, depthwise_conv_reference, K, PAD  # noqa


def shifted_fma(x, w, b):
    xp = jnp.pad(x, ((0, 0), (2, 2), (2, 2), (0, 0)))
    h, wd = x.shape[1], x.shape[2]
    acc = jnp.zeros(x.shape, jnp.float32)
    for i in range(K):
        for j in range(K):
            acc += xp[:, i:i + h, j:j + wd, :].astype(jnp.float32) * w[i, j, :]
    return (acc + b).astype(x.dtype)


def timeit(name, fn, *args, reps=5):
    from tools.tpu_timer import device_time
    t = device_time(fn, *args, n=30)
    print(f"{name}: {t*1e3:.3f} ms/call", flush=True)


if __name__ == "__main__":
    rng = np.random.default_rng(0)
    x = jnp.asarray(rng.random((1, 192, 192, 360), np.float32), jnp.bfloat16)
    w = jnp.asarray(rng.random((5, 5, 360), np.float32), jnp.bfloat16)
    b = jnp.asarray(rng.random((360,), np.float32), jnp.bfloat16)
    timeit("xla grouped conv", depthwise_conv_reference, x, w, b)
    timeit("pallas kernel   ", _dwconv_pallas, x, w, b)
    timeit("25x shifted fma ", shifted_fma, x, w, b)
