"""LayerNorm implementation shootout at (36864, 180) bf16."""

import sys

import numpy as np
import jax
import jax.numpy as jnp
from flax import linen as nn

jax.config.update("jax_compilation_cache_dir", "/root/repo/.jax_cache")
jax.config.update("jax_persistent_cache_min_compile_time_secs", 1.0)
sys.path.insert(0, "/root/repo")
from tools.tpu_timer import device_time  # noqa: E402

DT = jnp.bfloat16
N, C = 36864, 180
rng = np.random.default_rng(0)
x = jnp.asarray(rng.random((N, C), np.float32), DT)
scale = jnp.asarray(rng.random((C,), np.float32))
bias = jnp.asarray(rng.random((C,), np.float32))


def t(name, fn, *args):
    ms = device_time(lambda *a: fn(*a).astype(jnp.float32).sum(), *args, n=30) * 1e3
    print(f"{name}: {ms:.3f} ms", flush=True)


def flax_ln(x, s, b):
    return nn.LayerNorm(epsilon=1e-5, dtype=DT).apply(
        {"params": {"scale": s, "bias": b}}, x)


def manual_ln(x, s, b):
    xf = x.astype(jnp.float32)
    m = xf.mean(-1, keepdims=True)
    var = jnp.square(xf - m).mean(-1, keepdims=True)
    y = (xf - m) * jax.lax.rsqrt(var + 1e-5)
    return (y * s + b).astype(DT)


def moment_ln(x, s, b):
    xf = x.astype(jnp.float32)
    m = xf.mean(-1, keepdims=True)
    m2 = jnp.square(xf).mean(-1, keepdims=True)
    y = (xf - m) * jax.lax.rsqrt(jnp.maximum(m2 - m * m, 0) + 1e-5)
    return (y * s + b).astype(DT)


ones = jnp.ones((C, 2), jnp.float32)


def matmul_ln(x, s, b):
    xf = x.astype(jnp.float32)
    stats = jnp.concatenate([xf, jnp.square(xf)], axis=-1) @ jnp.concatenate(
        [jnp.ones((C, 1), jnp.float32), jnp.zeros((C, 1), jnp.float32)], 0)
    m = (xf @ jnp.ones((C, 1), jnp.float32)) / C
    m2 = (jnp.square(xf) @ jnp.ones((C, 1), jnp.float32)) / C
    y = (xf - m) * jax.lax.rsqrt(jnp.maximum(m2 - m * m, 0) + 1e-5)
    return (y * s + b).astype(DT)


def bf16_ln(x, s, b):
    m = x.mean(-1, keepdims=True)
    var = jnp.square(x - m).mean(-1, keepdims=True)
    y = (x - m) * jax.lax.rsqrt(var + jnp.asarray(1e-5, DT))
    return y * s.astype(DT) + b.astype(DT)


if __name__ == "__main__":
    t("flax LN    ", flax_ln, x, scale, bias)
    t("manual f32 ", manual_ln, x, scale, bias)
    t("moments f32", moment_ln, x, scale, bias)
    t("matmul f32 ", matmul_ln, x, scale, bias)
    t("pure bf16  ", bf16_ln, x, scale, bias)
