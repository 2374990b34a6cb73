"""Micro-measurement: what does an unaligned sublane slice cost in Mosaic?

Isolates the suspected cost drivers of the dwconv kernel: (a) plain copy,
(b) one unaligned sublane shift, (c) 25 tap FMAs, (d) the kernel-external
pre-overlap gather — to direct the next kernel design.
"""

import functools
import sys

import numpy as np
import jax
import jax.numpy as jnp
from jax.experimental import pallas as pl

jax.config.update("jax_compilation_cache_dir", "/root/repo/.jax_cache")
jax.config.update("jax_persistent_cache_min_compile_time_secs", 1.0)
sys.path.insert(0, "/root/repo")
from tools.tpu_timer import device_time  # noqa: E402

B, NCT, NRT, TH, W, CT = 1, 3, 12, 16, 192, 120
SHAPE = (B, NCT, NRT, TH + 4, W + 4, CT)


def k_copy(x_ref, o_ref):
    o_ref[:] = x_ref[:, :, :, :TH, :W, :]


def k_shift1(x_ref, o_ref):
    o_ref[:] = (x_ref[:, :, :, 0:TH, 1:W + 1, :]
                + x_ref[:, :, :, 0:TH, 3:W + 3, :])


def k_taps25(x_ref, o_ref):
    acc = jnp.zeros(o_ref.shape, jnp.float32)
    for i in range(5):
        for j in range(5):
            acc += x_ref[:, :, :, i:i + TH, j:j + W, :].astype(jnp.float32) * (i + j)
    o_ref[:] = acc.astype(o_ref.dtype)


def k_taps25_2stage(x_ref, o_ref):
    x = x_ref[0, 0, 0]
    cols = [x[:, j:j + W, :] for j in range(5)]
    acc = jnp.zeros((TH, W, CT), jnp.float32)
    for i in range(5):
        for j in range(5):
            acc += cols[j][i:i + TH].astype(jnp.float32) * (i + j)
    o_ref[0, 0, 0] = acc.astype(o_ref.dtype)


def k_taps25_2stage_vecw(x_ref, w_ref, o_ref):
    x = x_ref[0, 0, 0]
    w = w_ref[...]
    cols = [x[:, j:j + W, :] for j in range(5)]
    acc = jnp.zeros((TH, W, CT), jnp.float32)
    for i in range(5):
        for j in range(5):
            acc += cols[j][i:i + TH].astype(jnp.float32) * w[i, j, :].astype(jnp.float32)
    o_ref[0, 0, 0] = acc.astype(o_ref.dtype)


def k_taps25_2stage_vecw_bf16(x_ref, w_ref, o_ref):
    x = x_ref[0, 0, 0]
    w = w_ref[...]
    acc = jnp.zeros((TH, W, CT), jnp.float32)
    cols = [x[:, j:j + W, :] for j in range(5)]
    for i in range(5):
        for j in range(5):
            acc += (cols[j][i:i + TH] * w[i, j, :]).astype(jnp.float32)
    o_ref[0, 0, 0] = acc.astype(o_ref.dtype)


def run_kernel_w(kern, x, w):
    return pl.pallas_call(
        kern,
        grid=(B, NCT, NRT),
        in_specs=[pl.BlockSpec((1, 1, 1, TH + 4, W + 4, CT),
                               lambda b, c, r: (b, c, r, 0, 0, 0)),
                  pl.BlockSpec((5, 5, CT), lambda b, c, r: (0, 0, 0))],
        out_specs=pl.BlockSpec((1, 1, 1, TH, W, CT),
                               lambda b, c, r: (b, c, r, 0, 0, 0)),
        out_shape=jax.ShapeDtypeStruct((B, NCT, NRT, TH, W, CT), x.dtype),
    )(x, w)


def run_kernel(kern, x):
    return pl.pallas_call(
        kern,
        grid=(B, NCT, NRT),
        in_specs=[pl.BlockSpec((1, 1, 1, TH + 4, W + 4, CT),
                               lambda b, c, r: (b, c, r, 0, 0, 0))],
        out_specs=pl.BlockSpec((1, 1, 1, TH, W, CT),
                               lambda b, c, r: (b, c, r, 0, 0, 0)),
        out_shape=jax.ShapeDtypeStruct((B, NCT, NRT, TH, W, CT), x.dtype),
    )(x)


def prep_overlap(x):
    """The kernel-external transform in _dwconv_pallas (pad+regroup+stack)."""
    b, h, wd, c = x.shape
    xp = jnp.pad(x, ((0, 0), (2, 2), (2, 2), (0, 0)))
    xp = xp.reshape(b, h + 4, wd + 4, NCT, CT).transpose(0, 3, 1, 2, 4)
    xov = jnp.stack([xp[:, :, r * TH:r * TH + TH + 4] for r in range(NRT)], axis=2)
    return xov


if __name__ == "__main__":
    rng = np.random.default_rng(0)
    xov = jnp.asarray(rng.random(SHAPE, np.float32), jnp.bfloat16)
    x_raw = jnp.asarray(rng.random((1, 192, 192, 360), np.float32), jnp.bfloat16)

    for name, kern in [("copy", k_copy), ("2 shifts", k_shift1),
                       ("25 taps flat", k_taps25),
                       ("25 taps 2stage", k_taps25_2stage)]:
        t = device_time(lambda x: run_kernel(kern, x).astype(jnp.float32).sum(),
                        xov, n=30)
        print(f"{name}: {t*1e3:.3f} ms", flush=True)

    t = device_time(lambda x: prep_overlap(x).astype(jnp.float32).sum(),
                    x_raw, n=30)
    print(f"pre-overlap gather (external): {t*1e3:.3f} ms", flush=True)

    wv = jnp.asarray(rng.random((5, 5, CT), np.float32), jnp.bfloat16)
    for name, kern in [("25 taps 2stage vec-w f32", k_taps25_2stage_vecw),
                       ("25 taps 2stage vec-w bf16mul", k_taps25_2stage_vecw_bf16)]:
        t = device_time(
            lambda x, w: run_kernel_w(kern, x, w).astype(jnp.float32).sum(),
            xov, wv, n=30)
        print(f"{name}: {t*1e3:.3f} ms", flush=True)
