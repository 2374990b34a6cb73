"""Ablate the FFN tail kernel's stages with exact trace-based device timing.

Variants rebuild the pallas_call with parts of the body disabled; differences
between variants isolate each stage's cost (dwconv taps, gelus, LNs,
matmuls).  Flagship shapes: (1, 192, 192, 180), hidden 360, th=16.
"""

import functools
import sys

import numpy as np
import jax
import jax.numpy as jnp
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu

jax.config.update("jax_compilation_cache_dir", "/root/repo/.jax_cache")
jax.config.update("jax_persistent_cache_min_compile_time_secs", 1.0)
sys.path.insert(0, "/root/repo")

from sisr_tpu.ops.pallas import ffn  # noqa: E402
from tools.profile_op import profile_call  # noqa: E402

K = 5
PAD = 4


def kernel_split2(a_ref, ah_ref, s_ref, sh_ref, ln1s_ref, ln1b_ref, w1_ref,
                  b1_ref, dw_ref, dwb_ref, w2_ref, b2_ref, ln2s_ref,
                  ln2b_ref, o_ref, *, h_img, th):
    """Two independent half-band chains after the shared fc1: Mosaic may
    co-schedule half A's fc2 (MXU) with half B's dwconv taps (VPU)."""
    wd = o_ref.shape[2]
    c = o_ref.shape[3]
    ch = w1_ref.shape[1]
    dt = o_ref.dtype
    f32 = jnp.float32
    hh = th // 2

    a = jnp.concatenate([ah_ref[0, 0, 0:2], a_ref[0], ah_ref[0, 0, 2:4]], axis=0)
    s = jnp.concatenate([sh_ref[0, 0, 0:2], s_ref[0], sh_ref[0, 0, 2:4]], axis=0)
    x = s + ffn.layer_norm(a, ln1s_ref[0], ln1b_ref[0])

    lin1 = jnp.dot(x.reshape((th + PAD) * wd, c), w1_ref[...],
                   preferred_element_type=f32) + b1_ref[0].astype(f32)
    h = ffn._gelu_kernel(lin1).astype(dt).reshape(th + PAD, wd, ch)

    base = pl.program_id(1) * th - PAD // 2
    row = base + jax.lax.broadcasted_iota(jnp.int32, (th + PAD, 1, 1), 0)
    valid = jnp.logical_and(row >= 0, row < h_img)
    hm = jnp.where(valid, h, jnp.zeros_like(h))
    hp = jnp.pad(hm, ((0, 0), (PAD // 2, PAD // 2), (0, 0)))
    cols = [hp[:, j:j + wd, :] for j in range(K)]
    dwf = dw_ref[...]

    def half(r0):
        sj = [sum(cols[j][r0 + i:r0 + i + hh].astype(f32)
                  * dwf[i * K + j, :].astype(f32)
                  for i in range(K)) for j in range(K)]
        acc = sj[0] + sj[1] + sj[2] + sj[3] + sj[4]
        dwout = ffn._gelu_kernel((acc + dwb_ref[0].astype(f32)).astype(dt))
        h2 = h[PAD // 2 + r0:PAD // 2 + r0 + hh] + dwout
        y = (jnp.dot(h2.reshape(hh * wd, ch), w2_ref[...],
                     preferred_element_type=f32)
             + b2_ref[0].astype(f32)).astype(dt)
        return (x[PAD // 2 + r0:PAD // 2 + r0 + hh]
                + ffn.layer_norm(y.reshape(hh, wd, c), ln2s_ref[0],
                                 ln2b_ref[0]))

    o_ref[0, 0:hh] = half(0).astype(dt)
    o_ref[0, hh:th] = half(hh).astype(dt)


def kernel_v(a_ref, ah_ref, s_ref, sh_ref, ln1s_ref, ln1b_ref, w1_ref,
             b1_ref, dw_ref, dwb_ref, w2_ref, b2_ref, ln2s_ref, ln2b_ref,
             o_ref, *, h_img, th, stages):
    wd = o_ref.shape[2]
    c = o_ref.shape[3]
    ch = w1_ref.shape[1]
    dt = o_ref.dtype
    f32 = jnp.float32

    a = jnp.concatenate([ah_ref[0, 0, 0:2], a_ref[0], ah_ref[0, 0, 2:4]], axis=0)
    s = jnp.concatenate([sh_ref[0, 0, 0:2], s_ref[0], sh_ref[0, 0, 2:4]], axis=0)
    if "ln1" in stages:
        x = s + ffn.layer_norm(a, ln1s_ref[0], ln1b_ref[0])
    else:
        x = s + a

    lin1 = jnp.dot(x.reshape((th + PAD) * wd, c), w1_ref[...],
                   preferred_element_type=f32) + b1_ref[0].astype(f32)
    if "gelu" in stages:
        h = ffn._gelu_kernel(lin1).astype(dt).reshape(th + PAD, wd, ch)
    else:
        h = lin1.astype(dt).reshape(th + PAD, wd, ch)

    if "taps" in stages:
        base = pl.program_id(1) * th - PAD // 2
        row = base + jax.lax.broadcasted_iota(jnp.int32, (th + PAD, 1, 1), 0)
        valid = jnp.logical_and(row >= 0, row < h_img)
        hm = jnp.where(valid, h, jnp.zeros_like(h))
        hp = jnp.pad(hm, ((0, 0), (PAD // 2, PAD // 2), (0, 0)))
        cdt = dt if "bf16cols" in stages else f32
        cols = [hp[:, j:j + wd, :].astype(cdt) for j in range(K)]
        dwf = dw_ref[...].astype(cdt)
        if "grouped" in stages:
            # one expression tree per column: s_j = sum_i shift_i(col_j)*w_ij
            sj = [sum(cols[j][i:i + th].astype(f32) * dwf[i * K + j, :].astype(f32)
                      for i in range(K)) for j in range(K)]
            acc = sj[0] + sj[1] + sj[2] + sj[3] + sj[4]
        elif "bigsum" in stages:
            acc = sum(cols[j][i:i + th].astype(f32) * dwf[i * K + j, :].astype(f32)
                      for i in range(K) for j in range(K))
        else:
            acc = jnp.zeros((th, wd, ch), f32)
            nt = 25 if "taps25" in stages else 5
            for t in range(nt):
                i, j = divmod(t, K) if nt == 25 else (t, t)
                acc += (cols[j][i if nt == 25 else 0:(i if nt == 25 else 0) + th].astype(f32)
                        * dwf[i * K + j, :].astype(f32))
        dwout = (acc + dwb_ref[0].astype(f32)).astype(dt)
        if "gelu" in stages:
            dwout = ffn._gelu_kernel(dwout)
        h2 = h[PAD // 2:PAD // 2 + th] + dwout
    else:
        h2 = h[PAD // 2:PAD // 2 + th]

    y = (jnp.dot(h2.reshape(th * wd, ch), w2_ref[...],
                 preferred_element_type=f32) + b2_ref[0].astype(f32)).astype(dt)
    if "ln2" in stages:
        out = x[PAD // 2:PAD // 2 + th] + ffn.layer_norm(
            y.reshape(th, wd, c), ln2s_ref[0], ln2b_ref[0])
    else:
        out = x[PAD // 2:PAD // 2 + th] + y.reshape(th, wd, c)
    o_ref[0] = out.astype(dt)


def build(stages, th=16):
    b, h, wd, c, ch = 1, 192, 192, 180, 360
    nb = h // th

    def halo(t):
        tp = jnp.pad(t, ((0, 0), (2, 2), (0, 0), (0, 0)))
        tops = jnp.stack([tp[:, r * th:r * th + 2] for r in range(nb)], axis=1)
        bots = jnp.stack([tp[:, r * th + th + 2:r * th + th + 4]
                          for r in range(nb)], axis=1)
        return jnp.concatenate([tops, bots], axis=2)

    if stages == "split2":
        kern = functools.partial(kernel_split2, h_img=h, th=th)
    else:
        kern = functools.partial(kernel_v, h_img=h, th=th, stages=stages)
    const = lambda bi, ri: (0, 0)
    body = pl.BlockSpec((1, th, wd, c), lambda bi, ri: (bi, ri, 0, 0))
    hspec = pl.BlockSpec((1, 1, 4, wd, c), lambda bi, ri: (bi, ri, 0, 0, 0))

    def f(attn, shortcut, ln1s, ln1b, w1, b1, dw, dwb, w2, b2, ln2s, ln2b):
        return pl.pallas_call(
            kern, grid=(b, nb),
            in_specs=[body, hspec, body, hspec,
                      pl.BlockSpec((1, c), const), pl.BlockSpec((1, c), const),
                      pl.BlockSpec((c, ch), const), pl.BlockSpec((1, ch), const),
                      pl.BlockSpec((K * K, ch), const), pl.BlockSpec((1, ch), const),
                      pl.BlockSpec((ch, c), const), pl.BlockSpec((1, c), const),
                      pl.BlockSpec((1, c), const), pl.BlockSpec((1, c), const)],
            out_specs=body,
            out_shape=jax.ShapeDtypeStruct((b, h, wd, c), attn.dtype),
            compiler_params=pltpu.CompilerParams(
                dimension_semantics=("parallel", "arbitrary"),
                vmem_limit_bytes=64 * 1024 * 1024),
        )(attn, halo(attn), shortcut, halo(shortcut),
          ln1s.reshape(1, c), ln1b.reshape(1, c), w1, b1.reshape(1, ch),
          dw.reshape(K * K, ch), dwb.reshape(1, ch), w2, b2.reshape(1, c),
          ln2s.reshape(1, c), ln2b.reshape(1, c))
    return f


def main():
    rng = np.random.default_rng(0)
    bf = jnp.bfloat16
    b, h, wd, c, ch = 1, 192, 192, 180, 360
    r = lambda *s: jnp.asarray(rng.normal(size=s).astype(np.float32) * 0.1, bf)
    args = (r(b, h, wd, c), r(b, h, wd, c), r(c), r(c), r(c, ch), r(ch),
            r(5, 5, ch), r(ch), r(ch, c), r(c), r(c), r(c))

    variants = [
        ("grouped", frozenset({"ln1", "gelu", "taps", "grouped", "ln2"})),
        ("split2", "split2"),
    ]
    if "--base" in sys.argv:
        variants += [
            ("taps5-only", frozenset({"ln1", "gelu", "taps", "ln2"})),
            ("no-taps", frozenset({"ln1", "gelu", "ln2"})),
            ("no-gelu", frozenset({"ln1", "taps", "taps25", "ln2"})),
            ("no-ln", frozenset({"gelu", "taps", "taps25"})),
            ("matmuls-only", frozenset()),
        ]
    for name, st in variants:
        t = profile_call(build(st), *args, n=20, top=0)
        print(f"{name}: {t:.4f} ms", flush=True)


if __name__ == "__main__":
    main()
