"""Component-level device timing at flagship tile shapes (192x192, C=180)."""

import sys
from functools import partial

import numpy as np
import jax
import jax.numpy as jnp
from flax import linen as nn

jax.config.update("jax_compilation_cache_dir", "/root/repo/.jax_cache")
jax.config.update("jax_persistent_cache_min_compile_time_secs", 1.0)
sys.path.insert(0, "/root/repo")

from tools.tpu_timer import device_time  # noqa: E402
from sisr_tpu.ops.windows import window_partition, window_reverse  # noqa: E402

DT = jnp.bfloat16
H = W = 192
C = 180
HEADS = 6
D = C // (2 * HEADS)
rng = np.random.default_rng(0)


def t(name, fn, *args, n=20):
    ms = device_time(lambda *a: jnp.asarray(fn(*a)).astype(jnp.float32).sum(),
                     *args, n=n) * 1e3
    print(f"{name}: {ms:.3f} ms", flush=True)


def main():
    x = jnp.asarray(rng.random((1, H, W, C), np.float32), DT)
    tokens = jnp.asarray(rng.random((H * W, C), np.float32), DT)

    # elementwise / norm / dense
    t("layernorm 36864x180", lambda a: nn.LayerNorm(epsilon=1e-5, dtype=DT).apply(
        {"params": {"scale": jnp.ones((C,)), "bias": jnp.zeros((C,))}}, a), tokens)
    wd1 = jnp.asarray(rng.random((C, 2 * C), np.float32), DT)
    t("dense 180->360", lambda a: a @ wd1, tokens)
    wd2 = jnp.asarray(rng.random((C, C), np.float32), DT)
    t("dense 180->180", lambda a: a @ wd2, tokens)

    # SCA pieces
    t("channel mean+max (B,H,W,1)x2", lambda a: (
        a.mean(-1, keepdims=True) + a.max(-1, keepdims=True)), x)
    wc = jnp.asarray(rng.random((3, 3, 1, C), np.float32), DT)
    t("conv3x3 1->180", lambda a: jax.lax.conv_general_dilated(
        a.mean(-1, keepdims=True), wc, (1, 1), ((1, 1), (1, 1)),
        dimension_numbers=("NHWC", "HWIO", "NHWC")), x)
    t("global avg+max pool", lambda a: a.mean((1, 2), keepdims=True)
      + a.max((1, 2), keepdims=True), x)

    # conv 3x3 180->180 (RHTB / conv_after_body)
    w33 = jnp.asarray(rng.random((3, 3, C, C), np.float32), DT)
    t("conv3x3 180->180", lambda a: jax.lax.conv_general_dilated(
        a, w33, (1, 1), ((1, 1), (1, 1)),
        dimension_numbers=("NHWC", "HWIO", "NHWC")), x)

    # per-window attention pieces
    for win in (4, 8, 16, 32, 48, 64):
        nwb = (H // win) * (W // win)
        l_full = win * win
        bwin = min(win, 8)
        l_base = bwin * bwin
        r = (win // bwin) ** 2

        t(f"win{win}: partition+reverse", lambda a, wn=win: window_reverse(
            window_partition(a, (wn, wn)), (wn, wn), H, W), x)

        q = jnp.asarray(rng.random((nwb, l_full, HEADS, D), np.float32), DT)
        kp = jnp.asarray(rng.random((nwb, l_base, HEADS, D), np.float32), DT)
        t(f"win{win}: qk corr", lambda a, b: jnp.einsum("blhd,bmhd->bhlm", a, b), q, kp)
        corr = jnp.asarray(rng.random((nwb, HEADS, l_full, l_base), np.float32), DT)
        t(f"win{win}: corr@v", lambda a, b: jnp.einsum("bhlm,bmhd->blhd", a, b), corr, kp)

        qf = jnp.asarray(rng.random((nwb, l_full, C // 2), np.float32), DT)
        t(f"win{win}: csc qk+out", lambda a: jnp.einsum(
            "bcd,bld->blc", jnp.einsum("blc,bld->bcd", a, a) / l_full, a), qf)

        if r > 1:
            tt = jnp.asarray(rng.random((nwb, bwin, win // bwin, bwin, win // bwin,
                                         C // 2), np.float32), DT)
            pw = jnp.asarray(rng.random((win // bwin, win // bwin), np.float32), DT)
            t(f"win{win}: block pool", lambda a, b: jnp.einsum("byrxsc,rs->byxc", a, b),
              tt, pw)

        # bias: pos MLP + gather
        P = (2 * win - 1) ** 2
        rpe = jnp.asarray(rng.random((P, 2), np.float32), DT)
        w1 = jnp.asarray(rng.random((2, 11), np.float32), DT)
        w2 = jnp.asarray(rng.random((11, 11), np.float32), DT)
        w3 = jnp.asarray(rng.random((11, HEADS), np.float32), DT)
        idx = jnp.asarray(rng.integers(0, P, (l_full * l_base,)), jnp.int32)

        def bias_fn(rpe, w1, w2, w3, idx):
            pos = jax.nn.relu(jax.nn.relu(rpe @ w1) @ w2) @ w3
            return pos[idx].reshape(l_full, l_base, HEADS).transpose(2, 0, 1)

        t(f"win{win}: bias mlp+gather", bias_fn, rpe, w1, w2, w3, idx)


if __name__ == "__main__":
    main()
