"""Whole-image flagship forward at large sizes (VERDICT r2 #6).

Round 3 banded the fused-Fusion maps kernel, lifting the old 640k-px area
cap: whole-image eval up to W=1920 now runs the full kernel set instead of
silently dropping Fusion to the toxic mixed kernel/XLA configuration.
This measures it: flagship whole-image forward at a given size vs the
equivalent tiled run.

Usage: python tools/bench_whole_image.py [H [W]]   (default 960x960)
"""

import os
import sys

import numpy as np
import jax
import jax.numpy as jnp

jax.config.update("jax_compilation_cache_dir", "/root/repo/.jax_cache")
jax.config.update("jax_persistent_cache_min_compile_time_secs", 1.0)
sys.path.insert(0, "/root/repo")

from sisr_tpu.models.hit_sir_pro import HiTSIR, flagship_config  # noqa: E402
from sisr_tpu.parallel.tiling import TiledSR  # noqa: E402
from tools.tpu_timer import device_time  # noqa: E402


def main():
    h = int(sys.argv[1]) if len(sys.argv) > 1 else 960
    w = int(sys.argv[2]) if len(sys.argv) > 2 else h
    m = HiTSIR(**flagship_config(), dtype=jnp.bfloat16)
    x = jnp.asarray(np.random.default_rng(0).random((1, h, w, 3), np.float32))
    v = jax.jit(m.init)(jax.random.PRNGKey(0), jnp.zeros((1, 192, 192, 3)))
    v = jax.tree.map(lambda p: p.astype(jnp.bfloat16), v)

    t_whole = device_time(lambda v, x: m.apply(v, x).sum(), v, x, n=4)
    print(f"whole {h}x{w}: {t_whole*1e3:.1f} ms", flush=True)

    runner = TiledSR(lambda vv, xx: m.apply(vv, xx), scale=4, tile=192,
                     overlap=8, chunk=1, out_dtype=jnp.bfloat16)
    img = x[0]
    out = runner(v, img)
    out.block_until_ready()
    import time
    ts = []
    for _ in range(3):
        t0 = time.perf_counter()
        runner(v, img).block_until_ready()
        ts.append(time.perf_counter() - t0)
    print(f"tiled {h}x{w} (192/8): {min(ts)*1e3:.1f} ms", flush=True)


if __name__ == "__main__":
    main()
