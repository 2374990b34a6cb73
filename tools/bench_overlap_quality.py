"""Seam-quality check: tiled flagship output vs whole-image forward.

Random-init flagship is the worst case for seam context sensitivity
(trained models seam far less — tests/test_tiling.py).  Prints PSNR of the
tiled result against the whole-image forward for several overlaps.
"""

import sys

import numpy as np
import jax
import jax.numpy as jnp

jax.config.update("jax_compilation_cache_dir", "/root/repo/.jax_cache")
jax.config.update("jax_persistent_cache_min_compile_time_secs", 1.0)
sys.path.insert(0, "/root/repo")

from sisr_tpu.models.hit_sir_pro import HiTSIR, flagship_config  # noqa: E402
from sisr_tpu.parallel.tiling import TiledSR  # noqa: E402
from sisr_tpu.ops.metrics import psnr  # noqa: E402


def main():
    model = HiTSIR(**flagship_config(), dtype=jnp.bfloat16)
    size = 384  # 2x2-ish tiles of 192 -> real seams in both axes
    img = jnp.asarray(np.random.default_rng(0).random((size, size, 3),
                                                      dtype=np.float32))
    v = jax.jit(model.init)(jax.random.PRNGKey(0), img[None])
    v = jax.tree.map(lambda p: p.astype(jnp.bfloat16), v)

    whole = np.asarray(model.apply(v, img[None])[0], np.float32)
    rng_range = float(whole.max() - whole.min())
    for ov in (16, 8, 4):
        runner = TiledSR(lambda v, x: model.apply(v, x), scale=4, tile=192,
                         overlap=ov, out_dtype=jnp.float32)
        tiled = np.asarray(runner(v, img), np.float32)
        print(f"overlap {ov}: PSNR(tiled, whole) = "
              f"{psnr(tiled, whole, data_range=rng_range):.2f} dB", flush=True)


if __name__ == "__main__":
    main()
