"""Micro-benchmark: flagship tile forward variants on the current device.

Usage: python tools/bench_tile.py [tile] [reps]
"""

import sys
import time

import numpy as np
import jax
import jax.numpy as jnp

jax.config.update("jax_compilation_cache_dir", "/root/repo/.jax_cache")
jax.config.update("jax_persistent_cache_min_compile_time_secs", 1.0)

sys.path.insert(0, "/root/repo")
from sisr_tpu.models.hit_sir_pro import HiTSIR, flagship_config  # noqa: E402


def bench(name, model, shape, reps=4):
    from tools.tpu_timer import device_time

    x = jnp.asarray(np.random.default_rng(0).random(shape, np.float32))
    v = jax.jit(model.init)(jax.random.PRNGKey(0), x)
    t = device_time(lambda v, x: model.apply(v, x).sum(), v, x, n=10)
    print(f"{name}: {t*1e3:.1f} ms/call", flush=True)
    return t


if __name__ == "__main__":
    tile = int(sys.argv[1]) if len(sys.argv) > 1 else 192
    shape = (1, tile, tile, 3)
    bench(f"tile{tile}", HiTSIR(**flagship_config(), dtype=jnp.bfloat16), shape)
    bench(f"tile{tile} noSCA",
          HiTSIR(**flagship_config(is_channel_spatial_attn=False), dtype=jnp.bfloat16), shape)
    bench(f"tile{tile} nofuse-nomsce",
          HiTSIR(**flagship_config(is_fusion=False, is_mult_size_conv_feat_extract=False),
                 dtype=jnp.bfloat16), shape)
    bench(f"tile{tile} 1stage",
          HiTSIR(**flagship_config(depths=(6,), num_heads=(6,)), dtype=jnp.bfloat16), shape)
    bench(f"tile{tile} mlp1",
          HiTSIR(**flagship_config(mlp_ratio=1.0), dtype=jnp.bfloat16), shape)
    bench(f"tile{tile} head-psd",
          HiTSIR(**flagship_config(upsampler="pixelshuffledirect"), dtype=jnp.bfloat16), shape)
    # per-window cost: single stage of 6 identical-window blocks
    for r in (0.5, 1, 2, 4, 6, 8):
        bench(f"tile{tile} 6x win{int(8*r)}",
              HiTSIR(**flagship_config(depths=(6,), num_heads=(6,),
                                       hier_win_ratios=(r,) * 6,
                                       is_fusion=False,
                                       is_mult_size_conv_feat_extract=False,
                                       upsampler="pixelshuffledirect"),
                     dtype=jnp.bfloat16), shape)
