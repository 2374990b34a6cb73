"""A/B: flagship 192-tile forward with/without the fused Pallas kernels."""

import os
import sys
import traceback

import numpy as np
import jax
import jax.numpy as jnp

jax.config.update("jax_compilation_cache_dir", "/root/repo/.jax_cache")
jax.config.update("jax_persistent_cache_min_compile_time_secs", 1.0)

sys.path.insert(0, "/root/repo")
from sisr_tpu.models.hit_sir_pro import HiTSIR, flagship_config  # noqa: E402
from tools.tpu_timer import device_time  # noqa: E402

tile = int(sys.argv[1]) if len(sys.argv) > 1 else 192
combos = sys.argv[2].split(",") if len(sys.argv) > 2 else ["11", "01", "10", "00"]
model = HiTSIR(**flagship_config(), dtype=jnp.bfloat16)
x = jnp.asarray(np.random.default_rng(0).random((1, tile, tile, 3), np.float32))
v = jax.jit(model.init)(jax.random.PRNGKey(0), x)
v = jax.tree.map(lambda p: p.astype(jnp.bfloat16), v)

for combo in combos:
    ffn, scc = combo[0], combo[1]
    os.environ["SISR_FUSED_FFN"] = ffn
    os.environ["SISR_FUSED_SCC"] = scc
    try:
        t = device_time(lambda v, x: model.apply(v, x).sum(), v, x, n=10)
        print(f"FFN={ffn} SCC={scc}: {t*1e3:.1f} ms/tile", flush=True)
    except Exception:
        print(f"FFN={ffn} SCC={scc}: FAILED", flush=True)
        traceback.print_exc()
