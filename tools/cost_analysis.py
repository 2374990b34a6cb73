"""Dump XLA cost analysis for flagship tile forwards at several configs."""

import sys
import time

import numpy as np
import jax
import jax.numpy as jnp

jax.config.update("jax_compilation_cache_dir", "/root/repo/.jax_cache")
jax.config.update("jax_persistent_cache_min_compile_time_secs", 1.0)
sys.path.insert(0, "/root/repo")
from sisr_tpu.models.hit_sir_pro import HiTSIR, flagship_config  # noqa: E402


def analyze(name, model, shape):
    x = jnp.zeros(shape, jnp.float32)
    v = jax.eval_shape(lambda k: model.init(k, x), jax.random.PRNGKey(0))
    f = jax.jit(lambda v, x: model.apply(v, x).sum())
    compiled = f.lower(v, x).compile()
    ca = compiled.cost_analysis()
    if isinstance(ca, list):
        ca = ca[0]
    flops = ca.get("flops", 0)
    byts = ca.get("bytes accessed", 0)
    print(f"{name}: flops={flops/1e12:.3f}T bytes={byts/1e9:.2f}GB "
          f"arith_intensity={flops/max(byts,1):.1f}", flush=True)
    # top bytes categories
    for k in sorted(ca, key=lambda k: -ca[k])[:8]:
        print(f"    {k} = {ca[k]:.3e}", flush=True)


if __name__ == "__main__":
    analyze("flagship tile192 bf16", HiTSIR(**flagship_config(), dtype=jnp.bfloat16),
            (1, 192, 192, 3))
