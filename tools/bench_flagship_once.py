"""One-shot flagship tile timing (whole-model, tunnel-amortized).

Usage: python tools/bench_flagship_once.py [label]
Prints: "<label>: N ms/call".  Respects SISR_* env knobs, so use it for
kernel A/B sweeps at the whole-model level (the only reliable granularity
through the tunnel — see CLAUDE.md).
"""

import sys

import numpy as np
import jax
import jax.numpy as jnp

jax.config.update("jax_compilation_cache_dir", "/root/repo/.jax_cache")
jax.config.update("jax_persistent_cache_min_compile_time_secs", 1.0)
sys.path.insert(0, "/root/repo")

from sisr_tpu.models.hit_sir_pro import HiTSIR, flagship_config  # noqa: E402
from tools.tpu_timer import device_time  # noqa: E402


def main():
    label = sys.argv[1] if len(sys.argv) > 1 else "tile192"
    m = HiTSIR(**flagship_config(), dtype=jnp.bfloat16)
    x = jnp.asarray(np.random.default_rng(0).random((1, 192, 192, 3), np.float32))
    v = jax.jit(m.init)(jax.random.PRNGKey(0), x)
    t = device_time(lambda v, x: m.apply(v, x).sum(), v, x, n=10)
    print(f"{label}: {t*1e3:.2f} ms/call", flush=True)


if __name__ == "__main__":
    main()
