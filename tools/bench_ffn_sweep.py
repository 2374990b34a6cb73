"""FFN (htb_tail) kernel variant sweep at flagship shapes.

Chained device timing (tunnel-safe, n=30) of the standalone kernel at
(1, 192, 192, 180)x360.  Variants: row-tile th sweep + ablations that
subtract one stage (dwconv taps / gelus) to locate the in-kernel cost.
Ablations change semantics — timing only.
"""

import functools
import sys

import numpy as np
import jax
import jax.numpy as jnp

jax.config.update("jax_compilation_cache_dir", "/root/repo/.jax_cache")
jax.config.update("jax_persistent_cache_min_compile_time_secs", 1.0)
sys.path.insert(0, "/root/repo")

from tools.tpu_timer import device_time  # noqa: E402
import sisr_tpu.ops.pallas.ffn as F  # noqa: E402

DT = jnp.bfloat16
B, H, W, C = 1, 192, 192, 180
CH = 2 * C


def make_args(rng):
    def r(*s):
        return jnp.asarray(rng.random(s, np.float32), DT)
    return (r(B, H, W, C), r(B, H, W, C), r(C), r(C), r(C, CH), r(CH),
            r(5, 5, CH), r(CH), r(CH, C), r(C), r(C), r(C))


def run(label, fn, args, n=30):
    t = device_time(lambda *a: fn(*a).astype(jnp.float32).sum(), *args, n=n)
    print(f"{label}: {t*1e3:.3f} ms", flush=True)


def main():
    rng = np.random.default_rng(0)
    args = make_args(rng)

    orig_pick = F._pick_row_tile
    for th in (8, 16, 24, 32, 48):
        F._pick_row_tile = lambda h, itemsize=2, _th=th: _th if h % _th == 0 else 0
        run(f"th={th}", functools.partial(F._htb_tail_pallas), args)
    F._pick_row_tile = orig_pick

    # ablations at th=8: stub one stage at a time
    orig_gelu = F._gelu_kernel
    F._gelu_kernel = lambda x: x
    run("th=8 no-gelu", functools.partial(F._htb_tail_pallas), args)
    F._gelu_kernel = orig_gelu

    run("reference (XLA lowering)", F.htb_tail_reference, args)


if __name__ == "__main__":
    main()
