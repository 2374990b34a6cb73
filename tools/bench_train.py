"""Training-step throughput of the flagship model on the current device.

The reference trained at batch 2 / 64x64 LR crops, ~1,626 s per epoch on its
GPU (BASELINE.md).  This measures the jit-compiled train step (forward +
backward + Adam update) per optimizer step and projects an epoch time for
the same dataset sizes.
"""

import sys
import time

import numpy as np
import jax
import jax.numpy as jnp

jax.config.update("jax_compilation_cache_dir", "/root/repo/.jax_cache")
jax.config.update("jax_persistent_cache_min_compile_time_secs", 1.0)
sys.path.insert(0, "/root/repo")

from tools.tpu_timer import device_time  # noqa: E402
from sisr_tpu.models.hit_sir_pro import HiTSIR, flagship_config  # noqa: E402
from sisr_tpu.configs.model_config import get_optimizer  # noqa: E402
from sisr_tpu.train.losses import l1_loss  # noqa: E402
from sisr_tpu.train.train_state import create_train_state, make_train_step  # noqa: E402


def main(batch=2, crop=64, dtype="bfloat16"):
    model = HiTSIR(**flagship_config(), dtype=jnp.dtype(dtype))
    rng = np.random.default_rng(0)
    lr_imgs = jnp.asarray(rng.random((batch, crop, crop, 3), np.float32))
    hr_imgs = jnp.asarray(rng.random((batch, crop * 4, crop * 4, 3), np.float32))

    variables = jax.jit(model.init)(jax.random.PRNGKey(0), lr_imgs)
    tx = get_optimizer("Adam", 2e-5, {"weight_decay": 0, "betas": [0.9, 0.99]})
    state = create_train_state(variables["params"], tx)
    step = make_train_step(model.apply, l1_loss, tx)
    key = jax.random.PRNGKey(1)

    # compile
    t0 = time.perf_counter()
    state, loss = step(state, lr_imgs, hr_imgs, key)
    float(loss)
    compile_s = time.perf_counter() - t0

    def run_step(state):
        s2, l2 = step(state, lr_imgs, hr_imgs, key)
        return l2

    t = device_time(lambda s: run_step(s), state, n=10)
    print(f"train step (batch {batch}, crop {crop}, {dtype}): "
          f"{t*1e3:.1f} ms/step (compile {compile_s:.0f}s)", flush=True)
    # reference epoch: ~3,450 batches of 2 across its 5 train sets
    print(f"projected epoch (3450 steps): {t*3450:.0f} s "
          f"(reference GPU: ~1626 s)", flush=True)


if __name__ == "__main__":
    main()
