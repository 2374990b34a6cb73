"""On-TPU kernel-path parity check: flagship bf16 forward (all Pallas
kernels on) vs the f32 CPU reference composition, one 192x192 tile.

Expect ~35 dB PSNR.  That is the TPU *backend* floor, not kernel drift:
the same bf16 model lowered pure-XLA on TPU (SISR_FUSED_*=0) measures
36.35 dB against the identical CPU-f32 oracle (bisected r3) because TPU
f32 matmuls take bf16 inputs by default, while the CPU-backend bf16 model
holds 44+ dB (tests/test_model_parity.py).  The Pallas kernels cost ~1 dB
vs same-backend XLA.  A kernel math bug shows up as a collapse well below
30 dB.  Run after any kernel change (TPU numerics are otherwise only
covered by the CPU-backend suite).

The f32 reference runs in a child process pinned to the CPU platform:
kernel-eligibility gates key on ``jax.default_backend()`` (process-wide
"tpu" under the axon plugin), so a same-process ``backend="cpu"`` jit
would trace Pallas calls into a CPU compilation and fail.
"""

import os
import subprocess
import sys

import numpy as np

sys.path.insert(0, "/root/repo")

_REF_NPZ = "/tmp/check_tpu_parity_ref.npz"


def cpu_reference(size: int):
    """Child-process entry (JAX_PLATFORMS handled below): f32 forward on CPU,
    params + output saved to _REF_NPZ."""
    import jax
    import jax.numpy as jnp

    jax.config.update("jax_platforms", "cpu")
    jax.config.update("jax_compilation_cache_dir", "/root/repo/.jax_cache")
    jax.config.update("jax_persistent_cache_min_compile_time_secs", 1.0)

    from sisr_tpu.models.hit_sir_pro import HiTSIR, flagship_config

    x_np = np.random.default_rng(0).random((1, size, size, 3), np.float32)
    m32 = HiTSIR(**flagship_config())
    v = jax.jit(m32.init)(jax.random.PRNGKey(0), jnp.zeros((1, 64, 64, 3)))
    y32 = np.asarray(jax.jit(m32.apply)(v, jnp.asarray(x_np)))

    leaves, treedef = jax.tree.flatten(v)
    np.savez(_REF_NPZ, y32=y32, x=x_np,
             **{f"p{i}": np.asarray(l) for i, l in enumerate(leaves)})
    print(f"cpu reference done: {y32.shape}")


def main():
    exact = "--exact" in sys.argv
    args = [a for a in sys.argv[1:] if not a.startswith("--")]
    size = int(args[0]) if args else 192

    subprocess.run(
        [sys.executable, __file__, str(size), "--cpu-ref"], check=True)
    ref = np.load(_REF_NPZ)

    import jax
    import jax.numpy as jnp

    jax.config.update("jax_compilation_cache_dir", "/root/repo/.jax_cache")
    jax.config.update("jax_persistent_cache_min_compile_time_secs", 1.0)

    from sisr_tpu.models.hit_sir_pro import HiTSIR, flagship_config

    tpu = jax.devices()[0]
    assert "TPU" in str(tpu), f"need a TPU device, got {tpu}"

    dt = jnp.float32 if exact else jnp.bfloat16
    model = HiTSIR(**flagship_config(), dtype=dt)
    # rebuild the param tree from the saved leaves (same treedef: same model)
    v_struct = jax.eval_shape(model.init, jax.random.PRNGKey(0),
                              jnp.zeros((1, 64, 64, 3)))
    treedef = jax.tree.structure(v_struct)
    leaves = [jnp.asarray(ref[f"p{i}"], dt)
              for i in range(treedef.num_leaves)]
    v = jax.device_put(jax.tree.unflatten(treedef, leaves), tpu)
    x = jax.device_put(jnp.asarray(ref["x"]), tpu)

    if exact:
        # the serving-quality precision mode (utils/precision.py): f32 +
        # matmul precision 'highest' + Pallas kernels off — demonstrates the
        # <0.05 dB metric-parity claim is achievable on-device
        from sisr_tpu.utils.precision import exact_eval
        with exact_eval():
            y = np.asarray(jax.jit(model.apply)(v, x).astype(jnp.float32))
    else:
        y = np.asarray(jax.jit(model.apply)(v, x).astype(jnp.float32))

    mse = float(np.mean((ref["y32"] - y) ** 2))
    psnr = 10 * np.log10(1.0 / max(mse, 1e-12))
    if exact:
        print(f"tpu-exact vs cpu-f32 PSNR @ {size}: {psnr:.1f} dB "
              f"(expect >=44; this is the eval_precision='exact' path)")
        assert psnr >= 44.0, psnr
    else:
        print(f"tpu-kernel vs cpu-f32 PSNR @ {size}: {psnr:.1f} dB "
              f"(expect ~35 = TPU backend floor; <32 = kernel math bug)")
        assert psnr >= 32.0, psnr


if __name__ == "__main__":
    if "--cpu-ref" in sys.argv:
        cpu_reference(int(sys.argv[1]))
    else:
        main()
