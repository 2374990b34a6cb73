"""Serving-path metric-delta check: eval_precision='fast' vs 'exact'.

The north-star claim (BASELINE.md:33, reference protocol
/root/reference/test_experiment.py:54-79) is about *metrics* on the serving
path: the bf16+kernels `fast` mode must score within 0.05 dB PSNR of the
f32 `exact` mode on the same images and weights.  Tensor-level agreement is
~35 dB (the TPU backend's bf16-matmul-input floor, see
tools/check_tpu_parity.py); this script measures what that does to
*eval metrics*, which is the claim that matters.

Protocol (mirrors experiments/experiment.py::eval at DIV2K-eval size):
fixed flagship weights (deterministic f32 init, shared by both modes),
N synthetic DIV2K-sized HR images (smooth low-pass fields — structured,
deterministic), LR = MATLAB bicubic /4 (ops/resize.py), SR = whole-image
forward on the TPU, metrics = Y-channel PSNR/SSIM vs HR exactly as the
runner computes them (experiment.py::_metrics_of).

Run on the real chip: `python tools/eval_precision_delta.py [n_imgs]`.
Writes a markdown table to stdout; paste into ARCHITECTURE.md.
"""

import sys

import numpy as np

sys.path.insert(0, "/root/repo")

import jax
import jax.numpy as jnp

jax.config.update("jax_compilation_cache_dir", "/root/repo/.jax_cache")
jax.config.update("jax_persistent_cache_min_compile_time_secs", 1.0)

from sisr_tpu.data.transforms import convert_image
from sisr_tpu.models.hit_sir_pro import HiTSIR, flagship_config
from sisr_tpu.ops.metrics import psnr as psnr_fn, ssim as ssim_fn
from sisr_tpu.ops.resize import imresize_matlab

# DIV2K_valid_HR-class size (reference eval set is ~2040x1356 HR -> /4 LR);
# one fixed shape so each mode compiles one program.
HR_H, HR_W = 2040, 1352


def smooth_hr(seed: int) -> np.ndarray:
    """Deterministic structured HR field in [0,1]: low-pass noise + tones."""
    rng = np.random.default_rng(seed)
    small = rng.random((HR_H // 8, HR_W // 8, 3)).astype(np.float32)
    img = jax.image.resize(jnp.asarray(small), (HR_H, HR_W, 3), "cubic")
    yy, xx = np.mgrid[0:HR_H, 0:HR_W].astype(np.float32)
    tones = (0.15 * np.sin(yy / 17.0 + seed)[..., None]
             + 0.15 * np.cos(xx / 23.0)[..., None])
    out = np.asarray(img) + tones + 0.05 * rng.standard_normal(
        (HR_H, HR_W, 3)).astype(np.float32)
    lo, hi = out.min(), out.max()
    return ((out - lo) / (hi - lo)).astype(np.float32)


def main():
    n = int(sys.argv[1]) if len(sys.argv) > 1 else 3
    tpu = jax.devices()[0]
    assert "TPU" in str(tpu).upper(), tpu

    # fixed f32 weights, shared by both modes (cast per mode)
    m32 = HiTSIR(**flagship_config())
    v32 = jax.jit(m32.init, backend="cpu")(
        jax.random.PRNGKey(0), jnp.zeros((1, 64, 64, 3)))

    hrs = [smooth_hr(i) for i in range(n)]
    lrs = [np.asarray(imresize_matlab(jnp.asarray(hr), 0.25),
                      np.float32) for hr in hrs]

    results = {}
    for mode in ("fast", "exact"):
        dt = jnp.bfloat16 if mode == "fast" else jnp.float32
        model = HiTSIR(**flagship_config(), dtype=dt)
        v = jax.device_put(jax.tree.map(lambda a: a.astype(dt), v32), tpu)
        fn = jax.jit(model.apply)
        rows = []
        for hr, lr in zip(hrs, lrs):
            x = jax.device_put(jnp.asarray(lr[None], dt), tpu)
            if mode == "exact":
                from sisr_tpu.utils.precision import exact_eval
                with exact_eval():
                    sr = np.asarray(fn(v, x).astype(jnp.float32))
            else:
                sr = np.asarray(fn(v, x).astype(jnp.float32))
            sr = np.clip(sr, 0, 1)[0]
            hr_y = convert_image(hr, source="[0,1]", target="y-channel")
            sr_y = convert_image(sr, source="[0,1]", target="y-channel")
            rows.append((psnr_fn(hr_y, sr_y, 1.0),
                         ssim_fn(hr_y, sr_y, 1.0, gaussian_weights=False)))
            print(f"  {mode} img{len(rows)-1}: psnr={rows[-1][0]:.4f} "
                  f"ssim={rows[-1][1]:.6f}", flush=True)
        results[mode] = rows

    print("\n| img | fast PSNR | exact PSNR | ΔPSNR (dB) | fast SSIM "
          "| exact SSIM | ΔSSIM |")
    print("|---|---|---|---|---|---|---|")
    dps, dss = [], []
    for i, (f, e) in enumerate(zip(results["fast"], results["exact"])):
        dp, ds = f[0] - e[0], f[1] - e[1]
        dps.append(dp)
        dss.append(ds)
        print(f"| {i} | {f[0]:.4f} | {e[0]:.4f} | {dp:+.4f} | "
              f"{f[1]:.6f} | {e[1]:.6f} | {ds:+.6f} |")
    print(f"\nmax |ΔPSNR| = {max(abs(d) for d in dps):.4f} dB "
          f"(claim: < 0.05); max |ΔSSIM| = {max(abs(d) for d in dss):.6f}")


if __name__ == "__main__":
    main()
