"""Headline benchmark: x4 SR of a 1080p frame on one TPU chip.

North star (BASELINE.json / BASELINE.md): the PyTorch reference's target is a
1920x1080 frame through HiT-SIR-Pro x4 in <150 ms on a v5e chip, i.e. 13.8
processed (input) megapixels per second.  This benchmark runs the flagship
model (embed_dim 180, 6x6 depths, 10.2M params) in bfloat16 through the
overlap-tiled inference path and reports processed input MP/s.

Prints exactly one JSON line:
  {"metric": "...", "value": N, "unit": "...", "vs_baseline": N}
"""

from __future__ import annotations

import json
import os
import sys
import time

os.environ.setdefault("XLA_FLAGS", "")

BASELINE_MPS = 13.8  # 1920*1080 px / 150 ms (reference north-star)


def main():
    import numpy as np
    import jax
    import jax.numpy as jnp

    jax.config.update("jax_compilation_cache_dir",
                      os.path.join(os.path.dirname(__file__) or ".", ".jax_cache"))
    jax.config.update("jax_persistent_cache_min_compile_time_secs", 1.0)

    from sisr_tpu.models.hit_sir_pro import HiTSIR, flagship_config
    from sisr_tpu.parallel.tiling import BandedHeadSR, TiledSR

    h, w = 1080, 1920
    # "whole" = whole-image forward with the x4 head streamed over feature-row
    # bands (the reference's eval protocol; no overlap redundancy, 1 launch);
    # "tiled" = overlap-tiled strips
    mode = os.environ.get("BENCH_MODE", "whole")
    # "192" (square) or "192x1920" (strip tiles: full-width strips need no
    # horizontal overlap — 1920 = 10*192 is already a window-ladder multiple)
    tile_env = os.environ.get("BENCH_TILE", "192x1920")
    if "x" in tile_env:
        tile = tuple(int(v) for v in tile_env.split("x"))
        tile_h, tile_w = tile
    else:
        tile_h = tile_w = tile = int(tile_env)
    chunk = int(os.environ.get("BENCH_CHUNK", "1"))
    reps = int(os.environ.get("BENCH_REPS", "3"))
    # overlap 8 measured seam-parity-neutral vs 16 (tools/bench_overlap_quality.py:
    # 25.39 vs 25.13 dB against the whole-image forward, random-init worst case)
    overlap = int(os.environ.get("BENCH_OVERLAP", "8"))
    # bf16 blend canvas: ~54 dB quantization floor, above the 48 dB of the
    # uint8 serving output (use f32 for float-metric evals) — 2289 vs 2363 ms
    out_dt = {"f32": jnp.float32, "bf16": jnp.bfloat16}[
        os.environ.get("BENCH_OUT_DTYPE", "bf16")]

    model = HiTSIR(**flagship_config(), dtype=jnp.bfloat16)
    rng = jax.random.PRNGKey(0)
    variables = jax.jit(model.init)(rng, jnp.zeros((chunk, tile_h, tile_w, 3)))
    # pre-cast params: saves re-reading 41 MB of f32 weights per tile
    variables = jax.tree.map(lambda p: p.astype(jnp.bfloat16), variables)

    if mode == "whole":
        band = int(os.environ.get("BENCH_BAND_ROWS", "120"))
        align = int(os.environ.get("BENCH_ALIGN", "64"))
        runner = BandedHeadSR(model, band_rows=band, out_dtype=out_dt,
                              align=align)
    else:
        runner = TiledSR(lambda v, x: model.apply(v, x), scale=4, tile=tile,
                         overlap=overlap, chunk=chunk, out_dtype=out_dt)

    img = jnp.asarray(np.random.default_rng(0).random((h, w, 3), dtype=np.float32))
    img = jax.device_put(img)

    # compile + warmup
    out = runner(variables, img)
    out.block_until_ready()
    assert out.shape == (h * 4, w * 4, 3), out.shape

    times = []
    for _ in range(reps):
        t0 = time.perf_counter()
        runner(variables, img).block_until_ready()
        times.append(time.perf_counter() - t0)
    latency = min(times)

    mps = (h * w / 1e6) / latency
    record = {
        "metric": "hitsir_pro_x4_1080p_input_megapixels_per_sec",
        "value": round(mps, 3),
        "unit": "MP/s",
        "vs_baseline": round(mps / BASELINE_MPS, 3),
        "latency_ms": round(latency * 1e3, 1),
        "mode": mode,
        "dtype": "bfloat16",
        "device": str(jax.devices()[0]),
    }
    # report only the knobs of the path actually timed
    if mode == "whole":
        record.update({"band_rows": band, "align": align})
    else:
        record.update({"tile": tile_env, "chunk": chunk, "overlap": overlap})
    print(json.dumps(record))


if __name__ == "__main__":
    sys.exit(main())
