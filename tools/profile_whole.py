"""Per-op TPU profile of the whole-image banded-head 1080p frame.

Same xplane aggregation as profile_frame.py but over the BandedHeadSR
program bench.py now times by default (body whole, x4 head scanned over
feature-row bands).  Honors BENCH_BAND_ROWS/BENCH_ALIGN/BENCH_OUT_DTYPE.
"""

import glob
import os
import sys
from collections import defaultdict

import numpy as np
import jax
import jax.numpy as jnp

jax.config.update("jax_compilation_cache_dir", "/root/repo/.jax_cache")
jax.config.update("jax_persistent_cache_min_compile_time_secs", 1.0)
sys.path.insert(0, "/root/repo")

from sisr_tpu.models.hit_sir_pro import HiTSIR, flagship_config  # noqa: E402
from sisr_tpu.parallel.tiling import BandedHeadSR  # noqa: E402

LOGDIR = "/tmp/jaxtrace_whole"
N = 2


def capture():
    h, w = 1080, 1920
    band = int(os.environ.get("BENCH_BAND_ROWS", "120"))
    align = int(os.environ.get("BENCH_ALIGN", "64"))
    out_dt = {"f32": jnp.float32, "bf16": jnp.bfloat16}[
        os.environ.get("BENCH_OUT_DTYPE", "bf16")]
    model = HiTSIR(**flagship_config(), dtype=jnp.bfloat16)
    v = jax.jit(model.init)(jax.random.PRNGKey(0), jnp.zeros((1, 192, 192, 3)))
    v = jax.tree.map(lambda p: p.astype(jnp.bfloat16), v)
    runner = BandedHeadSR(model, band_rows=band, out_dtype=out_dt, align=align)
    img = jnp.asarray(np.random.default_rng(0).random((h, w, 3), np.float32))
    runner(v, img).block_until_ready()
    jax.profiler.start_trace(LOGDIR)
    o = None
    for _ in range(N):
        o = runner(v, img)
    o.block_until_ready()
    jax.profiler.stop_trace()


def analyze(top: int = 40):
    from tensorflow.tsl.profiler.protobuf import xplane_pb2

    paths = glob.glob(os.path.join(LOGDIR, "**", "*.xplane.pb"), recursive=True)
    assert paths, "no trace found"
    path = max(paths, key=os.path.getmtime)
    space = xplane_pb2.XSpace()
    with open(path, "rb") as fh:
        space.ParseFromString(fh.read())

    def category(name: str) -> str:
        base = name.split(".")[0].rstrip("0123456789_")
        if base.startswith(("blocks_", "correlation")):
            return "pallas:" + ("ffn" if base.startswith("blocks") else "scc")
        return base

    for plane in space.planes:
        if "TPU" not in plane.name:
            continue
        ev_meta = {m.id: (m.display_name or m.name)
                   for m in plane.event_metadata.values()}
        totals = defaultdict(float)
        counts = defaultdict(int)
        for line in plane.lines:
            if line.name != "XLA Ops":
                continue
            for ev in line.events:
                nm = ev_meta.get(ev.metadata_id, "?")
                totals[nm] += ev.duration_ps / 1e9 / N
                counts[nm] += 1
        grand = sum(totals.values())
        print(f"== frame device total: {grand:.1f} ms ==", flush=True)
        cats = defaultdict(float)
        ccnt = defaultdict(int)
        for nm, t in totals.items():
            cats[category(nm)] += t
            ccnt[category(nm)] += counts[nm]
        for k in sorted(cats, key=lambda k: -cats[k])[:25]:
            print(f"  {cats[k]:8.2f} ms  x{ccnt[k]//N:<6} {k}")
        print("-- top ops --")
        for k in sorted(totals, key=lambda k: -totals[k])[:top]:
            print(f"  {totals[k]:8.3f} ms  x{counts[k]//N:<5} {k}")


if __name__ == "__main__":
    capture()
    analyze()
