"""Per-op TPU profile of the flagship tile forward.

Captures a jax.profiler trace and aggregates device-plane op durations from
the xplane protobuf (parsed with tensorflow's xplane_pb2 — no tensorboard
needed).  Prints the top-N ops by total self time.
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

LOGDIR = "/tmp/jaxtrace"


def capture(h: int = 192, w: int = 192):
    model = HiTSIR(**flagship_config(), dtype=jnp.bfloat16)
    x = jnp.asarray(np.random.default_rng(0).random((1, h, w, 3), np.float32))
    v = jax.jit(model.init)(jax.random.PRNGKey(0), x)
    f = jax.jit(lambda v, x: model.apply(v, x).sum())
    float(f(v, x))  # compile + warm
    jax.profiler.start_trace(LOGDIR)
    o = None
    for _ in range(3):
        o = f(v, x)
    float(o)
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
        n = name.lower()
        if "custom-call" in n or "pallas" in n:
            return "pallas-kernel"
        if n.startswith(("%copy", "copy")):
            return "copy"
        if n.startswith(("%slice", "slice", "%dynamic", "dynamic")):
            return "slice/gather"
        if "convolution" in n or n.startswith(("%conv", "conv")):
            return "convolution"
        if "fusion" in n:
            return "fusion"
        return "other"

    for plane in space.planes:
        if "TPU" not in plane.name and "/device" not in plane.name.lower():
            continue
        ev_meta = {m.id: (m.name, m.display_name) for m in plane.event_metadata.values()}
        totals = defaultdict(float)
        counts = defaultdict(int)
        cats = defaultdict(float)
        for line in plane.lines:
            if line.name != "XLA Ops":
                continue
            for ev in line.events:
                name, disp = ev_meta.get(ev.metadata_id, ("?", "?"))
                key = disp or name
                ms = ev.duration_ps / 1e9
                totals[key] += ms
                counts[key] += 1
                cats[category(name or disp)] += ms
        if not totals:
            continue
        print(f"== plane: {plane.name} (XLA Ops line) ==", flush=True)
        grand = sum(totals.values())
        print(f"total accounted: {grand/3:.1f} ms per run", flush=True)
        for c in sorted(cats, key=lambda k: -cats[k]):
            print(f"  category {c}: {cats[c]/3:.2f} ms", flush=True)
        for name in sorted(totals, key=lambda k: -totals[k])[:top]:
            print(f"{totals[name]/3:8.3f} ms  x{counts[name]//3:<4} {name[:110]}",
                  flush=True)
        break


def analyze_glue(top: int = 60):
    """Like analyze() but excludes pallas custom-call kernels: shows where
    the XLA glue time (fusions/copies/reshapes/converts) actually lives."""
    from tensorflow.tsl.profiler.protobuf import xplane_pb2

    paths = glob.glob(os.path.join(LOGDIR, "**", "*.xplane.pb"), recursive=True)
    path = max(paths, key=os.path.getmtime)
    space = xplane_pb2.XSpace()
    with open(path, "rb") as fh:
        space.ParseFromString(fh.read())
    for plane in space.planes:
        if "TPU" not in plane.name and "/device" not in plane.name.lower():
            continue
        ev_meta = {m.id: (m.name, m.display_name) for m in plane.event_metadata.values()}
        totals = defaultdict(float)
        counts = defaultdict(int)
        for line in plane.lines:
            if line.name != "XLA Ops":
                continue
            for ev in line.events:
                name, disp = ev_meta.get(ev.metadata_id, ("?", "?"))
                low = (name or "").lower()
                if "custom-call" in low or "pallas" in low:
                    continue
                key = disp or name
                totals[key] += ev.duration_ps / 1e9
                counts[key] += 1
        if not totals:
            continue
        grand = sum(totals.values())
        print(f"== XLA glue (non-kernel) total: {grand/3:.2f} ms per run ==", flush=True)
        for name in sorted(totals, key=lambda k: -totals[k])[:top]:
            print(f"{totals[name]/3:8.3f} ms  x{counts[name]//3:<4} {name[:120]}",
                  flush=True)
        break


if __name__ == "__main__":
    # usage: profile_tile.py [H W]  (e.g. 192 1920 for strip tiles)
    h = int(sys.argv[1]) if len(sys.argv) > 1 else 192
    w = int(sys.argv[2]) if len(sys.argv) > 2 else h
    capture(h, w)
    analyze()
    analyze_glue()
