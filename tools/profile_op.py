"""Trace-profile a single op/kernel: exact device-side durations.

Unlike wall-clock micro-timing (unreliable through the axon tunnel), the
xplane trace records per-op device durations exactly.  Runs the callable N
times inside one trace and prints total device ms per op name.

Usage (library):
    from tools.profile_op import profile_call
    profile_call(fn, *args, n=20)
"""

import glob
import os
import sys
from collections import defaultdict

import jax

jax.config.update("jax_compilation_cache_dir", "/root/repo/.jax_cache")
jax.config.update("jax_persistent_cache_min_compile_time_secs", 1.0)
sys.path.insert(0, "/root/repo")

LOGDIR = "/tmp/jaxtrace_op"


def profile_call(fn, *args, n: int = 20, top: int = 15):
    """jit + warm fn(*args), trace n calls, print device op totals / n."""
    f = jax.jit(fn)
    jax.block_until_ready(f(*args))
    jax.profiler.start_trace(LOGDIR)
    out = None
    for _ in range(n):
        out = f(*args)
    jax.block_until_ready(out)
    jax.profiler.stop_trace()
    return analyze(n, top)


def analyze(n: int, top: int = 15):
    from tensorflow.tsl.profiler.protobuf import xplane_pb2

    path = max(glob.glob(os.path.join(LOGDIR, "**", "*.xplane.pb"),
                         recursive=True), key=os.path.getmtime)
    space = xplane_pb2.XSpace()
    with open(path, "rb") as fh:
        space.ParseFromString(fh.read())
    for plane in space.planes:
        if "TPU" not in plane.name:
            continue
        ev_meta = {m.id: (m.display_name or m.name)
                   for m in plane.event_metadata.values()}
        totals = defaultdict(float)
        for line in plane.lines:
            if line.name != "XLA Ops":
                continue
            for ev in line.events:
                totals[ev_meta.get(ev.metadata_id, "?")] += ev.duration_ps / 1e9
        grand = sum(totals.values())
        print(f"device total: {grand/n:.4f} ms/call over {n} calls", flush=True)
        for k in sorted(totals, key=lambda k: -totals[k])[:top]:
            print(f"  {totals[k]/n:8.4f} ms  {k[:100]}", flush=True)
        return grand / n
    return None
