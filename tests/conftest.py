"""Test configuration: force an 8-device CPU mesh before jax initializes.

Multi-device sharding tests (DP training step, tile-sharded inference) run on
virtual CPU devices — this closes the reference's distributed-testing gap
(it had none; see SURVEY.md §4).
"""

import os
import sys
from pathlib import Path

os.environ.setdefault("JAX_PLATFORMS", "cpu")
flags = os.environ.get("XLA_FLAGS", "")
if "xla_force_host_platform_device_count" not in flags:
    os.environ["XLA_FLAGS"] = (flags + " --xla_force_host_platform_device_count=8").strip()

sys.path.insert(0, str(Path(__file__).resolve().parents[1]))

# Persistent XLA compilation cache: model-graph compiles dominate test time on
# the 1-core CI host; cached executables make re-runs near-instant.
import jax  # noqa: E402

# The axon TPU plugin prepends itself to jax_platforms at import, overriding
# the JAX_PLATFORMS env var — force the CPU backend explicitly so tests run
# locally (and deterministically in fp32, not via the TPU tunnel).
jax.config.update("jax_platforms", "cpu")

jax.config.update("jax_compilation_cache_dir",
                  str(Path(__file__).resolve().parents[1] / ".jax_cache"))
jax.config.update("jax_persistent_cache_min_compile_time_secs", 1.0)
jax.config.update("jax_persistent_cache_min_entry_size_bytes", 0)
