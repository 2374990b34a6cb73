"""Tunnel-safe TPU timing — thin re-export of the library implementation.

Single source of truth: ``sisr_tpu.utils.profiling.device_time`` (chain N
executions, fetch once; the axon tunnel adds ~30 ms per synchronous fetch so
single-call timing is meaningless).
"""

import sys
from pathlib import Path

sys.path.insert(0, str(Path(__file__).resolve().parents[1]))

from sisr_tpu.utils.profiling import device_time  # noqa: F401
