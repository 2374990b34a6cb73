"""Exact-precision evaluation mode.

The TPU backend's f32 matmuls take bf16 *inputs* by default, capping
whole-model agreement with an f32 oracle at ~35 dB PSNR even when every
tensor is nominally float32 (measured: tools/check_tpu_parity.py).  Metric-
level parity claims (<0.05 dB vs reference checkpoints — BASELINE.md north
star) therefore need an explicit high-precision eval path:

  * ``jax.default_matmul_precision("highest")`` — six-pass bf16 expansion,
    true f32 matmul/conv results on the MXU;
  * float32 params and activations;
  * Pallas kernels disabled (the serving kernels are bf16-layout designs;
    exact mode is a quality/verification path where XLA's f32 lowering is
    the reference semantics).

Use ``exact_eval()`` as a context manager around *tracing* of an eval
function (the first call of a jitted fn); re-wrapping every call is safe
and cheap.

Single-threaded use only: the kernel gates are process-global environment
variables read at trace time, so any *other* trace running concurrently or
interleaved inside the context (e.g. a train-step compile between eval
batches) would silently bake in kernels-off, and nested ``exact_eval()``
blocks restore stale values on exit.  Trace train steps before entering, or
after leaving, the context.  (The gates stay env-vars deliberately: they
must also be settable from the shell for A/B tooling.)
"""

from __future__ import annotations

import os
from contextlib import contextmanager

import jax

# the trace-time gates of every Pallas kernel (models/hit_sir_pro.py)
_KERNEL_GATES = ("SISR_FUSED_CONV", "SISR_FUSED_SCC", "SISR_FUSED_FFN",
                 "SISR_FUSED_UA", "SISR_SHUF_CONV", "SISR_FUSED_TAIL")


@contextmanager
def exact_eval():
    """Trace eval code with f32-exact matmuls and Pallas kernels off."""
    old = {k: os.environ.get(k) for k in _KERNEL_GATES}
    for k in _KERNEL_GATES:
        os.environ[k] = "0"
    try:
        with jax.default_matmul_precision("highest"):
            yield
    finally:
        for k, v in old.items():
            if v is None:
                os.environ.pop(k, None)
            else:
                os.environ[k] = v
