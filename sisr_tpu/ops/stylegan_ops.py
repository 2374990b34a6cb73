"""TPU-native equivalents of the bundled CUDA ops (SURVEY.md §2d).

The reference's toolkits ship three CUDA extensions for their StyleGAN2-class
models; none are reachable from the SR app, but they are part of the library
surface.  On TPU they are one-liners over XLA primitives:

* fused bias + LeakyReLU (BasicSR fused_act/src/fused_bias_act.cpp) — XLA
  fuses this chain anyway; provided for API parity.
* upfirdn2d (BasicSR upfirdn2d/src/upfirdn2d.cpp) — upsample, FIR filter,
  downsample in one ``lax.conv_general_dilated`` (lhs dilation = upsample,
  stride = downsample).
"""

from __future__ import annotations

from typing import Sequence, Tuple

import jax
import jax.numpy as jnp


def fused_bias_leaky_relu(x: jnp.ndarray, bias: jnp.ndarray,
                          negative_slope: float = 0.2,
                          scale: float = 2.0 ** 0.5) -> jnp.ndarray:
    """LeakyReLU(x + bias) * scale on NHWC input (bias over channels)."""
    return jax.nn.leaky_relu(x + bias, negative_slope) * scale


def upfirdn2d(x: jnp.ndarray, kernel: jnp.ndarray, up: int = 1, down: int = 1,
              pad: Tuple[int, int] = (0, 0)) -> jnp.ndarray:
    """Upsample by ``up`` (zero-stuffing), FIR-filter with ``kernel`` (2-D,
    applied depthwise), downsample by ``down``.  NHWC input.

    Bit-matches BasicSR's op (basicsr/ops/upfirdn2d/upfirdn2d.py:162-192):
    the reference stuffs ``up-1`` zeros AFTER each sample (so the upsampled
    map is ``in*up`` long — lhs dilation alone gives ``(in-1)*up+1``, hence
    the extra trailing pad) and convolves with the FLIPPED kernel
    (F.conv2d correlates, so the flip makes it a true convolution).
    """
    b, h, w, c = x.shape
    kh, kw = kernel.shape
    k = kernel[::-1, ::-1]
    k = jnp.broadcast_to(k[:, :, None, None].astype(x.dtype), (kh, kw, 1, c))
    pad0, pad1 = pad
    return jax.lax.conv_general_dilated(
        x, k,
        window_strides=(down, down),
        padding=((pad0, pad1 + up - 1), (pad0, pad1 + up - 1)),
        lhs_dilation=(up, up),
        feature_group_count=c,
        dimension_numbers=("NHWC", "HWIO", "NHWC"))
