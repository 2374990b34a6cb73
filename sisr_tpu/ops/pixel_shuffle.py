"""Pixel (un)shuffle on NHWC with torch channel-ordering parity.

torch ``nn.PixelShuffle(r)`` maps NCHW channel ``c*r*r + i*r + j`` to spatial
offset (i, j) of output channel ``c``.  The reference uses it in both
pixel-shuffle reconstruction heads (models/hit_sir_pro.py:1024-1062); the
unshuffle mirrors utils/arch_util.py:10-26.
"""

from __future__ import annotations

import jax.numpy as jnp


def pixel_shuffle(x: jnp.ndarray, factor: int) -> jnp.ndarray:
    """(B, H, W, C*r^2) -> (B, H*r, W*r, C), torch channel order (C-major)."""
    b, h, w, crr = x.shape
    c = crr // (factor * factor)
    x = x.reshape(b, h, w, c, factor, factor)
    x = x.transpose(0, 1, 4, 2, 5, 3)  # b, h, r_i, w, r_j, c
    return x.reshape(b, h * factor, w * factor, c)


def pixel_shuffle_phase_major(x: jnp.ndarray, factor: int) -> jnp.ndarray:
    """(B, H, W, r^2*C) -> (B, H*r, W*r, C) with COLUMN-phase-major channels
    (channel = (j*r + i)*C + c for spatial offset (i, j)).  Internal layout
    of the packed upsample head (``NearestConvUp2(emit_packed=True)``):
    j-major lets the shuffled-input conv kernel interleave columns at
    2C=128 lanes (a supported Mosaic shape cast at C=64 bf16) and then
    split rows with aligned 64-lane slices — the direct (.., W, 2C) ->
    (.., 2W, C) cast is unsupported."""
    b, h, w, rrc = x.shape
    c = rrc // (factor * factor)
    x = x.reshape(b, h, w, factor, factor, c)  # b, h, w, r_j, r_i, c
    x = x.transpose(0, 1, 4, 2, 3, 5)          # b, h, r_i, w, r_j, c
    return x.reshape(b, h * factor, w * factor, c)


def pixel_unshuffle(x: jnp.ndarray, factor: int) -> jnp.ndarray:
    """(B, H*r, W*r, C) -> (B, H, W, C*r^2), inverse of pixel_shuffle."""
    b, hr, wr, c = x.shape
    h, w = hr // factor, wr // factor
    x = x.reshape(b, h, factor, w, factor, c)
    x = x.transpose(0, 1, 3, 5, 2, 4)  # b, h, w, c, r_i, r_j
    return x.reshape(b, h, w, c * factor * factor)
