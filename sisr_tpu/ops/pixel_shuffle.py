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


def pixel_unshuffle(x: jnp.ndarray, factor: int) -> jnp.ndarray:
    """(B, H*r, W*r, C) -> (B, H, W, C*r^2), inverse of pixel_shuffle."""
    b, hr, wr, c = x.shape
    h, w = hr // factor, wr // factor
    x = x.reshape(b, h, factor, w, factor, c)
    x = x.transpose(0, 1, 3, 5, 2, 4)  # b, h, w, c, r_i, r_j
    return x.reshape(b, h, w, c * factor * factor)
