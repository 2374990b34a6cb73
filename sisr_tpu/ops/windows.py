"""Window partition / reverse and pad-to-multiple for NHWC feature maps.

Behavioral parity with reference models/hit_sir_pro.py:236-271 (partition /
reverse) and :664-674 (reflect pad to a window multiple).  All shapes are
static under jit, so the pad amounts fold into the compiled program.
"""

from __future__ import annotations

from typing import Tuple

import jax.numpy as jnp


def window_partition(x: jnp.ndarray, window: Tuple[int, int]) -> jnp.ndarray:
    """(B, H, W, C) -> (B * nWindows, wh * ww, C); H % wh == 0, W % ww == 0."""
    b, h, w, c = x.shape
    wh, ww = window
    x = x.reshape(b, h // wh, wh, w // ww, ww, c)
    x = x.transpose(0, 1, 3, 2, 4, 5)
    return x.reshape(-1, wh * ww, c)


def window_reverse(windows: jnp.ndarray, window: Tuple[int, int], h: int, w: int) -> jnp.ndarray:
    """(B * nWindows, wh * ww, C) -> (B, H, W, C)."""
    wh, ww = window
    c = windows.shape[-1]
    b = windows.shape[0] * wh * ww // (h * w)
    x = windows.reshape(b, h // wh, w // ww, wh, ww, c)
    x = x.transpose(0, 1, 3, 2, 4, 5)
    return x.reshape(b, h, w, c)


def pad_to_multiple(x: jnp.ndarray, window: Tuple[int, int], mode: str = "reflect") -> jnp.ndarray:
    """Reflect-pad the bottom/right of (B, H, W, C) so H, W divide the window.

    torch ``F.pad(..., 'reflect')`` parity: reflection excludes the edge pixel.
    """
    _, h, w, _ = x.shape
    pad_h = (window[0] - h % window[0]) % window[0]
    pad_w = (window[1] - w % window[1]) % window[1]
    if pad_h == 0 and pad_w == 0:
        return x
    return jnp.pad(x, ((0, 0), (0, pad_h), (0, pad_w), (0, 0)), mode=mode)
