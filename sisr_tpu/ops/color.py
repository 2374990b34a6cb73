"""Color-space conversions and input normalization.

Parity targets:
* Y-channel conversion — reference utils/utils.py:170-186
  (ITU-R BT.601 luma on [0,1] RGB: ``16/255 + (65.738R + 129.057G + 25.064B)/256``).
* RGB mean normalization — reference models/hit_sir_pro.py:1126-1131,1310-1311
  (ImageNet-ish mean (0.485, 0.456, 0.4060), scaled by img_range).
"""

from __future__ import annotations

import jax.numpy as jnp

IMAGENET_ISH_RGB_MEAN = (0.485, 0.456, 0.4060)

_Y_WEIGHTS = (65.738 / 256.0, 129.057 / 256.0, 25.064 / 256.0)
_Y_OFFSET = 16.0 / 255.0


def rgb_to_y(img: jnp.ndarray, channel_axis: int = -1) -> jnp.ndarray:
    """YCbCr luma (Y) of a [0,1] RGB image; channel axis is removed.

    Works for numpy or jax arrays of any rank.
    """
    r = jnp.take(img, 0, axis=channel_axis)
    g = jnp.take(img, 1, axis=channel_axis)
    b = jnp.take(img, 2, axis=channel_axis)
    return _Y_OFFSET + _Y_WEIGHTS[0] * r + _Y_WEIGHTS[1] * g + _Y_WEIGHTS[2] * b


def normalize_rgb(x: jnp.ndarray, img_range: float = 1.0) -> jnp.ndarray:
    """(x - rgb_mean) * img_range on NHWC input."""
    mean = jnp.asarray(IMAGENET_ISH_RGB_MEAN, dtype=x.dtype)
    return (x - mean) * img_range


def denormalize_rgb(x: jnp.ndarray, img_range: float = 1.0) -> jnp.ndarray:
    """x / img_range + rgb_mean on NHWC input."""
    mean = jnp.asarray(IMAGENET_ISH_RGB_MEAN, dtype=x.dtype)
    return x / img_range + mean
