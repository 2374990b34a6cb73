"""Dormant-but-public architecture utilities (reference utils/arch_util.py).

The reference keeps these as library surface even though HiT-SIR-Pro doesn't
import them (utils/arch_util.py:10-123): pixel_unshuffle, default-scaled
residual blocks, layer stacking, and a pixel-shuffle upsampler.  Provided
here as flax equivalents for the same downstream uses (EDSR/RCAN-style CNNs).
"""

from __future__ import annotations

import math
from typing import Any, Callable, Sequence

import jax
import jax.numpy as jnp
from flax import linen as nn

from sisr_tpu.ops.pixel_shuffle import pixel_shuffle, pixel_unshuffle  # noqa: F401 (re-export)

Dtype = Any


def scaled_kaiming_init(scale: float = 0.1):
    """Kaiming-normal init scaled down (reference arch_util.py:29-57's
    default_init_weights) — stabilizes deep residual CNN stacks."""
    base = nn.initializers.kaiming_normal()

    def init(key, shape, dtype=jnp.float32):
        return base(key, shape, dtype) * scale

    return init


class ResidualBlockNoBN(nn.Module):
    """conv3x3 -> ReLU -> conv3x3, residual, optional res_scale
    (reference arch_util.py:76-101)."""

    num_feat: int = 64
    res_scale: float = 1.0
    dtype: Dtype = jnp.float32

    @nn.compact
    def __call__(self, x: jnp.ndarray) -> jnp.ndarray:
        y = nn.Conv(self.num_feat, (3, 3), padding=((1, 1), (1, 1)),
                    kernel_init=scaled_kaiming_init(0.1), dtype=self.dtype,
                    name="conv1")(x)
        y = nn.relu(y)
        y = nn.Conv(self.num_feat, (3, 3), padding=((1, 1), (1, 1)),
                    kernel_init=scaled_kaiming_init(0.1), dtype=self.dtype,
                    name="conv2")(y)
        return x + y * self.res_scale


def make_layer(block_cls: Callable, num_blocks: int, **kwargs) -> nn.Module:
    """Sequentially stacked blocks (reference arch_util.py:60-73)."""

    class Stack(nn.Module):
        @nn.compact
        def __call__(self, x):
            for i in range(num_blocks):
                x = block_cls(**kwargs, name=f"block_{i}")(x)
            return x

    return Stack()


class Upsample(nn.Module):
    """Pixel-shuffle upsampler: (conv -> shuffle) per 2x stage, or one 3x
    stage (reference arch_util.py:104-123)."""

    scale: int
    num_feat: int
    dtype: Dtype = jnp.float32

    @nn.compact
    def __call__(self, x: jnp.ndarray) -> jnp.ndarray:
        if (self.scale & (self.scale - 1)) == 0:
            for i in range(int(math.log2(self.scale))):
                x = nn.Conv(4 * self.num_feat, (3, 3), padding=((1, 1), (1, 1)),
                            dtype=self.dtype, name=f"conv{i}")(x)
                x = pixel_shuffle(x, 2)
        elif self.scale == 3:
            x = nn.Conv(9 * self.num_feat, (3, 3), padding=((1, 1), (1, 1)),
                        dtype=self.dtype, name="conv0")(x)
            x = pixel_shuffle(x, 3)
        else:
            raise ValueError(f"unsupported scale {self.scale} (2^n or 3)")
        return x
