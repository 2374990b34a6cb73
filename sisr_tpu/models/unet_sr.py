"""UNet super-resolution model for the ``UNetModelConfig`` surface.

The reference ships ``configs/unet_model_config.py`` (n_channels, ch_mults,
is_attn, n_blocks, n_heads — a DDPM-style UNet parameterization) but no
model implementation (SURVEY.md A8: "their model classes do not exist").
This completes the surface with a TPU-native flax UNet:

  shallow conv -> encoder (res blocks + optional self-attention, 2x down per
  stage) -> bottleneck -> decoder with skip concats -> x4 pixel-shuffle head,
  plus a global nearest-upsampled residual so the net learns the detail.
"""

from __future__ import annotations

from typing import Any, Sequence

import jax
import jax.numpy as jnp
from flax import linen as nn

from sisr_tpu.ops.pixel_shuffle import pixel_shuffle
from sisr_tpu.ops.resize import nearest_upsample

Dtype = Any


class ResBlock(nn.Module):
    features: int
    dtype: Dtype = jnp.float32

    @nn.compact
    def __call__(self, x):
        h = nn.GroupNorm(num_groups=8, dtype=self.dtype, name="norm1")(x)
        h = nn.swish(h)
        h = nn.Conv(self.features, (3, 3), padding=((1, 1), (1, 1)),
                    dtype=self.dtype, name="conv1")(h)
        h = nn.GroupNorm(num_groups=8, dtype=self.dtype, name="norm2")(h)
        h = nn.swish(h)
        h = nn.Conv(self.features, (3, 3), padding=((1, 1), (1, 1)),
                    dtype=self.dtype, name="conv2")(h)
        if x.shape[-1] != self.features:
            x = nn.Conv(self.features, (1, 1), dtype=self.dtype, name="skip")(x)
        return x + h


class SelfAttention2D(nn.Module):
    features: int
    num_heads: int = 1
    dtype: Dtype = jnp.float32

    @nn.compact
    def __call__(self, x):
        b, h, w, c = x.shape
        y = nn.GroupNorm(num_groups=8, dtype=self.dtype, name="norm")(x)
        y = y.reshape(b, h * w, c)
        y = nn.MultiHeadDotProductAttention(
            num_heads=self.num_heads, dtype=self.dtype, name="attn")(y, y)
        return x + y.reshape(b, h, w, c)


class UNetSR(nn.Module):
    """x4 SR UNet; input NHWC in [0,1]."""

    image_in_channels: int = 3
    n_channels: int = 64
    ch_mults: Sequence[int] = (1, 2, 1, 1)
    is_attn: Sequence[bool] = (True, True, True, True)
    n_blocks: int = 2
    n_heads: int = 1
    upscale: int = 4
    dtype: Dtype = jnp.float32

    @nn.compact
    def __call__(self, x, deterministic: bool = True):
        b, h, w, cin = x.shape
        base = nearest_upsample(x, self.upscale)

        feat = nn.Conv(self.n_channels, (3, 3), padding=((1, 1), (1, 1)),
                       dtype=self.dtype, name="conv_in")(x.astype(self.dtype))

        skips = [feat]
        # encoder: blocks at each resolution push skips; downsample after
        for si, mult in enumerate(self.ch_mults):
            ch = self.n_channels * mult
            for bi in range(self.n_blocks):
                feat = ResBlock(ch, self.dtype, name=f"down_{si}_{bi}")(feat)
                if self.is_attn[si]:
                    feat = SelfAttention2D(ch, self.n_heads, self.dtype,
                                           name=f"down_attn_{si}_{bi}")(feat)
                skips.append(feat)
            if si < len(self.ch_mults) - 1:
                feat = nn.Conv(ch, (3, 3), strides=(2, 2),
                               padding=((1, 1), (1, 1)), dtype=self.dtype,
                               name=f"down_sample_{si}")(feat)

        # bottleneck
        mid = self.n_channels * self.ch_mults[-1]
        feat = ResBlock(mid, self.dtype, name="mid_1")(feat)
        feat = SelfAttention2D(mid, self.n_heads, self.dtype, name="mid_attn")(feat)
        feat = ResBlock(mid, self.dtype, name="mid_2")(feat)

        # decoder: upsample into each stage, pop that stage's skips
        for si, mult in reversed(list(enumerate(self.ch_mults))):
            ch = self.n_channels * mult
            if si < len(self.ch_mults) - 1:
                feat = nn.ConvTranspose(ch, (4, 4), strides=(2, 2),
                                        padding="SAME", dtype=self.dtype,
                                        name=f"up_sample_{si}")(feat)
            for bi in range(self.n_blocks):
                skip = skips.pop()
                feat = jnp.concatenate([feat, skip], axis=-1)
                feat = ResBlock(ch, self.dtype, name=f"up_{si}_{bi}")(feat)
                if self.is_attn[si]:
                    feat = SelfAttention2D(ch, self.n_heads, self.dtype,
                                           name=f"up_attn_{si}_{bi}")(feat)

        feat = feat + nn.Conv(feat.shape[-1], (1, 1), dtype=self.dtype,
                              name="final_skip")(skips.pop())

        # reconstruction: conv -> pixel shuffle x4
        feat = nn.Conv((self.upscale ** 2) * cin, (3, 3), padding=((1, 1), (1, 1)),
                       dtype=self.dtype, name="conv_out")(nn.swish(feat))
        return base + pixel_shuffle(feat, self.upscale).astype(base.dtype)
