"""Residual-dense super-resolution model for the ``DenseModelConfig`` surface.

The reference ships ``configs/dense_model_config.py`` (num_blocks,
skip_blocks, middle_channels, plus the HiT-SIR ablation flags
is_mult_size_conv_feat_extract / is_fusion / is_sa_attn) but no model
implementation.  This completes the surface with an RDN-style network that
reuses the framework's shared modules:

  shallow extract (MultipleSizeConvExtract or 3x3 conv) ->
  groups of dense blocks with optional long skips ->
  optional SpatialChannelAttention ->
  deep/shallow Fusion gate ->
  x`scale` pixel-shuffle reconstruction.
"""

from __future__ import annotations

from typing import Any, Optional, Sequence

import jax.numpy as jnp
from flax import linen as nn

from sisr_tpu.models.hit_sir_pro import (Fusion, MultipleSizeConvExtract,
                                         SpatialChannelAttention, _conv)
from sisr_tpu.ops.pixel_shuffle import pixel_shuffle

Dtype = Any


class DenseBlock(nn.Module):
    """Growth-concat dense block with local feature fusion + residual."""

    channels: int
    growth: int = 32
    layers: int = 4
    dtype: Dtype = jnp.float32

    @nn.compact
    def __call__(self, x):
        feats = [x]
        for i in range(self.layers):
            h = jnp.concatenate(feats, axis=-1)
            h = nn.leaky_relu(_conv(self.growth, 3, f"conv{i}", self.dtype)(h), 0.2)
            feats.append(h)
        fused = _conv(self.channels, 1, "lff", self.dtype)(
            jnp.concatenate(feats, axis=-1))
        return x + 0.2 * fused


class DenseSR(nn.Module):
    """RDN-style x`scale` SR; input NHWC in [0,1]."""

    is_sa_attn: bool = False
    is_fusion: bool = False
    is_mult_size_conv_feat_extract: bool = False
    num_blocks: Sequence[int] = (4, 4)
    skip_blocks: Optional[Sequence[int]] = None
    middle_channels: int = 64
    in_channel: int = 3
    scale: int = 4
    dtype: Dtype = jnp.float32

    @nn.compact
    def __call__(self, x, deterministic: bool = True):
        c = self.middle_channels
        x = x.astype(self.dtype)

        if self.is_mult_size_conv_feat_extract:
            shallow = MultipleSizeConvExtract(c, self.dtype, name="conv_first")(x)
        else:
            shallow = _conv(c, 3, "conv_first", self.dtype)(x)

        feat = shallow
        group_outputs = []
        for gi, blocks in enumerate(self.num_blocks):
            for bi in range(blocks):
                feat = DenseBlock(c, dtype=self.dtype,
                                  name=f"group{gi}_block{bi}")(feat)
            group_outputs.append(feat)
            if self.skip_blocks and gi in self.skip_blocks:
                feat = feat + shallow  # long skip at configured groups

        # global feature fusion over group outputs
        feat = _conv(c, 1, "gff1", self.dtype)(
            jnp.concatenate(group_outputs, axis=-1))
        feat = _conv(c, 3, "gff2", self.dtype)(feat)

        if self.is_sa_attn:
            feat = SpatialChannelAttention(c, self.dtype, name="sa_attn")(feat)

        if self.is_fusion:
            feat = Fusion(c, self.dtype, name="fusion")(feat, shallow)
        else:
            feat = feat + shallow

        up = _conv((self.scale ** 2) * self.in_channel, 3, "upsample", self.dtype)(feat)
        return pixel_shuffle(up, self.scale)
