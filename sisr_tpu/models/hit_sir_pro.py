"""HiT-SIR-Pro — hierarchical-window spatial+channel self-correlation SR transformer.

TPU-native (flax/NHWC/static-shape) re-design of the reference model
(reference models/hit_sir_pro.py:1065-1344).  Behavioral parity notes are
cited per module; the architecture is:

  input (B,H,W,3) in [0,1]
    -> mean-subtract (ImageNet-ish RGB mean, hit_sir_pro.py:1126-1131)
    -> shallow extract: MultipleSizeConvExtract (parallel 3/5/7/9 convs with
       sigmoid gating, :49-100) or a single 3x3 conv
    -> deep extract: num_layers x RHTB, each = depth x HierarchicalTransformerBlock
       with per-block window sizes base_win * hier_win_ratios[i] (:802-817),
       followed by 3x3 conv + residual (:928-936); final LayerNorm (:1299)
    -> fusion gate between deep and shallow streams (UnionAttention x3, :136-162)
    -> reconstruction head: pixelshuffle / pixelshuffledirect / nearest+conv /
       denoise (:1235-1262)
    -> mean add-back, crop to (H*scale, W*scale) (:1342-1344)

Design differences from the reference (deliberate, TPU-first):
  * NHWC everywhere (TPU conv layout); (B,L,C) token views are replaced by
    (B,H,W,C) carries — LayerNorm/MLP act on the trailing C so semantics are
    identical, but no permutes are materialized.
  * All shapes static under jit: reflect-padding to window multiples
    (reference :664-674) becomes a trace-time constant per input shape.
  * Relative-position bias tables and pooled-bias index maps are built in
    numpy at trace time and constant-folded by XLA.
  * Compute dtype is a knob (`dtype`); params stay float32.

Weight parity with torch checkpoints is provided by
``sisr_tpu.models.torch_port.convert_hit_sir_state_dict``.
"""

from __future__ import annotations

from functools import lru_cache
from typing import Any, Sequence, Tuple

import numpy as np
import jax
import jax.numpy as jnp
from flax import linen as nn

from sisr_tpu.ops.color import IMAGENET_ISH_RGB_MEAN
from sisr_tpu.ops.pixel_shuffle import pixel_shuffle
from sisr_tpu.ops.resize import nearest_upsample
from sisr_tpu.ops.windows import pad_to_multiple, window_partition, window_reverse

Dtype = Any


def _gelu(x):
    # torch nn.GELU() default is the exact erf formulation.
    return nn.gelu(x, approximate=False)


def _conv(features: int, kernel: int, name: str, dtype: Dtype, use_bias: bool = True,
          feature_group_count: int = 1) -> nn.Conv:
    """3x3-style conv with torch padding=k//2 semantics (odd k, stride 1)."""
    pad = kernel // 2
    return nn.Conv(
        features=features,
        kernel_size=(kernel, kernel),
        padding=((pad, pad), (pad, pad)),
        use_bias=use_bias,
        feature_group_count=feature_group_count,
        dtype=dtype,
        name=name,
    )


def _use_conv_kernel(h: int, w: int = 192, cin: int = 180,
                     cout: int = 180) -> bool:
    import os
    from sisr_tpu.ops.pallas.conv3x3 import supports_shape
    return (jax.default_backend() == "tpu" and supports_shape(h, w, cin, cout)
            and os.environ.get("SISR_FUSED_CONV", "1") == "1")


def _use_shuffled_conv(hout: int, wout: int, cin: int,
                       cout: int | None = None) -> bool:
    import os
    from sisr_tpu.ops.pallas.conv3x3 import _pick_row_tile
    th = _pick_row_tile(hout, wout, cin, cout if cout is not None else cin)
    return (jax.default_backend() == "tpu" and th > 0 and th % 2 == 0
            and os.environ.get("SISR_FUSED_CONV", "1") == "1"
            and os.environ.get("SISR_SHUF_CONV", "1") == "1")


class ShuffledConv3x3(nn.Module):
    """conv3x3 over the phase-major pixel shuffle of a packed 4F-channel
    input, unpacked in VMEM (ops/pallas/conv3x3.py::conv3x3_shuffled);
    params match nn.Conv on the shuffled (F-channel) input."""

    features: int
    act: str = "none"
    dtype: Dtype = jnp.float32

    @nn.compact
    def __call__(self, yp: jnp.ndarray) -> jnp.ndarray:
        from sisr_tpu.ops.pallas.conv3x3 import conv3x3_shuffled

        cin = yp.shape[-1] // 4
        kernel = self.param("kernel", nn.initializers.lecun_normal(),
                            (3, 3, cin, self.features))
        bias = self.param("bias", nn.initializers.zeros, (self.features,))
        return conv3x3_shuffled(
            yp, kernel.astype(self.dtype), bias.astype(self.dtype), self.act,
            _use_shuffled_conv(2 * yp.shape[1], 2 * yp.shape[2], cin))


class FusedConv3x3(nn.Module):
    """3x3 same-conv (+optional residual / leaky) routed through the Pallas
    band kernel on TPU (ops/pallas/conv3x3.py); params match nn.Conv."""

    features: int
    act: str = "none"
    dtype: Dtype = jnp.float32

    @nn.compact
    def __call__(self, y: jnp.ndarray, res: jnp.ndarray | None = None) -> jnp.ndarray:
        from sisr_tpu.ops.pallas.conv3x3 import conv3x3

        kernel = self.param("kernel", nn.initializers.lecun_normal(),
                            (3, 3, y.shape[-1], self.features))
        bias = self.param("bias", nn.initializers.zeros, (self.features,))
        return conv3x3(y, res, kernel.astype(self.dtype),
                       bias.astype(self.dtype), self.act,
                       _use_conv_kernel(y.shape[1], y.shape[2], y.shape[-1],
                                        self.features))


def _layer_norm(name: str, dtype: Dtype) -> nn.LayerNorm:
    # torch nn.LayerNorm eps default 1e-5 (flax default is 1e-6).
    return nn.LayerNorm(epsilon=1e-5, dtype=dtype, name=name)


class Conv2dParams(nn.Module):
    """Conv parameter container with nn.Conv names/shapes (kernel HWIO)."""

    kernel_size: int
    features_in: int
    features_out: int

    @nn.compact
    def __call__(self):
        k = self.kernel_size
        kernel = self.param("kernel", nn.initializers.lecun_normal(),
                            (k, k, self.features_in, self.features_out))
        bias = self.param("bias", nn.initializers.zeros, (self.features_out,))
        return kernel, bias


class MultipleSizeConvExtract(nn.Module):
    """Multi-kernel-size shallow feature extraction (reference :49-100).

    Four parallel convs (k=3,5,7,9) on the RGB input, each gated by
    ``sigmoid(conv1x1(x) * conv_k(x))`` with a residual, concatenated and
    projected back to ``out_channels`` by a 1x1 conv.

    TPU lowering: the four convs are packed into ONE 9x9 conv whose kernels
    are the originals zero-padded and concatenated on the output axis —
    value-identical (zero taps are inert, padding matches k//2 'same'), and
    one wide conv beats four thin 3-input-channel convs by ~2x on the MXU.
    The 1x1 gate/projection convs run as matmuls.
    """

    out_channels: int
    dtype: Dtype = jnp.float32

    @nn.compact
    def __call__(self, x: jnp.ndarray) -> jnp.ndarray:
        c = self.out_channels
        cin = x.shape[-1]
        dt = self.dtype
        kbs = [Conv2dParams(k, cin, c, name=f"conv{k}")() for k in (3, 5, 7, 9)]
        packed_k = jnp.concatenate(
            [jnp.pad(kk, (((9 - kk.shape[0]) // 2,) * 2,
                          ((9 - kk.shape[1]) // 2,) * 2, (0, 0), (0, 0)))
             for kk, _ in kbs], axis=-1)
        packed_b = jnp.concatenate([bb for _, bb in kbs])
        # explicit im2col + matmul: XLA's conv lowering for the 3-channel
        # 9x9 packed conv picks a transposed layout costing ~1.2 ms/tile;
        # the (H*W, 81*cin) patches matmul runs on the MXU at full K
        bh0, hh0, ww0, _ = x.shape
        xp = jnp.pad(x.astype(dt), ((0, 0), (4, 4), (4, 4), (0, 0)))
        patches = jnp.concatenate(
            [xp[:, i:i + hh0, j:j + ww0, :] for i in range(9)
             for j in range(9)], axis=-1)
        b_all = (patches.reshape(bh0, hh0, ww0, 81 * cin)
                 @ packed_k.astype(dt).reshape(81 * cin, 4 * c)
                 + packed_b.astype(dt))

        gk, gb = Conv2dParams(1, cin, c, name="conv_x")()
        gate = x.astype(dt) @ gk[0, 0].astype(dt) + gb.astype(dt)

        # The reference declares (and checkpoints) an unused LayerNorm here
        # (:62); materialize it for state-dict/param-count parity.
        _ = _layer_norm("norm", self.dtype)(jnp.zeros((1, c), dtype=self.dtype))

        # Per-branch gating on channel slices + the 1x1 projection split into
        # four summed (c, c) matmuls: equals gating the (..., 4, c) stack and
        # projecting (..., 4c) @ (4c, c), but never materializes a 720-channel
        # tensor (whose forced relayout cost ~2.3 ms/tile).
        lk, lb = Conv2dParams(1, 4 * c, c, name="conv_last")()
        out = lb.astype(dt)
        for k in range(4):
            p = jax.lax.slice_in_dim(b_all, k * c, (k + 1) * c, axis=3)
            g = p * jax.nn.sigmoid(gate * p) + p
            out = out + g @ lk[0, 0, k * c:(k + 1) * c].astype(dt)
        return out


class UnionAttention(nn.Module):
    """Joint C/H/W attention map (reference :104-133).

    Mean+max pooled along each of C, H, W; each 2-channel map runs through a
    3x3 conv over its remaining two axes; the three broadcast maps are summed
    and passed through a final 3x3 conv over (H, W).
    """

    channels: int
    dtype: Dtype = jnp.float32

    def setup(self):
        self.conv1 = Conv2dParams(3, 2, 1)
        self.conv2 = Conv2dParams(3, 2, 1)
        self.conv3 = Conv2dParams(3, 2, 1)
        self.conv_last = Conv2dParams(3, self.channels, self.channels)

    def raw(self):
        """Raw conv params for the fused Fusion kernel path."""
        return (self.conv1(), self.conv2(), self.conv3(), self.conv_last())

    def __call__(self, x: jnp.ndarray,
                 pools: tuple | None = None) -> jnp.ndarray:
        dt = self.dtype

        def conv(t, kb):
            k, bias = kb
            return jax.lax.conv_general_dilated(
                t.astype(dt), k.astype(dt), (1, 1), ((1, 1), (1, 1)),
                dimension_numbers=("NHWC", "HWIO", "NHWC")) + bias.astype(dt)

        # pool pairs: computed here, or precomputed by the Fusion-level
        # Pallas kernel (ops/pallas/fusion_ops.py) and passed in
        if pools is None:
            cp = jnp.stack([x.mean(axis=-1), x.max(axis=-1)], axis=-1)
            hp = jnp.stack([x.mean(axis=1), x.max(axis=1)], axis=-1)
            wp = jnp.stack([x.mean(axis=2), x.max(axis=2)], axis=-1)
        else:
            cp, hp, wp = pools  # (B,H,W,2), (B,W,C,2), (B,H,C,2)

        # channel pool: grid (H, W)
        c_att = conv(cp, self.conv1())  # (B,H,W,1)

        # height pool: conv over grid (C, W)  [torch views (b,1,c,w), :124-126]
        h_att = conv(hp.transpose(0, 2, 1, 3), self.conv2())[..., 0]  # (B,C,W)
        h_att = h_att.transpose(0, 2, 1)[:, None, :, :]  # (B,1,W,C)

        # width pool: conv over grid (C, H)  [torch views (b,1,c,h), :128-130]
        w_att = conv(wp.transpose(0, 2, 1, 3), self.conv3())[..., 0]  # (B,C,H)
        w_att = w_att.transpose(0, 2, 1)[:, :, None, :]  # (B,H,1,C)

        return conv(c_att + h_att + w_att, self.conv_last())


class Fusion(nn.Module):
    """Deep/shallow fusion gate (reference :136-162).

    Called as ``fusion(deep_out, shallow)`` mirroring the reference call site
    (:1317,1324,1330,1339) where the *first* positional arg receives the deep
    path output (the reference parameter names are swapped — parity is with
    the positional semantics).
    """

    channels: int
    dtype: Dtype = jnp.float32

    @nn.compact
    def __call__(self, a: jnp.ndarray, b: jnp.ndarray) -> jnp.ndarray:
        import os
        from sisr_tpu.ops.pallas.fusion_ops import fused_fusion, supports_shape

        ua1 = UnionAttention(self.channels, self.dtype, name="union_attention1")
        ua2 = UnionAttention(self.channels, self.dtype, name="union_attention2")
        ua3 = UnionAttention(self.channels, self.dtype, name="union_attention3")
        if (jax.default_backend() == "tpu"
                and supports_shape(a.shape[1], a.shape[2])
                and os.environ.get("SISR_FUSED_UA", "1") == "1"):
            # whole module in three Pallas passes (pools, UA maps with the
            # linear conv_last decomposition, gating); a + b, the broadcast
            # conv_last inputs and the pool relayouts never touch HBM
            return fused_fusion(a, b, (ua1.raw(), ua2.raw(), ua3.raw()), True)
        a_att = ua1(a)
        gate = jax.nn.sigmoid(ua2(a + b))
        b_att = ua3(b)
        return a * jax.nn.sigmoid(a_att * gate) + b * jax.nn.sigmoid(b_att * (1.0 - gate))


class MapConvParams(nn.Module):
    """3x3 one-channel-in conv parameter container (nn.Conv names/shapes)."""

    features: int

    @nn.compact
    def __call__(self):
        kernel = self.param("kernel", nn.initializers.lecun_normal(),
                            (3, 3, 1, self.features))
        bias = self.param("bias", nn.initializers.zeros, (self.features,))
        return kernel, bias


class SCAParams(nn.Module):
    """SpatialChannelAttention parameters (reference :317-359) with the exact
    flax tree of the previous module (`qkv/linear1/kernel`, ...)."""

    dim: int

    @nn.compact
    def __call__(self):
        c = self.dim
        l1 = MapConvParams(c, name="linear1")()
        l2 = MapConvParams(c, name="linear2")()
        se = (LinearParams(c, c // 10, name="linear1_first")(),
              LinearParams(c // 10, c, name="linear1_second")(),
              LinearParams(c, c // 10, name="linear2_first")(),
              LinearParams(c // 10, c, name="linear2_second")())
        return l1, l2, se


class SpatialChannelAttention(nn.Module):
    """QKV pre-attention mixing channel + spatial statistics (reference
    :317-359), module form (used standalone by e.g. models/dense_sr.py; the
    HiT-SIR hot path fuses the same math into the SCC Pallas kernel)."""

    dim: int
    dtype: Dtype = jnp.float32

    @nn.compact
    def __call__(self, x: jnp.ndarray) -> jnp.ndarray:
        from sisr_tpu.ops.pallas.scc_block import sca_reference

        c = self.dim
        dt = self.dtype
        l1k, l1b = MapConvParams(c, name="linear1")()
        l2k, l2b = MapConvParams(c, name="linear2")()
        se = (LinearParams(c, c // 10, name="linear1_first")(),
              LinearParams(c // 10, c, name="linear1_second")(),
              LinearParams(c, c // 10, name="linear2_first")(),
              LinearParams(c // 10, c, name="linear2_second")())

        def dense(t, kb):
            return t.astype(dt) @ kb[0].astype(dt) + kb[1].astype(dt)

        s1 = dense(dense(x.mean(axis=(1, 2), keepdims=True), se[0]), se[1])
        s2 = dense(dense(x.max(axis=(1, 2), keepdims=True), se[2]), se[3])
        return sca_reference(x.astype(dt), l1k.reshape(9, c).astype(dt),
                             l1b.astype(dt), l2k.reshape(9, c).astype(dt),
                             l2b.astype(dt), s1, s2)


class DynamicPosBias(nn.Module):
    """CrossFormer-style MLP over relative coordinates (reference :274-313).

    The non-residual path is used (:433): pos3(pos2(pos1(pos_proj(biases)))),
    each posN = LayerNorm -> ReLU -> Linear.
    """

    pos_dim: int
    num_heads: int
    dtype: Dtype = jnp.float32

    @nn.compact
    def __call__(self, biases: jnp.ndarray) -> jnp.ndarray:
        x = nn.Dense(self.pos_dim, dtype=self.dtype, name="pos_proj")(biases)
        for i, feat in ((1, self.pos_dim), (2, self.pos_dim), (3, self.num_heads)):
            x = _layer_norm(f"pos{i}_norm", self.dtype)(x)
            x = nn.relu(x)
            x = nn.Dense(feat, dtype=self.dtype, name=f"pos{i}_linear")(x)
        return x


@lru_cache(maxsize=64)
def _bias_gather_maps(wh: int, ww: int, bh: int, bw: int):
    """Separable gather maps for the pooled relative-position bias.

    The reference gathers the full (L, L, heads) bias then mean-pools blocks
    (hit_sir_pro.py:496-500) — O(L^2) memory (400 MB at 64x64 windows).
    Because the bias depends only on the coordinate difference, the pooled
    bias equals a (wh/bh, ww/bw) box filter over the relative-coordinate grid
    evaluated at (y - by*rh + wh-1, x - bx*rw + ww-1); those coordinates are
    separable in rows/columns, so the full (L, l_base) table is two tiny
    gathers of at most wh*bh rows / ww*bw columns (profiled: the flat
    L*l_base gather cost ~0.4 ms/block from 128-lane padding of the
    heads-minor output).
    """
    rh, rw = wh // bh, ww // bw
    dy = (np.arange(wh)[:, None] - np.arange(bh)[None, :] * rh + wh - 1)
    dx = (np.arange(ww)[:, None] - np.arange(bw)[None, :] * rw + ww - 1)
    return dy.reshape(-1).astype(np.int32), dx.reshape(-1).astype(np.int32)


def _bias_table(pooled: jnp.ndarray, wh: int, ww: int, bh: int, bw: int,
                heads: int) -> jnp.ndarray:
    """(P', heads) box-filtered grid -> (L, heads*l_base) bias table whose
    column order (head-major, then base cell) matches the block-diagonal
    correlation layout."""
    dy, dx = _bias_gather_maps(wh, ww, bh, bw)
    g = pooled.reshape(2 * wh - 1, 2 * ww - 1, heads).transpose(2, 0, 1)
    g = g[:, jnp.asarray(dy), :]          # (heads, wh*bh, 2ww-1)
    g = g[:, :, jnp.asarray(dx)]          # (heads, wh*bh, ww*bw)
    g = g.reshape(heads, wh, bh, ww, bw)
    return g.transpose(1, 3, 0, 2, 4).reshape(wh * ww, heads * bh * bw)


@lru_cache(maxsize=64)
def _box_pool_matrix(n: int, r: int) -> np.ndarray:
    """(n, n) banded matrix M with M[i, k] = 1/r for i-r+1 <= k <= i: one
    axis of the causal box filter that mean-pools the relative-position bias
    grid (reference :496-500).  Applied as two matmuls it replaces the
    grouped VALID conv whose XLA lowering cost ~0.37 ms per 64-window block
    (~2.6 ms/tile across the ladder)."""
    m = np.zeros((n, n), np.float32)
    inv = 1.0 / r
    for i in range(n):
        m[i, max(0, i - r + 1):i + 1] = inv
    return m


@lru_cache(maxsize=64)
def _rpe_mother_set(wh: int, ww: int) -> np.ndarray:
    """(P, 2) float relative-coordinate table, h-major (reference :479-482)."""
    bh = np.arange(1 - wh, wh, dtype=np.float32)
    bw = np.arange(1 - ww, ww, dtype=np.float32)
    grid = np.stack(np.meshgrid(bh, bw, indexing="ij"))  # (2, 2wh-1, 2ww-1)
    return grid.reshape(2, -1).T.copy()


class LinearParams(nn.Module):
    """Parameter container with nn.Dense layout (kernel (in, out), bias
    (out,)) whose application is up to the caller — lets one parameter set
    feed both the fused Pallas path and the jnp reference path while keeping
    torch-converter-compatible names."""

    features_in: int
    features_out: int

    @nn.compact
    def __call__(self):
        kernel = self.param("kernel", nn.initializers.lecun_normal(),
                            (self.features_in, self.features_out))
        bias = self.param("bias", nn.initializers.zeros, (self.features_out,))
        return kernel, bias


class SCC(nn.Module):
    """Spatial-Channel Correlation — the core attention op (reference :362-602).

    Per window of size (wh, ww): the input channels are split into q and v
    halves across heads; k is *synthesized* as ``(k_gen1(q) + k_gen2(v)) / 2``
    (:428-429,572).  The spatial branch (S-SC) pools k, v down to the base
    window via a learned linear over each pooling block (:435-456), computes
    ``q @ k^T / head_dim`` plus a dynamic relative-position bias mean-pooled
    to the base window (:475-503), and applies it to v.  The channel branch
    (C-SC) computes a single-head channel correlation ``(q^T @ k) / L @ v^T``
    (:515-540).  Both halves are concatenated and linearly projected.
    """

    dim: int
    base_win_size: Tuple[int, int]
    window_size: Tuple[int, int]
    num_heads: int
    is_channel_spatial_attn: bool = True
    value_drop: float = 0.0
    proj_drop: float = 0.0
    dtype: Dtype = jnp.float32

    @nn.compact
    def __call__(self, x: jnp.ndarray, deterministic: bool = True,
                 stats=None, return_normal_form: bool = False):
        b, hp, wp, c = x.shape
        wh, ww = self.window_size
        # base window = elementwise min(window, base) (reference :415-417)
        bh = min(wh, self.base_win_size[0])
        bw = min(ww, self.base_win_size[1])
        heads = self.num_heads
        d = c // (2 * heads)  # per-head q/v width
        l_full = wh * ww
        l_base = bh * bw
        rh, rw = wh // bh, ww // bw  # pooling block extent

        from sisr_tpu.ops.pallas.scc_attention import (
            blockdiag_kgen, head_mask, pooling_matrix)
        from sisr_tpu.ops.pallas.scc_block import sca_reference, scc_block

        dt = self.dtype
        sca = None
        if self.is_channel_spatial_attn:
            (l1k, l1b), (l2k, l2b), se = SCAParams(c, name="qkv")()
            (f1, s1d), (f2, s2d) = (se[0], se[1]), (se[2], se[3])

            def dense(t, kb):
                return t.astype(dt) @ kb[0].astype(dt) + kb[1].astype(dt)

            if stats is not None:
                # all four global passes over x were already emitted by the
                # previous block's fused tail kernel (ffn.htb_tail_stats);
                # only valid when x needed no window padding (gated by HTB)
                cmean, cmax, ssum, smax = stats
                sp_avg = (ssum.astype(dt) / float(hp * wp)).reshape(b, 1, 1, c)
                sp_max = smax.astype(dt).reshape(b, 1, 1, c)
            else:
                cmean = cmax = None
                sp_avg = x.mean(axis=(1, 2), keepdims=True)  # (B,1,1,C)
                sp_max = x.max(axis=(1, 2), keepdims=True)
            s1 = dense(dense(sp_avg, f1), s1d)
            s2 = dense(dense(sp_max, f2), s2d)
            sca = (l1k.reshape(9, c).astype(dt), l1b.astype(dt),
                   l2k.reshape(9, c).astype(dt), l2b.astype(dt), s1, s2)
            if cmean is not None:
                sca = sca + (cmean, cmax)

        k1_kernel, k1_bias = LinearParams(d, d, name="k_generate1")()
        k2_kernel, k2_bias = LinearParams(d, d, name="k_generate2")()
        pool_kernel, pool_bias = LinearParams(rh * rw, 1, name="spatial_linear")()

        # dynamic relative position bias, mean-pooled to the base window.
        # Pooling is folded into a box filter over the relative-coordinate
        # grid, then expanded to the (L, heads*l_base) table by two separable
        # small gathers (see _bias_gather_maps) — O(window) memory vs the
        # reference's O(L^2) materialization.
        rpe = jnp.asarray(_rpe_mother_set(wh, ww), dtype=self.dtype)
        pos_dim = self.dim // 4
        pos = DynamicPosBias(pos_dim // 4, heads, self.dtype, name="pos")(rpe)  # (P, heads)
        if rh == 1 and rw == 1:
            pooled = pos
        else:
            # separable causal box filter as two banded constant matmuls
            # (equals the reference's zero-padded VALID mean-pool conv)
            grid = pos.reshape(2 * wh - 1, 2 * ww - 1, heads)
            rmat = jnp.asarray(_box_pool_matrix(2 * wh - 1, rh), self.dtype)
            cmat = jnp.asarray(_box_pool_matrix(2 * ww - 1, rw), self.dtype)
            t = jnp.einsum("ik,kjh->ijh", rmat, grid)
            pooled = jnp.einsum("jl,ilh->ijh", cmat, t).reshape(-1, heads)
        bias = _bias_table(pooled, wh, ww, bh, bw, heads)  # (L, heads*l_base)

        # algebraic normal form shared by the Pallas kernel and the jnp
        # reference (block-diagonal k-gen, pooling matrix, head mask)
        w1, w2, bb = blockdiag_kgen(k1_kernel.astype(self.dtype),
                                    k1_bias.astype(self.dtype),
                                    k2_kernel.astype(self.dtype),
                                    k2_bias.astype(self.dtype), heads)
        pmat, pb = pooling_matrix(pool_kernel, pool_bias, wh, ww, bh, bw, self.dtype)
        mask = head_mask(heads, l_base, c // 2, self.dtype)

        proj_k, proj_b = LinearParams(c, c, name="proj")()

        if return_normal_form:
            # normal-form parameter bundle for the fused whole-HTB kernel
            # (ops/pallas/htb_block.py); same tensors scc_block would get
            return (sca, w1, w2, bb, pmat, pb, mask, bias.astype(dt),
                    proj_k.astype(dt), proj_b.astype(dt))

        dropout_active = self.value_drop > 0.0 and not deterministic
        if dropout_active:
            qkv = sca_reference(x, *sca) if sca is not None else x
            x6 = qkv.reshape(b, hp // wh, wh, wp // ww, ww, c)
            out6 = self._reference_with_dropout(
                x6, w1, w2, bb, pmat, pb, mask, bias.astype(dt), heads,
                deterministic)
            out = out6.reshape(b, hp, wp, c).astype(dt)
            out = out @ proj_k.astype(dt) + proj_b.astype(dt)
        else:
            # windows <= base window run the row-band kernel (degenerate
            # pooling); larger ones the per-window kernel — Mosaic needs the
            # block's second-minor dim (wp resp. ww) to be a multiple of 8
            import os
            band_ok = bh == wh and bw == ww and wp % 8 == 0
            win_ok = ww % 8 == 0 and wh % 8 == 0
            use_pallas = (jax.default_backend() == "tpu"
                          and (band_ok or win_ok)
                          and os.environ.get("SISR_FUSED_SCC", "1") == "1")
            out = scc_block(x, sca, w1, w2, bb, pmat, pb, mask,
                            bias.astype(dt), proj_k.astype(dt),
                            proj_b.astype(dt), heads, (wh, ww), use_pallas)
        return nn.Dropout(self.proj_drop, name="proj_dropout")(out, deterministic=deterministic)

    def _reference_with_dropout(self, x6, w1, w2, bb, pmat, pb, mask, bias,
                                heads, deterministic):
        """scc_reference with value dropout on v_pool / v (reference :506,534)."""
        b, nwh, wh, nww, ww, c = x6.shape
        half = c // 2
        l_full = wh * ww
        d = half // heads
        xw = x6.transpose(0, 1, 3, 2, 4, 5).reshape(-1, l_full, c)
        q, v = xw[..., :half], xw[..., half:]
        k = q @ w1 + v @ w2 + bb
        k_pool = jnp.einsum("ml,blc->bmc", pmat, k) + pb[0, 0]
        v_pool = jnp.einsum("ml,blc->bmc", pmat, v) + pb[0, 0]
        v_pool = nn.Dropout(self.value_drop, name="value_drop")(
            v_pool, deterministic=deterministic)

        def big(t):
            return jnp.tile(t, (1, heads, 1)) * mask

        corr = jnp.einsum("blc,bmc->blm", q, big(k_pool)) / float(d) + bias
        out_s = jnp.einsum("blm,bmc->blc", corr, big(v_pool))
        gram = jnp.einsum("blc,bld->bcd", q, k) / float(l_full)
        v_d = nn.Dropout(self.value_drop, name="value_drop_c")(
            v, deterministic=deterministic)
        out_c = jnp.einsum("bld,bcd->blc", v_d, gram)
        out = jnp.concatenate([out_s, out_c], axis=-1)
        return out.reshape(b, nwh, nww, wh, ww, c).transpose(0, 1, 3, 2, 4, 5)


class LayerNormParams(nn.Module):
    """LayerNorm parameter container (scale/bias names match nn.LayerNorm)."""

    features: int

    @nn.compact
    def __call__(self):
        scale = self.param("scale", nn.initializers.ones, (self.features,))
        bias = self.param("bias", nn.initializers.zeros, (self.features,))
        return scale, bias


class DepthwiseParams(nn.Module):
    """Depthwise-conv parameter container; kernel (5,5,1,C) + bias (C,)
    match nn.Conv so torch checkpoints convert unchanged."""

    features: int

    @nn.compact
    def __call__(self):
        kernel = self.param("kernel", nn.initializers.lecun_normal(),
                            (5, 5, 1, self.features))
        bias = self.param("bias", nn.initializers.zeros, (self.features,))
        return kernel, bias


class FFNParams(nn.Module):
    """ConvFFN parameters (reference :12-46): fc1 / dwconv / fc2, with the
    exact flax tree (`mlp/fc1/kernel`, ...) of the previous nn.Dense-based
    module so checkpoints and the torch converter are unchanged."""

    dim: int
    hidden: int

    @nn.compact
    def __call__(self):
        fc1 = LinearParams(self.dim, self.hidden, name="fc1")()
        dw = DepthwiseParams(self.hidden, name="dwconv")()
        fc2 = LinearParams(self.hidden, self.dim, name="fc2")()
        return fc1, dw, fc2


class HierarchicalTransformerBlock(nn.Module):
    """One STL: pad -> SCC -> unpad -> post-norm residual -> ConvFFN (reference :605-710).

    Non-standard norm placement (post-norm): norm1 is applied *after* the
    correlation, norm2 *after* the FFN (:699-704).
    """

    dim: int
    num_heads: int
    base_win_size: Tuple[int, int]
    window_size: Tuple[int, int]
    mlp_ratio: float = 2.0
    drop: float = 0.0
    value_drop: float = 0.0
    drop_path: float = 0.0
    is_channel_spatial_attn: bool = True
    dtype: Dtype = jnp.float32

    @nn.compact
    def __call__(self, x: jnp.ndarray, deterministic: bool = True,
                 emit_stats: bool = False, stats=None) -> jnp.ndarray:
        from sisr_tpu.ops.pallas.dwconv import depthwise_conv_reference
        from sisr_tpu.ops.pallas.ffn import (htb_tail, htb_tail_stats,
                                             layer_norm, stats_reference,
                                             supports_shape)

        b, h, w, c = x.shape
        dt = self.dtype
        shortcut = x
        wh, ww = self.window_size
        if not deterministic:
            stats = None

        import os
        from sisr_tpu.ops.pallas.htb_block import htb_fused, supports_fused
        # measured OFF by default: at whole-frame level the fused kernel is
        # exactly the sum of its parts (44.9 ms vs 19.2 SCC + 25.5 FFN) —
        # the attn HBM round trip it eliminates was already hidden under
        # the VPU-bound compute; frame medians 1711.4 fused vs 1708.4 ms
        # (see ROADMAP "ruled out", r5).  SISR_FUSED_HTB=1 enables for A/B.
        fused_want = (
            jax.default_backend() == "tpu" and deterministic
            and self.is_channel_spatial_attn
            and os.environ.get("SISR_FUSED_HTB", "0") == "1"
            and os.environ.get("SISR_FUSED_FFN", "1") == "1"
            and os.environ.get("SISR_FUSED_SCC", "1") == "1"
            and os.environ.get("SISR_FFN_PIPE", "1") == "1"
            and supports_fused(self.window_size, self.base_win_size,
                               (h, w), c))
        if fused_want:
            # whole-block fused kernel for the degenerate-window blocks:
            # SCA+SCC+proj+LN1+ConvFFN+LN2 in one lagged band pipeline —
            # the attention map never touches HBM (htb_block.py)
            bundle = SCC(
                dim=self.dim,
                base_win_size=self.base_win_size,
                window_size=self.window_size,
                num_heads=self.num_heads,
                is_channel_spatial_attn=self.is_channel_spatial_attn,
                value_drop=self.value_drop,
                proj_drop=self.drop,
                dtype=self.dtype,
                name="correlation",
            )(x, deterministic=deterministic, stats=stats,
              return_normal_form=True)
            ln1_s, ln1_b = LayerNormParams(self.dim, name="norm1")()
            hidden = int(self.dim * self.mlp_ratio)
            (fc1_k, fc1_b), (dw_k, dw_b), (fc2_k, fc2_b) = FFNParams(
                self.dim, hidden, name="mlp")()
            ln2_s, ln2_b = LayerNormParams(self.dim, name="norm2")()
            return htb_fused(
                x, *bundle, self.num_heads, self.window_size,
                ln1_s.astype(dt), ln1_b.astype(dt),
                fc1_k.astype(dt), fc1_b.astype(dt),
                dw_k[:, :, 0, :].astype(dt), dw_b.astype(dt),
                fc2_k.astype(dt), fc2_b.astype(dt),
                ln2_s.astype(dt), ln2_b.astype(dt),
                emit_stats=emit_stats)

        xp = pad_to_multiple(x, self.window_size)  # reflect (reference :664-674)
        if stats is not None and xp.shape[1:3] != (h, w):
            # the folded stats describe the UNPADDED x; transform them to
            # the reflect-padded xp SCA actually pools: channel pools
            # commute with spatial padding (pad the maps), the global max
            # is unchanged (reflection only duplicates values), and the
            # global sum gains the pad strips — two tiny slice reduces of
            # xp instead of re-reading the full feature map from HBM
            cmean, cmax, ssum, smax = stats
            f32 = jnp.float32
            cmean = pad_to_multiple(cmean[..., None], self.window_size)[..., 0]
            cmax = pad_to_multiple(cmax[..., None], self.window_size)[..., 0]
            ssum = (ssum + xp[:, h:, :w].astype(f32).sum(axis=(1, 2))
                    + xp[:, :, w:].astype(f32).sum(axis=(1, 2)))
            stats = (cmean, cmax, ssum, smax)
        xp = SCC(
            dim=self.dim,
            base_win_size=self.base_win_size,
            window_size=self.window_size,
            num_heads=self.num_heads,
            is_channel_spatial_attn=self.is_channel_spatial_attn,
            value_drop=self.value_drop,
            proj_drop=self.drop,
            dtype=self.dtype,
            name="correlation",
        )(xp, deterministic=deterministic, stats=stats)
        attn = xp[:, :h, :w, :]

        ln1_s, ln1_b = LayerNormParams(self.dim, name="norm1")()
        hidden = int(self.dim * self.mlp_ratio)
        (fc1_k, fc1_b), (dw_k, dw_b), (fc2_k, fc2_b) = FFNParams(
            self.dim, hidden, name="mlp")()
        ln2_s, ln2_b = LayerNormParams(self.dim, name="norm2")()

        dropout_active = not deterministic and (self.drop > 0.0
                                                or self.drop_path > 0.0)
        if dropout_active:
            # functional composition with the two dropouts (reference
            # :225-232) and stochastic depth around both residual branches
            # (reference :703-704)
            dpath = nn.Dropout(self.drop_path, broadcast_dims=(1, 2, 3),
                               name="drop_path")
            xr = shortcut + dpath(
                layer_norm(attn, ln1_s.astype(dt), ln1_b.astype(dt)),
                deterministic=deterministic)
            hh = _gelu(xr @ fc1_k.astype(dt) + fc1_b.astype(dt))
            hh = hh + _gelu(depthwise_conv_reference(
                hh, dw_k[:, :, 0, :].astype(dt), dw_b.astype(dt)))
            hh = nn.Dropout(self.drop, name="drop1")(hh, deterministic=deterministic)
            y = hh @ fc2_k.astype(dt) + fc2_b.astype(dt)
            y = nn.Dropout(self.drop, name="drop2")(y, deterministic=deterministic)
            return xr + dpath(layer_norm(y, ln2_s.astype(dt), ln2_b.astype(dt)),
                              deterministic=deterministic)

        import os
        use_pallas = (jax.default_backend() == "tpu"
                      and supports_shape(h, w)
                      and os.environ.get("SISR_FUSED_FFN", "1") == "1")
        args = (attn, shortcut,
                ln1_s.astype(dt), ln1_b.astype(dt),
                fc1_k.astype(dt), fc1_b.astype(dt),
                dw_k[:, :, 0, :].astype(dt), dw_b.astype(dt),
                fc2_k.astype(dt), fc2_b.astype(dt),
                ln2_s.astype(dt), ln2_b.astype(dt))
        if emit_stats:
            # eval-only fused-stats tail (see ffn.htb_tail_stats); the jnp
            # fallback keeps the (out, stats) interface at identical cost to
            # the consumer computing the pools itself
            if use_pallas and os.environ.get("SISR_FFN_PIPE", "1") == "1":
                # pass the UNCROPPED padded SCC output: the pipe kernel's
                # band grid reads only rows [0, h) (the 750 MB crop slice
                # of a window-padded block becomes free)
                return htb_tail_stats(xp, *args[1:], True)
            out = htb_tail(*args, use_pallas)
            return out, stats_reference(out)
        return htb_tail(*args, use_pallas)


class ThreeConv(nn.Module):
    """resi_connection='3conv' squeeze (reference :913-918); child names
    0/2/4 match the torch Sequential indices for the converter."""

    dim: int
    dtype: Dtype = jnp.float32

    @nn.compact
    def __call__(self, x: jnp.ndarray) -> jnp.ndarray:
        x = nn.leaky_relu(_conv(self.dim // 4, 3, "0", self.dtype)(x), 0.2)
        x = nn.leaky_relu(_conv(self.dim // 4, 1, "2", self.dtype)(x), 0.2)
        return _conv(self.dim, 3, "4", self.dtype)(x)


class RHTB(nn.Module):
    """Residual group: depth x HTB with hierarchical windows, then 3x3 conv
    + residual (reference :755-936)."""

    dim: int
    depth: int
    num_heads: int
    base_win_size: Tuple[int, int]
    window_sizes: Tuple[Tuple[int, int], ...]
    mlp_ratio: float = 2.0
    drop: float = 0.0
    value_drop: float = 0.0
    drop_paths: Tuple[float, ...] = ()
    is_channel_spatial_attn: bool = True
    use_checkpoint: bool = False
    resi_connection: str = "1conv"
    dtype: Dtype = jnp.float32

    @nn.compact
    def __call__(self, x: jnp.ndarray, deterministic: bool = True) -> jnp.ndarray:
        y = x
        _, h, w, _ = x.shape
        # gradient checkpointing analog of reference :831-833
        block_cls = (nn.remat(HierarchicalTransformerBlock, static_argnums=(2,))
                     if self.use_checkpoint else HierarchicalTransformerBlock)
        # eval-only: each block's fused tail kernel emits the SCA pool stats
        # the NEXT block needs (HTB transforms them when that block's
        # window pads — pools commute with the reflect padding)
        thread = deterministic and not self.use_checkpoint
        stats = None
        for i in range(self.depth):
            nxt = self.window_sizes[i + 1] if i + 1 < self.depth else None
            want = (thread and nxt is not None
                    and self.is_channel_spatial_attn)
            block = block_cls(
                dim=self.dim,
                num_heads=self.num_heads,
                base_win_size=self.base_win_size,
                window_size=self.window_sizes[i],
                mlp_ratio=self.mlp_ratio,
                drop=self.drop,
                value_drop=self.value_drop,
                drop_path=self.drop_paths[i] if self.drop_paths else 0.0,
                is_channel_spatial_attn=self.is_channel_spatial_attn,
                dtype=self.dtype,
                name=f"blocks_{i}",
            )
            if thread:
                out = block(y, deterministic, emit_stats=want, stats=stats)
                y, stats = out if want else (out, None)
            else:
                y = block(y, deterministic)
        if self.resi_connection == "3conv":
            return x + ThreeConv(self.dim, self.dtype, name="conv")(y)
        return FusedConv3x3(self.dim, "none", self.dtype, name="conv")(y, x)


class NearestConvUp2(nn.Module):
    """conv3x3(nearest_x2(x)) computed as pixel_shuffle(conv3x3(x, folded)).

    Because nearest upsampling repeats each pixel 2x2, the conv taps that the
    four output phases (a, b) see collapse onto at most 2x2 distinct source
    pixels; folding the 3x3 kernel per phase gives one low-resolution conv to
    4x the channels + a pixel shuffle — identical values (including the
    zero-padding border), ~4x less activation traffic, and no materialized
    upsampled map.  Used by the 'nearest+conv' reconstruction head
    (reference :1252-1255, :1332-1333).  Params match nn.Conv 3x3.
    """

    features: int
    dtype: Dtype = jnp.float32
    act: str = "none"
    emit_packed: bool = False
    consume_packed: bool = False

    @nn.compact
    def __call__(self, x: jnp.ndarray) -> jnp.ndarray:
        cin = x.shape[-1] // 4 if self.consume_packed else x.shape[-1]
        kernel = self.param("kernel", nn.initializers.lecun_normal(),
                            (3, 3, cin, self.features))
        bias = self.param("bias", nn.initializers.zeros, (self.features,))

        def fold(w, phase, axis):
            # combine taps that alias onto the same source pixel per phase
            rows = [jnp.take(w, i, axis=axis) for i in range(3)]
            zero = jnp.zeros_like(rows[0])
            if phase == 0:
                new = [rows[0], rows[1] + rows[2], zero]
            else:
                new = [zero, rows[0] + rows[1], rows[2]]
            return jnp.stack(new, axis=axis)

        phases = [fold(fold(kernel, a, 0), b, 1) for a in (0, 1) for b in (0, 1)]
        from sisr_tpu.ops.pallas.conv3x3 import conv3x3, conv3x3_shuffled
        if self.emit_packed:
            # COLUMN-phase-major channel order (see pixel_shuffle_phase_major
            # for why j-major); the pixel shuffle is deferred to the consumer
            # (conv3x3_shuffled)
            k_full = jnp.stack([phases[2 * a + bb] for bb in (0, 1)
                                for a in (0, 1)], axis=3).reshape(
                3, 3, cin, self.features * 4)
            b_full = jnp.tile(bias, 4)
            if self.consume_packed:
                # packed in, packed out: interleave the packed input in VMEM
                # (conv3x3_shuffled) and conv with the phase-folded kernel —
                # the chained x4 head never materializes a pixel shuffle
                return conv3x3_shuffled(
                    x.astype(self.dtype), k_full.astype(self.dtype),
                    b_full.astype(self.dtype), self.act,
                    _use_shuffled_conv(2 * x.shape[1], 2 * x.shape[2], cin,
                                       self.features * 4))
            return conv3x3(x.astype(self.dtype), None, k_full.astype(self.dtype),
                           b_full.astype(self.dtype), self.act,
                           _use_conv_kernel(x.shape[1], x.shape[2], cin,
                                            self.features * 4))
        assert not self.consume_packed  # packed input implies packed output
        k_full = jnp.stack(phases, axis=-1).reshape(3, 3, cin, self.features * 4)
        b_full = jnp.repeat(bias, 4)

        # self.act folds the caller's post-shuffle leaky-relu into the conv
        # (elementwise, so it commutes with pixel_shuffle)
        y = conv3x3(x.astype(self.dtype), None, k_full.astype(self.dtype),
                    b_full.astype(self.dtype), self.act,
                    _use_conv_kernel(x.shape[1]))
        return pixel_shuffle(y, 2)


class HiTSIR(nn.Module):
    """HiT-SIR-Pro network (reference :1065-1344).  NHWC input in [0,1]."""

    is_mult_size_conv_feat_extract: bool = True
    is_channel_spatial_attn: bool = True
    is_fusion: bool = True
    in_chans: int = 3
    embed_dim: int = 180
    depths: Sequence[int] = (6, 6, 6, 6, 6, 6)
    num_heads: Sequence[int] = (6, 6, 6, 6, 6, 6)
    base_win_size: Tuple[int, int] = (8, 8)
    mlp_ratio: float = 2.0
    drop_rate: float = 0.0
    value_drop_rate: float = 0.0
    drop_path_rate: float = 0.0
    ape: bool = False
    resi_connection: str = "1conv"
    upscale: int = 4
    img_range: float = 1.0
    upsampler: str = "nearest+conv"
    use_checkpoint: bool = False
    hier_win_ratios: Sequence[float] = (0.5, 1, 2, 4, 6, 8, 10, 12)
    num_feat: int = 64
    dtype: Dtype = jnp.float32
    # stage='head' emits the group-packed (B, H, W/G, G*in_chans) layout
    # (see _x4_head) — set by BandedHeadSR via .clone(); params unchanged
    head_packed: bool = False

    def window_sizes(self) -> Tuple[Tuple[int, int], ...]:
        """Per-block window sizes; only the first ``depth`` ratios are used
        per stage (reference :802-817)."""
        return tuple(
            (int(self.base_win_size[0] * r), int(self.base_win_size[1] * r))
            for r in self.hier_win_ratios
        )

    def _x4_head(self, y: jnp.ndarray, packed_out: bool = False) -> jnp.ndarray:
        """The 'nearest+conv' x4 reconstruction tail (conv_up1 → conv_last)
        on a (B, h1, w1, num_feat) feature map.  Split out of ``__call__`` so
        whole-image eval can stream it over feature-row bands (the 4x-res
        activations of a 1080p frame alone are ~18 GB — parallel/tiling.py::
        BandedHeadSR).  Called inside the compact ``__call__`` frame; module
        names match the reference state dict (torch_port.py).

        ``packed_out=True`` returns the GROUP-PACKED (B, H, W/G, G*in_chans)
        layout (G = ops.pallas.conv3x3.tail_pack_group()): XLA's TPU layout
        pads the minor dim to 128 lanes, so a (..., 3) output is 42x inflated
        in HBM — the packed form keeps the banded head's per-band writes and
        blend slices at their nominal size (requires 4*w1 % G == 0; values
        equal the plain output reshaped)."""
        dt = self.dtype
        nf = self.num_feat
        h1, w1 = y.shape[1], y.shape[2]
        # Packed x4 head: conv_up1 emits phase-major packed channels,
        # conv_up2 interleaves them in VMEM and emits packed again, and
        # conv_hr unpacks in VMEM — no pixel shuffle of the 2x or 4x-res
        # maps ever materializes (the XLA shuffles cost 7.4+1.8 ms/strip
        # of transpose/layout copies, profiled r3)
        packed_hr = _use_shuffled_conv(4 * h1, 4 * w1, nf)
        packed_up = (packed_hr
                     and _use_shuffled_conv(2 * h1, 2 * w1, nf, 4 * nf)
                     and _use_conv_kernel(h1, w1, nf, 4 * nf))
        y = NearestConvUp2(nf, dt, "leaky2", name="conv_up1",
                           emit_packed=packed_up)(y)
        y = NearestConvUp2(nf, dt, "leaky2", name="conv_up2",
                           emit_packed=packed_hr,
                           consume_packed=packed_up)(y)
        import os
        from sisr_tpu.ops.pallas.conv3x3 import tail_pack_group
        grp = tail_pack_group()
        assert not packed_out or (4 * w1) % grp == 0, (w1, grp)
        if packed_hr and os.environ.get("SISR_FUSED_TAIL", "1") == "1":
            # conv_hr + conv_last as ONE lagged-pipeline kernel: the 4x-res
            # hr map (755 MB per 192x1920 strip) never round-trips HBM.
            # Param tree matches the two-module path exactly (same names,
            # same shapes, same init) — checkpoints are interchangeable.
            from sisr_tpu.ops.pallas.conv3x3 import (
                conv3x3_shuffled_tail, conv3x3_shuffled_tail_packed,
                supports_packed_tail)
            hrk, hrb = Conv2dParams(3, nf, nf, name="conv_hr")()
            lk, lb = Conv2dParams(3, nf, self.in_chans, name="conv_last")()
            args = (y, hrk.astype(dt), hrb.astype(dt), "leaky2",
                    lk.astype(dt), lb.astype(dt))
            if packed_out and supports_packed_tail(*y.shape[1:4],
                                                   self.in_chans):
                return conv3x3_shuffled_tail_packed(*args, True)
            out = conv3x3_shuffled_tail(*args, True)
        elif packed_hr:
            hr = ShuffledConv3x3(nf, "leaky2", dt, name="conv_hr")(y)
            out = FusedConv3x3(self.in_chans, "none", dt, name="conv_last")(hr)
        else:
            hr = FusedConv3x3(nf, "leaky2", dt, name="conv_hr")(y)
            out = FusedConv3x3(self.in_chans, "none", dt, name="conv_last")(hr)
        if packed_out:
            b_, hh, ww, cc = out.shape
            out = out.reshape(b_, hh, ww // grp, grp * cc)
        return out

    @nn.compact
    def __call__(self, x: jnp.ndarray, deterministic: bool = True,
                 stage: str = "full") -> jnp.ndarray:
        """``stage`` (static) splits the forward for banded whole-image eval:
        'full' is the normal end-to-end network; 'features' stops at the
        pre-upsample feature map (nearest+conv head only); 'head' treats
        ``x`` as that feature map and runs only the x4 tail + output denorm
        (no crop — the caller owns halo cropping).  Params are identical
        across stages (apply-time subsets of the same tree)."""
        assert stage in ("full", "features", "head"), stage
        b, h, w, cin = x.shape
        c = self.embed_dim
        dt = self.dtype
        x = x.astype(dt)

        if (self.in_chans if stage == "head" else cin) == 3:
            mean = jnp.asarray(IMAGENET_ISH_RGB_MEAN, dtype=dt)
        else:
            mean = jnp.zeros((1,), dtype=dt)

        if stage != "full":
            assert self.upsampler == "nearest+conv", self.upsampler
        if stage == "head":
            out = self._x4_head(x, packed_out=self.head_packed)
            if out.shape[-1] != self.in_chans and mean.size == self.in_chans:
                mean = jnp.tile(mean, out.shape[-1] // self.in_chans)
            return out / self.img_range + mean
        x = (x - mean) * self.img_range

        # 1. shallow feature extraction (reference :1139-1145)
        if self.is_mult_size_conv_feat_extract:
            shallow = MultipleSizeConvExtract(c, dt, name="conv_first")(x)
        else:
            shallow = _conv(c, 3, "conv_first", dt)(x)

        # 2. deep feature extraction (reference :1284-1302)
        # stochastic-depth decay: linspace over all STLs (reference :1193)
        dpr = np.linspace(0.0, self.drop_path_rate, sum(self.depths)).tolist()

        def forward_features(feat):
            feat = _layer_norm("patch_embed_norm", dt)(feat)  # patch_norm=True
            if self.ape:
                fb, fh, fw, fc = feat.shape
                pos = self.param("absolute_pos_embed",
                                 nn.initializers.truncated_normal(0.02),
                                 (1, fh * fw, fc))
                feat = feat + pos.reshape(1, fh, fw, fc).astype(dt)
            feat = nn.Dropout(self.drop_rate, name="pos_drop")(
                feat, deterministic=deterministic)
            wins = self.window_sizes()
            off = 0
            for i, depth in enumerate(self.depths):
                feat = RHTB(
                    dim=c,
                    depth=depth,
                    num_heads=self.num_heads[i],
                    base_win_size=tuple(self.base_win_size),
                    window_sizes=wins,
                    mlp_ratio=self.mlp_ratio,
                    drop=self.drop_rate,
                    value_drop=self.value_drop_rate,
                    drop_paths=tuple(dpr[off:off + depth]),
                    is_channel_spatial_attn=self.is_channel_spatial_attn,
                    use_checkpoint=self.use_checkpoint,
                    resi_connection=self.resi_connection,
                    dtype=dt,
                    name=f"layers_{i}",
                )(feat, deterministic=deterministic)
                off += depth
            return _layer_norm("norm", dt)(feat)

        def fuse(deep, sh):
            if self.is_fusion:
                return Fusion(c, dt, name="fusion")(deep, sh)
            return deep + sh

        # 3. reconstruction (reference :1235-1262, :1313-1340)
        conv_ab = FusedConv3x3(c, "none", dt, name="conv_after_body")
        if self.upsampler == "pixelshuffle":
            deep = conv_ab(forward_features(shallow))
            y = fuse(deep, shallow)
            y = FusedConv3x3(self.num_feat, "leaky", dt,
                             name="conv_before_upsample")(y)
            n_up = int(np.log2(self.upscale))
            for i in range(n_up):
                y = _conv(4 * self.num_feat, 3, f"upsample_conv{i}", dt)(y)
                y = pixel_shuffle(y, 2)
            y = _conv(cin, 3, "conv_last", dt)(y)
        elif self.upsampler == "pixelshuffledirect":
            deep = conv_ab(forward_features(shallow))
            y = fuse(deep, shallow)
            y = _conv((self.upscale ** 2) * cin, 3, "upsample_conv0", dt)(y)
            y = pixel_shuffle(y, self.upscale)
        elif self.upsampler == "nearest+conv":
            assert self.upscale == 4, "nearest+conv head supports x4 only"
            deep = conv_ab(forward_features(shallow))
            y = fuse(deep, shallow)
            y = FusedConv3x3(self.num_feat, "leaky", dt,
                             name="conv_before_upsample")(y)
            if stage == "features":
                return y
            y = self._x4_head(y)
        else:
            # denoise / artifact-removal head (reference :1260-1262, :1335-1340)
            deep = conv_ab(forward_features(shallow))
            res = fuse(deep, shallow)
            y = x + _conv(cin, 3, "conv_last", dt)(res)

        y = y / self.img_range + mean
        return y[:, : h * self.upscale, : w * self.upscale, :]


def flagship_config(**overrides) -> dict:
    """The configuration trained by the reference (main.py:26-32)."""
    cfg = dict(
        is_mult_size_conv_feat_extract=True,
        is_channel_spatial_attn=True,
        is_fusion=True,
        embed_dim=180,
        depths=(6, 6, 6, 6, 6, 6),
        num_heads=(6, 6, 6, 6, 6, 6),
        base_win_size=(8, 8),
        mlp_ratio=2.0,
        upsampler="nearest+conv",
        hier_win_ratios=(0.5, 1, 2, 4, 6, 8, 10, 12),
        upscale=4,
    )
    cfg.update(overrides)
    return cfg
