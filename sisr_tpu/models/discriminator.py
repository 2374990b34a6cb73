"""U-Net discriminator with spectral normalization.

Parity target: KAIR ``Discriminator_UNet``
(参考资料/KAIR_master/models/network_discriminator.py:88-137): conv0, three
stride-2 SN 4x4 convs down (64->512), three bilinear-up + SN 3x3 convs with
skip adds, two extra SN convs, then a 1-channel logit conv.  LeakyReLU(0.2)
throughout.

Spectral norm is torch-semantics: the kernel is viewed as (out, in*kh*kw),
one power iteration updates (u, v) per *training* forward, and the kernel is
scaled by 1/sigma.  (u, v) live in a mutable ``spectral`` collection — the
functional analog of torch's buffers.
"""

from __future__ import annotations

from typing import Any, Tuple

import jax
import jax.numpy as jnp
from flax import linen as nn

from sisr_tpu.ops.resize import bilinear_resize

Dtype = Any


def _l2norm(x, eps=1e-12):
    return x / (jnp.linalg.norm(x) + eps)


class SNConv(nn.Module):
    """2-D conv whose kernel is spectrally normalized via power iteration."""

    features: int
    kernel_size: int
    stride: int = 1
    use_bias: bool = False
    dtype: Dtype = jnp.float32

    @nn.compact
    def __call__(self, x: jnp.ndarray, update_stats: bool = False) -> jnp.ndarray:
        k = self.kernel_size
        in_feat = x.shape[-1]
        kernel = self.param(
            "kernel", nn.initializers.lecun_normal(), (k, k, in_feat, self.features))
        bias = (self.param("bias", nn.initializers.zeros, (self.features,))
                if self.use_bias else None)

        # torch view: (out, in*kh*kw)
        w2d = kernel.transpose(3, 2, 0, 1).reshape(self.features, -1).astype(jnp.float32)
        u_var = self.variable(
            "spectral", "u",
            lambda: _l2norm(jax.random.normal(
                jax.random.PRNGKey(0), (self.features,), jnp.float32)))
        v_var = self.variable(
            "spectral", "v",
            lambda: _l2norm(jax.random.normal(
                jax.random.PRNGKey(1), (w2d.shape[1],), jnp.float32)))

        u, v = u_var.value, v_var.value
        if update_stats:
            v = _l2norm(w2d.T @ u)
            u = _l2norm(w2d @ v)
            if not self.is_initializing():
                u_var.value = jax.lax.stop_gradient(u)
                v_var.value = jax.lax.stop_gradient(v)
            u = jax.lax.stop_gradient(u)
            v = jax.lax.stop_gradient(v)
        sigma = u @ (w2d @ v)
        kernel_sn = (kernel / sigma.astype(kernel.dtype)).astype(self.dtype)

        pad = (k - 1) // 2
        y = jax.lax.conv_general_dilated(
            x.astype(self.dtype), kernel_sn, (self.stride, self.stride),
            ((pad, pad), (pad, pad)) if k % 2 == 1 else ((1, 1), (1, 1)),
            dimension_numbers=("NHWC", "HWIO", "NHWC"))
        if bias is not None:
            y = y + bias.astype(self.dtype)
        return y


class UNetDiscriminatorSN(nn.Module):
    """GAN discriminator producing a per-pixel logit map (B, H, W, 1)."""

    ndf: int = 64
    dtype: Dtype = jnp.float32

    @nn.compact
    def __call__(self, x: jnp.ndarray, update_stats: bool = False) -> jnp.ndarray:
        act = lambda t: nn.leaky_relu(t, 0.2)
        ndf = self.ndf

        x0 = act(nn.Conv(ndf, (3, 3), padding=((1, 1), (1, 1)), dtype=self.dtype,
                         name="conv0")(x.astype(self.dtype)))
        x1 = act(SNConv(ndf * 2, 4, 2, dtype=self.dtype, name="conv1")(x0, update_stats))
        x2 = act(SNConv(ndf * 4, 4, 2, dtype=self.dtype, name="conv2")(x1, update_stats))
        x3 = act(SNConv(ndf * 8, 4, 2, dtype=self.dtype, name="conv3")(x2, update_stats))

        x3 = bilinear_resize(x3, x3.shape[1] * 2, x3.shape[2] * 2)
        x4 = act(SNConv(ndf * 4, 3, 1, dtype=self.dtype, name="conv4")(x3, update_stats))
        x4 = x4 + x2
        x4 = bilinear_resize(x4, x4.shape[1] * 2, x4.shape[2] * 2)
        x5 = act(SNConv(ndf * 2, 3, 1, dtype=self.dtype, name="conv5")(x4, update_stats))
        x5 = x5 + x1
        x5 = bilinear_resize(x5, x5.shape[1] * 2, x5.shape[2] * 2)
        x6 = act(SNConv(ndf, 3, 1, dtype=self.dtype, name="conv6")(x5, update_stats))
        x6 = x6 + x0

        out = act(SNConv(ndf, 3, 1, dtype=self.dtype, name="conv7")(x6, update_stats))
        out = act(SNConv(ndf, 3, 1, dtype=self.dtype, name="conv8")(out, update_stats))
        return nn.Conv(1, (3, 3), padding=((1, 1), (1, 1)), dtype=self.dtype,
                       name="conv9")(out)
