"""Training losses.

* l1 / mse             — torch L1Loss / MSELoss parity (mean reduction)
* charbonnier          — reference utils/utils.py:326-364 (eps=1e-12)
* gan_loss('gan')      — BCE-with-logits vs filled labels
  (reference KAIR models/loss.py:135-172, 'gan' type)
"""

from __future__ import annotations

import jax.numpy as jnp
import optax


def l1_loss(pred: jnp.ndarray, target: jnp.ndarray) -> jnp.ndarray:
    return jnp.abs(pred - target).mean()


def mse_loss(pred: jnp.ndarray, target: jnp.ndarray) -> jnp.ndarray:
    return jnp.square(pred - target).mean()


def charbonnier_loss(pred: jnp.ndarray, target: jnp.ndarray, eps: float = 1e-12) -> jnp.ndarray:
    return jnp.sqrt(jnp.square(pred - target) + eps).mean()


def tv_loss(x: jnp.ndarray, weight: float = 1.0) -> jnp.ndarray:
    """Total-variation smoothness loss on NHWC images
    (library surface parity with KAIR models/loss.py:178-207)."""
    dh = jnp.square(x[:, 1:, :, :] - x[:, :-1, :, :]).mean()
    dw = jnp.square(x[:, :, 1:, :] - x[:, :, :-1, :]).mean()
    return weight * 2.0 * (dh + dw)


def gan_loss(logits: jnp.ndarray, target_is_real: bool,
             real_label_val: float = 1.0, fake_label_val: float = 0.0) -> jnp.ndarray:
    """Vanilla (BCE-with-logits) GAN loss against a constant label map."""
    label = real_label_val if target_is_real else fake_label_val
    labels = jnp.full_like(logits, label)
    return optax.sigmoid_binary_cross_entropy(logits, labels).mean()
