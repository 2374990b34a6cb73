"""Jitted training steps (PSNR mode and GAN mode).

The reference's epoch loop calls zero_grad/backward/step per batch on one GPU
(experiments/experiment.py:364-380; GAN variant
hitsir_pro_gan_experiment.py:117-165).  The TPU-native shape is a single
pure function per optimizer step — loss, grads, and the optimizer update all
inside one jit — compiled once and fed device-sharded batches.  Data
parallelism is expressed by sharding the batch on the mesh ``data`` axis:
XLA emits the gradient all-reduce over ICI automatically.
"""

from __future__ import annotations

from functools import partial
from typing import Any, Callable, NamedTuple, Optional, Tuple

import jax
import jax.numpy as jnp
import optax


class TrainState(NamedTuple):
    params: Any
    opt_state: optax.OptState


def create_train_state(params, tx: optax.GradientTransformation) -> TrainState:
    return TrainState(params=params, opt_state=tx.init(params))


def set_learning_rate(opt_state, lr: float):
    """Update the injected learning rate (per-epoch cosine schedule driver)."""
    return optax.tree_utils.tree_set(opt_state, learning_rate=lr)


def make_train_step(apply_fn: Callable, loss_fn: Callable,
                    tx: optax.GradientTransformation) -> Callable:
    """Pixel-loss train step: (state, lr_batch, hr_batch, rng) -> (state, loss)."""

    @jax.jit
    def step(state: TrainState, lr_imgs, hr_imgs, rng) -> Tuple[TrainState, jnp.ndarray]:
        def loss_of(params):
            sr = apply_fn({"params": params}, lr_imgs, deterministic=False,
                          rngs={"dropout": rng})
            return loss_fn(sr, hr_imgs)

        loss, grads = jax.value_and_grad(loss_of)(state.params)
        updates, opt_state = tx.update(grads, state.opt_state, state.params)
        params = optax.apply_updates(state.params, updates)
        return TrainState(params, opt_state), loss

    return step


def make_eval_step(apply_fn: Callable) -> Callable:
    """Forward + clip to [0,1] (reference experiment.py:746-748)."""

    @jax.jit
    def step(params, lr_imgs):
        sr = apply_fn({"params": params}, lr_imgs)
        return jnp.clip(sr, 0.0, 1.0)

    return step


class GANTrainState(NamedTuple):
    g: TrainState
    d: TrainState
    d_variables: Any  # discriminator non-param collections (spectral-norm u)


def make_gan_train_step(
    g_apply: Callable,
    d_apply: Callable,
    pixel_loss: Callable,
    perceptual_loss: Optional[Callable],
    g_tx: optax.GradientTransformation,
    d_tx: optax.GradientTransformation,
    perceptual_weight: float = 1.0,
    adversarial_weight: float = 0.1,
) -> Callable:
    """Real-ESRGAN-style two-optimizer step (parity with
    hitsir_pro_gan_experiment.py:117-165):

      G loss = pixel + w_p * perceptual + w_a * BCE(D(sr), real)
      D loss = BCE(D(hr), real) + BCE(D(stop_grad(sr)), fake)
    """
    from sisr_tpu.train.losses import gan_loss

    @jax.jit
    def step(state: GANTrainState, lr_imgs, hr_imgs, rng):
        d_vars = state.d_variables

        def g_loss_of(g_params):
            sr = g_apply({"params": g_params}, lr_imgs, deterministic=False,
                         rngs={"dropout": rng})
            loss = pixel_loss(sr, hr_imgs)
            if perceptual_loss is not None:
                loss = loss + perceptual_weight * perceptual_loss(sr, hr_imgs)
            # torch advances the spectral-norm power iteration on EVERY
            # train-mode forward — including this G-phase one where only
            # requires_grad is off (reference hitsir_pro_gan_experiment.py
            # :128-137) — so u/v advance here too and thread into the D step
            logits, g_d_vars = d_apply({"params": state.d.params, **d_vars},
                                       sr, update_stats=True,
                                       mutable=["spectral"])
            loss = loss + adversarial_weight * gan_loss(logits, True)
            return loss, (sr, g_d_vars)

        ((g_loss, (sr, d_vars)), g_grads) = jax.value_and_grad(
            g_loss_of, has_aux=True)(state.g.params)
        g_updates, g_opt = g_tx.update(g_grads, state.g.opt_state, state.g.params)
        g_params = optax.apply_updates(state.g.params, g_updates)

        sr_detached = jax.lax.stop_gradient(sr)

        def d_loss_of(d_params):
            real_logits, new_vars = d_apply({"params": d_params, **d_vars}, hr_imgs,
                                            update_stats=True, mutable=["spectral"])
            l_real = gan_loss(real_logits, True)
            fake_logits, new_vars = d_apply({"params": d_params, **new_vars}, sr_detached,
                                            update_stats=True, mutable=["spectral"])
            l_fake = gan_loss(fake_logits, False)
            return l_real + l_fake, (l_real, l_fake, new_vars)

        (_, (l_real, l_fake, new_vars)), d_grads = jax.value_and_grad(
            d_loss_of, has_aux=True)(state.d.params)
        d_updates, d_opt = d_tx.update(d_grads, state.d.opt_state, state.d.params)
        d_params = optax.apply_updates(state.d.params, d_updates)

        new_state = GANTrainState(
            g=TrainState(g_params, g_opt),
            d=TrainState(d_params, d_opt),
            d_variables=new_vars,
        )
        d_loss_avg = (l_real + l_fake) / 2.0
        # the reference logs G loss normalized by the sum of loss weights
        g_loss_avg = g_loss / (1.0 + perceptual_weight + adversarial_weight)
        return new_state, g_loss_avg, d_loss_avg

    return step
