"""UNet / Dense SR model families: wiring + forward shapes (BasicSR-style
per-arch tests; these complete config surfaces the reference never shipped
models for)."""

import numpy as np
import pytest

import jax
import jax.numpy as jnp

from sisr_tpu.models.unet_sr import UNetSR
from sisr_tpu.models.dense_sr import DenseSR


def test_unet_forward_shape():
    model = UNetSR(n_channels=16, ch_mults=(1, 2), is_attn=(False, True),
                   n_blocks=1, n_heads=2, upscale=4)
    x = jnp.asarray(np.random.default_rng(0).random((1, 16, 24, 3), np.float32))
    variables = model.init(jax.random.PRNGKey(0), x)
    y = model.apply(variables, x)
    assert y.shape == (1, 64, 96, 3)
    assert np.isfinite(np.asarray(y)).all()


def test_unet_residual_dominates_at_init():
    """With a global nearest residual, a fresh net should stay near the
    upsampled input (stable start for SR training)."""
    from sisr_tpu.ops.resize import nearest_upsample

    model = UNetSR(n_channels=8, ch_mults=(1,), is_attn=(False,), n_blocks=1)
    x = jnp.asarray(np.random.default_rng(1).random((1, 8, 8, 3), np.float32))
    variables = model.init(jax.random.PRNGKey(0), x)
    y = np.asarray(model.apply(variables, x))
    base = np.asarray(nearest_upsample(x, 4))
    assert np.abs(y - base).mean() < 1.0


@pytest.mark.parametrize("flags", [
    dict(is_sa_attn=False, is_fusion=False, is_mult_size_conv_feat_extract=False),
    dict(is_sa_attn=True, is_fusion=True, is_mult_size_conv_feat_extract=True),
])
def test_dense_forward_shape(flags):
    model = DenseSR(num_blocks=(2, 2), skip_blocks=(0,), middle_channels=20,
                    scale=4, **flags)
    x = jnp.asarray(np.random.default_rng(2).random((2, 12, 16, 3), np.float32))
    variables = model.init(jax.random.PRNGKey(0), x)
    y = model.apply(variables, x)
    assert y.shape == (2, 48, 64, 3)
    assert np.isfinite(np.asarray(y)).all()


def test_dense_trains_one_step():
    from sisr_tpu.configs.model_config import get_optimizer
    from sisr_tpu.train.losses import l1_loss
    from sisr_tpu.train.train_state import create_train_state, make_train_step

    model = DenseSR(num_blocks=(1,), middle_channels=20, scale=4)
    rng = np.random.default_rng(3)
    lr_imgs = jnp.asarray(rng.random((2, 8, 8, 3), np.float32))
    hr_imgs = jnp.asarray(rng.random((2, 32, 32, 3), np.float32))
    variables = model.init(jax.random.PRNGKey(0), lr_imgs)
    tx = get_optimizer("Adam", 1e-3, {"weight_decay": 0})
    state = create_train_state(variables["params"], tx)
    step = make_train_step(model.apply, l1_loss, tx)
    state, loss = step(state, lr_imgs, hr_imgs, jax.random.PRNGKey(1))
    assert np.isfinite(float(loss))


def test_hitsir_dormant_knobs():
    """drop_path_rate / ape / resi_connection='3conv' (reference
    models/hit_sir_pro.py:1109,1180-1193,911-918 — defaults off in the
    flagship) wire up and train."""
    from sisr_tpu.models.hit_sir_pro import HiTSIR

    model = HiTSIR(is_mult_size_conv_feat_extract=False,
                   is_channel_spatial_attn=False, is_fusion=False,
                   embed_dim=20, depths=(2,), num_heads=(2,),
                   base_win_size=(4, 4), hier_win_ratios=(0.5, 1),
                   upsampler="pixelshuffledirect", upscale=4,
                   drop_path_rate=0.3, ape=True, resi_connection="3conv")
    x = jnp.asarray(np.random.default_rng(4).random((2, 8, 8, 3), np.float32))
    variables = model.init(jax.random.PRNGKey(0), x)
    params = variables["params"]
    assert params["absolute_pos_embed"].shape == (1, 64, 20)
    assert "0" in params["layers_0"]["conv"] and "4" in params["layers_0"]["conv"]
    y = model.apply(variables, x)
    assert y.shape == (2, 32, 32, 3)
    # stochastic depth active in train mode: two rng draws differ
    y1 = model.apply(variables, x, deterministic=False,
                     rngs={"dropout": jax.random.PRNGKey(1)})
    y2 = model.apply(variables, x, deterministic=False,
                     rngs={"dropout": jax.random.PRNGKey(2)})
    assert not np.allclose(np.asarray(y1), np.asarray(y2))
    assert np.isfinite(np.asarray(y1)).all()
