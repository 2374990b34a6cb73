"""Training machinery: train step, cosine schedule, checkpoints, GAN step,
multi-device data parallelism on the CPU mesh."""

import os

import numpy as np
import pytest

import jax
import jax.numpy as jnp

from sisr_tpu.configs.model_config import get_optimizer, get_scheduler
from sisr_tpu.models.hit_sir_pro import HiTSIR
from sisr_tpu.train.losses import l1_loss
from sisr_tpu.train.train_state import (GANTrainState, TrainState,
                                        create_train_state, make_gan_train_step,
                                        make_train_step, set_learning_rate)
from sisr_tpu.train import checkpoint as ckpt


TINY = dict(is_mult_size_conv_feat_extract=True, is_channel_spatial_attn=True,
            is_fusion=True, embed_dim=20, depths=(2,), num_heads=(2,),
            base_win_size=(4, 4), mlp_ratio=2.0, upsampler="nearest+conv",
            upscale=4, hier_win_ratios=(0.5, 1))


@pytest.fixture(scope="module")
def tiny_model():
    model = HiTSIR(**TINY)
    variables = model.init(jax.random.PRNGKey(0), jnp.zeros((1, 16, 16, 3)))
    return model, variables


def test_cosine_schedule_matches_torch():
    import torch

    base, floor, epochs = 2e-5, 1e-7, 50
    sched_fn = get_scheduler(base, floor, epochs)
    lin = torch.nn.Linear(1, 1)
    opt = torch.optim.Adam(lin.parameters(), lr=base)
    sched = torch.optim.lr_scheduler.CosineAnnealingLR(opt, T_max=epochs, eta_min=floor)
    for epoch_idx in range(epochs + 1):
        assert abs(sched_fn(epoch_idx) - opt.param_groups[0]["lr"]) < 1e-12
        sched.step()


def test_train_step_reduces_loss(tiny_model):
    model, variables = tiny_model
    tx = get_optimizer("Adam", 1e-3, {"weight_decay": 0, "betas": [0.9, 0.99]})
    state = create_train_state(variables["params"], tx)
    step = make_train_step(model.apply, l1_loss, tx)

    rng = np.random.default_rng(0)
    lr_imgs = jnp.asarray(rng.random((2, 16, 16, 3), dtype=np.float32))
    hr_imgs = jnp.asarray(rng.random((2, 64, 64, 3), dtype=np.float32))
    key = jax.random.PRNGKey(0)

    losses = []
    for i in range(5):
        state, loss = step(state, lr_imgs, hr_imgs, jax.random.fold_in(key, i))
        losses.append(float(loss))
    assert losses[-1] < losses[0]
    assert np.isfinite(losses).all()


def test_set_learning_rate(tiny_model):
    model, variables = tiny_model
    tx = get_optimizer("Adam", 1e-3, {"weight_decay": 0, "betas": [0.9, 0.99]})
    state = create_train_state(variables["params"], tx)
    new_opt = set_learning_rate(state.opt_state, 5e-4)
    import optax

    assert abs(float(optax.tree_utils.tree_get(new_opt, "learning_rate")) - 5e-4) < 1e-12


def test_checkpoint_roundtrip(tiny_model, tmp_path):
    model, variables = tiny_model
    tx = get_optimizer("Adam", 1e-3, {"weight_decay": 0})
    state = create_train_state(variables["params"], tx)
    path = str(tmp_path / "new_epoch_model.pth")
    ckpt.save_checkpoint(path, 7, state.params, state.opt_state)
    loaded = ckpt.load_checkpoint(path, state.params, state.opt_state)
    assert loaded["start_epoch"] == 7
    jax.tree.map(lambda a, b: np.testing.assert_array_equal(np.asarray(a), np.asarray(b)),
                 state.params, loaded["model"])
    jax.tree.map(lambda a, b: np.testing.assert_array_equal(np.asarray(a), np.asarray(b)),
                 state.opt_state, loaded["optimizer"])


def test_load_torch_reference_checkpoint(tmp_path):
    """Reference-layout torch .pth checkpoints load through load_any."""
    import torch
    from pathlib import Path

    blob = np.load(Path(__file__).parent / "golden" / "hit_sir_tiny_full.npz")
    sd = {k[len("sd__"):]: torch.from_numpy(blob[k])
          for k in blob.files if k.startswith("sd__")}
    path = str(tmp_path / "ref.pth")
    torch.save({"start_epoch": 3, "model": sd, "optimizer": {}}, path)

    loaded = ckpt.load_any(path)
    assert loaded["start_epoch"] == 3
    model = HiTSIR(is_mult_size_conv_feat_extract=True, is_channel_spatial_attn=True,
                   is_fusion=True, embed_dim=20, depths=(3,), num_heads=(2,),
                   base_win_size=(4, 4), mlp_ratio=2, upsampler="nearest+conv",
                   upscale=4, hier_win_ratios=(0.5, 1, 2))
    x = jnp.asarray(blob["input"].transpose(0, 2, 3, 1))
    y = model.apply({"params": loaded["model"]}, x)
    ref = blob["output"].transpose(0, 2, 3, 1)
    assert np.abs(np.asarray(y) - ref).max() < 1e-3


def test_gan_train_step(tiny_model):
    from sisr_tpu.models.discriminator import UNetDiscriminatorSN

    model, variables = tiny_model
    disc = UNetDiscriminatorSN(ndf=16)
    d_vars = disc.init(jax.random.PRNGKey(1), jnp.zeros((1, 64, 64, 3)))

    g_tx = get_optimizer("Adam", 1e-4, {"weight_decay": 0})
    d_tx = get_optimizer("Adam", 1e-4, {"weight_decay": 0})

    def d_apply(vs, x, update_stats=False, mutable=None):
        if mutable:
            return disc.apply(vs, x, update_stats, mutable=mutable)
        return disc.apply(vs, x, update_stats), {"spectral": vs["spectral"]}

    step = make_gan_train_step(model.apply, d_apply, l1_loss, None, g_tx, d_tx)
    state = GANTrainState(
        g=create_train_state(variables["params"], g_tx),
        d=create_train_state(d_vars["params"], d_tx),
        d_variables={"spectral": d_vars["spectral"]})

    rng = np.random.default_rng(1)
    lr_imgs = jnp.asarray(rng.random((2, 16, 16, 3), dtype=np.float32))
    hr_imgs = jnp.asarray(rng.random((2, 64, 64, 3), dtype=np.float32))
    state, g_loss, d_loss = step(state, lr_imgs, hr_imgs, jax.random.PRNGKey(2))
    assert np.isfinite(float(g_loss)) and np.isfinite(float(d_loss))
    # spectral-norm u vectors advanced
    assert not np.allclose(
        np.asarray(d_vars["spectral"]["conv1"]["u"]),
        np.asarray(state.d_variables["spectral"]["conv1"]["u"]))


def test_data_parallel_step_on_mesh(tiny_model):
    """DP over the 8-device CPU mesh: sharded batch, replicated params."""
    from jax.sharding import NamedSharding, PartitionSpec as P
    from sisr_tpu.parallel.mesh import make_mesh, replicate, shard_batch

    model, variables = tiny_model
    n = min(8, jax.device_count())
    mesh = make_mesh(n)
    tx = get_optimizer("Adam", 1e-3, {"weight_decay": 0})
    state = replicate(mesh, create_train_state(variables["params"], tx))
    step = make_train_step(model.apply, l1_loss, tx)

    rng = np.random.default_rng(2)
    lr_imgs, hr_imgs = shard_batch(mesh, (
        rng.random((2 * n, 16, 16, 3), dtype=np.float32),
        rng.random((2 * n, 64, 64, 3), dtype=np.float32)))
    key = jax.device_put(jax.random.PRNGKey(0), NamedSharding(mesh, P()))
    state2, loss = step(state, lr_imgs, hr_imgs, key)
    assert np.isfinite(float(loss))

    # gradient math must match the single-device result on the same batch
    state_sd = create_train_state(variables["params"], tx)
    _, loss_sd = step(state_sd, jnp.asarray(np.asarray(lr_imgs)),
                      jnp.asarray(np.asarray(hr_imgs)), jax.random.PRNGKey(0))
    assert abs(float(loss) - float(loss_sd)) < 1e-5


def test_train_steps_match_torch_reference():
    """Six Adam steps lockstep with the recorded torch run (same init
    weights, same batches): verifies model forward, gradients, L1 loss and
    the optimizer update in one shot.  Golden: tools/make_goldens.py
    make_train_goldens (reference loop experiments/experiment.py:326-350)."""
    from pathlib import Path

    import optax
    from sisr_tpu.models.hit_sir_pro import HiTSIR
    from sisr_tpu.models.torch_port import convert_hit_sir_state_dict

    blob = np.load(Path(__file__).parent / "golden" / "train_steps_tiny_full.npz")
    sd = {k[len("sd__"):]: blob[k] for k in blob.files if k.startswith("sd__")}
    model = HiTSIR(
        is_mult_size_conv_feat_extract=True, is_channel_spatial_attn=True,
        is_fusion=True, embed_dim=20, depths=(3,), num_heads=(2,),
        base_win_size=(4, 4), mlp_ratio=2, upsampler="nearest+conv",
        upscale=4, hier_win_ratios=(0.5, 1, 2))
    params = convert_hit_sir_state_dict(sd)["params"]
    opt = optax.adam(2e-4)  # torch.optim.Adam defaults (b1 .9, b2 .999, eps 1e-8)
    opt_state = opt.init(params)

    @jax.jit
    def step(params, opt_state, x, y):
        def loss_fn(p):
            return jnp.abs(model.apply({"params": p}, x) - y).mean()

        loss, grads = jax.value_and_grad(loss_fn)(params)
        updates, opt_state = opt.update(grads, opt_state, params)
        return optax.apply_updates(params, updates), opt_state, loss

    losses = []
    for i in range(blob["lrs"].shape[0]):
        x = jnp.asarray(blob["lrs"][i].transpose(0, 2, 3, 1))
        y = jnp.asarray(blob["hrs"][i].transpose(0, 2, 3, 1))
        params, opt_state, loss = step(params, opt_state, x, y)
        losses.append(float(loss))
    np.testing.assert_allclose(losses, blob["losses"], rtol=3e-4, atol=1e-6)
