"""GAN-mode components: discriminator parity, spectral norm, losses, VGG wiring."""

from pathlib import Path

import numpy as np
import pytest

import jax
import jax.numpy as jnp

from sisr_tpu.models.discriminator import UNetDiscriminatorSN
from sisr_tpu.models.torch_port import convert_discriminator_state_dict
from sisr_tpu.train.losses import gan_loss, l1_loss, mse_loss, charbonnier_loss

GOLDEN = Path(__file__).parent / "golden"


def test_discriminator_matches_reference():
    blob = np.load(GOLDEN / "discriminator_unet.npz")
    sd = {k[len("sd__"):]: blob[k] for k in blob.files if k.startswith("sd__")}
    variables = convert_discriminator_state_dict(sd)
    model = UNetDiscriminatorSN()

    x = jnp.asarray(blob["input"].transpose(0, 2, 3, 1))
    y = model.apply(variables, x, False)  # eval mode: stored u,v, no iteration
    y = np.asarray(y).transpose(0, 3, 1, 2)
    ref = blob["output"]
    assert y.shape == ref.shape
    err = np.abs(y - ref).max()
    assert err < 1e-4, f"max abs err {err:.3e}"


def test_discriminator_param_count():
    blob = np.load(GOLDEN / "discriminator_unet.npz")
    sd = {k[len("sd__"):]: blob[k] for k in blob.files if k.startswith("sd__")}
    ref_count = sum(v.size for k, v in sd.items()
                    if k.endswith(("weight", "weight_orig", "bias")))
    model = UNetDiscriminatorSN()
    variables = model.init(jax.random.PRNGKey(0), jnp.zeros((1, 32, 32, 3)))
    n = sum(int(np.prod(p.shape)) for p in jax.tree.leaves(variables["params"]))
    assert n == ref_count == 4_376_897


def test_spectral_norm_power_iteration_updates():
    model = UNetDiscriminatorSN()
    x = jnp.ones((1, 16, 16, 3))
    variables = model.init(jax.random.PRNGKey(0), x)
    _, mutated = model.apply(variables, x, True, mutable=["spectral"])
    u0 = variables["spectral"]["conv1"]["u"]
    u1 = mutated["spectral"]["conv1"]["u"]
    assert not np.allclose(np.asarray(u0), np.asarray(u1))
    # u stays unit-norm
    assert abs(float(jnp.linalg.norm(u1)) - 1.0) < 1e-5


def test_gan_loss_matches_bce():
    import torch

    logits = np.random.default_rng(0).normal(size=(2, 4, 4, 1)).astype(np.float32)
    for real in (True, False):
        ours = float(gan_loss(jnp.asarray(logits), real))
        ref = torch.nn.functional.binary_cross_entropy_with_logits(
            torch.from_numpy(logits),
            torch.full_like(torch.from_numpy(logits), 1.0 if real else 0.0)).item()
        assert abs(ours - ref) < 1e-6


def test_pixel_losses_match_torch():
    import torch

    rng = np.random.default_rng(1)
    a = rng.random((2, 8, 8, 3), dtype=np.float32)
    b = rng.random((2, 8, 8, 3), dtype=np.float32)
    ta, tb = torch.from_numpy(a), torch.from_numpy(b)
    assert abs(float(l1_loss(jnp.asarray(a), jnp.asarray(b)))
               - torch.nn.functional.l1_loss(ta, tb).item()) < 1e-7
    assert abs(float(mse_loss(jnp.asarray(a), jnp.asarray(b)))
               - torch.nn.functional.mse_loss(ta, tb).item()) < 1e-7
    ref_charb = torch.sqrt((ta - tb) ** 2 + 1e-12).mean().item()
    assert abs(float(charbonnier_loss(jnp.asarray(a), jnp.asarray(b))) - ref_charb) < 1e-7


def test_vgg_feature_tap_shapes():
    from sisr_tpu.models.vgg import VGGFeatures, VGG19_CFG

    model = VGGFeatures(cfg=VGG19_CFG, taps=(2, 7, 16, 25, 34))
    variables = model.init(jax.random.PRNGKey(0), jnp.zeros((1, 64, 64, 3)))
    feats = model.apply(variables, jnp.zeros((1, 64, 64, 3)))
    shapes = [tuple(f.shape) for f in feats]
    # torchvision vgg19 taps [2,7,16,25,34] = relu1_2/2_2/3_4/4_4/5_4
    assert shapes == [(1, 64, 64, 64), (1, 32, 32, 128), (1, 16, 16, 256),
                      (1, 8, 8, 512), (1, 4, 4, 512)]


def test_lpips_wiring():
    from sisr_tpu.models.vgg import LPIPSVgg

    model = LPIPSVgg()
    a = jnp.zeros((1, 32, 32, 3))
    b = jnp.ones((1, 32, 32, 3)) * 0.5
    variables = model.init(jax.random.PRNGKey(0), a, b)
    same = model.apply(variables, a, a)
    diff = model.apply(variables, a, b)
    assert abs(float(same[0])) < 1e-6
    # random-init lin heads have arbitrary sign — just require a nonzero response
    assert abs(float(diff[0])) > 1e-6


def test_gan_generator_steps_match_torch_reference():
    """Four generator Adam steps of the full GAN composite loss — pixel L1
    + 1.0 x VGG19 perceptual + 0.1 x adversarial BCE vs a frozen
    spectral-norm discriminator — lockstep with the recorded torch run
    (tools/make_goldens.py make_gan_train_goldens; reference loop
    experiments/hitsir_pro_gan_experiment.py:117-143)."""
    import optax
    from sisr_tpu.models.hit_sir_pro import HiTSIR
    from sisr_tpu.models.torch_port import convert_hit_sir_state_dict
    from sisr_tpu.models.vgg import PerceptualLoss, convert_torchvision_vgg

    blob = np.load(GOLDEN / "gan_train_steps_tiny_full.npz")
    pick = lambda pre: {k[len(pre):]: blob[k] for k in blob.files
                        if k.startswith(pre)}
    g = HiTSIR(
        is_mult_size_conv_feat_extract=True, is_channel_spatial_attn=True,
        is_fusion=True, embed_dim=20, depths=(3,), num_heads=(2,),
        base_win_size=(4, 4), mlp_ratio=2, upsampler="nearest+conv",
        upscale=4, hier_win_ratios=(0.5, 1, 2))
    params = convert_hit_sir_state_dict(pick("sd__"))["params"]
    d_vars = convert_discriminator_state_dict(pick("dsd__"))
    disc = UNetDiscriminatorSN()
    cfg19 = tuple(c if c == "M" else c // 8 for c in
                  (64, 64, "M", 128, 128, "M", 256, 256, 256, 256, "M",
                   512, 512, 512, 512, "M", 512, 512, 512, 512, "M"))
    perc = PerceptualLoss(variables=convert_torchvision_vgg(pick("vsd__")),
                          cfg=cfg19)
    opt = optax.adam(2e-4)
    opt_state = opt.init(params)

    @jax.jit
    def step(params, opt_state, x, y):
        def loss_fn(p):
            sr = g.apply({"params": p}, x)
            logits = disc.apply(d_vars, sr, False)
            return (jnp.abs(sr - y).mean() + 1.0 * perc(sr, y)
                    + 0.1 * gan_loss(logits, True))

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


def test_gan_discriminator_steps_match_torch_reference():
    """Four discriminator Adam steps — BCE(real) + BCE(fake-detached) with
    the spectral-norm power iteration advancing u/v on both forwards —
    lockstep with the recorded torch run (tools/make_goldens.py
    make_gan_d_step_goldens; reference D update
    experiments/hitsir_pro_gan_experiment.py:144-165).  Closes the last
    previously-unverified gradient path (the jitted D update)."""
    import optax

    blob = np.load(GOLDEN / "gan_d_steps.npz")
    pick = lambda pre: {k[len(pre):]: blob[k] for k in blob.files
                        if k.startswith(pre)}
    d0 = convert_discriminator_state_dict(pick("d0__"))
    disc = UNetDiscriminatorSN(ndf=16)
    params = d0["params"]
    spectral = {"spectral": d0["spectral"]}
    opt = optax.adam(2e-4)
    opt_state = opt.init(params)

    @jax.jit
    def dstep(params, opt_state, spectral, hr, sr):
        # mirrors make_gan_train_step's D phase (train_state.py): grads of
        # l_real + l_fake in one pass == the reference's two .backward()s
        def loss_fn(p):
            real_logits, vars1 = disc.apply({"params": p, **spectral}, hr,
                                            True, mutable=["spectral"])
            l_real = gan_loss(real_logits, True)
            fake_logits, vars2 = disc.apply({"params": p, **vars1}, sr,
                                            True, mutable=["spectral"])
            l_fake = gan_loss(fake_logits, False)
            return l_real + l_fake, (l_real, l_fake, vars2)

        (_, (l_real, l_fake, new_vars)), grads = jax.value_and_grad(
            loss_fn, has_aux=True)(params)
        updates, opt_state = opt.update(grads, opt_state, params)
        return (optax.apply_updates(params, updates), opt_state, new_vars,
                l_real, l_fake)

    for i in range(blob["srs"].shape[0]):
        hr = jnp.asarray(blob["hrs"][i].transpose(0, 2, 3, 1))
        sr = jnp.asarray(blob["srs"][i].transpose(0, 2, 3, 1))
        params, opt_state, spectral, l_real, l_fake = dstep(
            params, opt_state, spectral, hr, sr)
        np.testing.assert_allclose(float(l_real), blob["l_real"][i],
                                   rtol=3e-4, atol=1e-6)
        np.testing.assert_allclose(float(l_fake), blob["l_fake"][i],
                                   rtol=3e-4, atol=1e-6)

    # end state lockstep: params AND the u/v power-iteration streams
    d1 = convert_discriminator_state_dict(pick("d1__"))
    got = {"params": params, "spectral": spectral["spectral"]}
    want = {"params": d1["params"], "spectral": d1["spectral"]}
    flat_got, tree_got = jax.tree_util.tree_flatten(got)
    flat_want, tree_want = jax.tree_util.tree_flatten(want)
    assert tree_got == tree_want
    for a, b in zip(flat_got, flat_want):
        np.testing.assert_allclose(np.asarray(a), b, atol=5e-5, rtol=1e-3)
