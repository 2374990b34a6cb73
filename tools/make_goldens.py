"""Generate golden activation fixtures from the reference PyTorch model.

Runs the *reference* implementation (mounted read-only at /root/reference) on
torch-CPU with fixed seeds and records (state_dict, input, intermediate and
final activations) into tests/golden/*.npz.  The committed .npz files are the
parity oracle for the TPU implementation; this script is only needed to
regenerate them and requires the reference mount.

The reference imports timm and huggingface_hub; timm is not installed here,
so a minimal shim providing DropPath/to_2tuple/trunc_normal_ is injected
(these are standard utilities, reimplemented independently below).
"""

from __future__ import annotations

import itertools
import sys
import types
from pathlib import Path

import numpy as np
import torch

REPO = Path(__file__).resolve().parents[1]
GOLDEN_DIR = REPO / "tests" / "golden"
REFERENCE = "/root/reference"


def _install_timm_shim():
    import collections.abc

    timm = types.ModuleType("timm")
    models = types.ModuleType("timm.models")
    layers = types.ModuleType("timm.models.layers")

    class DropPath(torch.nn.Module):
        def __init__(self, drop_prob=0.0):
            super().__init__()
            self.drop_prob = drop_prob

        def forward(self, x):
            if self.drop_prob == 0.0 or not self.training:
                return x
            keep = 1 - self.drop_prob
            mask = torch.bernoulli(torch.full((x.shape[0],) + (1,) * (x.ndim - 1), keep))
            return x / keep * mask

    def to_2tuple(x):
        if isinstance(x, collections.abc.Iterable):
            return tuple(x)
        return (x, x)

    def trunc_normal_(tensor, mean=0.0, std=1.0, a=-2.0, b=2.0):
        with torch.no_grad():
            tensor.normal_(mean, std).clamp_(a, b)
        return tensor

    layers.DropPath = DropPath
    layers.to_2tuple = to_2tuple
    layers.trunc_normal_ = trunc_normal_
    models.layers = layers
    timm.models = models
    sys.modules.setdefault("timm", timm)
    sys.modules.setdefault("timm.models", models)
    sys.modules.setdefault("timm.models.layers", layers)


def make_model_goldens():
    _install_timm_shim()
    sys.path.insert(0, REFERENCE)
    from models.hit_sir_pro import HiT_SIR  # noqa: the reference implementation

    cases = {
        # exercises: win < base (min path), win == base, pooled win > base,
        # reflect padding on both axes, MSCE+SCA+fusion, nearest+conv head
        "tiny_full": dict(
            kwargs=dict(
                is_mult_size_conv_feat_extract=True,
                is_channel_spatial_attn=True,
                is_fusion=True,
                embed_dim=20,
                depths=[3],
                num_heads=[2],
                base_win_size=[4, 4],
                mlp_ratio=2,
                upsampler="nearest+conv",
                upscale=4,
                hier_win_ratios=[0.5, 1, 2],
            ),
            shape=(1, 3, 12, 10),
        ),
        # all ablations off + lightweight head
        "tiny_plain": dict(
            kwargs=dict(
                is_mult_size_conv_feat_extract=False,
                is_channel_spatial_attn=False,
                is_fusion=False,
                embed_dim=20,
                depths=[2, 2],
                num_heads=[2, 2],
                base_win_size=[4, 4],
                mlp_ratio=2,
                upsampler="pixelshuffledirect",
                upscale=4,
                hier_win_ratios=[0.5, 1],
            ),
            shape=(2, 3, 8, 8),
        ),
        # classical pixelshuffle head, x2
        "tiny_ps_x2": dict(
            kwargs=dict(
                is_mult_size_conv_feat_extract=False,
                is_channel_spatial_attn=True,
                is_fusion=True,
                embed_dim=20,
                depths=[2],
                num_heads=[2],
                base_win_size=[4, 4],
                mlp_ratio=2,
                upsampler="pixelshuffle",
                upscale=2,
                hier_win_ratios=[1, 2],
            ),
            shape=(1, 3, 8, 12),
        ),
        # flagship-shaped stage: full hierarchical window ladder 4..64 incl.
        # the 48-window reflect pad, embed_dim 60 / 6 heads (d=5)
        "stage_hier": dict(
            kwargs=dict(
                is_mult_size_conv_feat_extract=True,
                is_channel_spatial_attn=True,
                is_fusion=True,
                embed_dim=60,
                depths=[6],
                num_heads=[6],
                base_win_size=[8, 8],
                mlp_ratio=2,
                upsampler="nearest+conv",
                upscale=4,
                hier_win_ratios=[0.5, 1, 2, 4, 6, 8],
            ),
            shape=(1, 3, 40, 36),
        ),
    }

    GOLDEN_DIR.mkdir(parents=True, exist_ok=True)
    for name, case in cases.items():
        torch.manual_seed(1234)
        model = HiT_SIR(**case["kwargs"]).eval()
        x = torch.rand(*case["shape"], generator=torch.Generator().manual_seed(7))

        grabbed = {}

        def hook(tag):
            def fn(_m, _inp, out):
                grabbed[tag] = out.detach().numpy()
            return fn

        model.conv_first.register_forward_hook(hook("shallow"))
        model.layers[0].register_forward_hook(hook("rhtb0"))
        model.layers[0].residual_group.blocks[0].correlation.register_forward_hook(hook("scc0"))
        with torch.no_grad():
            y = model(x)

        blob = {
            "input": x.numpy(),
            "output": y.numpy(),
            **{f"act__{k}": v for k, v in grabbed.items()},
            **{f"sd__{k}": v.numpy() for k, v in model.state_dict().items()},
        }
        np.savez_compressed(GOLDEN_DIR / f"hit_sir_{name}.npz", **blob)
        print(f"{name}: in={tuple(x.shape)} out={tuple(y.shape)} "
              f"params={sum(p.numel() for p in model.parameters())}")


def make_flagship_golden():
    """Flagship-scale forward golden (embed_dim 180, 6x6, windows 4..64).

    The full state_dict would be ~40 MB — the .npz stores only the manifest
    (names+shapes); values are rebuilt deterministically on both sides by
    sisr_tpu.utils.param_synth.synth_state_dict.  The reference forward runs
    in float32 (the reference builds f32 coordinate grids at forward time,
    blocking a full-f64 pass); the parity test bounds rms against it and a
    separate bound covers bf16 drift.
    """
    _install_timm_shim()
    sys.path.insert(0, REFERENCE)
    sys.path.insert(0, str(REPO))
    from models.hit_sir_pro import HiT_SIR  # noqa: reference implementation
    from sisr_tpu.utils.param_synth import synth_state_dict

    torch.manual_seed(0)
    model = HiT_SIR(
        is_mult_size_conv_feat_extract=True,
        is_channel_spatial_attn=True,
        is_fusion=True,
        embed_dim=180,
        depths=[6] * 6,
        num_heads=[6] * 6,
        base_win_size=[8, 8],
        mlp_ratio=2,
        upsampler="nearest+conv",
        upscale=4,
        hier_win_ratios=[0.5, 1, 2, 4, 6, 8, 10, 12],
    ).eval()
    manifest = [(k, tuple(v.shape)) for k, v in model.state_dict().items()]
    synth = synth_state_dict(manifest)
    model.load_state_dict({k: torch.from_numpy(v) for k, v in synth.items()})
    # float32 forward — the reference builds f32 tensors internally at
    # forward time (DynamicPosBias coordinate grids), so f64 won't compose

    n_params = sum(p.numel() for p in model.parameters())
    x = torch.rand(1, 3, 64, 64, generator=torch.Generator().manual_seed(7))
    with torch.no_grad():
        y = model(x)

    blob = {
        "input": x.numpy().astype(np.float32),
        "output": y.numpy(),
        "n_params": np.int64(n_params),
        "manifest_names": np.array([k for k, _ in manifest]),
        "manifest_shapes": np.array([",".join(map(str, s)) for _, s in manifest]),
    }
    np.savez_compressed(GOLDEN_DIR / "hit_sir_flagship.npz", **blob)
    print(f"flagship: out={tuple(y.shape)} params={n_params}")


def _install_torchvision_shim():
    """reference utils/utils.py imports torchvision.transforms.functional at
    module level; imresize itself never touches it."""
    tv = types.ModuleType("torchvision")
    transforms = types.ModuleType("torchvision.transforms")
    functional = types.ModuleType("torchvision.transforms.functional")
    functional.to_tensor = None
    functional.to_pil_image = None
    functional.hflip = None
    functional.vflip = None
    functional.InterpolationMode = None
    transforms.functional = functional
    tv.transforms = transforms
    sys.modules.setdefault("torchvision", tv)
    sys.modules.setdefault("torchvision.transforms", transforms)
    sys.modules.setdefault("torchvision.transforms.functional", functional)


def make_resize_goldens():
    _install_torchvision_shim()
    sys.path.insert(0, REFERENCE)
    from utils.utils import imresize  # reference MATLAB-parity resampler

    rng = np.random.default_rng(0)
    img = rng.random((3, 13, 17), dtype=np.float32)
    blob = {"input": img}
    for scale in (0.25, 0.5, 0.3, 2.0, 1.7, 4.0):
        out = imresize(torch.from_numpy(img), scale, antialiasing=True)
        blob[f"scale_{scale}"] = out.numpy()
    out = imresize(torch.from_numpy(img), 0.25, antialiasing=False)
    blob["scale_0.25_noaa"] = out.numpy()
    GOLDEN_DIR.mkdir(parents=True, exist_ok=True)
    np.savez_compressed(GOLDEN_DIR / "imresize.npz", **blob)
    print("imresize goldens written")


def make_metric_goldens():
    """SSIM known-answer vectors from KAIR's MATLAB-parity calculate_ssim
    (参考资料/KAIR_master/utils/utils_image.py:647-699) — an oracle
    independent of ops/metrics.py for the gaussian_weights SSIM variant
    (skimage's gaussian mode implements the same Wang-et-al algorithm)."""
    sys.path.insert(0, REFERENCE)
    import importlib

    ui = importlib.import_module("参考资料.KAIR_master.utils.utils_image")

    rng = np.random.default_rng(5)
    base = rng.random((37, 45)).astype(np.float64)
    cases = {
        "noisy": np.clip(base + rng.normal(0, 0.05, base.shape), 0, 1),
        "shifted": np.clip(base * 0.9 + 0.03, 0, 1),
        "blurred": np.clip((base + np.roll(base, 1, 0) + np.roll(base, 1, 1)) / 3, 0, 1),
    }
    blob = {"a": base.astype(np.float32)}
    for name, b in cases.items():
        blob[f"b_{name}"] = b.astype(np.float32)
        blob[f"ssim_{name}"] = np.float64(
            ui.calculate_ssim(base * 255.0, b * 255.0, border=0))
        blob[f"psnr_{name}"] = np.float64(
            ui.calculate_psnr(base * 255.0, b * 255.0, border=0))
    np.savez_compressed(GOLDEN_DIR / "metrics_matlab.npz", **blob)
    print("metric goldens written:",
          {k: float(v) for k, v in blob.items() if k.startswith("ssim")})


def make_discriminator_goldens():
    _install_timm_shim()
    sys.path.insert(0, REFERENCE)
    import importlib

    disc_mod = importlib.import_module("参考资料.KAIR_master.models.network_discriminator")

    torch.manual_seed(99)
    model = disc_mod.Discriminator_UNet()
    x = torch.rand(1, 3, 32, 32, generator=torch.Generator().manual_seed(3))
    # converge the spectral-norm power iteration (train-mode forwards update
    # u/v in place); a fresh init has a meaningless sigma estimate
    model.train()
    with torch.no_grad():
        for _ in range(30):
            model(x)
    model.eval()
    with torch.no_grad():
        y = model(x)
    blob = {"input": x.numpy(), "output": y.numpy(),
            **{f"sd__{k}": v.numpy() for k, v in model.state_dict().items()}}
    np.savez_compressed(GOLDEN_DIR / "discriminator_unet.npz", **blob)
    print(f"discriminator: out={tuple(y.shape)} "
          f"params={sum(p.numel() for p in model.parameters())}")


def make_train_goldens():
    """Six Adam steps of the reference model on fixed batches: the oracle for
    step-for-step training parity (model + grads + optimizer + L1 loss).
    Reference training loop semantics: experiments/experiment.py:326-350
    (L1Loss mean reduction, torch.optim.Adam defaults)."""
    _install_timm_shim()
    sys.path.insert(0, REFERENCE)
    from models.hit_sir_pro import HiT_SIR

    torch.manual_seed(7)
    model = HiT_SIR(
        is_mult_size_conv_feat_extract=True,
        is_channel_spatial_attn=True,
        is_fusion=True,
        embed_dim=20,
        depths=[3],
        num_heads=[2],
        base_win_size=[4, 4],
        mlp_ratio=2,
        upsampler="nearest+conv",
        upscale=4,
        hier_win_ratios=[0.5, 1, 2],
    )
    model.train()
    rng = np.random.default_rng(11)
    n_steps = 6
    lrs = rng.random((n_steps, 2, 3, 16, 16)).astype(np.float32)
    hrs = rng.random((n_steps, 2, 3, 64, 64)).astype(np.float32)
    # .copy(): numpy() views alias the live tensors, which Adam then
    # mutates in place — without the copy the npz records FINAL weights
    sd = {k: v.detach().numpy().copy() for k, v in model.state_dict().items()}
    opt = torch.optim.Adam(model.parameters(), lr=2e-4)
    losses = []
    for i in range(n_steps):
        out = model(torch.from_numpy(lrs[i]))
        loss = (out - torch.from_numpy(hrs[i])).abs().mean()
        opt.zero_grad()
        loss.backward()
        opt.step()
        losses.append(float(loss))
    np.savez(GOLDEN_DIR / "train_steps_tiny_full.npz",
             **{f"sd__{k}": v for k, v in sd.items()},
             lrs=lrs, hrs=hrs, losses=np.asarray(losses, np.float64))
    print("train losses:", losses)


def make_gan_train_goldens():
    """Four generator Adam steps of the full GAN composite loss — pixel L1 +
    1.0 x VGG19 perceptual + 0.1 x adversarial BCE against a frozen
    spectral-norm UNet discriminator — recorded loss-for-loss (reference
    experiments/hitsir_pro_gan_experiment.py:117-143; KAIR models/loss.py
    PerceptualLoss/GANLoss).  The discriminator is eval-frozen so its
    spectral u/v stream stays fixed (its own update path is covered by the
    discriminator parity + power-iteration tests)."""
    _install_timm_shim()
    sys.path.insert(0, REFERENCE)
    sys.path.insert(0, str(REPO / "tools"))
    import importlib

    import torch.nn.functional as F
    from make_vgg_goldens import VGG19_CFG, make_features, tap_outputs
    from models.hit_sir_pro import HiT_SIR

    disc_mod = importlib.import_module(
        "参考资料.KAIR_master.models.network_discriminator")

    torch.manual_seed(21)
    g = HiT_SIR(
        is_mult_size_conv_feat_extract=True,
        is_channel_spatial_attn=True,
        is_fusion=True,
        embed_dim=20,
        depths=[3],
        num_heads=[2],
        base_win_size=[4, 4],
        mlp_ratio=2,
        upsampler="nearest+conv",
        upscale=4,
        hier_win_ratios=[0.5, 1, 2],
    )
    d = disc_mod.Discriminator_UNet()
    settle = torch.rand(1, 3, 32, 32, generator=torch.Generator().manual_seed(5))
    d.train()
    with torch.no_grad():
        for _ in range(20):
            d(settle)
    d.eval()
    for p_ in d.parameters():
        p_.requires_grad_(False)

    vgg = make_features(VGG19_CFG)
    with torch.no_grad():
        for p_ in vgg.parameters():
            p_.copy_(torch.randn_like(p_) * 0.05)
    for p_ in vgg.parameters():
        p_.requires_grad_(False)
    mean = torch.tensor([0.485, 0.456, 0.406]).view(1, 3, 1, 1)
    std = torch.tensor([0.229, 0.224, 0.225]).view(1, 3, 1, 1)
    taps19 = (2, 7, 16, 25, 34)
    pweights = [0.1, 0.1, 1.0, 1.0, 1.0]

    def perceptual(a, b):
        fa = tap_outputs(vgg, (a - mean) / std, taps19)
        fb = tap_outputs(vgg, (b.detach() - mean) / std, taps19)
        return sum(w * F.l1_loss(x_, y_) for w, x_, y_ in zip(pweights, fa, fb))

    bce = torch.nn.BCEWithLogitsLoss()

    gsd = {k: v.detach().numpy().copy() for k, v in g.state_dict().items()}
    dsd = {k: v.detach().numpy().copy() for k, v in d.state_dict().items()}
    vsd = {f"features.{k}": v.numpy().copy() for k, v in vgg.state_dict().items()}

    rng = np.random.default_rng(17)
    n_steps = 4
    lrs = rng.random((n_steps, 2, 3, 16, 16)).astype(np.float32)
    hrs = rng.random((n_steps, 2, 3, 64, 64)).astype(np.float32)
    opt = torch.optim.Adam(g.parameters(), lr=2e-4)
    losses = []
    for i in range(n_steps):
        sr = g(torch.from_numpy(lrs[i]))
        hr = torch.from_numpy(hrs[i])
        pred = d(sr)
        loss = (F.l1_loss(sr, hr) + 1.0 * perceptual(sr, hr)
                + 0.1 * bce(pred, torch.ones_like(pred)))
        opt.zero_grad()
        loss.backward()
        opt.step()
        losses.append(float(loss.detach()))
    np.savez_compressed(
        GOLDEN_DIR / "gan_train_steps_tiny_full.npz",
        **{f"sd__{k}": v for k, v in gsd.items()},
        **{f"dsd__{k}": v for k, v in dsd.items()},
        **{f"vsd__{k}": v for k, v in vsd.items()},
        lrs=lrs, hrs=hrs, losses=np.asarray(losses, np.float64))
    print("gan train losses:", losses)


def make_gan_d_step_goldens():
    """Four discriminator Adam steps — BCE(real) + BCE(fake) on fixed
    sr/hr batches with the spectral-norm power iteration advancing u/v on
    BOTH forwards, exactly the reference D update
    (experiments/hitsir_pro_gan_experiment.py:144-165).  Records the
    initial state_dict (incl. weight_u/weight_v buffers), per-step
    l_real/l_fake, and the final state_dict — the oracle for the last
    previously-unverified gradient path (the jitted D update)."""
    _install_timm_shim()
    sys.path.insert(0, REFERENCE)
    import importlib

    import torch.nn.functional as F  # noqa: F401

    disc_mod = importlib.import_module(
        "参考资料.KAIR_master.models.network_discriminator")

    torch.manual_seed(33)
    d = disc_mod.Discriminator_UNet(ndf=16)  # structure-identical, 16x lighter
    settle = torch.rand(1, 3, 32, 32, generator=torch.Generator().manual_seed(7))
    d.train()
    with torch.no_grad():
        for _ in range(5):
            d(settle)
    dsd0 = {k: v.detach().numpy().copy() for k, v in d.state_dict().items()}

    rng = np.random.default_rng(29)
    n_steps = 4
    srs = rng.random((n_steps, 2, 3, 64, 64)).astype(np.float32)
    hrs = rng.random((n_steps, 2, 3, 64, 64)).astype(np.float32)
    bce = torch.nn.BCEWithLogitsLoss()
    opt = torch.optim.Adam(d.parameters(), lr=2e-4)
    l_reals, l_fakes = [], []
    for i in range(n_steps):
        opt.zero_grad()
        pred_real = d(torch.from_numpy(hrs[i]))
        l_real = bce(pred_real, torch.ones_like(pred_real))
        l_real.backward()
        pred_fake = d(torch.from_numpy(srs[i]))
        l_fake = bce(pred_fake, torch.zeros_like(pred_fake))
        l_fake.backward()
        opt.step()
        l_reals.append(float(l_real.detach()))
        l_fakes.append(float(l_fake.detach()))
    dsd1 = {k: v.detach().numpy().copy() for k, v in d.state_dict().items()}
    np.savez_compressed(
        GOLDEN_DIR / "gan_d_steps.npz",
        **{f"d0__{k}": v for k, v in dsd0.items()},
        **{f"d1__{k}": v for k, v in dsd1.items()},
        srs=srs, hrs=hrs,
        l_real=np.asarray(l_reals, np.float64),
        l_fake=np.asarray(l_fakes, np.float64))
    print("gan d-step losses:", list(zip(l_reals, l_fakes)))


if __name__ == "__main__":
    import sys as _sys
    only = _sys.argv[1] if len(_sys.argv) > 1 else None
    if only in (None, "model"):
        make_model_goldens()
    if only in (None, "resize"):
        make_resize_goldens()
    if only in (None, "disc"):
        make_discriminator_goldens()
    if only in (None, "flagship"):
        make_flagship_golden()
    if only in (None, "metrics"):
        make_metric_goldens()
    if only in (None, "train"):
        make_train_goldens()
    if only in (None, "gan_train"):
        make_gan_train_goldens()
    if only in (None, "gan_d"):
        make_gan_d_step_goldens()
