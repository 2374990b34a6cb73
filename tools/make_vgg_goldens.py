"""Generate random-weight VGG / LPIPS golden fixtures (torch CPU).

Neither torchvision nor the lpips package is installed here, so this script
builds the exact torch module layouts they define — torchvision
``vgg19(...).features`` / ``vgg16(...).features`` Sequentials (state_dict keys
``features.N.{weight,bias}``) and the lpips-vgg head — with RANDOM weights,
and records (state_dict, inputs, outputs) to tests/golden/.  The semantics
replicated:

  * KAIR VGGFeatureExtractor (参考资料/KAIR_master/models/loss.py:54-96):
    ImageNet input norm, tap = output of features[:idx+1] for
    idx in [2, 7, 16, 25, 34] (the conv1_2/2_2/3_4/4_4/5_4 PRE-relu outputs),
    and the weighted-L1 PerceptualLoss over them (:99-130).
  * lpips.LPIPS(net='vgg'): scaling layer (shift/scale), vgg16 relu taps
    [3, 8, 15, 22, 29], unit-normalize, squared diff, 1x1 lin heads,
    spatial mean, sum.

The committed .npz files are the oracle proving convert_torchvision_vgg /
convert_lpips map torch weights to identical features.
"""

from __future__ import annotations

from pathlib import Path

import numpy as np
import torch
import torch.nn as nn
import torch.nn.functional as F

GOLDEN_DIR = Path(__file__).resolve().parents[1] / "tests" / "golden"

# real torchvision channel ladders divided by 8: identical layer/index
# structure (what the converters are sensitive to) at committable .npz size
SCALE = 8
VGG19_CFG = [c if c == "M" else c // SCALE for c in
             (64, 64, "M", 128, 128, "M", 256, 256, 256, 256, "M",
              512, 512, 512, 512, "M", 512, 512, 512, 512, "M")]
VGG16_CFG = [c if c == "M" else c // SCALE for c in
             (64, 64, "M", 128, 128, "M", 256, 256, 256, "M",
              512, 512, 512, "M", 512, 512, 512, "M")]


def make_features(cfg) -> nn.Sequential:
    """torchvision.models.vgg.make_layers(cfg) replica (batch_norm=False)."""
    layers, in_c = [], 3
    for v in cfg:
        if v == "M":
            layers.append(nn.MaxPool2d(kernel_size=2, stride=2))
        else:
            layers += [nn.Conv2d(in_c, v, kernel_size=3, padding=1),
                       nn.ReLU(inplace=True)]
            in_c = v
    return nn.Sequential(*layers)


def tap_outputs(features: nn.Sequential, x: torch.Tensor, taps):
    outs, cur = [], x
    for idx, layer in enumerate(features):
        cur = layer(cur)
        if idx in taps:
            outs.append(cur.clone())
        if idx >= max(taps):
            break
    return outs


def main():
    torch.manual_seed(0)
    rng = np.random.default_rng(0)

    # ---------------- VGG19 / KAIR perceptual -------------------------------
    vgg19 = make_features(VGG19_CFG)
    with torch.no_grad():
        for p in vgg19.parameters():
            p.copy_(torch.randn_like(p) * 0.05)
    x = torch.tensor(rng.random((1, 3, 24, 24), dtype=np.float32))
    gt = torch.tensor(rng.random((1, 3, 24, 24), dtype=np.float32))

    mean = torch.tensor([0.485, 0.456, 0.406]).view(1, 3, 1, 1)
    std = torch.tensor([0.229, 0.224, 0.225]).view(1, 3, 1, 1)
    taps19 = (2, 7, 16, 25, 34)
    with torch.no_grad():
        fx = tap_outputs(vgg19, (x - mean) / std, taps19)
        fgt = tap_outputs(vgg19, (gt - mean) / std, taps19)
        weights = [0.1, 0.1, 1.0, 1.0, 1.0]
        perceptual = sum(w * F.l1_loss(a, b)
                         for w, a, b in zip(weights, fx, fgt))

    payload = {"x": x.numpy(), "gt": gt.numpy(),
               "perceptual": np.float32(perceptual.item())}
    for k, v in vgg19.state_dict().items():
        payload[f"sd.features.{k}"] = v.numpy()
    for i, t in enumerate(fx):
        payload[f"tap{i}"] = t.numpy()
    np.savez_compressed(GOLDEN_DIR / "vgg19_random.npz", **payload)
    print("vgg19_random.npz:", [t.shape for t in fx], "loss", perceptual.item())

    # ---------------- VGG16 / lpips -----------------------------------------
    vgg16 = make_features(VGG16_CFG)
    with torch.no_grad():
        for p in vgg16.parameters():
            p.copy_(torch.randn_like(p) * 0.05)
    taps16 = (3, 8, 15, 22, 29)
    chans = (64 // SCALE, 128 // SCALE, 256 // SCALE, 512 // SCALE, 512 // SCALE)
    lins = [torch.randn(1, c, 1, 1) * 0.2 for c in chans]

    shift = torch.tensor([-0.030, -0.088, -0.188]).view(1, 3, 1, 1)
    scale = torch.tensor([0.458, 0.448, 0.450]).view(1, 3, 1, 1)

    def lpips_forward(a01, b01):
        # lpips.LPIPS(net='vgg', normalize=True) forward
        a = (2.0 * a01 - 1.0 - shift) / scale
        b = (2.0 * b01 - 1.0 - shift) / scale
        fa = tap_outputs(vgg16, a, taps16)
        fb = tap_outputs(vgg16, b, taps16)
        total = 0.0
        for ta, tb, lin in zip(fa, fb, lins):
            na = ta / (ta.pow(2).sum(dim=1, keepdim=True).sqrt() + 1e-10)
            nb = tb / (tb.pow(2).sum(dim=1, keepdim=True).sqrt() + 1e-10)
            diff = (na - nb) ** 2
            total = total + F.conv2d(diff, lin).mean(dim=(1, 2, 3))
        return total

    a01 = torch.tensor(rng.random((1, 3, 24, 24), dtype=np.float32))
    b01 = torch.tensor(rng.random((1, 3, 24, 24), dtype=np.float32))
    with torch.no_grad():
        val = lpips_forward(a01, b01)

    payload = {"a": a01.numpy(), "b": b01.numpy(),
               "lpips": val.numpy().astype(np.float32)}
    for k, v in vgg16.state_dict().items():
        payload[f"sd.features.{k}"] = v.numpy()
    for i, lin in enumerate(lins):
        payload[f"lin{i}.model.1.weight"] = lin.numpy()
    np.savez_compressed(GOLDEN_DIR / "lpips_vgg_random.npz", **payload)
    print("lpips_vgg_random.npz: lpips =", float(val))


if __name__ == "__main__":
    main()
