"""CLI: convert torchvision VGG / lpips checkpoints to framework weights.

Enables the gated perceptual-loss and LPIPS metrics on hosts that have the
pretrained torch checkpoints (this build environment has no egress, so the
weights must be brought in as files):

    # VGG19 features for the GAN perceptual loss
    python tools/convert_vgg.py perceptual vgg19.pth vgg19_features.msgpack

    # LPIPS(net='vgg'): torchvision vgg16 + the lpips lin-head checkpoint
    python tools/convert_vgg.py lpips vgg16.pth lpips_vgg.pth lpips_vgg.msgpack

The outputs are flax-msgpack variable files consumed by
``Experiment(lpips_weights_path=...)`` /
``HITSIRPROGANExperiment(perceptual_weights_path=...)`` / ``test.py``.
"""

from __future__ import annotations

import argparse
import sys
from pathlib import Path

sys.path.insert(0, str(Path(__file__).resolve().parents[1]))


def _load_torch(path):
    import torch

    sd = torch.load(path, map_location="cpu", weights_only=True)
    if hasattr(sd, "state_dict"):
        sd = sd.state_dict()
    return {k: v.numpy() for k, v in sd.items()}


def main():
    from flax import serialization
    from sisr_tpu.models.vgg import convert_lpips, convert_torchvision_vgg

    p = argparse.ArgumentParser(description=__doc__)
    sub = p.add_subparsers(dest="mode", required=True)
    pp = sub.add_parser("perceptual")
    pp.add_argument("vgg19_pth")
    pp.add_argument("out_path")
    lp = sub.add_parser("lpips")
    lp.add_argument("vgg16_pth")
    lp.add_argument("lpips_pth")
    lp.add_argument("out_path")
    args = p.parse_args()

    if args.mode == "perceptual":
        variables = convert_torchvision_vgg(_load_torch(args.vgg19_pth))
        out = args.out_path
    else:
        variables = convert_lpips(_load_torch(args.lpips_pth),
                                  _load_torch(args.vgg16_pth))
        out = args.out_path

    with open(out, "wb") as f:
        f.write(serialization.msgpack_serialize(
            {"params": serialization.to_state_dict(variables["params"])}))
    print(f"wrote {out}")


if __name__ == "__main__":
    main()
