"""Standalone LPIPS scratch script (reference test.py parity).

Computes LPIPS(net='vgg') between two image files:

    python test.py a.png b.png --weights lpips_vgg.msgpack

Requires converted LPIPS weights (see sisr_tpu.models.vgg.convert_lpips);
pretrained VGG cannot be downloaded in a zero-egress environment, so without
--weights this reports the architecture output under random init (labelled
as such).
"""

from __future__ import annotations

import argparse
import os

import numpy as np


def calculate_lpips(img_path1: str, img_path2: str, weights_path: str = None) -> float:
    import jax
    import jax.numpy as jnp
    from PIL import Image
    from sisr_tpu.models.vgg import LPIPSVgg

    def load(p):
        with Image.open(p) as handle:
            return np.asarray(handle.convert("RGB"), dtype=np.float32) / 255.0

    a = jnp.asarray(load(img_path1))[None]
    b_img = load(img_path2)
    b = jnp.asarray(b_img)[None]

    model = LPIPSVgg()
    if weights_path and os.path.exists(weights_path):
        from flax import serialization
        with open(weights_path, "rb") as f:
            variables = serialization.msgpack_restore(f.read())
        tag = ""
    else:
        variables = model.init(jax.random.PRNGKey(0), a, a)
        tag = " (RANDOM-INIT vgg — relative values only)"
    value = float(model.apply({"params": variables["params"]}, a, b)[0])
    print(f"lpips={value}{tag}")
    return value


if __name__ == "__main__":
    p = argparse.ArgumentParser(description=__doc__)
    p.add_argument("image1")
    p.add_argument("image2", nargs="?", default=None,
                   help="defaults to image1 (self-LPIPS sanity check = 0)")
    p.add_argument("--weights", default=None)
    args = p.parse_args()
    calculate_lpips(args.image1, args.image2 or args.image1, args.weights)
