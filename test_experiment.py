"""Single-image SR inference app (reference test_experiment.py parity).

Loads the best checkpoint for the flagship configuration, runs one LR image
through HiT-SIR-Pro x4 (tiled for arbitrary sizes), clips to [0,1] and saves
(or shows) the result.  Also provides the bicubic-LR generator helper.

    python test_experiment.py path/to/lr.png [-o out.png] [--weights ckpt.pth]
"""

from __future__ import annotations

import argparse
import os

import numpy as np


def create_model(dtype="float32"):
    import jax.numpy as jnp
    from sisr_tpu.models.hit_sir_pro import HiTSIR, flagship_config

    return HiTSIR(**flagship_config(), dtype=jnp.dtype(dtype))


DEFAULT_WEIGHTS = ("weights/hitsir_pro_loss(l1)_mulsizeconvextract(True)_casa(True)"
                   "_fusion_embed_dim(180)_len(depths)(6)_augment/"
                   "best_psnr_ssim_lpips_model.pth")


def load_model_weights(model, weights_path: str):
    import jax
    import jax.numpy as jnp
    from sisr_tpu.train.checkpoint import load_any

    if os.path.exists(weights_path):
        template = jax.eval_shape(
            lambda k: model.init(k, jnp.zeros((1, 64, 64, 3))),
            jax.random.PRNGKey(0))["params"]
        loaded = load_any(weights_path, template)
        print(f"loaded weights from {weights_path} "
              f"(epoch {loaded['start_epoch']})")
        return {"params": loaded["model"]}
    print(f"WARNING: {weights_path} not found — using random init")
    return model.init(jax.random.PRNGKey(0),
                      jnp.zeros((1, 64, 64, 3), jnp.float32))


def parse_tile(spec: str):
    """"192" -> 192 (square) or "192x1920" -> (192, 1920) strip tiles."""
    if "x" in spec:
        th, tw = (int(v) for v in spec.split("x"))
        return (th, tw)
    return int(spec)


def main(img_path: str, out_path: str = None, weights_path: str = DEFAULT_WEIGHTS,
         show: bool = False, tile="192"):
    import jax.numpy as jnp
    from PIL import Image
    from sisr_tpu.parallel.tiling import TiledSR

    model = create_model()
    variables = load_model_weights(model, weights_path)

    with Image.open(img_path) as handle:
        lr = np.asarray(handle.convert("RGB"), dtype=np.float32) / 255.0

    runner = TiledSR(lambda v, x: model.apply(v, x), scale=4,
                     tile=parse_tile(str(tile)))
    sr = np.clip(np.asarray(runner(variables, jnp.asarray(lr))), 0.0, 1.0)
    result = Image.fromarray((sr * 255.0).round().astype(np.uint8))

    if out_path is None:
        stem, ext = os.path.splitext(img_path)
        out_path = f"{stem}_sr{ext or '.png'}"
    result.save(out_path)
    print(f"saved {result.size[0]}x{result.size[1]} SR image to {out_path}")
    if show:
        result.show()
    return out_path


def get_bicubic_lr(img_path: str, scale: int = 4) -> str:
    """Generate a bicubic ÷scale LR image next to the input (helper parity
    with reference test_experiment.py:83-92)."""
    from PIL import Image

    with Image.open(img_path) as handle:
        img = handle.convert("RGB")
        img = img.crop((0, 0, img.width - img.width % scale,
                        img.height - img.height % scale))
        lr = img.resize((img.width // scale, img.height // scale), Image.BICUBIC)
    stem, ext = os.path.splitext(img_path)
    out = f"{stem}_bicubic_lr{ext or '.png'}"
    lr.save(out)
    return out


if __name__ == "__main__":
    p = argparse.ArgumentParser(description=__doc__)
    p.add_argument("image")
    p.add_argument("-o", "--out", default=None)
    p.add_argument("--weights", default=DEFAULT_WEIGHTS)
    p.add_argument("--show", action="store_true")
    p.add_argument("--tile", default="192",
                   help='tile size: "192" (square) or "192x1920" (strips)')
    p.add_argument("--make-lr", action="store_true",
                   help="emit a bicubic LR of the input instead of running SR")
    args = p.parse_args()
    if args.make_lr:
        print(get_bicubic_lr(args.image))
    else:
        main(args.image, args.out, args.weights, args.show, args.tile)
