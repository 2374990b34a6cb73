"""VGG feature extractor + perceptual loss + LPIPS head.

Parity targets:
  * KAIR ``VGGFeatureExtractor`` / ``PerceptualLoss``
    (参考资料/KAIR_master/models/loss.py:54-130): torchvision VGG19 features,
    taps after layers [2, 7, 16, 25, 34] (relu1_2/2_2/3_4/4_4/5_4),
    ImageNet input norm, weighted L1 over taps [0.1, 0.1, 1, 1, 1].
  * lpips.LPIPS(net='vgg'): VGG16 taps (relu1_2/2_2/3_3/4_3/5_3), unit-
    normalized feature differences through learned 1x1 heads, spatially
    averaged and summed.

Pretrained weights cannot be downloaded in this environment (zero egress);
both losses accept a converted-weights pytree (see ``convert_torchvision_vgg``
for torchvision ``features.N.weight`` checkpoints and ``convert_lpips`` for
the lpips package checkpoint).  With no weights supplied the modules run with
random initialization — fine for wiring/tests, documented as a divergence for
metric values.
"""

from __future__ import annotations

from typing import Any, Dict, List, Optional, Sequence, Tuple

import numpy as np
import jax
import jax.numpy as jnp
from flax import linen as nn

Dtype = Any

# channels per conv layer, 'M' = 2x2 maxpool — torchvision cfgs
VGG19_CFG = (64, 64, "M", 128, 128, "M", 256, 256, 256, 256, "M",
             512, 512, 512, 512, "M", 512, 512, 512, 512, "M")
VGG16_CFG = (64, 64, "M", 128, 128, "M", 256, 256, 256, "M",
             512, 512, 512, "M", 512, 512, 512, "M")

IMAGENET_MEAN = (0.485, 0.456, 0.406)
IMAGENET_STD = (0.229, 0.224, 0.225)


def _torch_layer_indices(cfg: Sequence) -> List[int]:
    """torchvision features-module index of each (conv|pool|relu) layer."""
    idx, out = 0, []
    for c in cfg:
        out.append(idx)
        idx += 1 if c == "M" else 2  # conv is followed by an inline ReLU
    return out


class VGGFeatures(nn.Module):
    """VGG conv tower returning activations *after the ReLU* at the requested
    torchvision feature indices."""

    cfg: Sequence = VGG19_CFG
    taps: Sequence[int] = (2, 7, 16, 25, 34)
    use_input_norm: bool = True
    use_range_norm: bool = False
    dtype: Dtype = jnp.float32

    @nn.compact
    def __call__(self, x: jnp.ndarray) -> List[jnp.ndarray]:
        if self.use_range_norm:
            x = (x + 1.0) / 2.0
        if self.use_input_norm:
            mean = jnp.asarray(IMAGENET_MEAN, dtype=x.dtype)
            std = jnp.asarray(IMAGENET_STD, dtype=x.dtype)
            x = (x - mean) / std
        x = x.astype(self.dtype)

        taps = set(self.taps)
        max_tap = max(self.taps)
        outputs = []
        torch_idx = 0
        conv_i = 0
        for c in self.cfg:
            if c == "M":
                x = nn.max_pool(x, (2, 2), strides=(2, 2))
                if torch_idx in taps:
                    outputs.append(x)
                torch_idx += 1
            else:
                x = nn.Conv(c, (3, 3), padding=((1, 1), (1, 1)), dtype=self.dtype,
                            name=f"conv{conv_i}")(x)
                conv_i += 1
                if torch_idx in taps:  # tap on the conv itself (pre-relu)
                    outputs.append(x)
                torch_idx += 1
                x = nn.relu(x)
                if torch_idx in taps:  # tap after relu (the usual case)
                    outputs.append(x)
                torch_idx += 1
            if torch_idx > max_tap:
                break
        return outputs


def convert_torchvision_vgg(state_dict: Dict[str, np.ndarray]) -> Dict:
    """torchvision ``features.N.{weight,bias}`` -> VGGFeatures params."""
    params: Dict = {}
    conv_i = 0
    for key in sorted(state_dict, key=lambda s: int(s.split(".")[1])):
        if not key.endswith("weight"):
            continue
        w = np.asarray(state_dict[key], dtype=np.float32)
        b = np.asarray(state_dict[key.replace("weight", "bias")], dtype=np.float32)
        params[f"conv{conv_i}"] = {"kernel": w.transpose(2, 3, 1, 0), "bias": b}
        conv_i += 1
    return {"params": params}


class PerceptualLoss:
    """Weighted L1 over VGG19 taps (KAIR loss.py:99-130 parity)."""

    def __init__(self, variables: Optional[Dict] = None,
                 feature_layers: Sequence[int] = (2, 7, 16, 25, 34),
                 weights: Sequence[float] = (0.1, 0.1, 1.0, 1.0, 1.0),
                 lossfn_type: str = "l1", dtype: Dtype = jnp.float32,
                 cfg: Sequence = VGG19_CFG):
        self.model = VGGFeatures(cfg=cfg, taps=tuple(feature_layers), dtype=dtype)
        if variables is None:
            variables = self.model.init(jax.random.PRNGKey(0), jnp.zeros((1, 32, 32, 3)))
        self.variables = variables
        self.weights = tuple(weights)
        self.lossfn_type = lossfn_type

    def __call__(self, x: jnp.ndarray, gt: jnp.ndarray) -> jnp.ndarray:
        fx = self.model.apply(self.variables, x)
        fg = self.model.apply(self.variables, jax.lax.stop_gradient(gt))
        total = 0.0
        for w, a, b in zip(self.weights, fx, fg):
            d = a - b
            total = total + w * (jnp.abs(d).mean() if self.lossfn_type == "l1"
                                 else jnp.square(d).mean())
        return total


class LPIPSVgg(nn.Module):
    """LPIPS(net='vgg'): unit-normalize tap features of both images, square the
    difference, 1x1 linear head per tap, spatial mean, sum over taps.

    Input convention matches lpips: images scaled to [-1, 1] internally from
    [0, 1] when ``normalize=True``.
    """

    dtype: Dtype = jnp.float32
    # lpips 'vgg' taps: relu1_2, relu2_2, relu3_3, relu4_3, relu5_3
    taps: Sequence[int] = (3, 8, 15, 22, 29)
    cfg: Sequence = VGG16_CFG

    @nn.compact
    def __call__(self, a: jnp.ndarray, b: jnp.ndarray, normalize: bool = True) -> jnp.ndarray:
        shift = jnp.asarray((-0.030, -0.088, -0.188), dtype=self.dtype)
        scale = jnp.asarray((0.458, 0.448, 0.450), dtype=self.dtype)
        if normalize:
            a = 2.0 * a - 1.0
            b = 2.0 * b - 1.0
        a = (a - shift) / scale
        b = (b - shift) / scale

        vgg = VGGFeatures(cfg=self.cfg, taps=tuple(self.taps),
                          use_input_norm=False, dtype=self.dtype, name="net")
        fa = vgg(a)
        fb = vgg(b)

        total = 0.0
        for i, (xa, xb) in enumerate(zip(fa, fb)):
            na = xa / (jnp.linalg.norm(xa, axis=-1, keepdims=True) + 1e-10)
            nb = xb / (jnp.linalg.norm(xb, axis=-1, keepdims=True) + 1e-10)
            diff = (na - nb) ** 2
            head = nn.Conv(1, (1, 1), use_bias=False, dtype=self.dtype, name=f"lin{i}")
            total = total + head(diff).mean(axis=(1, 2, 3))
        return total


def convert_lpips(lpips_state_dict: Dict[str, np.ndarray],
                  vgg_state_dict: Dict[str, np.ndarray]) -> Dict:
    """lpips package checkpoint (lin heads) + torchvision vgg16 -> LPIPSVgg params."""
    params = convert_torchvision_vgg(vgg_state_dict)["params"]
    out = {"net": params}
    for k, v in lpips_state_dict.items():
        # keys like 'lin0.model.1.weight' with shape (1, C, 1, 1)
        if "weight" not in k:
            continue
        i = int(k.split(".")[0].replace("lin", ""))
        w = np.asarray(v, dtype=np.float32)
        out[f"lin{i}"] = {"kernel": w.transpose(2, 3, 1, 0)}
    return {"params": out}
