"""Torch-checkpoint -> flax-params conversion for HiT-SIR-Pro.

The reference saves ``{'start_epoch', 'model': state_dict, 'optimizer': ...}``
.pth files (reference experiments/experiment.py:256-263).  This module maps
that state_dict onto the parameter tree of ``sisr_tpu.models.hit_sir_pro.HiTSIR``
so torch-trained checkpoints can be served on TPU and so parity tests can
compare against torch golden activations.

Tensor layout rules:
  conv weight   (O, I, kh, kw) -> kernel (kh, kw, I, O)
  linear weight (O, I)         -> kernel (I, O)
  layernorm weight/bias        -> scale/bias
"""

from __future__ import annotations

import re
from typing import Dict, Mapping

import numpy as np


def _translate_name(name: str) -> str:
    """Torch module path -> flax module path (dot separated, param name last)."""
    n = name
    n = re.sub(r"^layers\.(\d+)\.residual_group\.blocks\.(\d+)\.", r"layers_\1.blocks_\2.", n)
    n = re.sub(r"^layers\.(\d+)\.conv\.", r"layers_\1.conv.", n)
    n = n.replace("patch_embed.norm.", "patch_embed_norm.")
    n = n.replace("conv_before_upsample.0.", "conv_before_upsample.")
    n = n.replace("mlp.dwconv.depthwise_conv.0.", "mlp.dwconv.")
    # DynamicPosBias sequentials: posN.0 = LayerNorm, posN.2 = Linear
    n = re.sub(r"\.pos\.pos(\d)\.0\.", r".pos.pos\1_norm.", n)
    n = re.sub(r"\.pos\.pos(\d)\.2\.", r".pos.pos\1_linear.", n)
    # pixel-shuffle heads: Sequential indices 0,2,... are convs
    m = re.match(r"^upsample\.(\d+)\.(weight|bias)$", n)
    if m:
        n = f"upsample_conv{int(m.group(1)) // 2}.{m.group(2)}"
    return n


# flax path fragments whose 1-D `weight` is a LayerNorm scale
_NORM_MARKERS = ("norm", "_norm")


def _is_norm(path_parts) -> bool:
    leaf_module = path_parts[-2] if len(path_parts) >= 2 else ""
    return leaf_module.endswith("norm") or leaf_module.startswith("norm")


def convert_hit_sir_state_dict(state_dict: Mapping[str, "np.ndarray"]) -> Dict:
    """Convert a torch HiT_SIR state_dict (tensors or ndarrays) to flax params.

    Returns the ``{'params': ...}`` variables dict expected by HiTSIR.apply.
    """
    params: Dict = {}
    for name, tensor in state_dict.items():
        arr = np.asarray(getattr(tensor, "detach", lambda: tensor)(), dtype=np.float32) \
            if hasattr(tensor, "detach") else np.asarray(tensor, dtype=np.float32)
        flax_name = _translate_name(name)
        parts = flax_name.split(".")
        leaf = parts[-1]
        module_path = parts[:-1]

        if leaf == "weight":
            if arr.ndim == 4:
                key, value = "kernel", arr.transpose(2, 3, 1, 0)
            elif arr.ndim == 2:
                key, value = "kernel", arr.transpose(1, 0)
            elif arr.ndim == 1 and _is_norm(parts):
                key, value = "scale", arr
            else:
                key, value = "scale", arr
        elif leaf == "bias":
            key, value = "bias", arr
        else:  # buffers (none expected)
            key, value = leaf, arr

        node = params
        for p in module_path:
            node = node.setdefault(p, {})
        node[key] = value
    return {"params": params}


def convert_discriminator_state_dict(state_dict: Mapping[str, "np.ndarray"]) -> Dict:
    """KAIR Discriminator_UNet state_dict -> UNetDiscriminatorSN variables.

    Spectral-norm entries come as ``convN.weight_orig`` + ``weight_u`` /
    ``weight_v`` buffers; plain convs as ``convN.weight``/``bias``.
    """
    params: Dict = {}
    spectral: Dict = {}
    for name, tensor in state_dict.items():
        arr = np.asarray(tensor, dtype=np.float32)
        mod, leaf = name.split(".", 1)
        if leaf == "weight_orig":
            params.setdefault(mod, {})["kernel"] = arr.transpose(2, 3, 1, 0)
        elif leaf == "weight_u":
            spectral.setdefault(mod, {})["u"] = arr
        elif leaf == "weight_v":
            spectral.setdefault(mod, {})["v"] = arr
        elif leaf == "weight":
            params.setdefault(mod, {})["kernel"] = arr.transpose(2, 3, 1, 0)
        elif leaf == "bias":
            params.setdefault(mod, {})["bias"] = arr
    return {"params": params, "spectral": spectral}


def load_torch_checkpoint(path: str) -> Dict:
    """Load a reference-layout .pth and return {'start_epoch', 'params'}."""
    import torch

    dic = torch.load(path, map_location="cpu", weights_only=True)
    state_dict = dic["model"] if "model" in dic else dic
    return {
        "start_epoch": int(dic.get("start_epoch", 0)),
        "variables": convert_hit_sir_state_dict(
            {k: v.numpy() for k, v in state_dict.items()}),
    }
