"""Checkpoint save/load with the reference's file contract.

The reference keeps five live checkpoints per run (experiments/
experiment.py:69-73, 256-263, 517-537): ``new_epoch_model.pth`` every epoch
and ``best_psnr / best_ssim / best_lpips / best_psnr_ssim_lpips`` on eval
improvements, each storing ``{'start_epoch', 'model', 'optimizer'}``; the GAN
run adds ``discriminator_new_epoch_model.pth``.  The scheduler is *not*
checkpointed — it is reconstructed from start_epoch on resume (:247-252).

Same names and dict shape here; the payload is a flax msgpack pytree instead
of a torch pickle.  ``load_any`` also accepts reference torch .pth files and
routes them through the weight converter, so torch-trained checkpoints can be
resumed/served on TPU directly.
"""

from __future__ import annotations

import os
from typing import Any, Dict, Optional

import jax
import numpy as np
from flax import serialization


def save_checkpoint(path: str, start_epoch: int, params: Any,
                    opt_state: Any = None, extra: Any = None) -> None:
    """``extra`` round-trips auxiliary variable collections (e.g. the
    spectral-norm power-iteration u/v vectors — torch persists those as
    weight_u/weight_v buffers in the state_dict)."""
    payload = {
        "start_epoch": np.int64(start_epoch),
        "model": jax.tree.map(np.asarray, params),
        "optimizer": jax.tree.map(np.asarray, opt_state) if opt_state is not None else {},
    }
    blob = serialization.msgpack_serialize(
        {"start_epoch": payload["start_epoch"],
         "model": serialization.to_state_dict(payload["model"]),
         "optimizer": serialization.to_state_dict(payload["optimizer"]),
         "extra": serialization.to_state_dict(
             jax.tree.map(np.asarray, extra) if extra is not None else {})})
    tmp = path + ".tmp"
    with open(tmp, "wb") as f:
        f.write(blob)
    os.replace(tmp, path)


def _is_torch_pickle(path: str) -> bool:
    with open(path, "rb") as f:
        head = f.read(4)
    return head[:2] == b"PK" or head[:2] == b"\x80\x02" or head[:1] == b"\x80"


def load_checkpoint(path: str, params_template: Any = None,
                    opt_state_template: Any = None) -> Dict:
    """Returns {'start_epoch': int, 'model': params, 'optimizer': opt_state|None}."""
    with open(path, "rb") as f:
        raw = serialization.msgpack_restore(f.read())
    out = {"start_epoch": int(raw["start_epoch"])}
    out["model"] = (serialization.from_state_dict(params_template, raw["model"])
                    if params_template is not None else raw["model"])
    if opt_state_template is not None and raw.get("optimizer"):
        out["optimizer"] = serialization.from_state_dict(
            opt_state_template, raw["optimizer"])
    else:
        out["optimizer"] = None
    out["extra"] = raw.get("extra") or {}
    return out


def load_any(path: str, params_template: Any = None,
             opt_state_template: Any = None) -> Dict:
    """Load either a framework checkpoint or a reference torch .pth."""
    if _is_torch_pickle(path):
        from sisr_tpu.models.torch_port import load_torch_checkpoint

        loaded = load_torch_checkpoint(path)
        return {"start_epoch": loaded["start_epoch"],
                "model": loaded["variables"]["params"],
                "optimizer": None}
    return load_checkpoint(path, params_template, opt_state_template)
