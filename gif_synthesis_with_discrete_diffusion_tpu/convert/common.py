"""Shared helpers for PyTorch -> JAX weight conversion.

The reference's cross-stage checkpoint loading is manual
``torch.load(...)['state_dict']`` with prefix stripping (reference
src/models/multistage_text_motion_model.py:69-70,114-123; utils/evaluator.py:
26-28). Here: load once into a numpy dict, strip prefixes, and map into
flax param/variable trees with explicit layout transposes:

* Conv3d  (O, I, kD, kH, kW)      -> DHWIO  (kD, kH, kW, I, O)
* ConvT3d (I, O, kD, kH, kW)      -> DHWIO  (kD, kH, kW, I, O)
* Linear  (out, in)               -> (in, out)
"""
from __future__ import annotations

from pathlib import Path
from typing import Mapping

import numpy as np

__all__ = ["load_torch_state_dict", "strip_prefix", "conv3d_kernel",
           "conv_transpose3d_kernel", "linear_kernel", "bn_params"]


def load_torch_state_dict(path: str | Path, key: str | None = "auto"
                          ) -> dict[str, np.ndarray]:
    """Load a .pt/.ckpt into {name: float32/int numpy array}."""
    import torch
    obj = torch.load(path, map_location="cpu", weights_only=False)
    if isinstance(obj, Mapping) and key == "auto":
        obj = obj.get("state_dict", obj)
    elif key and isinstance(obj, Mapping) and key in obj:
        obj = obj[key]
    return {k: np.asarray(v.detach().cpu().numpy() if hasattr(v, "detach")
                          else v)
            for k, v in obj.items()}


def strip_prefix(sd: Mapping[str, np.ndarray], prefix: str
                 ) -> dict[str, np.ndarray]:
    out = {k[len(prefix):]: v for k, v in sd.items() if k.startswith(prefix)}
    return out or dict(sd)


def conv3d_kernel(w: np.ndarray) -> np.ndarray:
    return np.transpose(w, (2, 3, 4, 1, 0))


def conv_transpose3d_kernel(w: np.ndarray) -> np.ndarray:
    return np.transpose(w, (2, 3, 4, 0, 1))


def linear_kernel(w: np.ndarray) -> np.ndarray:
    return np.transpose(w, (1, 0))


def bn_params(sd: Mapping[str, np.ndarray], prefix: str):
    """torch BatchNorm -> (flax params, flax batch_stats)."""
    params = {"scale": sd[f"{prefix}.weight"], "bias": sd[f"{prefix}.bias"]}
    stats = {"mean": sd[f"{prefix}.running_mean"],
             "var": sd[f"{prefix}.running_var"]}
    return params, stats
