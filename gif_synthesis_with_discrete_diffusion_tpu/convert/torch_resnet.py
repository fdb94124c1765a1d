"""Convert torchvision resnet50 weights to flax ResNet50 variables.

The reference instantiates ``resnet50(weights=ResNet50_Weights.IMAGENET1K_V2)``
for start-frame conditioning features (reference
src/datamodules/datasets/ucf101_dataset.py:45-47). This converter maps the
torchvision state_dict (``conv1.weight``, ``layer{1-4}.{i}.conv{1-3}``,
``downsample.{0,1}``, ``fc``) onto models/resnet.py's tree.
"""
from __future__ import annotations

from typing import Mapping

import numpy as np

from .common import bn_params, linear_kernel, load_torch_state_dict

__all__ = ["convert_resnet50", "convert_resnet50_file"]

_STAGE_SIZES = (3, 4, 6, 3)


def _conv2d_kernel(w: np.ndarray) -> np.ndarray:
    """torch (O, I, kH, kW) -> flax HWIO (kH, kW, I, O)."""
    return np.transpose(w, (2, 3, 1, 0))


def _block(sd: Mapping[str, np.ndarray], t: str, has_downsample: bool):
    params: dict = {}
    stats: dict = {}
    for i in (1, 2, 3):
        params[f"conv{i}"] = {"kernel": _conv2d_kernel(sd[f"{t}.conv{i}.weight"])}
        p, s = bn_params(sd, f"{t}.bn{i}")
        params[f"bn{i}"], stats[f"bn{i}"] = p, s
    if has_downsample:
        params["downsample_conv"] = {
            "kernel": _conv2d_kernel(sd[f"{t}.downsample.0.weight"])}
        p, s = bn_params(sd, f"{t}.downsample.1")
        params["downsample_bn"], stats["downsample_bn"] = p, s
    return params, stats


def convert_resnet50(sd: Mapping[str, np.ndarray]) -> dict:
    """torch state_dict -> {'params': ..., 'batch_stats': ...}."""
    params: dict = {"conv1": {"kernel": _conv2d_kernel(sd["conv1.weight"])}}
    stats: dict = {}
    params["bn1"], stats["bn1"] = bn_params(sd, "bn1")
    for li, n_blocks in enumerate(_STAGE_SIZES):
        for bi in range(n_blocks):
            name = f"layer{li + 1}_{bi}"
            params[name], stats[name] = _block(
                sd, f"layer{li + 1}.{bi}", has_downsample=bi == 0)
    if "fc.weight" in sd:
        params["fc"] = {"kernel": linear_kernel(sd["fc.weight"]),
                        "bias": sd["fc.bias"]}
    return {"params": params, "batch_stats": stats}


def convert_resnet50_file(path: str) -> dict:
    return convert_resnet50(load_torch_state_dict(path, key=None))
