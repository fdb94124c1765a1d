"""Convert a pytorch-i3d Kinetics checkpoint (e.g. ``i3d_pretrained_400.pt``,
reference configs/train.yaml:52) to flax InceptionI3d variables."""
from __future__ import annotations

from typing import Mapping

import numpy as np

from .common import bn_params, conv3d_kernel, load_torch_state_dict

__all__ = ["convert_i3d", "convert_i3d_file"]

_MIXED_BRANCHES = ("b0", "b1a", "b1b", "b2a", "b2b", "b3b")
_MIXED_NAMES = ("Mixed_3b", "Mixed_3c", "Mixed_4b", "Mixed_4c", "Mixed_4d",
                "Mixed_4e", "Mixed_4f", "Mixed_5b", "Mixed_5c")
_CONV_UNITS = ("Conv3d_1a_7x7", "Conv3d_2b_1x1", "Conv3d_2c_3x3")


def _unit(sd: Mapping[str, np.ndarray], tname: str, use_bn: bool = True,
          use_bias: bool = False):
    params = {"kernel": conv3d_kernel(sd[f"{tname}.conv3d.weight"])}
    stats = {}
    if use_bias:
        params["bias"] = sd[f"{tname}.conv3d.bias"]
    if use_bn:
        bn_p, bn_s = bn_params(sd, f"{tname}.bn")
        params["bn"] = bn_p
        stats["bn"] = bn_s
    return params, stats


def convert_i3d(sd: Mapping[str, np.ndarray]) -> dict:
    """torch state_dict -> {'params': ..., 'batch_stats': ...}."""
    params: dict = {}
    stats: dict = {}
    for name in _CONV_UNITS:
        params[name], s = _unit(sd, name)
        if s:
            stats[name] = s
    for name in _MIXED_NAMES:
        params[name], stats[name] = {}, {}
        for br in _MIXED_BRANCHES:
            params[name][br], s = _unit(sd, f"{name}.{br}")
            if s:
                stats[name][br] = s
    params["logits"], _ = _unit(sd, "logits", use_bn=False, use_bias=True)
    return {"params": params, "batch_stats": stats}


def convert_i3d_file(path: str) -> dict:
    return convert_i3d(load_torch_state_dict(path, key=None))
