"""Inception-I3D video encoder (flax) — the FVD backbone.

Parity with the reference's pytorch-i3d port (reference
src/models/motionencoder/pytorch_i3d.py:7-322): Inception-v1 inflated to 3D,
endpoints Conv3d_1a_7x7 ... Mixed_5c -> Logits, with TF-style *dynamic* SAME
padding (pad depends on input size and stride; front gets the floor — note
this is the opposite split of the VQ-VAE's same-pad convs). Shapes are
static under jit, so the dynamic padding resolves at trace time.

Channels-last (B, T, H, W, C). BatchNorm uses the reference's eps=1e-5 and
is always in inference mode here (the I3D is a frozen evaluator loaded from
the pretrained Kinetics-400 checkpoint via convert/torch_i3d.py).
``__call__`` returns per-class logits averaged over time (B, num_classes) —
exactly what the reference Evaluator feeds to FVD (evaluator.py:80-84).
"""
from __future__ import annotations

from typing import Sequence

import jax
import jax.numpy as jnp
from flax import linen as nn

__all__ = ["InceptionI3d", "tf_same_pad"]

_DN = jax.lax.conv_dimension_numbers(
    (1, 1, 1, 1, 1), (1, 1, 1, 1, 1), ("NDHWC", "DHWIO", "NDHWC"))


def tf_same_pad(size: int, k: int, s: int) -> tuple[int, int]:
    """TF SAME padding (pytorch_i3d.py:78-97): front=floor, back=ceil."""
    if size % s == 0:
        p = max(k - s, 0)
    else:
        p = max(k - (size % s), 0)
    return (p // 2, p - p // 2)


def _pads(shape: Sequence[int], ks, st) -> list[tuple[int, int]]:
    return [tf_same_pad(shape[i], ks[i], st[i]) for i in range(3)]


class Unit3D(nn.Module):
    """Conv3d (TF-SAME) + BatchNorm + ReLU (pytorch_i3d.py:37-103)."""
    out_channels: int
    kernel_shape: Sequence[int] = (1, 1, 1)
    stride: Sequence[int] = (1, 1, 1)
    use_batch_norm: bool = True
    use_bias: bool = False
    activation: bool = True

    @nn.compact
    def __call__(self, x: jax.Array) -> jax.Array:
        ks, st = tuple(self.kernel_shape), tuple(self.stride)
        w = self.param("kernel", nn.initializers.lecun_normal(),
                       (*ks, x.shape[-1], self.out_channels), jnp.float32)
        y = jax.lax.conv_general_dilated(
            x, w, window_strides=st, padding=_pads(x.shape[1:4], ks, st),
            dimension_numbers=_DN, preferred_element_type=jnp.float32)
        if self.use_bias:
            y = y + self.param("bias", nn.initializers.zeros,
                               (self.out_channels,), jnp.float32)
        if self.use_batch_norm:
            y = nn.BatchNorm(use_running_average=True, epsilon=1e-5,
                             name="bn")(y)
        return nn.relu(y) if self.activation else y


def _max_pool_same(x: jax.Array, ks, st) -> jax.Array:
    pads = [(0, 0)] + _pads(x.shape[1:4], ks, st) + [(0, 0)]
    return jax.lax.reduce_window(
        x, -jnp.inf, jax.lax.max, (1, *ks, 1), (1, *st, 1), pads)


class InceptionModule(nn.Module):
    """Four-branch inception block (pytorch_i3d.py:108-131)."""
    out_channels: Sequence[int]

    @nn.compact
    def __call__(self, x: jax.Array) -> jax.Array:
        oc = self.out_channels
        b0 = Unit3D(oc[0], (1, 1, 1), name="b0")(x)
        b1 = Unit3D(oc[2], (3, 3, 3), name="b1b")(
            Unit3D(oc[1], (1, 1, 1), name="b1a")(x))
        b2 = Unit3D(oc[4], (3, 3, 3), name="b2b")(
            Unit3D(oc[3], (1, 1, 1), name="b2a")(x))
        b3 = Unit3D(oc[5], (1, 1, 1), name="b3b")(
            _max_pool_same(x, (3, 3, 3), (1, 1, 1)))
        return jnp.concatenate([b0, b1, b2, b3], axis=-1)


_MIXED = {
    "Mixed_3b": [64, 96, 128, 16, 32, 32],
    "Mixed_3c": [128, 128, 192, 32, 96, 64],
    "Mixed_4b": [192, 96, 208, 16, 48, 64],
    "Mixed_4c": [160, 112, 224, 24, 64, 64],
    "Mixed_4d": [128, 128, 256, 24, 64, 64],
    "Mixed_4e": [112, 144, 288, 32, 64, 64],
    "Mixed_4f": [256, 160, 320, 32, 128, 128],
    "Mixed_5b": [256, 160, 320, 32, 128, 128],
    "Mixed_5c": [384, 192, 384, 48, 128, 128],
}


class InceptionI3d(nn.Module):
    """(B, T, H, W, 3) -> logits (B, num_classes) (pytorch_i3d.py:135-322)."""
    num_classes: int = 400

    def _trunk(self, x: jax.Array) -> jax.Array:
        x = Unit3D(64, (7, 7, 7), (2, 2, 2), name="Conv3d_1a_7x7")(x)
        x = _max_pool_same(x, (1, 3, 3), (1, 2, 2))       # MaxPool3d_2a
        x = Unit3D(64, (1, 1, 1), name="Conv3d_2b_1x1")(x)
        x = Unit3D(192, (3, 3, 3), name="Conv3d_2c_3x3")(x)
        x = _max_pool_same(x, (1, 3, 3), (1, 2, 2))       # MaxPool3d_3a
        x = InceptionModule(_MIXED["Mixed_3b"], name="Mixed_3b")(x)
        x = InceptionModule(_MIXED["Mixed_3c"], name="Mixed_3c")(x)
        x = _max_pool_same(x, (3, 3, 3), (2, 2, 2))       # MaxPool3d_4a
        for name in ("Mixed_4b", "Mixed_4c", "Mixed_4d", "Mixed_4e",
                     "Mixed_4f"):
            x = InceptionModule(_MIXED[name], name=name)(x)
        x = _max_pool_same(x, (2, 2, 2), (2, 2, 2))       # MaxPool3d_5a
        x = InceptionModule(_MIXED["Mixed_5b"], name="Mixed_5b")(x)
        x = InceptionModule(_MIXED["Mixed_5c"], name="Mixed_5c")(x)
        return x

    def _avg_pool(self, x: jax.Array) -> jax.Array:
        # AvgPool3d(kernel=(2,7,7), stride=1), VALID (pytorch_i3d.py:275)
        kt = min(2, x.shape[1])
        kh, kw = min(7, x.shape[2]), min(7, x.shape[3])
        s = jax.lax.reduce_window(
            x, 0.0, jax.lax.add, (1, kt, kh, kw, 1), (1, 1, 1, 1, 1),
            [(0, 0)] * 5)
        return s / (kt * kh * kw)

    @nn.compact
    def __call__(self, x: jax.Array, *, features_only: bool = False
                 ) -> jax.Array:
        x = self._trunk(x)
        x = self._avg_pool(x)
        if features_only:
            # extract_features: Mixed_5c avg-pooled (pytorch_i3d.py:318-322)
            return x
        x = Unit3D(self.num_classes, (1, 1, 1), use_batch_norm=False,
                   use_bias=True, activation=False, name="logits")(x)
        # squeeze spatial, mean over time (pytorch_i3d.py:305-315)
        return jnp.mean(x[:, :, 0, 0, :], axis=1)
