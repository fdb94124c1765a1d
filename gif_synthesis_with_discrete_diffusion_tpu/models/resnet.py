"""ResNet-50 in flax, structured to load torchvision weights bit-compatibly.

The reference attaches per-clip start-frame features computed by a
torchvision ``resnet50(weights=IMAGENET1K_V2)`` in the UCF101 dataset
(reference src/datamodules/datasets/ucf101_dataset.py:45-47, 89-91). The
committed reference feeds the IMAGENET1K_V2 transform output through the
FULL network — i.e. the frame feature is the (1000,) class-logit vector —
but feature extraction (the 2048-d global-average-pooled activations) is
the intended behavior; :meth:`ResNet50.__call__` returns either via
``features_only``.

TPU-first design notes: channels-last NHWC, convs via
``lax.conv_general_dilated`` through flax, bf16-compute optional, inference
BatchNorm folded by XLA. Layer naming mirrors torchvision
(``layer1..layer4``, blocks ``0..n``, ``conv1/bn1/...``, ``downsample``)
so the weight converter (convert/torch_resnet.py) is a pure re-layout.
"""
from __future__ import annotations

from typing import Sequence

import jax
import jax.numpy as jnp
from flax import linen as nn

__all__ = ["ResNet50", "IMAGENET_MEAN", "IMAGENET_STD",
           "preprocess_imagenet_v2"]

IMAGENET_MEAN = (0.485, 0.456, 0.406)
IMAGENET_STD = (0.229, 0.224, 0.225)


class Bottleneck(nn.Module):
    """torchvision Bottleneck: 1x1 -> 3x3(stride) -> 1x1(x4), residual."""
    planes: int
    stride: int = 1
    downsample: bool = False
    dtype: jnp.dtype = jnp.float32

    @nn.compact
    def __call__(self, x: jax.Array, *, train: bool = False) -> jax.Array:
        bn = lambda name: nn.BatchNorm(  # noqa: E731
            use_running_average=not train, momentum=0.9, epsilon=1e-5,
            dtype=self.dtype, name=name)
        identity = x
        out = nn.Conv(self.planes, (1, 1), use_bias=False, dtype=self.dtype,
                      name="conv1")(x)
        out = nn.relu(bn("bn1")(out))
        out = nn.Conv(self.planes, (3, 3), strides=(self.stride, self.stride),
                      padding=((1, 1), (1, 1)), use_bias=False,
                      dtype=self.dtype, name="conv2")(out)
        out = nn.relu(bn("bn2")(out))
        out = nn.Conv(self.planes * 4, (1, 1), use_bias=False,
                      dtype=self.dtype, name="conv3")(out)
        out = bn("bn3")(out)
        if self.downsample:
            identity = nn.Conv(self.planes * 4, (1, 1),
                               strides=(self.stride, self.stride),
                               use_bias=False, dtype=self.dtype,
                               name="downsample_conv")(x)
            identity = bn("downsample_bn")(identity)
        return nn.relu(out + identity)


class ResNet50(nn.Module):
    """torchvision-compatible ResNet-50 over NHWC images."""
    num_classes: int = 1000
    stage_sizes: Sequence[int] = (3, 4, 6, 3)
    dtype: jnp.dtype = jnp.float32

    @nn.compact
    def __call__(self, x: jax.Array, *, train: bool = False,
                 features_only: bool = False) -> jax.Array:
        """x: (B, H, W, 3) normalized. Returns (B, 2048) features when
        ``features_only`` else (B, num_classes) logits."""
        h = nn.Conv(64, (7, 7), strides=(2, 2), padding=((3, 3), (3, 3)),
                    use_bias=False, dtype=self.dtype, name="conv1")(x)
        h = nn.BatchNorm(use_running_average=not train, momentum=0.9,
                         epsilon=1e-5, dtype=self.dtype, name="bn1")(h)
        h = nn.relu(h)
        # torch MaxPool2d(3, stride 2, padding 1): pad with -inf so the
        # padding never wins the max
        h = jnp.pad(h, ((0, 0), (1, 1), (1, 1), (0, 0)),
                    constant_values=-jnp.inf)
        h = nn.max_pool(h, (3, 3), strides=(2, 2))
        planes = 64
        for li, n_blocks in enumerate(self.stage_sizes):
            stride = 1 if li == 0 else 2
            for bi in range(n_blocks):
                h = Bottleneck(
                    planes, stride=stride if bi == 0 else 1,
                    downsample=bi == 0, dtype=self.dtype,
                    name=f"layer{li + 1}_{bi}")(h, train=train)
            planes *= 2
        feats = jnp.mean(h, axis=(1, 2))            # global average pool
        if features_only:
            return feats.astype(jnp.float32)
        return nn.Dense(self.num_classes, dtype=self.dtype,
                        name="fc")(feats).astype(jnp.float32)


def preprocess_imagenet_v2(frame_u8: jax.Array,
                           resize: int = 232, crop: int = 224) -> jax.Array:
    """ResNet50_Weights.IMAGENET1K_V2.transforms(): bilinear resize of the
    shorter side to 232, center-crop 224, scale to [0,1], ImageNet
    normalize. frame_u8: (..., H, W, 3) uint8 -> (..., 224, 224, 3) f32."""
    x = frame_u8.astype(jnp.float32) / 255.0
    h, w = x.shape[-3], x.shape[-2]
    scale = resize / min(h, w)
    nh, nw = round(h * scale), round(w * scale)
    lead = x.shape[:-3]
    # antialias=True matches torchvision's IMAGENET1K_V2 transform
    # (Resize(..., antialias=True)) on the typical DOWNSCALE; without it
    # the (2048,) frame features drift from the reference backbone's
    x = jax.image.resize(x, (*lead, nh, nw, 3), method="bilinear",
                         antialias=True)
    top, left = (nh - crop) // 2, (nw - crop) // 2
    x = x[..., top:top + crop, left:left + crop, :]
    mean = jnp.asarray(IMAGENET_MEAN, jnp.float32)
    std = jnp.asarray(IMAGENET_STD, jnp.float32)
    return (x - mean) / std
