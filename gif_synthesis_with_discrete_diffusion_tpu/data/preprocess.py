"""On-device video preprocessing.

The reference does float/255, ImageNet normalize, bilinear shorter-side
resize, and center crop on the CPU per clip via torchvision transforms
(reference src/datamodules/datasets/ucf101_dataset.py:105-140). Here the
host only decodes to uint8; everything else runs on device inside jit —
resize and normalize are elementwise/gather ops XLA fuses with the model's
first conv, and the uint8 host->device transfer is 4x smaller than float32.
"""
from __future__ import annotations

import jax
import jax.numpy as jnp

__all__ = ["IMAGENET_MEAN", "IMAGENET_STD", "preprocess_clip",
           "unnormalize", "resize_shorter_side_and_crop"]

IMAGENET_MEAN = (0.485, 0.456, 0.406)
IMAGENET_STD = (0.229, 0.224, 0.225)


def resize_shorter_side_and_crop(video: jax.Array, resolution: int
                                 ) -> jax.Array:
    """Bilinear shorter-side resize then center crop, (..., H, W, C)."""
    *lead, h, w, c = video.shape
    scale = resolution / min(h, w)
    nh, nw = max(int(round(h * scale)), resolution), \
        max(int(round(w * scale)), resolution)
    video = jax.image.resize(video, (*lead, nh, nw, c), method="bilinear")
    top, left = (nh - resolution) // 2, (nw - resolution) // 2
    return video[..., top:top + resolution, left:left + resolution, :]


def preprocess_clip(video_u8: jax.Array, resolution: int) -> jax.Array:
    """uint8 (B, T, H, W, 3) -> normalized float32 at target resolution."""
    v = video_u8.astype(jnp.float32) / 255.0
    v = resize_shorter_side_and_crop(v, resolution)
    mean = jnp.asarray(IMAGENET_MEAN, jnp.float32)
    std = jnp.asarray(IMAGENET_STD, jnp.float32)
    return (v - mean) / std


def unnormalize(video: jax.Array) -> jax.Array:
    """Invert ImageNet normalization -> [0, 1] floats (clipped)."""
    mean = jnp.asarray(IMAGENET_MEAN, jnp.float32)
    std = jnp.asarray(IMAGENET_STD, jnp.float32)
    return jnp.clip(video * std + mean, 0.0, 1.0)
