"""Same-pad 3D convolutions, channels-last (NDHWC), for the VQ-VAE.

Capability parity with the reference's ``SamePadConv3d`` /
``SamePadConvTranspose3d`` (reference src/models/networks/videogpt_vq_vae.py:
289-333): for kernel ``k`` and stride ``s`` the total padding per spatial dim
is ``k - s``, split as ``(ceil(p/2), floor(p/2))`` — i.e. the extra pad goes
*before*. The reference materializes an ``F.pad`` then convolves; here the
asymmetric padding is expressed directly in ``lax.conv_general_dilated`` so
XLA folds it into the convolution (no HBM round-trip for a padded copy).

Layout note: the reference is NCDHW (cuDNN). On TPU, channels-last NDHWC is
the layout the MXU-backed conv kernels want, so every model in this framework
uses (B, T, H, W, C) tensors throughout.
"""
from __future__ import annotations

from typing import Sequence

import jax
import jax.numpy as jnp
from flax import linen as nn

__all__ = [
    "same_pad",
    "same_pad_conv3d",
    "same_pad_conv_transpose3d",
    "SamePadConv3d",
    "SamePadConvTranspose3d",
]

_DN = jax.lax.conv_dimension_numbers(
    (1, 1, 1, 1, 1), (1, 1, 1, 1, 1), ("NDHWC", "DHWIO", "NDHWC"))


def _triple(v: int | Sequence[int]) -> tuple[int, int, int]:
    if isinstance(v, int):
        return (v, v, v)
    t = tuple(int(x) for x in v)
    assert len(t) == 3, f"expected 3 spatial dims, got {t}"
    return t  # type: ignore[return-value]


def same_pad(kernel_size, stride) -> list[tuple[int, int]]:
    """Per-dim (before, after) padding with total ``k - s``, extra in front."""
    ks, st = _triple(kernel_size), _triple(stride)
    pads = []
    for k, s in zip(ks, st):
        p = k - s
        assert p >= 0, f"kernel {k} < stride {s} unsupported"
        pads.append((p // 2 + p % 2, p // 2))
    return pads


def same_pad_conv3d(x: jax.Array, w: jax.Array, stride=1,
                    bias: jax.Array | None = None) -> jax.Array:
    """x: (B, D, H, W, Cin); w: (kD, kH, kW, Cin, Cout)."""
    st = _triple(stride)
    pads = same_pad(w.shape[:3], st)
    # preferred_element_type must MATCH the operand dtype in bf16 mode: with
    # f32-preferred + bf16 operands the conv VJP pairs the f32 cotangent
    # with bf16 weights and lax rejects the mixed dtypes. The MXU
    # accumulates f32 internally either way, and the result is cast to
    # x.dtype below regardless.
    y = jax.lax.conv_general_dilated(
        x, w, window_strides=st, padding=pads, dimension_numbers=_DN,
        preferred_element_type=x.dtype)
    y = y.astype(x.dtype)
    if bias is not None:
        y = y + bias
    return y


def same_pad_conv_transpose3d(x: jax.Array, w: jax.Array, stride=1,
                              bias: jax.Array | None = None) -> jax.Array:
    """Transposed conv matching the reference's pre-pad + ConvTranspose3d.

    The reference pre-pads the input by ``(ceil(p/2), floor(p/2))`` with
    ``p = k - s`` and runs ``ConvTranspose3d(..., padding=k-1)``
    (videogpt_vq_vae.py:312-332). That composition equals a fractionally
    strided convolution: dilate the input by ``s`` (zero insertion), pad each
    side by ``s *`` the pre-pad amounts, and cross-correlate with the
    spatially flipped kernel at stride 1 — all expressed as one
    ``conv_general_dilated`` with ``lhs_dilation`` so XLA lowers it to a
    single fused conv.

    x: (B, D, H, W, Cin); w: (kD, kH, kW, Cin, Cout) in *forward* orientation
    (already flipped/transposed by the caller or initialized natively).
    """
    st = _triple(stride)
    pre = same_pad(w.shape[:3], st)
    pads = [(pb * s, pa * s) for (pb, pa), s in zip(pre, st)]
    w_flipped = w[::-1, ::-1, ::-1]
    y = jax.lax.conv_general_dilated(
        x, w_flipped, window_strides=(1, 1, 1), padding=pads,
        lhs_dilation=st, dimension_numbers=_DN,
        preferred_element_type=x.dtype)  # must match operands (VJP; above)
    y = y.astype(x.dtype)
    if bias is not None:
        y = y + bias
    return y


class SamePadConv3d(nn.Module):
    """Flax module wrapper. Weight layout (kD, kH, kW, Cin, Cout).

    ``dtype`` is the COMPUTE dtype (bf16 halves conv time on the MXU);
    params stay float32 for optimizer precision, like flax convention."""
    out_channels: int
    kernel_size: int | Sequence[int]
    stride: int | Sequence[int] = 1
    use_bias: bool = True
    dtype: jnp.dtype = jnp.float32

    @nn.compact
    def __call__(self, x: jax.Array) -> jax.Array:
        ks = _triple(self.kernel_size)
        cin = x.shape[-1]
        w = self.param(
            "kernel",
            nn.initializers.variance_scaling(1.0, "fan_in", "uniform"),
            (*ks, cin, self.out_channels), jnp.float32)
        b = (self.param("bias", nn.initializers.zeros,
                        (self.out_channels,), jnp.float32)
             if self.use_bias else None)
        y = same_pad_conv3d(x.astype(self.dtype), w.astype(self.dtype),
                            self.stride, None)
        y = y.astype(self.dtype)
        return y + b.astype(self.dtype) if b is not None else y


class SamePadConvTranspose3d(nn.Module):
    """Flax transposed-conv wrapper. Weight layout (kD, kH, kW, Cin, Cout).
    ``dtype`` is the compute dtype; params stay float32."""
    out_channels: int
    kernel_size: int | Sequence[int]
    stride: int | Sequence[int] = 1
    use_bias: bool = True
    dtype: jnp.dtype = jnp.float32

    @nn.compact
    def __call__(self, x: jax.Array) -> jax.Array:
        ks = _triple(self.kernel_size)
        cin = x.shape[-1]
        w = self.param(
            "kernel",
            nn.initializers.variance_scaling(1.0, "fan_in", "uniform"),
            (*ks, cin, self.out_channels), jnp.float32)
        b = (self.param("bias", nn.initializers.zeros,
                        (self.out_channels,), jnp.float32)
             if self.use_bias else None)
        y = same_pad_conv_transpose3d(
            x.astype(self.dtype), w.astype(self.dtype), self.stride, None)
        y = y.astype(self.dtype)
        return y + b.astype(self.dtype) if b is not None else y
