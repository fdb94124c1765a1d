"""Golden tests: NDHWC same-pad convs vs. torch NCDHW reference semantics.

The reference (videogpt_vq_vae.py:289-333) pads by ``k - s`` total per dim,
extra in front, then runs Conv3d / ConvTranspose3d(padding=k-1). torch (CPU)
is the ground truth here.
"""
import numpy as np
import pytest
import torch
import torch.nn.functional as F

import jax.numpy as jnp

from gif_synthesis_with_discrete_diffusion_tpu.ops.conv3d import (
    same_pad, same_pad_conv3d, same_pad_conv_transpose3d)


def _torch_pad_amounts(kernel, stride):
    # replicate the reference's F.pad tuple construction
    total = [k - s for k, s in zip(kernel, stride)]
    pad = []
    for p in total[::-1]:
        pad.extend([p // 2 + p % 2, p // 2])
    return pad


@pytest.mark.parametrize("k,s,shape", [
    (4, (2, 2, 2), (2, 4, 8, 8, 3)),
    (4, (1, 2, 2), (1, 4, 16, 16, 5)),
    (3, (1, 1, 1), (2, 3, 6, 6, 4)),
    (1, (1, 1, 1), (1, 2, 4, 4, 7)),
])
def test_same_pad_conv3d_matches_torch(k, s, shape):
    rng = np.random.default_rng(0)
    b, d, h, w, cin = shape
    cout = 6
    ks = (k, k, k)
    x = rng.standard_normal(shape).astype(np.float32)
    wgt = rng.standard_normal((*ks, cin, cout)).astype(np.float32) * 0.1
    bias = rng.standard_normal((cout,)).astype(np.float32)

    y = same_pad_conv3d(jnp.asarray(x), jnp.asarray(wgt), s, jnp.asarray(bias))

    xt = torch.from_numpy(x).permute(0, 4, 1, 2, 3)  # NCDHW
    wt = torch.from_numpy(wgt).permute(4, 3, 0, 1, 2)  # (O, I, kD, kH, kW)
    xt = F.pad(xt, _torch_pad_amounts(ks, s))
    yt = F.conv3d(xt, wt, torch.from_numpy(bias), stride=s)
    yt = yt.permute(0, 2, 3, 4, 1).numpy()

    np.testing.assert_allclose(np.asarray(y), yt, rtol=2e-4, atol=2e-4)


@pytest.mark.parametrize("k,s,shape", [
    (4, (2, 2, 2), (2, 2, 4, 4, 3)),
    (4, (1, 2, 2), (1, 4, 8, 8, 5)),
    (4, (2, 1, 1), (1, 2, 3, 3, 2)),
])
def test_same_pad_conv_transpose3d_matches_torch(k, s, shape):
    rng = np.random.default_rng(1)
    b, d, h, w, cin = shape
    cout = 4
    ks = (k, k, k)
    x = rng.standard_normal(shape).astype(np.float32)
    # torch ConvTranspose3d weight layout is (I, O, kD, kH, kW)
    wt_np = rng.standard_normal((cin, cout, *ks)).astype(np.float32) * 0.1
    bias = rng.standard_normal((cout,)).astype(np.float32)

    xt = torch.from_numpy(x).permute(0, 4, 1, 2, 3)
    xt = F.pad(xt, _torch_pad_amounts(ks, s))
    yt = F.conv_transpose3d(
        xt, torch.from_numpy(wt_np), torch.from_numpy(bias),
        stride=s, padding=tuple(kk - 1 for kk in ks))
    yt = yt.permute(0, 2, 3, 4, 1).numpy()

    # our convention: forward-orientation (kD, kH, kW, Cin, Cout)
    w_jax = jnp.asarray(np.transpose(wt_np, (2, 3, 4, 0, 1)))
    y = same_pad_conv_transpose3d(jnp.asarray(x), w_jax, s, jnp.asarray(bias))

    assert y.shape == yt.shape
    np.testing.assert_allclose(np.asarray(y), yt, rtol=2e-4, atol=2e-4)


def test_same_pad_amounts():
    assert same_pad(4, (2, 2, 2)) == [(1, 1)] * 3
    assert same_pad(4, (1, 2, 2)) == [(2, 1), (1, 1), (1, 1)]
    assert same_pad(3, 1) == [(1, 1)] * 3
