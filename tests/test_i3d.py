"""I3D parity: our flax InceptionI3d + converter vs. the reference torch
implementation (imported read-only from /root/reference as a test oracle)."""
import importlib.util
import sys

import numpy as np
import pytest
import torch

import jax
import jax.numpy as jnp

from gif_synthesis_with_discrete_diffusion_tpu.convert.torch_i3d import (
    convert_i3d)
from gif_synthesis_with_discrete_diffusion_tpu.models.i3d import (
    InceptionI3d, tf_same_pad)

REF_I3D = "/root/reference/src/models/motionencoder/pytorch_i3d.py"


def _load_ref_i3d():
    spec = importlib.util.spec_from_file_location("ref_pytorch_i3d", REF_I3D)
    mod = importlib.util.module_from_spec(spec)
    spec.loader.exec_module(mod)
    return mod


def test_tf_same_pad():
    assert tf_same_pad(224, 7, 2) == (2, 3)
    assert tf_same_pad(16, 1, 1) == (0, 0)
    assert tf_same_pad(56, 3, 1) == (1, 1)
    assert tf_same_pad(15, 3, 2) == (1, 1)


@pytest.mark.slow
def test_i3d_matches_reference_torch():
    ref = _load_ref_i3d()
    torch.manual_seed(0)
    net = ref.InceptionI3d(num_classes=400)
    net.eval()
    # give BN running stats + weights non-trivial values
    sd = net.state_dict()
    gen = torch.Generator().manual_seed(1)
    for k, v in sd.items():
        if k.endswith("running_var"):
            sd[k] = torch.rand(v.shape, generator=gen) * 0.5 + 0.75
        elif k.endswith("running_mean"):
            sd[k] = torch.randn(v.shape, generator=gen) * 0.1
        elif k.endswith("num_batches_tracked"):
            continue
        else:
            sd[k] = torch.randn(v.shape, generator=gen) * 0.05
    net.load_state_dict(sd)

    x = torch.randn(1, 3, 16, 224, 224, generator=gen)
    with torch.no_grad():
        y_ref = net(x).numpy()

    sd_np = {k: v.numpy() for k, v in sd.items()}
    variables = convert_i3d(sd_np)
    model = InceptionI3d(num_classes=400)
    y = model.apply(variables, jnp.asarray(
        x.permute(0, 2, 3, 4, 1).numpy()))
    np.testing.assert_allclose(np.asarray(y), y_ref, rtol=5e-3, atol=5e-3)


def test_i3d_shapes_small():
    model = InceptionI3d(num_classes=10)
    x = jnp.zeros((1, 16, 224, 224, 3))
    variables = jax.eval_shape(
        lambda: model.init(jax.random.key(0), x))
    y_shape = jax.eval_shape(
        lambda v: model.apply(v, x), variables)
    assert y_shape.shape == (1, 10)
