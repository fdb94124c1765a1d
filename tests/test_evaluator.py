"""FVD evaluator: Fréchet distance on synthetic gaussians + torch parity."""
import pytest
import numpy as np
import torch

import jax.numpy as jnp

from gif_synthesis_with_discrete_diffusion_tpu.eval.evaluator import (
    FVDEvaluator, frechet_distance, prepare_fvd_clip)


def _torch_frechet(x1, x2):
    """The reference's frechet_distance (evaluator.py:121-179) re-run in
    torch as ground truth."""
    x1t = torch.from_numpy(x1.copy())
    x2t = torch.from_numpy(x2.copy())

    def cov(m):
        m = m.t()
        fact = 1.0 / (m.size(1) - 1)
        m = m - torch.mean(m, dim=1, keepdim=True)
        return fact * m.matmul(m.t()).squeeze()

    def sqrtm(mat, eps=1e-10):
        u, s, v = torch.svd(mat)
        si = torch.where(s < eps, s, torch.sqrt(s))
        return u @ torch.diag(si) @ v.t()

    m, m_w = x1t.mean(dim=0), x2t.mean(dim=0)
    sigma, sigma_w = cov(x1t), cov(x2t)
    sq = sqrtm(sigma)
    tsp = torch.trace(sqrtm(sq @ sigma_w @ sq))
    return float(torch.trace(sigma + sigma_w) - 2.0 * tsp
                 + torch.sum((m - m_w) ** 2))


def test_frechet_distance_matches_torch_reference():
    rng = np.random.default_rng(0)
    x1 = rng.standard_normal((64, 16)).astype(np.float64)
    x2 = (rng.standard_normal((64, 16)) * 1.5 + 0.3).astype(np.float64)
    got = frechet_distance(x1, x2)
    want = _torch_frechet(x1, x2)
    np.testing.assert_allclose(got, want, rtol=1e-4)


def test_frechet_distance_properties():
    rng = np.random.default_rng(1)
    x = rng.standard_normal((128, 8))
    assert abs(frechet_distance(x, x.copy())) < 1e-6
    y_far = x + 10.0
    y_near = x + 0.1
    assert frechet_distance(x, y_far) > frechet_distance(x, y_near)


def test_prepare_fvd_clip_temporal_repeat():
    v4 = jnp.zeros((1, 4, 32, 32, 3))
    assert prepare_fvd_clip(v4).shape == (1, 16, 224, 224, 3)
    v8 = jnp.zeros((1, 8, 32, 32, 3))
    assert prepare_fvd_clip(v8).shape == (1, 16, 224, 224, 3)
    v16 = jnp.zeros((1, 16, 32, 32, 3))
    assert prepare_fvd_clip(v16).shape == (1, 16, 224, 224, 3)


@pytest.mark.slow  # full random-I3D forward at 224px: ~2 min on the CPU mesh
def test_fvd_evaluator_end_to_end_random_i3d():
    rng = np.random.default_rng(2)
    ev = FVDEvaluator(i3d_params=None, num_classes=16)
    gt = jnp.asarray(rng.standard_normal((2, 4, 32, 32, 3)).astype(
        np.float32) * 0.2)
    gen = jnp.asarray(rng.standard_normal((2, 4, 32, 32, 3)).astype(
        np.float32) * 0.2)
    ev.push_vals(gt, gen)
    ev.push_vals(gt, gen)
    metrics = ev.evaluate_metrics()
    assert "fvd" in metrics and np.isfinite(metrics["fvd"])
    ev.reset()
    assert not ev.gen_embeds
