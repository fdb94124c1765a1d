"""Fidelity-mode (Improved-VQ-Diffusion token budget) sampler smoke tests."""
import numpy as np
import pytest

import jax
import jax.numpy as jnp

from gif_synthesis_with_discrete_diffusion_tpu.models import d3pm

T, K, L, B = 10, 6, 16, 2


@pytest.fixture(scope="module")
def sched():
    return d3pm.make_schedule(T, K)


def _denoise(x_t, cond, t):
    base = jnp.linspace(-1.0, 1.0, K - 1)[None, :, None]
    return base + 0.1 * jnp.cos(x_t.astype(jnp.float32))[:, None, :]


@pytest.mark.parametrize("prior_rule,prior_weight", [(1, 0.0), (2, 0.5)])
def test_token_budget_sampler(sched, prior_rule, prior_weight):
    tokens = d3pm.sample_with_token_budget(
        jax.random.key(0), sched, _denoise, cond_emb=None, cf_cond_emb=None,
        batch_size=B, seq_len=L, guidance_scale=1.0, prior_rule=prior_rule,
        prior_weight=prior_weight, prior_ps=L)
    arr = np.asarray(tokens)
    assert arr.shape == (B, L)
    assert arr.min() >= 0 and arr.max() < K
    assert (arr != K - 1).all()  # fully unmasked at the end


def test_default_n_sample_budgets_cover_seq():
    for steps in (10, 25, 50, 100, 200):
        n = d3pm.default_n_sample(steps, prior_ps=1024)
        assert len(n) == steps
        # budgets sum to ~the typical content length (1024); the reference's
        # own T=200 table sums to 999 (dt.py:179)
        assert sum(n) >= 990
