"""The fused token-space sampler must match the reference-path sampler
bit-for-bit (same keys, same Gumbel draw shapes)."""
import numpy as np
import pytest

import jax
import jax.numpy as jnp

from gif_synthesis_with_discrete_diffusion_tpu.models import d3pm

T, K, L, B = 8, 10, 12, 3


@pytest.fixture(scope="module")
def sched():
    return d3pm.make_schedule(T, K)


def _denoise(x_t, cond, t):
    """Deterministic toy denoiser whose logits depend on x_t, cond, t."""
    base = jnp.sin(jnp.arange(K - 1, dtype=jnp.float32))[None, :, None]
    xt_term = jnp.cos(x_t.astype(jnp.float32))[:, None, :] * 0.5
    t_term = (t.astype(jnp.float32) / T)[:, None, None]
    c_term = (cond[:, :1, :1] if cond is not None else 0.0)
    return base + xt_term + t_term + c_term


@pytest.mark.parametrize("guidance", [1.0, 2.0])
def test_fused_matches_reference_path(sched, guidance):
    cond = jnp.linspace(-1, 1, B)[:, None, None] * jnp.ones((B, 1, 4))
    cf_cond = jnp.zeros((B, 1, 4))
    key = jax.random.key(42)
    ref = d3pm.sample(key, sched, _denoise, cond, cf_cond, B, L,
                      guidance_scale=guidance)
    fused = d3pm.sample_fused(key, sched, _denoise, cond, cf_cond, B, L,
                              guidance_scale=guidance)
    np.testing.assert_array_equal(np.asarray(ref), np.asarray(fused))


def test_analytic_posterior_matches_q_posterior(sched):
    rng = np.random.default_rng(0)
    tokens = jnp.asarray(rng.integers(0, K, (B, L)), jnp.int32)
    log_x_recon = jax.nn.log_softmax(
        jnp.asarray(rng.standard_normal((B, K - 1, L)), jnp.float32), axis=1)
    for t_scalar in (0, 3, T - 1):
        t = jnp.full((B,), t_scalar, jnp.int32)
        # reference path: append -70 mask row then q_posterior
        zero_vec = jnp.full((B, 1, L), d3pm.LOG_CLAMP)
        log_x_start = jnp.concatenate([log_x_recon, zero_vec], axis=1)
        want = d3pm.q_posterior(
            sched, log_x_start, d3pm.index_to_log_onehot(tokens, K), t)
        from gif_synthesis_with_discrete_diffusion_tpu.models.d3pm import (
            _analytic_posterior)
        got = _analytic_posterior(sched, log_x_recon, tokens,
                                  jnp.asarray(t_scalar))
        np.testing.assert_allclose(np.asarray(got), np.asarray(want),
                                   rtol=1e-4, atol=1e-4,
                                   err_msg=f"t={t_scalar}")
