"""Fused Pallas sampler step vs the jnp analytic posterior (interpret mode)."""
import numpy as np
import pytest

import jax
import jax.numpy as jnp

from gif_synthesis_with_discrete_diffusion_tpu.models import d3pm
from gif_synthesis_with_discrete_diffusion_tpu.models.d3pm import (
    _analytic_posterior, _guided_log_x_recon)
from gif_synthesis_with_discrete_diffusion_tpu.ops.sampler_kernel import (
    fused_sample_step, schedule_rows)

T, K, L, B = 8, 10, 12, 2


@pytest.fixture(scope="module")
def sched():
    return d3pm.make_schedule(T, K)


@pytest.mark.parametrize("t_scalar", [0, 3, T - 1])
@pytest.mark.parametrize("guidance", [1.0, 2.0])
def test_kernel_posterior_matches_jnp(sched, t_scalar, guidance):
    rng = np.random.default_rng(0)
    use_cfg = abs(guidance - 1.0) >= 1e-3
    nb = 2 * B if use_cfg else B
    logits2 = jnp.asarray(
        rng.standard_normal((nb, K - 1, L)).astype(np.float32))
    tokens = jnp.asarray(rng.integers(0, K, (B, L)), jnp.int32)
    rows = schedule_rows(sched)

    _, post = fused_sample_step(
        logits2, tokens, rows[t_scalar], jnp.int32(0), guidance=guidance,
        num_classes=K, sample=False, return_posterior=True, interpret=True)

    r = _guided_log_x_recon(logits2, guidance, B)
    want = _analytic_posterior(sched, r, tokens, jnp.asarray(t_scalar))
    np.testing.assert_allclose(np.asarray(post), np.asarray(want),
                               rtol=1e-4, atol=1e-4)


def test_kernel_argmax_tokens_match(sched):
    rng = np.random.default_rng(1)
    logits2 = jnp.asarray(
        rng.standard_normal((2 * B, K - 1, L)).astype(np.float32))
    tokens = jnp.asarray(rng.integers(0, K, (B, L)), jnp.int32)
    rows = schedule_rows(sched)
    got = fused_sample_step(logits2, tokens, rows[4], jnp.int32(0),
                            guidance=2.0, num_classes=K, sample=False,
                            interpret=True)
    r = _guided_log_x_recon(logits2, 2.0, B)
    want = jnp.argmax(
        _analytic_posterior(sched, r, tokens, jnp.asarray(4)), axis=1)
    np.testing.assert_array_equal(np.asarray(got), np.asarray(want))


def test_schedule_rows_shape(sched):
    rows = schedule_rows(sched)
    assert rows.shape == (T, 10)


def test_kernel_posterior_k_mod8_is_1():
    """Regression: K ≡ 1 (mod 8) — e.g. the production n_codes+1 = 2049 —
    made the logits padding (round_up(K-1, 8)) one tile SHORTER than the
    posterior output block (round_up(K, 8)), a trace-time shape error."""
    k = 17
    sched17 = d3pm.make_schedule(T, k)
    rng = np.random.default_rng(3)
    logits2 = jnp.asarray(
        rng.standard_normal((2 * B, k - 1, L)).astype(np.float32))
    tokens = jnp.asarray(rng.integers(0, k, (B, L)), jnp.int32)
    rows = schedule_rows(sched17)
    new_tok, post = fused_sample_step(
        logits2, tokens, rows[2], jnp.int32(0), guidance=2.0,
        num_classes=k, sample=False, return_posterior=True, interpret=True)
    r = _guided_log_x_recon(logits2, 2.0, B)
    want = _analytic_posterior(sched17, r, tokens, jnp.asarray(2))
    np.testing.assert_allclose(np.asarray(post), np.asarray(want),
                               rtol=1e-4, atol=1e-4)
    np.testing.assert_array_equal(np.asarray(new_tok),
                                  np.asarray(jnp.argmax(want, axis=1)))
    assert np.isfinite(np.asarray(rows[1:, :2])).all()
