"""D3PM math: schedule invariants, brute-force transition-matrix checks,
posterior correctness, loss behavior, scan samplers."""
import numpy as np
import pytest

import jax
import jax.numpy as jnp

from gif_synthesis_with_discrete_diffusion_tpu.models import d3pm

T, K, L, B = 10, 6, 8, 2  # tiny: 5 real codes + MASK


@pytest.fixture(scope="module")
def sched():
    return d3pm.make_schedule(T, K)


def _transition_matrix(sched, t):
    """Explicit Q_t (from-state rows) per VQ-Diffusion: absorbing+uniform."""
    at = float(np.exp(sched.log_at[t]))
    bt = float(np.exp(sched.log_bt[t]))
    ct = float(np.exp(sched.log_ct[t]))
    q = np.zeros((K, K))
    for i in range(K - 1):
        for j in range(K - 1):
            q[i, j] = at * (i == j) + bt
        q[i, K - 1] = ct
    q[K - 1, K - 1] = 1.0
    return q


def _cumulative(sched, t):
    q = np.eye(K)
    for s in range(t + 1):
        q = q @ _transition_matrix(sched, s)
    return q


def test_schedule_invariants(sched):
    # the reference asserts log_add_exp(log_ct, log_1_min_ct) == 0 (dt.py:136)
    s = np.abs(np.asarray(
        d3pm.log_add_exp(sched.log_ct, sched.log_1_min_ct))).sum()
    assert s < 1e-4
    s = np.abs(np.asarray(d3pm.log_add_exp(
        sched.log_cumprod_ct[:-1], sched.log_1_min_cumprod_ct[:-1]))).sum()
    assert s < 1e-4
    # cumulative arrays have the identity row at index T
    assert float(sched.log_cumprod_at[T]) == 0.0
    assert np.isneginf(float(sched.log_cumprod_ct[T]))
    # row-stochasticity of explicit Q_t
    for t in (0, T // 2, T - 1):
        np.testing.assert_allclose(_transition_matrix(sched, t).sum(1), 1.0,
                                   atol=1e-6)


def test_q_pred_matches_bruteforce(sched):
    for t_scalar in (0, 3, T - 1):
        qbar = _cumulative(sched, t_scalar)
        for x0 in (0, 2, K - 2):
            tokens = jnp.full((1, L), x0, jnp.int32)
            log_x_start = d3pm.index_to_log_onehot(tokens, K)
            got = np.exp(np.asarray(d3pm.q_pred(
                sched, log_x_start, jnp.asarray([t_scalar]))))[0, :, 0]
            np.testing.assert_allclose(got, qbar[x0], atol=1e-4)


def test_q_pred_identity_at_minus_one(sched):
    tokens = jnp.asarray(np.random.default_rng(0).integers(0, K, (B, L)))
    log_x = d3pm.index_to_log_onehot(tokens, K)
    got = d3pm.q_pred(sched, log_x, jnp.full((B,), -1, jnp.int32))
    np.testing.assert_allclose(np.exp(np.asarray(got)),
                               np.exp(np.asarray(log_x)), atol=1e-5)


def test_q_pred_one_timestep_matches_matrix_for_nonmask(sched):
    """For non-mask one-hot states the formula equals the matrix row."""
    t_scalar = 4
    q = _transition_matrix(sched, t_scalar)
    for x in (0, K - 2):
        tokens = jnp.full((1, L), x, jnp.int32)
        log_x = d3pm.index_to_log_onehot(tokens, K)
        got = np.exp(np.asarray(d3pm.q_pred_one_timestep(
            sched, log_x, jnp.asarray([t_scalar]))))[0, :, 0]
        np.testing.assert_allclose(got, q[x], atol=1e-5)


def test_q_posterior_matches_bayes_bruteforce(sched):
    """q(x_{t-1}|x_t, x_0) = Q_t[:,x_t] * Qbar_{t-1}[x_0,:] / Qbar_t[x_0,x_t]
    for one-hot x_0; checks both mask and non-mask x_t branches."""
    rng = np.random.default_rng(1)
    for t_scalar in (1, 5, T - 1):
        q_t = _transition_matrix(sched, t_scalar)
        qbar_prev = _cumulative(sched, t_scalar - 1)
        qbar_t = _cumulative(sched, t_scalar)
        for x0, xt in [(0, 0), (1, K - 1), (3, 3), (2, K - 1)]:
            evidence = qbar_t[x0, xt]
            if evidence < 1e-12:
                continue
            expected = q_t[:, xt] * qbar_prev[x0, :] / evidence

            tokens0 = jnp.full((1, L), x0, jnp.int32)
            tokenst = jnp.full((1, L), xt, jnp.int32)
            got = np.exp(np.asarray(d3pm.q_posterior(
                sched,
                d3pm.index_to_log_onehot(tokens0, K),
                d3pm.index_to_log_onehot(tokenst, K),
                jnp.asarray([t_scalar]))))[0, :, 0]
            np.testing.assert_allclose(got, expected, atol=2e-3,
                                       err_msg=f"t={t_scalar} x0={x0} xt={xt}")


def test_q_posterior_normalized(sched):
    rng = np.random.default_rng(2)
    tokens0 = jnp.asarray(rng.integers(0, K - 1, (B, L)))
    tokenst = jnp.asarray(rng.integers(0, K, (B, L)))
    got = d3pm.q_posterior(
        sched, d3pm.index_to_log_onehot(tokens0, K),
        d3pm.index_to_log_onehot(tokenst, K), jnp.full((B,), 3, jnp.int32))
    sums = np.exp(np.asarray(jax.nn.logsumexp(got, axis=1)))
    np.testing.assert_allclose(sums, 1.0, atol=2e-3)


def _uniform_denoise(x_t, cond_emb, t):
    return jnp.zeros((x_t.shape[0], K - 1, x_t.shape[1]), jnp.float32)


def test_train_loss_finite_and_lt_updates(sched):
    rng = np.random.default_rng(3)
    x_start = jnp.asarray(rng.integers(0, K - 1, (B, L)), jnp.int32)
    lt = d3pm.LtState.zeros(T)
    vb, aux, new_lt = d3pm.train_loss(
        jax.random.key(0), sched, _uniform_denoise, x_start, None, lt,
        auxiliary_loss_weight=5e-4, adaptive_auxiliary_loss=True)
    assert vb.shape == (B,)
    assert np.isfinite(np.asarray(vb)).all()
    assert float(new_lt.count.sum()) == B
    assert float(new_lt.history.sum()) > 0


def test_train_loss_importance_kicks_in(sched):
    """After counts exceed 10 everywhere, sampling becomes importance-based."""
    hist = jnp.asarray(np.linspace(0.5, 8.0, T), jnp.float32)
    lt = d3pm.LtState(history=hist, count=jnp.ones((T,)) * 11.0)
    t, pt = d3pm.sample_time(jax.random.key(0), lt, 64, T)
    assert not np.allclose(np.asarray(pt), 1.0 / T)  # importance probs
    lt0 = d3pm.LtState.zeros(T)
    t, pt = d3pm.sample_time(jax.random.key(0), lt0, 64, T)
    np.testing.assert_allclose(np.asarray(pt), 1.0 / T)


def test_sample_scan_runs_and_in_range(sched):
    tokens = d3pm.sample(jax.random.key(0), sched, _uniform_denoise,
                         cond_emb=None, cf_cond_emb=None, batch_size=B,
                         seq_len=L, guidance_scale=1.0)
    assert tokens.shape == (B, L)
    arr = np.asarray(tokens)
    assert arr.min() >= 0 and arr.max() < K
    # after the full reverse process no token should remain MASK
    assert (arr != K - 1).all()


def test_sample_fast_runs(sched):
    tokens = d3pm.sample_fast(jax.random.key(0), sched, _uniform_denoise,
                              cond_emb=None, cf_cond_emb=None, batch_size=B,
                              seq_len=L, guidance_scale=1.0, skip_step=2)
    assert tokens.shape == (B, L)
    assert (np.asarray(tokens) != K - 1).all()


def test_cfg_guidance_batched_equals_two_pass(sched):
    """The batched-2B CFG must equal running cond and uncond separately."""
    rng = np.random.default_rng(5)
    w = jnp.asarray(rng.standard_normal((4, K - 1)).astype(np.float32))

    def denoise(x_t, cond, t):
        # logits depend on cond so the two branches differ
        return jnp.einsum("bd,dk->bk", cond[:, 0, :], w)[:, :, None] \
            * jnp.ones((1, 1, x_t.shape[1]))

    cond = jnp.asarray(rng.standard_normal((B, 1, 4)).astype(np.float32))
    cf_cond = jnp.asarray(rng.standard_normal((B, 1, 4)).astype(np.float32))
    tokens = jnp.asarray(rng.integers(0, K, (B, L)), jnp.int32)
    log_x = d3pm.index_to_log_onehot(tokens, K)
    t = jnp.full((B,), 3, jnp.int32)

    got = d3pm.cf_predict_start(sched, denoise, log_x, cond, cf_cond, t, 2.0)

    lp_c = d3pm.predict_start(sched, denoise, log_x, cond, t)[:, :-1]
    lp_u = d3pm.predict_start(sched, denoise, log_x, cf_cond, t)[:, :-1]
    ref = lp_u + 2.0 * (lp_c - lp_u)
    ref = ref - jax.nn.logsumexp(ref, axis=1, keepdims=True)
    ref = jnp.clip(ref, d3pm.LOG_CLAMP, 0.0)
    np.testing.assert_allclose(np.asarray(got[:, :-1]), np.asarray(ref),
                               rtol=1e-4, atol=1e-5)


def test_sample_with_filter_ratio(sched):
    """Partial denoise from existing content (dt.py:628-636 branch)."""
    rng = np.random.default_rng(9)
    content = jnp.asarray(rng.integers(0, K - 1, (B, L)), jnp.int32)
    tokens = d3pm.sample(jax.random.key(1), sched, _uniform_denoise,
                         cond_emb=None, cf_cond_emb=None, batch_size=B,
                         seq_len=L, guidance_scale=1.0, filter_ratio=0.5,
                         content_token=content)
    arr = np.asarray(tokens)
    assert arr.shape == (B, L)
    assert (arr != K - 1).all()


def test_q_sample_from_indices_bit_identical():
    """The one-hot fast path must reproduce q_sample(log-onehot) exactly
    (same uniform-draw shape, same element-wise arithmetic)."""
    sched = d3pm.make_schedule(8, 10)
    rng = np.random.default_rng(7)
    x0 = jnp.asarray(rng.integers(0, 9, (3, 12)), jnp.int32)
    t = jnp.asarray(rng.integers(0, 8, (3,)), jnp.int32)
    key = jax.random.key(11)
    dense = d3pm.q_sample(
        key, sched, d3pm.index_to_log_onehot(x0, 10), t)
    fast = d3pm.q_sample_from_indices(key, sched, x0, t)
    np.testing.assert_array_equal(np.asarray(dense), np.asarray(fast))


def test_true_q_posterior_matches_dense():
    """Token-space true posterior vs q_posterior on log-onehots, covering
    t=0, mask x_t, and x_t == x_start cases."""
    K, T, B, L = 10, 8, 4, 16
    sched = d3pm.make_schedule(T, K)
    rng = np.random.default_rng(9)
    x0 = jnp.asarray(rng.integers(0, K - 1, (B, L)), jnp.int32)
    xt = jnp.asarray(rng.integers(0, K, (B, L)), jnp.int32)  # incl. mask
    xt = xt.at[0, :4].set(K - 1)          # forced mask region
    xt = xt.at[1].set(x0[1])              # forced x_t == x_start row
    for t_val in [0, 1, T - 1]:
        t = jnp.full((B,), t_val, jnp.int32)
        dense = d3pm.q_posterior(
            sched, d3pm.index_to_log_onehot(x0, K),
            d3pm.index_to_log_onehot(xt, K), t)
        fast = d3pm.true_q_posterior(sched, x0, xt, t)
        np.testing.assert_allclose(np.asarray(fast), np.asarray(dense),
                                   rtol=2e-5, atol=2e-5,
                                   err_msg=f"t={t_val}")


def test_update_diffusion_telemetry_matches_python_loop():
    """EMA bucketing matches the reference's sequential per-sample loop
    (dt.py:407-417), including duplicate-t compounding within a batch."""
    rng = np.random.default_rng(0)
    T, B, L = 5, 4, 8
    t = np.array([1, 3, 1, 0])                 # t=1 appears twice
    x0_recon = rng.integers(0, 4, (B, L))
    x_start = rng.integers(0, 4, (B, L))
    xt = rng.integers(0, 4, (B, L))
    xt_1 = rng.integers(0, 4, (B, L))
    acc = rng.random(T).astype(np.float32)     # nonzero starting EMAs
    keep = rng.random(T).astype(np.float32)

    exp_a, exp_k = acc.copy(), keep.copy()
    for i in range(B):                         # the reference's loop
        sa = (x0_recon[i] == x_start[i]).mean()
        exp_a[t[i]] = sa * 0.1 + exp_a[t[i]] * 0.9
        sk = (xt_1[i] == xt[i]).mean()
        exp_k[t[i]] = sk * 0.1 + exp_k[t[i]] * 0.9

    got_a, got_k = jax.jit(d3pm.update_diffusion_telemetry)(
        jnp.asarray(acc), jnp.asarray(keep), jnp.asarray(t),
        jnp.asarray(x0_recon), jnp.asarray(x_start), jnp.asarray(xt),
        jnp.asarray(xt_1))
    np.testing.assert_allclose(np.asarray(got_a), exp_a, rtol=1e-6)
    np.testing.assert_allclose(np.asarray(got_k), exp_k, rtol=1e-6)
