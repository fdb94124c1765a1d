"""The measured-baseline harness (scripts/measure_torch_baseline.py) must
implement the REFERENCE sampler math: its torch q_posterior / CFG combine
are independent reimplementations from the same spec as models/d3pm.py —
numerical agreement between the two is the evidence that the measured
torch number times the real algorithm (dt.py:240-249, 251-283, 568-644)."""
import importlib.util
import os

import numpy as np
import pytest
import torch

import jax
import jax.numpy as jnp

from gif_synthesis_with_discrete_diffusion_tpu.models import d3pm

_SCRIPT = os.path.join(os.path.dirname(os.path.dirname(
    os.path.abspath(__file__))), "scripts", "measure_torch_baseline.py")


@pytest.fixture(scope="module")
def mtb():
    spec = importlib.util.spec_from_file_location("mtb", _SCRIPT)
    mod = importlib.util.module_from_spec(spec)
    spec.loader.exec_module(mod)
    return mod


T, K, B, L = 6, 25, 2, 16


@pytest.fixture(scope="module")
def fixtures():
    rng = np.random.default_rng(3)
    logits = rng.standard_normal((B, K - 1, L)).astype(np.float32)
    log_x0 = np.asarray(jax.device_get(
        d3pm.predict_start_from_logits(jnp.asarray(logits), L)))
    xt = rng.integers(0, K, (B, L))
    log_xt = np.asarray(jax.device_get(
        d3pm.index_to_log_onehot(jnp.asarray(xt, jnp.int32), K)))
    return log_x0, log_xt


@pytest.mark.parametrize("t", [0, 3, T - 1])
def test_torch_q_posterior_matches_jax(mtb, fixtures, t):
    log_x0, log_xt = fixtures
    sched = d3pm.make_schedule(T, K)
    ts = mtb.TorchSampler(model=None, num_timesteps=T, num_classes=K,
                          guidance=2.0)
    want = np.asarray(jax.device_get(d3pm.q_posterior(
        sched, jnp.asarray(log_x0), jnp.asarray(log_xt),
        jnp.full((B,), t, jnp.int32))))
    got = ts.q_posterior(torch.from_numpy(log_x0),
                         torch.from_numpy(log_xt),
                         torch.full((B,), t, dtype=torch.long)).numpy()
    np.testing.assert_allclose(got, want, rtol=1e-4, atol=1e-4)


def test_torch_cfg_combine_matches_jax(mtb, fixtures):
    """cf_predict_start: two sequential forwards + guidance combine must
    match the jax batched-2B formulation on identical logits."""
    log_x0, log_xt = fixtures
    rng = np.random.default_rng(5)
    lc = rng.standard_normal((B, K - 1, L)).astype(np.float32)
    lcf = rng.standard_normal((B, K - 1, L)).astype(np.float32)

    class _FakeModel:
        calls = []

        def __call__(self, x_t, cond, t):
            # first call = cond branch, second = CF branch
            out = lc if not self.calls else lcf
            self.calls.append(1)
            return torch.from_numpy(out)

    ts = mtb.TorchSampler(model=_FakeModel(), num_timesteps=T,
                          num_classes=K, guidance=2.0)
    got = ts.cf_predict_start(torch.from_numpy(log_xt), None, None,
                              torch.zeros(B, dtype=torch.long)).numpy()

    logits2 = jnp.concatenate([jnp.asarray(lc), jnp.asarray(lcf)], axis=0)
    sched = d3pm.make_schedule(T, K)
    want = np.asarray(jax.device_get(d3pm.cf_predict_start(
        sched, lambda x, c, t: logits2[: 2 * B],
        jnp.asarray(log_xt), jnp.zeros((B, 1, 4)), jnp.zeros((B, 1, 4)),
        jnp.zeros((B,), jnp.int32), 2.0)))
    np.testing.assert_allclose(got, want, rtol=1e-4, atol=1e-4)


def test_skip_torch_reuses_artifact(mtb, tmp_path, monkeypatch):
    """--skip-torch must reuse the recorded denominator (and refuse a
    config mismatch) instead of re-running the ~hour-long torch loop."""
    import json
    import sys

    art = tmp_path / "BASELINE_MEASURED.json"
    cfg = {"codes": 4096, "tokens": 1024, "batch": 1, "steps": 100,
           "layers": 19, "embd": 64, "heads": 16, "cond_dim": 512,
           "guidance": 2.0}
    art.write_text(json.dumps(
        {"config": cfg, "torch_cpu_clips_per_sec": 0.0016}))

    monkeypatch.setattr(mtb, "time_torch",
                        lambda a: (_ for _ in ()).throw(
                            AssertionError("torch loop must not run")))
    monkeypatch.setattr(mtb, "time_jax", lambda a: 0.0011)
    monkeypatch.setattr(sys, "argv", [
        "mtb", "--tokens", "1024", "--batch", "1", "--skip-torch",
        "--out", str(art)])
    mtb.main()
    got = json.loads(art.read_text())
    assert got["torch_cpu_clips_per_sec"] == 0.0016
    assert got["jax_cpu_clips_per_sec"] == 0.0011
    assert got["jax_over_torch_cpu"] == round(0.0011 / 0.0016, 3)

    # config mismatch -> hard error, artifact untouched
    monkeypatch.setattr(sys, "argv", [
        "mtb", "--tokens", "2304", "--batch", "1", "--skip-torch",
        "--out", str(art)])
    with pytest.raises(SystemExit):
        mtb.main()
