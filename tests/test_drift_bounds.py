"""Shipped-sampler numerics drift bounds (VERDICT r3 #2).

The megakernel samples with bf16 matmul operands (f32 accumulation). The
true-f32 reference (what the torch reference computes, dt.py:240-249) is
the f32 path at matmul precision 'highest' — at TPU DEFAULT precision XLA
truncates f32 operands to bf16 anyway, so default-f32 and bf16-rounded
params are bit-identical (measured; see scripts/measure_drift.py).

Two tiers:
* fast — the committed PARITY_DRIFT.json artifact (the full 100-step
  honest-scale measurement) stays within the documented bounds;
* tpu — re-measure a 20-step spot check on the real chip through the
  production script and assert the same bounds hold fresh.
"""
import json
import os
import subprocess
import sys

import pytest

_REPO = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))

# Documented bounds (PARITY.md): per-step posterior drift of the shipped
# bf16-operand numerics vs the true-f32 reference. Measured at the honest
# scale: flip mean 3.5e-5 / max 9.8e-4, tv mean 1.8e-5 / max 1.1e-3,
# |dlogp| max 1.7e-2. Bounds leave ~5x headroom for rng/config variation.
BOUNDS = {
    "token_flip_rate_mean": 5e-4,
    "token_flip_rate_max": 5e-3,
    "tv_mean": 5e-4,
    "tv_max": 5e-3,
    "abs_dlogp_max": 0.1,
}


def _assert_bounds(coupled: dict):
    for key, bound in BOUNDS.items():
        assert coupled[key] <= bound, (
            f"{key}={coupled[key]} exceeds the documented bound {bound}")


def test_parity_drift_artifact_within_bounds():
    path = os.path.join(_REPO, "PARITY_DRIFT.json")
    if not os.path.exists(path):
        pytest.skip("PARITY_DRIFT.json not measured yet")
    with open(path) as f:
        artifact = json.load(f)
    assert artifact["config"]["tokens"] == 1024     # honest scale
    assert artifact["config"]["steps"] == 100
    _assert_bounds(artifact["coupled_per_step"])
    e2e = artifact.get("end_to_end_megakernel")
    if e2e is not None:
        # bf16 packing is exactly what MXU default precision does anyway
        assert e2e["final_token_disagreement_bf16w_vs_f32w"] == 0.0
    # round-5 extensions: second honest seed + the MSRVTT 2304-token grid
    # (VERDICT r4 #5) live under sections{} and honor the same bounds
    for name, section in (artifact.get("sections") or {}).items():
        _assert_bounds(section["coupled_per_step"])
        if name == "msrvtt":
            assert section["config"]["tokens"] == 2304
            assert section["config"]["steps"] == 100


def test_parity_drift_sections_present():
    """The round-5 protocol extensions are committed: a second seed at the
    honest scale and the MSRVTT 2304-token grid."""
    path = os.path.join(_REPO, "PARITY_DRIFT.json")
    if not os.path.exists(path):
        pytest.skip("PARITY_DRIFT.json not measured yet")
    with open(path) as f:
        artifact = json.load(f)
    sections = artifact.get("sections") or {}
    if not sections:
        pytest.skip("sections not measured yet (round-5 TPU runs pending)")
    assert "honest_seed2" in sections
    assert "msrvtt" in sections
    assert sections["honest_seed2"]["config"]["seed"] != \
        artifact["config"].get("seed", 1)


@pytest.mark.tpu
def test_drift_spot_check_on_chip(tmp_path):
    """20-step half-config coupled run through scripts/measure_drift.py on
    the real chip; same bounds (per-step stats, no compounding, so the
    shorter run is directly comparable)."""
    env = dict(os.environ)
    for var in ("JAX_PLATFORMS", "JAX_PLATFORM_NAME"):
        env.pop(var, None)
    env["XLA_FLAGS"] = " ".join(
        f for f in env.get("XLA_FLAGS", "").split()
        if "xla_force_host_platform_device_count" not in f)
    env["PYTHONPATH"] = _REPO + os.pathsep + env.get("PYTHONPATH", "")
    out = tmp_path / "drift.json"
    proc = subprocess.run(
        [sys.executable, os.path.join(_REPO, "scripts", "measure_drift.py"),
         "--config", "half", "--steps", "20", "--batch", "2",
         "--skip-e2e", "--out", str(out)],
        env=env, cwd=_REPO, capture_output=True, text=True, timeout=840)
    assert proc.returncode == 0, proc.stderr[-2000:]
    with open(out) as f:
        artifact = json.load(f)
    assert artifact["end_to_end_megakernel"] is None
    _assert_bounds(artifact["coupled_per_step"])
