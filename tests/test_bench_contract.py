"""bench.py contract: exactly one JSON line on stdout, watchdog behavior,
and the measured-baseline gating (BASELINE_MEASURED.json must match the
current problem size or the labeled estimate is used)."""
import json
import os
import sys

import pytest

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

import bench


@pytest.fixture(autouse=True)
def _restore_config():
    saved = (bench.N_CODES, bench.DOWNSAMPLE, bench.RES, bench.BATCH)
    yield
    bench.N_CODES, bench.DOWNSAMPLE, bench.RES, bench.BATCH = saved


def test_vs_baseline_measured_only_at_matching_config():
    bench.apply_config("honest")
    f = bench._vs_baseline_fields(4.0)
    assert "measured torch CPU" in f["baseline_source"]
    assert "(BASELINE_MEASURED.json)" in f["baseline_source"]
    assert f["vs_baseline"] != f["vs_pytorch_gpu_estimate"]

    bench.apply_config("msrvtt")   # 2304 tokens: its own measured artifact
    f = bench._vs_baseline_fields(0.5)
    assert "(BASELINE_MEASURED_2304.json)" in f["baseline_source"]

    bench.apply_config("half")     # 512 tok / 2049 classes: no artifact
    f = bench._vs_baseline_fields(10.0)
    assert "estimate" in f["baseline_source"]
    assert f["vs_baseline"] == f["vs_pytorch_gpu_estimate"]


def test_vs_baseline_picks_matching_artifact_from_glob(tmp_path, monkeypatch):
    # a second BASELINE_MEASURED_*.json measured at the msrvtt grid is
    # picked up for that config and ignored for the honest config. Runs
    # against a tmp_path COPY of the artifacts — an earlier version wrote
    # into the repo root and deleted the real committed
    # BASELINE_MEASURED_2304.json on cleanup.
    with open(bench._MEASURED_BASELINE_PATH) as f:
        art = json.load(f)
    with open(tmp_path / "BASELINE_MEASURED.json", "w") as f:
        json.dump(art, f)
    art["config"]["tokens"] = 2304
    art["torch_cpu_clips_per_sec"] = 0.0004
    with open(tmp_path / "BASELINE_MEASURED_2304.json", "w") as f:
        json.dump(art, f)
    monkeypatch.setattr(bench, "_MEASURED_BASELINE_PATH",
                        str(tmp_path / "BASELINE_MEASURED.json"))
    bench.apply_config("msrvtt")
    f = bench._vs_baseline_fields(0.6)
    assert "BASELINE_MEASURED_2304.json" in f["baseline_source"]
    assert f["vs_baseline"] == round(0.6 / 0.0004, 3)
    # apply_config('honest') must RESET the globals (it was once a
    # no-op, so a prior msrvtt apply leaked its problem size)
    bench.apply_config("honest")
    f = bench._vs_baseline_fields(4.67)
    assert "(BASELINE_MEASURED.json)" in f["baseline_source"]


def test_watchdog_returns_on_live_backend():
    # conftest forces the CPU platform, which always initializes
    bench._backend_watchdog(timeout_s=120.0)


def test_watchdog_error_path_prints_one_json_line(monkeypatch, capsys):
    import time

    import jax
    exits = []
    monkeypatch.setattr(os, "_exit", lambda code: exits.append(code))
    # simulate a wedged tunnel: the probe's jax.devices() never returns
    monkeypatch.setattr(jax, "devices", lambda: time.sleep(30))
    bench._backend_watchdog(timeout_s=0.0)
    assert exits == [1]
    out = capsys.readouterr().out.strip().splitlines()
    assert len(out) == 1
    parsed = json.loads(out[0])
    assert parsed["metric"] == "error" and "error" in parsed
