"""scripts/parity_fvd.py end-to-end with random-init weights: the one
command that will produce the FVD-within-5% north-star number once the
public checkpoints exist (VERDICT round-2 #9) must already run the whole
convert -> sample -> decode -> I3D -> Fréchet pipeline."""
import importlib.util
import json
import os

import numpy as np
import pytest

_SCRIPT = os.path.join(os.path.dirname(os.path.dirname(
    os.path.abspath(__file__))), "scripts", "parity_fvd.py")


@pytest.mark.slow  # full sample->decode->I3D-224px->Fréchet pipeline
def test_parity_fvd_random_init_smoke(capsys):
    spec = importlib.util.spec_from_file_location("parity_fvd", _SCRIPT)
    mod = importlib.util.module_from_spec(spec)
    spec.loader.exec_module(mod)
    out = mod.main([
        "--num-clips", "4", "--batch", "4", "--frames", "2",
        "--resolution", "16", "--codes", "16", "--embedding-dim", "8",
        "--hiddens", "16", "--res-layers", "1", "--downsample", "1", "4",
        "4", "--steps", "4", "--layers", "1", "--embd", "16", "--heads",
        "4", "--cond-dim", "32"])
    assert out["num_clips"] == 4
    assert not out["pretrained_weights"]
    assert np.isfinite(out["fvd"])
    # the script's stdout contract is one JSON line
    last = capsys.readouterr().out.strip().splitlines()[-1]
    assert json.loads(last)["fvd"] == out["fvd"]
