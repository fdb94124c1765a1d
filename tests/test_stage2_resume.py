"""Stage-2 checkpoint/resume round trip (Lt buffers + codebook included)."""
import shutil

import numpy as np

import jax

from gif_synthesis_with_discrete_diffusion_tpu.train.stage2 import (
    Stage2Trainer)
from tests.test_stage2_train import _cfg, _dm


def test_stage2_resume_roundtrip(stage2_trained, tmp_path):
    # reuse the session-shared 1-epoch run (conftest.py) as the checkpoint
    # source; copy it so the resumed run writes into its own directory
    t1, _ = stage2_trained
    run = tmp_path / "run"
    shutil.copytree(t1.run_dir, run)
    lt1 = np.asarray(jax.device_get(
        t1.state.diffusion["diffusion"]["lt_count"]))
    step1 = t1.global_step

    t2 = Stage2Trainer(_cfg(max_epochs=2), _dm(), run)
    t2.fit(resume=True)
    assert t2.global_step == 2 * step1
    lt2 = np.asarray(jax.device_get(
        t2.state.diffusion["diffusion"]["lt_count"]))
    # Lt counts resumed and kept growing (not reset to zero)
    assert lt2.sum() > lt1.sum() > 0
