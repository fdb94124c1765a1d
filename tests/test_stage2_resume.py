"""Stage-2 checkpoint/resume round trip (Lt buffers + codebook included)."""
import numpy as np

import jax

from gif_synthesis_with_discrete_diffusion_tpu.data.synthetic import (
    SyntheticVideoDataModule)
from gif_synthesis_with_discrete_diffusion_tpu.train.stage2 import (
    Stage2Trainer)
from tests.test_stage2_train import AE, _cfg, _dm


def test_stage2_resume_roundtrip(tmp_path):
    run = tmp_path / "run"
    t1 = Stage2Trainer(_cfg(max_epochs=1), _dm(), run)
    t1.fit()
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
