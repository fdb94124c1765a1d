"""The TPU job scripts must stay composable: every override line in
scripts/tpu/*.sh mirrors the reference SLURM .job launch lines (reference
vqvae.job:16, ucf-ddiff-train.job:16, msrvtt-ddiff-train.job:16) and has to
resolve against the config tree."""
import re
import shlex
from pathlib import Path

import pytest

from gif_synthesis_with_discrete_diffusion_tpu.utils.config import compose

_TPU_DIR = Path(__file__).resolve().parent.parent / "scripts" / "tpu"
_JOBS = sorted(p.name for p in _TPU_DIR.glob("*.sh")
               if p.name != "launch_tpu.sh")


def _overrides(script: Path) -> list[str]:
    """Extract the `python scripts/train.py` override args from a job."""
    text = script.read_text()
    m = re.search(r"python scripts/train\.py(.*?)(?:\n\n|\Z)", text,
                  re.DOTALL)
    assert m, f"no train.py invocation in {script.name}"
    args = shlex.split(m.group(1).replace("\\\n", " "))
    return [a for a in args if a != '"$@"' and "=" in a]


@pytest.mark.parametrize("job", _JOBS)
def test_job_script_overrides_compose(job):
    ovr = _overrides(_TPU_DIR / job)
    assert len(ovr) >= 8, f"{job}: expected a full override line, got {ovr}"
    cfg = compose("train", ovr)
    assert cfg["model"]["do_evaluation"] is True
    assert cfg["trainer"]["max_epochs"] in (500, 2000)
    # the stage-2 jobs must reach the transformer spatial-size surface
    if "ddiff" in job:
        t = cfg["model"]["generator"]["diffusion_model"]["transformer"]
        assert t["content_spatial_size"] in ([32, 32], [48, 48])
        assert cfg["model"]["autoencoder"]["n_codes"] == 4096


def test_job_scripts_exist():
    assert set(_JOBS) == {"vqvae_ucf.sh", "ddiff_ucf.sh", "ddiff_msrvtt.sh"}
