"""Eval task entry: test a trained checkpoint end-to-end (the reference's
eval path is broken as committed — SURVEY §3.5 — ours must work)."""
import numpy as np

from gif_synthesis_with_discrete_diffusion_tpu.tasks import evaluate, train
from gif_synthesis_with_discrete_diffusion_tpu.utils.config import (
    compose_from_root, default_config_root)

_OVR = [
    "datamodule=synthetic", "batch_size=8", "datamodule.resolution=16",
    "datamodule.sequence_length=2", "datamodule.num_train=16",
    "datamodule.num_val=8", "datamodule.num_test=8",
    "model.generator.n_codes=16", "model.generator.n_hiddens=16",
    "model.generator.n_res_layers=1", "model.generator.downsample=[1,4,4]",
    "model.generator.embedding_dim=8", "model.generator.kernel_mode=xla",
    "model.do_evaluation=false", "seed=0",
]


def test_train_then_evaluate(tmp_path, monkeypatch):
    monkeypatch.setenv("PROJECT_ROOT", str(tmp_path))
    root = default_config_root()
    cfg = compose_from_root(root, "train", _OVR + ["trainer.max_epochs=1"])
    train(cfg)
    ckpt = sorted((tmp_path / "logs" / "train" / "runs").glob(
        "*/checkpoints"))[-1]

    ecfg = compose_from_root(
        root, "eval",
        ["model=videogpt_vq_vae"] + _OVR + [f"ckpt_path={ckpt}"])
    metrics = evaluate(ecfg)
    assert "total/test" in metrics
    assert np.isfinite(metrics["total/test"])
