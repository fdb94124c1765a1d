"""End-to-end Stage-1 (VQ-VAE) training on the virtual 8-device CPU mesh.

The JAX analogue of the reference's fast_dev_run + ddp_spawn + resume tests
(reference tests/test_train.py:11-88).
"""
import numpy as np
import pytest

import jax

from gif_synthesis_with_discrete_diffusion_tpu.data.synthetic import (
    SyntheticVideoDataModule)
from gif_synthesis_with_discrete_diffusion_tpu.train.stage1 import (
    Stage1Trainer)


def _cfg(tmp_path, max_epochs=1):
    return {
        "seed": 0,
        "trainer": {"max_epochs": max_epochs, "check_val_every_n_epoch": 1,
                    "log_every_n_steps": 1,
                    "mesh": {"data": None, "model": 1}},
        "model": {
            "generator": {"embedding_dim": 8, "n_codes": 16, "n_hiddens": 16,
                          "n_res_layers": 1, "downsample": [1, 4, 4],
                          "sequence_length": 2, "resolution": 16,
                          "kernel_mode": "xla"},
            "losses": {"loss_dict": {"l_dummy": 1.0}},
            "lr_args": {"gen_lr": 4e-4},
        },
        "logger": {"csv": {}},
        "callbacks": {"model_checkpoint": {"monitor": "total/val",
                                           "save_top_k": 2}},
    }


def _dm():
    return SyntheticVideoDataModule(batch_size=8, sequence_length=2,
                                    resolution=16, num_train=16, num_val=8)


def test_stage1_fast_dev_run(tmp_path):
    assert jax.device_count() == 8
    trainer = Stage1Trainer(_cfg(tmp_path), _dm(), tmp_path / "run")
    metrics = trainer.fit()
    assert "total/train" in metrics and "total/val" in metrics
    assert np.isfinite(metrics["total/train"])
    assert trainer.global_step == 2  # 16/8 batches
    # csv metrics file written
    assert (tmp_path / "run" / "metrics.csv").exists()
    # codebook got trained (EMA counts non-zero)
    assert float(jax.device_get(
        trainer.state.codebook["codebook"]["ema_count"]).sum()) > 0


def test_stage1_loss_decreases(tmp_path):
    trainer = Stage1Trainer(_cfg(tmp_path, max_epochs=8), _dm(),
                            tmp_path / "run")
    metrics = trainer.fit()
    # reconstruction improves over 8 epochs on the tiny synthetic set
    assert metrics["total/train"] < 60.0


def test_stage1_resume_roundtrip(tmp_path):
    cfg = _cfg(tmp_path, max_epochs=1)
    run = tmp_path / "run"
    t1 = Stage1Trainer(cfg, _dm(), run)
    t1.fit()
    step1 = t1.global_step
    params1 = jax.device_get(t1.state.params)

    cfg2 = _cfg(tmp_path, max_epochs=2)
    t2 = Stage1Trainer(cfg2, _dm(), run)
    t2.fit(resume=True)
    assert t2.global_step == step1 * 2
    # resumed params must have continued from t1's, not re-initialized:
    # after resume+1 epoch they differ from t1's but share the same tree
    flat1 = jax.tree.leaves(params1)
    flat2 = jax.tree.leaves(jax.device_get(t2.state.params))
    assert len(flat1) == len(flat2)
    assert any(np.abs(a - b).max() > 0 for a, b in zip(flat1, flat2))


def test_stage1_test_split(tmp_path):
    trainer = Stage1Trainer(_cfg(tmp_path), _dm(), tmp_path / "run")
    trainer.fit()
    metrics = trainer.test()
    assert "total/test" in metrics and np.isfinite(metrics["total/test"])


def test_stage1_restore_from_external_run(tmp_path):
    """train ckpt_path=<other run> resumes from that run's checkpoints."""
    t1 = Stage1Trainer(_cfg(tmp_path, max_epochs=1), _dm(), tmp_path / "a")
    t1.fit()
    t2 = Stage1Trainer(_cfg(tmp_path, max_epochs=2), _dm(), tmp_path / "b")
    t2.fit(restore_from=str(tmp_path / "a" / "checkpoints"))
    assert t2.global_step == 2 * t1.global_step
    # new run saves its own checkpoints
    assert (tmp_path / "b" / "checkpoints").exists()
