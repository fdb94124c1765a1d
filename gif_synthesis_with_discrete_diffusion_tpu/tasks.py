"""Task layer: config -> datamodule/trainer -> fit/test.

Equivalent of the reference's task orchestration (reference
src/tasks/train_task.py:14-82, src/tasks/eval_task.py:13-62): seed, build
everything from the composed config, run, return metrics. Run directories
are timestamped like the reference's hydra run dirs
(configs/hydra/default.yaml:8-12), and the composed config is saved to
``config_tree.log`` (the rich-print analogue, utils/rich_utils.py:21-103).
"""
from __future__ import annotations

import datetime
import random
from pathlib import Path
from typing import Any, Mapping

import numpy as np

from .utils.config import to_yaml
from .utils.logging import get_logger

log = get_logger(__name__)

__all__ = ["train", "evaluate", "build_datamodule", "build_trainer",
           "make_run_dir"]


def build_datamodule(cfg: Mapping[str, Any]):
    d = dict(cfg.get("datamodule", {}))
    name = d.get("dataname", "synthetic")
    if name == "synthetic":
        from .data.synthetic import SyntheticVideoDataModule
        return SyntheticVideoDataModule(
            batch_size=int(d.get("batch_size", 4)),
            sequence_length=int(d.get("sequence_length", 4)),
            resolution=int(d.get("resolution", 64)),
            num_train=int(d.get("num_train", 64)),
            num_val=int(d.get("num_val", 16)),
            num_test=int(d.get("num_test", 16)),
            seed=int(cfg.get("seed") or 0))
    if name in ("ucf101", "msrvtt"):
        from .data.prefetch import PrefetchingDataModule
        from .data.video_dataset import MSRVTTDataModule, UCF101DataModule
        cls = UCF101DataModule if name == "ucf101" else MSRVTTDataModule
        dm = cls(**{**d, "batch_size": int(d.get("batch_size", 32))})
        workers = int(d.get("num_workers", 0))
        return PrefetchingDataModule(dm, workers) if workers > 0 else dm
    raise ValueError(f"unknown datamodule {name!r}")


def _build_fvd_evaluator(cfg: Mapping[str, Any]):
    from .eval.evaluator import FVDEvaluator
    i3d_params = None
    eval_ckpt = cfg.get("eval_ckpt")
    if eval_ckpt and Path(str(eval_ckpt)).exists():
        from .convert.torch_i3d import convert_i3d_file
        i3d_params = convert_i3d_file(str(eval_ckpt))
        log.info("loaded pretrained I3D from %s", eval_ckpt)
    return FVDEvaluator(i3d_params=i3d_params)


def build_trainer(cfg: Mapping[str, Any], datamodule, run_dir):
    stage = int(cfg.get("model", {}).get("stage", 1))
    if stage == 1:
        from .train.stage1 import Stage1Trainer
        trainer = Stage1Trainer(cfg, datamodule, run_dir)
        if cfg.get("model", {}).get("do_evaluation", False):
            trainer.evaluator = _build_fvd_evaluator(cfg)
    else:
        from .train.stage2 import Stage2Trainer
        trainer = Stage2Trainer(cfg, datamodule, run_dir)
        if cfg.get("model", {}).get("do_evaluation", False):
            trainer.evaluator = _build_fvd_evaluator(cfg)
    return trainer


def make_run_dir(cfg: Mapping[str, Any]) -> Path:
    base = cfg.get("paths", {}).get("output_dir", "logs/runs")
    stamp = datetime.datetime.now().strftime("%Y-%m-%d_%H-%M-%S")
    run_dir = Path(base) / stamp
    run_dir.mkdir(parents=True, exist_ok=True)
    return run_dir


def _force_platform(platform: str | None, host_device_count) -> None:
    """Honor ``trainer.platform`` (the analogue of the reference's
    ``trainer.accelerator``, configs/trainer/default.yaml:8). Must run
    before any jax backend initializes; mirrors tests/conftest.py (the
    axon TPU plugin overrides JAX_PLATFORMS alone)."""
    if not platform and not host_device_count:
        return
    import os
    if host_device_count:
        platform = platform or "cpu"
        flags = os.environ.get("XLA_FLAGS", "")
        if "xla_force_host_platform_device_count" not in flags:
            os.environ["XLA_FLAGS"] = (
                flags + " --xla_force_host_platform_device_count="
                f"{int(host_device_count)}").strip()
    os.environ["JAX_PLATFORMS"] = str(platform)
    os.environ["JAX_PLATFORM_NAME"] = str(platform)
    import jax
    jax.config.update("jax_platforms", str(platform))


def _setup(cfg: Mapping[str, Any]):
    trainer_cfg = cfg.get("trainer", {})
    _force_platform(trainer_cfg.get("platform"),
                    trainer_cfg.get("host_device_count"))
    seed = cfg.get("seed")
    if seed is not None:
        random.seed(int(seed))
        np.random.seed(int(seed))
    if cfg.get("debug_nans"):
        import jax
        jax.config.update("jax_debug_nans", True)
    run_dir = make_run_dir(cfg)
    if cfg.get("profiler"):
        # debug=profiler preset: jax trace viewable in TensorBoard/Perfetto
        # (the reference enables Lightning's profiler, configs/debug/profiler)
        import jax
        jax.profiler.start_trace(str(run_dir / "jax_trace"))
        import atexit
        atexit.register(jax.profiler.stop_trace)
    (run_dir / "config_tree.log").write_text(to_yaml(cfg))
    if cfg.get("extras", {}).get("print_config", False):
        log.info("config:\n%s", to_yaml(cfg))
    return run_dir


def task_wrapper(task_fn):
    """Exception-safe task execution: logs the exception to the run dir,
    records wall-clock to ``exec_time.log``, and closes loggers so multiruns
    survive a failed trial (reference src/utils/utils.py:18-53)."""
    import functools
    import time
    import traceback

    @functools.wraps(task_fn)
    def wrap(cfg, run_dir, *args, **kwargs):
        t0 = time.time()
        try:
            return task_fn(cfg, run_dir, *args, **kwargs)
        except Exception:
            (Path(run_dir) / "exception.log").write_text(
                traceback.format_exc())
            raise
        finally:
            (Path(run_dir) / "exec_time.log").write_text(
                f"'{cfg.get('task_name', 'task')}' execution time: "
                f"{time.time() - t0:.2f} (s)\n")
    return wrap


@task_wrapper
def _train_impl(cfg, run_dir) -> dict[str, float]:
    dm = build_datamodule(cfg)
    trainer = build_trainer(cfg, dm, run_dir)
    metrics: dict[str, float] = {}
    if cfg.get("train", True):
        metrics = trainer.fit(
            resume=bool(cfg.get("resume")),
            restore_from=(str(cfg["ckpt_path"])
                          if cfg.get("ckpt_path") else None))
    if cfg.get("test", False):
        metrics.update(trainer.test())
    return metrics


def train(cfg: Mapping[str, Any]) -> dict[str, float]:
    from .utils.compile_cache import enable_compilation_cache
    enable_compilation_cache()
    run_dir = _setup(cfg)
    metrics = _train_impl(cfg, run_dir)
    log.info("run dir: %s", run_dir)
    return metrics


def evaluate(cfg: Mapping[str, Any]) -> dict[str, float]:
    from .utils.compile_cache import enable_compilation_cache
    enable_compilation_cache()
    run_dir = _setup(cfg)
    dm = build_datamodule(cfg)
    trainer = build_trainer(cfg, dm, run_dir)
    if cfg.get("ckpt_path"):
        from .utils.checkpoint import CheckpointManager
        trainer.ckpt.close()
        trainer.ckpt = CheckpointManager(
            Path(str(cfg["ckpt_path"])), monitor=trainer.ckpt.monitor,
            mode=trainer.ckpt.mode)
    return trainer.test()
