"""Orbax checkpoint management: last + best-by-monitor + resume.

Capability parity with the reference's Lightning ModelCheckpoint setup
(reference configs/callbacks/default.yaml:10-25, SURVEY §5.4): keeps
``last`` plus the best checkpoint for a monitored metric (e.g. ``total/val``
or ``Metrics/fvd-val``), and supports resume-from-step. State is any pytree
(params, optimizer state, EMA codebook, metric history).
"""
from __future__ import annotations

import json
from pathlib import Path
from typing import Any, Mapping

import jax
import orbax.checkpoint as ocp

from .logging import get_logger

__all__ = ["CheckpointManager"]

log = get_logger(__name__)


class CheckpointManager:
    """Thin wrapper over ocp.CheckpointManager with best-metric tracking."""

    def __init__(self, directory: str | Path, monitor: str | None = None,
                 mode: str = "min", max_to_keep: int = 3):
        self.directory = Path(directory).absolute()
        self.directory.mkdir(parents=True, exist_ok=True)
        self.monitor = monitor
        self.mode = mode
        assert mode in ("min", "max")
        self._mgr = ocp.CheckpointManager(
            self.directory,
            options=ocp.CheckpointManagerOptions(
                max_to_keep=max_to_keep, create=True,
                best_fn=(lambda m: m.get(self._metric_key(), 0.0))
                if monitor else None,
                best_mode=mode),
        )

    def _metric_key(self) -> str:
        # orbax metric keys must be json-safe; '/' is fine but keep it simple
        return self.monitor.replace("/", "_") if self.monitor else ""

    def save(self, step: int, state: Any,
             metrics: Mapping[str, float] | None = None) -> None:
        m = None
        if self.monitor and metrics and self.monitor in metrics:
            m = {self._metric_key(): float(metrics[self.monitor])}
        elif self.monitor:
            # orbax requires metrics when best_fn is set; fall back to worst
            worst = float("inf") if self.mode == "min" else float("-inf")
            m = {self._metric_key(): worst}
        self._mgr.save(step, args=ocp.args.StandardSave(state), metrics=m)
        self._mgr.wait_until_finished()

    def restore(self, template: Any, step: int | None = None) -> Any:
        step = step if step is not None else self.latest_step()
        assert step is not None, f"no checkpoint found in {self.directory}"
        abstract = jax.tree.map(ocp.utils.to_shape_dtype_struct, template)
        return self._mgr.restore(step, args=ocp.args.StandardRestore(abstract))

    def latest_step(self) -> int | None:
        return self._mgr.latest_step()

    def best_step(self) -> int | None:
        return self._mgr.best_step()

    def all_steps(self) -> list[int]:
        return list(self._mgr.all_steps())

    def close(self) -> None:
        self._mgr.close()
