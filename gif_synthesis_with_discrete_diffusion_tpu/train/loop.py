"""Generic training loop: epochs, validation, checkpointing, early stopping.

This replaces the reference's ``pl.Trainer`` + LightningModule glue
(reference src/models/base.py:4-63, src/tasks/train_task.py:14-82) with a
small explicit loop:

* jitted train/eval steps supplied by stage-specific subclasses;
* batches sharded over the mesh's ``data`` axis each step;
* per-epoch loss aggregation (``MetricAccumulator``), logged as
  ``total/val``-style names (reference loss.py:53-59);
* ``last`` + best-by-monitor Orbax checkpoints, resume, early stopping
  (reference configs/callbacks/default.yaml);
* periodic sample rendering hooks (reference renders mp4 every 5-10 val
  epochs, text_motion_model.py:127-128).
"""
from __future__ import annotations

import functools
import time
from pathlib import Path
from typing import Any, Iterator, Mapping

import jax
import numpy as np

from ..parallel.mesh import create_mesh, shard_batch, shard_state
from ..train.metrics import MetricAccumulator, loss_log_name
from ..utils.checkpoint import CheckpointManager
from ..utils.logging import MetricLogger, build_metric_loggers, get_logger

log = get_logger(__name__)

__all__ = ["Trainer", "shared_jit", "freeze_cfg", "shared_module_init",
           "shared_module_apply"]

_NON_ARRAY_KEYS = ("text",)  # host-side only; never shipped to device

# Process-wide cache of jitted step functions keyed by a frozen config
# signature. jax.jit keys its executable cache on the wrapped callable's
# identity, so two trainers built from equal configs would otherwise
# recompile everything (the dominant cost of the CPU-mesh test suite, and
# of any production process that rebuilds a trainer). flax modules hold
# dict-valued fields (unhashable), so the cache is keyed by the *config*
# that built them rather than by static jit arguments.
_SHARED_JIT: dict = {}


def freeze_cfg(obj):
    """Recursively convert a config fragment into a hashable key."""
    if isinstance(obj, Mapping):
        return tuple(sorted((k, freeze_cfg(v)) for k, v in obj.items()))
    if isinstance(obj, (list, tuple)):
        return tuple(freeze_cfg(v) for v in obj)
    return obj


def shared_jit(key, factory):
    """Return (building once) the jitted callable for ``key``."""
    fn = _SHARED_JIT.get(key)
    if fn is None:
        fn = _SHARED_JIT[key] = factory()
    return fn


def _module_key(module):
    """Hashable identity for a flax Module: the module itself when its
    fields are hashable, else (type, frozen dataclass fields) — modules
    like DiscreteDiffusionModel carry dict-valued config fields."""
    try:
        hash(module)
        return module
    except TypeError:
        import dataclasses
        fields = {f.name: getattr(module, f.name)
                  for f in dataclasses.fields(module)
                  if f.name not in ("parent", "name")}
        return (type(module), freeze_cfg(fields))


def _abstract_sig(tree):
    """Hashable (treedef, shape/dtype leaves) signature of a pytree."""
    leaves, treedef = jax.tree.flatten(tree)
    return treedef, tuple((getattr(x, "shape", ()), str(jax.numpy.result_type(x)))
                          for x in leaves)


def shared_module_init(module, rngs, *args, **static_kwargs):
    """``module.init`` through the process-wide ``shared_jit`` cache.

    flax ``module.init`` is a fresh bound method per Module instance, so a
    plain ``jax.jit(module.init)`` recompiles for every trainer built from
    an equal config (~10-20s per module on a 1-core host — the dominant
    warm-build cost of the CPU-mesh test suite). flax modules hash by field
    values, so keying the jitted init on (module, abstract arg signature)
    lets equal-config trainers share ONE compile. Eager init would dispatch
    ~100 tiny per-op XLA compiles and is slower still; the jitted init is
    numerically identical (data-dependent init traces fine).
    """
    key = ("module_init", _module_key(module), _abstract_sig((rngs, args)),
           tuple(sorted(static_kwargs.items())))
    fn = shared_jit(key, lambda: jax.jit(
        module.init, static_argnames=tuple(static_kwargs)))
    return fn(rngs, *args, **static_kwargs)


def shared_module_apply(tag, module, variables, *args, **jit_kwargs):
    """A jitted ``module.apply`` shared across equal-config trainers.

    Same motivation as :func:`shared_module_init`; ``jit_kwargs`` (e.g.
    ``static_argnames``/``method``) must be identical for a given ``tag``.
    """
    method = jit_kwargs.pop("method", None)
    key = ("module_apply", tag, _module_key(module),
           _abstract_sig((variables, args)))
    fn = shared_jit(key, lambda: jax.jit(
        functools.partial(module.apply, method=method) if method is not None
        else module.apply, **jit_kwargs))
    return fn(variables, *args)


def _device_batch(batch: Mapping[str, Any], mesh) -> dict:
    db = {k: v for k, v in batch.items() if k not in _NON_ARRAY_KEYS}
    return shard_batch(db, mesh)


class Trainer:
    """Base trainer; subclasses implement build/steps."""

    def __init__(self, cfg: Mapping[str, Any], datamodule, run_dir: str | Path,
                 mesh=None):
        self.cfg = cfg
        self.datamodule = datamodule
        self.run_dir = Path(run_dir)
        self.run_dir.mkdir(parents=True, exist_ok=True)
        tcfg = cfg.get("trainer", {})
        self.max_epochs = int(tcfg.get("max_epochs", 1))
        self.max_steps = tcfg.get("max_steps")
        self.check_val_every_n_epoch = int(
            tcfg.get("check_val_every_n_epoch", 1))
        self.log_every_n_steps = int(tcfg.get("log_every_n_steps", 50))
        # null = per-stage default: 5 for stage 1, 10 for stage 2 (reference
        # text_motion_model.py:127 vs multistage_text_motion_model.py:235)
        _rev = tcfg.get("render_every_n_epochs")
        self.render_every_n_epochs = 5 if _rev is None else int(_rev)
        self.seed = int(cfg.get("seed") or 0)

        mesh_cfg = tcfg.get("mesh", {}) or {}
        self.mesh = mesh if mesh is not None else create_mesh(
            data=mesh_cfg.get("data"), model=int(mesh_cfg.get("model", 1)))

        cb = cfg.get("callbacks", {}) or {}
        ck = cb.get("model_checkpoint", {}) or {}
        self.ckpt = CheckpointManager(
            self.run_dir / "checkpoints",
            monitor=ck.get("monitor", "total/val"),
            mode=ck.get("mode", "min"),
            max_to_keep=int(ck.get("save_top_k", 3)))
        # second checkpoint tracking the best FVD (reference
        # configs/callbacks/default.yaml:19-25 fid_checkpoint monitoring
        # Metrics/fvd-val); saved only on epochs where FVD was computed
        # enabled by PRESENCE (an empty dict means "defaults", like
        # model_checkpoint above), disabled by absence or explicit null
        fk = cb.get("fid_checkpoint")
        self.fid_ckpt = None
        if fk is not None and "fid_checkpoint" in cb:
            fk = fk or {}
            self.fid_ckpt = CheckpointManager(
                self.run_dir / "checkpoints_fvd",
                monitor=fk.get("monitor", "Metrics/fvd-val"),
                mode=fk.get("mode", "min"),
                max_to_keep=int(fk.get("save_top_k", 1)))
        es = cb.get("early_stopping", {}) or {}
        self.es_monitor = es.get("monitor", "total/val")
        self.es_patience = int(es.get("patience", 5000))
        self.es_mode = es.get("mode", "min")
        self._es_best = np.inf if self.es_mode == "min" else -np.inf
        self._es_bad_epochs = 0

        self.loggers: list[MetricLogger] = build_metric_loggers(
            cfg.get("logger"), self.run_dir)
        self.state = None  # set by subclass build()
        self.global_step = 0
        self.current_epoch = 0
        self._rng = jax.random.key(self.seed)

    # ---- subclass API ----------------------------------------------------
    def build(self, example_batch: Mapping[str, Any]) -> None:
        raise NotImplementedError

    def train_step(self, state, batch, rng):
        """-> (new_state, {loss_name: value})"""
        raise NotImplementedError

    def eval_step(self, state, batch, rng):
        """-> {loss_name: value}"""
        raise NotImplementedError

    def loss_names(self) -> list[str]:
        raise NotImplementedError

    def render_samples(self, epoch: int) -> None:
        pass

    def extra_eval_metrics(self, split: str, epoch: int) -> dict[str, float]:
        """e.g. FVD every N epochs (stage-specific)."""
        return {}

    # ---- loop ------------------------------------------------------------
    def next_rng(self) -> jax.Array:
        self._rng, sub = jax.random.split(self._rng)
        return sub

    def _log(self, metrics: Mapping[str, float], step: int) -> None:
        for lg in self.loggers:
            lg.log_metrics(metrics, step)

    def fit(self, resume: bool = False,
            restore_from: str | None = None) -> dict[str, float]:
        example = next(iter(self.datamodule.train_batches(0)))
        self.build(example)
        # place state on the mesh: data-parallel replication plus
        # tensor-parallel sharding of the large tables over the `model` axis
        self.state = shard_state(self.state, self.mesh)
        restored = False
        if restore_from:
            # resume from an external run's checkpoints (train ckpt_path=...,
            # reference train_task.py:64 trainer.fit(ckpt_path=...))
            mgr = CheckpointManager(restore_from, monitor=None)
            self.state = mgr.restore(self.state)
            mgr.close()
            restored = True
        elif resume and self.ckpt.latest_step() is not None:
            self.state = self.ckpt.restore(self.state)
            restored = True
        if restored:
            self.global_step = int(jax.device_get(self.state.step))
            steps_per_epoch = max(self.datamodule.steps_per_epoch(), 1)
            self.current_epoch = self.global_step // steps_per_epoch
            log.info("resumed from step %d (epoch %d)", self.global_step,
                     self.current_epoch)

        final_metrics: dict[str, float] = {}
        start_epoch = self.current_epoch
        for epoch in range(start_epoch, self.max_epochs):
            self.current_epoch = epoch
            t0 = time.time()
            train_metrics = self._run_epoch("train", epoch)
            final_metrics.update(train_metrics)

            if (epoch + 1) % self.check_val_every_n_epoch == 0:
                val_metrics = self._run_epoch("val", epoch)
                extra = self.extra_eval_metrics("val", epoch)
                if extra:
                    val_metrics.update(extra)
                    self._log(extra, self.global_step)
                final_metrics.update(val_metrics)
                self.ckpt.save(self.global_step, self.state, val_metrics)
                if (self.fid_ckpt is not None
                        and self.fid_ckpt.monitor in val_metrics):
                    self.fid_ckpt.save(self.global_step, self.state,
                                       val_metrics)
                if self._early_stop(val_metrics):
                    log.info("early stopping at epoch %d", epoch)
                    break
                if (epoch % max(self.render_every_n_epochs, 1)) == 0:
                    self.render_samples(epoch)

            log.info("epoch %d done in %.1fs step=%d", epoch,
                     time.time() - t0, self.global_step)
            if self.max_steps and self.global_step >= int(self.max_steps):
                break

        self.ckpt.save(self.global_step, self.state, final_metrics)
        for lg in self.loggers:
            lg.finalize()
        return final_metrics

    def test(self) -> dict[str, float]:
        if self.state is None:
            example = next(iter(self.datamodule.test_batches(0)))
            self.build(example)
            self.state = shard_state(self.state, self.mesh)
            if self.ckpt.latest_step() is not None:
                self.state = self.ckpt.restore(self.state)
        metrics = self._run_epoch("test", self.current_epoch)
        metrics.update(self.extra_eval_metrics("test", self.current_epoch))
        self._log(metrics, self.global_step)
        return metrics

    def _batches(self, split: str, epoch: int) -> Iterator:
        fn = {"train": self.datamodule.train_batches,
              "val": self.datamodule.val_batches,
              "test": self.datamodule.test_batches}[split]
        return fn(epoch)

    def _run_epoch(self, split: str, epoch: int) -> dict[str, float]:
        acc = MetricAccumulator.empty(self.loss_names())
        train = split == "train"
        saw_batch = False
        for batch in self._batches(split, epoch):
            saw_batch = True
            db = _device_batch(batch, self.mesh)
            rng = self.next_rng()
            if train:
                self.state, values = self.train_step(self.state, db, rng)
                self.global_step += 1
                if self.global_step % self.log_every_n_steps == 0:
                    self._log({f"{k}/step": float(v)
                               for k, v in jax.device_get(values).items()},
                              self.global_step)
                if self.max_steps and self.global_step >= int(self.max_steps):
                    acc = acc.update(values)
                    break
            else:
                values = self.eval_step(self.state, db, rng)
            acc = acc.update(values)
        if not saw_batch:
            # dataset smaller than the (global) batch size yields zero
            # batches — all-zero metrics would silently look like a perfect
            # run (and feed the early-stop/checkpoint monitors)
            log.warning(
                "%s epoch %d saw ZERO batches (dataset smaller than "
                "batch_size?); its metrics are meaningless", split, epoch)
        means = jax.device_get(acc.compute())
        out = {loss_log_name(k, split): float(v) for k, v in means.items()}
        out["epoch"] = float(epoch)
        self._log(out, self.global_step)
        return out

    def _early_stop(self, metrics: Mapping[str, float]) -> bool:
        if self.es_monitor not in metrics:
            return False
        val = metrics[self.es_monitor]
        if not np.isfinite(val):
            # check_finite (reference configs/callbacks/early_stopping.yaml:13)
            log.error("monitored metric %s is %s; stopping",
                      self.es_monitor, val)
            return True
        better = val < self._es_best if self.es_mode == "min" \
            else val > self._es_best
        if better:
            self._es_best = val
            self._es_bad_epochs = 0
        else:
            self._es_bad_epochs += 1
        return self._es_bad_epochs > self.es_patience
