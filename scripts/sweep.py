#!/usr/bin/env python
"""Multirun / hyperparameter sweep entry (the reference's hydra `-m`
multirun + optuna sweeper, configs/hparams_search/mnist_optuna.yaml).

Grid multirun over comma-separated override values:
  python scripts/sweep.py datamodule=synthetic \
      "model.lr_args.gen_lr=1e-4,4e-4" "batch_size=16,32"

Random search with --random N over `key=low:high(:log)` ranges:
  python scripts/sweep.py --random 8 --monitor total/val \
      datamodule=synthetic "model.lr_args.gen_lr=1e-5:1e-2:log"

Each trial runs in-process; failures are logged and the sweep continues
(the reference's task_wrapper behavior). Prints the best trial last.
"""
import itertools
import math
import random
import sys
from pathlib import Path

sys.path.insert(0, str(Path(__file__).resolve().parent.parent))

from gif_synthesis_with_discrete_diffusion_tpu.tasks import train
from gif_synthesis_with_discrete_diffusion_tpu.utils.config import compose
from gif_synthesis_with_discrete_diffusion_tpu.utils.logging import get_logger

log = get_logger("sweep")


def _split_grid(val: str) -> list[str]:
    """Split on commas OUTSIDE brackets ('[1,4,4]' is one value;
    '1e-4,4e-4' is two)."""
    parts, depth, cur = [], 0, ""
    for ch in val:
        if ch in "[{(":
            depth += 1
        elif ch in "]})":
            depth -= 1
        if ch == "," and depth == 0:
            parts.append(cur)
            cur = ""
        else:
            cur += ch
    parts.append(cur)
    return parts


def _grid_trials(overrides):
    fixed, grids = [], []
    for ov in overrides:
        key, _, val = ov.partition("=")
        parts = _split_grid(val)
        if len(parts) > 1:
            grids.append([(key, v) for v in parts])
        else:
            fixed.append(ov)
    for combo in itertools.product(*grids) if grids else [()]:
        yield fixed + [f"{k}={v}" for k, v in combo]


def _random_trials(overrides, n, seed=0):
    rng = random.Random(seed)
    fixed, ranges = [], []
    for ov in overrides:
        key, _, val = ov.partition("=")
        parts = val.split(":")
        if len(parts) >= 2:
            ranges.append((key, float(parts[0]), float(parts[1]),
                           len(parts) > 2 and parts[2] == "log"))
        else:
            fixed.append(ov)
    for _ in range(n):
        trial = list(fixed)
        for key, lo, hi, is_log in ranges:
            if is_log:
                v = math.exp(rng.uniform(math.log(lo), math.log(hi)))
            else:
                v = rng.uniform(lo, hi)
            trial.append(f"{key}={v:.6g}")
        yield trial


def main() -> None:
    args = sys.argv[1:]
    n_random = 0
    monitor = "total/val"
    mode = "min"
    rest = []
    it = iter(args)
    for a in it:
        if a == "--random":
            n_random = int(next(it))
        elif a == "--monitor":
            monitor = next(it)
        elif a == "--mode":
            mode = next(it)
        else:
            rest.append(a)

    trials = (_random_trials(rest, n_random) if n_random
              else _grid_trials(rest))
    results = []
    for i, trial in enumerate(trials):
        log.info("=== trial %d: %s", i, trial)
        try:
            cfg = compose("train", trial)
            metrics = train(cfg)
            val = metrics.get(monitor, float("nan"))
            results.append((val, i, trial))
            log.info("trial %d -> %s=%s", i, monitor, val)
        except Exception as e:  # survive failed trials like the reference
            log.error("trial %d failed: %s", i, e)

    if results:
        best = (min if mode == "min" else max)(
            (r for r in results if r[0] == r[0]), default=None)
        if best:
            print(f"best trial {best[1]}: {monitor}={best[0]:.6g} "
                  f"overrides={best[2]}")


if __name__ == "__main__":
    main()
