#!/usr/bin/env python
"""Evaluation entry point (reference src/eval.py; the committed reference's
eval path is broken — SURVEY §3.5 — this one works).

Usage:
  python scripts/eval.py ckpt_path=/path/to/run/checkpoints \
      model=discrete_diffusion datamodule=ucf101
"""
import sys
from pathlib import Path

sys.path.insert(0, str(Path(__file__).resolve().parent.parent))

from gif_synthesis_with_discrete_diffusion_tpu.tasks import evaluate
from gif_synthesis_with_discrete_diffusion_tpu.utils.config import compose


def main() -> None:
    cfg = compose("eval", sys.argv[1:])
    metrics = evaluate(cfg)
    for k, v in sorted(metrics.items()):
        print(f"{k}: {v:.6g}")


if __name__ == "__main__":
    main()
