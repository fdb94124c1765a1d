#!/usr/bin/env python
"""Training entry point (reference src/train.py).

Usage (hydra-style overrides):
  python scripts/train.py datamodule=synthetic trainer.max_epochs=3
  python scripts/train.py model=discrete_diffusion datamodule=ucf101 \
      model.checkpoint_paths.autoencoder=/path/to/stage1/checkpoints
  python scripts/train.py debug=fdr datamodule=synthetic
"""
import sys
from pathlib import Path

sys.path.insert(0, str(Path(__file__).resolve().parent.parent))

from gif_synthesis_with_discrete_diffusion_tpu.tasks import train
from gif_synthesis_with_discrete_diffusion_tpu.utils.config import compose


def main() -> None:
    cfg = compose("train", sys.argv[1:])
    metrics = train(cfg)
    for k, v in sorted(metrics.items()):
        print(f"{k}: {v:.6g}")


if __name__ == "__main__":
    main()
