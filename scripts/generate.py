#!/usr/bin/env python
"""Inference/serving entry: load checkpoints, synthesize clips, write GIFs.

The reference only samples inside training (every 10 val epochs,
multistage_text_motion_model.py:235-236); this standalone generator covers
the deployment story.

Usage:
  python scripts/generate.py model=discrete_diffusion datamodule=synthetic \
      ckpt_path=/path/to/run/checkpoints +num_samples=4 +out_dir=./samples
"""
import sys
from pathlib import Path

sys.path.insert(0, str(Path(__file__).resolve().parent.parent))

import jax

from gif_synthesis_with_discrete_diffusion_tpu.tasks import (
    build_datamodule, build_trainer)
from gif_synthesis_with_discrete_diffusion_tpu.utils.config import compose
from gif_synthesis_with_discrete_diffusion_tpu.utils.logging import get_logger
from gif_synthesis_with_discrete_diffusion_tpu.utils.renderer import (
    render_animation)

log = get_logger("generate")


def main() -> None:
    from gif_synthesis_with_discrete_diffusion_tpu.utils.compile_cache \
        import enable_compilation_cache
    enable_compilation_cache()
    cfg = compose("train", sys.argv[1:])
    num_samples = int(cfg.get("num_samples", 4))
    out_dir = Path(cfg.get("out_dir", "samples"))
    out_dir.mkdir(parents=True, exist_ok=True)

    dm = build_datamodule(cfg)
    trainer = build_trainer(cfg, dm, out_dir / "_run")
    batch = next(iter(dm.val_batches(0)))
    batch = {k: (v[:num_samples] if hasattr(v, "__getitem__") else v)
             for k, v in batch.items()}
    trainer.build(batch)
    if cfg.get("ckpt_path"):
        from gif_synthesis_with_discrete_diffusion_tpu.utils.checkpoint \
            import CheckpointManager
        mgr = CheckpointManager(Path(str(cfg["ckpt_path"])), monitor=None)
        trainer.state = mgr.restore(trainer.state)
        log.info("restored step %s from %s", mgr.latest_step(),
                 cfg["ckpt_path"])

    videos = trainer.sample_videos(batch, jax.random.key(
        int(cfg.get("seed") or 0)))
    for i in range(videos.shape[0]):
        path = render_animation(jax.device_get(videos[i]),
                                out_dir / f"sample_{i}.gif", fps=2)
        print(f"wrote {path}")


if __name__ == "__main__":
    main()
