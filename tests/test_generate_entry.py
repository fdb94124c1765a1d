"""Standalone inference entry (scripts/generate.py): checkpoint -> GIFs.

The reference can only sample inside training (every 10 val epochs,
multistage_text_motion_model.py:235-236); the serving entry must load a
checkpoint, synthesize, and write one GIF per sample."""
import runpy
import sys
from pathlib import Path

_TINY = [
    "model=discrete_diffusion", "datamodule=synthetic", "batch_size=4",
    "datamodule.resolution=16", "datamodule.sequence_length=2",
    "datamodule.num_train=4", "datamodule.num_val=4",
    "model.autoencoder.embedding_dim=8", "model.autoencoder.n_codes=16",
    "model.autoencoder.n_hiddens=16", "model.autoencoder.n_res_layers=1",
    "model.autoencoder.downsample=[1,4,4]",
    "model.autoencoder.kernel_mode=xla",
    "model.generator.diffusion_model.diffusion_step=4",
    "model.generator.diffusion_model.transformer.n_layer=1",
    "model.generator.diffusion_model.transformer.n_embd=16",
    "model.generator.diffusion_model.transformer.n_head=4",
    "model.generator.diffusion_model.transformer.condition_dim=32",
    "model.generator.diffusion_model.transformer.dalle.spatial_size=[8,4]",
    "model/textencoder=label", "model.generator.textencoder.dim=32",
    "model.generator.textencoder.n_classes=2",
    "model.do_evaluation=false", "seed=0",
]


def test_generate_writes_gifs(tmp_path, monkeypatch):
    out = tmp_path / "samples"
    monkeypatch.setattr(sys, "argv", [
        "generate.py", *_TINY, "+num_samples=2", f"+out_dir={out}"])
    script = Path(__file__).resolve().parent.parent / "scripts" / "generate.py"
    runpy.run_path(str(script), run_name="__main__")
    for i in range(2):
        gif = out / f"sample_{i}.gif"
        assert gif.exists() and gif.stat().st_size > 0, gif
