#!/usr/bin/env python
"""Checkpoint-parity FVD harness: one command from the reference's public
checkpoints to an FVD number through THIS framework's pipeline.

When the three public checkpoints (UCF101 VQ-VAE, D3PM, I3D) are
available, this is the "FVD within 5%" north-star check (BASELINE.md):
convert the torch weights (convert/torch_{vqvae,d3pm,i3d}.py, each
parity-tested against reference-keyed twins), sample N clips with the
100-step CFG sampler, decode, embed GT + generated at 224px through I3D,
and print the Fréchet distance exactly as the reference computes it
(evaluator.py:92-110: x2 scaling quirk, un-sqrted tiny singular values,
temporal repeat to 16).

Any missing checkpoint path falls back to random init — the number is then
only a pipeline smoke (and says so in the output).

Usage:
  python scripts/parity_fvd.py --vqvae v.ckpt --d3pm d.ckpt --i3d i3d.pt \
      [--data-root /data/ucf101] [--num-clips 64]
"""
from __future__ import annotations

import argparse
import json
import os
import sys

import numpy as np

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))


def build_vqvae(args, ckpt):
    import jax
    import jax.numpy as jnp
    from gif_synthesis_with_discrete_diffusion_tpu.models.vqvae import VQVAE

    ae = VQVAE(embedding_dim=args.embedding_dim, n_codes=args.codes,
               n_hiddens=args.hiddens, n_res_layers=args.res_layers,
               downsample=tuple(args.downsample),
               sequence_length=args.frames, resolution=args.resolution)
    x = jnp.zeros((1, args.frames, args.resolution, args.resolution, 3))
    variables = ae.init({"params": jax.random.key(0),
                         "codebook": jax.random.key(1)},
                        {"video": x}, train=True)
    variables = {"params": variables["params"],
                 "batch_stats": variables.get("batch_stats", {}),
                 "codebook": variables["codebook"]}
    if ckpt:
        from gif_synthesis_with_discrete_diffusion_tpu.convert.torch_vqvae \
            import convert_vqvae_file
        conv = convert_vqvae_file(ckpt, n_res_layers=args.res_layers)
        variables = {"params": conv["params"],
                     "batch_stats": conv.get("batch_stats", {}),
                     "codebook": conv["codebook"]}
    return ae, variables


def build_d3pm(args, ckpt, latent):
    import jax
    import jax.numpy as jnp
    from gif_synthesis_with_discrete_diffusion_tpu.models.discrete_diffusion \
        import D3PM

    seq = int(np.prod(latent))
    d3pm = D3PM(num_embed=args.codes, content_seq_len=seq,
                spatial_size=(latent[0] * latent[1], latent[2]),
                diffusion_step=args.steps, guidance_scale=args.guidance,
                n_layer=args.layers, n_embd=args.embd, n_head=args.heads,
                condition_dim=args.cond_dim)
    tokens0 = jnp.zeros((1, seq), jnp.int32)
    cond = jnp.zeros((1, 1, args.cond_dim))
    variables = dict(d3pm.init({"params": jax.random.key(2),
                                "diffusion": jax.random.key(3)},
                               tokens0, cond, train=True))
    if ckpt:
        from gif_synthesis_with_discrete_diffusion_tpu.convert.torch_d3pm \
            import convert_d3pm_file
        conv = convert_d3pm_file(ckpt)
        variables["params"] = conv["params"]["diffusion"]
    return d3pm, variables


def build_evaluator(i3d_ckpt):
    from gif_synthesis_with_discrete_diffusion_tpu.eval.evaluator import (
        FVDEvaluator)
    i3d_params = None
    if i3d_ckpt:
        from gif_synthesis_with_discrete_diffusion_tpu.convert.torch_i3d \
            import convert_i3d_file
        i3d_params = convert_i3d_file(i3d_ckpt)
    return FVDEvaluator(i3d_params=i3d_params)


def gt_batches(args):
    """Yield (B, T, H, W, 3) normalized ground-truth clips."""
    if args.data_root:
        from gif_synthesis_with_discrete_diffusion_tpu.data.video_dataset \
            import UCF101DataModule
        dm = UCF101DataModule(data_folder=args.data_root,
                              batch_size=args.batch,
                              sequence_length=args.frames,
                              resolution=args.resolution)
        yield from (b["video"] for b in dm.val_batches(0))
    else:
        from gif_synthesis_with_discrete_diffusion_tpu.data.synthetic import (
            SyntheticVideoDataModule)
        dm = SyntheticVideoDataModule(
            batch_size=args.batch, sequence_length=args.frames,
            resolution=args.resolution, num_train=args.batch,
            num_val=max(args.num_clips, args.batch))
        yield from (b["video"] for b in dm.val_batches(0))


def main(argv=None):
    p = argparse.ArgumentParser()
    p.add_argument("--vqvae", default=None, help="stage-1 torch .ckpt")
    p.add_argument("--d3pm", default=None, help="stage-2 torch .ckpt")
    p.add_argument("--i3d", default=None, help="i3d_pretrained_400.pt")
    p.add_argument("--data-root", default=None, help="UCF101 root (GT "
                   "clips); synthetic clips when unset")
    p.add_argument("--num-clips", type=int, default=64)
    p.add_argument("--batch", type=int, default=16)
    p.add_argument("--frames", type=int, default=16)
    p.add_argument("--resolution", type=int, default=64)
    p.add_argument("--codes", type=int, default=4096)
    p.add_argument("--embedding-dim", type=int, default=128)
    p.add_argument("--hiddens", type=int, default=256)
    p.add_argument("--res-layers", type=int, default=3)
    p.add_argument("--downsample", type=int, nargs=3, default=[1, 8, 8])
    p.add_argument("--steps", type=int, default=100)
    p.add_argument("--guidance", type=float, default=2.0)
    p.add_argument("--layers", type=int, default=19)
    p.add_argument("--embd", type=int, default=64)
    p.add_argument("--heads", type=int, default=16)
    p.add_argument("--cond-dim", type=int, default=512)
    args = p.parse_args(argv)

    import jax
    import jax.numpy as jnp
    from gif_synthesis_with_discrete_diffusion_tpu.data.preprocess import (
        preprocess_clip)
    from gif_synthesis_with_discrete_diffusion_tpu.models.discrete_diffusion \
        import D3PM
    from gif_synthesis_with_discrete_diffusion_tpu.models.vqvae import VQVAE

    latent = tuple(s // d for s, d in zip(
        (args.frames, args.resolution, args.resolution), args.downsample))
    ae, ae_vars = build_vqvae(args, args.vqvae)
    d3pm, g_vars = build_d3pm(args, args.d3pm, latent)
    evaluator = build_evaluator(args.i3d)
    pretrained = bool(args.vqvae and args.d3pm and args.i3d)

    def sample(rng, batch_size):
        # committed-reference conditioning: zeroed text embedding (dd.py:25)
        cond = jnp.zeros((batch_size, 1, args.cond_dim))
        tokens = d3pm.apply(
            g_vars, cond, jnp.zeros_like(cond), batch_size,
            method=D3PM.sample, rngs={"diffusion": rng})
        grid = tokens.reshape(batch_size, *latent)
        return ae.apply(ae_vars, grid, method=VQVAE.decode)

    fn = jax.jit(sample, static_argnums=1)
    done = 0
    for gt in gt_batches(args):
        if done >= args.num_clips:
            break
        b = min(int(np.asarray(gt).shape[0]), args.num_clips - done)
        gt_dev = preprocess_clip(jnp.asarray(gt)[:b], args.resolution)
        videos = fn(jax.random.key(100 + done), b)
        evaluator.push_vals(gt_dev, videos[:b])
        done += b
        print(f"sampled {done}/{args.num_clips}", file=sys.stderr,
              flush=True)
    metrics = evaluator.evaluate_metrics()
    out = {"fvd": float(metrics["fvd"]), "num_clips": done,
           "pretrained_weights": pretrained,
           "note": (None if pretrained else
                    "random-init weights on one or more models — pipeline "
                    "smoke only, NOT comparable to reference FVD")}
    print(json.dumps(out))
    return out


if __name__ == "__main__":
    main()
