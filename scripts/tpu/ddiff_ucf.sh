#!/bin/bash
# Stage-2 discrete-diffusion training on UCF101 — TPU analogue of reference
# ucf-ddiff-train.job:16 (2000 epochs, batch 16, 100 diffusion steps,
# guidance 2, 32x32 latent grid, frozen stage-1 VQ-VAE).
# Pass model.checkpoint_paths.autoencoder=<stage1 run>/checkpoints (or a
# torch .ckpt, converted on load) to pick up stage-1 weights.
set -euo pipefail
python scripts/train.py \
  model=discrete_diffusion \
  model.do_evaluation=true \
  datamodule=ucf101 \
  trainer.max_epochs=2000 \
  logger=tensorboard \
  batch_size=16 \
  model.autoencoder.embedding_dim=128 \
  model.autoencoder.n_codes=4096 \
  model.autoencoder.n_hiddens=256 \
  model.autoencoder.n_res_layers=3 \
  'model.autoencoder.downsample=[1,8,8]' \
  model.generator.diffusion_model.diffusion_step=100 \
  model.generator.diffusion_model.guidance_scale=2 \
  model.generator.diffusion_model.learnable_cf=false \
  'model.generator.diffusion_model.transformer.content_spatial_size=[32,32]' \
  'model.generator.diffusion_model.transformer.dalle.spatial_size=[32,32]' \
  "$@"
