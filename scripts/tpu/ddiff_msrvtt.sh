#!/bin/bash
# Stage-2 discrete-diffusion training on MSRVTT (text-conditioned) — TPU
# analogue of reference msrvtt-ddiff-train.job:16 (500 epochs, batch 16,
# 48x48 latent grid, dalle.num_embed 4096).
set -euo pipefail
python scripts/train.py \
  model=discrete_diffusion \
  model.do_evaluation=true \
  datamodule=msrvtt \
  trainer.max_epochs=500 \
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
  'model.generator.diffusion_model.transformer.content_spatial_size=[48,48]' \
  'model.generator.diffusion_model.transformer.dalle.spatial_size=[48,48]' \
  model.generator.diffusion_model.transformer.dalle.num_embed=4096 \
  "$@"
