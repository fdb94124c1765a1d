#!/bin/bash
# Stage-1 VQ-VAE training on UCF101 — TPU analogue of reference vqvae.job:16
# (2000 epochs, batch 64, n_codes 4096, 3 res layers, downsample [1,8,8],
# FVD eval on). The reference's trainer.devices=[0,1] DDP becomes a JAX data
# mesh over every chip in the slice (trainer.mesh.data=null = all devices).
set -euo pipefail
python scripts/train.py \
  model=videogpt_vq_vae \
  model.do_evaluation=true \
  datamodule=ucf101 \
  trainer.max_epochs=2000 \
  logger=tensorboard \
  batch_size=64 \
  model.generator.n_codes=4096 \
  model.generator.n_res_layers=3 \
  'model.generator.downsample=[1,8,8]' \
  "$@"
