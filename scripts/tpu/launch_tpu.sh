#!/bin/bash
# TPU launch helper: provision a TPU VM (queued resource) and run one of the
# job scripts in this directory on every worker. The TPU-native analogue of
# the reference's SLURM launchers (reference vqvae.job:1-16,
# ucf-ddiff-train.job:1-16: sbatch + gres=gpu:a40:2 + module loads).
#
# Usage:
#   scripts/tpu/launch_tpu.sh <job.sh> [tpu-name] [accel-type] [zone]
#   scripts/tpu/launch_tpu.sh scripts/tpu/vqvae_ucf.sh my-v5e v5litepod-8 us-west4-a
#
# Multi-host slices: the same command runs on --worker=all; JAX discovers the
# slice topology itself (gif_synthesis_with_discrete_diffusion_tpu/parallel/
# distributed.py calls jax.distributed.initialize() with TPU autodetection,
# so no MASTER_ADDR/NCCL plumbing is needed — ICI collectives come from XLA).
set -euo pipefail

JOB=${1:?usage: launch_tpu.sh <job.sh> [name] [accel] [zone]}
NAME=${2:-gifdd-v5e}
ACCEL=${3:-v5litepod-8}
ZONE=${4:-us-west4-a}
RUNTIME=${TPU_RUNTIME_VERSION:-v2-alpha-tpuv5-lite}
REPO_URL=${REPO_URL:-$(git -C "$(dirname "$0")/../.." remote get-url origin 2>/dev/null || echo '')}

if ! gcloud compute tpus tpu-vm describe "$NAME" --zone "$ZONE" >/dev/null 2>&1; then
  echo ">> creating $ACCEL queued resource '$NAME' in $ZONE"
  gcloud compute tpus queued-resources create "$NAME" \
    --node-id "$NAME" --zone "$ZONE" \
    --accelerator-type "$ACCEL" --runtime-version "$RUNTIME"
  gcloud compute tpus queued-resources describe "$NAME" --zone "$ZONE"
fi

echo ">> syncing repo + installing deps on all workers"
gcloud compute tpus tpu-vm ssh "$NAME" --zone "$ZONE" --worker=all --command "
  set -e
  if [ ! -d ~/gif-dd-tpu ]; then git clone ${REPO_URL} ~/gif-dd-tpu; fi
  cd ~/gif-dd-tpu && git pull --ff-only
  pip install -q -e . 'jax[tpu]' -f https://storage.googleapis.com/jax-releases/libtpu_releases.html
"

echo ">> launching $(basename "$JOB") on all workers"
gcloud compute tpus tpu-vm ssh "$NAME" --zone "$ZONE" --worker=all \
  --command "cd ~/gif-dd-tpu && MULTIHOST=1 nohup bash $JOB > job.log 2>&1 &"
echo ">> tail logs: gcloud compute tpus tpu-vm ssh $NAME --zone $ZONE --command 'tail -f ~/gif-dd-tpu/job.log'"
