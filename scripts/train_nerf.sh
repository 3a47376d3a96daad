#!/bin/bash
# Cluster launcher — capability parity with reference train_nerf.sh
# (SLURM job running the hash trainer; reference requests 1 GPU for 4
# days, train_nerf.sh:2-6, 33). TPU pods are typically driven per-host;
# the trainer itself handles any local chip count via jax.devices().
#SBATCH --job-name=hbr_tpu_train
#SBATCH --cpus-per-task=8
#SBATCH --time=4-00:00:00
#SBATCH --output=logs/train_%j.out

set -euo pipefail
cd "$(dirname "$0")/.."

python -m human_body_reconstruction_tpu.cli.train_hash \
    --write \
    --num_epochs 2 \
    --update_rate 1 \
    --num_samples 32 \
    "$@"
