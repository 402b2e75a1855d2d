#!/bin/bash
# 2D hydrogen, top-36 eigenstates (reference: scripts/exps/pde/hydrogen.sh).
# Usage: ./hydrogen.sh <loss> <batch_size> <sequential 0|1>
#   e.g. ./hydrogen.sh neuralsvd 512 0
set -e
SRCROOT="$(cd "$(dirname "$0")/../../.." && pwd)"
export PYTHONPATH="${PYTHONPATH}:${SRCROOT}"

LOSS=${1:-neuralsvd}
BATCH=${2:-512}
SEQUENTIAL=${3:-0}

args=(
    --optimizer rmsprop
    --use_lr_scheduler true
    --ema_decay 0.995
    --batch_size "$BATCH"
    --lr 1e-4
    --momentum 0.
    --num_iters 500000

    --laplacian_eps 0.01
    --eval_freq 10000
    --overwrite true

    --potential_type hydrogen
    --ndim 2
    --lim 50
    --val_eps 0.1
    --neigs 36

    --apply_boundary false
    --apply_exp_mask false

    --mlp_hidden_dims 128,128,128
    --parallel true
    --nonlinearity softplus

    --sampling_mode gaussian
    --sampling_scale 16

    --operator_scale 100

    --use_fourier_feature true
    --fourier_mapping_size 1024
    --fourier_scale 0.1

    --neuralsvd.step 1
    --neuralsvd.sequential "$SEQUENTIAL"

    --neuralef.unbiased true
    --neuralef.include_diag false
    --neuralef.batchnorm_mode unbiased
)

for seed in {0..9}; do
    python -m neuralsvd_tpu.cli.pde "${args[@]}" --loss "$LOSS" --seed "$seed"
done
