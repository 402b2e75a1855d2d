#!/bin/bash
# 2D harmonic oscillator, top-55 (reference: scripts/exps/pde/oscillator.sh).
# Usage: ./oscillator.sh <loss> <batch_size> <sequential 0|1>
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
    --num_iters 100000

    --laplacian_eps 0.01
    --eval_freq 100000
    --overwrite true

    --potential_type harmonic_oscillator
    --ndim 2
    --lim 5
    --val_eps 0.1
    --neigs 55

    --apply_boundary false
    --apply_exp_mask true
    --exp_mask_init_scale 10

    --mlp_hidden_dims 128,128,128
    --parallel true
    --nonlinearity softplus

    --sampling_mode gaussian
    --sampling_scale 4

    --operator_scale 1
    --operator_shift 16.0

    --use_fourier_feature true
    --fourier_mapping_size 256
    --fourier_scale 1

    --neuralsvd.step 1
    --neuralsvd.sequential "$SEQUENTIAL"

    --neuralef.unbiased true
    --neuralef.include_diag false
)

for seed in {0..9}; do
    python -m neuralsvd_tpu.cli.pde "${args[@]}" --loss "$LOSS" --seed "$seed"
done
