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

    # multi-scale mixture sampling + hydrogenic envelope features:
    # the round-2 accuracy recipe (BASELINE.md "round 2"); the reference's
    # single scale-16 gaussian starves the 1s core of samples
    --sampling_mode gaussian_mixture
    --sampling_scales 0.5,2,6,16,32
    --fourier_append_radial true
    --fourier_append_envelopes 2.0,0.6667,0.4,0.2857,0.2222,0.1818

    --operator_scale 100

    # dead/duplicate-mode rescue at eval points: at L=36 a near-zero
    # -amplitude mode parked on an occupied direction is loss-free and
    # stable (round-2 collapse, BASELINE.md); rescue exiles + re-inits
    --rescue true

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
