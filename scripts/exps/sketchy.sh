#!/bin/bash
# Sketchy zero-shot cross-domain retrieval, L=512 (reference:
# scripts/exps/sketchy.sh).  Requires precomputed VGG features; see
# neuralsvd_tpu/data/sketchy.py for the expected npz layout.
# Usage: ./sketchy.sh <split 1|2>
set -e
SRCROOT="$(cd "$(dirname "$0")/../.." && pwd)"
export PYTHONPATH="${PYTHONPATH}:${SRCROOT}"

SPLIT=${1:-1}

args=(
    --root_dir "${ROOT:-$HOME}"
    --overwrite

    --network_dims 8192,512
    --mu 16
    # TPU mixed precision: bf16 tower matmuls, f32 Grams/master weights
    # (3.1x steps/sec at this config, BASELINE.md; quality-guarded by
    # tests/test_cdk_retrieval.py)
    --compute_dtype bf16

    --num_epochs 10
    --warmup_epochs 0
    --batch_size 4096
    --optimizer sgd
    --momentum 0.9
    --base_lr 5e-3
    --use_lr_scheduler
    --grad_clip 1.0

    --neigs 512
    --loss neuralsvd
    --neuralsvd.step 1
    --neuralsvd.sequential false

    --sketchy_split "$SPLIT"
    --n_retrievals_to_save 20
    --trunc_dims -512 -448 -384 -320 -256 -192 -128 -64 -32 -16 -8 -4 -2 -1 1 2 4 8 16 32 64 128 192 256 320 384 448 512
    --ap_ver 1
)

for seed in {0..9}; do
    echo "Sketchy split $SPLIT seed $seed"
    python -m neuralsvd_tpu.cli.sketchy "${args[@]}" --seed "$seed"
done
