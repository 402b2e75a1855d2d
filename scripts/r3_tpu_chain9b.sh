#!/bin/bash
# Round-3 TPU queue, combined restart (replaces chain9/10/11 after the
# axon relay dropped at ~19:51 and again ~20:00, wedging the A/B).
# Pattern: wait for the relay port to accept TCP before every step, and
# retry each step in a FRESH process (the in-process PJRT client does
# not recover from a relay drop).
#   13. Laplacian-engine A/B (forward vs nested-JVP, 2D + 3D)
#   14. E8: L=16 300k accuracy run, forward engine
#   15. guard-mode L=36 800k rerun (resumes from NS_CKPT)
#   16. oscillator L=55 exact-forward 200k
set -u
cd "$(dirname "$0")/.."

relay_wait() {
  local waited=0
  while ! timeout 3 bash -c 'exec 3<>/dev/tcp/127.0.0.1/8103' 2>/dev/null; do
    sleep 60; waited=$((waited + 60))
    if [ $((waited % 600)) -eq 0 ]; then
      echo "[chain9b] relay still down after ${waited}s at $(date)" >> log/r3/chain.log
    fi
  done
}

run_retry() {  # run_retry <label> <attempts> -- cmd...
  local label="$1" attempts="$2"; shift 3
  for a in $(seq 1 "$attempts"); do
    relay_wait
    "$@" && return 0
    echo "[chain9b] $label attempt $a failed at $(date); retrying" >> log/r3/chain.log
    sleep 120
  done
  echo "[chain9b] $label EXHAUSTED retries at $(date)" >> log/r3/chain.log
  return 1
}

echo "[chain9b] restart; waiting for relay at $(date)" >> log/r3/chain.log
relay_wait
echo "[chain9b] relay up at $(date)" >> log/r3/chain.log

run_retry "laplacian A/B" 3 -- bash -c \
  "python scripts/bench_laplacian.py > log/r3/bench_laplacian.log 2>&1"
echo "[chain9] laplacian A/B done at $(date)" >> log/r3/chain.log

run_retry "E8 forward-lap 300k" 3 -- bash -c \
  "NS_LAP=forward NS_CKPT=/root/repo/log/r3/H16_fwdlap.ckpt \
   python scripts/validate_northstar.py 300000 -1 \
   >> log/r3/H16_fwdlap_300k.log 2>&1"
echo "[chain9] E8 forward-lap 300k done at $(date)" >> log/r3/chain.log

run_retry "guard-mode L=36 800k" 5 -- bash -c \
  "NS_NEIGS=42 NS_EVAL_TOP=36 NS_MIX='0.5,2,6,16,32' NS_MIX_W='0.3,0.2,0.2,0.15,0.15' \
   NS_RESCUE=1 NS_CKPT=/root/repo/log/r3/H36_guard.ckpt \
   python scripts/validate_northstar.py 800000 -1 \
   >> log/r3/H36_guard_800k.log 2>&1"
echo "[chain10] guard-mode L=36 800k done at $(date)" >> log/r3/chain.log

run_retry "oscillator L=55 exact-forward" 3 -- bash -c \
  "python -m neuralsvd_tpu.cli.pde \
    --optimizer rmsprop --use_lr_scheduler true --ema_decay 0.995 \
    --batch_size 512 --lr 1e-4 --num_iters 200000 --laplacian_eps -1 \
    --eval_freq 200000 --overwrite true \
    --potential_type harmonic_oscillator --ndim 2 --lim 5 --val_eps 0.1 \
    --neigs 55 --apply_boundary false --apply_exp_mask true \
    --exp_mask_init_scale 10 --mlp_hidden_dims 128,128,128 \
    --parallel true --nonlinearity softplus \
    --sampling_mode gaussian --sampling_scale 4 \
    --operator_scale 1 --operator_shift 24.0 \
    --use_fourier_feature true --fourier_mapping_size 256 --fourier_scale 1 \
    --neuralsvd.step 1 --neuralsvd.sequential true \
    --loss neuralsvd --seed 0 --log_dir log/r3/osc55fwd \
    > log/r3/osc55fwd_200k.log 2>&1"
echo "[chain11] oscillator L=55 exact-forward done at $(date)" >> log/r3/chain.log
echo "[chain9b] ALL DONE at $(date)" >> log/r3/chain.log
