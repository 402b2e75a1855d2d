#!/bin/bash
# Round-5 TPU follow-up queue: starts only after scripts/r5_tpu_queue.sh
# marks ALL DONE (one TPU process at a time — the axon claim serializes
# cold-start, so never submit concurrently).  Lower-priority measurements
# that earlier rows motivated:
#   1. cosine-2D with 2 guard modes (train L=27, report eigval-sorted top
#      25): the measured L=25 table has 24/25 at <=1.4e-3 with the
#      truncation-edge mode at 3.6e-2 — the exact case the hydrogen
#      guard-mode protocol fixes (edge convergence lands on sacrificial
#      guards; prefix-independent under sequential nesting).
#   2. oscillator L=55 forward-engine run (reference scale parity).
set -u
cd "$(dirname "$0")/.."
mkdir -p log/r5
export NSQ_LOG=log/r5/tpu_queue.log
. scripts/queue_lib.sh

nsq_pid_gate /tmp/ns_r5tpu2.pid || exit 1
# match the main queue's terminal marker EXACTLY ("[queue] ALL DONE at
# <date>") — a substring match would hit this script's own "waiting for
# ... ALL DONE" heartbeat line and start the queue immediately,
# contending for the single TPU claim (bug caught live 08:11)
nsq_mark "r5 follow-up queue armed; waiting for main queue to finish"
while ! grep -q '^\[queue\] ALL DONE at' log/r5/tpu_queue.log 2>/dev/null; do
  sleep 60
done
nsq_mark "r5 follow-up queue start"

gitc() {
  local msg="$1"; shift
  (
    flock -w 300 9 || exit 0
    git add -f -- "$@" 2>/dev/null
    git diff --cached --quiet || git commit -q -m "$msg"
  ) 9>/tmp/nsgit.lock
}

step() {
  local label="$1" attempts="$2" cmd="$3"; shift 3
  if grep -qxF "DONE $label" log/r5/steps_done.log 2>/dev/null; then
    nsq_mark "skip (already done): $label"
    return 0
  fi
  if nsq_run_retry "$label" "$attempts" -- bash -c "$cmd"; then
    echo "DONE $label" >> log/r5/steps_done.log
  fi
  gitc "Measured: $label (TPU follow-up queue)" log/r5/steps_done.log \
    log/r5/tpu_queue.log "$@"
}

step "cosine-2D L27 guards 200k" 3 "
  python -m neuralsvd_tpu.cli.pde \
    --problem sch --potential_type cosine --ndim 2 \
    --lim 3.141592653589793 \
    --neigs 27 --operator_shift 26.0 --laplacian_eps -1 \
    --mlp_hidden_dims 128,128,128 --nonlinearity softplus --parallel true \
    --apply_boundary false \
    --use_fourier_feature true --fourier_deterministic true \
    --fourier_mapping_size 64 --fourier_scale 1 \
    --sampling_mode uniform --sampling_scale 3.141592653589793 \
    --batch_size 512 --val_mc_size 16384 \
    --optimizer adam --lr 1e-3 --use_lr_scheduler true \
    --rescue true --tail_lr_boost 3 --tail_lr_start 16 \
    --num_iters 200000 --print_freq 10000 --eval_freq 50000 \
    --loss neuralsvd --neuralsvd.step 1 --neuralsvd.sequential true \
    --seed 0 --log_dir log/r5/cos2d_L27g --resume true \
    >> log/r5/cos2d_L27g_200k.log 2>&1" \
  log/r5/cos2d_L27g_200k.log

step "osc55 forward 200k" 2 "
  python -m neuralsvd_tpu.cli.pde \
    --optimizer rmsprop --use_lr_scheduler true --ema_decay 0.995 \
    --batch_size 512 --lr 1e-4 --num_iters 200000 --laplacian_eps -1 \
    --eval_freq 50000 --resume true \
    --potential_type harmonic_oscillator --ndim 2 --lim 5 --val_eps 0.1 \
    --neigs 55 --apply_boundary false --apply_exp_mask true \
    --exp_mask_init_scale 10 --mlp_hidden_dims 128,128,128 \
    --parallel true --nonlinearity softplus \
    --sampling_mode gaussian --sampling_scale 4 \
    --operator_scale 1 --operator_shift 24.0 \
    --use_fourier_feature true --fourier_mapping_size 256 --fourier_scale 1 \
    --neuralsvd.step 1 --neuralsvd.sequential true \
    --loss neuralsvd --seed 0 --log_dir log/r5/osc55fwd \
    >> log/r5/osc55fwd_200k.log 2>&1" \
  log/r5/osc55fwd_200k.log

nsq_mark "r5 follow-up queue ALL DONE"
gitc "r5 follow-up queue ALL DONE" log/r5/tpu_queue.log
