#!/bin/bash
# Round-3 TPU queue, part 12: 10D oscillator Hutchinson A/B.
# Closed-form eigvals exist at any D (E = 2n + d), so this measures BOTH
# throughput and accuracy of the stochastic Laplacian (--laplacian_probes)
# against the exact forward engine at D=10 — the regime the feature is for.
# Waits for chain9b (one TPU process at a time) and gates every step on
# relay liveness with fresh-process retries (tunnel hard-drop pattern).
set -u
cd "$(dirname "$0")/.."

relay_wait() {
  local waited=0
  while ! timeout 3 bash -c 'exec 3<>/dev/tcp/127.0.0.1/8103' 2>/dev/null; do
    sleep 60; waited=$((waited + 60))
    if [ $((waited % 1800)) -eq 0 ]; then
      echo "[chain12] relay still down after ${waited}s at $(date)" >> log/r3/chain.log
    fi
  done
}

run_retry() {  # run_retry <label> <attempts> -- cmd...
  local label="$1" attempts="$2"; shift 3
  for a in $(seq 1 "$attempts"); do
    relay_wait
    "$@" && return 0
    echo "[chain12] $label attempt $a failed at $(date); retrying" >> log/r3/chain.log
    sleep 120
  done
  echo "[chain12] $label EXHAUSTED retries at $(date)" >> log/r3/chain.log
  return 1
}

# wait for chain9b to fully drain the queue (or die)
while kill -0 "$(cat /tmp/chain9b.pid 2>/dev/null)" 2>/dev/null \
      && ! grep -q "chain9b. ALL DONE" log/r3/chain.log; do
  sleep 120
done
echo "[chain12] starting 10D oscillator A/B at $(date)" >> log/r3/chain.log

osc10d() {  # osc10d <probes> <tag>
  python -m neuralsvd_tpu.cli.pde \
    --problem sch --potential_type harmonic_oscillator --ndim 10 --lim 8 \
    --neigs 3 --operator_shift 16.0 --laplacian_eps -1 \
    --laplacian_probes "$1" \
    --mlp_hidden_dims 128,128,128 --nonlinearity softplus --parallel false \
    --apply_boundary false --apply_exp_mask true --exp_mask_init_scale 8 \
    --sampling_mode gaussian --sampling_scale 1.0 --batch_size 512 \
    --val_mc_size 16384 \
    --optimizer adam --lr 1e-3 --use_lr_scheduler true \
    --num_iters 100000 --print_freq 5000 --eval_freq 25000 \
    --loss neuralsvd --neuralsvd.step 1 --neuralsvd.sequential true \
    --seed 0 --log_dir "log/r3/osc10d_$2" --overwrite true \
    > "log/r3/osc10d_$2_100k.log" 2>&1
}

run_retry "10D exact" 3 -- bash -c "$(declare -f osc10d); osc10d 0 exact"
echo "[chain12] 10D exact done at $(date)" >> log/r3/chain.log
run_retry "10D hutch4" 3 -- bash -c "$(declare -f osc10d); osc10d 4 hutch4"
echo "[chain12] 10D hutch4 done at $(date)" >> log/r3/chain.log
run_retry "10D hutch2" 3 -- bash -c "$(declare -f osc10d); osc10d 2 hutch2"
echo "[chain12] 10D hutch2 done at $(date)" >> log/r3/chain.log
echo "[chain12] ALL DONE at $(date)" >> log/r3/chain.log
