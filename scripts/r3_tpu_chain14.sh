#!/bin/bash
# Round-3 TPU queue, part 14: the reference's high-D cosine problems
# (Han-Lu-Zhou 2020 literature ground-state eigenvalues: 5D 0.054018931,
# 10D 0.098087449; /root/reference problems.py:56-68) — quantitatively
# evaluated for the first time via the Monte-Carlo val quadrature.
# Waits for chain13.
set -u
cd "$(dirname "$0")/.."

relay_wait() {
  while ! timeout 3 bash -c 'exec 3<>/dev/tcp/127.0.0.1/8103' 2>/dev/null; do
    sleep 60
  done
}

run_retry() {  # run_retry <label> <attempts> -- cmd...
  local label="$1" attempts="$2"; shift 3
  for a in $(seq 1 "$attempts"); do
    relay_wait
    "$@" && return 0
    echo "[chain14] $label attempt $a failed at $(date); retrying" >> log/r3/chain.log
    sleep 120
  done
  echo "[chain14] $label EXHAUSTED retries at $(date)" >> log/r3/chain.log
  return 1
}

while kill -0 "$(cat /tmp/chain13.pid 2>/dev/null)" 2>/dev/null \
      && ! grep -q "chain13. ALL DONE" log/r3/chain.log; do
  sleep 120
done
echo "[chain14] starting cosine 5D/10D at $(date)" >> log/r3/chain.log

cosine() {  # cosine <ndim> <probes> <tag>
  python -m neuralsvd_tpu.cli.pde \
    --problem sch --potential_type cosine --ndim "$1" \
    --lim 3.141592653589793 \
    --neigs 1 --operator_shift 1.0 --laplacian_eps -1 \
    --laplacian_probes "$2" \
    --mlp_hidden_dims 128,128,128 --nonlinearity softplus --parallel false \
    --apply_boundary false \
    --use_fourier_feature true --fourier_deterministic true \
    --fourier_mapping_size 64 --fourier_scale 1 \
    --sampling_mode uniform --sampling_scale 3.141592653589793 \
    --batch_size 512 --val_mc_size 16384 \
    --optimizer adam --lr 1e-3 --use_lr_scheduler true \
    --num_iters 100000 --print_freq 5000 --eval_freq 25000 \
    --loss neuralsvd --neuralsvd.step 1 --neuralsvd.sequential true \
    --seed 0 --log_dir "log/r3/cos$1d_$3" --overwrite true \
    > "log/r3/cos$1d_$3_100k.log" 2>&1
}

run_retry "cosine 5D exact" 3 -- bash -c "$(declare -f cosine); cosine 5 0 exact"
echo "[chain14] cosine 5D exact done at $(date)" >> log/r3/chain.log
run_retry "cosine 10D exact" 3 -- bash -c "$(declare -f cosine); cosine 10 0 exact"
echo "[chain14] cosine 10D exact done at $(date)" >> log/r3/chain.log
run_retry "cosine 10D hutch4" 3 -- bash -c "$(declare -f cosine); cosine 10 4 hutch4"
echo "[chain14] cosine 10D hutch4 done at $(date)" >> log/r3/chain.log
echo "[chain14] ALL DONE at $(date)" >> log/r3/chain.log
