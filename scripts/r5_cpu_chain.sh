#!/bin/bash
# Round-5 CPU measurement chain (VERDICT r4 items 1 + 8): the two
# CPU-runnable rows that died at the round-4 boundary, restarted at round
# OPEN, strictly serial (one host core), resumable at every stage:
#   1. Fokker-Planck 1D+2D 50k vs the FD-diagonalization spectra
#      (validate_fokker_planck.py: per-problem ckpts + result files)
#   2. cosine-2D L=25 rescue+tail-LR, 60k CPU-honest budget
#      (cli.pde --resume; ckpt every eval_freq=10k iters)
#   3. FP 5D lambda_0 row (the reference's only truth, measured), 25k
# Each stage retries in a fresh process; resume makes retries cheap.
set -u
cd "$(dirname "$0")/.."
mkdir -p log/r5
export NSQ_LOG=log/r5/cpu_chain.log
. scripts/queue_lib.sh

nsq_pid_gate /tmp/ns_r5cpu.pid || exit 1
nsq_mark "r5 CPU chain start"

retry_cpu() {  # retry_cpu <label> <attempts> <cmd...> — no relay gate
  local label="$1" attempts="$2"; shift 2
  local a
  for a in $(seq 1 "$attempts"); do
    if "$@"; then nsq_mark "$label done (attempt $a)"; return 0; fi
    nsq_mark "$label attempt $a failed; retrying"
    sleep 30
  done
  nsq_mark "$label EXHAUSTED $attempts attempts"
  return 1
}

# -- 1. Fokker-Planck measured rows (1D + 2D, 50k) ------------------------------
retry_cpu "FP 1D+2D 50k" 6 bash -c \
  "PALLAS_AXON_POOL_IPS= JAX_PLATFORMS=cpu NS_FP_OUT=log/r5/fp \
   python scripts/validate_fokker_planck.py 50000 50000 \
   >> log/r5/fp_validate.log 2>&1"

# -- 2. cosine-2D L=25 rescue + tail-LR, 60k (CPU-honest budget) -----------------
retry_cpu "cosine-2D L25 60k" 6 bash -c "
  PALLAS_AXON_POOL_IPS= JAX_PLATFORMS=cpu \
  python -m neuralsvd_tpu.cli.pde \
    --problem sch --potential_type cosine --ndim 2 \
    --lim 3.141592653589793 \
    --neigs 25 --operator_shift 26.0 --laplacian_eps -1 \
    --mlp_hidden_dims 128,128,128 --nonlinearity softplus --parallel true \
    --apply_boundary false \
    --use_fourier_feature true --fourier_deterministic true \
    --fourier_mapping_size 64 --fourier_scale 1 \
    --sampling_mode uniform --sampling_scale 3.141592653589793 \
    --batch_size 256 --val_mc_size 16384 \
    --optimizer adam --lr 1e-3 --use_lr_scheduler true \
    --rescue true --tail_lr_boost 3 --tail_lr_start 16 \
    --num_iters 60000 --print_freq 1000 --eval_freq 10000 \
    --loss neuralsvd --neuralsvd.step 1 --neuralsvd.sequential true \
    --seed 0 --log_dir log/r5/cos2d_L25_cpu --resume true \
    >> log/r5/cos2d_L25_cpu_60k.log 2>&1"

# -- 3. FP 5D lambda_0 (reference's only FP truth, actually measured) ------------
retry_cpu "FP 5D 25k" 4 bash -c \
  "PALLAS_AXON_POOL_IPS= JAX_PLATFORMS=cpu NS_FP_OUT=log/r5/fp \
   python scripts/validate_fokker_planck.py 50000 50000 25000 \
   >> log/r5/fp_validate.log 2>&1"

nsq_mark "r5 CPU chain ALL DONE"
