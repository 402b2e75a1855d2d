#!/bin/bash
# Round-3 TPU master queue (replaces the chain9b->12->13->14->15->16 chain
# after a ~4.5h relay outage): reordered by value so the gate-relevant and
# new-capability runs land first if TPU time ends up short.
#   1. L=36 tail-LR 800k       — VERDICT gate attempt (tail lever, 15x on
#                                 the miniature edge; rescue on)
#   2. 10D oscillator A/B      — Hutchinson exact/k=4/k=2, closed form
#   3. cosine 5D/10D (+hutch)  — Han-Lu-Zhou literature eigvals
#   4. H2+ 3D 300k             — Bates-Reid literature energies
#   5. Laplacian-engine A/B bench + E8 forward-engine 300k accuracy
#   6. Retrieval bench (Sketchy scale)
#   7. guard-mode L=36 800k resume (selection-only value — optional)
#   8. oscillator L=55 forward 200k (optional)
# Every step waits for the relay and retries in a FRESH process.
set -u
cd "$(dirname "$0")/.."

relay_wait() {
  local waited=0
  while ! timeout 3 bash -c 'exec 3<>/dev/tcp/127.0.0.1/8103' 2>/dev/null; do
    sleep 60; waited=$((waited + 60))
    if [ $((waited % 3600)) -eq 0 ]; then
      echo "[chain17] relay still down after ${waited}s at $(date)" >> log/r3/chain.log
    fi
  done
}

run_retry() {  # run_retry <label> <attempts> -- cmd...
  local label="$1" attempts="$2"; shift 3
  for a in $(seq 1 "$attempts"); do
    relay_wait
    "$@" && return 0
    echo "[chain17] $label attempt $a failed at $(date); retrying" >> log/r3/chain.log
    sleep 120
  done
  echo "[chain17] $label EXHAUSTED retries at $(date)" >> log/r3/chain.log
  return 1
}

echo "[chain17] master queue start; waiting for relay at $(date)" >> log/r3/chain.log
relay_wait
echo "[chain17] relay up at $(date)" >> log/r3/chain.log

# -- 1. gate attempt: L=36 with tail-LR boost ------------------------------
run_retry "L36 tail-LR 800k" 5 -- bash -c \
  "NS_NEIGS=36 NS_RESCUE=1 NS_TAIL_LR=3 NS_TAIL_LR_START=25 \
   NS_MIX='0.5,2,6,16,32' NS_MIX_W='0.3,0.2,0.2,0.15,0.15' \
   NS_CKPT=/root/repo/log/r3/H36_taillr.ckpt \
   python scripts/validate_northstar.py 800000 -1 \
   >> log/r3/H36_taillr_800k.log 2>&1"
echo "[chain17] L36 tail-LR done at $(date)" >> log/r3/chain.log

# -- 2. 10D oscillator Hutchinson A/B --------------------------------------
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
for v in "0 exact" "4 hutch4" "2 hutch2"; do
  set -- $v
  run_retry "10D $2" 3 -- bash -c "$(declare -f osc10d); osc10d $1 $2"
  echo "[chain17] 10D $2 done at $(date)" >> log/r3/chain.log
done

# -- 3. cosine 5D/10D vs literature -----------------------------------------
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
for v in "5 0 exact" "10 0 exact" "10 4 hutch4"; do
  set -- $v
  run_retry "cosine $1D $3" 3 -- bash -c "$(declare -f cosine); cosine $1 $2 $3"
  echo "[chain17] cosine $1D $3 done at $(date)" >> log/r3/chain.log
done

# -- 4. H2+ 3D vs Bates-Reid ------------------------------------------------
run_retry "H2+ 3D 300k" 3 -- bash -c "
  python -m neuralsvd_tpu.cli.pde \
    --problem sch --potential_type hydrogen_mol_ion --hydrogen_mol_ion_R 1.0 \
    --ndim 3 --neigs 5 --operator_shift 1.0 --laplacian_eps -1 \
    --mlp_hidden_dims 128,128,128 --nonlinearity softplus --parallel true \
    --apply_boundary false --apply_exp_mask true --exp_mask_init_scale 3 \
    --use_fourier_feature true --fourier_mapping_size 128 \
    --fourier_scale 0.3 --fourier_append_radial true \
    --sampling_mode gaussian_mixture --sampling_scales 0.5,1.5,4 \
    --batch_size 512 --val_mc_size 16384 \
    --optimizer adam --lr 1e-3 --use_lr_scheduler true --grad_clip 100 \
    --num_iters 300000 --print_freq 10000 --eval_freq 50000 \
    --loss neuralsvd --neuralsvd.step 1 --neuralsvd.sequential true \
    --seed 0 --log_dir log/r3/h2p --overwrite true \
    > log/r3/h2p_300k.log 2>&1"
echo "[chain17] H2+ done at $(date)" >> log/r3/chain.log

# -- 5. engine A/B bench + E8 -----------------------------------------------
run_retry "laplacian A/B" 3 -- bash -c \
  "python scripts/bench_laplacian.py > log/r3/bench_laplacian.log 2>&1"
echo "[chain17] laplacian A/B done at $(date)" >> log/r3/chain.log
run_retry "E8 forward-lap 300k" 3 -- bash -c \
  "NS_LAP=forward NS_CKPT=/root/repo/log/r3/H16_fwdlap.ckpt \
   python scripts/validate_northstar.py 300000 -1 \
   >> log/r3/H16_fwdlap_300k.log 2>&1"
echo "[chain17] E8 done at $(date)" >> log/r3/chain.log

# -- 6. retrieval bench -------------------------------------------------------
run_retry "retrieval bench" 3 -- bash -c \
  "python scripts/bench_retrieval.py > log/r3/bench_retrieval.log 2>&1"
echo "[chain17] retrieval bench done at $(date)" >> log/r3/chain.log

# -- 7. optional: guard-mode resume ------------------------------------------
run_retry "guard-mode L=36 resume" 3 -- bash -c \
  "NS_NEIGS=42 NS_EVAL_TOP=36 NS_MIX='0.5,2,6,16,32' NS_MIX_W='0.3,0.2,0.2,0.15,0.15' \
   NS_RESCUE=1 NS_CKPT=/root/repo/log/r3/H36_guard.ckpt \
   python scripts/validate_northstar.py 800000 -1 \
   >> log/r3/H36_guard_800k.log 2>&1"
echo "[chain17] guard-mode done at $(date)" >> log/r3/chain.log

# -- 8. optional: oscillator L=55 forward ------------------------------------
run_retry "osc55 forward 200k" 3 -- bash -c "
  python -m neuralsvd_tpu.cli.pde \
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
echo "[chain17] osc55fwd done at $(date)" >> log/r3/chain.log
echo "[chain17] ALL DONE at $(date)" >> log/r3/chain.log
