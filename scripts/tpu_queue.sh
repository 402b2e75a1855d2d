#!/bin/bash
# Round-4 TPU master queue (VERDICT r3 items 2-6 + queue hygiene item 8).
# Single consolidated queue replacing the seventeen r3_tpu_chain*.sh
# scripts; the relay-gate / retry / PID-gate pieces live in
# scripts/queue_lib.sh and are tested by tests/test_queue_lib.py.
#
# Order = value per TPU-hour if the relay window is short:
#   1. live bench (BENCH_r04 must be a live number)          ~5 min
#   2. Laplacian engine A/B (gates the default-engine call)  ~15 min
#   3. L=36 tail-LR 800k — THE GATE (grouped <= 1e-2)        ~1 h
#   4. E4 exact-step profile row (MFU)                       ~10 min
#   5. 10D oscillator exact/hutch4/hutch2 A/B                ~1.5 h
#   6. cosine 5D/10D (+10D hutch4) vs Han-Lu-Zhou            ~1.5 h
#   7. H2+ 3D 300k vs Bates-Reid                             ~30 min
#   8. SpIN + NeuralEF hydrogen-2D L=16 (multi-method rows)  ~1.5 h
#   9. cosine-2D L=25 with rescue + tail-LR (full table)     ~45 min
#  10. E8 forward-engine 300k accuracy + retrieval bench
#  11. optional: L=36 guard resume, oscillator L=55
# Every step: relay-gated, fresh-process, resumable (NS_CKPT / orbax).
set -u
cd "$(dirname "$0")/.."
mkdir -p log/r4
export NSQ_LOG=log/r4/queue.log
. scripts/queue_lib.sh

nsq_pid_gate /tmp/nsq.pid || exit 1
nsq_mark "round-4 master queue start; waiting for relay"
nsq_relay_wait
nsq_mark "relay up"

# -- 1. live bench ------------------------------------------------------------
# success requires a LIVE record: bench.py's cached-fallback line also
# contains "metric", so additionally reject any _cached metric (ADVICE r4
# — a mid-run relay drop must retry, not mark the step done with a cache)
nsq_run_retry "live bench" 3 -- bash -c \
  "NS_BENCH_INNER=1 python bench.py > log/r4/bench_sanity.log 2>&1 \
   && grep -q '\"metric\"' log/r4/bench_sanity.log \
   && ! grep -q '_cached' log/r4/bench_sanity.log"

# -- 2. Laplacian engine A/B ---------------------------------------------------
nsq_run_retry "laplacian A/B" 3 -- bash -c \
  "python scripts/bench_laplacian.py > log/r4/bench_laplacian.log 2>&1 \
   && grep -q lap_engine log/r4/bench_laplacian.log"

# -- 3. THE GATE: L=36 tail-LR 800k --------------------------------------------
nsq_run_retry "L36 tail-LR 800k gate" 6 -- bash -c \
  "NS_NEIGS=36 NS_RESCUE=1 NS_TAIL_LR=3 NS_TAIL_LR_START=25 \
   NS_MIX='0.5,2,6,16,32' NS_MIX_W='0.3,0.2,0.2,0.15,0.15' \
   NS_CKPT=/root/repo/log/r4/H36_taillr.ckpt \
   python scripts/validate_northstar.py 800000 -1 \
   >> log/r4/H36_taillr_800k.log 2>&1"

# -- 3b. gate fallback: combined levers if tail-LR alone falls short ------------
# VERDICT r3 item 2: "If tail-LR alone falls short, combine with the
# early-rescue schedule (H36_clean_800k showed all-rescues-by-100k beats
# late rescue)."  Guards add 6 extra boosted towers for selection
# (prefix-independent, so they cannot hurt the first 36).
# gate decision lives in queue_lib.sh (nsq_gate_needs_fallback) and is
# unit-tested against synthetic logs (tests/test_queue_lib.py): absent
# log / mangled value => fallback RUNS (conservative; ADVICE r4).
if nsq_gate_needs_fallback log/r4/H36_taillr_800k.log \
     eigval_max_rel_err_grouped 0.01; then
  nsq_run_retry "L36 combined-lever fallback 800k" 5 -- bash -c \
    "NS_NEIGS=42 NS_EVAL_TOP=36 NS_RESCUE=1 NS_RESCUE_EVERY=20000 \
     NS_RESCUE_END=0.15 NS_TAIL_LR=3 NS_TAIL_LR_START=25 \
     NS_MIX='0.5,2,6,16,32' NS_MIX_W='0.3,0.2,0.2,0.15,0.15' \
     NS_CKPT=/root/repo/log/r4/H36_combo.ckpt \
     python scripts/validate_northstar.py 800000 -1 \
     >> log/r4/H36_combo_800k.log 2>&1"
fi

# -- 4. E4 exact-step profile row (MFU) ----------------------------------------
nsq_run_retry "E4 profile" 3 -- bash -c \
  "python scripts/profile_flagships.py log/r4/profile \
   > log/r4/profile.log 2>&1"

# -- 5. 10D oscillator Hutchinson A/B -------------------------------------------
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
    --seed 0 --log_dir "log/r4/osc10d_$2" --overwrite true \
    > "log/r4/osc10d_$2_100k.log" 2>&1
}
for v in "0 exact" "4 hutch4" "2 hutch2"; do
  set -- $v
  nsq_run_retry "10D osc $2" 3 -- bash -c "$(declare -f osc10d); osc10d $1 $2"
done

# -- 6. cosine 5D/10D vs Han-Lu-Zhou --------------------------------------------
cosine_hd() {  # cosine_hd <ndim> <probes> <tag>
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
    --seed 0 --log_dir "log/r4/cos$1d_$3" --overwrite true \
    > "log/r4/cos$1d_$3_100k.log" 2>&1
}
for v in "5 0 exact" "10 0 exact" "10 4 hutch4"; do
  set -- $v
  nsq_run_retry "cosine $1D $3" 3 -- \
    bash -c "$(declare -f cosine_hd); cosine_hd $1 $2 $3"
done

# -- 7. H2+ 3D vs Bates-Reid -----------------------------------------------------
nsq_run_retry "H2+ 3D 300k" 3 -- bash -c "
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
    --seed 0 --log_dir log/r4/h2p --overwrite true \
    > log/r4/h2p_300k.log 2>&1"

# -- 8. competing methods at flagship scale (VERDICT r3 item 5) ------------------
# Same sampler/model/eval harness as the north-star (NS_METHOD lever).
# NeuralEF: the full E4 per-mode architecture, 300k (compare vs the E8
# NestedLoRA forward-engine 300k row).  SpIN: shared trunk + FMAP 256 —
# its (L, L, P) Jacobian EMA and L^2 reverse passes per step are the
# method's inherent cost (methods/spin.py docstring); an honest
# memory/budget-bound row is an acceptable outcome per VERDICT.
nsq_run_retry "NeuralEF hydrogen L16 300k" 3 -- bash -c \
  "NS_METHOD=neuralef NS_CKPT=/root/repo/log/r4/H16_neuralef.ckpt \
   python scripts/validate_northstar.py 300000 -1 \
   >> log/r4/H16_neuralef_300k.log 2>&1"
nsq_run_retry "SpIN hydrogen L16 100k" 3 -- bash -c \
  "NS_METHOD=spin NS_PARALLEL=0 NS_FMAP=256 \
   NS_CKPT=/root/repo/log/r4/H16_spin.ckpt \
   python scripts/validate_northstar.py 100000 -1 \
   >> log/r4/H16_spin_100k.log 2>&1"
# per-mode-tower control at L=6 (VERDICT r4 weak 5: a weak shared-trunk
# SpIN number alone is unattributable: trunk artifact vs method limit;
# L=4 keeps the (L, L, P) j_avg EMA inside HBM with parallel towers)
nsq_run_retry "SpIN hydrogen L4 per-mode control 100k" 3 -- bash -c \
  "NS_METHOD=spin NS_PARALLEL=1 NS_NEIGS=4 \
   NS_CKPT=/root/repo/log/r4/H4_spin_permode.ckpt \
   python scripts/validate_northstar.py 100000 -1 \
   >> log/r4/H4_spin_permode_100k.log 2>&1"

# -- 9. cosine-2D L=25 full literature table (VERDICT r3 item 6) -----------------
nsq_run_retry "cosine-2D L25 rescue" 3 -- bash -c "
  python -m neuralsvd_tpu.cli.pde \
    --problem sch --potential_type cosine --ndim 2 \
    --lim 3.141592653589793 \
    --neigs 25 --operator_shift 26.0 --laplacian_eps -1 \
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
    --seed 0 --log_dir log/r4/cos2d_L25 --overwrite true \
    > log/r4/cos2d_L25_200k.log 2>&1"

# -- 10. forward-engine 300k accuracy (E8) + retrieval bench ---------------------
nsq_run_retry "E8 forward-lap 300k" 3 -- bash -c \
  "NS_LAP=forward NS_CKPT=/root/repo/log/r4/H16_fwdlap.ckpt \
   python scripts/validate_northstar.py 300000 -1 \
   >> log/r4/H16_fwdlap_300k.log 2>&1"
nsq_run_retry "retrieval bench" 3 -- bash -c \
  "python scripts/bench_retrieval.py > log/r4/bench_retrieval.log 2>&1"

# -- 11. optional ------------------------------------------------------------------
nsq_run_retry "guard-mode L=36 resume" 2 -- bash -c \
  "NS_NEIGS=42 NS_EVAL_TOP=36 NS_MIX='0.5,2,6,16,32' \
   NS_MIX_W='0.3,0.2,0.2,0.15,0.15' NS_RESCUE=1 \
   NS_CKPT=/root/repo/log/r3/H36_guard.ckpt \
   python scripts/validate_northstar.py 800000 -1 \
   >> log/r4/H36_guard_800k.log 2>&1"
nsq_run_retry "osc55 forward 200k" 2 -- bash -c "
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
    --loss neuralsvd --seed 0 --log_dir log/r4/osc55fwd \
    > log/r4/osc55fwd_200k.log 2>&1"

nsq_mark "ALL DONE"
