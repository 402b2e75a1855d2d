#!/bin/bash
# Round-5 TPU queue, take 2 (post host-restart 2026-08-19 06:14).
#
# State at launch: round-4 queue steps 1-2 are DONE and committed (live
# bench 391 steps/s, Laplacian engine A/B 1.43x — BASELINE round-5
# sections); the L=36 gate attempt ran 03:41->06:14 and was LOST with the
# host restart (uncommitted log + ckpt).  Lessons applied here:
#   - every step's log is committed by scripts/r5_autocommit.sh (10 min)
#     and by this queue at step boundaries, so a host restart (which
#     restores the workspace from git) cannot zero a finished run
#   - long runs checkpoint under NS_CKPT / --resume and the flagship ckpt
#     is committed when quiescent, so a restart resumes instead of
#     restarting
#   - the gate run emits mid-run partial eval rows (NS_EVAL_EVERY) and
#     stops early the moment the gate is met (NS_GATE)
#   - a committed DONE marker per step makes the whole queue idempotent
# Order = value per TPU-hour (the relay has dropped for 8-32 h twice):
#   1. cosine-2D L=25 rescue+tail-LR 200k  (~25 min; VERDICT missing 4)
#   2. L=36 combined-lever 800k gate       (~2.6 h;  VERDICT missing 1)
#   3. E4 exact-step profile row (MFU)     (~10 min; VERDICT missing 6)
#   4. NeuralEF hydrogen L16 300k          (~50 min; VERDICT missing 2)
#   5. SpIN shared L16 100k + L4 control   (VERDICT missing 2 + weak 5)
#   6. H2+ 3D 300k vs Bates-Reid           (VERDICT item 6)
#   7. 10D oscillator exact/hutch4/hutch2  (VERDICT item 6)
#   8. cosine 5D/10D vs Han-Lu-Zhou        (VERDICT item 6)
#   9. E8 forward-engine 300k + retrieval bench
set -u
cd "$(dirname "$0")/.."
mkdir -p log/r5
export NSQ_LOG=log/r5/tpu_queue.log
. scripts/queue_lib.sh

nsq_pid_gate /tmp/ns_r5tpu.pid || exit 1
nsq_mark "r5 TPU queue (take 2) start; waiting for relay"
nsq_relay_wait
nsq_mark "relay up"

gitc() {  # gitc <msg> <paths...> — flock-serialized add+commit (the
          # autocommitter and the interactive session share the lock)
  local msg="$1"; shift
  (
    flock -w 300 9 || exit 0
    git add -f -- "$@" 2>/dev/null
    git diff --cached --quiet || git commit -q -m "$msg"
  ) 9>/tmp/nsgit.lock
}

step() {  # step <label> <attempts> <cmd> [extra commit paths...]
          # idempotent: a committed DONE marker skips finished steps
          # across queue restarts (host restart => workspace = git state)
  local label="$1" attempts="$2" cmd="$3"; shift 3
  if grep -qxF "DONE $label" log/r5/steps_done.log 2>/dev/null; then
    nsq_mark "skip (already done): $label"
    return 0
  fi
  if nsq_run_retry "$label" "$attempts" -- bash -c "$cmd"; then
    echo "DONE $label" >> log/r5/steps_done.log
  fi
  gitc "Measured: $label (TPU queue)" log/r5/steps_done.log \
    log/r5/tpu_queue.log "$@"
}

# -- 1. cosine-2D L=25 full literature table (fast, closes VERDICT m4) ----------
step "cosine-2D L25 rescue 200k" 3 "
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
    --seed 0 --log_dir log/r5/cos2d_L25 --resume true \
    >> log/r5/cos2d_L25_200k.log 2>&1" \
  log/r5/cos2d_L25_200k.log

# -- 2. THE GATE: L=36 combined levers, 800k, early stop at 1e-2 ----------------
# One-shot best-odds config (tail-LR 3x validated on miniature + cosine;
# guards absorb the truncation edge; early rescue by 120k beat late
# rescue in H36_clean_800k) — VERDICT r4 items 1+2 said run the fallback
# if tail-LR alone misses; with ~5 h left there is time for exactly one
# 800k attempt, so run the combined config directly.
step "L36 combined-lever 800k gate" 8 "
  NS_NEIGS=42 NS_EVAL_TOP=36 NS_RESCUE=1 NS_RESCUE_EVERY=20000 \
  NS_RESCUE_END=0.15 NS_TAIL_LR=3 NS_TAIL_LR_START=25 \
  NS_MIX='0.5,2,6,16,32' NS_MIX_W='0.3,0.2,0.2,0.15,0.15' \
  NS_EVAL_EVERY=100000 NS_GATE=0.01 \
  NS_CKPT=/root/repo/log/r5/H36_combo.ckpt \
  python scripts/validate_northstar.py 800000 -1 \
  >> log/r5/H36_combo_800k.log 2>&1" \
  log/r5/H36_combo_800k.log log/r5/H36_combo.ckpt

# -- 3. E4 exact-step profile row (MFU) -----------------------------------------
step "E4 profile MFU" 3 "
  python scripts/profile_flagships.py log/r5/profile \
  > log/r5/profile.log 2>&1" \
  log/r5/profile.log log/r5/profile

# -- 4. NeuralEF hydrogen L16 300k (multi-method flagship row) -------------------
step "NeuralEF hydrogen L16 300k" 3 "
  NS_METHOD=neuralef NS_EVAL_EVERY=100000 \
  NS_CKPT=/root/repo/log/r5/H16_neuralef.ckpt \
  python scripts/validate_northstar.py 300000 -1 \
  >> log/r5/H16_neuralef_300k.log 2>&1" \
  log/r5/H16_neuralef_300k.log

# -- 5. SpIN flagship + attribution control (VERDICT weak 5) ---------------------
step "SpIN hydrogen L16 shared 100k" 3 "
  NS_METHOD=spin NS_PARALLEL=0 NS_FMAP=256 NS_EVAL_EVERY=50000 \
  NS_CKPT=/root/repo/log/r5/H16_spin.ckpt \
  python scripts/validate_northstar.py 100000 -1 \
  >> log/r5/H16_spin_100k.log 2>&1" \
  log/r5/H16_spin_100k.log
step "SpIN hydrogen L4 per-mode control 100k" 3 "
  NS_METHOD=spin NS_PARALLEL=1 NS_NEIGS=4 NS_EVAL_EVERY=50000 \
  NS_CKPT=/root/repo/log/r5/H4_spin_permode.ckpt \
  python scripts/validate_northstar.py 100000 -1 \
  >> log/r5/H4_spin_permode_100k.log 2>&1" \
  log/r5/H4_spin_permode_100k.log

# -- 6. H2+ 3D vs Bates-Reid ------------------------------------------------------
step "H2+ 3D 300k" 3 "
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
    --seed 0 --log_dir log/r5/h2p --resume true \
    >> log/r5/h2p_300k.log 2>&1" \
  log/r5/h2p_300k.log

# -- 7. 10D oscillator Hutchinson A/B ---------------------------------------------
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
    --seed 0 --log_dir "log/r5/osc10d_$2" --resume true \
    >> "log/r5/osc10d_$2_100k.log" 2>&1
}
for v in "0 exact" "4 hutch4" "2 hutch2"; do
  set -- $v
  step "10D osc $2 100k" 3 "$(declare -f osc10d); osc10d $1 $2" \
    "log/r5/osc10d_$2_100k.log"
done

# -- 8. cosine 5D/10D vs Han-Lu-Zhou ----------------------------------------------
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
    --seed 0 --log_dir "log/r5/cos$1d_$3" --resume true \
    >> "log/r5/cos$1d_$3_100k.log" 2>&1
}
for v in "5 0 exact" "10 0 exact" "10 4 hutch4"; do
  set -- $v
  step "cosine $1D $3 100k" 3 \
    "$(declare -f cosine_hd); cosine_hd $1 $2 $3" \
    "log/r5/cos$1d_$3_100k.log"
done

# -- 9. E8 forward-engine 300k accuracy + retrieval bench --------------------------
step "E8 forward-lap 300k" 3 "
  NS_LAP=forward NS_EVAL_EVERY=100000 \
  NS_CKPT=/root/repo/log/r5/H16_fwdlap.ckpt \
  python scripts/validate_northstar.py 300000 -1 \
  >> log/r5/H16_fwdlap_300k.log 2>&1" \
  log/r5/H16_fwdlap_300k.log
step "retrieval bench" 3 "
  python scripts/bench_retrieval.py > log/r5/bench_retrieval.log 2>&1" \
  log/r5/bench_retrieval.log

nsq_mark "ALL DONE"
gitc "r5 TPU queue ALL DONE" log/r5/tpu_queue.log
