#!/bin/bash
# Round-5 TPU queue, take 3 — deadline-aware successor to take 2.
#
# Why a take 3: the round's wall clock restarted with the host at
# 06:14:33 UTC, so the driver's round-end bench.py (which needs the axon
# TPU claim FREE to record a live BENCH_r05 — VERDICT r4 weak 2) lands
# ~13:14 UTC.  Take 2 had no notion of a deadline: a 300k-iter step
# started at 12:40 would hold the claim straight through the driver's
# bench and degrade BENCH_r05 to `_cached`.  Take 3:
#   - takes over SCHEDULING without touching the in-flight L=36 gate
#     python (take 2's shell is killed; the orphaned run continues and is
#     monitored + retried here, resuming from NS_CKPT on a tunnel drop)
#   - starts no new step after DEADLINE_NEW and hard-caps every child
#     with `timeout` so the TPU claim is free by DEADLINE_HARD
#   - folds in the follow-up queue's steps (cos2d guards, osc55) at the
#     tail, after take 2's remaining steps, preserving value-per-TPU-hour
#     order; partial rows still land via NS_EVAL_EVERY / --eval_freq +
#     the autocommitter
set -u
cd "$(dirname "$0")/.."
mkdir -p log/r5
export NSQ_LOG=log/r5/tpu_queue.log
. scripts/queue_lib.sh

nsq_pid_gate /tmp/ns_r5tpu3.pid || exit 1

DEADLINE_NEW=$(date -u -d '2026-08-19 12:28:00' +%s)   # last new-step start
DEADLINE_HARD=$(date -u -d '2026-08-19 12:48:00' +%s)  # claim must be free
# the already-running gate python + its bash -c wrapper (known PIDs,
# recorded at takeover; NEVER killed by pattern)
H36_PY="${NS_H36_PY:-}"
H36_WRAP="${NS_H36_WRAP:-}"

nsq_mark "r5 TPU queue (take 3) start; deadlines new=$DEADLINE_NEW hard=$DEADLINE_HARD"

gitc() {  # flock-serialized add+commit (shared with autocommit + session)
  local msg="$1"; shift
  (
    flock -w 300 9 || exit 0
    git add -f -- "$@" 2>/dev/null
    git diff --cached --quiet || git commit -q -m "$msg"
  ) 9>/tmp/nsgit.lock
}

past() { [ "$(date +%s)" -ge "$1" ]; }

budget() {  # seconds until the hard deadline (min 1 so timeout is valid)
  local b=$(( DEADLINE_HARD - $(date +%s) ))
  [ "$b" -lt 1 ] && b=1
  echo "$b"
}

step() {  # step <label> <attempts> <cmd> [extra commit paths...]
  local label="$1" attempts="$2" cmd="$3"; shift 3
  if grep -qxF "DONE $label" log/r5/steps_done.log 2>/dev/null; then
    nsq_mark "skip (already done): $label"
    return 0
  fi
  local a ok=1
  for a in $(seq 1 "$attempts"); do
    if past "$DEADLINE_NEW"; then
      nsq_mark "deadline: not starting '$label' (attempt $a)"
      ok=1; break
    fi
    nsq_relay_wait
    if timeout "$(budget)" bash -c "$cmd"; then
      nsq_mark "$label done (attempt $a)"
      echo "DONE $label" >> log/r5/steps_done.log
      ok=0; break
    fi
    nsq_mark "$label attempt $a failed or timed out; retrying"
    sleep 30
  done
  gitc "Measured: $label (TPU queue take 3)" log/r5/steps_done.log \
    log/r5/tpu_queue.log "$@"
  return $ok
}

# -- 2 (continued). THE GATE: monitor the in-flight L=36 run ---------------------
H36_CMD="
  NS_NEIGS=42 NS_EVAL_TOP=36 NS_RESCUE=1 NS_RESCUE_EVERY=20000 \
  NS_RESCUE_END=0.15 NS_TAIL_LR=3 NS_TAIL_LR_START=25 \
  NS_MIX='0.5,2,6,16,32' NS_MIX_W='0.3,0.2,0.2,0.15,0.15' \
  NS_EVAL_EVERY=100000 NS_GATE=0.01 \
  NS_CKPT=/root/repo/log/r5/H36_combo.ckpt \
  python scripts/validate_northstar.py 800000 -1 \
  >> log/r5/H36_combo_800k.log 2>&1"

h36_done() {  # the final JSON (unlike partial rows) carries num_iters
  grep -q '"train_steps_per_sec"' log/r5/H36_combo_800k.log 2>/dev/null
}

h36_alive() {
  [ -n "$H36_PY" ] && kill -0 "$H36_PY" 2>/dev/null
}

if ! grep -qxF "DONE L36 combined-lever 800k gate" log/r5/steps_done.log \
     2>/dev/null; then
  attempts=0
  while ! h36_done; do
    if past "$DEADLINE_HARD"; then
      nsq_mark "hard deadline: stopping L36 gate run to free the claim"
      [ -n "$H36_PY" ] && kill "$H36_PY" 2>/dev/null
      [ -n "$H36_WRAP" ] && kill "$H36_WRAP" 2>/dev/null
      break
    fi
    if h36_alive; then sleep 60; continue; fi
    # exited without the final JSON: relaunch fresh (resumes from NS_CKPT)
    if past "$DEADLINE_NEW" || [ "$attempts" -ge 6 ]; then
      nsq_mark "L36 gate: no relaunch (deadline or attempts=$attempts)"
      break
    fi
    attempts=$((attempts + 1))
    nsq_mark "L36 gate: python exited early; relaunch attempt $attempts"
    nsq_relay_wait
    timeout "$(budget)" bash -c "$H36_CMD" &
    H36_WRAP=$!
    H36_PY=""        # the wrapper owns the child now; kill via wrapper
    wait "$H36_WRAP" || true
  done
  if h36_done; then
    nsq_mark "L36 combined-lever 800k gate done"
    echo "DONE L36 combined-lever 800k gate" >> log/r5/steps_done.log
  fi
  gitc "Measured: L36 combined-lever gate (take 3)" log/r5/steps_done.log \
    log/r5/tpu_queue.log log/r5/H36_combo_800k.log log/r5/H36_combo.ckpt
fi

# -- 3..9: take 2's remaining steps, deadline-guarded ----------------------------
step "E4 profile MFU" 3 "
  python scripts/profile_flagships.py log/r5/profile \
  > log/r5/profile.log 2>&1" \
  log/r5/profile.log log/r5/profile

step "NeuralEF hydrogen L16 300k" 3 "
  NS_METHOD=neuralef NS_EVAL_EVERY=100000 \
  NS_CKPT=/root/repo/log/r5/H16_neuralef.ckpt \
  python scripts/validate_northstar.py 300000 -1 \
  >> log/r5/H16_neuralef_300k.log 2>&1" \
  log/r5/H16_neuralef_300k.log

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

step "E8 forward-lap 300k" 3 "
  NS_LAP=forward NS_EVAL_EVERY=100000 \
  NS_CKPT=/root/repo/log/r5/H16_fwdlap.ckpt \
  python scripts/validate_northstar.py 300000 -1 \
  >> log/r5/H16_fwdlap_300k.log 2>&1" \
  log/r5/H16_fwdlap_300k.log
step "retrieval bench" 3 "
  python scripts/bench_retrieval.py > log/r5/bench_retrieval.log 2>&1" \
  log/r5/bench_retrieval.log

# -- tail: folded-in follow-up queue steps ----------------------------------------
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

nsq_mark "take 3 ALL DONE (claim free for driver bench)"
gitc "r5 TPU queue take 3 ALL DONE" log/r5/tpu_queue.log
