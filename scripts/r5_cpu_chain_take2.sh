#!/bin/bash
# Round-5 CPU measurement chain, take 2 (post host-restart 06:14).
#
# Take 1 finished fp1d plain 50k (numbers in the committed
# log/r5/fp_validate.log; result file reconstructed by
# scripts/r5_reconstruct_fp1d.py) and died at fp2d 20k/50k when the host
# restarted.  Changes vs take 1:
#   - stage results + ckpts are committed (autocommit + per-stage gitc)
#   - the cosine-2D L=25 CPU stage is dropped: the relay is back and the
#     TPU queue (scripts/r5_tpu_queue.sh step 1) runs the full 200k table
#   - chain2's CPU SpIN controls are dropped for the same reason
#     (TPU queue step 5 runs them at flagship scale)
#   - new stage: the +levers FP rows (NS_FP_LEVERS=1): the plain run's
#     last 1D shell collapsed (rel 2.29, 3 spurious — the exact edge-mode
#     parking the hydrogen/cosine levers fix); measure the fix on FP too.
# Strictly serial (one host core).
set -u
cd "$(dirname "$0")/.."
mkdir -p log/r5
export NSQ_LOG=log/r5/cpu_chain.log
. scripts/queue_lib.sh

nsq_pid_gate /tmp/ns_r5cpu.pid || exit 1
nsq_mark "r5 CPU chain take-2 start"

gitc() {  # flock-serialized add+commit, shared lock with the TPU queue
  local msg="$1"; shift
  (
    flock -w 300 9 || exit 0
    git add -f -- "$@" 2>/dev/null
    git diff --cached --quiet || git commit -q -m "$msg"
  ) 9>/tmp/nsgit.lock
}

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

# -- 0. reconstruct the finished fp1d row so stage 1 skips it --------------------
retry_cpu "fp1d reconstruct" 2 bash -c \
  "PALLAS_AXON_POOL_IPS= JAX_PLATFORMS=cpu NS_FP_OUT=log/r5/fp \
   python scripts/r5_reconstruct_fp1d.py >> log/r5/fp_validate.log 2>&1"

# -- 1. Fokker-Planck plain-protocol 2D row (1D skips via result file) -----------
retry_cpu "FP 2D 50k" 6 bash -c \
  "PALLAS_AXON_POOL_IPS= JAX_PLATFORMS=cpu NS_FP_OUT=log/r5/fp \
   python scripts/validate_fokker_planck.py 50000 50000 \
   >> log/r5/fp_validate.log 2>&1"
gitc "Measured: FP 2D plain-protocol 50k vs FD spectrum (CPU)" \
  log/r5/fp_validate.log log/r5/fp log/r5/cpu_chain.log

# -- 2. FP 5D lambda_0 (the reference's only FP truth, actually measured) --------
retry_cpu "FP 5D 25k" 4 bash -c \
  "PALLAS_AXON_POOL_IPS= JAX_PLATFORMS=cpu NS_FP_OUT=log/r5/fp \
   python scripts/validate_fokker_planck.py 50000 50000 25000 \
   >> log/r5/fp_validate.log 2>&1"
gitc "Measured: FP 5D lambda0 25k (CPU)" \
  log/r5/fp_validate.log log/r5/fp log/r5/cpu_chain.log

# -- 3. FP +levers rows: tail-LR + clone rescue on the truncation edge -----------
retry_cpu "FP 1D+2D levers 50k" 6 bash -c \
  "PALLAS_AXON_POOL_IPS= JAX_PLATFORMS=cpu NS_FP_OUT=log/r5/fp \
   NS_FP_LEVERS=1 \
   python scripts/validate_fokker_planck.py 50000 50000 \
   >> log/r5/fp_validate.log 2>&1"
gitc "Measured: FP 1D+2D +levers 50k (CPU)" \
  log/r5/fp_validate.log log/r5/fp log/r5/cpu_chain.log

nsq_mark "r5 CPU chain take-2 ALL DONE"
gitc "r5 CPU chain take-2 ALL DONE" log/r5/cpu_chain.log
