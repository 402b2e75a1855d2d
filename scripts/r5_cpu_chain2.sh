#!/bin/bash
# Round-5 CPU chain 2 — SpIN attribution control (VERDICT r4 weak 5 /
# item 8 pivot): if the relay stays down, a CPU-scale three-way answers
# "is a weak SpIN number a shared-trunk artifact or a method limit" —
# same harness (validate_northstar), same budget, hydrogen-2D L=4
# (shell-closing), 25k iters, FMAP 256, B=128:
#   a. SpIN, per-mode towers   (NS_PARALLEL=1)
#   b. SpIN, shared trunk      (NS_PARALLEL=0)
#   c. NestedLoRA, per-mode    (budget anchor)
# Starts only after chain 1's ALL DONE marker (strictly serial CPU).
set -u
cd "$(dirname "$0")/.."
mkdir -p log/r5
export NSQ_LOG=log/r5/cpu_chain.log
. scripts/queue_lib.sh

nsq_pid_gate /tmp/ns_r5cpu2.pid || exit 1
nsq_mark "r5 CPU chain2 armed; waiting for chain1 ALL DONE"
while ! grep -q "r5 CPU chain ALL DONE" log/r5/cpu_chain.log 2>/dev/null; do
  sleep 120
done
nsq_mark "r5 CPU chain2 start"

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

control() {  # control <method> <parallel 0|1> <tag>
  PALLAS_AXON_POOL_IPS= JAX_PLATFORMS=cpu \
  NS_METHOD="$1" NS_PARALLEL="$2" NS_NEIGS=4 NS_FMAP=256 NS_BATCH=128 \
  NS_CKPT="/root/repo/log/r5/ctrl_$3.ckpt" \
  python scripts/validate_northstar.py 25000 -1 \
    >> "log/r5/ctrl_$3_25k.log" 2>&1
}

retry_cpu "SpIN L4 per-mode 25k" 4 bash -c \
  "$(declare -f control); control spin 1 spin_permode"
retry_cpu "SpIN L4 shared-trunk 25k" 4 bash -c \
  "$(declare -f control); control spin 0 spin_shared"
retry_cpu "NestedLoRA L4 per-mode 25k" 4 bash -c \
  "$(declare -f control); control nestedlora 1 nlora_permode"

nsq_mark "r5 CPU chain2 ALL DONE"
