#!/bin/bash
# Round-3 TPU queue, part 10 (after chain9's A/B + E8):
#   15. RERUN the guard-mode L=36 800k (chain8 died at the 50k rescue
#       when the axon tunnel dropped — Connection refused on
#       remote_compile; log/r3/H36_guard_800k.log).  NS_CKPT resumes
#       from the last saved chunk, and the retry loop restarts the
#       process on transient tunnel failures (a fresh process
#       reconnects; the in-process backend client does not recover).
set -u
cd "$(dirname "$0")/.."

while ! grep -q "chain9. E8 forward-lap 300k done" log/r3/chain.log 2>/dev/null; do
  sleep 120
done
sleep 30
echo "[chain10] starting guard-mode L=36 800k (retry wrapper) at $(date)" >> log/r3/chain.log
for attempt in 1 2 3 4; do
  NS_NEIGS=42 NS_EVAL_TOP=36 NS_MIX="0.5,2,6,16,32" NS_MIX_W="0.3,0.2,0.2,0.15,0.15" \
  NS_RESCUE=1 NS_CKPT=/root/repo/log/r3/H36_guard.ckpt \
    python scripts/validate_northstar.py 800000 -1 \
    >> log/r3/H36_guard_800k.log 2>&1 && break
  echo "[chain10] attempt $attempt failed at $(date); retrying in 120s" >> log/r3/chain.log
  sleep 120
done
echo "[chain10] guard-mode L=36 800k done at $(date)" >> log/r3/chain.log
