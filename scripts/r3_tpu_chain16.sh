#!/bin/bash
# Round-3 TPU queue, part 16: L=36 hydrogen with the tail-LR lever.
# The clean-800k run (BASELINE) sits at grouped 2.21e-2, ALL residual in
# the n=5 edge shell; the miniature showed a 3x per-mode LR boost cuts
# edge-mode error 15x and provably cannot touch earlier modes under
# sequential nesting (tests/test_guard_invariance.py).  Direct attempt at
# the VERDICT "grouped <= 1e-2 at <= 800k" criterion.  Waits for chain15.
set -u
cd "$(dirname "$0")/.."

relay_wait() {
  while ! timeout 3 bash -c 'exec 3<>/dev/tcp/127.0.0.1/8103' 2>/dev/null; do
    sleep 60
  done
}

while kill -0 "$(cat /tmp/chain15.pid 2>/dev/null)" 2>/dev/null \
      && ! grep -q "chain15. ALL DONE" log/r3/chain.log; do
  sleep 120
done
echo "[chain16] starting L=36 tail-LR 800k at $(date)" >> log/r3/chain.log
for a in 1 2 3 4 5; do
  relay_wait
  NS_NEIGS=36 NS_RESCUE=1 NS_TAIL_LR=3 NS_TAIL_LR_START=25 \
  NS_MIX='0.5,2,6,16,32' NS_MIX_W='0.3,0.2,0.2,0.15,0.15' \
  NS_CKPT=/root/repo/log/r3/H36_taillr.ckpt \
  python scripts/validate_northstar.py 800000 -1 \
    >> log/r3/H36_taillr_800k.log 2>&1 && break
  echo "[chain16] attempt $a failed at $(date); retrying" >> log/r3/chain.log
  sleep 120
done
echo "[chain16] ALL DONE at $(date)" >> log/r3/chain.log
