#!/bin/bash
# Round-3 TPU queue, part 6 (after chain5's precision-tier experiment):
#   10. clean from-scratch L=36 at the VERDICT gate budget (800k) with
#       rescue active from iter 0.  Rationale: the 800k money run resumed
#       a round-2 checkpoint whose rescue only fired at 200k, so the n=5
#       shell trained 600k and landed at 2.65e-2 grouped; the clean 500k
#       run rescues at 50k/100k.  A clean 800k gives every rescued mode
#       >=700k iters -- the direct attempt at "grouped <= 1e-2 at <= 800k
#       iters" (VERDICT r2 item 1 done-criterion).
set -u
cd "$(dirname "$0")/.."

while ! grep -q "chain5. NS_PREC=high 300k done" log/r3/chain.log 2>/dev/null; do
  sleep 120
done
sleep 30
echo "[chain6] starting clean L=36 800k at $(date)" >> log/r3/chain.log
NS_NEIGS=36 NS_MIX="0.5,2,6,16,32" NS_MIX_W="0.3,0.2,0.2,0.15,0.15" \
NS_RESCUE=1 NS_CKPT=/root/repo/log/r3/H36_clean800.ckpt \
  python scripts/validate_northstar.py 800000 -1 \
  > log/r3/H36_clean_800k.log 2>&1
echo "[chain6] clean L=36 800k done at $(date)" >> log/r3/chain.log
