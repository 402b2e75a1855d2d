#!/bin/bash
# Round-3 TPU queue, part 3 (after chain2's bench):
#   7. clean from-scratch L=36 at the REFERENCE budget (500k) with the
#      final clone-rescue mechanism active from the start — the
#      apples-to-apples parity run for hydrogen.sh
set -u
cd "$(dirname "$0")/.."

while [ ! -f log/r3/bench_sanity.log ] || ! grep -q "metric" log/r3/bench_sanity.log 2>/dev/null; do
  sleep 120
done
sleep 30
echo "[chain3] starting clean L=36 500k at $(date)" >> log/r3/chain.log
NS_NEIGS=36 NS_MIX="0.5,2,6,16,32" NS_MIX_W="0.3,0.2,0.2,0.15,0.15" \
NS_RESCUE=1 NS_CKPT=/root/repo/log/r3/H36_clean.ckpt \
  python scripts/validate_northstar.py 500000 -1 \
  > log/r3/H36_clean_500k.log 2>&1
echo "[chain3] clean L=36 500k done at $(date)" >> log/r3/chain.log
