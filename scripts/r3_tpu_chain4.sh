#!/bin/bash
# Round-3 TPU queue, part 4 (after chain3's clean 500k parity run):
#   8. money-run extension: resume the converged-but-tail-limited L=36
#      checkpoint (800k: shells n=0..4 at <=1.1e-3, n=5 at 2.65e-2
#      grouped) with a 1.2M cosine horizon.  Resuming re-warms the LR to
#      the 800k point of the longer schedule (~2.5e-5), giving the six
#      modes rescued at 200k another 400k iters to settle the n=5 shell
#      under the 1e-2 goal.
set -u
cd "$(dirname "$0")/.."

while [ ! -f log/r3/H36_clean_500k.log ] || ! grep -q '"metric"' log/r3/H36_clean_500k.log 2>/dev/null; do
  sleep 120
done
sleep 30
echo "[chain4] starting L=36 money extension (800k->1.2M) at $(date)" >> log/r3/chain.log
NS_NEIGS=36 NS_MIX="0.5,2,6,16,32" NS_MIX_W="0.3,0.2,0.2,0.15,0.15" \
NS_RESCUE=1 NS_CKPT=/root/repo/log/r3/H36_rescue.ckpt \
  python scripts/validate_northstar.py 1200000 -1 \
  >> log/r3/H36_rescue_800k.log 2>&1
echo "[chain4] money extension done at $(date)" >> log/r3/chain.log
