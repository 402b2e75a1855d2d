#!/bin/bash
# Round-3 TPU queue, part 7 (after chain6's clean L=36 800k):
#   11. split-tier precision experiment (E7): NS_PREC='highest@1,high'
#       pins the ground-state tower at HIGHEST (6-pass bf16) and runs the
#       other 15 towers at HIGH (3-pass).  E6 showed 'high' everywhere is
#       1.79x faster but regresses the quadrature-limited 1s 3.9x; the
#       split should keep ~E1 1s accuracy at most of the speedup.
#       E1/E6-comparable 300k run.
set -u
cd "$(dirname "$0")/.."

while ! grep -q "chain6. clean L=36 800k done" log/r3/chain.log 2>/dev/null; do
  sleep 120
done
sleep 30
echo "[chain7] starting NS_PREC=highest@1,high 300k at $(date)" >> log/r3/chain.log
NS_PREC="highest@1,high" NS_CKPT=/root/repo/log/r3/H16_prec_split.ckpt \
  python scripts/validate_northstar.py 300000 -1 \
  > log/r3/H16_prec_split_300k.log 2>&1
echo "[chain7] NS_PREC split 300k done at $(date)" >> log/r3/chain.log
