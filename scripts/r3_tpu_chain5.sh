#!/bin/bash
# Round-3 TPU queue, part 5 (after chain4's money extension):
#   9. matmul-precision tier experiment on the exact-JVP hydrogen L=16
#      (E6): NS_PREC=high = 3-pass-bf16 tower einsums with f32 storage —
#      the tier between E1 (f32-HIGHEST, 2.75e-3 @ 243 steps/s) and E5
#      (bf16 storage, 7.97e-3 @ 324 steps/s).  E1-comparable 300k run.
set -u
cd "$(dirname "$0")/.."

while ! grep -q "chain4. money extension done" log/r3/chain.log 2>/dev/null; do
  sleep 120
done
sleep 30
echo "[chain5] starting NS_PREC=high 300k at $(date)" >> log/r3/chain.log
NS_PREC=high NS_CKPT=/root/repo/log/r3/H16_prec_high.ckpt \
  python scripts/validate_northstar.py 300000 -1 \
  > log/r3/H16_prec_high_300k.log 2>&1
echo "[chain5] NS_PREC=high 300k done at $(date)" >> log/r3/chain.log
