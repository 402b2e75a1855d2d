#!/bin/bash
# Round-3 TPU queue, part 9 (after chain8's guard-mode L=36 run):
#   13. Laplacian-engine A/B (scripts/bench_laplacian.py): forward
#       -Laplacian engine vs nested-JVP inside the E4 train step.
#   14. E8: L=16 E1-comparable 300k accuracy run with the forward
#       engine (NS_LAP=forward is the default; this pins the row).
set -u
cd "$(dirname "$0")/.."

while ! grep -q "chain8. guard-mode L=36 800k done" log/r3/chain.log 2>/dev/null; do
  sleep 120
done
sleep 30
echo "[chain9] starting laplacian A/B at $(date)" >> log/r3/chain.log
python scripts/bench_laplacian.py > log/r3/bench_laplacian.log 2>&1
echo "[chain9] laplacian A/B done at $(date)" >> log/r3/chain.log
NS_LAP=forward NS_CKPT=/root/repo/log/r3/H16_fwdlap.ckpt \
  python scripts/validate_northstar.py 300000 -1 \
  > log/r3/H16_fwdlap_300k.log 2>&1
echo "[chain9] E8 forward-lap 300k done at $(date)" >> log/r3/chain.log
