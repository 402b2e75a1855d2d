#!/bin/bash
# Round-3 TPU queue, part 2 (after r3_tpu_chain.sh / the money run):
#   4. bf16-tower experiment on the exact-JVP hydrogen L=16 (VERDICT r2
#      item 7): E1-comparable 300k run, plus throughput read
#   5. 3D hydrogen top-14 (VERDICT r2 item 5)
#   6. bench.py sanity run (new E4-config headline metric)
set -u
cd "$(dirname "$0")/.."

CHAIN_PID=$(cat /tmp/h36_money.pid)
while kill -0 "$CHAIN_PID" 2>/dev/null; do sleep 60; done
echo "[chain2] money run done at $(date)" >> log/r3/chain.log

# --- 4: bf16 towers, L=16, 300k (compare vs E1: 2.75e-3 @ 243 steps/s) --
NS_BF16=1 NS_CKPT=/root/repo/log/r3/H16_bf16.ckpt \
  python scripts/validate_northstar.py 300000 -1 \
  > log/r3/H16_bf16_300k.log 2>&1
echo "[chain2] bf16 300k done at $(date)" >> log/r3/chain.log

# --- 5: 3D hydrogen top-14, 400k ----------------------------------------
NS_NDIM=3 NS_NEIGS=14 NS_RESCUE=1 NS_CKPT=/root/repo/log/r3/H3D_14.ckpt \
  python scripts/validate_northstar.py 400000 -1 \
  > log/r3/H3D_14_400k.log 2>&1
echo "[chain2] 3D 400k done at $(date)" >> log/r3/chain.log

# --- 6: bench sanity -----------------------------------------------------
timeout 1800 python bench.py > log/r3/bench_sanity.log 2>&1
echo "[chain2] bench done at $(date)" >> log/r3/chain.log
