#!/bin/bash
# Round-3 TPU queue (ONE TPU process at a time — CLAUDE.md):
#   1. wait for the plain-config L=36 run (PID in /tmp/h36_plain.pid)
#   2. eval-only diagnosis of the committed round-2 H36 noenv checkpoint
#      through the collapse-aware eval (VERDICT r2 item 2 "done" check)
#   3. the money run: L=36, round-2 recipe + rescue, 800k iters
set -u
cd "$(dirname "$0")/.."

PLAIN_PID=$(cat /tmp/h36_plain.pid)
while kill -0 "$PLAIN_PID" 2>/dev/null; do sleep 30; done
echo "[chain] plain run (pid $PLAIN_PID) finished at $(date)" >> log/r3/chain.log

# --- 2: diagnose committed r2 noenv ckpt (fast eval-only on TPU) ---------
NS_NEIGS=36 NS_MIX="0.5,2,6,16,32" NS_MIX_W="0.3,0.2,0.2,0.15,0.15" \
NS_ENV=0 NS_EVAL_ROUNDS=16 NS_CKPT=log/r2/H36ne.ckpt.pkl \
  timeout 2400 python scripts/validate_northstar.py 0 -1 \
  > log/r3/H36ne_diagnose.log 2>&1
echo "[chain] H36ne diagnosis done at $(date)" >> log/r3/chain.log

# --- 3: money run: recipe + rescue, 800k --------------------------------
NS_NEIGS=36 NS_MIX="0.5,2,6,16,32" NS_MIX_W="0.3,0.2,0.2,0.15,0.15" \
NS_RESCUE=1 NS_CKPT=/root/repo/log/r3/H36_rescue.ckpt \
  python scripts/validate_northstar.py 800000 -1 \
  > log/r3/H36_rescue_800k.log 2>&1
echo "[chain] rescue money run done at $(date)" >> log/r3/chain.log
