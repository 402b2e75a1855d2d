#!/bin/bash
# Round-3 TPU queue, part 8 (after chain7's E7 split-precision run):
#   12. guard-mode L=36 (NS_NEIGS=42, NS_EVAL_TOP=36): train 6 extra
#       sacrificial modes from the n=6 shell so the reported n=5 shell
#       sits in the interior of the learned subspace instead of at its
#       truncation edge (where convergence is slowest — clean-800k run
#       landed at 2.21e-2 grouped, all of it in the n=5 shell).  Clean
#       800k, rescue from iter 0, chain6 recipe otherwise.  Direct
#       attempt at the VERDICT "grouped <= 1e-2 at <= 800k" criterion.
set -u
cd "$(dirname "$0")/.."

echo "[chain8] starting guard-mode L=36 (42 trained / 36 reported) 800k at $(date)" >> log/r3/chain.log
NS_NEIGS=42 NS_EVAL_TOP=36 NS_MIX="0.5,2,6,16,32" NS_MIX_W="0.3,0.2,0.2,0.15,0.15" \
NS_RESCUE=1 NS_CKPT=/root/repo/log/r3/H36_guard.ckpt \
  python scripts/validate_northstar.py 800000 -1 \
  > log/r3/H36_guard_800k.log 2>&1
echo "[chain8] guard-mode L=36 800k done at $(date)" >> log/r3/chain.log
