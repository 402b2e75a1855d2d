#!/bin/bash
# Round-3 TPU queue, part 13: retrieval-eval throughput at Sketchy scale
# (the one CDK subsystem without a measured perf row).  Waits for chain12.
set -u
cd "$(dirname "$0")/.."

relay_wait() {
  while ! timeout 3 bash -c 'exec 3<>/dev/tcp/127.0.0.1/8103' 2>/dev/null; do
    sleep 60
  done
}

while kill -0 "$(cat /tmp/chain12.pid 2>/dev/null)" 2>/dev/null \
      && ! grep -q "chain12. ALL DONE" log/r3/chain.log; do
  sleep 120
done
echo "[chain13] starting retrieval bench at $(date)" >> log/r3/chain.log
for a in 1 2 3; do
  relay_wait
  python scripts/bench_retrieval.py > log/r3/bench_retrieval.log 2>&1 && break
  echo "[chain13] retrieval bench attempt $a failed at $(date)" >> log/r3/chain.log
  sleep 120
done
echo "[chain13] ALL DONE at $(date)" >> log/r3/chain.log
