#!/bin/bash
# Round-5 durability guard: the host restarted at 2026-08-19 06:14 and
# restored the workspace from git — every uncommitted byte (2.4h of
# flagship training, the round's FP progress) was lost.  This loop
# commits measurement logs every 10 minutes and resumable checkpoints
# whenever they have been quiescent for >60s (orbax `force=True` deletes
# the old tree before writing the new one, so an in-flight save must
# never be committed).  All git mutation is serialized with the queue
# scripts and the interactive session via flock /tmp/nsgit.lock.
set -u
cd "$(dirname "$0")/.."

nsq_pid_gate_file=/tmp/ns_r5autocommit.pid
if [ -f "$nsq_pid_gate_file" ]; then
  old=$(cat "$nsq_pid_gate_file")
  if [ -n "$old" ] && kill -0 "$old" 2>/dev/null; then
    echo "autocommit already running as pid $old" >&2
    exit 1
  fi
fi
echo $$ > "$nsq_pid_gate_file"

quiescent() {  # quiescent <dir> — rc 0 iff newest file is >60s old
  local newest now
  newest=$(find "$1" -type f -printf '%T@\n' 2>/dev/null \
           | sort -rn | head -1 | cut -d. -f1)
  [ -n "${newest:-}" ] || return 1
  now=$(date +%s)
  [ $((now - newest)) -gt 60 ]
}

while true; do
  (
    flock -w 120 9 || exit 0
    git add -- log/r5/*.log log/r5/*.json log/r5/fp/*.json \
      log/r4/*.log log/r4/*.json 2>/dev/null
    for ck in log/r5/H36_combo.ckpt log/r5/fp/*.ckpt; do
      if [ -d "$ck" ] && quiescent "$ck"; then
        git add -f -- "$ck" 2>/dev/null
      fi
    done
    git diff --cached --quiet \
      || git commit -q -m "Logs: r5 measurement progress (autocommit)"
  ) 9>/tmp/nsgit.lock
  sleep 600
done
