# queue_lib.sh — testable pieces of the TPU run queue (VERDICT r3 item 8).
#
# The axon relay (127.0.0.1:8103, injected from outside the container) can
# drop for hours and the in-process JAX client does not recover from a
# mid-run drop (CLAUDE.md), so every queue step (a) gates on the relay
# being reachable, (b) runs the python work in a FRESH process, and
# (c) retries with resume (NS_CKPT / orbax) on failure.  These helpers are
# sourced by scripts/tpu_queue.sh and exercised directly by
# tests/test_queue_lib.py with a fake relay port.
#
# Env knobs (all optional, for tests):
#   NSQ_RELAY_HOST / NSQ_RELAY_PORT  relay address   (default 127.0.0.1:8103)
#   NSQ_POLL_S                       relay poll interval, seconds (default 60)
#   NSQ_LOG                          queue log file  (default log/r4/queue.log)
#   NSQ_RETRY_SLEEP_S                sleep between retries (default 120)

NSQ_RELAY_HOST="${NSQ_RELAY_HOST:-127.0.0.1}"
NSQ_RELAY_PORT="${NSQ_RELAY_PORT:-8103}"
NSQ_POLL_S="${NSQ_POLL_S:-60}"
NSQ_LOG="${NSQ_LOG:-log/r4/queue.log}"
NSQ_RETRY_SLEEP_S="${NSQ_RETRY_SLEEP_S:-120}"

nsq_mark() {  # nsq_mark <msg> — timestamped queue-log line
  mkdir -p "$(dirname "$NSQ_LOG")"
  echo "[queue] $* at $(date)" >> "$NSQ_LOG"
}

nsq_relay_up() {  # rc 0 iff the relay accepts a TCP connection
  timeout 3 bash -c \
    "exec 3<>/dev/tcp/${NSQ_RELAY_HOST}/${NSQ_RELAY_PORT}" 2>/dev/null
}

nsq_relay_wait() {  # block until the relay is up; hourly log heartbeat
  local waited=0
  while ! nsq_relay_up; do
    sleep "$NSQ_POLL_S"; waited=$((waited + NSQ_POLL_S))
    if [ $((waited % 3600)) -eq 0 ]; then
      nsq_mark "relay still down after ${waited}s"
    fi
  done
}

nsq_pid_gate() {  # nsq_pid_gate <pidfile> — single-instance lock; rc 1 if
                  # another live holder exists, else records our PID
  local pidfile="$1" old
  if [ -f "$pidfile" ]; then
    old=$(cat "$pidfile")
    if [ -n "$old" ] && kill -0 "$old" 2>/dev/null; then
      nsq_mark "pid gate: $pidfile held by live pid $old; exiting"
      return 1
    fi
  fi
  echo $$ > "$pidfile"
}

nsq_gate_value() {  # nsq_gate_value <log> <metric_substr> — print the last
                    # JSON "value" whose line mentions the metric, or "none"
  python - "$1" "$2" <<'EOF'
import json, sys
val = None
try:
    for ln in open(sys.argv[1]):
        if ln.startswith("{") and sys.argv[2] in ln:
            try:
                val = json.loads(ln)["value"]
            except (ValueError, KeyError):
                pass  # mangled line: keep scanning, stay conservative
except OSError:
    pass
print(val if val is not None else "none")
EOF
}

nsq_gate_needs_fallback() {  # nsq_gate_needs_fallback <log> <metric_substr>
                             # <threshold> — rc 0 (RUN the fallback) unless
                             # the log proves value <= threshold.  Absent
                             # log, missing metric, or an unparsable value
                             # all read as "gate outcome unknown" -> rc 0
                             # (ADVICE r4: a parse crash must not silently
                             # skip the flagship rescue).
  local gv
  gv=$(nsq_gate_value "$1" "$2")
  nsq_mark "gate $2 from $1: $gv (threshold $3)"
  python - "$gv" "$3" <<'EOF'
import sys
try:
    met = float(sys.argv[1]) <= float(sys.argv[2])
except ValueError:
    met = False
sys.exit(1 if met else 0)
EOF
}

nsq_run_retry() {  # nsq_run_retry <label> <attempts> -- cmd...
                   # relay-gated fresh-process retries; rc of last attempt
  local label="$1" attempts="$2"; shift 3
  local a
  for a in $(seq 1 "$attempts"); do
    nsq_relay_wait
    if "$@"; then
      nsq_mark "$label done (attempt $a)"
      return 0
    fi
    nsq_mark "$label attempt $a failed; retrying"
    sleep "$NSQ_RETRY_SLEEP_S"
  done
  nsq_mark "$label EXHAUSTED $attempts attempts"
  return 1
}
