#!/bin/bash
# Round-4 chained queue: waits for the in-flight single-chip 10.12M W=32
# run (launched separately; /tmp/q4_run10m_w32b.log gets an "rc=" line
# when it exits), then:
#   1. reorder10m — the SAME run with BENCH_REORDER=1, resuming from the
#      kept checkpoint (build skipped): a pure locality A/B at 10M. The
#      CPU smoke measured +66% QPS from the BFS relabel at 20k.
#   2. bench100k3 — the supervised headline bench (validates the exact
#      path the driver runs for BENCH_r04).
# Bounded: must drain before round end so the driver's bench.py finds
# the chip free.
set -o pipefail
cd "$(dirname "$0")/.."

WAIT_LOG=/tmp/q4_run10m_w32b.log
for ((i = 0; i < 1800; i++)); do
  grep -q '^rc=' "$WAIT_LOG" 2>/dev/null && break
  sleep 10
done
if ! grep -q '^rc=' "$WAIT_LOG" 2>/dev/null; then
  echo "=== gave up waiting for the 10M run after 5h ===" >&2
  exit 2
fi
echo "=== 10M pass A done: $(grep '^rc=' "$WAIT_LOG") $(date -u +%H:%M:%S) ==="

probe() { timeout 3 bash -c 'echo > /dev/tcp/127.0.0.1/8113' 2>/dev/null; }

FAILED=""
stage() {
  local name="$1" tmo="$2"; shift 2
  if ! probe; then echo "=== relay down before $name; continuing (retry inside tools) ==="; fi
  echo "=== stage: $name (timeout ${tmo}s) $(date -u +%H:%M:%S) ==="
  if ! timeout "$tmo" "$@" 2>&1 | tee "/tmp/q4_$name.log"; then
    echo "=== stage $name FAILED (log: /tmp/q4_$name.log) ==="
    FAILED="$FAILED $name"
  fi
}

# resume needs the SAME build config (BENCH_W=32) for the ckpt cfg match
stage reorder10m 9000 benches/retry_contact.sh 3 -- env BENCH_W=32 \
  BENCH_REORDER=1 BENCH_KEEP_CKPT=1 BENCH_OUT=results_10m_reorder.json \
  BENCH_PLAN="48:8:8192:;64:8:8192:;64:0:8192:;96:8:8192:256;128:8:8192:" \
  python benches/run_10m.py 10120192
stage bench100k3 2700 env BENCH_CHILD_TIMEOUT=1500 BENCH_CONTACT_RETRY_S=900 \
  python bench.py

if [ -n "$FAILED" ]; then
  echo "=== queue complete; FAILED stages:$FAILED ==="
  exit 1
fi
echo "=== queue complete ==="
