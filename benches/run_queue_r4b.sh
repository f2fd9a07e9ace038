#!/bin/bash
# Round-4 follow-up TPU queue (run after run_queue_r4.sh drains):
#   1. bench100k   — retry the supervised headline bench (stage 1 of r4
#                    burned its retry budget on a wedged relay).
#   2. w32_100k    — 100k probe at W=32: the packed span-32 kernel runs
#                    four queries per 128-lane row at ef<=32 — a per-step
#                    cost cut aimed at the 264k north star.
#   3. reorder2m   — BFS locality reorder A/B at 2M on one build.
set -o pipefail
cd "$(dirname "$0")/.."

probe() { timeout 3 bash -c 'echo > /dev/tcp/127.0.0.1/8113' 2>/dev/null; }
if ! probe; then echo "relay down; aborting" >&2; exit 2; fi

FAILED=""
stage() {
  local name="$1" tmo="$2"; shift 2
  echo "=== stage: $name (timeout ${tmo}s) $(date -u +%H:%M:%S) ==="
  if ! timeout "$tmo" "$@" 2>&1 | tee "/tmp/q4_$name.log"; then
    echo "=== stage $name FAILED (log: /tmp/q4_$name.log) ==="
    FAILED="$FAILED $name"
  fi
}

stage bench100k2 2700 env BENCH_CHILD_TIMEOUT=1500 BENCH_CONTACT_RETRY_S=900 python bench.py
stage w32_100k 2700 env BENCH_CHILD_TIMEOUT=1500 BENCH_CONTACT_RETRY_S=600 BENCH_W=32 python bench.py
stage reorder2m 7200 benches/retry_contact.sh 3 -- python benches/exp_reorder.py 2000000

if [ -n "$FAILED" ]; then
  echo "=== queue complete; FAILED stages:$FAILED ==="
  exit 1
fi
echo "=== queue complete ==="
