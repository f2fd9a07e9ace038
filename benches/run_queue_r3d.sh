#!/bin/bash
# Round-3d TPU queue: refresh the headline numbers on the post-
# dispatch-fix code (identity-slice skip, cached scalars, one-dispatch
# 10k-query bench), confirm the overhead decomposition closed, then the
# 1M refresh.
set -o pipefail
cd "$(dirname "$0")/.."

probe() { timeout 3 bash -c 'echo > /dev/tcp/127.0.0.1/8113' 2>/dev/null; }
if ! probe; then echo "relay down; aborting" >&2; exit 2; fi

FAILED=""
stage() {
  local name="$1"; shift
  if ! probe; then echo "=== relay died before $name; stopping ==="; exit 3; fi
  echo "=== stage: $name ==="
  if ! "$@" 2>&1 | tee "/tmp/q_$name.log"; then
    echo "=== stage $name FAILED (log: /tmp/q_$name.log) ==="
    FAILED="$FAILED $name"
  fi
}

stage bench100k python bench.py
stage overhead2 python benches/exp_overhead.py
stage bench1m  env BENCH_N=1000000 BENCH_EF=32 BENCH_EF_SWEEP=48 python bench.py

if [ -n "$FAILED" ]; then
  echo "=== queue complete; FAILED stages:$FAILED ==="
  exit 1
fi
echo "=== queue complete ==="
