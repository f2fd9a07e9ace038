#!/bin/bash
# Round-3c resume queue: the r3b queue died at shardef shard 14/16
# (session relay stall 2026-08-19 05:34). run_sharded_10m.py resumes
# from its per-shard checkpoint; then the scanned-build A/B at 500k.
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

stage shardef env BENCH_EF=48,32 python benches/run_sharded_10m.py
stage scan1  env BENCH_N=500000 HNSW_TPU_SCAN_GROUP=1 python bench.py
stage scan8  env BENCH_N=500000 HNSW_TPU_SCAN_GROUP=8 python bench.py

if [ -n "$FAILED" ]; then
  echo "=== queue complete; FAILED stages:$FAILED ==="
  exit 1
fi
echo "=== queue complete ==="
