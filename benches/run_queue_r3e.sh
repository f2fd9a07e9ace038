#!/bin/bash
# Round-3e TPU queue: (1) re-run the scanned-build A/B on post-
# dispatch-fix code (the 07:39/07:48 A/B predated 0758bb8, so its
# 1.96x may be stale); (2) ef=24 probe at 100k; (3) re-run the
# 16-shard 10.12M flagship — its per-shard query timings paid two
# blocking tunnel RTTs each before the lazy-result fixes.
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

stage scan1b env BENCH_N=500000 HNSW_TPU_SCAN_GROUP=1 python bench.py
stage scan8b env BENCH_N=500000 HNSW_TPU_SCAN_GROUP=8 python bench.py
stage ef24   env BENCH_EF=24 python bench.py
stage shard2 env BENCH_EF=48,32 python benches/run_sharded_10m.py

if [ -n "$FAILED" ]; then
  echo "=== queue complete; FAILED stages:$FAILED ==="
  exit 1
fi
echo "=== queue complete ==="
