#!/bin/bash
# Round-3b TPU run queue — execute after the single-chip 10M run frees
# the chip (the TPU is single-claim; launching earlier just blocks).
# Priority order (docs/ROADMAP.md "Known gaps"):
#   1. query-batch overhead decomposition at 100k (kernel vs entry
#      sample / sort+unsort / tunnel RTT) — locates the ~34ms of the
#      60ms/8192-query batch that is NOT the fused kernel
#   2. W=32 100k probe: span-32 four-queries-per-row kernel at ef=32
#      (bench.py BENCH_W=32) vs the committed 136.7k W=64 headline
#   3. span comparison at W=32: packed span 32 (auto) vs pinned 64
#      via HNSW_TPU_BLOCK_Q sweep is NOT needed — same block size works
#      for both; exp_overhead variants cover the rest
# Stages are INDEPENDENT; failures collected. Relay re-probed between
# stages (it can die mid-queue; later jax inits would hang forever).
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

stage overhead python benches/exp_overhead.py
stage w32     env BENCH_W=32 python bench.py
# one build pass, queried at ef 48 AND 32: ef=48 already measured 0.9995
# recall — if ef=32 holds the gate the projected-mesh QPS jumps ~1.5x
stage shardef env BENCH_EF=48,32 python benches/run_sharded_10m.py
# scanned-build wall-clock A/B at 500k (ROADMAP gap 2: grouped dispatch
# is gated OFF at >=1M, so 500k is the largest size that exercises it)
stage scan1  env BENCH_N=500000 HNSW_TPU_SCAN_GROUP=1 python bench.py
stage scan8  env BENCH_N=500000 HNSW_TPU_SCAN_GROUP=8 python bench.py

if [ -n "$FAILED" ]; then
  echo "=== queue complete; FAILED stages:$FAILED ==="
  exit 1
fi
echo "=== queue complete ==="
