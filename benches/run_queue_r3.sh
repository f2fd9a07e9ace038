#!/bin/bash
# Round-3 TPU run queue — execute when the tunnel relay is back.
# Priority order (see docs/ROADMAP.md):
#   0. donation-aliasing probe (~2 min; its verdict decides whether the
#      single-chip 10M build keeps its inline rows — docs/SCALE.md)
#   1. 2M validation (new W=32/mw=31 policy + exact attribution + hop)
#   2. 16-shard exact 10.12M flagship
#   3. single-chip 10M (mini + hop sweep; resumable via BENCH_CKPT)
#   4. fresh 100k headline (bench.py defaults)
# Each stage logs to /tmp/q_<stage>.log. Stages are INDEPENDENT: a failed
# stage (e.g. the mini kernel's first hardware run hitting a Mosaic
# lowering bug) must not block the ones behind it — failures are
# collected and reported at the end. Re-probe the relay between stages:
# it can die mid-queue (observed 2026-08-17) and every later jax init
# would hang forever instead of failing.
set -o pipefail  # a stage's status must be the python's, not tee's
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

stage donation python benches/validate_donation.py
stage 2m    python benches/run_10m.py 2000000
stage shard python benches/run_sharded_10m.py
stage 10m   python benches/run_10m.py
stage bench python bench.py
# 1M refresh: the committed 77.3k QPS predates the packed kernel, the
# entry sort, and the scanned build (round-2 weak item)
stage bench1m env BENCH_N=1000000 python bench.py

if [ -n "$FAILED" ]; then
  echo "=== queue complete; FAILED stages:$FAILED ==="
  exit 1
fi
echo "=== queue complete ==="
