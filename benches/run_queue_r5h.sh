#!/bin/bash
# Round-5 queue, part H: final W=64@5M retry (the first attempt OOMed at
# upload into a post-crash leaked-HBM chip, before any compile ran).
# Longer settle; hard STOP_BY clamp so the driver bench gets the chip.
set -u
cd "$(dirname "$0")/.."
export HNSW_TPU_CONTACT_TIMEOUT=900

if [ -n "${WAIT_PID:-}" ]; then
  echo "# waiting for part G (pid $WAIT_PID)"
  while kill -0 "$WAIT_PID" 2>/dev/null; do sleep 60; done
fi

STOP_BY=${STOP_BY:-0}
now=$(date +%s)
if [ "$STOP_BY" -gt 0 ] && [ $((STOP_BY - now)) -lt 2700 ]; then
  echo "# <45min before STOP_BY — skipping the W=64@5M retry"
  exit 0
fi
budget=$((STOP_BY - $(date +%s) - 240))
echo "# W=64 5M retry ($(date -u)), budget ${budget}s"
HNSW_TPU_SPLIT_CHUNK=1 HNSW_TPU_SCAN_GROUP=1 BENCH_W=64 \
BENCH_CKPT=0 BENCH_EXACT_ATTRIB=0 BENCH_SETTLE=240 \
BENCH_OUT=results_5m_w64.json \
BENCH_PLAN="64:10:65536::1;64:8:65536::1;96:8:65536:256:1" \
timeout "$budget" python benches/run_10m.py 5000000 > /tmp/q_r5_w64b.log 2>&1
echo "# W=64 retry rc=$?"
echo "# queue H done ($(date -u))"
