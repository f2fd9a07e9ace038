#!/bin/bash
# Round-5 queue, part F: the W=64 graph-quality A/B, retried with the
# split-dispatch build (HNSW_TPU_SPLIT_CHUNK=1) after the fused program
# killed the compile helper twice (round 4, round-5 stage 4). Budget is
# clamped to STOP_BY so the driver's own bench gets the chip back.
set -u
cd "$(dirname "$0")/.."
N=10120192
export HNSW_TPU_CONTACT_TIMEOUT=900

if [ -n "${WAIT_PID:-}" ]; then
  echo "# waiting for part E (pid $WAIT_PID)"
  while kill -0 "$WAIT_PID" 2>/dev/null; do sleep 60; done
fi

STOP_BY=${STOP_BY:-0}
now=$(date +%s)
if [ "$STOP_BY" -gt 0 ] && [ $((STOP_BY - now)) -lt 5400 ]; then
  echo "# <90min before STOP_BY — skipping the W=64 retry"
  exit 0
fi
budget=13000
if [ "$STOP_BY" -gt 0 ]; then
  budget=$((STOP_BY - $(date +%s) - 300))
fi
echo "# stage 4b: W=64 A/B, split-dispatch build ($(date -u)), budget ${budget}s"
HNSW_TPU_SPLIT_CHUNK=1 HNSW_TPU_SCAN_GROUP=1 BENCH_W=64 \
BENCH_CKPT_TAG=w64 BENCH_KEEP_CKPT=0 BENCH_EXACT_ATTRIB=0 \
BENCH_SETTLE=120 BENCH_OUT=results_10m_w64.json \
BENCH_PLAN="64:10:65536::1;64:8:65536::1;96:8:65536:256:1" \
timeout "$budget" python benches/run_10m.py $N > /tmp/q_r5_s4b.log 2>&1
echo "# stage 4b rc=$?"
echo "# queue F done ($(date -u))"
