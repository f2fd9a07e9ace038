#!/bin/bash
# Round-5 queue, part G: the W=64 graph-quality A/B at 5M — the fused
# AND split W=64 build programs at 10.12M capacity both kill the backend
# compile helper (stage 4, 4b), so the A/B runs at the largest scale the
# helper plausibly accepts, still deep in the coarse-estimate mini
# regime (>2.7M). Matched pair: same data, same query plan, W=64 vs
# W=32.
set -u
cd "$(dirname "$0")/.."
N=5000000
export HNSW_TPU_CONTACT_TIMEOUT=900

STOP_BY=${STOP_BY:-0}
for W in 64 32; do
  now=$(date +%s)
  if [ "$STOP_BY" -gt 0 ] && [ $((STOP_BY - now)) -lt 3000 ]; then
    echo "# <50min before STOP_BY — stopping before W=$W"
    break
  fi
  budget=5400
  if [ "$STOP_BY" -gt 0 ]; then
    budget=$((STOP_BY - $(date +%s) - 240))
  fi
  echo "# W=$W 5M leg ($(date -u)), budget ${budget}s"
  HNSW_TPU_SPLIT_CHUNK=1 HNSW_TPU_SCAN_GROUP=1 BENCH_W=$W \
  BENCH_CKPT=0 BENCH_EXACT_ATTRIB=0 BENCH_SETTLE=120 \
  BENCH_OUT=results_5m_w$W.json \
  BENCH_PLAN="64:10:65536::1;64:8:65536::1;96:8:65536:256:1" \
  timeout "$budget" python benches/run_10m.py $N > /tmp/q_r5_w$W.log 2>&1
  echo "# W=$W rc=$?"
done
echo "# queue G done ($(date -u))"
