#!/bin/bash
# Round-5 queue, part C (after part B): the tie-tolerant-recall
# re-measure of the 10M BFS-reorder A/B (the round-4/round-5 "reorder
# recall drop" is an oracle tie-break artifact at 20k — this pins it at
# 10M), the 1M re-runs that died to the backend HBM-cleanup race
# (BENCH_SETTLE), and the ef=96 old-kernel A/B (HNSW_TPU_PACKED=never)
# that turns the span-128 fused kernel's 68.1k QPS into a measured
# speedup factor.
set -u
cd "$(dirname "$0")/.."
N=10120192

probe() {
  python -c "
from hnsw_itu_tpu.utils.tunnel import relay_alive
import sys; sys.exit(0 if relay_alive() else 1)"
}

if [ -n "${WAIT_PID:-}" ]; then
  echo "# waiting for queue part B (pid $WAIT_PID)"
  while kill -0 "$WAIT_PID" 2>/dev/null; do sleep 60; done
fi

probe || { echo "relay dead before stage 3c"; exit 2; }

echo "# stage 3c: 10M reorder re-measure w/ tie-tolerant recall ($(date -u))"
BENCH_KEEP_CKPT=1 BENCH_W=32 BENCH_REORDER=1 BENCH_EXACT_ATTRIB=1 \
BENCH_SETTLE=120 BENCH_OUT=results_10m_reorder.json \
BENCH_PLAN="64:10:65536::1;64:8:65536::1;64:0:65536::1" \
timeout 7200 python benches/run_10m.py $N > /tmp/q_r5_s3c.log 2>&1
echo "# stage 3c rc=$?"

probe || { echo "relay dead before 1M re-runs"; exit 2; }

echo "# stage 5-redo: default + coarse 1M ($(date -u))"
for prof in default coarse; do
  BENCH_PROFILE=$prof BENCH_CKPT=0 BENCH_EXACT_ATTRIB=0 BENCH_SETTLE=180 \
  BENCH_OUT=results_1m_$prof.json \
  BENCH_PLAN="32:0:65536;48:0:65536;64:0:65536;96:0:65536" \
  timeout 3600 python benches/run_10m.py 1000000 > /tmp/q_r5_s5_$prof.log 2>&1
  echo "# stage 5-redo [$prof] rc=$?"
  probe || { echo "relay dead during 1M re-runs"; exit 2; }
done

echo "# stage 7: 1M ef=96 OLD-kernel A/B (HNSW_TPU_PACKED=never) ($(date -u))"
HNSW_TPU_PACKED=never BENCH_PROFILE=default BENCH_CKPT=0 \
BENCH_EXACT_ATTRIB=0 BENCH_SETTLE=180 BENCH_OUT=results_1m_ef96_never.json \
BENCH_PLAN="96:0:65536;128:0:65536" \
timeout 3600 python benches/run_10m.py 1000000 > /tmp/q_r5_s7.log 2>&1
echo "# stage 7 rc=$?"
echo "# queue C done ($(date -u))"
