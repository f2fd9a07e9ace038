#!/bin/bash
# Round-5 queue, part E (replaces part D): W=64 A/B, the 1M default/
# coarse redos (first attempts died to the 420s contact watchdog — the
# backend takes ~350s to re-init after a heavy session, so stages here
# run with HNSW_TPU_CONTACT_TIMEOUT=900), and the clock-guarded 10M tail
# spot check.
set -u
cd "$(dirname "$0")/.."
N=10120192
export HNSW_TPU_CONTACT_TIMEOUT=900

probe() {
  python -c "
from hnsw_itu_tpu.utils.tunnel import relay_alive
import sys; sys.exit(0 if relay_alive() else 1)"
}

if [ -n "${WAIT_PID:-}" ]; then
  echo "# waiting for part C (pid $WAIT_PID)"
  while kill -0 "$WAIT_PID" 2>/dev/null; do sleep 60; done
fi

STOP_BY=${STOP_BY:-0}

echo "# 1M redos: default + coarse ($(date -u))"
for prof in default coarse; do
  BENCH_PROFILE=$prof BENCH_CKPT=0 BENCH_EXACT_ATTRIB=0 BENCH_SETTLE=120 \
  BENCH_OUT=results_1m_$prof.json \
  BENCH_PLAN="32:0:65536;48:0:65536;64:0:65536;96:0:65536" \
  timeout 3600 python benches/run_10m.py 1000000 > /tmp/q_r5_s5_$prof.log 2>&1
  echo "# 1M redo [$prof] rc=$?"
  probe || { echo "relay dead during 1M redos"; exit 2; }
done

now=$(date +%s)
if [ "$STOP_BY" -gt 0 ] && [ $((STOP_BY - now)) -lt 7800 ]; then
  echo "# <2.2h before STOP_BY — skipping the W=64 build"
else
  probe || { echo "relay dead before stage 4"; exit 2; }
  echo "# stage 4: W=64 A/B build ($(date -u))"
  budget=13000
  if [ "$STOP_BY" -gt 0 ]; then
    budget=$((STOP_BY - $(date +%s) - 600))
  fi
  HNSW_TPU_SCAN_GROUP=1 BENCH_W=64 BENCH_CKPT_TAG=w64 BENCH_KEEP_CKPT=0 \
  BENCH_EXACT_ATTRIB=1 BENCH_SETTLE=120 BENCH_OUT=results_10m_w64.json \
  BENCH_PLAN="64:10:65536::1;64:8:65536::1;96:8:65536:256:1;64:0:65536::1" \
  timeout "$budget" python benches/run_10m.py $N > /tmp/q_r5_s4.log 2>&1
  echo "# stage 4 rc=$?"
fi

now=$(date +%s)
if [ "$STOP_BY" -gt 0 ] && [ $((STOP_BY - now)) -lt 5400 ]; then
  echo "# <90min left — skipping the 10M tail spot check"
else
  probe || { echo "relay dead before stage 6"; exit 2; }
  echo "# stage 6: 10M tail-profile spot check ($(date -u))"
  budget=10800
  if [ "$STOP_BY" -gt 0 ]; then
    budget=$((STOP_BY - $(date +%s) - 600))
  fi
  BENCH_PROFILE=tail BENCH_W=32 BENCH_KEEP_CKPT=0 BENCH_EXACT_ATTRIB=1 \
  BENCH_SETTLE=120 BENCH_OUT=results_10m_tail.json \
  BENCH_PLAN="64:10:65536::1;64:8:65536::8;64:12:65536::1" \
  timeout "$budget" python benches/run_10m.py $N > /tmp/q_r5_s6.log 2>&1
  echo "# stage 6 rc=$?"
fi
echo "# queue E done ($(date -u))"
