#!/bin/bash
# Round-5 queue, part B (replaces run_queue_r5.sh stages after stage 3):
# stage 2b re-runs the multi-seed sweep with the iterative-argmin top-B
# entry (the lax.top_k formulation OOMed HBM / killed the compile helper
# at [10k, 65536] — see ops/entry.py), plus the ef=96 span-128 probes
# stage 2 never reached. Then robustness (1M x 4 profiles), the W=64
# A/B, and the 10M tail spot check, as in part A.
set -u
cd "$(dirname "$0")/.."
N=10120192

probe() {
  python -c "
from hnsw_itu_tpu.utils.tunnel import relay_alive
import sys; sys.exit(0 if relay_alive() else 1)"
}

# part A was killed mid-stage-5 (its default-profile 1M run keeps
# running); wait for it, then run the remaining profiles first
if [ -n "${WAIT_PID:-}" ]; then
  echo "# waiting for running stage-5 python (pid $WAIT_PID)"
  while kill -0 "$WAIT_PID" 2>/dev/null; do sleep 30; done
fi

probe || { echo "relay dead before stage 5-rest"; exit 2; }

echo "# stage 5 (rest): fine/coarse/tail 1M ($(date -u))"
for prof in fine coarse tail; do
  BENCH_PROFILE=$prof BENCH_CKPT=0 BENCH_EXACT_ATTRIB=0 \
  BENCH_OUT=results_1m_$prof.json \
  BENCH_PLAN="32:0:65536;48:0:65536;64:0:65536;96:0:65536" \
  timeout 3600 python benches/run_10m.py 1000000 > /tmp/q_r5_s5_$prof.log 2>&1
  echo "# stage 5 [$prof] rc=$?"
  probe || { echo "relay dead during stage 5"; exit 2; }
done

probe || { echo "relay dead before stage 2b"; exit 2; }

echo "# stage 2b: multi-seed (argmin top-B) + span128 sweep ($(date -u))"
BENCH_KEEP_CKPT=1 BENCH_W=32 BENCH_EXACT_ATTRIB=0 \
BENCH_OUT=results_10m_beams.json \
BENCH_PLAN="64:10:65536::4;64:10:65536::8;64:10:65536::16;64:8:65536::8;64:4:65536::8;64:0:65536::8;96:8:65536:256:1;96:0:65536:256:8;64:10:65536::1" \
timeout 7200 python benches/run_10m.py $N > /tmp/q_r5_s2b.log 2>&1
echo "# stage 2b rc=$?"

echo "# stage 4: W=64 A/B build ($(date -u))"
HNSW_TPU_SCAN_GROUP=1 BENCH_W=64 BENCH_CKPT_TAG=w64 BENCH_KEEP_CKPT=0 \
BENCH_EXACT_ATTRIB=1 BENCH_OUT=results_10m_w64.json \
BENCH_PLAN="64:10:65536::1;64:8:65536::1;64:10:65536::8;64:0:65536::1;96:8:65536:256:1" \
timeout 14400 python benches/run_10m.py $N > /tmp/q_r5_s4.log 2>&1
echo "# stage 4 rc=$?"

probe || { echo "relay dead before stage 6"; exit 2; }

echo "# stage 6: 10M tail-profile spot check ($(date -u))"
BENCH_PROFILE=tail BENCH_W=32 BENCH_KEEP_CKPT=0 BENCH_EXACT_ATTRIB=1 \
BENCH_OUT=results_10m_tail.json \
BENCH_PLAN="64:10:65536::1;64:8:65536::8;64:12:65536::1" \
timeout 10800 python benches/run_10m.py $N > /tmp/q_r5_s6.log 2>&1
echo "# stage 6 rc=$?"
echo "# queue B done ($(date -u))"
