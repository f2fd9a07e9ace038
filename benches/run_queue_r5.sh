#!/bin/bash
# Round-5 TPU queue (see VERDICT.md round-4 "Next round"): runs after the
# stage-1 W=32 10.12M build (launched separately with BENCH_KEEP_CKPT=1)
# finishes, reusing its checkpoint for the query-side A/Bs.
#
#   stage 2  multi-seed entry sweep (beams 1/4/8/16) + ef=96 span-128 probe
#   stage 3  BFS-reorder A/B with bit-reversed tie keys (the +27% QPS fix)
#   stage 4  W=64 graph-quality A/B (scan_group=1 shrinks the insert
#            program that killed the backend compile helper in round 4)
#
# Each stage logs to /tmp/q_r5_*.log and writes its own results artifact;
# the kept checkpoint ckpt_10120192.npz is never overwritten by stage 4
# (BENCH_CKPT_TAG=w64). Launch: nohup bash benches/run_queue_r5.sh &
set -u
cd "$(dirname "$0")/.."
N=10120192

probe() {
  python -c "
from hnsw_itu_tpu.utils.tunnel import relay_alive
import sys; sys.exit(0 if relay_alive() else 1)"
}

wait_pid() {
  # wait for an unrelated pid (the stage-1 build) to exit
  while kill -0 "$1" 2>/dev/null; do sleep 60; done
}

if [ -f /tmp/r5/s1.pid ]; then
  echo "# waiting for stage 1 (pid $(cat /tmp/r5/s1.pid))"
  wait_pid "$(cat /tmp/r5/s1.pid)"
fi

probe || { echo "relay dead before stage 2"; exit 2; }

echo "# stage 2: multi-seed + span128 sweep ($(date -u))"
BENCH_KEEP_CKPT=1 BENCH_W=32 BENCH_EXACT_ATTRIB=0 \
BENCH_OUT=results_10m_beams.json \
BENCH_PLAN="64:10:65536::1;64:10:65536::4;64:10:65536::8;64:10:65536::16;64:8:65536::8;64:4:65536::8;64:0:65536::8;96:8:65536:256:1;96:8:65536:256:8" \
timeout 7200 python benches/run_10m.py $N > /tmp/q_r5_s2.log 2>&1
echo "# stage 2 rc=$?"

probe || { echo "relay dead before stage 3"; exit 2; }

echo "# stage 3: reorder + bitrev-tie A/B ($(date -u))"
BENCH_KEEP_CKPT=1 BENCH_W=32 BENCH_REORDER=1 BENCH_EXACT_ATTRIB=1 \
BENCH_OUT=results_10m_reorder.json \
BENCH_PLAN="64:10:65536::1;64:8:65536::1;64:0:65536::1;64:10:65536::8;64:8:65536::8" \
timeout 7200 python benches/run_10m.py $N > /tmp/q_r5_s3.log 2>&1
echo "# stage 3 rc=$?"

probe || { echo "relay dead before stage 5"; exit 2; }

echo "# stage 5: distribution-robustness 1M sweep ($(date -u))"
for prof in default fine coarse tail; do
  BENCH_PROFILE=$prof BENCH_CKPT=0 BENCH_EXACT_ATTRIB=0 \
  BENCH_OUT=results_1m_$prof.json \
  BENCH_PLAN="32:0:65536;48:0:65536;64:0:65536;96:0:65536" \
  timeout 3600 python benches/run_10m.py 1000000 > /tmp/q_r5_s5_$prof.log 2>&1
  echo "# stage 5 [$prof] rc=$?"
  probe || { echo "relay dead during stage 5"; exit 2; }
done

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
echo "# queue done ($(date -u))"
