#!/bin/bash
# Round-4 TPU queue (VERDICT round 3 items 1-4):
#   1. bench100k  — the new SUPERVISED bench.py end-to-end (validates the
#                   in-process contact retry + device_qps/rtt_ms fields
#                   the driver will exercise at round end).
#   2. run10m_w32 — single-chip 10.12M on the W=32 copy-free layout
#                   (256-bit build steering mw=8 vs the stale artifact's
#                   mw=4), richer 8192-point entry samples, hop rerank.
#                   Target: beat the reference's 26.4k QPS @ recall>=0.93.
#   3. shard10m   — refresh the 16-shard flagship post-dispatch-fix (the
#                   committed per-shard timings still paid 2 RTTs each).
#   4. entryeq632 — entry-policy equivalence A/B at the REAL shard size
#                   (the committed table is n=100k; shards are 632,512).
# Stage logs: /tmp/q4_<name>.log (machine-local; results land in
# benches/*.json which get committed).
set -o pipefail
cd "$(dirname "$0")/.."

probe() { timeout 3 bash -c 'echo > /dev/tcp/127.0.0.1/8113' 2>/dev/null; }
if ! probe; then echo "relay down; aborting" >&2; exit 2; fi

FAILED=""
stage() {
  local name="$1" tmo="$2"; shift 2
  if ! probe; then echo "=== relay died before $name; continuing (retry inside tools) ==="; fi
  echo "=== stage: $name (timeout ${tmo}s) $(date -u +%H:%M:%S) ==="
  if ! timeout "$tmo" "$@" 2>&1 | tee "/tmp/q4_$name.log"; then
    echo "=== stage $name FAILED (log: /tmp/q4_$name.log) ==="
    FAILED="$FAILED $name"
  fi
}

stage bench100k 2400 env BENCH_CHILD_TIMEOUT=1200 BENCH_CONTACT_RETRY_S=600 python bench.py
stage run10m_w32 13500 benches/retry_contact.sh 3 -- env BENCH_W=32 \
  BENCH_PLAN="48:8:8192:;64:8:8192:;64:0:8192:;96:8:8192:256;128:8:8192:" \
  python benches/run_10m.py
stage shard10m 9000 benches/retry_contact.sh 3 -- env BENCH_EF=48,32 \
  python benches/run_sharded_10m.py
stage entryeq632 2700 benches/retry_contact.sh 2 -- \
  python benches/validate_entry_equiv.py 632512

if [ -n "$FAILED" ]; then
  echo "=== queue complete; FAILED stages:$FAILED ==="
  exit 1
fi
echo "=== queue complete ==="
