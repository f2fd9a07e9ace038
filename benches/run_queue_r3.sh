#!/bin/bash
# Round-3 TPU run queue — execute when the tunnel relay is back.
# Priority order (see docs/ROADMAP.md):
#   1. 2M validation (new W=32/mw=31 policy + exact attribution + hop)
#   2. 16-shard exact 10.12M flagship
#   3. single-chip 10M (mini + hop sweep)
#   4. fresh 100k headline (bench.py defaults)
# Each stage logs to /tmp/q_<stage>.log; a stage failure stops the queue.
set -e
cd "$(dirname "$0")/.."

probe() { timeout 3 bash -c 'echo > /dev/tcp/127.0.0.1/8113' 2>/dev/null; }
if ! probe; then echo "relay down; aborting" >&2; exit 2; fi

echo "=== stage 1: 2M validation ==="
python benches/run_10m.py 2000000 2>&1 | tee /tmp/q_2m.log
echo "=== stage 2: sharded 10.12M ==="
python benches/run_sharded_10m.py 2>&1 | tee /tmp/q_shard.log
echo "=== stage 3: single-chip 10M ==="
python benches/run_10m.py 2>&1 | tee /tmp/q_10m.log
echo "=== stage 4: 100k headline ==="
python bench.py 2>&1 | tee /tmp/q_bench.log
echo "=== queue complete ==="
