#!/bin/bash
# Run a TPU benchmark command, retrying when the relay wedges at device
# init (contact_watchdog exit code 3). The relay flaps: it can accept TCP
# yet hang device sessions for ~10 minutes at a stretch (observed
# 2026-08-20), then recover. Each attempt costs at most
# HNSW_TPU_CONTACT_TIMEOUT seconds (default 240 here) before the watchdog
# kills it; a short sleep between attempts lets the relay settle.
#
# Usage: benches/retry_contact.sh [max_attempts] -- <command...>
set -o pipefail
MAX=5
if [[ "$1" =~ ^[0-9]+$ ]]; then MAX=$1; shift; fi
[ "$1" = "--" ] && shift
if [ $# -lt 1 ]; then
  echo "usage: retry_contact.sh [max_attempts] -- <command...>" >&2
  exit 64
fi
export HNSW_TPU_CONTACT_TIMEOUT="${HNSW_TPU_CONTACT_TIMEOUT:-240}"
for ((i = 1; i <= MAX; i++)); do
  echo "=== attempt $i/$MAX: $*" >&2
  "$@"
  rc=$?
  if [ $rc -ne 3 ]; then exit $rc; fi
  echo "=== attempt $i wedged at device contact (rc=3); retrying" >&2
  sleep 45
done
echo "=== giving up after $MAX wedged attempts" >&2
exit 3
