"""Headline benchmark: batched HNSW query throughput at recall@10 gate.

Reference baseline (BASELINE.md): 26.4k QPS at recall@10 = 0.9336 on the 10M
laion2B hamming dataset, 16-thread CPU (ef=64, efc=96, m=24, M=256). The
LAION data is not available in this environment, so the benchmark runs on
synthetic 1024-bit sketches with perturbed-point queries, measures exact
recall against the MXU brute-force oracle, and reports batched QPS on one
TPU chip. Prints ONE JSON line:
  {"metric": ..., "value": QPS, "unit": "qps", "vs_baseline": QPS/26400, ...}
plus tunnel-decomposition fields: "device_qps" (dispatch-train slope — the
on-chip rate with the ~25 ms relay RTT excluded, benches/exp_deviceonly.py
method) and "rtt_ms" (measured 1-row fetch round trip).

The run is SUPERVISED against the two observed relay death modes (tunnel.py):
an outright-dead relay (fast rc=2) and a wedged backend behind a live TCP
port (contact watchdog rc=3, or a mid-run hang killed at BENCH_CHILD_TIMEOUT).
The supervisor re-launches the benchmark child with backoff until the
contact-retry budget (default 15 min) runs out — a transient relay wedge
(BENCH_r03 died this way) costs a retry, not the round's number.

The recall gate is ENFORCED: recall@10 < 0.93 prints an error JSON and exits
nonzero instead of reporting a healthy-looking QPS.

Scale knobs via env: BENCH_N (default 100_000), BENCH_Q (default 10_000).
"""

import json
import os
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.abspath(__file__)))

import numpy as np

RECALL_GATE = 0.93


def supervise() -> int:
    """Re-run this script as a child and retry device-contact failures.

    rc 2 (relay TCP-dead) and rc 3 (backend wedged behind a live port) are
    transient tunnel states — observed to clear within minutes when the
    relay restarts — so they are retried with backoff while the budget
    lasts. Any other nonzero rc (real failure, e.g. the recall gate) is
    final. A child that exceeds BENCH_CHILD_TIMEOUT (mid-run relay death
    hangs jax forever at the next fetch) is killed and counted as rc 3.
    """
    import subprocess

    budget = float(os.environ.get("BENCH_CONTACT_RETRY_S", 900))
    child_cap = float(os.environ.get("BENCH_CHILD_TIMEOUT", 2700))
    deadline = time.monotonic() + budget
    env = dict(os.environ, HNSW_BENCH_CHILD="1")
    attempt = 0
    while True:
        attempt += 1
        proc = subprocess.Popen([sys.executable] + sys.argv, env=env)
        try:
            rc = proc.wait(timeout=child_cap)
        except subprocess.TimeoutExpired:
            proc.kill()
            proc.wait()
            print(f"# bench child exceeded {child_cap:.0f}s (mid-run relay "
                  "hang?) — killed", file=sys.stderr, flush=True)
            rc = 3
        if rc not in (2, 3):
            return rc  # success, or a real (non-tunnel) failure
        remaining = deadline - time.monotonic()
        if remaining <= 0:
            print(f"# giving up after {attempt} attempts: device contact "
                  "budget exhausted", file=sys.stderr, flush=True)
            return rc
        sleep = min(120.0, 20.0 * attempt, max(1.0, remaining))
        print(f"# attempt {attempt} failed with rc={rc}; retrying in "
              f"{sleep:.0f}s ({remaining:.0f}s of retry budget left)",
              file=sys.stderr, flush=True)
        time.sleep(sleep)


def main():
    from hnsw_itu_tpu.utils.compile_cache import enable as enable_compile_cache
    from hnsw_itu_tpu.utils.tunnel import require_device

    enable_compile_cache()
    require_device()  # dead relay = infinite hang at first device contact
    t_start = time.perf_counter()
    N = int(os.environ.get("BENCH_N", 100_000))
    # 10k queries = the reference benchmark's own query count
    # (README.md:181). One padded batch — since knns stopped fetching per
    # batch, everything pipelines on device and the ~25ms tunnel RTT is
    # paid once, not per batch.
    NQ = int(os.environ.get("BENCH_Q", 10_000))
    record = run_scale(N, NQ, t_start)
    gate_fail = "error" in record
    print(json.dumps(record), flush=True)
    # second leg (VERDICT r4 item 7): a driver-verified 1M record — the
    # scale where the fused-table path still builds+queries within the
    # driver budget and the 10x-baseline claim holds. Failures here are
    # reported to stderr only, so the first leg's JSON line stays the
    # last (parsed) one; when it succeeds, ITS line is last and carries
    # the bigger scale. BENCH_SECOND_N=0 disables.
    n2 = int(os.environ.get("BENCH_SECOND_N", 1_000_000))
    if n2 and n2 != N and not gate_fail:
        try:
            rec2 = run_scale(n2, NQ, t_start)
        except Exception as exc:
            print(f"# second-scale leg (n={n2}) failed: {exc}",
                  file=sys.stderr, flush=True)
            rec2 = None
        if rec2 is not None and "error" not in rec2:
            print(json.dumps(rec2), flush=True)
        elif rec2 is not None:
            print(f"# second-scale leg below gate: {rec2}",
                  file=sys.stderr, flush=True)
    if gate_fail:
        sys.exit(4)


def run_scale(N, NQ, t_start):
    K = 10
    # ef=32 with a hard step cap of 32 holds recall@10 ~0.993 on this data
    # (>= 0.93 gate with 6 points of margin) at the best measured QPS
    # (benches/exp_r3e.py sweep: 126.9k vs 102.9k at ef=48/cap=48); at
    # BENCH_N > 200k the cap reverts to the auto 2*ef (a hard ef cap costs
    # ~2.3 recall points at 1M, measured round 2)
    EF = int(os.environ.get("BENCH_EF", 32))
    # BENCH_CAP: step cap override; parsed once, 0 = explicit auto (2*ef),
    # unset = ef for <=200k else auto (the measured knee, exp_r3e.py)
    CAP_ENV = os.environ.get("BENCH_CAP")
    CAP_ENV = int(CAP_ENV) if CAP_ENV not in (None, "") else None

    def cap_for(ef):
        if CAP_ENV is not None:
            return CAP_ENV if CAP_ENV > 0 else None
        return ef if N <= 200_000 else None

    from hnsw_itu_tpu.models import Bruteforce, IndexOptions
    from hnsw_itu_tpu.models.hnsw import HNSWBuilder
    from hnsw_itu_tpu.utils import recall_at_k

    # Multi-scale clustered sketches (the navigable LAION proxy — see
    # hnsw_itu_tpu/utils/synth.py for the round-3 flat-vs-hierarchical
    # measurement that forced this): in-cluster distance ~151 bits,
    # leaf count N//128.
    from hnsw_itu_tpu.utils.synth import make_dataset

    pts, qs = make_dataset(0, N, NQ)

    # establish the device session before timing anything: on the remote
    # tunnel, backend init + the first host->device DMA cost 1-3 minutes
    # (measured 177s for a first 13MB upload vs 0.6s for the next 26MB)
    import jax.numpy as _jnp

    from hnsw_itu_tpu.utils.tunnel import contact_watchdog

    _disarm = contact_watchdog()
    np.asarray(_jnp.asarray(np.ones((4096, 128), np.uint32)) + 1)
    _disarm()
    print(f"# device session up at {time.perf_counter()-t_start:.0f}s",
          file=sys.stderr)

    # exact ground truth on the MXU — BEFORE the index exists: build()
    # materializes the fused/inline query table (~8.9GB at 1M), and the
    # oracle's bit tables alongside it OOM the chip (round-3 bench1m)
    t0 = time.perf_counter()
    bf = Bruteforce("hamming")
    bf.extend(pts)
    gt_ids = np.asarray(bf.build().knns(qs, K).ids)
    del bf  # free the oracle's device tables before the index allocates
    import gc

    gc.collect()
    print(f"# ground truth: {time.perf_counter()-t0:.1f}s", file=sys.stderr)

    # BENCH_W: max degree (64 default). 32 halves the fused-table row AND
    # enables the four-queries-per-row span-32 kernel at ef<=32
    # (ops/pallas_search.py); costs ~1-2 recall points vs W=64 (2M probe:
    # 0.9789 vs 0.9824 exact-path at ef=64).
    W = int(os.environ.get("BENCH_W", 64))
    opts = IndexOptions(
        ef_construction=96,
        connections=24,
        max_connections=W,
        size=N,
        batch_size=256,
        host_warmup=min(50_000, N),
    )
    t0 = time.perf_counter()
    b = HNSWBuilder(opts, metric="hamming")
    b.extend_batched(pts)
    index = b.build()
    build_s = time.perf_counter() - t0
    print(f"# build: {build_s:.1f}s ({build_s/N*1e6:.1f} us/pt), "
          f"levels={index.level_ns}", file=sys.stderr)

    # timed query runs (first run includes compile; take best of 2 after).
    # One batch for all NQ queries (padded to a 512 block multiple): a
    # single kernel dispatch replaces the 8192+1808 split — fewer eager
    # device ops (each ~3ms of tunnel time, benches/exp_overhead.py) and
    # no concat of partial results.
    index.query_batch = max(8192, -(-NQ // 512) * 512)
    index.query_entry_sample = 1024
    index.enable_inline()
    import jax.numpy as jnp

    qs_dev = jnp.asarray(qs)  # stage queries on device once (tunnel hop)

    def run_ef(ef):
        index.max_steps = cap_for(ef)  # None = auto (2*ef)
        # compile warmup
        np.asarray(index.knns(qs_dev, K, ef).ids[:1])
        best = float("inf")
        for _ in range(2):
            t0 = time.perf_counter()
            res = index.knns(qs_dev, K, ef)
            # knns keeps results on device; the 1-row fetch is the sync
            # point (full-array transfer is ~1ms/100KB of tunnel time and
            # not part of the search, like the reference's result writing)
            np.asarray(res.ids[:1])
            best = min(best, time.perf_counter() - t0)
        rec = recall_at_k(np.asarray(res.ids), gt_ids, K)
        print(f"# query ef={ef}: {best:.3f}s for {NQ} queries, "
              f"recall@10={rec:.4f}, "
              f"visited/q={index.last_stats['visited']/NQ:.0f}",
              file=sys.stderr)
        return best, rec

    # optional extra ef points (comma-separated) recorded to stderr only
    for ef_x in os.environ.get("BENCH_EF_SWEEP", "").split(","):
        if ef_x.strip():
            run_ef(int(ef_x))
    best, recall = run_ef(EF)
    qps = NQ / best

    # tunnel decomposition at the headline config: the measured QPS pays
    # the relay RTT (a deployment artifact — production serving drives the
    # chip locally). device_qps isolates the on-chip rate by dispatch-train
    # slope: (T(1+S trains) - T(1)) / S cancels RTT + the final fetch.
    def train(reps):
        best_t = float("inf")
        for _ in range(3):
            t0 = time.perf_counter()
            last = None
            for _ in range(reps):
                last = index.knns(qs_dev, K, EF)
            np.asarray(last.ids[:1])
            best_t = min(best_t, time.perf_counter() - t0)
        return best_t

    S = 6
    dev_s = (train(1 + S) - train(1)) / S
    device_qps = NQ / dev_s
    rtt = min(
        _timeit(lambda: np.asarray(index.base.deg[:1])) for _ in range(3)
    )
    print(f"# device-only: {device_qps:.0f} qps ({dev_s*1e3:.1f} ms/10k), "
          f"rtt {rtt*1e3:.1f} ms", file=sys.stderr)
    print(f"# total bench time {time.perf_counter()-t_start:.0f}s",
          file=sys.stderr)

    record = {
        "metric": f"HNSW batched QPS (k={K}, ef={EF}, n={N}, synthetic "
                  f"1024-bit sketches, recall gate)",
        "value": round(qps, 1),
        "unit": "qps",
        "vs_baseline": round(qps / 26_400, 3),
        "recall_at_10": round(recall, 4),
        "build_seconds": round(build_s, 1),
        "n_points": N,
        "n_queries": NQ,
        # on-chip rate, relay RTT excluded (dispatch-train slope). NOT
        # comparable to vs_baseline's end-to-end denominator — labeled so
        # the caveat travels with the number (ADVICE round 3).
        "device_qps": round(device_qps, 1),
        "device_qps_rtt_excluded": True,
        "rtt_ms": round(rtt * 1e3, 2),
    }
    if recall < RECALL_GATE:
        record["error"] = (f"recall@10 {recall:.4f} below the {RECALL_GATE} "
                           "gate — QPS void")
    # free this scale's device tables (fused table + points + graph)
    # before a second-scale leg allocates its own
    del index, b
    gc.collect()
    return record


def _timeit(fn) -> float:
    t0 = time.perf_counter()
    fn()
    return time.perf_counter() - t0


if __name__ == "__main__":
    if os.environ.get("HNSW_BENCH_CHILD") == "1":
        main()
    else:
        sys.exit(supervise())
