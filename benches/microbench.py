"""Per-kernel microbenchmarks — the criterion-benches analogue.

Parity target: /root/reference/cli/benches/ (distance/bench.rs: scalar vs
AVX2 vs portable-SIMD Hamming; set/{insert,contains}.rs: HashSet vs BitSet
vs GenerationSet). The TPU equivalents measured here:

  distance   — Hamming XOR+popcount: host C++ scalar, XLA VPU one-to-many,
               MXU bit-matmul pairwise, Pallas hamming_block tile
  beam-step  — one lockstep search step: XLA packed two-sort path vs the
               fused Pallas kernel (ops/pallas_search.py)
  dedup      — visited bitmask vs beam-merge dedup vs fused-kernel dedup
               (whole-search rate on one graph)

Run on the TPU: ``python benches/microbench.py [name ...]``. Results are
appended as JSON lines to benches/results.jsonl and summarized in
benches/RESULTS.md (committed numbers, like criterion's saved baselines).
"""

from __future__ import annotations

import json
import os
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

import numpy as np

RESULTS = os.path.join(os.path.dirname(os.path.abspath(__file__)),
                       "results.jsonl")


def _time(fn, *, reps=5, warmup=1):
    for _ in range(warmup):
        fn()
    best = float("inf")
    for _ in range(reps):
        t0 = time.perf_counter()
        fn()
        best = min(best, time.perf_counter() - t0)
    return best


def _emit(rec):
    rec["ts"] = time.strftime("%Y-%m-%dT%H:%M:%S")
    with open(RESULTS, "a") as f:
        f.write(json.dumps(rec) + "\n")
    print(json.dumps(rec))


def bench_distance():
    import jax
    import jax.numpy as jnp

    from hnsw_itu_tpu import native
    from hnsw_itu_tpu.ops.metrics import get_metric
    from hnsw_itu_tpu.ops.pallas_hamming import hamming_block

    rng = np.random.default_rng(0)
    metric = get_metric("hamming")
    M = N = 2048
    a = rng.integers(0, 2**32, size=(M, 32), dtype=np.uint32)
    b = rng.integers(0, 2**32, size=(N, 32), dtype=np.uint32)
    pairs = M * N

    # host scalar (the reference's live impl, sketch.rs:19-29)
    t = _time(lambda: native.host_bruteforce(a, "hamming", b[:64], 10),
              reps=3)
    _emit({"bench": "distance/host_scalar_bruteforce", "pairs": M * 64,
           "secs": t, "gpairs_per_s": M * 64 / t / 1e9})

    aj, bj = jnp.asarray(a), jnp.asarray(b)

    # XLA VPU broadcast path (reduce on device: a [M,N] fetch would time
    # the tunnel, not the kernel)
    f = jax.jit(lambda x, y: jnp.sum(metric.pairwise(x, y)))
    np.asarray(f(aj[:256], bj))
    t = _time(lambda: np.asarray(f(aj[:256], bj)))
    _emit({"bench": "distance/xla_vpu_pairwise", "pairs": 256 * N,
           "secs": t, "gpairs_per_s": 256 * N / t / 1e9})

    # MXU bit-matmul identity
    f = jax.jit(lambda x, y: jnp.sum(metric.pairwise_mxu(x, y)))
    np.asarray(f(aj, bj))
    t = _time(lambda: np.asarray(f(aj, bj)))
    _emit({"bench": "distance/mxu_pairwise", "pairs": pairs, "secs": t,
           "gpairs_per_s": pairs / t / 1e9})

    # Pallas VPU tile kernel (skipped off-TPU or on kernel failure)
    try:
        f = jax.jit(lambda x, y: jnp.sum(hamming_block(x, y)))
        np.asarray(f(aj, bj))
        t = _time(lambda: np.asarray(f(aj, bj)))
        _emit({"bench": "distance/pallas_block", "pairs": pairs, "secs": t,
               "gpairs_per_s": pairs / t / 1e9})
    except Exception as e:  # pragma: no cover
        print(f"# pallas_block skipped: {type(e).__name__}", file=sys.stderr)


def bench_beam_step():
    import jax
    import jax.numpy as jnp

    from hnsw_itu_tpu.ops.pallas_search import (
        fused_beam_search, materialize_fused,
    )
    from hnsw_itu_tpu.ops.search import batched_beam_search
    from hnsw_itu_tpu.ops.metrics import get_metric

    N, W, WORDS, EF, B, STEPS = 100_000, 64, 32, 48, 8192, 48
    rng = np.random.default_rng(0)
    pts = rng.integers(0, 2**32, size=(N, WORDS), dtype=np.uint32)
    adj = rng.integers(0, N, size=(N, W), dtype=np.int32)
    qs = rng.integers(0, 2**32, size=(B, WORDS), dtype=np.uint32)
    id_bits = (N - 1).bit_length()
    metric = get_metric("hamming")
    pts_j, adj_j, qs_j = jnp.asarray(pts), jnp.asarray(adj), jnp.asarray(qs)

    # worst case: random graph never converges -> every query runs STEPS
    table = materialize_fused(pts_j, adj_j)
    d0 = jnp.sum(jax.lax.population_count(qs_j ^ pts_j[0][None]),
                 axis=1).astype(jnp.int32)
    init = (d0 << id_bits) | 0

    def run_fused(extra):
        k, v, s = fused_beam_search(
            table, qs_j, init + extra, ef=EF, W=W, words=WORDS,
            id_bits=id_bits, max_d=WORDS * 32, max_steps=STEPS, block_q=512)
        return int(np.asarray(v).sum())

    run_fused(0)
    t = _time(lambda: run_fused(1))
    _emit({"bench": "beam/fused_pallas", "queries": B, "steps": STEPS,
           "secs": t, "qstep_per_s": B * STEPS / t,
           "ns_per_query_step": t / (B * STEPS) * 1e9})

    adj_pts = None  # XLA packed path without inline rows is the fair base
    def run_xla(extra):
        r = jax.jit(lambda p, a, q, e: batched_beam_search(
            lambda ids: p[ids], a, q, e,
            ef=EF, metric=metric, capacity=N, expand=1, max_steps=STEPS,
            dedup="beam"))(pts_j, adj_j, qs_j,
                           jnp.zeros((B,), jnp.int32) + extra)
        return int(np.asarray(r.visited).sum())

    run_xla(0)
    t = _time(lambda: run_xla(0), reps=2)
    _emit({"bench": "beam/xla_packed", "queries": B, "steps": STEPS,
           "secs": t, "qstep_per_s": B * STEPS / t,
           "ns_per_query_step": t / (B * STEPS) * 1e9})


def bench_dedup():
    import jax
    import jax.numpy as jnp

    from hnsw_itu_tpu.ops.search import batched_beam_search
    from hnsw_itu_tpu.ops.metrics import get_metric

    N, W, WORDS, EF, B, STEPS = 100_000, 64, 32, 48, 4096, 48
    rng = np.random.default_rng(0)
    pts = rng.integers(0, 2**32, size=(N, WORDS), dtype=np.uint32)
    adj = rng.integers(0, N, size=(N, W), dtype=np.int32)
    qs = rng.integers(0, 2**32, size=(B, WORDS), dtype=np.uint32)
    metric = get_metric("hamming")
    pts_j, adj_j, qs_j = jnp.asarray(pts), jnp.asarray(adj), jnp.asarray(qs)

    for mode in ("bitmask", "beam"):
        f = jax.jit(lambda p, a, q, e, m=mode: batched_beam_search(
            lambda ids: p[ids], a, q, e, ef=EF, metric=metric, capacity=N,
            expand=1, max_steps=STEPS, dedup=m))
        e = jnp.zeros((B,), jnp.int32)
        np.asarray(f(pts_j, adj_j, qs_j, e).visited).sum()
        t = _time(lambda: int(np.asarray(
            f(pts_j, adj_j, qs_j, e).visited).sum()), reps=2)
        _emit({"bench": f"dedup/{mode}", "queries": B, "steps": STEPS,
               "secs": t, "qstep_per_s": B * STEPS / t})


BENCHES = {
    "distance": bench_distance,
    "beam": bench_beam_step,
    "dedup": bench_dedup,
}


def main():
    from hnsw_itu_tpu.utils.compile_cache import enable

    enable()
    names = sys.argv[1:] or list(BENCHES)
    for n in names:
        BENCHES[n]()


if __name__ == "__main__":
    main()
