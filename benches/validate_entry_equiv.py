"""Evidence for ShardedHNSW's entry-policy substitution.

ShardedHNSW (parallel/sharded.py) replaces per-shard hierarchies with a
per-shard MXU sampled entry and claims recall-equivalence at equal ef.
A shard is just a standalone index, so the claim reduces to: on a
shard-sized (>=100k) index, queries entered via the HNSW hierarchy
descent vs. via ``sampled_entry`` reach the same recall at equal ef.

This builds ONE 100k+ HNSW index on the TPU and queries the SAME graph
both ways (query_entry_sample=0 -> per-level greedy descent from the top;
query_entry_sample=1024 -> dense MXU scores of a 1024-point sample), so
the comparison isolates exactly the entry policy. Writes a recall table
to stdout and benches/results_entry_equiv.json.

Usage: python benches/validate_entry_equiv.py [N] (default 150_000)
       BENCH_CPU=1 pins the CPU backend (recall equivalence only — the
       native host engine builds the full hierarchy, queries go through
       the XLA path; throughput numbers are then meaningless).
"""

import json
import os
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

import numpy as np

CPU = os.environ.get("BENCH_CPU") == "1"


def main():
    from hnsw_itu_tpu.utils.compile_cache import enable

    enable()
    import jax

    if CPU:
        jax.config.update("jax_platforms", "cpu")
    else:
        from hnsw_itu_tpu.utils.tunnel import require_device

        require_device()
    import jax.numpy as jnp

    from hnsw_itu_tpu.models import Bruteforce, IndexOptions
    from hnsw_itu_tpu.models.hnsw import HNSWBuilder
    from hnsw_itu_tpu.utils import recall_at_k

    N = int(sys.argv[1]) if len(sys.argv) > 1 else 150_000
    NQ, K = (2_048 if CPU else 8_192), 10
    rng = np.random.default_rng(7)
    C = max(16, N // 128)
    centers = rng.integers(0, 2**32, size=(C, 32), dtype=np.uint32)

    def make(n):
        flips = np.packbits(
            rng.random((n, 1024), dtype=np.float32) < 0.08, axis=-1
        ).view(np.uint32)
        return centers[rng.integers(0, C, size=n)] ^ flips

    pts, qs = make(N), make(NQ)
    np.asarray(jnp.asarray(np.ones((4096, 128), np.uint32)) + 1)  # session

    opts = IndexOptions(ef_construction=96, connections=24,
                        max_connections=64, size=N, batch_size=256,
                        host_warmup=N if CPU else min(50_000, N))
    t0 = time.perf_counter()
    b = HNSWBuilder(opts, metric="hamming")
    b.extend_batched(pts)
    index = b.build()
    np.asarray(index.base.deg[:1])
    print(f"# build {time.perf_counter()-t0:.1f}s levels={index.level_ns}",
          file=sys.stderr, flush=True)

    if CPU:
        from hnsw_itu_tpu import native

        _, gt = native.host_bruteforce(pts, "hamming", qs, K)
    else:
        bf = Bruteforce("hamming")
        bf.extend(pts)
        gt = np.asarray(bf.build().knns(qs, K).ids)

    index.query_batch = 8192
    index.enable_inline()  # fused kernel serves both entry modes
    qs_dev = jnp.asarray(qs)
    rows = []
    for ef in (32, 48, 64, 96):
        recs = {}
        for mode, sample in (("descent", 0), ("sampled", 1024)):
            index.query_entry_sample = sample
            res = index.knns(qs_dev, K, ef)
            recs[mode] = float(recall_at_k(np.asarray(res.ids), gt, K))
        rows.append({"ef": ef, "recall_descent": round(recs["descent"], 4),
                     "recall_sampled": round(recs["sampled"], 4),
                     "delta": round(recs["sampled"] - recs["descent"], 4)})
        print(f"# ef={ef}: descent {recs['descent']:.4f} "
              f"sampled {recs['sampled']:.4f}", file=sys.stderr, flush=True)

    out = {"n_points": N, "n_queries": NQ, "k": K,
           "entry_sample": 1024, "rows": rows}
    print(json.dumps(out))
    path = os.path.join(os.path.dirname(os.path.abspath(__file__)),
                        "results_entry_equiv.json")
    with open(path, "w") as f:
        json.dump(out, f, indent=1)


if __name__ == "__main__":
    main()
