"""A/B: BFS locality reorder effect on query throughput at scale.

Builds ONE index (the expensive part), serializes the raw arrays, then
loads twice — plain and reordered — materializing the query tables from
each layout and measuring QPS + recall at the same ef points. The graph
is identical in both variants (isomorphic relabel), so any QPS delta is
pure memory layout; recall deltas are tie-break shifts (packed
(distance,id) keys order equal-distance candidates by id).

Usage: python benches/exp_reorder.py [N] (default 2_000_000)
       env: BENCH_EF (comma list, default "64"), BENCH_W (default 64)
Writes benches/results_reorder.json.
"""

import json
import os
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

import numpy as np


def main():
    from hnsw_itu_tpu.utils.compile_cache import enable
    from hnsw_itu_tpu.utils.tunnel import contact_watchdog, require_device

    enable()
    require_device()
    import jax.numpy as jnp

    from hnsw_itu_tpu.models import IndexOptions
    from hnsw_itu_tpu.models.hnsw import HNSWBuilder
    from hnsw_itu_tpu.utils import recall_at_k
    from hnsw_itu_tpu.utils.serialize import load_index, save_index
    from hnsw_itu_tpu.utils.synth import make_dataset

    N = int(sys.argv[1]) if len(sys.argv) > 1 else 2_000_000
    NQ, K, NGT = 10_000, 10, 2048
    EFS = [int(x) for x in os.environ.get("BENCH_EF", "64").split(",")]
    W = int(os.environ.get("BENCH_W", 64))

    t0 = time.perf_counter()
    pts, qs = make_dataset(0, N, NQ)
    print(f"# data at {time.perf_counter()-t0:.0f}s", file=sys.stderr,
          flush=True)

    disarm = contact_watchdog()
    np.asarray(jnp.asarray(np.ones((4096, 128), np.uint32)) + 1)
    disarm()

    from hnsw_itu_tpu import native

    t0 = time.perf_counter()
    _, gt_ids = native.host_bruteforce(pts, "hamming", qs[:NGT], K)
    print(f"# ground truth: {time.perf_counter()-t0:.1f}s",
          file=sys.stderr, flush=True)

    opts = IndexOptions(ef_construction=96, connections=24,
                        max_connections=W, size=N, batch_size=256,
                        host_warmup=min(50_000, N))
    t0 = time.perf_counter()
    b = HNSWBuilder(opts, metric="hamming")
    b.extend_batched(pts)
    index = b.build()
    np.asarray(index.base.deg[:1])
    build_s = time.perf_counter() - t0
    print(f"# build: {build_s:.1f}s, levels={index.level_ns}",
          file=sys.stderr, flush=True)

    bench_dir = os.path.dirname(os.path.abspath(__file__))
    raw = os.path.join(bench_dir, f"reorder_ab_{N}.idx")
    # drop the tables; persist raw arrays once (gitignored scratch)
    index.fused = index.mini = index.adj_pts = None
    index.level_adj_pts = None
    t0 = time.perf_counter()
    save_index(raw, index)
    print(f"# serialized at {time.perf_counter()-t0:.0f}s",
          file=sys.stderr, flush=True)
    del index, b

    qs_dev = jnp.asarray(qs)
    variants = {}
    for name in ("plain", "reordered"):
        idx, _ = load_index(raw)
        if name == "reordered":
            t0 = time.perf_counter()
            idx.reorder()
            print(f"# reorder: {time.perf_counter()-t0:.1f}s",
                  file=sys.stderr, flush=True)
        idx.query_batch = max(8192, -(-NQ // 512) * 512)
        idx.query_entry_sample = 1024
        idx.enable_inline()
        np.asarray(idx.base.deg[:1])
        path = ("fused" if idx.fused is not None else
                f"mini(mw={idx.mini_words})" if idx.mini is not None
                else "xla")
        rows = []
        for ef in EFS:
            idx.max_steps = None
            np.asarray(idx.knns(qs_dev[:8192], K, ef).ids[:1])  # compile
            best = float("inf")
            for _ in range(2):
                t0 = time.perf_counter()
                res = idx.knns(qs_dev, K, ef)
                np.asarray(res.ids[:1])
                best = min(best, time.perf_counter() - t0)
            rec = float(recall_at_k(np.asarray(res.ids)[:NGT], gt_ids, K))
            print(f"# {name} ef={ef}: {NQ/best:.0f} QPS, recall {rec:.4f} "
                  f"({path})", file=sys.stderr, flush=True)
            rows.append({"ef": ef, "qps": round(NQ / best, 1),
                         "recall_at_10": round(rec, 4)})
        variants[name] = {"path": path, "rows": rows}
        # free this variant's tables before the next load
        idx.fused = idx.mini = idx.adj_pts = None
        idx.level_adj_pts = None
        del idx
        import gc

        gc.collect()

    out = {
        "metric": f"reorder A/B (n={N}, W={W}, same graph, "
                  "synthetic 1024-bit sketches)",
        "n_points": N,
        "build_seconds": round(build_s, 1),
        "variants": variants,
    }
    print(json.dumps(out))
    with open(os.path.join(bench_dir, "results_reorder.json"), "w") as f:
        json.dump(out, f, indent=1)
    os.remove(raw)


if __name__ == "__main__":
    main()
