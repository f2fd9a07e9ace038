"""A/B the packed-kernel span on one W=32 index.

The W=32 100k probe (bench.py BENCH_W=32, span-32 four-queries-per-row
kernel) measured 96.2k QPS where the W=64 span-64 headline runs 136.7k.
Candidate explanations: (a) the span-32 kernel variant itself is slower
(4-group frontier reductions / 4-way concats / lane-offset writes), or
(b) the W=32 graph needs the same 32 capped steps but navigates worse,
or (c) W=32 build quality. This isolates (a): SAME index, SAME entry +
sort path, kernel pinned to span 32 (auto) vs span 64 vs unpacked.

Usage: python benches/exp_span_ab.py [N] (default 100_000)
"""

import os
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

import numpy as np


def timeit(fn, reps=3):
    fn()  # compile / warm
    best = float("inf")
    for _ in range(reps):
        t0 = time.perf_counter()
        fn()
        best = min(best, time.perf_counter() - t0)
    return best


def main():
    from hnsw_itu_tpu.utils.compile_cache import enable
    from hnsw_itu_tpu.utils.tunnel import require_device

    enable()
    require_device()
    import jax.numpy as jnp

    from hnsw_itu_tpu.models import IndexOptions
    from hnsw_itu_tpu.models.hnsw import HNSWBuilder
    from hnsw_itu_tpu.models.nsw import _query_step_fused
    from hnsw_itu_tpu.ops.pallas_search import fused_width
    from hnsw_itu_tpu.utils.synth import make_dataset

    N = int(sys.argv[1]) if len(sys.argv) > 1 else 100_000
    NQ, K, EF = 8192, 10, 32

    pts, qs = make_dataset(0, N, NQ)
    np.asarray(jnp.asarray(np.ones((4096, 128), np.uint32)) + 1)

    b = HNSWBuilder(
        IndexOptions(ef_construction=96, connections=24, max_connections=32,
                     size=N, batch_size=256, host_warmup=min(50_000, N)),
        metric="hamming",
    )
    t0 = time.perf_counter()
    b.extend_batched(pts)
    index = b.build()
    print(f"# build {time.perf_counter()-t0:.0f}s", flush=True)
    index.query_entry_sample = 1024
    index.enable_inline()
    assert index.fused is not None, "fused table expected at 100k/W=32"
    qs_dev = jnp.asarray(qs)
    W = fused_width(index.base.width)

    for packed in ("auto", "span64", "never"):
        t = timeit(lambda: np.asarray(_query_step_fused(
            index.points, index.fused, qs_dev, jnp.int32(index.base_ep()),
            jnp.int32(index.n),
            k=K, ef=EF, metric_name=index.metric.name,
            max_steps=EF, entry_sample=1024,
            W=W, block_q=512, packed=packed,
        )[1][:1]))
        print(f"# packed={packed:7s}: {t*1e3:7.1f} ms "
              f"({NQ/t:8.0f} QPS)", flush=True)
    print("# done", flush=True)


if __name__ == "__main__":
    main()
