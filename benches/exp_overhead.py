"""Decompose the 100k query batch: kernel vs everything around it.

The 100k headline (bench.py, ef=32/cap=32, block_q=512) measures ~60ms
for 8192 queries end-to-end while the fused kernel's own step rate
predicts ~26ms — this isolates where the other ~34ms lives:

  a. full knns           (entry sample + sort + kernel + unsort + topk)
  b. fused kernel only   (pre-staged init keys, same blocks)
  c. entry sample only   (MXU argmin over 1024 strided samples)
  d. sort+unsort only    (argsort of entry distances + inverse gather)

Each timed warm (best of 3 after a compile run), through a host fetch.

Usage: python benches/exp_overhead.py [N]   (default 100_000)
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
    import jax
    import jax.numpy as jnp

    from hnsw_itu_tpu.models import IndexOptions
    from hnsw_itu_tpu.models.hnsw import HNSWBuilder
    from hnsw_itu_tpu.utils.synth import make_dataset

    N = int(sys.argv[1]) if len(sys.argv) > 1 else 100_000
    NQ, K, EF = 8192, 10, 32

    pts, qs = make_dataset(0, N, NQ)
    np.asarray(jnp.asarray(np.ones((4096, 128), np.uint32)) + 1)

    b = HNSWBuilder(
        IndexOptions(ef_construction=96, connections=24, max_connections=64,
                     size=N, batch_size=256, host_warmup=min(50_000, N)),
        metric="hamming",
    )
    t0 = time.perf_counter()
    b.extend_batched(pts)
    index = b.build()
    print(f"# build {time.perf_counter()-t0:.0f}s", flush=True)
    index.query_batch = NQ
    index.query_entry_sample = 1024
    index.max_steps = EF
    index.enable_inline()
    qs_dev = jnp.asarray(qs)

    # r. tunnel round trip: dispatch of a trivial jitted op + 4-byte fetch.
    # Every variant below pays this once; it bounds the fixed per-batch
    # cost that no program-side optimization can remove.
    tiny = jnp.zeros((8,), jnp.int32)
    rtt_fn = jax.jit(lambda x: x + 1)
    tr = timeit(lambda: np.asarray(rtt_fn(tiny)[:1]))
    print(f"# r. dispatch+fetch RTT (trivial op): {tr*1e3:7.1f} ms",
          flush=True)

    # a. full knns
    ta = timeit(lambda: np.asarray(index.knns(qs_dev, K, EF).ids[:1]))
    print(f"# a. full knns:        {ta*1e3:7.1f} ms  "
          f"({NQ/ta:8.0f} QPS)", flush=True)

    # c. entry sample only
    from hnsw_itu_tpu.ops.entry import sampled_entry

    @jax.jit
    def entry_only(q):
        return sampled_entry(index.points, q, index.n,
                             sample_size=1024, metric=index.metric)

    tc = timeit(lambda: np.asarray(entry_only(qs_dev)[:1]))
    print(f"# c. entry sample:     {tc*1e3:7.1f} ms", flush=True)

    # d. sort + unsort only (entry distances + argsort + inverse gather)
    eps = entry_only(qs_dev)

    @jax.jit
    def sort_unsort(q, e):
        d0 = jax.vmap(
            lambda qq, p: index.metric.one_to_many(qq, p[None])[0]
        )(q, index.points[e]).astype(jnp.int32)
        order = jnp.argsort(d0)
        inv = jnp.argsort(order)
        return q[order][inv]

    td = timeit(lambda: np.asarray(sort_unsort(qs_dev, eps)[:1, :1]))
    print(f"# d. entry-d+sort+unsort: {td*1e3:7.1f} ms", flush=True)

    # b/e/f. program variants via static args (each retraces):
    #   b. no entry sample (ep=0 for all), sorted     -> a-b ~ entry cost
    #   e. entry sample, NO batch sort/unsort         -> a-e ~ sort cost
    #                                                   (+ divergence delta)
    #   f. neither (ep=0, unsorted)                   -> the bare kernel
    if index.fused is not None:
        from hnsw_itu_tpu.models.nsw import _query_step_fused
        from hnsw_itu_tpu.ops.pallas_search import fused_width

        W = fused_width(index.base.width)

        def variant(entry_sample, sort_queries):
            return timeit(lambda: np.asarray(_query_step_fused(
                index.points, index.fused, qs_dev, jnp.int32(0),
                jnp.int32(index.n),
                k=K, ef=EF, metric_name=index.metric.name,
                max_steps=EF, entry_sample=entry_sample,
                W=W, block_q=512, sort_queries=sort_queries,
            )[1][:1]))

        tb = variant(0, True)
        print(f"# b. no entry sample (ep=0), sorted:   {tb*1e3:7.1f} ms",
              flush=True)
        te = variant(1024, False)
        print(f"# e. entry sample, unsorted:           {te*1e3:7.1f} ms",
              flush=True)
        tf = variant(0, False)
        print(f"# f. ep=0, unsorted (bare kernel+pack): {tf*1e3:7.1f} ms",
              flush=True)
    print("# done", flush=True)


if __name__ == "__main__":
    main()
