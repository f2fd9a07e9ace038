"""Reproduce ONE shard of the failing sharded-10M run and measure its
LOCAL search recall (shard points only, shard-local ground truth) — the
quantity the global merge is bounded by.

Usage: python benches/diag_shard.py [shard_idx] [N_total] [n_shards]
"""

import json
import os
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

import numpy as np


def main():
    from hnsw_itu_tpu.utils.compile_cache import enable
    from hnsw_itu_tpu.utils.tunnel import require_device

    enable()
    require_device()
    import jax.numpy as jnp

    from hnsw_itu_tpu import native
    from hnsw_itu_tpu.models import IndexOptions
    from hnsw_itu_tpu.models.hnsw import HNSWBuilder
    from hnsw_itu_tpu.utils import recall_at_k

    S_IDX = int(sys.argv[1]) if len(sys.argv) > 1 else 1
    N = int(sys.argv[2]) if len(sys.argv) > 2 else 10_120_192
    SH = int(sys.argv[3]) if len(sys.argv) > 3 else 16
    N = -(-N // SH) * SH
    PER = N // SH
    NQ, K, NGT = 10_000, 10, 2048
    EF = 48
    rng = np.random.default_rng(0)
    C = max(16, N // 128)
    centers = rng.integers(0, 2**32, size=(C, 32), dtype=np.uint32)

    def make(n):
        out = np.empty((n, 32), np.uint32)
        for s in range(0, n, 1_000_000):
            e = min(s + 1_000_000, n)
            m = e - s
            flips = np.packbits(
                rng.random((m, 1024), dtype=np.float32) < 0.08, axis=-1
            ).view(np.uint32)
            out[s:e] = centers[rng.integers(0, C, size=m)] ^ flips
        return out

    # the generator is one sequential stream: shard s's rows require
    # generating everything before them (cheap enough: ~10s/M)
    pts = make((S_IDX + 1) * PER)
    qs = make(NQ)
    shard_pts = pts[S_IDX * PER : (S_IDX + 1) * PER]
    del pts

    t0 = time.perf_counter()
    _, gt_local = native.host_bruteforce(shard_pts, "hamming", qs[:NGT], K)
    print(f"# local gt: {time.perf_counter()-t0:.1f}s", flush=True)

    np.asarray(jnp.asarray(np.ones((4096, 128), np.uint32)) + 1)

    opts = IndexOptions(ef_construction=96, connections=24,
                        max_connections=64, size=PER, batch_size=256,
                        host_warmup=min(20_000, PER))
    t0 = time.perf_counter()
    b = HNSWBuilder(opts, metric="hamming")
    b.extend_batched(shard_pts)
    index = b.build()
    np.asarray(index.base.deg[:1])
    bt = time.perf_counter() - t0
    print(f"# shard {S_IDX}: build {bt:.1f}s levels={index.level_ns} "
          f"drops={b.total_edge_drops()} inline_words={b.inline_words}",
          flush=True)

    out = {"shard": S_IDX, "per": PER, "build_s": round(bt, 1),
           "levels": index.level_ns, "drops": b.total_edge_drops()}

    index.query_batch = 8192
    index.query_entry_sample = 1024
    qsub = jnp.asarray(qs[:NGT])
    res = index.knns(qsub, K, 64)
    r = float(recall_at_k(np.asarray(res.ids), gt_local, K))
    out["exact_local_recall_ef64"] = round(r, 4)
    print(f"# exact path ef=64: LOCAL recall {r:.4f}", flush=True)

    index.max_steps = EF
    index.enable_inline()
    np.asarray(index.base.deg[:1])
    path = ("fused" if index.fused is not None else
            f"mini(mw={index.mini_words})" if index.mini is not None
            else "xla")
    out["query_path"] = path
    res = index.knns(jnp.asarray(qs), K, EF)
    r = float(recall_at_k(np.asarray(res.ids)[:NGT], gt_local, K))
    out[f"runner_local_recall_ef{EF}"] = round(r, 4)
    print(f"# {path} ef={EF} cap={EF}: LOCAL recall {r:.4f}", flush=True)
    print(json.dumps(out), flush=True)


if __name__ == "__main__":
    main()
