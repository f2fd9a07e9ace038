"""Navigability diagnostic: flat random micro-clusters vs a hierarchical
generator, at the sharded-10M per-shard density (~8 points per leaf
cluster in 632k rows).

The sharded-10M run collapsed to 0.2372 global recall with healthy
per-shard builds at 128 pts/cluster density (diag_shard.py: LOCAL exact
recall 0.2509 at 8 pts/cluster). Hypothesis: with C random centers all
~equidistant (512-bit), beam search has NO gradient toward the query's
cluster; a shard's 8-member clusters are needles. Real LAION sketches
are CLIP-embedding bit codes with multi-scale structure — a hierarchical
generator (roots -> mids -> leaves -> points) is the fairer proxy.

Two builds at n=632512, leaf count 79064 (the failing density):
  A) flat:         leaf = random                    (the failing case)
  B) hierarchical: leaf = root^f(.12)^f(.06) chain  (navigable)
Both: point = leaf ^ flips(.08)  (same local GT scale, ~151-bit siblings)

Reports exact-path recall at ef 64/128/256 for each.
"""

import json
import os
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

import numpy as np


def flips(rng, n, p):
    return np.packbits(
        rng.random((n, 1024), dtype=np.float32) < p, axis=-1
    ).view(np.uint32)


def make_leaves_flat(rng, n_leaf):
    return rng.integers(0, 2**32, size=(n_leaf, 32), dtype=np.uint32)


def make_leaves_hier(rng, n_leaf):
    roots = rng.integers(0, 2**32, size=(64, 32), dtype=np.uint32)
    mids = roots[rng.integers(0, 64, size=4096)] ^ flips(rng, 4096, 0.12)
    return mids[rng.integers(0, 4096, size=n_leaf)] ^ flips(
        rng, n_leaf, 0.06
    )


def make_points(rng, leaves, n):
    out = np.empty((n, 32), np.uint32)
    for s in range(0, n, 1_000_000):
        e = min(s + 1_000_000, n)
        m = e - s
        out[s:e] = leaves[rng.integers(0, leaves.shape[0], size=m)] ^ flips(
            rng, m, 0.08
        )
    return out


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

    N = int(sys.argv[1]) if len(sys.argv) > 1 else 632_512
    N_LEAF = int(sys.argv[2]) if len(sys.argv) > 2 else 79_064
    K, NGT = 10, 2048

    np.asarray(jnp.asarray(np.ones((4096, 128), np.uint32)) + 1)
    results = []
    for label, gen in (("flat", make_leaves_flat),
                       ("hier", make_leaves_hier)):
        rng = np.random.default_rng(0)
        leaves = gen(rng, N_LEAF)
        pts = make_points(rng, leaves, N)
        qs = make_points(rng, leaves, 4096)
        t0 = time.perf_counter()
        _, gt = native.host_bruteforce(pts, "hamming", qs[:NGT], K)
        print(f"# [{label}] gt {time.perf_counter()-t0:.0f}s", flush=True)

        opts = IndexOptions(ef_construction=96, connections=24,
                            max_connections=64, size=N, batch_size=256,
                            host_warmup=min(20_000, N))
        t0 = time.perf_counter()
        b = HNSWBuilder(opts, metric="hamming")
        b.extend_batched(pts)
        index = b.build()
        np.asarray(index.base.deg[:1])
        bt = time.perf_counter() - t0
        drops = b.total_edge_drops()
        print(f"# [{label}] build {bt:.1f}s drops={drops}", flush=True)
        index.query_batch = 8192
        index.query_entry_sample = 1024
        row = {"gen": label, "n": N, "n_leaf": N_LEAF,
               "build_s": round(bt, 1), "drops": drops}
        qsub = jnp.asarray(qs[:NGT])
        for ef in (64, 128, 256):
            res = index.knns(qsub, K, ef)
            r = float(recall_at_k(np.asarray(res.ids), gt, K))
            row[f"exact_recall_ef{ef}"] = round(r, 4)
            print(f"# [{label}] exact ef={ef}: recall {r:.4f}", flush=True)
        results.append(row)
        del index, b

    print(json.dumps(results), flush=True)


if __name__ == "__main__":
    main()
