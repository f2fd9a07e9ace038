"""Round-3 recall-regression diagnostic (one TPU chip).

The queued 2M and sharded-10M runs came back with collapsed recall
(exact-path 0.5958 at 2M; 0.2372 global over 16 shards of 632k whose
per-shard builds use FULL exact inline rows). This script builds ONE
index at the failing configuration and attributes the loss:

  * exact XLA query path (pre-enable_inline)  -> graph quality
  * fused/mini path at the runner's settings  -> query-path delta

Variants via env: HNSW_TPU_SCAN_GROUP (default 8), HNSW_TPU_HOST_WARMUP.

Usage: python benches/diag_r3.py [N] [warmup] [label]
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

    N = int(sys.argv[1]) if len(sys.argv) > 1 else 100_000
    warm = int(sys.argv[2]) if len(sys.argv) > 2 else min(20_000, N)
    label = sys.argv[3] if len(sys.argv) > 3 else "default"
    NQ, K, NGT = 10_000, 10, 2048
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

    pts = make(N)
    qs = make(NQ)
    _, gt_ids = native.host_bruteforce(pts, "hamming", qs[:NGT], K)
    print(f"# [{label}] N={N} warmup={warm} "
          f"scan_group={os.environ.get('HNSW_TPU_SCAN_GROUP', '8(default)')}",
          flush=True)

    np.asarray(jnp.asarray(np.ones((4096, 128), np.uint32)) + 1)  # session

    opts = IndexOptions(ef_construction=96, connections=24,
                        max_connections=64, size=N, batch_size=256,
                        host_warmup=warm)
    t0 = time.perf_counter()
    b = HNSWBuilder(opts, metric="hamming")
    b.extend_batched(pts)
    index = b.build()
    np.asarray(index.base.deg[:1])
    bt = time.perf_counter() - t0
    print(f"# build {bt:.1f}s levels={index.level_ns} "
          f"drops={b.total_edge_drops()} inline_words={b.inline_words}",
          flush=True)

    out = {"label": label, "n": N, "warmup": warm,
           "scan_group": os.environ.get("HNSW_TPU_SCAN_GROUP", "8"),
           "build_s": round(bt, 1), "levels": index.level_ns,
           "drops": b.total_edge_drops()}

    # -- graph-quality attribution: exact XLA path, default steps cap
    index.query_batch = 8192
    index.query_entry_sample = 1024
    qsub = jnp.asarray(qs[:NGT])
    for ef in (48, 64):
        res = index.knns(qsub, K, ef)
        r = float(recall_at_k(np.asarray(res.ids), gt_ids, K))
        out[f"exact_recall_ef{ef}"] = round(r, 4)
        print(f"# exact path ef={ef}: recall {r:.4f}", flush=True)

    # -- the sharded runner's exact query config
    index.max_steps = 48
    index.enable_inline()
    np.asarray(index.base.deg[:1])
    path = ("fused" if index.fused is not None else
            f"mini(mw={index.mini_words})" if index.mini is not None
            else "xla")
    out["query_path"] = path
    qs_dev = jnp.asarray(qs)
    res = index.knns(qs_dev, K, 48)
    r48 = float(recall_at_k(np.asarray(res.ids)[:NGT], gt_ids, K))
    out["runner_recall_ef48_cap48"] = round(r48, 4)
    print(f"# {path} ef=48 cap=48 (runner config): recall {r48:.4f}",
          flush=True)
    index.max_steps = None  # default cap
    res = index.knns(qs_dev, K, 64)
    r64 = float(recall_at_k(np.asarray(res.ids)[:NGT], gt_ids, K))
    out["inline_recall_ef64"] = round(r64, 4)
    print(f"# {path} ef=64 default cap: recall {r64:.4f}", flush=True)

    print(json.dumps(out), flush=True)


if __name__ == "__main__":
    main()
