"""Mini-table config shootout at 200k clustered: estimate bits vs graph
width at equal DMA bytes.

The 10M budget affords ~1KB/node, which buys either (W=64, mw=3) — all 64
neighbors, 96-bit estimates — or (W=32, mw=7) — the first 32 neighbors,
224-bit estimates. Estimate noise was the recall binder at 200k
(validate_mini: mw=3 0.94 vs mw=7 0.98 at ef=128), so trading edges for
bits should win. This measures recall + SORTED QPS for the four corner
configs through the production _query_step_mini path.
"""

import sys
import time

sys.path.insert(0, __file__.rsplit("/", 2)[0])

import numpy as np

from hnsw_itu_tpu.utils.compile_cache import enable

enable()

import jax
import jax.numpy as jnp

from hnsw_itu_tpu.models import Bruteforce, IndexOptions
from hnsw_itu_tpu.models.hnsw import HNSWBuilder
from hnsw_itu_tpu.models.nsw import _query_step_mini
from hnsw_itu_tpu.ops.pallas_dma_search import materialize_mini
from hnsw_itu_tpu.utils import recall_at_k

t00 = time.perf_counter()
np.asarray(jnp.asarray(np.ones((4096, 128), np.uint32)) + 1)


def log(msg):
    print(f"[{time.perf_counter()-t00:6.0f}s] {msg}", flush=True)


log("session warm")

N, NQ, K = 200_000, 4096, 10
rng = np.random.default_rng(1)
C = max(16, N // 128)
centers = rng.integers(0, 2**32, size=(C, 32), dtype=np.uint32)


def flip(n, p=0.08):
    return np.packbits(rng.random((n, 1024)) < p, axis=-1).view(np.uint32)


pts = centers[rng.integers(0, C, size=N)] ^ flip(N)
qsn = centers[rng.integers(0, C, size=NQ)] ^ flip(NQ)
log("data made")

opts = IndexOptions(ef_construction=96, connections=24, max_connections=64,
                    size=N, batch_size=256, host_warmup=20_000)
t0 = time.perf_counter()
b = HNSWBuilder(opts, metric="hamming")
b.extend_batched(pts)
index = b.build()
np.asarray(index.base.deg[:1])
log(f"build {time.perf_counter()-t0:.0f}s, levels={index.level_ns}")

bf = Bruteforce("hamming")
bf.extend(pts)
gt_ids = np.asarray(bf.build().knns(qsn, K).ids)
log("GT done")

qs_dev = jnp.asarray(qsn)
adj = index.base.adj

for Wm, mw in [tuple(map(int, c.split(","))) for c in (sys.argv[1:] or ["64,3", "32,7", "64,7", "32,15"])]:
    t0 = time.perf_counter()
    mini = materialize_mini(index.points, adj[:, :Wm], mini_words=mw)
    np.asarray(mini[:1, :1, :1])
    log(f"mini(W={Wm}, mw={mw}) table {time.perf_counter()-t0:.1f}s "
        f"({mini.nbytes/2**30:.2f}GB, {mini.shape[1]*512}B/row)")
    for ef in (64, 96, 128):
        args = dict(k=K, ef=ef, metric_name="hamming", max_steps=2 * ef,
                    entry_sample=1024, W=Wm, mini_words=mw, block_q=256)
        d, i, vis, st = _query_step_mini(
            index.points, mini, qs_dev, jnp.int32(index.base_ep()),
            jnp.int32(N), **args)
        np.asarray(i[:1])
        t0 = time.perf_counter()
        d, i, vis, st = _query_step_mini(
            index.points, mini, qs_dev, jnp.int32(index.base_ep()),
            jnp.int32(N), **args)
        ih = np.asarray(i)
        dt = time.perf_counter() - t0
        ih = np.where(ih >= np.iinfo(np.int32).max, -1, ih)
        rec = recall_at_k(ih, gt_ids, K)
        sth = np.asarray(st)
        log(f"  ef={ef}: recall {rec:.4f}  {NQ/dt:7.0f} QPS  "
            f"steps mean {sth.mean():.0f} p99 {np.percentile(sth, 99):.0f}")
    del mini

print("done", flush=True)
