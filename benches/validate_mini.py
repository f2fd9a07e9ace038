"""Hardware validation of the minisketch kernel + the recall question.

Stages:
  0. kernel-boundary padding probe: does passing [4M, 1, 128] (2GB
     logical / 16GB if sublane-padded) to a pallas kernel OOM? Decides
     whether the packed tables are really 512B/row THROUGH the kernel.
  1. mini kernel bit-exact vs XLA-on-truncated-sketches at 8k (hardware).
  2. THE measurement: 200k clustered build; recall@10 + QPS for
       (a) exact fused-table kernel (production small-N path),
       (b) mini(mw=3) search + exact rerank,
       (c) mini(mw=7) search + exact rerank,
     at ef in {64, 96}. Decides the 10M query architecture.
"""

import sys
import time

sys.path.insert(0, __file__.rsplit("/", 2)[0])

import numpy as np

from hnsw_itu_tpu.utils.compile_cache import enable

enable()

import jax
import jax.numpy as jnp
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu

from hnsw_itu_tpu.ops.metrics import get_metric
from hnsw_itu_tpu.ops.pallas_dma_search import (
    DINF, IINF, materialize_mini, mini_beam_search, rerank_exact,
)
from hnsw_itu_tpu.ops.search import batched_beam_search

t00 = time.perf_counter()
np.asarray(jnp.asarray(np.ones((4096, 128), np.uint32)) + 1)


def log(msg):
    print(f"[{time.perf_counter()-t00:6.0f}s] {msg}", flush=True)


log("session warm")

# ---- stage 0: kernel-boundary padding probe --------------------------------
try:
    big = jnp.zeros((4_000_000, 1, 128), jnp.uint32)  # 2GB logical

    def probe_kernel(idx_ref, hbm, out_ref, scratch, sem):
        pltpu.make_async_copy(hbm.at[idx_ref[0]], scratch, sem).start()
        pltpu.make_async_copy(hbm.at[idx_ref[0]], scratch, sem).wait()
        out_ref[:] = scratch[0]

    out = pl.pallas_call(
        probe_kernel,
        out_shape=jax.ShapeDtypeStruct((128,), jnp.uint32),
        in_specs=[pl.BlockSpec(memory_space=pltpu.SMEM),
                  pl.BlockSpec(memory_space=pl.ANY)],
        out_specs=pl.BlockSpec(memory_space=pltpu.VMEM),
        scratch_shapes=[pltpu.VMEM((1, 128), jnp.uint32),
                        pltpu.SemaphoreType.DMA],
    )(jnp.asarray([3_999_999], jnp.int32), big)
    np.asarray(out)
    del big
    log("stage0 PASS: [4M,1,128] through a kernel, no OOM -> unpadded at "
        "the kernel boundary too")
except Exception as e:
    log(f"stage0 PADDING SUSPECT: {type(e).__name__}: {str(e)[:200]}")

# ---- stage 1: mini kernel bit-exact on hardware ----------------------------
cap, w, words, B, ef, mw = 8192, 64, 32, 256, 48, 3
rng = np.random.default_rng(0)
pts = rng.integers(0, 2**32, size=(cap, words), dtype=np.uint32)
adj = np.full((cap, w), -1, np.int32)
for i in range(cap):
    deg = rng.integers(w // 2, w + 1)
    adj[i, :deg] = rng.choice(cap, size=deg, replace=False)
qs = rng.integers(0, 2**32, size=(B, words), dtype=np.uint32)
metric = get_metric("hamming")
pts_j, adj_j, qs_j = jnp.asarray(pts), jnp.asarray(adj), jnp.asarray(qs)
tp, tq = pts_j[:, :mw], qs_j[:, :mw]
ref = batched_beam_search(
    lambda ids: tp[ids], adj_j, tq, jnp.zeros((B,), jnp.int32),
    ef=ef, metric=metric, capacity=cap, expand=1, max_steps=256,
    dedup="beam",
)
mini = materialize_mini(pts_j, adj_j, mini_words=mw)
d0 = jnp.sum(jax.lax.population_count(tq ^ tp[0][None]), axis=1).astype(
    jnp.int32
)
outd, outi, vis, stp = mini_beam_search(
    mini, qs_j, d0, jnp.zeros((B,), jnp.int32),
    ef=ef, W=w, mini_words=mw, max_steps=256, block_q=B,
)
gd = np.asarray(outd)[:, :ef]
gi = np.asarray(outi)[:, :ef]
gd = np.where(gd >= DINF, np.iinfo(np.int32).max, gd)
gi = np.where(gi >= IINF, np.iinfo(np.int32).max, gi)
ok = (gd == np.asarray(ref.dists)).all() and (gi == np.asarray(ref.ids)).all()
log(f"stage1 mini bit-exact on hardware: {ok}")
if not ok:
    sys.exit(1)

# ---- stage 2: 200k clustered recall ----------------------------------------
from hnsw_itu_tpu.models import Bruteforce, IndexOptions
from hnsw_itu_tpu.models.hnsw import HNSWBuilder
from hnsw_itu_tpu.utils import recall_at_k

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
log(f"build {time.perf_counter()-t0:.0f}s, levels={index.level_ns}, "
    f"drops={b.total_edge_drops()}")

bf = Bruteforce("hamming")
bf.extend(pts)
t0 = time.perf_counter()
gt = bf.build().knns(qsn, K)
log(f"GT {time.perf_counter()-t0:.0f}s")
gt_ids = np.asarray(gt.ids)

qs_dev = jnp.asarray(qsn)
index.query_batch = 4096
index.query_entry_sample = 1024

# (a) exact fused path
for ef in (64, 96):
    index.knns(qs_dev[:1024], K, ef)  # compile
    t0 = time.perf_counter()
    r = index.knns(qs_dev, K, ef)
    dt = time.perf_counter() - t0
    rec = recall_at_k(np.asarray(r.ids), gt_ids, K)
    log(f"(a) exact fused  ef={ef}: recall {rec:.4f}  {NQ/dt:7.0f} QPS")

# (b)/(c) mini + rerank
from hnsw_itu_tpu.ops.entry import sampled_entry

pts_dev = index.points
for mw in (3, 7):
    t0 = time.perf_counter()
    mini_t = materialize_mini(pts_dev, index.base.adj, mini_words=mw)
    np.asarray(mini_t[:1, :1, :1])
    log(f"mini(mw={mw}) table {time.perf_counter()-t0:.1f}s "
        f"({mini_t.nbytes/2**30:.2f}GB)")
    for ef in (64, 96, 128):
        eps = sampled_entry(pts_dev, qs_dev, jnp.int32(N), sample_size=1024,
                            metric=metric)
        d0m = jnp.sum(
            jax.lax.population_count(
                qs_dev[:, :mw] ^ pts_dev[eps][:, :mw]
            ), axis=1,
        ).astype(jnp.int32)
        outd, outi, vis, stp = mini_beam_search(
            mini_t, qs_dev, d0m, eps, ef=ef, W=64, mini_words=mw,
            max_steps=2 * ef, block_q=256,
        )
        dk, ik = rerank_exact(pts_dev, qs_dev, outi, k=K)
        np.asarray(ik[:1])
        # timed pass
        t0 = time.perf_counter()
        eps = sampled_entry(pts_dev, qs_dev, jnp.int32(N), sample_size=1024,
                            metric=metric)
        d0m = jnp.sum(
            jax.lax.population_count(
                qs_dev[:, :mw] ^ pts_dev[eps][:, :mw]
            ), axis=1,
        ).astype(jnp.int32)
        outd, outi, vis, stp = mini_beam_search(
            mini_t, qs_dev, d0m, eps, ef=ef, W=64, mini_words=mw,
            max_steps=2 * ef, block_q=256,
        )
        dk, ik = rerank_exact(pts_dev, qs_dev, outi, k=K)
        ik_h = np.asarray(ik)
        dt = time.perf_counter() - t0
        iinf = np.iinfo(np.int32).max
        ik_h = np.where(ik_h >= iinf, -1, ik_h)
        rec = recall_at_k(ik_h, gt_ids, K)
        steps = int(np.asarray(stp).sum()) / NQ
        log(f"(mw={mw}) mini+rerank ef={ef}: recall {rec:.4f}  "
            f"{NQ/dt:7.0f} QPS  steps/q {steps:.0f}")
    del mini_t

print("done", flush=True)
