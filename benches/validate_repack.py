"""Hardware validation: repacked fused table + sorted-query batches.

Stages:
  0. warm + repack bit-exactness vs the XLA packed beam at 8k (hardware).
  1. padding probes: are [N, 2, 128] / [N, 4, 128] u32 tables stored
     unpadded through the kernel boundary (decides the 10M mini-table
     memory budget)?
  2. 200k clustered build; exact fused QPS at block_q 256 vs 512, with
     the new entry-distance sort (vs 4010 QPS unsorted baseline from
     validate_mini), plus phase decomposition (entry+init vs kernel).
  3. mini kernel at block_q 512 + sorted entries.
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
from hnsw_itu_tpu.ops.pallas_search import (
    fused_beam_search, fused_width, key_clamp, materialize_fused,
)
from hnsw_itu_tpu.ops.search import batched_beam_search

t00 = time.perf_counter()
np.asarray(jnp.asarray(np.ones((4096, 128), np.uint32)) + 1)


def log(msg):
    print(f"[{time.perf_counter()-t00:6.0f}s] {msg}", flush=True)


log("session warm")

# ---- stage 0: repack bit-exact on hardware ---------------------------------
cap, w, words, B, ef = 8192, 64, 32, 256, 48
rng = np.random.default_rng(0)
pts = rng.integers(0, 2**32, size=(cap, words), dtype=np.uint32)
adj = np.full((cap, w), -1, np.int32)
for i in range(cap):
    deg = rng.integers(w // 2, w + 1)
    adj[i, :deg] = rng.choice(cap, size=deg, replace=False)
qs = rng.integers(0, 2**32, size=(B, words), dtype=np.uint32)
metric = get_metric("hamming")
pts_j, adj_j, qs_j = jnp.asarray(pts), jnp.asarray(adj), jnp.asarray(qs)
id_bits = max(1, (cap - 1).bit_length())
max_d = words * 32
ref = batched_beam_search(
    lambda ids: pts_j[ids], adj_j, qs_j, jnp.zeros((B,), jnp.int32),
    ef=ef, metric=metric, capacity=cap, expand=1, max_steps=256,
    dedup="beam",
)
table = materialize_fused(pts_j, adj_j)
d0 = jnp.sum(jax.lax.population_count(qs_j ^ pts_j[0][None]), axis=1).astype(
    jnp.int32
)
keys, vis, stp = fused_beam_search(
    table, qs_j, (d0 << id_bits) | 0, ef=ef, W=fused_width(w), words=words,
    id_bits=id_bits, max_d=max_d, max_steps=256, block_q=B,
)
kinf = (max_d + 1) << id_bits
keys = np.asarray(keys)
gd = np.where(keys < kinf, keys >> id_bits, np.iinfo(np.int32).max)
gi = np.where(keys < kinf, keys & ((1 << id_bits) - 1),
              np.iinfo(np.int32).max)
ok = (gd[:, :ef] == np.asarray(ref.dists)).all() and (
    gi[:, :ef] == np.asarray(ref.ids)
).all()
log(f"stage0 repacked kernel bit-exact on hardware: {ok}")
if not ok:
    sys.exit(1)

# ---- stage 1: padding probes -----------------------------------------------
for N, S in ((6_000_000, 2), (5_000_000, 4)):
    try:
        big = jnp.zeros((N, S, 128), jnp.uint32)

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
            scratch_shapes=[pltpu.VMEM((S, 128), jnp.uint32),
                            pltpu.SemaphoreType.DMA],
        )(jnp.asarray([N - 1], jnp.int32), big)
        np.asarray(out)
        del big
        log(f"stage1 [N,{S},128] at N={N}: PASS ({N*S*512//2**30}GB logical"
            " fit + kernel DMA ok -> unpadded)")
    except Exception as e:
        log(f"stage1 [N,{S},128] PADDING SUSPECT: "
            f"{type(e).__name__}: {str(e)[:160]}")

# ---- stage 2: 200k clustered, repacked fused QPS ---------------------------
from hnsw_itu_tpu.models import Bruteforce, IndexOptions
from hnsw_itu_tpu.models.hnsw import HNSWBuilder
from hnsw_itu_tpu.models.nsw import _query_step_fused
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

# (a) production path (sorted now), block 256
for ef in (48, 64):
    index.knns(qs_dev[:4096], K, ef)  # compile+warm
    t0 = time.perf_counter()
    r = index.knns(qs_dev, K, ef)
    dt = time.perf_counter() - t0
    rec = recall_at_k(np.asarray(r.ids), gt_ids, K)
    log(f"(a) fused+sort block=256 ef={ef}: recall {rec:.4f} "
        f"{NQ/dt:7.0f} QPS")

# (b) block_q=512 direct
W = fused_width(index.base.width)
for ef in (48, 64):
    for bq in (256, 512):
        try:
            d, i, vis, st = _query_step_fused(
                index.points, index.fused, qs_dev, jnp.int32(index.base_ep()),
                jnp.int32(index.n), k=K, ef=ef, metric_name="hamming",
                max_steps=2 * ef, entry_sample=1024, W=W, block_q=bq,
            )
            np.asarray(i[:1])
            t0 = time.perf_counter()
            d, i, vis, st = _query_step_fused(
                index.points, index.fused, qs_dev, jnp.int32(index.base_ep()),
                jnp.int32(index.n), k=K, ef=ef, metric_name="hamming",
                max_steps=2 * ef, entry_sample=1024, W=W, block_q=bq,
            )
            ih = np.asarray(i)
            dt = time.perf_counter() - t0
            ih = np.where(ih >= np.iinfo(np.int32).max, -1, ih)
            rec = recall_at_k(ih, gt_ids, K)
            sth = np.asarray(st)
            log(f"(b) fused+sort block={bq} ef={ef}: recall {rec:.4f} "
                f"{NQ/dt:7.0f} QPS  steps mean {sth.mean():.0f} "
                f"p99 {np.percentile(sth, 99):.0f}")
        except Exception as e:
            log(f"(b) block={bq} ef={ef} FAILED: "
                f"{type(e).__name__}: {str(e)[:160]}")

# (c) phase decomposition at ef=64 block=256: entry-only vs full
from hnsw_itu_tpu.ops.entry import sampled_entry

t0 = time.perf_counter()
eps = sampled_entry(index.points, qs_dev, jnp.int32(index.n),
                    sample_size=1024, metric=metric)
np.asarray(eps[:1])
log(f"(c) sampled_entry alone: {time.perf_counter()-t0:.3f}s for {NQ}")

print("done", flush=True)
