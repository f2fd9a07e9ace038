"""Hardware validation + microbench of the large-N DMA kernel.

Stages (one process = one TPU claim = one backend init):
  1. bit-exact check vs the XLA two-key beam path at 8k nodes (real
     Mosaic lowering of the pl.when-gated fetch loops);
  2. raw kernel timing on a random 2M-node graph (W=64, 1024-bit
     sketches) at ef=64 for block_q in {128, 256}:
     per-query wall-clock, per-query-step cost, implied QPS.

Timing is through host fetches with a perturbed input per iteration
(block_until_ready lies on this backend).
"""

import sys
import time

sys.path.insert(0, __file__.rsplit("/", 2)[0])

import numpy as np

from hnsw_itu_tpu.utils.compile_cache import enable

enable()

import jax
import jax.numpy as jnp

from hnsw_itu_tpu.ops.metrics import get_metric
from hnsw_itu_tpu.ops.pallas_dma_search import (
    DINF, IINF, dma_beam_search, pack_adj, pack_points,
)
from hnsw_itu_tpu.ops.search import batched_beam_search

t00 = time.perf_counter()
np.asarray(jnp.asarray(np.ones((4096, 128), np.uint32)) + 1)
print(f"session warm at {time.perf_counter()-t00:.0f}s", flush=True)


def log(msg):
    print(f"[{time.perf_counter()-t00:6.0f}s] {msg}", flush=True)


# ---- stage 1: bit-exactness on hardware -----------------------------------
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

ref = batched_beam_search(
    lambda ids: pts_j[ids], adj_j, qs_j, jnp.zeros((B,), jnp.int32),
    ef=ef, metric=metric, capacity=cap, expand=1, max_steps=256,
    dedup="beam",
)
ref_d, ref_i = np.asarray(ref.dists), np.asarray(ref.ids)
log("XLA reference done")

d0 = jnp.sum(
    jax.lax.population_count(qs_j ^ pts_j[0][None]), axis=1
).astype(jnp.int32)
outd, outi, vis, stp = dma_beam_search(
    pack_adj(adj_j), pack_points(pts_j), qs_j, d0,
    jnp.zeros((B,), jnp.int32),
    ef=ef, W=w, words=words, max_steps=256, block_q=B,
)
got_d = np.asarray(outd)[:, :ef]
got_i = np.asarray(outi)[:, :ef]
got_d = np.where(got_d >= DINF, np.iinfo(np.int32).max, got_d)
got_i = np.where(got_i >= IINF, np.iinfo(np.int32).max, got_i)
ok = (got_d == ref_d).all() and (got_i == ref_i).all()
okv = (np.asarray(vis) == np.asarray(ref.visited)).all()
oks = (np.asarray(stp) == np.asarray(ref.steps)).all()
log(f"stage1 bit-exact on hardware: dists/ids={ok} visited={okv} steps={oks}")
if not ok:
    bad = np.nonzero((got_d != ref_d).any(axis=1) | (got_i != ref_i).any(axis=1))[0]
    log(f"  mismatching queries: {bad[:8]} of {B}")
    log(f"  q{bad[0]}: got {list(zip(got_d[bad[0],:6], got_i[bad[0],:6]))}")
    log(f"  q{bad[0]}: ref {list(zip(ref_d[bad[0],:6], ref_i[bad[0],:6]))}")
    sys.exit(1)

# ---- stage 2: raw timing at 2M --------------------------------------------
N = 2_000_000
log(f"building random {N}-node tables ...")
rng = np.random.default_rng(1)
pts_big = rng.integers(0, 2**32, size=(N, words), dtype=np.uint32)
adj_big = rng.integers(0, N, size=(N, w), dtype=np.int32)
a2 = pack_adj(jnp.asarray(adj_big))
p4 = pack_points(jnp.asarray(pts_big))
np.asarray(a2[:1, 0, :1])  # drain upload
log("tables packed on device")

NQ, EF, STEPS = 2048, 64, 128
qs_big = jnp.asarray(rng.integers(0, 2**32, size=(NQ, words), dtype=np.uint32))
d0 = jnp.full((NQ,), 512, jnp.int32)
i0 = jnp.zeros((NQ,), jnp.int32)
for bq in (128, 256):
    t0 = time.perf_counter()
    outd, outi, vis, stp = dma_beam_search(
        a2, p4, qs_big, d0, i0, ef=EF, W=w, words=words,
        max_steps=STEPS, block_q=bq,
    )
    np.asarray(outd[:1, :1])
    log(f"bq={bq}: compile+first run {time.perf_counter()-t0:.1f}s")
    best = float("inf")
    for it in range(3):
        qp = qs_big.at[0, 0].add(it + 1)
        t0 = time.perf_counter()
        outd, outi, vis, stp = dma_beam_search(
            a2, p4, qp, d0, i0, ef=EF, W=w, words=words,
            max_steps=STEPS, block_q=bq,
        )
        np.asarray(outd[:1, :1])
        best = min(best, time.perf_counter() - t0)
    steps = int(np.asarray(stp).sum())
    visited = int(np.asarray(vis).sum())
    log(f"bq={bq}: best {best*1e3:.1f}ms for {NQ} q "
        f"({NQ/best:.0f} QPS raw) | steps/q {steps/NQ:.1f} "
        f"visited/q {visited/NQ:.0f} | {best/steps*1e9:.0f} ns/q-step "
        f"| fetch {visited/max(steps,1):.1f} rows/step")
print("done", flush=True)
