"""End-to-end coverage of the mini-table query path (NSW.knns ->
_query_step_mini -> mini kernel -> exact/one-hop rerank) on the CPU via
HNSW_TPU_MINI_INTERPRET=1 (Pallas interpret mode). On hardware this path
is the >fused-limit production regime; here the assertions are about the
glue: entry sorting/unsorting, config policy, rerank integration, and
query_hop."""

import numpy as np
import pytest

from hnsw_itu_tpu.models import IndexOptions
from hnsw_itu_tpu.models.nsw import NSWBuilder


@pytest.fixture()
def mini_env(monkeypatch):
    monkeypatch.setenv("HNSW_TPU_MINI_INTERPRET", "1")
    # the interpret escape also makes the FUSED path eligible on CPU; this
    # file covers the mini path, so force the policy past it
    from hnsw_itu_tpu.models import nsw

    monkeypatch.setattr(nsw, "_fused_query_eligible",
                        lambda *a, **kw: False)


def _clustered(rng, n, centers):
    c = centers.shape[0]
    flips = np.packbits(rng.random((n, 1024)) < 0.06, axis=-1).view(np.uint32)
    return centers[rng.integers(0, c, size=n)] ^ flips


def _recall(ids, gt, k):
    hit = 0
    for a, b in zip(ids, gt):
        hit += len(set(int(x) for x in a[:k]) & set(int(x) for x in b[:k]))
    return hit / (len(ids) * k)


def test_mini_query_path_end_to_end(mini_env):
    rng = np.random.default_rng(3)
    n, nq, k = 1500, 64, 10
    centers = rng.integers(0, 2**32, size=(24, 32), dtype=np.uint32)
    pts = _clustered(rng, n, centers)
    qs = _clustered(rng, nq, centers)

    opts = IndexOptions(ef_construction=48, connections=12,
                        max_connections=32, size=n, batch_size=128,
                        host_warmup=0)
    b = NSWBuilder(opts, metric="hamming")
    b.extend_batched(pts)
    index = b.build()  # enable_inline runs inside build when adj_pts set
    index.enable_inline()
    assert index.mini is not None, "policy must pick the mini path"
    assert (index.mini_W, index.mini_words) == (32, 31)

    # exact oracle
    gt = []
    for q in qs:
        d = np.unpackbits((pts ^ q).view(np.uint8), axis=1).sum(1)
        gt.append(np.lexsort((np.arange(n), d))[:k])

    index.query_batch = 256
    index.query_entry_sample = 64
    res = index.knns(qs, k, 48)
    r0 = _recall(np.asarray(res.ids), gt, k)
    assert r0 >= 0.95, r0

    # one-hop rerank must not hurt (it only ADDS exact-ranked candidates)
    index.query_hop = 4
    res2 = index.knns(qs, k, 48)
    r1 = _recall(np.asarray(res2.ids), gt, k)
    assert r1 >= r0 - 1e-9, (r0, r1)

    # results are sorted ascending by (distance, id) per row
    d0 = np.asarray(res.dists)
    assert (np.diff(d0, axis=1) >= 0).all()


def test_hnsw_fused_query_path_end_to_end(monkeypatch):
    """HNSW glue over the fused kernel (descent/sampled entry + packed
    keys + decode) in interpret mode — the flagship single-chip path."""
    monkeypatch.setenv("HNSW_TPU_MINI_INTERPRET", "1")
    from hnsw_itu_tpu.models.hnsw import HNSWBuilder

    rng = np.random.default_rng(8)
    n, nq, k = 1200, 64, 10
    centers = rng.integers(0, 2**32, size=(20, 32), dtype=np.uint32)
    pts = _clustered(rng, n, centers)
    qs = _clustered(rng, nq, centers)
    opts = IndexOptions(ef_construction=48, connections=12,
                        max_connections=32, size=n, batch_size=128,
                        host_warmup=0)
    b = HNSWBuilder(opts, metric="hamming")
    b.extend_batched(pts)
    index = b.build()
    index.enable_inline()
    assert index.fused is not None

    gt = []
    for q in qs:
        d = np.unpackbits((pts ^ q).view(np.uint8), axis=1).sum(1)
        gt.append(np.lexsort((np.arange(n), d))[:k])

    index.query_batch = 256
    index.query_entry_sample = 64  # sampled entry (flagship config)
    res = index.knns(qs, k, 48)
    r0 = _recall(np.asarray(res.ids), gt, k)
    assert r0 >= 0.95, r0


def test_fused_query_path_end_to_end(monkeypatch):
    """Same glue coverage for the FUSED path (NSW.knns ->
    _query_step_fused -> packed kernel -> key decode) via interpret."""
    monkeypatch.setenv("HNSW_TPU_MINI_INTERPRET", "1")
    rng = np.random.default_rng(5)
    n, nq, k = 1200, 64, 10
    centers = rng.integers(0, 2**32, size=(20, 32), dtype=np.uint32)
    pts = _clustered(rng, n, centers)
    qs = _clustered(rng, nq, centers)
    opts = IndexOptions(ef_construction=48, connections=12,
                        max_connections=32, size=n, batch_size=128,
                        host_warmup=0)
    b = NSWBuilder(opts, metric="hamming")
    b.extend_batched(pts)
    index = b.build()
    index.enable_inline()
    assert index.fused is not None, "fused table expected under interpret"

    gt = []
    for q in qs:
        d = np.unpackbits((pts ^ q).view(np.uint8), axis=1).sum(1)
        gt.append(np.lexsort((np.arange(n), d))[:k])

    index.query_batch = 256
    index.query_entry_sample = 64
    res = index.knns(qs, k, 48)
    r0 = _recall(np.asarray(res.ids), gt, k)
    assert r0 >= 0.95, r0
    assert (np.diff(np.asarray(res.dists), axis=1) >= 0).all()
