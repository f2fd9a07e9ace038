"""BFS locality reorder (ops/reorder.py): an isomorphic relabel — results
must be IDENTICAL to the unreordered index after the id_map is applied,
for both NSW and HNSW and for both entry policies."""

import numpy as np
import pytest

from hnsw_itu_tpu.models import Bruteforce, IndexOptions
from hnsw_itu_tpu.models.hnsw import HNSWBuilder
from hnsw_itu_tpu.models.nsw import NSWBuilder
from hnsw_itu_tpu.ops.reorder import bfs_order, full_permutation


def test_bfs_order_is_permutation_and_local():
    adj = np.array([
        [1, 2, -1], [0, 3, -1], [0, 4, -1], [1, -1, -1],
        [2, 5, -1], [4, -1, -1], [-1, -1, -1],  # 6 disconnected
    ], np.int32)
    order = bfs_order(adj, 7, start=0)
    assert sorted(order.tolist()) == list(range(7))
    assert order[0] == 0
    assert set(order[1:3].tolist()) == {1, 2}  # level 1
    assert order[-1] == 6  # unreachable appended last
    perm, inv = full_permutation(order, 9)
    assert (perm[inv] == np.arange(9)).all()
    assert perm[7] == 7 and perm[8] == 8  # dead tail in place


def _clustered(rng, n, nq):
    centers = rng.integers(0, 2**32, size=(max(8, n // 64), 32),
                           dtype=np.uint32)
    assign = rng.integers(0, centers.shape[0], size=n)
    flips = np.packbits(
        rng.random((n, 1024), dtype=np.float32) < 0.05, axis=-1
    ).view(np.uint32)
    pts = centers[assign] ^ flips
    qs = pts[rng.integers(0, n, size=nq)] ^ np.uint32(9)
    return pts, qs


@pytest.mark.parametrize("kind", ["nsw", "hnsw"])
def test_reorder_results_identical(kind):
    rng = np.random.default_rng(21)
    n, nq, k = 800, 24, 10
    pts, qs = _clustered(rng, n, nq)
    opts = IndexOptions(host_warmup=0, ef_construction=32, connections=8,
                        max_connections=16, size=n, batch_size=64)
    cls = NSWBuilder if kind == "nsw" else HNSWBuilder
    b = cls(opts, metric="hamming")
    b.extend_batched(pts)
    idx = b.build()
    idx.adj_pts = None  # force the plain path (reorder requires no tables)
    if kind == "hnsw":
        idx.level_adj_pts = None

    for entry_sample in (0, 128):
        idx.query_entry_sample = entry_sample
        before = idx.knns(qs, k, 48)
        b2 = cls(opts, metric="hamming")
        b2.extend_batched(pts)
        idx2 = b2.build()
        idx2.adj_pts = None
        if kind == "hnsw":
            idx2.level_adj_pts = None
        idx2.query_entry_sample = entry_sample
        idx2.reorder()
        after = idx2.knns(qs, k, 48)
        # the relabel is isomorphic; entry selection (fixed ep or strided
        # sample) is position-dependent, so allow set-level comparison per
        # query but demand identical top-1 and distances
        np.testing.assert_array_equal(
            np.asarray(before.dists), np.asarray(after.dists))
        np.testing.assert_array_equal(
            np.asarray(before.ids)[:, 0], np.asarray(after.ids)[:, 0])


def test_reorder_recall_and_id_space():
    """Reordered ids must live in the ORIGINAL id space: querying each
    point for itself returns its own original id."""
    rng = np.random.default_rng(22)
    n = 600
    pts, _ = _clustered(rng, n, 1)
    b = NSWBuilder(
        IndexOptions(host_warmup=0, ef_construction=32, connections=8,
                     max_connections=16, size=n),
        metric="hamming",
    )
    b.extend_batched(pts)
    idx = b.build()
    idx.adj_pts = None
    idx.reorder()
    r = idx.knns(pts[:32], 1, 32)
    assert (np.asarray(r.ids)[:, 0] == np.arange(32)).all()
    assert (np.asarray(r.dists)[:, 0] == 0).all()


def test_reorder_after_inline_raises():
    rng = np.random.default_rng(23)
    pts, _ = _clustered(rng, 300, 1)
    b = NSWBuilder(
        IndexOptions(host_warmup=0, ef_construction=16, connections=4,
                     max_connections=8, size=300),
        metric="hamming",
    )
    b.extend_batched(pts)
    idx = b.build()  # build() materializes inline tables
    if idx.adj_pts is None and idx.fused is None and idx.mini is None:
        pytest.skip("no inline table materialized on this backend")
    with pytest.raises(ValueError, match="enable_inline"):
        idx.reorder()


def test_reorder_serialization_roundtrip(tmp_path):
    from hnsw_itu_tpu.utils.serialize import load_index, save_index

    rng = np.random.default_rng(24)
    pts, qs = _clustered(rng, 400, 8)
    b = HNSWBuilder(
        IndexOptions(host_warmup=0, ef_construction=32, connections=8,
                     max_connections=16, size=400),
        metric="hamming",
    )
    b.extend_batched(pts)
    idx = b.build()
    idx.adj_pts = None
    idx.level_adj_pts = None
    idx.reorder()
    r1 = idx.knns(qs, 5, 32)
    p = tmp_path / "ridx"
    save_index(str(p), idx)
    idx2, _ = load_index(str(p))
    r2 = idx2.knns(qs, 5, 32)
    np.testing.assert_array_equal(np.asarray(r1.ids), np.asarray(r2.ids))
    np.testing.assert_array_equal(np.asarray(r1.dists), np.asarray(r2.dists))
