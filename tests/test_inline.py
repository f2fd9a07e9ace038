"""Inline-neighbor (adj_pts) query mode must match the regular path."""

import numpy as np

from hnsw_itu_tpu.models import Bruteforce, IndexOptions, NSWBuilder
from hnsw_itu_tpu.models.hnsw import HNSWBuilder


def test_nsw_inline_matches_regular():
    rng = np.random.default_rng(5)
    n, nq = 800, 16
    pts = rng.integers(0, 2**32, size=(n, 32), dtype=np.uint32)
    qs = rng.integers(0, 2**32, size=(nq, 32), dtype=np.uint32)
    b = NSWBuilder(
        IndexOptions(host_warmup=0, ef_construction=32, connections=8,
                     max_connections=16, size=n),
        metric="hamming",
    )
    b.extend_batched(pts)
    nsw = b.build()
    nsw.query_dedup = "beam"
    r1 = nsw.knns(qs, 5, 32)
    nsw.enable_inline()
    r2 = nsw.knns(qs, 5, 32)
    np.testing.assert_array_equal(np.asarray(r1.ids), np.asarray(r2.ids))
    np.testing.assert_array_equal(np.asarray(r1.dists), np.asarray(r2.dists))


def test_hnsw_inline_matches_regular():
    rng = np.random.default_rng(6)
    n, nq = 800, 16
    pts = rng.integers(0, 2**32, size=(n, 32), dtype=np.uint32)
    qs = pts[:nq] ^ np.uint32(9)
    b = HNSWBuilder(
        IndexOptions(host_warmup=0, ef_construction=32, connections=8,
                     max_connections=16, size=n, batch_size=64),
        metric="hamming",
    )
    b.extend_batched(pts)
    h = b.build()
    h.query_dedup = "beam"
    r1 = h.knns(qs, 5, 32)
    h.enable_inline()
    r2 = h.knns(qs, 5, 32)
    np.testing.assert_array_equal(np.asarray(r1.ids), np.asarray(r2.ids))
    assert (np.asarray(r2.ids)[:, 0] == np.arange(nq)).all()
