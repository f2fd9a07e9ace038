"""Multi-device sharding tests on the virtual 8-device CPU mesh."""

import jax
import numpy as np
import pytest

from hnsw_itu_tpu.models import Bruteforce, IndexOptions
from hnsw_itu_tpu.models.nsw import NSWBuilder
from hnsw_itu_tpu.parallel import ShardedNSW, knns_query_sharded, make_mesh


@pytest.fixture(scope="module")
def mesh():
    assert len(jax.devices()) == 8, "tests need the 8-device CPU mesh"
    return make_mesh(8)


def test_sharded_index_recall(mesh):
    rng = np.random.default_rng(42)
    n, nq, k = 1600, 20, 10
    pts = rng.integers(0, 2**32, size=(n, 32), dtype=np.uint32)
    qs = pts[:nq] ^ np.uint32(7)  # near-duplicate queries

    bf = Bruteforce("hamming")
    bf.extend(pts)
    gt = bf.build().knns(qs, k)

    opts = IndexOptions(host_warmup=0, ef_construction=48, connections=12, max_connections=24,
                        size=n, batch_size=64)
    idx = ShardedNSW.build(pts, opts, metric="hamming", mesh=mesh)
    assert idx.size() == n
    r = idx.knns(qs, k, ef=64)

    # global ids must come back correctly: the perturbed query's true NN is
    # its source point, which lives in a known shard
    ids = np.asarray(r.ids)
    assert (ids[:, 0] == np.arange(nq)).all()

    hits = 0
    for i in range(nq):
        hits += len(set(ids[i].tolist())
                    & set(np.asarray(gt.ids[i]).tolist()))
    # sharded search does ef per shard -> recall should be high
    assert hits / (nq * k) >= 0.8


def test_sharded_merge_is_sorted(mesh):
    rng = np.random.default_rng(1)
    pts = rng.integers(0, 2**32, size=(256, 32), dtype=np.uint32)
    idx = ShardedNSW.build(
        pts,
        IndexOptions(host_warmup=0, ef_construction=16, connections=8, max_connections=16,
                     size=256),
        metric="hamming",
        mesh=mesh,
    )
    r = idx.knns(pts[:4], 8, ef=16)
    d = np.asarray(r.dists)
    assert (np.diff(d, axis=1) >= 0).all()
    assert (d[:, 0] == 0).all()  # the point itself


def test_query_sharded_matches_single(mesh):
    rng = np.random.default_rng(9)
    n, nq = 500, 16
    pts = rng.integers(0, 2**32, size=(n, 32), dtype=np.uint32)
    qs = rng.integers(0, 2**32, size=(nq, 32), dtype=np.uint32)
    b = NSWBuilder(
        IndexOptions(host_warmup=0, ef_construction=32, connections=8, max_connections=16,
                     size=n),
        metric="hamming",
    )
    b.extend_batched(pts)
    nsw = b.build()
    single = nsw.knns(qs, 5, 32)
    sharded = knns_query_sharded(nsw, qs, 5, 32, mesh=mesh)
    np.testing.assert_array_equal(np.asarray(single.ids), np.asarray(sharded.ids))
    np.testing.assert_array_equal(np.asarray(single.dists), np.asarray(sharded.dists))
