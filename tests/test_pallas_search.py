"""Fused Pallas search kernel: layout goldens + exact equivalence with the
XLA packed beam path (interpret mode; the real-hardware path is exercised
by bench.py and was verified bit-exact on TPU)."""

import numpy as np
import jax
import jax.numpy as jnp
import pytest

from hnsw_itu_tpu.ops.metrics import get_metric
from hnsw_itu_tpu.ops.pallas_search import (
    LANES,
    fused_beam_search,
    fused_subrows,
    fused_width,
    materialize_fused,
    query_tiles,
)
from hnsw_itu_tpu.ops.search import batched_beam_search


def _random_graph(rng, cap, w, words):
    pts = rng.integers(0, 2**32, size=(cap, words), dtype=np.uint32)
    adj = np.full((cap, w), -1, np.int32)
    for i in range(cap):
        deg = rng.integers(w // 2, w + 1)
        adj[i, :deg] = rng.choice(cap, size=deg, replace=False)
    return pts, adj


def test_fused_table_layout():
    rng = np.random.default_rng(3)
    cap, w, words = 64, 16, 32
    pts, adj = _random_graph(rng, cap, w, words)
    ft = materialize_fused(jnp.asarray(pts), jnp.asarray(adj))
    table, ids = np.asarray(ft.data), np.asarray(ft.ids)
    W = fused_width(w)
    REP = LANES // W
    PA = LANES // W
    S = fused_subrows(W, words)
    assert S % 8 == 0  # exact (8, 128) tiling: no hidden pad or relayout
    assert table.shape == (cap, S, LANES)
    # pad subrows are zero
    assert (table[:, words // REP :, :] == 0).all()
    # packed-id plane: node e's ids at lanes (e % PA)*W..+W of row e // PA
    assert ids.shape == (cap // PA, 1, LANES)
    for e in (0, 13, cap - 1):
        lane0 = (e % PA) * W
        got = ids[e // PA, 0, lane0 : lane0 + W]
        assert (got[:w] == adj[e]).all()
        assert (got[w:] == -1).all()
    # data subrows: lane r*W + n = word s*REP + r of neighbor n
    safe = np.clip(adj, 0, cap - 1)
    for e in (0, 13, cap - 1):
        for s in (0, 1, words // REP - 1):
            for l in (0, 1, W - 1, W, LANES - 1):
                r, n = l // W, l % W
                want = pts[safe[e, n], s * REP + r] if n < w else 0
                assert table[e, s, l] == want, (e, s, l)


def test_query_tiles_layout():
    rng = np.random.default_rng(4)
    B, words, W = 4, 32, 16
    qs = rng.integers(0, 2**32, size=(B, words), dtype=np.uint32)
    qt = np.asarray(query_tiles(jnp.asarray(qs), W))
    REP = LANES // W
    assert qt.shape == (B, words // REP, LANES)
    for s in range(words // REP):
        for l in range(LANES):
            assert (qt[:, s, l] == qs[:, s * REP + l // W]).all()


@pytest.mark.parametrize("packed", ["never", "always"])
@pytest.mark.parametrize("w,ef", [(16, 24), (32, 64), (64, 48), (32, 32),
                                  (32, 16),
                                  (64, 96), (32, 128)])  # span-128 1q/row
def test_fused_matches_xla_packed(w, ef, packed):
    """Bit-exact equivalence with _beam_search_packed (dedup='beam',
    expand=1): distances, ids, visited counts, and step counts — for the
    single-query kernel and all packed spans (w/ef <= 32 -> span 32 =
    four queries per row; <= 64 -> span 64 = two; <= 128 -> span 128 =
    one query per full row, the 64 < ef <= 128 fast path)."""
    cap, words, B = 256, 32, 32
    rng = np.random.default_rng(w * 1000 + ef)
    pts, adj = _random_graph(rng, cap, w, words)
    qs = rng.integers(0, 2**32, size=(B, words), dtype=np.uint32)
    metric = get_metric("hamming")
    max_d = words * 32
    id_bits = max(1, (cap - 1).bit_length())

    pts_j, adj_j, qs_j = jnp.asarray(pts), jnp.asarray(adj), jnp.asarray(qs)
    ref = batched_beam_search(
        lambda ids: pts_j[ids], adj_j, qs_j, jnp.zeros((B,), jnp.int32),
        ef=ef, metric=metric, capacity=cap, expand=1, max_steps=256,
        dedup="beam",
    )

    table = materialize_fused(pts_j, adj_j)
    d0 = jnp.sum(
        jax.lax.population_count(qs_j ^ pts_j[0][None]), axis=1
    ).astype(jnp.int32)
    keys, vis, stp = fused_beam_search(
        table, qs_j, (d0 << id_bits) | 0, ef=ef, W=fused_width(w),
        words=words, id_bits=id_bits, max_d=max_d, max_steps=256,
        block_q=B, interpret=True, packed=packed,
    )
    kinf = (max_d + 1) << id_bits
    keys = np.asarray(keys)
    got_d = np.where(keys < kinf, keys >> id_bits, np.iinfo(np.int32).max)
    got_i = np.where(keys < kinf, keys & ((1 << id_bits) - 1),
                     np.iinfo(np.int32).max)
    np.testing.assert_array_equal(got_d[:, :ef], np.asarray(ref.dists))
    np.testing.assert_array_equal(got_i[:, :ef], np.asarray(ref.ids))
    np.testing.assert_array_equal(np.asarray(vis), np.asarray(ref.visited))
    np.testing.assert_array_equal(np.asarray(stp), np.asarray(ref.steps))


def test_fused_clamped_keys():
    """With id_bits past the raw-bound limit (the >2^20-id regime), the
    kernel clamps distances into the packed key and still matches the XLA
    path when no distance exceeds the clamp (low-diameter data)."""
    from hnsw_itu_tpu.ops.pallas_search import key_clamp

    cap, w, words, B, ef = 256, 16, 32, 32, 24
    id_bits = 25  # dist bits = 6 -> clamp = 62
    max_d = key_clamp(id_bits, words * 32)
    assert max_d == 62
    rng = np.random.default_rng(9)
    base = rng.integers(0, 2**32, size=(words,), dtype=np.uint32)
    flips = np.packbits(
        rng.random((cap, words * 32)) < 0.02, axis=-1
    ).view(np.uint32)  # ~20 bit flips -> pairwise distances <= ~45 < 62
    pts = base[None] ^ flips
    adj = np.full((cap, w), -1, np.int32)
    for i in range(cap):
        adj[i] = rng.choice(cap, size=w, replace=False)
    qs = pts[rng.integers(0, cap, size=B)]
    metric = get_metric("hamming")
    pts_j, adj_j, qs_j = jnp.asarray(pts), jnp.asarray(adj), jnp.asarray(qs)
    ref = batched_beam_search(
        lambda ids: pts_j[ids], adj_j, qs_j, jnp.zeros((B,), jnp.int32),
        ef=ef, metric=metric, capacity=cap, expand=1, max_steps=256,
        dedup="beam",
    )
    table = materialize_fused(pts_j, adj_j)
    d0 = jnp.sum(
        jax.lax.population_count(qs_j ^ pts_j[0][None]), axis=1
    ).astype(jnp.int32)
    keys, vis, stp = fused_beam_search(
        table, qs_j, (jnp.minimum(d0, max_d) << id_bits) | 0, ef=ef,
        W=fused_width(w), words=words, id_bits=id_bits, max_d=words * 32,
        max_steps=256, block_q=B, interpret=True,
    )
    kinf = (max_d + 1) << id_bits
    keys = np.asarray(keys)
    got_d = np.where(keys < kinf, keys >> id_bits, np.iinfo(np.int32).max)
    got_i = np.where(keys < kinf, keys & ((1 << id_bits) - 1),
                     np.iinfo(np.int32).max)
    np.testing.assert_array_equal(got_d[:, :ef], np.asarray(ref.dists))
    np.testing.assert_array_equal(got_i[:, :ef], np.asarray(ref.ids))
