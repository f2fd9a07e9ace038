"""NSW — single-layer navigable small world index.

Parity target: ``NSWBuilder`` / ``NSW`` (/root/reference/src/index/nsw.rs:
186-352). The first inserted point becomes the entry point (nsw.rs:300-313);
queries run one beam search from it and take the k best (nsw.rs:341-351).
Construction is the bulk-synchronous chunk loop of ``extend_parallel``
(nsw.rs:224-277) re-expressed as batched device steps (models/_build.py),
with a progressive chunk schedule replacing the 50k sequential warmup.
"""

from __future__ import annotations

import functools
import math
import os
from dataclasses import dataclass

import jax
import jax.numpy as jnp
import numpy as np

from ..graph import GraphArrays, make_graph
from ..ops.entry import sampled_entry, sampled_entry_topk
from ..ops.metrics import Metric, get_metric
from ..ops.search import batched_beam_search
from ..ops.topk import inverse_permutation
from . import _build
from .base import ID_INF, IndexOptions, KnnResult, LazyStats


def _pad_rows(x: np.ndarray, to: int):
    if x.shape[0] == to:
        return x
    pad = np.zeros((to - x.shape[0], *x.shape[1:]), x.dtype)
    return np.concatenate([x, pad], axis=0)


def _pad_rows_j(x: jax.Array, to: int) -> jax.Array:
    """Device-side row padding (no host round trip)."""
    if x.shape[0] == to:
        return x
    return jnp.concatenate(
        [x, jnp.zeros((to - x.shape[0], *x.shape[1:]), x.dtype)], axis=0
    )


def _dev_i32(obj, name: str, val: int) -> jax.Array:
    """Cached device scalar on ``obj``: a fresh ``jnp.int32(v)`` per knns
    batch is an eager device_put — a full tunnel upload on remote backends.
    ep/n are fixed once an index is built, so upload each value once."""
    cache = getattr(obj, "_scalar_cache", None)
    if cache is None:
        cache = obj._scalar_cache = {}
    hit = cache.get(name)
    if hit is None or hit[0] != val:
        hit = (val, jnp.int32(val))
        cache[name] = hit
    return hit[1]


def _trim_rows_j(x: jax.Array, to: int) -> jax.Array:
    """x[:to], skipping the identity slice: every EAGER device op is its
    own program dispatch, and on the remote tunnel backend a dispatch
    costs milliseconds — benches/exp_overhead.py measured ~16ms of
    identity slices wrapped around a 17ms kernel (a. vs f.)."""
    return x if x.shape[0] == to else x[:to]


@jax.jit
def _remap_ids_j(id_map, ids):
    """Map internal (reordered) ids to original dataset ids, preserving
    the ID_INF 'no result' sentinel (models/base.py)."""
    mapped = id_map[jnp.clip(ids, 0, id_map.shape[0] - 1)]
    return jnp.where(ids == ID_INF, ids, mapped)


def _fused_batch(b: int, max_block: int | None = None) -> tuple[int, int]:
    """(padded batch, block_q) for the fused kernel: the kernel requires
    batch % block_q == 0, so small batches round up to a power of two and
    large ones to a multiple of the block (a 1000-query batch must not
    error where the XLA path accepted it).

    Default block: 512 — the two-plane repack cut per-query VMEM scratch
    41% (16 data subrows, not the padded 24), which is what forced the
    round-2 retreat to 256. Overridable via HNSW_TPU_BLOCK_Q for sweeps."""
    if max_block is None:
        max_block = int(os.environ.get("HNSW_TPU_BLOCK_Q", 512))
    if b <= max_block:
        bp = 1 << max(0, (b - 1)).bit_length()
        return max(bp, 8), max(bp, 8)
    return -(-b // max_block) * max_block, max_block


@functools.partial(
    jax.jit,
    static_argnames=("k", "ef", "metric_name", "expand", "max_steps", "dedup",
                     "entry_sample", "tie_bits"),
)
def _query_step(points, adj, qs, ep, n=None, *, k, ef, metric_name, expand,
                max_steps, dedup="bitmask", entry_sample=0, tie_bits=0):
    metric = get_metric(metric_name)
    cap = adj.shape[0]
    if entry_sample > 0 and n is not None:
        eps = sampled_entry(points, qs, n, sample_size=entry_sample,
                            metric=metric)
    else:
        eps = jnp.full((qs.shape[0],), ep, jnp.int32)
    res = batched_beam_search(
        lambda ids: points[ids],
        adj,
        qs,
        eps,
        ef=max(ef, k),
        metric=metric,
        capacity=cap,
        expand=expand,
        max_steps=max_steps,
        dedup=dedup,
        tie_bits=tie_bits,
    )
    return res.dists[:, :k], res.ids[:, :k], res.visited, res.steps


@functools.partial(
    jax.jit,
    static_argnames=("k", "ef", "metric_name", "expand", "max_steps",
                     "entry_sample", "tie_bits"),
)
def _query_step_inline(points, adj, adj_pts, qs, ep, n=None, *, k, ef,
                       metric_name, expand, max_steps, entry_sample=0,
                       tie_bits=0):
    """Inline-neighbor query: each expansion reads one contiguous
    [W, words] row from adj_pts instead of W random point gathers."""
    metric = get_metric(metric_name)
    cap = adj.shape[0]
    if entry_sample > 0 and n is not None:
        eps = sampled_entry(points, qs, n, sample_size=entry_sample,
                            metric=metric)
    else:
        eps = jnp.full((qs.shape[0],), ep, jnp.int32)
    res = batched_beam_search(
        lambda ids: points[ids],
        adj,
        qs,
        eps,
        ef=max(ef, k),
        metric=metric,
        capacity=cap,
        expand=expand,
        max_steps=max_steps,
        dedup="beam",
        get_nbr_pts=lambda ids: adj_pts[ids],
        tie_bits=tie_bits,
    )
    return res.dists[:, :k], res.ids[:, :k], res.visited, res.steps


_TPU_HBM_BYTES = 15.75e9  # one v5e chip (docs/SCALE.md donation probe)


def _inline_budget(env_var: str, fixed_bytes: int) -> int:
    """Byte budget for an inline/fused/mini table: the env knob, capped on
    real hardware so the fixed live buffers (points/adjacency/spill/levels)
    + the table + a margin for the runtime reservation (~0.26GB) and
    dispatch temporaries (~0.7GB measured at 2M shapes) fit the chip.
    Without the cap a 10M build's donated set (4.5GB fixed + the table)
    exceeds HBM and OOMs mid-build (observed round 3)."""
    import os

    budget = int(float(os.environ.get(env_var, 1.1e10)))
    if jax.default_backend() in ("tpu", "axon"):
        hbm = float(os.environ.get("HNSW_TPU_HBM_BYTES", _TPU_HBM_BYTES))
        budget = min(budget, int(hbm - 1.6e9 - fixed_bytes))
    return budget


def _query_fixed_bytes(points, adj) -> int:
    """Live non-table bytes at query time: the point and adjacency arrays.
    Shape/dtype arithmetic (not .nbytes): the sharded path passes
    ShapeDtypeStructs when sizing per-shard tables."""
    return (int(np.prod(points.shape)) * points.dtype.itemsize
            + int(np.prod(adj.shape)) * adj.dtype.itemsize)


def _inline_query_fits(points, adj) -> bool:
    words = int(np.prod(points.shape[1:]))
    need = adj.shape[0] * adj.shape[1] * words * points.dtype.itemsize
    return need <= _inline_budget(
        "HNSW_TPU_INLINE_QUERY_BYTES", _query_fixed_bytes(points, adj))


def _fused_query_eligible(points, adj, metric) -> bool:
    """Can the fused Pallas kernel (ops/pallas_search.py) serve queries?
    Needs the Hamming packed-key path (static distance bound), a fusable
    adjacency width, an int32-packable (distance, id) key, and the fused
    table to fit the inline-memory budget."""
    import os

    from ..ops.pallas_search import LANES, fused_width

    if metric.name != "hamming" or points is None:
        return False
    if (jax.default_backend() not in ("tpu", "axon")
            and os.environ.get("HNSW_TPU_MINI_INTERPRET") != "1"):
        return False  # Mosaic kernel needs real TPU hardware (the env var
        # runs kernels in interpret mode for CI coverage — see
        # _mini_config_for)
    words = int(np.prod(points.shape[1:]))
    cap = adj.shape[0]
    try:
        W = fused_width(adj.shape[1])
    except ValueError:
        return False
    if words % (LANES // W) != 0:
        return False
    id_bits = max(1, (cap - 1).bit_length())
    from ..ops.pallas_search import fused_subrows, key_clamp

    # distances are clamped in-kernel to fit the packed key; require the
    # clamp to sit past HALF the metric bound (typical entry distances on
    # 1024-bit sketches are ~512) so ordering is intact where it matters
    if key_clamp(id_bits, words * 32) < words * 16:
        return False
    # the data table allocates fused_subrows per row (rounded UP to a
    # multiple of 8 for exact (8, 128) tiling) plus the packed-id plane
    need = cap * (fused_subrows(W, words) + 1 / (LANES // W)) * LANES \
        * points.dtype.itemsize
    return need <= _inline_budget(
        "HNSW_TPU_INLINE_QUERY_BYTES", _query_fixed_bytes(points, adj))


@functools.partial(
    jax.jit,
    static_argnames=("k", "ef", "metric_name", "max_steps", "entry_sample",
                     "W", "block_q", "sort_queries", "packed"),
)
def _query_step_fused(points, fused, qs, ep, n=None, *, k, ef, metric_name,
                      max_steps, entry_sample, W, block_q, eps=None,
                      sort_queries=None, packed="auto"):
    """Fused-kernel query step: sampled (or fixed) entry + packed init keys
    in XLA, then the whole beam loop in one Pallas kernel."""
    from ..ops.pallas_search import fused_beam_search, key_clamp

    metric = get_metric(metric_name)
    cap = fused.cap
    words = int(np.prod(points.shape[1:]))
    id_bits = max(1, (cap - 1).bit_length())
    max_d = key_clamp(id_bits, words * 32)
    if eps is None:
        if entry_sample > 0 and n is not None:
            eps = sampled_entry(points, qs, n, sample_size=entry_sample,
                                metric=metric)
        else:
            eps = jnp.full((qs.shape[0],), ep, jnp.int32)
    d0 = jax.vmap(lambda q, p: metric.one_to_many(q, p[None])[0])(
        qs, points[eps]
    ).astype(jnp.int32)
    # sort the batch by entry distance: lockstep blocks terminate at their
    # slowest member, and entry distance predicts search depth — grouping
    # shallow queries together lets whole blocks exit early (the divergence
    # cost is >10x on clustered data, benches/RESULTS.md).
    # sort_queries (static): None = HNSW_TPU_SORT_QUERIES env (default on).
    # Perf experiments pass it explicitly — a changed static retraces, an
    # env flip after first trace of a shape would silently be ignored.
    if sort_queries is None:
        sort_q = os.environ.get("HNSW_TPU_SORT_QUERIES", "1") != "0"
    else:
        sort_q = bool(sort_queries)
    if sort_q:
        order = jnp.argsort(d0)
        inv = inverse_permutation(order)
        qs, d0, eps = qs[order], d0[order], eps[order]
    init = (jnp.minimum(d0, max_d) << id_bits) | eps
    keys, vis, stp = fused_beam_search(
        fused, qs, init, ef=max(ef, k), W=W, words=words, id_bits=id_bits,
        max_d=max_d, max_steps=max_steps, block_q=block_q, packed=packed,
        interpret=os.environ.get("HNSW_TPU_MINI_INTERPRET") == "1",
    )
    if sort_q:
        keys, vis, stp = keys[inv], vis[inv], stp[inv]
    kinf = (max_d + 1) << id_bits
    valid = keys < kinf
    d = jnp.where(valid, keys >> id_bits, metric.inf)
    i = jnp.where(valid, keys & ((1 << id_bits) - 1), ID_INF)
    return d[:, :k], i[:, :k], vis, stp


def _mini_config_for(points, adj, metric) -> tuple[int, int]:
    """(W, mini_words) for the inline mini table (ops/pallas_dma_search.py)
    under the inline-memory budget, or (0, 0) when the mini path cannot
    serve queries. The mini table is the >fused-limit regime: the fused
    table (~8.5KB/node) stops fitting HBM past ~1.3M nodes, while the mini
    rows (512B-2KB/node) carry ids + truncated sketches for
    estimated-distance search with an exact rerank.

    At EQUAL row bytes, estimate bits beat edge count (200k hardware
    shootout, benches/validate_miniw.py: W=32/mw=7 recall 0.9375 at ef=96
    vs W=64/mw=3 at 0.8460; W=32/mw=15 0.9422 at ef=64 vs W=64/mw=7
    0.8027; and at 2M, W=64/mw=15 measured only 0.7056 at ef=64 —
    480-bit estimates scramble ranking inside dense clusters) — so the
    graph row is TRUNCATED to its first W edges (the diversity-selected
    forward edges come first) to buy prefix words, all the way up to
    mw=31 (W=32: 992 of 1024 bits, estimate error ~2 bits = near-exact).
    Policy: the highest mini_words that fits, widest W at equal mw; W
    floors at 32 (below that the truncation cuts into the m=24 forward
    edges and navigation degrades)."""
    import os

    from ..ops.pallas_dma_search import LANES, fused_width_, mini_subrows

    if metric.name != "hamming" or points is None:
        return 0, 0
    if (jax.default_backend() not in ("tpu", "axon")
            and os.environ.get("HNSW_TPU_MINI_INTERPRET") != "1"):
        # HNSW_TPU_MINI_INTERPRET=1 runs the mini kernels in Pallas
        # interpret mode on any backend (test/CI coverage of the full
        # mini query path; far too slow for real workloads)
        return 0, 0
    words = int(np.prod(points.shape[1:]))
    cap = adj.shape[0]
    try:
        Wfull = fused_width_(adj.shape[1])
    except ValueError:
        return 0, 0
    budget = _inline_budget(
        "HNSW_TPU_INLINE_QUERY_BYTES", _query_fixed_bytes(points, adj))
    best = (0, 0)  # (mw, W), lexicographic
    for W in (64, 32):
        if W > Wfull:
            continue
        for mw in range(min(words, 31), 0, -1):
            if (1 + mw) % (LANES // W) != 0:
                continue
            try:
                S = mini_subrows(W, mw)
            except ValueError:
                continue
            if cap * S * LANES * 4 <= budget:
                best = max(best, (mw, W))
                break
    return best[1], best[0]


@functools.partial(
    jax.jit,
    static_argnames=("k", "ef", "metric_name", "max_steps", "entry_sample",
                     "W", "mini_words", "block_q", "hop", "entry_beams",
                     "tie_bits"),
)
def _query_step_mini(points, mini, qs, ep, n=None, *, k, ef, metric_name,
                     max_steps, entry_sample, W, mini_words, block_q,
                     eps=None, adj=None, hop=0, entry_beams=1, tie_bits=0):
    """Mini-kernel query step: sampled entry + PREFIX entry distances in
    XLA, estimated-distance beam search in one Pallas kernel (one DMA per
    expansion from the inline mini table), then an exact full-sketch
    rerank of the whole final beam. The >1.3M-node regime where no exact
    fused table fits HBM (docs/SCALE.md). ``hop`` > 0 adds the one-hop
    expansion rerank (rerank_onehop) seeded by the ``hop`` exact-best
    beam ids — the recall equalizer when mini_words is small.
    ``entry_beams`` > 1 seeds each query's beam with the top-B of the MXU
    entry sample (free in the already-paid dense block). ``tie_bits`` > 0
    orders beam ties by bit-reversed id (required for recall on
    BFS-reordered tables; ops/pallas_dma_search.bitrev_ids)."""
    from ..ops.pallas_dma_search import (IINF, mini_beam_search,
                                         rerank_exact, rerank_onehop)

    metric = get_metric(metric_name)
    B = qs.shape[0]
    E = max(1, entry_beams)
    if eps is None:
        if entry_sample > 0 and n is not None:
            if E > 1:
                eps, _ = sampled_entry_topk(
                    points, qs, n, sample_size=entry_sample, beams=E,
                    metric=metric,
                )
            else:
                eps = sampled_entry(points, qs, n,
                                    sample_size=entry_sample,
                                    metric=metric)[:, None]
        else:
            # no sample to draw distinct seeds from: single global ep
            eps = jnp.full((B, 1), ep, jnp.int32)
    else:
        eps = eps[:, None] if eps.ndim == 1 else eps
    # PREFIX distances of every seed (the kernel beams rank on estimates)
    sp = points[eps].reshape(B, eps.shape[1], -1)[:, :, :mini_words]
    qp = qs.reshape(B, 1, -1)[:, :, :mini_words]
    d0 = jnp.sum(
        jax.lax.population_count(sp ^ qp), axis=2
    ).astype(jnp.int32)  # [B, E']
    # entry-distance sort: see _query_step_fused
    order = jnp.argsort(jnp.min(d0, axis=1))
    inv = inverse_permutation(order)
    outd, outi, vis, stp = mini_beam_search(
        mini, qs[order], d0[order], eps[order], ef=max(ef, k), W=W,
        mini_words=mini_words, max_steps=max_steps, block_q=block_q,
        interpret=os.environ.get("HNSW_TPU_MINI_INTERPRET") == "1",
        tie_bits=tie_bits,
    )
    if hop > 0 and adj is not None:
        dk, ik = rerank_onehop(points, adj, qs[order], outi, k=k, seeds=hop)
    else:
        dk, ik = rerank_exact(points, qs[order], outi, k=k)
    valid = ik < IINF
    d = jnp.where(valid, dk, metric.inf)[inv]
    i = jnp.where(valid, ik, ID_INF)[inv]
    return d, i, vis[inv], stp[inv]


@functools.partial(jax.jit, static_argnames=("inline_words",))
def _materialize_inline(points, adj, inline_words: int = 0):
    """Inline neighbor rows, stored FLAT [cap, W*words]: a trailing dim of
    W*words (e.g. 64*32 = 2048 = 16 lane tiles) keeps the natural TPU
    layout; a 3-D [cap, W, words] layout pads 2x and forces whole-table
    relayout copies (measured: 15GB copy + OOM at 1M x 64 x 32).

    ``inline_words`` > 0 stores TRUNCATED prefixes (the large-N build
    regime; see _build.search_select).

    Tiled: the naive one-shot gather materializes a [cap*W, words]
    intermediate whose narrow lane dim pads 4x (32GB at 1M)."""
    cap, W = adj.shape
    words = int(np.prod(points.shape[1:]))
    mw = inline_words or words
    tile = max(1, min(cap, 16384))
    n_tiles = -(-cap // tile)
    out = jnp.zeros((cap, W * mw), points.dtype)

    def body(i, out):
        start = i * tile  # dynamic_slice clamps the tail tile (overlap ok)
        a = jax.lax.dynamic_slice_in_dim(adj, start, tile, 0)
        g = points[jnp.clip(a, 0, points.shape[0] - 1)]
        g = g.reshape(tile, W, words)[:, :, :mw]
        return jax.lax.dynamic_update_slice(
            out, g.reshape(tile, W * mw), (start, 0)
        )

    return jax.lax.fori_loop(0, n_tiles, body, out)


class NSW:
    """Immutable search-side index."""

    def __init__(self, points, n, graph: GraphArrays, ep, metric, opts=None):
        self.points = points
        self.n = int(n)
        self.graph = graph
        self.ep = int(ep) if ep is not None else None
        self.metric = get_metric(metric) if isinstance(metric, str) else metric
        self.opts = opts or IndexOptions()
        self.query_expand = 1
        self.query_batch = 1024
        self.query_dedup = "bitmask"
        self.query_entry_sample = 0  # >0: MXU sampled entry (ops/entry.py)
        self.query_entry_beams = 1  # >1: seed the beam with the sample's
        # top-B (mini path; needs query_entry_sample > 0)
        self.query_hop = 0  # >0: one-hop exact rerank seeds (mini path)
        # mini-path tie order: "auto" = bit-reversed ids iff the index was
        # BFS-reordered (plain id ties there keep entry-proximal nodes and
        # cost ~5 recall points at 10M — docs/SCALE.md); "id" / "bitrev"
        # pin either order for A/B runs
        self.query_tie = "auto"
        self.max_steps = None  # None = auto (2*ef, the measured safe cap)
        self.use_pallas = True  # fused kernel when eligible
        self.last_stats = None
        self.adj_pts = None
        self.fused = None  # fused Pallas table (ops/pallas_search.py)
        self.mini = None  # inline mini table (ops/pallas_dma_search.py)
        self.mini_words = 0
        self.mini_W = 0
        self.id_map = None  # int32[cap] new->original id (set by reorder)

    def size(self) -> int:
        return self.n

    def reorder(self, order: str = "bfs") -> None:
        """Relabel nodes for HBM locality (ops/reorder.py): BFS rank from
        the entry point becomes the new id, so each expansion's neighbor
        rows sit near the expanded node in the point/adjacency/inline
        tables. Pure isomorphic relabel — results are mapped back to
        original dataset ids through ``id_map`` inside ``knns``. Call
        BEFORE ``enable_inline()`` (tables are built from the reordered
        arrays). On a remote backend this fetches the live adjacency to
        the host once (~130 MB per million nodes at W=32)."""
        if order != "bfs":
            raise ValueError(f"unknown reorder {order!r}; known: bfs")
        if self.ep is None or self.n <= 1:
            return
        if self.fused is not None or self.mini is not None:
            raise ValueError(
                "reorder before enable_inline(): the fused/mini tables "
                "embed node ids and are materialized from the reordered "
                "arrays"
            )
        from ..ops.reorder import bfs_order, full_permutation, window_shuffle

        adj_np = np.asarray(self.graph.adj[: self.n])
        order = bfs_order(adj_np, self.n, self.ep)
        # ops escape hatch: shuffle ranks within windows to break the
        # rank<->geometry tie bias while keeping locality (see
        # ops/reorder.window_shuffle); 0 disables
        win = int(os.environ.get("HNSW_TPU_REORDER_SHUFFLE", 0))
        order = window_shuffle(order, win)
        perm, inv = full_permutation(order, self.graph.capacity)
        self._apply_perm(jnp.asarray(perm), jnp.asarray(inv))

    def _apply_perm(self, permj, invj) -> None:
        from ..ops.reorder import permute_base

        self.points, adj, deg, self.adj_pts = permute_base(
            self.points, self.graph.adj, self.graph.deg, self.adj_pts,
            permj, invj,
        )
        self.graph = GraphArrays(adj, deg)
        self.ep = int(invj[self.ep])
        # id_map composes: existing (new->orig) permuted by the new perm
        self.id_map = (
            permj if self.id_map is None else self.id_map[permj]
        )

    def _steps_cap(self, ef: int) -> int:
        # stragglers past ~ef expansions contribute no recall (measured)
        # but gate the whole lockstep batch; 2*ef is a safe margin
        return self.max_steps if self.max_steps else max(2 * ef, 64)

    def _tie_bits(self) -> int:
        """Resolved tie-decorrelation bits for the mini kernels: 0 = plain
        (d, id) order; >0 = order ties by bit-reversed id. "auto" turns it
        on exactly when the index was reordered (id_map set) — plain-order
        tables break ties randomly w.r.t. geometry already, while BFS rank
        makes low id = entry-proximal (measured -5 recall points,
        docs/SCALE.md)."""
        tie = self.query_tie
        if tie == "id" or (tie == "auto" and self.id_map is None):
            return 0
        if tie not in ("auto", "bitrev"):
            raise ValueError(f"unknown query_tie {tie!r}")
        return max(1, (self.graph.capacity - 1).bit_length())

    def enable_inline(self) -> None:
        """Materialize the fast-query tables: the fused Pallas table when
        the kernel is eligible (Hamming, packable keys), else adj_pts (flat
        inline neighbor rows) for the XLA sequential-read path. Either
        costs ~W x points memory; pays off on query throughput (HBM
        gathers of 128B rows are descriptor-bound). Queries are read-only
        (single copy), so the limit is higher than the build-side one.
        No-op if it would not fit — and idempotent: one table, built once."""
        if self.fused is not None or self.mini is not None:
            return
        if (
            self.use_pallas
            and self.fused is None
            and _fused_query_eligible(self.points, self.graph.adj, self.metric)
        ):
            from ..ops.pallas_search import materialize_fused

            self.fused = materialize_fused(self.points, self.graph.adj)
            return
        if self.use_pallas and self.fused is None and self.mini is None:
            W, mw = _mini_config_for(self.points, self.graph.adj, self.metric)
            if mw > 0:
                from ..ops.pallas_dma_search import materialize_mini

                self.mini = materialize_mini(
                    self.points, self.graph.adj[:, :W], mini_words=mw
                )
                self.mini_words = mw
                self.mini_W = W
                return
        if self.adj_pts is None and _inline_query_fits(self.points, self.graph.adj):
            self.adj_pts = _materialize_inline(self.points, self.graph.adj)

    def search(self, query, k: int, ef: int) -> KnnResult:
        r = self.knns(np.asarray(query)[None], k, ef)
        return KnnResult(r.dists[0], r.ids[0])

    def knns(self, queries, k: int, ef: int) -> KnnResult:
        """Batched queries — the rayon par_iter analogue
        (src/index/mod.rs:27-43): queries become a leading array axis.
        Uploaded to the device ONCE; batches are sliced on device (a
        per-batch host->device hop costs a full tunnel round trip on
        remote backends)."""
        if self.ep is None:
            raise ValueError("empty index")
        qs = queries if isinstance(queries, jax.Array) else jnp.asarray(
            np.asarray(queries)
        )
        nq = qs.shape[0]
        B = self.query_batch
        out_d, out_i, out_v, out_s = [], [], [], []
        # the fused kernel is fixed expand=1; a user-set query_expand falls
        # back to the XLA path (query_dedup is subsumed: the kernel's
        # beam-dedup measures recall-equal to bitmask at equal ef)
        use_fused = (
            self.fused is not None
            and max(ef, k) <= 128
            and self.query_expand == 1
        )
        use_mini = (
            not use_fused
            and self.mini is not None
            and max(ef, k) <= 128
            and self.query_expand == 1
        )
        for s in range(0, nq, B):
            q = qs if nq <= B else qs[s : s + B]
            b = q.shape[0]
            if use_fused or use_mini:
                bp, block_q = _fused_batch(b)
            else:
                bp = b if b == B else 1 << (b - 1).bit_length()
            qb = _pad_rows_j(q, bp)
            if use_mini:
                d, i, vis, st = _query_step_mini(
                    self.points,
                    self.mini,
                    jnp.asarray(qb),
                    _dev_i32(self, "ep", self.ep),
                    _dev_i32(self, "n", self.n),
                    k=k,
                    ef=ef,
                    metric_name=self.metric.name,
                    max_steps=self._steps_cap(ef),
                    entry_sample=self.query_entry_sample,
                    W=self.mini_W,
                    mini_words=self.mini_words,
                    block_q=block_q,
                    adj=self.graph.adj,
                    hop=self.query_hop,
                    entry_beams=self.query_entry_beams,
                    tie_bits=self._tie_bits(),
                )
            elif use_fused:
                from ..ops.pallas_search import fused_width

                d, i, vis, st = _query_step_fused(
                    self.points,
                    self.fused,
                    jnp.asarray(qb),
                    _dev_i32(self, "ep", self.ep),
                    _dev_i32(self, "n", self.n),
                    k=k,
                    ef=ef,
                    metric_name=self.metric.name,
                    max_steps=self._steps_cap(ef),
                    entry_sample=self.query_entry_sample,
                    W=fused_width(self.graph.width),
                    block_q=block_q,
                )
            elif self.adj_pts is not None:
                d, i, vis, st = _query_step_inline(
                    self.points,
                    self.graph.adj,
                    self.adj_pts,
                    jnp.asarray(qb),
                    _dev_i32(self, "ep", self.ep),
                    _dev_i32(self, "n", self.n),
                    k=k,
                    ef=ef,
                    metric_name=self.metric.name,
                    expand=self.query_expand,
                    max_steps=self._steps_cap(ef),
                    entry_sample=self.query_entry_sample,
                    tie_bits=self._tie_bits(),
                )
            else:
                d, i, vis, st = _query_step(
                    self.points,
                    self.graph.adj,
                    jnp.asarray(qb),
                    _dev_i32(self, "ep", self.ep),
                    _dev_i32(self, "n", self.n),
                    k=k,
                    ef=ef,
                    metric_name=self.metric.name,
                    expand=self.query_expand,
                    max_steps=self._steps_cap(ef),
                    dedup=self.query_dedup,
                    entry_sample=self.query_entry_sample,
                    tie_bits=self._tie_bits(),
                )
            # stay on device: fetching results through a remote host
            # tunnel costs ~1ms/100KB on top of a ~25ms RTT
            # (benches/exp_overhead.py) — callers np.asarray exactly what
            # they consume (usually just ids), stats fetch lazily
            out_d.append(_trim_rows_j(d, b))
            out_i.append(_trim_rows_j(i, b))
            out_v.append(_trim_rows_j(vis, b))
            out_s.append(_trim_rows_j(st, b))
        cat = (lambda xs: xs[0] if len(xs) == 1 else jnp.concatenate(xs))
        self.last_stats = LazyStats(cat(out_v), cat(out_s), nq)
        ids = cat(out_i)
        if self.id_map is not None:  # reordered index: original ids out
            ids = _remap_ids_j(self.id_map, ids)
        return KnnResult(cat(out_d), ids)


class NSWBuilder:
    """Batched construction (extend_parallel parity, nsw.rs:224-277)."""

    def __init__(self, options: IndexOptions | None = None, metric="hamming"):
        self.opts = options or IndexOptions()
        if self.opts.size <= 0:
            raise ValueError("IndexOptions.size must be set (preallocation)")
        self.metric = get_metric(metric) if isinstance(metric, str) else metric
        self.n = 0
        self.ep = None
        self.points = None  # allocated on first extend
        self.graph = make_graph(self.opts.size, self.opts.max_connections)
        self._node_map = jnp.arange(self.opts.size, dtype=jnp.int32)
        self.adj_pts = None  # inline rows maintained during the build
        self.inline_words = 0  # >0: adj_pts holds truncated prefixes
        self.spill = _build.make_spill(self.opts.size)  # overflow recovery
        self.edge_drops = []  # per-chunk reverse-edge drop counts (device)
        self._sealed = False  # set by a reorder build; see _check_unsealed

    def total_edge_drops(self) -> int:
        """Reverse edges lost to full rows across the whole build
        (unrecoverable by the prune pass; see _build.apply_inserts)."""
        return int(sum(int(np.asarray(d)) for d in self.edge_drops))

    def _grow_capacity(self, need: int) -> None:
        """Vec-growth parity (the reference's graph grows on push,
        simplegraph.rs:82-87): when extend passes the preallocated
        capacity, reallocate at the next power-of-two >= need and
        continue instead of raising. Static-shape kernels recompile once
        per doubling — the same amortized-copy contract as a Vec realloc.
        The inline-row width (``inline_words``) chosen at first
        allocation is kept: re-evaluating the budget at the new size
        could shrink the prefix mid-build and mix estimate precisions in
        one graph. Shared by HNSWBuilder (base layer; its level arrays
        already grow via _grow_level)."""
        import dataclasses

        cap = self.opts.size
        new = max(1, cap)
        while new < need:
            new *= 2
        if new == cap:
            return
        pad = new - cap
        self.opts = dataclasses.replace(self.opts, size=new)
        self._node_map = jnp.arange(new, dtype=jnp.int32)
        is_nsw = hasattr(self, "graph")
        g = self.graph if is_nsw else self.base
        g = GraphArrays(
            jnp.concatenate(
                [g.adj, jnp.full((pad, g.adj.shape[1]), -1, jnp.int32)]
            ),
            jnp.concatenate([g.deg, jnp.zeros((pad,), jnp.int32)]),
        )
        if is_nsw:
            self.graph = g
        else:
            self.base = g
        # spill is [cap+1, X] with the scatter junk row LAST; the old junk
        # row holds garbage and must NOT become node ``cap``'s live spill
        X = self.spill.shape[1]
        self.spill = jnp.concatenate(
            [self.spill[:-1], jnp.full((pad + 1, X), -1, jnp.int32)]
        )
        if self.points is not None:
            self.points = jnp.concatenate([
                self.points,
                jnp.zeros((pad, *self.points.shape[1:]), self.points.dtype),
            ])
        if self.adj_pts is not None:
            self.adj_pts = jnp.concatenate([
                self.adj_pts,
                jnp.zeros((pad, self.adj_pts.shape[1]), self.adj_pts.dtype),
            ])

    # -- allocation ---------------------------------------------------------
    def _inline_build_words(self, sample: np.ndarray) -> int:
        """Width (in point words) of the inline build rows: full sketches
        when they fit the build budget, else the widest TRUNCATED prefix
        that does (construction searches then run on estimated distances
        with an exact re-score before select — see _build.search_select),
        else 0 (no inline buffer; searches pay random gathers)."""
        words = int(np.prod(sample.shape[1:]))
        # the runtime ALIASES donated buffers (benches/validate_donation.py
        # round-3 probe: 14GB donated update-in-place ran copy-free), so
        # adj_pts mutations do NOT transiently hold two generations and the
        # build budget matches the query-side one. Build quality is very
        # sensitive to this width: at 2M, the old 6e9 budget truncated to
        # mw=11 (352-bit estimates) and exact-path recall fell 0.89->0.60.
        # The donated fixed set rides alongside the inline rows, so cap the
        # budget to what the chip can actually hold (points + adj + deg +
        # spill + temporaries margin).
        fixed = self.opts.size * (
            words * sample.dtype.itemsize
            + self.opts.max_connections * 4  # adj rows
            + 4                              # deg
            + 32                             # spill (8 x int32 / row)
        )
        # HNSW: level arrays ride alongside (HNSWBuilder._extra_fixed_bytes)
        fixed += getattr(self, "_extra_fixed_bytes", lambda: 0)()
        budget = _inline_budget("HNSW_TPU_INLINE_BUILD_BYTES", fixed)
        per_word = (
            self.opts.size * self.opts.max_connections * sample.dtype.itemsize
        )
        if words * per_word <= budget:
            return words
        mw = int(budget // per_word)
        if jax.default_backend() in ("tpu", "axon"):
            # UNALIGNED flat widths pay a whole-table re-layout copy per
            # chunk dispatch (the search gather wants row-major tiled,
            # padding W*mw up to the 128-element lane tile — measured
            # 11.3GB extra at 2M/mw=21, docs/SCALE.md layout audit).
            # Lane-aligned widths compile copy-free: round down.
            W = self.opts.max_connections
            align = 128 // math.gcd(W, 128)
            mw_aligned = (mw // align) * align
            if mw_aligned >= 2:
                mw = mw_aligned
            else:
                # no aligned width fits: budget the padded copy too
                mw = int(budget // (2 * per_word))
        # below 64 prefix bits the estimates are too noisy to steer the
        # beam; fall back to the gather path instead of a bad graph
        return mw if mw >= 2 else 0

    def _inline_build_fits(self, sample: np.ndarray) -> bool:
        return self._inline_build_words(sample) == int(
            np.prod(sample.shape[1:])
        )

    def _ensure_points(self, sample: np.ndarray):
        self._check_unsealed()
        if self.points is None:
            self.points = jnp.zeros(
                (self.opts.size, *sample.shape[1:]), dtype=sample.dtype
            )
            words = int(np.prod(sample.shape[1:]))
            mw = self._inline_build_words(sample)
            self.inline_words = 0 if mw == words else mw
            if mw > 0:
                self.adj_pts = jnp.zeros(
                    (self.opts.size, self.opts.max_connections * mw),
                    dtype=sample.dtype,
                )

    # -- IndexBuilder parity ---------------------------------------------------
    def add(self, point) -> None:
        self.extend(np.asarray(point)[None], sequential=True)

    def extend(self, points, sequential: bool = True) -> None:
        """Sequential insert loop (Extend parity, nsw.rs:279-285): chunks of
        one point; exact reference insert ordering."""
        pts = np.asarray(points)
        self._ensure_points(pts)
        if sequential:
            for row in pts:
                self._insert_chunk(row[None])
        else:
            self.extend_batched(pts)

    def extend_batched(self, points, progress=None) -> None:
        """extend_parallel parity: host-native sequential warmup
        (nsw.rs:234-235), then progressive batched search-then-mutate
        chunks. ``progress`` (optional) is called with the running row
        count after the warmup and after every chunk."""
        pts = np.asarray(points)
        self._ensure_points(pts)
        off = self._host_warmup(pts)
        if off and progress:
            progress(off)
        if self.ep is None and pts.shape[0] > off:
            self._insert_chunk(pts[off : off + 1])
            off += 1
        max_chunk = self.opts.batch_size * 16
        sched = _build.chunk_schedule(
            self.n, pts.shape[0] - off, max_chunk=max_chunk
        )
        i = 0
        while i < len(sched):
            c = sched[i]
            G = self._scan_group(sched, i, max_chunk)
            if G > 1:
                self._insert_chunks_scanned(pts[off : off + G * c], G, c)
            else:
                self._insert_chunk(pts[off : off + c])
            off += G * c
            i += G
            if progress:
                progress(off)

    def _scan_group(self, sched, i: int, max_chunk: int) -> int:
        """Scanned-dispatch group size at schedule position i
        (_build.scan_group_at; also used unbound by HNSWBuilder)."""
        if not NSWBuilder._scanned_fits(self):  # unbound: HNSWBuilder too
            return 1
        return _build.scan_group_at(
            sched, i, max_chunk, self.opts.scan_group,
            entry_ready=(self.opts.entry_sample > 0
                         and self.n > self.opts.entry_sample),
        )

    def _scanned_fits(self) -> bool:
        """Scanned G-chunk dispatch compiles an HLO temp re-tiling the
        inline table into the gather-preferred (row-contiguous) layout —
        measured 7.63GB `copy(bitcast)` at 1M full-inline rows (round-3
        bench1m compile OOM: 16.16G of 15.75G). Per-chunk dispatches
        gather straight from the argument layout with no such copy, so
        when live buffers + the copy exceed the chip, fall back to
        per-chunk (G=1)."""
        if self.adj_pts is None or jax.default_backend() not in (
            "tpu", "axon"
        ):
            return True
        import os

        g = self.graph if hasattr(self, "graph") else self.base
        live = (self.points.nbytes + g.adj.nbytes + g.deg.nbytes
                + self.spill.nbytes + self.adj_pts.nbytes)
        hbm = float(os.environ.get("HNSW_TPU_HBM_BYTES", _TPU_HBM_BYTES))
        return live + self.adj_pts.nbytes + 1.0e9 <= hbm

    def _insert_chunks_scanned(self, chunk: np.ndarray, G: int, c: int):
        """G full equal chunks in ONE dispatch (_build.chunk_steps_scanned)
        — bit-identical to G ``_insert_chunk`` calls, minus G-1 donation
        copies and round trips."""
        if self.n + G * c > self.opts.size:
            self._grow_capacity(self.n + G * c)
        n0 = self.n
        S = min(self.opts.batch_size, c)
        (self.points, self.graph, self.adj_pts, self.spill,
         dropped) = _build.chunk_steps_scanned(
            self.points,
            self._node_map,
            self.graph,
            self.adj_pts,
            self.spill,
            jnp.asarray(chunk),
            jnp.asarray(n0 + np.arange(G * c, dtype=np.int32)),
            jnp.asarray(n0 + c * np.arange(G, dtype=np.int32)),
            G=G,
            cp=c,
            S=S,
            efc=self.opts.ef_construction,
            m=self.opts.connections,
            metric_name=self.metric.name,
            expand=self.opts.expand,
            prune_budget=min(self.opts.size,
                             max(self.opts.prune_budget, c)),
            entry_sample=self.opts.entry_sample,
            inline_words=self.inline_words,
        )
        self.n += G * c
        self.edge_drops.append(dropped)
        if self.adj_pts is not None and self.adj_pts.nbytes > 1 << 30:
            # throttle queue-ahead dispatch (see _insert_chunk)
            np.asarray(self.graph.deg[:1])

    def _host_warmup(self, pts: np.ndarray) -> int:
        """Insert the first ``host_warmup`` points on the CPU with exact
        reference insert semantics (native/hnsw_host.cpp), then upload."""
        from .. import native

        warm = min(self.opts.host_warmup, pts.shape[0])
        if (
            self.n > 0
            or warm < 2
            or self.metric.name not in native.METRIC_CODE
            or not native.available()
        ):
            return 0
        cap, W = self.opts.size, self.opts.max_connections
        pts_np = np.zeros((cap, *pts.shape[1:]), pts.dtype)
        pts_np[:warm] = pts[:warm]
        adj_np = np.full((cap, W), -1, np.int32)
        deg_np = np.zeros((cap,), np.int32)
        native.host_build(
            pts_np, self.metric.name, adj_np, deg_np, 1, warm,
            m=self.opts.connections, efc=self.opts.ef_construction, ep=0,
        )
        # free the pre-warmup zero buffers BEFORE uploading replacements:
        # nothing queued references them yet, and holding old+new doubles
        # peak HBM — at 2M/mw=21 the inline rows alone are 10.7GB, so two
        # generations OOM a 16GB chip (observed round 3)
        self.points.delete()
        self.points = jnp.asarray(pts_np)
        self.graph.adj.delete()
        self.graph.deg.delete()
        self.graph = GraphArrays(jnp.asarray(adj_np), jnp.asarray(deg_np))
        if self.adj_pts is not None:
            self.adj_pts.delete()
            self.adj_pts = _materialize_inline(
                self.points, self.graph.adj, self.inline_words
            )
        self.ep = 0
        self.n = warm
        return warm

    def _check_unsealed(self) -> None:
        """A reorder build permutes the builder's arrays into the NEW id
        space and sets a fresh id_map on the index; re-running build() (or
        extending) would reorder the already-permuted arrays and emit an
        id_map into the FIRST relabel's space — knns would then silently
        return wrong ids (ADVICE round 4). Refuse instead."""
        if self._sealed:
            raise RuntimeError(
                "builder is sealed after a reorder build: further "
                "extend/build would compose relabels and corrupt the "
                "id_map; create a new builder (or set reorder=False and "
                "call index.reorder() yourself)"
            )

    def build(self) -> NSW:
        self._check_unsealed()
        self._drain_spill()
        # spill entries never drained by a prune are lost for good: count
        # them as drops so the logged rate stays honest
        self.edge_drops.append(jnp.sum((self.spill[:-1] >= 0).astype(jnp.int32)))
        nsw = NSW(self.points, self.n, self.graph, self.ep, self.metric,
                  self.opts)
        had_inline = self.adj_pts is not None
        if had_inline:
            # drain the async build queue first: pending chunk steps still
            # reference the old buffer and deleting/reallocating under them
            # doubles peak memory (OOMs at 1M)
            np.asarray(self.graph.deg[:1])
            # free the builder's scatter-chain copy BEFORE any relabel —
            # reorder's permutation temporaries must not coexist with the
            # truncated build buffer (~10GB at 10M) — then rebuild fresh
            # from points+adj: peak memory stays at one copy and the fresh
            # array carries the gather-preferred layout
            self.adj_pts.delete()
            self.adj_pts = None
        if self.opts.reorder:
            nsw.reorder()  # BEFORE tables: they build from reordered arrays
            # resync the builder to the relabeled arrays — otherwise it
            # pins the pre-permute points/adjacency for its lifetime
            # alongside the new query tables (see HNSWBuilder.build).
            self.points, self.graph, self.ep = nsw.points, nsw.graph, nsw.ep
            self.spill = jnp.full_like(self.spill, -1)
            self._sealed = True
        if had_inline:
            nsw.enable_inline()  # fused table (or fresh inline rows)
        return nsw

    # -- internals ------------------------------------------------------------
    def _drain_spill(self, max_passes: int = 4):
        """Prune-only passes that consume leftover spill entries. A chunk
        whose new spills outnumber its prune budget defers them (boosted
        rows drain in the NEXT chunk's prune) — after the last chunk there
        is no next chunk, so drain explicitly before sealing the index."""
        if self.points is None:
            return
        budget = min(self.opts.size,
                     max(self.opts.prune_budget, self.opts.batch_size * 16))
        for _ in range(max_passes):
            if not bool(np.asarray(jnp.any(self.spill[:-1] >= 0))):
                break
            self.graph, self.adj_pts, self.spill, _ = _build.apply_inserts(
                self.points, self._node_map, self.graph,
                jnp.full((1,), -1, jnp.int32),
                jnp.full((1, 1), -1, jnp.int32),
                self.adj_pts, self.spill,
                metric_name=self.metric.name, prune_budget=budget,
                inline_words=self.inline_words,
            )

    def _insert_chunk(self, chunk: np.ndarray):
        """One bulk-synchronous round in ONE device dispatch
        (_build.chunk_step): point write + entry block + all search windows
        + the mutation. On the remote backend each dispatch costs a tunnel
        round trip, so the old per-window loop dominated build time."""
        c = chunk.shape[0]
        if self.n + c > self.opts.size:
            self._grow_capacity(self.n + c)
        first = self.ep is None
        n0 = self.n
        if first:
            # first point becomes the entry point (nsw.rs:300-313)
            self.points = _build.write_points(
                self.points, jnp.asarray(chunk[:1]), jnp.int32(n0)
            )
            self.ep = n0
            self.n += 1
            chunk = chunk[1:]
            n0 += 1
            c -= 1
            if c == 0:
                return

        S = 1 if c == 1 else min(self.opts.batch_size, 1 << (c - 1).bit_length())
        cp = -(-c // S) * S
        qj = jnp.asarray(_pad_rows(chunk, cp))
        new_ids = n0 + np.arange(cp, dtype=np.int32)
        new_ids[c:] = -1
        use_entry = (
            self.opts.entry_sample > 0 and n0 > self.opts.entry_sample
        )
        step_fn = (_build.chunk_step_split
                   if os.environ.get("HNSW_TPU_SPLIT_CHUNK") == "1"
                   else _build.chunk_step)  # see HNSWBuilder._insert_graph
        (self.points, self.graph, self.adj_pts, self.spill,
         dropped) = step_fn(
            self.points,
            self._node_map,
            self.graph,
            self.adj_pts,
            self.spill,
            qj,
            jnp.asarray(new_ids),
            jnp.int32(n0),
            jnp.int32(self.ep),
            jnp.int32(c),
            S=S,
            efc=self.opts.ef_construction,
            m=self.opts.connections,
            metric_name=self.metric.name,
            expand=self.opts.expand,
            # scale the prune budget with the chunk: a fixed 256 dropped
            # 11% of reverse edges at 2M (5.4M drops) and cost ~4 recall
            # points; one prune slot per inserted row bounds the loss
            prune_budget=min(self.opts.size,
                             max(self.opts.prune_budget, cp)),
            entry_sample=self.opts.entry_sample,
            use_entry=use_entry,
            inline_words=self.inline_words,
        )
        self.n += c
        self.edge_drops.append(dropped)  # device scalars, summed lazily
        if self.adj_pts is not None and self.adj_pts.nbytes > 1 << 30:
            # throttle queue-ahead dispatch: with multi-GB inline buffers,
            # letting many chunk mutations queue up accumulates donated
            # output allocations and OOMs; one tiny fetch drains the queue
            np.asarray(self.graph.deg[:1])
