"""Sharded indexes over a device mesh.

The reference scales only via rayon threads over one shared-memory index
(src/index/mod.rs:36-41). On TPU two orthogonal strategies replace it, both
expressed with ``jax.shard_map`` over a 1-D mesh (SURVEY.md §2 parallelism
inventory):

* **query sharding** (replicated index): the query batch is split across
  devices, each searches the full graph — the direct analogue of the
  rayon par_iter over queries.
* **index sharding**: the dataset is split into S contiguous shards, each
  device builds/holds an independent subgraph of its shard; every device
  searches its shard for the whole query batch and the per-shard top-k are
  merged with an ``all_gather`` + two-key sort over ICI. This is the
  "context parallelism" of SURVEY.md §5 — it scales dataset size past one
  chip's HBM.

Construction of an index-sharded NSW is embarrassingly parallel: one
bulk-synchronous chunk step per device with no cross-device edges, run as a
single shard_map step (the multi-chip "training step").
"""

from __future__ import annotations

import functools
from typing import NamedTuple

import jax
import jax.numpy as jnp
import numpy as np
from jax.sharding import Mesh, PartitionSpec as P

from ..graph import GraphArrays
from ..models import IndexOptions
from ..models import _build
from ..models.base import ID_INF, KnnResult
from ..models.nsw import NSWBuilder
from ..ops.metrics import get_metric
from ..ops.search import batched_beam_search
from ..ops.topk import inverse_permutation
from .mesh import AXIS, make_mesh, replicate, shard_leading


# ---------------------------------------------------------------------------
# index-sharded query step
# ---------------------------------------------------------------------------


@functools.partial(
    jax.jit,
    static_argnames=("k", "ef", "metric_name", "expand", "max_steps", "mesh",
                     "entry_sample"),
)
def _sharded_query_step(
    points_s, adj_s, ep_s, off_s, n_s, qs, *, k, ef, metric_name, expand,
    max_steps, mesh, entry_sample=0
):
    metric = get_metric(metric_name)

    def step(points_b, adj_b, ep_b, off_b, n_b, q):
        points, adj = points_b[0], adj_b[0]
        cap = adj.shape[0]
        if entry_sample > 0:
            # per-shard MXU sampled entry — the role the HNSW hierarchy
            # plays on CPU (see ShardedHNSW)
            from ..ops.entry import sampled_entry

            eps = sampled_entry(points, q, n_b[0],
                                sample_size=entry_sample, metric=metric)
        else:
            eps = jnp.full((q.shape[0],), ep_b[0], jnp.int32)
        res = batched_beam_search(
            lambda ids: points[ids],
            adj,
            q,
            eps,
            ef=max(ef, k),
            metric=metric,
            capacity=cap,
            expand=expand,
            max_steps=max_steps,
        )
        d = res.dists[:, :k]
        i = res.ids[:, :k]
        # local ids -> global ids; empty shards contribute only sentinels
        valid = (i != ID_INF) & (n_b[0] > 0)
        gi = jnp.where(valid, i + off_b[0], ID_INF)
        gd = jnp.where(valid, d, metric.inf)
        # merge the per-shard top-k over ICI (all_gather + two-key sort)
        d_all = jax.lax.all_gather(gd, AXIS)  # [S, B, k]
        i_all = jax.lax.all_gather(gi, AXIS)
        S = d_all.shape[0]
        B = d_all.shape[1]
        dm = jnp.moveaxis(d_all, 0, 1).reshape(B, S * k)
        im = jnp.moveaxis(i_all, 0, 1).reshape(B, S * k)
        dm, im = jax.lax.sort((dm, im), num_keys=2)
        return dm[:, :k], im[:, :k]

    return jax.shard_map(
        step,
        mesh=mesh,
        in_specs=(P(AXIS), P(AXIS), P(AXIS), P(AXIS), P(AXIS), P()),
        out_specs=(P(), P()),
        check_vma=False,
    )(points_s, adj_s, ep_s, off_s, n_s, qs)


@functools.partial(
    jax.jit,
    static_argnames=("k", "ef", "metric_name", "max_steps", "mesh",
                     "entry_sample", "W", "words", "block_q", "interpret"),
)
def _sharded_query_step_fused(
    points_s, data_s, ids_s, ep_s, off_s, n_s, qs, *, k, ef, metric_name,
    max_steps, mesh, entry_sample, W, words, block_q, interpret
):
    """Index-sharded query with the FUSED Pallas kernel per shard: each
    device runs the whole beam loop in VMEM against its shard's fused
    table (the same kernel the single-chip flagship path uses), then the
    per-shard top-k merge rides one all_gather over ICI. This is the
    production mesh path — every shard sits below the fused limits by
    construction (that is the point of sharding; docs/SCALE.md)."""
    from ..models.nsw import ID_INF
    from ..ops.entry import sampled_entry
    from ..ops.pallas_search import FusedTable, fused_beam_search, key_clamp

    metric = get_metric(metric_name)

    def step(points_b, data_b, ids_b, ep_b, off_b, n_b, q):
        points = points_b[0]
        table = FusedTable(data_b[0], ids_b[0])
        cap = table.cap
        id_bits = max(1, (cap - 1).bit_length())
        max_d = key_clamp(id_bits, words * 32)
        if entry_sample > 0:
            eps = sampled_entry(points, q, jnp.maximum(n_b[0], 1),
                                sample_size=entry_sample, metric=metric)
        else:
            eps = jnp.full((q.shape[0],), ep_b[0], jnp.int32)
        d0 = jax.vmap(lambda qq, p: metric.one_to_many(qq, p[None])[0])(
            q, points[eps]
        ).astype(jnp.int32)
        # entry-distance sort per shard (each shard's own order), undone
        # before the cross-shard merge
        order = jnp.argsort(d0)
        inv = inverse_permutation(order)
        init = (jnp.minimum(d0[order], max_d) << id_bits) | eps[order]
        keys, _, _ = fused_beam_search(
            table, q[order], init, ef=max(ef, k), W=W, words=words,
            id_bits=id_bits, max_d=max_d, max_steps=max_steps,
            block_q=block_q, interpret=interpret,
        )
        keys = keys[inv]
        kinf = (max_d + 1) << id_bits
        valid = (keys < kinf) & (n_b[0] > 0)
        d = jnp.where(valid, keys >> id_bits, metric.inf)[:, :k]
        li = jnp.where(valid, keys & ((1 << id_bits) - 1), ID_INF)[:, :k]
        gi = jnp.where(li != ID_INF, li + off_b[0], ID_INF)
        d_all = jax.lax.all_gather(d, AXIS)   # [S, B, k]
        i_all = jax.lax.all_gather(gi, AXIS)
        S = d_all.shape[0]
        B = d_all.shape[1]
        dm = jnp.moveaxis(d_all, 0, 1).reshape(B, S * k)
        im = jnp.moveaxis(i_all, 0, 1).reshape(B, S * k)
        dm, im = jax.lax.sort((dm, im), num_keys=2)
        return dm[:, :k], im[:, :k]

    return jax.shard_map(
        step,
        mesh=mesh,
        in_specs=(P(AXIS), P(AXIS), P(AXIS), P(AXIS), P(AXIS), P(AXIS), P()),
        out_specs=(P(), P()),
        check_vma=False,
    )(points_s, data_s, ids_s, ep_s, off_s, n_s, qs)


# ---------------------------------------------------------------------------
# index-sharded build step (the multi-chip "training step")
# ---------------------------------------------------------------------------


@functools.partial(
    jax.jit,
    static_argnames=("efc", "m", "metric_name", "expand", "prune_budget", "mesh"),
    donate_argnums=(0, 1, 2, 3),
)
def sharded_build_step(
    points_s,
    adj_s,
    deg_s,
    spill_s,
    ep_s,
    n_s,
    chunk_s,
    chunk_valid_s,
    *,
    efc,
    m,
    metric_name,
    expand,
    prune_budget,
    mesh,
):
    """One bulk-synchronous construction chunk on every shard at once.

    Each device: append its chunk rows to its local point buffer, beam-search
    its local graph for neighbors (read-only phase), then apply the
    vectorized edge writes + degree-cap prunes (mutate phase). No
    cross-device edges — shards are independent subgraphs. The persistent
    spill buffer is threaded through like the single-chip path
    (_build.chunk_step), so reverse edges overflowing a full row survive
    until that row is pruned, and unrecoverable drops are COUNTED per
    shard (returned as int32[S] — mesh builds report edge-drop rates like
    the single-chip path, cli.py).
    """

    def step(points_b, adj_b, deg_b, spill_b, ep_b, n_b, chunk_b, valid_b):
        points, adj, deg = points_b[0], adj_b[0], deg_b[0]
        n, ep, chunk, valid = n_b[0], ep_b[0], chunk_b[0], valid_b[0]
        spill = spill_b[0]
        c = chunk.shape[0]
        cap = points.shape[0]

        points = _build.write_points(points, chunk, n)
        node_map = jnp.arange(cap, dtype=jnp.int32)
        sel_ids, _ = _build.search_select(
            points,
            node_map,
            adj,
            chunk,
            valid,
            jnp.full((c,), ep, jnp.int32),
            efc=efc,
            m=m,
            metric_name=metric_name,
            expand=expand,
        )
        new_ids = jnp.where(valid, n + jnp.arange(c, dtype=jnp.int32), -1)
        g, _, spill, dropped = _build.apply_inserts(
            points,
            node_map,
            GraphArrays(adj, deg),
            new_ids,
            sel_ids,
            None,
            spill,
            metric_name=metric_name,
            prune_budget=prune_budget,
        )
        n_new = n + jnp.sum(valid.astype(jnp.int32))
        return (
            points[None],
            g.adj[None],
            g.deg[None],
            spill[None],
            n_new[None],
            dropped[None],
        )

    return jax.shard_map(
        step,
        mesh=mesh,
        in_specs=(P(AXIS),) * 8,
        out_specs=(P(AXIS),) * 6,
        check_vma=False,
    )(points_s, adj_s, deg_s, spill_s, ep_s, n_s, chunk_s, chunk_valid_s)


@functools.partial(
    jax.jit,
    static_argnames=("G", "c", "efc", "m", "metric_name", "expand",
                     "prune_budget", "mesh"),
    donate_argnums=(0, 1, 2, 3),
)
def sharded_build_steps_scanned(
    points_s,
    adj_s,
    deg_s,
    spill_s,
    ep_s,
    n_s,
    ns_s,
    pos0,
    *,
    G,
    c,
    efc,
    m,
    metric_name,
    expand,
    prune_budget,
    mesh,
):
    """G consecutive construction chunks on every shard in ONE shard_map
    dispatch — the mesh analogue of ``_build.chunk_steps_scanned`` (same
    motivation: the remote runtime copies donated buffers per dispatch, a
    fori_loop carry aliases them in place).

    Because ``ShardedNSW.build`` uploads every shard's points up front,
    chunks are sliced from the device-resident buffer (the per-chunk
    step's chunk re-write is a no-op here and skipped) and the validity
    mask is computed in-kernel from the shard's final row count ``ns_s``
    — bit-identical state evolution to G ``sharded_build_step`` calls.

    Args:
      ns_s: int32[S] final live row count per shard (chunk_valid source).
      pos0: int32 scalar, first chunk's row offset within each shard.
    """

    def step(points_b, adj_b, deg_b, spill_b, ep_b, n_b, ns_b, pos0_):
        points, adj, deg = points_b[0], adj_b[0], deg_b[0]
        ep, ns = ep_b[0], ns_b[0]
        cap = points.shape[0]
        node_map = jnp.arange(cap, dtype=jnp.int32)

        def body(i, carry):
            adj, deg, spill, n, drops = carry
            pos = pos0_ + i * c
            chunk = jax.lax.dynamic_slice_in_dim(points, pos, c, axis=0)
            valid = (pos + jnp.arange(c, dtype=jnp.int32)) < ns
            sel_ids, _ = _build.search_select(
                points,
                node_map,
                adj,
                chunk,
                valid,
                jnp.full((c,), ep, jnp.int32),
                efc=efc,
                m=m,
                metric_name=metric_name,
                expand=expand,
            )
            new_ids = jnp.where(
                valid, n + jnp.arange(c, dtype=jnp.int32), -1
            )
            g, _, spill, dropped = _build.apply_inserts(
                points,
                node_map,
                GraphArrays(adj, deg),
                new_ids,
                sel_ids,
                None,
                spill,
                metric_name=metric_name,
                prune_budget=prune_budget,
            )
            return (g.adj, g.deg, spill,
                    n + jnp.sum(valid.astype(jnp.int32)), drops + dropped)

        adj, deg, spill, n, drops = jax.lax.fori_loop(
            0, G, body,
            (adj, deg, spill_b[0], n_b[0], jnp.int32(0)))
        return points_b, adj[None], deg[None], spill[None], n[None], \
            drops[None]

    return jax.shard_map(
        step,
        mesh=mesh,
        in_specs=(P(AXIS),) * 7 + (P(),),
        out_specs=(P(AXIS),) * 6,
        check_vma=False,
    )(points_s, adj_s, deg_s, spill_s, ep_s, n_s, ns_s, pos0)


# ---------------------------------------------------------------------------
# query-sharded (replicated-index) step — rayon par_iter analogue
# ---------------------------------------------------------------------------


@functools.partial(
    jax.jit,
    static_argnames=("k", "ef", "metric_name", "expand", "max_steps", "mesh",
                     "tie_bits"),
)
def _query_sharded_step(points, adj, ep, qs, *, k, ef, metric_name, expand,
                        max_steps, mesh, tie_bits=0):
    metric = get_metric(metric_name)

    def step(points_r, adj_r, ep_r, q):
        eps = jnp.full((q.shape[0],), ep_r, jnp.int32)
        res = batched_beam_search(
            lambda ids: points_r[ids],
            adj_r,
            q,
            eps,
            ef=max(ef, k),
            metric=metric,
            capacity=adj_r.shape[0],
            expand=expand,
            max_steps=max_steps,
            tie_bits=tie_bits,
        )
        return res.dists[:, :k], res.ids[:, :k]

    return jax.shard_map(
        step,
        mesh=mesh,
        in_specs=(P(), P(), P(), P(AXIS)),
        out_specs=(P(AXIS), P(AXIS)),
        check_vma=False,
    )(points, adj, ep, qs)


# ---------------------------------------------------------------------------
# user-facing sharded index
# ---------------------------------------------------------------------------


class ShardedNSW:
    """Index-sharded flat graph: S independent subgraphs, merged top-k."""

    def __init__(self, mesh, points_s, graphs_s, eps, offsets, ns, metric, opts):
        self.mesh = mesh
        self.points_s = points_s  # [S, cap_s, D]
        self.adj_s = graphs_s[0]  # [S, cap_s, W]
        self.deg_s = graphs_s[1]
        self.eps = eps  # int32[S] local entry points
        self.offsets = offsets  # int32[S] global-id offset per shard
        self.ns = ns  # int32[S]
        self.metric = get_metric(metric) if isinstance(metric, str) else metric
        self.opts = opts
        self.query_expand = 1
        self.query_entry_sample = 0  # >0: per-shard MXU sampled entry
        self.max_steps = None  # None = auto (2*ef; any explicit value wins)
        self.fused_s = None  # per-shard fused tables (enable_inline)
        self.edge_drops_s = None  # int32[S] unrecoverable reverse-edge
        # drops per shard (set by build; None for hand-assembled indexes)

    def total_edge_drops(self) -> int:
        """Reverse edges unrecoverably lost across all shards (single-chip
        parity: NSWBuilder.total_edge_drops)."""
        if self.edge_drops_s is None:
            return 0
        return int(np.asarray(self.edge_drops_s).sum())

    def _steps_cap(self, ef: int) -> int:
        return self.max_steps if self.max_steps else max(2 * ef, 64)

    @classmethod
    def build(cls, points, opts: IndexOptions, metric="hamming",
              mesh: Mesh | None = None):
        """Split contiguously into S shards and build ALL subgraphs at once
        on the mesh: every progressive chunk is one ``sharded_build_step``
        — a single shard_map dispatch running the batched search-then-mutate
        round on every device simultaneously (the multi-device analogue of
        the reference's rayon build parallelism, nsw.rs:224-277)."""
        mesh = mesh or make_mesh()
        S = mesh.devices.size
        pts = np.asarray(points)
        n = pts.shape[0]
        cap_s = -(-n // S)
        stacked = np.zeros((S, cap_s, *pts.shape[1:]), pts.dtype)
        ns = np.zeros((S,), np.int32)
        for s in range(S):
            part = pts[s * cap_s : min((s + 1) * cap_s, n)]
            stacked[s, : part.shape[0]] = part
            ns[s] = part.shape[0]
        offs = np.arange(S, dtype=np.int32) * cap_s

        # device state: all points uploaded once (chunk writes are
        # idempotent re-writes); shard row 0 is each shard's entry point
        # (nsw.rs:300-313 applied per shard), edgeless until its first
        # chunk links back to it
        points_s = shard_leading(mesh, jnp.asarray(stacked))
        adj_s = shard_leading(
            mesh, jnp.full((S, cap_s, opts.max_connections), -1, jnp.int32)
        )
        deg_s = shard_leading(mesh, jnp.zeros((S, cap_s), jnp.int32))
        ep_s = shard_leading(mesh, jnp.zeros((S,), jnp.int32))
        n_s = shard_leading(
            mesh, jnp.asarray(np.minimum(ns, 1), jnp.int32)
        )

        metric_name = metric if isinstance(metric, str) else metric.name
        ns_s = shard_leading(mesh, jnp.asarray(ns, jnp.int32))
        # persistent spill buffers, one per shard (single-chip parity:
        # reverse edges overflowing a full row survive across chunks until
        # the row is pruned; drops are counted — VERDICT r3 item 6)
        spill_s = shard_leading(
            mesh,
            jnp.full((S, cap_s + 1, _build.SPILL_WIDTH), -1, jnp.int32),
        )
        drops_s = shard_leading(mesh, jnp.zeros((S,), jnp.int32))
        pos = 1
        sched = _build.chunk_schedule(
            1, max(0, cap_s - 1), max_chunk=opts.batch_size
        )
        i = 0
        while i < len(sched):
            c = sched[i]
            # steady state: scan_group chunks per dispatch (shared gating;
            # this path uses fixed per-shard entries, so no entry gate)
            G = _build.scan_group_at(sched, i, opts.batch_size,
                                     opts.scan_group)
            if G > 1:
                points_s, adj_s, deg_s, spill_s, n_s, dr = \
                    sharded_build_steps_scanned(
                        points_s, adj_s, deg_s, spill_s, ep_s, n_s, ns_s,
                        jnp.int32(pos),
                        G=G, c=c,
                        efc=opts.ef_construction, m=opts.connections,
                        metric_name=metric_name,
                        expand=opts.expand, prune_budget=opts.prune_budget,
                        mesh=mesh,
                    )
            else:
                # slice the chunk from the DEVICE-resident shard points
                # (axis 0 sharding is preserved; axis 1 is unsharded) — a
                # host-side chunk would pay one tunnel upload per step on
                # the remote backend, the exact overhead the single-chip
                # builder removed
                chunk = points_s[:, pos : pos + c]
                valid = (pos + np.arange(c)[None, :]) < ns[:, None]
                points_s, adj_s, deg_s, spill_s, n_s, dr = \
                    sharded_build_step(
                        points_s, adj_s, deg_s, spill_s, ep_s, n_s,
                        chunk,
                        shard_leading(mesh, jnp.asarray(valid)),
                        efc=opts.ef_construction, m=opts.connections,
                        metric_name=metric_name,
                        expand=opts.expand, prune_budget=opts.prune_budget,
                        mesh=mesh,
                    )
            drops_s = drops_s + dr  # lazy device-side accumulation
            pos += G * c
            i += G
        idx = cls(
            mesh,
            points_s,
            (adj_s, deg_s),
            ep_s,
            shard_leading(mesh, jnp.asarray(offs, jnp.int32)),
            shard_leading(mesh, jnp.asarray(ns, jnp.int32)),
            metric,
            opts,
        )
        # spill entries never consumed by a later chunk's prune are lost
        # for good once the build seals: count them as drops per shard so
        # the mesh build's logged rate stays honest (single-chip parity,
        # models/nsw.py _drain_spill + leftover count; a mesh prune-only
        # drain pass could recover them and is future work)
        leftover = jnp.sum(
            (spill_s[:, :-1] >= 0).astype(jnp.int32), axis=(1, 2)
        )
        idx.edge_drops_s = drops_s + leftover
        return idx

    def size(self) -> int:
        return int(np.asarray(self.ns).sum())

    def enable_inline(self) -> None:
        """Materialize the fused Pallas table PER SHARD (leading shard
        axis stays on the mesh): queries then run the whole beam loop in
        each device's VMEM instead of the XLA gather path. Eligibility is
        the single-chip gate applied to one shard's shapes — sharding
        exists precisely to keep every shard below the fused limits."""
        if self.fused_s is not None:
            return
        from ..models.nsw import _fused_query_eligible
        from ..ops.pallas_search import materialize_fused

        # shapes only — avoid materializing a shard on one device
        pts_shard = jax.ShapeDtypeStruct(
            self.points_s.shape[1:], self.points_s.dtype
        )
        adj_shard = jax.ShapeDtypeStruct(
            self.adj_s.shape[1:], self.adj_s.dtype
        )
        if not _fused_query_eligible(pts_shard, adj_shard, self.metric):
            return

        def mk(points_b, adj_b):
            t = materialize_fused(points_b[0], adj_b[0])
            return t.data[None], t.ids[None]

        data_s, ids_s = jax.jit(jax.shard_map(
            mk,
            mesh=self.mesh,
            in_specs=(P(AXIS), P(AXIS)),
            out_specs=(P(AXIS), P(AXIS)),
            check_vma=False,
        ))(self.points_s, self.adj_s)
        self.fused_s = (data_s, ids_s)

    def knns(self, queries, k: int, ef: int) -> KnnResult:
        import os

        q_np = np.asarray(queries)
        nq = q_np.shape[0]
        use_fused = (
            self.fused_s is not None
            and max(ef, k) <= 128
            and self.query_expand == 1
        )
        if use_fused:
            from ..models.nsw import _fused_batch
            from ..ops.pallas_search import fused_width

            bp, block_q = _fused_batch(nq)
            if bp != nq:
                q_np = np.concatenate(
                    [q_np, np.repeat(q_np[:1], bp - nq, axis=0)]
                )
            qs = replicate(self.mesh, jnp.asarray(q_np))
            d, i = _sharded_query_step_fused(
                self.points_s,
                self.fused_s[0],
                self.fused_s[1],
                self.eps,
                self.offsets,
                self.ns,
                qs,
                k=k,
                ef=ef,
                metric_name=self.metric.name,
                max_steps=self._steps_cap(ef),
                mesh=self.mesh,
                entry_sample=self.query_entry_sample,
                W=fused_width(int(self.adj_s.shape[-1])),
                words=int(np.prod(self.points_s.shape[2:])),
                block_q=block_q,
                interpret=os.environ.get("HNSW_TPU_MINI_INTERPRET") == "1",
            )
            return KnnResult(d[:nq], i[:nq])
        qs = replicate(self.mesh, jnp.asarray(q_np))
        d, i = _sharded_query_step(
            self.points_s,
            self.adj_s,
            self.eps,
            self.offsets,
            self.ns,
            qs,
            k=k,
            ef=ef,
            metric_name=self.metric.name,
            expand=self.query_expand,
            max_steps=self._steps_cap(ef),
            mesh=self.mesh,
            entry_sample=self.query_entry_sample,
        )
        return KnnResult(d, i)

    def search(self, query, k: int, ef: int) -> KnnResult:
        r = self.knns(np.asarray(query)[None], k, ef)
        return KnnResult(r.dists[0], r.ids[0])


class ShardedHNSW(ShardedNSW):
    """Index-sharded hierarchical index, TPU-redesigned.

    The reference's hierarchy exists to find a good base-layer entry point
    in O(log n) pointer hops (hnsw.rs:278-300) — a latency trick for one
    CPU thread. Sharded across a mesh, the same role is played by a
    per-shard MXU sampled entry: each device scores its shard's first
    ``entry_sample`` points against the whole query batch in one dense
    block and starts its beam at the argmin (ops/entry.py). That is the
    substitution the single-chip flagship path already uses
    (models/hnsw.py: entry_sample skips the descent), here applied
    per shard under shard_map; construction runs the same
    ``sharded_build_step`` rounds as ShardedNSW — per-shard flat graphs
    with sampled entries measure recall-equivalent to per-shard
    hierarchies at equal ef while keeping every shard's step identical
    (no ragged per-level state across devices).

    Evidence (benches/validate_entry_equiv.py -> results_entry_equiv.json,
    shard-sized n=100k, 2048 queries, SAME graph queried both ways):
    recall@10 descent vs sampled = 0.9947/0.9952 (ef=32), 0.9969/0.9969
    (ef=48), 0.9972/0.9971 (ef=64), 0.9978/0.9977 (ef=96) — the sampled
    entry is within +-0.0005 of the hierarchy at every ef.
    """

    DEFAULT_ENTRY_SAMPLE = 1024

    def __init__(self, *args, **kwargs):
        super().__init__(*args, **kwargs)
        self.query_entry_sample = self.DEFAULT_ENTRY_SAMPLE


@functools.partial(
    jax.jit,
    static_argnames=("k", "ef", "metric_name", "expand", "max_steps",
                     "n_levels", "entry_sample", "dedup", "mesh", "tie_bits"),
)
def _query_sharded_step_hnsw(points, levels, base_adj, ep, n, qs, *, k, ef,
                             metric_name, expand, max_steps, n_levels,
                             entry_sample, dedup, mesh, tie_bits=0):
    """Query-sharded HNSW: the full hierarchy (points, level arrays, base
    adjacency) is replicated to every device and the query batch is split —
    each device runs the SAME descent + base beam the single-chip
    ``_hnsw_query_step`` runs (models/hnsw.py), so per-query results are
    bit-identical to the unsharded PLAIN path (an index with fused/mini
    tables or query_hop takes a different single-device kernel — see the
    knns_query_sharded warning). This is the rayon par_iter
    analogue (src/index/mod.rs:27-43) for the hierarchical index; level
    arrays are tiny relative to the base (level 1 holds ~n/m nodes), so
    replication costs ~1/m of the index per device."""
    from ..models.hnsw import _descent_eps

    metric = get_metric(metric_name)

    def step(points_r, levels_r, adj_r, ep_r, n_r, q):
        eps = _descent_eps(
            points_r, levels_r, q, ep_r, n_r,
            metric=metric, max_steps=max_steps, n_levels=n_levels,
            entry_sample=entry_sample,
        )
        res = batched_beam_search(
            lambda ids: points_r[ids],
            adj_r,
            q,
            eps,
            ef=max(ef, k),
            metric=metric,
            capacity=adj_r.shape[0],
            expand=expand,
            max_steps=max_steps,
            dedup=dedup,
            tie_bits=tie_bits,
        )
        return res.dists[:, :k], res.ids[:, :k]

    return jax.shard_map(
        step,
        mesh=mesh,
        in_specs=(P(), P(), P(), P(), P(), P(AXIS)),
        out_specs=(P(AXIS), P(AXIS)),
        check_vma=False,
    )(points, levels, base_adj, ep, n, qs)


def knns_query_sharded(index, queries, k: int, ef: int,
                       mesh: Mesh | None = None) -> KnnResult:
    """Replicated-index data parallelism over queries for a single-device
    NSW or HNSW index — Index::knns (src/index/mod.rs:27-43) across chips.

    The sharded step runs the plain XLA gather beam (exact distances);
    results are bit-identical to the unsharded path for PLAIN-path indexes
    only. A fused/mini/hop-configured index takes a different kernel on a
    single device (estimated distances on the mini path), so results may
    legitimately differ there and the inline tables' speed is not used —
    warned, since callers usually want `ShardedNSW` (index sharding) for
    those regimes (ADVICE round 4)."""
    if (getattr(index, "fused", None) is not None
            or getattr(index, "mini", None) is not None
            or getattr(index, "query_hop", 0)):
        import warnings

        warnings.warn(
            "knns_query_sharded runs the plain XLA beam: this index's "
            "fused/mini table (or query_hop rerank) is ignored, so results "
            "may differ from single-device knns and its speed advantage "
            "is lost",
            stacklevel=2,
        )
    mesh = mesh or make_mesh()
    S = mesh.devices.size
    qs = np.asarray(queries)
    nq = qs.shape[0]
    pad = (-nq) % S
    if pad:
        qs = np.concatenate([qs, np.repeat(qs[:1], pad, axis=0)])
    if hasattr(index, "levels"):  # HNSW: replicate the hierarchy
        levels = jax.tree.map(
            lambda x: replicate(mesh, x), tuple(index.levels)
        )
        d, i = _query_sharded_step_hnsw(
            replicate(mesh, index.points),
            levels,
            replicate(mesh, index.base.adj),
            replicate(mesh, jnp.int32(index.ep)),
            replicate(mesh, jnp.int32(index.n)),
            shard_leading(mesh, jnp.asarray(qs)),
            k=k,
            ef=ef,
            metric_name=index.metric.name,
            expand=index.query_expand,
            max_steps=index._steps_cap(ef),
            n_levels=len(index.levels),
            entry_sample=index.query_entry_sample,
            dedup=index.query_dedup,
            mesh=mesh,
            tie_bits=index._tie_bits(),
        )
        return KnnResult(d[:nq], _map_back(index, i[:nq]))
    d, i = _query_sharded_step(
        replicate(mesh, index.points),
        replicate(mesh, index.graph.adj),
        replicate(mesh, jnp.int32(index.ep)),
        shard_leading(mesh, jnp.asarray(qs)),
        k=k,
        ef=ef,
        metric_name=index.metric.name,
        expand=index.query_expand,
        max_steps=index._steps_cap(ef),
        mesh=mesh,
        tie_bits=index._tie_bits(),
    )
    return KnnResult(d[:nq], _map_back(index, i[:nq]))


def _map_back(index, ids):
    """Internal -> original dataset ids for a reordered index (the same
    id_map remap single-device knns applies, models/nsw.py:649)."""
    if getattr(index, "id_map", None) is None:
        return ids
    from ..models.nsw import _remap_ids_j

    return _remap_ids_j(index.id_map, ids)
