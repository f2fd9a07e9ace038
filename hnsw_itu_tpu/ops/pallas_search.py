"""Fused Pallas TPU kernel: the ENTIRE beam-search loop in one kernel.

Parity target: the reference's hot loop ``nsw::search``
(/root/reference/src/index/nsw.rs:133-184). The XLA path (ops/search.py)
expresses each step as gather -> XOR/popcount -> two lax.sorts, which pays
per-step HBM round trips for the beam state and full bitonic relayouts per
sort. This kernel keeps the beam in VMEM for the whole search and fuses:

  * frontier selection  — lane-wise min over unexpanded packed keys;
  * neighbor fetch      — ONE async DMA per query per step from a fused
                          HBM table whose row holds the adjacency ids AND
                          the neighbors' packed sketches (the adj_pts idea
                          one level further: ids + data in one stream);
  * distance            — XOR + popcount on the VPU, reduced over the
                          word-sliced sublanes + a lane fold;
  * dedup               — candidates vs beam by packed key (equal id =>
                          equal distance => equal key), a rolled compare
                          loop — the reference's HashSet (nsw.rs:143) with
                          zero per-query O(N) state;
  * merge               — hand-written bitonic: sort the candidates
                          descending, then one bitonic merge with the
                          ascending beam, payload plane = expanded flags.

Semantics match ops/search.py's ``_beam_search_packed`` (dedup="beam",
expand=1) exactly: same (distance, id) packed order, same termination rule
(no unexpanded key <= beam[ef-1]), same visited accounting. Queries run in
lockstep per block of ``block_q``; blocks terminate independently.

Fused-table layout — TWO planes so the data rows tile exactly:

  data ``uint32[N, fused_subrows(W, words), 128]``, REP = 128 // W: row
  ``e`` subrow s, lane r * W + n = packed word ``s * REP + r`` of
  neighbor n's sketch. For the flagship W=64/words=32 config that is
  exactly 16 subrows — 8-aligned, no pad (the former header+data row was
  17 subrows, silently padded to 24 = 41% wasted HBM and VMEM scratch).
  ids  ``int32[ceil(N / PA), 1, 128]`` (``pack_adj``), PA = 128 // W:
  node e's adjacency ids sit in lanes (e % PA)*W..+W of row e >> log2(PA)
  — 2 nodes per 512-byte row at W=64.

Per expansion the kernel issues two DMAs (256B ids + 512B*SD data); the
word-sliced data layout makes the popcount reduction a sublane sum plus a
log2(REP) lane fold — no in-kernel transposes.

Packed keys: distances are CLAMPED to 2^(31 - id_bits) - 2 in-kernel, so
any N with clamp >= words*16 packs (Hamming 1024-bit: N <= 2^21; ordering
is sacrificed only above half the metric's max distance, far beyond any
beam that matters). Larger indexes use the two-plane DMA kernel
(ops/pallas_dma_search.py) or the XLA path.
"""

from __future__ import annotations

import functools
import os
from typing import NamedTuple

import jax
import jax.numpy as jnp
import numpy as np
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu

LANES = 128


def _next_pow2(x: int) -> int:
    return 1 << max(0, (x - 1)).bit_length()


def fused_width(width: int) -> int:
    """Physical adjacency width of the fused table: the next power of two
    (so it divides 128). Rows wider than 128 cannot be fused."""
    if width > LANES:
        raise ValueError(f"adjacency width {width} > {LANES}")
    return min(LANES, max(1, _next_pow2(width)))


def key_clamp(id_bits: int, max_d: int) -> int:
    """Effective distance bound of the packed (d << id_bits) | id key:
    min(max_d, 2^(31 - id_bits) - 2). The kernel clamps every computed
    distance to this, so ids up to 2^id_bits pack for ANY metric bound —
    ordering is sacrificed only at distances past the clamp."""
    return min(max_d, (1 << (31 - id_bits)) - 2)


# ---------------------------------------------------------------------------
# fused table
# ---------------------------------------------------------------------------


def fused_subrows(W: int, words: int) -> int:
    """Number of 128-lane DATA subrows per fused-table row, rounded UP to
    a multiple of 8 so the (8, 128) int tiling is exact — an unaligned
    subrow count is silently padded by the tiler AND copied at the kernel
    boundary (measured: 2.3x memory at 1M = OOM). The flagship
    W=64/words=32 config is exactly 16 — zero pad."""
    REP = LANES // W
    return -(-(words // REP) // 8) * 8


class FusedTable(NamedTuple):
    """The fused query tables (see module docstring)."""

    data: jax.Array  # uint32[N, fused_subrows(W, words), 128]
    ids: jax.Array   # int32[ceil(N / PA), 1, 128], PA = 128 // W

    @property
    def cap(self) -> int:
        return self.data.shape[0]


@functools.partial(jax.jit, donate_argnums=())
def materialize_fused(points, adj) -> "FusedTable":
    """Build the fused HBM tables (see module docstring; trailing pad
    subrows are zero). Tiled over row blocks like nsw._materialize_inline
    to avoid multi-GB relayout intermediates."""
    from .pallas_dma_search import pack_adj

    cap, W0 = adj.shape
    W = fused_width(W0)
    words = int(np.prod(points.shape[1:]))
    REP = LANES // W
    if words % REP != 0:
        raise ValueError(f"words={words} not divisible by REP={REP}")
    S = fused_subrows(W, words)
    tile = max(1, min(cap, 8192))
    n_tiles = -(-cap // tile)
    out = jnp.zeros((cap, S, LANES), jnp.uint32)

    def body(i, out):
        start = i * tile  # dynamic_slice clamps the tail tile (overlap ok)
        a = jax.lax.dynamic_slice_in_dim(adj, start, tile, 0)
        g = points[jnp.clip(a, 0, points.shape[0] - 1)]  # [tile, W0, words]
        g = g.reshape(tile, W0, words)
        if W != W0:
            g = jnp.concatenate(
                [g, jnp.zeros((tile, W - W0, words), g.dtype)], axis=1
            )
        # [tile, W, words] -> [tile, words, W] -> [tile, words//REP, REP*W]
        data = jnp.swapaxes(g, 1, 2).reshape(tile, words // REP, LANES)
        pad = S - words // REP
        if pad:
            data = jnp.concatenate(
                [data, jnp.zeros((tile, pad, LANES), data.dtype)], axis=1
            )
        return jax.lax.dynamic_update_slice(
            out, data.astype(jnp.uint32), (start, 0, 0)
        )

    wadj = adj
    if W != W0:
        wadj = jnp.concatenate(
            [adj, jnp.full((cap, W - W0), -1, jnp.int32)], axis=1
        )
    return FusedTable(
        data=jax.lax.fori_loop(0, n_tiles, body, out), ids=pack_adj(wadj)
    )


def query_tiles(queries, W: int):
    """XLA-side query tiling matched to the fused-table data layout:
    ``qtile[b, s, r * W + n] = q[b, s * REP + r]``."""
    B = queries.shape[0]
    q = queries.reshape(B, -1)
    words = q.shape[1]
    REP = LANES // W
    # [B, words] -> [B, words//REP, REP] -> repeat each word along W lanes
    q3 = q.reshape(B, words // REP, REP, 1)
    q3 = jnp.broadcast_to(q3, (B, words // REP, REP, W))
    return q3.reshape(B, words // REP, LANES)


# ---------------------------------------------------------------------------
# bitonic networks (lane dimension, VPU roll + select)
# ---------------------------------------------------------------------------


def _cmpx(keys, flags, j, asc):
    """One bitonic compare-exchange at distance j. ``asc`` is an i1 array
    (broadcastable to keys): True where the enclosing region sorts
    ascending. Ties keep both lanes' own values (keys are unique except
    the INF sentinel, whose payload is irrelevant)."""
    L = keys.shape[-1]
    lane = jax.lax.broadcasted_iota(jnp.int32, keys.shape, 1)
    up = (lane & j) == 0
    # pltpu.roll requires shift >= 0: roll by L-j == roll by -j (circular)
    pk = jnp.where(
        up, pltpu.roll(keys, L - j, axis=1), pltpu.roll(keys, j, axis=1)
    )
    want_min = jnp.logical_not(jnp.logical_xor(up, asc))
    # compose with and/or (a bool-valued select_n lowers to an unsupported
    # i8->i1 truncation in Mosaic)
    take = (want_min & (pk < keys)) | (
        jnp.logical_not(want_min) & (pk > keys)
    )
    nk = jnp.where(take, pk, keys)
    if flags is None:
        return nk, None
    pf = jnp.where(
        up, pltpu.roll(flags, L - j, axis=1), pltpu.roll(flags, j, axis=1)
    )
    return nk, jnp.where(take, pf, flags)


def _bitonic_sort(keys, *, descending: bool, span: int | None = None):
    """Full bitonic sort along lanes (single plane). Lane count must be a
    power of two. With ``span`` set (a power of two < lane count), each
    contiguous ``span``-lane group sorts INDEPENDENTLY — exchanges at
    distance j < span never cross a span boundary, so the same roll-based
    network sorts every group at once (the two-queries-per-row packing)."""
    L = keys.shape[-1]
    S = span or L
    lane = jax.lax.broadcasted_iota(jnp.int32, keys.shape, 1)
    elem = lane & (S - 1)  # position within the span group
    k = 2
    while k <= S:
        # (elem & k) == 0 is all-True at k == S, i.e. one final full pass
        asc = (elem & k) == 0
        if descending:
            asc = jnp.logical_not(asc)
        j = k // 2
        while j >= 1:
            keys, _ = _cmpx(keys, None, j, asc)
            j //= 2
        k *= 2
    return keys


def _bitonic_merge(keys, flags):
    """Ascending bitonic merge of a bitonic input (asc half || desc half),
    carrying the flag payload plane."""
    L = keys.shape[-1]
    # all-True as an i1 comparison (bool constants materialize as i8)
    asc = jax.lax.broadcasted_iota(jnp.int32, keys.shape, 1) >= 0
    j = L // 2
    while j >= 1:
        keys, flags = _cmpx(keys, flags, j, asc)
        j //= 2
    return keys, flags


def _merge_packed(kb, fb, ck, fc, span):
    """Two-queries-per-row ascending merge. Per ``span``-lane group g of
    each row, (kb group g, ck group g) is a bitonic 2*span sequence
    (ascending beam ++ descending candidates). The distance-``span`` step
    of its merge pairs kb lane l with ck lane l — a cross-PLANE elementwise
    swap, no roll — and every later step (j < span) stays inside one plane
    and one group. Returns the merged first-``span`` halves (the new beams)
    per group, i.e. the updated kb/fb planes."""
    swap = ck < kb
    kb, ck = jnp.where(swap, ck, kb), jnp.where(swap, kb, ck)
    fb, fc = jnp.where(swap, fc, fb), jnp.where(swap, fb, fc)
    asc = jax.lax.broadcasted_iota(jnp.int32, kb.shape, 1) >= 0
    j = span // 2
    while j >= 1:
        kb, fb = _cmpx(kb, fb, j, asc)
        ck, fc = _cmpx(ck, fc, j, asc)
        j //= 2
    return kb, fb, ck, fc


# ---------------------------------------------------------------------------
# the kernels
# ---------------------------------------------------------------------------


def _make_kernel_packed(*, ef, span, W, words, id_bits, key_inf, max_steps,
                        bq, cap):
    """P-queries-per-row variant (P = 128 // span; span 64 = two queries,
    span 32 = four). Queries g*P+i of a row pair share one 128-lane row,
    query g occupying lanes [g*span, (g+1)*span). The bitonic networks at
    ``span`` lanes never exchange across a span boundary, so the
    single-query kernel runs them at 1/P-vreg occupancy; packing
    multiplies the work per vector op in the candidate sort, the dedup
    rotation, and the frontier/bookkeeping by P, and turns the first
    merge step into a cross-plane elementwise swap. span=32 additionally
    halves the sort/dedup iteration counts vs span=64 (15 vs 21 exchanges,
    32 vs 64 dedup rotations). Requires ef <= span and W <= span.
    Semantics are IDENTICAL to _make_kernel (same keys, visited, steps)."""
    SPAN = span
    P = LANES // SPAN
    SPAN_SHIFT = SPAN.bit_length() - 1
    bqp = bq // P
    REP = LANES // W
    S = fused_subrows(W, words)   # data subrows per table row (8-aligned)
    SD = words // REP             # live data subrows
    PA = LANES // W               # nodes per packed-id row
    PA_SHIFT = PA.bit_length() - 1
    MASK = np.int32((1 << id_bits) - 1)
    KINF = np.int32(key_inf)
    DCLAMP = np.int32((key_inf >> id_bits) - 1)
    BIG = np.int32(0x7FFFFFFF)

    def kernel(qt_ref, init_ref, ids_hbm, table_hbm, outk_ref, vis_ref,
               stp_ref, kb, fb, arows, rows, eref, sem):
        # ---- per-block init: entry key of query g at lane g*SPAN --------
        kb[:] = jnp.full((bqp, LANES), KINF, jnp.int32)
        for g in range(P):
            kb[:, g * SPAN : g * SPAN + 1] = init_ref[:, g : g + 1]
        fb[:] = jnp.zeros((bqp, LANES), jnp.int32)
        vis_ref[:] = jnp.ones((bqp, P), jnp.int32)
        stp_ref[:] = jnp.zeros((bqp, P), jnp.int32)

        lane = jax.lax.broadcasted_iota(jnp.int32, (bqp, LANES), 1)
        elem = lane & (SPAN - 1)
        grp = lane >> SPAN_SHIFT  # span index of each lane
        at0 = elem == 0  # first lane of each span group

        def body(carry):
            step, _ = carry
            # ---- frontier per span: best unexpanded key -----------------
            masked = jnp.where(fb[:] != 0, BIG, kb[:])
            dones = []
            minkey = jnp.zeros((bqp, LANES), jnp.int32)
            for g in range(P):
                in_g = grp == g
                min_g = jnp.min(jnp.where(in_g, masked, BIG), axis=1,
                                keepdims=True)
                worst_g = kb[:, g * SPAN + ef - 1 : g * SPAN + ef]
                done_g = (min_g >= KINF) | (min_g > worst_g)  # [bqp, 1]
                dones.append(done_g)
                minkey = jnp.where(in_g, min_g, minkey)
                eref[:, g : g + 1] = jnp.where(
                    done_g, 0, jnp.minimum(min_g & MASK, cap - 1)
                )
                stp_ref[:, g : g + 1] = stp_ref[:, g : g + 1] + jnp.where(
                    done_g, 0, 1
                )
            # bool-valued jnp.where lowers to an unsupported i8->i1 trunc
            # on Mosaic; compose the per-lane done mask with and/or instead
            done_l = (grp == 0) & dones[0]
            for g in range(1, P):
                done_l = done_l | ((grp == g) & dones[g])
            fb[:] = jnp.where(
                (kb[:] == minkey) & jnp.logical_not(done_l), 1, fb[:]
            )

            # ---- fetch id + data rows: two DMAs per live query ----------
            def issue(i, n):
                for g in range(P):
                    e = eref[i, g]
                    pltpu.make_async_copy(
                        ids_hbm.at[e >> PA_SHIFT], arows.at[i, pl.ds(g, 1)],
                        sem,
                    ).start()
                    pltpu.make_async_copy(
                        table_hbm.at[e], rows.at[i, pl.ds(g * S, S)], sem
                    ).start()
                return n

            jax.lax.fori_loop(0, bqp, issue, 0, unroll=bqp)

            def drain(i, n):
                for g in range(P):
                    e = eref[i, g]
                    pltpu.make_async_copy(
                        ids_hbm.at[e >> PA_SHIFT], arows.at[i, pl.ds(g, 1)],
                        sem,
                    ).wait()
                    pltpu.make_async_copy(
                        table_hbm.at[e], rows.at[i, pl.ds(g * S, S)], sem
                    ).wait()
                return n

            jax.lax.fori_loop(0, bqp, drain, 0, unroll=bqp)

            # ---- distances per span, packed into one candidate row ------
            def dists(data, qt):
                pc = jax.lax.population_count(
                    jnp.bitwise_xor(data, qt)
                ).astype(jnp.int32)
                acc = jnp.sum(pc, axis=1)  # [bqp, 128]
                w = LANES
                while w > W:
                    w //= 2
                    acc = acc[:, :w] + acc[:, w:]
                if W < SPAN:
                    acc = jnp.concatenate(
                        [acc, jnp.zeros((bqp, SPAN - W), jnp.int32)], axis=1
                    )
                return acc  # [bqp, SPAN]

            d = jnp.minimum(
                jnp.concatenate(
                    [
                        dists(rows[:, g * S : g * S + SD, :],
                              qt_ref[:, g * SD : g * SD + SD, :])
                        for g in range(P)
                    ],
                    axis=1,
                ),
                DCLAMP,
            )  # [bqp, 128]

            # ---- adjacency lanes from the packed-id rows ----------------
            def adjlanes(row, e):
                if PA == 1:
                    sel = row
                else:
                    g = e & (PA - 1)  # [bqp, 1]
                    sel = jnp.where(g == 0, row, 0)
                    for i in range(1, PA):
                        sel = sel | jnp.where(
                            g == i,
                            pltpu.roll(row, LANES - i * W, axis=1), 0,
                        )
                return sel  # valid in lanes 0..W-1

            nbr = jnp.concatenate(
                [
                    adjlanes(arows[:, g, :], eref[:, g : g + 1])[:, :SPAN]
                    for g in range(P)
                ],
                axis=1,
            )
            nbr = jnp.where(elem < W, nbr, -1)
            valid = (nbr >= 0) & jnp.logical_not(done_l)
            ck = jnp.where(valid, (d << id_bits) | nbr, KINF)

            # ---- dedup vs own beam: within-span rotation ----------------
            def dd(i, c):
                dup, bc = c
                dup = dup | (ck == bc).astype(jnp.int32)
                # rotate each span-lane group independently: the group's
                # first lane wraps from its own group's last lane
                bc = jnp.where(
                    at0,
                    pltpu.roll(bc, LANES - SPAN + 1, axis=1),
                    pltpu.roll(bc, 1, axis=1),
                )
                return dup, bc

            dup, _ = jax.lax.fori_loop(
                0, SPAN, dd, (jnp.zeros((bqp, LANES), jnp.int32), kb[:])
            )
            ck = jnp.where(dup != 0, KINF, ck)
            fr = (ck < KINF).astype(jnp.int32)
            for g in range(P):
                vis_ref[:, g : g + 1] = vis_ref[:, g : g + 1] + jnp.sum(
                    jnp.where(grp == g, fr, 0), axis=1, keepdims=True
                )

            # ---- merge: per-span desc sort, cross-plane packed merge ----
            cks = _bitonic_sort(ck, descending=True, span=SPAN)
            nk, nf, _, _ = _merge_packed(
                kb[:], fb[:], cks, jnp.zeros((bqp, LANES), jnp.int32), SPAN
            )
            if ef < SPAN:
                evict = elem >= ef
                nk = jnp.where(evict, KINF, nk)
                nf = jnp.where(evict, 0, nf)
            kb[:] = nk
            fb[:] = nf

            alive = jnp.logical_not(jnp.all(done_l))
            return step + 1, alive

        def cond(carry):
            step, alive = carry
            return alive & (step < max_steps)

        jax.lax.while_loop(cond, body, (jnp.int32(0), True))
        outk_ref[:] = kb[:]

    return kernel, S


def _make_kernel(*, ef, half, W, words, id_bits, key_inf, max_steps, bq, cap,
                 dma_unroll=256, dma_mode="loop"):
    TOT = 2 * half
    REP = LANES // W
    S = fused_subrows(W, words)   # data subrows (8-aligned)
    SD = words // REP             # live data subrows
    PA = LANES // W               # nodes per packed-id row
    PA_SHIFT = PA.bit_length() - 1
    MASK = np.int32((1 << id_bits) - 1)
    KINF = np.int32(key_inf)
    DCLAMP = np.int32((key_inf >> id_bits) - 1)  # in-kernel distance clamp
    BIG = np.int32(0x7FFFFFFF)

    def kernel(qt_ref, init_ref, ids_hbm, table_hbm, outk_ref, vis_ref,
               stp_ref, kb, fb, arows, rows, eids, dns, sem):
        # ---- per-block init ------------------------------------------------
        kb[:] = jnp.full((bq, TOT), KINF, jnp.int32)
        kb[:, 0:1] = init_ref[:]
        fb[:] = jnp.zeros((bq, TOT), jnp.int32)
        vis_ref[:] = jnp.ones((bq, 1), jnp.int32)
        stp_ref[:] = jnp.zeros((bq, 1), jnp.int32)

        cand_lane = jax.lax.broadcasted_iota(jnp.int32, (bq, half), 1)

        def body(carry):
            step, _ = carry
            # ---- frontier: best unexpanded key per query -------------------
            bk = kb[:, :half]
            masked = jnp.where(fb[:, :half] != 0, BIG, bk)
            minkey = jnp.min(masked, axis=1, keepdims=True)  # [bq, 1]
            worst = kb[:, ef - 1 : ef]
            done = (minkey >= KINF) | (minkey > worst)  # [bq, 1] i1
            # mark expanded (no-op for done queries: only fb changes)
            fb[:, :half] = jnp.where(
                (bk == minkey) & jnp.logical_not(done), 1, fb[:, :half]
            )
            eids[:] = jnp.minimum(minkey & MASK, cap - 1)
            dns[:] = done.astype(jnp.int32)
            stp_ref[:] = stp_ref[:] + jnp.where(done, 0, 1)

            # ---- fetch id + data rows: two DMAs per live query -------------
            # done queries fetch row 0 unconditionally (their candidates are
            # masked later): a branch-free loop lets the scalar core stream
            # descriptor issues instead of re-evaluating predicates
            _unroll = bq if dma_unroll != 1 else 1  # Mosaic: full or none
            if dma_mode != "skip":
                def issue(i, n):
                    pltpu.make_async_copy(
                        ids_hbm.at[eids[i, 0] >> PA_SHIFT], arows.at[i], sem
                    ).start()
                    pltpu.make_async_copy(
                        table_hbm.at[eids[i, 0]], rows.at[i], sem
                    ).start()
                    return n

                jax.lax.fori_loop(0, bq, issue, 0, unroll=_unroll)

                if dma_mode == "single_wait":
                    # TPU DMA semaphores count BYTES: one wait sized as the
                    # whole rows scratch consumes all bq row-copies at once
                    pltpu.make_async_copy(
                        ids_hbm.at[pl.ds(0, bq)], arows, sem
                    ).wait()
                    pltpu.make_async_copy(
                        table_hbm.at[pl.ds(0, bq)], rows, sem
                    ).wait()
                else:
                    def drain(i, n):
                        pltpu.make_async_copy(
                            ids_hbm.at[eids[i, 0] >> PA_SHIFT], arows.at[i],
                            sem,
                        ).wait()
                        pltpu.make_async_copy(
                            table_hbm.at[eids[i, 0]], rows.at[i], sem
                        ).wait()
                        return n

                    jax.lax.fori_loop(0, bq, drain, 0, unroll=_unroll)

            # ---- distances: XOR + popcount, sublane sum + lane fold --------
            data = rows[:, :SD, :]  # [bq, SD, 128]
            pc = jax.lax.population_count(
                jnp.bitwise_xor(data, qt_ref[:])
            ).astype(jnp.int32)
            acc = jnp.sum(pc, axis=1)  # [bq, 128]
            w = LANES
            while w > W:
                w //= 2
                acc = acc[:, :w] + acc[:, w:]
            d = jnp.minimum(acc, DCLAMP)  # [bq, W]; clamp keeps keys packed
            if W < half:
                d = jnp.concatenate(
                    [d, jnp.zeros((bq, half - W), jnp.int32)], axis=1
                )

            # ---- this node's W adjacency lanes from the packed-id row ------
            arow = arows[:, 0, :]  # [bq, 128] i32
            if PA == 1:
                nbr_raw = arow[:, :half]
            else:
                grp = eids[:] & (PA - 1)  # [bq, 1]
                sel = jnp.where(grp == 0, arow, 0)
                for g in range(1, PA):
                    sel = sel | jnp.where(
                        grp == g, pltpu.roll(arow, LANES - g * W, axis=1), 0
                    )
                nbr_raw = sel[:, :half]
            nbr = jnp.where(cand_lane < W, nbr_raw, -1)
            valid = (nbr >= 0) & jnp.logical_not(done)
            ck = jnp.where(valid, (d << id_bits) | nbr, KINF)

            # ---- dedup vs beam (equal id <=> equal packed key) -------------
            def dd(i, c):
                dup, bc = c
                return (
                    dup | (ck == bc).astype(jnp.int32),
                    pltpu.roll(bc, 1, axis=1),
                )

            dup, _ = jax.lax.fori_loop(
                0, half, dd, (jnp.zeros((bq, half), jnp.int32), kb[:, :half])
            )
            ck = jnp.where(dup != 0, KINF, ck)
            vis_ref[:] = vis_ref[:] + jnp.sum(
                (ck < KINF).astype(jnp.int32), axis=1, keepdims=True
            )

            # ---- merge: sort candidates desc, bitonic-merge with beam ------
            kb[:, half:] = _bitonic_sort(ck, descending=True)
            fb[:, half:] = jnp.zeros((bq, half), jnp.int32)
            mk, mf = _bitonic_merge(kb[:], fb[:])
            if ef < half:
                lane = jax.lax.broadcasted_iota(jnp.int32, (bq, TOT), 1)
                evict = (lane >= ef) & (lane < half)
                mk = jnp.where(evict, KINF, mk)
                mf = jnp.where(evict, 0, mf)
            kb[:] = mk
            fb[:] = mf

            alive = jnp.logical_not(jnp.all(done))
            return step + 1, alive

        def cond(carry):
            step, alive = carry
            return alive & (step < max_steps)

        jax.lax.while_loop(cond, body, (jnp.int32(0), True))
        outk_ref[:] = kb[:, :half]

    return kernel, S


@functools.partial(
    jax.jit,
    static_argnames=(
        "ef", "W", "words", "id_bits", "max_d", "max_steps", "block_q",
        "interpret", "dma_unroll", "dma_mode", "packed",
    ),
)
def fused_beam_search(
    table,
    queries,
    init_keys,
    *,
    ef: int,
    W: int,
    words: int,
    id_bits: int,
    max_d: int,
    max_steps: int = 512,
    block_q: int = 256,
    interpret: bool = False,
    dma_unroll: int = 256,
    dma_mode: str = "loop",
    packed: str = "auto",
):
    """Run the fused search. Returns (keys int32[B, span-or-half >= ef],
    visited int32[B], steps int32[B]); decode ids/distances with
    ``key >> id_bits`` / ``key & mask``. ``B`` must be a multiple of
    ``block_q`` (pad at the call site); ``init_keys`` holds each query's
    packed entry-point key (distances pre-clamped like the kernel's).
    ``W`` is the PHYSICAL fused width (fused_width of the adjacency).
    ``max_d`` is clamped in-kernel to 2^(31 - id_bits) - 2 when the raw
    bound would overflow int32.

    ``packed`` selects the P-queries-per-row kernel ("auto": always — span
    64 packs two queries per 128-lane row (ef, W <= 64), span 32 packs
    four (ef, W <= 32), span 128 runs one query per row for
    64 < ef <= 128, replacing the [bq, 256]-plane single-query kernel
    whose sort networks cross vector registers (the measured per-step
    cliff past ef=64); "never"/"always" to pin for A/B runs). Results are
    identical either way; only the returned key-row width differs (span
    vs half, both >= ef)."""
    cap = table.cap
    B = queries.shape[0]
    if B % block_q != 0:
        raise ValueError(f"B={B} not a multiple of block_q={block_q}")
    half = max(64, _next_pow2(ef), _next_pow2(W))
    if half > LANES:
        raise ValueError(f"ef={ef} needs beam half {half} > {LANES} lanes")
    span = max(32, _next_pow2(ef), _next_pow2(W))
    if packed == "auto":
        # ops escape hatch: HNSW_TPU_PACKED in {auto, never, always,
        # span64} — span64 keeps the packed kernel but pins two queries
        # per row (the hardware-proven config) if the four-per-row
        # span-32 lowering ever misbehaves on a new toolchain.
        packed = os.environ.get("HNSW_TPU_PACKED", "auto")
    if packed == "span64":
        span = max(64, span)
        packed = "auto"
    max_d = key_clamp(id_bits, max_d)
    key_inf = (max_d + 1) << id_bits
    qt = query_tiles(queries, W)  # [B, words//REP, 128]
    use_packed = (
        span <= LANES and block_q % (LANES // span) == 0
        and dma_mode == "loop"
        if packed == "auto" else packed == "always"
    )
    if use_packed:
        if span > LANES:
            raise ValueError(
                f"packed kernel needs ef, W <= {LANES} (span {span})")
        if block_q % (LANES // span):
            raise ValueError(
                f"block_q={block_q} not a multiple of {LANES // span}")
        return _fused_packed(
            table, qt, init_keys, ef=ef, span=span, W=W, words=words,
            id_bits=id_bits, key_inf=key_inf, max_steps=max_steps,
            block_q=block_q, interpret=interpret,
        )
    kernel, S = _make_kernel(
        ef=ef, half=half, W=W, words=words, id_bits=id_bits,
        key_inf=key_inf, max_steps=max_steps, bq=block_q, cap=cap,
        dma_unroll=dma_unroll, dma_mode=dma_mode,
    )
    grid = (B // block_q,)
    keys, vis, stp = pl.pallas_call(
        kernel,
        grid=grid,
        out_shape=(
            jax.ShapeDtypeStruct((B, half), jnp.int32),
            jax.ShapeDtypeStruct((B, 1), jnp.int32),
            jax.ShapeDtypeStruct((B, 1), jnp.int32),
        ),
        in_specs=[
            pl.BlockSpec(
                (block_q, qt.shape[1], LANES), lambda i: (i, 0, 0),
                memory_space=pltpu.VMEM,
            ),
            pl.BlockSpec((block_q, 1), lambda i: (i, 0),
                         memory_space=pltpu.VMEM),
            pl.BlockSpec(memory_space=pltpu.ANY),
            pl.BlockSpec(memory_space=pltpu.ANY),
        ],
        out_specs=(
            pl.BlockSpec((block_q, half), lambda i: (i, 0),
                         memory_space=pltpu.VMEM),
            pl.BlockSpec((block_q, 1), lambda i: (i, 0),
                         memory_space=pltpu.VMEM),
            pl.BlockSpec((block_q, 1), lambda i: (i, 0),
                         memory_space=pltpu.VMEM),
        ),
        scratch_shapes=[
            pltpu.VMEM((block_q, 2 * half), jnp.int32),   # beam keys
            pltpu.VMEM((block_q, 2 * half), jnp.int32),   # expanded flags
            pltpu.VMEM((block_q, 1, LANES), jnp.int32),   # packed-id rows
            pltpu.VMEM((block_q, S, LANES), jnp.uint32),  # fused data rows
            pltpu.VMEM((block_q, 1), jnp.int32),          # expansion ids
            pltpu.VMEM((block_q, 1), jnp.int32),          # done flags
            pltpu.SemaphoreType.DMA,
        ],
        interpret=interpret,
        # the kernel's scratch is fully static (it does NOT grow with
        # max_steps); raise the compiler's default scoped-VMEM budget so
        # block_q=512 fits (v5e has 128MB physical VMEM)
        compiler_params=None if interpret else pltpu.CompilerParams(
            vmem_limit_bytes=100 * 1024 * 1024,
        ),
    )(qt, init_keys.reshape(B, 1), table.ids, table.data)
    return keys, vis[:, 0], stp[:, 0]


def _fused_packed(table, qt, init_keys, *, ef, span, W, words, id_bits,
                  key_inf, max_steps, block_q, interpret):
    """pallas_call plumbing for the P-queries-per-row kernel (P =
    128 // span). Inputs and outputs are reshaped XLA-side (free) so the
    kernel never relayouts: query tiles [B, SD, 128] -> [B/P, P*SD, 128]
    (row group = subrow concat), init keys [B] -> [B/P, P], out keys
    [B/P, 128] -> [B, span]."""
    B = qt.shape[0]
    SD = qt.shape[1]
    P = LANES // span
    bqp = block_q // P
    kernel, S = _make_kernel_packed(
        ef=ef, span=span, W=W, words=words, id_bits=id_bits,
        key_inf=key_inf, max_steps=max_steps, bq=block_q, cap=table.cap,
    )
    qt2 = qt.reshape(B // P, P * SD, LANES)
    grid = (B // block_q,)
    keys, vis, stp = pl.pallas_call(
        kernel,
        grid=grid,
        out_shape=(
            jax.ShapeDtypeStruct((B // P, LANES), jnp.int32),
            jax.ShapeDtypeStruct((B // P, P), jnp.int32),
            jax.ShapeDtypeStruct((B // P, P), jnp.int32),
        ),
        in_specs=[
            pl.BlockSpec(
                (bqp, P * SD, LANES), lambda i: (i, 0, 0),
                memory_space=pltpu.VMEM,
            ),
            pl.BlockSpec((bqp, P), lambda i: (i, 0),
                         memory_space=pltpu.VMEM),
            pl.BlockSpec(memory_space=pl.ANY),
            pl.BlockSpec(memory_space=pl.ANY),
        ],
        out_specs=(
            pl.BlockSpec((bqp, LANES), lambda i: (i, 0),
                         memory_space=pltpu.VMEM),
            pl.BlockSpec((bqp, P), lambda i: (i, 0),
                         memory_space=pltpu.VMEM),
            pl.BlockSpec((bqp, P), lambda i: (i, 0),
                         memory_space=pltpu.VMEM),
        ),
        scratch_shapes=[
            pltpu.VMEM((bqp, LANES), jnp.int32),        # packed beam keys
            pltpu.VMEM((bqp, LANES), jnp.int32),        # expanded flags
            pltpu.VMEM((bqp, P, LANES), jnp.int32),     # packed-id rows
            pltpu.VMEM((bqp, P * S, LANES), jnp.uint32),  # fused data rows
            pltpu.VMEM((bqp, P), jnp.int32),            # expansion ids
            pltpu.SemaphoreType.DMA,
        ],
        interpret=interpret,
        compiler_params=None if interpret else pltpu.CompilerParams(
            vmem_limit_bytes=100 * 1024 * 1024,
        ),
    )(qt2, init_keys.reshape(B // P, P), table.ids, table.data)
    return keys.reshape(B, span), vis.reshape(B), stp.reshape(B)
