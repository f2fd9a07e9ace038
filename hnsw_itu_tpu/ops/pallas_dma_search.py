"""Large-N fused Pallas beam search: per-neighbor DMA, two-plane keys.

Parity target: the reference hot loop ``nsw::search``
(/root/reference/src/index/nsw.rs:133-184) at its FLAGSHIP scale (the 10M
laion2B run, README.md:160-184). The small-N kernel (ops/pallas_search.py)
needs a fused table (~8.7KB/node) that stops fitting HBM past ~1.5M nodes
and a packed int32 (d, id) key that overflows past ~2M ids. This kernel
removes both limits:

  * keys are TWO int32 planes (distance, id) — sort networks compare
    lexicographically and move both planes (plus the expanded-flag plane);
    any N < 2^31 packs.
  * per expansion it DMAs the node's adjacency row (512B) from a packed
    2-nodes-per-row table, DEDUPS the candidates against the beam BEFORE
    fetching (60%+ of neighbor fetches are duplicates), then issues one
    512B DMA per FRESH neighbor from a packed 4-points-per-row table.
    Total HBM per step ~= 0.5KB + fresh*0.5KB instead of the XLA gather
    path's W random 128B gathers with no dedup.

Packed layouts (both verified UNPADDED on hardware — [N, 1, 128] u32 rows
are 512 bytes):

  adj2: int32[ceil(cap/PA), 1, 128], PA = 128 // W. Node e's adjacency
        occupies lanes (e % PA)*W .. +W of row e // PA (-1 = no edge).
  pts4: uint32[ceil(cap/PP), 1, 128], PP = 128 // words. Node e's sketch
        words occupy lanes (e % PP)*words .. +words of row e // PP.

Mosaic constraints that shaped this kernel (measured on v5e via the axon
tunnel, benches/exp_r3*.py): dynamic-trip-count fori_loops and 1-D flat
DMAs crash the compiler — fetch loops are static W-trip with a
``pl.when(id < BIG)`` gate per slot; DMA issue/wait loops must be fully
unrolled or unroll=1; sublane-sliced VMEM DMA destinations
(``rows.at[i, pl.ds(j, 1)]``) work at any offset.

Semantics match ops/search.py's two-key beam path (dedup="beam",
expand=1) exactly: same (distance, id) lexicographic order, same
termination rule, same visited accounting.
"""

from __future__ import annotations

import functools

import jax
import jax.numpy as jnp
import numpy as np
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu

LANES = 128
DINF = np.int32(0x7FFF0000)  # > any hamming distance, headroom for compares
IINF = np.int32(0x7FFFFFFF)


def _next_pow2(x: int) -> int:
    return 1 << max(0, (x - 1)).bit_length()


# ---------------------------------------------------------------------------
# tie-decorrelation id relabel (bit reversal)
# ---------------------------------------------------------------------------


def bitrev_ids(x, bits: int):
    """Bijective involution on [0, 2**bits): reverse the low ``bits`` bits.

    The beam's (d, id) lex order breaks estimated-distance ties by id, and
    after a BFS locality reorder (ops/reorder.py) low id == entry-proximal —
    so ties systematically keep entry-near candidates and the beam loses
    exploration depth (measured -5 recall points at 10M,
    benches/results_10m_reorder.json). Encoding the ORDERING id as the
    bit-reversal of the real id breaks that correlation (adjacent ranks land
    2**(bits-1) apart) while the DMA layout keeps the BFS locality: encode
    before every key compare, decode (same function — it is an involution)
    at the expansion fetch. Runs on uint32 so the shifts stay logical;
    callers guarantee x < 2**bits on lanes they consume (masked lanes may
    hold garbage).
    """
    x = x.astype(jnp.uint32)
    x = ((x >> 1) & 0x55555555) | ((x & 0x55555555) << 1)
    x = ((x >> 2) & 0x33333333) | ((x & 0x33333333) << 2)
    x = ((x >> 4) & 0x0F0F0F0F) | ((x & 0x0F0F0F0F) << 4)
    x = ((x >> 8) & 0x00FF00FF) | ((x & 0x00FF00FF) << 8)
    x = (x >> 16) | (x << 16)
    return (x >> (32 - bits)).astype(jnp.int32)


# ---------------------------------------------------------------------------
# packed tables (XLA side)
# ---------------------------------------------------------------------------


@jax.jit
def pack_adj(adj):
    """adj int32[cap, W] -> int32[ceil(cap*W/128), 1, 128] (pure reshape:
    row-major order is already the packed layout)."""
    cap, W = adj.shape
    if 128 % W != 0:
        raise ValueError(f"W={W} must divide 128")
    pa = 128 // W
    cap_p = -(-cap // pa) * pa
    a = adj
    if cap_p != cap:
        a = jnp.concatenate(
            [a, jnp.full((cap_p - cap, W), -1, jnp.int32)], axis=0
        )
    return a.reshape(cap_p // pa, 1, LANES)


@jax.jit
def pack_points(points):
    """points uint32[cap, words] -> uint32[ceil(cap*words/128), 1, 128]."""
    cap = points.shape[0]
    words = int(np.prod(points.shape[1:]))
    if 128 % words != 0:
        raise ValueError(f"words={words} must divide 128")
    pp = 128 // words
    cap_p = -(-cap // pp) * pp
    p = points.reshape(cap, words)
    if cap_p != cap:
        p = jnp.concatenate(
            [p, jnp.zeros((cap_p - cap, words), p.dtype)], axis=0
        )
    return p.reshape(cap_p // pp, 1, LANES)


def query_rep(queries, words: int):
    """Replicate each query's ``words`` sketch words across all 128 lanes
    (PP copies) so one XOR covers whichever lane group the fetched point
    landed in."""
    B = queries.shape[0]
    q = queries.reshape(B, words)
    pp = LANES // words
    return jnp.tile(q, (1, pp))  # [B, 128]


# ---------------------------------------------------------------------------
# two-plane bitonic networks (lex (d, id) order, flag payload)
# ---------------------------------------------------------------------------


def _roll(x, j):
    L = x.shape[-1]
    return pltpu.roll(x, L - j, axis=1)  # roll by -j (shift must be >= 0)


def _cmpx2(d, i, f, j, asc):
    """One bitonic compare-exchange at distance j on (d, i) lex keys with
    optional flag payload. ``asc``: i1 array, True where ascending."""
    lane = jax.lax.broadcasted_iota(jnp.int32, d.shape, 1)
    up = (lane & j) == 0
    pd = jnp.where(up, _roll(d, j), pltpu.roll(d, j, axis=1))
    pi = jnp.where(up, _roll(i, j), pltpu.roll(i, j, axis=1))
    want_min = jnp.logical_not(jnp.logical_xor(up, asc))
    p_less = (pd < d) | ((pd == d) & (pi < i))
    take = (want_min & p_less) | (jnp.logical_not(want_min) &
                                  jnp.logical_not(p_less) &
                                  ((pd != d) | (pi != i)))
    nd = jnp.where(take, pd, d)
    ni = jnp.where(take, pi, i)
    if f is None:
        return nd, ni, None
    pf = jnp.where(up, _roll(f, j), pltpu.roll(f, j, axis=1))
    return nd, ni, jnp.where(take, pf, f)


def _bitonic_sort2(d, i, *, descending: bool):
    """Full bitonic sort along lanes on (d, id) lex keys (no payload)."""
    L = d.shape[-1]
    lane = jax.lax.broadcasted_iota(jnp.int32, d.shape, 1)
    k = 2
    while k <= L:
        asc = (lane & k) == 0
        if descending:
            asc = jnp.logical_not(asc)
        j = k // 2
        while j >= 1:
            d, i, _ = _cmpx2(d, i, None, j, asc)
            j //= 2
        k *= 2
    return d, i


def _bitonic_merge2(d, i, f):
    """Ascending bitonic merge of (asc half || desc half) on lex keys,
    carrying the flag plane."""
    L = d.shape[-1]
    asc = jax.lax.broadcasted_iota(jnp.int32, d.shape, 1) >= 0
    j = L // 2
    while j >= 1:
        d, i, f = _cmpx2(d, i, f, j, asc)
        j //= 2
    return d, i, f


def _bitonic_sort2_span(d, i, *, descending: bool, span: int):
    """Two-plane lex sort where each contiguous ``span``-lane group sorts
    INDEPENDENTLY (exchanges at j < span never cross a group boundary) —
    the two-queries-per-row packing."""
    lane = jax.lax.broadcasted_iota(jnp.int32, d.shape, 1)
    elem = lane & (span - 1)
    k = 2
    while k <= span:
        asc = (elem & k) == 0
        if descending:
            asc = jnp.logical_not(asc)
        j = k // 2
        while j >= 1:
            d, i, _ = _cmpx2(d, i, None, j, asc)
            j //= 2
        k *= 2
    return d, i


def _merge2_packed(bd, bi, fb, cd, ci, span):
    """Two-queries-per-row ascending merge on lex (d, id) keys: per
    ``span``-lane group, (beam group asc ++ candidate group desc) is a
    bitonic 2*span sequence, so the distance-``span`` merge step is a
    cross-PLANE elementwise swap and every later step stays in the beam
    plane within one group. Returns the merged beam planes."""
    swap = (cd < bd) | ((cd == bd) & (ci < bi))
    bd, cd = jnp.where(swap, cd, bd), jnp.where(swap, bd, cd)
    bi, ci = jnp.where(swap, ci, bi), jnp.where(swap, bi, ci)
    fb = jnp.where(swap, 0, fb)  # candidates arrive unexpanded
    asc = jax.lax.broadcasted_iota(jnp.int32, bd.shape, 1) >= 0
    j = span // 2
    while j >= 1:
        bd, bi, fb = _cmpx2(bd, bi, fb, j, asc)
        j //= 2
    return bd, bi, fb


def _bitonic_sort1(k, *, descending: bool):
    """Single-plane bitonic sort (for fresh-candidate compaction)."""
    L = k.shape[-1]
    lane = jax.lax.broadcasted_iota(jnp.int32, k.shape, 1)
    s = 2
    while s <= L:
        asc = (lane & s) == 0
        if descending:
            asc = jnp.logical_not(asc)
        j = s // 2
        while j >= 1:
            up = (lane & j) == 0
            pk = jnp.where(up, _roll(k, j), pltpu.roll(k, j, axis=1))
            want_min = jnp.logical_not(jnp.logical_xor(up, asc))
            take = (want_min & (pk < k)) | (
                jnp.logical_not(want_min) & (pk > k)
            )
            k = jnp.where(take, pk, k)
            j //= 2
        s *= 2
    return k


# ---------------------------------------------------------------------------
# minisketch table (ids + truncated sketches of all W neighbors per row)
# ---------------------------------------------------------------------------


def mini_subrows(W: int, mini_words: int) -> int:
    """Subrows per mini-table row: (1 + mini_words) values per neighbor
    (id + prefix words), W neighbors, 128 lanes. Must divide exactly so
    the row is one id 'word' plus the prefix planes with no padding."""
    tot = (1 + mini_words) * W
    if tot % LANES != 0:
        raise ValueError(
            f"(1+mini_words)*W = {tot} must be a multiple of {LANES}"
        )
    return tot // LANES


@functools.partial(jax.jit, static_argnames=("mini_words",))
def materialize_mini(points, adj, *, mini_words: int):
    """Build the inline minisketch table uint32[cap, S, 128].

    Word-index t of neighbor n (t=0: adjacency id as uint32, 0xFFFFFFFF =
    no edge; t>=1: sketch word t-1 of that neighbor) lands at subrow
    (t*REP + r) // ... — laid out exactly like the fused table's data
    plane (lane r*W + n = word-index s*REP + r), so the kernel's popcount
    reduction is a sublane sum + lane fold with no transposes.

    One 512*S-byte DMA per expansion then carries the ids AND enough
    sketch bits (mini_words*32 per neighbor) to rank candidates — the
    scalable replacement for the full fused table (8.7KB/node) that stops
    fitting HBM past ~1.5M nodes. Search on these ESTIMATED distances,
    then rerank the final beam with full sketches (rerank_exact).
    """
    cap, W0 = adj.shape
    W = fused_width_(W0)
    words = int(np.prod(points.shape[1:]))
    if mini_words > words:
        raise ValueError("mini_words > words")
    REP = LANES // W
    MV = 1 + mini_words  # values per neighbor (id + prefix words)
    if MV % REP != 0:
        raise ValueError(f"1+mini_words={MV} must be a multiple of {REP}")
    S = mini_subrows(W, mini_words)
    tile = max(1, min(cap, 8192))
    n_tiles = -(-cap // tile)
    out = jnp.zeros((cap, S, LANES), jnp.uint32)
    pts2 = points.reshape(cap, words)

    def body(i, out):
        start = i * tile
        a = jax.lax.dynamic_slice_in_dim(adj, start, tile, 0)
        av = jnp.where(a >= 0, a, -1).astype(jnp.uint32)  # 0xFFFF... pad
        if W != W0:
            av = jnp.concatenate(
                [av, jnp.full((tile, W - W0), 0xFFFFFFFF, jnp.uint32)],
                axis=1,
            )
        g = pts2[jnp.clip(a, 0, cap - 1)][:, :, :mini_words]
        if W != W0:
            g = jnp.concatenate(
                [g, jnp.zeros((tile, W - W0, mini_words), g.dtype)], axis=1
            )
        # v[n, t]: t=0 -> id, t>=1 -> prefix word t-1
        v = jnp.concatenate([av[:, :, None], g.astype(jnp.uint32)], axis=2)
        # [tile, W, MV] -> [tile, MV, W] -> [tile, MV//REP, REP*W]
        row = jnp.swapaxes(v, 1, 2).reshape(tile, S, LANES)
        return jax.lax.dynamic_update_slice(out, row, (start, 0, 0))

    return jax.lax.fori_loop(0, n_tiles, body, out)


def fused_width_(width: int) -> int:
    if width > LANES:
        raise ValueError(f"adjacency width {width} > {LANES}")
    return min(LANES, max(1, _next_pow2(width)))


def mini_query_tiles(queries, W: int, mini_words: int):
    """Query tile matched to the mini-table layout: word-index 0 (the id
    plane) is zeroed; word-index t>=1 carries query word t-1."""
    B = queries.shape[0]
    q = queries.reshape(B, -1)[:, :mini_words]
    REP = LANES // W
    MV = 1 + mini_words
    v = jnp.concatenate(
        [jnp.zeros((B, 1), q.dtype), q.astype(jnp.uint32)], axis=1
    )  # [B, MV]
    S = MV // REP
    # tile lane r*W+n = word-index s*REP + r (same for all n)
    v3 = v.reshape(B, S, REP, 1)
    v3 = jnp.broadcast_to(v3, (B, S, REP, W))
    return v3.reshape(B, S, LANES)


# ---------------------------------------------------------------------------
# the kernels
# ---------------------------------------------------------------------------


def _make_kernel(*, ef, half, W, words, max_steps, bq, cap):
    TOT = 2 * half
    PA = LANES // W
    PP = LANES // words
    PA_SHIFT = PA.bit_length() - 1
    PP_SHIFT = PP.bit_length() - 1

    def kernel(q_ref, initd_ref, initi_ref, adj_hbm, pts_hbm,
               outd_ref, outi_ref, vis_ref, stp_ref,
               bd, bi, fb, arows, rows, eref, cref, sem):
        bd[:] = jnp.full((bq, TOT), DINF, jnp.int32)
        bi[:] = jnp.full((bq, TOT), IINF, jnp.int32)
        bd[:, 0:1] = initd_ref[:]
        bi[:, 0:1] = initi_ref[:]
        fb[:] = jnp.zeros((bq, TOT), jnp.int32)
        vis_ref[:] = jnp.ones((bq, 1), jnp.int32)
        stp_ref[:] = jnp.zeros((bq, 1), jnp.int32)

        def body(carry):
            step, _ = carry
            # ---- frontier: lex-min unexpanded (d, id) ----------------------
            hd = bd[:, :half]
            hi = bi[:, :half]
            live = (fb[:, :half] == 0) & (hd < DINF)
            md = jnp.min(jnp.where(live, hd, DINF), axis=1, keepdims=True)
            mi = jnp.min(
                jnp.where(live & (hd == md), hi, IINF), axis=1, keepdims=True
            )
            wd = bd[:, ef - 1 : ef]
            wi = bi[:, ef - 1 : ef]
            done = (md >= DINF) | (md > wd) | ((md == wd) & (mi > wi))
            fb[:, :half] = jnp.where(
                (hd == md) & (hi == mi) & jnp.logical_not(done),
                1, fb[:, :half],
            )
            eid = jnp.minimum(jnp.maximum(mi, 0), cap - 1)
            eref[:] = jnp.where(done, 0, eid)  # done -> fetch row 0 (masked)
            stp_ref[:] = stp_ref[:] + jnp.where(done, 0, 1)

            # ---- adjacency fetch: one 512B DMA per query -------------------
            def a_issue(i, c):
                pltpu.make_async_copy(
                    adj_hbm.at[eref[i, 0] >> PA_SHIFT], arows.at[i], sem
                ).start()
                return c

            jax.lax.fori_loop(0, bq, a_issue, 0, unroll=bq)

            def a_wait(i, c):
                pltpu.make_async_copy(
                    adj_hbm.at[eref[i, 0] >> PA_SHIFT], arows.at[i], sem
                ).wait()
                return c

            jax.lax.fori_loop(0, bq, a_wait, 0, unroll=bq)

            # ---- extract this node's W lanes (static select over groups) --
            row = arows[:, 0, :]  # [bq, 128] i32
            if PA == 1:
                nbr = row[:, :W]
            else:
                grp = eref[:] & (PA - 1)  # [bq, 1]
                acc = jnp.where(grp == 0, row, 0)
                for g in range(1, PA):
                    acc = acc | jnp.where(
                        grp == g, pltpu.roll(row, LANES - g * W, axis=1), 0
                    )
                nbr = acc[:, :W]

            # ---- dedup vs beam BEFORE fetching -----------------------------
            valid = (nbr >= 0) & jnp.logical_not(done)
            dup = jnp.zeros((bq, W), jnp.int32)
            bc = bi[:, :half]

            def dd(it, c):
                dup, bc = c
                return dup | (nbr == bc[:, :W]).astype(jnp.int32), pltpu.roll(
                    bc, 1, axis=1
                )

            dup, _ = jax.lax.fori_loop(0, half, dd, (dup, bc))
            fresh = valid & (dup == 0)
            vis_ref[:] = vis_ref[:] + jnp.sum(
                fresh.astype(jnp.int32), axis=1, keepdims=True
            )

            # ---- compact fresh ids to a sorted prefix ----------------------
            ck = jnp.where(fresh, nbr, IINF)
            cref[:] = _bitonic_sort1(ck, descending=False)

            # ---- per-fresh-neighbor point fetch (static trip, gated) -------
            def p_issue(i, c):
                def inner(j, c2):
                    e = cref[i, j]

                    @pl.when(e < IINF)
                    def _():
                        pltpu.make_async_copy(
                            pts_hbm.at[e >> PP_SHIFT],
                            rows.at[i, pl.ds(j, 1)], sem,
                        ).start()

                    return c2

                return jax.lax.fori_loop(0, W, inner, c, unroll=W)

            jax.lax.fori_loop(0, bq, p_issue, 0, unroll=1)

            def p_wait(i, c):
                def inner(j, c2):
                    e = cref[i, j]

                    @pl.when(e < IINF)
                    def _():
                        pltpu.make_async_copy(
                            pts_hbm.at[e >> PP_SHIFT],
                            rows.at[i, pl.ds(j, 1)], sem,
                        ).wait()

                    return c2

                return jax.lax.fori_loop(0, W, inner, c, unroll=W)

            jax.lax.fori_loop(0, bq, p_wait, 0, unroll=1)

            # ---- distances: XOR + popcount, group-masked lane sum ----------
            cids = cref[:]  # [bq, W]
            pc = jax.lax.population_count(
                jnp.bitwise_xor(rows[:], q_ref[:][:, None, :])
            ).astype(jnp.int32)  # [bq, W, 128]
            if PP == 1:
                cd = jnp.sum(pc, axis=2)
            else:
                gl = jax.lax.broadcasted_iota(
                    jnp.int32, (bq, W, LANES), 2
                ) // words
                mask = (gl == (cids & (PP - 1))[:, :, None]).astype(jnp.int32)
                cd = jnp.sum(pc * mask, axis=2)  # [bq, W]
            has = cids < IINF
            cd = jnp.where(has, cd, DINF)
            ci = jnp.where(has, cids, IINF)

            # ---- merge: sort candidates desc, 3-plane bitonic merge --------
            if W < half:
                cd = jnp.concatenate(
                    [cd, jnp.full((bq, half - W), DINF, jnp.int32)], axis=1
                )
                ci = jnp.concatenate(
                    [ci, jnp.full((bq, half - W), IINF, jnp.int32)], axis=1
                )
            sd, si = _bitonic_sort2(cd, ci, descending=True)
            bd[:, half:] = sd
            bi[:, half:] = si
            fb[:, half:] = jnp.zeros((bq, half), jnp.int32)
            m_d, m_i, m_f = _bitonic_merge2(bd[:], bi[:], fb[:])
            if ef < half:
                lane = jax.lax.broadcasted_iota(jnp.int32, (bq, TOT), 1)
                evict = (lane >= ef) & (lane < half)
                m_d = jnp.where(evict, DINF, m_d)
                m_i = jnp.where(evict, IINF, m_i)
                m_f = jnp.where(evict, 0, m_f)
            bd[:] = m_d
            bi[:] = m_i
            fb[:] = m_f

            alive = jnp.logical_not(jnp.all(done))
            return step + 1, alive

        def cond(carry):
            step, alive = carry
            return alive & (step < max_steps)

        jax.lax.while_loop(cond, body, (jnp.int32(0), True))
        outd_ref[:] = bd[:, :half]
        outi_ref[:] = bi[:, :half]

    return kernel


def _make_mini_kernel(*, ef, half, W, mini_words, max_steps, bq, cap,
                      ne=1, tie_bits=0):
    TOT = 2 * half
    REP = LANES // W
    S = mini_subrows(W, mini_words)

    def kernel(qt_ref, initd_ref, initi_ref, mini_hbm,
               outd_ref, outi_ref, vis_ref, stp_ref,
               bd, bi, fb, rows, eref, sem):
        # ne seeds (sorted asc by (d, id), distinct, ALREADY tie-encoded
        # when tie_bits > 0) fill lanes 0..ne-1 — multi-seed entry from the
        # MXU sample's top-B (ops/entry.py sampled_entry_topk)
        bd[:] = jnp.full((bq, TOT), DINF, jnp.int32)
        bi[:] = jnp.full((bq, TOT), IINF, jnp.int32)
        bd[:, 0:ne] = initd_ref[:]
        bi[:, 0:ne] = initi_ref[:]
        fb[:] = jnp.zeros((bq, TOT), jnp.int32)
        vis_ref[:] = jnp.sum(
            (initi_ref[:] < IINF).astype(jnp.int32), axis=1, keepdims=True
        )
        stp_ref[:] = jnp.zeros((bq, 1), jnp.int32)

        cand_lane = jax.lax.broadcasted_iota(jnp.int32, (bq, W), 1)

        def body(carry):
            step, _ = carry
            hd = bd[:, :half]
            hi = bi[:, :half]
            live = (fb[:, :half] == 0) & (hd < DINF)
            md = jnp.min(jnp.where(live, hd, DINF), axis=1, keepdims=True)
            mi = jnp.min(
                jnp.where(live & (hd == md), hi, IINF), axis=1, keepdims=True
            )
            wd = bd[:, ef - 1 : ef]
            wi = bi[:, ef - 1 : ef]
            done = (md >= DINF) | (md > wd) | ((md == wd) & (mi > wi))
            fb[:, :half] = jnp.where(
                (hd == md) & (hi == mi) & jnp.logical_not(done),
                1, fb[:, :half],
            )
            if tie_bits:
                # beam ids are tie-ENCODED; decode (involution) for the DMA
                mi_dec = bitrev_ids(
                    jnp.clip(mi, 0, (1 << tie_bits) - 1), tie_bits
                )
                eid = jnp.minimum(jnp.maximum(mi_dec, 0), cap - 1)
            else:
                eid = jnp.minimum(jnp.maximum(mi, 0), cap - 1)
            eref[:] = jnp.where(done, 0, eid)
            stp_ref[:] = stp_ref[:] + jnp.where(done, 0, 1)

            # ---- ONE DMA per query: ids + prefix sketches of all W nbrs
            def issue(i, c):
                pltpu.make_async_copy(
                    mini_hbm.at[eref[i, 0]], rows.at[i], sem
                ).start()
                return c

            jax.lax.fori_loop(0, bq, issue, 0, unroll=bq)

            def wait(i, c):
                pltpu.make_async_copy(
                    mini_hbm.at[eref[i, 0]], rows.at[i], sem
                ).wait()
                return c

            jax.lax.fori_loop(0, bq, wait, 0, unroll=bq)

            # ---- estimated distances: XOR + popcount, mask the id plane
            pc = jax.lax.population_count(
                jnp.bitwise_xor(rows[:], qt_ref[:])
            ).astype(jnp.int32)  # [bq, S, 128]
            lane = jax.lax.broadcasted_iota(jnp.int32, (bq, S, LANES), 2)
            sub = jax.lax.broadcasted_iota(jnp.int32, (bq, S, LANES), 1)
            is_id = (sub == 0) & (lane < W)  # word-index 0
            pc = jnp.where(is_id, 0, pc)
            acc = jnp.sum(pc, axis=1)  # [bq, 128]
            w = LANES
            while w > W:
                w //= 2
                acc = acc[:, :w] + acc[:, w:]
            cd = acc  # [bq, W] prefix distances

            nbr = rows[:, 0, :W].astype(jnp.int32)  # ids (word-index 0)
            valid = (nbr >= 0) & jnp.logical_not(done)
            if tie_bits:
                # encode to the tie-decorrelated key space (beam ids and
                # all compares below live there); invalid lanes -> -1 so
                # they can never match a beam slot
                nbr = jnp.where(valid, bitrev_ids(nbr, tie_bits), -1)

            # ---- dedup vs beam ids
            dup = jnp.zeros((bq, W), jnp.int32)
            bc = bi[:, :half]

            def dd(it, c):
                dup, bc = c
                return dup | (nbr == bc[:, :W]).astype(jnp.int32), pltpu.roll(
                    bc, 1, axis=1
                )

            dup, _ = jax.lax.fori_loop(0, half, dd, (dup, bc))
            fresh = valid & (dup == 0)
            vis_ref[:] = vis_ref[:] + jnp.sum(
                fresh.astype(jnp.int32), axis=1, keepdims=True
            )
            cd = jnp.where(fresh, cd, DINF)
            ci = jnp.where(fresh, nbr, IINF)

            # ---- merge
            if W < half:
                cd = jnp.concatenate(
                    [cd, jnp.full((bq, half - W), DINF, jnp.int32)], axis=1
                )
                ci = jnp.concatenate(
                    [ci, jnp.full((bq, half - W), IINF, jnp.int32)], axis=1
                )
            sd, si = _bitonic_sort2(cd, ci, descending=True)
            bd[:, half:] = sd
            bi[:, half:] = si
            fb[:, half:] = jnp.zeros((bq, half), jnp.int32)
            m_d, m_i, m_f = _bitonic_merge2(bd[:], bi[:], fb[:])
            if ef < half:
                lane2 = jax.lax.broadcasted_iota(jnp.int32, (bq, TOT), 1)
                evict = (lane2 >= ef) & (lane2 < half)
                m_d = jnp.where(evict, DINF, m_d)
                m_i = jnp.where(evict, IINF, m_i)
                m_f = jnp.where(evict, 0, m_f)
            bd[:] = m_d
            bi[:] = m_i
            fb[:] = m_f

            alive = jnp.logical_not(jnp.all(done))
            return step + 1, alive

        def cond(carry):
            step, alive = carry
            return alive & (step < max_steps)

        jax.lax.while_loop(cond, body, (jnp.int32(0), True))
        outd_ref[:] = bd[:, :half]
        outi_ref[:] = bi[:, :half]

    return kernel, S


def _make_mini_kernel_packed(*, ef, W, mini_words, max_steps, bq, cap,
                             ne=1, tie_bits=0):
    """Two-queries-per-row mini kernel (beam half == 64 only): queries
    2i/2i+1 share one 128-lane row — a in lanes 0-63, b in 64-127 — so
    the two-plane bitonic networks and the dedup rotation run at
    full-vreg occupancy (the unpacked kernel's 64-lane networks waste
    half of every vector op). Semantics are IDENTICAL to
    _make_mini_kernel: same (d, id) lex order, termination, visited and
    step accounting."""
    SPAN = 64
    bq2 = bq // 2
    S = mini_subrows(W, mini_words)

    def kernel(qt_ref, initd_ref, initi_ref, mini_hbm,
               outd_ref, outi_ref, vis_ref, stp_ref,
               bd, bi, fb, rows, eref, sem):
        # init planes arrive [bq2, 2*ne]: query a's ne seeds then query b's
        # (sorted asc, distinct, tie-encoded when tie_bits > 0)
        bd[:] = jnp.full((bq2, LANES), DINF, jnp.int32)
        bi[:] = jnp.full((bq2, LANES), IINF, jnp.int32)
        bd[:, 0:ne] = initd_ref[:, 0:ne]
        bd[:, SPAN : SPAN + ne] = initd_ref[:, ne : 2 * ne]
        bi[:, 0:ne] = initi_ref[:, 0:ne]
        bi[:, SPAN : SPAN + ne] = initi_ref[:, ne : 2 * ne]
        fb[:] = jnp.zeros((bq2, LANES), jnp.int32)
        vis_ref[:, 0:1] = jnp.sum(
            (initi_ref[:, 0:ne] < IINF).astype(jnp.int32),
            axis=1, keepdims=True,
        )
        vis_ref[:, 1:2] = jnp.sum(
            (initi_ref[:, ne : 2 * ne] < IINF).astype(jnp.int32),
            axis=1, keepdims=True,
        )
        stp_ref[:] = jnp.zeros((bq2, 2), jnp.int32)

        lane = jax.lax.broadcasted_iota(jnp.int32, (bq2, LANES), 1)
        isa = lane < SPAN
        elem = lane & (SPAN - 1)
        at0 = elem == 0

        def body(carry):
            step, _ = carry
            # ---- frontier per half: lex-min unexpanded (d, id) -------------
            live = (fb[:] == 0) & (bd[:] < DINF)
            md = jnp.where(live, bd[:], DINF)
            md_a = jnp.min(jnp.where(isa, md, DINF), axis=1, keepdims=True)
            md_b = jnp.min(jnp.where(isa, DINF, md), axis=1, keepdims=True)
            mi_a = jnp.min(
                jnp.where(isa & live & (bd[:] == md_a), bi[:], IINF),
                axis=1, keepdims=True,
            )
            mi_b = jnp.min(
                jnp.where(jnp.logical_not(isa) & live & (bd[:] == md_b),
                          bi[:], IINF),
                axis=1, keepdims=True,
            )
            wd_a = bd[:, ef - 1 : ef]
            wi_a = bi[:, ef - 1 : ef]
            wd_b = bd[:, SPAN + ef - 1 : SPAN + ef]
            wi_b = bi[:, SPAN + ef - 1 : SPAN + ef]
            done_a = ((md_a >= DINF) | (md_a > wd_a)
                      | ((md_a == wd_a) & (mi_a > wi_a)))
            done_b = ((md_b >= DINF) | (md_b > wd_b)
                      | ((md_b == wd_b) & (mi_b > wi_b)))
            done_l = (isa & done_a) | (jnp.logical_not(isa) & done_b)
            md_l = jnp.where(isa, md_a, md_b)
            mi_l = jnp.where(isa, mi_a, mi_b)
            fb[:] = jnp.where(
                (bd[:] == md_l) & (bi[:] == mi_l)
                & jnp.logical_not(done_l),
                1, fb[:],
            )
            if tie_bits:
                hi_mask = (1 << tie_bits) - 1
                mi_a_dec = bitrev_ids(jnp.clip(mi_a, 0, hi_mask), tie_bits)
                mi_b_dec = bitrev_ids(jnp.clip(mi_b, 0, hi_mask), tie_bits)
            else:
                mi_a_dec, mi_b_dec = mi_a, mi_b
            eref[:, 0:1] = jnp.where(
                done_a, 0, jnp.minimum(jnp.maximum(mi_a_dec, 0), cap - 1)
            )
            eref[:, 1:2] = jnp.where(
                done_b, 0, jnp.minimum(jnp.maximum(mi_b_dec, 0), cap - 1)
            )
            stp_ref[:, 0:1] = stp_ref[:, 0:1] + jnp.where(done_a, 0, 1)
            stp_ref[:, 1:2] = stp_ref[:, 1:2] + jnp.where(done_b, 0, 1)

            # ---- two mini-row DMAs per packed row --------------------------
            def issue(i, c):
                pltpu.make_async_copy(
                    mini_hbm.at[eref[i, 0]], rows.at[i, pl.ds(0, S)], sem
                ).start()
                pltpu.make_async_copy(
                    mini_hbm.at[eref[i, 1]], rows.at[i, pl.ds(S, S)], sem
                ).start()
                return c

            jax.lax.fori_loop(0, bq2, issue, 0, unroll=bq2)

            def wait(i, c):
                pltpu.make_async_copy(
                    mini_hbm.at[eref[i, 0]], rows.at[i, pl.ds(0, S)], sem
                ).wait()
                pltpu.make_async_copy(
                    mini_hbm.at[eref[i, 1]], rows.at[i, pl.ds(S, S)], sem
                ).wait()
                return c

            jax.lax.fori_loop(0, bq2, wait, 0, unroll=bq2)

            # ---- estimated distances per half ------------------------------
            pc = jax.lax.population_count(
                jnp.bitwise_xor(rows[:], qt_ref[:])
            ).astype(jnp.int32)  # [bq2, 2S, 128]
            sub = jax.lax.broadcasted_iota(jnp.int32, (bq2, 2 * S, LANES), 1)
            ln3 = jax.lax.broadcasted_iota(jnp.int32, (bq2, 2 * S, LANES), 2)
            is_id = ((sub == 0) | (sub == S)) & (ln3 < W)
            pc = jnp.where(is_id, 0, pc)

            def fold(acc):
                w = LANES
                while w > W:
                    w //= 2
                    acc = acc[:, :w] + acc[:, w:]
                if W < SPAN:
                    acc = jnp.concatenate(
                        [acc, jnp.full((bq2, SPAN - W), DINF, jnp.int32)],
                        axis=1,
                    )
                return acc  # [bq2, 64]

            cd_a = fold(jnp.sum(pc[:, :S, :], axis=1))
            cd_b = fold(jnp.sum(pc[:, S:, :], axis=1))
            cd = jnp.concatenate([cd_a, cd_b], axis=1)  # [bq2, 128]

            # ---- candidate ids per half ------------------------------------
            na = rows[:, 0, :].astype(jnp.int32)
            nb = rows[:, S, :].astype(jnp.int32)
            nbr = jnp.concatenate([na[:, :SPAN], nb[:, :SPAN]], axis=1)
            nbr = jnp.where(elem < W, nbr, -1)
            valid = (nbr >= 0) & jnp.logical_not(done_l)
            if tie_bits:
                nbr = jnp.where(valid, bitrev_ids(nbr, tie_bits), -1)

            # ---- dedup vs own beam: within-span rotation -------------------
            def dd(it, c):
                dup, bc = c
                dup = dup | (nbr == bc).astype(jnp.int32)
                bc = jnp.where(
                    at0,
                    pltpu.roll(bc, SPAN + 1, axis=1),
                    pltpu.roll(bc, 1, axis=1),
                )
                return dup, bc

            dup, _ = jax.lax.fori_loop(
                0, SPAN, dd, (jnp.zeros((bq2, LANES), jnp.int32), bi[:])
            )
            fresh = valid & (dup == 0)
            fr = fresh.astype(jnp.int32)
            vis_ref[:, 0:1] = vis_ref[:, 0:1] + jnp.sum(
                jnp.where(isa, fr, 0), axis=1, keepdims=True
            )
            vis_ref[:, 1:2] = vis_ref[:, 1:2] + jnp.sum(
                jnp.where(isa, 0, fr), axis=1, keepdims=True
            )
            cdm = jnp.where(fresh, cd, DINF)
            cim = jnp.where(fresh, nbr, IINF)

            # ---- merge: per-span desc sort, cross-plane packed merge -------
            sd, si = _bitonic_sort2_span(cdm, cim, descending=True, span=SPAN)
            nd, ni, nf = _merge2_packed(bd[:], bi[:], fb[:], sd, si, SPAN)
            if ef < SPAN:
                evict = elem >= ef
                nd = jnp.where(evict, DINF, nd)
                ni = jnp.where(evict, IINF, ni)
                nf = jnp.where(evict, 0, nf)
            bd[:] = nd
            bi[:] = ni
            fb[:] = nf

            alive = jnp.logical_not(jnp.all(done_l))
            return step + 1, alive

        def cond(carry):
            step, alive = carry
            return alive & (step < max_steps)

        jax.lax.while_loop(cond, body, (jnp.int32(0), True))
        outd_ref[:] = bd[:]
        outi_ref[:] = bi[:]

    return kernel, S


def _make_mini_kernel_s128(*, ef, W, mini_words, max_steps, bq, cap,
                           ne=1, tie_bits=0):
    """One-query-per-ROW mini kernel for beam half == 128 (64 < ef <= 128):
    the beam is a single [bq, 128] plane and the merge is the cross-plane
    swap + intra-row bitonic merge (same trick as _merge2_packed at
    span=128) — the unpacked kernel at half=128 instead carries [bq, 256]
    planes whose sort networks cross vector registers, the measured 3.5x
    per-step cliff past ef=64 (benches/results_10m.json ef=96 vs 64).
    Semantics are IDENTICAL to _make_mini_kernel at half=128: same (d, id)
    lex order, termination, visited and step accounting (bit-exactness:
    tests/test_dma_search.py)."""
    S = mini_subrows(W, mini_words)

    def kernel(qt_ref, initd_ref, initi_ref, mini_hbm,
               outd_ref, outi_ref, vis_ref, stp_ref,
               bd, bi, fb, rows, eref, sem):
        bd[:] = jnp.full((bq, LANES), DINF, jnp.int32)
        bi[:] = jnp.full((bq, LANES), IINF, jnp.int32)
        bd[:, 0:ne] = initd_ref[:]
        bi[:, 0:ne] = initi_ref[:]
        fb[:] = jnp.zeros((bq, LANES), jnp.int32)
        vis_ref[:] = jnp.sum(
            (initi_ref[:] < IINF).astype(jnp.int32), axis=1, keepdims=True
        )
        stp_ref[:] = jnp.zeros((bq, 1), jnp.int32)

        lane = jax.lax.broadcasted_iota(jnp.int32, (bq, LANES), 1)

        def body(carry):
            step, _ = carry
            # ---- frontier: lex-min unexpanded (d, id) over the full row
            live = (fb[:] == 0) & (bd[:] < DINF)
            md = jnp.min(jnp.where(live, bd[:], DINF), axis=1, keepdims=True)
            mi = jnp.min(
                jnp.where(live & (bd[:] == md), bi[:], IINF),
                axis=1, keepdims=True,
            )
            wd = bd[:, ef - 1 : ef]
            wi = bi[:, ef - 1 : ef]
            done = (md >= DINF) | (md > wd) | ((md == wd) & (mi > wi))
            fb[:] = jnp.where(
                (bd[:] == md) & (bi[:] == mi) & jnp.logical_not(done),
                1, fb[:],
            )
            if tie_bits:
                mi_dec = bitrev_ids(
                    jnp.clip(mi, 0, (1 << tie_bits) - 1), tie_bits
                )
            else:
                mi_dec = mi
            eref[:] = jnp.where(
                done, 0, jnp.minimum(jnp.maximum(mi_dec, 0), cap - 1)
            )
            stp_ref[:] = stp_ref[:] + jnp.where(done, 0, 1)

            # ---- ONE DMA per query
            def issue(i, c):
                pltpu.make_async_copy(
                    mini_hbm.at[eref[i, 0]], rows.at[i], sem
                ).start()
                return c

            jax.lax.fori_loop(0, bq, issue, 0, unroll=bq)

            def wait(i, c):
                pltpu.make_async_copy(
                    mini_hbm.at[eref[i, 0]], rows.at[i], sem
                ).wait()
                return c

            jax.lax.fori_loop(0, bq, wait, 0, unroll=bq)

            # ---- estimated distances (same reduction as the unpacked
            # kernel), padded to the full 128-lane candidate row
            pc = jax.lax.population_count(
                jnp.bitwise_xor(rows[:], qt_ref[:])
            ).astype(jnp.int32)  # [bq, S, 128]
            ln3 = jax.lax.broadcasted_iota(jnp.int32, (bq, S, LANES), 2)
            sub = jax.lax.broadcasted_iota(jnp.int32, (bq, S, LANES), 1)
            is_id = (sub == 0) & (ln3 < W)
            pc = jnp.where(is_id, 0, pc)
            acc = jnp.sum(pc, axis=1)  # [bq, 128]
            w = LANES
            while w > W:
                w //= 2
                acc = acc[:, :w] + acc[:, w:]
            if W < LANES:
                acc = jnp.concatenate(
                    [acc, jnp.full((bq, LANES - W), DINF, jnp.int32)], axis=1
                )
            cd = acc  # [bq, 128]

            nbr = rows[:, 0, :].astype(jnp.int32)  # [bq, 128]
            nbr = jnp.where(lane < W, nbr, -1)
            valid = (nbr >= 0) & jnp.logical_not(done)
            if tie_bits:
                nbr = jnp.where(valid, bitrev_ids(nbr, tie_bits), -1)

            # ---- dedup vs beam: full-row rotation
            def dd(it, c):
                dup, bc = c
                return (dup | (nbr == bc).astype(jnp.int32),
                        pltpu.roll(bc, 1, axis=1))

            dup, _ = jax.lax.fori_loop(
                0, LANES, dd, (jnp.zeros((bq, LANES), jnp.int32), bi[:])
            )
            fresh = valid & (dup == 0)
            vis_ref[:] = vis_ref[:] + jnp.sum(
                fresh.astype(jnp.int32), axis=1, keepdims=True
            )
            cdm = jnp.where(fresh, cd, DINF)
            cim = jnp.where(fresh, nbr, IINF)

            # ---- merge: desc-sort candidates, cross-plane swap + merge
            sd, si = _bitonic_sort2(cdm, cim, descending=True)
            nd, ni, nf = _merge2_packed(bd[:], bi[:], fb[:], sd, si, LANES)
            if ef < LANES:
                evict = lane >= ef
                nd = jnp.where(evict, DINF, nd)
                ni = jnp.where(evict, IINF, ni)
                nf = jnp.where(evict, 0, nf)
            bd[:] = nd
            bi[:] = ni
            fb[:] = nf

            alive = jnp.logical_not(jnp.all(done))
            return step + 1, alive

        def cond(carry):
            step, alive = carry
            return alive & (step < max_steps)

        jax.lax.while_loop(cond, body, (jnp.int32(0), True))
        outd_ref[:] = bd[:]
        outi_ref[:] = bi[:]

    return kernel, S


@functools.partial(
    jax.jit,
    static_argnames=("ef", "W", "mini_words", "max_steps", "block_q",
                     "interpret", "packed", "tie_bits"),
)
def mini_beam_search(
    mini,
    queries,
    init_d,
    init_i,
    *,
    ef: int,
    W: int,
    mini_words: int,
    max_steps: int = 256,
    block_q: int = 256,
    interpret: bool = False,
    packed: str = "auto",
    tie_bits: int = 0,
):
    """Beam search on ESTIMATED (prefix minisketch) distances: one DMA per
    expansion from the inline mini table. ``init_d`` must be the PREFIX
    distance(s) of the entry point(s) (same mini_words); ``init_d`` /
    ``init_i`` are [B] (one seed) or [B, E] (E DISTINCT seeds per query,
    any order — sorted here). Returns prefix distances — rerank the ids
    with full sketches (``rerank_exact``) for final results.

    ``packed`` selects the kernel: "auto" picks the two-queries-per-row
    kernel at beam half 64 (ef <= 64, W <= 64) and the one-query-per-row
    span-128 kernel at beam half 128 (64 < ef <= 128); "never" pins the
    unpacked reference kernel; "always"/"span128" pin the fast variants
    for A/B runs. Results are identical across kernels.

    ``tie_bits`` > 0 turns on tie decorrelation: beam keys order by the
    BIT-REVERSED id (bitrev_ids) so estimated-distance ties stop favoring
    low ids — required for recall parity on BFS-reordered tables (where
    low id == entry-proximal; docs/SCALE.md). Ids returned are REAL ids
    either way. Requires cap <= 2**tie_bits."""
    B = queries.shape[0]
    if B % block_q != 0:
        raise ValueError(f"B={B} not a multiple of block_q={block_q}")
    half = max(64, _next_pow2(ef), _next_pow2(W))
    if half > LANES:
        raise ValueError(f"ef={ef} needs beam half {half} > {LANES} lanes")
    cap = mini.shape[0]
    if tie_bits and cap > (1 << tie_bits):
        raise ValueError(f"cap={cap} exceeds 2**tie_bits={1 << tie_bits}")
    qt = mini_query_tiles(queries, W, mini_words)
    init_d = init_d.reshape(B, -1).astype(jnp.int32)
    init_i = init_i.reshape(B, -1).astype(jnp.int32)
    E = init_i.shape[1]
    if E > min(ef, half):
        raise ValueError(f"{E} entry seeds > ef={ef}")
    if tie_bits:
        init_i = jnp.where(
            init_i < IINF, bitrev_ids(init_i, tie_bits), init_i
        )
    if E > 1:
        # the kernels require the seed prefix sorted asc by (d, id) — the
        # first merge treats the beam half as an ascending run
        init_d, init_i = jax.lax.sort((init_d, init_i), num_keys=2)
    if packed == "auto":
        use_packed = half == 64 and block_q % 2 == 0
        use_s128 = half == 128
    else:
        use_packed = packed == "always"
        use_s128 = packed == "span128"
    if use_packed:
        outd, outi, vis, stp = _mini_packed(
            mini, qt, init_d, init_i, ef=ef, W=W, mini_words=mini_words,
            max_steps=max_steps, block_q=block_q, interpret=interpret,
            tie_bits=tie_bits,
        )
    elif use_s128:
        if half != 128:
            raise ValueError("span128 kernel requires beam half == 128")
        kernel, S = _make_mini_kernel_s128(
            ef=ef, W=W, mini_words=mini_words, max_steps=max_steps,
            bq=block_q, cap=cap, ne=E, tie_bits=tie_bits,
        )
        outd, outi, vis, stp = _mini_call(
            kernel, S, mini, qt, init_d, init_i, B=B, half=128,
            block_q=block_q, interpret=interpret, beam_scratch=LANES,
        )
    else:
        kernel, S = _make_mini_kernel(
            ef=ef, half=half, W=W, mini_words=mini_words,
            max_steps=max_steps, bq=block_q, cap=cap, ne=E,
            tie_bits=tie_bits,
        )
        outd, outi, vis, stp = _mini_call(
            kernel, S, mini, qt, init_d, init_i, B=B, half=half,
            block_q=block_q, interpret=interpret, beam_scratch=2 * half,
        )
    if tie_bits:
        outi = jnp.where(outi < IINF, bitrev_ids(outi, tie_bits), outi)
    return outd, outi, vis, stp


def _mini_call(kernel, S, mini, qt, init_d, init_i, *, B, half, block_q,
               interpret, beam_scratch):
    """pallas_call plumbing shared by the unpacked and span-128 mini
    kernels (one query per row; [B, E] init planes)."""
    E = init_i.shape[1]
    grid = (B // block_q,)
    outd, outi, vis, stp = pl.pallas_call(
        kernel,
        grid=grid,
        out_shape=(
            jax.ShapeDtypeStruct((B, half), jnp.int32),
            jax.ShapeDtypeStruct((B, half), jnp.int32),
            jax.ShapeDtypeStruct((B, 1), jnp.int32),
            jax.ShapeDtypeStruct((B, 1), jnp.int32),
        ),
        in_specs=[
            pl.BlockSpec((block_q, S, LANES), lambda i: (i, 0, 0),
                         memory_space=pltpu.VMEM),
            pl.BlockSpec((block_q, E), lambda i: (i, 0),
                         memory_space=pltpu.VMEM),
            pl.BlockSpec((block_q, E), lambda i: (i, 0),
                         memory_space=pltpu.VMEM),
            pl.BlockSpec(memory_space=pl.ANY),
        ],
        out_specs=(
            pl.BlockSpec((block_q, half), lambda i: (i, 0),
                         memory_space=pltpu.VMEM),
            pl.BlockSpec((block_q, half), lambda i: (i, 0),
                         memory_space=pltpu.VMEM),
            pl.BlockSpec((block_q, 1), lambda i: (i, 0),
                         memory_space=pltpu.VMEM),
            pl.BlockSpec((block_q, 1), lambda i: (i, 0),
                         memory_space=pltpu.VMEM),
        ),
        scratch_shapes=[
            pltpu.VMEM((block_q, beam_scratch), jnp.int32),  # beam dists
            pltpu.VMEM((block_q, beam_scratch), jnp.int32),  # beam ids
            pltpu.VMEM((block_q, beam_scratch), jnp.int32),  # expanded
            pltpu.VMEM((block_q, S, LANES), jnp.uint32),     # mini rows
            pltpu.VMEM((block_q, 1), jnp.int32),             # expansion ids
            pltpu.SemaphoreType.DMA,
        ],
        interpret=interpret,
        compiler_params=None if interpret else pltpu.CompilerParams(
            vmem_limit_bytes=100 * 1024 * 1024,
        ),
    )(qt, init_d, init_i, mini)
    return outd, outi, vis[:, 0], stp[:, 0]


def _mini_packed(mini, qt, init_d, init_i, *, ef, W, mini_words, max_steps,
                 block_q, interpret, tie_bits=0):
    """pallas_call plumbing for the two-queries-per-row mini kernel:
    query tiles [B, S, 128] -> [B/2, 2S, 128] (row pair = subrow concat),
    init planes [B, E] -> [B/2, 2E], outputs [B/2, 128] -> [B, 64]."""
    B = qt.shape[0]
    E = init_i.shape[1]
    bq2 = block_q // 2
    kernel, S = _make_mini_kernel_packed(
        ef=ef, W=W, mini_words=mini_words, max_steps=max_steps,
        bq=block_q, cap=mini.shape[0], ne=E, tie_bits=tie_bits,
    )
    qt2 = qt.reshape(B // 2, 2 * S, LANES)
    grid = (B // block_q,)
    outd, outi, vis, stp = pl.pallas_call(
        kernel,
        grid=grid,
        out_shape=(
            jax.ShapeDtypeStruct((B // 2, LANES), jnp.int32),
            jax.ShapeDtypeStruct((B // 2, LANES), jnp.int32),
            jax.ShapeDtypeStruct((B // 2, 2), jnp.int32),
            jax.ShapeDtypeStruct((B // 2, 2), jnp.int32),
        ),
        in_specs=[
            pl.BlockSpec((bq2, 2 * S, LANES), lambda i: (i, 0, 0),
                         memory_space=pltpu.VMEM),
            pl.BlockSpec((bq2, 2 * E), lambda i: (i, 0),
                         memory_space=pltpu.VMEM),
            pl.BlockSpec((bq2, 2 * E), lambda i: (i, 0),
                         memory_space=pltpu.VMEM),
            pl.BlockSpec(memory_space=pl.ANY),
        ],
        out_specs=(
            pl.BlockSpec((bq2, LANES), lambda i: (i, 0),
                         memory_space=pltpu.VMEM),
            pl.BlockSpec((bq2, LANES), lambda i: (i, 0),
                         memory_space=pltpu.VMEM),
            pl.BlockSpec((bq2, 2), lambda i: (i, 0),
                         memory_space=pltpu.VMEM),
            pl.BlockSpec((bq2, 2), lambda i: (i, 0),
                         memory_space=pltpu.VMEM),
        ),
        scratch_shapes=[
            pltpu.VMEM((bq2, LANES), jnp.int32),          # beam est dists
            pltpu.VMEM((bq2, LANES), jnp.int32),          # beam ids
            pltpu.VMEM((bq2, LANES), jnp.int32),          # expanded flags
            pltpu.VMEM((bq2, 2 * S, LANES), jnp.uint32),  # mini row pair
            pltpu.VMEM((bq2, 2), jnp.int32),              # expansion ids
            pltpu.SemaphoreType.DMA,
        ],
        interpret=interpret,
        compiler_params=None if interpret else pltpu.CompilerParams(
            vmem_limit_bytes=100 * 1024 * 1024,
        ),
    )(qt2, init_d.reshape(B // 2, 2 * E),
      init_i.reshape(B // 2, 2 * E), mini)
    return (outd.reshape(B, 64), outi.reshape(B, 64),
            vis.reshape(B), stp.reshape(B))


@functools.partial(jax.jit, static_argnames=("k", "dedup"))
def rerank_exact(points, queries, cand_ids, *, k: int, dedup: bool = False):
    """Exact rerank of the mini search's candidates: gather full sketches,
    Hamming distance, two-key (d, id) sort, top-k. One [B, half] gather
    per query batch (amortized ~93ns/row) replaces exact distances inside
    the search loop. ``dedup`` drops repeated ids (keeps the first sorted
    occurrence) before the final top-k — required when ``cand_ids`` may
    contain duplicates (the one-hop expansion)."""
    B, H = cand_ids.shape
    cap = points.shape[0]
    valid = (cand_ids >= 0) & (cand_ids < cap)
    safe = jnp.clip(cand_ids, 0, cap - 1)
    pts = points[safe].reshape(B, H, -1)  # [B, H, words]
    q = queries.reshape(B, 1, -1)
    d = jnp.sum(
        jax.lax.population_count(pts ^ q), axis=2
    ).astype(jnp.int32)
    d = jnp.where(valid, d, DINF)
    ids = jnp.where(valid, cand_ids, IINF)
    if dedup:
        # sort by (id, d) so duplicates are adjacent with the best first
        ids, d = jax.lax.sort((ids, d), num_keys=2)
        dup = jnp.concatenate(
            [jnp.zeros((B, 1), bool), ids[:, 1:] == ids[:, :-1]], axis=1
        )
        d = jnp.where(dup, DINF, d)
        ids = jnp.where(dup, IINF, ids)
    d, ids = jax.lax.sort((d, ids), num_keys=2)
    return d[:, :k], ids[:, :k]


@functools.partial(jax.jit, static_argnames=("k", "seeds"))
def rerank_onehop(points, adj, queries, cand_ids, *, k: int, seeds: int):
    """One-hop exact expansion rerank: exact-rank the search's candidate
    beam, take the ``seeds`` best ids, union their FULL adjacency rows
    with the beam, and exact-rank the union for the final top-k.

    Rescues recall in the coarse-estimate regime (10M-scale mini tables
    carry only ~224 sketch bits): the estimated-distance beam reliably
    reaches the right neighborhood but mis-ranks near-equidistant
    members; the seeds' graph rows re-cover the true neighbors the
    estimate evicted. Cost: (beam + seeds*W) exact gathers per query
    (~93ns/row) — e.g. 128 + 8*64 = 640 rows ~= 60us/query, on top of
    the kernel. Parity note: the reference has no analogue (its search is
    exact end-to-end, nsw.rs:133-184); this is the TPU-side recall
    equalizer for inexact navigation."""
    B, H = cand_ids.shape
    cap = points.shape[0]
    # one exact pass over the beam serves BOTH seed selection and the
    # final union sort (re-gathering the beam would waste H rows/query)
    bd, bi = rerank_exact(points, queries, cand_ids, k=H)
    seed_ids = bi[:, :seeds]
    rows = adj[jnp.clip(seed_ids, 0, cap - 1)]  # [B, seeds, W]
    rows = jnp.where(
        (seed_ids >= 0)[:, :, None] & (seed_ids < cap)[:, :, None],
        rows, -1,
    ).reshape(B, -1)
    valid = (rows >= 0) & (rows < cap)
    safe = jnp.clip(rows, 0, cap - 1)
    pts = points[safe].reshape(B, rows.shape[1], -1)
    hd = jnp.sum(
        jax.lax.population_count(pts ^ queries.reshape(B, 1, -1)), axis=2
    ).astype(jnp.int32)
    hd = jnp.where(valid, hd, DINF)
    hi = jnp.where(valid, rows, IINF)
    d = jnp.concatenate([bd, hd], axis=1)
    ids = jnp.concatenate([bi, hi], axis=1)
    # dedup by id (hop rows overlap the beam and each other), then top-k
    ids, d = jax.lax.sort((ids, d), num_keys=2)
    dup = jnp.concatenate(
        [jnp.zeros((B, 1), bool), ids[:, 1:] == ids[:, :-1]], axis=1
    )
    d = jnp.where(dup, DINF, d)
    ids = jnp.where(dup, IINF, ids)
    d, ids = jax.lax.sort((d, ids), num_keys=2)
    return d[:, :k], ids[:, :k]


@functools.partial(
    jax.jit,
    static_argnames=("ef", "W", "words", "max_steps", "block_q", "interpret"),
)
def dma_beam_search(
    adj2,
    pts4,
    queries,
    init_d,
    init_i,
    *,
    ef: int,
    W: int,
    words: int,
    max_steps: int = 256,
    block_q: int = 256,
    interpret: bool = False,
):
    """Run the large-N fused search.

    Args:
      adj2/pts4: packed tables (``pack_adj`` / ``pack_points``).
      queries: [B, words...] raw sketches (B a multiple of block_q).
      init_d/init_i: int32[B] entry distances / ids (e.g. sampled entry).

    Returns (dists int32[B, half], ids int32[B, half], visited int32[B],
    steps int32[B]) ascending by (d, id); empty slots are (DINF, IINF).
    """
    B = queries.shape[0]
    if B % block_q != 0:
        raise ValueError(f"B={B} not a multiple of block_q={block_q}")
    half = max(64, _next_pow2(ef), _next_pow2(W))
    if half > LANES:
        raise ValueError(f"ef={ef} needs beam half {half} > {LANES} lanes")
    pa = LANES // W
    cap = adj2.shape[0] * pa
    qr = query_rep(queries, words)  # [B, 128]
    kernel = _make_kernel(
        ef=ef, half=half, W=W, words=words, max_steps=max_steps,
        bq=block_q, cap=cap,
    )
    grid = (B // block_q,)
    outd, outi, vis, stp = pl.pallas_call(
        kernel,
        grid=grid,
        out_shape=(
            jax.ShapeDtypeStruct((B, half), jnp.int32),
            jax.ShapeDtypeStruct((B, half), jnp.int32),
            jax.ShapeDtypeStruct((B, 1), jnp.int32),
            jax.ShapeDtypeStruct((B, 1), jnp.int32),
        ),
        in_specs=[
            pl.BlockSpec((block_q, LANES), lambda i: (i, 0),
                         memory_space=pltpu.VMEM),
            pl.BlockSpec((block_q, 1), lambda i: (i, 0),
                         memory_space=pltpu.VMEM),
            pl.BlockSpec((block_q, 1), lambda i: (i, 0),
                         memory_space=pltpu.VMEM),
            pl.BlockSpec(memory_space=pl.ANY),
            pl.BlockSpec(memory_space=pl.ANY),
        ],
        out_specs=(
            pl.BlockSpec((block_q, half), lambda i: (i, 0),
                         memory_space=pltpu.VMEM),
            pl.BlockSpec((block_q, half), lambda i: (i, 0),
                         memory_space=pltpu.VMEM),
            pl.BlockSpec((block_q, 1), lambda i: (i, 0),
                         memory_space=pltpu.VMEM),
            pl.BlockSpec((block_q, 1), lambda i: (i, 0),
                         memory_space=pltpu.VMEM),
        ),
        scratch_shapes=[
            pltpu.VMEM((block_q, 2 * half), jnp.int32),    # beam distances
            pltpu.VMEM((block_q, 2 * half), jnp.int32),    # beam ids
            pltpu.VMEM((block_q, 2 * half), jnp.int32),    # expanded flags
            pltpu.VMEM((block_q, 1, LANES), jnp.int32),    # adjacency rows
            pltpu.VMEM((block_q, W, LANES), jnp.uint32),   # fetched points
            pltpu.VMEM((block_q, 1), jnp.int32),           # expansion ids
            pltpu.VMEM((block_q, W), jnp.int32),           # compacted fresh
            pltpu.SemaphoreType.DMA,
        ],
        interpret=interpret,
        compiler_params=None if interpret else pltpu.CompilerParams(
            vmem_limit_bytes=100 * 1024 * 1024,
        ),
    )(qr, init_d.reshape(B, 1), init_i.reshape(B, 1), adj2, pts4)
    return outd, outi, vis[:, 0], stp[:, 0]
