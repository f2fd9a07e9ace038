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

Fused-table layout (``uint32[N, fused_subrows(W, words), 128]``, REP =
128 // W): row ``e`` subrow 0 = adjacency ids of node e (lane n = neighbor
n, -1 beyond the row width); subrow 1 + s, lane r * W + n = packed word
``s * REP + r`` of neighbor n's sketch; trailing pad subrows (to a
multiple of 8) keep the (8, 128) int tiling exact. One leading-dim DMA per expansion
fetches ids + all neighbor data sequentially; the word-sliced layout makes
the popcount reduction a sublane sum plus a log2(REP) lane fold — no
in-kernel transposes.

Packed keys require id_bits + bits(max_d + 1) <= 31 (Hamming 1024-bit:
N <= 2^20). Larger indexes use the XLA path.
"""

from __future__ import annotations

import functools

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


# ---------------------------------------------------------------------------
# fused table
# ---------------------------------------------------------------------------


def fused_subrows(W: int, words: int) -> int:
    """Number of 128-lane subrows per fused-table row: header + data,
    rounded UP to a multiple of 8 so the (8, 128) int tiling is exact —
    a 17-subrow table would be silently padded to 24 by the tiler AND
    copied at the kernel boundary (measured: 2.3x memory at 1M = OOM)."""
    REP = LANES // W
    s = 1 + words // REP
    return -(-s // 8) * 8


@functools.partial(jax.jit, donate_argnums=())
def materialize_fused(points, adj):
    """Build the fused HBM table ``uint32[N, fused_subrows, 128]`` (see
    module docstring; trailing pad subrows are zero). Tiled over row blocks
    like nsw._materialize_inline to avoid multi-GB relayout
    intermediates."""
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
        hdr = jnp.full((tile, 1, LANES), 0xFFFFFFFF, jnp.uint32)
        hdr = jax.lax.dynamic_update_slice(
            hdr, a.astype(jnp.uint32)[:, None, :], (0, 0, 0)
        )
        g = points[jnp.clip(a, 0, points.shape[0] - 1)]  # [tile, W0, words]
        g = g.reshape(tile, W0, words)
        if W != W0:
            g = jnp.concatenate(
                [g, jnp.zeros((tile, W - W0, words), g.dtype)], axis=1
            )
        # [tile, W, words] -> [tile, words, W] -> [tile, words//REP, REP*W]
        data = jnp.swapaxes(g, 1, 2).reshape(tile, words // REP, LANES)
        pad = S - 1 - words // REP
        if pad:
            data = jnp.concatenate(
                [data, jnp.zeros((tile, pad, LANES), data.dtype)], axis=1
            )
        row = jnp.concatenate([hdr, data.astype(jnp.uint32)], axis=1)
        return jax.lax.dynamic_update_slice(out, row, (start, 0, 0))

    return jax.lax.fori_loop(0, n_tiles, body, out)


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


def _bitonic_sort(keys, *, descending: bool):
    """Full bitonic sort along lanes (single plane). Lane count must be a
    power of two."""
    L = keys.shape[-1]
    lane = jax.lax.broadcasted_iota(jnp.int32, keys.shape, 1)
    k = 2
    while k <= L:
        # (lane & k) == 0 is all-True at k == L, i.e. one final full pass
        asc = (lane & k) == 0
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


# ---------------------------------------------------------------------------
# the kernel
# ---------------------------------------------------------------------------


def _make_kernel(*, ef, half, W, words, id_bits, key_inf, max_steps, bq, cap,
                 dma_unroll=256, dma_mode="loop"):
    TOT = 2 * half
    REP = LANES // W
    S = fused_subrows(W, words)   # table subrows (header + data + pad)
    SD = words // REP             # data subrows
    MASK = np.int32((1 << id_bits) - 1)
    KINF = np.int32(key_inf)
    BIG = np.int32(0x7FFFFFFF)

    def kernel(qt_ref, init_ref, table_hbm, outk_ref, vis_ref, stp_ref,
               kb, fb, rows, eids, dns, sem):
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

            # ---- fetch fused rows: one DMA per live query ------------------
            # done queries fetch row 0 unconditionally (their candidates are
            # masked later): a branch-free loop lets the scalar core stream
            # descriptor issues instead of re-evaluating predicates
            _unroll = bq if dma_unroll != 1 else 1  # Mosaic: full or none
            if dma_mode != "skip":
                def issue(i, n):
                    pltpu.make_async_copy(
                        table_hbm.at[eids[i, 0]], rows.at[i], sem
                    ).start()
                    return n

                jax.lax.fori_loop(0, bq, issue, 0, unroll=_unroll)

                if dma_mode == "single_wait":
                    # TPU DMA semaphores count BYTES: one wait sized as the
                    # whole rows scratch consumes all bq row-copies at once
                    pltpu.make_async_copy(
                        table_hbm.at[pl.ds(0, bq)], rows, sem
                    ).wait()
                else:
                    def drain(i, n):
                        pltpu.make_async_copy(
                            table_hbm.at[eids[i, 0]], rows.at[i], sem
                        ).wait()
                        return n

                    jax.lax.fori_loop(0, bq, drain, 0, unroll=_unroll)

            # ---- distances: XOR + popcount, sublane sum + lane fold --------
            data = rows[:, 1 : 1 + SD, :]  # [bq, SD, 128]
            pc = jax.lax.population_count(
                jnp.bitwise_xor(data, qt_ref[:])
            ).astype(jnp.int32)
            acc = jnp.sum(pc, axis=1)  # [bq, 128]
            w = LANES
            while w > W:
                w //= 2
                acc = acc[:, :w] + acc[:, w:]
            d = acc  # [bq, W]
            if W < half:
                d = jnp.concatenate(
                    [d, jnp.zeros((bq, half - W), jnp.int32)], axis=1
                )

            nbr_raw = rows[:, 0, :half].astype(jnp.int32)
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
        "interpret", "dma_unroll", "dma_mode",
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
):
    """Run the fused search. Returns (keys int32[B, half], visited int32[B],
    steps int32[B]); decode ids/distances with ``key >> id_bits`` /
    ``key & mask``. ``B`` must be a multiple of ``block_q`` (pad at the
    call site); ``init_keys`` holds each query's packed entry-point key.
    ``W`` is the PHYSICAL fused width (fused_width of the adjacency)."""
    cap = table.shape[0]
    B = queries.shape[0]
    if B % block_q != 0:
        raise ValueError(f"B={B} not a multiple of block_q={block_q}")
    half = max(64, _next_pow2(ef), _next_pow2(W))
    if half > LANES:
        raise ValueError(f"ef={ef} needs beam half {half} > {LANES} lanes")
    key_inf = (max_d + 1) << id_bits
    if id_bits + (max_d + 1).bit_length() > 31:
        raise ValueError("packed key overflows int32")
    qt = query_tiles(queries, W)  # [B, words//REP, 128]
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
            pltpu.VMEM((block_q, S, LANES), jnp.uint32),  # fused rows
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
    )(qt, init_keys.reshape(B, 1), table)
    return keys, vis[:, 0], stp[:, 0]
