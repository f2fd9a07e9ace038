"""Real-dispatch HBM preflight at flagship scale.

Allocates the ACTUAL builder state at N (compact argument layouts — the
AOT ShapeDtypeStruct audit in diag_mem.py mis-attributes arguments to
HLO temps and over-pads narrow params, so it cries wolf) and executes
one of every dispatch the runner will issue: materialize_inline,
chunk_step (entry-sampled, donated), level_chunk_step, and a scanned
group when the gate allows it. A five-minute pass here prevents an
hour-long build dying of RESOURCE_EXHAUSTED mid-flight (round-3 2M/10M
postmortems).

Usage: python benches/diag_preflight.py [N] (default 10_000_000)
"""

import os
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

import numpy as np


def main():
    from hnsw_itu_tpu.utils.compile_cache import enable
    from hnsw_itu_tpu.utils.tunnel import require_device

    enable()
    require_device()
    import jax.numpy as jnp

    from hnsw_itu_tpu.graph import GraphArrays
    from hnsw_itu_tpu.models import IndexOptions, _build
    from hnsw_itu_tpu.models.hnsw import HNSWBuilder
    from hnsw_itu_tpu.models.nsw import NSWBuilder, _materialize_inline

    N = int(sys.argv[1]) if len(sys.argv) > 1 else 10_000_000
    words, W, m, efc = 32, 64, 24, 96
    bs = 1024 if N > 4_000_000 else 256
    S, cp = bs, bs * 16
    t00 = time.perf_counter()

    def step(label, t0):
        print(f"# {label}: ok (+{time.perf_counter()-t0:.0f}s, "
              f"total {time.perf_counter()-t00:.0f}s)", flush=True)

    b = HNSWBuilder(
        IndexOptions(ef_construction=efc, connections=m, max_connections=W,
                     size=N, batch_size=bs),
        metric="hamming",
    )
    mw = NSWBuilder._inline_build_words(b, np.zeros((1, words), np.uint32))
    iw = 0 if mw == words else mw
    print(f"# N={N} mw={mw} S={S} cp={cp}", flush=True)

    t0 = time.perf_counter()
    rng = np.random.default_rng(0)
    seed = rng.integers(0, 2**32, size=(cp, words), dtype=np.uint32)
    points = jnp.zeros((N, words), jnp.uint32)
    points = _build.write_points(points, jnp.asarray(seed), jnp.int32(0))
    graph = GraphArrays(jnp.full((N, W), -1, jnp.int32),
                        jnp.zeros((N,), jnp.int32))
    spill = _build.make_spill(N)
    np.asarray(graph.deg[:1])
    step("fixed buffers", t0)

    t0 = time.perf_counter()
    adj_pts = None
    if mw:
        adj_pts = _materialize_inline(points, graph.adj, iw)
        np.asarray(adj_pts[:1, :1])
    step(f"materialize_inline (mw={mw})", t0)

    node_map = jnp.arange(N, dtype=jnp.int32)
    chunk = jnp.asarray(rng.integers(0, 2**32, size=(cp, words),
                                     dtype=np.uint32))
    ids = jnp.asarray(cp + np.arange(cp, dtype=np.int32))
    t0 = time.perf_counter()
    points, graph, adj_pts, spill, dropped = _build.chunk_step(
        points, node_map, graph, adj_pts, spill, chunk, ids,
        jnp.int32(cp), jnp.int32(0), jnp.int32(cp),
        S=S, efc=efc, m=m, metric_name="hamming", expand=1,
        prune_budget=cp, entry_sample=1024, use_entry=True, do_write=True,
        inline_words=iw,
    )
    np.asarray(graph.deg[:1])
    step("chunk_step (entry-sampled, donated)", t0)

    # the descent variant HNSW level groups dispatch (eps array,
    # use_entry=False, do_write=False) at the SMALLEST bucket — layout
    # choice is shape-specific and the tiny shapes picked a pathological
    # whole-adjacency re-layout copy in round 3 (cp=1: 4.77GB at 10M)
    t0 = time.perf_counter()
    small = 8
    points, graph, adj_pts, spill, _ = _build.chunk_step(
        points, node_map, graph, adj_pts, spill,
        chunk[:small], ids[:small], jnp.int32(cp),
        jnp.full((small,), 0, jnp.int32), jnp.int32(small),
        S=small, efc=efc, m=m, metric_name="hamming", expand=1,
        prune_budget=small, entry_sample=1024, use_entry=False,
        do_write=False, inline_words=iw,
    )
    np.asarray(graph.deg[:1])
    step(f"chunk_step (descent variant, cp={small})", t0)

    cap0 = b._level_capacity(0)
    lcp = 1024
    lg = GraphArrays(jnp.full((cap0, W), -1, jnp.int32),
                     jnp.zeros((cap0,), jnp.int32))
    t0 = time.perf_counter()
    g2, next_eps, _ = _build.level_chunk_step(
        points, jnp.zeros((cap0,), jnp.int32), lg,
        jnp.zeros((cap0,), jnp.int32),
        chunk[:lcp], jnp.arange(lcp, dtype=jnp.int32),
        jnp.zeros((lcp,), jnp.int32), jnp.int32(lcp),
        S=min(S, lcp), efc=efc, m=m, metric_name="hamming", expand=1,
        prune_budget=lcp,
    )
    np.asarray(g2.deg[:1])
    step(f"level_chunk_step (cap {cap0})", t0)

    # wire the live buffers into the builder so the gate sees real sizes
    b.points, b.base = points, graph
    b.spill, b.adj_pts = spill, adj_pts
    fits = b._scanned_fits()
    print(f"# scanned gate at this scale: {'ON (G>1)' if fits else 'OFF (G=1)'}",
          flush=True)
    if fits:
        t0 = time.perf_counter()
        G = 2
        gchunk = jnp.asarray(rng.integers(
            0, 2**32, size=(G * cp, words), dtype=np.uint32))
        gids = jnp.asarray(2 * cp + np.arange(G * cp, dtype=np.int32))
        n0s = jnp.asarray(2 * cp + cp * np.arange(G, dtype=np.int32))
        points, graph, adj_pts, spill, _ = _build.chunk_steps_scanned(
            points, node_map, graph, adj_pts, spill, gchunk, gids, n0s,
            G=G, cp=cp, S=S, efc=efc, m=m, metric_name="hamming",
            expand=1, prune_budget=cp, entry_sample=1024, inline_words=iw,
        )
        np.asarray(graph.deg[:1])
        step(f"chunk_steps_scanned G={G}", t0)

    print(f"# PREFLIGHT PASS at N={N}", flush=True)


if __name__ == "__main__":
    main()
