"""Compile-only HBM audit of the build programs at flagship shapes.

AOT-lowers each dispatch the 2M/10M runners will execute (ShapeDtypeStruct
arguments — no buffers allocated, no chip execution) through the remote
compile helper and prints the XLA memory analysis.

CAVEAT (measured round 3): with ShapeDtypeStruct-only AOT the analysis
reports ``arguments 0B`` and counts every parameter as an HLO temp in
the compiler's DEFAULT (lane-padded) layouts — e.g. adjacency [N,64]
shows as a 128-wide 2x buffer. Real argument buffers are COMPACT
(probed: [1M,64]i32 on-device = 0.256GB exactly) and donated args
alias, so this audit OVERSTATES peak memory. Use it to compare
programs/spot big layout copies, and use diag_preflight.py (real
one-dispatch execution) as the go/no-go check before long runs.

Usage: python benches/diag_mem.py [N] (default 10_000_000)
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
    import jax
    import jax.numpy as jnp

    from hnsw_itu_tpu.graph import GraphArrays
    from hnsw_itu_tpu.models import IndexOptions, _build
    from hnsw_itu_tpu.models.hnsw import HNSWBuilder
    from hnsw_itu_tpu.models.nsw import NSWBuilder, _materialize_inline

    N = int(sys.argv[1]) if len(sys.argv) > 1 else 10_000_000
    words, W, m, efc = 32, 64, 24, 96
    bs = 1024 if N > 4_000_000 else 256
    S, cp = bs, bs * 16

    b = HNSWBuilder(
        IndexOptions(ef_construction=efc, connections=m, max_connections=W,
                     size=N, batch_size=bs),
        metric="hamming",
    )
    mw = NSWBuilder._inline_build_words(b, np.zeros((1, words), np.uint32))
    iw = 0 if mw == words else mw
    print(f"# N={N} mw={mw} (inline_words={iw}) S={S} cp={cp}")

    def sds(shape, dt=jnp.int32):
        return jax.ShapeDtypeStruct(shape, dt)

    u32 = jnp.uint32
    pts = sds((N, words), u32)
    nmap = sds((N,))
    g = GraphArrays(sds((N, W)), sds((N,)))
    apts = sds((N, W * mw), u32) if mw else None
    spl = sds((N + 1, 8))

    def report(label, lowered):
        t0 = time.perf_counter()
        c = lowered.compile()
        ma = c.memory_analysis()
        print(f"{label}: args {ma.argument_size_in_bytes/1e9:.2f}GB, "
              f"out {ma.output_size_in_bytes/1e9:.2f}GB, "
              f"alias {ma.alias_size_in_bytes/1e9:.2f}GB, "
              f"TEMP {ma.temp_size_in_bytes/1e9:.2f}GB "
              f"(compile {time.perf_counter()-t0:.0f}s)", flush=True)
        live = (ma.argument_size_in_bytes + ma.output_size_in_bytes
                - ma.alias_size_in_bytes + ma.temp_size_in_bytes)
        print(f"  -> peak-ish {live/1e9:.2f}GB of 15.75GB")
        return ma

    kw = dict(S=S, efc=efc, m=m, metric_name="hamming", expand=1,
              prune_budget=cp, entry_sample=1024, inline_words=iw)

    report("chunk_step (NSW steady state)", _build.chunk_step.lower(
        pts, nmap, g, apts, spl, sds((cp, words), u32), sds((cp,)),
        sds(()), sds(()), sds(()), use_entry=True, do_write=True, **kw))

    report("chunk_step (HNSW base, prewritten)", _build.chunk_step.lower(
        pts, nmap, g, apts, spl, sds((cp, words), u32), sds((cp,)),
        sds(()), sds((cp,)), sds(()), use_entry=True, do_write=False, **kw))

    cap0 = b._level_capacity(0)
    lcp = min(cp, 1 << max(6, (cp // m).bit_length()))
    lS = min(S, lcp)
    report(f"level_chunk_step (cap {cap0}, group {lcp})",
           _build.level_chunk_step.lower(
               pts, sds((cap0,)), GraphArrays(sds((cap0, W)), sds((cap0,))),
               sds((cap0,)), sds((lcp, words), u32), sds((lcp,)),
               sds((lcp,)), sds(()), S=lS, efc=efc, m=m,
               metric_name="hamming", expand=1, prune_budget=lcp))

    report("materialize_inline (warmup)", _materialize_inline.lower(
        pts, sds((N, W)), inline_words=iw))

    G = int(os.environ.get("DIAG_SCAN_G", "8"))
    report(f"chunk_steps_scanned_prewritten G={G} (gated off when big)",
           _build.chunk_steps_scanned_prewritten.lower(
               pts, nmap, g, apts, spl, sds((G * cp, words), u32),
               sds((G * cp,)), sds((G,)), sds((G * cp,)), G=G, cp=cp, **kw))


if __name__ == "__main__":
    main()
