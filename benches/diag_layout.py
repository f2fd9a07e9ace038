"""Compile-only HBM audit of chunk_step layouts at flagship scale.

Round-3 finding (diag_preflight at 10M): XLA copies the donated
``adj [N,64] i32`` and ``adj_pts [N,192] u32`` arguments into
tile-padded T(8,128) internal buffers (2.0x / 1.3x expansion) — 14.3GB
of HLO temps, compile-time OOM. The donation probe only ever tested a
lane-aligned ``[rows,1024]`` buffer, where linear and (8,128)-tiled
layouts are byte-identical, so aliasing worked.

Hypothesis: making every big carried buffer's trailing dim exactly a
multiple of 128 (u32/i32 lane width) removes both the padding and the
copy. This script AOT-compiles ``chunk_step`` (no allocation, no run)
for several (W, inline_words) combinations and prints each program's
HBM requirement + the biggest temp, so the fix can be chosen from data.

Usage: python benches/diag_layout.py [N]   (default 10_000_000)
"""

import os
import sys

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

import numpy as np


def audit(N, words, W, iw, S, cp, efc=96, m=24):
    import jax
    import jax.numpy as jnp

    from hnsw_itu_tpu.models import _build

    sds = jax.ShapeDtypeStruct
    points = sds((N, words), jnp.uint32)
    node_map = sds((N,), jnp.int32)
    adj = sds((N, W), jnp.int32)
    deg = sds((N,), jnp.int32)
    adj_pts = sds((N, W * iw), jnp.uint32) if iw else None
    spill = sds((N, 8), jnp.int32)
    chunk = sds((cp, words), jnp.uint32)
    ids = sds((cp,), jnp.int32)
    scalar = sds((), jnp.int32)

    from hnsw_itu_tpu.graph import GraphArrays

    graph = GraphArrays(adj, deg)
    try:
        lowered = _build.chunk_step.lower(
            points, node_map, graph, adj_pts, spill, chunk, ids,
            scalar, scalar, scalar,
            S=S, efc=efc, m=m, metric_name="hamming", expand=1,
            prune_budget=cp, entry_sample=1024, use_entry=True,
            do_write=True, inline_words=iw,
        )
        compiled = lowered.compile()
        ma = compiled.memory_analysis()
        print(f"# W={W:3d} iw={iw:2d} flatw={W*iw:4d} "
              f"({'ALIGNED' if (W*iw) % 128 == 0 else 'unaligned'}): "
              f"temp={ma.temp_size_in_bytes/1e9:6.2f}GB "
              f"args={ma.argument_size_in_bytes/1e9:6.2f}GB "
              f"alias={ma.alias_size_in_bytes/1e9:6.2f}GB "
              f"out={ma.output_size_in_bytes/1e9:6.2f}GB",
              flush=True)
    except Exception as e:  # noqa: BLE001
        msg = str(e)
        # keep only the OOM headline if present
        for line in msg.splitlines():
            if "Ran out of memory" in line or "hbm" in line.lower():
                msg = line.strip()
                break
        print(f"# W={W:3d} iw={iw:2d} flatw={W*iw:4d}: FAIL {msg[:160]}",
              flush=True)


def main():
    from hnsw_itu_tpu.utils.compile_cache import enable
    from hnsw_itu_tpu.utils.tunnel import require_device

    enable()
    require_device()

    N = int(sys.argv[1]) if len(sys.argv) > 1 else 10_000_000
    words = 32
    S, cp = 1024, 16384
    print(f"# N={N} words={words} S={S} cp={cp}", flush=True)
    # current 10M policy: W=64 iw=3 (flat 192, unaligned) — the OOM case
    audit(N, words, 64, 3, S, cp)
    # aligned alternatives
    audit(N, words, 64, 2, S, cp)   # flat 128: exactly one lane tile
    audit(N, words, 64, 4, S, cp)   # flat 256: two lane tiles
    audit(N, words, 32, 4, S, cp)   # flat 128 at W=32
    # no inline buffer at all (gather path)
    audit(N, words, 64, 0, S, cp)


if __name__ == "__main__":
    main()
