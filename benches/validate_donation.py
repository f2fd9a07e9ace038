"""Donation-aliasing probe for the remote TPU runtime.

Question this answers (decides the 10M single-chip build config): when a
jitted program donates a buffer, does the runtime alias it in place (peak
~= buffer) or copy it (peak ~= 2x buffer)? Round-2 observations suggested
copies ("multi-GB in-place mutations transiently double") but never
measured the ceiling.

Method: donate-and-mutate a single u32 buffer of growing size. On a 16GB
v5e, if sizes up to ~14GB succeed the runtime aliases; if it OOMs near
~7.5GB it copies. The answer feeds docs/SCALE.md's 10M ledger:

  10M donated set (mw=2 inline): points 1.30 + adj 2.59 + deg 0.04 +
  spill 0.32 + adj_pts 5.18 = 9.43 GB
    aliasing runtime -> fits easily;
    copying runtime  -> 18.9 GB transient > 16 GB HBM: the 10M build must
    drop the inline buffer (HNSW_TPU_INLINE_BUILD_BYTES=0, slow gathers)
    or rely on the sharded flagship (run_sharded_10m.py).

Usage: python benches/validate_donation.py  (~2 min; needs the relay)
"""

import functools
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

    @functools.partial(jax.jit, donate_argnums=(0,))
    def mutate(x):
        return x.at[0, 0].add(np.uint32(1))

    results = {}
    for gb in (2, 4, 6, 7, 8, 9, 10, 11, 12, 13, 14):
        rows = int(gb * 1e9) // (1024 * 4)
        try:
            t0 = time.perf_counter()
            x = jnp.zeros((rows, 1024), jnp.uint32)
            np.asarray(x[0, :1])  # materialize
            for _ in range(3):
                x = mutate(x)
            got = int(np.asarray(x[0, 0]))
            dt = time.perf_counter() - t0
            assert got == 3, got
            results[gb] = f"ok ({dt:.1f}s)"
            print(f"# {gb:>3} GB: ok ({dt:.1f}s)", file=sys.stderr, flush=True)
            del x
        except Exception as e:  # noqa: BLE001 - OOM surfaces as RuntimeError
            results[gb] = f"FAIL: {type(e).__name__}"
            print(f"# {gb:>3} GB: FAIL {type(e).__name__}: {str(e)[:200]}",
                  file=sys.stderr, flush=True)
            break

    largest = max((g for g, r in results.items() if r.startswith("ok")),
                  default=0)
    failed = [g for g, r in results.items() if r.startswith("FAIL")]
    # HBM is 15.75 GB usable: a SUCCESSFUL donate-mutate at X where
    # 2X > 15.75 (X >= 8) is impossible under copying -> proves aliasing,
    # regardless of where larger allocations fail (session overhead /
    # fragmentation can sink a 12-14 GB zeros on its own). Copying is
    # only indicated by failure at sizes an aliasing runtime would fit.
    if largest >= 8:
        verdict = "aliases (copy-free donation)"
    elif failed and failed[0] <= 12:
        verdict = "copies donated buffers"
    else:
        verdict = "unknown"
    print(f'{{"probe": "donation", "largest_ok_gb": {largest}, '
          f'"verdict": "{verdict}"}}')


if __name__ == "__main__":
    main()
