"""Round-3 experiments, part 4: predicated DMA (static trip count +
@pl.when gate) — the fetch-loop shape forced by G3's finding that
dynamic-trip-count fori_loops crash the Mosaic compiler."""

import sys
import time
import traceback

sys.path.insert(0, __file__.rsplit("/", 2)[0])

import numpy as np

from hnsw_itu_tpu.utils.compile_cache import enable

enable()

import jax
import jax.numpy as jnp
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu


def stage(name):
    def deco(fn):
        t0 = time.perf_counter()
        try:
            msg = fn()
            print(f"[{name}] PASS ({time.perf_counter()-t0:.1f}s) {msg or ''}",
                  flush=True)
        except Exception as e:
            tb = traceback.format_exc().strip().splitlines()[-3:]
            print(f"[{name}] FAIL ({time.perf_counter()-t0:.1f}s): "
                  f"{type(e).__name__}: {str(e)[:300]} | {' / '.join(tb)}",
                  flush=True)
    return deco


np.asarray(jnp.asarray(np.ones((4096, 128), np.uint32)) + 1)
print("session warm", flush=True)

N = 4096
rng = np.random.default_rng(0)
PTS = rng.integers(0, 2**32, size=(N, 32), dtype=np.uint32)
PACKED = jnp.asarray(PTS.reshape(N // 4, 128)[:, None, :])


@stage("G4.predicated-dma")
def _():
    bq, S = 2, 4
    BIG = np.int32(0x7FFFFFFF)
    ids = np.array([[7, 4095, BIG, BIG], [0, 1, 2, BIG]], np.int32)

    def kern(idsv_ref, hbm, out_ref, rows, sem):
        rows[:] = jnp.zeros((bq, S, 128), jnp.uint32)

        def outer(i, c):
            def inner(j, c2):
                e = idsv_ref[i, j]

                @pl.when(e < BIG)
                def _():
                    pltpu.make_async_copy(
                        hbm.at[e >> 2], rows.at[i, pl.ds(j, 1)], sem
                    ).start()

                return c2
            return jax.lax.fori_loop(0, S, inner, c, unroll=S)
        jax.lax.fori_loop(0, bq, outer, 0, unroll=bq)

        def outer_w(i, c):
            def inner(j, c2):
                e = idsv_ref[i, j]

                @pl.when(e < BIG)
                def _():
                    pltpu.make_async_copy(
                        hbm.at[e >> 2], rows.at[i, pl.ds(j, 1)], sem
                    ).wait()

                return c2
            return jax.lax.fori_loop(0, S, inner, c, unroll=S)
        jax.lax.fori_loop(0, bq, outer_w, 0, unroll=bq)

        out_ref[:] = jnp.sum(rows[:].astype(jnp.int32) & 1, axis=2)

    out = pl.pallas_call(
        kern,
        out_shape=jax.ShapeDtypeStruct((bq, S), jnp.int32),
        in_specs=[pl.BlockSpec(memory_space=pltpu.VMEM),
                  pl.BlockSpec(memory_space=pl.ANY)],
        out_specs=pl.BlockSpec(memory_space=pltpu.VMEM),
        scratch_shapes=[pltpu.VMEM((bq, S, 128), jnp.uint32),
                        pltpu.SemaphoreType.DMA],
    )(jnp.asarray(ids), PACKED)
    got = np.asarray(out)
    assert (got[0, 2:] == 0).all() and got[1, 3] == 0
    assert (got[0, :2] > 0).all() and (got[1, :3] > 0).all()
    return "pl.when-gated DMA start/wait works"


print("done", flush=True)
