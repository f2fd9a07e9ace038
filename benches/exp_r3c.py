"""Round-3 experiments, part 3: the exact DMA shapes of the planned
two-plane kernel.

  G2. Per-neighbor fetch: src pts4.at[r] ([1,128] from [R,1,128]) ->
      dst rows.at[i, pl.ds(j, 1)] ([1,128] slice of [bq, S, 128] VMEM
      scratch at dynamic sublane j). Then group-masked distances using
      VECTOR ids (no scatter).
  G3. Dynamic-trip-count inner fori_loop (bound from SMEM) issuing DMAs.
"""

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

N, words = 4096, 32
rng = np.random.default_rng(0)
PTS = rng.integers(0, 2**32, size=(N, words), dtype=np.uint32)
PACKED = jnp.asarray(PTS.reshape(N // 4, 4 * words)[:, None, :])  # [N/4,1,128]
Q = rng.integers(0, 2**32, size=(words,), dtype=np.uint32)
Q4 = jnp.asarray(np.tile(Q, 4)[None, :])  # [1, 128]


def _dist(i):
    return bin(int.from_bytes((PTS[i] ^ Q).tobytes(), "little")).count("1")


@stage("G2.fetch-sublane-dst")
def _():
    bq, S = 2, 4
    ids = np.array([[7, 4095, 16, 3], [0, 1, 2, 4000]], np.int32)
    ids_v = jnp.asarray(ids)  # VMEM [bq, S]

    def kern(idsv_ref, q_ref, hbm, out_ref, rows, sem):
        def outer(i, c):
            def inner(j, c2):
                e = idsv_ref[i, j]
                pltpu.make_async_copy(
                    hbm.at[e >> 2], rows.at[i, pl.ds(j, 1)], sem
                ).start()
                return c2
            return jax.lax.fori_loop(0, S, inner, c, unroll=S)
        jax.lax.fori_loop(0, bq, outer, 0, unroll=bq)

        def outer_w(i, c):
            def inner(j, c2):
                e = idsv_ref[i, j]
                pltpu.make_async_copy(
                    hbm.at[e >> 2], rows.at[i, pl.ds(j, 1)], sem
                ).wait()
                return c2
            return jax.lax.fori_loop(0, S, inner, c, unroll=S)
        jax.lax.fori_loop(0, bq, outer_w, 0, unroll=bq)

        pc = jax.lax.population_count(
            jnp.bitwise_xor(rows[:], q_ref[:][None])
        ).astype(jnp.int32)  # [bq, S, 128]
        grp = idsv_ref[:] & 3  # [bq, S]
        lane = jax.lax.broadcasted_iota(jnp.int32, (bq, S, 128), 2) // 32
        mask = (lane == grp[:, :, None]).astype(jnp.int32)
        out_ref[:] = jnp.sum(pc * mask, axis=2)

    out = pl.pallas_call(
        kern,
        out_shape=jax.ShapeDtypeStruct((bq, 4), jnp.int32),
        in_specs=[pl.BlockSpec(memory_space=pltpu.VMEM),
                  pl.BlockSpec(memory_space=pltpu.VMEM),
                  pl.BlockSpec(memory_space=pl.ANY)],
        out_specs=pl.BlockSpec(memory_space=pltpu.VMEM),
        scratch_shapes=[pltpu.VMEM((bq, 4, 128), jnp.uint32),
                        pltpu.SemaphoreType.DMA],
    )(ids_v, Q4, PACKED)
    got = np.asarray(out)
    want = np.vectorize(_dist)(ids)
    assert (got == want).all(), (got, want)
    return "sublane-dst per-neighbor fetch + vector-ids distance works"


@stage("G3.dynamic-trip-dma")
def _():
    bq, S = 2, 4
    ids = np.array([[7, 4095, 16, 3], [0, 1, 2, 4000]], np.int32)
    cnt = np.array([3, 2], np.int32)  # fetch only the first cnt[i]

    def kern(cnt_ref, idsv_ref, hbm, out_ref, rows, sem):
        # zero rows so unfetched slots give a known value
        rows[:] = jnp.zeros((bq, S, 128), jnp.uint32)

        def outer(i, c):
            def inner(j, c2):
                e = idsv_ref[i, j]
                pltpu.make_async_copy(
                    hbm.at[e >> 2], rows.at[i, pl.ds(j, 1)], sem
                ).start()
                return c2
            return jax.lax.fori_loop(0, cnt_ref[i], inner, c)
        jax.lax.fori_loop(0, bq, outer, 0)

        def outer_w(i, c):
            def inner(j, c2):
                e = idsv_ref[i, j]
                pltpu.make_async_copy(
                    hbm.at[e >> 2], rows.at[i, pl.ds(j, 1)], sem
                ).wait()
                return c2
            return jax.lax.fori_loop(0, cnt_ref[i], inner, c)
        jax.lax.fori_loop(0, bq, outer_w, 0)

        out_ref[:] = jnp.sum(rows[:].astype(jnp.int32) & 1, axis=2)

    out = pl.pallas_call(
        kern,
        out_shape=jax.ShapeDtypeStruct((bq, 4), jnp.int32),
        in_specs=[pl.BlockSpec(memory_space=pltpu.SMEM),
                  pl.BlockSpec(memory_space=pltpu.VMEM),
                  pl.BlockSpec(memory_space=pl.ANY)],
        out_specs=pl.BlockSpec(memory_space=pltpu.VMEM),
        scratch_shapes=[pltpu.VMEM((bq, 4, 128), jnp.uint32),
                        pltpu.SemaphoreType.DMA],
    )(jnp.asarray(cnt), jnp.asarray(ids), PACKED)
    got = np.asarray(out)
    # fetched slots have nonzero parity sums (random data), unfetched = 0
    assert (got[0, 3] == 0) and (got[1, 2] == 0) and (got[1, 3] == 0)
    assert (got[0, :3] > 0).all() and (got[1, :2] > 0).all()
    return "dynamic-bound DMA loops work"


print("done", flush=True)
