"""Round-3 experiments, part 2: memory-padding probe + DMA boundary map.

  B2. Is [N, 1, 128] u32 physically 512B/row or tile-padded to 4KB/row?
      Probe: allocate [24M, 1, 128] (logical 12.3GB). On a 16GB-HBM v5e
      this fits ONLY if unpadded (padded would be 98GB).
  C2. Sublane-range DMA at unaligned start / sub-8 size.
  F.  Dynamic sublane select (iota compare + sum) after an [8,128] fetch.
  G.  Packed-4 point rows: DMA [1,128] row, compute 4 distances, select
      group by (e & 3) — the planned large-N point fetch.
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


@stage("B2.padding-probe")
def _():
    # 24M x 1 x 128 u32 = 12.3GB logical; 98GB if sublane-padded 8x
    n = 24_000_000
    x = jnp.zeros((n, 1, 128), jnp.uint32)
    s = jnp.sum(x[::1_000_000, 0, 0]).block_until_ready()
    del x
    return f"allocated 12.3GB logical [24M,1,128] (sum={int(s)}): UNPADDED"


@stage("C2.sublane-unaligned")
def _():
    N = 256
    tbl = jnp.arange(N * 16 * 128, dtype=jnp.uint32).reshape(N, 16, 128)
    idx = jnp.asarray([3], jnp.int32)

    def kern(idx_ref, hbm, out_ref, scratch, sem):
        e = idx_ref[0]
        pltpu.make_async_copy(hbm.at[e, pl.ds(4, 8)], scratch, sem).start()
        pltpu.make_async_copy(hbm.at[e, pl.ds(4, 8)], scratch, sem).wait()
        out_ref[:] = scratch[:]

    out = pl.pallas_call(
        kern,
        out_shape=jax.ShapeDtypeStruct((8, 128), jnp.uint32),
        in_specs=[pl.BlockSpec(memory_space=pltpu.SMEM),
                  pl.BlockSpec(memory_space=pltpu.ANY)],
        out_specs=pl.BlockSpec(memory_space=pltpu.VMEM),
        scratch_shapes=[pltpu.VMEM((8, 128), jnp.uint32),
                        pltpu.SemaphoreType.DMA],
    )(idx, tbl)
    want = np.arange(3 * 16 * 128, 4 * 16 * 128).reshape(16, 128)[4:12]
    assert (np.asarray(out) == want).all()
    return "unaligned sublane start (4) works"


@stage("F.dyn-sublane-select")
def _():
    def kern(g_ref, x_ref, out_ref):
        g = g_ref[0]
        sub = jax.lax.broadcasted_iota(jnp.int32, (8, 128), 0)
        sel = jnp.where(sub == g, x_ref[:], 0)
        out_ref[:] = jnp.sum(sel, axis=0, keepdims=True)

    x = jnp.arange(8 * 128, dtype=jnp.int32).reshape(8, 128)
    out = pl.pallas_call(
        kern,
        out_shape=jax.ShapeDtypeStruct((1, 128), jnp.int32),
        in_specs=[pl.BlockSpec(memory_space=pltpu.SMEM),
                  pl.BlockSpec(memory_space=pltpu.VMEM)],
        out_specs=pl.BlockSpec(memory_space=pltpu.VMEM),
    )(jnp.asarray([5], jnp.int32), x)
    want = np.arange(5 * 128, 6 * 128)
    assert (np.asarray(out)[0] == want).all()
    return "iota-select dynamic sublane works"


@stage("G.packed4-distance")
def _():
    # points packed 4/row: row r lane g*32+w = point (4r+g) word w
    N, words = 4096, 32
    rng = np.random.default_rng(0)
    pts = rng.integers(0, 2**32, size=(N, words), dtype=np.uint32)
    packed = pts.reshape(N // 4, 4 * words)[:, None, :]  # [N/4, 1, 128]
    packed_j = jnp.asarray(packed)
    q = rng.integers(0, 2**32, size=(words,), dtype=np.uint32)
    q4 = jnp.asarray(np.tile(q, 4)[None, :])  # [1, 128]
    ids = jnp.asarray([7, 4095, 16, 3], jnp.int32)

    def kern(idx_ref, q_ref, hbm, out_ref, scratch, sem):
        def issue(i, c):
            e = idx_ref[i]
            pltpu.make_async_copy(hbm.at[e >> 2], scratch.at[i], sem).start()
            return c
        jax.lax.fori_loop(0, 4, issue, 0, unroll=4)
        def drain(i, c):
            e = idx_ref[i]
            pltpu.make_async_copy(hbm.at[e >> 2], scratch.at[i], sem).wait()
            return c
        jax.lax.fori_loop(0, 4, drain, 0, unroll=4)
        rows = scratch[:, 0, :]  # [4, 128]
        pc = jax.lax.population_count(jnp.bitwise_xor(rows, q_ref[:]))
        pc = pc.astype(jnp.int32)
        # group-sum: fold 128 lanes -> 4 groups of 32
        lane = jax.lax.broadcasted_iota(jnp.int32, (4, 128), 1)
        acc = pc
        w = 128
        while w > 32:
            w //= 2
            acc = acc[:, :w] + pltpu.roll(acc, 128 - w, axis=1)[:, :w]
        # acc[:, :32] has garbage beyond? after folds acc[:, :32] holds
        # sums of lanes {k, k+32, k+64, k+96} — NOT what we want (that
        # mixes groups). Instead mask-by-group then total-sum:
        del acc, w, lane
        g4 = jax.lax.broadcasted_iota(jnp.int32, (4, 128), 1) // 32
        gsel = jnp.zeros((4, 1), jnp.int32)
        def pick(i, c):
            e = idx_ref[i]
            return c.at[i, 0].set(e & 3)
        gsel = jax.lax.fori_loop(0, 4, pick, gsel, unroll=4)
        mask = (g4 == gsel).astype(jnp.int32)
        d = jnp.sum(pc * mask, axis=1, keepdims=True)  # [4, 1]
        out_ref[:] = d

    out = pl.pallas_call(
        kern,
        out_shape=jax.ShapeDtypeStruct((4, 1), jnp.int32),
        in_specs=[pl.BlockSpec(memory_space=pltpu.SMEM),
                  pl.BlockSpec(memory_space=pltpu.VMEM),
                  pl.BlockSpec(memory_space=pltpu.ANY)],
        out_specs=pl.BlockSpec(memory_space=pltpu.VMEM),
        scratch_shapes=[pltpu.VMEM((4, 1, 128), jnp.uint32),
                        pltpu.SemaphoreType.DMA],
    )(ids, q4, packed_j)
    got = np.asarray(out)[:, 0]
    want = np.array([
        bin(int.from_bytes((pts[i] ^ q).tobytes(), "little")).count("1")
        for i in [7, 4095, 16, 3]
    ])
    assert (got == want).all(), (got, want)
    return "packed-4 fetch + group-masked distance works"


print("done", flush=True)
