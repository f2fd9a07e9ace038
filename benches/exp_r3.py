"""Round-3 hardware capability experiments (one TPU chip via axon).

Settles the Mosaic questions that decide the large-N kernel architecture:

  A. 1-D HBM arrays: does a dynamic-offset `pl.ds` DMA from a flat
     uint32[N] array work? (If yes: per-neighbor 128-byte fetches with no
     tile padding — the whole two-plane kernel design hinges on this.)
  B. [N, 1, 128] arrays: tiling pads sublanes 1->8 (4KB/row) or not?
  C. Sublane-range DMA `.at[e, 0:8]` out of [N, 16, 128].
  D. pltpu.roll with a traced (dynamic) shift.
  E. block_q=512 fused kernel at max_steps=96 with vmem_limit raised.

Each stage prints PASS/FAIL + timing; failures don't stop later stages.
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
                  f"{type(e).__name__}: {str(e)[:500]} | {' / '.join(tb)}",
                  flush=True)
    return deco


print("jax", jax.__version__, "backend", jax.default_backend(), flush=True)
dev = jax.devices()[0]
# session warm-up: first DMA costs minutes
np.asarray(jnp.asarray(np.ones((4096, 128), np.uint32)) + 1)
print("session warm", flush=True)


def memstats():
    try:
        s = dev.memory_stats()
        return s.get("bytes_in_use", None)
    except Exception:
        return None


@stage("B.tiling-n-1-128")
def _():
    base = memstats()
    x = jax.device_put(np.zeros((1 << 20, 1, 128), np.uint32))
    x.block_until_ready()
    after = memstats()
    logical = x.nbytes
    msg = f"logical={logical/2**20:.0f}MB"
    if base is not None and after is not None:
        msg += f" actual={(after-base)/2**20:.0f}MB"
    del x
    return msg


@stage("A.dma-1d")
def _():
    N, WORDS = 4096, 32
    flat = jnp.arange(N * WORDS, dtype=jnp.uint32)
    idx = jnp.asarray([5, 77, 4095, 0], jnp.int32)

    def kern(idx_ref, flat_hbm, out_ref, scratch, sem):
        def body(i, c):
            e = idx_ref[i]
            pltpu.make_async_copy(
                flat_hbm.at[pl.ds(e * WORDS, WORDS)], scratch.at[i], sem
            ).start()
            return c
        jax.lax.fori_loop(0, 4, body, 0, unroll=4)
        def drain(i, c):
            e = idx_ref[i]
            pltpu.make_async_copy(
                flat_hbm.at[pl.ds(e * WORDS, WORDS)], scratch.at[i], sem
            ).wait()
            return c
        jax.lax.fori_loop(0, 4, drain, 0, unroll=4)
        out_ref[:] = scratch[:]

    out = pl.pallas_call(
        kern,
        out_shape=jax.ShapeDtypeStruct((4, WORDS), jnp.uint32),
        in_specs=[
            pl.BlockSpec(memory_space=pltpu.SMEM),
            pl.BlockSpec(memory_space=pltpu.ANY),
        ],
        out_specs=pl.BlockSpec(memory_space=pltpu.VMEM),
        scratch_shapes=[pltpu.VMEM((4, WORDS), jnp.uint32),
                        pltpu.SemaphoreType.DMA],
    )(idx, flat)
    want = np.stack([np.arange(i * WORDS, (i + 1) * WORDS)
                     for i in [5, 77, 4095, 0]]).astype(np.uint32)
    got = np.asarray(out)
    assert (got == want).all(), f"mismatch {got[:,:4]} vs {want[:,:4]}"
    return "1-D dynamic pl.ds DMA works"


@stage("A2.dma-n-1-128")
def _():
    N = 4096
    tbl = jnp.arange(N * 128, dtype=jnp.uint32).reshape(N, 1, 128)
    idx = jnp.asarray([3, 1000, 4095, 1], jnp.int32)

    def kern(idx_ref, hbm, out_ref, scratch, sem):
        def body(i, c):
            e = idx_ref[i]
            pltpu.make_async_copy(hbm.at[e], scratch.at[i], sem).start()
            return c
        jax.lax.fori_loop(0, 4, body, 0, unroll=4)
        def drain(i, c):
            e = idx_ref[i]
            pltpu.make_async_copy(hbm.at[e], scratch.at[i], sem).wait()
            return c
        jax.lax.fori_loop(0, 4, drain, 0, unroll=4)
        out_ref[:] = scratch[:, 0, :]

    out = pl.pallas_call(
        kern,
        out_shape=jax.ShapeDtypeStruct((4, 128), jnp.uint32),
        in_specs=[
            pl.BlockSpec(memory_space=pltpu.SMEM),
            pl.BlockSpec(memory_space=pltpu.ANY),
        ],
        out_specs=pl.BlockSpec(memory_space=pltpu.VMEM),
        scratch_shapes=[pltpu.VMEM((4, 1, 128), jnp.uint32),
                        pltpu.SemaphoreType.DMA],
    )(idx, tbl)
    want = np.stack([np.arange(i * 128, (i + 1) * 128)
                     for i in [3, 1000, 4095, 1]]).astype(np.uint32)
    assert (np.asarray(out) == want).all()
    return "[N,1,128] leading DMA works"


@stage("C.dma-sublane-range")
def _():
    N = 1024
    tbl = jnp.arange(N * 16 * 128, dtype=jnp.uint32).reshape(N, 16, 128)
    idx = jnp.asarray([7, 1023], jnp.int32)

    def kern(idx_ref, hbm, out_ref, scratch, sem):
        def body(i, c):
            e = idx_ref[i]
            pltpu.make_async_copy(
                hbm.at[e, pl.ds(8, 8)], scratch.at[i], sem
            ).start()
            return c
        jax.lax.fori_loop(0, 2, body, 0, unroll=2)
        def drain(i, c):
            e = idx_ref[i]
            pltpu.make_async_copy(
                hbm.at[e, pl.ds(8, 8)], scratch.at[i], sem
            ).wait()
            return c
        jax.lax.fori_loop(0, 2, drain, 0, unroll=2)
        out_ref[:] = scratch[:]

    out = pl.pallas_call(
        kern,
        out_shape=jax.ShapeDtypeStruct((2, 8, 128), jnp.uint32),
        in_specs=[
            pl.BlockSpec(memory_space=pltpu.SMEM),
            pl.BlockSpec(memory_space=pltpu.ANY),
        ],
        out_specs=pl.BlockSpec(memory_space=pltpu.VMEM),
        scratch_shapes=[pltpu.VMEM((2, 8, 128), jnp.uint32),
                        pltpu.SemaphoreType.DMA],
    )(idx, tbl)
    want = np.stack([
        np.arange(e * 16 * 128, (e + 1) * 16 * 128).reshape(16, 128)[8:16]
        for e in [7, 1023]
    ]).astype(np.uint32)
    assert (np.asarray(out) == want).all()
    return "aligned sublane-range DMA works"


@stage("D.dynamic-roll")
def _():
    def kern(s_ref, x_ref, out_ref):
        out_ref[:] = pltpu.roll(x_ref[:], s_ref[0], axis=1)

    x = jnp.arange(256, dtype=jnp.int32).reshape(2, 128)
    out = pl.pallas_call(
        kern,
        out_shape=jax.ShapeDtypeStruct((2, 128), jnp.int32),
        in_specs=[pl.BlockSpec(memory_space=pltpu.SMEM),
                  pl.BlockSpec(memory_space=pltpu.VMEM)],
        out_specs=pl.BlockSpec(memory_space=pltpu.VMEM),
    )(jnp.asarray([32], jnp.int32), x)
    want = np.roll(np.arange(256).reshape(2, 128), 32, axis=1)
    assert (np.asarray(out) == want).all()
    return "dynamic-shift roll works"


@stage("E.blockq512")
def _():
    from hnsw_itu_tpu.ops.pallas_search import (
        fused_beam_search, materialize_fused, fused_width,
    )

    N, W, words, ef = 1 << 15, 64, 32, 48
    rng = np.random.default_rng(0)
    pts = jnp.asarray(rng.integers(0, 2**32, size=(N, words), dtype=np.uint32))
    adj = rng.integers(0, N, size=(N, W)).astype(np.int32)
    tbl = materialize_fused(pts, jnp.asarray(adj))
    id_bits = max(1, (N - 1).bit_length())
    qs = jnp.asarray(rng.integers(0, 2**32, size=(1024, words),
                                  dtype=np.uint32))
    init = jnp.zeros((1024,), jnp.int32) + 5  # arbitrary entry keys
    for bq in (256, 512):
        t0 = time.perf_counter()
        keys, vis, stp = fused_beam_search(
            tbl, qs, init, ef=ef, W=fused_width(W), words=words,
            id_bits=id_bits, max_d=words * 32, max_steps=96, block_q=bq,
        )
        np.asarray(keys)
        t1 = time.perf_counter()
        # timed re-run with perturbed input (block_until_ready lies)
        qs2 = qs.at[0, 0].add(1)
        t0 = time.perf_counter()
        keys, _, _ = fused_beam_search(
            tbl, qs2, init, ef=ef, W=fused_width(W), words=words,
            id_bits=id_bits, max_d=words * 32, max_steps=96, block_q=bq,
        )
        np.asarray(keys)
        dt = time.perf_counter() - t0
        print(f"   block_q={bq}: compile+run {t1-t0:.1f}s, "
              f"steady {dt*1e3:.1f}ms for 1024 queries "
              f"({1024/dt:.0f} qps raw)", flush=True)
    return "512 compiled and ran at max_steps=96"


print("done", flush=True)
