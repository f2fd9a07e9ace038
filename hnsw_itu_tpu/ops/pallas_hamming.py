"""Pallas TPU kernel: fused XOR+popcount Hamming distance blocks.

The TPU-native equivalent of the reference's AVX2 distance kernel
(/root/reference/cli/benches/distance/bench.rs:43-88: 4x256-bit XOR +
nibble-LUT popcount). Computes a dense [M, N] Hamming block directly from
packed uint32 sketches on the VPU — no bit-unpack to bf16, no 16x memory
inflation like the MXU matmul identity path (ops/metrics.py
Hamming.pairwise_mxu). Each grid cell loads a [TM, W] x [TN, W] tile pair
into VMEM and accumulates popcount(a ^ b) over the W packed words.

Use for moderate dense blocks (select-neighbors pairwise matrices,
brute-force tiles when VMEM-resident); the MXU path wins for very large
tiles where the systolic array's flops dominate the unpack cost.
"""

from __future__ import annotations

import functools

import jax
import jax.numpy as jnp
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu


def _hamming_kernel(a_ref, b_ref, out_ref):
    W = a_ref.shape[1]
    a = a_ref[:]  # [TM, W] uint32
    b = b_ref[:]  # [TN, W] uint32

    # static per-word slices (dynamic_slice has no Mosaic TPU lowering)
    acc = jnp.zeros(out_ref.shape, jnp.int32)
    for w in range(W):
        x = jnp.bitwise_xor(a[:, w : w + 1], jnp.transpose(b[:, w : w + 1]))
        acc = acc + jax.lax.population_count(x).astype(jnp.int32)
    out_ref[:] = acc


@functools.partial(jax.jit, static_argnames=("tm", "tn", "interpret"))
def hamming_block(a: jax.Array, b: jax.Array, *, tm: int = 128, tn: int = 128,
                  interpret: bool = False) -> jax.Array:
    """[M, W] x [N, W] packed uint32 -> int32[M, N] Hamming distances.
    M and N must be multiples of (tm, tn); pad at the call site."""
    M, W = a.shape
    N, _ = b.shape
    grid = (M // tm, N // tn)
    return pl.pallas_call(
        _hamming_kernel,
        out_shape=jax.ShapeDtypeStruct((M, N), jnp.int32),
        grid_spec=pl.GridSpec(
            grid=grid,
            in_specs=[
                pl.BlockSpec((tm, W), lambda i, j: (i, 0),
                             memory_space=pltpu.VMEM),
                pl.BlockSpec((tn, W), lambda i, j: (j, 0),
                             memory_space=pltpu.VMEM),
            ],
            out_specs=pl.BlockSpec((tm, tn), lambda i, j: (i, j),
                                   memory_space=pltpu.VMEM),
        ),
        interpret=interpret,
    )(a, b)


def hamming_block_padded(a, b, *, tm=128, tn=128, interpret=False):
    """Pad-to-tile wrapper; returns the [M, N] block trimmed back."""
    M, W = a.shape
    N = b.shape[0]
    Mp = -(-M // tm) * tm
    Np = -(-N // tn) * tn
    if Mp != M:
        a = jnp.concatenate([a, jnp.zeros((Mp - M, W), a.dtype)])
    if Np != N:
        b = jnp.concatenate([b, jnp.zeros((Np - N, W), b.dtype)])
    out = hamming_block(a, b, tm=tm, tn=tn, interpret=interpret)
    return out[:M, :N]
