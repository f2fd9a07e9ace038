"""Sampled entry-point selection — the MXU approach phase.

The reference (and classic HNSW) finds a good entry for the base-layer
search by greedy ef=1 descent through the hierarchy (hnsw.rs:285-293) —
a pointer-chasing phase that maps poorly onto lockstep batched TPU search.
The TPU-native alternative: compute exact distances from every query to a
strided sample of the dataset in ONE dense MXU block and enter the graph at
the per-query argmin. For a sample of S points the entry lands in the best
~1/S quantile of the dataset — the same "skip the approach" effect as the
hierarchy, but as a single matmul instead of dozens of dependent steps.

Both query (`query_entry="sample"`) and construction use it; the greedy
descent remains available for exact reference-semantics parity.
"""

from __future__ import annotations

import jax
import jax.numpy as jnp

from .metrics import Metric


def strided_sample_ids(n, sample_size: int) -> jax.Array:
    """sample_size evenly-strided ids over [0, n) (n may be traced)."""
    s = jnp.arange(sample_size, dtype=jnp.int32)
    return jnp.clip((s * n) // sample_size, 0, n - 1).astype(jnp.int32)


def sampled_entry(points, qs, n, *, sample_size: int, metric: Metric):
    """Per-query entry ids: argmin over a strided sample (MXU block).

    Args:
      points: [cap, ...] point buffer.
      qs: [B, ...] queries.
      n: live point count (traced ok).
    Returns int32[B] entry ids.
    """
    ids = strided_sample_ids(n, sample_size)
    sample = points[ids]
    d = metric.pairwise_mxu(qs, sample)  # [B, S]
    best = jnp.argmin(d, axis=1)
    return ids[best]


def sampled_entry_topk(points, qs, n, *, sample_size: int, beams: int,
                       metric: Metric):
    """Per-query top-``beams`` entry ids over the strided sample.

    Multi-seed entry: the dense MXU block already computes distances to
    every sample point, so taking its top-B instead of top-1 is free
    compute — B distinct seeds spread the beam start across B near
    clusters, attacking the entry/expansion starvation measured at 10M
    (exact-path recall 0.75 at ef=64 with one seed, benches/RESULTS.md).
    Seed ids are DISTINCT (sample ids are unique). Returns
    (ids int32[B, beams], dists [B, beams]) ascending by distance.
    """
    if beams > sample_size:
        raise ValueError(f"beams={beams} > sample_size={sample_size}")
    ids = strided_sample_ids(n, sample_size)
    sample = points[ids]
    d = metric.pairwise_mxu(qs, sample)  # [B, S]
    # top-B by ITERATIVE argmin, not lax.top_k: top_k over a
    # [10k, 65536] row lowers to a full sort whose workspace OOMs HBM
    # and whose program kills the backend compile helper (measured,
    # round 5). B passes of argmin+mask are a tiny program and touch no
    # memory beyond the distance matrix itself; argmin breaks ties at
    # the lowest sample position, so column 0 equals sampled_entry.
    S = sample_size
    pos_iota = jnp.arange(S, dtype=jnp.int32)[None, :]
    out_i, out_d = [], []
    for _ in range(beams):
        p0 = jnp.argmin(d, axis=1)  # [B]
        out_i.append(ids[p0])
        out_d.append(jnp.take_along_axis(d, p0[:, None], 1)[:, 0])
        d = jnp.where(pos_iota == p0[:, None], metric.inf, d)
    return jnp.stack(out_i, axis=1), jnp.stack(out_d, axis=1)
