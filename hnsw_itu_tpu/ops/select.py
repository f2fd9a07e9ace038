"""SELECT-NEIGHBORS-HEURISTIC (HNSW paper Alg. 4), vectorized.

Parity target: ``select_neighbors`` (src/index/nsw.rs:11-33): pop candidates
in ascending (distance, id) order; keep candidate ``e`` iff fewer than ``m``
are kept so far AND for every already-kept ``r``: ``dist(e, r) > e.distance``
(strictly greater — ``e`` must be closer to the query than to any kept
neighbor). The pop order (MinMaxHeap ascending with id tie-break,
src/index/mod.rs:90-96) is reproduced with a two-key argsort, and the
sequential kept-set dependency with a ``fori_loop`` over the candidate
axis — tiny (C <= ~256) and fully vectorized across nodes via ``vmap``.
"""

from __future__ import annotations

import jax
import jax.numpy as jnp


def select_neighbors(
    d: jax.Array,
    ids: jax.Array,
    pair_d: jax.Array,
    valid: jax.Array,
    m: int,
):
    """Diversity-prune one candidate list.

    Args:
      d:      [C] candidate -> query distances.
      ids:    [C] candidate ids (used for tie-breaking and output).
      pair_d: [C, C] candidate <-> candidate distances (same order as d).
      valid:  [C] mask of real candidates.
      m:      max neighbors to keep.

    Returns:
      (sel_ids int32[m], sel_d [m], n_sel int32) — selected ids in selection
      (ascending-distance) order, padded with -1 / dtype-max.
    """
    C = d.shape[0]
    inf = (
        jnp.iinfo(d.dtype).max
        if jnp.issubdtype(d.dtype, jnp.integer)
        else jnp.asarray(jnp.inf, d.dtype)
    )
    d = jnp.where(valid, d, inf)
    big_id = jnp.iinfo(jnp.int32).max
    ids_key = jnp.where(valid, ids, big_id)

    perm = jnp.lexsort((ids_key, d))
    d_s = d[perm]
    ids_s = ids_key[perm]
    valid_s = valid[perm]
    pd_s = pair_d[perm][:, perm]

    arange = jnp.arange(C)

    def body(i, carry):
        keep, cnt = carry
        # all previously-kept r must satisfy dist(e, r) > dist(e, query)
        prev_kept = keep & (arange < i)
        ok = jnp.all(jnp.where(prev_kept, pd_s[i] > d_s[i], True))
        take = valid_s[i] & (cnt < m) & ok
        keep = keep.at[i].set(take)
        return keep, cnt + take.astype(jnp.int32)

    keep, n_sel = jax.lax.fori_loop(
        0, C, body, (jnp.zeros((C,), dtype=bool), jnp.int32(0))
    )

    # Compact kept entries to the front, preserving ascending order.
    rank = jnp.cumsum(keep.astype(jnp.int32)) - 1
    sel_ids = jnp.full((m,), -1, dtype=jnp.int32)
    sel_d = jnp.full((m,), inf, dtype=d.dtype)
    pos = jnp.where(keep, rank, m)  # dropped -> scatter-drop slot
    sel_ids = sel_ids.at[pos].set(ids_s.astype(jnp.int32), mode="drop")
    sel_d = sel_d.at[pos].set(d_s, mode="drop")
    return sel_ids, sel_d, n_sel


def select_neighbors_points(points_q, cand_pts, d, ids, valid, m, metric):
    """Convenience wrapper that computes the candidate pairwise matrix from
    gathered candidate points, then runs the heuristic."""
    del points_q
    pair_d = metric.pairwise(cand_pts, cand_pts)
    return select_neighbors(d, ids, pair_d, valid, m)
