"""Exact k-NN by tiled scan — ground-truth oracle.

Parity target: ``Bruteforce`` (/root/reference/src/index/bruteforce.rs:9-70):
map every point to a Distance, stream through MinK. TPU redesign: the scan
is a ``lax.fori_loop`` over point tiles; each tile computes a dense
query-tile x point-tile distance block on the MXU (bit-unpacked Hamming
matmul / L2 norm expansion) and folds it into a running top-k via two-key
sort merge. ``ef`` is ignored, like the reference (bruteforce.rs:38).
"""

from __future__ import annotations

import functools
import math

import jax
import jax.numpy as jnp
import numpy as np

from ..ops.metrics import Metric, get_metric
from ..ops.topk import merge_min_k
from .base import ID_INF, KnnResult


def _pad_rows(x: np.ndarray, to: int):
    if x.shape[0] == to:
        return x
    pad = np.zeros((to - x.shape[0], *x.shape[1:]), x.dtype)
    return np.concatenate([x, pad], axis=0)


@functools.partial(
    jax.jit, static_argnames=("k", "metric_name", "tile", "n_tiles")
)
def _scan_knns(queries, points, n, *, k, metric_name, tile, n_tiles):
    metric = get_metric(metric_name)
    B = queries.shape[0]
    inf = metric.inf

    def body(t, carry):
        best_d, best_i = carry
        start = t * tile
        pts = jax.lax.dynamic_slice_in_dim(points, start, tile, axis=0)
        d = metric.pairwise_mxu(queries, pts)  # [B, tile]
        ids = start + jnp.arange(tile, dtype=jnp.int32)
        valid = ids < n
        d = jnp.where(valid[None, :], d, inf)
        idv = jnp.where(valid, ids, ID_INF)
        # tile-local top-k first (cheap), then a small two-key merge — a
        # full [B, tile+k] sort would be a giant bitonic network
        neg_td, t_pos = jax.lax.top_k(-d, min(k, tile))
        t_i = jnp.broadcast_to(idv, (B, tile))[
            jnp.arange(B)[:, None], t_pos
        ]
        return merge_min_k(best_d, best_i, -neg_td, t_i, k)

    init = (
        jnp.full((B, k), inf, metric.dist_dtype),
        jnp.full((B, k), ID_INF, jnp.int32),
    )
    best_d, best_i = jax.lax.fori_loop(0, n_tiles, body, init)
    return best_d, best_i


class Bruteforce:
    """Exact index; is its own builder (bruteforce.rs:25-35)."""

    def __init__(self, metric: Metric | str = "hamming", tile: int = 8192):
        self.metric = get_metric(metric) if isinstance(metric, str) else metric
        self.tile = tile
        self._chunks: list[np.ndarray] = []
        self._points = None
        self._n = 0

    # -- IndexBuilder parity -------------------------------------------------
    def add(self, point) -> None:
        self.extend(np.asarray(point)[None])

    def extend(self, points) -> None:
        pts = np.asarray(points)
        self._chunks.append(pts)
        self._n += pts.shape[0]
        self._points = None

    def build(self) -> "Bruteforce":
        self._materialize()
        return self

    # -- Index parity ----------------------------------------------------------
    def size(self) -> int:
        return self._n

    def _materialize(self):
        if self._points is None:
            if not self._chunks:
                raise ValueError("empty index")
            all_pts = np.concatenate(self._chunks, axis=0)
            self._chunks = [all_pts]
            tile = min(self.tile, max(256, 1 << (self._n - 1).bit_length()))
            self._tile_eff = min(tile, self.tile)
            cap = -(-self._n // self._tile_eff) * self._tile_eff
            self._points = jnp.asarray(_pad_rows(all_pts, cap))
        return self._points

    def search(self, query, k: int, ef: int = 0) -> KnnResult:
        r = self.knns(np.asarray(query)[None], k, ef)
        return KnnResult(r.dists[0], r.ids[0])

    def knns(self, queries, k: int, ef: int = 0, batch: int = 1024) -> KnnResult:
        del ef  # ignored, like the reference (bruteforce.rs:38)
        pts = self._materialize()
        qs = np.asarray(queries)
        nq = qs.shape[0]
        n_tiles = pts.shape[0] // self._tile_eff
        out_d, out_i = [], []
        for s in range(0, nq, batch):
            q = qs[s : s + batch]
            b = q.shape[0]
            qb = _pad_rows(q, min(batch, max(b, 8)))
            d, i = _scan_knns(
                jnp.asarray(qb),
                pts,
                jnp.int32(self._n),
                k=k,
                metric_name=self.metric.name,
                tile=self._tile_eff,
                n_tiles=n_tiles,
            )
            out_d.append(np.asarray(d)[:b])
            out_i.append(np.asarray(i)[:b])
        return KnnResult(
            jnp.asarray(np.concatenate(out_d)), jnp.asarray(np.concatenate(out_i))
        )
