"""Index API surface.

Parity targets: the ``IndexBuilder<P>`` / ``Index<P>`` / ``Point`` traits
(/root/reference/src/index/mod.rs:14-47) and the ``Distance`` result triple
(mod.rs:49-97). TPU redesign: results are fixed-shape (distance, id) array
pairs sorted ascending by (distance, id) — the reference's ``Ord`` — padded
with sentinels; ``knns`` is a jitted, vmapped batch instead of a rayon
par_iter (mod.rs:27-43).
"""

from __future__ import annotations

from dataclasses import dataclass, field
from typing import NamedTuple, Protocol, runtime_checkable

import jax
import numpy as np

ID_INF = np.iinfo(np.int32).max


class KnnResult(NamedTuple):
    """Batched k-NN result: [..., k] arrays, ascending (distance, id),
    invalid slots = (dtype-max, ID_INF)."""

    dists: jax.Array
    ids: jax.Array


@dataclass
class IndexOptions:
    """NSWOptions parity (src/index/nsw.rs:186-202): library defaults
    efc=100, m=16, M=32; ``size`` preallocates capacity (the TPU build
    requires it for static shapes — pass the dataset length)."""

    ef_construction: int = 100
    connections: int = 16
    max_connections: int = 32
    size: int = 0
    # TPU-specific knobs (no reference counterpart):
    expand: int = 1  # E-way frontier expansion during construction searches
    batch_size: int = 1024  # search/select sub-batch inside build chunks
    # BFS-relabel the finished graph for HBM locality before the query
    # tables are materialized (ops/reorder.py); results still return
    # original dataset ids (id_map)
    reorder: bool = False
    prune_budget: int = 256  # max degree-cap prunes applied per chunk
    seed: int = 0  # extra entropy mixed into the level RNG
    # MXU sampled-entry for construction searches (0 = descend/global ep)
    entry_sample: int = 1024
    # native-host warmup: first points inserted sequentially on the CPU with
    # exact reference semantics before batched TPU chunks take over — the
    # analogue of the reference's 50k sequential warmup (nsw.rs:234-235).
    # HNSW_TPU_HOST_WARMUP overrides (ops escape hatch; the CLI exposes no
    # warmup flag, mirroring the reference's fixed 50k)
    host_warmup: int = field(default_factory=lambda: int(
        __import__("os").environ.get("HNSW_TPU_HOST_WARMUP", 50_000)))
    # steady-state chunks grouped per device dispatch (_build.
    # chunk_steps_scanned): amortizes the remote backend's per-dispatch
    # donation copy + round trip G-fold. 1 disables grouping.
    # HNSW_TPU_SCAN_GROUP overrides the default (ops escape hatch: turn
    # grouping off on the TPU box without code edits).
    scan_group: int = field(default_factory=lambda: int(
        __import__("os").environ.get("HNSW_TPU_SCAN_GROUP", 8)))

    def __post_init__(self):
        # chunk windows are sliced in fixed strides of batch_size; a
        # non-power-of-two would make the final dynamic_slice window overlap
        # and desync sel_rows from new_ids — round up to the next pow2
        if self.batch_size < 1:
            raise ValueError("batch_size must be >= 1")
        self.batch_size = 1 << (self.batch_size - 1).bit_length()


class LazyStats:
    """Mapping over per-query search stats whose [nq] visited/steps arrays
    stay on the DEVICE until first access. Fetching them through a remote
    host tunnel costs milliseconds per query batch (measured 24.6ms RTT +
    ~1ms/100KB, benches/exp_overhead.py) — deferring the transfer keeps it
    out of benchmark timing and out of serving paths that never read
    stats. Supports the dict surface the CLI and benches use."""

    def __init__(self, vis, steps, nq: int):
        self._vis, self._steps, self._nq = vis, steps, nq
        self._d = None

    def _mat(self):
        if self._d is None:
            import jax
            import numpy as np

            vq, sq = jax.device_get((self._vis, self._steps))
            vq, sq = np.asarray(vq), np.asarray(sq)
            self._d = {
                "visited": int(vq.sum()),
                "steps": int(sq.sum()),
                "queries": self._nq,
                "visited_q": vq,
                "steps_q": sq,
            }
            self._vis = self._steps = None
        return self._d

    def __getitem__(self, k):
        return self._mat()[k]

    def get(self, k, default=None):
        return self._mat().get(k, default)

    def __contains__(self, k):
        return k in self._mat()

    def __iter__(self):
        return iter(self._mat())

    def keys(self):
        return self._mat().keys()

    def __repr__(self):
        return repr(self._mat())


def rng_seed(opts: IndexOptions) -> int:
    """Deterministic level-RNG seed derived from the build parameters —
    the analogue of the reference's
    ``threads ^ size ^ efc ^ m ^ M`` StdRng seed (src/index/hnsw.rs:24-30)."""
    return (
        opts.size
        ^ opts.ef_construction
        ^ opts.connections
        ^ opts.max_connections
        ^ opts.seed
    ) & 0xFFFFFFFF


@runtime_checkable
class Index(Protocol):
    def size(self) -> int: ...

    def search(self, query, k: int, ef: int) -> KnnResult: ...

    def knns(self, queries, k: int, ef: int) -> KnnResult: ...
