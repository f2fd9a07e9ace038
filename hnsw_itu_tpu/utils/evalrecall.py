"""Recall@k evaluation.

The reference delegates recall computation to the external SISAP23 challenge
evaluation repo (/root/reference/.gitmodules:1-3; the CLI only emits the
result.h5 it consumes). Here it's a first-class utility: recall of a result
file (or arrays) against a ground-truth file produced by ``ground-truth``.
Ids are 1-based in both files, matching the reference's output convention
(main.rs:277).
"""

from __future__ import annotations

import numpy as np


def recall_at_k(result_ids, truth_ids, k: int | None = None) -> float:
    """Mean |result ∩ truth| / k per query. Arrays are [nq, >=k] id matrices
    (any base, as long as both use the same)."""
    result_ids = np.asarray(result_ids)
    truth_ids = np.asarray(truth_ids)
    if k is None:
        k = result_ids.shape[1]
    hits = 0
    for r, t in zip(result_ids, truth_ids):
        hits += len(set(r[:k].tolist()) & set(t[:k].tolist()))
    return hits / (result_ids.shape[0] * k)


def recall_files(result_path, truth_path, k: int | None = None) -> float:
    from .dataset import BufferedDataset

    with BufferedDataset.open(result_path, "knns") as res:
        r = res.read_all()
    with BufferedDataset.open(truth_path, "knns") as tru:
        t = tru.read_all()
    if k is None:
        k = r.shape[1]
    return recall_at_k(r, t[:, : r.shape[1]], k)
