"""Pallas Hamming kernel vs the VPU reference path (interpret mode on CPU)."""

import numpy as np
import pytest

from hnsw_itu_tpu.ops import HAMMING
from hnsw_itu_tpu.ops.pallas_hamming import hamming_block_padded


def test_pallas_hamming_matches_reference():
    rng = np.random.default_rng(8)
    a = rng.integers(0, 2**32, size=(130, 32), dtype=np.uint32)
    b = rng.integers(0, 2**32, size=(70, 32), dtype=np.uint32)
    got = np.asarray(hamming_block_padded(a, b, interpret=True))
    want = np.asarray(HAMMING.pairwise(a, b))
    np.testing.assert_array_equal(got, want)


def test_pallas_hamming_exact_tiles():
    rng = np.random.default_rng(9)
    a = rng.integers(0, 2**32, size=(128, 32), dtype=np.uint32)
    got = np.asarray(hamming_block_padded(a, a, interpret=True))
    assert (np.diag(got) == 0).all()
    np.testing.assert_array_equal(got, got.T)
