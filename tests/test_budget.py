"""Capacity-aware inline budgets + warmup buffer lifecycle.

Round-3 OOM postmortem: the 2M build died because (a) `_host_warmup`
re-materialized the 10.7GB inline buffer while the pre-warmup zeros
buffer was still alive (2x transient), and (b) nothing capped the env
budgets against what the chip can actually hold alongside the donated
fixed set. Both fixes are pinned here.
"""

import numpy as np
import pytest

import hnsw_itu_tpu.models.nsw as nswmod
from hnsw_itu_tpu.models import IndexOptions, NSWBuilder
from hnsw_itu_tpu.models.hnsw import HNSWBuilder


def test_inline_budget_env_only_on_cpu(monkeypatch):
    # CPU/test backends keep the raw env knob (no HBM cap)
    monkeypatch.setenv("HNSW_TPU_INLINE_QUERY_BYTES", "12345678")
    assert nswmod._inline_budget("HNSW_TPU_INLINE_QUERY_BYTES", 10**9) \
        == 12345678


def test_inline_budget_capped_by_hbm(monkeypatch):
    import jax

    monkeypatch.setattr(jax, "default_backend", lambda: "tpu")
    monkeypatch.setenv("HNSW_TPU_HBM_BYTES", str(int(15.75e9)))
    # fixed set leaves 15.75 - 1.6 - 4.5 = 9.65e9 for the table
    got = nswmod._inline_budget("HNSW_TPU_INLINE_BUILD_BYTES",
                                int(4.5e9))
    assert got == int(15.75e9 - 1.6e9 - 4.5e9)
    # small fixed set: the env default 1.1e10 is the binding constraint
    assert nswmod._inline_budget("HNSW_TPU_INLINE_BUILD_BYTES",
                                 int(0.84e9)) == int(1.1e10)


def test_build_words_at_flagship_scales(monkeypatch):
    """Truncated build widths must be LANE-ALIGNED on TPU backends
    (W*mw % 128 == 0): unaligned flat widths pay a whole-table re-layout
    copy per chunk dispatch (measured 11.3GB extra at 2M/mw=21 — the
    round-3 preflight OOM; docs/SCALE.md layout audit). 2M lands mw=20
    (640-bit steering), 10M mw=2 (64-bit + exact re-score)."""
    import jax

    monkeypatch.setattr(jax, "default_backend", lambda: "tpu")

    sample = np.zeros((1, 32), np.uint32)
    for size, want_mw in ((2_000_000, 20), (10_000_000, 2)):
        b = HNSWBuilder(
            IndexOptions(size=size, max_connections=64, connections=24),
            metric="hamming",
        )
        mw = NSWBuilder._inline_build_words(b, sample)
        assert mw == want_mw, (size, mw)
        assert (mw * 64) % 128 == 0
        fixed = size * (32 * 4 + 64 * 4 + 4 + 32) + b._extra_fixed_bytes()
        table = mw * size * 64 * 4
        assert fixed + table <= 15.75e9 - 1.6e9


def test_level_capacity_and_extra_bytes():
    b = HNSWBuilder(
        IndexOptions(size=10_000_000, max_connections=64, connections=24),
        metric="hamming",
    )
    # 2x the 416,667 expected level-0 nodes, pow2-rounded
    assert b._level_capacity(0) == 1 << 20
    assert b._level_capacity(1) == 1 << 16
    # level arrays total well under 0.5GB at 10M (the old 8x factor: 1.2GB)
    assert 2.5e8 < b._extra_fixed_bytes() < 4e8


def test_scanned_gate(monkeypatch):
    """Scanned dispatch must fall back to G=1 when the inline table's
    gather-layout HLO-temp copy would overflow the chip."""
    import jax

    n = 2048
    rng = np.random.default_rng(1)
    pts = rng.integers(0, 2**32, size=(n, 32), dtype=np.uint32)
    b = NSWBuilder(
        IndexOptions(host_warmup=0, ef_construction=16, connections=6,
                     max_connections=16, size=n, batch_size=64),
        metric="hamming",
    )
    b._ensure_points(pts)
    assert b._scanned_fits()  # CPU backend: always fits
    monkeypatch.setattr(jax, "default_backend", lambda: "tpu")
    assert b._scanned_fits()  # tiny arrays fit a real chip too
    monkeypatch.setenv("HNSW_TPU_HBM_BYTES", "1000000")  # 1MB chip
    assert not b._scanned_fits()
    assert b._scan_group([64, 64, 64], 0, 64) == 1


@pytest.mark.parametrize("cls", [NSWBuilder, HNSWBuilder])
def test_warmup_frees_prewarmup_buffers(cls, monkeypatch):
    """_host_warmup must delete the pre-warmup zero buffers before
    uploading replacements — old+new simultaneously doubles peak HBM
    (the round-3 2M OOM)."""
    from hnsw_itu_tpu import native

    if not native.available():
        pytest.skip("native host engine unavailable")
    n = 600
    rng = np.random.default_rng(0)
    pts = rng.integers(0, 2**32, size=(n, 32), dtype=np.uint32)
    # force a truncated inline buffer so adj_pts exists pre-warmup
    monkeypatch.setenv("HNSW_TPU_INLINE_BUILD_BYTES",
                       str(n * 16 * 4 * 4))
    b = cls(
        IndexOptions(host_warmup=n, ef_construction=16, connections=6,
                     max_connections=16, size=n, batch_size=64),
        metric="hamming",
    )
    b._ensure_points(pts)
    old_points, old_adj_pts = b.points, b.adj_pts
    assert old_adj_pts is not None
    got = b._host_warmup(pts)
    assert got == n
    assert old_points.is_deleted()
    assert old_adj_pts.is_deleted()
    assert not b.points.is_deleted() and not b.adj_pts.is_deleted()
