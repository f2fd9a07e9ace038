"""Persistent XLA compilation cache setup.

First compiles on the remote-TPU path cost 30-300s per program shape; the
persistent cache makes them one-time per machine. Call early (before the
first jit) — used by the CLI, bench.py and __graft_entry__.
"""

from __future__ import annotations

import os


def enable(cache_dir: str | None = None) -> None:
    import jax

    d = cache_dir or os.environ.get(
        "HNSW_TPU_COMPILE_CACHE", os.path.expanduser("~/.jax_cache")
    )
    if not d:  # HNSW_TPU_COMPILE_CACHE="" disables (the CPU test suite:
        return  # XLA CHECK-aborts serializing sharded CPU executables)
    os.makedirs(d, exist_ok=True)
    try:
        jax.config.update("jax_compilation_cache_dir", d)
        jax.config.update("jax_persistent_cache_min_compile_time_secs", 1.0)
    except Exception:
        pass  # older jax without the knobs — harmless
