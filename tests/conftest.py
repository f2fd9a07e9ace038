"""Test harness config: run everything on a virtual 8-device CPU mesh.

The reference needed no multi-node testing (single process + rayon,
SURVEY.md §4); the TPU equivalent is
``--xla_force_host_platform_device_count`` so sharding tests exercise real
collectives without hardware.

Note: the environment's sitecustomize registers the remote-TPU ("axon")
backend via ``jax.config.update("jax_platforms", ...)`` which overrides the
JAX_PLATFORMS env var — so we must update the config, not just the env.
"""

import os
import sys

flags = os.environ.get("XLA_FLAGS", "")
if "xla_force_host_platform_device_count" not in flags:
    os.environ["XLA_FLAGS"] = (
        flags + " --xla_force_host_platform_device_count=8"
    ).strip()

# CLI tests call compile_cache.enable(); keep the persistent cache OFF in
# this process ("" = disabled). Two reasons, both observed: sharing
# ~/.jax_cache with a concurrently running TPU process corrupted entries
# (zstd decode abort in cache_read), and once the cache is on, XLA
# CHECK-aborts serializing the sharded CPU executables test_sharded
# compiles later in the suite. CPU compiles are fast; the cache only pays
# on the remote-TPU path.
os.environ.setdefault("HNSW_TPU_COMPILE_CACHE", "")

import jax  # noqa: E402
import pytest  # noqa: E402

jax.config.update("jax_platforms", "cpu")

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))


@pytest.fixture(autouse=True, scope="module")
def _drop_compiled_executables():
    """Free each module's compiled executables when it finishes.

    The full suite compiles 400+ distinct XLA programs in one process;
    holding every executable alive exhausts process resources and crashes
    the compiler with a segfault/abort ~85 tests in (observed repeatedly
    at whichever test lands there under reordering). Tests are
    independent across modules, so dropping the jit caches between
    modules costs only recompiles of shared helpers."""
    yield
    jax.clear_caches()
