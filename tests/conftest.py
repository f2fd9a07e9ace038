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

import jax  # noqa: E402

jax.config.update("jax_platforms", "cpu")

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))
