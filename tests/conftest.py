"""Test harness config: run everything on a virtual 8-device CPU mesh.

The reference needed no multi-node testing (single process + rayon,
SURVEY.md §4); the TPU equivalent is
``--xla_force_host_platform_device_count`` so sharding tests exercise real
collectives without hardware.
"""

import os
import sys

os.environ["JAX_PLATFORMS"] = "cpu"
flags = os.environ.get("XLA_FLAGS", "")
if "xla_force_host_platform_device_count" not in flags:
    os.environ["XLA_FLAGS"] = (
        flags + " --xla_force_host_platform_device_count=8"
    ).strip()

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))
