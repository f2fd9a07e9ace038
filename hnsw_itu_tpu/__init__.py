"""hnsw_itu_tpu — TPU-native HNSW / NSW / brute-force K-NN framework.

A from-scratch JAX/XLA/Pallas re-design of the capabilities of the
``hnsw-itu`` Rust reference (HNSW over 1024-bit binary sketches, SISAP 2023
LAION challenge): padded-array graphs in HBM, batched frontier-expansion
beam search, bitmask visited sets, MXU brute-force scans, bulk-synchronous
batched index construction, HDF5 ingest, index persistence and a CLI.
"""

from . import ops
from .graph import GraphArrays, make_graph
from .ops.metrics import Metric, get_metric, register_metric

__version__ = "0.1.0"
