from . import logging
from .dataset import BUFFER_SIZE, BufferedDataset
from .evalrecall import (recall_at_k, recall_files,
                         recall_tie_tolerant)
from .instrument import SearchStats
from .serialize import ResultAttrs, load_index, save_index

__all__ = [
    "logging",
    "BUFFER_SIZE",
    "BufferedDataset",
    "recall_at_k",
    "recall_tie_tolerant",
    "recall_files",
    "SearchStats",
    "ResultAttrs",
    "load_index",
    "save_index",
]
