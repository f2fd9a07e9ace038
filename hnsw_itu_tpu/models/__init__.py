from .base import ID_INF, Index, IndexOptions, KnnResult, rng_seed
from .bruteforce import Bruteforce
from .nsw import NSW, NSWBuilder

__all__ = [
    "ID_INF",
    "Index",
    "IndexOptions",
    "KnnResult",
    "rng_seed",
    "Bruteforce",
    "NSW",
    "NSWBuilder",
]
