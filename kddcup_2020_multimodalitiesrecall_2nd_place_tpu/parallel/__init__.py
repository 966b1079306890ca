from .engine import ScoringEngine, ScoringStats, write_scores_csv, write_scores_tsv
from .mesh import (
    DATA_AXIS,
    MODEL_AXIS,
    batch_sharding,
    data_parallel_batch_size,
    make_mesh,
    replicated,
    shard_batch,
)

__all__ = [
    "DATA_AXIS",
    "MODEL_AXIS",
    "ScoringEngine",
    "ScoringStats",
    "batch_sharding",
    "data_parallel_batch_size",
    "make_mesh",
    "replicated",
    "shard_batch",
    "write_scores_csv",
    "write_scores_tsv",
]
