from .distributed import (
    global_batch_from_local,
    local_rows,
    maybe_initialize,
    process_shard,
)
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
    "global_batch_from_local",
    "local_rows",
    "make_mesh",
    "maybe_initialize",
    "process_shard",
    "replicated",
    "shard_batch",
    "write_scores_csv",
    "write_scores_tsv",
]
