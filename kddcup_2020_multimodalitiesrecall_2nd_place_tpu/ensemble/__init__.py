from .fusion import (
    DEFAULT_WEIGHTS,
    FusionResult,
    build_submission,
    dedup_filter,
    fuse,
    load_csv_scores,
    load_tsv_scores,
    read_submission,
    top5_rows,
    write_submission,
)

__all__ = [
    "DEFAULT_WEIGHTS",
    "FusionResult",
    "build_submission",
    "dedup_filter",
    "fuse",
    "load_csv_scores",
    "load_tsv_scores",
    "read_submission",
    "top5_rows",
    "write_submission",
]
