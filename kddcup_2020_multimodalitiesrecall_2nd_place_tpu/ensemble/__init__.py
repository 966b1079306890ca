from .fusion import (
    single_model_fusion,
    single_model_top5,
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
    "single_model_fusion",
    "single_model_top5",
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
