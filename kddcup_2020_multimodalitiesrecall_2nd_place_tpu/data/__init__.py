from .featurize import Featurizer, pad_batch, stack_examples
from .labels import QueryLabelIndex, load_multimodal_labels
from .catalog import (
    CatalogDataset,
    build_catalog,
    recall_at_k,
    recall_chunked,
    rerank_batch,
)
from .packed import PackedDataset, write_packed_shards
from .sampling import HardNegativeSampler, SamplerConfig
from .pipeline import (
    PipelineStats,
    PrefetchIterator,
    batches_from_files,
    iter_batches,
    iter_examples,
)
from .tsv import (
    MAX_BOXES,
    MAX_LABEL_TOKENS,
    MAX_QUERY_LEN_AB,
    MAX_QUERY_LEN_L,
    RawExample,
    is_header,
    parse_line,
    rewrite_sen2forest,
)

__all__ = [
    "Featurizer",
    "HardNegativeSampler",
    "SamplerConfig",
    "MAX_BOXES",
    "MAX_LABEL_TOKENS",
    "MAX_QUERY_LEN_AB",
    "MAX_QUERY_LEN_L",
    "CatalogDataset",
    "PackedDataset",
    "PipelineStats",
    "PrefetchIterator",
    "QueryLabelIndex",
    "RawExample",
    "batches_from_files",
    "is_header",
    "iter_batches",
    "iter_examples",
    "load_multimodal_labels",
    "pad_batch",
    "parse_line",
    "rewrite_sen2forest",
    "stack_examples",
    "build_catalog",
    "recall_at_k",
    "recall_chunked",
    "rerank_batch",
    "write_packed_shards",
]
