"""Index engine (layer L2): build / search / rank."""

from leann_tpu.index.bm25 import Bm25Scorer, hybrid_rerank, tokenize
from leann_tpu.index.filter import MetadataFilter
from leann_tpu.index.builder import IndexBuilder, StreamingIndexBuilder
from leann_tpu.index.searcher import IndexSearcher, SearchOptions, SearchResult

__all__ = [
    "Bm25Scorer",
    "hybrid_rerank",
    "tokenize",
    "MetadataFilter",
    "IndexBuilder",
    "StreamingIndexBuilder",
    "IndexSearcher",
    "SearchOptions",
    "SearchResult",
]
