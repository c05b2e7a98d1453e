"""leann_tpu — a TPU-native vector database / RAG engine.

A from-scratch re-design of the capabilities of `decisiongraph/leann-rs`
(a Rust CLI vector DB) for TPU hardware:

- The ANN engine is JAX/Pallas: exact search is a tiled matmul + top-k;
  graph (Vamana) search is a *frontier-batched* beam search where every
  hop scores a block of neighbors against a batch of queries on the MXU,
  instead of the reference's one-query-at-a-time pointer-chasing
  (reference: `src/backend/hnsw.rs`, `src/backend/diskann.rs`).
- LEANN's signature pruned/recompute mode runs the embedding model on the
  same TPU, hop-synchronously fused with traversal
  (reference: `src/index/recompute.rs`).
- Host side (storage formats, chunking, BM25, filters, providers, CLI,
  HTTP/MCP servers) keeps the reference's artifact format so indexes
  interoperate (reference: `src/index/passages.rs`, `src/index/meta.rs`).

Package layout:
  store/     on-disk index formats (passages JSONL, raw-f32 embeddings,
             meta.json, packed graph)
  chunker/   text + code chunking
  embed/     embedding providers (fake/openai/ollama/gemini/local-TPU)
  llm/       LLM providers for RAG / ReAct
  ops/       device kernels (distance, top-k, beam search, Vamana build)
  index/     engine layer (builder, searcher, BM25, filter DSL, expansion)
  parallel/  mesh + sharded (multi-chip) search
  models/    on-TPU encoder (BERT) for local embeddings / recompute
  server/    HTTP + MCP servers
  agent/     ReAct agent
  rag/       ask (RAG) pipeline
  cli/       command-line surface
"""

from leann_tpu.version import __version__

__all__ = ["__version__", "Index", "open_index", "SearchResult"]


def __getattr__(name):
    # Lazy: `import leann_tpu` stays free of jax/engine imports until an
    # API symbol is touched (the CLI parses --help without a TPU).
    if name in ("Index", "open_index"):
        from leann_tpu import api

        return getattr(api, name)
    if name == "SearchResult":
        from leann_tpu.index.searcher import SearchResult

        return SearchResult
    raise AttributeError(f"module 'leann_tpu' has no attribute {name!r}")
