"""On-disk index formats (layer L0).

Byte-compatible with the reference index directory contract
(reference: `src/index/passages.rs`, `src/index/embeddings.rs`,
`src/index/meta.rs`; layout documented in its README):

  <base>.passages.jsonl      one JSON passage per line
  <base>.passages.idx.json   {id: byte_offset} map
  <base>.ids.txt             newline-separated string ids (position = int id)
  <base>.embeddings          raw little-endian f32 row-major matrix
  <base>.meta.json           IndexMeta JSON
  <base>.graph.npz           packed fixed-degree adjacency (ours; replaces
                             the reference's opaque usearch/diskann binaries)
  <base>.bm25.json[.gz]      persisted BM25 stats (ours; the reference
                             rebuilds BM25 per query — src/index/searcher.rs:149)
  <base>.tokens.npz          pre-tokenized passages for on-TPU recompute (ours)
"""

from leann_tpu.store.passages import Passage, PassageStore, PassageStoreWriter
from leann_tpu.store.embeddings import EmbeddingsStore, EmbeddingsWriter, prune_embeddings
from leann_tpu.store.meta import IndexMeta
from leann_tpu.store.graphfile import GraphFile
from leann_tpu.store.locate import find_index, local_index_dir, global_index_dir

__all__ = [
    "Passage",
    "PassageStore",
    "PassageStoreWriter",
    "EmbeddingsStore",
    "EmbeddingsWriter",
    "prune_embeddings",
    "IndexMeta",
    "GraphFile",
    "find_index",
    "local_index_dir",
    "global_index_dir",
]
