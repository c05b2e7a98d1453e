"""Index builders.

StreamingIndexBuilder mirrors the reference's
(`src/index/builder.rs:135-270`): passages/ids/embeddings stream to disk
as chunks are embedded; the ANN structure is built at the end. Unlike the
reference (which keeps embeddings in RAM because usearch wants them,
builder.rs:230-233), embeddings here go straight to the raw-f32 file and
the graph build reads them back as device blocks.

Extras over the reference:
  - the BM25 sidecar is built at index time (fixes the per-query rebuild
    at searcher.rs:149-151)
  - always writes `.embeddings` (it *is* the flat index; prune deletes it)
"""

from __future__ import annotations

import os
from typing import Dict, Iterable, List, Optional, Sequence

import numpy as np

from leann_tpu.store.embeddings import EmbeddingsWriter
from leann_tpu.store.graphfile import GraphFile, graph_path
from leann_tpu.store.meta import IndexMeta, meta_path
from leann_tpu.store.passages import Passage, PassageStoreWriter, write_ids
from leann_tpu.index.bm25 import Bm25Scorer, bm25_path
from leann_tpu.backend import resolve_backend


class StreamingIndexBuilder:
    def __init__(
        self,
        base: str,
        dim: int,
        backend: str = "flat",
        metric: str = "ip",
        embedding_model: str = "fake",
        embedding_mode: str = "fake",
        embedding_options: Optional[Dict] = None,
        is_recompute: bool = False,
        build_bm25: bool = True,
        tokenizer_encoder=None,
    ):
        self.base = base
        self.dim = dim
        self.backend = resolve_backend(backend)
        self.metric = metric
        self.embedding_model = embedding_model
        self.embedding_mode = embedding_mode
        self.embedding_options = embedding_options
        self.is_recompute = is_recompute
        self.build_bm25 = build_bm25
        self.tokenizer_encoder = tokenizer_encoder

        os.makedirs(os.path.dirname(base) or ".", exist_ok=True)
        self._passages = PassageStoreWriter(base)
        self._embeddings = EmbeddingsWriter(base, dim)
        self._ids: List[str] = []
        self._texts: List[str] = [] if build_bm25 else []

    def add_passage(self, passage: Passage, embedding: np.ndarray) -> None:
        self._passages.add(passage)
        self._embeddings.add(np.asarray(embedding, dtype=np.float32))
        self._ids.append(passage.id)
        if self.build_bm25:
            self._texts.append(passage.text)

    def add_batch(
        self, passages: Sequence[Passage], embeddings: np.ndarray
    ) -> None:
        for p, e in zip(passages, embeddings):
            self.add_passage(p, e)

    def __len__(self) -> int:
        return len(self._ids)

    def build(
        self,
        graph_degree: int = 32,
        complexity: int = 64,
        alpha: float = 1.2,
    ) -> IndexMeta:
        self._passages.finish()
        self._embeddings.finish()
        write_ids(self.base, self._ids)

        backend_kwargs = None
        if self.backend == "ivf":
            from leann_tpu.ops.ivf import kmeans
            from leann_tpu.store.embeddings import EmbeddingsStore
            from leann_tpu.store.ivffile import IvfFile, ivf_path

            vectors = np.asarray(EmbeddingsStore(self.base, self.dim).all())
            metric = "ip" if self.metric == "cosine" else self.metric
            n_clusters = max(16, min(int(np.sqrt(len(vectors)) * 2), len(vectors)))
            centers, assign = kmeans(vectors, n_clusters, metric=metric)
            IvfFile(centers, assign, self.metric).save(ivf_path(self.base))
            backend_kwargs = {"n_clusters": n_clusters}
        if self.backend == "vamana":
            from leann_tpu.ops.vamana import build_vamana
            from leann_tpu.store.embeddings import EmbeddingsStore

            vectors = np.asarray(EmbeddingsStore(self.base, self.dim).all())
            adjacency, medoid = build_vamana(
                vectors,
                graph_degree=graph_degree,
                complexity=complexity,
                alpha=alpha,
                metric=self.metric,
            )
            GraphFile(adjacency, medoid, self.metric).save(graph_path(self.base))
            backend_kwargs = {
                "graph_degree": graph_degree,
                "complexity": complexity,
                "alpha": alpha,
            }

        if self.build_bm25 and self._texts:
            Bm25Scorer.build(self._texts).save(bm25_path(self.base))

        # Recompute-ready local indexes persist pre-tokenized passages so
        # pruned-index traversal can re-embed frontier nodes on device.
        if self.is_recompute and self.tokenizer_encoder is not None:
            from leann_tpu.store.tokens import save_tokens
            from leann_tpu.store.passages import PassageStore

            texts = [p.text for p in PassageStore(self.base).iter_all()]
            tok, mask = self.tokenizer_encoder.tokenize_corpus(texts)
            save_tokens(self.base, tok, mask)

        meta = IndexMeta(
            backend_name=self.backend,
            embedding_model=self.embedding_model,
            embedding_mode=self.embedding_mode,
            dimensions=self.dim,
            passage_count=len(self._ids),
            backend_kwargs=backend_kwargs,
            embedding_options=self.embedding_options,
            is_recompute=self.is_recompute,
            is_pruned=False,
            metric=self.metric,
        )
        meta.save(meta_path(self.base))
        return meta


class IndexBuilder:
    """In-memory convenience builder (reference `src/index/builder.rs:14-130`)."""

    def __init__(self, base: str, dim: int, **kwargs):
        self._streaming = StreamingIndexBuilder(base, dim, **kwargs)

    def add(self, pid: str, text: str, embedding: np.ndarray, metadata=None) -> None:
        self._streaming.add_passage(
            Passage(id=pid, text=text, metadata=metadata or {}), embedding
        )

    def build(self, **kwargs) -> IndexMeta:
        return self._streaming.build(**kwargs)
