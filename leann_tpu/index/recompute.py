"""Pruned-index search: recompute embeddings at query time.

LEANN's signature mode (reference `src/index/recompute.rs:17-134`): the
embeddings file has been deleted; only passages + ids (+ optionally the
graph) remain. Search re-embeds passages on demand.

Two engines:
  - brute force (this file): filter early, re-embed every surviving
    passage in batches, exact top-k on device — reference parity.
  - graph traversal with hop-synchronous on-TPU re-embedding
    (ops/beam.py + models/bert.py) for large corpora, where only the
    frontier's passages get re-embedded.
"""

from __future__ import annotations

from typing import List, Optional

import numpy as np

from leann_tpu.index.filter import MetadataFilter
from leann_tpu.index.searcher import SearchResult
from leann_tpu.ops.distance import exact_topk
from leann_tpu.store.meta import IndexMeta, meta_path
from leann_tpu.store.passages import PassageStore, read_ids

RECOMPUTE_BATCH = 100  # reference recompute.rs:86-93


class GraphRecomputeSearcher:
    """Pruned graph index + token store: frontier-batched traversal with
    on-TPU re-embedding (ops/beam.py:beam_search_recompute_batch). Only
    the ~beam_width * hops nodes actually visited get re-embedded,
    instead of the whole corpus."""

    def __init__(self, base: str, encoder):
        from leann_tpu.ops.beam import RecomputeBeamEngine
        from leann_tpu.store.graphfile import GraphFile, graph_path
        from leann_tpu.store.tokens import load_tokens

        self.base = base
        self.meta = IndexMeta.load(meta_path(base))
        self.passages = PassageStore(base)
        self.ids = read_ids(base)
        graph = GraphFile.load(graph_path(base))
        token_ids, attn_mask = load_tokens(base)
        self.engine = RecomputeBeamEngine(
            token_ids, attn_mask, graph.adjacency, graph.medoid,
            encoder, metric=self.meta.metric,
        )

    def search(
        self,
        query_vector: np.ndarray,
        top_k: int = 10,
        complexity: int = 32,
        filter: Optional[MetadataFilter] = None,
    ) -> List[SearchResult]:
        fetch_k = top_k * 5 if filter is not None else top_k
        idx, scores = self.engine.search(
            query_vector, k=min(fetch_k, len(self.ids)),
            beam_width=max(complexity, top_k),
        )
        out: List[SearchResult] = []
        for i, s in zip(idx[0], scores[0]):
            if i < 0 or i >= len(self.ids):
                continue
            p = self.passages.get(self.ids[int(i)])
            if p is None:
                continue
            if filter is not None and not filter.matches(p.metadata):
                continue
            out.append(
                SearchResult(id=p.id, score=float(s), text=p.text,
                             metadata=p.metadata)
            )
            if len(out) >= top_k:
                break
        return out


class RecomputeSearcher:
    def __init__(self, base: str, provider, document_template: Optional[str] = None):
        self.base = base
        self.meta = IndexMeta.load(meta_path(base))
        self.passages = PassageStore(base)
        self.ids = read_ids(base)
        self.provider = provider
        self.document_template = document_template

    def search(
        self,
        query_vector: np.ndarray,
        top_k: int = 10,
        filter: Optional[MetadataFilter] = None,
        batch_size: int = RECOMPUTE_BATCH,
    ) -> List[SearchResult]:
        # Filter early so we never embed excluded passages
        # (reference recompute.rs:65-79).
        surviving = []
        for p in self.passages.iter_all():
            if filter is None or filter.matches(p.metadata):
                surviving.append(p)
        if not surviving:
            return []

        rows = []
        for i in range(0, len(surviving), batch_size):
            batch = surviving[i : i + batch_size]
            rows.append(
                self.provider.embed_with_template(
                    [p.text for p in batch], self.document_template
                )
            )
        vectors = np.concatenate(rows, axis=0)

        metric = getattr(self.meta, "metric", "ip")
        k = min(top_k, len(surviving))
        scores, idx = exact_topk(query_vector, vectors, k, metric=metric)
        out: List[SearchResult] = []
        for i, s in zip(idx[0], scores[0]):
            if i < 0:
                continue
            p = surviving[int(i)]
            out.append(
                SearchResult(id=p.id, score=float(s), text=p.text, metadata=p.metadata)
            )
        return out
