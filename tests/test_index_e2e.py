"""End-to-end build -> search -> recall on the flat backend with the fake
embedder: the hermetic pipeline test the reference lacks entirely
(its integration tests only check --help output)."""

import numpy as np
import pytest

from leann_tpu.embed import EmbeddingProvider
from leann_tpu.index import IndexSearcher, SearchOptions
from leann_tpu.index.builder import IndexBuilder
from leann_tpu.index.filter import MetadataFilter
from leann_tpu.index.recompute import RecomputeSearcher
from leann_tpu.store.embeddings import prune_embeddings
from leann_tpu.store.meta import IndexMeta, meta_path
from leann_tpu.store.passages import Passage


DOCS = [
    ("doc0", "the quick brown fox jumps over the lazy dog", {"kind": "animal"}),
    ("doc1", "tensor processing units accelerate matrix multiplication", {"kind": "hw"}),
    ("doc2", "vector databases store embeddings for retrieval", {"kind": "db"}),
    ("doc3", "foxes are small omnivorous mammals", {"kind": "animal"}),
    ("doc4", "JAX compiles numerical programs with XLA", {"kind": "hw"}),
    ("doc5", "approximate nearest neighbor search trades recall for speed", {"kind": "db"}),
]


@pytest.fixture()
def built_index(tmp_index_base):
    provider = EmbeddingProvider(mode="fake", dimensions=32)
    builder = IndexBuilder(tmp_index_base, dim=32, backend="flat", metric="ip")
    vecs = provider.embed([t for _, t, _ in DOCS])
    for (pid, text, md), v in zip(DOCS, vecs):
        builder.add(pid, text, v, md)
    meta = builder.build()
    return tmp_index_base, provider, meta


def test_build_then_exact_self_search(built_index):
    base, provider, meta = built_index
    assert meta.passage_count == len(DOCS)
    searcher = IndexSearcher.load(base)
    # searching with a document's own vector must return that document first
    q = provider.embed([DOCS[2][1]])
    results = searcher.search(q, SearchOptions(top_k=3))[0]
    assert results[0].id == "doc2"
    assert results[0].score > 0.99  # normalized identical vector
    assert results[0].metadata == {"kind": "db"}


def test_batched_queries(built_index):
    base, provider, _ = built_index
    searcher = IndexSearcher.load(base)
    q = provider.embed([DOCS[0][1], DOCS[4][1]])
    results = searcher.search(q, SearchOptions(top_k=2))
    assert len(results) == 2
    assert results[0][0].id == "doc0"
    assert results[1][0].id == "doc4"


def test_filtered_search(built_index):
    base, provider, _ = built_index
    searcher = IndexSearcher.load(base)
    q = provider.embed([DOCS[0][1]])
    opts = SearchOptions(top_k=3, filter=MetadataFilter.parse("kind=db"))
    results = searcher.search(q, opts)[0]
    assert results
    assert all(r.metadata["kind"] == "db" for r in results)


def test_hybrid_search_boosts_keyword_match(built_index):
    base, provider, _ = built_index
    searcher = IndexSearcher.load(base)
    # query vector deliberately unrelated; BM25 must surface doc0 via keywords
    q = provider.embed(["completely unrelated query text"])
    opts = SearchOptions(
        top_k=3, hybrid=True, hybrid_alpha=0.1, query_text="quick brown fox"
    )
    results = searcher.search(q, opts)[0]
    assert results[0].id == "doc0"


def test_bm25_sidecar_used(built_index):
    base, _, _ = built_index
    import os
    from leann_tpu.index.bm25 import bm25_path

    assert os.path.exists(bm25_path(base))
    searcher = IndexSearcher.load(base)
    hits = searcher.bm25_search("fox", 3)
    assert {h.id for h in hits} <= {"doc0", "doc3"}


def test_query_expansion_path(built_index):
    base, _, _ = built_index
    searcher = IndexSearcher.load(base)
    expanded = searcher.expand_query("fox")
    assert expanded.startswith("fox")


def test_prune_then_recompute_search(built_index):
    base, provider, meta = built_index
    # prune embeddings, set meta flag (what `leann prune` does)
    assert prune_embeddings(base) is not None
    meta.is_pruned = True
    meta.save(meta_path(base))

    rs = RecomputeSearcher(base, provider)
    q = provider.embed([DOCS[3][1]])[0]
    results = rs.search(q, top_k=2)
    assert results[0].id == "doc3"

    # filter-early in recompute mode
    results = rs.search(q, top_k=2, filter=MetadataFilter.parse("kind=hw"))
    assert results
    assert all(r.metadata["kind"] == "hw" for r in results)


def test_backend_alias_hnsw_accepted(tmp_index_base):
    from leann_tpu.backend import resolve_backend

    assert resolve_backend("hnsw") == "vamana"
    assert resolve_backend("diskann") == "vamana"
    assert resolve_backend("flat") == "flat"


def test_vamana_backend_end_to_end(tmp_index_base):
    """build -> graph file -> GraphSearcher -> correct retrieval."""
    rng = np.random.default_rng(7)
    provider = EmbeddingProvider(mode="fake", dimensions=24)
    texts = [f"document number {i} about topic {i % 7}" for i in range(300)]
    vecs = provider.embed(texts)
    builder = IndexBuilder(tmp_index_base, dim=24, backend="vamana", metric="ip")
    for i, (t, v) in enumerate(zip(texts, vecs)):
        builder.add(f"d{i}", t, v, {"i": i})
    meta = builder.build(graph_degree=16, complexity=32)
    assert meta.backend_name == "vamana"
    assert meta.backend_kwargs["graph_degree"] == 16

    searcher = IndexSearcher.load(tmp_index_base)
    q = provider.embed([texts[123]])
    results = searcher.search(q, SearchOptions(top_k=5, complexity=48))[0]
    assert results[0].id == "d123"
