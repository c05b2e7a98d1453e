import math

import numpy as np

from leann_tpu.index.bm25 import Bm25Scorer, hybrid_rerank, tokenize, K1, B


DOCS = [
    "the quick brown fox jumps over the lazy dog",
    "a fast auburn fox leaped over sleeping hounds",
    "machine learning on tensor processing units",
    "vector databases index embeddings for retrieval",
    "the dog sleeps while the fox runs",
]


def test_tokenize():
    assert tokenize("Hello, World! a b2c") == ["hello", "world", "b2c"]
    # single chars dropped
    assert tokenize("a b c") == []


def test_bm25_relevance_ordering():
    scorer = Bm25Scorer.build(DOCS)
    hits = scorer.search("fox dog", 5)
    ids = [i for i, _ in hits]
    # docs 0 and 4 contain both terms; doc 1 only fox
    assert set(ids[:2]) == {0, 4}
    assert 1 in ids
    assert 2 not in ids  # no term match -> excluded (score 0)


def test_bm25_scores_match_direct_formula():
    scorer = Bm25Scorer.build(DOCS)
    scores = scorer.score_query("fox")
    # hand-computed BM25 for doc 1
    n = len(DOCS)
    df = 3  # docs 0, 1, 4 contain "fox"
    idf = math.log((n - df + 0.5) / (df + 0.5) + 1.0)
    doc_tokens = tokenize(DOCS[1])
    tf = doc_tokens.count("fox")
    avg_len = sum(len(tokenize(d)) for d in DOCS) / n
    norm = 1 - B + B * (len(doc_tokens) / avg_len)
    expected = idf * (tf * (K1 + 1)) / (tf + K1 * norm)
    assert abs(scores[1] - expected) < 1e-5


def test_bm25_persistence_roundtrip(tmp_path):
    scorer = Bm25Scorer.build(DOCS)
    path = str(tmp_path / "x.bm25.npz")
    scorer.save(path)
    loaded = Bm25Scorer.load(path)
    np.testing.assert_allclose(
        loaded.score_query("fox dog"), scorer.score_query("fox dog"), rtol=1e-6
    )
    assert loaded.num_docs == scorer.num_docs


def test_bm25_empty_query_and_unknown_terms():
    scorer = Bm25Scorer.build(DOCS)
    assert scorer.search("zzz qqq", 3) == []
    assert (scorer.score_query("") == 0).all()


def test_hybrid_rerank_blend():
    bm25 = np.array([0.0, 10.0, 5.0], dtype=np.float32)
    vec_results = [(0, 1.0), (1, 0.0), (2, 0.5)]
    # alpha=1 -> pure vector order
    order = [i for i, _ in hybrid_rerank(vec_results, bm25, 1.0)]
    assert order == [0, 2, 1]
    # alpha=0 -> pure bm25 order
    order = [i for i, _ in hybrid_rerank(vec_results, bm25, 0.0)]
    assert order == [1, 2, 0]
    # blended alpha=0.5: doc2 is strong on both axes and must win
    res = hybrid_rerank([(0, 1.0), (1, 0.0), (2, 0.9)], np.array([0.0, 10.0, 9.0], np.float32), 0.5)
    assert res[0][0] == 2


def test_hybrid_rerank_empty():
    assert hybrid_rerank([], np.zeros(3, dtype=np.float32), 0.7) == []
