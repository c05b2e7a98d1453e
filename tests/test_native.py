"""Native C++ host runtime: BM25 build parity with the Python oracle."""

import numpy as np
import pytest

from leann_tpu.index.bm25 import Bm25Scorer
from leann_tpu.native import _load_lib, bm25_build_native


DOCS = [
    "The quick brown fox jumps over the lazy dog",
    "a fast auburn fox leaped over sleeping hounds",
    "Ünïcode façade text with ascii tokens inside 42x",
    "",
    "repeated repeated repeated token token",
]


@pytest.fixture(scope="module")
def native_lib():
    lib = _load_lib()
    if lib is None:
        pytest.skip("native library unavailable (g++ build failed)")
    return lib


def test_native_build_matches_python(native_lib):
    native = Bm25Scorer(*bm25_build_native(DOCS))
    python = Bm25Scorer._build_python(DOCS)
    assert native.num_docs == python.num_docs
    np.testing.assert_array_equal(native.doc_lengths, python.doc_lengths)
    # ascii vocab must match exactly (non-ascii tokens are dropped by the
    # native tokenizer and contain no [a-zA-Z0-9]+ runs anyway)
    ascii_py_vocab = [t for t in python.vocab.tolist()]
    assert native.vocab.tolist() == ascii_py_vocab
    for query in ("fox dog", "repeated token", "42x", "nothing matches"):
        np.testing.assert_allclose(
            native.score_query(query), python.score_query(query), rtol=1e-5
        )


def test_native_build_used_by_default(native_lib):
    scorer = Bm25Scorer.build(DOCS)
    oracle = Bm25Scorer._build_python(DOCS)
    np.testing.assert_allclose(
        scorer.score_query("fox dog"), oracle.score_query("fox dog"), rtol=1e-5
    )


def test_native_scales(native_lib):
    docs = [f"document {i} token{i % 97} shared words here" for i in range(5000)]
    scorer = Bm25Scorer(*bm25_build_native(docs))
    assert scorer.num_docs == 5000
    hits = scorer.search("token11", 5)
    assert hits
    assert all(i % 97 == 11 for i, _ in hits)


def test_scan_line_offsets(native_lib):
    import ctypes

    lib = native_lib
    lib.scan_line_offsets.restype = ctypes.c_int64
    lib.scan_line_offsets.argtypes = [
        ctypes.c_char_p, ctypes.c_int64,
        ctypes.POINTER(ctypes.c_int64), ctypes.c_int64,
    ]
    buf = b'{"a":1}\n{"b":2}\n{"c":3}\n'
    out = np.zeros(10, dtype=np.int64)
    n = lib.scan_line_offsets(
        buf, len(buf), out.ctypes.data_as(ctypes.POINTER(ctypes.c_int64)), 10
    )
    assert n == 3
    np.testing.assert_array_equal(out[:3], [0, 8, 16])
