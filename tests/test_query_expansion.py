from leann_tpu.index.query import (
    expand_from_passages,
    extract_code_symbols,
    extract_key_terms,
    should_expand,
)


def test_should_expand():
    assert should_expand("fox")
    assert should_expand("quick brown fox")
    assert not should_expand("the quick brown fox jumps")


def test_extract_code_symbols():
    text = "pub fn parse_config(x: u32) {} class DataLoader: def load_batch(self):"
    syms = extract_code_symbols(text, 5)
    assert "parse_config" in syms
    assert "DataLoader" in syms
    assert "load_batch" in syms


def test_symbols_skip_test_and_private():
    text = "def test_foo(): pass\ndef _private(): pass\ndef real_work(): pass"
    syms = extract_code_symbols(text, 5)
    assert "real_work" in syms
    assert "test_foo" not in syms
    assert "_private" not in syms


def test_key_terms_filter_stopwords_and_code():
    text = "the retrieval engine uses embedding vectors for retrieval assert_eq let"
    terms = extract_key_terms(text, 5)
    assert "retrieval" in terms
    assert "the" not in terms
    assert "assert_eq" not in terms  # code-like (underscore)


def test_expand_appends_novel_terms():
    out = expand_from_passages(
        "search", ["vector retrieval ranking quality retrieval"], 3
    )
    assert out.startswith("search ")
    assert "retrieval" in out


def test_expand_no_passages_is_identity():
    assert expand_from_passages("query text", [], 3) == "query text"


def test_expand_skips_terms_already_in_query():
    out = expand_from_passages("retrieval", ["retrieval retrieval retrieval"], 3)
    assert out == "retrieval"
