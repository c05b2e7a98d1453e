from leann_tpu.embed.registry import get_model_config


def test_nomic():
    cfg = get_model_config("nomic-embed-text")
    assert cfg.document_prefix == "search_document: "
    assert cfg.query_prefix == "search_query: "
    assert cfg.normalized
    assert cfg.dimensions == 768


def test_version_tag_stripped():
    assert get_model_config("nomic-embed-text:latest").document_prefix == "search_document: "


def test_mxbai():
    cfg = get_model_config("mxbai-embed-large")
    assert cfg.dimensions == 1024
    assert cfg.query_prefix != ""


def test_bge_query_only_prefix():
    cfg = get_model_config("bge-base-en-v1.5")
    assert cfg.document_prefix == ""
    assert "searching relevant passages" in cfg.query_prefix
    assert get_model_config("bge-small-en").dimensions == 384
    assert get_model_config("bge-large-en").dimensions == 1024


def test_e5():
    cfg = get_model_config("e5-base-v2")
    assert cfg.document_prefix == "passage: "
    assert cfg.query_prefix == "query: "
    assert get_model_config("multilingual-e5-large").dimensions == 1024


def test_openai_dims():
    assert get_model_config("text-embedding-3-small").dimensions == 1536
    assert get_model_config("text-embedding-3-large").dimensions == 3072
    assert get_model_config("text-embedding-ada-002").dimensions == 1536


def test_unknown_defaults():
    cfg = get_model_config("some-unknown-model")
    assert cfg.document_prefix == ""
    assert cfg.query_prefix == ""
    assert not cfg.normalized
    assert cfg.dimensions == 768
