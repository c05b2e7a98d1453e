import json
import os

import numpy as np
import pytest

from leann_tpu.store import (
    EmbeddingsStore,
    EmbeddingsWriter,
    GraphFile,
    IndexMeta,
    Passage,
    PassageStore,
    PassageStoreWriter,
    prune_embeddings,
)
from leann_tpu.store.passages import read_ids, write_ids
from leann_tpu.store.meta import meta_path
from leann_tpu.store.graphfile import graph_path


def test_passage_roundtrip(tmp_index_base):
    with PassageStoreWriter(tmp_index_base) as w:
        w.add(Passage("a", "hello world", {"source": "x.txt"}))
        w.add(Passage("b", "unicode ✓ text", {"n": 3}))
    store = PassageStore(tmp_index_base)
    assert len(store) == 2
    assert store.get("a").text == "hello world"
    assert store.get("b").text == "unicode ✓ text"
    assert store.get("b").metadata == {"n": 3}
    assert store.get("missing") is None
    assert [p.id for p in store.iter_all()] == ["a", "b"]


def test_passage_append_mode(tmp_index_base):
    with PassageStoreWriter(tmp_index_base) as w:
        w.add(Passage("a", "first"))
    with PassageStoreWriter(tmp_index_base, append=True) as w:
        w.add(Passage("b", "second"))
    store = PassageStore(tmp_index_base)
    assert store.get("a").text == "first"
    assert store.get("b").text == "second"


def test_offset_sidecar_is_plain_json(tmp_index_base):
    with PassageStoreWriter(tmp_index_base) as w:
        w.add(Passage("a", "hello"))
    with open(tmp_index_base + ".passages.idx.json") as f:
        offsets = json.load(f)
    assert offsets == {"a": 0}


def test_embeddings_roundtrip(tmp_index_base):
    data = np.random.default_rng(0).standard_normal((5, 8)).astype(np.float32)
    with EmbeddingsWriter(tmp_index_base, 8) as w:
        w.add(data[:3])
        w.add(data[3])
        w.add(data[4])
    store = EmbeddingsStore(tmp_index_base, 8)
    assert len(store) == 5
    np.testing.assert_allclose(np.asarray(store.all()), data)
    # raw little-endian f32, no header (interop contract)
    assert os.path.getsize(tmp_index_base + ".embeddings") == 5 * 8 * 4


def test_prune(tmp_index_base):
    with EmbeddingsWriter(tmp_index_base, 4) as w:
        w.add(np.zeros((2, 4), dtype=np.float32))
    freed = prune_embeddings(tmp_index_base)
    assert freed == 2 * 4 * 4
    assert not EmbeddingsStore.exists(tmp_index_base)
    assert prune_embeddings(tmp_index_base) is None


def test_ids_roundtrip(tmp_index_base):
    os.makedirs(os.path.dirname(tmp_index_base), exist_ok=True)
    write_ids(tmp_index_base, ["x", "y", "z"])
    assert read_ids(tmp_index_base) == ["x", "y", "z"]


def test_meta_roundtrip(tmp_index_base):
    os.makedirs(os.path.dirname(tmp_index_base), exist_ok=True)
    meta = IndexMeta(
        backend_name="flat",
        embedding_model="fake",
        dimensions=64,
        passage_count=10,
        metric="l2",
    )
    meta.save(meta_path(tmp_index_base))
    loaded = IndexMeta.load(meta_path(tmp_index_base))
    assert loaded.backend_name == "flat"
    assert loaded.dimensions == 64
    assert loaded.metric == "l2"
    assert not loaded.is_pruned
    # optional fields omitted like the reference
    with open(meta_path(tmp_index_base)) as f:
        obj = json.load(f)
    assert "backend_kwargs" not in obj


def test_meta_reads_reference_style_json(tmp_index_base):
    """A meta.json written by leann-rs (no `metric` field) loads cleanly."""
    os.makedirs(os.path.dirname(tmp_index_base), exist_ok=True)
    obj = {
        "version": "1.0",
        "backend_name": "hnsw",
        "embedding_model": "nomic-embed-text",
        "embedding_mode": "ollama",
        "dimensions": 768,
        "passage_count": 42,
        "is_recompute": False,
        "is_pruned": True,
    }
    with open(meta_path(tmp_index_base), "w") as f:
        json.dump(obj, f)
    meta = IndexMeta.load(meta_path(tmp_index_base))
    assert meta.backend_name == "hnsw"
    assert meta.is_pruned
    assert meta.metric == "ip"  # default


def test_graphfile_roundtrip(tmp_index_base):
    os.makedirs(os.path.dirname(tmp_index_base), exist_ok=True)
    adj = np.random.default_rng(0).integers(0, 10, size=(10, 4)).astype(np.int32)
    GraphFile(adj, medoid=3, metric="l2").save(graph_path(tmp_index_base))
    g = GraphFile.load(graph_path(tmp_index_base))
    np.testing.assert_array_equal(g.adjacency, adj)
    assert g.medoid == 3
    assert g.metric == "l2"
    assert g.degree == 4


def test_find_index(tmp_path, monkeypatch):
    from leann_tpu.store.locate import find_index, BASE_NAME

    idx_dir = tmp_path / ".leann" / "indexes" / "myidx"
    idx_dir.mkdir(parents=True)
    IndexMeta().save(str(idx_dir / (BASE_NAME + ".meta.json")))
    assert find_index("myidx", cwd=str(tmp_path)) == str(idx_dir)
    with pytest.raises(FileNotFoundError):
        find_index("nope", cwd=str(tmp_path))


def test_foreign_index_detection(tmp_path):
    from leann_tpu.backend.compat import sniff_foreign_index

    d = tmp_path / "idx"
    d.mkdir()
    assert sniff_foreign_index(str(d)) is None
    (d / "documents.leann.index").write_bytes(b"IxF2" + b"\x00" * 64)
    msg = sniff_foreign_index(str(d))
    assert msg is not None and "FAISS" in msg and "--force" in msg
    (d / "documents.leann.index").write_bytes(b"usearch-binary-here")
    msg = sniff_foreign_index(str(d))
    assert "usearch" in msg


def test_load_searcher_raises_on_foreign_index(tmp_path):
    import numpy as np

    from leann_tpu.backend import load_searcher
    from leann_tpu.store.embeddings import EmbeddingsWriter
    from leann_tpu.store.meta import IndexMeta

    base = str(tmp_path / "documents.leann")
    with EmbeddingsWriter(base, 8) as w:
        w.add(np.zeros((4, 8), np.float32))
    (tmp_path / "documents.leann.index").write_bytes(b"IxFl" + b"\x00" * 16)
    meta = IndexMeta(backend_name="hnsw", dimensions=8)
    with pytest.raises(RuntimeError, match="FAISS"):
        load_searcher(base, meta)


def test_passage_store_concurrent_get(tmp_index_base):
    """Regression: get() must be thread-safe. The old seek()+readline()
    on the shared file object interleaved under ThreadingHTTPServer and
    served garbled JSON (hybrid_latency at 32 clients: malformed-passage
    500s); the pread path has no shared cursor."""
    import threading

    with PassageStoreWriter(tmp_index_base) as w:
        for i in range(200):
            w.add(Passage(f"p{i}", f"text-{i} " + "x" * (i % 97),
                          {"n": i}))
    store = PassageStore(tmp_index_base)
    errors = []

    def reader(seed):
        rng = np.random.default_rng(seed)
        for _ in range(300):
            i = int(rng.integers(0, 200))
            p = store.get(f"p{i}")
            if p is None or p.metadata.get("n") != i \
                    or not p.text.startswith(f"text-{i} "):
                errors.append((seed, i))

    threads = [threading.Thread(target=reader, args=(s,)) for s in range(8)]
    for t in threads:
        t.start()
    for t in threads:
        t.join()
    assert not errors


def test_passage_iter_all_does_not_disturb_get(tmp_index_base):
    with PassageStoreWriter(tmp_index_base) as w:
        for i in range(20):
            w.add(Passage(f"p{i}", f"t{i}"))
    store = PassageStore(tmp_index_base)
    it = store.iter_all()
    next(it)
    assert store.get("p7").text == "t7"
    assert next(it).id == "p1"
