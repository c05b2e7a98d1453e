"""CLI integration tests: the full command surface driven through
main(argv) in a temp working directory with the fake embedder — the
end-to-end coverage the reference's subprocess --help smoke tests
(`tests/integration_test.rs`) never had."""

import json
import os

import pytest

from leann_tpu.cli.main import main


@pytest.fixture()
def workdir(tmp_path, monkeypatch):
    docs = tmp_path / "docs"
    docs.mkdir()
    (docs / "animals.md").write_text(
        "The quick brown fox jumps over the lazy dog. Foxes live in forests."
    )
    (docs / "hardware.md").write_text(
        "Tensor processing units accelerate matrix multiplication on the MXU."
    )
    (docs / "code.py").write_text(
        "def search_index(query):\n    return ann.search(query)\n"
    )
    monkeypatch.chdir(tmp_path)
    # isolate global index dir + config
    monkeypatch.setenv("HOME", str(tmp_path / "home"))
    monkeypatch.setenv("XDG_CONFIG_HOME", str(tmp_path / "home" / ".config"))
    return tmp_path


def _build(workdir, name="testidx", extra=None):
    args = [
        "build", name, "--docs", "docs",
        "--embedding-mode", "fake", "--embedding-dimensions", "32",
        "--backend-name", "flat",
    ] + (extra or [])
    assert main(args) == 0


def test_build_and_search(workdir, capsys):
    _build(workdir)
    capsys.readouterr()
    rc = main(["search", 'Tensor processing units accelerate matrix multiplication on the MXU.',
               "-i", "testidx", "--top-k", "2", "--no-expand"])
    assert rc == 0
    out = capsys.readouterr().out
    assert "hardware.md" in out


def test_build_refuses_overwrite_without_force(workdir, capsys):
    _build(workdir)
    rc = main(["build", "testidx", "--docs", "docs",
               "--embedding-mode", "fake", "--embedding-dimensions", "32"])
    assert rc == 1
    assert "--force" in capsys.readouterr().err
    _build(workdir, extra=["--force"])


def test_search_json_format(workdir, capsys):
    _build(workdir)
    capsys.readouterr()
    rc = main(["search", 'The quick brown fox jumps over the lazy dog. Foxes live in forests.',
               "-i", "testidx", "--format", "json", "--top-k", "1"])
    assert rc == 0
    data = json.loads(capsys.readouterr().out)
    assert isinstance(data, list) and data
    assert "animals.md" in data[0]["id"]


def test_search_with_filter(workdir, capsys):
    _build(workdir)
    capsys.readouterr()
    rc = main(["search", "anything at all really", "-i", "testidx",
               "--filter", "source$py", "--format", "json", "--no-expand"])
    assert rc == 0
    data = json.loads(capsys.readouterr().out)
    assert data and all(r["metadata"]["source"].endswith(".py") for r in data)


def test_list_and_remove(workdir, capsys):
    _build(workdir)
    capsys.readouterr()
    assert main(["list"]) == 0
    out = capsys.readouterr().out
    assert "testidx" in out and "OK" in out
    assert main(["remove", "testidx", "-y"]) == 0
    capsys.readouterr()
    assert main(["list"]) == 0
    assert "testidx" not in capsys.readouterr().out


def test_prune_then_search_recompute(workdir, capsys):
    _build(workdir)
    capsys.readouterr()
    assert main(["prune", "testidx", "-y"]) == 0
    out = capsys.readouterr().out
    assert "freed" in out
    rc = main(["search", 'The quick brown fox jumps over the lazy dog. Foxes live in forests.',
               "-i", "testidx", "--format", "json", "--top-k", "1"])
    assert rc == 0
    data = json.loads(capsys.readouterr().out)
    assert "animals.md" in data[0]["id"]


def test_update_adds_documents(workdir, capsys):
    _build(workdir)
    (workdir / "docs" / "extra.md").write_text(
        "Approximate nearest neighbor search with Vamana graphs and beams."
    )
    capsys.readouterr()
    assert main(["update", "testidx", "--docs", "docs"]) == 0
    assert "Added" in capsys.readouterr().out
    rc = main(["search", 'Approximate nearest neighbor search with Vamana graphs and beams.',
               "-i", "testidx", "--format", "json", "--top-k", "1",
               "--no-expand"])
    assert rc == 0
    data = json.loads(capsys.readouterr().out)
    assert "extra.md" in data[0]["id"]


def test_ask_with_simulated_llm(workdir, capsys):
    _build(workdir)
    capsys.readouterr()
    rc = main(["ask", "what do foxes do?", "-i", "testidx",
               "--llm", "simulated", "--show-sources"])
    assert rc == 0
    out = capsys.readouterr().out
    assert "simulated" in out.lower()
    assert "Sources:" in out


def test_react_with_simulated_llm(workdir, capsys):
    _build(workdir)
    capsys.readouterr()
    rc = main(["react", "what accelerates matmuls?", "-i", "testidx",
               "--llm", "simulated", "--show-steps"])
    assert rc == 0
    out = capsys.readouterr().out
    assert "answer" in out.lower()


def test_config_show_and_path(workdir, capsys):
    assert main(["config", "path"]) == 0
    path = capsys.readouterr().out.strip()
    assert path.endswith("config.toml")
    assert main(["config", "init"]) == 0
    capsys.readouterr()
    assert main(["config", "show"]) == 0
    out = capsys.readouterr().out
    assert "[embedding]" in out and "[build]" in out


def test_vamana_build_via_cli(workdir, capsys):
    _build(workdir, name="gidx",
           extra=["--backend-name", "hnsw", "--graph-degree", "8",
                  "--complexity", "16"])
    capsys.readouterr()
    rc = main(["search", 'Tensor processing units accelerate matrix multiplication on the MXU.',
               "-i", "gidx", "--format", "json", "--top-k", "1",
               "--no-expand"])
    assert rc == 0
    data = json.loads(capsys.readouterr().out)
    assert "hardware.md" in data[0]["id"]


def test_search_missing_index_friendly_error(workdir, capsys):
    rc = main(["search", "x", "-i", "nope"])
    assert rc == 1
    assert "not found" in capsys.readouterr().err


def test_gitignore_respected(workdir, capsys):
    (workdir / "docs" / ".gitignore").write_text("secret.md\n")
    (workdir / "docs" / "secret.md").write_text("do not index this secret")
    _build(workdir, name="gitidx")
    capsys.readouterr()
    rc = main(["search", "secret", "-i", "gitidx", "--format", "json",
               "--no-expand"])
    assert rc == 0
    data = json.loads(capsys.readouterr().out)
    assert all("secret.md" not in r["id"] for r in data)


def test_resume_interrupted_build(workdir, capsys):
    """Kill a build mid-stream (simulated via checkpoint), resume, and the
    final index must be complete and searchable."""
    import numpy as np
    from leann_tpu.embed import EmbeddingProvider
    from leann_tpu.index.builder import StreamingIndexBuilder, ckpt_path
    from leann_tpu.store.passages import Passage

    base = str(workdir / ".leann" / "indexes" / "resum" / "documents.leann")
    provider = EmbeddingProvider(mode="fake", dimensions=16)
    texts = [f"chunk number {i}" for i in range(20)]

    # phase 1: ingest half, checkpoint, then "crash" (add garbage rows
    # after the checkpoint that must be truncated away on resume)
    b1 = StreamingIndexBuilder(base, dim=16)
    for i in range(10):
        b1.add_passage(Passage(f"c{i}", texts[i]), provider.embed([texts[i]])[0])
    b1.checkpoint(files_done=0)
    b1.add_passage(Passage("garbage", "partial"), provider.embed(["partial"])[0])
    b1._passages._f.flush()
    b1._embeddings._f.flush()
    # simulate process death: no finish(), no meta
    assert os.path.exists(ckpt_path(base))

    # phase 2: resume and ingest the rest
    b2 = StreamingIndexBuilder(base, dim=16, resume=True)
    assert len(b2) == 10  # garbage row truncated
    assert not b2.has_id("garbage")
    for i in range(10, 20):
        b2.add_passage(Passage(f"c{i}", texts[i]), provider.embed([texts[i]])[0])
    meta = b2.build()
    assert meta.passage_count == 20
    assert not os.path.exists(ckpt_path(base))

    from leann_tpu.index.searcher import IndexSearcher, SearchOptions

    s = IndexSearcher.load(base)
    res = s.search(provider.embed([texts[3]]), SearchOptions(top_k=1))[0]
    assert res[0].id == "c3"
    res = s.search(provider.embed([texts[17]]), SearchOptions(top_k=1))[0]
    assert res[0].id == "c17"


def test_metrics_endpoint_and_spans(workdir):
    import threading
    import urllib.request

    from leann_tpu.cli.common import provider_from_meta
    from leann_tpu.embed import EmbeddingProvider
    from leann_tpu.index.builder import IndexBuilder
    from leann_tpu.index.searcher import IndexSearcher, SearchOptions
    from leann_tpu.server.http import ServerState, serve
    from leann_tpu.utils import METRICS

    METRICS.reset()
    base = str(workdir / ".leann" / "indexes" / "m" / "documents.leann")
    provider = EmbeddingProvider(mode="fake", dimensions=16)
    b = IndexBuilder(base, dim=16)
    for i in range(5):
        b.add(f"x{i}", f"text {i}", provider.embed([f"text {i}"])[0])
    b.build()
    searcher = IndexSearcher.load(base)
    searcher.search(provider.embed(["text 1"]), SearchOptions(top_k=2))

    snap = METRICS.snapshot()
    assert snap["search.requests"]["value"] == 1
    assert "span.search.ann.seconds" in snap

    server = serve(ServerState(searcher, provider, None, "m"), port=0)
    t = threading.Thread(target=server.serve_forever, daemon=True)
    t.start()
    try:
        url = f"http://127.0.0.1:{server.server_address[1]}/metrics"
        with urllib.request.urlopen(url, timeout=10) as r:
            body = r.read().decode()
        assert "search_requests" in body
        assert "span_search_ann_seconds" in body
    finally:
        server.shutdown()


def test_config_file_provider_precedence(workdir, capsys):
    """CLI default embedding-mode 'openai' yields to the config file's
    provider (reference build.rs:160-172)."""
    import pathlib

    cfg_dir = pathlib.Path(os.environ["XDG_CONFIG_HOME"]) / "leann"
    cfg_dir.mkdir(parents=True, exist_ok=True)
    (cfg_dir / "config.toml").write_text(
        '[embedding]\nprovider = "fake"\nmodel = "fake"\n'
    )
    rc = main(["build", "cfgidx", "--docs", "docs",
               "--embedding-dimensions", "16"])  # no --embedding-mode
    assert rc == 0
    out = capsys.readouterr().out
    assert "fake/fake" in out


def test_update_ivf_backend(workdir, capsys):
    _build(workdir, name="ividx", extra=["--backend-name", "ivf"])
    (workdir / "docs" / "late.md").write_text(
        "A very late addition mentioning quasars and pulsars."
    )
    assert main(["update", "ividx", "--docs", "docs"]) == 0
    capsys.readouterr()
    rc = main(["search", "A very late addition mentioning quasars and pulsars.",
               "-i", "ividx", "--format", "json", "--top-k", "1",
               "--no-expand"])
    assert rc == 0
    data = json.loads(capsys.readouterr().out)
    assert "late.md" in data[0]["id"]


def test_search_sharded_over_device_mesh(workdir, capsys):
    """--sharded serves exact search over the 8-device virtual mesh."""
    _build(workdir)
    capsys.readouterr()
    rc = main(["search", 'Tensor processing units accelerate matrix multiplication on the MXU.',
               "-i", "testidx", "--format", "json", "--top-k", "1",
               "--no-expand", "--sharded"])
    assert rc == 0
    data = json.loads(capsys.readouterr().out)
    assert "hardware.md" in data[0]["id"]


def test_reindex_switches_backend_without_reembedding(workdir, capsys):
    _build(workdir)  # flat
    capsys.readouterr()
    # switch to ivf
    assert main(["reindex", "testidx", "--backend-name", "ivf"]) == 0
    out = capsys.readouterr().out
    assert "backend=ivf" in out
    rc = main(["search", 'The quick brown fox jumps over the lazy dog. Foxes live in forests.',
               "-i", "testidx", "--format", "json", "--top-k", "1",
               "--no-expand"])
    assert rc == 0
    data = json.loads(capsys.readouterr().out)
    assert "animals.md" in data[0]["id"]
    # and to vamana
    assert main(["reindex", "testidx", "--backend-name", "vamana",
                 "--graph-degree", "4", "--complexity", "8"]) == 0
    capsys.readouterr()
    rc = main(["search", 'Tensor processing units accelerate matrix multiplication on the MXU.',
               "-i", "testidx", "--format", "json", "--top-k", "1",
               "--no-expand"])
    assert rc == 0
    data = json.loads(capsys.readouterr().out)
    assert "hardware.md" in data[0]["id"]


def test_reindex_refuses_pruned(workdir, capsys):
    _build(workdir)
    assert main(["prune", "testidx", "-y"]) == 0
    capsys.readouterr()
    assert main(["reindex", "testidx", "--backend-name", "ivf"]) == 1
    assert "pruned" in capsys.readouterr().err


def test_update_vamana_remaps_stale_sentinels(workdir, capsys):
    """Growing a vamana index must not turn the old sentinel pads
    (value == old_n) into real edges to the first newly added node
    (ADVICE r1: 66 pads became 40 edges on a 30+5 update)."""
    import numpy as np

    from leann_tpu.store.graphfile import GraphFile, graph_path
    from leann_tpu.store.locate import find_index, index_base
    from leann_tpu.store.passages import read_ids

    _build(workdir, name="vamidx",
           extra=["--backend-name", "vamana", "--graph-degree", "16"])
    base = index_base(find_index("vamidx"))
    old_n = len(read_ids(base))
    (workdir / "docs" / "extra.md").write_text(
        "Completely new content about distributed beam search engines."
    )
    capsys.readouterr()
    assert main(["update", "vamidx", "--docs", "docs"]) == 0
    adj = GraphFile.load(graph_path(base)).adjacency
    n_total = adj.shape[0]
    assert n_total > old_n
    # edges into node old_n from the OLD rows can only be genuine
    # (reverse-edge) links, never a whole row of recycled pads
    hits = int((np.asarray(adj[:old_n]) == old_n).sum())
    assert hits <= adj.shape[1], (
        f"{hits} edges to node {old_n}: stale sentinel pads leaked"
    )


def test_build_persists_reference_template_keys(workdir, capsys):
    """A custom --embedding-prompt-template is stored under the
    reference's embedding_options keys (build.rs:344-352), and
    re-embedding paths honor it."""
    from leann_tpu.cli.common import (
        provider_from_meta,
        resolve_build_template,
    )
    from leann_tpu.store.locate import find_index, index_base
    from leann_tpu.store.meta import IndexMeta, meta_path

    _build(workdir, name="tplidx",
           extra=["--embedding-prompt-template", "DOC: "])
    meta = IndexMeta.load(meta_path(index_base(find_index("tplidx"))))
    opts = meta.embedding_options or {}
    assert opts.get("build_prompt_template") == "DOC: "
    assert "query_prompt_template" in opts
    assert "prompt_template" not in opts
    provider = provider_from_meta(meta)
    assert resolve_build_template(meta, provider) == "DOC: "
