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
