"""HTTP API + MCP server tests: real socket / real JSON-RPC framing."""

import io
import json
import threading
import urllib.request

import pytest

from leann_tpu.cli.common import resolve_query_template
from leann_tpu.embed import EmbeddingProvider
from leann_tpu.index.builder import IndexBuilder
from leann_tpu.index.searcher import IndexSearcher
from leann_tpu.server.http import ServerState, serve
from leann_tpu.server.mcp import McpServer


@pytest.fixture()
def http_server(tmp_index_base):
    provider = EmbeddingProvider(mode="fake", dimensions=16)
    texts = [
        "the quick brown fox",
        "tensor processing units and the MXU",
        "bm25 ranking function",
    ]
    builder = IndexBuilder(tmp_index_base, dim=16)
    for i, (t, v) in enumerate(zip(texts, provider.embed(texts))):
        builder.add(f"t{i}", t, v, {"n": i})
    builder.build()
    searcher = IndexSearcher.load(tmp_index_base)
    state = ServerState(searcher, provider, None, "testidx")
    server = serve(state, host="127.0.0.1", port=0)
    thread = threading.Thread(target=server.serve_forever, daemon=True)
    thread.start()
    yield f"http://127.0.0.1:{server.server_address[1]}"
    server.shutdown()


def _get(url):
    with urllib.request.urlopen(url, timeout=10) as r:
        return r.status, json.loads(r.read())


def _post(url, payload):
    req = urllib.request.Request(
        url, data=json.dumps(payload).encode(), method="POST",
        headers={"Content-Type": "application/json"},
    )
    try:
        with urllib.request.urlopen(req, timeout=10) as r:
            return r.status, json.loads(r.read())
    except urllib.error.HTTPError as e:
        return e.code, json.loads(e.read())


def test_health(http_server):
    status, body = _get(http_server + "/health")
    assert status == 200 and body["status"] == "ok"


def test_root_and_info(http_server):
    status, body = _get(http_server + "/")
    assert status == 200 and body["service"] == "leann-tpu"
    status, body = _get(http_server + "/info")
    assert status == 200
    assert body["passage_count"] == 3
    assert body["dimensions"] == 16


def test_search_endpoint(http_server):
    status, body = _post(
        http_server + "/search",
        {"query": "tensor processing units and the MXU", "top_k": 2},
    )
    assert status == 200
    assert body["results"][0]["id"] == "t1"
    assert "took_ms" in body


def test_search_with_filter(http_server):
    status, body = _post(
        http_server + "/search",
        {"query": "anything", "top_k": 3, "filter": "n>=2"},
    )
    assert status == 200
    assert all(r["metadata"]["n"] >= 2 for r in body["results"])


def test_search_missing_query_400(http_server):
    status, body = _post(http_server + "/search", {"top_k": 2})
    assert status == 400
    assert "query" in body["error"]


def test_search_invalid_json_400(http_server):
    import urllib.error

    req = urllib.request.Request(
        http_server + "/search", data=b"{not json", method="POST",
        headers={"Content-Type": "application/json"},
    )
    try:
        with urllib.request.urlopen(req, timeout=10) as r:
            status = r.status
    except urllib.error.HTTPError as e:
        status = e.code
    assert status == 400


def test_unknown_route_404(http_server):
    import urllib.error

    try:
        urllib.request.urlopen(http_server + "/nope", timeout=10)
        status = 200
    except urllib.error.HTTPError as e:
        status = e.code
    assert status == 404


# ---------------- MCP ----------------


def _mcp_roundtrip(tmp_index_base, messages, monkeypatch=None, cwd=None):
    server = McpServer(default_index=None)
    stdin = io.StringIO("\n".join(json.dumps(m) for m in messages) + "\n")
    stdout = io.StringIO()
    server.run_stdio(stdin=stdin, stdout=stdout)
    return [json.loads(line) for line in stdout.getvalue().splitlines()]


def test_mcp_initialize_and_tools_list(tmp_path, monkeypatch):
    monkeypatch.chdir(tmp_path)
    responses = _mcp_roundtrip(None, [
        {"jsonrpc": "2.0", "id": 1, "method": "initialize", "params": {}},
        {"jsonrpc": "2.0", "method": "notifications/initialized"},
        {"jsonrpc": "2.0", "id": 2, "method": "tools/list"},
        {"jsonrpc": "2.0", "id": 3, "method": "ping"},
    ])
    assert responses[0]["result"]["serverInfo"]["name"] == "leann-tpu"
    tools = {t["name"] for t in responses[1]["result"]["tools"]}
    assert tools == {"search", "list_indexes"}
    assert responses[2]["result"] == {}


def test_mcp_search_tool(tmp_path, monkeypatch):
    # build an index in a temp cwd so the MCP server can find it by name
    monkeypatch.chdir(tmp_path)
    provider = EmbeddingProvider(mode="fake", dimensions=16)
    base = str(tmp_path / ".leann" / "indexes" / "mcpidx" / "documents.leann")
    builder = IndexBuilder(base, dim=16)
    texts = ["alpha document about foxes", "beta document about TPUs"]
    for i, (t, v) in enumerate(zip(texts, provider.embed(texts))):
        builder.add(f"m{i}", t, v)
    builder.build()

    responses = _mcp_roundtrip(None, [
        {"jsonrpc": "2.0", "id": 1, "method": "initialize", "params": {}},
        {"jsonrpc": "2.0", "id": 2, "method": "tools/call", "params": {
            "name": "search",
            "arguments": {"query": "beta document about TPUs",
                          "index": "mcpidx", "top_k": 1},
        }},
        {"jsonrpc": "2.0", "id": 3, "method": "tools/call", "params": {
            "name": "list_indexes", "arguments": {}}},
    ])
    search_resp = responses[1]["result"]
    assert not search_resp["isError"]
    assert "m1" in search_resp["content"][0]["text"]
    assert "mcpidx" in responses[2]["result"]["content"][0]["text"]


def test_mcp_unknown_tool_and_method(tmp_path, monkeypatch):
    monkeypatch.chdir(tmp_path)
    responses = _mcp_roundtrip(None, [
        {"jsonrpc": "2.0", "id": 1, "method": "tools/call",
         "params": {"name": "bogus", "arguments": {}}},
        {"jsonrpc": "2.0", "id": 2, "method": "wat/ever"},
    ])
    assert responses[0]["error"]["code"] == -32602
    assert responses[1]["error"]["code"] == -32601


def test_serve_pruned_index_via_recompute(tmp_path, monkeypatch):
    """The HTTP server must serve a pruned index through the recompute
    adapter instead of crashing on the missing embeddings file."""
    import threading

    from leann_tpu.cli.serve_cmd import _PrunedAdapter
    from leann_tpu.index.builder import IndexBuilder
    from leann_tpu.store.embeddings import prune_embeddings
    from leann_tpu.store.meta import IndexMeta, meta_path

    base = str(tmp_path / "p" / "documents.leann")
    provider = EmbeddingProvider(mode="fake", dimensions=16)
    texts = ["alpha fox", "beta tpu", "gamma bm25"]
    b = IndexBuilder(base, dim=16)
    for i, (t, v) in enumerate(zip(texts, provider.embed(texts))):
        b.add(f"t{i}", t, v)
    meta = b.build()
    prune_embeddings(base)
    meta.is_pruned = True
    meta.save(meta_path(base))

    adapter = _PrunedAdapter(base, provider, meta)
    state = ServerState(adapter, provider, None, "p")
    server = serve(state, port=0)
    t = threading.Thread(target=server.serve_forever, daemon=True)
    t.start()
    try:
        url = f"http://127.0.0.1:{server.server_address[1]}"
        status, body = _post(url + "/search", {"query": "beta tpu", "top_k": 1})
        assert status == 200
        assert body["results"][0]["id"] == "t1"
    finally:
        server.shutdown()
