"""Embedding/LLM HTTP providers against a local mock server: request
shapes, batching, retry-with-backoff, and error-body extraction."""

import json
import threading
from http.server import BaseHTTPRequestHandler, ThreadingHTTPServer

import numpy as np
import pytest

from leann_tpu.embed.httpx import HttpError, post_json
from leann_tpu.embed.ollama import OllamaEmbedding
from leann_tpu.embed.openai import OpenAIEmbedding
from leann_tpu.llm.ollama import OllamaLlm
from leann_tpu.llm.openai import OpenAILlm


class MockApi(BaseHTTPRequestHandler):
    calls = []
    fail_next = 0
    fail_code = 503

    def log_message(self, *a):
        pass

    def do_POST(self):
        length = int(self.headers.get("Content-Length", 0))
        body = json.loads(self.rfile.read(length) or b"{}")
        MockApi.calls.append((self.path, body))
        if MockApi.fail_next > 0:
            MockApi.fail_next -= 1
            payload = json.dumps(
                {"error": {"message": "temporarily overloaded"}}
            ).encode()
            self.send_response(MockApi.fail_code)
            self.send_header("Content-Length", str(len(payload)))
            self.end_headers()
            self.wfile.write(payload)
            return
        if self.path == "/v1/embeddings":
            texts = body["input"]
            resp = {"data": [
                {"index": i, "embedding": [float(len(t)), 1.0, 2.0]}
                for i, t in enumerate(texts)
            ]}
        elif self.path == "/api/embed":
            resp = {"embeddings": [[1.0, 2.0] for _ in body["input"]]}
        elif self.path == "/v1/chat/completions":
            resp = {"choices": [{"message": {
                "content": f"echo: {body['messages'][0]['content'][:20]}"
            }}]}
        elif self.path == "/api/generate":
            resp = {"response": f"gen: {body['prompt'][:10]}", "done": True}
        elif ":batchEmbedContents" in self.path:
            reqs = body["requests"]
            resp = {"embeddings": [
                {"values": [float(len(r["content"]["parts"][0]["text"])),
                            3.0, 4.0]}
                for r in reqs
            ]}
        else:
            self.send_response(404)
            self.end_headers()
            return
        payload = json.dumps(resp).encode()
        self.send_response(200)
        self.send_header("Content-Type", "application/json")
        self.send_header("Content-Length", str(len(payload)))
        self.end_headers()
        self.wfile.write(payload)


@pytest.fixture()
def mock_api():
    MockApi.calls = []
    MockApi.fail_next = 0
    server = ThreadingHTTPServer(("127.0.0.1", 0), MockApi)
    t = threading.Thread(target=server.serve_forever, daemon=True)
    t.start()
    yield f"http://127.0.0.1:{server.server_address[1]}"
    server.shutdown()


def test_openai_embedding_batches_of_100(mock_api):
    provider = OpenAIEmbedding(
        model="text-embedding-3-small", api_key="k", base_url=mock_api + "/v1"
    )
    texts = [f"t{i}" for i in range(250)]
    out = provider.embed(texts)
    assert out.shape == (250, 3)
    embed_calls = [c for c in MockApi.calls if c[0] == "/v1/embeddings"]
    assert [len(c[1]["input"]) for c in embed_calls] == [100, 100, 50]


def test_openai_dim_probe_for_unknown_model(mock_api):
    provider = OpenAIEmbedding(
        model="custom-model", api_key="k", base_url=mock_api + "/v1"
    )
    assert provider.dimensions == 3  # probed via one embed call


def test_ollama_embedding_batches_of_32(mock_api):
    provider = OllamaEmbedding(model="nomic-embed-text", host=mock_api)
    out = provider.embed([f"x{i}" for i in range(70)])
    assert out.shape == (70, 2)
    calls = [c for c in MockApi.calls if c[0] == "/api/embed"]
    assert [len(c[1]["input"]) for c in calls] == [32, 32, 6]


def test_retry_on_503_then_success(mock_api):
    MockApi.fail_next = 2
    resp = post_json(mock_api + "/v1/chat/completions",
                     {"messages": [{"role": "user", "content": "hello"}]})
    assert "echo" in resp["choices"][0]["message"]["content"]
    assert len(MockApi.calls) == 3  # 2 failures + 1 success


def test_no_retry_on_400_and_error_extraction(mock_api):
    MockApi.fail_next = 1
    MockApi.fail_code = 400
    try:
        with pytest.raises(HttpError) as exc:
            post_json(mock_api + "/v1/chat/completions", {"messages": []})
        assert "temporarily overloaded" in str(exc.value)
        assert len(MockApi.calls) == 1  # no retry on client errors
    finally:
        MockApi.fail_code = 503


def test_openai_llm(mock_api):
    llm = OpenAILlm(model="gpt-x", api_key="k", base_url=mock_api + "/v1")
    assert llm.generate("what is up").startswith("echo:")


def test_ollama_llm_parses_single_json(mock_api):
    llm = OllamaLlm(model="m", host=mock_api)
    assert llm.generate("hello world").startswith("gen:")


def test_lmstudio_mode_routes_to_openai_compatible(mock_api):
    from leann_tpu.embed import EmbeddingProvider

    p = EmbeddingProvider(mode="lmstudio", model="text-embedding-3-small",
                          base_url=mock_api + "/v1", api_key="k")
    assert p.mode == "openai"
    out = p.embed(["ab"])
    assert out.shape == (1, 3)


def test_gemini_embedding_batches_of_100(mock_api):
    from leann_tpu.embed.gemini import GeminiEmbedding

    provider = GeminiEmbedding(model="text-embedding-004", api_key="gk",
                               base_url=mock_api + "/v1beta")
    texts = [f"t{i:03d}" for i in range(150)]
    vecs = provider.embed(texts)
    assert vecs.shape == (150, 3)
    # batch split: 100 + 50, routed to :batchEmbedContents with key in URL
    gemini_calls = [c for c in MockApi.calls if ":batchEmbedContents" in c[0]]
    assert [len(c[1]["requests"]) for c in gemini_calls] == [100, 50]
    assert all("key=gk" in c[0] for c in gemini_calls)
    # model name gets the models/ prefix (reference gemini.rs behavior)
    assert all("/models/text-embedding-004:" in c[0] for c in gemini_calls)
    # dimension updates from the live response
    assert provider.dimensions == 3
    # per-text payload shape round-trips (first value = len(text))
    assert vecs[0][0] == 4.0


def test_gemini_env_key_resolution(mock_api, monkeypatch):
    from leann_tpu.embed.gemini import GeminiEmbedding

    monkeypatch.delenv("GOOGLE_API_KEY", raising=False)
    monkeypatch.setenv("GEMINI_API_KEY", "envkey")
    provider = GeminiEmbedding(base_url=mock_api + "/v1beta")
    provider.embed(["hello"])
    call = [c for c in MockApi.calls if ":batchEmbedContents" in c[0]][-1]
    assert "key=envkey" in call[0]
