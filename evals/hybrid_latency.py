"""BASELINE config 4: hybrid (vector + BM25 alpha fusion + metadata
filter) end-to-end p50/p99 latency on 1M chunks, measured through the
real HTTP server and micro-batcher (VERDICT r3 weak #4: only a 10k row
from round 1 existed, predating the batcher).

What is measured: wall-clock per request at the client, across
concurrent clients firing a production-shaped mix (60% plain vector /
30% hybrid / 10% hybrid+filter), for each batcher window setting — the
window sensitivity table VERDICT asked for. The server is the shipping
`leann_tpu.server.http` stack (ThreadingHTTPServer + MicroBatcher +
IndexSearcher), the reference shape being serve.rs's axum handler
(`/root/reference/src/cli/serve.rs:260-311`, one embed + one search per
request, no coalescing).

The 1M-chunk corpus is synthetic text with a zipf word distribution
(realistic BM25 df/tf spread), embedded by the deterministic fake
embedder — embedding cost is NOT the object here; vector-search +
BM25 + fusion + HTTP + batching is.

Usage:
  python evals/hybrid_latency.py --n 1000000 --clients 32 \
      --windows 0,2,8 --duration 20
"""

from __future__ import annotations

import argparse
import json
import os
import sys
import threading
import time

import numpy as np

ADIR = os.path.join(os.path.dirname(os.path.abspath(__file__)), "artifacts")


def log(msg):
    print(msg, file=sys.stderr, flush=True)


def make_texts(n: int, seed: int = 0):
    """Zipf-distributed word soup: ~20k vocab, 8-20 words per chunk."""
    rng = np.random.default_rng(seed)
    vocab_n = 20000
    vocab = np.array([f"w{i:05d}" for i in range(vocab_n)])
    # zipf ranks: p(r) ~ 1/(r+10)
    p = 1.0 / (np.arange(vocab_n) + 10.0)
    p /= p.sum()
    lens = rng.integers(8, 21, n)
    total = int(lens.sum())
    words = vocab[rng.choice(vocab_n, total, p=p)]
    texts = []
    pos = 0
    for ln in lens:
        texts.append(" ".join(words[pos : pos + ln]))
        pos += ln
    return texts


def build_index(base: str, n: int, d: int) -> None:
    from leann_tpu.embed.fake import FakeEmbedding
    from leann_tpu.index.builder import StreamingIndexBuilder
    from leann_tpu.store.passages import Passage

    t0 = time.time()
    texts = make_texts(n)
    log(f"texts generated in {time.time()-t0:.0f}s")
    fake = FakeEmbedding(dimensions=d)
    builder = StreamingIndexBuilder(
        base, dim=d, backend="flat", metric="ip",
        embedding_model="fake", embedding_mode="fake",
    )
    t0 = time.time()
    exts = ["py", "md", "rs", "txt"]
    batch = 8192
    for s in range(0, n, batch):
        chunk = texts[s : s + batch]
        embs = fake.embed(chunk)
        for j, (t, e) in enumerate(zip(chunk, embs)):
            i = s + j
            builder.add_passage(
                Passage(
                    id=f"c{i}",
                    text=t,
                    metadata={"source": f"src/m{i % 997}.{exts[i % 4]}"},
                ),
                e,
            )
        if s % (batch * 16) == 0:
            log(f"  embedded {s}/{n} ({time.time()-t0:.0f}s)")
    builder.build()
    log(f"index built in {time.time()-t0:.0f}s")


def percentile_row(lat_ms, name, window_ms, clients, extra=None):
    a = np.asarray(lat_ms)
    row = {
        "metric": "hybrid_latency",
        "mix": name,
        "window_ms": window_ms,
        "clients": clients,
        "requests": int(a.size),
        "p50_ms": round(float(np.percentile(a, 50)), 1),
        "p95_ms": round(float(np.percentile(a, 95)), 1),
        "p99_ms": round(float(np.percentile(a, 99)), 1),
        "mean_ms": round(float(a.mean()), 1),
    }
    if extra:
        row.update(extra)
    return row


def drive(port, clients, duration, seed=0):
    """Concurrent client threads; returns {mix_name: [latency_ms]}."""
    import http.client

    lats = {"plain": [], "hybrid": [], "hybrid_filter": []}
    errors = [0]
    lock = threading.Lock()
    stop = time.time() + duration
    # query terms drawn from the same zipf vocab (head + torso words)
    rng = np.random.default_rng(seed)

    def one_client(cid):
        r = np.random.default_rng(seed * 1000 + cid)
        conn = http.client.HTTPConnection("127.0.0.1", port, timeout=30)
        local = {"plain": [], "hybrid": [], "hybrid_filter": []}
        while time.time() < stop:
            nw = int(r.integers(2, 6))
            q = " ".join(f"w{int(r.integers(0, 3000)):05d}" for _ in range(nw))
            roll = r.random()
            if roll < 0.6:
                mix, body = "plain", {"query": q, "top_k": 10}
            elif roll < 0.9:
                mix, body = "hybrid", {"query": q, "top_k": 10, "hybrid": True}
            else:
                mix, body = "hybrid_filter", {
                    "query": q, "top_k": 10, "hybrid": True,
                    "filter": "source$py",
                }
            t0 = time.perf_counter()
            try:
                conn.request(
                    "POST", "/search", json.dumps(body),
                    {"Content-Type": "application/json"})
                resp = conn.getresponse()
                data = resp.read()
                if resp.status != 200:
                    raise RuntimeError(data[:200])
            except Exception as e:  # noqa: BLE001 — count and reconnect
                log(f"client {cid}: {e}")
                with lock:
                    errors[0] += 1
                conn = http.client.HTTPConnection(
                    "127.0.0.1", port, timeout=30)
                continue
            local[mix].append((time.perf_counter() - t0) * 1e3)
        with lock:
            for k in lats:
                lats[k].extend(local[k])

    threads = [
        threading.Thread(target=one_client, args=(c,), daemon=True)
        for c in range(clients)
    ]
    for t in threads:
        t.start()
    for t in threads:
        t.join()
    return lats, errors[0]


def main():
    ap = argparse.ArgumentParser()
    ap.add_argument("--n", type=int, default=1_000_000)
    ap.add_argument("--d", type=int, default=128)
    ap.add_argument("--clients", type=int, default=32)
    ap.add_argument("--duration", type=float, default=20.0)
    ap.add_argument("--windows", default="0,2,8")
    ap.add_argument("--port", type=int, default=8931)
    ap.add_argument("--build-only", action="store_true")
    args = ap.parse_args()

    os.environ.setdefault(
        "JAX_COMPILATION_CACHE_DIR",
        os.path.join(os.path.dirname(os.path.dirname(
            os.path.abspath(__file__))), ".jax_cache"),
    )
    idx_dir = os.path.join(ADIR, f"hybrid_idx_n{args.n}_d{args.d}")
    base = os.path.join(idx_dir, "documents.leann")
    if not os.path.exists(base + ".meta.json"):
        os.makedirs(idx_dir, exist_ok=True)
        build_index(base, args.n, args.d)
    if args.build_only:
        return

    from leann_tpu.embed import EmbeddingProvider
    from leann_tpu.index.searcher import IndexSearcher
    from leann_tpu.server.http import ServerState, serve

    provider = EmbeddingProvider(mode="fake", dimensions=args.d)
    searcher = IndexSearcher(base)
    # warm the engine + compile before timing
    qv = provider.embed(["w00001 w00002"])
    searcher.search(qv[0])

    for window_ms in [float(w) for w in args.windows.split(",")]:
        state = ServerState(
            searcher, provider, query_template=None,
            index_name="hybrid_bench", max_batch=64,
            batch_window_ms=window_ms,
        )
        server = serve(state, port=args.port)
        st = threading.Thread(target=server.serve_forever, daemon=True)
        st.start()
        # deterministic program-lattice warmup (every pow-2 bucket
        # compiles up front; a traffic-shaped warmup only compiles the
        # buckets it happens to hit — the 12s p95 spikes in the first
        # two retry rows were first-encounter compiles mid-measurement)
        state.warm()
        # then a short drive to warm the host path (BM25, hydrate)
        drive(args.port, clients=args.clients, duration=3.0, seed=7)
        lats, errs = drive(args.port, args.clients, args.duration)
        total = sum(len(v) for v in lats.values())
        for mix, vals in lats.items():
            if vals:
                print(json.dumps(percentile_row(
                    vals, mix, window_ms, args.clients)), flush=True)
        print(json.dumps({
            "metric": "hybrid_latency_total",
            "window_ms": window_ms,
            "clients": args.clients,
            "qps": round(total / args.duration, 1),
            "errors": errs,
            "n": args.n,
        }), flush=True)
        server.shutdown()
        st.join()
        args.port += 1


if __name__ == "__main__":
    main()
