"""Evaluation harness for the BASELINE.json config matrix.

The reference publishes no benchmark numbers (BASELINE.md), so this
harness *is* the measurement apparatus: recall@10 vs the exact oracle,
steady-state QPS, build wall-clock, and index memory, per config:

  0  text-corpus 768d   flat + ivf recall/QPS          (CPU-parity check)
  1  SIFT-like 128d L2  vamana beams 16-128 + ivf      (headline)
  2  DEEP-like 96d      vamana R=48, HBM-sharded mesh  (scale config)
  3  pruned mode        on-TPU re-embed traversal, memory vs recall
  4  hybrid pipeline    vector + BM25 fusion + filters, p50/p99 latency

Usage:
  python evals/run_eval.py --configs 0 1 --scale 0.1
  (scale multiplies corpus sizes; use small scales on CPU)

Each config prints one JSON line; a summary table goes to stderr.
"""

from __future__ import annotations

import argparse
import json
import os
import sys
import time

import numpy as np

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))


def log(msg):
    print(msg, file=sys.stderr, flush=True)


def clustered(rng, n, d, n_clusters=1024, spread=4.0):
    centers = rng.standard_normal((n_clusters, d)).astype(np.float32) * spread
    assign = rng.integers(0, n_clusters, n)
    return (centers[assign] + rng.standard_normal((n, d)).astype(np.float32)).astype(np.float32)


def recall_at(idx, oracle, k):
    return float(np.mean([
        len(set(a[:k].tolist()) & set(b[:k].tolist())) / k
        for a, b in zip(idx, oracle)
    ]))


def measure_qps(search_fn, queries, reps=5):
    search_fn(queries)  # warmup / compile
    t0 = time.time()
    for _ in range(reps):
        search_fn(queries)
    return reps * len(queries) / (time.time() - t0)


def emit(config, **fields):
    print(json.dumps({"config": config, **fields}), flush=True)


def config0(scale, rng):
    """768-d text-corpus style: flat (oracle) + ivf."""
    from leann_tpu.ops.distance import exact_topk
    from leann_tpu.ops.ivf import IvfEngine

    n = max(2000, int(20_000 * scale))
    d = 768
    pool = clustered(rng, n + 512, d, n_clusters=max(64, n // 40))
    x, q = pool[:n], pool[n:]
    t0 = time.time()
    eng = IvfEngine(x, metric="cosine")
    build_s = time.time() - t0
    _, oracle = exact_topk(q, x, 10, metric="cosine")
    idx, _ = eng.search(q, k=10, nprobe=16)
    rec = recall_at(idx, oracle, 10)
    qps = measure_qps(lambda qq: eng.search(qq, k=10, nprobe=16), q)
    emit(0, n=n, d=d, backend="ivf", recall10=round(rec, 4),
         qps=round(qps, 1), build_s=round(build_s, 1),
         index_mb=round(x.nbytes / 2**20, 1))

    # graph engine at 768-d — the apples-to-apples row vs the reference
    # default (HNSW M=32 efC=64, src/cli/build.rs:77-83)
    from leann_tpu.backend import GraphSearcher
    from leann_tpu.ops.vamana import build_vamana
    from leann_tpu.store.graphfile import GraphFile

    xn = x / (np.linalg.norm(x, axis=1, keepdims=True) + 1e-12)
    qn = q / (np.linalg.norm(q, axis=1, keepdims=True) + 1e-12)
    t0 = time.time()
    adjacency, medoid = build_vamana(
        xn, graph_degree=32, complexity=64, metric="ip",
        wave_size=min(8192, max(256, n // 8)),
    )
    g_build = time.time() - t0
    gs = GraphSearcher(xn, GraphFile(adjacency, medoid), metric="ip")
    idx, _ = gs.search(qn, k=10, complexity=64)
    rec = recall_at(idx, oracle, 10)
    qps = measure_qps(lambda qq: gs.search(qq, k=10, complexity=64), qn)
    emit(0, n=n, d=d, backend="vamana", beam=64, recall10=round(rec, 4),
         qps=round(qps, 1), build_s=round(g_build, 1),
         index_mb=round((x.nbytes + adjacency.nbytes) / 2**20, 1))


def config1(scale, rng):
    """SIFT-style 128-d L2: vamana beam sweep + ivf."""
    from leann_tpu.ops.beam import BeamSearchEngine
    from leann_tpu.ops.distance import exact_topk
    from leann_tpu.ops.ivf import IvfEngine
    from leann_tpu.ops.vamana import build_vamana

    n = max(5000, int(1_000_000 * scale))
    d = 128
    pool = clustered(rng, n + 1024, d)
    x, q = pool[:n], pool[n:]
    _, oracle = exact_topk(q, x, 10, metric="l2")

    t0 = time.time()
    adjacency, medoid = build_vamana(
        x, graph_degree=32, complexity=64, metric="l2",
        wave_size=min(8192, max(256, n // 8)),
    )
    vamana_build = time.time() - t0
    engine = BeamSearchEngine(x, adjacency, medoid, metric="l2", expansions=2)
    for beam in (16, 32, 64, 128):
        idx, _ = engine.search(q, k=10, beam_width=beam)
        rec = recall_at(idx, oracle, 10)
        qps = measure_qps(lambda qq, b=beam: engine.search(qq, k=10, beam_width=b), q)
        emit(1, n=n, d=d, backend="vamana", beam=beam,
             recall10=round(rec, 4), qps=round(qps, 1),
             build_s=round(vamana_build, 1),
             index_mb=round((x.nbytes + adjacency.nbytes) / 2**20, 1))

    t0 = time.time()
    ivf = IvfEngine(x, metric="l2")
    ivf_build = time.time() - t0
    for nprobe in (8, 32):
        idx, _ = ivf.search(q, k=10, nprobe=nprobe)
        rec = recall_at(idx, oracle, 10)
        qps = measure_qps(lambda qq, p=nprobe: ivf.search(qq, k=10, nprobe=p), q)
        emit(1, n=n, d=d, backend="ivf", nprobe=nprobe,
             recall10=round(rec, 4), qps=round(qps, 1),
             build_s=round(ivf_build, 1))


def config2(scale, rng):
    """DEEP-style 96-d, R=48, sharded across the device mesh."""
    import jax

    from leann_tpu.ops.distance import exact_topk
    from leann_tpu.parallel import ShardedGraphIndex, make_mesh

    n = max(4000, int(10_000_000 * scale))
    d = 96
    n_dev = len(jax.devices())
    mesh = make_mesh((1, n_dev))
    pool = clustered(rng, n + 256, d)
    x, q = pool[:n], pool[n:]
    t0 = time.time()
    index = ShardedGraphIndex(
        x, mesh, metric="l2", graph_degree=48, complexity=64,
        build_wave_size=min(4096, max(256, n // (8 * n_dev))),
    )
    build_s = time.time() - t0
    _, oracle = exact_topk(q, x, 10, metric="l2")
    idx, _ = index.search(q, k=10, beam_width=48)
    rec = recall_at(idx, oracle, 10)
    qps = measure_qps(lambda qq: index.search(qq, k=10, beam_width=48), q)
    emit(2, n=n, d=d, backend="sharded-vamana", shards=n_dev, R=48,
         recall10=round(rec, 4), qps=round(qps, 1), build_s=round(build_s, 1))


def config3(scale, rng):
    """LEANN pruned mode: tokens-only index, on-TPU re-embed traversal."""
    from leann_tpu.models.bert import BertConfig, BertEncoder
    from leann_tpu.ops.beam import BeamSearchEngine, RecomputeBeamEngine
    from leann_tpu.ops.distance import exact_topk
    from leann_tpu.ops.vamana import build_vamana

    n = max(1000, int(1_000_000 * scale / 10))  # encoder-bound: keep smaller
    enc = BertEncoder(config=BertConfig.tiny())
    texts = [f"passage {i} about subject {i % 101} and topic {i % 37}"
             for i in range(n)]
    vectors = enc.embed(texts)
    tok, mask = enc.tokenize_corpus(texts, max_length=32)
    adjacency, medoid = build_vamana(
        vectors, graph_degree=16, complexity=32, metric="ip",
        wave_size=min(2048, max(128, n // 8)),
    )
    q_ids = rng.integers(0, n, 64)
    queries = vectors[q_ids]
    _, oracle = exact_topk(queries, vectors, 10, metric="ip")

    fused = RecomputeBeamEngine(tok, mask, adjacency, medoid, enc, metric="ip")
    t0 = time.time()
    idx, _ = fused.search(queries, k=10, beam_width=32)
    fused_latency = time.time() - t0
    rec = recall_at(idx, oracle, 10)
    stored_mb = vectors.nbytes / 2**20
    # pruned artifact = token matrix + per-row lengths + adjacency
    pruned_mb = (tok.nbytes + 4 * n + adjacency.nbytes) / 2**20
    emit(3, n=n, backend="pruned-recompute", recall10=round(rec, 4),
         stored_index_mb=round(stored_mb, 2),
         pruned_index_mb=round(pruned_mb, 2),
         memory_ratio=round(pruned_mb / stored_mb, 3),
         batch_latency_s=round(fused_latency, 2))


def config4(scale, rng):
    """Hybrid pipeline p50/p99 end-to-end latency."""
    from leann_tpu.embed import EmbeddingProvider
    from leann_tpu.index.builder import IndexBuilder
    from leann_tpu.index.filter import MetadataFilter
    from leann_tpu.index.searcher import IndexSearcher, SearchOptions
    import tempfile

    n = max(2000, int(1_000_000 * scale / 10))
    provider = EmbeddingProvider(mode="fake", dimensions=128)
    words = ["alpha", "beta", "gamma", "delta", "engine", "vector", "tensor",
             "graph", "index", "query", "search", "recall"]
    texts = [
        f"passage {i} " + " ".join(
            words[(i + j) % len(words)] for j in range(8)
        )
        for i in range(n)
    ]
    base = os.path.join(tempfile.mkdtemp(), "documents.leann")
    b = IndexBuilder(base, dim=128, backend="ivf")
    CHUNK = 2048
    for start in range(0, n, CHUNK):
        batch = texts[start : start + CHUNK]
        vecs = provider.embed(batch)
        for j, (t, v) in enumerate(zip(batch, vecs)):
            b.add(f"p{start + j}", t, v, {"mod": (start + j) % 5})
    b.build()
    s = IndexSearcher.load(base)
    filt = MetadataFilter.parse("mod<3")
    # warmup: exclude compile time from the latency distribution
    s.search(provider.embed([texts[0]]), SearchOptions(
        top_k=10, hybrid=True, query_text=texts[0], filter=filt,
    ))
    # p99 needs a real tail: >=1k samples (p99 of 60 samples is just the
    # max — a single outlier, not a percentile)
    n_samples = int(os.environ.get("EVAL_LAT_SAMPLES", 1000))
    lat = []
    for i in range(n_samples):
        qtext = texts[rng.integers(0, n)]
        qv = provider.embed([qtext])
        t0 = time.time()
        s.search(qv, SearchOptions(
            top_k=10, hybrid=True, query_text=qtext, filter=filt,
        ))
        lat.append(time.time() - t0)
    lat = np.asarray(lat)
    emit(4, n=n, backend="ivf+hybrid+filter", samples=n_samples,
         p50_ms=round(1000 * float(np.percentile(lat, 50)), 1),
         p99_ms=round(1000 * float(np.percentile(lat, 99)), 1))


CONFIGS = {0: config0, 1: config1, 2: config2, 3: config3, 4: config4}


def main():
    ap = argparse.ArgumentParser()
    ap.add_argument("--configs", nargs="+", type=int, default=[0, 1, 2, 3, 4])
    ap.add_argument("--scale", type=float, default=0.1,
                    help="corpus-size multiplier vs the full BASELINE configs")
    ap.add_argument("--seed", type=int, default=0)
    args = ap.parse_args()
    rng = np.random.default_rng(args.seed)
    for c in args.configs:
        log(f"=== config {c} (scale {args.scale}) ===")
        t0 = time.time()
        CONFIGS[c](args.scale, rng)
        log(f"=== config {c} done in {time.time() - t0:.1f}s ===")


if __name__ == "__main__":
    main()
