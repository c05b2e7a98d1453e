"""Benchmark: batched graph search QPS/chip at measured recall@10.

Runs on the real TPU chip (driver invokes at end of round). SIFT-like
synthetic workload per BASELINE.json config 1: 128-d vectors, Vamana
graph (R=32, build complexity 64), batched beam search, recall@10 vs the
exact oracle. Prints ONE JSON line on stdout; progress goes to stderr.

The target from BASELINE.json: >=10k batched QPS per v5e chip
(vs_baseline = qps / 10000).
"""

from __future__ import annotations

import json
import os
import sys
import time

import numpy as np

# corpus scale: overridable for quick local runs
N = int(os.environ.get("BENCH_N", 100_000))
D = int(os.environ.get("BENCH_D", 128))
GRAPH_DEGREE = int(os.environ.get("BENCH_R", 32))
BUILD_COMPLEXITY = int(os.environ.get("BENCH_BUILD_L", 64))
SEARCH_BEAM = int(os.environ.get("BENCH_SEARCH_L", 32))
QUERY_BATCH = int(os.environ.get("BENCH_B", 2048))
RECALL_QUERIES = int(os.environ.get("BENCH_RECALL_Q", 1024))
TOPK = 10


def log(msg: str) -> None:
    print(msg, file=sys.stderr, flush=True)


def make_corpus(rng, n: int, d: int, clusters: int = 1024) -> np.ndarray:
    """SIFT-like synthetic data: a mixture of gaussians, giving realistic
    low intrinsic dimensionality (uniform gaussian in 128-d has no
    neighborhood structure and is adversarially hard for ANY ANN method)."""
    centers = rng.standard_normal((clusters, d)).astype(np.float32) * 4.0
    assign = rng.integers(0, clusters, n)
    return (
        centers[assign] + rng.standard_normal((n, d)).astype(np.float32)
    ).astype(np.float32)


def main() -> None:
    os.environ.setdefault("JAX_COMPILATION_CACHE_DIR",
                          os.path.join(os.path.dirname(__file__), ".jax_cache"))
    import jax

    try:
        jax.config.update(
            "jax_compilation_cache_dir",
            os.environ["JAX_COMPILATION_CACHE_DIR"],
        )
    except Exception:
        pass

    from leann_tpu.ops.beam import BeamSearchEngine
    from leann_tpu.ops.distance import exact_topk
    from leann_tpu.ops.vamana import build_vamana

    log(f"devices: {jax.devices()}")
    rng = np.random.default_rng(0)
    log(f"generating corpus N={N} D={D} ...")
    # one pool so queries share the corpus's cluster structure
    pool = make_corpus(rng, N + RECALL_QUERIES + QUERY_BATCH, D)
    corpus = pool[:N]

    log("building vamana graph ...")
    t0 = time.time()
    adjacency, medoid = build_vamana(
        corpus,
        graph_degree=GRAPH_DEGREE,
        complexity=BUILD_COMPLEXITY,
        alpha=1.2,
        metric="l2",
        wave_size=8192,
    )
    build_s = time.time() - t0
    log(f"build: {build_s:.1f}s ({N / build_s:.0f} vec/s)")

    engine = BeamSearchEngine(
        corpus, adjacency, medoid, metric="l2",
        expansions=int(os.environ.get("BENCH_E", 2)),
    )

    # recall@10 vs exact oracle
    queries = pool[N : N + RECALL_QUERIES]
    _, oracle = exact_topk(queries, corpus, TOPK, metric="l2")
    idx, _ = engine.search(queries, k=TOPK, beam_width=SEARCH_BEAM)
    recall = float(np.mean([
        len(set(a.tolist()) & set(b.tolist())) / TOPK
        for a, b in zip(idx, oracle)
    ]))
    log(f"recall@10 @ beam {SEARCH_BEAM}: {recall:.4f}")

    # QPS: steady-state batched search (compile excluded via warmup)
    qbatch = pool[N + RECALL_QUERIES :]
    engine.search(qbatch, k=TOPK, beam_width=SEARCH_BEAM)  # warmup/compile
    reps = 5
    t0 = time.time()
    for _ in range(reps):
        engine.search(qbatch, k=TOPK, beam_width=SEARCH_BEAM)
    elapsed = time.time() - t0
    qps = reps * QUERY_BATCH / elapsed
    log(f"qps: {qps:.0f} (batch {QUERY_BATCH}, beam {SEARCH_BEAM})")

    print(json.dumps({
        "metric": f"vamana_qps_per_chip@recall10={recall:.3f} (N={N}, d={D}, beam={SEARCH_BEAM})",
        "value": round(qps, 1),
        "unit": "qps",
        "vs_baseline": round(qps / 10000.0, 3),
    }))


if __name__ == "__main__":
    main()
