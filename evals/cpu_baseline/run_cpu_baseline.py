"""Run the CPU HNSW baseline on the bench corpora and measure recall/QPS.

The reference binary itself cannot be built in this image (no Rust
toolchain), so the baseline is evals/cpu_baseline/hnsw_baseline.cpp — the
same algorithm + parameters the reference delegates to (usearch HNSW,
`/root/reference/src/backend/hnsw.rs:112-135`): M=32, efConstruction=64,
sequential insert, IP or L2, f32. Corpora are generated with the exact
generator + seed bench.py uses, so numbers are head-to-head comparable
with BENCH_r*.json and evals/RESULTS_r*.md.

  PYTHONPATH=/root/repo python evals/cpu_baseline/run_cpu_baseline.py
Env: CB_N (default 20000), CB_D (768), CB_Q (1024), CB_K (10),
     CB_EFS (64), CB_METRIC (l2), CB_TAG (label in the output line)
"""

from __future__ import annotations

import json
import os
import subprocess
import sys
import tempfile
import time

import numpy as np

HERE = os.path.dirname(os.path.abspath(__file__))

N = int(os.environ.get("CB_N", 20_000))
D = int(os.environ.get("CB_D", 768))
Q = int(os.environ.get("CB_Q", 1024))
K = int(os.environ.get("CB_K", 10))
M = int(os.environ.get("CB_M", 32))        # reference graph_degree default
EFC = int(os.environ.get("CB_EFC", 64))    # reference complexity default
EFS = int(os.environ.get("CB_EFS", 64))
METRIC = os.environ.get("CB_METRIC", "l2")
TAG = os.environ.get("CB_TAG", f"n{N}_d{D}")


def log(m):
    print(m, file=sys.stderr, flush=True)


def make_corpus(rng, n, d, clusters=1024):
    """Identical to bench.py's generator (same seed stream layout)."""
    centers = rng.standard_normal((clusters, d)).astype(np.float32) * 4.0
    assign = rng.integers(0, clusters, n)
    return (centers[assign]
            + rng.standard_normal((n, d)).astype(np.float32)).astype(np.float32)


def compile_baseline() -> str:
    exe = os.path.join(HERE, "hnsw_baseline")
    src = os.path.join(HERE, "hnsw_baseline.cpp")
    if (not os.path.exists(exe)
            or os.path.getmtime(exe) < os.path.getmtime(src)):
        log("compiling hnsw_baseline.cpp -O3 ...")
        subprocess.check_call(
            ["g++", "-O3", "-std=c++17", "-march=native", "-o", exe, src]
        )
    return exe


def oracle_topk(corpus, queries, k, metric):
    """Exact top-k via blocked matmul (numpy)."""
    out = np.zeros((queries.shape[0], k), np.int64)
    nsq = (corpus * corpus).sum(axis=1) if metric == "l2" else None
    bs = 256
    for i in range(0, queries.shape[0], bs):
        q = queries[i : i + bs]
        dots = q @ corpus.T
        scores = 2.0 * dots - nsq[None, :] if metric == "l2" else dots
        out[i : i + bs] = np.argsort(-scores, axis=1)[:, :k]
    return out


def main():
    rng = np.random.default_rng(0)
    pool = make_corpus(rng, N + Q, D)
    corpus, queries = pool[:N], pool[N : N + Q]
    exe = compile_baseline()

    with tempfile.TemporaryDirectory() as td:
        cpath = os.path.join(td, "corpus.f32")
        qpath = os.path.join(td, "queries.f32")
        opath = os.path.join(td, "out.i32")
        corpus.tofile(cpath)
        queries.tofile(qpath)
        log(f"running baseline: N={N} D={D} Q={Q} M={M} efC={EFC} "
            f"efS={EFS} metric={METRIC}")
        t0 = time.time()
        res = subprocess.run(
            [exe, cpath, str(N), str(D), qpath, str(Q), str(K), str(M),
             str(EFC), str(EFS), METRIC, opath],
            capture_output=True, text=True, check=True,
        )
        log(res.stderr.strip())
        stats = json.loads(res.stdout)
        log(f"wall {time.time() - t0:.1f}s")
        ids = np.fromfile(opath, np.int32).reshape(Q, K)

    log("computing oracle recall ...")
    oracle = oracle_topk(corpus, queries, K, METRIC)
    recall = float(np.mean([
        len(set(ids[i].tolist()) & set(oracle[i].tolist())) / K
        for i in range(Q)
    ]))

    line = {
        "baseline": "cpu-hnsw (reference params, g++ -O3, 1 thread)",
        "tag": TAG, "n": N, "d": D, "metric": METRIC,
        "m": M, "efc": EFC, "efs": EFS,
        "build_s": stats["build_s"],
        "qps": stats["qps"],
        "recall@10": round(recall, 4),
    }
    print(json.dumps(line))


if __name__ == "__main__":
    main()
