"""Validate the fused-kernel build path: recall parity + wave speed.

Builds the same corpus with LEANN_BUILD_ENGINE=fused and =inline, then
measures recall@10 of both graphs searched by the fused serving engine.

Run:  PYTHONPATH=/root/repo:/root/.axon_site python evals/fused_build_check.py
"""

from __future__ import annotations

import os
import sys
import time

import numpy as np

_ROOT = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))
sys.path.insert(0, _ROOT)
os.environ.setdefault(
    "JAX_COMPILATION_CACHE_DIR", os.path.join(_ROOT, ".jax_cache")
)

N = int(os.environ.get("CHK_N", 100_000))
D = 128
R = 48
L = 80
NQ = 1024


def gen_corpus(n, d, seed=0):
    """corpus ++ queries from ONE set of centers (queries must be
    on-manifold or recall measures cluster-finding, not graph quality)"""
    rng = np.random.default_rng(seed)
    n_clusters = 1024
    centers = rng.standard_normal((n_clusters, d)).astype(np.float32) * 4.0
    assign = rng.integers(0, n_clusters, size=n)
    x = centers[assign] + rng.standard_normal((n, d)).astype(np.float32)
    return x.astype(np.float32)


def recall_at_10(engine, queries, gt, beam):
    ids, _ = engine.search(queries, k=10, beam_width=beam)
    hits = 0
    for i in range(len(queries)):
        hits += len(set(ids[i].tolist()) & set(gt[i].tolist()))
    return hits / (len(queries) * 10)


def main():
    from leann_tpu.ops.distance import exact_topk
    from leann_tpu.ops.fused_beam import FusedBeamEngine
    from leann_tpu.ops.vamana import build_vamana

    both = gen_corpus(N + NQ, D)
    corpus, queries = both[:N], both[N:]
    _, gt = exact_topk(queries, corpus, 10, metric="l2")
    gt = np.asarray(gt)

    for engine_kind in ("fused", "inline"):
        os.environ["LEANN_BUILD_ENGINE"] = engine_kind
        t0 = time.time()
        adjacency, medoid = build_vamana(
            corpus, graph_degree=R, complexity=L, alpha=1.2,
            metric="l2", wave_size=8192,
        )
        bt = time.time() - t0
        eng = FusedBeamEngine(corpus, adjacency, medoid, metric="l2")
        for beam in (32, 64):
            r10 = recall_at_10(eng, queries, gt, beam)
            print(
                f"build={engine_kind:7s} {bt:7.1f}s  beam={beam:3d}  "
                f"recall@10={r10:.4f}",
                file=sys.stderr, flush=True,
            )


if __name__ == "__main__":
    main()
