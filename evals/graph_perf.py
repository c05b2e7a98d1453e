"""Graph-engine search perf on the prebuilt 1M artifact (real TPU).

Measures recall@10 (vs exact oracle) and steady-state QPS at batch 2048
for the inline-block traversal engine and (optionally) the fused Pallas
kernel, across beam widths.

  PYTHONPATH=/root/repo:/root/.axon_site python evals/graph_perf.py
Env: GP_ART (artifact path), GP_BEAMS (csv), GP_MODE (engine|fused|both),
     GP_B (batch, default 2048), GP_E (expansions)
"""

from __future__ import annotations

import json
import os
import sys
import time

import numpy as np

ART = os.environ.get(
    "GP_ART",
    os.path.join(os.path.dirname(os.path.abspath(__file__)),
                 "artifacts", "vamana_n1000000_r48_l80.npz"),
)
BEAMS = [int(x) for x in os.environ.get("GP_BEAMS", "16,32,64").split(",")]
MODE = os.environ.get("GP_MODE", "engine")
B = int(os.environ.get("GP_B", 2048))
E = int(os.environ.get("GP_E", 2))
RECALL_Q = int(os.environ.get("GP_RQ", 1024))
BLOCK_MODE = os.environ.get("GP_BLOCK", "auto")


def log(m):
    print(m, file=sys.stderr, flush=True)


def make_corpus(rng, n, d, clusters=1024):
    centers = rng.standard_normal((clusters, d)).astype(np.float32) * 4.0
    assign = rng.integers(0, clusters, n)
    return (centers[assign]
            + rng.standard_normal((n, d)).astype(np.float32)).astype(np.float32)


def main():
    os.environ.setdefault(
        "JAX_COMPILATION_CACHE_DIR",
        os.path.join(os.path.dirname(os.path.dirname(os.path.abspath(__file__))),
                     ".jax_cache"),
    )
    art = np.load(ART)
    n, d = int(art["n"]), int(art["d"])
    adjacency, medoid = art["adjacency"], int(art["medoid"])
    log(f"artifact: n={n} d={d} r={adjacency.shape[1]} medoid={medoid}")

    rng = np.random.default_rng(0)
    pool = make_corpus(rng, n + RECALL_Q + B, d)
    corpus = pool[:n]
    rq = pool[n : n + RECALL_Q]
    perfq = pool[n + RECALL_Q : n + RECALL_Q + B]

    from leann_tpu.ops.beam import BeamSearchEngine
    from leann_tpu.ops.distance import exact_topk

    log("computing oracle ...")
    _, oracle = exact_topk(rq, corpus, 10, metric="l2", two_stage=True)

    t0 = time.time()
    if MODE == "fused":
        from leann_tpu.ops.fused_beam import FusedBeamEngine

        eng = FusedBeamEngine(
            corpus, adjacency, medoid, metric="l2", expansions=E,
            qb=int(os.environ.get("GP_QB", 16)),
            ring_size=int(os.environ.get("GP_RING", 1024)),
        )
        eng.block_mode = "fused"
    else:
        log(f"building engine (block_mode={BLOCK_MODE}, expansions={E}) ...")
        eng = BeamSearchEngine(
            corpus, adjacency, medoid, metric="l2", expansions=E,
            block_mode=BLOCK_MODE,
        )
    log(f"engine up in {time.time() - t0:.1f}s (mode={eng.block_mode})")

    results = []
    for beam in BEAMS:
        idx, _ = eng.search(rq, k=10, beam_width=beam)
        recall = float(np.mean([
            len(set(idx[i].tolist()) & set(oracle[i].tolist())) / 10
            for i in range(RECALL_Q)
        ]))
        # steady-state QPS at batch B (distinct per-rep batches: the
        # relay can memoize repeated identical dispatches)
        eng.search(perfq[:B], k=10, beam_width=beam)  # warm/compile
        reps = 5
        rep_batches = [
            np.ascontiguousarray(np.roll(perfq[:B], i, axis=0)
                                 + np.float32(i) * 0.001)
            for i in range(reps)
        ]
        t0 = time.time()
        for rb in rep_batches:
            eng.search(rb, k=10, beam_width=beam)
        dt = (time.time() - t0) / reps
        qps = B / dt
        row = {"engine": "inline-" + eng.block_mode, "beam": beam,
               "recall@10": round(recall, 4), "qps": round(qps, 1),
               "batch_ms": round(1000 * dt, 1)}
        log(json.dumps(row))
        results.append(row)
    print(json.dumps(results))


if __name__ == "__main__":
    main()
