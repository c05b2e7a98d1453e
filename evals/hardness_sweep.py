"""Recall across corpus-hardness configs: claims shouldn't rest on one
friendly distribution.

All headline recall numbers come from the default mixture (1024
well-separated isotropic clusters — flagged FRIENDLY below). This sweep
rebuilds each engine on progressively harder synthetic corpora
(overlapping clusters, anisotropic covariance, heavy-tailed masses,
uniform gaussian floor) and reports recall@10 at fixed serving knobs,
so the sensitivity of each engine to distribution shape is on the
record. (VERDICT r2 next-round #8; the reference makes no dataset
claims at all — its benches, `/root/reference/benches/benchmarks.rs`,
never committed a recall number.)

Usage:
  python evals/hardness_sweep.py --n 200000 --engines ivf,vamana
  python evals/hardness_sweep.py --n 200000 --config friendly,overlap2

Writes one JSON line per (config, engine) row.
"""

from __future__ import annotations

import argparse
import json
import os
import sys
import time

import numpy as np

from corpus_cache import make_corpus_hard

# name -> generator kwargs; ordered roughly easy -> hard
CONFIGS = {
    # the bench default — flagged: this is the FRIENDLIEST config
    "friendly": dict(clusters=1024, center_scale=4.0),
    "few-clusters": dict(clusters=64, center_scale=4.0),
    "many-clusters": dict(clusters=16384, center_scale=4.0),
    "aniso": dict(clusters=1024, center_scale=4.0, anisotropy=1.0),
    "zipf": dict(clusters=1024, center_scale=4.0, zipf=1.5),
    "overlap2": dict(clusters=1024, center_scale=2.0),
    "overlap1": dict(clusters=1024, center_scale=1.0),
    "aniso-overlap": dict(clusters=1024, center_scale=2.0, anisotropy=1.0),
    # no structure at all: the adversarial floor for ANY sublinear method
    "gaussian": dict(clusters=1, center_scale=0.0),
}


def log(m):
    print(m, file=sys.stderr, flush=True)


def main():
    ap = argparse.ArgumentParser()
    ap.add_argument("--n", type=int, default=200_000)
    ap.add_argument("--d", type=int, default=128)
    ap.add_argument("--engines", default="ivf,vamana")
    ap.add_argument("--config", default=",".join(CONFIGS))
    ap.add_argument("--recall-q", type=int, default=512)
    ap.add_argument("--k", type=int, default=10)
    ap.add_argument("--beam", type=int, default=64)
    ap.add_argument("--nprobe", type=int, default=0)
    ap.add_argument("--r", type=int, default=32, help="graph degree")
    ap.add_argument("--build-l", type=int, default=64)
    ap.add_argument("--out", default=None)
    args = ap.parse_args()

    os.environ.setdefault(
        "JAX_COMPILATION_CACHE_DIR",
        os.path.join(os.path.dirname(os.path.dirname(
            os.path.abspath(__file__))), ".jax_cache"))
    import jax

    from leann_tpu.ops.distance import exact_topk

    log(f"devices: {jax.devices()}")
    n, d, k = args.n, args.d, args.k
    nprobe = args.nprobe or (8 if n >= 500_000 else 16)
    rows = []
    for name in args.config.split(","):
        kw = CONFIGS[name]
        rng = np.random.default_rng(0)
        pool = make_corpus_hard(rng, n + args.recall_q, d, **kw)
        corpus, rq = pool[:n], pool[n:]
        log(f"=== {name} {kw} ===")
        _, oracle = exact_topk(rq, corpus, k, metric="l2", two_stage=True)
        oracle = np.asarray(oracle)

        for engine in args.engines.split(","):
            t0 = time.time()
            if engine == "ivf":
                from leann_tpu.ops.ivf import IvfEngine

                clusters = max(64, int(2 * n ** 0.5))
                eng = IvfEngine(corpus, n_clusters=clusters, metric="l2")
                ids, _ = eng.search(rq, k=k, nprobe=nprobe)
                knobs = f"clusters={clusters}, nprobe={nprobe}"
            elif engine == "vamana":
                from types import SimpleNamespace

                from leann_tpu.backend import GraphSearcher
                from leann_tpu.ops.vamana import build_vamana

                adjacency, medoid = build_vamana(
                    corpus, graph_degree=args.r, complexity=args.build_l,
                    alpha=1.2, metric="l2", wave_size=8192)
                eng = GraphSearcher(
                    corpus,
                    SimpleNamespace(adjacency=adjacency, medoid=medoid),
                    metric="l2")
                ids, _ = eng.search(rq, k=k, complexity=args.beam)
                knobs = f"R={args.r}, L={args.build_l}, beam={args.beam}"
            else:
                raise SystemExit(f"unknown engine {engine}")
            dt = time.time() - t0
            recall = float(np.mean([
                len(set(np.asarray(ids)[i, :k].tolist())
                    & set(oracle[i].tolist())) / k
                for i in range(len(oracle))
            ]))
            row = {
                "config": name, "gen": kw, "engine": engine,
                "n": n, "d": d, "knobs": knobs,
                "recall_at_k": round(recall, 4),
                "build_plus_search_s": round(dt, 1),
                "friendly_flag": name == "friendly",
            }
            rows.append(row)
            print(json.dumps(row), flush=True)
            del eng
    if args.out:
        with open(args.out, "w") as f:
            for r in rows:
                f.write(json.dumps(r) + "\n")


if __name__ == "__main__":
    main()
