"""Fused Pallas traversal under shard_map on the REAL chip.

tests/test_parallel.py proves the sharded-fused path in interpret mode
on the CPU mesh; this script is the hardware shakeout: Mosaic lowering
of the whole-traversal kernel *inside* a shard_map body, per-shard
inline blocks resident in local HBM, and the all_gather merge. On one
chip the mesh is (dp=1, shard=1) — the single-shard case exercises the
identical program the multi-chip DEEP topology runs per shard
(parallel/sharded.py:ShardedGraphIndex), so a pass here plus the
8-device CPU dryrun covers compile-and-execute on both axes.

  python evals/sharded_device_check.py --n 1000000 --d 128
"""

from __future__ import annotations

import argparse
import json
import os
import sys
import time

import numpy as np


def log(m):
    print(m, file=sys.stderr, flush=True)


def main():
    ap = argparse.ArgumentParser()
    ap.add_argument("--n", type=int, default=1_000_000)
    ap.add_argument("--d", type=int, default=128)
    ap.add_argument("--r", type=int, default=48)
    ap.add_argument("--l", type=int, default=80)
    ap.add_argument("--b", type=int, default=2048)
    ap.add_argument("--beam", type=int, default=64)
    ap.add_argument("--reps", type=int, default=5)
    ap.add_argument("--recall-q", type=int, default=1024)
    ap.add_argument("--engine", default="fused",
                    choices=["fused", "pq", "xla"],
                    help="per-shard traversal engine (pq = global "
                         "codebook + per-shard 16B/node records, the "
                         "DEEP-100M-class footprint)")
    ap.add_argument("--interpret", action="store_true",
                    help="force Pallas interpret mode (auto on CPU)")
    args = ap.parse_args()

    os.environ.setdefault(
        "JAX_COMPILATION_CACHE_DIR",
        os.path.join(os.path.dirname(os.path.dirname(
            os.path.abspath(__file__))), ".jax_cache"))
    import jax

    from leann_tpu.parallel.mesh import make_mesh
    from leann_tpu.parallel.sharded import ShardedGraphIndex

    log(f"devices: {jax.devices()}")
    n, d = args.n, args.d
    from corpus_cache import get_pool

    pool = get_pool(n, d)
    corpus, rq = pool[:n], pool[n : n + args.recall_q]

    art = os.path.join(
        os.path.dirname(os.path.abspath(__file__)), "artifacts",
        f"vamana_n{n}_r{args.r}_l{args.l}.npz")
    a = np.load(art)
    adjacency, medoid = a["adjacency"], int(a["medoid"])

    oc = os.path.join(
        os.path.dirname(os.path.abspath(__file__)), "artifacts",
        f"oracle_n{n}_d{d}_q{args.recall_q}.npz")
    if os.path.exists(oc):
        oracle = np.load(oc)["oracle"]
    else:
        from leann_tpu.ops.distance import exact_topk

        _, oracle = exact_topk(rq, corpus, 10, metric="l2", two_stage=True)
        oracle = np.asarray(oracle)
        np.savez_compressed(oc, oracle=oracle)

    mesh = make_mesh()  # (dp=1, shard=<all devices>)
    n_shards = mesh.shape["shard"]
    adj_shards = meds = None
    if n_shards == 1:
        # reuse the committed whole-corpus artifact as the single shard
        adj_shards, meds = adjacency[None], np.asarray([medoid])
    interpret = args.interpret or jax.default_backend() == "cpu"
    if interpret:
        log("interpret mode (CPU backend): correctness smoke only, "
            "timings are not device numbers")
    t0 = time.time()
    idx = ShardedGraphIndex(
        corpus, mesh, metric="l2", graph_degree=args.r,
        adjacency_shards=adj_shards, medoids=meds, engine=args.engine,
        interpret=interpret)
    log(f"sharded index up in {time.time()-t0:.0f}s "
        f"(shards={n_shards}, engine={idx.engine})")

    t0 = time.time()
    ids, _ = idx.search(rq, k=10, beam_width=args.beam)
    log(f"first batch (compile) {time.time()-t0:.0f}s")
    recall = float(np.mean([
        len(set(ids[i].tolist()) & set(oracle[i].tolist())) / 10
        for i in range(len(oracle))
    ]))

    r = np.random.default_rng(7)
    qs = [
        (corpus[r.integers(0, n, args.b)]
         + r.standard_normal((args.b, d)).astype(np.float32))
        for _ in range(min(args.reps, 3))
    ]
    idx.search(qs[0], k=10, beam_width=args.beam)  # warm this batch size
    times = []
    for i in range(args.reps):
        t0 = time.perf_counter()
        idx.search(qs[i % len(qs)], k=10, beam_width=args.beam)
        times.append(time.perf_counter() - t0)
    ms = 1e3 * np.array(times)
    print(json.dumps({
        "probe": f"sharded-{args.engine}-real-chip",
        "n": n, "d": d, "shards": n_shards, "engine": idx.engine,
        "beam": args.beam, "recall_at_10": round(recall, 4),
        "wall_ms_per_batch_mean": round(float(ms.mean()), 1),
        "wall_ms_per_batch_std": round(float(ms.std()), 1),
        "wall_qps": round(args.b / float(ms.mean() / 1e3), 1),
        "note": "wall time includes the ~110ms relay dispatch; "
                "device truth for the identical per-shard program is "
                "the device_time.py vamana row",
    }), flush=True)


if __name__ == "__main__":
    main()
