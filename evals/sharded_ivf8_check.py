"""ShardedIvf8Index on the real chip: one device = one shard of the
DEEP-100M program (same shard_map program the 8-device virtual mesh
runs in dryrun_multichip). Reports recall@10 vs the exact oracle and
wall QPS (incl. relay dispatch) — §5-style sharded hardware evidence
for the residual-int8 per-shard engine.

Run: PYTHONPATH=/root/repo:/root/.axon_site python evals/sharded_ivf8_check.py
"""

from __future__ import annotations

import argparse
import json
import os
import sys
import time

import numpy as np

_ROOT = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))
sys.path.insert(0, _ROOT)
sys.path.insert(0, os.path.dirname(os.path.abspath(__file__)))
os.environ.setdefault(
    "JAX_COMPILATION_CACHE_DIR", os.path.join(_ROOT, ".jax_cache"))


def log(m):
    print(m, file=sys.stderr, flush=True)


def main():
    ap = argparse.ArgumentParser()
    ap.add_argument("--n", type=int, default=1_000_000)
    ap.add_argument("--d", type=int, default=128)
    ap.add_argument("--b", type=int, default=2048)
    ap.add_argument("--nprobe", type=int, default=8)
    ap.add_argument("--clusters", type=int, default=2000)
    ap.add_argument("--reps", type=int, default=5)
    ap.add_argument("--recall-q", type=int, default=1024)
    args = ap.parse_args()

    import jax

    from corpus_cache import get_pool
    from leann_tpu.parallel import ShardedIvf8Index, make_mesh

    devices = jax.devices()
    log(f"devices: {devices}")
    mesh = make_mesh((1, len(devices)), devices=devices)

    pool = get_pool(args.n, args.d)
    corpus = pool[: args.n]
    rq = pool[args.n : args.n + args.recall_q]

    adir = os.path.join(os.path.dirname(os.path.abspath(__file__)),
                        "artifacts")
    oc = os.path.join(
        adir, f"oracle_n{args.n}_d{args.d}_q{args.recall_q}.npz")
    oracle = np.load(oc)["oracle"]
    log(f"oracle cache {oc}")

    t0 = time.time()
    idx = ShardedIvf8Index(
        corpus, mesh, metric="l2", n_clusters=args.clusters)
    log(f"engine up in {time.time() - t0:.0f}s "
        f"(shards={mesh.shape['shard']})")

    ids, _ = idx.search(rq, k=10, nprobe=args.nprobe)  # compile+recall
    rec = np.mean([
        len(set(ids[i].tolist()) & set(oracle[i].tolist())) / 10
        for i in range(len(oracle))
    ])
    log(f"recall@10: {rec:.4f} @ nprobe {args.nprobe}")

    q = np.ascontiguousarray(
        np.tile(rq, (-(-args.b // len(rq)), 1))[: args.b])
    idx.search(q, k=10, nprobe=args.nprobe)  # warm the B-shape
    lats = []
    for _ in range(args.reps):
        t0 = time.time()
        idx.search(q + 0, k=10, nprobe=args.nprobe)
        lats.append(time.time() - t0)
    lat = float(np.mean(lats))
    print(json.dumps({
        "probe": "sharded-ivf8-real-chip",
        "n": args.n, "d": args.d, "shards": mesh.shape["shard"],
        "nprobe": args.nprobe, "b": args.b, "reps": args.reps,
        "recall_at_10": round(float(rec), 4),
        "wall_ms_per_batch_mean": round(lat * 1e3, 1),
        "wall_ms_per_batch_std": round(float(np.std(lats)) * 1e3, 1),
        "wall_qps": round(args.b / lat, 1),
    }), flush=True)


if __name__ == "__main__":
    main()
