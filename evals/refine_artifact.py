"""One extra Vamana pass over an existing graph artifact.

Round-2's 10M artifact was built single-pass (L=64) for wall-clock and
serves at recall 0.902 @ beam 64 — below DiskANN-class. A second pass
(re-search every node through the CURRENT graph, alpha-prune, reverse
edges) is exactly what `insert_points` runs when handed every id, so the
existing artifact upgrades in one pass instead of a full 2-pass rebuild
(`/root/reference/src/backend/diskann.rs:88-99` builds two-pass
unconditionally; here the second pass is resumable work).

  python evals/refine_artifact.py --n 10000000 --d 96 --l 64
  -> writes vamana_n{N}_r{R}_l{L}p2.npz
"""

from __future__ import annotations

import argparse
import os
import sys
import time

import numpy as np


def log(m):
    print(m, file=sys.stderr, flush=True)


def main():
    ap = argparse.ArgumentParser()
    ap.add_argument("--n", type=int, default=10_000_000)
    ap.add_argument("--d", type=int, default=96)
    ap.add_argument("--r", type=int, default=48)
    ap.add_argument("--l", type=int, default=64)
    ap.add_argument("--alpha", type=float, default=1.2)
    ap.add_argument("--wave", type=int, default=8192)
    ap.add_argument("--artifact", default=None)
    ap.add_argument("--out", default=None)
    args = ap.parse_args()

    os.environ.setdefault(
        "JAX_COMPILATION_CACHE_DIR",
        os.path.join(os.path.dirname(os.path.dirname(
            os.path.abspath(__file__))), ".jax_cache"))
    import jax

    from corpus_cache import get_pool
    from leann_tpu.ops.vamana import insert_points

    n, d = args.n, args.d
    log(f"devices: {jax.devices()}")
    pool = get_pool(n, d)
    corpus = np.asarray(pool[:n])

    art = args.artifact or os.path.join(
        os.path.dirname(os.path.abspath(__file__)), "artifacts",
        f"vamana_n{n}_r{args.r}_l{args.l}.npz")
    a = np.load(art)
    adjacency, medoid = a["adjacency"], int(a["medoid"])
    log(f"artifact {art} (R={adjacency.shape[1]})")

    t0 = time.time()
    adjacency = insert_points(
        corpus, adjacency, medoid, np.arange(n), graph_degree=args.r,
        complexity=args.l, alpha=args.alpha, metric="l2",
        wave_size=args.wave,
    )
    refine_s = time.time() - t0
    log(f"refine pass: {refine_s:.0f}s ({n / refine_s:.0f} vec/s)")

    out = args.out or os.path.join(
        os.path.dirname(os.path.abspath(__file__)), "artifacts",
        f"vamana_n{n}_r{args.r}_l{args.l}p2.npz")
    np.savez(out, adjacency=adjacency, medoid=np.int32(medoid),
             refine_s=np.float32(refine_s), n=n, d=d, r=args.r, L=args.l)
    log(f"saved {out}")


if __name__ == "__main__":
    main()
