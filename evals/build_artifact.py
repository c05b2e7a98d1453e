"""One-time 1M vamana graph build -> artifact for search-perf iteration.

Builds the bench corpus (same generator/seed as bench.py) into a vamana
graph and saves the adjacency + medoid so search experiments don't pay
the ~30 min build each time.

  PYTHONPATH=/root/repo:/root/.axon_site python evals/build_artifact.py
Env: ART_N, ART_R, ART_L, ART_CAP, ART_OUT
"""

from __future__ import annotations

import os
import sys
import time

import numpy as np

N = int(os.environ.get("ART_N", 1_000_000))
D = int(os.environ.get("ART_D", 128))
R = int(os.environ.get("ART_R", 48))
L = int(os.environ.get("ART_L", 80))
CAP = int(os.environ.get("ART_CAP", 16))
WAVE = int(os.environ.get("ART_WAVE", 8192))
PASSES = int(os.environ.get("ART_PASSES", 2))
# E=4 halves the XLA engine's sequential gather rounds per wave at the
# same total gathered rows (r3 lever, CPU-validated recall-neutral for
# building too — /tmp/e4check); the fused engine caps at E=2.
EXPANSIONS = int(os.environ.get("ART_EXPANSIONS", 2))
OUT = os.environ.get(
    "ART_OUT",
    os.path.join(os.path.dirname(os.path.abspath(__file__)),
                 "artifacts", f"vamana_n{N}_r{R}_l{L}.npz"),
)


def log(m):
    print(m, file=sys.stderr, flush=True)


def main():
    os.environ.setdefault(
        "JAX_COMPILATION_CACHE_DIR",
        os.path.join(os.path.dirname(os.path.dirname(os.path.abspath(__file__))),
                     ".jax_cache"),
    )
    import jax

    from corpus_cache import get_pool
    from leann_tpu.ops.vamana import build_vamana

    log(f"devices: {jax.devices()}")
    pool = get_pool(N, D)
    corpus = pool[:N]
    # wave checkpoint + stall watchdog: a wedged relay dispatch exits 17
    # and the next invocation resumes from the snapshot (r4: a silent
    # 55-min hang at wave 750/1221 cost the whole 2h build)
    ckpt = os.environ.get("ART_CKPT", OUT + ".ckpt")
    os.environ.setdefault("LEANN_BUILD_STALL_S", "900")
    t0 = time.time()
    adjacency, medoid = build_vamana(
        corpus, graph_degree=R, complexity=L, alpha=1.2, metric="l2",
        wave_size=WAVE, incoming_cap=CAP, passes=PASSES, verbose=True,
        expansions=EXPANSIONS, checkpoint_path=ckpt,
    )
    build_s = time.time() - t0
    log(f"build: {build_s:.1f}s ({N / build_s:.0f} vec/s)")
    os.makedirs(os.path.dirname(OUT), exist_ok=True)
    np.savez(OUT, adjacency=adjacency, medoid=np.int32(medoid),
             build_s=np.float32(build_s), n=N, d=D, r=R, L=L, cap=CAP)
    log(f"saved {OUT}")
    if os.path.exists(ckpt):
        os.remove(ckpt)


if __name__ == "__main__":
    main()
