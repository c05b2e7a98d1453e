"""Per-phase timing of real 1M insert waves (LEANN_BUILD_PROFILE=1).

Runs _insert_waves for PROF_WAVES waves over a 1M corpus seeded with a
random R-regular graph, printing search / prune / reverse wall-time per
wave. Decides VERDICT #3 (build <= 600s => <= 2.4s/wave).

Run:  LEANN_BUILD_PROFILE=1 PYTHONPATH=/root/repo:/root/.axon_site \
      python evals/wave_profile.py
"""

from __future__ import annotations

import os
import sys
import time

import jax.numpy as jnp
import numpy as np

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

from leann_tpu.ops.vamana import _insert_waves

N = int(os.environ.get("PROF_N", 1_000_000))
D = 128
R = 48
L = 80
W = int(os.environ.get("PROF_W", 8192))
WAVES = int(os.environ.get("PROF_WAVES", 4))


def main():
    rng = np.random.default_rng(0)
    vectors = rng.standard_normal((N, D), dtype=np.float32)
    vecs_dev = jnp.asarray(np.concatenate([vectors, np.zeros((1, D), np.float32)]))
    sq_norms = jnp.sum(vecs_dev * vecs_dev, axis=1)
    init = rng.integers(0, N - 1, size=(N, R), dtype=np.int64)
    init = np.where(init >= np.arange(N)[:, None], init + 1, init).astype(np.int32)
    adjacency = jnp.asarray(np.concatenate([init, np.full((1, R), N, np.int32)]))
    order = rng.permutation(N)[: WAVES * W]
    t0 = time.time()
    _insert_waves(
        vectors, vecs_dev, sq_norms, adjacency, jnp.int32(0), order,
        beam_width=L, graph_degree=R, alpha=1.2, metric="l2",
        wave_size=W, incoming_cap=8, max_iters=2 * L + 16, expansions=2,
    )
    print(f"total {time.time() - t0:.1f}s for {WAVES} waves", file=sys.stderr)


if __name__ == "__main__":
    main()
