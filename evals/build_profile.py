"""Profile one Vamana insert-wave at 1M scale on the real TPU.

Times the three wave phases separately (beam search, forward prune,
reverse-edge prune) to decide where the round-2 build-speed work goes
(VERDICT #3: 1M R=48/L=80 build <= 600s; currently ~2046s ~= 8.4s/wave).

Run:  PYTHONPATH=/root/repo:/root/.axon_site python evals/build_profile.py
"""

from __future__ import annotations

import os
import sys
import time

import jax
import jax.numpy as jnp
import numpy as np

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

from leann_tpu.ops.beam import beam_search_batch
from leann_tpu.ops.vamana import (
    REVERSE_BLOCK,
    _apply_reverse_edges,
    robust_prune_batch,
)

N = int(os.environ.get("PROF_N", 1_000_000))
D = 128
R = 48
L = 80
W = int(os.environ.get("PROF_W", 8192))
E = 2


def log(msg):
    print(msg, file=sys.stderr, flush=True)


def main():
    rng = np.random.default_rng(0)
    log(f"gen corpus N={N} D={D}")
    vectors = rng.standard_normal((N, D), dtype=np.float32)
    vecs_dev = jnp.asarray(np.concatenate([vectors, np.zeros((1, D), np.float32)]))
    sq_norms = jnp.sum(vecs_dev * vecs_dev, axis=1)
    init = rng.integers(0, N - 1, size=(N, R), dtype=np.int64)
    init = np.where(init >= np.arange(N)[:, None], init + 1, init).astype(np.int32)
    adjacency = jnp.asarray(np.concatenate([init, np.full((1, R), N, np.int32)]))
    sentinel = jnp.int32(N)
    medoid = jnp.int32(0)
    alpha_dev = jnp.float32(1.2)
    max_iters = 2 * L + 16

    wave = rng.permutation(N)[:W].astype(np.int32)
    q = jnp.asarray(vectors[wave])
    wave_dev = jnp.asarray(wave)

    def run_search():
        out = beam_search_batch(
            q, vecs_dev, adjacency, sq_norms, medoid, wave_dev,
            beam_width=L, max_iters=max_iters, metric="l2",
            expansions=E, precision="default", track_visited=2 * L,
        )
        jax.block_until_ready(out)
        return out

    # warm up (compile)
    t0 = time.time()
    beam_ids, _, vlog_ids, _ = run_search()
    log(f"search compile+run: {time.time() - t0:.2f}s")
    for _ in range(2):
        t0 = time.time()
        beam_ids, _, vlog_ids, _ = run_search()
        log(f"search: {time.time() - t0:.2f}s")

    cur = adjacency[wave_dev]
    cand_ids = jnp.concatenate([vlog_ids, beam_ids, cur], axis=1)
    cand_ids = jnp.where(cand_ids == wave_dev[:, None], sentinel, cand_ids)
    log(f"cand pool C={cand_ids.shape[1]}")

    def run_prune():
        cand_vecs = vecs_dev[cand_ids]
        out = robust_prune_batch(
            q, cand_ids, cand_vecs, sentinel, alpha_dev, R,
            precision="default",
        )
        jax.block_until_ready(out)
        return out

    t0 = time.time()
    new_nbrs = run_prune()
    log(f"prune compile+run: {time.time() - t0:.2f}s")
    for _ in range(2):
        t0 = time.time()
        new_nbrs = run_prune()
        log(f"prune: {time.time() - t0:.2f}s")

    nb_host = np.asarray(new_nbrs)
    src = np.repeat(wave, R)
    dst = nb_host.reshape(-1)
    keep = dst != N
    src, dst = src[keep], dst[keep]
    log(f"reverse edges: {dst.size} -> uniq {np.unique(dst).size}, "
        f"blocks of {REVERSE_BLOCK}")

    def run_reverse(adj):
        adj = _apply_reverse_edges(
            adj, vecs_dev, dst, src, N, R, 8, alpha_dev, sentinel,
        )
        jax.block_until_ready(adj)
        return adj

    t0 = time.time()
    adjacency = run_reverse(adjacency)
    log(f"reverse compile+run: {time.time() - t0:.2f}s")
    for _ in range(2):
        t0 = time.time()
        adjacency = run_reverse(adjacency)
        log(f"reverse: {time.time() - t0:.2f}s")

    # host-side grouping cost alone
    t0 = time.time()
    order = np.argsort(dst, kind="stable")
    dst_s = dst[order]
    np.unique(dst_s, return_index=True)
    log(f"host sort+unique alone: {time.time() - t0:.3f}s")


if __name__ == "__main__":
    main()
