"""Is the PQ-navigation collapse a property of the engine or of the
max-entropy proxy corpus?

RESULTS_r3 section 2 measures single-level PQ ADC collapsing on the
bench mixture (recall 0.07-0.23) and the quantizer ladder shows why:
the mixture's within-cluster residual is a unit-variance isotropic
gaussian — the maximum-entropy distribution at that scale — so 128
bits/vector sits below the rate-distortion floor needed to rank
within-cluster neighbors. Real descriptor corpora (SIFT, DEEP) are NOT
max-entropy: they concentrate near low-dimensional manifolds, which is
precisely why 128-bit PQ works for DiskANN/FAISS in practice.

This sim measures that claim instead of asserting it: same n, same d,
same graph/build/PQ/traversal pipeline, two corpora —

  fullrank   the bench mixture (1024 clusters, full-rank unit noise)
  lowdimK    clusters + unit noise living in a random K-dim subspace
             of R^d (K=16 default, ~ real descriptor intrinsic dim),
             plus 0.05-sigma ambient noise

and the same PQ budgets (m16 single-level; mc2+mf12 residual). If
lowdimK recall recovers to graph-ceiling while fullrank collapses, the
PQ engine's scoping note ("serves corpora whose neighborhoods stay
separable at ADC error") is validated on the realistic side, not just
falsified on the adversarial side.

  JAX_PLATFORMS=cpu python evals/pq_lowdim_sim.py --n 200000

One JSON row per (corpus, variant, beam). The `true` variant traverses
the unquantized corpus — the graph ceiling both PQ variants are read
against.
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


def make_lowdim(rng, rows, d, k, clusters, ambient=0.05):
    """Clusters + unit within-cluster noise confined to a random K-dim
    subspace of R^d, plus small full-rank ambient noise."""
    basis, _ = np.linalg.qr(rng.standard_normal((d, k)))
    centers = 4.0 * rng.standard_normal((clusters, k))
    assign = rng.integers(0, clusters, rows)
    lat = centers[assign] + rng.standard_normal((rows, k))
    x = lat @ basis.T + ambient * rng.standard_normal((rows, d))
    return np.ascontiguousarray(x, dtype=np.float32)


def main():
    ap = argparse.ArgumentParser()
    ap.add_argument("--n", type=int, default=200_000)
    ap.add_argument("--d", type=int, default=96)
    ap.add_argument("--k", type=int, default=16)
    ap.add_argument("--clusters", type=int, default=1024)
    ap.add_argument("--queries", type=int, default=1024)
    ap.add_argument("--beams", default="64,96")
    ap.add_argument("--corpora", default="fullrank,lowdim")
    ap.add_argument("--variants", default="true,m16,res")
    ap.add_argument("--seed", type=int, default=0)
    args = ap.parse_args()

    os.environ.setdefault(
        "JAX_COMPILATION_CACHE_DIR",
        os.path.join(os.path.dirname(os.path.dirname(
            os.path.abspath(__file__))), ".jax_cache"))
    import jax
    import jax.numpy as jnp

    from corpus_cache import make_corpus
    from leann_tpu.ops.beam import BeamSearchEngine
    from leann_tpu.ops.distance import _rescore_topk, exact_topk
    from leann_tpu.ops.pq import (
        encode_pq, encode_residual_pq, reconstruct_pq,
        reconstruct_residual_pq, train_pq, train_residual_pq)
    from leann_tpu.ops.vamana import build_vamana

    n, d = args.n, args.d
    log(f"devices: {jax.devices()}")

    for corpus_kind in args.corpora.split(","):
        rng = np.random.default_rng(args.seed)
        rows = n + args.queries
        if corpus_kind == "fullrank":
            pool = make_corpus(rng, rows, d, clusters=args.clusters)
            label = "fullrank"
        else:
            pool = make_lowdim(rng, rows, d, args.k, args.clusters)
            label = f"lowdim{args.k}"
        corpus, queries = pool[:n], pool[n:]
        t0 = time.time()
        _, oracle = exact_topk(queries, corpus, 10, metric="l2",
                               two_stage=True)
        oracle = np.asarray(oracle)
        log(f"{label}: corpus + oracle in {time.time()-t0:.0f}s")

        t0 = time.time()
        gc = os.path.join(
            os.path.dirname(os.path.abspath(__file__)), "artifacts",
            f"lowdim_graph_{label}_n{n}_d{d}_s{args.seed}.npz")
        if os.path.exists(gc):
            g = np.load(gc)
            adjacency, medoid = g["adjacency"], int(g["medoid"])
            log(f"{label}: graph cache {gc}")
        else:
            adjacency, medoid = build_vamana(
                corpus, graph_degree=32, complexity=64, metric="l2",
                wave_size=8192)
            np.savez_compressed(gc, adjacency=np.asarray(adjacency),
                                medoid=medoid)
            log(f"{label}: graph built in {time.time()-t0:.0f}s")

        corpus_dev = jnp.asarray(corpus)

        def rescore_recall(cand_ids):
            cand = np.asarray(cand_ids)
            cand = np.where(cand >= n, -1, cand).astype(np.int32)
            sort_idx = np.argsort(cand, axis=1)
            srt = np.take_along_axis(cand, sort_idx, axis=1)
            dup = np.concatenate(
                [np.zeros((cand.shape[0], 1), bool),
                 srt[:, 1:] == srt[:, :-1]], axis=1)
            dup_unsrt = np.empty_like(dup)
            np.put_along_axis(dup_unsrt, sort_idx, dup, axis=1)
            cand = np.where(dup_unsrt, -1, cand)
            _, ids = _rescore_topk(
                jnp.asarray(queries), corpus_dev, jnp.asarray(cand),
                10, "l2")
            ids = np.asarray(ids)
            return float(np.mean([
                len(set(ids[i].tolist()) & set(oracle[i].tolist())) / 10
                for i in range(len(oracle))
            ]))

        sample = corpus[np.random.default_rng(1).choice(
            n, min(n, 131_072), replace=False)]

        for variant in args.variants.split(","):
            t0 = time.time()
            if variant == "true":
                xh, rel = corpus, 0.0
            elif variant == "m16":
                books = train_pq(sample, m=16, ksub=256, iters=10)
                xh = reconstruct_pq(encode_pq(corpus, books), books)
                rel = float(np.linalg.norm(corpus - xh)
                            / np.linalg.norm(corpus))
            elif variant == "res":
                bc, bf = train_residual_pq(
                    sample, mc=2, mf=12, ksub=256, iters=10)
                codes, _ = encode_residual_pq(corpus, bc, bf)
                xh = reconstruct_residual_pq(codes, bc, bf)
                rel = float(np.linalg.norm(corpus - xh)
                            / np.linalg.norm(corpus))
            elif variant == "opq":
                from leann_tpu.ops.pq import train_opq

                rot, bo = train_opq(sample, m=16, ksub=256, iters=10,
                                    opq_iters=5)
                xh = reconstruct_pq(
                    encode_pq(corpus @ rot, bo), bo) @ rot.T
                rel = float(np.linalg.norm(corpus - xh)
                            / np.linalg.norm(corpus))
            elif variant == "resopq":
                # rotation learned on the single-level objective, then
                # residual (mc2+mf12) books trained in the rotated
                # frame — composes the two best variants; the engine
                # supports it directly (rotation= + coarse_m=)
                from leann_tpu.ops.pq import train_opq

                rot, _ = train_opq(sample, m=16, ksub=256, iters=10,
                                   opq_iters=5)
                bc, bf = train_residual_pq(
                    sample @ rot, mc=2, mf=12, ksub=256, iters=10)
                codes, _ = encode_residual_pq(corpus @ rot, bc, bf)
                xh = reconstruct_residual_pq(codes, bc, bf) @ rot.T
                rel = float(np.linalg.norm(corpus - xh)
                            / np.linalg.norm(corpus))
            else:
                raise ValueError(variant)
            log(f"{label}/{variant}: encoded in {time.time()-t0:.0f}s "
                f"(rel err {rel:.3f})")

            eng = BeamSearchEngine(xh, adjacency, medoid, metric="l2")
            for beam in [int(x) for x in args.beams.split(",")]:
                ids, _ = eng.search(queries, k=beam, beam_width=beam)
                print(json.dumps({
                    "corpus": label, "variant": variant, "n": n, "d": d,
                    "k": args.k if label != "fullrank" else d,
                    "recon_err": round(rel, 3), "beam": beam,
                    "recall_beam_rescore": round(rescore_recall(ids), 4),
                }), flush=True)
            del eng, xh


if __name__ == "__main__":
    main()
