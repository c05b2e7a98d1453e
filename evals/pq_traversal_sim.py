"""PQ-traversal recall simulation — de-risks the DEEP-10M fused kernel.

Question: if graph traversal scores candidates from PQ codes (ADC)
instead of int8 rows, and the final selection exactly rescores the beam
(optionally + the visited set), what recall@10 survives?

Method: reconstruct x_hat from trained PQ codes and hand the TRAVERSAL
engine x_hat as its corpus — scoring against x_hat is numerically
identical to ADC LUT scoring (sum_j <q_j, C[j, code_j]>), so the
measured recall is the recall of a PQ-scoring kernel without writing
the kernel first. Final candidates are rescored against the TRUE f32
corpus, mirroring the planned kernel contract (PQ navigate, exact
select).

  python evals/pq_traversal_sim.py --n 1000000 --d 128 --m 16
  python evals/pq_traversal_sim.py --n 10000000 --d 96 --m 12 --xla

Outputs one JSON line per (beam, rescore-pool) config.
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
    ap.add_argument("--m", type=int, default=16)
    ap.add_argument("--ksub", type=int, default=256)
    ap.add_argument("--beams", default="32,64,96")
    ap.add_argument("--queries", type=int, default=1024)
    ap.add_argument("--xla", action="store_true",
                    help="use the XLA beam engine (10M: fused inline "
                         "blocks for x_hat would not fit)")
    ap.add_argument("--artifact", default=None)
    ap.add_argument("--residual", type=int, default=0, metavar="NC",
                    help="IVF-PQ style: subtract the nearest of NC "
                         "coarse centroids, PQ-encode the RESIDUAL; "
                         "x_hat = coarse[assign] + decode(codes). "
                         "Same per-node byte budget + a 2B coarse id "
                         "(ADC adds one [NC] table lookup per cand).")
    ap.add_argument("--coarse", type=int, default=0, metavar="MC",
                    help="the KERNEL-feasible residual form: the coarse "
                         "quantizer is itself a product quantizer over "
                         "MC subspaces (ksub^MC effective cells), so "
                         "every code column is a uniform ADC subspace "
                         "(ops/pq.py train_residual_pq). --m is the "
                         "FINE subspace count.")
    args = ap.parse_args()

    os.environ.setdefault(
        "JAX_COMPILATION_CACHE_DIR",
        os.path.join(os.path.dirname(os.path.dirname(
            os.path.abspath(__file__))), ".jax_cache"))
    import faulthandler
    import signal

    faulthandler.register(signal.SIGUSR1)  # kill -USR1 <pid> -> stacks

    import jax
    import jax.numpy as jnp

    from leann_tpu.ops.distance import _rescore_topk, exact_topk
    from leann_tpu.ops.pq import encode_pq, reconstruct_pq, train_pq

    n, d = args.n, args.d
    art = args.artifact or os.path.join(
        os.path.dirname(os.path.abspath(__file__)), "artifacts",
        f"vamana_n{n}_r48_l{80 if n <= 1_000_000 else 64}.npz")
    log(f"devices: {jax.devices()}")
    t0 = time.time()
    rng = np.random.default_rng(0)  # only PQ-train sampling below
    from corpus_cache import get_pool

    pool = get_pool(n, d)
    corpus, queries = pool[:n], pool[n : n + args.queries]
    log(f"corpus in {time.time()-t0:.0f}s")
    t0 = time.time()
    a = np.load(art)
    adjacency, medoid = a["adjacency"], int(a["medoid"])
    log(f"artifact {art} loaded in {time.time()-t0:.0f}s")

    t0 = time.time()
    suffix = f"_res{args.residual}" if args.residual else ""
    if args.coarse:
        suffix = f"_coarse{args.coarse}"
    pc = os.path.join(
        os.path.dirname(os.path.abspath(__file__)), "artifacts",
        f"pq_n{n}_d{d}_m{args.m}_k{args.ksub}{suffix}.npz")
    if args.coarse:
        from leann_tpu.ops.pq import (
            encode_residual_pq, reconstruct_residual_pq, train_residual_pq)

        if os.path.exists(pc):
            z = np.load(pc)
            books_c, books_f, codes = z["books_c"], z["books_f"], z["codes"]
            log(f"pq cache {pc}")
        else:
            sample = corpus[rng.choice(n, min(n, 262_144), replace=False)]
            books_c, books_f = train_residual_pq(
                sample, mc=args.coarse, mf=args.m, ksub=args.ksub, iters=10)
            codes, _ = encode_residual_pq(corpus, books_c, books_f)
            np.savez_compressed(
                pc, books_c=books_c, books_f=books_f, codes=codes)
        xh = reconstruct_residual_pq(codes, books_c, books_f)
        rel = float(np.linalg.norm(corpus[:100_000] - xh[:100_000])
                    / np.linalg.norm(corpus[:100_000]))
        log(f"coarse-pq mc={args.coarse} mf={args.m} encoded in "
            f"{time.time()-t0:.0f}s; rel recon err {rel:.3f}")
    elif os.path.exists(pc):
        z = np.load(pc)
        books, codes = z["books"], z["codes"]
        coarse = z["coarse"] if args.residual else None
        assign = z["assign"] if args.residual else None
        log(f"pq cache {pc}")
    elif args.residual:
        from leann_tpu.ops.ivf import _assign_chunked, kmeans

        nc = args.residual
        tr = corpus[rng.choice(n, min(n, 1_048_576), replace=False)]
        coarse, _ = kmeans(tr, nc, iters=8)
        import jax as _jax
        import jax.numpy as _jnp

        assign = np.empty(n, np.int32)
        cd = _jnp.asarray(coarse)
        step = 262_144
        for s in range(0, n, step):
            e = min(n, s + step)
            assign[s:e] = np.asarray(_assign_chunked(
                _jnp.asarray(corpus[s:e]), cd, nc, "l2",
                min(65536, e - s)))[: e - s]
        log(f"coarse assign done {time.time()-t0:.0f}s")
        resid = corpus - coarse[assign]
        sample = resid[rng.choice(n, min(n, 262_144), replace=False)]
        books = train_pq(sample, m=args.m, ksub=args.ksub, iters=10)
        codes = encode_pq(resid, books)
        del resid
        np.savez_compressed(pc, books=books, codes=codes,
                            coarse=coarse, assign=assign)
    else:
        sample = corpus[rng.choice(n, 262_144, replace=False)]
        books = train_pq(sample, m=args.m, ksub=args.ksub, iters=10)
        codes = encode_pq(corpus, books)
        np.savez_compressed(pc, books=books, codes=codes)
    if not args.coarse:
        xh = reconstruct_pq(codes, books)
        if args.residual:
            xh += coarse[assign]
        rel = float(np.linalg.norm(corpus[:100_000] - xh[:100_000])
                    / np.linalg.norm(corpus[:100_000]))
        log(f"pq trained+encoded in {time.time()-t0:.0f}s; "
            f"rel recon err {rel:.3f}")

    oc = os.path.join(
        os.path.dirname(os.path.abspath(__file__)), "artifacts",
        f"oracle_n{n}_d{d}_q{args.queries}.npz")
    if os.path.exists(oc):
        oracle = np.load(oc)["oracle"]
        log(f"oracle cache {oc}")
    else:
        log("oracle ...")
        _, oracle = exact_topk(
            queries, corpus, 10, metric="l2", two_stage=True)
        oracle = np.asarray(oracle)
        np.savez_compressed(oc, oracle=oracle)

    corpus_dev = jnp.asarray(corpus)  # true vectors for the final rescore

    def rescore_recall(cand_ids):
        """cand_ids [B, C] (may contain sentinel n) -> recall@10 after
        exact f32 rescore against the true corpus."""
        cand = np.asarray(cand_ids)
        cand = np.where(cand >= n, -1, cand).astype(np.int32)
        # dedupe within row (keep first occurrence) to avoid top-k dupes
        sort_idx = np.argsort(cand, axis=1)
        srt = np.take_along_axis(cand, sort_idx, axis=1)
        dup = np.concatenate(
            [np.zeros((cand.shape[0], 1), bool), srt[:, 1:] == srt[:, :-1]],
            axis=1)
        dup_unsrt = np.empty_like(dup)
        np.put_along_axis(dup_unsrt, sort_idx, dup, axis=1)
        cand = np.where(dup_unsrt, -1, cand)
        _, ids = _rescore_topk(
            jnp.asarray(queries), corpus_dev, jnp.asarray(cand), 10, "l2")
        ids = np.asarray(ids)
        return float(np.mean([
            len(set(ids[i].tolist()) & set(oracle[i].tolist())) / 10
            for i in range(len(oracle))
        ]))

    for beam in [int(x) for x in args.beams.split(",")]:
        if args.xla:
            from leann_tpu.ops.beam import BeamSearchEngine

            eng = BeamSearchEngine(
                xh, adjacency, medoid, metric="l2")
            ids, _ = eng.search(queries, k=beam, beam_width=beam)
            row = {
                "engine": "xla", "n": n, "d": d, "m": args.m,
                "residual": args.residual, "coarse": args.coarse,
                "ksub": args.ksub, "beam": beam, "recon_err": round(rel, 3),
                "recall_beam_rescore": round(rescore_recall(ids), 4),
            }
        else:
            from leann_tpu.ops.fused_beam import (
                FusedBeamEngine, fused_beam_search)

            eng = FusedBeamEngine(xh, adjacency, medoid, metric="l2")
            # seed select + kernel with visited tracking (mirrors
            # _fused_search_jit but keeps the vlog output)
            q = jnp.asarray(queries)
            qb16 = q.astype(jnp.bfloat16)
            sd = jnp.einsum("md,bd->bm", eng.seed_vecs, qb16,
                            preferred_element_type=jnp.float32)
            sd = 2.0 * sd - eng.sq_norms[eng.seed_ids][None, :]
            s_eff = min(16, eng.seed_ids.shape[0])
            entry_sc, best = jax.lax.top_k(sd, s_eff)
            entry = eng.seed_ids[best]
            exc = jnp.full((len(queries),), -1, jnp.int32)
            mi = (4 * beam) // 2 + 32
            beam_ids, _, vlog = fused_beam_search(
                q, eng.blocks, eng.meta, entry, entry_sc, exc,
                r=eng.r, beam_width=beam, max_iters=mi, metric="l2",
                expansions=2, qb=16, ring_size=1024, track_visited=256)
            row = {
                "engine": "fused-int8(xhat)", "n": n, "d": d, "m": args.m,
                "residual": args.residual, "coarse": args.coarse,
                "ksub": args.ksub, "beam": beam, "recon_err": round(rel, 3),
                "recall_beam_rescore": round(rescore_recall(beam_ids), 4),
                "recall_beam+visited_rescore": round(rescore_recall(
                    np.concatenate([np.asarray(beam_ids),
                                    np.asarray(vlog)], axis=1)), 4),
            }
        print(json.dumps(row), flush=True)
        del eng


if __name__ == "__main__":
    main()
