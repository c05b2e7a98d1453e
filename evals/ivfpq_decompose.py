"""Host-side recall decomposition for the IVF-PQ engine at scale.

The ivfpq_10m hardware row measured recall@10 0.7999 (nprobe 16,
rescore_factor 16) vs the 0.9695 CPU smoke at 20k. This script pins
WHICH stage binds, with pure numpy on the cached artifacts (no TPU):

  1. coverage ceiling  — oracle rows whose cluster is probed
  2. ADC-rank ceiling  — covered oracle rows surviving the top-C ADC cut
  3. final recall      — after the exact rescore (== the engine's answer)

for a grid of (nprobe, rescore_factor). Uses the same kmeans cache and
books-training path as IvfPqEngine (seed-identical), so stage scores
are bit-meaningful for the engine.

  python evals/ivfpq_decompose.py --n 10000000 --d 96 --queries 128
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
    ap.add_argument("--n", type=int, default=10_000_000)
    ap.add_argument("--d", type=int, default=96)
    ap.add_argument("--m", type=int, default=16)
    ap.add_argument("--queries", type=int, default=128)
    ap.add_argument("--nprobes", default="8,16,32,64")
    ap.add_argument("--rescore-factors", default="16,32,64")
    args = ap.parse_args()

    n, d, m = args.n, args.d, args.m
    adir = os.path.join(os.path.dirname(os.path.abspath(__file__)),
                        "artifacts")
    sys.path.insert(0, os.path.dirname(os.path.abspath(__file__)))
    from corpus_cache import get_pool

    pool = get_pool(n, d)
    corpus = pool[:n]
    rq = np.asarray(pool[n:n + args.queries], dtype=np.float32)

    oc = os.path.join(adir, f"oracle_n{n}_d{d}_q1024.npz")
    oracle = np.load(oc)["oracle"][:args.queries]
    kc = os.path.join(adir, f"kmeans_n{n}_d{d}.npz")
    z = np.load(kc)
    centers, assign = z["centers"].astype(np.float32), z["assign"]
    k = centers.shape[0]
    log(f"kmeans cache: K={k}")

    # train the books exactly as IvfPqEngine.__init__ does (seed 0)
    from leann_tpu.ops.pq import encode_pq, train_pq

    rng = np.random.default_rng(0)
    samp_idx = rng.choice(n, min(262_144, n), replace=False)
    t0 = time.time()
    samp = np.asarray(corpus[np.sort(samp_idx)], dtype=np.float32)
    # order does not matter for k-means training content; use sorted
    # for memmap-friendly reads
    samp = samp - centers[assign[np.sort(samp_idx)]]
    books = train_pq(samp, m=m, ksub=256, iters=10, seed=0)
    log(f"books trained {time.time() - t0:.0f}s")

    nprobes = [int(x) for x in args.nprobes.split(",")]
    rfs = [int(x) for x in args.rescore_factors.split(",")]
    max_np = max(nprobes)

    # probe ranking per query (l2 negated-distance)
    cn = (centers * centers).sum(axis=1)
    cs = 2.0 * (rq @ centers.T) - cn[None, :]
    probe_order = np.argsort(-cs, axis=1)[:, :max_np]        # [Q, maxP]

    # members per needed cluster
    order = np.argsort(assign, kind="stable")
    counts = np.bincount(assign, minlength=k)
    starts = np.zeros(k + 1, dtype=np.int64)
    np.cumsum(counts, out=starts[1:])

    dsub = d // m
    bviews = books.reshape(m, 256, dsub)

    rows_out = []
    for np_i in nprobes:
        cov = np.zeros(len(rq))
        adc_frac = {rf: np.zeros(len(rq)) for rf in rfs}
        fin = {rf: np.zeros(len(rq)) for rf in rfs}
        t0 = time.time()
        for qi in range(len(rq)):
            probed = probe_order[qi, :np_i]
            member_ids = np.concatenate(
                [order[starts[c]:starts[c + 1]] for c in probed])
            oset = oracle[qi]
            in_probe = np.isin(oset, member_ids)
            cov[qi] = in_probe.mean()
            # ADC scores for the scanned rows: decode x_hat and score
            vecs = np.asarray(corpus[member_ids], dtype=np.float32)
            cent = centers[assign[member_ids]]
            resid = vecs - cent
            codes = encode_pq(resid, books)
            r_hat = np.zeros_like(resid)
            for j in range(m):
                r_hat[:, j * dsub:(j + 1) * dsub] = bviews[j][codes[:, j]]
            x_hat = cent + r_hat
            adc = (2.0 * (x_hat @ rq[qi])
                   - np.einsum("nd,nd->n", x_hat, x_hat))
            rank = np.argsort(-adc)
            exact = (2.0 * (vecs @ rq[qi])
                     - np.einsum("nd,nd->n", vecs, vecs))
            for rf in rfs:
                c_keep = rf * 10
                surv = member_ids[rank[:c_keep]]
                adc_frac[rf][qi] = np.isin(oset, surv).mean()
                top = surv[np.argsort(-exact[rank[:c_keep]])][:10]
                fin[rf][qi] = np.isin(oset, top).mean()
        for rf in rfs:
            row = {
                "nprobe": np_i, "rescore_factor": rf,
                "coverage": round(float(cov.mean()), 4),
                "adc_topc": round(float(adc_frac[rf].mean()), 4),
                "recall_at_10": round(float(fin[rf].mean()), 4),
                "queries": len(rq),
            }
            rows_out.append(row)
            print(json.dumps({"probe": "ivfpq-decompose", "n": n,
                              "d": d, "m": m, **row}), flush=True)
        log(f"nprobe {np_i} done {time.time() - t0:.0f}s")


if __name__ == "__main__":
    main()
