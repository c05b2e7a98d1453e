"""Quantizer design ladder for PQ-navigated graph serving.

Measures, on the bench corpus geometry (96d, 1024 gaussian clusters,
sigma 1, centers 4x N(0,1)), the reconstruction error |e| of each
16-byte/node quantizer candidate, against the within-cluster ranking
threshold derived in RESULTS_r3.md section 2: ADC ranking inside a
cluster survives when |e| is small vs the ~sqrt(2 d) within-cluster
neighbor distance (|e| <~ 6 at d=96, sigma=1; single-level m=16
measures |e| ~ 15 and collapses).

Candidates (all <= 16 bytes/node including 2 norm bytes):
  m16        single-level PQ, 16 subspaces of 6d          (the collapse)
  mc2+mf12   product-coarse (2x48d) + fine-12 + norms     (kernel as-is)
  rq2+mf12   residual-chain coarse (2 full-d kmeans-256 stages)
             + fine-12 + norms                            (kernel as-is)
  flat1024+mf12  kmeans-1024 coarse (2 bytes) + fine-12
             + norms                                      (needs the
             wide-column kernel path: one 10-bit gated column)

Run:  JAX_PLATFORMS=cpu python evals/quantizer_ladder.py [--n 200000]
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
    ap.add_argument("--n", type=int, default=200_000)
    ap.add_argument("--d", type=int, default=96)
    ap.add_argument("--clusters", type=int, default=1024)
    ap.add_argument("--iters", type=int, default=8)
    ap.add_argument("--seed", type=int, default=0)
    args = ap.parse_args()
    os.environ.setdefault("JAX_PLATFORMS", "cpu")

    from leann_tpu.ops.ivf import _assign_chunked, kmeans
    from leann_tpu.ops.pq import (
        encode_pq, encode_residual_pq, reconstruct_pq,
        reconstruct_residual_pq, train_pq, train_residual_pq,
    )

    import jax.numpy as jnp

    n, d = args.n, args.d
    rng = np.random.default_rng(args.seed)
    centers = 4.0 * rng.standard_normal((args.clusters, d)).astype(
        np.float32)
    cid = rng.integers(0, args.clusters, n)
    x = centers[cid] + rng.standard_normal((n, d)).astype(np.float32)
    xn = float(np.linalg.norm(x))
    # ranking threshold: |e| vs within-cluster nn distance sqrt(2 d)
    thresh = np.sqrt(2.0 * d)

    def assign(v, cents):
        chunk = min(65536, len(v))
        pad = (-len(v)) % chunk
        vp = np.concatenate([v, v[:pad]]) if pad else v
        return np.asarray(_assign_chunked(
            jnp.asarray(vp), jnp.asarray(cents), cents.shape[0], "l2",
            chunk))[: len(v)]

    def report(name, xh, extra=None):
        e = x - xh
        abs_e = float(np.sqrt((e * e).sum(1).mean()))
        row = {
            "name": name, "n": n, "d": d,
            "rel_err": round(float(np.linalg.norm(e)) / xn, 4),
            "abs_e_rms": round(abs_e, 2),
            "vs_rank_thresh": round(abs_e / thresh, 3),
        }
        if extra:
            row.update(extra)
        print(json.dumps(row), flush=True)

    t0 = time.time()
    b16 = train_pq(x[:262_144], m=16, ksub=256, iters=args.iters)
    report("m16", reconstruct_pq(encode_pq(x, b16), b16),
           {"t_s": round(time.time() - t0)})

    t0 = time.time()
    bc, bf = train_residual_pq(
        x[:262_144], mc=2, mf=12, ksub=256, iters=args.iters)
    codes, _ = encode_residual_pq(x, bc, bf)
    report("mc2+mf12", reconstruct_residual_pq(codes, bc, bf),
           {"t_s": round(time.time() - t0)})

    # residual-chain coarse: 2 full-d kmeans-256 stages, then fine-12
    t0 = time.time()
    s = x[:262_144]
    c1, _ = kmeans(s, 256, iters=args.iters)
    r1 = s - c1[assign(s, c1)]
    c2, _ = kmeans(r1, 256, iters=args.iters)
    dec = c1[assign(x, c1)]
    dec += c2[assign(x - dec, c2)]
    resid = x - dec
    bfq = train_pq(resid[:262_144], m=12, ksub=256, iters=args.iters)
    report("rq2+mf12",
           dec + reconstruct_pq(encode_pq(resid, bfq), bfq),
           {"t_s": round(time.time() - t0),
            "coarse_rel": round(float(np.linalg.norm(resid)) / xn, 4)})

    # OPQ m16: learned rotation before single-level PQ (ops/pq.py
    # train_opq). Expectation on THIS corpus: ~no gain — the
    # within-cluster residual is isotropic, so no rotation can
    # concentrate energy (the measured confirmation that the collapse
    # is rate-distortion-bound, not a codebook-layout artifact). On
    # anisotropic/low-intrinsic-dim corpora OPQ wins (tests/test_pq.py,
    # evals/pq_lowdim_sim.py).
    t0 = time.time()
    from leann_tpu.ops.pq import train_opq

    rot, bo = train_opq(x[:131_072], m=16, ksub=256, iters=args.iters,
                        opq_iters=5)
    report("opq-m16",
           reconstruct_pq(encode_pq(x @ rot, bo), bo) @ rot.T,
           {"t_s": round(time.time() - t0)})

    # flat kmeans-1024 coarse (2 bytes), fine-12 on the residual
    t0 = time.time()
    cf, _ = kmeans(x[:262_144], 1024, iters=args.iters)
    dec = cf[assign(x, cf)]
    resid = x - dec
    bff = train_pq(resid[:262_144], m=12, ksub=256, iters=args.iters)
    report("flat1024+mf12",
           dec + reconstruct_pq(encode_pq(resid, bff), bff),
           {"t_s": round(time.time() - t0),
            "coarse_rel": round(float(np.linalg.norm(resid)) / xn, 4)})


if __name__ == "__main__":
    main()
