"""IVF-PQ engine on real TPU: recall + amortized device-time QPS.

The ADC-compressed IVF engine (ops/ivf_pq.py) exists for 100M-class
one-chip serving; this check measures it at the DEEP-10M shape (where
the bf16 IVF row is the direct baseline — same corpus, same k-means)
and reports the byte footprints alongside:

  python evals/ivfpq_device_check.py --n 10000000 --d 96
  python evals/ivfpq_device_check.py --n 1000000 --d 128   # 1M row

Methodology identical to evals/device_time.py: M query batches staged
on-device, one search_many_device dispatch, mean +/- std across >= 5
windows on distinct query data.
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
    ap.add_argument("--m", type=int, default=0, help="0 = auto by d")
    ap.add_argument("--b", type=int, default=2048)
    ap.add_argument("--nprobe", type=int, default=16)
    ap.add_argument("--rescore-factor", type=int, default=16)
    ap.add_argument("--rescore", default="int8")
    ap.add_argument("--reps", type=int, default=5)
    ap.add_argument("--mbatches", type=int, default=0, help="0 = auto ~2s")
    ap.add_argument("--recall-q", type=int, default=1024)
    ap.add_argument("--host-oracle", action="store_true",
                    help="compute the exact oracle with chunked numpy "
                         "on the host — for corpora beyond the chip's "
                         "f32 budget (the 30M+ rows this engine "
                         "exists for)")
    args = ap.parse_args()

    os.environ.setdefault(
        "JAX_COMPILATION_CACHE_DIR",
        os.path.join(os.path.dirname(os.path.dirname(
            os.path.abspath(__file__))), ".jax_cache"))
    import jax
    import jax.numpy as jnp

    from leann_tpu.ops.distance import exact_topk
    from leann_tpu.ops.ivf import kmeans
    from leann_tpu.ops.ivf_pq import IvfPqEngine

    n, d, b = args.n, args.d, args.b
    m = args.m or next((mm for mm in (16, 12, 8) if d % mm == 0), 0)
    log(f"devices: {jax.devices()}")
    adir = os.path.join(
        os.path.dirname(os.path.abspath(__file__)), "artifacts")
    from corpus_cache import get_pool

    pool = get_pool(n, d)
    corpus, rq = pool[:n], pool[n : n + args.recall_q]

    oc = os.path.join(adir, f"oracle_n{n}_d{d}_q{args.recall_q}.npz")
    if os.path.exists(oc):
        oracle = np.load(oc)["oracle"]
        log(f"oracle cache {oc}")
    elif args.host_oracle:
        # chunked numpy scan; l2 negated-distance convention (the
        # constant |q|^2 term drops out of the ranking)
        t0 = time.time()
        best_s = np.full((len(rq), 10), -np.inf, np.float32)
        best_i = np.full((len(rq), 10), -1, np.int64)
        chunk = 2_000_000
        for s in range(0, n, chunk):
            blk = corpus[s:s + chunk]
            sc = 2.0 * (rq @ blk.T) - (blk * blk).sum(axis=1)[None, :]
            all_s = np.concatenate([best_s, sc], axis=1)
            all_i = np.concatenate(
                [best_i,
                 np.broadcast_to(np.arange(s, s + blk.shape[0]),
                                 (len(rq), blk.shape[0]))], axis=1)
            pos = np.argpartition(-all_s, 10, axis=1)[:, :10]
            best_s = np.take_along_axis(all_s, pos, axis=1)
            best_i = np.take_along_axis(all_i, pos, axis=1)
        order = np.argsort(-best_s, axis=1)
        oracle = np.take_along_axis(best_i, order, axis=1)
        log(f"host oracle in {time.time()-t0:.0f}s")
        np.savez_compressed(oc, oracle=oracle)
    else:
        _, oracle = exact_topk(rq, corpus, 10, metric="l2", two_stage=True)
        oracle = np.asarray(oracle)
        np.savez_compressed(oc, oracle=oracle)

    kc = os.path.join(adir, f"kmeans_n{n}_d{d}.npz")
    centers = assign = None
    if os.path.exists(kc):
        z = np.load(kc)
        centers, assign = z["centers"], z["assign"]
        log(f"kmeans cache {kc}")
    t0 = time.time()
    eng = IvfPqEngine(
        corpus, metric="l2", m=m, rescore=args.rescore,
        centers=centers, assign=assign,
    )
    if centers is None:
        np.savez_compressed(kc, centers=eng.centers, assign=eng.assign)
    log(f"engine up in {time.time()-t0:.0f}s "
        f"(K'={eng.bucket_ids.shape[0]}, cap={eng.cap})")

    t0 = time.time()
    ids, _ = eng.search(rq, k=10, nprobe=args.nprobe,
                        rescore_factor=args.rescore_factor)
    log(f"first batch (compile) {time.time()-t0:.0f}s")
    recall = float(np.mean([
        len(set(ids[i].tolist()) & set(oracle[i].tolist())) / 10
        for i in range(len(oracle))
    ]))
    log(f"recall@10: {recall:.4f} @ nprobe {args.nprobe}")
    import recall_guard

    regression = recall_guard.check(f"ivfpq_n{n}_d{d}", recall)

    def draw_qs(mb, seed):
        r = np.random.default_rng(seed)
        base = corpus[r.integers(0, n, mb * b)]
        noise = r.standard_normal((mb * b, d)).astype(np.float32)
        return (base + noise).reshape(mb, b, d)

    def call(qs):
        return eng.search_many_device(
            qs, k=10, nprobe=args.nprobe,
            rescore_factor=args.rescore_factor)

    if args.mbatches:
        mb = args.mbatches
    else:
        probe = jnp.asarray(draw_qs(1, 99))
        jax.block_until_ready(call(probe))
        t0 = time.time()
        jax.block_until_ready(call(probe))
        t = time.time() - t0
        mb = int(max(4, min(256, 2.0 / max(t - 0.05, 1e-3))))
        log(f"probe batch {t*1e3:.1f}ms -> M={mb}")

    windows = [jax.device_put(jnp.asarray(draw_qs(mb, 1000 + w)))
               for w in range(min(args.reps, 3))]
    jax.block_until_ready(windows)
    jax.block_until_ready(call(windows[0]))
    times = []
    for i in range(args.reps):
        t0 = time.perf_counter()
        jax.block_until_ready(call(windows[i % len(windows)]))
        times.append(time.perf_counter() - t0)
    per_batch = np.array(times) / mb
    qps = b / per_batch
    codes_gb = float(np.prod(eng.bucket_codes.shape)) / 1e9
    rescore_bytes = {"int8": 1, "bf16": 2, "f32": 4}[args.rescore]
    print(json.dumps({
        "engine": "ivf-pq", "n": n, "d": d, "m": m,
        "nprobe": args.nprobe, "rescore": args.rescore,
        "rescore_factor": args.rescore_factor,
        "b": b, "mbatches": mb, "reps": args.reps,
        "recall_at_10": round(recall, 4),
        "device_ms_per_batch_mean": round(float(per_batch.mean() * 1e3), 3),
        "device_ms_per_batch_std": round(float(per_batch.std() * 1e3), 3),
        "device_qps_mean": round(float(qps.mean()), 1),
        "device_qps_std": round(float(qps.std()), 1),
        "codes_gb": round(codes_gb, 2),
        "rescore_corpus_gb": round(n * d * rescore_bytes / 1e9, 2),
        "bf16_engine_gb": round(n * d * 6 / 1e9, 2),
        **({"recall_regression": True} if regression else {}),
    }), flush=True)
    if regression:
        sys.exit(3)


if __name__ == "__main__":
    main()
