"""Random row-gather roofline: XLA take vs Pallas DMA descriptors.

The decision this measures (RESULTS_r3 section 2): the XLA graph engine
at DEEP-10M is gather-bound (~12M random corpus rows per served batch
of 2048 at R=48, ~120 hops). VERDICT r2 #2 proposed a pointer-gather
traversal kernel (shared int8 corpus + adjacency, no inline
duplication). Its ceiling is EXACTLY the random-row-gather throughput
measured here: if Pallas DMA descriptors cannot beat XLA's gather
lowering by >= 3-5x at 10M scale, a pointer-gather traversal kernel
cannot reach 10k QPS and the inline-record designs (fused_beam,
pq_beam) remain the only fast path.

Both engines run the identical op: scores[b,j] = <q_b, corpus[ids_bj]>
over a [N, 128] int8 corpus resident in HBM. ids are uniform random —
the same access pattern as graph traversal past the first hops.

Upper-bound caveat: here ids are known before the call, so the Pallas
pipeline overlaps block i's DMA waits with block i-1's compute; a
traversal kernel pointer-chases (hop i+1 depends on hop i) and hides
less. Treat the Pallas number as the OPTIMISTIC bound for a traversal
kernel, and the ratio to XLA as the honest signal.

  python evals/gather_roofline.py --n 10000000 --b 2048 --r 48
  python evals/gather_roofline.py --n 1000000 --m-scan 100

One JSON line per engine: rows/s, effective GB/s, and the derived
traversal-QPS ceiling at R=48 x 120 hops.
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
    ap.add_argument("--b", type=int, default=2048)
    ap.add_argument("--r", type=int, default=48)
    ap.add_argument("--qb", type=int, default=4)
    ap.add_argument("--m-scan", type=int, default=50,
                    help="calls per timed dispatch (lax.scan) — "
                         "amortizes relay latency out of the window")
    ap.add_argument("--reps", type=int, default=30)
    ap.add_argument("--hops", type=int, default=120,
                    help="hops assumed for the traversal-QPS ceiling")
    ap.add_argument("--engines", default="xla,pallas")
    ap.add_argument("--interpret", action="store_true")
    args = ap.parse_args()

    os.environ.setdefault(
        "JAX_COMPILATION_CACHE_DIR",
        os.path.join(os.path.dirname(os.path.dirname(
            os.path.abspath(__file__))), ".jax_cache"))
    import jax
    import jax.numpy as jnp

    from leann_tpu.ops.gather_score import (
        _gather_score_call, gather_score_xla)

    n, b, r, qb, ms = args.n, args.b, args.r, args.qb, args.m_scan
    interpret = args.interpret or jax.default_backend() == "cpu"
    log(f"devices: {jax.devices()} interpret={interpret}")

    rng = np.random.default_rng(0)
    t0 = time.time()
    corpus = rng.integers(-128, 128, (n, 128), dtype=np.int64).astype(
        np.int8)
    corpus_dev = jnp.asarray(corpus)
    del corpus
    log(f"corpus [{n}, 128] int8 on device in {time.time()-t0:.0f}s "
        f"({n * 128 / 1e9:.2f} GB)")

    queries = jnp.asarray(
        rng.standard_normal((b, 128)).astype(np.float32))
    # distinct ids per scan step AND per timed window
    def make_ids():
        ids = rng.integers(0, n, (ms, b, 128), dtype=np.int64).astype(
            np.int32)
        return jnp.asarray(ids)

    windows = [make_ids() for _ in range(min(4, args.reps))]

    import functools

    @functools.partial(jax.jit, static_argnames=("engine",))
    def run_many(ids_scan, engine):
        def body(_, ids):
            if engine == "pallas":
                out = _gather_score_call(
                    ids, queries, corpus_dev, r, qb, interpret)
            else:
                out = gather_score_xla(
                    corpus_dev, ids[:, :r], queries)
            # fold to a scalar so scan output stays tiny
            return None, jnp.sum(out)
        _, sums = jax.lax.scan(body, None, ids_scan)
        return sums

    rows_per_call = b * r
    for engine in args.engines.split(","):
        t0 = time.time()
        jax.block_until_ready(run_many(windows[0], engine))
        log(f"{engine}: compile+warmup {time.time()-t0:.0f}s")
        times = []
        for i in range(args.reps):
            w = windows[i % len(windows)]
            t0 = time.perf_counter()
            jax.block_until_ready(run_many(w, engine))
            times.append(time.perf_counter() - t0)
        per_call = float(np.mean(times)) / ms
        std_call = float(np.std(times)) / ms
        rows_s = rows_per_call / per_call
        row = {
            "engine": f"gather-{engine}", "n": n, "b": b, "r": r,
            "qb": qb, "m_scan": ms, "reps": args.reps,
            "per_call_ms": round(per_call * 1e3, 4),
            "per_call_std_ms": round(std_call * 1e3, 4),
            "rows_per_s": round(rows_s),
            "eff_gb_s": round(rows_s * 128 / 1e9, 2),
            # a traversal batch needs hops sequential gathers of B*R
            "traversal_qps_ceiling": round(rows_s / (r * args.hops)),
            "interpret": interpret,
        }
        print(json.dumps(row), flush=True)


if __name__ == "__main__":
    main()
