"""Device-only timing for every engine: the honest QPS measurement.

Round-2 numbers all sat at the ~9-dispatches/s relay ceiling (~110ms
per dispatch of host->device->host), so every engine "converged" at
~19-23k QPS regardless of its actual device cost (VERDICT r2, weak #1).
This harness measures device time by amortization: queries are staged
on-device as [M, B, D], one `search_many_device` dispatch runs all M
batches via lax.scan, and wall time across the blocking collect is
divided by M. Relay overhead amortizes as 1/M; at M*t_batch >= ~2s the
residual is <2% of the measurement.

Reports mean +/- std across >= `reps` independent timed windows (each a
full M-batch dispatch on distinct query data), plus arithmetic
MFU / HBM-bandwidth utilization against v5e peaks so each engine can be
placed on the roofline. Writes one JSON line per engine row.

Usage:
  python evals/device_time.py --backend flat,ivf,vamana --n 1000000
  python evals/device_time.py --backend flat --b 8192 --n 1000000

Role in the reference: this is the rigor the reference's criterion
micro-benches (`/root/reference/benches/benchmarks.rs`) never had — no
committed results, CPU-only, algorithm copies. Here the measured object
is the shipping engine code on the shipping hardware.
"""

from __future__ import annotations

import argparse
import json
import os
import sys
import time

import numpy as np

# v5e single-chip peaks (public spec): bf16 394 TFLOP/s, HBM 819 GB/s
PEAK_BF16_FLOPS = 394e12
PEAK_HBM_BPS = 819e9


def log(msg: str) -> None:
    print(msg, file=sys.stderr, flush=True)


def time_many(engine_call, qs_dev, reps):
    """Run `engine_call(qs_dev[i])` for reps distinct windows; each call
    is ONE dispatch of M batches. Returns per-window seconds list."""
    import jax

    # warmup/compile on window 0
    out = engine_call(qs_dev[0])
    jax.block_until_ready(out)
    times = []
    for i in range(reps):
        t0 = time.perf_counter()
        out = engine_call(qs_dev[i % len(qs_dev)])
        jax.block_until_ready(out)
        times.append(time.perf_counter() - t0)
    return times


def main():
    ap = argparse.ArgumentParser()
    ap.add_argument("--backend", default="flat,ivf,vamana")
    ap.add_argument("--n", type=int, default=1_000_000)
    ap.add_argument("--d", type=int, default=128)
    ap.add_argument("--b", type=int, default=2048)
    ap.add_argument("--m", type=int, default=0,
                    help="batches per dispatch (0 = auto-target ~2s)")
    ap.add_argument("--reps", type=int, default=5)
    ap.add_argument("--k", type=int, default=10)
    ap.add_argument("--beam", type=int, default=64)
    ap.add_argument("--expansions", type=int, default=2,
                    help="beam entries expanded per hop (graph engines);"
                         " E=4 halves sequential gather rounds vs E=2 at"
                         " the same total gathered rows")
    ap.add_argument("--nprobe", type=int, default=0)
    ap.add_argument("--recall-q", type=int, default=1024)
    ap.add_argument("--artifact", default=None,
                    help="graph .npz for vamana/xla-graph (default: the "
                         "committed artifact for this n)")
    ap.add_argument("--out", default=None)
    ap.add_argument("--trace", default=None, metavar="DIR",
                    help="capture one jax.profiler device trace per "
                         "backend under DIR/<backend>")
    args = ap.parse_args()

    os.environ.setdefault(
        "JAX_COMPILATION_CACHE_DIR",
        os.path.join(os.path.dirname(os.path.dirname(
            os.path.abspath(__file__))), ".jax_cache"),
    )
    import faulthandler
    import signal

    faulthandler.register(signal.SIGUSR1)  # kill -USR1 <pid> -> stacks

    import jax
    import jax.numpy as jnp

    log(f"devices: {jax.devices()}")
    n, d, b = args.n, args.d, args.b
    from corpus_cache import get_pool

    pool = get_pool(n, d)
    corpus, rq = pool[:n], pool[n : n + args.recall_q]

    from leann_tpu.ops.distance import exact_topk

    oc = os.path.join(
        os.path.dirname(os.path.abspath(__file__)), "artifacts",
        f"oracle_n{n}_d{d}_q{args.recall_q}.npz")
    if os.path.exists(oc) and args.k <= 10:
        oracle = np.load(oc)["oracle"][:, : args.k]
        log(f"oracle cache {oc}")
    else:
        log("oracle ...")
        _, oracle = exact_topk(
            rq, corpus, args.k, metric="l2", two_stage=True)
        oracle = np.asarray(oracle)
        if args.k == 10:
            np.savez_compressed(oc, oracle=oracle)

    # fresh query pool for timing: on-manifold, distinct per window
    def draw_qs(m, seed):
        r = np.random.default_rng(seed)
        base = corpus[r.integers(0, n, m * b)]
        noise = r.standard_normal((m * b, d)).astype(np.float32)
        return (base + noise).reshape(m, b, d)

    nprobe = args.nprobe or (8 if n >= 500_000 else 16)
    guard_path = os.path.join(
        os.path.dirname(os.path.abspath(__file__)), "expected_recall.json")
    with open(guard_path) as f:
        expected_recall = {
            k: v for k, v in json.load(f).items() if not k.startswith("_")}
    any_regression = False
    rows = []
    for backend in args.backend.split(","):
        log(f"=== {backend} ===")
        if backend == "flat":
            from leann_tpu.ops.distance import ExactEngine

            eng = ExactEngine(corpus, metric="l2")
            call = lambda qs: eng.search_many_device(qs, k=args.k)  # noqa: E731
            # roofline: stage-1 bf16 scan dominates
            flops_per_batch = 2.0 * n * d * b
            bytes_per_batch = n * d * 2.0
            knobs = "two-stage bf16+rescore"
            rec_ids, _ = eng.search_device(jnp.asarray(rq), k=args.k)
        elif backend == "ivf":
            from leann_tpu.ops.ivf import IvfEngine

            clusters = max(64, int(2 * n ** 0.5))
            eng = IvfEngine(corpus, n_clusters=clusters, metric="l2")
            call = lambda qs: eng.search_many_device(  # noqa: E731
                qs, k=args.k, nprobe=nprobe)
            nb = eng.bucket_cent.shape[0]
            cap = eng.bucket_vecs_bf16.shape[1]
            # probed-bucket scan + centroid scan
            flops_per_batch = 2.0 * b * d * (nprobe * cap + nb)
            bytes_per_batch = min(nb, b * nprobe) * cap * d * 2.0
            knobs = f"clusters={clusters}, nprobe={nprobe}, cap={cap}"
            rec_ids, _ = eng.search_device(
                jnp.asarray(rq), k=args.k, nprobe=nprobe)
        elif backend == "ivf8":
            from leann_tpu.ops.ivf_int8 import IvfInt8Engine

            clusters = max(64, int(2 * n ** 0.5))
            kc = os.path.join(
                os.path.dirname(os.path.abspath(__file__)), "artifacts",
                f"kmeans_n{n}_d{d}.npz")
            centers = assign = None
            if os.path.exists(kc):
                z = np.load(kc)
                centers, assign = z["centers"], z["assign"]
                log(f"kmeans cache {kc}")
            eng = IvfInt8Engine(corpus, n_clusters=clusters, metric="l2",
                                centers=centers, assign=assign)
            call = lambda qs: eng.search_many_device(  # noqa: E731
                qs, k=args.k, nprobe=nprobe)
            nb = eng.bucket_cent.shape[0]
            cap = eng.cap
            flops_per_batch = 2.0 * b * d * (nprobe * cap + nb)
            bytes_per_batch = min(nb, b * nprobe) * cap * d * 1.0
            knobs = f"clusters={eng.n_clusters}, nprobe={nprobe}, cap={cap}"
            if os.environ.get("LEANN_IVF8_PALLAS") == "1":
                knobs += ", pallas-scan"
            rec_ids, _ = eng.search_device(
                jnp.asarray(rq), k=args.k, nprobe=nprobe)
        elif backend == "vamana":
            from leann_tpu.ops.fused_beam import FusedBeamEngine

            art = args.artifact or os.path.join(
                os.path.dirname(os.path.abspath(__file__)), "artifacts",
                f"vamana_n{n}_r48_l80.npz")
            if not os.path.exists(art):
                log(f"no artifact {art}; skipping vamana")
                continue
            a = np.load(art)
            eng = FusedBeamEngine(
                corpus, a["adjacency"], int(a["medoid"]), metric="l2")
            call = lambda qs: eng.search_many_device(  # noqa: E731
                qs, k=args.k, beam_width=args.beam)
            # per hop: qb*e records of r*d int8 DMA'd + scored
            flops_per_batch = 0.0  # not matmul-roofline-shaped
            bytes_per_batch = 0.0
            knobs = (f"R={eng.r}, beam={args.beam}, fused-kernel, "
                     f"visited={eng.visited_pool}")
            rec_ids, _ = eng.search_device(rq, k=args.k,
                                           beam_width=args.beam)
        elif backend == "xla-graph":
            # row-gather XLA traversal + visited-log merge: the 10M/
            # odd-dim config where inline layouts exceed HBM
            from leann_tpu.ops.beam import BeamSearchEngine

            art = args.artifact or os.path.join(
                os.path.dirname(os.path.abspath(__file__)), "artifacts",
                f"vamana_n{n}_r48_l{80 if n <= 1_000_000 else 64}.npz")
            if not os.path.exists(art):
                log(f"no artifact {art}; skipping xla-graph")
                continue
            a = np.load(art)
            t0 = time.time()
            eng = BeamSearchEngine(
                corpus, a["adjacency"], int(a["medoid"]), metric="l2",
                block_mode="none", expansions=args.expansions)
            log(f"engine up in {time.time()-t0:.0f}s")
            call = lambda qs: eng.search_many_device(  # noqa: E731
                qs, k=args.k, beam_width=args.beam)
            flops_per_batch = 0.0
            bytes_per_batch = 0.0
            knobs = (f"R={a['adjacency'].shape[1]}, beam={args.beam}, "
                     f"E={args.expansions}, "
                     f"xla-row-gather, visited={eng.visited_pool}, "
                     f"graph={os.path.basename(art)}")
            t0 = time.time()
            rec_ids, _ = eng.search(rq, k=args.k, beam_width=args.beam)
            log(f"recall batch (incl compile) {time.time()-t0:.0f}s")
        else:
            raise SystemExit(f"unknown backend {backend}")

        recall = float(np.mean([
            len(set(np.asarray(rec_ids)[i, :args.k].tolist())
                & set(oracle[i].tolist())) / args.k
            for i in range(len(oracle))
        ]))
        log(f"recall@{args.k}: {recall:.4f}")

        # recall-regression guard (VERDICT r3 #6): silent drift in a
        # committed row must fail the step, not pass unremarked
        expected = expected_recall.get(f"{backend}_n{n}_d{d}")
        regression = None
        if expected is not None and recall < expected - 0.002:
            regression = {"expected": expected, "measured": round(recall, 4)}
            log(f"RECALL REGRESSION: {recall:.4f} < committed "
                f"{expected:.4f} - 0.002")
            any_regression = True

        # pick M: target ~2s per dispatch using a 1-batch probe
        if args.m:
            m = args.m
        else:
            probe = jnp.asarray(draw_qs(1, 99))
            t = min(time_many(call, [probe], 3))
            # target ~2s windows; do NOT subtract dispatch overhead from
            # the probe time — for slow batches (B=8192) that inflated M
            # to 512 and blew up window length/memory (round-3 8k step)
            m = int(max(4, min(512, 2.0 / max(t, 1e-3))))
            log(f"probe batch {t*1e3:.1f}ms -> M={m}")

        qs_windows = [
            jax.device_put(jnp.asarray(draw_qs(m, 1000 + w)))
            for w in range(min(args.reps, 3))
        ]
        jax.block_until_ready(qs_windows)
        times = time_many(call, qs_windows, args.reps)
        if args.trace:
            # one traced window per backend: the committed roofline
            # evidence (op-level device time, fusion boundaries, HBM
            # stalls) behind the amortized numbers
            tdir = os.path.join(args.trace, backend)
            with jax.profiler.trace(tdir):
                jax.block_until_ready(call(qs_windows[0]))
            log(f"profiler trace -> {tdir}")
        per_batch = np.array(times) / m
        qps = b / per_batch
        row = {
            "backend": backend,
            "n": n, "d": d, "b": b, "m": m, "reps": args.reps,
            "knobs": knobs,
            "recall_at_k": round(recall, 4),
            "device_ms_per_batch_mean": round(
                float(per_batch.mean() * 1e3), 3),
            "device_ms_per_batch_std": round(
                float(per_batch.std() * 1e3), 3),
            "device_qps_mean": round(float(qps.mean()), 1),
            "device_qps_std": round(float(qps.std()), 1),
            "window_s": round(float(np.mean(times)), 2),
        }
        if regression is not None:
            row["recall_regression"] = regression
        if flops_per_batch:
            row["mfu_pct"] = round(
                100.0 * flops_per_batch / per_batch.mean()
                / PEAK_BF16_FLOPS, 2)
        if bytes_per_batch:
            row["hbm_bw_pct"] = round(
                100.0 * bytes_per_batch / per_batch.mean()
                / PEAK_HBM_BPS, 2)
        rows.append(row)
        print(json.dumps(row), flush=True)
        del eng
    if args.out:
        with open(args.out, "w") as f:
            for r in rows:
                f.write(json.dumps(r) + "\n")
    if any_regression:
        sys.exit(3)


if __name__ == "__main__":
    main()
