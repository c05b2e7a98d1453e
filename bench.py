"""Benchmark: batched search QPS/chip at measured recall@10 (real TPU).

Headline engine: IVF (partitioned matmul — ops/ivf.py), the
TPU-throughput backend. BENCH_BACKEND=vamana benches the graph engine
instead. SIFT-like synthetic workload per BASELINE.json: 128-d
mixture-of-gaussians, recall@10 vs the exact oracle, steady-state QPS at
batch 2048. Prints ONE JSON line on stdout; progress goes to stderr.

Target from BASELINE.json: >=10k batched QPS per v5e chip
(vs_baseline = qps / 10000).

Measured on TPU v5e, mixture-of-gaussians 128d:
  N=1M:   ivf nprobe=8 (bf16 scan + f32 rescore) -> 18.3k QPS @ recall@10
          0.9998 (kmeans build 20s steady-state)
          flat two-stage -> 11.6k QPS @ overlap 0.9998 vs f32 oracle
  N=100k: ivf nprobe=8 -> 25.7k QPS @ 0.998
  vamana @ 1M (visited-set prune + query-adaptive entries):
          beam=32 -> 4.7k QPS @ 0.940; beam=64 -> 2.2k @ 0.976
"""

from __future__ import annotations

import json
import os
import sys
import time

import numpy as np

N = int(os.environ.get("BENCH_N", 1_000_000))
D = int(os.environ.get("BENCH_D", 128))
QUERY_BATCH = int(os.environ.get("BENCH_B", 2048))
RECALL_QUERIES = int(os.environ.get("BENCH_RECALL_Q", 1024))
TOPK = 10

# ivf knobs
N_CLUSTERS = int(os.environ.get("BENCH_CLUSTERS", max(64, int(2 * N ** 0.5))))
NPROBE_DEFAULT = 8 if N >= 500_000 else 16
NPROBE = int(os.environ.get("BENCH_NPROBE", NPROBE_DEFAULT))
# vamana knobs (R=48/L=80 matches the committed 1M artifact config)
GRAPH_DEGREE = int(os.environ.get("BENCH_R", 48))
BUILD_COMPLEXITY = int(os.environ.get("BENCH_BUILD_L", 80))
SEARCH_BEAM = int(os.environ.get("BENCH_SEARCH_L", 64))

# headline backend: the graph engine (fused Pallas kernel) when its 1M
# artifact is on disk — no 30-min build at bench time; IVF otherwise
# (kmeans builds in ~20s and also clears the 10k QPS north star)
_ART = os.path.join(
    os.path.dirname(os.path.abspath(__file__)), "evals", "artifacts",
    f"vamana_n{N}_r{GRAPH_DEGREE}_l{BUILD_COMPLEXITY}.npz",
)
_DEFAULT_BACKEND = "vamana" if os.path.exists(_ART) else "ivf"
BACKEND = os.environ.get("BENCH_BACKEND", _DEFAULT_BACKEND)


def log(msg: str) -> None:
    print(msg, file=sys.stderr, flush=True)


def main() -> None:
    os.environ.setdefault(
        "JAX_COMPILATION_CACHE_DIR",
        os.path.join(os.path.dirname(os.path.abspath(__file__)), ".jax_cache"),
    )
    # The axon plugin handshakes the TPU pool at `import jax` time and
    # can hang indefinitely when the relay tunnel is down (observed:
    # multi-hour outages). Fail fast with an honest JSON line instead of
    # a silent stall so the driver records WHY there is no number.
    import signal

    def _tpu_timeout(signum, frame):
        print(json.dumps({
            "metric": "error: TPU unavailable (axon handshake timed out "
                      "after 600s; relay tunnel down)",
            "value": 0.0,
            "unit": "qps",
            "vs_baseline": 0.0,
        }), flush=True)
        os._exit(2)

    if hasattr(signal, "SIGALRM"):
        signal.signal(signal.SIGALRM, _tpu_timeout)
        signal.alarm(600)
    import jax

    jax.devices()  # force the backend handshake under the alarm
    if hasattr(signal, "SIGALRM"):
        signal.alarm(0)

    try:
        jax.config.update(
            "jax_compilation_cache_dir", os.environ["JAX_COMPILATION_CACHE_DIR"]
        )
    except Exception:
        pass

    from leann_tpu.ops.distance import ExactEngine

    log(f"devices: {jax.devices()}  backend: {BACKEND}")
    log(f"corpus N={N} D={D} (cached pool if available) ...")
    sys.path.insert(
        0, os.path.join(os.path.dirname(os.path.abspath(__file__)), "evals"))
    from corpus_cache import get_pool

    pool = get_pool(N, D, extra=RECALL_QUERIES + QUERY_BATCH)
    corpus = pool[:N]
    queries = pool[N : N + RECALL_QUERIES]
    qbatch = pool[N + RECALL_QUERIES :]  # noqa: F841 (stream contract)

    # recall oracle BEFORE the engine exists: at 10M the engine + a
    # device-resident oracle together exhaust HBM; the functional
    # two-stage oracle frees its corpus copies when it returns
    if BACKEND != "flat":
        from leann_tpu.ops.distance import exact_topk

        log("computing oracle ...")
        _, oracle = exact_topk(
            queries, corpus, TOPK, metric="l2", two_stage=True
        )

    t0 = time.time()
    if BACKEND == "flat":
        from leann_tpu.ops.distance import ExactEngine

        engine = ExactEngine(corpus, metric="l2")
        search = lambda q, k: engine.search(q, k=k)  # noqa: E731
        knobs = "two-stage bf16+rescore"
    elif BACKEND == "ivf":
        from leann_tpu.ops.ivf import IvfEngine

        engine = IvfEngine(corpus, n_clusters=N_CLUSTERS, metric="l2")
        search = lambda q, k: engine.search(q, k=k, nprobe=NPROBE)  # noqa: E731
        knobs = f"clusters={N_CLUSTERS}, nprobe={NPROBE}"
    elif BACKEND == "ivfpq":
        # ADC-compressed buckets + int8 rescore (ops/ivf_pq.py) — the
        # 100M-class one-chip footprint measured at bench scale
        from leann_tpu.ops.ivf_pq import IvfPqEngine

        m = next((mm for mm in (16, 12, 8) if D % mm == 0), 8)
        engine = IvfPqEngine(
            corpus, n_clusters=N_CLUSTERS, metric="l2", m=m,
            rescore=os.environ.get("LEANN_PQ_RESCORE", "int8"))
        search = lambda q, k: engine.search(q, k=k, nprobe=NPROBE)  # noqa: E731
        knobs = f"clusters={N_CLUSTERS}, nprobe={NPROBE}, adc-m{m}+int8"
    else:
        art_path = os.path.join(
            os.path.dirname(os.path.abspath(__file__)),
            "evals", "artifacts",
            f"vamana_n{N}_r{GRAPH_DEGREE}_l{BUILD_COMPLEXITY}.npz",
        )
        if os.path.exists(art_path):
            log(f"loading prebuilt graph {art_path}")
            art = np.load(art_path)
            adjacency, medoid = art["adjacency"], int(art["medoid"])
        else:
            from leann_tpu.ops.vamana import build_vamana

            adjacency, medoid = build_vamana(
                corpus, graph_degree=GRAPH_DEGREE,
                complexity=BUILD_COMPLEXITY,
                alpha=1.2, metric="l2", wave_size=8192,
            )
        if BACKEND == "pq":
            # the DEEP-10M-scale layout: 128-bit ADC codes navigate,
            # exact rescore of beam + visited (ops/pq_beam.py)
            from leann_tpu.ops.pq_beam import PqBeamEngine

            m = next((mm for mm in (16, 12, 8) if D % mm == 0), 8)
            pq_path = os.path.join(
                os.path.dirname(os.path.abspath(__file__)),
                "evals", "artifacts", f"pq_n{N}_d{D}_m{m}_k256.npz")
            books = codes = None
            if os.path.exists(pq_path):
                z = np.load(pq_path)
                books, codes = z["books"], z["codes"]
                log(f"pq cache {pq_path}")
            engine = PqBeamEngine(
                corpus, adjacency, medoid, metric="l2", m=m, ksub=256,
                rescore=os.environ.get("LEANN_PQ_RESCORE", "bf16"),
                codebooks=books, codes=codes,
            )
            search = lambda q, k: engine.search(q, k=k, beam_width=SEARCH_BEAM)  # noqa: E731
            knobs = f"R={GRAPH_DEGREE}, beam={SEARCH_BEAM}, pq-m{m}-kernel"
        else:
            from leann_tpu.ops.fused_beam import FusedBeamEngine

            engine = FusedBeamEngine(
                corpus, adjacency, medoid, metric="l2",
                expansions=int(os.environ.get("BENCH_E", 2)),
            )
            search = lambda q, k: engine.search(q, k=k, beam_width=SEARCH_BEAM)  # noqa: E731
            knobs = f"R={GRAPH_DEGREE}, beam={SEARCH_BEAM}, fused-kernel"
    build_s = time.time() - t0
    log(f"build: {build_s:.1f}s ({N / build_s:.0f} vec/s)")

    # flat: the engine IS the two-stage oracle (0.9998-1.0 overlap with
    # the f32 scan measured at 1M)
    if BACKEND == "flat":
        oracle, _ = engine.search(queries, k=TOPK)
    idx, _ = search(queries, TOPK)
    recall = float(np.mean([
        len(set(a.tolist()) & set(b.tolist())) / TOPK
        for a, b in zip(idx, oracle)
    ]))
    log(f"recall@10: {recall:.4f}")

    # --- device-time throughput (the honest number) ---
    # Round-2 measured every engine at the ~9-dispatch/s relay ceiling
    # (~110ms host<->device per dispatch), so all engines "converged" at
    # ~19-23k QPS regardless of device cost. Here M batches are staged
    # on-device as [M, B, D] and run in ONE search_many_device dispatch
    # (lax.scan); wall time over the blocking collect / M amortizes the
    # relay as 1/M. Windows are >= ~2s, distinct query data per window,
    # mean +/- std over BENCH_REPS windows.
    import jax as _jax
    import jax.numpy as jnp

    dev_kwargs = {
        "flat": {},
        "ivf": {"nprobe": NPROBE},
        "ivfpq": {"nprobe": NPROBE},
        "vamana": {"beam_width": SEARCH_BEAM},
        "pq": {"beam_width": SEARCH_BEAM},
    }[BACKEND]

    def call(qs):
        return engine.search_many_device(qs, TOPK, **dev_kwargs)

    def draw_qs(m, seed):
        r = np.random.default_rng(seed)
        base = corpus[r.integers(0, N, m * QUERY_BATCH)]
        noise = r.standard_normal((m * QUERY_BATCH, D)).astype(np.float32)
        return (base + noise).reshape(m, QUERY_BATCH, D)

    reps = int(os.environ.get("BENCH_REPS", 5))
    probe = jnp.asarray(draw_qs(1, 99))
    _jax.block_until_ready(call(probe))        # compile
    t0 = time.time()
    _jax.block_until_ready(call(probe))
    t_probe = time.time() - t0
    m_batches = int(os.environ.get(
        "BENCH_M", max(4, min(512, 2.0 / max(t_probe - 0.05, 1e-3)))))
    log(f"probe batch {t_probe*1e3:.1f}ms -> M={m_batches}")

    windows = [
        _jax.device_put(jnp.asarray(draw_qs(m_batches, 1000 + w)))
        for w in range(min(reps, 3))
    ]
    _jax.block_until_ready(windows)
    _jax.block_until_ready(call(windows[0]))   # warm
    times = []
    for i in range(reps):
        t0 = time.perf_counter()
        out = call(windows[i % len(windows)])
        _jax.block_until_ready(out)
        times.append(time.perf_counter() - t0)
    per_batch = np.array(times) / m_batches
    qps_w = QUERY_BATCH / per_batch
    qps, qps_std = float(qps_w.mean()), float(qps_w.std())
    log(
        f"device qps: {qps:.0f} +/- {qps_std:.0f} "
        f"({per_batch.mean()*1e3:.2f}ms/batch of {QUERY_BATCH}, "
        f"M={m_batches}, {reps} windows, {knobs})"
    )

    print(json.dumps({
        "metric": (
            f"{BACKEND}_device_qps_per_chip@recall10={recall:.3f} "
            f"(N={N}, d={D}, {knobs}, std={qps_std:.0f}, "
            f"M={m_batches}x{QUERY_BATCH}/dispatch)"
        ),
        "value": round(qps, 1),
        "unit": "qps",
        "vs_baseline": round(qps / 10000.0, 3),
    }))


if __name__ == "__main__":
    main()
