"""PQ fused kernel on real TPU: compile, recall, device-time QPS.

First-hardware shakeout for ops/pq_beam.py (interpret-mode tests prove
the lane algebra; Mosaic lowering, VMEM budgets and DMA behavior only
show up on the chip). Runs against a prebuilt Vamana artifact:

  python evals/pq_device_check.py --n 1000000 --d 128 --m 16
  python evals/pq_device_check.py --n 10000000 --d 96 --m 16 --rescore bf16
  # residual (two-level) ADC — the DEEP-10M mode (same 16B/node):
  python evals/pq_device_check.py --n 10000000 --d 96 --m 12 --coarse 2 \
      --rescore bf16
  # the positive regime: low-intrinsic-dim corpus + OPQ rotation
  # (RESULTS_r3 section 2 — sim recall 0.97/0.995 at 200k):
  python evals/pq_device_check.py --n 1000000 --d 96 --corpus lowdim \
      --opq --rescore bf16

Reports recall@10 vs the corpus oracle and amortized device time via
search_many_device (M batches, one dispatch), mean +/- std across
windows — same methodology as evals/device_time.py.

--corpus lowdim swaps the bench mixture for the intrinsic-dim-16
corpus (evals/pq_lowdim_sim.make_lowdim, same seed), building and
caching its Vamana graph on first run; --opq trains the learned
rotation (ops/pq.train_opq) and folds it into the affine LUT.
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
    ap.add_argument("--coarse", type=int, default=0, metavar="MC",
                    help=">0: residual (two-level) ADC — MC coarse-PQ "
                         "subspaces + --m fine subspaces (+2 norm "
                         "columns for l2); fixes the single-level "
                         "ranking collapse on clustered 10M corpora")
    ap.add_argument("--ksub", type=int, default=256)
    ap.add_argument("--b", type=int, default=2048)
    ap.add_argument("--beam", type=int, default=64)
    ap.add_argument("--visited", type=int, default=256)
    ap.add_argument("--qb", type=int, default=16)
    ap.add_argument("--reps", type=int, default=5)
    ap.add_argument("--mbatches", type=int, default=0, help="0 = auto ~2s")
    ap.add_argument("--recall-q", type=int, default=1024)
    ap.add_argument("--rescore", default="f32")
    ap.add_argument("--artifact", default=None)
    ap.add_argument("--corpus", default="bench",
                    choices=["bench", "lowdim", "text"],
                    help="bench = the shared mixture pool; lowdim = "
                         "intrinsic-dim-16 corpus (the PQ engine's "
                         "positive regime, RESULTS_r3 section 2); "
                         "text = 768-d BERT-fixture embeddings of "
                         "zipf text chunks (VERDICT r4 #8: does the "
                         "DEEP-100M per-shard story survive contact "
                         "with text embeddings?)")
    ap.add_argument("--lowdim-k", type=int, default=16)
    ap.add_argument("--opq", action="store_true",
                    help="learn an OPQ rotation; folded into the LUT, "
                         "zero serving cost. Composes with --coarse "
                         "(rotation learned on the single-level "
                         "objective, residual books trained in the "
                         "rotated frame — the best 16B/node variant on "
                         "low-intrinsic-dim corpora, RESULTS_r3 sec 2)")
    ap.add_argument("--interpret", action="store_true",
                    help="force Pallas interpret mode (auto on CPU)")
    args = ap.parse_args()

    os.environ.setdefault(
        "JAX_COMPILATION_CACHE_DIR",
        os.path.join(os.path.dirname(os.path.dirname(
            os.path.abspath(__file__))), ".jax_cache"))
    import jax
    import jax.numpy as jnp

    from leann_tpu.ops.distance import exact_topk
    from leann_tpu.ops.pq_beam import PqBeamEngine

    n, d, b = args.n, args.d, args.b
    log(f"devices: {jax.devices()}")
    adir = os.path.join(
        os.path.dirname(os.path.abspath(__file__)), "artifacts")
    if args.corpus == "lowdim":
        from pq_lowdim_sim import make_lowdim

        pool = make_lowdim(
            np.random.default_rng(0), n + args.recall_q, d,
            args.lowdim_k, clusters=1024)
        tag = f"lowdim{args.lowdim_k}"
    elif args.corpus == "text":
        # real text-shaped embeddings: the BERT fixture (bert-base
        # geometry) over zipf-vocabulary chunks — the same encoder
        # whose space config-3 serves. L2-normalized so l2 top-k ==
        # cosine top-k (matches how text indexes ship).
        cache = os.path.join(
            adir, f"bertpool_n{n + args.recall_q}_d768.npy")
        if os.path.exists(cache):
            pool = np.load(cache)
        else:
            from hybrid_latency import make_texts

            from leann_tpu.models.bert import BertConfig, BertEncoder

            enc = BertEncoder(config=BertConfig())
            texts = make_texts(n + args.recall_q, seed=11)
            t0 = time.time()
            pool = np.asarray(
                enc.embed(texts, batch_size=512), dtype=np.float32)
            log(f"embedded {len(texts)} texts in {time.time()-t0:.0f}s")
            pool = pool / (
                np.linalg.norm(pool, axis=1, keepdims=True) + 1e-12)
            np.save(cache, pool)
        d = args.d = pool.shape[1]
        tag = "text"
    else:
        from corpus_cache import get_pool

        pool = get_pool(n, d)
        tag = ""
    corpus, rq = pool[:n], pool[n : n + args.recall_q]

    if args.artifact:
        art = args.artifact
    elif args.corpus in ("lowdim", "text"):
        art = os.path.join(adir, f"vamana_{tag}_n{n}_d{d}_r48_l80.npz")
        if not os.path.exists(art):
            from leann_tpu.ops.vamana import build_vamana

            t0 = time.time()
            adjacency, medoid = build_vamana(
                corpus, graph_degree=48, complexity=80, metric="l2",
                wave_size=8192)
            np.savez_compressed(
                art, adjacency=np.asarray(adjacency), medoid=medoid)
            log(f"lowdim graph built in {time.time()-t0:.0f}s")
    else:
        art = os.path.join(
            adir, f"vamana_n{n}_r48_l{80 if n <= 1_000_000 else 64}.npz")
    a = np.load(art)
    adjacency, medoid = a["adjacency"], int(a["medoid"])
    log(f"artifact {art}")

    oc = os.path.join(
        adir, f"oracle_{tag}n{n}_d{d}_q{args.recall_q}.npz"
        if tag else f"oracle_n{n}_d{d}_q{args.recall_q}.npz")
    if os.path.exists(oc):
        oracle = np.load(oc)["oracle"]
        log(f"oracle cache {oc}")
    else:
        log("oracle ...")
        _, oracle = exact_topk(rq, corpus, 10, metric="l2", two_stage=True)
        oracle = np.asarray(oracle)
        np.savez_compressed(oc, oracle=oracle)

    suffix = f"_coarse{args.coarse}" if args.coarse else ""
    if args.opq:
        suffix += "_opq"
    pc = os.path.join(
        adir, f"pq_{tag}n{n}_d{d}_m{args.m}_k{args.ksub}{suffix}.npz"
        if tag else f"pq_n{n}_d{d}_m{args.m}_k{args.ksub}{suffix}.npz")
    books = codes = rot = None
    if os.path.exists(pc):
        z = np.load(pc)
        books = (z["books_c"], z["books_f"]) if args.coarse else z["books"]
        codes = z["codes"]
        rot = z["rot"] if "rot" in z.files else None
        log(f"pq cache {pc}")
    elif args.opq:
        from leann_tpu.ops.pq import train_opq

        t0 = time.time()
        samp = corpus[np.random.default_rng(1).choice(
            n, min(n, 262_144), replace=False)]
        # rotation learned on the single-level objective (m fine
        # subspaces — any m dividing d gives near-identical rotations);
        # in coarse (residual) mode the engine then trains the residual
        # books on the rotated sample itself (books stays None)
        rot, books = train_opq(samp, m=args.m, ksub=args.ksub)
        if args.coarse:
            books = None
        log(f"opq trained in {time.time()-t0:.0f}s")

    interpret = args.interpret or jax.default_backend() == "cpu"
    if interpret:
        log("interpret mode (CPU backend): correctness smoke only, "
            "timings are not device numbers")
    t0 = time.time()
    eng = PqBeamEngine(
        corpus, adjacency, medoid, metric="l2", m=args.m, ksub=args.ksub,
        qb=args.qb, visited_pool=args.visited, rescore=args.rescore,
        codebooks=books, codes=codes, coarse_m=args.coarse,
        rotation=rot, interpret=interpret,
    )
    if codes is None:
        extra = {"rot": eng.rotation} if args.opq else {}
        if args.coarse:
            np.savez_compressed(
                pc, books_c=eng.codebooks[0], books_f=eng.codebooks[1],
                codes=np.asarray(eng.codes), **extra)
        else:
            np.savez_compressed(
                pc, books=eng.codebooks, codes=np.asarray(eng.codes),
                **extra)
    log(f"engine up in {time.time()-t0:.0f}s")

    t0 = time.time()
    ids, _ = eng.search(rq, k=10, beam_width=args.beam)
    log(f"first batch (compile) {time.time()-t0:.0f}s")
    recall = float(np.mean([
        len(set(ids[i].tolist()) & set(oracle[i].tolist())) / 10
        for i in range(len(oracle))
    ]))
    log(f"recall@10: {recall:.4f} @ beam {args.beam}")

    def draw_qs(mb, seed):
        r = np.random.default_rng(seed)
        base = corpus[r.integers(0, n, mb * b)]
        noise = r.standard_normal((mb * b, d)).astype(np.float32)
        return (base + noise).reshape(mb, b, d)

    def call(qs):
        return eng.search_many_device(qs, k=10, beam_width=args.beam)

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
    out = call(windows[0])
    jax.block_until_ready(out)
    times = []
    for i in range(args.reps):
        t0 = time.perf_counter()
        out = call(windows[i % len(windows)])
        jax.block_until_ready(out)
        times.append(time.perf_counter() - t0)
    per_batch = np.array(times) / mb
    qps = b / per_batch
    row = {
        "engine": "pq-fused", "n": n, "d": d, "m": args.m,
        "corpus": args.corpus, "opq": bool(args.opq),
        "coarse": args.coarse,
        "ksub": args.ksub, "beam": args.beam, "visited": args.visited,
        "b": b, "mbatches": mb, "reps": args.reps,
        "rescore": args.rescore,
        "recall_at_10": round(recall, 4),
        "device_ms_per_batch_mean": round(float(per_batch.mean() * 1e3), 3),
        "device_ms_per_batch_std": round(float(per_batch.std() * 1e3), 3),
        "device_qps_mean": round(float(qps.mean()), 1),
        "device_qps_std": round(float(qps.std()), 1),
        "records_gb": round(
            float(np.prod(eng.records.shape)) * 4 / 1e9, 2),
    }
    import recall_guard

    # guarded key only for the committed positive-regime row (lowdim);
    # bench-mixture rows are negative-regime scoping, not floors
    if args.corpus == "lowdim":
        if recall_guard.check(f"pq_lowdim_n{n}_d{d}", recall):
            row["recall_regression"] = True
            print(json.dumps(row), flush=True)
            sys.exit(3)
    print(json.dumps(row), flush=True)


if __name__ == "__main__":
    main()
