"""Micro-benchmarks — the equivalent of the reference's criterion suite
(`benches/benchmarks.rs`: dot products, tokenization, BM25 build/query,
chunking, normalize, top-k), exercising the *actual* library code rather
than inline reimplementations (which the reference's suite does, e.g.
its BM25 copy at benchmarks.rs:119-183).

Usage: python benches/micro.py [--device]   (--device adds TPU kernels)
"""

from __future__ import annotations

import argparse
import os
import sys
import time

import numpy as np

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))


def bench(name, fn, reps=None, min_time=0.4):
    fn()  # warmup
    if reps is None:
        t0 = time.perf_counter()
        fn()
        once = max(time.perf_counter() - t0, 1e-7)
        reps = max(1, int(min_time / once))
    t0 = time.perf_counter()
    for _ in range(reps):
        fn()
    per = (time.perf_counter() - t0) / reps
    unit = "s" if per >= 1 else ("ms" if per >= 1e-3 else "µs")
    val = per if per >= 1 else (per * 1e3 if per >= 1e-3 else per * 1e6)
    print(f"{name:<44} {val:9.2f} {unit}   ({reps} reps)")


def main():
    ap = argparse.ArgumentParser()
    ap.add_argument("--device", action="store_true",
                    help="include device (TPU/CPU-jax) kernels")
    args = ap.parse_args()
    rng = np.random.default_rng(0)

    # --- dot products (reference benchmarks.rs:27-56) ---
    for d in (768, 1536):
        a = rng.standard_normal(d).astype(np.float32)
        b = rng.standard_normal(d).astype(np.float32)
        bench(f"dot_product_{d}d (numpy)", lambda a=a, b=b: a @ b)

    # --- tokenization (:59-87) ---
    from leann_tpu.index.bm25 import tokenize

    text = "The quick brown Fox2 jumps over the lazy dog! " * 50
    bench("bm25_tokenize_2.3kb", lambda: tokenize(text))

    # --- BM25 build (:90-116) + query (:119-183) ---
    from leann_tpu.index.bm25 import Bm25Scorer

    for n in (100, 1000, 10000):
        docs = [
            f"document {i} about topic{i % 97} with shared vocabulary terms"
            for i in range(n)
        ]
        bench(f"bm25_build_{n}_docs", lambda d=docs: Bm25Scorer.build(d))
    docs1k = [f"document {i} about topic{i % 97} terms" for i in range(1000)]
    scorer = Bm25Scorer.build(docs1k)
    bench("bm25_query_1k_docs", lambda: scorer.search("document topic11 terms", 10))

    # --- chunking (:186-205) ---
    from leann_tpu.chunker.simple import SimpleChunker
    from leann_tpu.chunker.code import CodeChunker

    prose = ("Lorem ipsum dolor sit amet, consectetur adipiscing elit. " * 200)
    bench("simple_chunk_11kb", lambda: SimpleChunker(256, 128).chunk(prose, "a.txt"))
    code = "\n".join(f"def fn_{i}(x):\n    return x + {i}\n" for i in range(100))
    bench("code_chunk_100_fns", lambda: CodeChunker(256, 128).chunk(code, "a.py"))

    # --- normalize (:208-219) ---
    v = rng.standard_normal((1000, 768)).astype(np.float32)
    bench("normalize_1k_768d", lambda: v / np.linalg.norm(v, axis=1, keepdims=True))

    # --- top-k (:222-284) ---
    for n in (1000, 10000, 100000):
        scores = rng.standard_normal(n).astype(np.float32)
        bench(
            f"topk10_argpartition_{n}",
            lambda s=scores: np.argpartition(-s, 10)[:10],
        )

    # --- filter DSL ---
    from leann_tpu.index.filter import MetadataFilter

    bench("filter_parse", lambda: MetadataFilter.parse("type=code,lines>50 OR lang in [py,rs]"))
    filt = MetadataFilter.parse("type=code,lines>50")
    md = {"type": "code", "lines": 99}
    bench("filter_match", lambda: filt.matches(md))

    if args.device:
        import jax

        from leann_tpu.ops.distance import exact_topk

        x = rng.standard_normal((100_000, 128)).astype(np.float32)
        q = rng.standard_normal((256, 128)).astype(np.float32)
        bench(
            "exact_topk_100k_128d_b256 (device)",
            lambda: exact_topk(q, x, 10, metric="l2"),
            reps=5,
        )


if __name__ == "__main__":
    main()
