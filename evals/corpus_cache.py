"""Shared corpus pool with an on-disk cache.

Every eval and bench draws the same deterministic mixture-of-gaussians
pool (one PCG64 stream seeded 0; pool size n + 1024 + 2048 — the draw
count IS the contract: changing it shifts the stream and silently
mismatches prebuilt graph artifacts). Generating 10M x 96 takes ~15
minutes on this host's single core, so the pool persists as a raw .npy
memmap beside the other artifacts (f32, ~3.9GB at 10M — cheap on disk,
loads in seconds).
"""

from __future__ import annotations

import os

import numpy as np

ART_DIR = os.path.join(os.path.dirname(os.path.abspath(__file__)), "artifacts")


def make_corpus(rng, n, d, clusters=1024):
    centers = rng.standard_normal((clusters, d)).astype(np.float32) * 4.0
    assign = rng.integers(0, clusters, n)
    return (centers[assign]
            + rng.standard_normal((n, d)).astype(np.float32)).astype(np.float32)


def get_pool(n: int, d: int, extra: int = 1024 + 2048,
             clusters: int = 1024, seed: int = 0) -> np.ndarray:
    """The bench pool [n + extra, d]: corpus rows first, then recall
    queries, then the (legacy) batch slice. Cached for n >= 1M."""
    rows = n + extra
    path = os.path.join(ART_DIR, f"pool_n{n}_d{d}_c{clusters}_s{seed}.npy")
    if os.path.exists(path):
        return np.lib.format.open_memmap(path, mode="r")
    rng = np.random.default_rng(seed)
    pool = make_corpus(rng, rows, d, clusters)
    if n >= 1_000_000:
        np.save(path, pool)
        return np.lib.format.open_memmap(path, mode="r")
    return pool
