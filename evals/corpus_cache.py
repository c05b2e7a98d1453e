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


def make_corpus_hard(
    rng,
    n: int,
    d: int,
    clusters: int = 1024,
    center_scale: float = 4.0,
    sigma: float = 1.0,
    anisotropy: float = 0.0,
    zipf: float = 0.0,
) -> np.ndarray:
    """Parameterized mixture generator for the hardness sweep.

    The default bench corpus (make_corpus: 1024 isotropic equal-mass
    clusters, centers ~ 4x N(0,1)) is FRIENDLY: high center separation
    and low intrinsic dimension flatter every ANN method. Knobs that
    make it harder (VERDICT r2 next-round #8):

      clusters      64 -> 16384: fewer = coarser IVF partitions help;
                    more = cluster structure approaches uniform noise
      center_scale  4.0 -> 1.0: cluster overlap. At 1.0 the between/
                    within variance ratio is ~1 and neighborhoods blur
      sigma         within-cluster spread (same axis, inverse)
      anisotropy    a > 0 scales each cluster's noise per-dimension by
                    exp(a * N(0,1)) — stretched ellipsoids; distance
                    contrast varies per cluster and per axis
      zipf          s > 0 draws cluster masses ~ (rank)^-s — a few huge
                    clusters (local crowding) + a long tail of near-
                    singletons (sparse regions), like real web corpora

    center_scale=0 with clusters=1 degenerates to uniform gaussian —
    the no-structure adversarial floor for ANY sublinear method."""
    centers = rng.standard_normal((clusters, d)).astype(np.float32)
    centers *= np.float32(center_scale)
    if zipf > 0.0:
        mass = (np.arange(1, clusters + 1, dtype=np.float64)) ** (-zipf)
        mass /= mass.sum()
        assign = rng.choice(clusters, size=n, p=mass)
    else:
        assign = rng.integers(0, clusters, n)
    noise = rng.standard_normal((n, d)).astype(np.float32)
    noise *= np.float32(sigma)
    if anisotropy > 0.0:
        scales = np.exp(
            anisotropy * rng.standard_normal((clusters, d))
        ).astype(np.float32)
        noise *= scales[assign]
    return (centers[assign] + noise).astype(np.float32)


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
