"""Product quantization on TPU: train / encode / reconstruct / LUTs.

Purpose: shrink per-vector traversal payloads so the fused graph kernel
can inline neighbor codes at DEEP-10M scale. The round-2 fused kernel
inlines full int8 neighbor vectors (R * D bytes per node = 46GB at
10M x 96 x R48 — structurally over HBM); PQ codes at m bytes per vector
cut the inline payload ~10x (m=12: 7.7GB total), which is what makes
the 10M config servable by a fused kernel on ONE chip.

Scoring model (ADC — asymmetric distance computation): a query builds a
lookup table LUT[j, c] = <q_j, C[j, c]> per subspace j; the approximate
dot of q with any encoded vector is sum_j LUT[j, code_j]. For L2 the
traversal score is 2 * adc_dot - |x_hat|^2 with |x_hat|^2 stored per
node (or folded into the LUT via per-centroid norms).

The reference has no quantization anywhere (usearch is configured at
F32 quantization, `/root/reference/src/backend/hnsw.rs:112-120`); this
is a TPU-scale capability the CPU design never needed.
"""

from __future__ import annotations

import functools
from typing import Tuple

import jax
import jax.numpy as jnp
import numpy as np


@functools.partial(jax.jit, static_argnames=("ksub", "iters"))
def _kmeans_1sub(
    x: jnp.ndarray,       # [S, dsub] f32
    init: jnp.ndarray,    # [ksub, dsub] f32
    ksub: int,
    iters: int,
) -> jnp.ndarray:
    """Lloyd's k-means for one subspace. Empty clusters keep their old
    centroid (they can re-acquire points later)."""
    xsq = jnp.sum(x * x, axis=1)                            # [S]

    def step(cent, _):
        csq = jnp.sum(cent * cent, axis=1)                  # [K]
        # argmin ||x - c||^2 = argmax 2 x.c - |c|^2
        scores = 2.0 * (x @ cent.T) - csq[None, :]          # [S, K]
        assign = jnp.argmax(scores, axis=1)                 # [S]
        onehot = jax.nn.one_hot(assign, ksub, dtype=jnp.float32)
        sums = onehot.T @ x                                 # [K, dsub]
        counts = jnp.sum(onehot, axis=0)                    # [K]
        new = sums / jnp.maximum(counts, 1.0)[:, None]
        cent = jnp.where((counts > 0)[:, None], new, cent)
        return cent, None

    cent, _ = jax.lax.scan(step, init, None, length=iters)
    del xsq
    return cent


def train_pq(
    sample: np.ndarray,   # [S, D] f32 training sample
    m: int,
    ksub: int = 256,
    iters: int = 12,
    seed: int = 0,
) -> np.ndarray:
    """Train per-subspace codebooks. Returns [m, ksub, dsub] f32.
    D % m must be 0."""
    s, d = sample.shape
    if d % m:
        raise ValueError(f"D={d} not divisible by m={m}")
    dsub = d // m
    rng = np.random.default_rng(seed)
    sub = np.ascontiguousarray(sample.reshape(s, m, dsub).transpose(1, 0, 2))
    books = np.empty((m, ksub, dsub), np.float32)
    for j in range(m):
        # corpora smaller than ksub duplicate init centroids; kmeans
        # keeps empty clusters at their old centroid so shapes (and the
        # uint8 code domain) stay fixed
        init = sub[j][rng.choice(s, ksub, replace=s < ksub)]
        books[j] = np.asarray(
            _kmeans_1sub(jnp.asarray(sub[j]), jnp.asarray(init), ksub, iters)
        )
    return books


@functools.partial(jax.jit, static_argnames=())
def _encode_chunk(
    x: jnp.ndarray,        # [C, m, dsub] f32
    books: jnp.ndarray,    # [m, ksub, dsub] f32
) -> jnp.ndarray:
    csq = jnp.sum(books * books, axis=2)                    # [m, K]
    scores = (
        2.0 * jnp.einsum("cmd,mkd->cmk", x, books) - csq[None, :, :]
    )
    return jnp.argmax(scores, axis=2).astype(jnp.uint8)     # [C, m]


def encode_pq(
    vectors: np.ndarray,   # [N, D] f32
    books: np.ndarray,     # [m, ksub, dsub]
    chunk: int = 262144,
) -> np.ndarray:
    """Encode to [N, m] uint8 codes (ksub <= 256)."""
    n, d = vectors.shape
    m, ksub, dsub = books.shape
    if ksub > 256:
        raise ValueError("uint8 codes need ksub <= 256")
    books_j = jnp.asarray(books)
    out = np.empty((n, m), np.uint8)
    for i in range(0, n, chunk):
        blk = vectors[i : i + chunk].reshape(-1, m, dsub)
        out[i : i + chunk] = np.asarray(_encode_chunk(jnp.asarray(blk), books_j))
    return out


def reconstruct_pq(
    codes: np.ndarray,     # [N, m] uint8
    books: np.ndarray,     # [m, ksub, dsub]
    chunk: int = 1_000_000,
) -> np.ndarray:
    """Decode x_hat [N, D] f32 (for simulation / rescoring experiments)."""
    n, m = codes.shape
    _, _, dsub = books.shape
    out = np.empty((n, m * dsub), np.float32)
    for i in range(0, n, chunk):
        c = codes[i : i + chunk].astype(np.int64)
        blk = books[np.arange(m)[None, :], c]               # [C, m, dsub]
        out[i : i + chunk] = blk.reshape(-1, m * dsub)
    return out


def adc_lut(
    queries: jnp.ndarray,  # [B, D] f32
    books: jnp.ndarray,    # [m, ksub, dsub] f32
) -> jnp.ndarray:
    """Per-query ADC tables: LUT[b, j, c] = <q_bj, C[j, c]>. The
    approximate dot with code row `code` is sum_j LUT[b, j, code_j]."""
    b, d = queries.shape
    m, ksub, dsub = books.shape
    q = queries.reshape(b, m, dsub)
    return jnp.einsum("bmd,mkd->bmk", q, books)
