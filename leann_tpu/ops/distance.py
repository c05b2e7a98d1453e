"""Batched distance computation + exact top-k on TPU.

Score convention throughout the engine: **higher is better**.
  ip:      score = q . v
  cosine:  score = (q . v) / (|q||v|)
  l2:      score = -(|v|^2 - 2 q . v)   (monotonic in -|q - v|^2; the
           constant |q|^2 is dropped so every metric reduces to one MXU
           matmul against the corpus block)

This file replaces the reference's per-query SIMD distance loops
(usearch IP metric, `src/backend/hnsw.rs:112-120`; anndists DistDot,
`src/backend/diskann.rs:34-37`; brute-force dot scan,
`src/index/recompute.rs:96-106`) with *batched* matmuls: queries are a
[B, D] block, the corpus streams through in [C, D] chunks, and top-k is
maintained in a lax.scan carry so peak memory is O(B * (k + C)) instead
of O(B * N).
"""

from __future__ import annotations

import functools
from typing import Optional, Tuple

import jax
import jax.numpy as jnp
import numpy as np

Metric = str  # "ip" | "l2" | "cosine"

NEG_INF = float("-inf")  # plain python: no device allocation at import time


def _normalize(x: jnp.ndarray, axis: int = -1) -> jnp.ndarray:
    return x / (jnp.linalg.norm(x, axis=axis, keepdims=True) + 1e-12)


def pairwise_scores(
    queries: jnp.ndarray,
    vectors: jnp.ndarray,
    metric: Metric = "ip",
    vector_sq_norms: Optional[jnp.ndarray] = None,
) -> jnp.ndarray:
    """[B, D] x [C, D] -> [B, C] scores (higher = better).

    For cosine, queries/vectors are normalized here; callers on the hot
    path should pre-normalize and use "ip".
    """
    if metric == "cosine":
        queries = _normalize(queries)
        vectors = _normalize(vectors)
        metric = "ip"
    # Full f32 accumulation: the MXU's default bf16 passes lose ~2e-3
    # relative accuracy, which reorders near-tie neighbors and costs recall.
    dots = jnp.dot(
        queries,
        vectors.T,
        preferred_element_type=jnp.float32,
        precision=jax.lax.Precision.HIGHEST,
    )
    if metric == "ip":
        return dots
    if metric == "l2":
        if vector_sq_norms is None:
            vector_sq_norms = jnp.sum(
                vectors.astype(jnp.float32) * vectors.astype(jnp.float32), axis=-1
            )
        return 2.0 * dots - vector_sq_norms[None, :]
    raise ValueError(f"unknown metric {metric!r}")


@functools.partial(
    jax.jit, static_argnames=("k", "metric", "chunk_size")
)
def _exact_topk_jit(
    queries: jnp.ndarray,
    vectors: jnp.ndarray,
    valid_n: jnp.ndarray,
    k: int,
    metric: Metric,
    chunk_size: int,
) -> Tuple[jnp.ndarray, jnp.ndarray]:
    b, d = queries.shape
    n_pad = vectors.shape[0]
    num_chunks = n_pad // chunk_size

    if metric == "cosine":
        queries = _normalize(queries)
        vectors = _normalize(vectors)
        metric = "ip"

    sq_norms = None
    if metric == "l2":
        vf = vectors.astype(jnp.float32)
        sq_norms = jnp.sum(vf * vf, axis=-1)

    chunks = vectors.reshape(num_chunks, chunk_size, d)
    norm_chunks = (
        sq_norms.reshape(num_chunks, chunk_size) if sq_norms is not None else None
    )

    init_scores = jnp.full((b, k), NEG_INF, dtype=jnp.float32)
    init_idx = jnp.full((b, k), -1, dtype=jnp.int32)

    def step(carry, inputs):
        best_scores, best_idx = carry
        if norm_chunks is not None:
            chunk_i, block, norms = inputs
            scores = pairwise_scores(queries, block, "l2", vector_sq_norms=norms)
        else:
            chunk_i, block = inputs
            scores = pairwise_scores(queries, block, "ip")
        base = chunk_i * chunk_size
        col = jax.lax.broadcasted_iota(jnp.int32, (b, chunk_size), 1) + base
        scores = jnp.where(col < valid_n, scores, NEG_INF)
        all_scores = jnp.concatenate([best_scores, scores], axis=1)
        all_idx = jnp.concatenate([best_idx, col], axis=1)
        top_scores, pos = jax.lax.top_k(all_scores, k)
        top_idx = jnp.take_along_axis(all_idx, pos, axis=1)
        return (top_scores, top_idx), None

    chunk_ids = jnp.arange(num_chunks, dtype=jnp.int32)
    xs = (chunk_ids, chunks, norm_chunks) if norm_chunks is not None else (
        chunk_ids,
        chunks,
    )
    (scores, idx), _ = jax.lax.scan(step, (init_scores, init_idx), xs)
    return scores, idx


def exact_topk(
    queries,
    vectors,
    k: int,
    metric: Metric = "ip",
    chunk_size: int = 65536,
) -> Tuple[np.ndarray, np.ndarray]:
    """Exact top-k over the full corpus. Returns (scores [B,k], idx [B,k]).

    Handles padding host-side: the corpus is padded to a multiple of
    chunk_size so all shapes under jit are static.
    """
    queries = jnp.asarray(queries, dtype=jnp.float32)
    if queries.ndim == 1:
        queries = queries[None, :]
    vectors = jnp.asarray(vectors, dtype=jnp.float32)
    n, d = vectors.shape
    k = min(k, n)
    chunk_size = min(chunk_size, max(128, 1 << (n - 1).bit_length()))
    n_pad = ((n + chunk_size - 1) // chunk_size) * chunk_size
    if n_pad != n:
        vectors = jnp.pad(vectors, ((0, n_pad - n), (0, 0)))
    scores, idx = _exact_topk_jit(
        queries, vectors, jnp.int32(n), k, metric, chunk_size
    )
    return np.asarray(scores), np.asarray(idx)
