"""Hand-written Pallas TPU kernels for the hot ops.

ivf_bucket_scores: fused gather+score for IVF search. The XLA version
(`ops/ivf.py:ivf_search`) materializes the gathered bucket blocks
[B, cap, D] to HBM and then reads them back for the einsum — 2x the
traffic, f32 width. This kernel instead drives the whole probe fan-out
as a (B, nprobe) grid where each program's BlockSpec *index_map* reads
the probed cluster id from a scalar-prefetch ref, so Pallas pipelines
the HBM->VMEM block DMAs (double-buffered) straight into the score
computation. Bucket vectors stream as bf16 (half the bytes); scores
accumulate f32.

Falls back transparently: callers use `pallas_available()` and keep the
XLA path as the reference implementation (also used on CPU, where the
kernel runs in interpreter mode for tests).
"""

from __future__ import annotations

import functools
from typing import Optional

import jax
import jax.numpy as jnp
import numpy as np

from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu


def pallas_available() -> bool:
    """True when running on a real TPU backend (compiled pallas);
    CPU uses interpret mode (tests only — too slow for serving)."""
    try:
        return jax.devices()[0].platform in ("tpu", "axon")
    except Exception:
        return False


def _bucket_score_kernel(probe_ref, q_ref, v_ref, sq_ref, o_ref, *, metric):
    # q_ref:  [1, D]      query row (f32)
    # v_ref:  [1, cap, D] probed bucket block (bf16), DMA'd by BlockSpec
    # sq_ref: [1, cap]    |v|^2 (f32)
    # o_ref:  [1, 1, cap] scores out (f32)
    q = q_ref[0, :].astype(jnp.bfloat16)                    # [D]
    v = v_ref[0]                                            # [cap, D] bf16
    dots = jnp.dot(v, q, preferred_element_type=jnp.float32)  # [cap]
    if metric == "l2":
        scores = 2.0 * dots - sq_ref[0, :]
    else:
        scores = dots
    o_ref[0, 0, :] = scores


@functools.partial(
    jax.jit, static_argnames=("metric", "interpret")
)
def ivf_bucket_scores(
    queries: jnp.ndarray,       # [B, D] f32
    probe: jnp.ndarray,         # [B, P] int32 bucket rows to score
    bucket_vecs: jnp.ndarray,   # [K, cap, D] bf16
    bucket_sq: jnp.ndarray,     # [K, cap] f32
    metric: str = "ip",
    interpret: bool = False,
) -> jnp.ndarray:
    """Returns scores [B, P, cap] (f32)."""
    b, d = queries.shape
    p = probe.shape[1]
    k, cap, _ = bucket_vecs.shape

    grid_spec = pltpu.PrefetchScalarGridSpec(
        num_scalar_prefetch=1,
        grid=(b, p),
        in_specs=[
            pl.BlockSpec((1, d), lambda i, j, probe_ref: (i, 0)),
            pl.BlockSpec(
                (1, cap, d), lambda i, j, probe_ref: (probe_ref[i, j], 0, 0)
            ),
            pl.BlockSpec(
                (1, cap), lambda i, j, probe_ref: (probe_ref[i, j], 0)
            ),
        ],
        out_specs=pl.BlockSpec(
            (1, 1, cap), lambda i, j, probe_ref: (i, j, 0)
        ),
    )
    return pl.pallas_call(
        functools.partial(_bucket_score_kernel, metric=metric),
        out_shape=jax.ShapeDtypeStruct((b, p, cap), jnp.float32),
        grid_spec=grid_spec,
        interpret=interpret,
    )(probe, queries, bucket_vecs, bucket_sq)


@functools.partial(
    jax.jit,
    static_argnames=("k", "nprobe", "metric", "sentinel", "interpret"),
)
def ivf_search_pallas(
    queries,          # [B, D] f32
    centroids,        # [K', D] f32
    bucket_ids,       # [K', cap] int32
    bucket_vecs_bf16,  # [K', cap, D] bf16
    bucket_sq,        # [K', cap] f32
    k: int,
    nprobe: int,
    metric: str,
    sentinel: int,
    interpret: bool = False,
):
    """Full IVF search with the fused kernel: centroid GEMM -> top-nprobe
    -> one pallas call scoring every probed bucket -> one top-k over the
    flattened [B, P*cap] candidate row."""
    from leann_tpu.ops.distance import NEG_INF, pairwise_scores

    b = queries.shape[0]
    cap = bucket_ids.shape[1]
    c_scores = pairwise_scores(queries, centroids, metric)
    _, probe = jax.lax.top_k(c_scores, nprobe)               # [B, P]

    scores = ivf_bucket_scores(
        queries, probe, bucket_vecs_bf16, bucket_sq,
        metric=metric, interpret=interpret,
    )                                                        # [B, P, cap]
    ids = bucket_ids[probe]                                  # [B, P, cap]
    scores = scores.reshape(b, nprobe * cap)
    ids = ids.reshape(b, nprobe * cap)
    scores = jnp.where(ids == sentinel, NEG_INF, scores)
    ids = jnp.where(ids == sentinel, -1, ids)
    top_scores, pos = jax.lax.top_k(scores, k)
    top_ids = jnp.take_along_axis(ids, pos, axis=1)
    return top_scores, top_ids
