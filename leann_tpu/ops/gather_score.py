"""Pallas row-gather scoring: ids -> scores against an HBM-resident
int8 corpus, one DMA descriptor per row.

Why this exists. The XLA graph engine at DEEP-10M is bound by random
row gathers (`ops/beam.py` hop: gather [B, R] corpus rows, ~98k rows
per hop at B=2048/R=48, ~12M per served batch). XLA lowers `take` on
TPU to a serialized dynamic-slice pipeline; a Pallas kernel can instead
issue one async DMA descriptor per row and let the HBM controller
overlap hundreds of in-flight copies. Whether that wins — and by how
much — decides whether a pointer-gather *traversal* kernel (adjacency +
one shared int8 corpus, no inline duplication: 0.96GB + 1.9GB at
10M x 96 vs the fused kernel's 46GB) can beat the 4.0k-QPS XLA path on
one chip. `evals/gather_roofline.py` measures both lowerings of the
exact same gather+score op; this kernel is the Pallas side.

The op itself is also the hot step of exact rescore (`ops/distance.py
_rescore_topk` gathers candidate rows the same way), so a win here is
immediately usable even without a new traversal kernel.

Contract:  scores[b, j] = <queries[b, :], corpus[ids[b, j], :]>
with corpus int8 (callers fold per-row dequant scales into the final
ranking exactly as `ops/pq_beam.py` does for its int8 rescore mode).

Measurement honesty: ids here are known up front, so DMA issue for
block i can overlap the wait of block i-1 (classic Pallas pipelining).
A traversal kernel pointer-chases — hop i+1's ids depend on hop i — so
its per-hop latency hides nothing. The roofline script therefore
reports the microbench number as an UPPER bound on traversal gather
throughput.

Reference role: the reference has no gather problem at all — usearch
pointer-chases one query at a time through host RAM
(/root/reference/src/backend/hnsw.rs:79-88); random access is free on
CPUs and the whole design question is TPU-specific.
"""

from __future__ import annotations

import functools

import jax
import jax.numpy as jnp
import numpy as np
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu


def _make_kernel(qb: int, r: int):
    def kernel(ids_ref, q_ref, corpus_hbm, out_ref, rows_scr, sems):
        # one DMA descriptor per (query, neighbor) row; all qb*r copies
        # in flight before the first wait
        for q in range(qb):
            for j in range(r):
                slot = q * r + j
                node = ids_ref[q, j]
                pltpu.make_async_copy(
                    corpus_hbm.at[node], rows_scr.at[slot], sems.at[slot]
                ).start()
        for slot in range(qb * r):
            pltpu.make_async_copy(
                corpus_hbm.at[0], rows_scr.at[slot], sems.at[slot]
            ).wait()

        rows = rows_scr[:].astype(jnp.bfloat16)              # [qb*r, 128]
        qs = q_ref[:].astype(jnp.bfloat16)                   # [qb, 128]
        outs = []
        for q in range(qb):
            # [1, 128] x [r, 128] contracted on dim 128 -> [1, r]
            outs.append(
                jax.lax.dot_general(
                    qs[q : q + 1, :],
                    rows[q * r : (q + 1) * r, :],
                    (((1,), (1,)), ((), ())),
                    preferred_element_type=jnp.float32,
                )
            )
        sc = jnp.concatenate(outs, axis=0)                   # [qb, r]
        if r < 128:
            sc = jnp.concatenate(
                [sc, jnp.zeros((qb, 128 - r), jnp.float32)], axis=1
            )
        out_ref[:] = sc

    return kernel


@functools.partial(
    jax.jit, static_argnames=("r", "qb", "interpret")
)
def _gather_score_call(
    ids_pad: jnp.ndarray,    # [B, 128] int32 (lanes >= r ignored)
    queries: jnp.ndarray,    # [B, 128] f32
    corpus: jnp.ndarray,     # [N(+pad), 128] int8
    r: int,
    qb: int,
    interpret: bool,
) -> jnp.ndarray:
    b = ids_pad.shape[0]
    out = pl.pallas_call(
        _make_kernel(qb, r),
        grid=(b // qb,),
        in_specs=[
            pl.BlockSpec((qb, 128), lambda i: (i, 0),
                         memory_space=pltpu.VMEM),
            pl.BlockSpec((qb, 128), lambda i: (i, 0),
                         memory_space=pltpu.VMEM),
            pl.BlockSpec(memory_space=pl.ANY),
        ],
        out_specs=pl.BlockSpec((qb, 128), lambda i: (i, 0),
                               memory_space=pltpu.VMEM),
        out_shape=jax.ShapeDtypeStruct((b, 128), jnp.float32),
        scratch_shapes=[
            pltpu.VMEM((qb * r, 128), jnp.int8),
            pltpu.SemaphoreType.DMA((qb * r,)),
        ],
        interpret=interpret,
    )(ids_pad, queries, corpus)
    return out


def gather_score(
    corpus_i8: jnp.ndarray,   # [N, D] int8, D <= 128 (padded on device)
    ids: jnp.ndarray,         # [B, R] int32, R <= 128
    queries: jnp.ndarray,     # [B, D] f32
    qb: int = 4,
    interpret: bool = False,
) -> jnp.ndarray:
    """scores [B, R] f32 = queries . corpus_i8[ids] (int8 read as its
    integer value; fold dequant scales outside). B must be a multiple
    of qb."""
    n, d = corpus_i8.shape
    b, r = ids.shape
    if d > 128 or r > 128:
        raise ValueError("D <= 128 and R <= 128 required")
    if b % qb:
        raise ValueError(f"B={b} must be a multiple of qb={qb}")
    if d < 128:
        corpus_i8 = jnp.concatenate(
            [corpus_i8, jnp.zeros((n, 128 - d), jnp.int8)], axis=1)
        queries = jnp.concatenate(
            [queries, jnp.zeros((b, 128 - d), queries.dtype)], axis=1)
    ids_pad = jnp.concatenate(
        [ids.astype(jnp.int32),
         jnp.zeros((b, 128 - r), jnp.int32)], axis=1) if r < 128 else ids
    out = _gather_score_call(
        ids_pad, queries.astype(jnp.float32), corpus_i8, r, qb, interpret)
    return out[:, :r]


def gather_score_xla(
    corpus_i8: jnp.ndarray, ids: jnp.ndarray, queries: jnp.ndarray
) -> jnp.ndarray:
    """The XLA lowering of the identical op (take + einsum) — the
    baseline the kernel must beat."""
    rows = jnp.take(corpus_i8, ids, axis=0).astype(jnp.bfloat16)
    return jnp.einsum(
        "brd,bd->br", rows, queries.astype(jnp.bfloat16),
        preferred_element_type=jnp.float32)
