"""Hand-written Pallas TPU kernels for the hot ops.

ivf_bucket_dots: fused gather+score for IVF search. The XLA path
(`ops/ivf.py:ivf_search`) materializes gathered bucket blocks [B, cap, D]
to HBM and reads them back for the einsum. This kernel keeps the bucket
table in HBM un-blocked and explicitly DMAs each program's probed bucket
blocks into VMEM scratch (bf16 — half the traffic), overlapping the
eight per-query DMAs, then runs one bf16 contraction per program.

TPU tiling rules shape the layout (blocks' trailing dims must be
(8k, 128k) or span the array):
  - grid (B/8, P): eight queries per program -> query block (8, D)
  - output [P, B, cap_pad] with block (1, 8, cap_pad); cap is padded to
    a multiple of 128 (pad slots carry sentinel ids and are masked by
    the caller)
  - bucket table passed with memory_space=ANY (no blocking); rows are
    pulled with make_async_copy inside the kernel

Correctness is tested in interpreter mode on CPU; the compiled path runs
on real TPU hardware.

Measured (v5e, 1M x 128, nprobe=8, batch 2048): 6.4k QPS at recall
0.9998 — correct but ~3x slower than the XLA gather+einsum path (19.3k):
manual per-program DMAs don't pipeline across grid steps the way XLA's
fused gather does, and the (B/8 x P) grid pays per-program overhead.

DECIDED (round 3): the XLA path is the permanent IVF engine; this
kernel stays as the tested explicit-DMA reference only. Rationale: the
bucket scan is a dense regular gather+contraction — exactly the shape
XLA already pipelines optimally — so a hand kernel can only win by
out-scheduling the compiler on its best case, and the measured 3x says
it doesn't. Pallas effort goes where XLA structurally cannot follow:
data-dependent traversal with state in VMEM (ops/fused_beam.py, 5-6x
the XLA hop loop; ops/pq_beam.py for the DEEP-10M layout).
"""

from __future__ import annotations

import functools

import jax
import jax.numpy as jnp
import numpy as np

from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu

QGROUP = 8  # queries per program (f32 sublane granularity)


def pallas_available() -> bool:
    """True on a real TPU backend (compiled pallas); CPU tests use
    interpret mode."""
    try:
        return jax.devices()[0].platform in ("tpu", "axon")
    except Exception:
        return False


def tpu_compiler_options():
    """Per-jit XLA options for programs containing big Pallas kernels.

    The PQ traversal kernel's unrolled per-subspace ADC contraction
    needs ~55MB of Mosaic stack temporaries at qb=16 — over the 16MB
    default scoped-vmem limit (v5e VMEM is 128MB, so the headroom is
    real; first-hardware-compile OOM, round 4). The residual (two-level
    coarse+fine) ADC variant needs 68.9MB, over the first 64MB raise —
    80MB covers both with headroom while leaving 48MB for block
    buffers. Raising the limit is a TPU-only debug option: CPU/GPU
    compiles reject the unknown flag, so return None there."""
    if not pallas_available():
        return None
    return {"xla_tpu_scoped_vmem_limit_kib": 81920}


def lazy_tpu_jit(fn, **jit_kwargs):
    """jax.jit with `tpu_compiler_options`, deferred to first call so
    importing a module never initializes a JAX backend."""
    box = {}

    def call(*args, **kwargs):
        f = box.get("f")
        if f is None:
            f = jax.jit(
                fn, compiler_options=tpu_compiler_options(), **jit_kwargs)
            box["f"] = f
        return f(*args, **kwargs)

    return call


def _bucket_dots_kernel(probe_ref, q_ref, vecs_hbm, o_ref, scratch, sems):
    # probe_ref: [B, P] int32 (scalar prefetch, SMEM)
    # q_ref:     [QGROUP, D] f32 block for this program's queries
    # vecs_hbm:  [K, cap_pad, D] bf16, un-blocked (ANY/HBM)
    # o_ref:     [1, QGROUP, cap_pad] f32 out block
    # scratch:   [QGROUP, cap_pad, D] bf16 VMEM
    # sems:      DMA semaphores [QGROUP]
    i = pl.program_id(0)
    j = pl.program_id(1)

    for t in range(QGROUP):
        c = probe_ref[i * QGROUP + t, j]
        pltpu.make_async_copy(
            vecs_hbm.at[c], scratch.at[t], sems.at[t]
        ).start()
    for t in range(QGROUP):
        pltpu.make_async_copy(
            vecs_hbm.at[0], scratch.at[t], sems.at[t]
        ).wait()

    # Mosaic lowers neither batched dot_general nor 1-wide matvecs; do
    # one wide 2D dot for the whole group ([QG*cap, D] x [D, QG] on the
    # MXU) and select each query's own column with an iota mask. The 8x
    # extra MXU work is negligible next to the DMA traffic.
    q = q_ref[:].astype(jnp.bfloat16)                      # [QGROUP, D]
    cap_pad = scratch.shape[1]
    flat = scratch[:].reshape(QGROUP * cap_pad, scratch.shape[2])
    allc = jnp.dot(
        flat, q.T, preferred_element_type=jnp.float32
    ).reshape(QGROUP, cap_pad, QGROUP)
    own = (
        jax.lax.broadcasted_iota(jnp.int32, (QGROUP, cap_pad, QGROUP), 0)
        == jax.lax.broadcasted_iota(jnp.int32, (QGROUP, cap_pad, QGROUP), 2)
    )
    o_ref[0] = jnp.sum(jnp.where(own, allc, 0.0), axis=2)


@functools.partial(jax.jit, static_argnames=("interpret",))
def ivf_bucket_dots(
    queries: jnp.ndarray,       # [B, D] f32, B % QGROUP == 0
    probe: jnp.ndarray,         # [B, P] int32
    bucket_vecs: jnp.ndarray,   # [K, cap_pad, D] bf16, cap_pad % 128 == 0
    interpret: bool = False,
) -> jnp.ndarray:
    """Returns dots [P, B, cap_pad] f32 (query . bucket_vector)."""
    b, d = queries.shape
    p = probe.shape[1]
    k, cap_pad, _ = bucket_vecs.shape

    grid_spec = pltpu.PrefetchScalarGridSpec(
        num_scalar_prefetch=1,
        grid=(b // QGROUP, p),
        in_specs=[
            pl.BlockSpec((QGROUP, d), lambda i, j, pref: (i, 0)),
            pl.BlockSpec(memory_space=pl.ANY),
        ],
        out_specs=pl.BlockSpec(
            (1, QGROUP, cap_pad), lambda i, j, pref: (j, i, 0)
        ),
        scratch_shapes=[
            pltpu.VMEM((QGROUP, cap_pad, d), jnp.bfloat16),
            pltpu.SemaphoreType.DMA((QGROUP,)),
        ],
    )
    return pl.pallas_call(
        _bucket_dots_kernel,
        out_shape=jax.ShapeDtypeStruct((p, b, cap_pad), jnp.float32),
        grid_spec=grid_spec,
        interpret=interpret,
    )(probe, queries, bucket_vecs)


# --------------------------------------------------------------- ivf8 scan


def _make_ivf8_kernel(metric: str, neg_inf: float):
    def kernel(probe_ref, q_ref, pay_ref, scale_ref, nsq_ref, ids_ref,
               cent_ref, o_ref):
        # probe_ref: [B, P] int32 scalar prefetch (SMEM)
        # q_ref:     [1, 1, D_pad] f32 — this program's query
        # pay_ref:   [1, cap_pad, D_pad] int8 — probed bucket's payload
        # scale_ref/nsq_ref/ids_ref: [1, 1, cap_pad] f32/f32/int32
        # cent_ref:  [1, 1, D_pad] f32 — bucket centroid (dup per
        #            overflow block)
        # o_ref:     [1, 1, 1, cap_pad] f32 masked scores
        # (2-D operands ride with a singleton middle dim: Mosaic
        # requires each block's minor two dims be (8k, 128k) or equal
        # to the array's — a [1, D] block over [B, D] violates that,
        # a [1, 1, D] block over [B, 1, D] is whole-array in the minor
        # dims and always legal)
        q = q_ref[0].astype(jnp.bfloat16)                   # [1, D]
        # Mosaic lowers neither matvecs nor batched dots: replicate the
        # query to 8 columns and keep column 0 (MXU waste is noise next
        # to the DMA bytes)
        q8 = jnp.broadcast_to(q.T, (q.shape[1], 8))         # [D, 8]
        pay = pay_ref[0].astype(jnp.bfloat16)               # [cap, D]
        rd = jnp.dot(pay, q8, preferred_element_type=jnp.float32)
        rdots = rd[:, 0][None, :]                           # [1, cap]
        # residual payload: x = c + s*r8 -> <q,x> = <q,c> + s<q,r8>
        cdot = jnp.sum(cent_ref[0] * q_ref[0])              # scalar
        dots = cdot + rdots * scale_ref[0]
        if metric == "l2":
            scores = 2.0 * dots - nsq_ref[0]
        else:
            scores = dots
        o_ref[0, 0] = jnp.where(ids_ref[0] == -1, neg_inf, scores)

    return kernel


@functools.partial(jax.jit, static_argnames=("metric", "interpret"))
def ivf8_bucket_scores(
    queries,      # [B, D_pad] f32 (lane-padded)
    probe,        # [B, P] int32
    payload,      # [K', cap_pad, D_pad] int8 (pad rows: ids -1)
    scale,        # [K', cap_pad] f32
    nsq,          # [K', cap_pad] f32
    ids,          # [K', cap_pad] int32 (-1 = empty slot)
    cent,         # [K', D_pad] f32
    metric: str,
    interpret: bool = False,
):
    """Residual-int8 bucket scan as DMA-pipelined Pallas blocks.

    The XLA path's `payload[cluster]` take-gather runs at <1% of HBM
    bandwidth at 10M (r4 rows: hbm_bw_pct 0.28-0.63) — element-gather
    latency, not bandwidth, bound. Here every (query, probe) program's
    bucket block arrives as a scalar-prefetch-indexed INPUT BLOCK
    (index_map reads the probe table), so Mosaic prefetches program
    g+1's contiguous [cap, D] block while g computes — the automatic
    double-buffering the round-3 manual-DMA kernel lacked (its measured
    3x loss is the file-header note). Returns masked scores
    [B, P, cap_pad] f32; candidate positions are probe-derived, so the
    caller needs NO further big gathers before top-k."""
    b, _ = queries.shape
    p = probe.shape[1]
    kp, cap_pad, d_pad = payload.shape

    grid_spec = pltpu.PrefetchScalarGridSpec(
        num_scalar_prefetch=1,
        grid=(b, p),
        in_specs=[
            pl.BlockSpec((1, 1, d_pad), lambda i, j, pref: (i, 0, 0)),
            pl.BlockSpec(
                (1, cap_pad, d_pad),
                lambda i, j, pref: (pref[i, j], 0, 0)),
            pl.BlockSpec(
                (1, 1, cap_pad), lambda i, j, pref: (pref[i, j], 0, 0)),
            pl.BlockSpec(
                (1, 1, cap_pad), lambda i, j, pref: (pref[i, j], 0, 0)),
            pl.BlockSpec(
                (1, 1, cap_pad), lambda i, j, pref: (pref[i, j], 0, 0)),
            pl.BlockSpec(
                (1, 1, d_pad), lambda i, j, pref: (pref[i, j], 0, 0)),
        ],
        out_specs=pl.BlockSpec(
            (1, 1, 1, cap_pad), lambda i, j, pref: (i, j, 0, 0)),
    )
    neg_inf = float("-inf")
    out = pl.pallas_call(
        _make_ivf8_kernel(metric, neg_inf),
        out_shape=jax.ShapeDtypeStruct((b, p, 1, cap_pad), jnp.float32),
        grid_spec=grid_spec,
        interpret=interpret,
    )(probe, queries[:, None, :], payload, scale[:, None, :],
      nsq[:, None, :], ids[:, None, :], cent[:, None, :])
    return out[:, :, 0, :]


@functools.partial(
    jax.jit,
    static_argnames=("k", "nprobe", "metric", "sentinel", "interpret"),
)
def ivf_search_pallas(
    queries,          # [B, D] f32, B % QGROUP == 0
    centroids,        # [K', D] f32
    bucket_ids_pad,   # [K', cap_pad] int32 (pad = sentinel)
    bucket_vecs_bf16,  # [K', cap_pad, D] bf16
    bucket_sq_pad,    # [K', cap_pad] f32
    k: int,
    nprobe: int,
    metric: str,
    sentinel: int,
    interpret: bool = False,
):
    """Centroid GEMM -> top-nprobe -> fused bucket kernel -> one top-k
    over the flattened [B, P*cap] candidates."""
    from leann_tpu.ops.distance import NEG_INF, pairwise_scores

    b = queries.shape[0]
    cap_pad = bucket_ids_pad.shape[1]
    c_scores = pairwise_scores(queries, centroids, metric)
    _, probe = jax.lax.top_k(c_scores, nprobe)               # [B, P]

    dots = ivf_bucket_dots(
        queries, probe, bucket_vecs_bf16, interpret=interpret
    )                                                        # [P, B, cap]
    dots = dots.transpose(1, 0, 2)                           # [B, P, cap]
    ids = bucket_ids_pad[probe]                              # [B, P, cap]
    if metric == "l2":
        scores = 2.0 * dots - bucket_sq_pad[probe]
    else:
        scores = dots
    scores = scores.reshape(b, nprobe * cap_pad)
    ids = ids.reshape(b, nprobe * cap_pad)
    scores = jnp.where(ids == sentinel, NEG_INF, scores)
    ids = jnp.where(ids == sentinel, -1, ids)
    top_scores, pos = jax.lax.top_k(scores, k)
    top_ids = jnp.take_along_axis(ids, pos, axis=1)
    return top_scores, top_ids
