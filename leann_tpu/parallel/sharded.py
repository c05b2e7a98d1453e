"""Sharded search over a device mesh (shard_map + XLA collectives).

Design (SURVEY §2.4 "TPU-native equivalents"): the corpus is row-sharded
across chips; queries are data-parallel over `dp` and replicated over
`shard`; each chip searches its local block/subgraph; per-shard top-k
candidates are all-gathered over ICI and merged with one final top-k.
Per-shard local ids are rebased to global ids with the shard offset.

Four engines:
  ShardedFlatIndex   exact chunked matmul top-k per shard
  ShardedGraphIndex  per-shard Vamana subgraph + frontier-batched beam
                     search per shard (the DEEP-10M configuration:
                     graphs too big for one chip's HBM)
  ShardedIvfIndex    per-shard k-means buckets + partitioned matmul scan
                     (the throughput engine, sharded)
  ShardedIvf8Index   per-shard residual-int8 buckets, rerank from the
                     same payload, no f32 corpus anywhere (the
                     DEEP-100M configuration: 1 byte/dim per shard)
"""

from __future__ import annotations

import functools
from typing import Optional, Tuple

import jax
import jax.numpy as jnp
import numpy as np
from jax.sharding import Mesh, NamedSharding, PartitionSpec as P

try:  # JAX >= 0.8 exposes shard_map at top level
    shard_map = jax.shard_map
except AttributeError:  # pragma: no cover
    from jax.experimental.shard_map import shard_map  # type: ignore

from leann_tpu.ops.beam import beam_search_batch
from leann_tpu.ops.distance import NEG_INF, pairwise_scores
from leann_tpu.ops.pallas_kernels import lazy_tpu_jit as _lazy_tpu_jit


def _pad_rows(x: np.ndarray, rows: int, fill=0) -> np.ndarray:
    if x.shape[0] == rows:
        return x
    pad = np.full((rows - x.shape[0],) + x.shape[1:], fill, dtype=x.dtype)
    return np.concatenate([x, pad])


class ShardedFlatIndex:
    """Exact search, corpus row-sharded over the `shard` mesh axis."""

    def __init__(self, vectors: np.ndarray, mesh: Mesh, metric: str = "ip"):
        self.mesh = mesh
        self.metric_in = metric
        vectors = np.ascontiguousarray(vectors, dtype=np.float32)
        if metric == "cosine":
            vectors = vectors / (
                np.linalg.norm(vectors, axis=1, keepdims=True) + 1e-12
            )
        self.metric = "ip" if metric == "cosine" else metric
        self.n, self.d = vectors.shape
        self.n_shards = mesh.shape["shard"]
        self.rows_per_shard = -(-self.n // self.n_shards)
        padded = _pad_rows(vectors, self.rows_per_shard * self.n_shards)
        # row-sharded corpus: each chip holds a contiguous block in HBM
        self.vectors = jax.device_put(
            padded, NamedSharding(mesh, P("shard", None))
        )

    def search(
        self, queries: np.ndarray, k: int = 10
    ) -> Tuple[np.ndarray, np.ndarray]:
        q = np.asarray(queries, dtype=np.float32)
        if q.ndim == 1:
            q = q[None, :]
        if self.metric_in == "cosine":
            q = q / (np.linalg.norm(q, axis=1, keepdims=True) + 1e-12)
        dp = self.mesh.shape.get("dp", 1)
        b = q.shape[0]
        b_pad = -(-b // dp) * dp
        q = _pad_rows(q, b_pad)
        k = min(k, self.n)
        scores, idx = _sharded_flat_topk(
            jnp.asarray(q), self.vectors, k, self.metric, self.mesh,
            self.n, self.rows_per_shard,
        )
        return np.asarray(idx)[:b], np.asarray(scores)[:b]


@functools.partial(
    jax.jit, static_argnames=("k", "metric", "mesh", "valid_n", "rows_per_shard")
)
def _sharded_flat_topk(queries, vectors, k, metric, mesh, valid_n, rows_per_shard):
    def local_fn(q, v):
        # q: [B/dp, D] (replicated over shard); v: [rows, D] local block
        q = q.reshape(q.shape[-2], q.shape[-1])
        v = v.reshape(-1, v.shape[-1])
        shard_id = jax.lax.axis_index("shard")
        base = shard_id * rows_per_shard
        scores = pairwise_scores(q, v, metric)                 # [b, rows]
        col = jax.lax.broadcasted_iota(jnp.int32, scores.shape, 1) + base
        scores = jnp.where(col < valid_n, scores, NEG_INF)
        # k can exceed a shard's local row count (tiny corpora, or
        # overfetched serving k); each shard contributes what it has
        # and the cross-shard merge still sees k_local * n_shards rows
        k_local = min(k, scores.shape[1])
        local_scores, local_pos = jax.lax.top_k(scores, k_local)
        local_idx = jnp.take_along_axis(col, local_pos, axis=1)
        # combine across shards: one all_gather of [b, k] over ICI
        all_scores = jax.lax.all_gather(local_scores, "shard", axis=1)
        all_idx = jax.lax.all_gather(local_idx, "shard", axis=1)
        all_scores = all_scores.reshape(q.shape[0], -1)
        all_idx = all_idx.reshape(q.shape[0], -1)
        top_scores, pos = jax.lax.top_k(all_scores, k)
        top_idx = jnp.take_along_axis(all_idx, pos, axis=1)
        return top_scores, top_idx

    fn = shard_map(
        local_fn,
        mesh=mesh,
        in_specs=(P("dp", None), P("shard", None)),
        out_specs=(P("dp", None), P("dp", None)),
        check_vma=False,
    )
    return fn(queries, vectors)


class ShardedGraphIndex:
    """Per-shard Vamana subgraphs searched in parallel, merged over ICI.

    Each shard builds its own graph over its local rows (embarrassingly
    parallel build), searches locally with the frontier-batched beam, and
    contributes its top-k to one all_gather + merge. Memory per chip is
    N/s vectors + N/s adjacency rows — the DEEP-10M story.

    Engine selection mirrors GraphSearcher (backend/__init__.py): on a
    real TPU with kernel-compatible shapes each shard traverses with the
    fused whole-traversal Pallas kernel (per-shard int8 inline blocks in
    local HBM, ~5-6x the XLA hop-loop's throughput); when the inline
    blocks exceed the per-chip HBM budget but PQ records fit, each shard
    traverses with the PQ fused kernel (one global codebook, replicated
    affine-LUT operands, per-shard 16B/node records + exact local
    rescore — the DEEP-100M-class footprint); otherwise — CPU dryrun
    mesh, incompatible shapes — the XLA inline-block path serves.
    Override with `engine="fused"|"pq"|"xla"` or LEANN_GRAPH_ENGINE."""

    def __init__(
        self,
        vectors: np.ndarray,
        mesh: Mesh,
        metric: str = "ip",
        graph_degree: int = 32,
        complexity: int = 64,
        alpha: float = 1.2,
        adjacency_shards: Optional[np.ndarray] = None,
        medoids: Optional[np.ndarray] = None,
        build_wave_size: int = 1024,
        engine: str = "auto",
        qb: int = 16,
        interpret: bool = False,
        seed: int = 0,
        rotation: Optional[np.ndarray] = None,  # [D, D] OPQ (pq engine)
    ):
        from leann_tpu.ops.vamana import build_vamana

        self.mesh = mesh
        self.metric_in = metric
        vectors = np.ascontiguousarray(vectors, dtype=np.float32)
        if metric == "cosine":
            vectors = vectors / (
                np.linalg.norm(vectors, axis=1, keepdims=True) + 1e-12
            )
        self.metric = "ip" if metric == "cosine" else metric
        self.n, self.d = vectors.shape
        self.n_shards = mesh.shape["shard"]
        self.rows = -(-self.n // self.n_shards)  # rows per shard
        r = graph_degree

        padded = _pad_rows(vectors, self.rows * self.n_shards)
        # stacked per-shard layout [s, rows+1, ...]; local sentinel = rows
        vec_stack = np.zeros(
            (self.n_shards, self.rows + 1, self.d), np.float32
        )
        adj_stack = np.full(
            (self.n_shards, self.rows + 1, r), self.rows, np.int32
        )
        med = np.zeros(self.n_shards, np.int32)
        for s in range(self.n_shards):
            block = padded[s * self.rows : (s + 1) * self.rows]
            valid = min(self.rows, max(0, self.n - s * self.rows))
            vec_stack[s, : self.rows] = block
            if adjacency_shards is not None:
                adj_stack[s, : self.rows] = adjacency_shards[s]
                med[s] = medoids[s]
            elif valid > 1:
                adj, medoid = build_vamana(
                    block[:valid], graph_degree=r, complexity=complexity,
                    alpha=alpha, metric=self.metric,
                    wave_size=build_wave_size,
                )
                # rebase local sentinel (== valid) to rows
                adj = np.where(adj >= valid, self.rows, adj)
                adj_stack[s, :valid] = adj
                med[s] = medoid
        shard3 = NamedSharding(mesh, P("shard", None, None))
        self.vec_stack = jax.device_put(vec_stack, shard3)
        self.adj_stack = jax.device_put(adj_stack, shard3)
        sq = (vec_stack * vec_stack).sum(axis=2)
        self.sq_stack = jax.device_put(sq, NamedSharding(mesh, P("shard", None)))
        self.medoids = jax.device_put(med, NamedSharding(mesh, P("shard")))
        self.adjacency_shards = adj_stack[:, : self.rows]
        self.medoids_host = med

        import os

        choice = engine
        if choice == "auto":
            choice = os.environ.get("LEANN_GRAPH_ENGINE", "auto")
        use_pq = False
        if choice == "auto":
            from leann_tpu.ops.pallas_kernels import pallas_available

            # same HBM policy as GraphSearcher, per chip: one shard's
            # int8 inline blocks are (rows+1)*R*D bytes of local HBM;
            # beyond that the PQ records ((rows+1)*cp*512 bytes) keep
            # the fused kernel serving (the DEEP-100M-class footprint:
            # 16B codes/node instead of R*D inline bytes)
            blocks_gb = (self.rows + 1) * r * self.d / 1e9
            use_fused = (
                pallas_available() and self.d % 128 == 0 and r <= 128
                and blocks_gb < 9.0
            )
            if not use_fused and pallas_available() and r <= 128:
                m = next((mm for mm in (16, 12, 8) if self.d % mm == 0), 0)
                if m and r % 4 == 0:
                    from leann_tpu.ops.pq_beam import pq_layout

                    _, _, _, cp = pq_layout(r, m, 8)
                    pq_gb = ((self.rows + 1) * cp * 512
                             + self.rows * self.d * 4) / 1e9
                    use_pq = pq_gb < 13.0
        else:
            use_fused = choice in ("fused", "inline")
            use_pq = choice == "pq"
        self.engine = ("fused" if use_fused
                       else "pq" if use_pq else "xla")
        self.qb = qb
        self.interpret = interpret
        if use_fused:
            from leann_tpu.ops.fused_beam import pack_fused

            bl_l, me_l = [], []
            for s in range(self.n_shards):
                # self.vec_stack is already on device — slicing it avoids
                # re-uploading the corpus once per shard
                bl, me = pack_fused(
                    self.vec_stack[s], self.adj_stack[s]
                )
                # keep the packed blocks ON DEVICE: round-tripping them
                # through np.asarray cost 2 x N*R*D bytes over the host
                # link (12GB at 1M R=48 D=128 — a 30-minute hang on the
                # relay tunnel, round-4 hardware shakeout)
                bl_l.append(bl)
                me_l.append(me)
            shard4 = NamedSharding(mesh, P("shard", None, None, None))
            self.blocks_stack = jax.device_put(jnp.stack(bl_l), shard4)
            self.meta_stack = jax.device_put(jnp.stack(me_l), shard4)

            # per-shard seed pools (true vectors, bf16) for query-
            # adaptive entry selection inside the shard body
            rng = np.random.default_rng(seed)
            from leann_tpu.ops.beam import seed_pool_size

            pool = seed_pool_size(self.rows)
            sid = np.zeros((self.n_shards, pool), np.int32)
            for s in range(self.n_shards):
                valid = min(self.rows, max(1, self.n - s * self.rows))
                picks = rng.choice(valid, size=min(pool, valid),
                                   replace=False).astype(np.int32)
                picks[0] = med[s]
                sid[s] = np.resize(picks, pool)
            svec = np.take_along_axis(
                vec_stack, sid[:, :, None], axis=1
            ).astype(np.float32)
            self.seed_ids_stack = jax.device_put(
                sid, NamedSharding(mesh, P("shard", None)))
            self.seed_vecs_stack = jax.device_put(
                jnp.asarray(svec).astype(jnp.bfloat16), shard3)
        elif use_pq:
            # ONE global codebook trained on a cross-shard sample (so
            # the affine LUT operands replicate instead of sharding —
            # the per-query LUT matmul is identical on every chip);
            # per-shard codes + inline records live in local HBM. With
            # `rotation` (OPQ), codes are rotated-frame and the
            # rotation folds into lut_w (see ops/pq_beam.PqBeamEngine).
            from leann_tpu.ops.pq import (
                adc_affine, encode_pq, reconstruct_pq, train_pq)
            from leann_tpu.ops.pq_beam import pack_pq_records_host

            rng = np.random.default_rng(seed)
            self.pq_m = next(
                (mm for mm in (16, 12, 8) if self.d % mm == 0), 0)
            if not self.pq_m or r % 4 != 0:
                raise ValueError(
                    f"pq engine needs d divisible by 16/12/8 and "
                    f"R % 4 == 0 (d={self.d}, R={r})")
            self.pq_ksub = 256
            enc_stack = vec_stack
            self.rotation = None
            if rotation is not None:
                self.rotation = np.ascontiguousarray(rotation, np.float32)
                enc_stack = vec_stack @ self.rotation
            gids = rng.choice(
                self.n, size=min(262_144, self.n), replace=False)
            books = train_pq(
                enc_stack[gids // self.rows, gids % self.rows],
                m=self.pq_m, ksub=self.pq_ksub, iters=10, seed=seed)
            self.pq_books = books
            rec_l, sid_l, shat_l, snsq_l = [], [], [], []
            from leann_tpu.ops.beam import seed_pool_size

            pool = seed_pool_size(self.rows)
            for s in range(self.n_shards):
                codes = encode_pq(enc_stack[s], books)
                codes[self.rows] = 0          # sentinel row
                rec_l.append(pack_pq_records_host(adj_stack[s], codes, 8))
                valid = min(self.rows, max(1, self.n - s * self.rows))
                picks = rng.choice(valid, size=min(pool, valid),
                                   replace=False).astype(np.int32)
                picks[0] = med[s]
                picks = np.resize(picks, pool)
                sid_l.append(picks)
                # seeds score via their RECONSTRUCTIONS so entry scores
                # are ADC-comparable with the kernel's beam scores
                shat = reconstruct_pq(codes[picks], books)
                snsq_l.append(np.einsum(
                    "pd,pd->p", shat, shat,
                    dtype=np.float64).astype(np.float32))
                if self.rotation is not None:
                    shat = shat @ self.rotation.T
                shat_l.append(shat)
            shard4 = NamedSharding(mesh, P("shard", None, None, None))
            self.records_stack = jax.device_put(np.stack(rec_l), shard4)
            lut_w, lut_b = adc_affine(
                self.d, self.metric, None, books, self.pq_ksub)
            lut_w = lut_w.reshape(self.pq_m * self.pq_ksub, self.d)
            if self.rotation is not None:
                lut_w = lut_w @ self.rotation.T
            # replicated (tiny): every shard computes the same LUTs
            self.lut_w = jnp.asarray(lut_w)
            self.lut_b = jnp.asarray(
                lut_b.reshape(self.pq_m * self.pq_ksub))
            self.seed_ids_stack = jax.device_put(
                np.stack(sid_l), NamedSharding(mesh, P("shard", None)))
            self.seed_vecs_stack = jax.device_put(
                jnp.asarray(np.stack(shat_l)).astype(jnp.bfloat16),
                shard3)
            self.seed_nsq_stack = jax.device_put(
                np.stack(snsq_l), NamedSharding(mesh, P("shard", None)))

    def search(
        self, queries: np.ndarray, k: int = 10, beam_width: int = 64
    ) -> Tuple[np.ndarray, np.ndarray]:
        q = np.asarray(queries, dtype=np.float32)
        if q.ndim == 1:
            q = q[None, :]
        if self.metric_in == "cosine":
            q = q / (np.linalg.norm(q, axis=1, keepdims=True) + 1e-12)
        dp = self.mesh.shape.get("dp", 1)
        b = q.shape[0]
        quant = dp * (self.qb if self.engine in ("fused", "pq") else 1)
        b_pad = -(-b // quant) * quant
        q = _pad_rows(q, b_pad)
        k_eff = min(k, self.rows)
        if self.engine == "fused":
            scores, idx = _sharded_fused_topk(
                jnp.asarray(q), self.vec_stack, self.sq_stack,
                self.blocks_stack, self.meta_stack,
                self.seed_ids_stack, self.seed_vecs_stack,
                k_eff, beam_width, self.metric, self.mesh,
                self.rows, self.n, self.adjacency_shards.shape[2],
                self.qb, self.interpret,
            )
        elif self.engine == "pq":
            scores, idx = _sharded_pq_topk(
                jnp.asarray(q), self.vec_stack, self.sq_stack,
                self.records_stack, self.lut_w, self.lut_b,
                self.seed_ids_stack, self.seed_vecs_stack,
                self.seed_nsq_stack,
                k_eff, beam_width, self.metric, self.mesh,
                self.rows, self.n, self.adjacency_shards.shape[2],
                self.pq_m, self.pq_ksub, self.qb, self.interpret,
            )
        else:
            scores, idx = _sharded_beam_topk(
                jnp.asarray(q), self.vec_stack, self.adj_stack,
                self.sq_stack, self.medoids, k_eff, beam_width,
                self.metric, self.mesh, self.rows, self.n,
            )
        return np.asarray(idx)[:b], np.asarray(scores)[:b]


@functools.partial(
    jax.jit,
    static_argnames=(
        "k", "beam_width", "metric", "mesh", "rows", "valid_n"
    ),
)
def _sharded_beam_topk(
    queries, vec_stack, adj_stack, sq_stack, medoids,
    k, beam_width, metric, mesh, rows, valid_n,
):
    def local_fn(q, v, a, sq, med):
        q = q.reshape(q.shape[-2], q.shape[-1])
        v = v.reshape(-1, v.shape[-1])          # [rows+1, D]
        a = a.reshape(-1, a.shape[-1])          # [rows+1, R]
        sq = sq.reshape(-1)
        med = med.reshape(())
        b = q.shape[0]
        exclude = jnp.full((b,), -1, jnp.int32)
        beam_ids, beam_scores = beam_search_batch(
            q, v, a, sq, med, exclude,
            beam_width=beam_width, max_iters=4 * beam_width + 32,
            metric=metric,
        )
        shard_id = jax.lax.axis_index("shard")
        base = shard_id * rows
        local_ids = beam_ids[:, :k]
        local_scores = beam_scores[:, :k]
        global_ids = jnp.where(
            local_ids == rows, valid_n, local_ids + base
        )
        # padding rows beyond valid_n score -inf so they never win
        local_scores = jnp.where(
            global_ids >= valid_n, NEG_INF, local_scores
        )
        all_scores = jax.lax.all_gather(local_scores, "shard", axis=1)
        all_idx = jax.lax.all_gather(global_ids, "shard", axis=1)
        all_scores = all_scores.reshape(b, -1)
        all_idx = all_idx.reshape(b, -1)
        top_scores, pos = jax.lax.top_k(all_scores, k)
        top_idx = jnp.take_along_axis(all_idx, pos, axis=1)
        top_idx = jnp.where(top_scores == NEG_INF, -1, top_idx)
        return top_scores, top_idx

    fn = shard_map(
        local_fn,
        mesh=mesh,
        in_specs=(
            P("dp", None),
            P("shard", None, None),
            P("shard", None, None),
            P("shard", None),
            P("shard"),
        ),
        out_specs=(P("dp", None), P("dp", None)),
        check_vma=False,
    )
    return fn(queries, vec_stack, adj_stack, sq_stack, medoids)


@functools.partial(
    jax.jit,
    static_argnames=(
        "k", "beam_width", "metric", "mesh", "rows", "valid_n", "r",
        "qb", "interpret",
    ),
)
def _sharded_fused_topk(
    queries, vec_stack, sq_stack, blocks_stack, meta_stack,
    seed_ids_stack, seed_vecs_stack,
    k, beam_width, metric, mesh, rows, valid_n, r, qb, interpret,
):
    """Per-shard fused-kernel traversal + exact local rescore + ICI
    all_gather merge. The shard body is exactly the single-chip
    _fused_search_jit pipeline (ops/fused_beam.py) on local arrays."""
    from leann_tpu.ops.fused_beam import fused_beam_search

    def local_fn(q, v, sq, blocks, meta, sids, svecs):
        q = q.reshape(q.shape[-2], q.shape[-1])
        v = v.reshape(-1, v.shape[-1])            # [rows+1, D]
        sq = sq.reshape(-1)
        blocks = blocks.reshape(blocks.shape[-3:])
        meta = meta.reshape(meta.shape[-3:])
        sids = sids.reshape(-1)
        svecs = svecs.reshape(-1, svecs.shape[-1])
        b = q.shape[0]

        q_bf = q.astype(jnp.bfloat16)
        sd = jnp.einsum(
            "pd,bd->bp", svecs, q_bf, preferred_element_type=jnp.float32)
        if metric == "l2":
            sd = 2.0 * sd - sq[sids][None, :]
        s_eff = min(16, sids.shape[0])
        entry_sc, best = jax.lax.top_k(sd, s_eff)
        entry = sids[best]
        exclude = jnp.full((b,), -1, jnp.int32)
        beam_ids, _ = fused_beam_search(
            q, blocks, meta, entry, entry_sc, exclude,
            r=r, beam_width=beam_width,
            max_iters=(4 * beam_width) // 2 + 32, metric=metric,
            expansions=2, qb=qb, ring_size=1024, interpret=interpret,
        )
        # exact f32 rescore against the local corpus block
        cand = v[beam_ids]                        # [b, L, D]
        dots = jnp.einsum(
            "bld,bd->bl", cand, q, preferred_element_type=jnp.float32,
            precision=jax.lax.Precision.HIGHEST,
        )
        scores = 2.0 * dots - sq[beam_ids] if metric == "l2" else dots
        scores = jnp.where(beam_ids == rows, NEG_INF, scores)
        local_scores, pos = jax.lax.top_k(scores, k)
        local_ids = jnp.take_along_axis(beam_ids, pos, axis=1)

        shard_id = jax.lax.axis_index("shard")
        base = shard_id * rows
        global_ids = jnp.where(local_ids == rows, valid_n, local_ids + base)
        local_scores = jnp.where(
            global_ids >= valid_n, NEG_INF, local_scores)
        all_scores = jax.lax.all_gather(local_scores, "shard", axis=1)
        all_idx = jax.lax.all_gather(global_ids, "shard", axis=1)
        all_scores = all_scores.reshape(b, -1)
        all_idx = all_idx.reshape(b, -1)
        top_scores, pos = jax.lax.top_k(all_scores, k)
        top_idx = jnp.take_along_axis(all_idx, pos, axis=1)
        top_idx = jnp.where(top_scores == NEG_INF, -1, top_idx)
        return top_scores, top_idx

    fn = shard_map(
        local_fn,
        mesh=mesh,
        in_specs=(
            P("dp", None),
            P("shard", None, None),
            P("shard", None),
            P("shard", None, None, None),
            P("shard", None, None, None),
            P("shard", None),
            P("shard", None, None),
        ),
        out_specs=(P("dp", None), P("dp", None)),
        check_vma=False,
    )
    return fn(queries, vec_stack, sq_stack, blocks_stack, meta_stack,
              seed_ids_stack, seed_vecs_stack)


def _sharded_pq_topk_impl(
    queries, vec_stack, sq_stack, records_stack, lut_w, lut_b,
    seed_ids_stack, seed_vecs_stack, seed_nsq_stack,
    k, beam_width, metric, mesh, rows, valid_n, r, m, ksub, qb,
    interpret,
):
    """Per-shard PQ fused traversal + exact local rescore + ICI
    all_gather merge. The shard body mirrors the single-chip
    _pq_search_jit pipeline (ops/pq_beam.py) on local arrays; the LUT
    operands are replicated (one global codebook), the records and the
    rescore corpus are shard-local. The PQ record footprint
    ((rows+1)*cp*512 bytes/chip) is what lets the fused traversal serve
    corpora whose int8 inline blocks exceed one chip's HBM."""
    from leann_tpu.ops.pq_beam import pq_beam_search

    visited_pool = 256

    def local_fn(q, v, sq, records, lut_w, lut_b, sids, svecs_hat, snsq):
        q = q.reshape(q.shape[-2], q.shape[-1])
        v = v.reshape(-1, v.shape[-1])            # [rows+1, D]
        sq = sq.reshape(-1)
        records = records.reshape(records.shape[-3:])
        sids = sids.reshape(-1)
        svecs_hat = svecs_hat.reshape(-1, svecs_hat.shape[-1])
        snsq = snsq.reshape(-1)
        b = q.shape[0]

        luts = jnp.dot(
            q, lut_w.T, preferred_element_type=jnp.float32,
            precision=jax.lax.Precision.HIGHEST,
        ) + lut_b[None, :]
        # entry scores via seed reconstructions: ADC-comparable with
        # the kernel's beam scores (exact seed scores would not be)
        sd = jnp.einsum(
            "pd,bd->bp", svecs_hat, q.astype(jnp.bfloat16),
            preferred_element_type=jnp.float32)
        if metric == "l2":
            sd = 2.0 * sd - snsq[None, :]
        s_eff = min(16, sids.shape[0])
        entry_sc, best = jax.lax.top_k(sd, s_eff)
        entry = sids[best]
        exclude = jnp.full((b,), -1, jnp.int32)
        beam_ids, _, vlog = pq_beam_search(
            luts, records, entry, entry_sc, exclude,
            r=r, m=m, ksub=ksub, bits=8, beam_width=beam_width,
            max_iters=(4 * beam_width) // 2 + 32, expansions=2, qb=qb,
            ring_size=1024, track_visited=visited_pool,
            interpret=interpret,
        )
        cand = jnp.concatenate([beam_ids, vlog], axis=1)
        cand = jnp.sort(cand, axis=1)
        dup = jnp.concatenate(
            [jnp.zeros((cand.shape[0], 1), bool),
             cand[:, 1:] == cand[:, :-1]], axis=1)
        cand = jnp.where(dup, rows, cand)
        # exact f32 rescore against the local corpus block
        rows_v = v[cand]                          # [b, C, D]
        dots = jnp.einsum(
            "bcd,bd->bc", rows_v, q, preferred_element_type=jnp.float32,
            precision=jax.lax.Precision.HIGHEST,
        )
        scores = 2.0 * dots - sq[cand] if metric == "l2" else dots
        scores = jnp.where(cand == rows, NEG_INF, scores)
        local_scores, pos = jax.lax.top_k(scores, k)
        local_ids = jnp.take_along_axis(cand, pos, axis=1)

        shard_id = jax.lax.axis_index("shard")
        base = shard_id * rows
        global_ids = jnp.where(local_ids == rows, valid_n, local_ids + base)
        local_scores = jnp.where(
            global_ids >= valid_n, NEG_INF, local_scores)
        all_scores = jax.lax.all_gather(local_scores, "shard", axis=1)
        all_idx = jax.lax.all_gather(global_ids, "shard", axis=1)
        all_scores = all_scores.reshape(b, -1)
        all_idx = all_idx.reshape(b, -1)
        top_scores, pos = jax.lax.top_k(all_scores, k)
        top_idx = jnp.take_along_axis(all_idx, pos, axis=1)
        top_idx = jnp.where(top_scores == NEG_INF, -1, top_idx)
        return top_scores, top_idx

    fn = shard_map(
        local_fn,
        mesh=mesh,
        in_specs=(
            P("dp", None),
            P("shard", None, None),
            P("shard", None),
            P("shard", None, None, None),
            P(None, None),     # lut_w: replicated (one global codebook)
            P(None),           # lut_b
            P("shard", None),
            P("shard", None, None),
            P("shard", None),
        ),
        out_specs=(P("dp", None), P("dp", None)),
        check_vma=False,
    )
    return fn(queries, vec_stack, sq_stack, records_stack, lut_w, lut_b,
              seed_ids_stack, seed_vecs_stack, seed_nsq_stack)


# lazy jit with the raised scoped-vmem limit: the PQ kernel's unrolled
# ADC temporaries exceed the 16MB default (see ops/pallas_kernels.py)
_sharded_pq_topk = _lazy_tpu_jit(
    _sharded_pq_topk_impl,
    static_argnames=(
        "k", "beam_width", "metric", "mesh", "rows", "valid_n", "r",
        "m", "ksub", "qb", "interpret",
    ),
)


class ShardedIvfIndex:
    """Per-shard IVF: each shard runs k-means over its local rows, scans
    its probed buckets in bf16, and contributes top-k to one ICI
    all_gather + merge. Candidates are f32-rescored against the sharded
    corpus afterwards (host-side gather of k*rescore rows is tiny)."""

    def __init__(
        self,
        vectors: np.ndarray,
        mesh: Mesh,
        metric: str = "ip",
        n_clusters: Optional[int] = None,
        kmeans_iters: int = 8,
        cap: Optional[int] = None,
        seed: int = 0,
        centers_shards: Optional[list] = None,  # per-shard [K_s, D] f32
        assign_shards: Optional[list] = None,   # per-shard [valid_s] int32
    ):
        from leann_tpu.ops.ivf import kmeans, pack_buckets

        self.mesh = mesh
        self.metric_in = metric
        vectors = np.ascontiguousarray(vectors, dtype=np.float32)
        if metric == "cosine":
            vectors = vectors / (
                np.linalg.norm(vectors, axis=1, keepdims=True) + 1e-12
            )
        self.metric = "ip" if metric == "cosine" else metric
        self.n, self.d = vectors.shape
        self.vectors = vectors
        self.n_shards = mesh.shape["shard"]
        self.rows = -(-self.n // self.n_shards)

        padded = _pad_rows(vectors, self.rows * self.n_shards)
        per_shard = []
        # kept for persistence (store/shardfile.py)
        self.centers_host: list = []
        self.assign_host: list = []
        for s in range(self.n_shards):
            block = padded[s * self.rows : (s + 1) * self.rows]
            valid = min(self.rows, max(1, self.n - s * self.rows))
            if centers_shards is not None and assign_shards is not None:
                centers = np.asarray(centers_shards[s], np.float32)
                assign = np.asarray(assign_shards[s], np.int32)
            else:
                k = n_clusters or max(16, int(2 * valid ** 0.5))
                centers, assign = kmeans(
                    block[:valid], min(k, valid), iters=kmeans_iters,
                    metric=self.metric, seed=seed + s,
                )
            self.centers_host.append(np.asarray(centers, np.float32))
            self.assign_host.append(np.asarray(assign, np.int32))
            ids, cent, vecs = pack_buckets(block[:valid], assign, centers, cap=cap)
            per_shard.append((ids, cent, vecs))

        # pad per-shard tables to common [K', cap] shapes and stack
        kp = max(t[0].shape[0] for t in per_shard)
        cp = max(t[0].shape[1] for t in per_shard)
        ids_st = np.full((self.n_shards, kp, cp), self.rows, np.int32)
        cent_st = np.full((self.n_shards, kp, self.d), 1e30, np.float32)
        vecs_st = np.zeros((self.n_shards, kp, cp, self.d), np.float32)
        for s, (ids, cent, vecs) in enumerate(per_shard):
            kk, cc = ids.shape
            # local sentinel: rebase "valid" sentinel to self.rows
            valid = min(self.rows, max(1, self.n - s * self.rows))
            ids = np.where(ids >= valid, self.rows, ids)
            ids_st[s, :kk, :cc] = ids
            cent_st[s, :kk] = cent
            vecs_st[s, :kk, :cc] = vecs
        cent_st = np.where(cent_st >= 1e29, 0.0, cent_st)  # pad rows -> zeros
        # pad centroid rows must never win top-nprobe: give them -inf via
        # a validity mask folded into the centroid scores (zeros can win
        # for l2; mark them by an impossible bucket: all-sentinel ids)
        shard3 = NamedSharding(mesh, P("shard", None, None))
        self.bucket_ids = jax.device_put(ids_st, shard3)
        self.bucket_cent = jax.device_put(cent_st, shard3)
        self.bucket_vecs = jax.device_put(
            vecs_st.astype(jnp.bfloat16),
            NamedSharding(mesh, P("shard", None, None, None)),
        )
        sq = (vecs_st * vecs_st).sum(axis=3)
        self.bucket_sq = jax.device_put(sq, shard3)

    def search(
        self, queries: np.ndarray, k: int = 10, nprobe: int = 16
    ) -> Tuple[np.ndarray, np.ndarray]:
        q = np.asarray(queries, dtype=np.float32)
        if q.ndim == 1:
            q = q[None, :]
        if self.metric_in == "cosine":
            q = q / (np.linalg.norm(q, axis=1, keepdims=True) + 1e-12)
        dp = self.mesh.shape.get("dp", 1)
        b = q.shape[0]
        b_pad = -(-b // dp) * dp
        qp = _pad_rows(q, b_pad)
        k_eff = min(k, self.rows)
        nprobe = min(nprobe, self.bucket_cent.shape[1])
        scores, idx = _sharded_ivf_topk(
            jnp.asarray(qp), self.bucket_cent, self.bucket_ids,
            self.bucket_vecs, self.bucket_sq,
            k_eff, nprobe, self.metric, self.mesh, self.rows, self.n,
        )
        idx = np.asarray(idx)[:b]
        scores = np.asarray(scores)[:b]
        # f32 rescore of the merged candidates (tiny host gather)
        safe = np.clip(idx, 0, self.n - 1)
        vecs = self.vectors[safe]                       # [B, k, D]
        dots = np.einsum("bkd,bd->bk", vecs, q)
        if self.metric == "l2":
            rescored = 2.0 * dots - (vecs * vecs).sum(axis=2)
        else:
            rescored = dots
        rescored = np.where(idx >= 0, rescored, -np.inf)
        order = np.argsort(-rescored, axis=1)
        return np.take_along_axis(idx, order, axis=1), np.take_along_axis(
            rescored, order, axis=1
        )


@functools.partial(
    jax.jit,
    static_argnames=("k", "nprobe", "metric", "mesh", "rows", "valid_n"),
)
def _sharded_ivf_topk(
    queries, bucket_cent, bucket_ids, bucket_vecs, bucket_sq,
    k, nprobe, metric, mesh, rows, valid_n,
):
    from leann_tpu.ops.ivf import ivf_search

    def local_fn(q, cent, ids, vecs, sq):
        q = q.reshape(q.shape[-2], q.shape[-1])
        cent = cent.reshape(cent.shape[-2], cent.shape[-1])
        ids = ids.reshape(ids.shape[-2], ids.shape[-1])
        vecs = vecs.reshape(vecs.shape[-3], vecs.shape[-2], vecs.shape[-1])
        sq = sq.reshape(sq.shape[-2], sq.shape[-1])
        b = q.shape[0]
        local_scores, local_ids = ivf_search(
            q, cent, ids, vecs, sq,
            k=k, nprobe=nprobe, metric=metric, sentinel=rows,
        )
        shard_id = jax.lax.axis_index("shard")
        base = shard_id * rows
        global_ids = jnp.where(local_ids < 0, -1, local_ids + base)
        local_scores = jnp.where(
            (global_ids < 0) | (global_ids >= valid_n), NEG_INF, local_scores
        )
        all_scores = jax.lax.all_gather(local_scores, "shard", axis=1)
        all_idx = jax.lax.all_gather(global_ids, "shard", axis=1)
        all_scores = all_scores.reshape(b, -1)
        all_idx = all_idx.reshape(b, -1)
        top_scores, pos = jax.lax.top_k(all_scores, k)
        top_idx = jnp.take_along_axis(all_idx, pos, axis=1)
        top_idx = jnp.where(top_scores == NEG_INF, -1, top_idx)
        return top_scores, top_idx

    fn = shard_map(
        local_fn,
        mesh=mesh,
        in_specs=(
            P("dp", None),
            P("shard", None, None),
            P("shard", None, None),
            P("shard", None, None, None),
            P("shard", None, None),
        ),
        out_specs=(P("dp", None), P("dp", None)),
        check_vma=False,
    )
    return fn(queries, bucket_cent, bucket_ids, bucket_vecs, bucket_sq)


class ShardedIvf8Index:
    """Per-shard ivf8: residual-int8 payload scanned on each chip's MXU,
    reranked from the same payload, merged over ICI — the DEEP-100M
    serving configuration. Unlike ShardedIvfIndex there is NO f32
    corpus anywhere (host or device): per-shard HBM is 1 byte/dim of
    payload + scale/|x|^2 sidecars (~13.9GB per shard at 100M x 96
    over 8 chips = 12.5M rows/shard), and the final scores are exact
    f32 dequants of the residual payload (ops/ivf_int8.py rationale)."""

    def __init__(
        self,
        vectors: np.ndarray,
        mesh: Mesh,
        metric: str = "ip",
        n_clusters: Optional[int] = None,
        kmeans_iters: int = 8,
        cap: Optional[int] = None,
        seed: int = 0,
    ):
        from leann_tpu.ops.ivf import kmeans
        from leann_tpu.ops.ivf_int8 import pack_int8_buckets

        self.mesh = mesh
        self.metric_in = metric
        vectors = np.ascontiguousarray(vectors, dtype=np.float32)
        if metric == "cosine":
            vectors = vectors / (
                np.linalg.norm(vectors, axis=1, keepdims=True) + 1e-12
            )
        self.metric = "ip" if metric == "cosine" else metric
        self.n, self.d = vectors.shape
        self.n_shards = mesh.shape["shard"]
        self.rows = -(-self.n // self.n_shards)

        padded = _pad_rows(vectors, self.rows * self.n_shards)
        per_shard = []
        for s in range(self.n_shards):
            block = padded[s * self.rows : (s + 1) * self.rows]
            valid = min(self.rows, max(1, self.n - s * self.rows))
            k = n_clusters or max(16, int(2 * valid ** 0.5))
            centers, assign = kmeans(
                block[:valid], min(k, valid), iters=kmeans_iters,
                metric=self.metric, seed=seed + s,
            )
            ids, cent, payload, scale, nsq = pack_int8_buckets(
                block[:valid], assign, centers, cap=cap
            )
            # rebase the pack sentinel (=valid) to the common `rows`
            ids = np.where(ids >= valid, self.rows, ids)
            per_shard.append((ids, cent, payload, scale, nsq))

        kp = max(t[0].shape[0] for t in per_shard)
        cp = max(t[0].shape[1] for t in per_shard)
        ids_st = np.full((self.n_shards, kp, cp), self.rows, np.int32)
        cent_st = np.zeros((self.n_shards, kp, self.d), np.float32)
        pay_st = np.zeros((self.n_shards, kp, cp, self.d), np.int8)
        scale_st = np.zeros((self.n_shards, kp, cp), np.float32)
        nsq_st = np.zeros((self.n_shards, kp, cp), np.float32)
        for s, (ids, cent, payload, scale, nsq) in enumerate(per_shard):
            kk, cc = ids.shape
            ids_st[s, :kk, :cc] = ids
            cent_st[s, :kk] = cent
            pay_st[s, :kk, :cc] = payload
            scale_st[s, :kk, :cc] = scale
            nsq_st[s, :kk, :cc] = nsq
        # pad bucket rows hold only sentinel ids, so their candidates
        # mask to NEG_INF even when probed (same policy as ShardedIvf)
        shard3 = NamedSharding(mesh, P("shard", None, None))
        self.bucket_ids = jax.device_put(ids_st, shard3)
        self.bucket_cent = jax.device_put(cent_st, shard3)
        self.payload = jax.device_put(
            pay_st, NamedSharding(mesh, P("shard", None, None, None)))
        self.scale = jax.device_put(scale_st, shard3)
        self.nsq = jax.device_put(nsq_st, shard3)

    def search(
        self, queries: np.ndarray, k: int = 10, nprobe: int = 16,
        rescore_factor: int = 4,
    ) -> Tuple[np.ndarray, np.ndarray]:
        q = np.asarray(queries, dtype=np.float32)
        if q.ndim == 1:
            q = q[None, :]
        if self.metric_in == "cosine":
            q = q / (np.linalg.norm(q, axis=1, keepdims=True) + 1e-12)
        dp = self.mesh.shape.get("dp", 1)
        b = q.shape[0]
        b_pad = -(-b // dp) * dp
        qp = _pad_rows(q, b_pad)
        # k may exceed rows-per-shard (tiny corpora / 5x serving
        # overfetch): each shard contributes its min(k, rows) best and
        # the cross-shard merge returns min(k, n) columns — same
        # contract as _sharded_flat_topk's k_local fix
        k_local = min(k, self.rows)
        k_final = min(k, self.n)
        c = min(max(rescore_factor * k_local, k_local), self.rows)
        nprobe = min(nprobe, self.bucket_cent.shape[1])
        scores, idx = _sharded_ivf8_topk(
            jnp.asarray(qp), self.bucket_cent, self.bucket_ids,
            self.payload, self.scale, self.nsq,
            k_local, k_final, c, nprobe, self.metric, self.mesh,
            self.rows, self.n,
        )
        return np.asarray(idx)[:b], np.asarray(scores)[:b]


@functools.partial(
    jax.jit,
    static_argnames=("k", "k_final", "c", "nprobe", "metric", "mesh",
                     "rows", "valid_n"),
)
def _sharded_ivf8_topk(
    queries, bucket_cent, bucket_ids, payload, scale, nsq,
    k, k_final, c, nprobe, metric, mesh, rows, valid_n,
):
    from leann_tpu.ops.ivf_int8 import ivf8_search

    def local_fn(q, cent, ids, pay, sc, ns):
        q = q.reshape(q.shape[-2], q.shape[-1])
        cent = cent.reshape(cent.shape[-2], cent.shape[-1])
        ids = ids.reshape(ids.shape[-2], ids.shape[-1])
        pay = pay.reshape(pay.shape[-3], pay.shape[-2], pay.shape[-1])
        sc = sc.reshape(sc.shape[-2], sc.shape[-1])
        ns = ns.reshape(ns.shape[-2], ns.shape[-1])
        b = q.shape[0]
        local_ids, local_scores = ivf8_search(
            q, cent, ids, pay, sc, ns,
            k=k, c=c, nprobe=nprobe, metric=metric, sentinel=rows,
        )
        shard_id = jax.lax.axis_index("shard")
        base = shard_id * rows
        global_ids = jnp.where(local_ids < 0, -1, local_ids + base)
        local_scores = jnp.where(
            (global_ids < 0) | (global_ids >= valid_n),
            NEG_INF, local_scores,
        )
        all_scores = jax.lax.all_gather(local_scores, "shard", axis=1)
        all_idx = jax.lax.all_gather(global_ids, "shard", axis=1)
        all_scores = all_scores.reshape(b, -1)
        all_idx = all_idx.reshape(b, -1)
        top_scores, pos = jax.lax.top_k(all_scores, k_final)
        top_idx = jnp.take_along_axis(all_idx, pos, axis=1)
        top_idx = jnp.where(top_scores == NEG_INF, -1, top_idx)
        return top_scores, top_idx

    fn = shard_map(
        local_fn,
        mesh=mesh,
        in_specs=(
            P("dp", None),
            P("shard", None, None),
            P("shard", None, None),
            P("shard", None, None, None),
            P("shard", None, None),
            P("shard", None, None),
        ),
        out_specs=(P("dp", None), P("dp", None)),
        check_vma=False,
    )
    return fn(queries, bucket_cent, bucket_ids, payload, scale, nsq)
