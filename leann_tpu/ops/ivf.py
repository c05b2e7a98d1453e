"""IVF (inverted-file) index: k-means partitioning + dense block scoring.

The reference only ships graph indexes (usearch HNSW / diskann Vamana).
On TPU, batched throughput favors a partitioned *matmul* engine over
pointer-chasing: best-first graph traversal is inherently sequential
(~L hops of small gathers per query), while IVF search is

    1. score all centroids:      Q @ C.T              one big GEMM
    2. pick top-nprobe clusters per query              one top_k
    3. scan nprobe steps; each step gathers a [B, cap, D] block of
       bucket vectors and scores it as a batched GEMM, merging top-k

— nprobe (~32) sequential steps of MXU-shaped work instead of ~100+
beam hops. Build is also matmuls (Lloyd iterations on device).

Bucket layout: vectors are re-packed into [K, cap, D] padded buckets
(cap ~= 1.3 x mean occupancy); overflow beyond cap spills into extra
"overflow" buckets appended to the bucket table, so nothing is dropped —
queries that probe a spilled cluster also probe its overflow chain via
the stored per-cluster chain table.

Simplification used here: overflow rows are packed into their own
buckets whose centroid is the parent cluster's centroid, so the standard
top-nprobe centroid scoring naturally probes them (a duplicated centroid
scores identically and both copies land in the top-nprobe window
together when relevant).
"""

from __future__ import annotations

import functools
from typing import Optional, Tuple

import jax
import jax.numpy as jnp
import numpy as np

from leann_tpu.ops.distance import NEG_INF, pairwise_scores


# ---------------------------------------------------------------- k-means


@functools.partial(jax.jit, static_argnames=("k", "metric", "chunk"))
def _assign_chunked(vectors, centers, k, metric, chunk):
    n_pad = vectors.shape[0]
    blocks = vectors.reshape(n_pad // chunk, chunk, -1)

    def step(_, block):
        scores = pairwise_scores(block, centers, metric)
        return None, jnp.argmax(scores, axis=1).astype(jnp.int32)

    _, assign = jax.lax.scan(step, None, blocks)
    return assign.reshape(-1)


def kmeans(
    vectors: np.ndarray,
    k: int,
    iters: int = 8,
    metric: str = "l2",
    seed: int = 0,
    chunk: int = 65536,
) -> Tuple[np.ndarray, np.ndarray]:
    """Lloyd's algorithm on device. Returns (centers [K, D], assign [N])."""
    rng = np.random.default_rng(seed)
    n, d = vectors.shape
    chunk = min(chunk, 1 << max(8, (n - 1).bit_length()))
    n_pad = -(-n // chunk) * chunk
    v_host = np.ascontiguousarray(vectors, dtype=np.float32)
    v_pad = np.concatenate(
        [v_host, np.zeros((n_pad - n, d), np.float32)]
    ) if n_pad != n else v_host
    v_dev = jnp.asarray(v_pad)
    centers = jnp.asarray(v_host[rng.choice(n, size=k, replace=n < k)])

    # NB: the corpus is an ARGUMENT, never a closure capture — a captured
    # device array becomes an HLO constant, and at 1M x 128 that is a
    # 512MB program body (the axon remote-compile service rejects it
    # with HTTP 413, and even locally it would bloat every executable).
    for _ in range(iters):
        assign = _assign_chunked(v_dev, centers, k, metric, chunk)
        centers = _kmeans_update(v_dev, assign, centers, n, k)
    assign = _assign_chunked(v_dev, centers, k, metric, chunk)
    return np.asarray(centers), np.asarray(assign[:n])


@functools.partial(jax.jit, static_argnames=("n", "k"))
def _kmeans_update(v_dev, assign, centers_prev, n: int, k: int):
    a = assign[:n]
    sums = jax.ops.segment_sum(v_dev[:n], a, num_segments=k)
    counts = jax.ops.segment_sum(
        jnp.ones((n,), jnp.float32), a, num_segments=k
    )
    fresh = sums / jnp.maximum(counts, 1.0)[:, None]
    return jnp.where((counts > 0)[:, None], fresh, centers_prev)


# ---------------------------------------------------------------- packing


def pack_buckets(
    vectors: np.ndarray,
    assign: np.ndarray,
    centers: np.ndarray,
    cap: Optional[int] = None,
) -> Tuple[np.ndarray, np.ndarray, np.ndarray]:
    """Returns (bucket_ids [K', cap], bucket_centroids [K', D],
    bucket_vecs [K', cap, D]). K' >= K because overflow rows become
    additional buckets sharing the parent centroid."""
    n, d = vectors.shape
    k = centers.shape[0]
    counts = np.bincount(assign, minlength=k)
    if cap is None:
        cap = max(8, int(np.ceil(1.3 * n / k)))

    bucket_rows = []  # list of (centroid_idx, [ids])
    order = np.argsort(assign, kind="stable")
    starts = np.zeros(k + 1, dtype=np.int64)
    np.cumsum(counts, out=starts[1:])
    for c in range(k):
        ids = order[starts[c]:starts[c + 1]]
        for off in range(0, max(len(ids), 1), cap):
            part = ids[off : off + cap]
            if len(part) == 0 and off > 0:
                break
            bucket_rows.append((c, part))

    kp = len(bucket_rows)
    bucket_ids = np.full((kp, cap), n, dtype=np.int32)   # sentinel = n
    bucket_cent = np.zeros((kp, d), dtype=np.float32)
    bucket_vecs = np.zeros((kp, cap, d), dtype=np.float32)
    for row, (c, ids) in enumerate(bucket_rows):
        bucket_ids[row, : len(ids)] = ids
        bucket_cent[row] = centers[c]
        if len(ids):
            bucket_vecs[row, : len(ids)] = vectors[ids]
    return bucket_ids, bucket_cent, bucket_vecs


# ---------------------------------------------------------------- search


class IvfEngine:
    def __init__(
        self,
        vectors: np.ndarray,
        n_clusters: Optional[int] = None,
        metric: str = "ip",
        kmeans_iters: int = 8,
        cap: Optional[int] = None,
        seed: int = 0,
        centers: Optional[np.ndarray] = None,
        assign: Optional[np.ndarray] = None,
    ):
        vectors = np.ascontiguousarray(vectors, dtype=np.float32)
        self.metric_in = metric
        if metric == "cosine":
            vectors = vectors / (
                np.linalg.norm(vectors, axis=1, keepdims=True) + 1e-12
            )
            metric = "ip"
        self.metric = metric
        self.n, self.d = vectors.shape
        if n_clusters is None:
            n_clusters = max(16, int(np.sqrt(self.n) * 2))
        self.n_clusters = min(n_clusters, self.n)

        if centers is None or assign is None:
            centers, assign = kmeans(
                vectors, self.n_clusters, iters=kmeans_iters,
                metric=self.metric, seed=seed,
            )
        bucket_ids, bucket_cent, bucket_vecs = pack_buckets(
            vectors, assign, centers, cap=cap
        )
        self.centers = centers
        self.assign = assign
        self.cap = bucket_ids.shape[1]
        self.bucket_ids = jnp.asarray(bucket_ids)
        self.bucket_cent = jnp.asarray(bucket_cent)
        # HBM budget: bucket vectors live ONLY as bf16 (the scan dtype);
        # exact scores come from the f32 corpus at rescore time. Keeping a
        # third f32 bucket table would add ~1.3x corpus size for nothing.
        self.bucket_vecs_bf16 = jnp.asarray(bucket_vecs).astype(jnp.bfloat16)
        self.bucket_sq = jnp.asarray((bucket_vecs * bucket_vecs).sum(axis=2))
        self._corpus_dev = jnp.asarray(vectors)
        self._pallas_tables = None

    def _padded_bf16_tables(self):
        """(ids_pad, vecs_bf16_pad, sq_pad) with cap padded to a multiple
        of 128 for the pallas kernel's tiling (pad slots = sentinel)."""
        if self._pallas_tables is None:
            cap = self.cap
            cap_pad = -(-cap // 128) * 128
            pad = cap_pad - cap
            if pad:
                self._pallas_tables = (
                    jnp.pad(self.bucket_ids, ((0, 0), (0, pad)),
                            constant_values=self.n),
                    jnp.pad(self.bucket_vecs_bf16, ((0, 0), (0, pad), (0, 0))),
                    jnp.pad(self.bucket_sq, ((0, 0), (0, pad))),
                )
            else:
                self._pallas_tables = (
                    self.bucket_ids, self.bucket_vecs_bf16, self.bucket_sq
                )
        return self._pallas_tables

    def search_pallas(
        self, queries: np.ndarray, k: int = 10, nprobe: int = 32,
        interpret: bool = False, rescore_factor: int = 4,
    ) -> Tuple[np.ndarray, np.ndarray]:
        """Fused-kernel path (ops/pallas_kernels.py): the probed bucket
        blocks stream HBM->VMEM as explicit bf16 DMAs inside the kernel
        instead of a materialized XLA gather; results rescored in f32."""
        from leann_tpu.ops.pallas_kernels import QGROUP, ivf_search_pallas

        q = np.asarray(queries, dtype=np.float32)
        if q.ndim == 1:
            q = q[None, :]
        if self.metric_in == "cosine":
            q = q / (np.linalg.norm(q, axis=1, keepdims=True) + 1e-12)
        b = q.shape[0]
        b_pad = -(-b // QGROUP) * QGROUP
        if b_pad != b:
            q = np.concatenate([q, np.zeros((b_pad - b, self.d), np.float32)])
        nprobe = min(nprobe, self.bucket_cent.shape[0])
        k = min(k, self.n)
        ids_pad, vecs_bf16, sq_pad = self._padded_bf16_tables()
        c = min(max(rescore_factor * k, k), self.n)
        from leann_tpu.ops.distance import _rescore_topk

        # the scalar-prefetch probe table lives in SMEM (~32KB budget):
        # chunk the batch so B*nprobe*4 bytes stays under it
        chunk = max(QGROUP, (24576 // (4 * nprobe)) // QGROUP * QGROUP)
        out_ids, out_scores = [], []
        for start in range(0, q.shape[0], chunk):
            qc = q[start : start + chunk]
            if qc.shape[0] % QGROUP:
                pad = QGROUP - qc.shape[0] % QGROUP
                qc = np.concatenate([qc, np.zeros((pad, self.d), np.float32)])
            _, cand = ivf_search_pallas(
                jnp.asarray(qc), self.bucket_cent, ids_pad, vecs_bf16,
                sq_pad, k=c, nprobe=nprobe, metric=self.metric,
                sentinel=self.n, interpret=interpret,
            )
            scores, ids = _rescore_topk(
                jnp.asarray(qc), self._corpus(), cand, k, self.metric
            )
            out_ids.append(np.asarray(ids))
            out_scores.append(np.asarray(scores))
        ids = np.concatenate(out_ids)[:b]
        scores = np.concatenate(out_scores)[:b]
        return ids, scores

    def search(
        self, queries: np.ndarray, k: int = 10, nprobe: int = 32,
        rescore_factor: int = 4,
    ) -> Tuple[np.ndarray, np.ndarray]:
        """Buckets are scanned in bf16 (f32 accumulation); the
        rescore_factor*k survivors are rescored at full f32 against the
        resident corpus — bf16-final scores cost ~0.06 recall@10 to
        near-tie reordering (measured at 1M x 128); the rescore recovers
        it for ~zero cost."""
        q = np.asarray(queries, dtype=np.float32)
        if q.ndim == 1:
            q = q[None, :]
        # pow-2 batch bucket (see ExactEngine.search): arbitrary serving
        # batch sizes must not each pay a fresh XLA compile
        b = q.shape[0]
        bb = 8
        while bb < b:
            bb *= 2
        if bb != b:
            q = np.concatenate(
                [q, np.zeros((bb - b, q.shape[1]), np.float32)])
        ids, scores = self.search_device(
            q, k=k, nprobe=nprobe, rescore_factor=rescore_factor
        )
        return np.asarray(ids)[:b], np.asarray(scores)[:b]

    def search_device(
        self, queries, k: int = 10, nprobe: int = 32,
        rescore_factor: int = 4,
    ):
        """Device-out search (no host sync): returns (ids, scores) as
        device arrays — lets serving layers pipeline batches so
        host<->device transfers overlap the bucket scans."""
        q = np.asarray(queries, dtype=np.float32)
        if q.ndim == 1:
            q = q[None, :]
        if self.metric_in == "cosine":
            q = q / (np.linalg.norm(q, axis=1, keepdims=True) + 1e-12)
        nprobe = min(nprobe, self.bucket_cent.shape[0])
        k = min(k, self.n)
        c = min(max(rescore_factor * k, k), self.n)
        _, cand = ivf_search(
            jnp.asarray(q), self.bucket_cent, self.bucket_ids,
            self.bucket_vecs_bf16, self.bucket_sq,
            k=c, nprobe=nprobe, metric=self.metric, sentinel=self.n,
        )
        from leann_tpu.ops.distance import _rescore_topk

        scores, ids = _rescore_topk(
            jnp.asarray(q), self._corpus(), cand, k, self.metric
        )
        return ids, scores

    def search_many_device(
        self, qs: jnp.ndarray, k: int = 10, nprobe: int = 32,
        rescore_factor: int = 4,
    ) -> Tuple[jnp.ndarray, jnp.ndarray]:
        """[M, B, D] device-resident query batches -> (ids, scores) each
        [M, B, k], in ONE dispatch (lax.scan over batches): per-dispatch
        relay/host overhead amortizes as 1/M, so large-M wall time is
        device time."""
        nprobe = min(nprobe, self.bucket_cent.shape[0])
        k = min(k, self.n)
        c = min(max(rescore_factor * k, k), self.n)
        return _ivf_search_many(
            qs, self.bucket_cent, self.bucket_ids, self.bucket_vecs_bf16,
            self.bucket_sq, self._corpus(), k=k, c=c, nprobe=nprobe,
            metric=self.metric, sentinel=self.n,
        )

    def _corpus(self) -> jnp.ndarray:
        return self._corpus_dev

    def calibrate_nprobe(
        self,
        target_recall: float = 0.95,
        k: int = 10,
        sample: int = 256,
        ladder: Tuple[int, ...] = (4, 8, 16, 32, 64, 128, 256),
        seed: int = 1,
    ) -> Tuple[int, float]:
        """Smallest nprobe meeting `target_recall` on this corpus.

        Fixed-nprobe recall is distribution-dependent: the hardness
        sweep (evals/hardness_sweep.py) measured nprobe=16 at 1.0 recall
        on a 1024-cluster mixture but 0.48 on a 16384-cluster one and
        0.62 under zipf cluster sizes — k-means cells stop matching true
        neighborhoods and a fixed probe count misses them. Calibration
        probes a ladder of nprobe values on `sample` self-queries
        (corpus rows + cluster-residual-scaled noise, so queries sit at
        realistic within-cluster distances) against the engine's own
        exhaustive-probe oracle, and returns the first rung meeting the
        target plus its measured recall. Cost: ladder+1 searches of
        `sample` queries — seconds, at build time.
        """
        idx = np.random.default_rng(seed).integers(0, self.n, sample)
        base = np.asarray(self._corpus_dev[jnp.asarray(idx)])
        return calibrate_nprobe_ladder(
            self, base, idx, target_recall=target_recall, k=k,
            ladder=ladder, seed=seed)


def calibrate_nprobe_ladder(
    engine,                  # any IVF engine: .search/.n_clusters/...
    base: np.ndarray,        # [sample, D] f32 corpus rows to query near
    idx: np.ndarray,         # [sample] their corpus row ids
    target_recall: float = 0.95,
    k: int = 10,
    ladder: Tuple[int, ...] = (4, 8, 16, 32, 64, 128, 256),
    seed: int = 1,
    frame_base: Optional[np.ndarray] = None,  # base in the centers'
                                              # frame (OPQ engines)
) -> Tuple[int, float]:
    """Shared ladder walk for IvfEngine / IvfPqEngine (same semantics,
    documented on IvfEngine.calibrate_nprobe)."""
    rng = np.random.default_rng(seed)
    fb = base if frame_base is None else frame_base
    resid = fb - engine.centers[engine.assign[idx]]
    rstd = float(resid.std()) or 1e-3
    q = base + rstd * rng.standard_normal(base.shape).astype(np.float32)
    if engine.metric_in == "cosine":
        q = q / (np.linalg.norm(q, axis=1, keepdims=True) + 1e-12)

    oracle, _ = engine.search(q, k=k, nprobe=engine.n_clusters)
    osets = [set(row.tolist()) for row in oracle]
    best = (engine.n_clusters, 1.0)
    for nprobe in ladder:
        if nprobe >= engine.n_clusters:
            break
        ids, _ = engine.search(q, k=k, nprobe=nprobe)
        rec = float(np.mean([
            len(set(row.tolist()) & osets[i]) / k
            for i, row in enumerate(ids)
        ]))
        if rec >= target_recall:
            return nprobe, rec
    return best


@functools.partial(
    jax.jit, static_argnames=("k", "c", "nprobe", "metric", "sentinel")
)
def _ivf_search_many(
    qs, centroids, bucket_ids, bucket_vecs, bucket_sq, corpus,
    k: int, c: int, nprobe: int, metric: str, sentinel: int,
):
    from leann_tpu.ops.distance import _rescore_topk

    def body(_, q):
        _, cand = ivf_search(
            q, centroids, bucket_ids, bucket_vecs, bucket_sq,
            k=c, nprobe=nprobe, metric=metric, sentinel=sentinel,
        )
        scores, ids = _rescore_topk(q, corpus, cand, k, metric)
        return None, (ids, scores)

    _, (ids, scores) = jax.lax.scan(body, None, qs)
    return ids, scores


@functools.partial(
    jax.jit, static_argnames=("k", "nprobe", "metric", "sentinel")
)
def ivf_search(
    queries, centroids, bucket_ids, bucket_vecs, bucket_sq,
    k: int, nprobe: int, metric: str, sentinel: int,
):
    """Stage-1 candidate generation: bf16 bucket scan with a running
    top-k; callers rescore the survivors in f32 (IvfEngine.search)."""
    b = queries.shape[0]
    c_scores = pairwise_scores(queries, centroids, metric)
    _, probe = jax.lax.top_k(c_scores, nprobe)               # [B, P]

    q_score = queries.astype(jnp.bfloat16)
    bucket_vecs = bucket_vecs.astype(jnp.bfloat16)
    precision = None

    init = (
        jnp.full((b, k), NEG_INF, jnp.float32),
        jnp.full((b, k), -1, jnp.int32),
    )

    def step(carry, p):
        best_scores, best_ids = carry
        cluster = probe[:, p]                                # [B]
        vecs = bucket_vecs[cluster]                          # [B, cap, D]
        ids = bucket_ids[cluster]                            # [B, cap]
        dots = jnp.einsum(
            "bcd,bd->bc", vecs, q_score,
            preferred_element_type=jnp.float32,
            precision=precision,
        )
        if metric == "l2":
            scores = 2.0 * dots - bucket_sq[cluster]
        else:
            scores = dots
        scores = jnp.where(ids == sentinel, NEG_INF, scores)
        safe_ids = jnp.where(ids == sentinel, -1, ids)
        all_scores = jnp.concatenate([best_scores, scores], axis=1)
        all_ids = jnp.concatenate([best_ids, safe_ids], axis=1)
        top_scores, pos = jax.lax.top_k(all_scores, k)
        top_ids = jnp.take_along_axis(all_ids, pos, axis=1)
        return (top_scores, top_ids), None

    (scores, ids), _ = jax.lax.scan(step, init, jnp.arange(nprobe))
    return scores, ids
