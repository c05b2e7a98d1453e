"""IVF-PQ: ADC-compressed bucket scans for 100M-class one-chip serving.

The bf16 IVF engine (ops/ivf.py) keeps 2 bytes/dim of bucket payload
resident — 19GB at 100M x 96, over one v5e's HBM. This engine stores
each row as its PQ-encoded RESIDUAL against the bucket centroid
(m uint8 codes + one f32 norm), scans probed buckets by ADC table
lookup, and exactly rescores the survivors against an int8 corpus:

    HBM at 100M x 96 (m=16): codes 1.6GB + norms 0.4GB + ids 0.4GB
    + int8 rescore corpus 9.6GB + centroids ~0.1GB  = ~12GB  (fits)

Score algebra (l2, negated-distance convention shared with the other
engines): with x_hat = c + r_hat,

    -|q - x_hat|^2 + |q|^2 = 2<q,c> + 2<q,r_hat> - |x_hat|^2

- 2<q,c> is a per-probed-bucket scalar — one [B,D]x[D] dot on the
  gathered centroid (the probe stage already ranked all centroids).
- 2<q,r_hat> = sum_j LUT[b, j, code_j]; the LUT [B, m, ksub] is ONE
  einsum per query batch against the global residual codebooks (the
  classic ADC trick; codebooks are global, NOT per-cell, so the LUT is
  query-only — a per-cell codebook would need a per-bucket LUT gather).
- |x_hat|^2 is stored exactly (f32) per row at build time.

For ip the centroid/LUT terms lose their factor 2 and the norm column
drops out. Residual encoding (vs encoding x directly) matters: the
residual's dynamic range is the within-cell spread, so the same 8-bit
budget quantizes ~an order of magnitude finer (the IVFPQ insight;
measured in evals/quantizer_ladder.py: flat-coarse + fine residual is
the best-ranking layout at equal bytes).

An optional OPQ rotation (ops/pq.train_opq) rotates the whole space
before k-means + residual PQ; queries are rotated by one [B,D]x[D,D]
matmul inside the jit, and the exact rescore stays in the original
frame (scores are rotation-invariant).

The scan is XLA end-to-end: bucket gather -> take_along_axis ADC
lookup -> running top-C over a lax.scan across probes — identical
control shape to ops/ivf.ivf_search, so the measured "XLA owns the
bucket scan" decision (docs/design.md) carries over. The reference
has no quantization at all (usearch F32 HNSW,
/root/reference/src/backend/hnsw.rs:112-120); this engine has no
reference counterpart.
"""

from __future__ import annotations

import functools
from typing import Optional, Tuple

import jax
import jax.numpy as jnp
import numpy as np

from leann_tpu.ops.distance import NEG_INF, pairwise_scores
from leann_tpu.ops.ivf import kmeans
from leann_tpu.ops.pq import encode_pq, train_pq


def pack_pq_buckets(
    assign: np.ndarray,     # [N] int32 cluster ids
    codes: np.ndarray,      # [N, m] uint8 residual PQ codes
    nsq: np.ndarray,        # [N] f32 |x_hat|^2
    centers: np.ndarray,    # [K, D] f32
    n: int,
    cap: Optional[int] = None,
) -> Tuple[np.ndarray, np.ndarray, np.ndarray, np.ndarray]:
    """Returns (bucket_ids [K', cap], bucket_cent [K', D],
    bucket_codes [K', cap, m], bucket_nsq [K', cap]). Overflow rows
    become extra buckets sharing the parent centroid (same policy as
    ops/ivf.pack_buckets); empty slots carry the id sentinel `n`."""
    k = centers.shape[0]
    m = codes.shape[1]
    counts = np.bincount(assign, minlength=k)
    if cap is None:
        cap = max(8, int(np.ceil(1.3 * n / k)))
    order = np.argsort(assign, kind="stable")
    starts = np.zeros(k + 1, dtype=np.int64)
    np.cumsum(counts, out=starts[1:])
    rows = []
    for c in range(k):
        ids = order[starts[c]:starts[c + 1]]
        for off in range(0, max(len(ids), 1), cap):
            part = ids[off:off + cap]
            if len(part) == 0 and off > 0:
                break
            rows.append((c, part))
    kp = len(rows)
    bucket_ids = np.full((kp, cap), n, dtype=np.int32)
    bucket_cent = np.zeros((kp, centers.shape[1]), dtype=np.float32)
    bucket_codes = np.zeros((kp, cap, m), dtype=np.uint8)
    bucket_nsq = np.zeros((kp, cap), dtype=np.float32)
    for row, (c, ids) in enumerate(rows):
        bucket_ids[row, :len(ids)] = ids
        bucket_cent[row] = centers[c]
        if len(ids):
            bucket_codes[row, :len(ids)] = codes[ids]
            bucket_nsq[row, :len(ids)] = nsq[ids]
    return bucket_ids, bucket_cent, bucket_codes, bucket_nsq


class IvfPqEngine:
    """IVF with ADC-compressed buckets + exact int8/bf16/f32 rescore.

    API mirrors ops/ivf.IvfEngine (search / search_device /
    search_many_device); `rescore_factor*k` ADC survivors per query are
    exactly rescored. `rescore="int8"` (default) keeps the full corpus
    at 1 byte/dim with a per-row dequant scale folded into the gather —
    the 100M budget; bf16/f32 available where they fit."""

    def __init__(
        self,
        vectors: np.ndarray,
        n_clusters: Optional[int] = None,
        metric: str = "ip",
        m: int = 16,
        ksub: int = 256,
        kmeans_iters: int = 8,
        pq_iters: int = 10,
        cap: Optional[int] = None,
        rescore: str = "int8",
        train_sample: int = 262_144,
        seed: int = 0,
        rotation: Optional[np.ndarray] = None,  # [D, D] OPQ
        centers: Optional[np.ndarray] = None,   # rotated-frame if rot
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
        if self.d % m:
            raise ValueError(f"d={self.d} not divisible by m={m}")
        self.m, self.ksub = m, ksub
        if centers is not None:
            n_clusters = centers.shape[0]
        elif n_clusters is None:
            n_clusters = max(16, int(np.sqrt(self.n) * 2))
        self.n_clusters = min(n_clusters, self.n)

        self.rotation = None
        enc = vectors
        if rotation is not None:
            self.rotation = np.ascontiguousarray(rotation, np.float32)
            if self.rotation.shape != (self.d, self.d):
                raise ValueError("rotation must be [D, D]")
            enc = vectors @ self.rotation

        if centers is None or assign is None:
            centers, assign = kmeans(
                enc, self.n_clusters, iters=kmeans_iters,
                metric=self.metric, seed=seed,
            )
        self.centers = centers
        self.assign = assign

        # residuals in the (rotated) coarse frame; global books trained
        # on a sample, all rows encoded
        resid = enc - centers[assign]
        rng = np.random.default_rng(seed)
        samp = resid[rng.choice(
            self.n, min(train_sample, self.n), replace=False)]
        self.books = train_pq(samp, m=m, ksub=ksub, iters=pq_iters,
                              seed=seed)
        codes = encode_pq(resid, self.books)
        del resid

        # |x_hat|^2 exactly, via the decomposed form (avoids
        # materializing the full reconstruction): |c + r_hat|^2 =
        # |c|^2 + 2<c, r_hat> + |r_hat|^2 with r_hat = sum_j book_j
        dsub = self.d // m
        bviews = self.books  # [m, ksub, dsub]
        if metric == "l2":
            # per-subspace tables once, then per-row sums by code lookup
            c_sub = centers.reshape(self.n_clusters, m, dsub)
            # <c_sub[cell,j], book[j,k]> for every (cell, j, k): small
            cb = np.einsum("cjd,jkd->cjk", c_sub, bviews)    # [K, m, ksub]
            bb = np.einsum("jkd,jkd->jk", bviews, bviews)    # [m, ksub]
            csq = (centers * centers).sum(axis=1)            # [K]
            jj = np.arange(m)
            nsq = (
                csq[assign]
                + 2.0 * cb[assign[:, None], jj[None, :], codes].sum(axis=1)
                + bb[jj[None, :], codes].sum(axis=1)
            ).astype(np.float32)
        else:
            nsq = np.zeros(self.n, np.float32)

        bucket_ids, bucket_cent, bucket_codes, bucket_nsq = \
            pack_pq_buckets(assign, codes, nsq, centers, self.n, cap=cap)
        self.cap = bucket_ids.shape[1]
        self.bucket_ids = jnp.asarray(bucket_ids)
        self.bucket_cent = jnp.asarray(bucket_cent)
        self.bucket_codes = jnp.asarray(bucket_codes)
        self.bucket_nsq = jnp.asarray(bucket_nsq)
        self.books_dev = jnp.asarray(self.books)

        # exact-rescore corpus, ORIGINAL frame (scores are rotation-
        # invariant). int8 is the 100M-class budget; cast on the host.
        # int8 stores RESIDUALS vs the assigned coarse centroid: the 8
        # bits then span the cluster radius instead of the corpus
        # radius (raw-int8 rescore measured 0.877 recall@10 by exact
        # host scan at 1M vs 0.959 residual — the r4 hardware rows'
        # entire recall loss). Centroids come back at score time via
        # assign[] + centers in the original frame.
        self.rescore = rescore
        self.corpus_scale = None
        self.corpus_cent = None
        self.corpus_assign = None
        if rescore == "int8":
            cent_orig = (centers if self.rotation is None
                         else centers @ self.rotation.T)
            r = vectors - cent_orig[assign]
            scale = np.maximum(
                np.abs(r).max(axis=1), 1e-12).astype(np.float32)
            q8 = np.clip(
                np.round(r / scale[:, None] * 127.0), -127, 127
            ).astype(np.int8)
            self.corpus = jnp.asarray(q8)
            self.corpus_scale = jnp.asarray(scale / 127.0)
            self.corpus_cent = jnp.asarray(
                np.ascontiguousarray(cent_orig, np.float32))
            self.corpus_assign = jnp.asarray(assign.astype(np.int32))
            del r
        elif rescore == "bf16":
            import ml_dtypes

            self.corpus = jnp.asarray(vectors.astype(ml_dtypes.bfloat16))
        else:
            self.corpus = jnp.asarray(vectors)
        self.corpus_nsq = jnp.asarray(
            np.einsum("nd,nd->n", vectors, vectors,
                      dtype=np.float64).astype(np.float32))
        self.rot_dev = (jnp.asarray(self.rotation)
                        if self.rotation is not None else None)

    # ------------------------------------------------------------ search

    def _norm_q(self, queries):
        q = np.asarray(queries, dtype=np.float32)
        if q.ndim == 1:
            q = q[None, :]
        if self.metric_in == "cosine":
            q = q / (np.linalg.norm(q, axis=1, keepdims=True) + 1e-12)
        return q

    def search(self, queries, k: int = 10, nprobe: int = 32,
               rescore_factor: int = 16):
        ids, scores = self.search_device(
            queries, k=k, nprobe=nprobe, rescore_factor=rescore_factor)
        return np.asarray(ids), np.asarray(scores)

    def search_device(self, queries, k: int = 10, nprobe: int = 32,
                      rescore_factor: int = 16):
        q = self._norm_q(queries)
        nprobe = min(nprobe, self.bucket_cent.shape[0])
        k = min(k, self.n)
        c = min(max(rescore_factor * k, k), self.n)
        return _ivfpq_search_jit(
            jnp.asarray(q), self.bucket_cent, self.bucket_ids,
            self.bucket_codes, self.bucket_nsq, self.books_dev,
            self.corpus, self.corpus_nsq, self.corpus_scale,
            self.corpus_cent, self.corpus_assign,
            self.rot_dev,
            k=k, c=c, nprobe=nprobe, metric=self.metric,
            sentinel=self.n,
        )

    def calibrate_nprobe(
        self,
        target_recall: float = 0.95,
        k: int = 10,
        sample: int = 256,
        ladder: Tuple[int, ...] = (4, 8, 16, 32, 64, 128, 256),
        seed: int = 1,
    ) -> Tuple[int, float]:
        """Smallest nprobe meeting `target_recall` — same ladder walk
        as IvfEngine.calibrate_nprobe (documented there), driven
        through this engine's ADC search. Base rows come from the
        rescore corpus (dequantized when int8)."""
        from leann_tpu.ops.ivf import calibrate_nprobe_ladder

        idx = np.random.default_rng(seed).integers(0, self.n, sample)
        base = np.asarray(
            self.corpus[jnp.asarray(idx)]).astype(np.float32)
        if self.corpus_scale is not None:
            base = base * np.asarray(
                self.corpus_scale[jnp.asarray(idx)])[:, None]
        if self.corpus_cent is not None:
            cent = np.asarray(self.corpus_cent)
            base = base + cent[np.asarray(self.assign)[idx]]
        # centers/assign live in the rotated frame (OPQ); only the
        # residual-spread scalar is frame-sensitive
        fb = base @ self.rotation if self.rotation is not None else None
        return calibrate_nprobe_ladder(
            self, base, idx, target_recall=target_recall, k=k,
            ladder=ladder, seed=seed, frame_base=fb)

    def search_many_device(self, qs, k: int = 10, nprobe: int = 32,
                           rescore_factor: int = 16):
        """[M, B, D] device-resident batches -> (ids, scores) [M, B, k]
        in ONE dispatch (relay amortization, evals/device_time.py)."""
        nprobe = min(nprobe, self.bucket_cent.shape[0])
        k = min(k, self.n)
        c = min(max(rescore_factor * k, k), self.n)

        def body(_, q):
            out = _ivfpq_search_jit(
                q, self.bucket_cent, self.bucket_ids,
                self.bucket_codes, self.bucket_nsq, self.books_dev,
                self.corpus, self.corpus_nsq, self.corpus_scale,
                self.corpus_cent, self.corpus_assign,
                self.rot_dev,
                k=k, c=c, nprobe=nprobe, metric=self.metric,
                sentinel=self.n,
            )
            return None, out

        _, (ids, scores) = jax.lax.scan(body, None, qs)
        return ids, scores


@functools.partial(
    jax.jit,
    static_argnames=("k", "c", "nprobe", "metric", "sentinel"),
)
def _ivfpq_search_jit(
    queries, bucket_cent, bucket_ids, bucket_codes, bucket_nsq, books,
    corpus, corpus_nsq, corpus_scale, corpus_cent, corpus_assign, rot,
    k: int, c: int, nprobe: int, metric: str, sentinel: int,
):
    """ADC bucket scan (running top-C over a lax.scan across probes)
    + exact rescore of the C survivors. One jit, device-in/device-out."""
    b, d = queries.shape
    m, ksub, dsub = books.shape

    qr = queries if rot is None else jnp.dot(
        queries, rot, preferred_element_type=jnp.float32)
    # per-query ADC tables: [B, m, ksub] in one einsum
    luts = jnp.einsum(
        "bjd,jkd->bjk", qr.reshape(b, m, dsub), books,
        preferred_element_type=jnp.float32,
    )
    if metric == "l2":
        luts = 2.0 * luts

    c_scores = pairwise_scores(qr, bucket_cent, metric)
    _, probe = jax.lax.top_k(c_scores, nprobe)               # [B, P]

    cc = min(c, bucket_ids.shape[1] * nprobe)
    init = (
        jnp.full((b, cc), NEG_INF, jnp.float32),
        jnp.full((b, cc), -1, jnp.int32),
    )

    # bf16 LUTs for the one-hot contraction (adds <=0.4% relative
    # table error on top of the PQ error itself — negligible)
    luts_bf = luts.astype(jnp.bfloat16)
    cap = bucket_ids.shape[1]
    # chunk the cap axis so the one-hot transient stays ~0.5GB
    chunk = max(128, min(cap, (1 << 28) // max(b * ksub, 1)))
    n_chunks = -(-cap // chunk)
    pad = n_chunks * chunk - cap

    def _adc_scores(codes):
        """[B, cap, m] uint8 -> [B, cap] f32 ADC sums, gather-free.

        take_along_axis here is B*cap*m random scalar gathers per
        probe step (~67M at B=2048, cap=2056) — the known-slow TPU
        path (measured 15.7s/batch at 10M, r4). One-hot + einsum is
        ~42x the raw flops but rides the VPU/MXU instead: the compare
        lattice B*cap*ksub per subspace fuses into the dot's operand
        tiles, never materializing in HBM."""
        cp = jnp.pad(codes, ((0, 0), (0, pad), (0, 0)))
        cp = cp.reshape(b, n_chunks, chunk, m).transpose(1, 0, 2, 3)

        def chunk_body(_, cc):                               # [B, ch, m]
            # per-subspace one-hot keeps the transient at
            # [B, ch, ksub] (~0.5GB) even if XLA materializes the dot
            # operand instead of fusing the compare lattice into it
            s = jnp.zeros((b, cc.shape[1]), jnp.float32)
            for j in range(m):
                oh = jax.nn.one_hot(cc[:, :, j], ksub,
                                    dtype=jnp.bfloat16)      # [B,ch,ksub]
                s = s + jnp.einsum(
                    "bck,bk->bc", oh, luts_bf[:, j],
                    preferred_element_type=jnp.float32,
                )
            return None, s

        _, parts = jax.lax.scan(chunk_body, None, cp)        # [nc, B, ch]
        return parts.transpose(1, 0, 2).reshape(b, -1)[:, :cap]

    def step(carry, p):
        best_scores, best_ids = carry
        cluster = probe[:, p]                                # [B]
        ids = bucket_ids[cluster]                            # [B, cap]
        adc = _adc_scores(bucket_codes[cluster])             # [B, cap]
        cent = bucket_cent[cluster]                          # [B, D]
        cdot = jnp.einsum(
            "bd,bd->b", cent, qr, preferred_element_type=jnp.float32)
        if metric == "l2":
            scores = 2.0 * cdot[:, None] + adc - bucket_nsq[cluster]
        else:
            scores = cdot[:, None] + adc
        scores = jnp.where(ids == sentinel, NEG_INF, scores)
        safe_ids = jnp.where(ids == sentinel, -1, ids)
        all_scores = jnp.concatenate([best_scores, scores], axis=1)
        all_ids = jnp.concatenate([best_ids, safe_ids], axis=1)
        top_scores, pos = jax.lax.top_k(all_scores, cc)
        top_ids = jnp.take_along_axis(all_ids, pos, axis=1)
        return (top_scores, top_ids), None

    (_, cand), _ = jax.lax.scan(step, init, jnp.arange(nprobe))

    # exact rescore in the ORIGINAL frame (rotation-invariant scores)
    gid = jnp.maximum(cand, 0)
    rows = corpus[gid].astype(jnp.float32)                   # [B, C, D]
    if corpus_scale is not None:
        rows = rows * corpus_scale[gid][:, :, None]
    if corpus_cent is not None:
        # int8 residual payload: add the assigned centroid back
        rows = rows + corpus_cent[corpus_assign[gid]]
    dots = jnp.einsum(
        "bcd,bd->bc", rows, queries,
        preferred_element_type=jnp.float32,
        precision=jax.lax.Precision.HIGHEST,
    )
    scores = 2.0 * dots - corpus_nsq[gid] if metric == "l2" else dots
    scores = jnp.where(cand < 0, NEG_INF, scores)
    # dedup (a row can enter via an overflow bucket only once; ids are
    # unique across buckets by construction, so no dedup needed)
    top_scores, pos = jax.lax.top_k(scores, k)
    top_ids = jnp.take_along_axis(cand, pos, axis=1)
    top_ids = jnp.where(top_scores == NEG_INF, -1, top_ids)
    return top_ids, top_scores
