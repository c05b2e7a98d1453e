"""ANN backends (layer L1).

The reference dispatches to native usearch-HNSW / diskann-rs Vamana
(`src/backend/mod.rs:14-101`). Here both roles are filled by TPU engines:

  flat    exact tiled matmul + top-k (the recall oracle; default for
          small/medium corpora where brute force on MXU beats any graph)
  vamana  fixed-degree graph + frontier-batched beam search
          (aliases: "hnsw" and "diskann" map here so reference CLI
          invocations keep working)

A searcher takes a *batch* of query vectors — the core idiom shift from
the reference's one-query-at-a-time `BackendSearcher::search`
(`src/backend/traits.rs:11-30`).
"""

from __future__ import annotations

import os
from typing import Optional, Tuple

import numpy as np

ALIASES = {"hnsw": "vamana", "diskann": "vamana", "exact": "flat"}
BACKENDS = ("flat", "vamana", "ivf")


def resolve_backend(name: str) -> str:
    name = (name or "flat").lower()
    name = ALIASES.get(name, name)
    if name not in BACKENDS:
        raise ValueError(
            f"unknown backend {name!r}; expected one of {BACKENDS} "
            f"(aliases: {sorted(ALIASES)})"
        )
    return name


class FlatSearcher:
    """Exact search over the embeddings matrix (reference recompute-mode
    semantics done natively: `src/index/recompute.rs:96-106`), served by
    the device-resident two-stage engine (bf16 scan + f32 rescore)."""

    def __init__(self, vectors: np.ndarray, metric: str = "ip"):
        from leann_tpu.ops.distance import ExactEngine

        self.metric = metric
        self.engine = ExactEngine(np.asarray(vectors), metric=metric)

    def __len__(self) -> int:
        return self.engine.n

    def search(
        self, queries: np.ndarray, k: int, complexity: int = 64
    ) -> Tuple[np.ndarray, np.ndarray]:
        """Returns (idx [B,k] int, scores [B,k]); complexity is ignored —
        flat search is always (effectively) exact."""
        return self.engine.search(queries, k=k)


class GraphSearcher:
    """Frontier-batched beam search over a fixed-degree graph.

    Engine selection (override with LEANN_GRAPH_ENGINE=fused|pq|inline):
    on a real TPU with kernel-compatible shapes (D % 128 == 0, R <= 128)
    the fused int8 whole-traversal Pallas kernel serves (measured at 1M:
    10.1k QPS sync / 18.9k pipelined @ recall 0.994 beam 64, vs 3.3k
    for the XLA inline path). When the int8 inline blocks exceed the
    per-chip HBM budget or D % 128 != 0 (the DEEP-10M shape: 10M x 96 x
    R48 = 46GB inline), the PQ fused kernel serves instead — inline
    128-bit ADC codes (1KB/node records) navigate, exact rescore of
    beam + visited selects. Otherwise the XLA inline-block engine."""

    def __init__(self, vectors: np.ndarray, graph, metric: str = "ip",
                 base: str = ""):
        import os

        self.metric = metric
        vectors = np.asarray(vectors)
        n, d = vectors.shape
        r = graph.adjacency.shape[1]
        choice = os.environ.get("LEANN_GRAPH_ENGINE", "auto")
        use_fused = use_pq = False
        if choice == "auto":
            from leann_tpu.ops.pallas_kernels import pallas_available

            if pallas_available() and r <= 128:
                # packed int8 inline blocks need (N+1)*R*D bytes of
                # HBM — beyond ~9GB (one v5e minus working set) fall
                # through to PQ records ((N+1)*cp*512 bytes + the
                # rescore corpus)
                blocks_gb = (n + 1) * r * d / 1e9
                use_fused = d % 128 == 0 and blocks_gb < 9.0
                if not use_fused:
                    m = next(
                        (mm for mm in (16, 12, 8) if d % mm == 0), 0)
                    if m and r % 4 == 0:
                        from leann_tpu.ops.pq_beam import pq_layout

                        _, _, _, cp = pq_layout(r, m, 8)
                        pq_gb = (
                            (n + 1) * cp * 512           # records
                            + n * d * 2                  # bf16 rescore
                        ) / 1e9
                        use_pq = pq_gb < 13.0
        else:
            use_fused = choice == "fused"
            use_pq = choice == "pq"
        if use_fused:
            from leann_tpu.ops.fused_beam import FusedBeamEngine

            self.engine = FusedBeamEngine(
                vectors=vectors,
                adjacency=graph.adjacency,
                medoid=graph.medoid,
                metric=metric,
                expansions=2,
                qb=int(os.environ.get("LEANN_FUSED_QB", 16)),
            )
        elif use_pq:
            from leann_tpu.ops.pallas_kernels import pallas_available
            from leann_tpu.ops.pq_beam import PqBeamEngine
            from leann_tpu.store import pqfile

            m = next((mm for mm in (16, 12, 8) if d % mm == 0), 8)
            # LEANN_PQ_OPQ=1: learn an orthogonal rotation before PQ
            # (ops/pq.train_opq). Zero serving cost — the rotation folds
            # into the affine LUT operands — and a real reconstruction
            # win on anisotropic corpora (no-op on the isotropic bench
            # mixture; see evals/quantizer_ladder.py).
            want_opq = os.environ.get("LEANN_PQ_OPQ", "0") == "1"
            books = codes = rot = art = None
            if base:
                art = pqfile.load_pq(base, n, metric, want_rot=want_opq)
                if art is not None:
                    books, codes, rot = art
            if want_opq and rot is None:
                from leann_tpu.ops.pq import train_opq

                rng = np.random.default_rng(0)
                samp = vectors[rng.choice(
                    n, min(262_144, n), replace=False)]
                rot, books = train_opq(samp, m=m, ksub=256)
                codes = None
            self.engine = PqBeamEngine(
                vectors=vectors,
                adjacency=graph.adjacency,
                medoid=graph.medoid,
                metric=metric,
                m=m,
                ksub=256,
                # int8 rescore (~half the corpus bytes) is the fallback
                # when records + bf16 don't fit beside the runtime
                rescore=os.environ.get("LEANN_PQ_RESCORE", "bf16"),
                qb=int(os.environ.get("LEANN_FUSED_QB", 16)),
                codebooks=books,
                codes=codes,
                rotation=rot,
                # hermetic CPU tests force LEANN_GRAPH_ENGINE=pq; the
                # kernel runs in interpret mode off-TPU
                interpret=not pallas_available(),
            )
            if base and art is None:
                pqfile.save_pq(
                    base, self.engine.codebooks,
                    np.asarray(self.engine.codes), n, metric,
                    rot=self.engine.rotation,
                )
        else:
            from leann_tpu.ops.beam import BeamSearchEngine

            # expansions=2: expand the two best frontier nodes per hop —
            # roughly halves sequential hops for ~equal recall (measured
            # 0.992 vs 0.986 @ beam 32 on clustered 128-d data)
            self.engine = BeamSearchEngine(
                vectors=vectors,
                adjacency=graph.adjacency,
                medoid=graph.medoid,
                metric=metric,
                expansions=2,
            )

    def __len__(self) -> int:
        return self.engine.n

    def search(
        self, queries: np.ndarray, k: int, complexity: int = 64
    ) -> Tuple[np.ndarray, np.ndarray]:
        """complexity = beam width, honored uniformly (the reference's HNSW
        path silently ignores it — src/backend/hnsw.rs:83 — while its
        DiskANN path uses it; we fix the inconsistency)."""
        return self.engine.search(queries, k=k, beam_width=max(complexity, k))


class IvfSearcher:
    """Partitioned matmul search — the TPU-throughput backend (no
    reference counterpart; see ops/ivf.py)."""

    def __init__(self, vectors: np.ndarray, ivf, metric: str = "ip",
                 default_nprobe: Optional[int] = None):
        self.metric = metric
        # build-time calibrated floor (meta.backend_kwargs["nprobe"]):
        # fixed nprobe is distribution-dependent (hardness sweep), so a
        # calibrated corpus keeps its measured >= 0.95 operating point
        # even when callers pass the default complexity
        self.default_nprobe = default_nprobe
        n, d = vectors.shape
        choice = os.environ.get("LEANN_IVF_ENGINE", "auto")
        # ADC-compressed buckets (ops/ivf_pq.py) when the bf16 scan
        # tables + f32 rescore corpus would blow the one-chip HBM
        # budget (~100M-class corpora): 1B codes/dim + int8 rescore
        # instead of 2B/dim + 4B/dim. The bf16 engine stays the default
        # wherever it fits — it rescores in f32 and scans ~2x fewer
        # XLA ops per probed row.
        m = next((mm for mm in (16, 12, 8) if d % mm == 0), 0)
        use_pq = (choice == "pq" or
                  (choice == "auto" and m and n * d * 6 > 11e9))
        if use_pq:
            from leann_tpu.ops.ivf_pq import IvfPqEngine

            # exact rescore at the highest precision that fits beside
            # the codes: f32 < 4GB, bf16 < 8GB, else int8 (the 100M
            # budget; ~0.001-scale score error on unit-norm corpora)
            rescore = ("f32" if n * d * 4 < 4e9
                       else "bf16" if n * d * 2 < 8e9 else "int8")
            self.engine = IvfPqEngine(
                vectors, metric=metric, m=m, rescore=rescore,
                centers=ivf.centers, assign=ivf.assign,
            )
        else:
            from leann_tpu.ops.ivf import IvfEngine

            self.engine = IvfEngine(
                vectors, metric=metric,
                centers=ivf.centers, assign=ivf.assign,
            )

    def __len__(self) -> int:
        return self.engine.n

    def search(
        self, queries: np.ndarray, k: int, complexity: int = 64
    ) -> Tuple[np.ndarray, np.ndarray]:
        """complexity maps to nprobe (clusters probed per query)."""
        nprobe = max(complexity // 2, self.default_nprobe or 8)
        return self.engine.search(queries, k=k, nprobe=nprobe)


class ShardedSearcher:
    """Corpus row-sharded search over every available device
    (parallel/sharded.py) behind the backend-searcher interface, used by
    `search --sharded` / `serve --sharded`. Dispatches on the index's
    backend: flat -> ShardedFlatIndex, vamana -> ShardedGraphIndex (one
    subgraph per shard), ivf -> ShardedIvfIndex (per-shard k-means).

    Per-shard graph/IVF structures are expensive to build, so they
    persist to `<base>.shards.npz` (store/shardfile.py): the first
    sharded load builds + saves; later loads (same shard count) reuse.
    """

    def __init__(self, vectors: np.ndarray, metric: str = "ip",
                 backend: str = "flat", base: str = ""):
        from leann_tpu.parallel import (
            ShardedFlatIndex, ShardedGraphIndex, ShardedIvfIndex, make_mesh,
        )
        from leann_tpu.parallel.mesh import init_distributed
        from leann_tpu.store import shardfile

        # multi-host env contract (no-op single host): must run before
        # jax.devices() is consulted by make_mesh
        init_distributed()
        mesh = make_mesh()
        self.n_shards = mesh.shape["shard"]
        self.backend = resolve_backend(backend)
        vectors = np.asarray(vectors)
        art = (
            shardfile.load_shards(
                base, self.n_shards, n=len(vectors), metric=metric
            )
            if base else None
        )

        if self.backend == "vamana":
            if art is not None and art["kind"] == "graph":
                self.index = ShardedGraphIndex(
                    vectors, mesh, metric=metric,
                    adjacency_shards=art["adjacency"],
                    medoids=art["medoids"],
                )
            else:
                self.index = ShardedGraphIndex(vectors, mesh, metric=metric)
                if base:
                    shardfile.save_graph_shards(
                        base, np.asarray(self.index.adjacency_shards),
                        self.index.medoids_host, self.index.n, metric,
                    )
        elif self.backend == "ivf":
            if art is not None and art["kind"] == "ivf":
                self.index = ShardedIvfIndex(
                    vectors, mesh, metric=metric,
                    centers_shards=art["centers_list"],
                    assign_shards=art["assign_list"],
                )
            else:
                self.index = ShardedIvfIndex(vectors, mesh, metric=metric)
                if base:
                    shardfile.save_ivf_shards(
                        base, self.index.centers_host,
                        self.index.assign_host, self.index.n, metric,
                    )
        else:
            self.index = ShardedFlatIndex(vectors, mesh, metric=metric)

    def __len__(self) -> int:
        return self.index.n

    def search(
        self, queries: np.ndarray, k: int, complexity: int = 64
    ) -> Tuple[np.ndarray, np.ndarray]:
        if self.backend == "vamana":
            return self.index.search(
                queries, k=k, beam_width=max(complexity, k)
            )
        if self.backend == "ivf":
            return self.index.search(
                queries, k=k, nprobe=max(complexity // 2, 8)
            )
        return self.index.search(queries, k=k)


def load_searcher(
    base: str, meta, sharded: bool = False
) -> "FlatSearcher | GraphSearcher | IvfSearcher | ShardedSearcher":
    if sharded:
        from leann_tpu.store.embeddings import EmbeddingsStore

        vectors = EmbeddingsStore(base, meta.dimensions).all()
        return ShardedSearcher(
            np.asarray(vectors), metric=getattr(meta, "metric", "ip"),
            backend=meta.backend_name, base=base,
        )
    return _load_local_searcher(base, meta)


def _load_local_searcher(base: str, meta):
    import os

    from leann_tpu.store.embeddings import EmbeddingsStore
    from leann_tpu.store.graphfile import GraphFile, graph_path
    from leann_tpu.store.ivffile import IvfFile, ivf_path

    backend = resolve_backend(meta.backend_name)
    metric = getattr(meta, "metric", "ip")
    vectors = EmbeddingsStore(base, meta.dimensions).all()
    if backend == "flat":
        return FlatSearcher(np.asarray(vectors), metric=metric)
    if backend == "ivf":
        ivf = IvfFile.load(ivf_path(base))
        kw = getattr(meta, "backend_kwargs", None) or {}
        return IvfSearcher(np.asarray(vectors), ivf, metric=metric,
                           default_nprobe=kw.get("nprobe"))
    if not GraphFile.exists(base):
        # a hnsw/diskann meta with no native graph file: probably an index
        # built by Python LEANN or leann-rs (reference compat.rs behavior)
        from leann_tpu.backend.compat import sniff_foreign_index

        diagnosis = sniff_foreign_index(
            os.path.dirname(base), os.path.basename(base)
        )
        if diagnosis:
            raise RuntimeError(diagnosis)
        # no graph at all: degrade gracefully to exact search
        return FlatSearcher(np.asarray(vectors), metric=metric)
    graph = GraphFile.load(graph_path(base))
    return GraphSearcher(np.asarray(vectors), graph, metric=metric, base=base)
