"""Graph engine tests: frontier-batched beam search + Vamana build,
validated against the exact-search oracle (recall@k)."""

import os

import numpy as np
import pytest

from leann_tpu.ops.beam import BeamSearchEngine
from leann_tpu.ops.distance import exact_topk
from leann_tpu.ops.vamana import build_vamana, robust_prune_batch


def make_corpus(n=2000, d=32, seed=0, clusters=20):
    rng = np.random.default_rng(seed)
    centers = rng.standard_normal((clusters, d)).astype(np.float32) * 3
    assign = rng.integers(0, clusters, n)
    x = centers[assign] + rng.standard_normal((n, d)).astype(np.float32)
    return x.astype(np.float32)


def recall_at_k(idx, oracle_idx, k):
    hits = 0
    for row, orow in zip(idx, oracle_idx):
        hits += len(set(row[:k].tolist()) & set(orow[:k].tolist()))
    return hits / (len(idx) * k)


def test_robust_prune_occlusion():
    import jax.numpy as jnp

    # 1-D points: p at 0; candidates at 1, 2, 10.
    # candidate 1 (closest) occludes 2 when alpha*d(1,2) <= d(p,2):
    # 1.0 * 1 <= 4 -> occluded. 10 survives: 1.0 * 81 > 100? no: 81 <= 100
    # -> occluded too at alpha=1. With alpha=1.3: 1.3*81=105.3 > 100 -> kept.
    p = jnp.zeros((1, 1), jnp.float32)
    ids = jnp.asarray([[0, 1, 2]], jnp.int32)
    vecs = jnp.asarray([[[1.0], [2.0], [10.0]]], jnp.float32)
    out = np.asarray(
        robust_prune_batch(p, ids, vecs, jnp.int32(99), jnp.float32(1.3), 3)
    )
    assert out[0, 0] == 0  # closest kept first
    assert 1 not in out[0]  # occluded by candidate at 1.0
    assert 2 in out[0]     # alpha=1.3 keeps the far one

    out1 = np.asarray(
        robust_prune_batch(p, ids, vecs, jnp.int32(99), jnp.float32(1.0), 3)
    )
    assert out1[0, 0] == 0
    assert set(out1[0, 1:].tolist()) == {99}  # everything else occluded


def test_robust_prune_dedup_and_sentinel():
    import jax.numpy as jnp

    p = jnp.zeros((1, 2), jnp.float32)
    ids = jnp.asarray([[5, 5, 7, 99]], jnp.int32)  # dup 5, sentinel 99
    vecs = jnp.asarray(
        [[[1.0, 0.0], [1.0, 0.0], [0.0, 5.0], [0.0, 0.0]]], jnp.float32
    )
    out = np.asarray(
        robust_prune_batch(p, ids, vecs, jnp.int32(99), jnp.float32(2.0), 4)
    )
    # 5 appears exactly once
    assert (out[0] == 5).sum() == 1
    assert 7 in out[0]


def test_beam_search_on_exact_knn_graph():
    """On a ground-truth kNN graph, beam search must achieve ~perfect
    recall — isolates traversal correctness from build quality.

    Uses a single gaussian cloud: a kNN graph over well-separated
    clusters is *disconnected*, which no traversal can cross (that's the
    problem Vamana's alpha-prune long edges exist to solve)."""
    rng = np.random.default_rng(1)
    x = rng.standard_normal((1000, 16)).astype(np.float32)
    # build exact 16-NN graph (excluding self)
    _, nn_idx = exact_topk(x, x, 17, metric="l2")
    adjacency = np.zeros((1000, 16), dtype=np.int32)
    for i in range(1000):
        row = [j for j in nn_idx[i].tolist() if j != i][:16]
        adjacency[i] = row
    engine = BeamSearchEngine(x, adjacency, medoid=0, metric="l2")

    queries = np.random.default_rng(2).standard_normal((32, 16)).astype(
        np.float32
    )
    idx, scores = engine.search(queries, k=10, beam_width=64)
    _, oracle = exact_topk(queries, x, 10, metric="l2")
    rec = recall_at_k(idx, oracle, 10)
    assert rec >= 0.95, f"recall@10 = {rec}"
    # scores are sorted descending
    assert (np.diff(scores, axis=1) <= 1e-5).all()


def test_beam_excludes_requested_ids():
    # single cloud: a raw kNN graph over separated clusters is disconnected
    x = np.random.default_rng(3).standard_normal((500, 16)).astype(np.float32)
    _, nn_idx = exact_topk(x, x, 9, metric="l2")
    adjacency = np.asarray(
        [[j for j in nn_idx[i].tolist() if j != i][:8] for i in range(500)],
        dtype=np.int32,
    )
    engine = BeamSearchEngine(x, adjacency, medoid=0, metric="l2")
    # query with each point's own vector but exclude it
    qids = np.arange(16, dtype=np.int32)
    idx, _ = engine.search(x[:16], k=5, beam_width=32, exclude=qids)
    for row, qid in zip(idx, qids):
        assert qid not in row[1:]  # may only appear as the entry slot 0
    # without exclusion the point finds itself
    idx2, _ = engine.search(x[:16], k=1, beam_width=32)
    assert (idx2[:, 0] == np.arange(16)).mean() >= 0.9


@pytest.mark.parametrize("metric", ["l2", "ip", "cosine"])
def test_vamana_build_recall(metric):
    x = make_corpus(n=1500, d=24, seed=4)
    if metric in ("ip", "cosine"):
        x = x / np.linalg.norm(x, axis=1, keepdims=True)
    adjacency, medoid = build_vamana(
        x, graph_degree=24, complexity=48, alpha=1.2, metric=metric,
        wave_size=256, seed=0,
    )
    assert adjacency.shape == (1500, 24)
    assert 0 <= medoid < 1500
    # no self-edges
    self_edges = (adjacency == np.arange(1500)[:, None]).sum()
    assert self_edges == 0

    engine = BeamSearchEngine(x, adjacency, medoid, metric=metric)
    rng = np.random.default_rng(5)
    queries = x[rng.integers(0, 1500, 32)] + 0.01 * rng.standard_normal(
        (32, 24)
    ).astype(np.float32)
    idx, _ = engine.search(queries, k=10, beam_width=64)
    _, oracle = exact_topk(queries, x, 10, metric=metric)
    rec = recall_at_k(idx, oracle, 10)
    assert rec >= 0.85, f"vamana recall@10 = {rec} ({metric})"


def test_vamana_checkpoint_resume(tmp_path, monkeypatch):
    """A build killed mid-pass resumes from its wave snapshot and still
    produces a searchable graph (the relay-wedge recovery path)."""
    from leann_tpu.ops.vamana import BuildAborted

    x = make_corpus(n=1500, d=24, seed=4)
    ckpt = str(tmp_path / "build.ckpt")
    kwargs = dict(graph_degree=24, complexity=48, alpha=1.2, metric="l2",
                  wave_size=256, seed=0, checkpoint_path=ckpt,
                  checkpoint_every=2)
    # 6 waves per pass; die at wave 3 of pass 1 (snapshot taken @ wave 2)
    monkeypatch.setenv("LEANN_BUILD_ABORT_AFTER", "3")
    with pytest.raises(BuildAborted):
        build_vamana(x, **kwargs)
    assert os.path.exists(ckpt)
    monkeypatch.delenv("LEANN_BUILD_ABORT_AFTER")

    adjacency, medoid = build_vamana(x, **kwargs)  # resumes
    assert adjacency.shape == (1500, 24)
    assert (adjacency == np.arange(1500)[:, None]).sum() == 0

    engine = BeamSearchEngine(x, adjacency, medoid, metric="l2")
    rng = np.random.default_rng(5)
    queries = x[rng.integers(0, 1500, 32)] + 0.01 * rng.standard_normal(
        (32, 24)
    ).astype(np.float32)
    idx, _ = engine.search(queries, k=10, beam_width=64)
    _, oracle = exact_topk(queries, x, 10, metric="l2")
    rec = recall_at_k(idx, oracle, 10)
    assert rec >= 0.85, f"resumed-build recall@10 = {rec}"

    # stale snapshot with a different config key is ignored, not loaded
    adjacency2, _ = build_vamana(
        x, graph_degree=24, complexity=48, alpha=1.2, metric="l2",
        wave_size=256, seed=1, checkpoint_path=ckpt, checkpoint_every=2,
    )
    assert adjacency2.shape == (1500, 24)


def test_vamana_degree_bound_and_sentinel_padding():
    x = make_corpus(n=300, d=8, seed=6)
    adjacency, _ = build_vamana(
        x, graph_degree=12, complexity=24, metric="l2", wave_size=128
    )
    assert adjacency.shape == (300, 12)
    # all entries are valid ids or the sentinel (n)
    assert ((adjacency >= 0) & (adjacency <= 300)).all()


def test_ivf_engine_recall():
    from leann_tpu.ops.ivf import IvfEngine

    x = make_corpus(n=3000, d=32, seed=10, clusters=40)
    eng = IvfEngine(x, n_clusters=64, metric="l2")
    queries = x[[5, 500, 1500, 2500]] + 0.01
    idx, scores = eng.search(queries, k=10, nprobe=16)
    _, oracle = exact_topk(queries, x, 10, metric="l2")
    rec = recall_at_k(idx, oracle, 10)
    assert rec >= 0.9, f"ivf recall {rec}"
    # self-retrieval
    assert (idx[:, 0] == np.array([5, 500, 1500, 2500])).all()
    # descending scores
    assert (np.diff(scores, axis=1) <= 1e-5).all()


def test_ivf_no_vector_dropped_by_overflow():
    """cap smaller than the largest cluster: overflow buckets must keep
    every vector findable."""
    from leann_tpu.ops.ivf import IvfEngine

    rng = np.random.default_rng(11)
    # one dense blob -> single cluster holds nearly everything
    x = rng.standard_normal((500, 8)).astype(np.float32) * 0.01
    eng = IvfEngine(x, n_clusters=4, metric="l2", cap=32)
    # probing all buckets must find every point exactly
    idx, _ = eng.search(x[123], k=1, nprobe=eng.bucket_cent.shape[0])
    assert idx[0, 0] == 123


def test_ivf_backend_end_to_end(tmp_path):
    from leann_tpu.embed import EmbeddingProvider
    from leann_tpu.index.builder import IndexBuilder
    from leann_tpu.index.searcher import IndexSearcher, SearchOptions

    base = str(tmp_path / "idx" / "documents.leann")
    provider = EmbeddingProvider(mode="fake", dimensions=24)
    texts = [f"doc {i} theme {i % 9}" for i in range(400)]
    vecs = provider.embed(texts)
    b = IndexBuilder(base, dim=24, backend="ivf", metric="ip")
    for i, (t, v) in enumerate(zip(texts, vecs)):
        b.add(f"d{i}", t, v)
    meta = b.build()
    assert meta.backend_name == "ivf"
    s = IndexSearcher.load(base)
    res = s.search(provider.embed([texts[222]]), SearchOptions(top_k=3))[0]
    assert res[0].id == "d222"


def test_seed_pool_scales_with_n():
    x = make_corpus(n=4000, d=8, seed=20)
    _, nn_idx = exact_topk(x, x, 5, metric="l2")
    adjacency = np.asarray(
        [[j for j in nn_idx[i].tolist() if j != i][:4] for i in range(4000)],
        dtype=np.int32,
    )
    engine = BeamSearchEngine(x, adjacency, medoid=0, metric="l2")
    # pool floor is 4096 (seed coverage: see ops/beam.py seed_pool_size),
    # clamped to n; at n=4000 the whole corpus is eligible
    assert 3000 <= engine.seed_ids.shape[0] <= 4001
    # entries respect the beam: n_entries = min(16, beam // 2)
    idx, _ = engine.search(x[:8], k=3, beam_width=8)
    assert idx.shape == (8, 3)


def test_seed_pool_size_policy(monkeypatch):
    from leann_tpu.ops.beam import seed_pool_size

    assert seed_pool_size(100) == 100          # clamped to n
    assert seed_pool_size(100_000) == 4096     # floor
    assert seed_pool_size(4_000_000) == 8000   # 4*sqrt(n) beyond 1M
    monkeypatch.setenv("LEANN_SEED_POOL", "512")
    assert seed_pool_size(100_000) == 512      # env override


@pytest.mark.parametrize("mode", ["int8", "bf16", "none"])
def test_inline_block_modes_agree(mode):
    """The inline-block traversal layouts (int8/bf16) must return the
    same top results as the row-gather layout: quantization only guides
    the walk — the final beam is rescored in f32."""
    rng = np.random.default_rng(7)
    centers = rng.standard_normal((20, 24)).astype(np.float32) * 3.0
    x = (centers[rng.integers(0, 20, 3000)]
         + rng.standard_normal((3000, 24)).astype(np.float32))
    adjacency, medoid = build_vamana(
        x, graph_degree=16, complexity=32, metric="l2", wave_size=512
    )
    queries = x[rng.integers(0, 3000, 48)] + 0.01 * rng.standard_normal(
        (48, 24)
    ).astype(np.float32)
    _, oracle = exact_topk(queries, x, 10, metric="l2")

    engine = BeamSearchEngine(
        x, adjacency, medoid, metric="l2", block_mode=mode
    )
    assert engine.block_mode == mode
    idx, scores = engine.search(queries, k=10, beam_width=48)
    rec = recall_at_k(idx, oracle, 10)
    assert rec >= 0.97, f"{mode}: recall@10 = {rec}"
    assert (np.diff(scores, axis=1) <= 1e-5).all()


def test_inline_rescore_is_exact():
    """Inline traversal scores come from quantized blocks, but returned
    scores must equal the exact f32 scores of the returned ids."""
    rng = np.random.default_rng(3)
    x = rng.standard_normal((500, 16)).astype(np.float32)
    adjacency, medoid = build_vamana(
        x, graph_degree=12, complexity=24, metric="l2", wave_size=256
    )
    engine = BeamSearchEngine(
        x, adjacency, medoid, metric="l2", block_mode="int8"
    )
    q = rng.standard_normal((8, 16)).astype(np.float32)
    idx, scores = engine.search(q, k=5, beam_width=24)
    for b in range(8):
        for j in range(5):
            if idx[b, j] < 0:
                continue
            v = x[idx[b, j]]
            expect = 2.0 * float(q[b] @ v) - float(v @ v)
            np.testing.assert_allclose(scores[b, j], expect, rtol=1e-4)


def test_ivf_search_many_device_matches_single():
    """IvfEngine.search_many_device ([M, B, D] in one dispatch) matches
    per-batch search_device output."""
    import jax.numpy as jnp

    from leann_tpu.ops.ivf import IvfEngine

    x = make_corpus(n=3000, d=32, seed=13, clusters=40)
    eng = IvfEngine(x, n_clusters=64, metric="l2")
    rng = np.random.default_rng(14)
    qs = x[rng.integers(0, 3000, (3, 8))] + np.float32(0.01)
    ids_m, sc_m = eng.search_many_device(jnp.asarray(qs), k=10, nprobe=16)
    assert ids_m.shape == (3, 8, 10)
    for m in range(3):
        ids_1, sc_1 = eng.search_device(jnp.asarray(qs[m]), k=10, nprobe=16)
        np.testing.assert_array_equal(np.asarray(ids_m[m]), np.asarray(ids_1))
        np.testing.assert_allclose(
            np.asarray(sc_m[m]), np.asarray(sc_1), rtol=1e-5, atol=1e-5
        )


def test_ivf_nprobe_calibration():
    """Fixed nprobe is distribution-dependent (hardness sweep): on a
    many-cluster corpus the calibrated operating point must meet its
    target where small fixed nprobe does not, and IvfSearcher must
    honor the stored floor."""
    from leann_tpu.backend import IvfSearcher
    from leann_tpu.ops.distance import exact_topk
    from leann_tpu.ops.ivf import IvfEngine
    from leann_tpu.store.ivffile import IvfFile

    rng = np.random.default_rng(3)
    n, d, n_true = 8000, 32, 2000   # many tiny true clusters
    centers = rng.standard_normal((n_true, d)).astype(np.float32) * 4
    x = (centers[rng.integers(0, n_true, n)]
         + rng.standard_normal((n, d)).astype(np.float32))
    eng = IvfEngine(x, metric="l2")
    nprobe, cal_rec = eng.calibrate_nprobe(target_recall=0.95, sample=128)
    assert cal_rec >= 0.95 or nprobe == eng.n_clusters

    q = x[rng.integers(0, n, 64)] + rng.standard_normal((64, d)).astype(
        np.float32)
    _, oracle = exact_topk(q, x, 10, metric="l2")
    oracle = np.asarray(oracle)

    def rec(ids):
        return np.mean([
            len(set(a.tolist()) & set(b.tolist())) / 10
            for a, b in zip(np.asarray(ids), oracle)
        ])

    ids_cal, _ = eng.search(q, k=10, nprobe=nprobe)
    ids_8, _ = eng.search(q, k=10, nprobe=8)
    assert rec(ids_cal) >= rec(ids_8)
    assert rec(ids_cal) >= 0.9

    # searcher honors the calibrated floor even at default complexity
    s = IvfSearcher(x, IvfFile(eng.centers, eng.assign, "l2"),
                    metric="l2", default_nprobe=int(nprobe))
    ids_s, _ = s.search(q, k=10, complexity=16)   # 16//2=8 < floor
    assert rec(ids_s) >= rec(ids_8)
