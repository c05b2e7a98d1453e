"""Fused whole-traversal Pallas kernel: correctness in interpret mode.

Measured on TPU v5e (1M x 128, R=48, evals/graph_perf.py + bench.py):
  beam 64: recall@10 0.9942 @ 10,137 QPS (sync) / 18,851 QPS (pipelined)
  beam 32: recall@10 0.9766 @  8,200 QPS (sync)
  (XLA inline path at beam 64: 3,286 QPS)
"""

import numpy as np
import jax.numpy as jnp
import pytest

from leann_tpu.ops.distance import exact_topk
from leann_tpu.ops.fused_beam import (
    FusedBeamEngine, _bitonic_desc, pack_fused,
)
from leann_tpu.ops.vamana import build_vamana


def _corpus(n, d, seed=0, clusters=32):
    rng = np.random.default_rng(seed)
    centers = rng.standard_normal((clusters, d)).astype(np.float32) * 3
    return (centers[rng.integers(0, clusters, n)]
            + rng.standard_normal((n, d)).astype(np.float32)).astype(np.float32)


def test_bitonic_desc_sorts_and_carries():
    import jax
    from jax.experimental import pallas as pl
    from jax.experimental.pallas import tpu as pltpu

    rng = np.random.default_rng(1)
    sc = rng.standard_normal((4, 64)).astype(np.float32)
    ids = np.arange(4 * 64, dtype=np.int32).reshape(4, 64)
    exp = (rng.random((4, 64)) < 0.5).astype(np.int32)

    def kernel(s_ref, i_ref, e_ref, os_ref, oi_ref, oe_ref):
        # pltpu.roll (used by the sort) only exists inside kernels
        a, b, c = _bitonic_desc(s_ref[:], i_ref[:], e_ref[:])
        os_ref[:], oi_ref[:], oe_ref[:] = a, b, c

    s_sc, s_id, s_exp = pl.pallas_call(
        kernel,
        out_shape=(
            jax.ShapeDtypeStruct(sc.shape, jnp.float32),
            jax.ShapeDtypeStruct(ids.shape, jnp.int32),
            jax.ShapeDtypeStruct(exp.shape, jnp.int32),
        ),
        interpret=True,
    )(jnp.asarray(sc), jnp.asarray(ids), jnp.asarray(exp))
    s_sc, s_id, s_exp = map(np.asarray, (s_sc, s_id, s_exp))
    order = np.argsort(-sc, axis=1)
    np.testing.assert_allclose(s_sc, np.take_along_axis(sc, order, axis=1))
    # payload rows moved with their scores
    np.testing.assert_array_equal(s_id, np.take_along_axis(ids, order, axis=1))
    np.testing.assert_array_equal(s_exp, np.take_along_axis(exp, order, axis=1))


def test_pack_fused_layout():
    n, d, r = 40, 128, 8
    vecs = np.concatenate(
        [_corpus(n, d), np.zeros((1, d), np.float32)]
    )
    adj = np.random.default_rng(0).integers(0, n, (n + 1, r)).astype(np.int32)
    adj[n] = n
    blocks, meta = pack_fused(jnp.asarray(vecs), jnp.asarray(adj))
    blocks, meta = np.asarray(blocks), np.asarray(meta)
    assert blocks.shape == (n + 1, r, d) and meta.shape == (n + 1, 3, 128)
    # ids plane: real neighbors then sentinel pad
    np.testing.assert_array_equal(meta[3, 0, :r], adj[3])
    assert (meta[3, 0, r:] == n).all()
    # dequant round-trips within int8 tolerance
    scale = meta[:, 1, :r].view(np.float32)
    recon = blocks[3].astype(np.float32) * scale[3][:, None]
    np.testing.assert_allclose(recon, vecs[adj[3]], atol=np.abs(vecs).max() / 100)
    # |v|^2 plane
    nsq = meta[3, 2, :r].view(np.float32)
    np.testing.assert_allclose(nsq, (vecs[adj[3]] ** 2).sum(1), rtol=1e-5)


@pytest.mark.parametrize("metric", ["l2", "ip"])
def test_fused_engine_recall_interpret(metric):
    n, d, r = 1500, 128, 16
    vecs = _corpus(n, d)
    adj, medoid = build_vamana(
        vecs, graph_degree=r, complexity=32, metric=metric, wave_size=512
    )
    eng = FusedBeamEngine(
        vecs, adj, medoid, metric=metric, expansions=2, qb=8,
        ring_size=256, interpret=True,
    )
    b = 16
    rng = np.random.default_rng(1)
    q = vecs[rng.integers(0, n, b)] + rng.standard_normal((b, d)).astype(
        np.float32) * 0.05
    idx, sc = eng.search(q, k=10, beam_width=32)
    _, oracle = exact_topk(q, vecs, 10, metric=metric)
    recall = np.mean([
        len(set(idx[i].tolist()) & set(oracle[i].tolist())) / 10
        for i in range(b)
    ])
    assert recall >= 0.85, recall
    # scores are exact f32 (descending, match direct computation)
    assert (np.diff(sc, axis=1) <= 1e-5).all()


def test_fused_visited_log_interpret():
    """track_visited returns the expanded-node log (the Vamana visited
    set): first entry is the best seed, ids are valid, and the top beam
    results of a converged search were expanded."""
    from leann_tpu.ops.fused_beam import fused_beam_search, quantize_corpus

    n, d, r = 800, 128, 16
    vecs = _corpus(n, d)
    adj, medoid = build_vamana(
        vecs, graph_degree=r, complexity=32, metric="l2", wave_size=256
    )
    vecs1 = np.concatenate([vecs, np.zeros((1, d), np.float32)])
    adj1 = np.concatenate([adj, np.full((1, r), n, np.int32)])
    blocks, meta = pack_fused(jnp.asarray(vecs1), jnp.asarray(adj1))

    b, L = 8, 32
    rng = np.random.default_rng(3)
    q = vecs[rng.integers(0, n, b)].astype(np.float32)
    nsq = (vecs1 ** 2).sum(1).astype(np.float32)
    seed_sc = 2.0 * q @ vecs1[medoid] - nsq[medoid]
    ids, sc, vlog = fused_beam_search(
        jnp.asarray(q), blocks, meta,
        jnp.full((b, 1), medoid, jnp.int32), jnp.asarray(seed_sc)[:, None],
        jnp.full((b,), -1, jnp.int32),
        r=r, beam_width=L, max_iters=80, metric="l2",
        expansions=2, qb=8, ring_size=256, track_visited=64,
        interpret=True,
    )
    vlog = np.asarray(vlog)
    assert vlog.shape == (b, 128)  # rounded up to lane multiple
    assert ((vlog >= 0) & (vlog <= n)).all()
    # the first expanded node is the (only) seed
    np.testing.assert_array_equal(vlog[:, 0], np.full(b, medoid))
    # a converged search expanded its top results
    ids = np.asarray(ids)
    for i in range(b):
        assert ids[i, 0] in set(vlog[i].tolist())


def test_fused_build_path_parity_interpret(monkeypatch):
    """LEANN_BUILD_ENGINE=fused-interpret builds through the kernel on
    CPU; graph quality matches the inline-built graph."""
    from leann_tpu.ops.beam import BeamSearchEngine

    n, d, r = 500, 128, 12
    vecs = _corpus(n, d)
    rng = np.random.default_rng(5)
    q = vecs[rng.integers(0, n, 16)] + rng.standard_normal(
        (16, d)).astype(np.float32) * 0.05
    _, oracle = exact_topk(q, vecs, 10, metric="l2")

    recalls = {}
    for engine in ("fused-interpret", "inline"):
        monkeypatch.setenv("LEANN_BUILD_ENGINE", engine)
        adj, medoid = build_vamana(
            vecs, graph_degree=r, complexity=24, metric="l2",
            wave_size=128,
        )
        eng = BeamSearchEngine(vecs, adj, medoid, metric="l2")
        idx, _ = eng.search(q, k=10, beam_width=32)
        recalls[engine] = np.mean([
            len(set(idx[i].tolist()) & set(oracle[i].tolist())) / 10
            for i in range(len(q))
        ])
    assert recalls["fused-interpret"] >= 0.85, recalls
    assert recalls["fused-interpret"] >= recalls["inline"] - 0.1, recalls


def test_fused_engine_excludes_and_odd_batch():
    n, d, r = 600, 128, 16
    vecs = _corpus(n, d)
    adj, medoid = build_vamana(
        vecs, graph_degree=r, complexity=32, metric="l2", wave_size=256
    )
    eng = FusedBeamEngine(
        vecs, adj, medoid, metric="l2", expansions=2, qb=8,
        ring_size=256, interpret=True,
    )
    q = vecs[5:8]  # 3 queries (pads to qb)
    excl = np.array([5, 6, 7], np.int32)
    idx, _ = eng.search(q, k=5, beam_width=32, exclude=excl)
    assert idx.shape == (3, 5)
    for i, e in enumerate(excl):
        assert e not in idx[i]


def test_fused_search_many_device_matches_single_interpret():
    """FusedBeamEngine.search_many_device ([M, B, D], one dispatch)
    matches per-batch search_device output (interpret mode, CPU)."""
    import jax.numpy as jnp

    n, d, r = 1200, 128, 16
    vecs = _corpus(n, d)
    adj, medoid = build_vamana(
        vecs, graph_degree=r, complexity=32, metric="l2", wave_size=512
    )
    eng = FusedBeamEngine(
        vecs, adj, medoid, metric="l2", expansions=2, qb=8,
        ring_size=256, interpret=True,
    )
    rng = np.random.default_rng(3)
    qs = vecs[rng.integers(0, n, (2, 8))] + rng.standard_normal(
        (2, 8, d)).astype(np.float32) * 0.05
    ids_m, sc_m = eng.search_many_device(jnp.asarray(qs), k=10, beam_width=32)
    assert ids_m.shape == (2, 8, 10)
    for m in range(2):
        ids_1, sc_1 = eng.search_device(qs[m], k=10, beam_width=32)
        np.testing.assert_array_equal(np.asarray(ids_m[m]), np.asarray(ids_1))
        np.testing.assert_allclose(
            np.asarray(sc_m[m]), np.asarray(sc_1), rtol=1e-5, atol=1e-5
        )
