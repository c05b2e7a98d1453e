"""IVF-PQ engine (ops/ivf_pq.py): ADC bucket scan + exact rescore."""

import numpy as np
import pytest

from leann_tpu.ops.distance import exact_topk
from leann_tpu.ops.ivf_pq import IvfPqEngine


def clustered(n=6000, d=32, k=40, seed=0):
    rng = np.random.default_rng(seed)
    centers = 4.0 * rng.standard_normal((k, d)).astype(np.float32)
    x = centers[rng.integers(0, k, n)] + rng.standard_normal(
        (n, d)).astype(np.float32)
    return np.ascontiguousarray(x, np.float32)


def recall(idx, oracle):
    k = oracle.shape[1]
    return np.mean([
        len(set(a.tolist()) & set(b.tolist())) / k
        for a, b in zip(idx, oracle)
    ])


@pytest.mark.parametrize("metric", ["l2", "ip"])
def test_ivfpq_recall_and_exact_scores(metric):
    x = clustered()
    eng = IvfPqEngine(x, n_clusters=64, metric=metric, m=8,
                      rescore="f32", seed=0)
    rng = np.random.default_rng(1)
    q = x[rng.integers(0, len(x), 16)] + 0.05 * rng.standard_normal(
        (16, 32)).astype(np.float32)
    idx, sc = eng.search(q, k=10, nprobe=16, rescore_factor=16)
    _, oracle = exact_topk(q, x, 10, metric=metric)
    assert recall(idx, np.asarray(oracle)) >= 0.9
    # rescored scores are EXACT (negated-l2 / ip convention)
    i0 = idx[0, 0]
    if metric == "l2":
        want = 2 * float(q[0] @ x[i0]) - float(x[i0] @ x[i0])
    else:
        want = float(q[0] @ x[i0])
    np.testing.assert_allclose(sc[0, 0], want, rtol=1e-4)


def test_ivfpq_int8_rescore_close_to_f32():
    x = clustered(seed=2)
    rng = np.random.default_rng(3)
    q = x[rng.integers(0, len(x), 16)] + 0.05 * rng.standard_normal(
        (16, 32)).astype(np.float32)
    e32 = IvfPqEngine(x, n_clusters=64, metric="l2", m=8, rescore="f32")
    e8 = IvfPqEngine(x, n_clusters=64, metric="l2", m=8, rescore="int8")
    i32, _ = e32.search(q, k=10, nprobe=16)
    i8, _ = e8.search(q, k=10, nprobe=16)
    overlap = np.mean([
        len(set(a.tolist()) & set(b.tolist())) / 10
        for a, b in zip(i32, i8)
    ])
    assert overlap >= 0.9, overlap


def test_ivfpq_opq_rotation():
    """Rotated-frame coarse+residual quantization; any orthogonal
    rotation is algebraically valid and recall must hold."""
    x = clustered(seed=4)
    rng = np.random.default_rng(5)
    rot, _ = np.linalg.qr(rng.standard_normal((32, 32)))
    eng = IvfPqEngine(x, n_clusters=64, metric="l2", m=8,
                      rescore="f32", rotation=rot.astype(np.float32))
    q = x[rng.integers(0, len(x), 16)] + 0.05 * rng.standard_normal(
        (16, 32)).astype(np.float32)
    idx, _ = eng.search(q, k=10, nprobe=16, rescore_factor=16)
    _, oracle = exact_topk(q, x, 10, metric="l2")
    assert recall(idx, np.asarray(oracle)) >= 0.9


def test_ivfpq_stored_nsq_is_exact():
    """|x_hat|^2 computed via the decomposed (csq + 2<c,r_hat> +
    |r_hat|^2) form must equal the norm of the materialized
    reconstruction — the ADC l2 algebra rests on it."""
    from leann_tpu.ops.pq import reconstruct_pq

    x = clustered(n=2000, seed=6)
    eng = IvfPqEngine(x, n_clusters=32, metric="l2", m=8, rescore="f32")
    # rebuild x_hat explicitly
    resid_hat = reconstruct_pq(
        np.asarray(
            eng.bucket_codes.reshape(-1, eng.m)[
                np.argsort(np.asarray(eng.bucket_ids).reshape(-1),
                           kind="stable")[:len(x)]
            ]
        ),
        eng.books,
    )
    order = np.argsort(np.asarray(eng.bucket_ids).reshape(-1),
                       kind="stable")[:len(x)]
    ids_sorted = np.asarray(eng.bucket_ids).reshape(-1)[order]
    xhat = eng.centers[eng.assign[ids_sorted]] + resid_hat
    want = np.einsum("nd,nd->n", xhat, xhat)
    got = np.asarray(eng.bucket_nsq).reshape(-1)[order]
    np.testing.assert_allclose(got, want, rtol=1e-3, atol=1e-2)


def test_ivf_searcher_pq_knob(monkeypatch):
    """LEANN_IVF_ENGINE=pq routes IvfSearcher onto the ADC engine
    (auto picks it only at ~100M-class corpus bytes)."""
    from types import SimpleNamespace

    from leann_tpu.backend import IvfSearcher
    from leann_tpu.ops.ivf import kmeans
    from leann_tpu.ops.ivf_pq import IvfPqEngine

    monkeypatch.setenv("LEANN_IVF_ENGINE", "pq")
    x = clustered(n=3000, seed=9)
    c, a = kmeans(x, 48, iters=5, metric="l2")
    s = IvfSearcher(x, SimpleNamespace(centers=c, assign=a), metric="l2")
    assert isinstance(s.engine, IvfPqEngine)
    idx, _ = s.search(x[:8], k=5, complexity=64)
    assert (idx[:, 0] == np.arange(8)).all()


def test_ivfpq_calibrate_nprobe():
    """Ladder calibration through the ADC engine: returns an operating
    point meeting the target on the engine's own oracle."""
    x = clustered(n=4000, seed=10)
    eng = IvfPqEngine(x, n_clusters=64, metric="l2", m=8, rescore="f32")
    nprobe, rec = eng.calibrate_nprobe(target_recall=0.9, sample=64)
    assert rec >= 0.9
    assert 1 <= nprobe <= eng.n_clusters


def test_ivfpq_search_many_matches_single():
    x = clustered(n=3000, seed=7)
    import jax.numpy as jnp

    eng = IvfPqEngine(x, n_clusters=48, metric="ip", m=8, rescore="f32")
    rng = np.random.default_rng(8)
    q = x[rng.integers(0, len(x), 8)].astype(np.float32)
    ids1, sc1 = eng.search(q, k=5, nprobe=16)
    ids2, sc2 = eng.search_many_device(
        jnp.asarray(q[None]), k=5, nprobe=16)
    np.testing.assert_array_equal(ids1, np.asarray(ids2[0]))
    np.testing.assert_allclose(sc1, np.asarray(sc2[0]), rtol=1e-5)
