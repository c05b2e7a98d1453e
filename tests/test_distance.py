import numpy as np

from leann_tpu.ops.distance import exact_topk, pairwise_scores


def brute_scores(queries, vectors, metric):
    if metric == "ip":
        return queries @ vectors.T
    if metric == "cosine":
        qn = queries / np.linalg.norm(queries, axis=1, keepdims=True)
        vn = vectors / np.linalg.norm(vectors, axis=1, keepdims=True)
        return qn @ vn.T
    if metric == "l2":
        return -((queries[:, None, :] - vectors[None, :, :]) ** 2).sum(-1)
    raise ValueError(metric)


def assert_topk_correct(queries, vectors, k, metric, idx, scores, tol=1e-3):
    """Top-k is correct if the returned candidates' true scores match the
    numpy top-k scores (robust to float tie-break order)."""
    true = brute_scores(queries, vectors, metric)
    expected = -np.sort(-true, axis=1)[:, :k]
    got = np.take_along_axis(true, idx, axis=1)
    got_sorted = -np.sort(-got, axis=1)
    np.testing.assert_allclose(got_sorted, expected, rtol=tol, atol=tol)
    # no duplicate indices per row
    for row in idx:
        assert len(set(row.tolist())) == len(row)


def test_exact_topk_ip_matches_numpy():
    rng = np.random.default_rng(0)
    vectors = rng.standard_normal((1000, 32)).astype(np.float32)
    queries = rng.standard_normal((7, 32)).astype(np.float32)
    scores, idx = exact_topk(queries, vectors, 10, metric="ip", chunk_size=128)
    assert_topk_correct(queries, vectors, 10, "ip", idx, scores)
    # returned scores are the actual dot products of returned indices
    np.testing.assert_allclose(
        scores[0], queries[0] @ vectors[idx[0]].T, rtol=1e-3, atol=1e-3
    )


def test_exact_topk_l2():
    rng = np.random.default_rng(1)
    vectors = rng.standard_normal((500, 16)).astype(np.float32)
    queries = rng.standard_normal((3, 16)).astype(np.float32)
    scores, idx = exact_topk(queries, vectors, 5, metric="l2", chunk_size=100)
    assert_topk_correct(queries, vectors, 5, "l2", idx, scores, tol=1e-2)


def test_exact_topk_cosine():
    rng = np.random.default_rng(2)
    vectors = rng.standard_normal((300, 8)).astype(np.float32) * 10
    queries = rng.standard_normal((2, 8)).astype(np.float32)
    scores, idx = exact_topk(queries, vectors, 4, metric="cosine")
    assert_topk_correct(queries, vectors, 4, "cosine", idx, scores)


def test_single_query_1d_input():
    rng = np.random.default_rng(3)
    vectors = rng.standard_normal((100, 8)).astype(np.float32)
    scores, idx = exact_topk(vectors[17], vectors, 1, metric="ip")
    assert idx.shape == (1, 1)
    np.testing.assert_allclose(
        scores[0, 0], float(vectors[17] @ vectors[idx[0, 0]]), rtol=1e-4
    )


def test_k_larger_than_n():
    vectors = np.eye(5, dtype=np.float32)
    scores, idx = exact_topk(np.ones((1, 5), np.float32), vectors, 10)
    assert idx.shape == (1, 5)
    assert set(idx[0].tolist()) == set(range(5))


def test_pairwise_scores_l2_consistency():
    rng = np.random.default_rng(4)
    q = rng.standard_normal((4, 8)).astype(np.float32)
    v = rng.standard_normal((6, 8)).astype(np.float32)
    s = np.asarray(pairwise_scores(q, v, "l2"))
    # score = 2 q.v - |v|^2 ; ordering must match -|q-v|^2
    true = -((q[:, None, :] - v[None, :, :]) ** 2).sum(-1)
    for row in range(4):
        np.testing.assert_array_equal(np.argsort(s[row]), np.argsort(true[row]))


def test_two_stage_exact_matches_full_precision():
    rng = np.random.default_rng(7)
    vectors = rng.standard_normal((5000, 64)).astype(np.float32)
    queries = rng.standard_normal((16, 64)).astype(np.float32)
    s1, i1 = exact_topk(queries, vectors, 10, metric="l2")
    s2, i2 = exact_topk(queries, vectors, 10, metric="l2", two_stage=True)
    # two-stage must recover (essentially) the same top-10 sets
    overlap = np.mean([
        len(set(a.tolist()) & set(b.tolist())) / 10 for a, b in zip(i1, i2)
    ])
    assert overlap >= 0.99, overlap
    np.testing.assert_allclose(s1, s2, rtol=1e-3, atol=1e-3)


def test_two_stage_ip_and_cosine():
    rng = np.random.default_rng(8)
    vectors = rng.standard_normal((2000, 32)).astype(np.float32)
    queries = rng.standard_normal((8, 32)).astype(np.float32)
    for metric in ("ip", "cosine"):
        _, i1 = exact_topk(queries, vectors, 5, metric=metric)
        _, i2 = exact_topk(queries, vectors, 5, metric=metric, two_stage=True)
        overlap = np.mean([
            len(set(a.tolist()) & set(b.tolist())) / 5 for a, b in zip(i1, i2)
        ])
        assert overlap >= 0.95, (metric, overlap)


def test_exact_engine_device_resident():
    from leann_tpu.ops.distance import ExactEngine

    rng = np.random.default_rng(9)
    vectors = rng.standard_normal((3000, 48)).astype(np.float32)
    queries = rng.standard_normal((8, 48)).astype(np.float32)
    for metric in ("ip", "l2", "cosine"):
        eng = ExactEngine(vectors, metric=metric)
        idx, scores = eng.search(queries, k=10)
        _, oracle = exact_topk(queries, vectors, 10, metric=metric)
        overlap = np.mean([
            len(set(a.tolist()) & set(b.tolist())) / 10
            for a, b in zip(idx, oracle)
        ])
        assert overlap >= 0.99, (metric, overlap)
        assert (np.diff(scores, axis=1) <= 1e-5).all()
        # exact_scan mode is bit-exact vs the oracle scores
        idx_e, scores_e = eng.search(queries, k=10, exact_scan=True)
        s_o, _ = exact_topk(queries, vectors, 10, metric=metric)
        np.testing.assert_allclose(scores_e, s_o, rtol=1e-4, atol=1e-4)


def test_exact_engine_search_device_matches_host_path():
    """search_device (single-dispatch, device-in/device-out) returns the
    same results as the host-facing search()."""
    import jax.numpy as jnp

    from leann_tpu.ops.distance import ExactEngine

    rng = np.random.default_rng(11)
    vectors = rng.standard_normal((5000, 64)).astype(np.float32)
    queries = rng.standard_normal((16, 64)).astype(np.float32)
    eng = ExactEngine(vectors, metric="l2")
    idx_h, sc_h = eng.search(queries, k=10)
    idx_d, sc_d = eng.search_device(jnp.asarray(queries), k=10)
    np.testing.assert_array_equal(idx_h, np.asarray(idx_d))
    np.testing.assert_allclose(sc_h, np.asarray(sc_d), rtol=1e-6)


def test_exact_engine_search_many_device_matches_single():
    """search_many_device ([M, B, D] in ONE dispatch) returns the same
    results per batch as search_device — the honest device-time
    measurement path (relay overhead amortizes as 1/M)."""
    import jax.numpy as jnp

    from leann_tpu.ops.distance import ExactEngine

    rng = np.random.default_rng(12)
    vectors = rng.standard_normal((5000, 64)).astype(np.float32)
    qs = rng.standard_normal((3, 16, 64)).astype(np.float32)
    eng = ExactEngine(vectors, metric="l2")
    ids_m, sc_m = eng.search_many_device(jnp.asarray(qs), k=10)
    assert ids_m.shape == (3, 16, 10) and sc_m.shape == (3, 16, 10)
    for m in range(3):
        ids_1, sc_1 = eng.search_device(jnp.asarray(qs[m]), k=10)
        np.testing.assert_array_equal(np.asarray(ids_m[m]), np.asarray(ids_1))
        np.testing.assert_allclose(
            np.asarray(sc_m[m]), np.asarray(sc_1), rtol=1e-6
        )
