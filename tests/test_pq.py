"""Product quantization: train/encode/reconstruct/ADC correctness."""

import numpy as np

from leann_tpu.ops.pq import (
    adc_lut, encode_pq, reconstruct_pq, train_pq,
)


def _corpus(n=4000, d=32, seed=0, clusters=32):
    rng = np.random.default_rng(seed)
    centers = rng.standard_normal((clusters, d)).astype(np.float32) * 4.0
    return (centers[rng.integers(0, clusters, n)]
            + rng.standard_normal((n, d)).astype(np.float32))


def test_pq_roundtrip_error_small():
    x = _corpus()
    books = train_pq(x[:2000], m=8, ksub=64, iters=8)
    codes = encode_pq(x, books)
    assert codes.shape == (4000, 8) and codes.dtype == np.uint8
    xh = reconstruct_pq(codes, books)
    # clustered data: PQ should capture most of the variance
    rel = np.linalg.norm(x - xh) / np.linalg.norm(x)
    assert rel < 0.25, rel


def test_adc_lut_matches_reconstructed_dot():
    import jax.numpy as jnp

    x = _corpus(n=500)
    books = train_pq(x, m=8, ksub=32, iters=6)
    codes = encode_pq(x, books)
    xh = reconstruct_pq(codes, books)
    q = _corpus(n=4, seed=1)
    lut = np.asarray(adc_lut(jnp.asarray(q), jnp.asarray(books)))
    # adc[b, n] = sum_j LUT[b, j, codes[n, j]] == <q_b, x_hat_n>
    j_idx = np.arange(8)[None, :]
    adc = np.stack([
        lut[b, j_idx, codes.astype(np.int64)].sum(-1) for b in range(4)
    ])
    direct = q @ xh.T
    np.testing.assert_allclose(adc, direct, rtol=1e-4, atol=1e-3)


def test_pq_navigation_floor_on_clustered_corpus():
    """ADC ranking keeps most true neighbors in a modest overfetch
    window. On white-gaussian intra-cluster residuals (the synthetic
    corpus worst case) PQ cannot fully rank near-ties — which is why the
    PQ traversal design rescores the VISITED SET exactly rather than
    trusting ADC order for final selection. This asserts the navigation
    floor that design relies on: the true neighborhood scores high
    enough under ADC to be walked into and retained."""
    x = _corpus(n=4000, d=32)
    books = train_pq(x[:2000], m=8, ksub=64, iters=8)
    xh = reconstruct_pq(encode_pq(x, books), books)
    rng = np.random.default_rng(2)
    q = x[rng.integers(0, 4000, 32)] + rng.standard_normal(
        (32, 32)).astype(np.float32) * 0.05
    d_true = ((q[:, None, :] - x[None, :, :]) ** 2).sum(-1)
    oracle = np.argsort(d_true, axis=1)[:, :10]
    s_hat = 2.0 * q @ xh.T - (xh * xh).sum(1)[None, :]
    in40 = np.argsort(-s_hat, axis=1)[:, :40]
    in200 = np.argsort(-s_hat, axis=1)[:, :200]
    r40 = np.mean([len(set(oracle[i]) & set(in40[i])) / 10 for i in range(32)])
    r200 = np.mean([len(set(oracle[i]) & set(in200[i])) / 10 for i in range(32)])
    assert r40 >= 0.5, r40
    # a visited-set-sized pool must contain nearly all true neighbors
    assert r200 >= 0.9, r200


def _aniso_corpus(n=6000, d=64, seed=3, k_intrinsic=8):
    """Energy concentrated in a random k-dim subspace — the regime OPQ
    exists for (correlated dims that naive subspace slicing splits)."""
    rng = np.random.default_rng(seed)
    basis, _ = np.linalg.qr(rng.standard_normal((d, k_intrinsic)))
    lat = rng.standard_normal((n, k_intrinsic)).astype(np.float32) * 3.0
    amb = rng.standard_normal((n, d)).astype(np.float32) * 0.1
    return (lat @ basis.T.astype(np.float32) + amb).astype(np.float32)


def test_opq_rotation_is_orthogonal():
    from leann_tpu.ops.pq import train_opq

    x = _aniso_corpus()
    rot, books = train_opq(x, m=8, ksub=64, iters=6, opq_iters=4)
    d = x.shape[1]
    np.testing.assert_allclose(rot @ rot.T, np.eye(d), atol=1e-4)
    assert books.shape == (8, 64, d // 8)


def test_opq_beats_plain_pq_on_anisotropic_data():
    from leann_tpu.ops.pq import train_opq

    x = _aniso_corpus()
    books_p = train_pq(x, m=8, ksub=64, iters=8)
    xp = reconstruct_pq(encode_pq(x, books_p), books_p)
    rot, books_o = train_opq(x, m=8, ksub=64, iters=8, opq_iters=6)
    xo = reconstruct_pq(encode_pq(x @ rot, books_o), books_o) @ rot.T
    err_p = np.linalg.norm(x - xp) / np.linalg.norm(x)
    err_o = np.linalg.norm(x - xo) / np.linalg.norm(x)
    # the subspace slicing splits the correlated energy across all 8
    # codebooks; the learned rotation re-concentrates it
    assert err_o < err_p * 0.8, (err_o, err_p)


def test_opq_lut_fold_identity():
    """LUT on rotated queries == rotation-folded LUT on raw queries —
    the exact algebra PqBeamEngine relies on."""
    from leann_tpu.ops.pq import adc_affine, train_opq

    x = _aniso_corpus(n=3000)
    d = x.shape[1]
    rot, books = train_opq(x, m=8, ksub=64, iters=6, opq_iters=3)
    w, b = adc_affine(d, "l2", None, books, 64)
    w2 = w.reshape(-1, d)
    q = np.random.default_rng(9).standard_normal((4, d)).astype(np.float32)
    luts_rotated_q = (q @ rot) @ w2.T + b.reshape(-1)[None, :]
    luts_folded_w = q @ (w2 @ rot.T).T + b.reshape(-1)[None, :]
    np.testing.assert_allclose(luts_rotated_q, luts_folded_w, atol=1e-3)
