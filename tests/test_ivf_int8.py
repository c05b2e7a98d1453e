"""int8-payload IVF engine (ops/ivf_int8.py): MXU bucket scan +
payload-resident rescore — the 100M-class one-chip serving tier."""

import numpy as np
import pytest

from leann_tpu.ops.distance import exact_topk
from leann_tpu.ops.ivf_int8 import IvfInt8Engine, pack_int8_buckets


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
def test_ivf8_recall(metric):
    x = clustered()
    eng = IvfInt8Engine(x, n_clusters=64, metric=metric, seed=0)
    rng = np.random.default_rng(1)
    q = x[rng.integers(0, len(x), 16)] + 0.05 * rng.standard_normal(
        (16, 32)).astype(np.float32)
    idx, sc = eng.search(q, k=10, nprobe=16, rescore_factor=8)
    _, oracle = exact_topk(q, x, 10, metric=metric)
    assert recall(idx, np.asarray(oracle)) >= 0.9
    # rescore dequantizes int8: score within the quantization error of
    # the exact value (per-row scale, ~0.4% relative)
    i0 = int(idx[0, 0])
    if metric == "l2":
        want = 2 * float(q[0] @ x[i0]) - float(x[i0] @ x[i0])
    else:
        want = float(q[0] @ x[i0])
    np.testing.assert_allclose(sc[0, 0], want, rtol=0.05, atol=0.5)


def test_ivf8_matches_bf16_ivf_ranking():
    from leann_tpu.ops.ivf import IvfEngine

    x = clustered(seed=2)
    rng = np.random.default_rng(3)
    q = x[rng.integers(0, len(x), 16)] + 0.05 * rng.standard_normal(
        (16, 32)).astype(np.float32)
    e16 = IvfEngine(x, n_clusters=64, metric="l2", seed=0)
    e8 = IvfInt8Engine(x, n_clusters=64, metric="l2", seed=0,
                       centers=e16.centers, assign=e16.assign)
    i16, _ = e16.search(q, k=10, nprobe=16)
    i8, _ = e8.search(q, k=10, nprobe=16)
    overlap = np.mean([
        len(set(a.tolist()) & set(b.tolist())) / 10
        for a, b in zip(np.asarray(i16), np.asarray(i8))
    ])
    assert overlap >= 0.9, overlap


def test_ivf8_pack_roundtrip():
    x = clustered(n=500, d=16, k=8, seed=4)
    from leann_tpu.ops.ivf import kmeans

    centers, assign = kmeans(x, 8, iters=4, metric="l2", seed=0)
    ids, cent, payload, scale, nsq = pack_int8_buckets(x, assign, centers)
    n = len(x)
    flat_ids = ids.reshape(-1)
    valid = flat_ids != n
    # every row packed exactly once
    assert np.sort(flat_ids[valid]).tolist() == list(range(n))
    # dequantized payload reconstructs rows within int8 error; the
    # payload is the RESIDUAL vs the bucket centroid, so add it back.
    # Residual scale spans the cluster radius, so the absolute error
    # is much tighter than raw-int8's corpus-radius quantization.
    cap = ids.shape[1]
    cent_of = cent[np.flatnonzero(valid) // cap]
    deq = cent_of + payload.reshape(-1, 16)[valid].astype(np.float32) \
        * scale.reshape(-1)[valid][:, None]
    np.testing.assert_allclose(deq, x[flat_ids[valid]], atol=0.06)
    # nsq is the exact f32 squared norm
    np.testing.assert_allclose(
        nsq.reshape(-1)[valid],
        np.einsum("nd,nd->n", x[flat_ids[valid]], x[flat_ids[valid]]),
        rtol=1e-5)


def test_ivf8_single_and_batched_agree():
    x = clustered(n=2000, d=32, k=16, seed=5)
    eng = IvfInt8Engine(x, n_clusters=16, metric="l2", seed=0)
    rng = np.random.default_rng(6)
    q = x[rng.integers(0, len(x), 8)].astype(np.float32)
    import jax.numpy as jnp

    ids_b, _ = eng.search(q, k=5, nprobe=8)
    ids_m, _ = eng.search_many_device(
        jnp.asarray(q[None, :, :]), k=5, nprobe=8)
    np.testing.assert_array_equal(np.asarray(ids_b),
                                  np.asarray(ids_m)[0])


def test_ivf8_calibrate_nprobe():
    x = clustered(n=4000, d=32, k=32, seed=7)
    eng = IvfInt8Engine(x, n_clusters=32, metric="l2", seed=0)
    nprobe, rec = eng.calibrate_nprobe(target_recall=0.9, sample=64)
    assert rec >= 0.9
    assert 1 <= nprobe <= 32
