"""Pallas kernel correctness (interpret mode on CPU; the compiled path
is exercised on real TPU hardware by bench/eval runs)."""

import numpy as np
import pytest

from leann_tpu.ops.distance import exact_topk
from leann_tpu.ops.ivf import IvfEngine


def make_corpus(n, d, seed=0, clusters=32):
    rng = np.random.default_rng(seed)
    centers = rng.standard_normal((clusters, d)).astype(np.float32) * 4
    assign = rng.integers(0, clusters, n)
    return (centers[assign] + rng.standard_normal((n, d)).astype(np.float32)).astype(np.float32)


def test_bucket_scores_kernel_matches_reference():
    import jax.numpy as jnp

    from leann_tpu.ops.pallas_kernels import ivf_bucket_scores

    rng = np.random.default_rng(0)
    K, cap, D, B, P = 8, 16, 128, 4, 3
    bucket_vecs = rng.standard_normal((K, cap, D)).astype(np.float32)
    queries = rng.standard_normal((B, D)).astype(np.float32)
    probe = rng.integers(0, K, (B, P)).astype(np.int32)
    sq = (bucket_vecs ** 2).sum(axis=2).astype(np.float32)

    got = np.asarray(ivf_bucket_scores(
        jnp.asarray(queries), jnp.asarray(probe),
        jnp.asarray(bucket_vecs).astype(jnp.bfloat16), jnp.asarray(sq),
        metric="l2", interpret=True,
    ))
    # reference in numpy (bf16-rounded vectors, f32 math)
    vb = np.asarray(jnp.asarray(bucket_vecs).astype(jnp.bfloat16).astype(jnp.float32))
    qb = np.asarray(jnp.asarray(queries).astype(jnp.bfloat16).astype(jnp.float32))
    for b in range(B):
        for p in range(P):
            dots = vb[probe[b, p]] @ qb[b]
            expected = 2 * dots - sq[probe[b, p]]
            np.testing.assert_allclose(got[b, p], expected, rtol=2e-2, atol=2e-2)


@pytest.mark.parametrize("metric", ["l2", "ip"])
def test_ivf_search_pallas_matches_xla_path(metric):
    x = make_corpus(600, 128, seed=1)
    eng = IvfEngine(x, n_clusters=16, metric=metric, cap=64)
    queries = x[[7, 123, 456]] + 0.01

    idx_xla, _ = eng.search(queries, k=10, nprobe=8)
    idx_pal, scores_pal = eng.search_pallas(
        queries, k=10, nprobe=8, interpret=True
    )
    # same candidates (bf16 both sides; ordering ties may differ)
    for a, b in zip(idx_xla, idx_pal):
        assert len(set(a.tolist()) & set(b.tolist())) >= 9
    # recall vs oracle
    _, oracle = exact_topk(queries, x, 10, metric=metric)
    rec = np.mean([
        len(set(a.tolist()) & set(o.tolist())) / 10
        for a, o in zip(idx_pal, oracle)
    ])
    assert rec >= 0.9
    assert (np.diff(scores_pal, axis=1) <= 1e-4).all()
