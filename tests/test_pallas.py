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


def test_bucket_dots_kernel_matches_reference():
    import jax.numpy as jnp

    from leann_tpu.ops.pallas_kernels import ivf_bucket_dots

    rng = np.random.default_rng(0)
    K, cap, D, B, P = 8, 128, 128, 16, 3  # cap % 128 == 0, B % 8 == 0
    bucket_vecs = rng.standard_normal((K, cap, D)).astype(np.float32)
    queries = rng.standard_normal((B, D)).astype(np.float32)
    probe = rng.integers(0, K, (B, P)).astype(np.int32)

    got = np.asarray(ivf_bucket_dots(
        jnp.asarray(queries), jnp.asarray(probe),
        jnp.asarray(bucket_vecs).astype(jnp.bfloat16),
        interpret=True,
    ))                                                   # [P, B, cap]
    vb = np.asarray(jnp.asarray(bucket_vecs).astype(jnp.bfloat16).astype(jnp.float32))
    qb = np.asarray(jnp.asarray(queries).astype(jnp.bfloat16).astype(jnp.float32))
    for b in range(B):
        for p in range(P):
            expected = vb[probe[b, p]] @ qb[b]
            np.testing.assert_allclose(got[p, b], expected, rtol=2e-2, atol=2e-2)


@pytest.mark.parametrize("metric", ["l2", "ip"])
def test_ivf_search_pallas_matches_xla_path(metric):
    x = make_corpus(600, 128, seed=1)
    eng = IvfEngine(x, n_clusters=16, metric=metric, cap=64)
    queries = x[[7, 123, 456]] + 0.01

    idx_xla, _ = eng.search(queries, k=10, nprobe=8)
    idx_pal, scores_pal = eng.search_pallas(
        queries, k=10, nprobe=8, interpret=True
    )
    # both paths rescore in f32: candidate sets should agree
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


def test_ivf_rescore_restores_f32_ranking():
    """bf16-final scoring loses near-ties; the f32 rescore must agree
    with the exact oracle's ranking."""
    x = make_corpus(2000, 64, seed=2, clusters=16)
    eng = IvfEngine(x, n_clusters=16, metric="l2")
    q = x[[55, 999]] + 0.005
    idx, scores = eng.search(q, k=10, nprobe=16)
    s_oracle, i_oracle = exact_topk(q, x, 10, metric="l2")
    # rescored scores are true f32 scores
    for row in range(2):
        got = dict(zip(idx[row].tolist(), scores[row].tolist()))
        ref = dict(zip(i_oracle[row].tolist(), s_oracle[row].tolist()))
        common = set(got) & set(ref)
        assert len(common) >= 9
        for i in common:
            assert abs(got[i] - ref[i]) < 1e-2


def test_ivf8_pallas_scan_matches_xla(monkeypatch):
    """The DMA-pipelined ivf8 bucket scan (LEANN_IVF8_PALLAS=1) must
    return the same ids/scores as the XLA take-gather scan: same
    residual-int8 math, same probe set, same f32 rescore."""
    import jax.numpy as jnp

    from leann_tpu.ops.ivf_int8 import (
        IvfInt8Engine,
        _ivf8_search_pallas_jit,
    )

    x = make_corpus(3000, 64, seed=3, clusters=24)
    eng = IvfInt8Engine(x, n_clusters=24, metric="l2")
    q = x[[7, 1500, 2999]] + 0.01

    idx_xla, sc_xla = eng.search(q, k=10, nprobe=8, rescore_factor=4)

    qn = eng._norm_q(q)
    b = qn.shape[0]
    bb = 8
    while bb < b:
        bb *= 2
    qp = np.concatenate([qn, np.zeros((bb - b, eng.d), np.float32)])
    pay, sc, ns, ids_t, cent, cap_pad, d_pad = eng._pallas_tables()
    k_, c_ = 10, 40
    idx_pal, sc_pal = _ivf8_search_pallas_jit(
        jnp.asarray(qp), eng.bucket_cent, pay, sc, ns, ids_t, cent,
        k=k_, c=c_, nprobe=8, metric=eng.metric,
        cap_pad=cap_pad, d_pad=d_pad, interpret=True,
    )
    idx_pal = np.asarray(idx_pal)[:b]
    sc_pal = np.asarray(sc_pal)[:b]
    for a, p_row in zip(idx_xla, idx_pal):
        assert len(set(a.tolist()) & set(p_row.tolist())) >= 9
    np.testing.assert_allclose(sc_xla[:, 0], sc_pal[:, 0], rtol=1e-3)

    # chunked path (B > LEANN_IVF8_PALLAS_CHUNK): the probe table is a
    # scalar-prefetch SMEM operand and overflowed the 1MB budget at
    # B=2048 on hardware, so big batches ride lax.map over chunks —
    # must be bit-identical to the single-call path
    monkeypatch.setenv("LEANN_IVF8_PALLAS_CHUNK", "4")
    idx_ch, sc_ch = _ivf8_search_pallas_jit(
        jnp.asarray(qp), eng.bucket_cent, pay, sc, ns, ids_t, cent,
        k=k_, c=c_, nprobe=8, metric=eng.metric,
        cap_pad=cap_pad, d_pad=d_pad, interpret=True,
    )
    np.testing.assert_array_equal(
        np.asarray(idx_ch)[:b], idx_pal)
    np.testing.assert_allclose(
        np.asarray(sc_ch)[:b], sc_pal, rtol=1e-6)
