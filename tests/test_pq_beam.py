"""PQ fused traversal kernel: correctness in interpret mode (CPU).

The PQ kernel navigates with ADC scores and exactly rescores
beam + visited — so recall floors here are the same contract as the
shipping path. d=96 cases prove the D % 128 == 0 restriction of the
int8 inline kernel does not apply (queries only enter via LUTs).
"""

import numpy as np
import pytest

from leann_tpu.ops.distance import exact_topk
from leann_tpu.ops.pq_beam import (
    PqBeamEngine,
    pack_pq_records,
    pq_layout,
)
from leann_tpu.ops.vamana import build_vamana


def _corpus(n, d, seed=0, clusters=24):
    rng = np.random.default_rng(seed)
    centers = rng.standard_normal((clusters, d)).astype(np.float32) * 4.0
    return (centers[rng.integers(0, clusters, n)]
            + rng.standard_normal((n, d)).astype(np.float32))


def test_pq_layout():
    # R=48, m=16, 4-bit: lps=6, plane 0 tail fits 13 subspaces after
    # the 48 id lanes, 3 overflow to plane 1 -> 2 planes total
    cpl, lps, slots, cp = pq_layout(48, 16, 4)
    assert (cpl, lps, cp) == (8, 6, 2)
    assert slots[0] == (0, 48) and slots[12] == (0, 48 + 12 * 6)
    assert slots[13] == (1, 0)
    # the DEEP-10M config: R=48, m=16, 8-bit -> exactly 2 planes
    # (1KB/node: 10.2GB at 10M)
    cpl, lps, slots, cp = pq_layout(48, 16, 8)
    assert (cpl, lps, cp) == (4, 12, 2)
    assert slots[5] == (0, 48 + 5 * 12) and slots[6] == (1, 0)
    assert slots[15] == (1, 9 * 12)
    # no subspace crosses a plane boundary, ever
    for r, m, bits in [(48, 16, 8), (128, 16, 4), (32, 24, 8), (16, 8, 4)]:
        cpl, lps, slots, cp = pq_layout(r, m, bits)
        for p, off in slots:
            assert off + lps <= 128 and p < cp


def test_pack_pq_records_layout():
    import jax.numpy as jnp

    n, r, m = 40, 8, 4
    rng = np.random.default_rng(1)
    adj = rng.integers(0, n, (n + 1, r)).astype(np.int32)
    adj[n] = n
    codes = rng.integers(0, 16, (n + 1, m)).astype(np.uint8)
    codes[n] = 0
    rec = np.asarray(pack_pq_records(jnp.asarray(adj), jnp.asarray(codes), 4))
    cpl, lps, slots, cp = pq_layout(r, m, 4)
    assert rec.shape == (n + 1, cp, 128)
    # plane 0: first r lanes = adjacency ids
    np.testing.assert_array_equal(rec[:, 0, :r], adj)
    # subspace j, neighbor i -> plane/offset per pq_layout, nibble i%cpl
    for node in (0, 7, n):
        for j in range(m):
            pj, off = slots[j]
            for i in range(r):
                word = rec[node, pj, off + i // cpl]
                nib = (word >> (4 * (i % cpl))) & 0xF
                assert nib == codes[adj[node, i], j], (node, j, i)


@pytest.mark.parametrize("metric,d", [("l2", 128), ("ip", 128), ("l2", 96)])
def test_pq_engine_recall_interpret(metric, d):
    # Bar calibration: navigating on reconstructed x_hat with the XLA
    # engine + exact rescore of a same-size candidate pool (the
    # numerical equivalent of a *correct* ADC kernel) measures 0.63
    # recall@10 for m=16/ksub=16 on this corpus — the 4-bit ADC
    # resolution ceiling, not a kernel property. The bar asserts the
    # kernel is at that ceiling; shipping quality comes from 8-bit
    # codes (ksub=256, test below).
    n, r = 1500, 16
    vecs = _corpus(n, d)
    adj, medoid = build_vamana(
        vecs, graph_degree=r, complexity=32, metric=metric, wave_size=512
    )
    eng = PqBeamEngine(
        vecs, adj, medoid, metric=metric, m=16, ksub=16, qb=8,
        ring_size=256, visited_pool=128, interpret=True,
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
    assert recall >= 0.5, recall
    # exact-rescored scores: descending and consistent with direct calc
    assert (np.diff(sc, axis=1) <= 1e-4).all()
    i0 = idx[0, 0]
    if metric == "l2":
        want = 2 * float(q[0] @ vecs[i0]) - float(vecs[i0] @ vecs[i0])
    else:
        want = float(q[0] @ vecs[i0])
    np.testing.assert_allclose(sc[0, 0], want, rtol=1e-4)


@pytest.mark.parametrize(
    "metric,d,m", [("l2", 64, 8), ("l2", 128, 16), ("ip", 96, 8)]
)
def test_pq_engine_8bit_interpret(metric, d, m):
    """ksub=256 (the shipping resolution) takes the wide 3D-one-hot
    path; quality bar 0.8 holds across metrics and non-128 dims."""
    n, r = 1000, 16
    vecs = _corpus(n, d)
    adj, medoid = build_vamana(
        vecs, graph_degree=r, complexity=32, metric=metric, wave_size=512
    )
    eng = PqBeamEngine(
        vecs, adj, medoid, metric=metric, m=m, ksub=256, qb=8,
        ring_size=256, visited_pool=128, interpret=True,
    )
    rng = np.random.default_rng(2)
    q = vecs[rng.integers(0, n, 8)] + rng.standard_normal((8, d)).astype(
        np.float32) * 0.05
    idx, _ = eng.search(q, k=10, beam_width=32)
    _, oracle = exact_topk(q, vecs, 10, metric=metric)
    recall = np.mean([
        len(set(idx[i].tolist()) & set(oracle[i].tolist())) / 10
        for i in range(8)
    ])
    assert recall >= 0.8, recall


def test_pq_engine_deep_geometry_interpret():
    """The DEEP-10M record geometry end-to-end: R=48, m=16, ksub=256,
    d=96 — subspace words tail-packed into plane 0 AND overflowing to
    plane 1 (cp=2). Exercises the multi-plane slot slicing in-kernel."""
    _, _, slots, cp = pq_layout(48, 16, 8)
    assert cp == 2 and slots[5][0] == 0 and slots[6][0] == 1
    n, d, r = 1200, 96, 48
    vecs = _corpus(n, d)
    adj, medoid = build_vamana(
        vecs, graph_degree=r, complexity=48, metric="l2", wave_size=512
    )
    eng = PqBeamEngine(
        vecs, adj, medoid, metric="l2", m=16, ksub=256, qb=8,
        ring_size=256, visited_pool=128, interpret=True,
    )
    assert eng.records.shape == (n + 1, 2, 128)
    rng = np.random.default_rng(5)
    q = vecs[rng.integers(0, n, 8)] + rng.standard_normal((8, d)).astype(
        np.float32) * 0.05
    idx, _ = eng.search(q, k=10, beam_width=32)
    _, oracle = exact_topk(q, vecs, 10, metric="l2")
    recall = np.mean([
        len(set(idx[i].tolist()) & set(oracle[i].tolist())) / 10
        for i in range(8)
    ])
    assert recall >= 0.8, recall


def test_graph_searcher_pq_engine_and_sidecar(tmp_path, monkeypatch):
    """LEANN_GRAPH_ENGINE=pq routes GraphSearcher to the PQ fused
    engine; codebooks/codes persist to <base>.pq.npz and reload without
    retraining; a rebuild invalidates the sidecar."""
    import os

    from leann_tpu.backend import load_searcher
    from leann_tpu.index.builder import IndexBuilder
    from leann_tpu.ops.pq_beam import PqBeamEngine
    from leann_tpu.store import pqfile
    from leann_tpu.store.meta import IndexMeta, meta_path

    monkeypatch.setenv("LEANN_GRAPH_ENGINE", "pq")
    base = str(tmp_path / "documents.leann")
    rng = np.random.default_rng(7)
    n, d = 300, 32
    vecs = rng.standard_normal((n, d)).astype(np.float32)
    builder = IndexBuilder(base, dim=d, backend="vamana")
    for i in range(n):
        builder.add(f"p{i}", f"passage {i}", vecs[i], {"n": i})
    builder.build()
    meta = IndexMeta.load(meta_path(base))

    s1 = load_searcher(base, meta)
    assert isinstance(s1.engine, PqBeamEngine)
    assert os.path.exists(pqfile.pq_path(base))
    idx, _ = s1.search(vecs[5:6], k=3, complexity=32)
    assert 5 in idx[0]

    # reload must reuse the sidecar: poison train_pq
    import leann_tpu.ops.pq_beam as pqb

    def boom(*a, **k):  # pragma: no cover
        raise AssertionError("PQ retrained despite persisted sidecar")

    monkeypatch.setattr(pqb, "train_pq", boom)
    s2 = load_searcher(base, meta)
    idx2, _ = s2.search(vecs[5:6], k=3, complexity=32)
    np.testing.assert_array_equal(idx, idx2)

    # rebuild at the same base invalidates the sidecar
    builder = IndexBuilder(base, dim=d, backend="vamana")
    for i in range(50):
        builder.add(f"q{i}", f"new passage {i}", vecs[i], {"n": i})
    builder.build()
    assert not os.path.exists(pqfile.pq_path(base))


def test_pq_engine_opq_residual_combined_interpret():
    """Rotation + residual (coarse-PQ) composed: codes in the rotated
    frame, residual books trained on rotated data, rotation folded into
    the affine LUT — the best measured 16B/node variant (RESULTS_r3)."""
    from leann_tpu.ops.pq import train_opq

    rng = np.random.default_rng(23)
    n, d, r = 1200, 96, 32
    basis, _ = np.linalg.qr(rng.standard_normal((d, 12)))
    centers = 4.0 * rng.standard_normal((24, 12)).astype(np.float32)
    lat = (centers[rng.integers(0, 24, n)]
           + rng.standard_normal((n, 12)).astype(np.float32))
    vecs = (lat @ basis.T.astype(np.float32)
            + 0.05 * rng.standard_normal((n, d)).astype(np.float32))
    vecs = np.ascontiguousarray(vecs, np.float32)
    adj, medoid = build_vamana(
        vecs, graph_degree=r, complexity=48, metric="l2", wave_size=512)
    rot, _ = train_opq(vecs, m=8, ksub=64, iters=6, opq_iters=3)
    eng = PqBeamEngine(
        vecs, adj, medoid, metric="l2", m=12, ksub=256, qb=8,
        ring_size=256, visited_pool=128, interpret=True,
        coarse_m=2, rotation=rot,
    )
    q = vecs[rng.integers(0, n, 8)] + 0.02 * rng.standard_normal(
        (8, d)).astype(np.float32)
    idx, sc = eng.search(q, k=10, beam_width=32)
    _, oracle = exact_topk(q, vecs, 10, metric="l2")
    recall = np.mean([
        len(set(idx[i].tolist()) & set(oracle[i].tolist())) / 10
        for i in range(8)
    ])
    assert recall >= 0.8, recall
    i0 = idx[0, 0]
    want = 2 * float(q[0] @ vecs[i0]) - float(vecs[i0] @ vecs[i0])
    np.testing.assert_allclose(sc[0, 0], want, rtol=1e-4)


def test_graph_searcher_opq_knob_and_sidecar_frames(tmp_path, monkeypatch):
    """LEANN_PQ_OPQ=1 routes through train_opq, persists the rotation
    in the sidecar, and a cache written in one frame is stale for the
    other (rotated-frame codes must never feed unrotated LUTs)."""
    import os

    from leann_tpu.backend import load_searcher
    from leann_tpu.index.builder import IndexBuilder
    from leann_tpu.store import pqfile
    from leann_tpu.store.meta import IndexMeta, meta_path

    monkeypatch.setenv("LEANN_GRAPH_ENGINE", "pq")
    monkeypatch.setenv("LEANN_PQ_OPQ", "1")
    base = str(tmp_path / "documents.leann")
    rng = np.random.default_rng(17)
    n, d = 300, 32
    vecs = rng.standard_normal((n, d)).astype(np.float32)
    builder = IndexBuilder(base, dim=d, backend="vamana")
    for i in range(n):
        builder.add(f"p{i}", f"passage {i}", vecs[i], {"n": i})
    builder.build()
    meta = IndexMeta.load(meta_path(base))

    s1 = load_searcher(base, meta)
    assert s1.engine.rotation is not None
    idx, _ = s1.search(vecs[5:6], k=3, complexity=32)
    assert 5 in idx[0]
    z = np.load(pqfile.pq_path(base))
    assert "rot" in z.files

    # the rotated-frame cache is STALE for a non-OPQ engine...
    assert pqfile.load_pq(base, n, meta.metric, want_rot=False) is None
    # ...and valid for the OPQ engine
    art = pqfile.load_pq(base, n, meta.metric, want_rot=True)
    assert art is not None and art[2] is not None

    # reload reuses it (search results identical, no retrain)
    s2 = load_searcher(base, meta)
    idx2, _ = s2.search(vecs[5:6], k=3, complexity=32)
    np.testing.assert_array_equal(idx, idx2)


def test_pq_search_many_device_matches_single_interpret():
    import jax.numpy as jnp

    n, d, r = 800, 64, 16
    vecs = _corpus(n, d)
    adj, medoid = build_vamana(
        vecs, graph_degree=r, complexity=32, metric="l2", wave_size=512
    )
    eng = PqBeamEngine(
        vecs, adj, medoid, metric="l2", m=16, ksub=16, qb=8,
        ring_size=256, visited_pool=128, interpret=True,
    )
    rng = np.random.default_rng(3)
    qs = vecs[rng.integers(0, n, (2, 8))] + rng.standard_normal(
        (2, 8, d)).astype(np.float32) * 0.05
    ids_m, sc_m = eng.search_many_device(jnp.asarray(qs), k=10, beam_width=32)
    assert np.asarray(ids_m).shape == (2, 8, 10)
    for mm in range(2):
        ids_1, sc_1 = eng.search_device(qs[mm], k=10, beam_width=32)
        np.testing.assert_array_equal(np.asarray(ids_m[mm]), np.asarray(ids_1))
        np.testing.assert_allclose(
            np.asarray(sc_m[mm]), np.asarray(sc_1), rtol=1e-5, atol=1e-5
        )


def test_int8_rescore_mode_matches_f32():
    """The int8 rescore fallback (OOM insurance at 10M) must rank nearly
    identically to f32 rescore: navigation is ADC either way, and the
    row-quantized dequant only perturbs the final ordering slightly."""
    import numpy as np
    from leann_tpu.ops.pq_beam import PqBeamEngine
    from leann_tpu.ops.vamana import build_vamana

    rng = np.random.default_rng(11)
    n, d = 3000, 32
    centers = rng.standard_normal((30, d)).astype(np.float32) * 3
    x = (centers[rng.integers(0, 30, n)]
         + rng.standard_normal((n, d)).astype(np.float32))
    adj, med = build_vamana(x, graph_degree=16, complexity=24,
                            metric="l2", wave_size=512)
    q = x[:32] + 0.1 * rng.standard_normal((32, d)).astype(np.float32)

    kw = dict(metric="l2", m=8, ksub=32, qb=16, visited_pool=128,
              interpret=True)
    e32 = PqBeamEngine(x, adj, med, rescore="f32", **kw)
    e8 = PqBeamEngine(x, adj, med, rescore="int8",
                      codebooks=e32.codebooks, codes=np.asarray(e32.codes),
                      **kw)
    i32, _ = e32.search(q, k=10, beam_width=32)
    i8, _ = e8.search(q, k=10, beam_width=32)
    overlap = np.mean([
        len(set(a.tolist()) & set(b.tolist())) / 10
        for a, b in zip(i32, i8)
    ])
    assert overlap >= 0.9


def test_residual_pq_affine_identity():
    """The affine LUT operands must reproduce the ADC contract exactly:
    summing LUT rows over a node's code columns == 2<q, x_hat> -
    |x_hat|^2_quantized (l2) / <q, x_hat> (ip)."""
    from leann_tpu.ops.pq import (
        adc_affine, encode_residual_pq, quantize_norms,
        reconstruct_residual_pq, train_residual_pq,
    )

    rng = np.random.default_rng(0)
    n, d, mc, mf, ksub = 2000, 64, 2, 8, 256
    x = _corpus(n, d, clusters=40)
    books_c, books_f = train_residual_pq(x, mc=mc, mf=mf, ksub=ksub, iters=6)
    codes, nsq = encode_residual_pq(x, books_c, books_f)
    xh = reconstruct_residual_pq(codes, books_c, books_f)
    np.testing.assert_allclose(
        nsq, np.einsum("nd,nd->n", xh, xh), rtol=1e-4)

    nq, off, scale = quantize_norms(nsq)
    nsq_q = off + (nq[:, 0].astype(np.float64) * 256 + nq[:, 1]) * scale
    # quantization bound + f32 representation error of nsq itself
    assert np.abs(nsq_q - nsq).max() <= scale * 0.5 + np.abs(nsq).max() * 1e-5

    q = rng.standard_normal((4, d)).astype(np.float32)
    for metric in ("l2", "ip"):
        w, b = adc_affine(d, metric, books_c, books_f, ksub, off, scale)
        mt = mc + mf + (2 if metric == "l2" else 0)
        assert w.shape == (mt, ksub, d) and b.shape == (mt, ksub)
        luts = np.einsum("bd,jkd->bjk", q, w) + b[None]
        full = np.concatenate([codes, nq], axis=1) if metric == "l2" else codes
        got = luts[
            :, np.arange(mt)[None, :], full[:16].astype(np.int64)
        ].sum(axis=2)                                        # [4, 16]
        if metric == "l2":
            want = 2.0 * q @ xh[:16].T - nsq_q[None, :16]
        else:
            want = q @ xh[:16].T
        np.testing.assert_allclose(got, want, rtol=2e-3, atol=2e-3)


def test_residual_beats_plain_pq_recon():
    """On clustered data the residual encoder's reconstruction error
    must be well below single-level PQ at the same fine m (the coarse
    level removes the cluster-center energy the flat codebooks waste
    capacity on)."""
    from leann_tpu.ops.pq import (
        encode_pq, encode_residual_pq, reconstruct_pq,
        reconstruct_residual_pq, train_pq, train_residual_pq,
    )

    x = _corpus(4000, 64, clusters=200)
    books = train_pq(x, m=8, ksub=256, iters=6)
    xp = reconstruct_pq(encode_pq(x, books), books)
    books_c, books_f = train_residual_pq(x, mc=2, mf=8, ksub=256, iters=6)
    codes, _ = encode_residual_pq(x, books_c, books_f)
    xr = reconstruct_residual_pq(codes, books_c, books_f)
    err_plain = np.linalg.norm(x - xp) / np.linalg.norm(x)
    err_res = np.linalg.norm(x - xr) / np.linalg.norm(x)
    assert err_res < err_plain * 0.8, (err_res, err_plain)


@pytest.mark.parametrize("metric", ["l2", "ip"])
def test_pq_engine_residual_interpret(metric):
    """Residual (two-level) mode end-to-end through the UNCHANGED
    kernel, at the DEEP-10M record geometry: d=96, R=48, mc=2 + mf=12
    (+2 norm columns for l2) -> mt=16 -> cp=2 planes, 1KB/node."""
    n, d, r = 1200, 96, 48
    vecs = _corpus(n, d)
    adj, medoid = build_vamana(
        vecs, graph_degree=r, complexity=48, metric=metric, wave_size=512
    )
    eng = PqBeamEngine(
        vecs, adj, medoid, metric=metric, m=12, coarse_m=2, ksub=256,
        qb=8, ring_size=256, visited_pool=128, interpret=True,
    )
    assert eng.mt == (16 if metric == "l2" else 14)
    if metric == "l2":
        assert eng.records.shape == (n + 1, 2, 128)
    rng = np.random.default_rng(5)
    q = vecs[rng.integers(0, n, 8)] + rng.standard_normal((8, d)).astype(
        np.float32) * 0.05
    idx, sc = eng.search(q, k=10, beam_width=32)
    _, oracle = exact_topk(q, vecs, 10, metric=metric)
    recall = np.mean([
        len(set(idx[i].tolist()) & set(oracle[i].tolist())) / 10
        for i in range(8)
    ])
    assert recall >= 0.8, recall
    # rescored scores are exact
    i0 = idx[0, 0]
    if metric == "l2":
        want = 2 * float(q[0] @ vecs[i0]) - float(vecs[i0] @ vecs[i0])
    else:
        want = float(q[0] @ vecs[i0])
    np.testing.assert_allclose(sc[0, 0], want, rtol=1e-4)


def test_pq_engine_opq_rotation_interpret():
    """OPQ end-to-end: rotated-frame codes, rotation folded into the
    affine LUT, UNCHANGED kernel, exact rescore in the original frame."""
    from leann_tpu.ops.pq import train_opq

    rng = np.random.default_rng(11)
    n, d, r = 1200, 64, 32
    basis, _ = np.linalg.qr(rng.standard_normal((d, 12)))
    centers = 4.0 * rng.standard_normal((24, 12)).astype(np.float32)
    lat = (centers[rng.integers(0, 24, n)]
           + rng.standard_normal((n, 12)).astype(np.float32))
    vecs = (lat @ basis.T.astype(np.float32)
            + 0.05 * rng.standard_normal((n, d)).astype(np.float32))
    vecs = np.ascontiguousarray(vecs, np.float32)
    adj, medoid = build_vamana(
        vecs, graph_degree=r, complexity=48, metric="l2", wave_size=512)
    rot, books = train_opq(vecs, m=8, ksub=256, iters=8, opq_iters=4)
    eng = PqBeamEngine(
        vecs, adj, medoid, metric="l2", m=8, ksub=256, qb=8,
        ring_size=256, visited_pool=128, interpret=True,
        codebooks=books, rotation=rot,
    )
    q = vecs[rng.integers(0, n, 8)] + 0.02 * rng.standard_normal(
        (8, d)).astype(np.float32)
    idx, sc = eng.search(q, k=10, beam_width=32)
    _, oracle = exact_topk(q, vecs, 10, metric="l2")
    recall = np.mean([
        len(set(idx[i].tolist()) & set(oracle[i].tolist())) / 10
        for i in range(8)
    ])
    assert recall >= 0.8, recall
    i0 = idx[0, 0]
    want = 2 * float(q[0] @ vecs[i0]) - float(vecs[i0] @ vecs[i0])
    np.testing.assert_allclose(sc[0, 0], want, rtol=1e-4)
