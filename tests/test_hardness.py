"""The hardness-sweep corpus generator (evals/corpus_cache.py).

Claims in RESULTS_* rest on recall measured across these distributions;
the generator itself must be deterministic and its knobs must actually
produce the property they promise (overlap, heavy tails, anisotropy).
"""

import os
import sys

import numpy as np
import pytest

sys.path.insert(0, os.path.join(
    os.path.dirname(os.path.dirname(os.path.abspath(__file__))), "evals"))

from corpus_cache import make_corpus, make_corpus_hard  # noqa: E402


def test_hard_default_matches_friendly_shape():
    a = make_corpus_hard(np.random.default_rng(0), 500, 32, clusters=16)
    assert a.shape == (500, 32)
    assert a.dtype == np.float32
    b = make_corpus_hard(np.random.default_rng(0), 500, 32, clusters=16)
    np.testing.assert_array_equal(a, b)  # deterministic


def test_default_kwargs_reproduce_bench_corpus():
    # make_corpus_hard with default knobs must draw the SAME stream as
    # make_corpus (so "friendly" in the sweep IS the bench corpus)
    a = make_corpus(np.random.default_rng(7), 300, 16, clusters=8)
    b = make_corpus_hard(np.random.default_rng(7), 300, 16, clusters=8)
    np.testing.assert_array_equal(a, b)


def test_center_scale_controls_overlap():
    # between-cluster variance shrinks with center_scale; at 0 the
    # corpus is a single gaussian blob
    rng = np.random.default_rng(1)
    wide = make_corpus_hard(rng, 2000, 16, clusters=8, center_scale=4.0)
    rng = np.random.default_rng(1)
    tight = make_corpus_hard(rng, 2000, 16, clusters=8, center_scale=0.5)
    assert wide.var() > 4 * tight.var()
    rng = np.random.default_rng(1)
    blob = make_corpus_hard(rng, 2000, 16, clusters=1, center_scale=0.0)
    assert abs(blob.mean()) < 0.1 and abs(blob.var() - 1.0) < 0.1


def test_zipf_gives_heavy_tailed_cluster_masses():
    rng = np.random.default_rng(2)
    x = make_corpus_hard(rng, 5000, 8, clusters=64, zipf=1.5)
    assert x.shape == (5000, 8)
    # regenerate the assignment the same way the generator does
    rng = np.random.default_rng(2)
    _ = rng.standard_normal((64, 8)).astype(np.float32)
    mass = np.arange(1, 65, dtype=np.float64) ** -1.5
    mass /= mass.sum()
    assign = rng.choice(64, size=5000, p=mass)
    counts = np.bincount(assign, minlength=64)
    # top cluster holds >20% of the corpus; the tail is near-empty
    assert counts.max() > 1000
    assert (counts < 20).sum() > 10


def test_anisotropy_spreads_per_dimension_variance():
    rng = np.random.default_rng(3)
    iso = make_corpus_hard(rng, 4000, 8, clusters=1, center_scale=0.0)
    rng = np.random.default_rng(3)
    aniso = make_corpus_hard(
        rng, 4000, 8, clusters=1, center_scale=0.0, anisotropy=1.0)
    # per-dimension stds: isotropic ~flat, anisotropic ~lognormal spread
    iso_spread = iso.std(axis=0).max() / iso.std(axis=0).min()
    aniso_spread = aniso.std(axis=0).max() / aniso.std(axis=0).min()
    assert iso_spread < 1.2
    assert aniso_spread > 1.5


@pytest.mark.parametrize("name", ["overlap1", "gaussian"])
def test_sweep_configs_are_harder_than_friendly_for_ivf(name):
    """End-to-end miniature of the sweep: IVF recall on a hard config
    must not silently exceed the friendly config (the whole point of
    the sweep is that friendliness is measurable)."""
    from hardness_sweep import CONFIGS

    from leann_tpu.ops.distance import exact_topk
    from leann_tpu.ops.ivf import IvfEngine

    n, d, q, k = 4000, 16, 64, 10

    def recall(kw):
        rng = np.random.default_rng(0)
        pool = make_corpus_hard(rng, n + q, d, **kw)
        corpus, rq = pool[:n], pool[n:]
        _, oracle = exact_topk(rq, corpus, k, metric="l2")
        eng = IvfEngine(corpus, n_clusters=64, metric="l2")
        ids, _ = eng.search(rq, k=k, nprobe=4)
        oracle = np.asarray(oracle)
        return float(np.mean([
            len(set(np.asarray(ids)[i].tolist()) & set(oracle[i].tolist()))
            / k
            for i in range(q)
        ]))

    friendly = recall(CONFIGS["friendly"])
    hard = recall(CONFIGS[name])
    assert friendly >= hard - 0.02, (friendly, hard)
