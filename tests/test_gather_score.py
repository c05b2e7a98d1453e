"""gather_score kernel: DMA row-gather + dot vs the XLA lowering."""

import numpy as np
import pytest

jax = pytest.importorskip("jax")
import jax.numpy as jnp  # noqa: E402

from leann_tpu.ops.gather_score import (  # noqa: E402
    gather_score, gather_score_xla)


@pytest.mark.parametrize("d,r", [(96, 48), (128, 48), (64, 128), (96, 7)])
def test_gather_score_matches_xla(d, r):
    rng = np.random.default_rng(0)
    n, b = 5000, 16
    corpus = rng.integers(-128, 128, (n, d)).astype(np.int8)
    ids = rng.integers(0, n, (b, r)).astype(np.int32)
    q = rng.standard_normal((b, d)).astype(np.float32)

    got = np.asarray(gather_score(
        jnp.asarray(corpus), jnp.asarray(ids), jnp.asarray(q),
        qb=4, interpret=True))
    want = np.asarray(gather_score_xla(
        jnp.asarray(corpus), jnp.asarray(ids), jnp.asarray(q)))
    # both paths do the bf16 dot; they must agree to bf16 tolerance
    np.testing.assert_allclose(got, want, rtol=2e-2, atol=2e-2)

    # and against the exact f32 reference
    exact = np.einsum("brd,bd->br", corpus[ids].astype(np.float32), q)
    rel = np.abs(got - exact) / (np.abs(exact).max() + 1e-9)
    assert rel.max() < 2e-2


def test_gather_score_duplicate_and_boundary_ids():
    rng = np.random.default_rng(1)
    n, b, d, r = 300, 8, 96, 48
    corpus = rng.integers(-128, 128, (n, d)).astype(np.int8)
    ids = np.zeros((b, r), np.int32)
    ids[:, 0] = n - 1
    ids[:, 1] = 0
    ids[:, 2:] = rng.integers(0, n, (b, r - 2))
    ids[3, :] = 7                                    # all-duplicate row
    q = rng.standard_normal((b, d)).astype(np.float32)
    got = np.asarray(gather_score(
        jnp.asarray(corpus), jnp.asarray(ids), jnp.asarray(q),
        qb=4, interpret=True))
    exact = np.einsum("brd,bd->br", corpus[ids].astype(np.float32), q)
    np.testing.assert_allclose(
        got, exact, rtol=2e-2, atol=np.abs(exact).max() * 2e-2)


def test_gather_score_validates_shapes():
    c = jnp.zeros((10, 96), jnp.int8)
    q = jnp.zeros((8, 96), jnp.float32)
    with pytest.raises(ValueError):
        gather_score(c, jnp.zeros((8, 129), jnp.int32), q)
    with pytest.raises(ValueError):
        gather_score(c, jnp.zeros((6, 48), jnp.int32),
                     jnp.zeros((6, 96), jnp.float32), qb=4)
