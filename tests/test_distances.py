"""Distance-layer tests: device batched ops vs the numpy oracle, and the
numpy oracle vs hand-computed values with the reference's exact formulas
(src/distance/*.rs)."""

import jax.numpy as jnp
import numpy as np
import pytest

from hannoy_tpu.ops import codecs, distances
from hannoy_tpu.ops.distances import (
    ALL_METRICS,
    BQ_COSINE,
    BQ_EUCLIDEAN,
    BQ_MANHATTAN,
    COSINE,
    EUCLIDEAN,
    HAMMING,
    MANHATTAN,
)


def _prep(metric, raw):
    packed = codecs.pack(raw, metric.codec)
    norms = distances.np_norms(metric, packed)
    return packed, norms


def test_cosine_known_values():
    a = np.array([[1.0, 0.0], [0.0, 1.0], [1.0, 1.0]], dtype=np.float32)
    p, n = _prep(COSINE, a)
    d = distances.np_pairwise(COSINE, p, n, p, n)
    assert d[0, 0] == pytest.approx(0.0, abs=1e-6)
    assert d[0, 1] == pytest.approx(0.5, abs=1e-6)  # orthogonal → 0.5
    assert d[0, 2] == pytest.approx((1 - np.sqrt(0.5)) / 2, abs=1e-6)


def test_cosine_zero_vector_is_distance_zero():
    """pn*qn <= eps → 0.0 (reference cosine.rs:49-55)."""
    a = np.array([[0.0, 0.0], [1.0, 0.0]], dtype=np.float32)
    p, n = _prep(COSINE, a)
    d = distances.np_pairwise(COSINE, p, n, p, n)
    assert d[0, 1] == 0.0


def test_euclidean_is_squared():
    a = np.array([[0.0, 0.0], [3.0, 4.0]], dtype=np.float32)
    p, n = _prep(EUCLIDEAN, a)
    d = distances.np_pairwise(EUCLIDEAN, p, n, p, n)
    assert d[0, 1] == pytest.approx(25.0)  # not 5.0 — no sqrt (simple.rs:49-51)


def test_manhattan_known():
    a = np.array([[0.0, 0.0], [3.0, -4.0]], dtype=np.float32)
    p, n = _prep(MANHATTAN, a)
    assert distances.np_pairwise(MANHATTAN, p, n, p, n)[0, 1] == pytest.approx(7.0)


def test_hamming_normalised_by_padded_bits():
    a = np.zeros((2, 100), dtype=np.float32)
    a[1, :10] = 1.0
    p, n = _prep(HAMMING, a)
    d = distances.np_pairwise(HAMMING, p, n, p, n)
    # 10 differing bits / 128 padded bits (dims pad to multiple of 64)
    assert d[0, 1] == pytest.approx(10 / 128)


def test_bq_formulas():
    a = np.array([[1.0] * 64, [-1.0] * 64], dtype=np.float32)
    for metric, expect in ((BQ_EUCLIDEAN, 4.0 * 64), (BQ_MANHATTAN, 2.0 * 64)):
        p, n = _prep(metric, a)
        d = distances.np_pairwise(metric, p, n, p, n)
        assert d[0, 1] == pytest.approx(expect)
        assert d[0, 0] == 0.0


def test_bq_cosine_opposite_is_one():
    a = np.array([[1.0] * 64, [-1.0] * 64], dtype=np.float32)
    p, n = _prep(BQ_COSINE, a)
    d = distances.np_pairwise(BQ_COSINE, p, n, p, n)
    assert d[0, 0] == pytest.approx(0.0)
    assert d[0, 1] == pytest.approx(1.0)


@pytest.mark.parametrize("metric", ALL_METRICS, ids=lambda m: m.name)
def test_device_matrix_matches_numpy(rng, metric):
    q_raw = rng.standard_normal((4, 100)).astype(np.float32)
    db_raw = rng.standard_normal((37, 100)).astype(np.float32)
    qp, qn = _prep(metric, q_raw)
    dp, dn = _prep(metric, db_raw)
    want = distances.np_pairwise(metric, qp, qn, dp, dn)
    got = np.asarray(
        distances.matrix_distances(metric, jnp.asarray(qp), jnp.asarray(qn), jnp.asarray(dp), jnp.asarray(dn))
    )
    tol = 2e-3 if metric.name == "euclidean" else 1e-5  # norm-trick path
    np.testing.assert_allclose(got, want, rtol=tol, atol=tol * max(1.0, np.abs(want).max()))


@pytest.mark.parametrize("metric", ALL_METRICS, ids=lambda m: m.name)
def test_device_gathered_matches_numpy(rng, metric):
    B, K, D = 3, 7, 65
    q_raw = rng.standard_normal((B, D)).astype(np.float32)
    c_raw = rng.standard_normal((B * K, D)).astype(np.float32)
    qp, qn = _prep(metric, q_raw)
    cp, cn = _prep(metric, c_raw)
    want = np.stack(
        [
            distances.np_pairwise(metric, qp[b : b + 1], qn[b : b + 1], cp[b * K : (b + 1) * K], cn[b * K : (b + 1) * K])[0]
            for b in range(B)
        ]
    )
    got = np.asarray(
        distances.gathered_distances(
            metric,
            jnp.asarray(qp),
            jnp.asarray(qn),
            jnp.asarray(cp.reshape(B, K, -1)),
            jnp.asarray(cn.reshape(B, K)),
        )
    )
    np.testing.assert_allclose(got, want, rtol=1e-5, atol=1e-5)


def test_bq_cosine_norm_is_sqrt_padded_dim(rng):
    x = rng.standard_normal((3, 100)).astype(np.float32)
    p = codecs.pack(x, codecs.BQ)
    n = distances.np_norms(BQ_COSINE, p)
    np.testing.assert_allclose(n, np.sqrt(128.0))


@pytest.mark.parametrize(
    "metric", [HAMMING, BQ_COSINE, BQ_EUCLIDEAN, BQ_MANHATTAN],
    ids=lambda m: m.codec + "-" + m.name.split()[-1],
)
def test_packed_mxu_paths_match_numpy(rng, metric):
    """The popcount-as-dot MXU paths (distances.unpack_bits identity) must
    be bit-exact vs the numpy oracle: {0,1} bf16 products are exact and
    the f32 accumulation stays integral below 2^24."""
    a = codecs.pack(rng.standard_normal((17, 130)).astype(np.float32), metric.codec)
    b = codecs.pack(rng.standard_normal((23, 130)).astype(np.float32), metric.codec)
    an, bn = distances.np_norms(metric, a), distances.np_norms(metric, b)
    want = distances.np_pairwise(metric, a, an, b, bn)
    got = np.asarray(
        distances.packed_matrix_mxu(
            metric, jnp.asarray(a), jnp.asarray(an), jnp.asarray(b), jnp.asarray(bn)
        )
    )
    np.testing.assert_allclose(got, want, rtol=1e-6, atol=1e-6)
    got_block = np.asarray(
        distances.block_distances(
            metric,
            jnp.asarray(a)[None], jnp.asarray(an)[None],
            jnp.asarray(b)[None], jnp.asarray(bn)[None],
        )
    )[0]
    np.testing.assert_allclose(got_block, want, rtol=1e-6, atol=1e-6)
