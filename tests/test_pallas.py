"""Fused Pallas gather→distance kernel vs the XLA reference path.

Runs in TPU-interpret mode on the CPU test mesh; on real TPU hardware the
same comparison is exercised by the verify drives and bench.
"""

import numpy as np
import pytest

import jax
import jax.numpy as jnp
from jax.experimental.pallas import tpu as pltpu

from hannoy_tpu.ops import beam_pallas, codecs, distances
from hannoy_tpu.ops.distances import COSINE, EUCLIDEAN, HAMMING, MANHATTAN


@pytest.mark.parametrize("metric", [COSINE, EUCLIDEAN, MANHATTAN], ids=lambda m: m.name)
def test_fused_gather_reduce_matches_xla(rng, metric):
    N, D, B, K = 500, 128, 12, 8  # B deliberately not a multiple of 8
    raw = rng.standard_normal((N, D)).astype(np.float32)
    p = codecs.pack(raw, metric.codec)
    nm = distances.np_norms(metric, p)
    vecs, norms = jnp.asarray(p), jnp.asarray(nm)
    q, qn = vecs[:B], norms[:B]
    idx = jnp.asarray(rng.integers(0, N, (B, K)).astype(np.int32))

    want = distances.gathered_distances(metric, q, qn, vecs[idx], norms[idx])
    with pltpu.force_tpu_interpret_mode():
        got = beam_pallas.gathered_distances_pallas(metric, vecs, norms, q, qn, idx)
    np.testing.assert_allclose(np.asarray(got), np.asarray(want), rtol=2e-4, atol=2e-4)


def test_packed_metric_falls_back(rng):
    """Packed codecs route to the XLA path (rows too small for row DMAs)."""
    N, D, B, K = 100, 100, 4, 8
    raw = rng.standard_normal((N, D)).astype(np.float32)
    p = codecs.pack(raw, HAMMING.codec)
    nm = distances.np_norms(HAMMING, p)
    vecs, norms = jnp.asarray(p), jnp.asarray(nm)
    idx = jnp.asarray(rng.integers(0, N, (B, K)).astype(np.int32))
    assert not beam_pallas.supports(HAMMING, vecs.shape[1])
    got = beam_pallas.gathered_distances_pallas(HAMMING, vecs, norms, vecs[:B], norms[:B], idx)
    want = distances.gathered_distances(HAMMING, vecs[:B], norms[:B], vecs[idx], norms[idx])
    np.testing.assert_allclose(np.asarray(got), np.asarray(want))
