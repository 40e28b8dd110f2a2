"""Query-engine tests: device beam search over oracle-built graphs.

Stage-4 validation (SURVEY §7): graphs come from the trusted sequential
host builder; the device beam search must reach recall parity with what
the reference achieves at comparable ef.
"""

import jax.numpy as jnp
import numpy as np
import pytest

from hannoy_tpu.build.host_builder import build_host_graph
from hannoy_tpu.build.levels import assign_probas, sample_levels
from hannoy_tpu.models.flat import flat_topk
from hannoy_tpu.models.hnsw import to_device
from hannoy_tpu.ops import beam, codecs, distances
from hannoy_tpu.ops.distances import COSINE, EUCLIDEAN, HAMMING


def _prep_queries(metric, raw):
    p = codecs.pack(raw, metric.codec)
    n = distances.np_norms(metric, p)
    return jnp.asarray(p), jnp.asarray(n)


def _recall(found_slots, true_slots):
    hits = sum(
        len(set(f.tolist()) & set(t.tolist())) for f, t in zip(found_slots, true_slots)
    )
    return hits / true_slots.size


def _recall_by_dist(found_dists, exact_dists, k):
    """Tie-aware recall: a found neighbor counts if its distance does not
    exceed the k-th exact distance (hamming/bq metrics are heavily
    quantised, making id-set recall ill-defined under ties)."""
    thresh = exact_dists[:, k - 1 : k] + 1e-6
    return float((found_dists[:, :k] <= thresh).mean())


def test_level_probas_shape():
    p = assign_probas(16)
    assert p[0] == pytest.approx(1 - 1 / 16, rel=1e-5)
    assert p[1] == pytest.approx((1 / 16) * (1 - 1 / 16), rel=1e-4)
    assert (np.diff(p) < 0).all()


def test_sample_levels_distribution():
    rng = np.random.default_rng(42)
    lv = sample_levels(rng, 16, 20000)
    frac0 = (lv == 0).mean()
    assert 0.92 < frac0 < 0.95  # ≈ 15/16


@pytest.mark.parametrize("metric", [EUCLIDEAN, COSINE, HAMMING], ids=lambda m: m.name.split()[0])
def test_beam_recall_vs_exact(rng, metric):
    n, d, k, ef = 1200, 32, 10, 100
    data = rng.standard_normal((n, d)).astype(np.float32)
    g = build_host_graph(metric, data, np.arange(n), m=12, m0=24, ef_construction=64)
    g.check_validity()
    dev = to_device(g)

    queries = rng.standard_normal((16, d)).astype(np.float32)
    q, qn = _prep_queries(metric, queries)

    exact_d, exact_s = flat_topk(metric.name, q, qn, dev.vectors, dev.norms, dev.valid, k)
    res = beam.hnsw_search(dev, q, qn, ef)
    rec = _recall_by_dist(np.asarray(res.dists), np.asarray(exact_d), k)
    assert rec >= 0.9, f"recall@{k}={rec} too low for {metric.name}"
    # distances in the pool are sorted ascending
    pd = np.asarray(res.dists)
    assert (np.diff(pd, axis=1) >= -1e-6).all()


def test_beam_exactness_on_tiny_graph(rng):
    """k == n → every item must be returned (reachability property,
    reference proptest all_items_are_reachable, src/tests/reader.rs:101-111)."""
    n, d = 40, 8
    data = rng.standard_normal((n, d)).astype(np.float32)
    g = build_host_graph(EUCLIDEAN, data, np.arange(n), m=4, m0=8, ef_construction=32)
    dev = to_device(g)
    q, qn = _prep_queries(EUCLIDEAN, rng.standard_normal((4, d)).astype(np.float32))
    res = beam.hnsw_search(dev, q, qn, ef=n)
    for row in np.asarray(res.slots):
        assert set(row.tolist()) >= set(range(n))


def test_filtered_beam_excludes_non_candidates(rng):
    n, d, k = 400, 16, 10
    data = rng.standard_normal((n, d)).astype(np.float32)
    g = build_host_graph(EUCLIDEAN, data, np.arange(n), m=8, m0=16, ef_construction=48)
    dev = to_device(g)
    q, qn = _prep_queries(EUCLIDEAN, rng.standard_normal((8, d)).astype(np.float32))

    cand = np.zeros(dev.capacity, dtype=bool)
    allowed = rng.choice(n, size=120, replace=False)
    cand[allowed] = True

    res = beam.hnsw_search_filtered(dev, q, qn, jnp.asarray(cand), ef=40)
    slots = np.asarray(res.slots)
    for row in slots:
        for s in row[row >= 0]:
            assert cand[s], "non-candidate leaked into filtered results"

    # recall vs exact-over-candidates (reference candidate-filter exactness,
    # src/tests/reader.rs:42-78 checks filtered results match brute force)
    exact_d, exact_s = flat_topk(
        EUCLIDEAN.name, q, qn, dev.vectors, dev.norms, dev.valid & jnp.asarray(cand), k
    )
    rec = _recall(slots[:, :k], np.asarray(exact_s))
    assert rec >= 0.85, f"filtered recall {rec}"


def test_greedy_descend_finds_good_entry(rng):
    n, d = 1200, 16
    data = rng.standard_normal((n, d)).astype(np.float32)
    g = build_host_graph(EUCLIDEAN, data, np.arange(n), m=8, m0=16, ef_construction=48)
    if g.max_level == 0:
        pytest.skip("sampled flat graph")
    dev = to_device(g)
    q, qn = _prep_queries(EUCLIDEAN, data[:8])  # queries = existing points
    eps = beam.greedy_descend(dev, q, qn, dev.max_level, 1)
    # the descent entry must be closer than a random entry on average
    d_entry = np.asarray(
        beam.seed_distances(EUCLIDEAN, dev.vectors, dev.norms, q, qn, eps[:, None])
    )[:, 0]
    d_rand = distances.np_pairwise(
        EUCLIDEAN, np.asarray(q), np.asarray(qn), g.vectors[:n], g.norms[:n]
    ).mean()
    assert d_entry.mean() < d_rand


def test_empty_and_single_item_graphs(rng):
    # single item: search must return it (reference writer.rs single-vector
    # snapshot test, src/tests/writer.rs:110-128)
    data = rng.standard_normal((1, 8)).astype(np.float32)
    g = build_host_graph(EUCLIDEAN, data, np.array([7]), m=4, m0=8)
    g.check_validity()
    dev = to_device(g)
    q, qn = _prep_queries(EUCLIDEAN, rng.standard_normal((2, 8)).astype(np.float32))
    res = beam.hnsw_search(dev, q, qn, ef=10)
    slots = np.asarray(res.slots)
    assert (slots[:, 0] == 0).all()
    assert (slots[:, 1:] == -1).all()


def test_merge_ranked_matches_merge_sorted(rng):
    """merge_ranked (the rank-based hot-loop pool merge) must produce the
    same (dist, id, expanded) triples as the stable sort-merge it replaced,
    over padded pools, +inf candidates, and duplicate distances."""
    from hannoy_tpu.ops import topk

    for trial in range(12):
        B = int(rng.integers(1, 5))
        K1 = int(rng.integers(1, 9))
        K2 = int(rng.integers(1, 9))
        keep = K1
        # quantized distances force ties; some +inf padding on both sides
        pool_d = np.sort(
            np.where(
                rng.random((B, K1)) < 0.3,
                np.inf,
                np.round(rng.random((B, K1)) * 4) / 4,
            ).astype(np.float32),
            axis=-1,
        )
        pool_id = np.where(np.isfinite(pool_d), rng.integers(0, 100, (B, K1)), -1).astype(np.int32)
        pool_exp = np.where(
            np.isfinite(pool_d), rng.integers(0, 2, (B, K1)), 0
        ).astype(np.int32)
        cand_d = np.where(
            rng.random((B, K2)) < 0.3, np.inf, np.round(rng.random((B, K2)) * 4) / 4
        ).astype(np.float32)
        cand_id = np.where(np.isfinite(cand_d), rng.integers(0, 100, (B, K2)), -1).astype(np.int32)

        sd, (sid, sexp) = topk.merge_sorted(
            jnp.asarray(pool_d),
            (jnp.asarray(pool_id), jnp.asarray(pool_exp)),
            jnp.asarray(cand_d),
            (jnp.asarray(cand_id), jnp.zeros_like(jnp.asarray(cand_id))),
            keep,
        )
        rd, rid, rexp = topk.merge_ranked(
            jnp.asarray(pool_d),
            jnp.asarray(pool_id),
            jnp.asarray(pool_exp),
            jnp.asarray(cand_d),
            jnp.asarray(cand_id),
            keep,
        )
        np.testing.assert_array_equal(np.asarray(sd), np.asarray(rd), err_msg=f"trial {trial} dists")
        np.testing.assert_array_equal(np.asarray(sid), np.asarray(rid), err_msg=f"trial {trial} ids")
        np.testing.assert_array_equal(np.asarray(sexp), np.asarray(rexp), err_msg=f"trial {trial} exp")


def test_merge_ranked_dedup_matches_composition(rng):
    """merge_ranked(dedup=True) == contains/unique masking + merge_sorted."""
    from hannoy_tpu.ops import topk

    for trial in range(12):
        B = int(rng.integers(1, 4))
        K1 = int(rng.integers(2, 9))
        K2 = int(rng.integers(2, 9))
        pool_d = np.sort(
            np.where(rng.random((B, K1)) < 0.25, np.inf, np.round(rng.random((B, K1)) * 4) / 4).astype(np.float32),
            axis=-1,
        )
        # small id space forces pool hits and intra-candidate duplicates
        pool_id = np.where(np.isfinite(pool_d), rng.integers(0, 12, (B, K1)), -1).astype(np.int32)
        # a real pool never repeats ids: dedup rows
        for b in range(B):
            seen = set()
            for i in range(K1):
                if pool_id[b, i] in seen:
                    pool_id[b, i] = -1
                    pool_d[b, i] = np.inf
                seen.add(int(pool_id[b, i]))
            o = np.argsort(pool_d[b], kind="stable")
            pool_d[b], pool_id[b] = pool_d[b][o], pool_id[b][o]
        pool_exp = np.where(np.isfinite(pool_d), rng.integers(0, 2, (B, K1)), 0).astype(np.int32)
        cand_d = np.where(
            rng.random((B, K2)) < 0.25, np.inf, np.round(rng.random((B, K2)) * 4) / 4
        ).astype(np.float32)
        cand_id = np.where(np.isfinite(cand_d), rng.integers(0, 12, (B, K2)), -1).astype(np.int32)

        jp, jc = jnp.asarray(pool_id), jnp.asarray(cand_id)
        okm = ~topk.contains(jc, jp) & topk.unique_mask(jc)
        nd = jnp.where(okm, jnp.asarray(cand_d), np.inf)
        nids = jnp.where(okm, jc, -1)
        sd, (sid, sexp) = topk.merge_sorted(
            jnp.asarray(pool_d), (jp, jnp.asarray(pool_exp)), nd, (nids, jnp.zeros_like(nids)), K1
        )
        rd, rid, rexp = topk.merge_ranked(
            jnp.asarray(pool_d), jp, jnp.asarray(pool_exp),
            jnp.asarray(cand_d), jc, K1, dedup=True,
        )
        np.testing.assert_array_equal(np.asarray(sd), np.asarray(rd), err_msg=f"trial {trial} dists")
        np.testing.assert_array_equal(np.asarray(sid), np.asarray(rid), err_msg=f"trial {trial} ids")
        np.testing.assert_array_equal(np.asarray(sexp), np.asarray(rexp), err_msg=f"trial {trial} exp")


def _chain_graph(n=200, d=8, m0=8):
    """Path graph 0-1-...-(n-1) embedded on a line. Worst case for beam
    termination: a query at the far end forces the beam to walk the whole
    chain one expansion at a time, so small ``max_iters`` truncates it."""
    from hannoy_tpu.models.hnsw import HostGraph, slot_capacity

    metric = EUCLIDEAN
    data = np.zeros((n, d), np.float32)
    data[:, 0] = np.arange(n, dtype=np.float32)
    g = HostGraph.empty(metric, d, 4, m0, capacity=slot_capacity(n))
    packed = codecs.pack(data, metric.codec)
    for i in range(n):
        g.alloc_slot(i)
    g.vectors[:n] = packed
    g.norms[:n] = distances.np_norms(metric, packed)
    g.levels[:n] = 0
    for i in range(n):
        nbs = [j for j in (i - 1, i + 1) if 0 <= j < n]
        g.links0[i, : len(nbs)] = nbs
        g.dists0[i, : len(nbs)] = 1.0
    g.entry_slots = [0]
    g.max_level = 0
    return g, data


def test_per_row_active_flags_differ():
    """BeamResult.active is per row (VERDICT r4 weak #4): a query cut off
    by the iteration cap is flagged; an easy query in the same batch whose
    beam reached natural termination (hnsw.rs:483-487) is not."""
    g, _ = _chain_graph()
    dev = to_device(g)
    qs = np.zeros((2, 8), np.float32)
    qs[0, 0] = 199.0  # hard: must walk the whole chain from entry slot 0
    qs[1, 0] = 0.0  # easy: sits on the entry point
    q, qn = _prep_queries(EUCLIDEAN, qs)

    res = beam.hnsw_search(dev, q, qn, 5, max_iters=20)
    act = np.asarray(res.active)
    assert act[0], "capped far query must still be active"
    assert not act[1], "converged near query must be inactive"
    # with budget to finish, no row is active at exit
    res2 = beam.hnsw_search(dev, q, qn, 5, max_iters=500)
    assert not np.asarray(res2.active).any()
    assert int(res2.iters) < 500
