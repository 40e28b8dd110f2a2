"""Multi-shard (virtual 8-device CPU mesh) tests — SURVEY §7 stage 8."""

import jax
import numpy as np
import pytest

from hannoy_tpu.build.builder import BuildOptions
from hannoy_tpu.ops.distances import COSINE, EUCLIDEAN
from hannoy_tpu.parallel import build_sharded, make_mesh, sharded_insert_wave


@pytest.fixture(scope="module")
def mesh():
    assert len(jax.devices()) >= 8, "conftest must provide 8 virtual devices"
    return make_mesh(8)


def test_sharded_search_recall(mesh, rng):
    n, d, k = 2000, 16, 10
    data = rng.standard_normal((n, d)).astype(np.float32)
    idx = build_sharded(
        EUCLIDEAN, data, np.arange(n), m=8, m0=16, n_shards=8,
        opts=BuildOptions(ef_construction=48, wave_size=128), mesh=mesh,
    )
    queries = rng.standard_normal((8, d)).astype(np.float32)
    ids, dists = idx.search(queries, k=k, ef=48)
    assert ids.shape == (8, k)
    # recall vs exact (tie-aware): global merge of per-shard beams
    exact = np.sort(((data[None] - queries[:, None]) ** 2).sum(-1), axis=1)[:, :k]
    rec = float((dists <= exact[:, k - 1 : k] + 1e-5).mean())
    assert rec >= 0.9, f"sharded recall {rec}"
    assert (np.diff(dists, axis=1) >= -1e-6).all()


def test_sharded_results_are_replicated_consistent(mesh, rng):
    n, d = 800, 8
    data = rng.standard_normal((n, d)).astype(np.float32)
    idx = build_sharded(
        COSINE, data, np.arange(n), m=8, m0=16, n_shards=8,
        opts=BuildOptions(ef_construction=32, wave_size=64), mesh=mesh,
    )
    q = data[:4]
    ids1, d1 = idx.search(q, k=5, ef=32)
    ids2, d2 = idx.search(q, k=5, ef=32)
    assert np.array_equal(ids1, ids2) and np.array_equal(d1, d2)
    # query at an item finds that exact item first
    assert ids1[0, 0] == 0


def test_sharded_insert_wave_inserts_searchable_items(mesh, rng):
    """SPMD wave insert across all shards — the multi-chip build step.

    Items staged into free slots and inserted *only* through
    ``sharded_insert_wave`` must come back from the sharded search
    (VERDICT r1 item 2: the wave path has to really insert)."""
    import jax.numpy as jnp

    n, d, S = 800, 8, 8
    data = rng.standard_normal((n, d)).astype(np.float32)
    idx = build_sharded(
        EUCLIDEAN, data, np.arange(n), m=8, m0=16, n_shards=S,
        opts=BuildOptions(ef_construction=32, wave_size=64), mesh=mesh,
    )
    per = n // S
    extra = rng.standard_normal((S, 4, d)).astype(np.float32) + 10.0  # far cluster
    wave = np.zeros((S, 4), dtype=np.int32)
    new_ids = np.zeros((S, 4), dtype=np.uint32)
    vecs, nrms, ids_arr = idx.arrays["vectors"], idx.arrays["norms"], idx.ids
    for s in range(S):
        for j in range(4):
            slot, gid = per + j, n + s * 4 + j
            wave[s, j], new_ids[s, j] = slot, gid
            vecs = vecs.at[s, slot].set(jnp.asarray(extra[s, j]))
            ids_arr = ids_arr.at[s, slot].set(np.uint32(gid))
    idx.arrays["vectors"], idx.arrays["norms"], idx.ids = vecs, nrms, ids_arr
    out = sharded_insert_wave(idx, wave, ef=32, cap=16)
    assert out.arrays["links0"].shape == idx.ids.shape + (16,)

    got, gd = out.search(extra.reshape(-1, d), k=1, ef=32)
    assert np.array_equal(got[:, 0], new_ids.reshape(-1))
    assert (gd[:, 0] < 1e-5).all()
    # the new far cluster must also be reachable from ordinary queries
    probe = extra.reshape(-1, d)[:3] + 0.01
    got2, _ = out.search(probe, k=3, ef=32)
    assert set(got2[:, 0].tolist()) <= set(new_ids.reshape(-1).tolist())


def test_store_backed_sharded_deployment(tmp_path, mesh, rng):
    """Durable sharded index: per-shard store indexes + SPMD fan-out search
    + incremental delete (the Deep-10M configuration at toy scale)."""
    from hannoy_tpu import Database, Metric
    from hannoy_tpu.parallel import ShardedReader, ShardedWriter

    n, d = 600, 16
    data = rng.standard_normal((n, d)).astype(np.float32)
    db = Database(tmp_path / "sharded", Metric.EUCLIDEAN)
    with ShardedWriter(db, d, n_shards=8, m=8, ef=48) as w:
        w.add_items(range(n), data)

    reader = ShardedReader(db, n_shards=8, mesh=mesh)
    reader.assert_validity()
    assert reader.n_items() == n
    got = reader.search(data[:6], n=3, ef_search=48)
    for i, row in enumerate(got):
        assert row[0][0] == i and row[0][1] < 1e-5

    # incremental: delete a handful, rebuild touched shards, reopen
    w2 = ShardedWriter(db, d, n_shards=8, m=8, ef=48)
    for i in range(16):
        assert w2.del_item(i)
    w2.build()
    db.commit_rw_txn()
    r2 = ShardedReader(db, n_shards=8, mesh=mesh)
    r2.assert_validity()
    assert r2.n_items() == n - 16
    got = r2.search(data[3], n=5, ef_search=48)
    assert all(i >= 16 for i, _ in got[0])


def test_reshard_in_place_grow(tmp_path, mesh, rng):
    """2 -> 4 shards in place: every item re-routes to id % 4, records
    move verbatim, fresh per-shard builds pass validity, search still
    finds every item (elastic scaling — no reference analogue)."""
    from hannoy_tpu import Database, Metric, Reader
    from hannoy_tpu.parallel import ShardedReader, ShardedWriter, reshard

    n, d = 500, 16
    data = rng.standard_normal((n, d)).astype(np.float32)
    db = Database(tmp_path / "grow", Metric.EUCLIDEAN)
    with ShardedWriter(db, d, n_shards=2, m=8, ef=48) as w:
        w.add_items(range(n), data)

    reshard(db, 2, 4, m=8, ef=48)
    db.commit_rw_txn()

    total = 0
    for t in range(4):
        r = Reader.open(db, t)
        r.assert_validity()
        ids = r.item_ids().to_array()
        assert (ids % 4 == t).all(), "item routed to the wrong shard"
        total += len(ids)
        # moved records are byte-identical: vectors round-trip exactly
        some = ids[:5]
        for item in some.tolist():
            np.testing.assert_array_equal(
                np.asarray(r.item_vector(item), dtype=np.float32)[:d], data[item]
            )
    assert total == n

    reader = ShardedReader(db, n_shards=4)  # mesh defaults to 4 devices
    got = reader.search(data[:8], n=3, ef_search=48)
    for i, row in enumerate(got):
        assert row[0][0] == i and row[0][1] < 1e-5


def test_reshard_new_base_and_shrink(tmp_path, mesh, rng):
    """4 -> 2 shards at a new base: old indexes end up empty, pending
    (unbuilt) journal adds migrate too, deletes stay deleted."""
    from hannoy_tpu import Database, Metric, Reader
    from hannoy_tpu.parallel import ShardedWriter, reshard
    from hannoy_tpu.store.schema import Prefix

    n, d = 300, 16
    data = rng.standard_normal((n, d)).astype(np.float32)
    db = Database(tmp_path / "shrink", Metric.EUCLIDEAN)
    with ShardedWriter(db, d, n_shards=4, m=8, ef=48) as w:
        w.add_items(range(n), data)

    # post-build mutations left *pending* (no build): one delete, two adds
    w2 = ShardedWriter(db, d, n_shards=4, m=8, ef=48)
    assert w2.del_item(7)
    extra = rng.standard_normal((2, d)).astype(np.float32)
    w2.add_items([n, n + 1], extra)

    reshard(db, 4, 2, new_base_index=100, m=8, ef=48)
    db.commit_rw_txn()

    wtxn = db._wtxn()
    for s in range(4):
        assert next(db._db.prefix_iter(wtxn, Prefix.all(s)), None) is None, (
            "old shard not cleared"
        )
    db.abort_rw_txn()

    seen = set()
    for t in range(2):
        r = Reader.open(db, 100 + t)
        r.assert_validity()
        seen.update(int(i) for i in r.item_ids().to_array())
    assert seen == (set(range(n)) | {n, n + 1}) - {7}


def test_reshard_overlap_rejected(tmp_path, rng):
    from hannoy_tpu import Database, Metric
    from hannoy_tpu.parallel import ShardedWriter, reshard

    d = 8
    db = Database(tmp_path / "olap", Metric.EUCLIDEAN)
    with ShardedWriter(db, d, n_shards=2, m=8, ef=48) as w:
        w.add_items(range(64), np.random.default_rng(0).standard_normal((64, d)).astype(np.float32))
    with pytest.raises(ValueError):
        reshard(db, 2, 4, new_base_index=1)


def test_sharded_recall_parity_vs_single_graph(mesh, rng):
    """Sharded search must match a single-graph index on the SAME data at
    equal ef (VERDICT r4 weak #6): a shard-merge ranking bug that costs a
    few recall points would pass the absolute-bar tests above. Clustered
    data (the bench.py corpus shape) at a non-trivial size."""
    from hannoy_tpu.build.builder import build_graph
    from hannoy_tpu.models.hnsw import HostGraph, slot_capacity, to_device
    from hannoy_tpu.ops import beam, codecs, distances

    n, d, k, ef = 16384, 32, 10, 64
    n_clusters = 64
    centers = rng.standard_normal((n_clusters, d)).astype(np.float32) * 4.0
    assign = rng.integers(0, n_clusters, size=n)
    data = (centers[assign] + rng.standard_normal((n, d))).astype(np.float32)
    nq = 128
    q_assign = rng.integers(0, n_clusters, size=nq)
    queries = (centers[q_assign] + rng.standard_normal((nq, d))).astype(np.float32)
    exact = np.sort(((data[None] - queries[:, None]) ** 2).sum(-1), axis=1)[:, :k]
    thresh = exact[:, k - 1 : k] + 1e-5

    opts = BuildOptions(ef_construction=48, wave_size=1024)

    # single-graph oracle
    metric = EUCLIDEAN
    g = HostGraph.empty(metric, d, 8, 16, capacity=slot_capacity(n))
    packed = codecs.pack(data, metric.codec)
    for i in range(n):
        g.alloc_slot(i)
    g.vectors[:n] = packed
    g.norms[:n] = distances.np_norms(metric, packed)
    build_graph(g, np.arange(n, dtype=np.int64), np.empty(0, dtype=np.int64), opts)
    dev = to_device(g)
    import jax.numpy as jnp

    qp = codecs.pack(queries, metric.codec)
    qj = jnp.asarray(qp)
    qnj = jnp.asarray(distances.np_norms(metric, qp))
    res = beam.hnsw_search(dev, qj, qnj, ef, ef_upper=beam.default_ef_upper(n, ef))
    rec_single = float((np.asarray(res.dists)[:, :k] <= thresh).mean())

    # 8-shard index over the identical data
    idx = build_sharded(
        metric, data, np.arange(n), m=8, m0=16, n_shards=8, opts=opts, mesh=mesh,
    )
    _, dists = idx.search(queries, k=k, ef=ef)
    rec_sharded = float((dists <= thresh).mean())

    # the sharded merge may not cost recall: each shard searches an
    # n/8-item sub-graph, so per-shard recall at equal ef is, if anything,
    # easier — parity within epsilon catches merge-ranking defects
    assert rec_sharded >= rec_single - 0.02, (
        f"sharded {rec_sharded:.4f} vs single {rec_single:.4f}"
    )
    assert rec_single >= 0.9, f"oracle recall {rec_single}"
