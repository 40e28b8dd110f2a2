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


def test_sharded_insert_wave_executes(mesh, rng):
    """SPMD wave insert across all shards — the multi-chip build step."""
    n, d = 800, 8
    data = rng.standard_normal((n + 64, d)).astype(np.float32)
    idx = build_sharded(
        EUCLIDEAN, data[:n], np.arange(n), m=8, m0=16, n_shards=8,
        opts=BuildOptions(ef_construction=32, wave_size=64), mesh=mesh,
    )
    # stage one fresh wave of 8 slots per shard is beyond scope here: reuse
    # existing slots as a smoke test that the SPMD step compiles + runs
    wave = np.full((8, 8), -1, dtype=np.int32)
    out = sharded_insert_wave(idx, wave, ef=32, cap=16)
    assert out.arrays["links0"].shape == idx.ids.shape + (16,)


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
