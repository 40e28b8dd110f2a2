"""Store-backed SPMD construction (parallel/spmd_build.py): adds AND
deletes flow through lockstep shard_map device waves, durability through
each shard's ordinary epilogue (VERDICT r2 item 3 — previously the
store-backed sharded build looped shards sequentially through the
single-chip builder; the reference's one build path is fully integrated
with storage under a single wtxn, writer.rs:521-603 + hnsw.rs:122-216)."""

from __future__ import annotations

import jax
import numpy as np
import pytest

from hannoy_tpu import Database, Metric
from hannoy_tpu.parallel import ShardedReader, ShardedWriter
from hannoy_tpu.parallel.mesh import make_mesh


@pytest.fixture(scope="module")
def mesh():
    assert len(jax.devices()) >= 8, "conftest must provide 8 virtual devices"
    return make_mesh(8)


def _clustered(rng, n, d, k=12):
    centers = rng.standard_normal((k, d)).astype(np.float32) * 3.0
    return (centers[rng.integers(0, k, n)] + rng.standard_normal((n, d))).astype(
        np.float32
    )


def test_spmd_store_build_fresh_and_incremental(tmp_path, mesh, rng):
    n, d, S = 800, 16, 8
    data = _clustered(rng, n, d)
    db = Database(tmp_path / "spmd", Metric.EUCLIDEAN)

    # fresh build through the SPMD path (mesh provided → spmd auto-on)
    w = ShardedWriter(db, d, n_shards=S, m=8, ef=48, mesh=mesh)
    w.add_items(range(n), data)
    w.build()
    db.commit_rw_txn()

    r = ShardedReader(db, n_shards=S, mesh=mesh)
    r.assert_validity()
    assert r.n_items() == n
    got = r.search(data[:8], n=3, ef_search=48)
    for i, row in enumerate(got):
        assert row[0][0] == i and row[0][1] < 1e-5

    # incremental: adds AND deletes in ONE SPMD build
    w2 = ShardedWriter(db, d, n_shards=S, m=8, ef=48, mesh=mesh)
    fresh = _clustered(rng, 24, d)
    w2.add_items(range(n, n + 24), fresh)
    for i in range(16):
        assert w2.del_item(i)
    w2.build()
    db.commit_rw_txn()

    # journal fully consumed
    w3 = ShardedWriter(db, d, n_shards=S, m=8, ef=48, mesh=mesh)
    assert not any(wr.need_build() for wr in w3._writers)

    r2 = ShardedReader(db, n_shards=S, mesh=mesh)
    r2.assert_validity()
    assert r2.n_items() == n - 16 + 24
    # fresh items reachable at their own vectors
    got = r2.search(fresh, n=1, ef_search=48)
    assert [row[0][0] for row in got] == list(range(n, n + 24))
    # deleted items gone from results
    got = r2.search(data[:16], n=5, ef_search=64)
    for i, row in enumerate(got):
        assert all(item != i for item, _ in row)


def test_spmd_build_survives_reopen(tmp_path, mesh, rng):
    """The store is the durable source of truth: a fresh Database handle
    (new process analogue) must serve identical results."""
    n, d, S = 400, 8, 8
    data = _clustered(rng, n, d)
    db = Database(tmp_path / "re", Metric.COSINE)
    with ShardedWriter(db, d, n_shards=S, m=8, ef=32, mesh=mesh) as w:
        w.add_items(range(n), data)
    r1 = ShardedReader(db, n_shards=S, mesh=mesh)
    before = r1.search(data[:5], n=4, ef_search=32)
    db.close()

    db2 = Database(tmp_path / "re", Metric.COSINE)
    r2 = ShardedReader(db2, n_shards=S, mesh=mesh)
    r2.assert_validity()
    assert r2.search(data[:5], n=4, ef_search=32) == before
    db2.close()


def test_spmd_matches_sequential_semantics(tmp_path, mesh, rng):
    """SPMD and sequential store-backed builds expose the same item set
    and exact self-search behavior (graph structure may differ — recall
    parity, not structure parity, SURVEY §7)."""
    n, d, S = 320, 8, 8
    data = _clustered(rng, n, d)

    dbs = Database(tmp_path / "seq", Metric.EUCLIDEAN)
    ws = ShardedWriter(dbs, d, n_shards=S, m=8, ef=32)
    ws.add_items(range(n), data)
    ws.build(spmd=False)
    dbs.commit_rw_txn()

    dbp = Database(tmp_path / "par", Metric.EUCLIDEAN)
    wp = ShardedWriter(dbp, d, n_shards=S, m=8, ef=32, mesh=mesh)
    wp.add_items(range(n), data)
    wp.build()
    dbp.commit_rw_txn()

    rs = ShardedReader(dbs, n_shards=S, mesh=mesh)
    rp = ShardedReader(dbp, n_shards=S, mesh=mesh)
    rs.assert_validity()
    rp.assert_validity()
    assert rs.n_items() == rp.n_items() == n
    for q in data[::40]:
        a = rs.search(q, n=1, ef_search=32)[0][0]
        b = rp.search(q, n=1, ef_search=32)[0][0]
        assert a[0] == b[0] and abs(a[1] - b[1]) < 1e-5
