"""Golden whole-DB dump tests — the insta snapshot-test breadth of the
reference (src/tests/writer.rs, 771 LoC over ~15 mutation scenarios, via
DatabaseHandle::fmt in src/tests/mod.rs:33-100 which dumps metadata,
version, every link set and every item as text and runs assert_validity).

Our waves are deterministic even in parallel (no thread pinning needed —
the reference pins rayon to 1 thread for its snapshots,
src/tests/mod.rs:105), so every scenario asserts:

* the dump is **byte-stable** across two identical runs (determinism);
* structural expectations that mirror the reference's inline snapshots
  (item/link counts, journal emptiness, deletion cascades, multi-index
  isolation, entry-point resets).
"""

from __future__ import annotations

import numpy as np
import pytest

from hannoy_tpu import Database, Metric
from hannoy_tpu.store.schema import (
    Key,
    Metadata,
    NodeMode,
    Prefix,
    decode_item,
    decode_links,
    decode_update_status,
    decode_version,
)


def dump_db(db: Database, indexes=(0,)) -> str:
    """Text dump of the whole store for ``indexes`` — the Python analogue
    of the reference's DatabaseHandle::fmt (src/tests/mod.rs:33-100):
    walks every key in order, decodes by NodeMode, and runs
    ``assert_validity`` per non-empty index."""
    out: list[str] = []
    txn = db._env.read_txn()
    for index in indexes:
        rows = list(db._db.prefix_iter(txn, Prefix.all(index)))
        out.append("==================")
        out.append(f"Dumping index {index}")
        has_metadata = False
        for kb, vb in rows:
            key = Key.from_bytes(kb)
            if key.mode == NodeMode.METADATA and key.item == 0:
                md = Metadata.from_bytes(vb)
                has_metadata = True
                out.append(
                    f"Root: Metadata {{ dimensions: {md.dimensions}, "
                    f"items: {md.items.to_array().tolist()}, "
                    f"distance: {md.distance!r}, "
                    f"entry_points: {sorted(md.entry_points)}, "
                    f"max_level: {md.max_level}, m: {md.m}, m0: {md.m0} }}"
                )
            elif key.mode == NodeMode.METADATA and key.item == 1:
                out.append(f"Version: {decode_version(vb)}")
            elif key.mode == NodeMode.UPDATED:
                out.append(f"Updated {key.item}: {decode_update_status(vb).name}")
            elif key.mode == NodeMode.LINKS:
                ids = sorted(int(x) for x in decode_links(vb).to_array())
                out.append(f"Links {key.item}@{key.layer}: {ids}")
            elif key.mode == NodeMode.ITEM:
                _, vec_b = decode_item(vb)
                vec = np.frombuffer(vec_b, dtype="<f4") if db.metric in (
                    Metric.EUCLIDEAN, Metric.COSINE, Metric.MANHATTAN,
                ) else np.frombuffer(vec_b, dtype="<u4")
                out.append(
                    f"Item {key.item}: [" + ", ".join(f"{x:.4f}" for x in vec) + "]"
                )
        if has_metadata and any(
            Key.from_bytes(k).mode == NodeMode.ITEM for k, _ in rows
        ):
            db.reader(index).assert_validity()
    return "\n".join(out) + "\n"


def _links_referencing(dump: str, item: int) -> list[str]:
    """Dump lines whose link set contains ``item``."""
    hits = []
    for line in dump.splitlines():
        if line.startswith("Links "):
            ids = line.split(": ", 1)[1]
            if f" {item}," in ids or f"[{item}," in ids or ids.endswith(f" {item}]") or ids == f"[{item}]":
                hits.append(line)
    return hits


def _vecs(rng, n, d):
    return rng.standard_normal((n, d)).astype(np.float32)


# ---------------------------------------------------------------------------
# scenarios (reference src/tests/writer.rs function per docstring cite)
# ---------------------------------------------------------------------------


def test_write_one_vector(tmp_path, rng):
    """writer.rs:110-128 — single vector, layer-0 links row exists and is
    empty, metadata lists the item, journal empty."""

    def run(p):
        db = Database(p, Metric.EUCLIDEAN)
        with db.writer(3, m=4, ef=16) as w:
            w.add_item(0, [0.0, 1.0, 2.0])
        d = dump_db(db)
        db.close()
        return d

    d1 = run(tmp_path / "a")
    d2 = run(tmp_path / "b")
    assert d1 == d2  # byte-stable
    assert "Item 0: [0.0000, 1.0000, 2.0000]" in d1
    assert "Links 0@0: []" in d1
    assert "items: [0]" in d1 and "entry_points: [0]" in d1
    assert "Updated" not in d1  # journal consumed


def test_u32_max_ids(tmp_path, rng):
    """writer.rs:68-107 — u32::MAX and u32::MAX-1 item ids round-trip."""
    hi = 2**32 - 1
    db = Database(tmp_path / "db", Metric.EUCLIDEAN)
    with db.writer(3, m=4, ef=16) as w:
        w.add_item(hi - 1, [0.0, 1.0, 2.0])
        w.add_item(hi, [1.0, 2.0, 3.0])
    d = dump_db(db)
    assert f"Item {hi}: [1.0000, 2.0000, 3.0000]" in d
    assert f"Item {hi - 1}: [0.0000, 1.0000, 2.0000]" in d
    assert f"Links {hi}@0: [{hi - 1}]" in d
    assert f"Links {hi - 1}@0: [{hi}]" in d
    got = db.reader().by_vec([1.0, 2.0, 3.0], n=1)
    assert got[0][0] == hi


def test_overwrite_one_item_incremental(tmp_path, rng):
    """writer.rs:376-438 — overwriting one item's vector rewires its links
    incrementally; the dump changes and remains valid + deterministic."""

    def run(p):
        db = Database(p, Metric.EUCLIDEAN)
        data = _vecs(np.random.default_rng(7), 30, 4)
        with db.writer(4, m=4, ef=16) as w:
            w.add_items(range(30), data)
        before = dump_db(db)
        # move item 5 to the far corner — its neighborhood must change
        with db.writer(4, m=4, ef=16) as w:
            w.add_item(5, [50.0, 50.0, 50.0, 50.0])
        after = dump_db(db)
        db.close()
        return before, after

    b1, a1 = run(tmp_path / "a")
    b2, a2 = run(tmp_path / "b")
    assert b1 == b2 and a1 == a2  # both phases byte-stable
    assert b1 != a1
    assert "Item 5: [50.0000, 50.0000, 50.0000, 50.0000]" in a1
    # 30 items before and after (overwrite, not insert)
    assert a1.count("\nItem ") == 30


def test_delete_one_item_in_a_one_item_db(tmp_path, rng):
    """writer.rs:442-480 — delete the only item: index empties, metadata
    has no items and no entry points, no links rows survive."""
    db = Database(tmp_path / "db", Metric.EUCLIDEAN)
    with db.writer(3, m=4, ef=16) as w:
        w.add_item(0, [0.0, 1.0, 2.0])
    with db.writer(3, m=4, ef=16) as w:
        assert w.del_item(0)
    d = dump_db(db)
    assert "items: []" in d and "entry_points: []" in d
    assert "Item 0" not in d and "Links" not in d
    assert db.reader().is_empty()


def test_delete_document_in_an_empty_index_74(tmp_path, rng):
    """writer.rs:483-548 (upstream issue #74) — deleting a nonexistent
    item from an empty index must not corrupt anything; a later build
    still works."""
    db = Database(tmp_path / "db", Metric.EUCLIDEAN)
    with db.writer(3, m=4, ef=16) as w:
        assert not w.del_item(42)
    d = dump_db(db)
    assert "items: []" in d
    with db.writer(3, m=4, ef=16) as w:
        w.add_item(1, [1.0, 0.0, 0.0])
    got = db.reader().by_vec([1.0, 0.0, 0.0], n=1)
    assert got[0][0] == 1


def test_delete_all_but_one_item_and_build(tmp_path, rng):
    """writer.rs:48-65 (upstream issue #52) — mass deletion down to a
    single item leaves a valid one-item graph."""
    db = Database(tmp_path / "db", Metric.EUCLIDEAN)
    data = _vecs(rng, 25, 4)
    with db.writer(4, m=4, ef=16) as w:
        w.add_items(range(25), data)
    with db.writer(4, m=4, ef=16) as w:
        for i in range(1, 25):
            assert w.del_item(i)
    d = dump_db(db)
    assert "items: [0]" in d and "entry_points: [0]" in d
    assert d.count("\nItem ") == 1
    for i in range(1, 25):
        assert not _links_referencing(d, i), f"dangling edge to deleted {i}"
    got = db.reader().by_vec(data[0], n=5)
    assert [i for i, _ in got] == [0]


def test_clear_small_database(tmp_path, rng):
    """writer.rs:22-45 — clear() empties the index; a fresh build after
    clear works from scratch."""
    db = Database(tmp_path / "db", Metric.EUCLIDEAN)
    with db.writer(3, m=4, ef=16) as w:
        w.add_item(0, [0.0, 1.0, 2.0])
        w.add_item(1, [1.0, 2.0, 3.0])
    w = db.writer(3, m=4, ef=16)
    w.clear()
    w.builder().build()
    db.commit_rw_txn()
    d = dump_db(db)
    assert "items: []" in d and "Item " not in d and "Links" not in d
    with db.writer(3, m=4, ef=16) as w:
        w.add_item(7, [3.0, 1.0, 2.0])
    got = db.reader().by_vec([3.0, 1.0, 2.0], n=1)
    assert got[0][0] == 7


def test_write_multiple_indexes(tmp_path, rng):
    """writer.rs:158-228 — indexes are fully isolated: items of index 1
    never appear in index 0's keyspace and vice versa."""
    db = Database(tmp_path / "db", Metric.EUCLIDEAN)
    d0 = _vecs(rng, 10, 3)
    d1 = _vecs(rng, 5, 3) + 10.0
    with db.writer(3, index=0, m=4, ef=16) as w:
        w.add_items(range(10), d0)
    with db.writer(3, index=1, m=4, ef=16) as w:
        w.add_items(range(100, 105), d1)
    d = dump_db(db, indexes=(0, 1))
    i0, i1 = d.split("Dumping index 1")
    assert i0.count("\nItem ") == 10 and i1.count("\nItem ") == 5
    assert "Item 100" not in i0 and "Item 0:" not in i1
    assert db.reader(0).n_items() == 10 and db.reader(1).n_items() == 5
    # deleting in one index leaves the other's keyspace byte-identical
    before0 = dump_db(db, indexes=(0,))
    with db.writer(3, index=1, m=4, ef=16) as w:
        assert w.del_item(100)
    assert dump_db(db, indexes=(0,)) == before0
    assert db.reader(0).n_items() == 10 and db.reader(1).n_items() == 4


def test_delete_one_item_cascades(tmp_path, rng):
    """writer.rs:589-678 — deleting an item removes it from *every* other
    link row (the FreshDiskANN repair splices through it) and repairs
    survivors' neighborhoods; deterministic across runs."""

    def run(p):
        db = Database(p, Metric.EUCLIDEAN)
        data = _vecs(np.random.default_rng(3), 40, 4)
        with db.writer(4, m=4, ef=24) as w:
            w.add_items(range(40), data)
        pre = dump_db(db)
        assert _links_referencing(pre, 3)  # item 3 is somebody's neighbor
        with db.writer(4, m=4, ef=24) as w:
            assert w.del_item(3)
        post = dump_db(db)
        db.close()
        return pre, post

    pre1, post1 = run(tmp_path / "a")
    pre2, post2 = run(tmp_path / "b")
    assert pre1 == pre2 and post1 == post2
    assert "Item 3:" not in post1
    assert not _links_referencing(post1, 3), "dangling edge to deleted item"
    assert "Links 3@" not in post1


def test_delete_items_one_by_one(tmp_path, rng):
    """writer.rs:681-731 (delete_one_item_no_snapshots) — delete every
    item one build at a time; each intermediate DB stays valid and the
    deleted id vanishes from all rows."""
    db = Database(tmp_path / "db", Metric.EUCLIDEAN)
    n = 12
    data = _vecs(rng, n, 4)
    with db.writer(4, m=4, ef=16) as w:
        w.add_items(range(n), data)
    for i in range(n):
        with db.writer(4, m=4, ef=16) as w:
            assert w.del_item(i)
        d = dump_db(db)
        assert f"Item {i}:" not in d
        assert not _links_referencing(d, i)
        assert db.reader().n_items() == n - 1 - i
    assert db.reader().is_empty()


def test_write_and_update_lot_of_random_points(tmp_path, rng):
    """writer.rs:131-155 — build 100 random points, then overwrite all of
    them; dump is deterministic at both stages and search tracks the new
    vectors."""

    def run(p):
        db = Database(p, Metric.EUCLIDEAN)
        r = np.random.default_rng(11)
        data = _vecs(r, 100, 6)
        with db.writer(6, m=8, ef=32) as w:
            w.add_items(range(100), data)
        s1 = dump_db(db)
        data2 = _vecs(r, 100, 6)
        with db.writer(6, m=8, ef=32) as w:
            w.add_items(range(100), data2)
        s2 = dump_db(db)
        db.close()
        return s1, s2, data2

    a1, a2, data2 = run(tmp_path / "a")
    b1, b2, _ = run(tmp_path / "b")
    assert a1 == b1 and a2 == b2
    assert a1 != a2
    db = Database(tmp_path / "a", Metric.EUCLIDEAN)
    got = db.reader().by_vec(data2[17], n=1, ef_search=48)
    assert got[0][0] == 17 and got[0][1] == pytest.approx(0.0, abs=1e-4)


def test_write_random_vectors_to_random_indexes(tmp_path, rng):
    """writer.rs:209-228 — scatter items over several indexes; every
    index independently valid."""
    db = Database(tmp_path / "db", Metric.EUCLIDEAN)
    n_index, per = 4, 8
    assign = rng.integers(0, n_index, size=n_index * per)
    data = _vecs(rng, n_index * per, 3)
    for idx in range(n_index):
        members = np.nonzero(assign == idx)[0]
        if not len(members):
            continue
        with db.writer(3, index=idx, m=4, ef=16) as w:
            for i in members:
                w.add_item(int(i), data[i])
    total = 0
    for idx in range(n_index):
        members = np.nonzero(assign == idx)[0]
        r = db.reader(idx) if len(members) else None
        if r:
            r.assert_validity()
            assert r.n_items() == len(members)
            total += r.n_items()
    assert total == n_index * per
    dump_db(db, indexes=tuple(range(n_index)))  # runs assert_validity per index


def test_force_rebuild_snapshot(tmp_path, rng):
    """writer.rs:750-771 — force_rebuild relinks everything; the result
    is valid, deterministic, and search-equivalent."""

    def run(p):
        db = Database(p, Metric.EUCLIDEAN)
        data = _vecs(np.random.default_rng(5), 50, 4)
        with db.writer(4, m=4, ef=24) as w:
            w.add_items(range(50), data)
        w = db.writer(4, m=4, ef=24)
        w.builder().force_rebuild()
        db.commit_rw_txn()
        d = dump_db(db)
        got = db.reader().by_vec(data[9], n=3, ef_search=32)
        db.close()
        return d, got

    d1, g1 = run(tmp_path / "a")
    d2, g2 = run(tmp_path / "b")
    assert d1 == d2
    assert g1 == g2
    assert g1[0][0] == 9


def test_reshard_dump_is_stable_and_routed(tmp_path, rng):
    """Resharding 2→3 produces a byte-stable dump; every item record
    lands in the index its id routes to, metadata/journal are clean.
    (Elastic-scaling analogue of the reference's multi-index isolation
    dumps, src/tests/writer.rs:158-228.)"""
    from hannoy_tpu.parallel import ShardedWriter, reshard

    def build(path):
        db = Database(path, Metric.EUCLIDEAN)
        data = _vecs(np.random.default_rng(11), 40, 8)
        with ShardedWriter(db, 8, n_shards=2, m=4, ef=16, m0=8) as w:
            w.add_items(range(40), data)
        reshard(db, 2, 3, m=4, ef=16, m0=8)
        db.commit_rw_txn()
        dump = dump_db(db, indexes=(0, 1, 2))
        db.close()
        return dump

    d1 = build(tmp_path / "a")
    d2 = build(tmp_path / "b")
    assert d1 == d2, "reshard dump not deterministic"
    # routing: items in index t are exactly {i : i % 3 == t}
    idx = -1
    for line in d1.splitlines():
        if line.startswith("Dumping index "):
            idx = int(line.split()[-1])
        elif line.startswith("Item "):
            item = int(line.split()[1].rstrip(":"))
            assert item % 3 == idx, (item, idx)
    assert "Updated" not in d1, "journal must be consumed by the rebuild"
