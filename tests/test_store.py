"""Host store (LMDB-equivalent) semantics tests.

Covers the transactional guarantees the rest of the framework leans on
(SURVEY §5 checkpoint/resume): snapshot isolation, commit/abort, prefix
iteration in key order, durability across reopen, torn-tail crash recovery.
"""

import os

import pytest

from hannoy_tpu.errors import DatabaseFull
from hannoy_tpu.store import Env, Key, NativeEnv, Prefix

BACKENDS = {"python": Env, "native": NativeEnv}


@pytest.fixture(params=list(BACKENDS))
def env_cls(request):
    return BACKENDS[request.param]


@pytest.fixture
def env(tmp_path, env_cls):
    e = env_cls(tmp_path / "db")
    yield e
    e.close()


def test_put_get_commit(env):
    db = env.create_database(None, None)
    with env.write_txn() as wtxn:
        db.put(wtxn, Key.item(0, 1).to_bytes(), b"hello")
    rtxn = env.read_txn()
    assert db.get(rtxn, Key.item(0, 1).to_bytes()) == b"hello"


def test_uncommitted_writes_invisible_to_readers(env):
    db = env.create_database(None, None)
    wtxn = env.write_txn()
    db.put(wtxn, b"k" * 8, b"v")
    rtxn = env.read_txn()
    assert db.get(rtxn, b"k" * 8) is None  # MVCC: reader sees old snapshot
    assert db.get(wtxn, b"k" * 8) == b"v"  # writer sees own overlay
    wtxn.commit()
    assert db.get(rtxn, b"k" * 8) is None  # old snapshot is stable
    assert db.get(env.read_txn(), b"k" * 8) == b"v"


def test_abort_discards(env):
    db = env.create_database(None, None)
    wtxn = env.write_txn()
    db.put(wtxn, b"a" * 8, b"1")
    wtxn.abort()
    assert db.get(env.read_txn(), b"a" * 8) is None


def test_exception_in_with_block_aborts(env):
    db = env.create_database(None, None)
    with pytest.raises(RuntimeError):
        with env.write_txn() as wtxn:
            db.put(wtxn, b"x" * 8, b"1")
            raise RuntimeError("boom")
    assert db.get(env.read_txn(), b"x" * 8) is None


def test_delete(env):
    db = env.create_database(None, None)
    with env.write_txn() as wtxn:
        db.put(wtxn, b"d" * 8, b"1")
    with env.write_txn() as wtxn:
        assert db.delete(wtxn, b"d" * 8) is True
        assert db.delete(wtxn, b"e" * 8) is False
    assert db.get(env.read_txn(), b"d" * 8) is None


def test_prefix_iter_in_key_order(env):
    db = env.create_database(None, None)
    with env.write_txn() as wtxn:
        for item in [5, 1, 3]:
            db.put(wtxn, Key.item(2, item).to_bytes(), bytes([item]))
        db.put(wtxn, Key.item(3, 0).to_bytes(), b"other-index")
        db.put(wtxn, Key.links(2, 1, 0).to_bytes(), b"links")
    rtxn = env.read_txn()
    got = [(Key.from_bytes(k).item, v) for k, v in db.prefix_iter(rtxn, Prefix.item(2))]
    assert got == [(1, bytes([1])), (3, bytes([3])), (5, bytes([5]))]


def test_prefix_iter_sees_rw_overlay(env):
    db = env.create_database(None, None)
    with env.write_txn() as wtxn:
        db.put(wtxn, Key.item(0, 1).to_bytes(), b"a")
        db.put(wtxn, Key.item(0, 3).to_bytes(), b"c")
    wtxn = env.write_txn()
    db.put(wtxn, Key.item(0, 2).to_bytes(), b"b")
    db.delete(wtxn, Key.item(0, 3).to_bytes())
    got = [Key.from_bytes(k).item for k, _ in db.prefix_iter(wtxn, Prefix.item(0))]
    assert got == [1, 2]
    wtxn.abort()


def test_durability_across_reopen(tmp_path, env_cls):
    path = tmp_path / "db"
    env = env_cls(path)
    db = env.create_database(None, None)
    with env.write_txn() as wtxn:
        db.put(wtxn, Key.item(0, 7).to_bytes(), b"persisted")
    env.close()

    env2 = env_cls(path)
    db2 = env2.create_database(None, None)
    assert db2.get(env2.read_txn(), Key.item(0, 7).to_bytes()) == b"persisted"
    env2.close()


def test_torn_tail_recovery(tmp_path, env_cls):
    """A crashed (partial) commit batch is discarded on reopen — mirrors
    LMDB's nothing-persists-until-commit guarantee."""
    path = tmp_path / "db"
    env = env_cls(path)
    db = env.create_database(None, None)
    with env.write_txn() as wtxn:
        db.put(wtxn, b"good::ok", b"1")
    env.close()

    log = os.path.join(str(path), "hannoy.log")
    size = os.path.getsize(log)
    with open(log, "ab") as f:
        f.write(b"HNYT\x01\x00\x00\x10\x00partial-garbage")  # torn batch

    env2 = env_cls(path)
    db2 = env2.create_database(None, None)
    assert db2.get(env2.read_txn(), b"good::ok") == b"1"
    env2.close()
    assert os.path.getsize(log) == size  # tail truncated


def test_named_databases_are_isolated(env):
    a = env.create_database(None, "a")
    b = env.create_database(None, "b")
    with env.write_txn() as wtxn:
        a.put(wtxn, b"k" * 8, b"from-a")
    rtxn = env.read_txn()
    assert a.get(rtxn, b"k" * 8) == b"from-a"
    assert b.get(rtxn, b"k" * 8) is None


def test_map_size_enforced(tmp_path, env_cls):
    env = env_cls(tmp_path / "small", map_size=1024)
    db = env.create_database(None, None)
    wtxn = env.write_txn()
    with pytest.raises(DatabaseFull):
        for i in range(100):
            db.put(wtxn, Key.item(0, i).to_bytes(), b"x" * 64)
    wtxn.abort()
    env.close()


def test_compaction_preserves_data(tmp_path, env_cls):
    env = env_cls(tmp_path / "db")
    db = env.create_database(None, "t")
    for round_ in range(5):
        with env.write_txn() as wtxn:
            for i in range(50):
                db.put(wtxn, Key.item(0, i).to_bytes(), bytes([round_]) * 32)
    env.compact()
    assert db.get(env.read_txn(), Key.item(0, 49).to_bytes()) == bytes([4]) * 32
    env.close()
    env2 = env_cls(tmp_path / "db")
    db2 = env2.create_database(None, "t")
    assert db2.get(env2.read_txn(), Key.item(0, 0).to_bytes()) == bytes([4]) * 32
    env2.close()


def test_backends_share_on_disk_format(tmp_path):
    """The native C++ engine and the Python backend read each other's files."""
    path = tmp_path / "db"
    py = Env(path)
    db = py.create_database(None, "t")
    with py.write_txn() as wtxn:
        for i in range(20):
            db.put(wtxn, Key.item(3, i).to_bytes(), bytes([i]) * 10)
        db.delete(wtxn, Key.item(3, 5).to_bytes())
    py.close()

    nat = NativeEnv(path)
    ndb = nat.create_database(None, "t")
    rtxn = nat.read_txn()
    assert ndb.get(rtxn, Key.item(3, 7).to_bytes()) == bytes([7]) * 10
    assert ndb.get(rtxn, Key.item(3, 5).to_bytes()) is None
    got = [Key.from_bytes(k).item for k, _ in ndb.prefix_iter(rtxn, Prefix.item(3))]
    assert got == [i for i in range(20) if i != 5]
    with nat.write_txn() as wtxn:
        ndb.put(wtxn, Key.item(3, 100).to_bytes(), b"from-native")
    nat.close()

    py2 = Env(path)
    db2 = py2.create_database(None, "t")
    assert db2.get(py2.read_txn(), Key.item(3, 100).to_bytes()) == b"from-native"
    py2.close()


def test_native_bulk_rows(tmp_path):
    nat = NativeEnv(tmp_path / "db")
    db = nat.create_database(None, None)
    with nat.write_txn() as w:
        for i in range(10):
            db.put(w, Key.item(0, i).to_bytes(), b"HDR" + bytes([i]) * 4)
    keys, rows = db.bulk_rows(nat.read_txn(), Prefix.item(0), skip=3, row_bytes=4, cap=64)
    assert len(keys) == 10
    assert rows[3].tolist() == [3, 3, 3, 3]
    nat.close()


def _child_env():
    """Environment for subprocess tests: plain CPU jax WITHOUT the axon
    TPU plugin. The plugin's sitecustomize registers against the chip
    relay at interpreter start and can block indefinitely when the shared
    chip's grant is contended — none of these children need a device."""
    import os as _os

    repo = _os.path.dirname(_os.path.dirname(_os.path.abspath(__file__)))
    env = {
        k: v
        for k, v in _os.environ.items()
        if not k.startswith(("PALLAS_AXON", "AXON_"))
    }
    env["PYTHONPATH"] = repo
    env["JAX_PLATFORMS"] = "cpu"
    return env


def test_single_process_ownership(tmp_path, env_cls):
    """A second process must not co-own the log (LMDB coordinates via
    shared locks; our append-only log takes an exclusive flock)."""
    import subprocess
    import sys

    path = tmp_path / "db"
    env = env_cls(path)
    db = env.create_database(None, None)
    with env.write_txn() as w:
        db.put(w, Key.item(0, 1).to_bytes(), b"x")
    code = (
        "from hannoy_tpu.store import %s as E\n"
        "from hannoy_tpu.errors import StoreError\n"
        "try:\n"
        "    E(%r)\n"
        "    print('OPENED')\n"
        "except StoreError:\n"
        "    print('LOCKED')\n"
    ) % (env_cls.__name__, str(path))
    out = subprocess.run(
        [sys.executable, "-c", code],
        capture_output=True, text=True, timeout=240,
        env=_child_env(),
    )
    assert "LOCKED" in out.stdout, out.stdout + out.stderr
    env.close()
    # after close, a new process can take ownership
    out = subprocess.run(
        [sys.executable, "-c", code],
        capture_output=True, text=True, timeout=240,
        env=_child_env(),
    )
    assert "OPENED" in out.stdout, out.stdout + out.stderr


def test_put_many_and_streaming_scan(tmp_path, env_cls):
    """Batched put + streaming value scan roundtrip, including overlay
    visibility inside an uncommitted write txn (the native hny_scan_vals
    merge path)."""
    env = env_cls(tmp_path / "pm")
    db = env.create_database(None, None)
    keys = [Key.item(0, i).to_bytes() for i in range(50)]
    vals = [bytes([i]) * (i + 1) for i in range(50)]
    with env.write_txn() as w:
        db.put_many(w, keys, vals)
    with env.write_txn() as w:
        # overlay put + tombstone over committed data, seen mid-txn
        db.put(w, Key.item(0, 100).to_bytes(), b"fresh")
        db.delete(w, Key.item(0, 3).to_bytes())
        got = dict(db.prefix_iter(w, Prefix.item(0)))
        assert got[Key.item(0, 100).to_bytes()] == b"fresh"
        assert Key.item(0, 3).to_bytes() not in got
        assert got[Key.item(0, 7).to_bytes()] == vals[7]
        assert len(got) == 50  # 50 committed - 1 deleted + 1 fresh
        w.abort()
    got = dict(db.prefix_iter(env.read_txn(), Prefix.item(0)))
    assert len(got) == 50 and got[Key.item(0, 3).to_bytes()] == vals[3]
    env.close()


def test_lock_survives_compaction(tmp_path, env_cls):
    """Single-writer exclusivity must hold across compaction: the lock is
    on a sidecar file, not the renamed log."""
    import subprocess
    import sys

    path = tmp_path / "cl"
    env = env_cls(path)
    db = env.create_database(None, None)
    with env.write_txn() as w:
        for i in range(20):
            db.put(w, Key.item(0, i).to_bytes(), b"v" * 100)
    env.compact()
    code = (
        f"from hannoy_tpu.store import {env_cls.__name__} as E\n"
        "from hannoy_tpu.errors import StoreError\n"
        "try:\n"
        f"    E({str(path)!r})\n"
        "    print('OPENED')\n"
        "except StoreError:\n"
        "    print('LOCKED')\n"
    )
    out = subprocess.run(
        [sys.executable, "-c", code], capture_output=True, text=True, timeout=240,
        env=_child_env(),
    )
    assert "LOCKED" in out.stdout, out.stdout + out.stderr
    env.close()


def test_snapshot_reopen(tmp_path):
    """Native reopen snapshot: hannoy.snap seeds the tables and only the
    log suffix is replayed — reopen sees snapshot rows, suffix rows, and
    suffix deletes over snapshot rows."""
    path = tmp_path / "snap"
    env = NativeEnv(path)
    db = env.create_database(None, None)
    with env.write_txn() as w:
        for i in range(200):
            db.put(w, Key.item(0, i).to_bytes(), bytes([i % 251]) * (i % 37 + 1))
    env.snapshot()
    assert os.path.exists(path / "hannoy.snap")
    # suffix after the snapshot: new rows + deletes of snapshotted rows
    with env.write_txn() as w:
        for i in range(200, 230):
            db.put(w, Key.item(0, i).to_bytes(), b"suffix")
        for i in range(0, 10):
            db.delete(w, Key.item(0, i).to_bytes())
    env.close()

    env2 = NativeEnv(path)
    db2 = env2.create_database(None, None)
    r = env2.read_txn()
    assert db2.get(r, Key.item(0, 5).to_bytes()) is None  # suffix delete
    assert db2.get(r, Key.item(0, 50).to_bytes()) == bytes([50]) * (50 % 37 + 1)
    assert db2.get(r, Key.item(0, 210).to_bytes()) == b"suffix"
    assert db2.len(r) == 220
    env2.close()


def test_snapshot_stale_is_rejected(tmp_path):
    """A snapshot whose covered log prefix changed (python-backend
    compaction rewrites the file) must not poison a later native open."""
    path = tmp_path / "stale"
    env = NativeEnv(path)
    db = env.create_database(None, None)
    with env.write_txn() as w:
        for i in range(100):
            db.put(w, Key.item(0, i).to_bytes(), b"x" * 64)
    env.snapshot()
    with env.write_txn() as w:
        for i in range(50):
            db.delete(w, Key.item(0, i).to_bytes())
    env.close()

    # python backend compacts (rewrites the prefix and unlinks the snap)
    py = Env(path)
    py.compact()
    py.close()
    assert not os.path.exists(path / "hannoy.snap")

    env2 = NativeEnv(path)
    db2 = env2.create_database(None, None)
    r = env2.read_txn()
    assert db2.len(r) == 50
    assert db2.get(r, Key.item(0, 10).to_bytes()) is None
    assert db2.get(r, Key.item(0, 99).to_bytes()) == b"x" * 64
    env2.close()

    # a snap with mismatched probes (copied from another store) is ignored
    other = NativeEnv(tmp_path / "other")
    odb = other.create_database(None, None)
    with other.write_txn() as w:
        odb.put(w, Key.item(0, 7).to_bytes(), b"WRONG")
    other.snapshot()
    other.close()
    import shutil

    shutil.copy(tmp_path / "other" / "hannoy.snap", path / "hannoy.snap")
    env3 = NativeEnv(path)
    db3 = env3.create_database(None, None)
    r3 = env3.read_txn()
    assert db3.get(r3, Key.item(0, 7).to_bytes()) is None  # not poisoned
    assert db3.len(r3) == 50
    env3.close()


def test_snapshot_then_compact_then_reopen(tmp_path):
    """Native compaction reseeds the snapshot for the new prefix."""
    path = tmp_path / "sc"
    env = NativeEnv(path)
    db = env.create_database(None, None)
    with env.write_txn() as w:
        for i in range(64):
            db.put(w, Key.item(0, i).to_bytes(), b"v" * 32)
    with env.write_txn() as w:
        for i in range(32):
            db.delete(w, Key.item(0, i).to_bytes())
    env.compact()
    assert os.path.exists(path / "hannoy.snap")
    env.close()
    env2 = NativeEnv(path)
    db2 = env2.create_database(None, None)
    r = env2.read_txn()
    assert db2.len(r) == 32
    env2.close()
