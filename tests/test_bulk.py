"""Tests for the bulk cluster-blocked fresh-build path (build/bulk.py).

The bulk builder must produce graphs that are (a) structurally valid by
the same invariants as the wave path, (b) searchable at recall parity,
(c) deterministic, and (d) interchangeable with the wave path through the
whole Writer/Reader/store stack (the store is id-keyed, so the build path
is an implementation detail — reference semantics writer.rs:521-603).
"""

from __future__ import annotations

import numpy as np
import pytest

import jax.numpy as jnp

from hannoy_tpu.build.builder import BuildOptions, build_graph
from hannoy_tpu.models.flat import flat_topk
from hannoy_tpu.models.hnsw import HostGraph, slot_capacity, to_device
from hannoy_tpu.ops import beam, codecs, distances


def _clustered(n, d, seed=42, n_clusters=None):
    rng = np.random.default_rng(seed)
    n_clusters = n_clusters or max(16, n // 256)
    centers = rng.standard_normal((n_clusters, d)).astype(np.float32) * 4.0
    assign = rng.integers(0, n_clusters, size=n)
    return (centers[assign] + rng.standard_normal((n, d))).astype(np.float32), centers


def _staged(metric, data, m=8, m0=16):
    n, d = data.shape
    g = HostGraph.empty(metric, d, m, m0, capacity=slot_capacity(n))
    packed = codecs.pack(data, metric.codec)
    norms = distances.np_norms(metric, packed)
    for i in range(n):
        g.alloc_slot(i)
    g.vectors[:n] = packed
    g.norms[:n] = norms
    return g, np.arange(n, dtype=np.int64)


def _recall(g, queries, k=10, ef=64):
    dev = to_device(g)
    qp = codecs.pack(queries, g.metric.codec)
    q = jnp.asarray(qp)
    qn = jnp.asarray(distances.np_norms(g.metric, qp))
    exact_d, _ = flat_topk(g.metric.name, q, qn, dev.vectors, dev.norms, dev.valid, k)
    thresh = np.asarray(exact_d)[:, k - 1 : k] + 1e-6
    res = beam.hnsw_search(dev, q, qn, ef)
    return float((np.asarray(res.dists)[:, :k] <= thresh).mean())


@pytest.mark.parametrize("metric", [distances.COSINE, distances.EUCLIDEAN])
def test_bulk_build_valid_and_searchable(metric):
    data, centers = _clustered(6000, 32)
    g, slots = _staged(metric, data)
    stats = build_graph(
        g, slots, np.empty(0, dtype=np.int64),
        BuildOptions(ef_construction=32, bulk=True),
    )
    g.check_validity()
    assert stats.links_added > 0
    qi = np.random.default_rng(7).integers(0, len(centers), size=64)
    queries = (centers[qi] + np.random.default_rng(7).standard_normal((64, 32))).astype(
        np.float32
    )
    assert _recall(g, queries) >= 0.9


def test_bulk_uses_cluster_path_and_matches_recall(monkeypatch):
    """Above BRUTE_MAX the k-means adjacency path must hold recall."""
    from hannoy_tpu.build import bulk as bulk_mod

    monkeypatch.setattr(bulk_mod, "BRUTE_MAX", 512)
    data, centers = _clustered(6000, 32)
    g, slots = _staged(distances.COSINE, data)
    build_graph(
        g, slots, np.empty(0, dtype=np.int64),
        BuildOptions(ef_construction=32, bulk=True, bulk_cluster_size=256),
    )
    g.check_validity()
    qi = np.random.default_rng(8).integers(0, len(centers), size=64)
    queries = (centers[qi] + np.random.default_rng(8).standard_normal((64, 32))).astype(
        np.float32
    )
    assert _recall(g, queries) >= 0.9


def test_bulk_build_is_deterministic():
    data, _ = _clustered(4000, 24)
    graphs = []
    for _ in range(2):
        g, slots = _staged(distances.COSINE, data)
        build_graph(
            g, slots, np.empty(0, dtype=np.int64),
            BuildOptions(ef_construction=32, bulk=True),
        )
        graphs.append(g)
    a, b = graphs
    assert np.array_equal(a.links0, b.links0)
    assert a.entry_slots == b.entry_slots
    for l in range(len(a.upper_links)):
        assert np.array_equal(a.upper_links[l], b.upper_links[l])


def _id_graph(g):
    """Every (item id, level) → sorted neighbor item ids — the
    numbering-independent view of the whole graph."""
    out = {}
    for s in np.nonzero(g.levels >= 0)[0]:
        for level in range(int(g.levels[s]) + 1):
            out[(int(g.ids[s]), level)] = sorted(
                int(g.ids[x]) for x in g.links_of(int(s), level)
            )
    return out


def test_bulk_renumber_permutes_but_preserves_results():
    data, _ = _clustered(4000, 24)
    out = {}
    id_graphs = {}
    for renum in (False, True):
        g, slots = _staged(distances.COSINE, data)
        build_graph(
            g, slots, np.empty(0, dtype=np.int64),
            BuildOptions(ef_construction=32, bulk=True, bulk_renumber=renum),
        )
        g.check_validity()
        id_graphs[renum] = _id_graph(g)
        dev = to_device(g)
        qp = codecs.pack(data[:32], distances.COSINE.codec)
        q = jnp.asarray(qp)
        qn = jnp.asarray(distances.np_norms(distances.COSINE, qp))
        res = beam.hnsw_search(dev, q, qn, 32)
        slots_found = np.asarray(res.slots)[:, :10]
        ids = np.where(slots_found >= 0, g.ids[np.maximum(slots_found, 0)], -1)
        out[renum] = ids
    # renumbering must be a pure relabeling: the id-keyed graph —
    # including every upper layer reached through slot_rows — is
    # byte-identical (catches a desynced host slot_rows table, which
    # silently breaks the descent at scale while small-scale searches
    # still succeed)
    assert id_graphs[False] == id_graphs[True]
    # same item ids found regardless of the internal slot numbering
    assert np.array_equal(out[False], out[True])


def test_permute_roundtrip_invariants():
    data, _ = _clustered(3000, 16)
    g, slots = _staged(distances.COSINE, data)
    build_graph(
        g, slots, np.empty(0, dtype=np.int64),
        BuildOptions(ef_construction=32, bulk=True, bulk_renumber=False),
    )
    ids_before = {
        int(g.ids[s]): sorted(int(g.ids[x]) for x in g.links_of(s, 0))
        for s in np.nonzero(g.levels >= 0)[0]
    }
    rng = np.random.default_rng(3)
    perm = rng.permutation(g.capacity)
    g.permute(perm)
    g.check_validity()
    ids_after = {
        int(g.ids[s]): sorted(int(g.ids[x]) for x in g.links_of(s, 0))
        for s in np.nonzero(g.levels >= 0)[0]
    }
    assert ids_before == ids_after


def test_bulk_through_writer_api(tmp_path):
    """Full store round trip: bulk-built index persists, reopens, and an
    incremental (wave-path) build extends it."""
    from hannoy_tpu import Database, Metric

    data, _ = _clustered(3000, 16)
    db = Database(tmp_path / "bulk.hannoy", Metric.COSINE)
    w = db.writer(dimensions=16, m=8)
    w.add_items(range(len(data)), data)
    w.builder().bulk(True).build()
    db.commit_rw_txn()

    r = db.reader()
    r.assert_validity()
    hits = r.by_vecs(data[:8], n=5, ef_search=48)
    assert all(row[0][0] == i for i, row in enumerate(hits))

    # incremental append goes down the wave path and must extend cleanly
    w.add_item(100000, data[0] + 0.01)
    w.builder().build()
    db.commit_rw_txn()
    r2 = db.reader()
    r2.assert_validity()
    found = [i for i, _ in r2.by_vecs(data[:1], n=3, ef_search=48)[0]]
    assert 100000 in found
    db.close()


def test_bulk_not_used_for_incremental(monkeypatch):
    """A dirty (incremental) build never routes through bulk."""
    from hannoy_tpu.build import bulk as bulk_mod

    called = {"n": 0}
    orig = bulk_mod.bulk_build

    def spy(*a, **k):
        called["n"] += 1
        return orig(*a, **k)

    monkeypatch.setattr(bulk_mod, "bulk_build", spy)
    data, _ = _clustered(2000, 16)
    g, slots = _staged(distances.COSINE, data)
    build_graph(
        g, slots, np.empty(0, dtype=np.int64),
        BuildOptions(ef_construction=32, bulk=True),
    )
    assert called["n"] == 1
    # second build with fresh items into the now-active graph: wave path
    g.grow(slot_capacity(len(data) + 4))
    extra = np.random.default_rng(5).standard_normal((4, 16)).astype(np.float32)
    packed = codecs.pack(extra, distances.COSINE.codec)
    nrm = distances.np_norms(distances.COSINE, packed)
    new_slots = []
    for j in range(4):
        s = g.alloc_slot(10_000 + j)
        g.vectors[s] = packed[j]
        g.norms[s] = nrm[j]
        new_slots.append(s)
    build_graph(
        g, np.asarray(new_slots, dtype=np.int64), np.empty(0, dtype=np.int64),
        BuildOptions(ef_construction=32, bulk=True),
    )
    assert called["n"] == 1  # unchanged — incremental stayed on waves


@pytest.mark.parametrize(
    "metric", [distances.HAMMING, distances.BQ_COSINE],
    ids=("hamming", "bq-cosine"),
)
def test_bulk_packed_metrics(metric, monkeypatch):
    """Packed metrics ride the bulk path (popcount-as-dot MXU candidates,
    k-means over the unpacked {0,1} space) at recall parity with the wave
    path — measured 20k×128 hamming: bulk 1.0 vs wave 0.9988 at ef=50."""
    from hannoy_tpu.build import bulk as bulk_mod

    monkeypatch.setattr(bulk_mod, "BRUTE_MAX", 1024)  # force the k-means path
    data, centers = _clustered(6000, 64)
    # packed metrics are auto-eligible at the fresh-build threshold
    assert bulk_mod.eligible(metric, 0, 0, 10_000, BuildOptions())
    g, slots = _staged(metric, data)
    build_graph(
        g, slots, np.empty(0, dtype=np.int64),
        BuildOptions(ef_construction=32, bulk=True, bulk_cluster_size=256),
    )
    g.check_validity()
    rng = np.random.default_rng(9)
    queries = (
        centers[rng.integers(0, len(centers), size=64)]
        + rng.standard_normal((64, 64))
    ).astype(np.float32)
    gw, slots_w = _staged(metric, data)
    build_graph(
        gw, slots_w, np.empty(0, dtype=np.int64),
        BuildOptions(ef_construction=32, bulk=False),
    )
    r_bulk = _recall(g, queries)
    r_wave = _recall(gw, queries)
    assert r_bulk >= min(0.93, r_wave - 0.02), (r_bulk, r_wave)
