"""Wave-parallel device builder tests (SURVEY §7 stage 6).

Validation strategy mirrors the reference's (SURVEY §4): graph invariant
checking after every build, the reachability property (search k=n returns
everything), the deletion property (no edge to a deleted slot survives),
recall parity vs the exact oracle, and determinism under a fixed seed.
"""

import numpy as np
import pytest

import jax.numpy as jnp

from hannoy_tpu.build.builder import BuildOptions, build_graph
from hannoy_tpu.errors import BuildCancelled
from hannoy_tpu.models.flat import flat_topk
from hannoy_tpu.models.hnsw import HostGraph, slot_capacity, to_device
from hannoy_tpu.ops import beam, codecs, distances
from hannoy_tpu.ops.distances import BQ_COSINE, COSINE, EUCLIDEAN


def stage(metric, data, ids, m=12, m0=24):
    """Stage vectors into a HostGraph the way Writer.build will."""
    n, dims = data.shape
    g = HostGraph.empty(metric, dims, m, m0, capacity=slot_capacity(n))
    packed = codecs.pack(data, metric.codec)
    norms = distances.np_norms(metric, packed)
    slots = np.empty(n, dtype=np.int64)
    for i in range(n):
        s = g.alloc_slot(int(ids[i]))
        slots[i] = s
        g.vectors[s] = packed[i]
        g.norms[s] = norms[i]
    return g, slots


def search_recall(g, queries, k, ef, metric):
    dev = to_device(g)
    p = codecs.pack(queries, metric.codec)
    q = jnp.asarray(p)
    qn = jnp.asarray(distances.np_norms(metric, p))
    ed, es = flat_topk(metric.name, q, qn, dev.vectors, dev.norms, dev.valid, k)
    res = beam.hnsw_search(dev, q, qn, ef)
    fd, ed = np.asarray(res.dists), np.asarray(ed)
    thresh = ed[:, k - 1 : k] + 1e-6
    return float((fd[:, :k] <= thresh).mean())


@pytest.mark.parametrize("metric", [EUCLIDEAN, COSINE, BQ_COSINE], ids=lambda m: m.name.split()[-1])
def test_fresh_build_recall(rng, metric):
    n, d, k = 1500, 32, 10
    data = rng.standard_normal((n, d)).astype(np.float32)
    g, slots = stage(metric, data, np.arange(n))
    opts = BuildOptions(ef_construction=64, wave_size=128)
    build_graph(g, slots, np.empty(0, dtype=np.int64), opts)
    g.check_validity()
    queries = rng.standard_normal((16, d)).astype(np.float32)
    rec = search_recall(g, queries, k, ef=100, metric=metric)
    # floors sit ~2-4 points under the measured operating points (seeds
    # 42/1/2: euclidean 0.94-1.0, packed metrics 1.0) so a real quality
    # regression fails; the reference's published r@10 at this regime is
    # ~0.93-0.95 (BASELINE.md)
    floor = 0.95 if metric.is_packed else 0.92
    assert rec >= floor, f"wave-built recall@{k}={rec} for {metric.name}"


def test_build_is_deterministic(rng):
    n, d = 600, 16
    data = rng.standard_normal((n, d)).astype(np.float32)
    graphs = []
    for _ in range(2):
        g, slots = stage(EUCLIDEAN, data, np.arange(n))
        build_graph(g, slots, np.empty(0, dtype=np.int64), BuildOptions(wave_size=128))
        graphs.append(g)
    a, b = graphs
    assert np.array_equal(a.links0, b.links0)
    assert a.entry_slots == b.entry_slots
    assert a.max_level == b.max_level
    for l in range(len(a.upper_links)):
        assert np.array_equal(a.upper_links[l], b.upper_links[l])


def test_reachability_k_equals_n(rng):
    """search(k=n) returns all items (reference proptest
    all_items_are_reachable, src/tests/reader.rs:101-111)."""
    n, d = 300, 16
    data = rng.standard_normal((n, d)).astype(np.float32)
    g, slots = stage(EUCLIDEAN, data, np.arange(n), m=8, m0=16)
    build_graph(g, slots, np.empty(0, dtype=np.int64), BuildOptions(wave_size=64))
    dev = to_device(g)
    p = codecs.pack(rng.standard_normal((4, d)).astype(np.float32), EUCLIDEAN.codec)
    q, qn = jnp.asarray(p), jnp.asarray(distances.np_norms(EUCLIDEAN, p))
    res = beam.hnsw_search(dev, q, qn, ef=n, max_iters=4 * n)
    for row in np.asarray(res.slots):
        missing = set(slots.tolist()) - set(row.tolist())
        assert not missing, f"{len(missing)} items unreachable"


def test_incremental_insert(rng):
    n1, n2, d = 800, 400, 16
    data = rng.standard_normal((n1 + n2, d)).astype(np.float32)
    g, slots = stage(EUCLIDEAN, data[:n1], np.arange(n1))
    build_graph(g, slots[:n1], np.empty(0, dtype=np.int64), BuildOptions(wave_size=128))

    # stage and insert the second batch incrementally
    packed = codecs.pack(data[n1:], EUCLIDEAN.codec)
    norms = distances.np_norms(EUCLIDEAN, packed)
    new_slots = np.empty(n2, dtype=np.int64)
    g.grow(slot_capacity(n1 + n2))
    for i in range(n2):
        s = g.alloc_slot(n1 + i)
        new_slots[i] = s
        g.vectors[s] = packed[i]
        g.norms[s] = norms[i]
    build_graph(g, new_slots, np.empty(0, dtype=np.int64), BuildOptions(wave_size=128))
    g.check_validity()
    assert g.n_items == n1 + n2

    rec = search_recall(g, rng.standard_normal((16, d)).astype(np.float32), 10, 100, EUCLIDEAN)
    assert rec >= 0.93, f"incremental recall {rec}"


def test_delete_then_build_repairs(rng):
    """Deletion property: no link to a deleted slot survives anywhere
    (reference fuzz invariant, src/tests/fuzz.rs:39-77), and recall holds
    after the FreshDiskANN repair pass."""
    n, d = 1000, 16
    data = rng.standard_normal((n, d)).astype(np.float32)
    g, slots = stage(EUCLIDEAN, data, np.arange(n))
    build_graph(g, slots, np.empty(0, dtype=np.int64), BuildOptions(wave_size=128))

    doomed = slots[rng.choice(n, size=200, replace=False)]
    build_graph(g, np.empty(0, dtype=np.int64), doomed, BuildOptions(wave_size=128))
    for s in doomed:
        g.release_slot(int(s))
    g.check_validity()
    doomed_set = set(int(x) for x in doomed)
    assert not (set(g.entry_slots) & doomed_set)
    for s in np.nonzero(g.valid_mask())[0]:
        for level in range(int(g.levels[s]) + 1):
            assert not (set(g.links_of(int(s), level).tolist()) & doomed_set)

    rec = search_recall(g, rng.standard_normal((16, d)).astype(np.float32), 10, 100, EUCLIDEAN)
    assert rec >= 0.9, f"post-delete recall {rec}"


def test_delete_entry_points(rng):
    """Deleting every entry point forces replacement from lower layers
    (hnsw.rs:242-257; reference issues #52/#74 territory)."""
    n, d = 500, 16
    data = rng.standard_normal((n, d)).astype(np.float32)
    g, slots = stage(EUCLIDEAN, data, np.arange(n))
    build_graph(g, slots, np.empty(0, dtype=np.int64), BuildOptions(wave_size=128))
    doomed = np.asarray(sorted(g.entry_slots), dtype=np.int64)
    build_graph(g, np.empty(0, dtype=np.int64), doomed, BuildOptions(wave_size=128))
    for s in doomed:
        g.release_slot(int(s))
    g.check_validity()
    assert g.entry_slots, "entry points must be replaced after deletion"


def test_delete_everything(rng):
    """Delete-all leaves an empty but consistent graph (reference issue #52
    empty-index edge case, src/tests/writer.rs:47-65)."""
    n, d = 200, 8
    data = rng.standard_normal((n, d)).astype(np.float32)
    g, slots = stage(EUCLIDEAN, data, np.arange(n), m=4, m0=8)
    build_graph(g, slots, np.empty(0, dtype=np.int64), BuildOptions(wave_size=64))
    build_graph(g, np.empty(0, dtype=np.int64), slots, BuildOptions(wave_size=64))
    for s in slots:
        g.release_slot(int(s))
    assert g.n_items == 0
    assert g.max_level == 0  # whole-graph deletion resets height


def test_cancellation(rng):
    n, d = 400, 8
    data = rng.standard_normal((n, d)).astype(np.float32)
    g, slots = stage(EUCLIDEAN, data, np.arange(n), m=4, m0=8)
    calls = {"n": 0}

    def cancel():
        calls["n"] += 1
        return calls["n"] > 2

    with pytest.raises(BuildCancelled):
        build_graph(g, slots, np.empty(0, dtype=np.int64), BuildOptions(wave_size=32, cancel=cancel))


def test_snapshot_structure(rng):
    """Golden-structure snapshot of a tiny deterministic build (the insta
    snapshot-test analogue, src/tests/writer.rs:110-128 — our waves are
    deterministic even in parallel, so no thread pinning is needed)."""
    data = rng.standard_normal((12, 4)).astype(np.float32)
    g, slots = stage(EUCLIDEAN, data, np.arange(12), m=4, m0=8)
    build_graph(g, slots, np.empty(0, dtype=np.int64), BuildOptions(wave_size=16, seed=42))
    dump = []
    for s in sorted(np.nonzero(g.valid_mask())[0]):
        for level in range(int(g.levels[s]) + 1):
            links = ",".join(str(int(x)) for x in sorted(g.links_of(int(s), level)))
            dump.append(f"{int(g.ids[s])}@{level}:[{links}]")
    snapshot = ";".join(dump) + f"|eps={sorted(int(g.ids[e]) for e in g.entry_slots)}|L={g.max_level}"
    # structure must be byte-stable across runs on the same versions
    g2, slots2 = stage(EUCLIDEAN, data, np.arange(12), m=4, m0=8)
    build_graph(g2, slots2, np.empty(0, dtype=np.int64), BuildOptions(wave_size=16, seed=42))
    dump2 = []
    for s in sorted(np.nonzero(g2.valid_mask())[0]):
        for level in range(int(g2.levels[s]) + 1):
            links = ",".join(str(int(x)) for x in sorted(g2.links_of(int(s), level)))
            dump2.append(f"{int(g2.ids[s])}@{level}:[{links}]")
    snapshot2 = ";".join(dump2) + f"|eps={sorted(int(g2.ids[e]) for e in g2.entry_slots)}|L={g2.max_level}"
    assert snapshot == snapshot2
    # every node has at least one link at layer 0 on a 12-item graph
    for s in np.nonzero(g.valid_mask())[0]:
        assert len(g.links_of(int(s), 0)) > 0


def test_bf16_storage_recall(rng, monkeypatch):
    """Opt-in bfloat16 HBM storage keeps recall (HANNOY_TPU_BF16=1)."""
    monkeypatch.setenv("HANNOY_TPU_BF16", "1")
    n, d, k = 1000, 32, 10
    data = rng.standard_normal((n, d)).astype(np.float32)
    g, slots = stage(COSINE, data, np.arange(n), m=8, m0=16)
    build_graph(g, slots, np.empty(0, dtype=np.int64), BuildOptions(ef_construction=48, wave_size=128))
    g.check_validity()
    dev = to_device(g)
    assert dev.vectors.dtype == jnp.bfloat16
    rec = search_recall(g, rng.standard_normal((16, d)).astype(np.float32), k, 100, COSINE)
    assert rec >= 0.92, f"bf16 recall {rec}"


def test_int8_storage_recall(rng, monkeypatch):
    """Opt-in int8 HBM tier (HANNOY_TPU_INT8=1): 4x capacity for cosine —
    rows stored as round(127*v/|v|) with the scale folded into the norm
    header (models/hnsw.py to_device)."""
    monkeypatch.setenv("HANNOY_TPU_INT8", "1")
    n, d, k = 1000, 32, 10
    data = rng.standard_normal((n, d)).astype(np.float32)
    g, slots = stage(COSINE, data, np.arange(n), m=8, m0=16)
    build_graph(g, slots, np.empty(0, dtype=np.int64), BuildOptions(ef_construction=48, wave_size=128))
    g.check_validity()
    dev = to_device(g)
    assert dev.vectors.dtype == jnp.int8
    rec = search_recall(g, rng.standard_normal((16, d)).astype(np.float32), k, 100, COSINE)
    assert rec >= 0.92, f"int8 recall {rec}"


def test_int8_storage_recall_euclidean(rng, monkeypatch):
    """int8 tier for euclidean (VERDICT r3 #10): per-row max-abs scale in
    the norm header, dequantized after every gather — recall tolerance
    matches the bf16/cosine-int8 tier tests."""
    monkeypatch.setenv("HANNOY_TPU_INT8", "1")
    n, d, k = 1000, 32, 10
    data = rng.standard_normal((n, d)).astype(np.float32)
    g, slots = stage(EUCLIDEAN, data, np.arange(n), m=8, m0=16)
    build_graph(g, slots, np.empty(0, dtype=np.int64), BuildOptions(ef_construction=48, wave_size=128))
    g.check_validity()
    dev = to_device(g)
    assert dev.vectors.dtype == jnp.int8
    # measure against EXACT f32 ground truth (id intersection), so the
    # quantization error itself is under test, not just graph quality
    queries = rng.standard_normal((16, d)).astype(np.float32)
    from hannoy_tpu.ops import beam as _beam

    q = jnp.asarray(queries)
    qn = jnp.asarray(np.zeros(len(queries), np.float32))
    res = _beam.hnsw_search(dev, q, qn, 100)
    found = np.asarray(res.slots)[:, :k]
    exact = np.argsort(
        ((queries[:, None, :] - data[None, :, :]) ** 2).sum(-1), axis=1
    )[:, :k]
    inter = [
        len(set(found[b].tolist()) & set(exact[b].tolist())) for b in range(len(queries))
    ]
    rec = sum(inter) / (len(queries) * k)
    assert rec >= 0.9, f"int8 euclidean recall vs f32 truth {rec}"


def test_chain_seeded_build_recall(rng):
    """Chain-seeded waves (layer-0 waves after the first ≥1024-wide one):
    each item seeds from its nearest previous-wave member's pruned row and
    refines with a ~2× smaller beam budget. Quality must match the
    full-budget build (clustered data — the regime where weak seeding
    would show up as lost recall)."""
    n, d, k = 6000, 256, 10
    centers = rng.standard_normal((48, d)).astype(np.float32) * 4.0
    data = (centers[rng.integers(0, 48, size=n)] + rng.standard_normal((n, d))).astype(
        np.float32
    )
    g, slots = stage(COSINE, data, np.arange(n))
    opts = BuildOptions(ef_construction=48, wave_size=4096, chain_seeding=True)
    build_graph(g, slots, np.empty(0, dtype=np.int64), opts)
    g.check_validity()
    queries = (centers[rng.integers(0, 48, size=16)] + rng.standard_normal((16, d))).astype(
        np.float32
    )
    rec = search_recall(g, queries, k, ef=100, metric=COSINE)
    assert rec >= 0.95, f"chain-seeded build recall@{k}={rec}"


def test_chain_seeded_build_is_deterministic(rng):
    n, d = 5000, 256
    data = rng.standard_normal((n, d)).astype(np.float32)
    graphs = []
    for _ in range(2):
        g, slots = stage(COSINE, data, np.arange(n))
        build_graph(
            g, slots, np.empty(0, dtype=np.int64),
            BuildOptions(ef_construction=32, wave_size=4096, chain_seeding=True),
        )
        graphs.append(g)
    a, b = graphs
    assert np.array_equal(a.links0, b.links0)
    assert a.entry_slots == b.entry_slots


def test_in_wave_cancellation_fires_mid_wave(rng):
    """A cancel firing during a single wide wave must abort inside that
    wave's beam (probed per device chunk — reference probes every
    CANCELLATION_PROBING ops in its insert loop, hnsw.rs:174-177), not
    after the wave completes."""
    from hannoy_tpu.build import builder as _b

    n = 3000
    data = rng.standard_normal((n, 16)).astype(np.float32)
    metric = distances.COSINE
    g = HostGraph.empty(metric, 16, 8, 16, capacity=slot_capacity(n))
    packed = codecs.pack(data, metric.codec)
    norms = distances.np_norms(metric, packed)
    slots = np.arange(n, dtype=np.int64)
    for i in range(n):
        g.alloc_slot(i)
    g.vectors[:n] = packed
    g.norms[:n] = norms

    calls = {"n": 0}

    def cancel():
        calls["n"] += 1
        # let the ramp pass the flat bootstrap, then fire while a wide
        # wave's chunked beam is mid-flight
        return calls["n"] > 40

    with pytest.raises(BuildCancelled):
        build_graph(
            g, slots, np.empty(0, dtype=np.int64),
            BuildOptions(ef_construction=48, wave_size=2048, cancel=cancel, bulk=False),
        )
    # the chunked path really ran: far more probes than waves
    assert calls["n"] > 40


def test_cancellable_build_matches_fused_build(rng):
    """The chunked (cancellable) construction beam must produce the same
    graph as the fused path — same algorithm, different dispatch shape."""
    n = 1500
    data = rng.standard_normal((n, 16)).astype(np.float32)
    metric = distances.COSINE
    graphs = []
    for cancel in (None, lambda: False):
        g = HostGraph.empty(metric, 16, 8, 16, capacity=slot_capacity(n))
        packed = codecs.pack(data, metric.codec)
        norms = distances.np_norms(metric, packed)
        slots = np.arange(n, dtype=np.int64)
        for i in range(n):
            g.alloc_slot(i)
        g.vectors[:n] = packed
        g.norms[:n] = norms
        kw = dict(ef_construction=32, wave_size=256, bulk=False)
        if cancel is not None:
            kw["cancel"] = cancel
        build_graph(g, slots, np.empty(0, dtype=np.int64), BuildOptions(**kw))
        graphs.append(g)
    assert np.array_equal(graphs[0].links0, graphs[1].links0)


def test_force_inbound_victim_aware_columns(rng):
    """The end-of-build force-link must displace a destination column
    whose occupant can afford to lose an in-edge — never an occupant
    whose ONLY in-edge it is (round-4 ping-pong: two out-degree-1 rows
    sharing one full hub displaced each other's only in-edge across all
    12 re-check rounds; see wave_ops.force_inbound_for)."""
    from hannoy_tpu.build import wave_ops

    m, m0 = 2, 4
    n = 8
    data = rng.standard_normal((n, 16)).astype(np.float32)
    g, slots = stage(EUCLIDEAN, data, np.arange(n), m=m, m0=m0)
    g.levels[:n] = 0
    # hub 0: full row [3, 4, 5, 6]; occupant 6's ONLY in-edge is from the
    # hub; occupants 3, 4, 5 have a second in-edge from row 7.
    g.links0[0, :] = [3, 4, 5, 6]
    g.dists0[0, :] = [0.1, 0.2, 0.3, 0.4]
    for s, tgt in ((1, 0), (2, 0), (3, 0), (4, 0), (5, 0), (6, 0)):
        g.links0[s, 0] = tgt
        g.dists0[s, 0] = 0.5
    g.links0[7, :3] = [3, 4, 5]
    g.dists0[7, :3] = [0.6, 0.7, 0.8]

    dev = to_device(g)
    indeg, outdeg = wave_ops.layer0_degrees(dev, cap=m0)
    indeg_np = np.asarray(indeg)
    assert indeg_np[1] == 0 and indeg_np[2] == 0  # the stranded pair
    assert indeg_np[6] == 1  # the must-not-displace occupant

    stranded = np.full(16, -1, dtype=np.int32)
    stranded[:2] = [1, 2]
    dirty = jnp.zeros((g.capacity,), dtype=bool)
    counters = jnp.zeros((4,), dtype=jnp.int32)
    dev, dirty, counters = wave_ops.force_inbound_for(
        dev, jnp.asarray(stranded), indeg, dirty, counters,
        shift=0, write_cap=m0,
    )
    ind2 = np.asarray(wave_ops.layer0_indegree(dev, cap=m0))
    assert ind2[1] >= 1 and ind2[2] >= 1, "stranded pair not repaired"
    assert ind2[6] >= 1, "sole in-edge of occupant 6 was displaced"
    assert 6 in np.asarray(dev.links0[0, :m0]).tolist()
