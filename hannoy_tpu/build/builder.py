"""Wave-parallel HNSW construction — host orchestration.

The TPU-native replacement for ``HnswBuilder`` (reference hnsw.rs:57-216):
the host samples levels, resolves entry-point edge cases, composes
level-descending waves, and drives the jitted device steps in
``wave_ops.py``; all distance work happens on device.

Mapping to the reference call stack (SURVEY §3.1):
* level sampling                → ``levels.sample_levels`` (same quantiles)
* prepare_levels_and_entry_points (hnsw.rs:222-289) → ``prepare_entry_points``
  (same four edge cases: deleted-ep replacement, whole-graph-deleted reset,
  old-ep re-indexing, new-top-level promotion)
* rayon par_iter insert (hnsw.rs:172-185) → fixed-size waves per level group
* fill_gaps_from_deleted (hnsw.rs:334-415) → ``repair_deleted_rows`` blocks
* cancellation probing every CANCELLATION_PROBING ops (hnsw.rs:174-177)
  → a cancel check between device waves
* single-threaded LMDB flush (hnsw.rs:192-213) → ``HostGraph.flush_links``
  by the Writer after ``from_device``.
"""

from __future__ import annotations

import dataclasses
import os
from typing import Callable, Optional

import jax
import jax.numpy as jnp
import numpy as np

from ..errors import BuildCancelled
from ..models import hnsw
from ..models.hnsw import DeviceGraph, HostGraph
from ..ops import beam
from ..utils.progress import BuildStep, InsertItemsStep, NoProgress
from ..utils.tracing import span
from ..utils.stats import BuildStats
from . import bulk, wave_ops
from .levels import sample_levels

#: brute-force candidate search while the indexed graph is this small
FLAT_BOOTSTRAP = 1024
#: default wave width (items inserted per device step)
DEFAULT_WAVE = 256
#: rows repaired per device step in the deletion pass
REPAIR_BLOCK = 512
#: wave sizes snap to these buckets to bound jit compilations
_WAVE_BUCKETS = (16, 128, 1024, 4096)
#: a wave seeds the next only when it carried at least this many real
#: items (sparser prototype sets measurably cost recall)
_CHAIN_MIN_PREV = 1024
#: insertion-order rank for "never a candidate" columns (later groups,
#: deleted slots, table padding) in the triangular flat-candidate mask
_ORDER_INF = np.int32(2**30)
#: debug: fence after every wave so tracing spans attribute device time
#: truthfully (async dispatch otherwise smears it into the next fence)
_FENCE_WAVES = os.environ.get("HANNOY_TPU_FENCE_WAVES", "0") == "1"


def _ramp_width(W: int, n_active: int, divisor: int = 4) -> int:
    """Wave-size ramp, snapped to the compile-bounded buckets.

    A beam-based wave is blind to its own members (they link only to
    already-active nodes), so beam waves are capped at 1/``divisor`` of
    the active graph — the reference's racy threads see ~all prior
    inserts (hnsw.rs:172-185); this bounds our divergence. While the
    active graph is inside the flat bootstrap, candidates come from
    exact brute force (``_insert_wave`` use_flat), where width costs no
    quality — so the ramp there is ~the active count itself (doubling),
    not a fraction of it: a fresh hierarchy reaches 1024 actives in 7
    dispatches, not 25.
    """
    if n_active <= FLAT_BOOTSTRAP:
        w_i = min(W, max(16, n_active))
    else:
        w_i = min(W, max(16, n_active // divisor))
    w_pad = 16
    for b in _WAVE_BUCKETS:
        if b <= w_i:
            w_pad = b
    return min(w_pad, W)


def _never_cancel() -> bool:
    """Default cancel sentinel. Builds carrying it run each wave's beam
    as one fused device program (fastest); any other closure switches the
    layer-0 beam to host-probed chunks so cancellation fires *inside* a
    wave (reference probes every CANCELLATION_PROBING=10000 ops in its
    insert loop, hnsw.rs:174-177)."""
    return False


@dataclasses.dataclass
class BuildOptions:
    """Runtime build configuration (reference ``BuildOption``,
    writer.rs:34-58: ef_construction default 100, alpha default 1.0,
    cancel closure, progress sink)."""

    ef_construction: int = 100
    alpha: float = 1.0
    cancel: Callable[[], bool] = _never_cancel
    progress: object = dataclasses.field(default_factory=NoProgress)
    wave_size: int = DEFAULT_WAVE
    seed: int = 42
    #: extra layer-0 link columns during the build: incoming reverse edges
    #: accumulate in the slack by plain distance order and a row is
    #: α-pruned only when the slack overflows (plus one global prune pass
    #: at build end) — the DiskANN batched-build deferral of the
    #: reference's prune-on-overflow (hnsw.rs:523-560), which it reproduces
    #: exactly at slack=0. Measured on v5e (100k×768 cosine, efc=48):
    #: slack=0 builds 3755 vec/s at recall@10 0.976; slack=16 is *worse*
    #: on both axes (2477 vec/s, 0.959 — construction-time traversal sees
    #: distance-truncated rows), so 0 is the default and the knob exists
    #: for experimentation only.
    link_slack: int = 0
    #: pool entries expanded per construction-beam iteration (reference
    #: pops one per hop). E>1 gathers E rows' neighborhoods per iteration
    #: and divides the iteration budget by E — fewer sort/merge passes for
    #: the same candidate work.
    beam_expand: int = 1
    #: construction-beam iteration budget (None → (ef+16)/beam_expand).
    #: The v5e sweep lives in BENCH_NOTES.md; recall falls off a cliff
    #: below ~ef/2 expansions total.
    beam_iters: Optional[int] = None
    #: chain seeding: layer-0 waves after the first seed each item's beam
    #: from its nearest member of the *previous* wave and that member's
    #: freshly pruned link row (one [W, W_prev] MXU matmul replaces the
    #: upper-layer descent), running a reduced ``refine_iters`` budget.
    #: See wave_ops.proto_seed_rows. f32 dot metrics only. Default OFF:
    #: 2.4× faster on the CPU mesh, but on the v5e-via-tunnel rig the
    #: beam converges straggler-bound regardless of seed quality, so
    #: chaining saved no time and refine caps below convergence cost ~4
    #: recall points (BENCH_NOTES.md round 2). Enable on locally-attached
    #: hardware after measuring.
    chain_seeding: bool = False
    #: refine-beam iteration budget for chain-seeded items
    #: (None → max(16, (ef_construction+16)//2)).
    refine_iters: Optional[int] = None
    #: layer-0 construction beams stop once at most this fraction of the
    #: wave is still expanding (every loop iteration processes the whole
    #: wave, so the last stragglers otherwise charge their hops to all W
    #: rows — see beam.beam_search tail_frac). 0.0 = reference
    #: termination. Stragglers keep their pooled candidates. Measured on
    #: v5e (100k×768 clustered cosine): 0.05 trims ~7% of beam iterations
    #: at bit-identical recall.
    beam_tail_frac: float = 0.05
    #: construction beams expand only each row's nearest ``traverse``
    #: links (rows are distance-sorted; None = full row, the reference's
    #: behavior). The hot row gather has a per-row cost floor on TPU, so
    #: rank-truncated expansion is the main remaining throughput lever —
    #: see BENCH_NOTES.md for the measured recall trade.
    traverse: Optional[int] = None
    #: routing layers (level >= 1) with at most this many members use
    #: exact compact-table candidates (one [W, U] MXU matmul) instead of
    #: beam searches — a layer holds ~N/M^level members, so level 1 of a
    #: 1M build is ~62k rows and the matmul costs milliseconds where the
    #: beam costs ~ef gather-bound hops. Candidates are exact kNN over
    #: already-inserted members (triangular insertion-order visibility in
    #: the bulk path — one wave per level group). 0 disables.
    upper_flat_max: int = 65536
    #: candidate-pool width for the flat routing-layer path (min'd with
    #: the member count). The exact top-efc nearest are all near-field; a
    #: beam's pool also carries trajectory waypoints whose long edges the
    #: α-prune keeps for navigability — a wider exact pool restores that
    #: ring diversity and then beats the beam on both axes (measured
    #: 100k×768 cosine, same process: pool=efc 0.894 / pool=192 0.921 /
    #: pool=384 0.932 recall@10 at ef=50 vs the beam path's 0.9285, at
    #: 6.3 s vs 6.6 s steady).
    upper_flat_pool: int = 384
    # ---- bulk (cluster-blocked) fresh-build path — see build/bulk.py ----
    #: None = auto (fresh dot-metric builds of >= bulk_threshold items);
    #: True forces it for any eligible fresh build; False disables.
    bulk: Optional[bool] = None
    bulk_threshold: int = 8192
    #: candidate-list length per item (None → max(ef_construction, m0+16))
    bulk_k: Optional[int] = None
    #: α for the bulk prune (None → ``alpha``). kNN-only candidate lists
    #: can lack the long edges insertion-order builds pick up; a slightly
    #: diverse prune (1.1-1.2, DiskANN-style) compensates if measured.
    bulk_alpha: Optional[float] = None
    #: k-means target cluster size / Lloyd iterations / adjacency width
    bulk_cluster_size: int = 512
    bulk_kmeans_iters: int = 3
    bulk_adj: int = 8
    #: centroid init: "maxmin" (furthest-point over a member sample —
    #: covers every natural data component before Lloyd refines; fixes
    #: the 1M×768 candidate-recall collapse where random init left ~60%
    #: of components centroid-less and they shattered across
    #: near-equidistant foreign clusters) or "random" (round-3 behavior)
    bulk_init: str = "maxmin"
    bulk_init_sample: int = 131072
    #: random long-edge candidates per item (NSW wiring — the α-prune
    #: keeps the uncovered ones; 0 disables)
    bulk_rand: int = 8
    #: renumber slots into cluster-locality order at build end (in-process
    #: readers gather neighbor rows that are HBM-adjacent). Default OFF:
    #: measured on v5e (100k×768, same process) the QPS delta is within
    #: chip noise (ef=100/200 identical, ef=50 +12% once, irreproducible)
    #: — XLA's row gather cost is row-count-bound, not locality-bound
    #: (BENCH_NOTES round 2) — while the renumber costs ~0.5-2s host +
    #: device time per build. The machinery stays for locally-attached
    #: deployments to re-measure.
    bulk_renumber: bool = False
    #: wave-ramp divisor for the routing-layer waves of a bulk build
    #: (1 = each wave as wide as the active graph; layer-0/non-bulk waves
    #: always use 4)
    upper_ramp_divisor: int = 1
    #: highest layer built by the bulk path (None = 0: only layer 0 —
    #: measured on 100k×768 clustered cosine: bulk-kNN level 1 costs ~5
    #: recall points at ef=50 for no steady-time win; the knob exists
    #: for re-measuring if bulk candidate quality improves)
    bulk_upper: Optional[int] = None
    #: flat-candidate backbone: build the backbone's layer-0 leg from
    #: exact triangular kNN candidates (one [W, U] MXU matmul per wave
    #: against the compact backbone member table, insertion-order
    #: visibility via flat_col_order) instead of per-hop beam searches.
    #: Candidate semantics are identical to a perfectly-converged beam
    #: over the active backbone graph — item i's candidates are the exact
    #: nearest previously-inserted members, so the sparse-phase long
    #: edges (the whole point of the backbone) still form — while the
    #: ~ef sequential gather-bound hops per wave collapse into one
    #: matmul. None = auto (on when the backbone fits
    #: ``backbone_flat_max``); False forces the beam path.
    backbone_flat: Optional[bool] = None
    #: backbone member bound for the flat path ([W, U] matrix per wave;
    #: 131072 cols × 4096 rows f32 = 2.1 GB transient)
    backbone_flat_max: int = 131072
    #: candidate-pool width for the flat backbone (min'd with members).
    #: Wider than ef_construction for ring diversity (the routing-layer
    #: upper_flat_pool rationale) but bounded: the α-prune's pairwise
    #: block gathers [W, pool, D] — pool=384 at W=4096 × 768d is a
    #: 4.8 GB transient next to 3 GB of resident vectors
    backbone_flat_pool: int = 192
    #: navigability backbone: after bulk layer 0 is connected, re-insert
    #: every level >= 1 member at layer 0 through real insertion waves
    #: (descent + beam + α-prune + reverse merge). A pure-kNN layer has no
    #: long-range edges, so an ef-wide search beam that descends into the
    #: wrong basin of clustered data can never escape — measured at
    #: 1M×768 cosine (round-4 bisect): bulk recall@10 was 0.44 flat
    #: across ef while the wave path hit 0.97 from the *same* descent
    #: seeds. The backbone items (~N/M of the graph) pick up exactly the
    #: insertion-order escape edges the wave build has, at ~1/M of its
    #: cost. None = auto (on for bulk builds above ``bulk_threshold``
    #: members at layer 1, i.e. ~128k items); True/False force.
    bulk_backbone: Optional[bool] = None


def prepare_entry_points(
    g: HostGraph,
    insert_slots: np.ndarray,
    insert_levels: np.ndarray,
    deleted_slots: set[int],
) -> tuple[np.ndarray, np.ndarray]:
    """Resolve entry points before a (maybe incremental) build.

    Mirrors hnsw.rs:222-289. Mutates ``g.entry_slots``/``g.max_level`` and
    returns the final (slots, levels) insertion schedule — old entry points
    are appended for re-indexing at the (old) max level.
    """
    old_eps = list(dict.fromkeys(g.entry_slots))
    new_eps = [e for e in old_eps if e not in deleted_slots]
    del_eps = [e for e in old_eps if e in deleted_slots]

    if not old_eps and not deleted_slots:
        # fresh-build fast path — vectorized twin of the general case
        # below (no old entry points to replace or re-schedule): sort by
        # descending level, stable, exactly like sorted(key=-level) over
        # an insertion-ordered dict; top-level items become entry points.
        order = np.argsort(-insert_levels, kind="stable")
        slots = insert_slots[order].astype(np.int64)
        lvls = insert_levels[order].astype(np.int32)
        cur_max = int(lvls[0]) if len(lvls) else 0
        g.max_level = max(g.max_level, cur_max)
        g.entry_slots = [int(s) for s in slots[lvls == g.max_level]]
        return slots, lvls

    # Replace deleted entry points with surviving nodes from top layers
    # (hnsw.rs:242-257: scan layer links top-down for a non-deleted node).
    if del_eps:
        l = g.max_level
        for _ in del_eps:
            while True:
                members = _layer_members(g, l)
                found = False
                for s in members:
                    if s not in deleted_slots and s not in new_eps:
                        new_eps.append(int(s))
                        found = True
                        break
                if found or l == 0:
                    break
                l -= 1

    # Case 1: whole previous graph deleted → reset height (hnsw.rs:261-263)
    if del_eps and len(new_eps) != len(old_eps):
        g.max_level = 0

    # Schedule surviving old eps for re-indexing at the old max level
    # (hnsw.rs:267-268) so old and new graphs stay connected.
    sched = {int(s): int(lv) for s, lv in zip(insert_slots, insert_levels)}
    for e in new_eps:
        sched[int(e)] = max(sched.get(int(e), 0), g.max_level)

    cur_max = int(insert_levels.max()) if len(insert_levels) else 0

    # Case 2: new build reaches higher levels → new hnsw entry points
    # (hnsw.rs:272-276).
    if cur_max > g.max_level:
        new_eps = []
        g.max_level = cur_max

    slots = np.asarray(sorted(sched, key=lambda s: -sched[s]), dtype=np.int64)
    lvls = np.asarray([sched[int(s)] for s in slots], dtype=np.int32)

    # Top-layer items become entry points, pre-added to all layers below
    # (hnsw.rs:278-287).
    for s, lv in zip(slots, lvls):
        if lv == g.max_level and int(s) not in new_eps:
            new_eps.append(int(s))

    g.entry_slots = new_eps
    return slots, lvls


def _layer_members(g: HostGraph, level: int) -> np.ndarray:
    if level == 0:
        return np.nonzero(g.levels >= 0)[0]
    if level - 1 >= len(g.slot_rows):
        return np.empty(0, dtype=np.int64)
    return np.nonzero(g.slot_rows[level - 1] >= 0)[0]


def plan_build(
    g: HostGraph,
    insert_slots: np.ndarray,
    deleted_slots: np.ndarray,
    opts: BuildOptions,
    stats: BuildStats,
) -> tuple[np.ndarray, np.ndarray, np.ndarray, np.ndarray]:
    """Host prologue shared by the single-chip and SPMD builders: sample
    levels, resolve entry points, allocate upper rows, and derive the two
    device masks. Returns (slots, lvls, active, exists_ok) — ``active`` is
    the initial searchable mask (previously indexed, not deleted, not
    re-inserted-yet); ``exists_ok`` additionally admits the items being
    inserted (beam traversal may seed anything that exists and is not
    deleted, reference hnsw.rs:474-481, 498-501)."""
    rng = np.random.default_rng(opts.seed)
    deleted_set = {int(s) for s in deleted_slots}
    insert_levels = sample_levels(rng, g.m, len(insert_slots))

    opts.progress.update(BuildStep.RESOLVE_GRAPH_ENTRY_POINTS)
    with span("prepare_entry_points", inserts=len(insert_slots), deletes=len(deleted_set)):
        slots, lvls = prepare_entry_points(g, insert_slots, insert_levels, deleted_set)

    # Allocate upper-layer rows up front (device tables are static per build)
    g.ensure_layers(g.max_level)
    g.levels[slots] = np.maximum(g.levels[slots], lvls.astype(g.levels.dtype))
    for s, lv in zip(slots[lvls >= 1], lvls[lvls >= 1]):
        for level in range(1, lv + 1):
            g.upper_row(level, int(s))

    for lv in np.unique(lvls):
        stats.layer_dist[int(lv)] = stats.layer_dist.get(int(lv), 0) + int((lvls == lv).sum())

    active = (g.levels >= 0).copy()
    active[slots] = False
    for s in deleted_set:
        active[s] = False
    exists_ok = (g.levels >= 0).copy()
    for s_ in deleted_set:
        exists_ok[s_] = False
    return slots, lvls, active, exists_ok


def build_graph(
    g: HostGraph,
    insert_slots: np.ndarray,
    deleted_slots: np.ndarray,
    opts: BuildOptions,
    stats: Optional[BuildStats] = None,
) -> BuildStats:
    """Run a full (fresh or incremental) build on device.

    Preconditions: vectors/norms for ``insert_slots`` are already staged in
    ``g``; ``deleted_slots`` rows still carry their old links (the reference
    deletes links *after* the build so the repair pass can splice through
    them, writer.rs:577-580).
    """
    stats = stats or BuildStats()
    deleted_set = {int(s) for s in deleted_slots}

    slots, lvls, active, exists_ok = plan_build(g, insert_slots, deleted_slots, opts, stats)

    slack = opts.link_slack
    dev = hnsw.to_device(g, link_slack=slack)
    # the wave programs donate the whole DeviceGraph, which invalidates the
    # device vector cache's handles mid-build — detach the key now and
    # restore it with the final output graph at the end (an aborted build
    # then leaves the cache empty rather than dangling)
    dev_cache_key = g.dev_cache.take_key() if g.dev_cache is not None else None
    if _FENCE_WAVES:
        with span("to_device_drain"):
            jax.block_until_ready(dev.vectors)
    dev = wave_ops._replace(dev, valid=jnp.asarray(active))
    # beam traversal during the build may seed/visit anything that exists
    # and is not deleted (see wave_ops.wave_insert_level node_ok)
    node_ok = jnp.asarray(exists_ok)

    # ---- insertion waves, level-descending (hnsw.rs:160-185) ----
    opts.progress.update(BuildStep.BUILDING_THE_GRAPH)
    total = len(slots)
    done = 0
    W = opts.wave_size
    n_active = int(active.sum())

    # device-accumulated touched-row mask + build statistics: one transfer
    # at build end instead of a sync per wave
    dirty = jnp.zeros((g.capacity,), dtype=bool)
    counters = jnp.zeros((4,), dtype=jnp.int32)
    touched_host: set[int] = set()

    # ---- compact member tables for routing-layer flat candidates ----
    # level >= 1 membership is static per build (rows allocated up front in
    # plan_build), so each small layer gets one padded slot table; waves at
    # that layer take exact top-ef against it in one MXU matmul instead of
    # running a gather-bound beam (see wave_ops.wave_insert_level
    # flat_members). Padding snaps to powers of two to bound compiles.
    flat_tabs: dict[int, jax.Array] = {}
    flat_tabs_np: dict[int, np.ndarray] = {}
    for level in range(1, g.max_level + 1):
        mem = _layer_members(g, level)
        if 0 < len(mem) <= opts.upper_flat_max:
            pad = 1 << max(4, int(len(mem) - 1).bit_length())
            tab = np.full(pad, -1, dtype=np.int32)
            tab[: len(mem)] = mem
            flat_tabs_np[level] = tab
            flat_tabs[level] = jnp.asarray(tab)

    # ---- bulk cluster-blocked path for large fresh builds (bulk.py) ----
    use_bulk = bulk.eligible(g.metric, n_active, len(deleted_set), len(slots), opts)
    order0 = None
    backbone_on = False
    bulk_top = 0
    if use_bulk:
        # Bulk builds layers bulk_top..0; layers above go through the
        # reference-shaped insertion waves below (stop_level skips the
        # bulk-built legs). The topmost layers must be navigation-grade
        # for the greedy ef=1 descent — measured (30k×64 clustered
        # cosine): an all-kNN hierarchy mis-routes ~3% of queries into
        # the wrong basin and recall@10 plateaus at 0.97 at every ef.
        # Wave-inserting the top layers is nearly free (they hold
        # N/M^bulk_top items), while mid layers (level 1 ~ N/M members)
        # would burn ~50 narrow wave dispatches — those go bulk, with
        # exact-kNN candidates below BRUTE_MAX members plus NSW long
        # edges for navigability (bulk.py measured recall parity).
        if opts.bulk_upper is not None:
            bulk_top = min(opts.bulk_upper, int(lvls.max(initial=0)))
        else:
            # measured (100k×768 clustered cosine, efc=48): bulk-kNN
            # level 1 costs ~5 recall points at ef=50 (0.828 vs 0.909)
            # for no steady-time win once the flat-bootstrap ramp widened
            # — the descent really does need insertion-shaped mid layers
            bulk_top = 0
        # Navigability backbone (BuildOptions.bulk_backbone): the
        # level>=1 members skip this upper-only machinery and instead run
        # through the standard insertion-wave loop below all the way to
        # layer 0 — a ramped wave build of ~N/M items whose early sparse
        # waves lay down the multi-scale long edges greedy search needs
        # to escape a wrong-basin descent. Measured (1M×768 clustered
        # cosine, round-4 diag): a locally perfect bulk layer 0
        # (candidate recall 1.0, oracle 0.99 at bulk_adj=16) still
        # searched at 0.56-0.58 because pure-kNN layers have no escape
        # edges, while the wave path hit 0.975 from identical descent
        # seeds; a post-hoc re-insert of the same members could not
        # recreate the edges (0.42) — the ramp is the mechanism, so the
        # backbone must be built FIRST, then bulk connects the leaves.
        backbone_on = (
            (opts.bulk_backbone is None or bool(opts.bulk_backbone))
            and bulk_top == 0
            and bool((lvls > 0).any())
        )
        upper = lvls > bulk_top
        n_up_active = 0
        active_now = active.copy()  # host mirror of activation, per group
        for lv in (
            [] if backbone_on else sorted({int(x) for x in lvls[upper]}, reverse=True)
        ):
            grp = slots[lvls == lv]
            tri = all(
                level in flat_tabs for level in range(lv, bulk_top, -1)
            )
            if tri:
                # One (row-chunked) wave carries the whole level group:
                # candidate visibility is the host-computed insertion
                # order (active members rank -1, group members their
                # position), so earlier group items are exact-kNN
                # candidates for later ones with no activation barrier —
                # the ~log2 ramp's wave fleet collapses to
                # ceil(|grp|/4096) dispatch groups. Measured (100k×768
                # cosine steady build, trace_upper.py): the 22 ramped
                # upper waves cost ~15 s of the 23 s total with a
                # per-wave-fixed cost, identical for beam and flat
                # candidates — wave count is the lever, not the
                # candidate op.
                w_pad = min(4096, 1 << max(4, int(len(grp) - 1).bit_length()))
                slot_order = np.full(g.capacity, _ORDER_INF, dtype=np.int32)
                slot_order[active_now] = -1
                slot_order[grp.astype(np.int64)] = np.arange(
                    len(grp), dtype=np.int32
                )
                orders = {
                    level: jnp.asarray(
                        np.where(
                            flat_tabs_np[level] >= 0,
                            slot_order[np.maximum(flat_tabs_np[level], 0)],
                            _ORDER_INF,
                        ).astype(np.int32)
                    )
                    for level in range(lv, bulk_top, -1)
                }
                start = 0
                while start < len(grp):
                    if opts.cancel():
                        raise BuildCancelled()
                    chunk = grp[start : start + w_pad]
                    wave = np.full(w_pad, -1, dtype=np.int32)
                    wave[: len(chunk)] = chunk
                    with span("bulk_upper_tri", level=lv, width=w_pad, base=start):
                        dev, dirty, counters = _insert_wave(
                            dev, wave, lv, opts, n_up_active, node_ok, dirty,
                            counters, g.m0, n_real=len(chunk),
                            stop_level=bulk_top + 1, flat_tabs=flat_tabs,
                            flat_orders=orders,
                            flat_row_base=jnp.int32(start),
                        )
                    if _FENCE_WAVES:
                        with span("tri_wave_drain", level=lv, base=start):
                            jax.block_until_ready(counters)
                    dev = wave_ops.activate_wave(dev, jnp.asarray(wave))
                    start += len(chunk)
                    n_up_active += len(chunk)
                    stats.waves += 1
                active_now[grp.astype(np.int64)] = True
                continue
            start = 0
            while start < len(grp):
                if opts.cancel():
                    raise BuildCancelled()
                # routing layers tolerate a full-width ramp (divisor 1):
                # their rows only steer the descent, and 1/4-ramp waves
                # burn ~40 narrow dispatches between 1k and N/M actives
                w_pad = _ramp_width(
                    opts.wave_size, n_up_active, divisor=opts.upper_ramp_divisor
                )
                chunk = grp[start : start + w_pad]
                start += len(chunk)
                wave = np.full(w_pad, -1, dtype=np.int32)
                wave[: len(chunk)] = chunk
                with span("bulk_upper_wave", level=lv, width=w_pad):
                    dev, dirty, counters = _insert_wave(
                        dev, wave, lv, opts, n_up_active, node_ok, dirty,
                        counters, g.m0, n_real=len(chunk),
                        stop_level=bulk_top + 1, flat_tabs=flat_tabs,
                    )
                if _FENCE_WAVES:
                    with span("upper_wave_drain", level=lv, width=w_pad):
                        jax.block_until_ready(counters)
                dev = wave_ops.activate_wave(dev, jnp.asarray(wave))
                n_up_active += len(chunk)
                stats.waves += 1
            active_now[grp.astype(np.int64)] = True

    groups: list[tuple[int, np.ndarray]] = []
    if not use_bulk:
        for lv in sorted(set(int(x) for x in lvls), reverse=True):
            groups.append((lv, slots[lvls == lv]))
    elif backbone_on:
        # backbone: the level>=1 members take the full insertion-wave
        # path below (levels L..0), laying down the layer-0 escape edges;
        # bulk then connects the level-0-only leaves
        for lv in sorted({int(x) for x in lvls[lvls > 0]}, reverse=True):
            groups.append((lv, slots[lvls == lv]))

    # already-inserted slot ids, tracked only inside the flat bootstrap —
    # the level-0 flat candidate matmul runs against this compact table
    # instead of the full [W, capacity] matrix (at 1M capacity the full
    # matrix costs ~1.6 TFLOP per bootstrap wave for <= 1024 live columns)
    active_ids = np.nonzero(active)[0].astype(np.int64)

    # the backbone is a fresh sub-build of ~N/M items — let its ramp
    # reach the widest bucket regardless of the (incremental-tuned,
    # default 256) wave_size: the divisor bound in _ramp_width still
    # caps divergence at active/4, but the 1M backbone otherwise climbs
    # 62.5k members in 488 width-128 dispatches (~30 ms tunnel RTT each;
    # round-4 trace benchmarks/logs/trace_1m spans) instead of ~30
    W_groups = max(W, _WAVE_BUCKETS[-1]) if backbone_on else W

    # ---- flat backbone (BuildOptions.backbone_flat) ----
    # The backbone members form one insertion sequence (groups, level
    # descending); its layer-0 candidates come from exact triangular kNN
    # against the compact member table instead of per-hop beams, and the
    # ramp collapses to full-width waves (triangular visibility makes
    # in-wave divergence impossible — round-5 trace: the beam backbone was
    # 15.4 s of a 58 s steady 1M build).
    bb_tab0 = bb_order0 = None
    bb_base = 0
    if backbone_on and groups and opts.backbone_flat is not False:
        bb_all = np.concatenate([grp for _, grp in groups])
        if 0 < len(bb_all) <= opts.backbone_flat_max:
            pad = 1 << max(4, int(len(bb_all) - 1).bit_length())
            tab = np.full(pad, -1, dtype=np.int32)
            tab[: len(bb_all)] = bb_all
            slot_order0 = np.full(g.capacity, _ORDER_INF, dtype=np.int32)
            slot_order0[active] = -1  # pre-existing actives: always visible
            slot_order0[bb_all.astype(np.int64)] = np.arange(
                len(bb_all), dtype=np.int32
            )
            bb_tab0 = jnp.asarray(tab)
            # triangular orders for EVERY flat level (not just 0): a
            # full-width wave carries a whole level group, so without
            # in-wave visibility its upper-level candidates would be only
            # the few higher-level actives — the tri upper loop's exact
            # insertion-order trick, applied backbone-wide
            bb_order0 = {
                0: jnp.asarray(
                    np.where(
                        tab >= 0, slot_order0[np.maximum(tab, 0)], _ORDER_INF
                    ).astype(np.int32)
                )
            }
            for _lvl, _tabL in flat_tabs_np.items():
                bb_order0[_lvl] = jnp.asarray(
                    np.where(
                        _tabL >= 0,
                        slot_order0[np.maximum(_tabL, 0)],
                        _ORDER_INF,
                    ).astype(np.int32)
                )
            # levels too big for upper_flat_max but within the backbone
            # bound get compact tables too — without one, the first
            # full-width wave's upper leg has no candidate source at all
            # (the bootstrap full-table path is disabled under
            # flat0_force; see _insert_wave)
            for _lvl in range(1, g.max_level + 1):
                if _lvl in flat_tabs:
                    continue
                _mem = _layer_members(g, _lvl)
                if 0 < len(_mem) <= opts.backbone_flat_max:
                    _p = 1 << max(4, int(len(_mem) - 1).bit_length())
                    _tabL = np.full(_p, -1, dtype=np.int32)
                    _tabL[: len(_mem)] = _mem
                    flat_tabs = dict(flat_tabs)
                    flat_tabs[_lvl] = jnp.asarray(_tabL)
                    bb_order0[_lvl] = jnp.asarray(
                        np.where(
                            _tabL >= 0,
                            slot_order0[np.maximum(_tabL, 0)],
                            _ORDER_INF,
                        ).astype(np.int32)
                    )

    for lv, grp in groups:
        start = 0
        prev_wave = None  # previous wave at this level (chain seeding)
        while start < len(grp):
            if opts.cancel():
                raise BuildCancelled()
            if bb_tab0 is not None:
                # triangular visibility needs no ramp: full-width waves
                w_pad = min(
                    _WAVE_BUCKETS[-1],
                    1 << max(4, int(len(grp) - start - 1).bit_length()),
                )
            else:
                w_pad = _ramp_width(W_groups, n_active)
            chunk = grp[start : start + w_pad]
            start += len(chunk)
            wave = np.full(w_pad, -1, dtype=np.int32)
            wave[: len(chunk)] = chunk
            wave_j = jnp.asarray(wave)
            # Chain seeding: after the first large layer-0 wave, each
            # item seeds from its nearest previous-wave member + that
            # member's freshly pruned links (wave_ops.proto_seed_rows) and
            # refines with a reduced beam budget — the assignment matmul
            # rides the MXU while the beam iterations it replaces are
            # HBM-gather-bound.
            seeds = None
            beam_iters = None
            if (
                lv == 0
                and opts.chain_seeding
                and bb_tab0 is None
                and prev_wave is not None
                and n_active > FLAT_BOOTSTRAP
                and not g.metric.is_packed
                and g.metric.name != "manhattan"  # [W,P,D] blow-up
            ):
                seeds = wave_ops.proto_seed_rows(dev, wave_j, prev_wave)
                beam_iters = opts.refine_iters or max(
                    16, (opts.ef_construction + 16) // 2
                )
            flat0 = None
            flat_orders_w = None
            flat_row_base_w = None
            flat0_force = False
            if bb_tab0 is not None:
                flat0 = bb_tab0
                flat_orders_w = bb_order0
                flat_row_base_w = jnp.int32(bb_base + (start - len(chunk)))
                flat0_force = True
            elif n_active <= FLAT_BOOTSTRAP:
                tab0 = np.full(FLAT_BOOTSTRAP, -1, dtype=np.int32)
                tab0[: len(active_ids)] = active_ids[:FLAT_BOOTSTRAP]
                flat0 = jnp.asarray(tab0)
            with span(
                "insert_wave", level=lv, width=w_pad, active=n_active,
                chained=int(seeds is not None),
            ):
                dev, dirty, counters = _insert_wave(
                    dev, wave, lv, opts, n_active, node_ok, dirty, counters,
                    g.m0, seeds=seeds, beam_iters=beam_iters,
                    n_real=len(chunk),
                    flat_tabs=flat_tabs, flat0=flat0,
                    flat_orders=flat_orders_w,
                    flat_row_base=flat_row_base_w,
                    flat0_force=flat0_force,
                )
            dev = wave_ops.activate_wave(dev, wave_j)
            if lv == 0 and len(chunk) >= _CHAIN_MIN_PREV:
                prev_wave = wave_j
            if len(active_ids) <= FLAT_BOOTSTRAP:
                # kept ascending so flat-candidate tie-breaking (top_k picks
                # the first column) matches the legacy full-table flat scan
                active_ids = np.sort(
                    np.concatenate([active_ids, chunk.astype(np.int64)])
                )
            n_active += len(chunk)
            done += len(chunk)
            stats.waves += 1
            opts.progress.update(InsertItemsStep(done, total))
        bb_base += len(grp)

    # ---- bulk cluster-blocked connect (after any backbone waves) ----
    if use_bulk:
        # all members go live before the bulk connect: bulk layer 0 runs
        # no beams, and valid feeds _ensure_inbound's row reads plus, with
        # a backbone, the leaves' reverse merges into backbone rows. A
        # fresh mask array — the node_ok handle aliases dev.valid through
        # the donated programs below (see memory: node_ok donation gotcha)
        dev = wave_ops._replace(dev, valid=jnp.asarray(exists_ok))
        # fence: waves dispatch async — drain them here so the bulk spans
        # below attribute time to their own device work, not queued waves
        with span("pre_bulk_drain"):
            jax.block_until_ready(dev.links0)
        connect = np.asarray(lvls == 0) if backbone_on else None
        with span("bulk_build", inserts=len(slots), max_level=g.max_level):
            dev, dirty, counters, order0 = bulk.bulk_build(
                g, dev, slots, lvls, opts, dirty, counters, top_level=bulk_top,
                cancel=opts.cancel if opts.cancel is not _never_cancel else None,
                connect_mask=connect,
            )
        with span("bulk_drain"):
            jax.block_until_ready(dev.links0)
        stats.waves += 1
        opts.progress.update(InsertItemsStep(total, total))

    # ---- reduce slack rows to m0 (α-prune over the full candidate set) ----
    if slack:
        with span("prune_slack_rows"):
            dev, dirty = wave_ops.prune_slack_rows(
                dev, dirty, cap=g.m0, alpha=opts.alpha
            )

    # ---- deletion repair (fill_gaps_from_deleted, hnsw.rs:334-415) ----
    if deleted_set:
        opts.progress.update(BuildStep.PATCH_OLD_NEW_DELETED_LINKS)
        with span("repair_deletions", deleted=len(deleted_set)):
            dev = _repair_deletions(g, dev, deleted_set, opts, stats, touched_host)
        dev = wave_ops.clear_slots(
            dev, jnp.asarray(np.fromiter(deleted_set, dtype=np.int32))
        )

    # ---- end-of-build stranding re-check (closes VERDICT r3 #8) ----
    # The per-wave guarantee (_ensure_inbound) is bounded: a later wave's
    # reverse merge or force-link can displace an earlier forced edge,
    # re-stranding its item. One cheap global pass per round turns the
    # bounded guarantee into a checked one: compute layer-0 in/out-degree
    # with one scatter-add, then repair in two tiers —
    #   * out-degree 0 (the row never got forward links; e.g. every
    #     candidate source failed — seen when descent settled on deleted
    #     hubs before the greedy_descend node_ok fix): re-insert the row
    #     with exact flat candidates over the whole live graph (one
    #     [S, capacity] MXU matmul; S is a handful of rows),
    #   * in-degree 0 with forward links: force one inbound edge via the
    #     row's own nearest forward neighbors (victim-aware),
    # repeating until clean (rounds are capped defensively — each round
    # can displace at most a handful of other rows' only in-edges).
    if len(slots) or deleted_set:
        with span("inbound_recheck"):
            for _round in range(12):
                indeg_dev, outdeg_dev = wave_ops.layer0_degrees(dev, cap=g.m0)
                indeg, outdeg, valid_np = jax.device_get(
                    (indeg_dev, outdeg_dev, dev.valid)
                )
                indeg, outdeg = np.asarray(indeg), np.asarray(outdeg)
                valid_np = np.asarray(valid_np)
                if int(valid_np.sum()) <= 1:
                    break
                empty = np.nonzero(valid_np & (outdeg == 0))[0]
                if len(empty):
                    pad = 1 << max(4, int(len(empty) - 1).bit_length())
                    buf = np.full(pad, -1, dtype=np.int32)
                    buf[: len(empty)] = empty
                    rows_j = jnp.asarray(buf)
                    seeds = jnp.broadcast_to(
                        dev.entry_slots[None, :], (pad, dev.entry_slots.shape[0])
                    )
                    dev, _, dirty, counters = wave_ops.wave_insert_level(
                        dev, rows_j, seeds, jnp.asarray(exists_ok),
                        jnp.int32(0), dirty, counters,
                        is_level0=True, ef=opts.ef_construction, cap=g.m0,
                        alpha=opts.alpha, flat=True,
                    )
                    stats.waves += 1
                    continue
                stranded = np.nonzero(valid_np & (indeg == 0))[0]
                if len(stranded) == 0:
                    break
                pad = 1 << max(4, int(len(stranded) - 1).bit_length())
                buf = np.full(pad, -1, dtype=np.int32)
                buf[: len(stranded)] = stranded
                dev, dirty, counters = wave_ops.force_inbound_for(
                    dev, jnp.asarray(buf), indeg_dev, dirty, counters,
                    shift=_round % 4, write_cap=g.m0,
                )

    # ---- cluster-locality renumbering (bulk builds) ----
    # Neighboring graph rows become HBM-adjacent, so in-process readers'
    # beam gathers touch clustered address ranges. The link tables are
    # permuted on device at HBM stream bandwidth (hnsw.permute_device)
    # before the sync below pulls them back; the host permutes only its
    # host-exclusive arrays. The store is id-keyed and persisted links
    # hold item ids, so renumbering never changes persisted bytes.
    if use_bulk and opts.bulk_renumber and order0 is not None:
        with span("bulk_renumber"):
            # bulk.eligible admits fresh builds only, so there is no
            # deleted_set to remap through the permutation
            members = slots[lvls >= 0]
            front = members[order0]
            perm = np.empty(g.capacity, dtype=np.int64)
            perm[: len(front)] = front
            rest = np.ones(g.capacity, dtype=bool)
            rest[front] = False
            perm[len(front):] = np.nonzero(rest)[0]
            inv = np.empty_like(perm)
            inv[perm] = np.arange(g.capacity, dtype=np.int64)
            perm_j = jnp.asarray(perm.astype(np.int32))
            dev = hnsw.permute_device(dev, perm_j, jnp.asarray(inv.astype(np.int32)))
            dirty = dirty[perm_j]
            g.permute_host_only(perm, inv)

    # ---- sync back to host ----
    with span("sync_to_host"):
        hnsw.from_device(g, dev)
        dirty_np, counters_np = jax.device_get((dirty, counters))
    if g.dev_cache is not None:
        # re-point the cache at the final graph — the donated vectors alias
        # straight through every wave program, and renumbered builds
        # permute host and device rows identically (permute_device +
        # permute_host_only), so the handles stay consistent
        g.dev_cache.restore(dev_cache_key, dev)
    touched_host.update(np.nonzero(dirty_np)[0].tolist())
    touched_host -= deleted_set
    stats.links_added += int(
        counters_np[wave_ops.CNT_FWD_LINKS] + counters_np[wave_ops.CNT_REV_DELTA]
    )
    stats.beam_iters += int(counters_np[wave_ops.CNT_BEAM_ITERS])
    stats.store_gathers += (
        int(counters_np[wave_ops.CNT_ROW_GATHERS]) * wave_ops.GATHER_GRANULE
    )
    stats.touched = np.asarray(sorted(touched_host), dtype=np.int64)
    return stats


def _insert_wave(
    dev: DeviceGraph,
    wave: np.ndarray,
    lv: int,
    opts: BuildOptions,
    n_active: int,
    node_ok,
    dirty,
    counters,
    m0: int,
    seeds=None,
    beam_iters: Optional[int] = None,
    n_real: Optional[int] = None,
    stop_level: int = 0,
    flat_tabs: Optional[dict] = None,
    flat0=None,
    flat_orders: Optional[dict] = None,
    flat_row_base=None,
    flat0_force: bool = False,
):
    """Insert one wave: greedy descent to lv+1, then per-level beam +
    prune + connect, chaining each level's pruned set as the next level's
    seeds (hnsw.rs:291-328).

    ``seeds``/``beam_iters`` override the descent and the per-level beam
    budget — the prototype-seeded refine path passes both. ``flat_tabs``
    maps routing levels to compact member tables (exact MXU candidates,
    see BuildOptions.upper_flat_max); ``flat0`` is the compact table for
    the level-0 flat bootstrap. ``flat_orders``/``flat_row_base`` switch
    the flat masks to triangular insertion-order visibility (one wave per
    level group — see the bulk upper loop)."""
    wave_j = jnp.asarray(wave)
    # flat0_force (the flat backbone) runs full-width waves from a cold
    # start — the legacy bootstrap's [W, capacity] full-table matmul at
    # W=4096 × 1.7M slots would be a 28 GB allocation (found as an HBM
    # OOM at the 10M×768 8-shard config), so the bootstrap path is
    # disabled and levels without a compact table run beams instead
    use_flat = n_active <= FLAT_BOOTSTRAP and not flat0_force

    def _fm(level: int):
        """Compact member table for exact flat candidates at ``level``."""
        if level == 0:
            # flat0_force: the flat-backbone path supplies a compact
            # level-0 table valid beyond the bootstrap threshold
            return flat0 if (use_flat or flat0_force) else None
        return flat_tabs.get(level) if flat_tabs is not None else None

    # the greedy descent only seeds *beam* searches; skip its dispatches
    # when every level this wave touches takes the exact flat path
    needs_beam = not use_flat and any(
        _fm(level) is None
        for level in range(min(lv, dev.max_level), stop_level - 1, -1)
    )
    if seeds is None:
        if dev.max_level > lv and not use_flat and needs_beam:
            seeds = beam.descend_for_slots(
                dev, wave_j, dev.max_level, lv + 1, node_ok=node_ok
            )
        else:
            seeds = jnp.broadcast_to(
                dev.entry_slots[None, :], (wave.shape[0], dev.entry_slots.shape[0])
            )
    if beam_iters is None:
        beam_iters = opts.beam_iters
    # Tail termination only pays on wide waves, and the allowance must be
    # sized from the REAL item count, not the padded wave width: padding
    # rows duplicate slot 0 and converge together, so a width-derived
    # allowance on a sparse final chunk (e.g. 200 real items in a
    # 4096-wide bucket) could cut off every real construction beam
    # mid-search — exactly the poorly-linked-fresh-items failure the
    # narrow-wave gate below exists for. n_real snaps down to the wave
    # buckets so the static tail_allow keeps compile count O(buckets).
    if n_real is None:
        n_real = int((wave >= 0).sum())
    tail = opts.beam_tail_frac if n_real >= 1024 else 0.0
    tail_base = 0
    for b in _WAVE_BUCKETS:
        if b <= n_real:
            tail_base = b

    cancellable = opts.cancel is not _never_cancel
    for level in range(min(lv, dev.max_level), stop_level - 1, -1):
        # logical caps: the device layer-0 table may be slack-widened
        cap = m0 if level == 0 else dev.upper_links.shape[-1]
        fm = _fm(level)
        pre_ids = pre_d = None
        if cancellable and not use_flat and fm is None:
            # in-wave cancellation: the beam runs in host-probed chunks
            # instead of one fused device program (CANCELLATION_PROBING
            # analogue — hnsw.rs:174-177); prune/connect stay fused.
            # flat-candidate levels skip this: their single dispatch is
            # milliseconds, well inside the probing granularity
            pre_ids, pre_d, pre_iters = _chunked_candidates(
                dev, wave_j, seeds, node_ok, level, opts, beam_iters, m0,
                tail_allow=int(tail * tail_base) if level == 0 else 0,
            )
            counters = counters.at[wave_ops.CNT_BEAM_ITERS].add(pre_iters)
        dev, selected, dirty, counters = wave_ops.wave_insert_level(
            dev,
            wave_j,
            seeds,
            node_ok,
            jnp.int32(level),
            dirty,
            counters,
            is_level0=(level == 0),
            ef=(
                max(opts.ef_construction, opts.upper_flat_pool)
                if fm is not None and level > 0
                else (
                    # flat backbone: wider exact pool for ring diversity
                    # (upper_flat_pool rationale, bounded — see
                    # BuildOptions.backbone_flat_pool)
                    max(opts.ef_construction, opts.backbone_flat_pool)
                    if level == 0 and flat0_force
                    else opts.ef_construction
                )
            ),
            cap=cap,
            alpha=opts.alpha,
            flat=use_flat and fm is None,
            expand=opts.beam_expand,
            beam_iters=beam_iters,
            beam_tail_allow=int(tail * tail_base),
            traverse=opts.traverse,
            pre_ids=pre_ids,
            pre_d=pre_d,
            flat_members=fm,
            flat_col_order=(
                flat_orders.get(level) if flat_orders is not None else None
            ),
            flat_row_base=flat_row_base,
        )
        seeds = selected
    return dev, dirty, counters


#: device iterations per cancel probe in the chunked construction beam
CANCEL_CHUNK_ITERS = 8


def _chunked_candidates(
    dev: DeviceGraph,
    wave_j,
    seeds,
    node_ok,
    level: int,
    opts: BuildOptions,
    beam_iters: Optional[int],
    m0: int,
    tail_allow: int,
):
    """Run one wave's candidate beam in ``CANCEL_CHUNK_ITERS``-iteration
    device chunks, probing ``opts.cancel`` between dispatches. A firing
    cancel raises ``BuildCancelled`` mid-wave — at 1M scale a fused
    4096-item wave runs tens of seconds, which round 2 could only cancel
    *between* waves (VERDICT r2 weak-spot: cancellation granularity)."""
    ef = opts.ef_construction
    expand = min(max(opts.beam_expand, 1), ef)
    mi = beam_iters if beam_iters is not None else (ef + 16 + expand - 1) // expand
    cap = m0 if level == 0 else int(dev.upper_links.shape[-1])
    tk = opts.traverse if opts.traverse is not None else (cap if level == 0 else None)
    q, qn, pool_d, pool_id, pool_exp = beam.seed_wave_pool(
        dev, wave_j, seeds, node_ok, ef
    )
    total = 0
    while total < mi:
        if opts.cancel():
            raise BuildCancelled()
        step = min(CANCEL_CHUNK_ITERS, mi - total)
        pool_d, pool_id, pool_exp, it, active = beam._build_beam_chunk(
            dev, q, qn, node_ok, jnp.int32(level), pool_d, pool_id, pool_exp,
            ef=ef, chunk=step, is_level0=(level == 0), expand=expand,
            traverse_k=tk, tail_allow=tail_allow,
        )
        it, active = jax.device_get((it, active))  # one tunnel RTT, not two
        total += int(it)
        if not active:
            break
    return pool_id, pool_d, total


def _repair_deletions(
    g: HostGraph,
    dev: DeviceGraph,
    deleted_set: set[int],
    opts: BuildOptions,
    stats: BuildStats,
    touched: set[int],
) -> DeviceGraph:
    """Find rows referencing deleted slots (host scan of synced links) and
    repair them in fixed-size device blocks. Repaired owners are recorded
    in ``touched`` for the dirty-row flush."""
    hnsw.from_device(g, dev)
    del_arr = np.zeros(g.capacity, dtype=bool)
    del_arr[list(deleted_set)] = True
    deleted_j = jnp.asarray(del_arr)

    # Repair EVERY stored layer, not just 0..max_level: a height reset
    # (prepare_entry_points case 1) can leave survivors' rows on layers
    # above the new max_level, and those must be cleansed of deleted ids
    # too — the reference resizes its layer list to cover all on-disk
    # links rows for exactly this reason (hnsw.rs:346-357).
    for level in range(len(g.upper_links) + 1):
        if level == 0:
            table = g.links0
            owners = np.arange(g.capacity)
        else:
            table = g.upper_links[level - 1]
            owners = np.full(table.shape[0], -1, dtype=np.int64)
            rows = g.slot_rows[level - 1]
            owners_slots = np.nonzero(rows >= 0)[0]
            owners[rows[owners_slots]] = owners_slots
        has_del = (table >= 0) & del_arr[np.maximum(table, 0)]
        affected = np.nonzero(has_del.any(axis=1))[0]
        if level == 0:
            affected_owners = affected
        else:
            affected_owners = owners[affected]
        # owners that are themselves deleted are skipped (hnsw.rs:373-375)
        affected_owners = np.asarray(
            [s for s in affected_owners if s >= 0 and s not in deleted_set],
            dtype=np.int32,
        )
        touched.update(int(s) for s in affected_owners)
        cap = g.m0 if level == 0 else g.m
        for start in range(0, len(affected_owners), REPAIR_BLOCK):
            if opts.cancel():
                raise BuildCancelled()
            block = np.full(REPAIR_BLOCK, -1, dtype=np.int32)
            chunk = affected_owners[start : start + REPAIR_BLOCK]
            block[: len(chunk)] = chunk
            dev = wave_ops.repair_deleted_rows(
                dev,
                jnp.asarray(block),
                deleted_j,
                jnp.int32(level),
                is_level0=(level == 0),
                cap=cap,
                alpha=opts.alpha,
            )
    return dev
