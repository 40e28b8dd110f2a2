"""Device-side jitted ops for wave-parallel graph construction.

The TPU replacement of the reference's rayon-parallel insertion
(hnsw.rs:168-185) per SURVEY §7: a *wave* of W items is inserted at once —
one batched candidate beam search, one batched α-prune, one forward-row
scatter, and one deterministic reverse-edge merge (sorted-COO segments
replace the lock-free papaya map's racy updates).

Determinism: within a wave, reverse contributions are sorted by
(destination, distance) and merged with a single scatter per destination —
same inputs always produce the same graph, unlike the reference whose
snapshot tests must pin rayon to one thread (src/tests/mod.rs:105).
"""

from __future__ import annotations

from functools import partial
from typing import NamedTuple

import jax
import jax.numpy as jnp
import numpy as np

from ..models.hnsw import DeviceGraph
from ..ops import beam, distances, prune, topk
from ..ops.topk import INF, NO_ID


class WaveLevelResult(NamedTuple):
    graph: DeviceGraph
    selected: jax.Array  # [W, cap] pruned neighbors (next level's seeds)
    dirty: jax.Array  # [N_pad] bool — slots whose link rows changed
    counters: jax.Array  # [4] i64: fwd links, reverse link delta, beam iters, row gathers


#: counters[] layout (device-accumulated build statistics — the real
#: equivalents of the reference's atomic BuildStats, stats.rs:10-38).
#: int32 lanes (jax x64 is off): CNT_ROW_GATHERS counts 1024-row granules
#: so 10M-scale builds cannot overflow; the host converts back to rows.
CNT_FWD_LINKS = 0
CNT_REV_DELTA = 1
CNT_BEAM_ITERS = 2
CNT_ROW_GATHERS = 3  # unit: 1024 gathered rows
GATHER_GRANULE = 1024

#: member-table width above which the flat routing-layer candidate
#: selection switches from lax.top_k to approx_max_k (measured 18.2 ms
#: vs 4.3 ms at [4096, 8192] on v5e); env-tunable for A/B diagnostics
_FLAT_APPROX_MIN_U = int(
    __import__("os").environ.get("HANNOY_TPU_FLAT_APPROX_MIN_U", 8192)
)


def _scatter_rows(
    table: jax.Array,  # [R, cap]
    rows: jax.Array,  # [U] row indices (NO_ID → dropped)
    vals: jax.Array,  # [U, cap]
) -> jax.Array:
    safe = jnp.where(rows >= 0, rows, table.shape[0])  # OOB → dropped
    return table.at[safe].set(vals, mode="drop")


def _set_level_rows(
    g: DeviceGraph, level, slots: jax.Array, ids: jax.Array, d: jax.Array
) -> DeviceGraph:
    """Overwrite link rows of ``slots`` at ``level`` (slots may be NO_ID).

    ``level`` is the static int 0 for layer 0; upper layers may pass a
    traced scalar — the stacked tables are updated with a dynamic index so
    one compilation covers every upper layer.

    ``ids``/``d`` narrower than the physical table (build-time slack rows,
    see ``wave_insert_level``) are padded with sentinels."""
    tw = g.links0.shape[-1] if (isinstance(level, int) and level == 0) else g.upper_links.shape[-1]
    if ids.shape[-1] < tw:
        pad = tw - ids.shape[-1]
        ids = jnp.pad(ids, ((0, 0), (0, pad)), constant_values=NO_ID)
        d = jnp.pad(d, ((0, 0), (0, pad)), constant_values=jnp.inf)
    if isinstance(level, int) and level == 0:
        links0 = _scatter_rows(g.links0, slots, ids)
        dists0 = _scatter_rows(g.dists0, slots, d)
        return _replace(g, links0=links0, dists0=dists0)
    l = level - 1
    rows = jnp.where(
        slots >= 0, jnp.take(g.slot_rows, l, axis=0)[jnp.maximum(slots, 0)], NO_ID
    )
    ul = jax.lax.dynamic_update_index_in_dim(
        g.upper_links, _scatter_rows(jnp.take(g.upper_links, l, axis=0), rows, ids), l, 0
    )
    ud = jax.lax.dynamic_update_index_in_dim(
        g.upper_dists, _scatter_rows(jnp.take(g.upper_dists, l, axis=0), rows, d), l, 0
    )
    return _replace(g, upper_links=ul, upper_dists=ud)


def _level_rows(g: DeviceGraph, level, slots: jax.Array):
    """(ids, dists) link rows of ``slots`` at ``level`` (see _set_level_rows
    for the static/traced level contract)."""
    ids = beam.links_at(g, level, slots)
    safe = jnp.maximum(slots, 0)
    if isinstance(level, int) and level == 0:
        d = g.dists0[safe]
    else:
        l = level - 1
        rows = jnp.take(g.slot_rows, l, axis=0)[safe]
        d = jnp.take(g.upper_dists, l, axis=0)[jnp.maximum(rows, 0)]
        d = jnp.where((rows >= 0)[:, None], d, INF)
    d = jnp.where(ids != NO_ID, d, INF)
    return ids, d


def _replace(g: DeviceGraph, **kw) -> DeviceGraph:
    fields = dict(
        vectors=g.vectors,
        norms=g.norms,
        links0=g.links0,
        dists0=g.dists0,
        upper_links=g.upper_links,
        upper_dists=g.upper_dists,
        slot_rows=g.slot_rows,
        entry_slots=g.entry_slots,
        valid=g.valid,
        metric_name=g.metric_name,
        max_level=g.max_level,
    )
    fields.update(kw)
    return DeviceGraph(**fields)


@partial(
    jax.jit,
    static_argnames=(
        "is_level0", "ef", "cap", "alpha", "inc_cap", "flat", "expand",
        "beam_iters", "beam_tail_allow", "traverse",
    ),
    donate_argnames=("g", "dirty", "counters"),
)
def wave_insert_level(
    g: DeviceGraph,
    wave_slots: jax.Array,  # [W] (-1 padded)
    seeds: jax.Array,  # [W, S] entry slots for this level's walk
    node_ok: jax.Array,  # [N_pad] exists-and-not-deleted (beam traversal)
    level: jax.Array,  # traced scalar; only read when not is_level0
    dirty: jax.Array | None = None,  # [N_pad] bool touched-row accumulator
    counters: jax.Array | None = None,  # [4] i64 build statistics
    is_level0: bool = True,
    ef: int = 100,
    cap: int = 32,
    alpha: float = 1.0,
    inc_cap: int = 16,
    flat: bool = False,
    expand: int = 1,
    beam_iters: int | None = None,
    beam_tail_allow: int = 0,
    traverse: int | None = None,
    pre_ids: jax.Array | None = None,  # [W, ef] precomputed candidates
    pre_d: jax.Array | None = None,
    flat_members: jax.Array | None = None,  # [U] compact member slots (-1 pad)
    flat_col_order: jax.Array | None = None,  # [U] insertion order per column
    flat_row_base: jax.Array | None = None,  # scalar: wave rows' order offset
) -> WaveLevelResult:
    """Insert one wave at one level (the batched hnsw.rs:312-327 body).

    1. candidate search (beam at ``level``, or exact scan when the graph is
       still tiny — ``flat=True``),
    2. α-prune → forward row scatter,
    3. deterministic reverse-edge merge with overflow α-prune.

    ``dirty`` accumulates every slot whose link row this wave rewrote (the
    wave itself + reverse-merge destinations) so incremental builds flush
    only touched rows (reference flushes only its in-progress maps,
    hnsw.rs:192-213). ``counters`` accumulates real build statistics on
    device — one host transfer at build end, no per-wave syncs.
    """
    metric = g.metric
    W = wave_slots.shape[0]
    wave_ok = wave_slots >= 0
    q = g.vectors[jnp.maximum(wave_slots, 0)]
    qn = g.norms[jnp.maximum(wave_slots, 0)]
    level = 0 if is_level0 else level
    if dirty is None:
        dirty = jnp.zeros((g.capacity,), dtype=bool)
    if counters is None:
        # + 0*wave keeps the array derived from a traced input (shard_map
        # VMA tracking requires while_loop carries to match, see CLAUDE.md)
        counters = jnp.zeros((4,), dtype=jnp.int32) + 0 * wave_slots[0]

    if pre_ids is not None:
        # candidates computed outside the fused wave program — the
        # cancellable build path runs the beam in host-probed chunks
        # (builder._chunked_candidates) and hands the pool in here
        cand_ids, cand_d = pre_ids, pre_d
    elif flat_members is not None:
        # exact top-ef against a *compact* member table — the routing-layer
        # candidate search as one MXU matmul instead of ~ef beam hops of
        # per-row HBM gathers. A layer holds ~N/M^level members, so every
        # layer >= 1 of a <= ~1M build fits the [W, U] matrix comfortably.
        # Candidate visibility is insertion-order semantics, expressed one
        # of two ways: ``flat_col_order`` (host-computed per-column ranks;
        # a column is a legal candidate for wave row i iff its rank is
        # below the row's global order ``flat_row_base + i`` — already
        # active columns carry rank -1, later-group columns +inf), or the
        # device ``valid`` mask (candidates = already-activated members,
        # the ramped-wave fallback). The order form lets one wave carry an
        # entire routing layer: earlier wave members are legal candidates
        # for later ones (the candidate search reads only vectors, never
        # link rows, so no activation barrier is needed mid-wave).
        # Exactness dominates the beam's approximation, so candidate
        # quality is >= the reference's walk_layer at every ef
        # (hnsw.rs:460-518); recall measured >= the beam path.
        mvec = g.vectors[jnp.maximum(flat_members, 0)]
        mnrm = g.norms[jnp.maximum(flat_members, 0)]
        if metric.is_packed:
            d_mat = distances.packed_matrix_mxu(metric, q, qn, mvec, mnrm)
        else:
            d_mat = distances.matrix_distances(metric, q, qn, mvec, mnrm)
        if flat_col_order is not None:
            row_ord = flat_row_base + jnp.arange(W, dtype=jnp.int32)
            ok_col = flat_col_order[None, :] < row_ord[:, None]
        else:
            ok_col = ((flat_members >= 0) & g.valid[jnp.maximum(flat_members, 0)])[None, :]
        d_mat = jnp.where(ok_col, d_mat, INF)
        k = min(ef, flat_members.shape[0])
        if flat_members.shape[0] > _FLAT_APPROX_MIN_U:
            # lax.top_k over wide member tables dominates the dispatch
            # (measured 18.2 ms vs 4.3 ms at [4096, 8192] on v5e);
            # approx_max_k's binned reduction is deterministic and its
            # per-op recall target feeds an α-prune that keeps only
            # cap << ef of the pool anyway
            neg, idx = jax.lax.approx_max_k(-d_mat, k, recall_target=0.95)
        else:
            neg, idx = jax.lax.top_k(-d_mat, k)
        cand_d = -neg
        cand_ids = jnp.where(jnp.isfinite(cand_d), flat_members[idx], NO_ID)
        if cand_ids.shape[1] < ef:
            pad = ef - cand_ids.shape[1]
            cand_ids = jnp.pad(cand_ids, ((0, 0), (0, pad)), constant_values=NO_ID)
            cand_d = jnp.pad(cand_d, ((0, 0), (0, pad)), constant_values=INF)
    elif flat:
        d_mat = distances.matrix_distances(metric, q, qn, g.vectors, g.norms)
        member = (
            g.valid
            if is_level0
            else (g.valid & (jnp.take(g.slot_rows, level - 1, axis=0) >= 0))
        )
        d_mat = jnp.where(member[None, :], d_mat, INF)
        neg, idx = jax.lax.top_k(-d_mat, min(ef, g.capacity))
        cand_d, cand_ids = -neg, jnp.where(jnp.isfinite(-neg), idx, NO_ID)
        if cand_ids.shape[1] < ef:
            pad = ef - cand_ids.shape[1]
            cand_ids = jnp.pad(cand_ids, ((0, 0), (0, pad)), constant_values=NO_ID)
            cand_d = jnp.pad(cand_d, ((0, 0), (0, pad)), constant_values=INF)
    else:
        # construction beams converge long before the search-time default
        # iteration cap; ef + 16 expansions is enough for candidate quality
        # (the alpha-prune keeps only `cap` of them anyway). traverse_k
        # keeps the hot gather at `cap` rows when tables carry slack.
        mi = beam_iters if beam_iters is not None else (ef + 16 + expand - 1) // expand
        # traverse: construction beams may expand only each row's nearest
        # ``traverse`` links (rows are distance-sorted) — the per-hop row
        # gather is the build bottleneck and runs at a per-row cost floor,
        # so fewer rows is the one lever left (CAGRA-style rank
        # truncation). None → the full row (reference semantics), which
        # for layer 0 means the logical cap when tables carry slack.
        tk = traverse if traverse is not None else (cap if is_level0 else None)
        res = beam.beam_search(
            g, q, qn, seeds, ef, max_iters=mi, node_ok=node_ok, level=level,
            expand=expand, traverse_k=tk,
            tail_allow=beam_tail_allow if is_level0 else 0,
        )
        cand_ids, cand_d = res.slots, res.dists
        width = int(cap if is_level0 else g.upper_links.shape[-1])
        counters = counters.at[CNT_BEAM_ITERS].add(res.iters)
        # every beam iteration physically gathers W * width vector rows
        granules = max(1, round(W * width / GATHER_GRANULE))
        counters = counters.at[CNT_ROW_GATHERS].add(res.iters * granules)

    # exclude self (re-inserted entry points find themselves at distance 0 —
    # reference add_link's p == q guard, hnsw.rs:530-532)
    self_hit = cand_ids == wave_slots[:, None]
    cand_ids = jnp.where(self_hit, NO_ID, cand_ids)
    cand_d = jnp.where(self_hit, INF, cand_d)
    cand_ids = jnp.where(wave_ok[:, None], cand_ids, NO_ID)
    cand_d = jnp.where(wave_ok[:, None], cand_d, INF)

    sel_ids, sel_d = prune.robust_prune(
        metric, g.vectors, g.norms, cand_ids, cand_d, cap, alpha
    )

    # ---- forward rows ----
    g = _set_level_rows(g, level, wave_slots, sel_ids, sel_d)
    counters = counters.at[CNT_FWD_LINKS].add(jnp.sum(sel_ids != NO_ID, dtype=jnp.int32))
    dirty = dirty.at[jnp.where(wave_ok, wave_slots, g.capacity)].set(True, mode="drop")

    # ---- reverse edges: sorted-COO segment merge ----
    g, counters, u_dst = reverse_merge_edges(
        g, level, wave_slots, sel_ids, sel_d, counters, cap, alpha, inc_cap
    )
    dirty = dirty.at[jnp.where(u_dst != NO_ID, u_dst, g.capacity)].set(True, mode="drop")

    # ---- stranded-insert guarantee (layer 0) ----
    # The α-overflow rule can reject *every* reverse edge of a new item
    # inserted into a mature graph (its distances lose against settled
    # rows), leaving the item with outbound links only — permanently
    # unreachable by search. The reference shares this failure mode
    # (add_link drops the incoming edge on overflow, hnsw.rs:538-552);
    # measured here: 5/16 incremental inserts stranded at 3k×96-d
    # isotropic. Guarantee minimum in-degree instead: any wave item not
    # present in its 4 nearest selected neighbors' rows is force-linked
    # into its nearest neighbor's worst slot (deterministic, row re-sorted).
    if is_level0:
        g, dirty, counters = _ensure_inbound(
            g, wave_slots, sel_ids, sel_d, dirty, counters
        )

    return WaveLevelResult(g, sel_ids, dirty, counters)


def reverse_merge_edges(
    g: DeviceGraph,
    level,
    src_slots: jax.Array,  # [W] edge sources (-1 padded)
    sel_ids: jax.Array,  # [W, cap] each source's selected destinations
    sel_d: jax.Array,  # [W, cap]
    counters: jax.Array,
    cap: int,
    alpha: float,
    inc_cap: int = 16,
) -> tuple[DeviceGraph, jax.Array, jax.Array]:
    """Merge the reverse of (src → sel) edges into destination rows.

    Edges are grouped by destination (sorted by (dst, distance) for
    determinism) and merged in two passes (reference add_link semantics,
    hnsw.rs:523-560: push while there is room, α-prune on overflow):

    A. a *cheap* distance-merge with no vector gathers, run only over
       the real unique destinations (while_loop with a dynamic trip
       count — a fixed-grid lax.map would burn ~2/3 of every wave on
       padding chunks and unconditional α-prune gathers);
    B. an α-prune over only the rows that overflowed the physical
       table width, compacted to a prefix.

    With build-time slack (table width > cap) overflow is rare and B is
    nearly free; slack rows are reduced back to ``cap`` by
    ``prune_slack_rows`` at build end. slack=0 reproduces the reference's
    per-overflow prune exactly. Shared by the wave inserter
    (``wave_insert_level``) and the bulk connector (``build/bulk.py``).

    Returns (graph, counters, u_dst) — ``u_dst`` [W*cap] holds the unique
    destinations touched (NO_ID padded) for dirty tracking.
    """
    dst = sel_ids.reshape(-1)  # [W*cap]
    src = jnp.repeat(src_slots, cap)
    rd = sel_d.reshape(-1)
    ok = (dst != NO_ID) & (src != NO_ID)
    # sort by (dst, distance); invalid dsts sort last
    sort_dst = jnp.where(ok, dst, jnp.int32(2**30))
    sort_dst, rd_s, src_s, dst_s = jax.lax.sort(
        (sort_dst, rd, src, dst), dimension=0, num_keys=2
    )
    E = dst.shape[0]
    idx = jnp.arange(E, dtype=jnp.int32)
    first = jnp.concatenate(
        [jnp.ones((1,), bool), sort_dst[1:] != sort_dst[:-1]]
    )
    seg_id = jnp.cumsum(first.astype(jnp.int32)) - 1  # [E]
    seg_start = jax.lax.cummax(jnp.where(first, idx, 0))
    rank = idx - seg_start

    valid_e = dst_s != NO_ID
    u_dst = jnp.full((E,), NO_ID, dtype=jnp.int32)
    u_dst = u_dst.at[jnp.where(first & valid_e, seg_id, E)].set(dst_s, mode="drop")
    n_unique = jnp.sum(first & valid_e, dtype=jnp.int32)

    inc_ids = jnp.full((E, inc_cap), NO_ID, dtype=jnp.int32)
    inc_d = jnp.full((E, inc_cap), INF)
    keep = valid_e & (rank < inc_cap)
    sc_r = jnp.where(keep, seg_id, E)
    sc_c = jnp.where(keep, rank, 0)
    inc_ids = inc_ids.at[sc_r, sc_c].set(src_s, mode="drop")
    inc_d = inc_d.at[sc_r, sc_c].set(rd_s, mode="drop")

    g, counters, over_pos = _reverse_cheap_merge(
        g, level, u_dst, inc_ids, inc_d, n_unique, counters
    )
    g, counters = _reverse_prune_overflow(
        g, level, u_dst, inc_ids, inc_d, over_pos, counters, cap, alpha
    )
    return g, counters, u_dst


def _ensure_inbound(
    g: DeviceGraph,
    wave_slots: jax.Array,  # [W]
    sel_ids: jax.Array,  # [W, cap] pruned forward links (ascending)
    sel_d: jax.Array,  # [W, cap]
    dirty: jax.Array,
    counters: jax.Array,
    k_check: int = 4,
    force_cap: int = 4,
    write_cap: int | None = None,
    indeg: jax.Array | None = None,
) -> tuple[DeviceGraph, jax.Array, jax.Array]:
    """Force ≥1 inbound edge for wave items the reverse merge stranded.

    ``write_cap``: column budget the forced edge must land under. During
    build it stays None (= the physical table width; slack columns are
    legal, the final α-prune arbitrates). The END-OF-BUILD re-check MUST
    pass the logical cap m0: ``from_device`` persists only ``[:, :m0]``,
    so an edge forced into a slack column survives the device in-degree
    probe but silently vanishes on sync — observed round 4 as 3 rows
    still in-degree-0 on the host after a "clean" 12-round re-check
    (scripts/check_bulk.py 20k wave variant).

    ``indeg``: optional per-slot layer-0 in-degree. When given, the
    forced edge displaces the WORST column of the destination row whose
    occupant can afford to lose an in-edge (NO_ID or in-degree >= 2)
    instead of unconditionally the last column — without this, two
    out-degree-1 rows whose sole forward links point at the same full
    hub displace each other's only in-edge forever (observed round 4: a
    perfect A/B ping-pong across all 12 re-check rounds, two trios
    sharing three hub rows). Wave-path callers omit it (one in-degree
    scatter-add per wave would serialize the fused program for a case
    the end-of-build re-check repairs anyway).

    A wave item's inbound edges can only live in rows of its own selected
    destinations (the reverse merge writes nowhere else), so presence is
    checked against the ``k_check`` nearest selected rows. Stranded items
    are written into their nearest neighbor's *last* column — displacing
    that row's worst link — at deterministic per-destination ranks (at
    most ``force_cap`` per destination, sorted by (destination, distance)
    like the reverse merge), and touched rows are re-sorted to keep the
    ascending-row invariant.

    The guarantee is *bounded*, not absolute: (a) when more than
    ``force_cap`` stranded items share the same nearest destination, items
    at rank >= force_cap stay stranded this wave; (b) a forced edge sits in
    its destination row's worst slots, so a later wave's reverse merge or
    force-link can displace it, re-stranding the earlier item. Both cases
    are strictly rarer than the unconditional stranding they replace (the
    reference has no such pass at all — add_link just drops the incoming
    edge on overflow, hnsw.rs:538-552), and searches still complete
    short rows via the degraded top-up (reader.rs:771-795 analogue).
    """
    W, cap = sel_ids.shape
    near = sel_ids[:, :k_check]
    rows = beam.links_at(g, 0, near.reshape(-1)).reshape(W, k_check, -1)
    present = jnp.any(
        (rows == wave_slots[:, None, None]) & (near != NO_ID)[:, :, None],
        axis=(1, 2),
    )
    need = (wave_slots >= 0) & ~present & (sel_ids[:, 0] != NO_ID)
    dst = jnp.where(need, sel_ids[:, 0], NO_ID)
    d0 = jnp.where(need, sel_d[:, 0], INF)

    sort_key = jnp.where(need, dst, jnp.int32(2**30))
    sk, dd, src_s, dst_s = jax.lax.sort(
        (sort_key, d0, wave_slots, dst), dimension=0, num_keys=2
    )
    idx = jnp.arange(W, dtype=jnp.int32)
    first = jnp.concatenate([jnp.ones((1,), bool), sk[1:] != sk[:-1]])
    rank = idx - jax.lax.cummax(jnp.where(first, idx, 0))
    keep = (dst_s != NO_ID) & (rank < force_cap)

    tw = g.links0.shape[-1]
    wc = tw if write_cap is None else min(write_cap, tw)
    safe_dst = jnp.where(keep, dst_s, g.capacity)
    rank_k = jnp.where(keep, rank, 0)
    if indeg is None:
        col = wc - 1 - rank_k
    else:
        # rank-th worst column of dst whose occupant is safe to displace
        occ = g.links0[jnp.maximum(dst_s, 0), :wc]  # [W, wc]
        occ_safe = (occ == NO_ID) | (indeg[jnp.maximum(occ, 0)] >= 2)
        j = jnp.arange(wc, dtype=jnp.int32)[None, :]
        score = jnp.where(occ_safe, j, jnp.int32(-1))
        safe_desc = -jnp.sort(-score, axis=-1)  # [W, wc] desc, -1 padded
        picked = jnp.take_along_axis(safe_desc, rank_k[:, None], axis=-1)[:, 0]
        col = jnp.where(picked >= 0, picked, wc - 1 - rank_k)
    links0 = g.links0.at[safe_dst, col].set(src_s, mode="drop")
    dists0 = g.dists0.at[safe_dst, col].set(dd, mode="drop")

    # re-sort the touched rows (ascending-row invariant)
    touched = jnp.where(keep, dst_s, NO_ID)
    t_rows = links0[jnp.maximum(touched, 0)]
    t_d = dists0[jnp.maximum(touched, 0)]
    t_d, t_rows = topk.sort_by_dist(t_d, t_rows)
    links0 = _scatter_rows(links0, touched, t_rows)
    dists0 = _scatter_rows(dists0, touched, t_d)

    dirty = dirty.at[safe_dst].set(True, mode="drop")
    counters = counters.at[CNT_FWD_LINKS].add(jnp.sum(keep, dtype=jnp.int32))
    return _replace(g, links0=links0, dists0=dists0), dirty, counters


@partial(jax.jit, static_argnames=("cap",))
def layer0_indegree(g: "DeviceGraph", cap: int | None = None) -> jax.Array:
    """Layer-0 in-degree of every slot, counting edges from live rows only
    → [capacity] int32. One scatter-add over the whole link table.

    ``cap``: count only the first ``cap`` columns — the end-of-build
    re-check passes m0 because ``from_device`` persists only ``[:, :m0]``
    and an edge living in a slack column does not exist for readers."""
    links = g.links0 if cap is None else g.links0[:, :cap]
    links = jnp.where(g.valid[:, None], links, NO_ID)
    tgt = jnp.where(links != NO_ID, links, g.capacity)
    return (
        jnp.zeros((g.capacity,), jnp.int32)
        .at[tgt.reshape(-1)]
        .add(1, mode="drop")
    )


@partial(jax.jit, static_argnames=("cap",))
def layer0_degrees(
    g: "DeviceGraph", cap: int | None = None
) -> tuple[jax.Array, jax.Array]:
    """(in-degree, out-degree) of every slot at layer 0 → two [capacity]
    int32 arrays, one program (the end-of-build re-check's probe).
    ``cap``: see ``layer0_indegree``."""
    links = g.links0 if cap is None else g.links0[:, :cap]
    outdeg = jnp.sum(links != NO_ID, axis=-1, dtype=jnp.int32)
    return layer0_indegree(g, cap), outdeg


@partial(
    jax.jit,
    static_argnames=("shift", "write_cap"),
    donate_argnames=("g", "dirty", "counters"),
)
def force_inbound_for(
    g: "DeviceGraph",
    stranded: jax.Array,  # [S] slots with layer-0 in-degree 0 (-1 padded)
    indeg: jax.Array,  # [capacity] current layer-0 in-degree
    dirty: jax.Array,
    counters: jax.Array,
    shift: int = 0,
    write_cap: int | None = None,
):
    """Force one inbound edge for each already-built stranded row, using
    its *current* forward links as the destination candidates (they are
    ascending, so column 0 is its nearest neighbor). The end-of-build
    re-check driver calls this until no live slot has in-degree 0 —
    turning the bounded per-wave guarantee (``_ensure_inbound``; later
    waves can displace forced edges, hnsw.rs:538-552 failure mode) into a
    checked one.

    The forced edge lands in its destination row's worst column,
    displacing that row's worst link — which may be some other item's
    only in-edge. Destinations are therefore reordered to prefer forward
    neighbors whose worst link's target has in-degree >= 2 (victim-aware;
    using the ``indeg`` the driver already computed this round), and
    ``shift`` additionally rotates the preference across rounds — two
    stranded rows sharing a nearest neighbor otherwise displace each
    other's forced edge forever (observed at 20k: one row still stranded
    after 8 nearest-only rounds)."""
    ok = stranded != NO_ID
    rows = g.links0[jnp.maximum(stranded, 0)]
    dcol = g.dists0[jnp.maximum(stranded, 0)]
    if shift:
        rows = rows[:, shift:]
        dcol = dcol[:, shift:]
    # victim of a forced write into row r = the link at the column the
    # force will overwrite (the worst within write_cap)
    vcol = (g.links0.shape[-1] if write_cap is None else write_cap) - 1
    victim = g.links0[jnp.maximum(rows, 0), vcol]  # [S, W]
    safe = (rows != NO_ID) & ((victim == NO_ID) | (indeg[jnp.maximum(victim, 0)] >= 2))
    # stable partition: safe destinations first, original ascending order
    # preserved within each class (rank by 2*unsafe + position scaled)
    W = rows.shape[1]
    pos = jnp.arange(W, dtype=jnp.int32)[None, :]
    key = jnp.where(rows == NO_ID, 2 * W + pos, jnp.where(safe, pos, W + pos))
    order = jnp.argsort(key, axis=1)
    rows = jnp.take_along_axis(rows, order, axis=1)
    dcol = jnp.take_along_axis(dcol, order, axis=1)
    sel_ids = jnp.where(ok[:, None], rows, NO_ID)
    sel_d = jnp.where(ok[:, None], dcol, INF)
    return _ensure_inbound(
        g, stranded, sel_ids, sel_d, dirty, counters,
        write_cap=write_cap, indeg=indeg,
    )


import os as _os

#: reverse-merge chunk rows per while-loop step. Larger chunks mean fewer
#: sequential device steps (each step is launch-overhead-heavy at small
#: shapes) at the cost of more HBM for the staged gather; env-tunable for
#: chip sweeps.
_CHUNK_A = int(_os.environ.get("HANNOY_TPU_CHUNK_A", 2048))  # no vector gathers
_CHUNK_B = int(_os.environ.get("HANNOY_TPU_CHUNK_B", 2048))  # gathers [CH, TW+inc, D]
_POS_SENTINEL = jnp.int32(2**30)


def _reverse_cheap_merge(g, level, u_dst, inc_ids, inc_d, n_unique, counters):
    """Phase A: distance-merge incoming edges into each receiving row;
    finalize rows that fit in the physical width, record overflow segment
    positions for phase B. Runs ceil(n_unique / CH) chunks."""
    E, inc_cap = inc_ids.shape
    CH = min(_CHUNK_A, E)
    pad = (-E) % CH  # dynamic_slice must never clamp (misaligns offsets)
    if pad:
        u_dst = jnp.concatenate([u_dst, jnp.full((pad,), NO_ID, jnp.int32)])
        inc_ids = jnp.concatenate([inc_ids, jnp.full((pad, inc_cap), NO_ID, jnp.int32)])
        inc_d = jnp.concatenate([inc_d, jnp.full((pad, inc_cap), INF)])
    n_steps = (n_unique + CH - 1) // CH
    # derive from a traced input so shard_map's varying-manual-axes match
    # between while_loop carry input and output (see CLAUDE.md gotcha)
    over_pos = jnp.full_like(u_dst, _POS_SENTINEL)

    def body(state):
        links0, dists0, ul, ud, over_pos, counters, i = state
        gc = _replace(g, links0=links0, dists0=dists0, upper_links=ul, upper_dists=ud)
        p0 = i * CH
        dst_c = jax.lax.dynamic_slice(u_dst, (p0,), (CH,))
        iid_c = jax.lax.dynamic_slice(inc_ids, (p0, 0), (CH, inc_cap))
        idd_c = jax.lax.dynamic_slice(inc_d, (p0, 0), (CH, inc_cap))
        row_ids, row_d = _level_rows(gc, level, dst_c)
        tw = row_ids.shape[-1]

        ids = jnp.concatenate([row_ids, iid_c], axis=-1)
        d = jnp.concatenate([row_d, idd_c], axis=-1)
        keepm = topk.unique_mask(ids) & jnp.isfinite(d)
        d = jnp.where(keepm, d, INF)
        ids = jnp.where(keepm, ids, NO_ID)
        d, ids = topk.sort_by_dist(d, ids)
        n_total = jnp.sum(ids != NO_ID, axis=-1)
        fits = n_total <= tw

        live = dst_c != NO_ID
        write_dst = jnp.where(fits & live, dst_c, NO_ID)
        old_n = jnp.sum(row_ids != NO_ID, axis=-1)
        delta = jnp.sum(jnp.where(fits & live, n_total - old_n, 0), dtype=jnp.int32)
        gc = _set_level_rows(gc, level, write_dst, ids[:, :tw], d[:, :tw])

        marks = jnp.where(
            (~fits) & live, p0 + jnp.arange(CH, dtype=jnp.int32), _POS_SENTINEL
        )
        over_pos = jax.lax.dynamic_update_slice(over_pos, marks, (p0,))
        counters = counters.at[CNT_REV_DELTA].add(delta)
        return (gc.links0, gc.dists0, gc.upper_links, gc.upper_dists, over_pos, counters, i + 1)

    def cond(state):
        return state[-1] < n_steps

    init = (g.links0, g.dists0, g.upper_links, g.upper_dists, over_pos, counters, jnp.int32(0))
    links0, dists0, ul, ud, over_pos, counters, _ = jax.lax.while_loop(cond, body, init)
    return (
        _replace(g, links0=links0, dists0=dists0, upper_links=ul, upper_dists=ud),
        counters,
        over_pos,
    )


def _reverse_prune_overflow(g, level, u_dst, inc_ids, inc_d, over_pos, counters, cap, alpha):
    """Phase B: α-prune the rows phase A could not fit (reference
    ``add_link`` overflow branch). Overflow positions are compacted to a
    prefix; runs ceil(n_over / CH) chunks of vector-gathering prune."""
    metric = g.metric
    E, inc_cap = inc_ids.shape
    CH = min(_CHUNK_B, E)
    over_sorted = jnp.sort(over_pos)
    pad = (-over_sorted.shape[0]) % CH
    if pad:
        over_sorted = jnp.concatenate(
            [over_sorted, jnp.full((pad,), _POS_SENTINEL, jnp.int32)]
        )
    n_over = jnp.sum(over_pos != _POS_SENTINEL, dtype=jnp.int32)
    n_steps = (n_over + CH - 1) // CH

    def body(state):
        links0, dists0, ul, ud, counters, i = state
        gc = _replace(g, links0=links0, dists0=dists0, upper_links=ul, upper_dists=ud)
        p0 = i * CH
        pos_c = jax.lax.dynamic_slice(over_sorted, (p0,), (CH,))
        valid = pos_c != _POS_SENTINEL
        p = jnp.where(valid, pos_c, 0)
        dst_c = jnp.where(valid, u_dst[p], NO_ID)
        iid_c = inc_ids[p]
        idd_c = jnp.where(valid[:, None], inc_d[p], INF)
        row_ids, row_d = _level_rows(gc, level, dst_c)
        old_n = jnp.sum(row_ids != NO_ID, axis=-1)
        m_ids, m_d = prune.merge_link_rows(
            metric, gc.vectors, gc.norms, row_ids, row_d, iid_c, idd_c, cap, alpha
        )
        delta = jnp.sum(
            jnp.where(dst_c != NO_ID, jnp.sum(m_ids != NO_ID, axis=-1) - old_n, 0),
            dtype=jnp.int32,
        )
        gc = _set_level_rows(gc, level, dst_c, m_ids, m_d)
        counters = counters.at[CNT_REV_DELTA].add(delta)
        return (gc.links0, gc.dists0, gc.upper_links, gc.upper_dists, counters, i + 1)

    def cond(state):
        return state[-1] < n_steps

    init = (g.links0, g.dists0, g.upper_links, g.upper_dists, counters, jnp.int32(0))
    links0, dists0, ul, ud, counters, _ = jax.lax.while_loop(cond, body, init)
    return (
        _replace(g, links0=links0, dists0=dists0, upper_links=ul, upper_dists=ud),
        counters,
    )


def reverse_merge_edges_streamed(
    g: DeviceGraph,
    level,
    src_slots: jax.Array,  # [n_pad] edge sources (-1 padded)
    sel_ids: jax.Array,  # [n_pad, cap] each source's selected destinations
    sel_d: jax.Array,  # [n_pad, cap]
    counters: jax.Array,
    cap: int,
    alpha: float,
    inc_cap: int,
) -> tuple[DeviceGraph, jax.Array, jax.Array]:
    """Global single-pass variant of :func:`reverse_merge_edges` for the
    bulk connector: ONE sort over ALL reverse edges of the build, then the
    same cheap-merge / overflow-prune phases streamed over *segments* of
    the sorted edge list instead of materialized ``[E, inc_cap]`` tables
    (at 1M×cap=32 the edge list is ~32M entries — materializing per-edge
    incoming tables would cost ~5 GB of HBM, while three sorted [E]
    columns cost ~0.4 GB).

    Why global: the chunked pass merges 4096-source slices sequentially,
    so each of ~244 slices pays its own sort plus ~n_unique/CH while-loop
    steps, and destinations shared across slices are re-merged every time
    (~7k sequential device steps at 1M — 42 s of the round-5 trace). One
    global pass touches every destination exactly once: ~n_unique/CH +
    n_over/CH steps total (~0.7k), one 32M-row sort amortized across the
    whole build. Each destination receives its ``inc_cap`` *nearest*
    incoming edges (the sort is by (dst, distance)) instead of the
    nearest-16-per-slice union — edges beyond rank inc_cap=cap would lose
    the α-prune against nearer incoming anyway (add_link semantics,
    hnsw.rs:523-560: the reference itself drops incoming edges on
    overflow).

    Returns (graph, counters, u_dst [capacity+1] unique destinations,
    NO_ID padded) for dirty tracking.
    """
    E = src_slots.shape[0] * cap
    dst = sel_ids.reshape(-1)
    src = jnp.repeat(src_slots, cap)
    rd = sel_d.reshape(-1)
    ok = (dst != NO_ID) & (src != NO_ID)
    sort_dst = jnp.where(ok, dst, jnp.int32(2**30))
    sort_dst, rd_s, src_s, dst_s = jax.lax.sort(
        (sort_dst, rd, src, dst), dimension=0, num_keys=2
    )
    idx = jnp.arange(E, dtype=jnp.int32)
    first = jnp.concatenate([jnp.ones((1,), bool), sort_dst[1:] != sort_dst[:-1]])
    valid_e = dst_s != NO_ID
    seg_id = jnp.cumsum(first.astype(jnp.int32)) - 1  # [E]

    # unique destinations are slots — at most ``capacity`` of them, so the
    # segment tables compact to [U] with U = capacity padded to the chunk
    U = g.links0.shape[0]
    CH = min(_CHUNK_A, U)
    Upad = U + ((-U) % CH)
    tgt = jnp.where(first & valid_e, seg_id, Upad)
    u_dst = jnp.full((Upad + 1,), NO_ID, jnp.int32).at[tgt].set(dst_s, mode="drop")
    seg_start = jnp.zeros((Upad + 1,), jnp.int32).at[tgt].set(idx, mode="drop")
    seg_cnt = (
        jnp.zeros((Upad + 1,), jnp.int32)
        .at[jnp.where(valid_e, seg_id, Upad)]
        .add(1, mode="drop")
    )
    n_unique = jnp.sum(first & valid_e, dtype=jnp.int32)
    n_steps = (n_unique + CH - 1) // CH
    over_pos = jnp.full((Upad,), _POS_SENTINEL, jnp.int32)

    rank_cols = jnp.arange(inc_cap, dtype=jnp.int32)[None, :]

    def inc_window(st, cn):
        """Gather each destination's nearest ``inc_cap`` incoming edges
        from its sorted segment → ([CH, inc_cap] ids, dists)."""
        idx2 = jnp.clip(st[:, None] + rank_cols, 0, E - 1)
        val = rank_cols < jnp.minimum(cn, inc_cap)[:, None]
        iid = jnp.where(val, src_s[idx2], NO_ID)
        idd = jnp.where(val, rd_s[idx2], INF)
        return iid, idd

    def body_a(state):
        links0, dists0, ul, ud, over_pos, counters, i = state
        gc = _replace(g, links0=links0, dists0=dists0, upper_links=ul, upper_dists=ud)
        p0 = i * CH
        dst_c = jax.lax.dynamic_slice(u_dst, (p0,), (CH,))
        st = jax.lax.dynamic_slice(seg_start, (p0,), (CH,))
        cn = jax.lax.dynamic_slice(seg_cnt, (p0,), (CH,))
        iid_c, idd_c = inc_window(st, cn)
        row_ids, row_d = _level_rows(gc, level, dst_c)
        tw = row_ids.shape[-1]
        ids = jnp.concatenate([row_ids, iid_c], axis=-1)
        d = jnp.concatenate([row_d, idd_c], axis=-1)
        keepm = topk.unique_mask(ids) & jnp.isfinite(d)
        d = jnp.where(keepm, d, INF)
        ids = jnp.where(keepm, ids, NO_ID)
        d, ids = topk.sort_by_dist(d, ids)
        n_total = jnp.sum(ids != NO_ID, axis=-1)
        fits = n_total <= tw
        live = dst_c != NO_ID
        write_dst = jnp.where(fits & live, dst_c, NO_ID)
        old_n = jnp.sum(row_ids != NO_ID, axis=-1)
        delta = jnp.sum(jnp.where(fits & live, n_total - old_n, 0), dtype=jnp.int32)
        gc = _set_level_rows(gc, level, write_dst, ids[:, :tw], d[:, :tw])
        marks = jnp.where(
            (~fits) & live, p0 + jnp.arange(CH, dtype=jnp.int32), _POS_SENTINEL
        )
        over_pos = jax.lax.dynamic_update_slice(over_pos, marks, (p0,))
        counters = counters.at[CNT_REV_DELTA].add(delta)
        return (gc.links0, gc.dists0, gc.upper_links, gc.upper_dists, over_pos, counters, i + 1)

    init = (g.links0, g.dists0, g.upper_links, g.upper_dists, over_pos, counters, jnp.int32(0))
    links0, dists0, ul, ud, over_pos, counters, _ = jax.lax.while_loop(
        lambda s: s[-1] < n_steps, body_a, init
    )
    g = _replace(g, links0=links0, dists0=dists0, upper_links=ul, upper_dists=ud)

    # phase B: α-prune the overflowed rows (compacted to a prefix)
    metric = g.metric
    CHB = min(_CHUNK_B, Upad)
    over_sorted = jnp.sort(over_pos)
    n_over = jnp.sum(over_pos != _POS_SENTINEL, dtype=jnp.int32)
    nb_steps = (n_over + CHB - 1) // CHB

    def body_b(state):
        links0, dists0, ul, ud, counters, i = state
        gc = _replace(g, links0=links0, dists0=dists0, upper_links=ul, upper_dists=ud)
        p0 = i * CHB
        pos_c = jax.lax.dynamic_slice(over_sorted, (p0,), (CHB,))
        valid = pos_c != _POS_SENTINEL
        p = jnp.where(valid, pos_c, 0)
        dst_c = jnp.where(valid, u_dst[p], NO_ID)
        iid_c, idd_c = inc_window(seg_start[p], jnp.where(valid, seg_cnt[p], 0))
        row_ids, row_d = _level_rows(gc, level, dst_c)
        old_n = jnp.sum(row_ids != NO_ID, axis=-1)
        m_ids, m_d = prune.merge_link_rows(
            metric, gc.vectors, gc.norms, row_ids, row_d, iid_c, idd_c, cap, alpha
        )
        delta = jnp.sum(
            jnp.where(dst_c != NO_ID, jnp.sum(m_ids != NO_ID, axis=-1) - old_n, 0),
            dtype=jnp.int32,
        )
        gc = _set_level_rows(gc, level, dst_c, m_ids, m_d)
        counters = counters.at[CNT_REV_DELTA].add(delta)
        return (gc.links0, gc.dists0, gc.upper_links, gc.upper_dists, counters, i + 1)

    initb = (g.links0, g.dists0, g.upper_links, g.upper_dists, counters, jnp.int32(0))
    links0, dists0, ul, ud, counters, _ = jax.lax.while_loop(
        lambda s: s[-1] < nb_steps, body_b, initb
    )
    g = _replace(g, links0=links0, dists0=dists0, upper_links=ul, upper_dists=ud)
    return g, counters, u_dst[:U]


@partial(jax.jit, static_argnames=("cap", "alpha"), donate_argnames=("g", "dirty"))
def prune_slack_rows(g: DeviceGraph, dirty: jax.Array, cap: int, alpha: float):
    """Reduce slack-widened layer-0 rows back to ``cap`` with the α-rule.

    Run once at build end when the build used link slack: every row that
    accumulated more than ``cap`` live links is α-pruned over its full
    (distance-sorted) candidate set — the same rule the reference applies
    on each individual overflow (hnsw.rs:538-552), applied to a richer
    candidate pool. Rows at or under ``cap`` are untouched."""
    metric = g.metric
    counts = jnp.sum(g.links0 != NO_ID, axis=-1)
    over = counts > cap  # [N_pad]
    n_over = jnp.sum(over, dtype=jnp.int32)
    # compact overfull slots to a prefix; pad to a chunk multiple so the
    # dynamic_slice below never clamps (a clamped slice would misalign the
    # pos_ok mask and prune rows the reference would leave alone)
    order = jnp.argsort(jnp.where(over, 0, 1), stable=True).astype(jnp.int32)
    CH = min(_CHUNK_B, order.shape[0])
    pad = (-order.shape[0]) % CH
    if pad:
        order = jnp.concatenate([order, jnp.full((pad,), NO_ID, jnp.int32)])
    n_steps = (n_over + CH - 1) // CH

    def body(state):
        links0, dists0, i = state
        gc = _replace(g, links0=links0, dists0=dists0)
        p0 = i * CH
        slots = jax.lax.dynamic_slice(order, (p0,), (CH,))
        pos_ok = (p0 + jnp.arange(CH, dtype=jnp.int32)) < n_over
        slots = jnp.where(pos_ok, slots, NO_ID)
        row_ids, row_d = _level_rows(gc, 0, slots)
        p_ids, p_d = prune.robust_prune(
            metric, gc.vectors, gc.norms, row_ids, row_d, cap, alpha
        )
        gc = _set_level_rows(gc, 0, slots, p_ids, p_d)
        return (gc.links0, gc.dists0, i + 1)

    def cond(state):
        return state[-1] < n_steps

    links0, dists0, _ = jax.lax.while_loop(cond, body, (g.links0, g.dists0, jnp.int32(0)))
    dirty = dirty | over
    return _replace(g, links0=links0, dists0=dists0), dirty


@jax.jit
def proto_seed_rows(
    g: DeviceGraph,
    rest_slots: jax.Array,  # [R] wave items about to insert (-1 padded)
    proto_slots: jax.Array,  # [P] previously inserted wave (-1 padded)
) -> jax.Array:
    """Layer-0 beam seeds for a wave from its nearest prototype → [R, 1+M0].

    Chain seeding (see builder.build_graph): every item of wave *k* seeds
    its layer-0 beam with its nearest member of wave *k-1* — already
    inserted, so its α-pruned link row is fresh — plus that row itself:
    ef-grade candidates before the first expansion, so the refine beam
    runs a ~2× smaller iteration budget at equal candidate quality. One
    [R, P] distance matmul (MXU) replaces R upper-layer greedy descents
    whose per-hop row gathers are the build bottleneck.

    Replaces nothing in the reference — hnsw.rs:168-185 gives every rayon
    insert its own full descent + search; sharing candidate pools across
    co-batched inserts is the TPU-native reformulation (the MXU makes the
    assignment matmul nearly free).
    """
    metric = g.metric
    q = g.vectors[jnp.maximum(rest_slots, 0)]
    qn = g.norms[jnp.maximum(rest_slots, 0)]
    pv = g.vectors[jnp.maximum(proto_slots, 0)]
    pn = g.norms[jnp.maximum(proto_slots, 0)]
    d = distances.matrix_distances(metric, q, qn, pv, pn)  # [R, P]
    d = jnp.where((proto_slots >= 0)[None, :], d, INF)
    best = jnp.argmin(d, axis=-1)  # [R]
    proto = proto_slots[best]
    links = g.links0[jnp.maximum(proto, 0)]  # [R, M0(+slack)]
    links = jnp.where((proto >= 0)[:, None], links, NO_ID)
    return jnp.concatenate([proto[:, None], links], axis=-1)


@partial(jax.jit, donate_argnames=("g",))
def activate_wave(g: DeviceGraph, wave_slots: jax.Array) -> DeviceGraph:
    """Mark a wave's slots searchable for subsequent waves."""
    safe = jnp.where(wave_slots >= 0, wave_slots, g.capacity)
    return _replace(g, valid=g.valid.at[safe].set(True, mode="drop"))


@partial(
    jax.jit,
    static_argnames=("is_level0", "cap", "alpha", "ext_cap"),
    donate_argnames=("g",),
)
def repair_deleted_rows(
    g: DeviceGraph,
    row_slots: jax.Array,  # [R] owners with >=1 deleted neighbor (-1 pad)
    deleted: jax.Array,  # [N_pad] bool
    level: jax.Array,  # traced; only read when not is_level0
    is_level0: bool,
    cap: int,
    alpha: float,
    ext_cap: int = 64,
) -> DeviceGraph:
    """FreshDiskANN Algorithm-4 gap fill (reference fill_gaps_from_deleted,
    hnsw.rs:334-415), batched.

    For each affected row: drop deleted neighbors, splice in the deleted
    neighbors' own neighbors (capped at ``ext_cap`` nearest-by-their-row
    entries — rows are distance-sorted, a documented deviation from the
    reference's unbounded splice), α-prune on overflow.
    """
    metric = g.metric
    level = 0 if is_level0 else level
    owners_ok = row_slots >= 0
    row_ids, row_d = _level_rows(g, level, row_slots)

    is_del = deleted[jnp.maximum(row_ids, 0)] & (row_ids != NO_ID)
    base_ids = jnp.where(is_del, NO_ID, row_ids)
    base_d = jnp.where(is_del, INF, row_d)

    # neighbors-of-deleted: gather each deleted neighbor's row
    del_nbs = jnp.where(is_del, row_ids, NO_ID)  # [R, cap]
    ext = beam.links_at(g, level, del_nbs.reshape(-1)).reshape(
        row_slots.shape[0], -1
    )  # [R, cap*cap]
    ext = jnp.where(deleted[jnp.maximum(ext, 0)], NO_ID, ext)
    ext = jnp.where(ext == row_slots[:, None], NO_ID, ext)  # no self-links
    # dedup against base and within ext, keep first ext_cap
    ext = jnp.where(topk.contains(ext, base_ids), NO_ID, ext)
    ext = jnp.where(topk.unique_mask(ext), ext, NO_ID)
    order = jnp.argsort(jnp.where(ext == NO_ID, 1, 0), axis=-1, stable=True)
    ext = jnp.take_along_axis(ext, order, axis=-1)[:, :ext_cap]

    ovec = g.vectors[jnp.maximum(row_slots, 0)]
    onrm = g.norms[jnp.maximum(row_slots, 0)]
    evec = g.vectors[jnp.maximum(ext, 0)]
    enrm = g.norms[jnp.maximum(ext, 0)]
    ext_d = distances.gathered_distances(metric, ovec, onrm, evec, enrm)
    ext_d = jnp.where(ext != NO_ID, ext_d, INF)

    merged_ids, merged_d = prune.merge_link_rows(
        metric, g.vectors, g.norms, base_ids, base_d, ext, ext_d, cap, alpha
    )
    out_rows = jnp.where(owners_ok, row_slots, NO_ID)
    return _set_level_rows(g, level, out_rows, merged_ids, merged_d)


@partial(jax.jit, static_argnames=("is_level0",), donate_argnames=("g",))
def _fill_dists_block(
    g: DeviceGraph, slots: jax.Array, level: jax.Array, is_level0: bool
) -> DeviceGraph:
    metric = g.metric
    level = 0 if is_level0 else level
    ids, _ = _level_rows(g, level, slots)
    ovec = g.vectors[jnp.maximum(slots, 0)]
    onrm = g.norms[jnp.maximum(slots, 0)]
    nvec = g.vectors[jnp.maximum(ids, 0)]
    nnrm = g.norms[jnp.maximum(ids, 0)]
    d = distances.gathered_distances(metric, ovec, onrm, nvec, nnrm)
    d = jnp.where(ids != NO_ID, d, INF)
    # keep rows distance-sorted (builders rely on ascending rows)
    d, ids = topk.sort_by_dist(d, ids)
    return _set_level_rows(g, level, jnp.where(slots >= 0, slots, NO_ID), ids, d)


def fill_link_dists(g: DeviceGraph, host, block: int = 4096) -> DeviceGraph:
    """Recompute per-link distances for a graph loaded from the store.

    Persisted rows carry ids only (reference stores RoaringBitmaps,
    node.rs:133-174); builders need the ScoredLink distances back. One
    gathered-distance pass per row block per level.
    """
    for level in range(host.max_level + 1):
        owners = (
            np.nonzero(host.levels >= 0)[0]
            if level == 0
            else np.nonzero(host.slot_rows[level - 1] >= 0)[0]
        )
        for start in range(0, len(owners), block):
            chunk = np.full(block, -1, dtype=np.int32)
            sel = owners[start : start + block]
            chunk[: len(sel)] = sel
            g = _fill_dists_block(
                g, jnp.asarray(chunk), jnp.int32(level), is_level0=(level == 0)
            )
    return g


@partial(jax.jit, donate_argnames=("g",))
def clear_slots(g: DeviceGraph, slots: jax.Array) -> DeviceGraph:
    """Invalidate deleted slots and wipe their layer-0 rows (upper rows are
    wiped host-side where compact row reuse is managed)."""
    safe = jnp.where(slots >= 0, slots, g.capacity)
    valid = g.valid.at[safe].set(False, mode="drop")
    links0 = g.links0.at[safe].set(NO_ID, mode="drop")
    dists0 = g.dists0.at[safe].set(INF, mode="drop")
    return _replace(g, valid=valid, links0=links0, dists0=dists0)
