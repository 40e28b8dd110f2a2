"""Batched beam search over the HBM-resident HNSW graph.

The TPU replacement for the reference's pointer-chasing traversals:

* ``greedy_descend`` ⇔ the ef=1 ``walk_layer`` descent loop
  (hnsw.rs:303-307, reader.rs:735-741): a batched hill-climb per upper
  layer under ``lax.while_loop`` — every step gathers each query's current
  node's M neighbors, computes distances in one fused pass, and moves to
  the best neighbor until no query improves.
* ``beam_search`` ⇔ ``walk_layer`` / ``Visitor::visit`` with ef>1
  (hnsw.rs:460-518, reader.rs:301-369): a fixed-width sorted pool of ef
  (dist, id, expanded) triples per query replaces the BinaryHeap+MinMaxHeap
  pair. Each iteration expands the best unexpanded entry, gathers its M0
  neighbors, dedups against the pool with a compare matrix (the
  RoaringBitmap-visited replacement — eviction from the pool is permanent
  because the pool's worst distance only decreases, so re-entry is
  impossible and no global visited set is needed), computes distances in
  one batched op, and sort-merges. Termination matches the reference:
  a query is done when its best unexpanded distance exceeds its worst
  pooled distance (hnsw.rs:483-487).
* ``beam_search_filtered`` ⇔ the candidates-bitmap variant
  (reader.rs:322-365): the traversal frontier may pass through
  non-candidates but results exclude them, so it carries a separate
  frontier pool and result pool.

All loops are bounded (``max_iters``) and shapes static, so one XLA
compilation serves any batch of queries at fixed (ef, M0, D).
"""

from __future__ import annotations

import os as _os
from functools import partial
from typing import NamedTuple, Optional

import jax
import jax.numpy as jnp

from ..models.hnsw import DeviceGraph
from . import beam_pallas, distances, topk
from .topk import INF, NO_ID


def _gather_rows(vectors: jax.Array, norms: jax.Array, idx: jax.Array):
    """Gather vector rows + norms for (possibly -1) slot indices."""
    safe = jnp.maximum(idx, 0)
    return vectors[safe], norms[safe]


def candidate_distances(g: DeviceGraph, q: jax.Array, qn: jax.Array, nbs: jax.Array) -> jax.Array:
    """Distances from queries [B] to candidate slots [B, K] — the per-hop
    hot op. Routes to the fused Pallas gather-reduce kernel when enabled
    (HANNOY_TPU_PALLAS=1), else the XLA gather + batched distance."""
    if beam_pallas.pallas_enabled():
        return beam_pallas.gathered_distances_pallas(g.metric, g.vectors, g.norms, q, qn, nbs)
    vs, ns = _gather_rows(g.vectors, g.norms, nbs)
    return distances.gathered_distances(g.metric, q, qn, vs, ns)


def links_at(g: DeviceGraph, level, slots: jax.Array) -> jax.Array:
    """Neighbor slots of ``slots [B]`` at ``level`` → [B, M or M0].

    Replaces the reference's per-node LMDB links lookup
    (``get_links``/``FrozenReader::links``) with an HBM gather. Layer 0
    (static) reads the full-width table; upper layers go through the
    slot→row indirection into the compact stacked tables — ``level`` may
    be a *traced* scalar there, so one compiled program serves every upper
    layer (compile count stays O(1) in graph height).
    """
    safe = jnp.maximum(slots, 0)
    if isinstance(level, int) and level == 0:
        nbs = g.links0[safe]
    else:
        l = level - 1
        rows = jnp.take(g.slot_rows, l, axis=0)[safe]
        nbs = jnp.take(g.upper_links, l, axis=0)[jnp.maximum(rows, 0)]
        nbs = jnp.where((rows >= 0)[:, None], nbs, NO_ID)
    return jnp.where((slots >= 0)[:, None], nbs, NO_ID)


def seed_distances(
    metric: distances.Metric,
    vectors: jax.Array,
    norms: jax.Array,
    q: jax.Array,  # [B, D*]
    qn: jax.Array,  # [B]
    slots: jax.Array,  # [B, S] (-1 padded)
) -> jax.Array:
    """Distances from each query to its seed slots; +inf on padding."""
    vs, ns = _gather_rows(vectors, norms, slots)
    d = distances.gathered_distances(metric, q, qn, vs, ns)
    return jnp.where(slots >= 0, d, INF)


# --------------------------------------------------------------------------
# Upper-layer greedy descent (ef = 1)
# --------------------------------------------------------------------------


def greedy_descend(
    g: DeviceGraph,
    q: jax.Array,  # [B, D*]
    qn: jax.Array,  # [B]
    from_level: int,
    to_level: int,
    max_steps_per_level: int = 128,
    node_ok: Optional[jax.Array] = None,
) -> jax.Array:
    """Descend layers ``from_level .. to_level`` (inclusive, both >= 1)
    greedily; returns the best slot per query → [B].

    Seeds at the entry points (all of them — distances computed once, best
    taken, matching the multi-ep seeding of hnsw.rs:474-481 with ef=1).

    ``node_ok`` (default ``g.valid``) gates which slots the walk may
    *settle on*: the returned slot feeds ``_seed_pool``, which drops
    seeds failing the same mask — an unmasked walk that landed on a
    deleted slot therefore produced an EMPTY beam pool, and the wave
    went on to write an empty forward row for that item (found round 4:
    11/24 incremental inserts into a 4k graph with 50 deletes in the
    same txn ended with out-degree 0 because their descents all settled
    on one deleted near-origin hub). The reference never has this
    problem because its walk reads links only of visitable nodes
    (hnsw.rs:498-501 skips deleted)."""
    metric = g.metric
    if node_ok is None:
        node_ok = g.valid
    eps = jnp.broadcast_to(g.entry_slots[None, :], (q.shape[0], g.entry_slots.shape[0]))
    d = seed_distances(metric, g.vectors, g.norms, q, qn, eps)
    d = jnp.where(node_ok[jnp.maximum(eps, 0)] & (eps >= 0), d, INF)
    best = jnp.argmin(d, axis=-1)
    cur = jnp.take_along_axis(eps, best[:, None], axis=-1)[:, 0]
    cur_d = jnp.take_along_axis(d, best[:, None], axis=-1)[:, 0]

    for level in range(from_level, to_level - 1, -1):
        cur, cur_d = _greedy_level(
            g, q, qn, cur, cur_d, level, max_steps_per_level, node_ok
        )
    return cur


def _greedy_level(
    g: DeviceGraph,
    q: jax.Array,
    qn: jax.Array,
    cur: jax.Array,
    cur_d: jax.Array,
    level: int,
    max_steps: int,
    node_ok: jax.Array,
) -> tuple[jax.Array, jax.Array]:
    metric = g.metric
    l = level - 1  # row into stacked upper tables (may be traced)

    def body(state):
        cur, cur_d, _, it = state
        rows = jnp.take(g.slot_rows, l, axis=0)[jnp.maximum(cur, 0)]
        nbs = jnp.take(g.upper_links, l, axis=0)[jnp.maximum(rows, 0)]  # [B, M]
        nb_valid = (
            (nbs >= 0)
            & (rows >= 0)[:, None]
            & (cur >= 0)[:, None]
            & node_ok[jnp.maximum(nbs, 0)]
        )
        d = candidate_distances(g, q, qn, nbs)
        d = jnp.where(nb_valid, d, INF)
        best = jnp.argmin(d, axis=-1)
        best_d = jnp.take_along_axis(d, best[:, None], axis=-1)[:, 0]
        best_nb = jnp.take_along_axis(nbs, best[:, None], axis=-1)[:, 0]
        improved = best_d < cur_d
        return (
            jnp.where(improved, best_nb, cur),
            jnp.minimum(best_d, cur_d),
            improved,
            it + 1,
        )

    def cond(state):
        _, _, improved, it = state
        return jnp.any(improved) & (it < max_steps)

    init = (cur, cur_d, jnp.ones_like(cur, dtype=bool), jnp.int32(0))
    cur, cur_d, _, _ = jax.lax.while_loop(cond, body, init)
    return cur, cur_d


@partial(jax.jit, static_argnames=("from_level", "to_level", "max_steps_per_level"))
def descend_for_slots(
    g: DeviceGraph,
    wave_slots: jax.Array,  # [W]
    from_level: int,
    to_level: int,
    max_steps_per_level: int = 128,
    node_ok: Optional[jax.Array] = None,
) -> jax.Array:
    """Jitted greedy descent for a wave of *stored* items: gathers their
    vectors and walks layers ``from_level..to_level`` → seed slots [W, 1].

    ``node_ok``: builders MUST pass their exists-and-not-deleted mask —
    the returned seed feeds ``_seed_pool`` under the same mask, so a
    descent that settles on a deleted slot yields an empty construction
    beam and an empty forward row (see ``greedy_descend``).

    (Builders must not call ``greedy_descend`` eagerly — op-by-op dispatch
    to the TPU costs ~ms per hop through the remote runtime.)"""
    q = g.vectors[jnp.maximum(wave_slots, 0)]
    qn = g.norms[jnp.maximum(wave_slots, 0)]
    ep = greedy_descend(g, q, qn, from_level, to_level, max_steps_per_level, node_ok)
    return ep[:, None]


# --------------------------------------------------------------------------
# Layer-0 beam search
# --------------------------------------------------------------------------


class BeamResult(NamedTuple):
    dists: jax.Array  # [B, ef] ascending, +inf padded
    slots: jax.Array  # [B, ef] slot ids, -1 padded
    iters: jax.Array  # [] total loop iterations executed
    #: [B] bool — rows still improving when the loop exited (the
    #: reference's continuation test hnsw.rs:483-487 evaluated rowwise on
    #: the final pool). True means the iteration cap / tail allowance /
    #: cancel cut this row off before natural termination; None when the
    #: producer had no loop (exact scans, synthetic results).
    active: Optional[jax.Array] = None


def _rows_active(pool_d: jax.Array, pool_id: jax.Array, pool_exp: jax.Array) -> jax.Array:
    """Per-row continuation test on a beam pool → [B] bool."""
    unexp_d = jnp.where((pool_exp == 0) & (pool_id != NO_ID), pool_d, INF)
    best_d = jnp.min(unexp_d, axis=-1)
    return (best_d <= pool_d[:, -1]) & (best_d < INF)


def _filtered_rows_active(fr_d, fr_id, fr_exp, res_d) -> jax.Array:
    """Filtered-beam rowwise continuation: frontier's best unexpanded vs
    the *result* pool's worst (reader.rs:329-336)."""
    unexp_d = jnp.where((fr_exp == 0) & (fr_id != NO_ID), fr_d, INF)
    best_d = jnp.min(unexp_d, axis=-1)
    return (best_d <= res_d[:, -1]) & (best_d < INF)


def beam_search(
    g: DeviceGraph,
    q: jax.Array,  # [B, D*]
    qn: jax.Array,  # [B]
    start: jax.Array,  # [B, S] seed slots (-1 padded)
    ef: int,
    max_iters: Optional[int] = None,
    node_ok: Optional[jax.Array] = None,
    level: int = 0,
    expand: int = 1,
    traverse_k: Optional[int] = None,
    tail_frac: float = 0.0,
    tail_allow: Optional[int] = None,
) -> BeamResult:
    """Unfiltered beam search at ``level`` (hnsw.rs walk_layer semantics;
    builders run it per layer, searches at layer 0).

    ``traverse_k``: expand only the first ``traverse_k`` (nearest — rows
    are distance-sorted) links of each row. Builders pass the logical cap
    when the device tables carry slack columns (see wave_ops), keeping the
    hot vector gather at cap rows per expansion.

    ``node_ok``: optional [N_pad] bool replacing ``g.valid`` as the
    traversable-slot mask. Builders pass exists-and-not-deleted so entry
    points scheduled for (re)insertion stay seedable before their wave —
    the reference reads any item's vector from LMDB during the build
    (hnsw.rs:474-481) and only deleted items vanish (hnsw.rs:498-501).

    ``expand``: pool entries expanded per iteration (default 1, matching
    the reference's pop-one-per-hop). E>1 trades ~E× fewer loop iterations
    for E× more neighbor gathers per iteration — measured net-negative on
    v5e where the row gather dominates the hop, so it stays a tuning knob.

    ``tail_frac``: stop once at most ``tail_frac·B`` queries are still
    active instead of waiting for the last straggler. Every loop iteration
    processes the *whole* batch, so a handful of slow-converging queries
    otherwise charge their extra hops to all B rows — construction
    builders pass a small tail (stragglers keep their current pool, which
    is still a valid candidate set); searches default to 0.0 (exact
    reference termination, hnsw.rs:483-487).

    ``tail_allow``: absolute override for the straggler allowance.
    Builders whose batch carries padding rows (a partially-filled wave)
    must size the allowance from the *real* item count, not ``B`` —
    padding rows all duplicate slot 0 and converge together, so a
    B-derived allowance could cut off every real beam in a sparse wave.
    """
    if max_iters is None:
        max_iters = (2 * ef + 16 + expand - 1) // expand
    if node_ok is None:
        node_ok = g.valid

    pool_d, pool_id, pool_exp = _seed_pool(g, q, qn, start, ef, node_ok)
    body, cond = _beam_step(
        g, q, qn, node_ok, ef, min(expand, ef), level, max_iters, traverse_k,
        tail_allow=int(tail_frac * q.shape[0]) if tail_allow is None else tail_allow,
    )
    pool_d, pool_id, pool_exp, iters = jax.lax.while_loop(
        cond, body, (pool_d, pool_id, pool_exp, jnp.int32(0))
    )
    return BeamResult(pool_d, pool_id, iters, _rows_active(pool_d, pool_id, pool_exp))


def _seed_pool(g: DeviceGraph, q, qn, start, ef: int, node_ok):
    """Initialize the sorted (dist, id, expanded) pool from seed slots."""
    B = q.shape[0]
    seed_ok = (start >= 0) & node_ok[jnp.maximum(start, 0)]
    seeds = jnp.where(seed_ok, start, NO_ID)
    d = seed_distances(g.metric, g.vectors, g.norms, q, qn, seeds)
    d = jnp.where(topk.unique_mask(seeds), d, INF)
    seeds = jnp.where(d < INF, seeds, NO_ID)

    pool_d = jnp.full((B, ef), INF)
    pool_id = jnp.full((B, ef), NO_ID, dtype=jnp.int32)
    pool_exp = jnp.zeros((B, ef), dtype=jnp.int32)
    pool_d, (pool_id, pool_exp) = topk.merge_sorted(
        pool_d, (pool_id, pool_exp), d, (seeds, jnp.zeros_like(seeds)), ef
    )
    return pool_d, pool_id, pool_exp


def _beam_step(
    g: DeviceGraph,
    q,
    qn,
    node_ok,
    ef: int,
    E: int,
    level,
    max_iters: int,
    traverse_k: Optional[int] = None,
    tail_allow: int = 0,
):
    """(body, cond) for the beam while_loop over state
    (pool_d, pool_id, pool_exp, it) — shared between the one-shot search
    and the chunked/cancellable runner. ``tail_allow``: keep looping only
    while *more than* this many queries are active (0 == reference
    termination)."""
    B = q.shape[0]

    def body(state):
        pool_d, pool_id, pool_exp, it = state
        unexp_d = jnp.where((pool_exp == 0) & (pool_id != NO_ID), pool_d, INF)
        neg, pos = jax.lax.top_k(-unexp_d, E)  # [B, E] best unexpanded
        exp_d = -neg
        worst = pool_d[:, -1]
        # per-entry activity: the reference stops once the best candidate
        # exceeds the pool's worst (hnsw.rs:483-487); extra expansion slots
        # participate only while they also pass the bound
        active_e = (exp_d <= worst[:, None]) & (exp_d < INF)

        # mark the active expansion slots expanded
        mark = jnp.zeros_like(pool_exp)
        safe_pos = jnp.where(active_e, pos, ef)  # OOB → dropped
        mark = mark.at[
            jnp.arange(B, dtype=jnp.int32)[:, None].repeat(E, 1), safe_pos
        ].set(1, mode="drop")
        pool_exp = jnp.maximum(pool_exp, mark)

        cur = jnp.take_along_axis(pool_id, jnp.minimum(pos, ef - 1), axis=-1)  # [B, E]
        cur = jnp.where(active_e, cur, NO_ID)
        ln = links_at(g, level, cur.reshape(-1))
        if traverse_k is not None and traverse_k < ln.shape[-1]:
            ln = ln[:, :traverse_k]  # rows are distance-sorted; slack cols skipped
        nbs = ln.reshape(B, -1)  # [B, E*M]
        ok = (
            (nbs >= 0)
            & node_ok[jnp.maximum(nbs, 0)]
            & ~topk.contains(nbs, pool_id)
            & topk.unique_mask(nbs)  # expansions may share neighbors
        )
        nd = candidate_distances(g, q, qn, nbs)
        nd = jnp.where(ok, nd, INF)
        nids = jnp.where(ok, nbs, NO_ID)

        # NB: a rank-based merge (topk.merge_ranked) computes the same
        # result without the bitonic sort but needs a scatter-by-position,
        # and TPU scatter costs more than the sort it saves (measured
        # 5.7 vs 2.6 ms/hop at [4096, 48+32] — see BENCH_NOTES.md)
        pd, (pid, pexp) = topk.merge_sorted(
            pool_d, (pool_id, pool_exp), nd, (nids, jnp.zeros_like(nids)), ef
        )
        return pd, pid, pexp, it + 1

    def cond(state):
        pool_d, pool_id, pool_exp, it = state
        unexp_d = jnp.where((pool_exp == 0) & (pool_id != NO_ID), pool_d, INF)
        best_d = jnp.min(unexp_d, axis=-1)
        active = (best_d <= pool_d[:, -1]) & (best_d < INF)
        return (jnp.sum(active, dtype=jnp.int32) > tail_allow) & (it < max_iters)

    return body, cond


def beam_search_filtered(
    g: DeviceGraph,
    q: jax.Array,
    qn: jax.Array,
    start: jax.Array,  # [B, S]
    ef: int,
    candidate_mask: jax.Array,  # [N_pad] bool — allowed result slots
    max_iters: Optional[int] = None,
    node_ok: Optional[jax.Array] = None,
) -> BeamResult:
    """Candidate-filtered beam search (reader.rs:322-365 semantics).

    The frontier traverses any live node; the result pool admits only
    candidates. Termination compares the frontier's best unexpanded entry
    against the *result* pool's worst (reader.rs:329-336).
    """
    if max_iters is None:
        max_iters = 2 * ef + 16
    if node_ok is None:
        node_ok = g.valid
    state = _filtered_seed_pools(g, q, qn, start, candidate_mask, node_ok, ef)
    step, cond = _filtered_step(g, q, qn, node_ok, candidate_mask, ef, max_iters)
    fr_d, fr_id, fr_exp, res_d, res_id, iters = jax.lax.while_loop(cond, step, state)
    return BeamResult(
        res_d, res_id, iters, _filtered_rows_active(fr_d, fr_id, fr_exp, res_d)
    )


def _filtered_seed_pools(g, q, qn, start, candidate_mask, node_ok, ef: int):
    """Initial (frontier, result) pools for the filtered beam."""
    metric = g.metric
    B = q.shape[0]
    cand_ok = node_ok & candidate_mask
    seed_ok = (start >= 0) & node_ok[jnp.maximum(start, 0)]
    seeds = jnp.where(seed_ok, start, NO_ID)
    d = seed_distances(metric, g.vectors, g.norms, q, qn, seeds)
    d = jnp.where(topk.unique_mask(seeds), d, INF)
    seeds = jnp.where(d < INF, seeds, NO_ID)
    seed_cand = jnp.where(cand_ok[jnp.maximum(seeds, 0)] & (seeds != NO_ID), seeds, NO_ID)
    seed_cand_d = jnp.where(seed_cand != NO_ID, d, INF)

    fr_d = jnp.full((B, ef), INF)
    fr_id = jnp.full((B, ef), NO_ID, dtype=jnp.int32)
    fr_exp = jnp.zeros((B, ef), dtype=jnp.int32)
    fr_d, (fr_id, fr_exp) = topk.merge_sorted(
        fr_d, (fr_id, fr_exp), d, (seeds, jnp.zeros_like(seeds)), ef
    )
    res_d = jnp.full((B, ef), INF)
    res_id = jnp.full((B, ef), NO_ID, dtype=jnp.int32)
    res_d, (res_id,) = topk.merge_sorted(res_d, (res_id,), seed_cand_d, (seed_cand,), ef)
    return fr_d, fr_id, fr_exp, res_d, res_id, jnp.int32(0)


def _filtered_step(g, q, qn, node_ok, candidate_mask, ef: int, max_iters: int):
    """(step, cond) for the filtered beam while_loop — shared between the
    one-shot search and the chunked/cancellable runner."""
    cand_ok = node_ok & candidate_mask

    def step(state):
        fr_d, fr_id, fr_exp, res_d, res_id, it = state
        unexp_d = jnp.where((fr_exp == 0) & (fr_id != NO_ID), fr_d, INF)
        best_pos = jnp.argmin(unexp_d, axis=-1)
        best_d = jnp.take_along_axis(unexp_d, best_pos[:, None], axis=-1)[:, 0]
        worst = res_d[:, -1]
        active = (best_d <= worst) & (best_d < INF)

        mark = jax.nn.one_hot(best_pos, ef, dtype=fr_exp.dtype) * active[:, None].astype(
            fr_exp.dtype
        )
        fr_exp = jnp.maximum(fr_exp, mark)

        cur = jnp.take_along_axis(fr_id, best_pos[:, None], axis=-1)[:, 0]
        nbs = g.links0[jnp.maximum(cur, 0)]
        visited = topk.contains(nbs, fr_id) | topk.contains(nbs, res_id)
        ok = (nbs >= 0) & active[:, None] & node_ok[jnp.maximum(nbs, 0)] & ~visited
        nd = candidate_distances(g, q, qn, nbs)
        nd = jnp.where(ok, nd, INF)
        nids = jnp.where(ok, nbs, NO_ID)

        fr_d, (fr_id, fr_exp) = topk.merge_sorted(
            fr_d, (fr_id, fr_exp), nd, (nids, jnp.zeros_like(nids)), ef
        )
        c_ok = ok & cand_ok[jnp.maximum(nbs, 0)]
        cd = jnp.where(c_ok, nd, INF)
        cids = jnp.where(c_ok, nbs, NO_ID)
        res_d, (res_id,) = topk.merge_sorted(res_d, (res_id,), cd, (cids,), ef)
        return fr_d, fr_id, fr_exp, res_d, res_id, it + 1

    def cond(state):
        fr_d, fr_id, fr_exp, res_d, _, it = state
        unexp_d = jnp.where((fr_exp == 0) & (fr_id != NO_ID), fr_d, INF)
        best_d = jnp.min(unexp_d, axis=-1)
        active = (best_d <= res_d[:, -1]) & (best_d < INF)
        return jnp.any(active) & (it < max_iters)

    return step, cond


@partial(jax.jit, static_argnames=("ef",))
def _seed_filtered_pools_jit(
    g: DeviceGraph, q: jax.Array, qn: jax.Array, start: jax.Array,
    candidate_mask: jax.Array, ef: int,
):
    """One-dispatch seeding for the chunked seeded filtered beam."""
    return _filtered_seed_pools(g, q, qn, start, candidate_mask, g.valid, ef)


def seeded_filtered_cancellable(
    g: DeviceGraph,
    q: jax.Array,
    qn: jax.Array,
    start: jax.Array,  # [B, S] seed slots (each row's own item slot)
    candidate_mask: jax.Array,
    ef: int,
    cancel_fn,
    max_iters: Optional[int] = None,
    chunk: int = 16,
) -> tuple[BeamResult, bool]:
    """Layer-0-only filtered beam seeded at given slots, run in bounded
    iteration chunks with ``cancel_fn`` probed between device dispatches
    — the batched ``by_items`` path (the reference seeds the search at
    the item's own neighborhood, reader.rs:809-894, and probes the
    cancel per hop, reader.rs:263-280). No descent: by-item lookups
    start where the item lives."""
    if max_iters is None:
        max_iters = 2 * ef + 16
    B = q.shape[0]
    if cancel_fn():
        empty = BeamResult(
            jnp.full((B, ef), INF), jnp.full((B, ef), NO_ID, dtype=jnp.int32), jnp.int32(0)
        )
        return empty, True
    fr_d, fr_id, fr_exp, res_d, res_id, _ = _seed_filtered_pools_jit(
        g, q, qn, start, candidate_mask, ef
    )
    total = 0
    step_cap = chunk
    row_act = None
    while total < max_iters:
        if cancel_fn():
            return BeamResult(res_d, res_id, jnp.int32(total), row_act), True
        # snap the tail into the bucket set: once the remaining budget is
        # smaller than the grown cap, fall back to base-``chunk`` steps, so
        # only {c, 2c, 4c} plus at most one max_iters-mod-c tail size ever
        # compile — ef-dependent tail values each cost a fresh multi-minute
        # cold axon compile (ADVICE r4).
        if step_cap > max_iters - total:
            step_cap = chunk
        step = min(step_cap, max_iters - total)
        fr_d, fr_id, fr_exp, res_d, res_id, it, row_act = _filtered_chunk(
            g, q, qn, candidate_mask, fr_d, fr_id, fr_exp, res_d, res_id, ef, step
        )
        it, row_act = jax.device_get((it, row_act))  # one tunnel RTT, not two
        total += int(it)
        if not row_act.any():
            break
        # geometric chunk growth (cap 4x): each chunk dispatch pays a full
        # tunnel RTT (~30 ms on axon), so long searches halve dispatches
        # while early cancel probes stay responsive; sizes stay in
        # {chunk, 2c, 4c} so the jit-variant set is bounded.
        step_cap = min(step_cap * 2, 4 * chunk)
    return BeamResult(res_d, res_id, jnp.int32(total), row_act), bool(cancel_fn())


# --------------------------------------------------------------------------
# Full hnsw_search: descent + layer-0 beam (reader.rs:722-800)
# --------------------------------------------------------------------------


def default_ef_upper(n_valid: int, ef: int) -> int:
    """Auto width for the pooled layer-1 descent (``_descend_start``).

    Tiny graphs keep the reference's greedy ef=1 walk (layer 1 is nearly
    empty and a pooled beam only adds a dispatch). Larger clustered
    datasets need seed diversity — at 1M×768
    the greedy seed lands in the true top-100 for only ~55% of queries;
    32 pooled layer-1 seeds took recall@10 0.73 → 0.995 at ef=50 AND
    raised QPS 5456 → 6850 — better seeds converge the layer-0 beam in
    fewer whole-batch iterations (round-4 chip sweep,
    scripts/sweep_ef_upper.py, benchmarks/logs/sweep_efu_1m.log).
    Overridable per query via ``QueryBuilder.ef_upper`` and globally via
    HANNOY_TPU_EF_UPPER."""
    env = _os.environ.get("HANNOY_TPU_EF_UPPER")
    if env is not None:
        return max(1, int(env))
    if n_valid >= 500_000:
        return max(1, min(32, ef))  # 1M: 0.73→0.995 r@10, 5456→6850 qps @ef50
    if n_valid >= 16_384:
        return max(1, min(8, ef))  # 100k: 0.976→0.996 r@10, 5101→9915 qps @ef50
    return 1


def _descend_start(
    g: DeviceGraph, q: jax.Array, qn: jax.Array, ef_upper: int = 1
) -> jax.Array:
    """Layer-0 seed slots → [B, S] (trace-time helper, callers jit).

    ``ef_upper == 1`` reproduces the reference's greedy ef=1 descent
    (reader.rs:722-760 walk_layer loop). ``ef_upper > 1`` keeps a pooled
    beam at layer 1 after the greedy walk through layers L..2: on
    clustered data one greedy descent lands in a wrong basin for ~45% of
    queries at 1M×768 (round-4 bisect: seed in exact top-100 for only
    0.55 of queries, while recall with oracle seeds was 1.0 vs 0.93
    search) and the layer-0 beam cannot always escape, because in high
    dimension there is no distance gradient between well-separated wrong
    clusters. S diverse layer-1 minima cover the true basin instead; the
    extra cost is confined to the ~N/M-member layer 1."""
    if g.max_level < 1:
        return jnp.broadcast_to(
            g.entry_slots[None, :], (q.shape[0], g.entry_slots.shape[0])
        )
    if ef_upper <= 1:
        return greedy_descend(g, q, qn, g.max_level, 1)[:, None]
    if g.max_level >= 2:
        start = greedy_descend(g, q, qn, g.max_level, 2)[:, None]
    else:
        start = jnp.broadcast_to(
            g.entry_slots[None, :], (q.shape[0], g.entry_slots.shape[0])
        )
    return beam_search(g, q, qn, start, ef_upper, level=1).slots


@partial(jax.jit, static_argnames=("ef", "max_iters", "ef_upper"))
def hnsw_search(
    g: DeviceGraph,
    q: jax.Array,  # [B, D*]
    qn: jax.Array,  # [B]
    ef: int,
    max_iters: Optional[int] = None,
    ef_upper: int = 1,
) -> BeamResult:
    """Greedy descent from the entry points through layers L..1, then an
    ef-wide layer-0 beam (reference hnsw_search, reader.rs:722-800).
    ``ef_upper``: see ``_descend_start``."""
    start = _descend_start(g, q, qn, ef_upper)
    return beam_search(g, q, qn, start, ef, max_iters)


@partial(jax.jit, static_argnames=("ef", "ef_upper"))
def _descend_and_seed(
    g: DeviceGraph, q: jax.Array, qn: jax.Array, ef: int, ef_upper: int = 1
):
    """Greedy descent → initial layer-0 beam pool (the resumable carry)."""
    start = _descend_start(g, q, qn, ef_upper)
    return _seed_pool(g, q, qn, start, ef, g.valid)


@partial(jax.jit, static_argnames=("ef", "chunk"))
def _beam_chunk(
    g: DeviceGraph,
    q: jax.Array,
    qn: jax.Array,
    pool_d: jax.Array,
    pool_id: jax.Array,
    pool_exp: jax.Array,
    ef: int,
    chunk: int,
):
    """Run at most ``chunk`` beam iterations from a saved pool.

    Returns (pool..., iters_done, row_active [B]) — the host polls cancel
    between chunks (reference Visitor probes cancel_fn per hop,
    reader.rs:301-369; a chunk is the TPU-granular 'hop'); ``row_active``
    feeds the per-row ``Searched.truncated`` flags."""
    body, cond = _beam_step(g, q, qn, g.valid, ef, 1, 0, chunk)
    pool_d, pool_id, pool_exp, it = jax.lax.while_loop(
        cond, body, (pool_d, pool_id, pool_exp, jnp.int32(0))
    )
    return pool_d, pool_id, pool_exp, it, _rows_active(pool_d, pool_id, pool_exp)


@partial(
    jax.jit,
    static_argnames=("ef", "chunk", "is_level0", "expand", "traverse_k", "tail_allow"),
)
def _build_beam_chunk(
    g: DeviceGraph,
    q: jax.Array,
    qn: jax.Array,
    node_ok: jax.Array,
    level: jax.Array,  # traced; read only when not is_level0
    pool_d: jax.Array,
    pool_id: jax.Array,
    pool_exp: jax.Array,
    ef: int,
    chunk: int,
    is_level0: bool,
    expand: int = 1,
    traverse_k: Optional[int] = None,
    tail_allow: int = 0,
) -> tuple[jax.Array, jax.Array, jax.Array, jax.Array, jax.Array]:
    """Construction-grade ``_beam_chunk``: any level, node_ok mask, and
    the builder's expand/traverse/tail knobs. Used by the cancellable
    wave inserter (builder._chunked_candidates) so a multi-second wave
    beam can be cut off between device dispatches — the probing-
    granularity analogue of the reference's CANCELLATION_PROBING=10000
    in-loop checks (hnsw.rs:174-177, lib.rs:140)."""
    lvl = 0 if is_level0 else level
    body, cond = _beam_step(
        g, q, qn, node_ok, ef, min(expand, ef), lvl, chunk, traverse_k,
        tail_allow=tail_allow,
    )
    pool_d, pool_id, pool_exp, it = jax.lax.while_loop(
        cond, body, (pool_d, pool_id, pool_exp, jnp.int32(0))
    )
    unexp_d = jnp.where((pool_exp == 0) & (pool_id != NO_ID), pool_d, INF)
    best_d = jnp.min(unexp_d, axis=-1)
    n_active = jnp.sum(
        (best_d <= pool_d[:, -1]) & (best_d < INF), dtype=jnp.int32
    )
    return pool_d, pool_id, pool_exp, it, n_active > tail_allow


@partial(jax.jit, static_argnames=("ef",))
def seed_wave_pool(
    g: DeviceGraph, wave_slots: jax.Array, start: jax.Array, node_ok: jax.Array, ef: int
):
    """Gather a wave's query rows and seed its beam pool in one program
    (the cancellable construction path runs the beam outside the fused
    wave jit). → (q, qn, pool_d, pool_id, pool_exp)."""
    q = g.vectors[jnp.maximum(wave_slots, 0)]
    qn = g.norms[jnp.maximum(wave_slots, 0)]
    return (q, qn) + _seed_pool(g, q, qn, start, ef, node_ok)


def hnsw_search_cancellable(
    g: DeviceGraph,
    q: jax.Array,
    qn: jax.Array,
    ef: int,
    cancel_fn,
    max_iters: Optional[int] = None,
    chunk: int = 16,
    ef_upper: int = 1,
) -> tuple[BeamResult, bool]:
    """hnsw_search with mid-flight cooperative cancellation.

    The layer-0 beam runs in fixed-iteration chunks; ``cancel_fn`` is
    polled between device dispatches and a firing cancel returns the
    pool-so-far as non-empty partial results with did_cancel=True —
    the ``Completion::Cancelled`` analogue (reference reader.rs:263-280).
    """
    if max_iters is None:
        max_iters = 2 * ef + 16
    if cancel_fn():
        B = q.shape[0]
        empty = BeamResult(
            jnp.full((B, ef), INF), jnp.full((B, ef), NO_ID, dtype=jnp.int32), jnp.int32(0)
        )
        return empty, True
    pool_d, pool_id, pool_exp = _descend_and_seed(g, q, qn, ef, ef_upper)
    total = 0
    step_cap = chunk
    row_act = None
    while total < max_iters:
        if cancel_fn():
            return BeamResult(pool_d, pool_id, jnp.int32(total), row_act), True
        # snap the tail into the bucket set: once the remaining budget is
        # smaller than the grown cap, fall back to base-``chunk`` steps, so
        # only {c, 2c, 4c} plus at most one max_iters-mod-c tail size ever
        # compile — ef-dependent tail values each cost a fresh multi-minute
        # cold axon compile (ADVICE r4).
        if step_cap > max_iters - total:
            step_cap = chunk
        step = min(step_cap, max_iters - total)
        pool_d, pool_id, pool_exp, it, row_act = _beam_chunk(
            g, q, qn, pool_d, pool_id, pool_exp, ef, step
        )
        it, row_act = jax.device_get((it, row_act))  # one tunnel RTT, not two
        total += int(it)
        if not row_act.any():
            break
        # geometric chunk growth (cap 4x) — see seeded_filtered_cancellable
        step_cap = min(step_cap * 2, 4 * chunk)
    return BeamResult(pool_d, pool_id, jnp.int32(total), row_act), bool(cancel_fn())


@partial(jax.jit, static_argnames=("ef", "ef_upper"))
def _filtered_descend_and_seed(
    g: DeviceGraph,
    q: jax.Array,
    qn: jax.Array,
    candidate_mask: jax.Array,
    ef: int,
    ef_upper: int = 1,
):
    """Greedy descent → initial filtered pools (the resumable carry).
    The descent ignores the candidate mask (upper layers route, they do
    not filter — reference reader.rs:739-752 walks unfiltered layers)."""
    start = _descend_start(g, q, qn, ef_upper)
    return _filtered_seed_pools(g, q, qn, start, candidate_mask, g.valid, ef)


@partial(jax.jit, static_argnames=("ef", "chunk"))
def _filtered_chunk(
    g: DeviceGraph,
    q: jax.Array,
    qn: jax.Array,
    candidate_mask: jax.Array,
    fr_d, fr_id, fr_exp, res_d, res_id,
    ef: int,
    chunk: int,
):
    """At most ``chunk`` filtered-beam iterations from saved pools.
    The last element is per-row activity [B] (see ``_beam_chunk``)."""
    step, cond = _filtered_step(g, q, qn, g.valid, candidate_mask, ef, chunk)
    state = (fr_d, fr_id, fr_exp, res_d, res_id, jnp.int32(0))
    fr_d, fr_id, fr_exp, res_d, res_id, it = jax.lax.while_loop(cond, step, state)
    return (
        fr_d, fr_id, fr_exp, res_d, res_id, it,
        _filtered_rows_active(fr_d, fr_id, fr_exp, res_d),
    )


def hnsw_search_filtered_cancellable(
    g: DeviceGraph,
    q: jax.Array,
    qn: jax.Array,
    candidate_mask: jax.Array,
    ef: int,
    cancel_fn,
    max_iters: Optional[int] = None,
    chunk: int = 16,
    ef_upper: int = 1,
) -> tuple[BeamResult, bool]:
    """Filtered search with mid-flight cooperative cancellation — the
    candidates-bitmap analogue of ``hnsw_search_cancellable`` (round 2
    only polled cancel before/after the whole filtered program). Returns
    the result pool so far as partials when the cancel fires
    (Completion::Cancelled, reference reader.rs:263-280)."""
    if max_iters is None:
        max_iters = 2 * ef + 16
    B = q.shape[0]
    if cancel_fn():
        empty = BeamResult(
            jnp.full((B, ef), INF), jnp.full((B, ef), NO_ID, dtype=jnp.int32), jnp.int32(0)
        )
        return empty, True
    fr_d, fr_id, fr_exp, res_d, res_id, _ = _filtered_descend_and_seed(
        g, q, qn, candidate_mask, ef, ef_upper
    )
    total = 0
    step_cap = chunk
    row_act = None
    while total < max_iters:
        if cancel_fn():
            return BeamResult(res_d, res_id, jnp.int32(total), row_act), True
        # snap the tail into the bucket set: once the remaining budget is
        # smaller than the grown cap, fall back to base-``chunk`` steps, so
        # only {c, 2c, 4c} plus at most one max_iters-mod-c tail size ever
        # compile — ef-dependent tail values each cost a fresh multi-minute
        # cold axon compile (ADVICE r4).
        if step_cap > max_iters - total:
            step_cap = chunk
        step = min(step_cap, max_iters - total)
        fr_d, fr_id, fr_exp, res_d, res_id, it, row_act = _filtered_chunk(
            g, q, qn, candidate_mask, fr_d, fr_id, fr_exp, res_d, res_id, ef, step
        )
        it, row_act = jax.device_get((it, row_act))  # one tunnel RTT, not two
        total += int(it)
        if not row_act.any():
            break
        # geometric chunk growth (cap 4x): each chunk dispatch pays a full
        # tunnel RTT (~30 ms on axon), so long searches halve dispatches
        # while early cancel probes stay responsive; sizes stay in
        # {chunk, 2c, 4c} so the jit-variant set is bounded.
        step_cap = min(step_cap * 2, 4 * chunk)
    return BeamResult(res_d, res_id, jnp.int32(total), row_act), bool(cancel_fn())


@partial(jax.jit, static_argnames=("ef", "max_iters", "ef_upper"))
def hnsw_search_filtered(
    g: DeviceGraph,
    q: jax.Array,
    qn: jax.Array,
    candidate_mask: jax.Array,
    ef: int,
    max_iters: Optional[int] = None,
    ef_upper: int = 1,
) -> BeamResult:
    start = _descend_start(g, q, qn, ef_upper)
    return beam_search_filtered(g, q, qn, start, ef, candidate_mask, max_iters)
