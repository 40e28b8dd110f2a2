"""Trusted sequential host builder — the correctness oracle.

A slow, obviously-correct HNSW constructor used to validate the device
query engine and as the recall yardstick for the wave-parallel TPU builder
(SURVEY §7 build order step 5: "host-side reference builder, simple
sequential insert, correctness-first").

It follows the reference's insertion semantics (hnsw.rs:291-328) but
replaces the beam candidate search with *exact* nearest neighbors over the
current layer membership — strictly better candidates, so graphs built here
upper-bound the achievable search recall.

``robust_prune`` and ``add_link`` replicate hnsw.rs:523-597 exactly,
including the overflow quirk: a full neighbor list is α-pruned *without*
the incoming link (hnsw.rs:545-552).
"""

from __future__ import annotations

import numpy as np

from ..models.hnsw import HostGraph
from ..ops import distances
from .levels import sample_levels


def robust_prune(
    g: HostGraph,
    candidates: list[tuple[float, int]],  # (dist_to_query, slot)
    level: int,
    alpha: float,
) -> list[tuple[float, int]]:
    """α-SNG pruning (reference hnsw.rs:565-597)."""
    cap = g.m0 if level == 0 else g.m
    cands = sorted(candidates)
    if not cands:
        return []
    slots = np.asarray([s for _, s in cands])
    # one pairwise matrix instead of per-pair SIMD calls (hnsw.rs:583-589
    # re-reads both vectors from LMDB for every comparison)
    pair = distances.np_pairwise(
        g.metric, g.vectors[slots], g.norms[slots], g.vectors[slots], g.norms[slots]
    )
    selected_idx: list[int] = []
    selected: list[tuple[float, int]] = []
    for ci, (dist_to_query, c) in enumerate(cands):
        if len(selected) == cap:
            break
        ok = True
        for si in selected_idx:
            if pair[ci, si] * alpha < dist_to_query:
                ok = False
                break
        if ok:
            selected_idx.append(ci)
            selected.append((dist_to_query, c))
    return selected


def _add_link(g: HostGraph, p: int, q: tuple[float, int], level: int, alpha: float) -> None:
    """Single-direction link add (reference hnsw.rs:523-560)."""
    if p == q[1]:
        return
    cap = g.m0 if level == 0 else g.m
    existing = [
        (float(d), int(s))
        for s, d in zip(g.links_of(p, level), _link_dists_of(g, p, level))
    ]
    if len(existing) < cap:
        existing.append(q)
    else:
        existing = robust_prune(g, existing, level, alpha)
    slots = np.asarray([s for _, s in existing], dtype=np.int32)
    dists = np.asarray([d for d, _ in existing], dtype=np.float32)
    g.set_links(p, level, slots, dists)


def _link_dists_of(g: HostGraph, slot: int, level: int) -> np.ndarray:
    if level == 0:
        row_ids, row_d = g.links0[slot], g.dists0[slot]
    else:
        r = g.slot_rows[level - 1][slot]
        if r < 0:
            return np.empty(0, dtype=np.float32)
        row_ids, row_d = g.upper_links[level - 1][r], g.upper_dists[level - 1][r]
    return row_d[row_ids >= 0]


def build_host_graph(
    metric: distances.Metric,
    raw_vectors: np.ndarray,  # [N, D] float
    item_ids: np.ndarray,
    m: int,
    m0: int,
    ef_construction: int = 100,
    alpha: float = 1.0,
    seed: int = 42,
) -> HostGraph:
    """Sequential build from scratch (fresh index)."""
    from ..ops import codecs

    n, dims = raw_vectors.shape
    g = HostGraph.empty(metric, dims, m, m0, capacity=max(256, n))
    rng = np.random.default_rng(seed)
    levels = sample_levels(rng, m, n)

    packed = codecs.pack(raw_vectors, metric.codec)
    norms = distances.np_norms(metric, packed)

    slots = np.empty(n, dtype=np.int64)
    for i in range(n):
        s = g.alloc_slot(int(item_ids[i]))
        slots[i] = s
        g.vectors[s] = packed[i]
        g.norms[s] = norms[i]

    g.max_level = int(levels.max()) if n else 0
    g.ensure_layers(g.max_level)

    # level-descending insertion order (reference hnsw.rs:160-185)
    order = np.argsort(-levels, kind="stable")
    # membership per layer, filled as we insert
    layer_members: list[list[int]] = [[] for _ in range(g.max_level + 1)]

    for i in order:
        s = int(slots[i])
        lvl = int(levels[i])
        g.levels[s] = lvl
        for level in range(lvl, -1, -1):
            members = [mslot for mslot in layer_members[level] if mslot != s]
            if members:
                marr = np.asarray(members)
                d = distances.np_pairwise(
                    g.metric,
                    g.vectors[s : s + 1],
                    g.norms[s : s + 1],
                    g.vectors[marr],
                    g.norms[marr],
                )[0]
                top = np.argsort(d, kind="stable")[:ef_construction]
                cands = [(float(d[t]), int(marr[t])) for t in top]
                for dist, nslot in robust_prune(g, cands, level, alpha):
                    _add_link(g, s, (dist, nslot), level, alpha)
                    _add_link(g, nslot, (dist, s), level, alpha)
            if level > 0:
                g.upper_row(level, s)  # materialise (possibly empty) row
            layer_members[level].append(s)

    g.entry_slots = [int(slots[i]) for i in order if int(levels[i]) == g.max_level]
    return g
