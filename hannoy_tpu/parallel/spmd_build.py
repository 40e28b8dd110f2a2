"""Journal-driven SPMD construction over the durable store.

Round 2 had two half-integrated multi-chip paths: the in-memory SPMD
builder (``sharded.build_sharded`` — fresh arrays only, discards the
store) and the store-backed ``ShardedWriter.build`` that looped shards
*sequentially* through the single-chip builder. This module unifies them:

1. every shard runs the single-chip build **prologue** (journal scan →
   to_insert/to_delete set algebra → vector staging,
   ``Writer._build_prologue`` — reference semantics writer.rs:521-554);
2. all shards' device builds run in **lockstep SPMD waves** under one
   ``shard_map`` over the mesh — insert waves, FreshDiskANN deletion
   repair, and slack pruning all execute on every device simultaneously
   (the multi-chip form of the reference's rayon insertion loop,
   hnsw.rs:168-185, and gap fill, hnsw.rs:334-415);
3. every shard runs the single-chip **epilogue** (targeted link
   deletion → dirty-row flush → metadata/version,
   ``Writer._build_epilogue`` — writer.rs:577-600).

Per-shard dirty masks ride the device through every wave, so incremental
sharded builds flush only touched rows, exactly like the single-chip
path. Each shard persists as an ordinary store index, so crash recovery,
``NeedBuild`` gating, and per-shard ``Reader`` debugging all apply
unchanged.

The cluster-blocked bulk path (build/bulk.py) stays single-device: its
k-means orchestration is host-driven and data-dependent per shard, which
does not fit lockstep SPMD. Large fresh sharded builds on one host can
instead set ``sequential=True`` (each shard through the full single-chip
builder, bulk included); the SPMD path is for real multi-chip meshes.
"""

from __future__ import annotations

from functools import partial
from typing import Optional

import jax
import jax.numpy as jnp
import numpy as np
from jax.sharding import Mesh, NamedSharding, PartitionSpec as P

from ..build import builder as _builder
from ..build import wave_ops
from ..errors import BuildCancelled
from ..models.hnsw import HostGraph
from ..utils.stats import BuildStats
from ..utils.tracing import span
from .mesh import SHARD_AXIS
from .sharded import (
    ShardedIndex,
    _local_graph,
    _shard_map,
    _spmd_prune_slack_jit,
    pad_to_common_shapes,
)


def spmd_store_build(
    writers: list,
    opts: Optional[_builder.BuildOptions] = None,
    mesh: Optional[Mesh] = None,
) -> list[BuildStats]:
    """Build every shard's journal-pending changes in lockstep SPMD waves.

    ``writers`` are per-shard :class:`hannoy_tpu.Writer` handles sharing
    one Database/wtxn (one store index per shard). Inserts AND deletes
    flow through the device mesh; durability flows through each shard's
    ordinary epilogue. Returns per-shard BuildStats.
    """
    opts = opts or _builder.BuildOptions()
    plans = [w._build_prologue(opts) for w in writers]
    statses = [BuildStats() for _ in writers]

    if any(p.built for p in plans):
        _spmd_device_build(plans, statses, opts, mesh)

    return [
        w._build_epilogue(p, opts, st)
        for w, p, st in zip(writers, plans, statses)
    ]


def _spmd_device_build(
    plans: list,
    statses: list[BuildStats],
    opts: _builder.BuildOptions,
    mesh: Optional[Mesh],
) -> None:
    """Steps shared with ``builder.build_graph``, S shards at a time."""
    S = len(plans)
    graphs: list[HostGraph] = [p.g for p in plans]

    # ---- per-shard host prologue (levels, entry points, masks) ----
    # Shards with nothing pending skip plan_build: it schedules the old
    # entry points for re-indexing (hnsw.rs:267-268), which is only wanted
    # when a build actually runs (the single-chip path gates build_graph
    # on plan.built the same way).
    dplans = []
    for p, st in zip(plans, statses):
        if p.built:
            dplans.append(
                _builder.plan_build(p.g, p.insert_slots, p.delete_slots, opts, st)
            )
        else:
            live = (p.g.levels >= 0).copy()
            dplans.append(
                (np.empty(0, dtype=np.int64), np.empty(0, dtype=np.int32), live, live.copy())
            )
    deleted_sets = [{int(s) for s in p.delete_slots} for p in plans]

    # ---- equalize shapes, pad the per-shard masks to the common capacity
    pad_to_common_shapes(graphs)
    cap = graphs[0].capacity
    max_level = max(g.max_level for g in graphs)

    def padmask(m: np.ndarray) -> np.ndarray:
        return np.pad(m, (0, cap - len(m)), constant_values=False)

    active = np.stack([padmask(dp[2]) for dp in dplans])  # [S, cap]
    exists_ok = np.stack([padmask(dp[3]) for dp in dplans])

    slack = opts.link_slack
    index = ShardedIndex.from_host_graphs(graphs, mesh=mesh, link_slack=slack)
    mesh = index.mesh
    shard = NamedSharding(mesh, P(SHARD_AXIS))
    arrays = index.arrays
    arrays["valid"] = jax.device_put(jnp.asarray(active), shard)
    node_ok = jax.device_put(jnp.asarray(exists_ok), shard)
    dirty = jax.device_put(jnp.zeros((S, cap), dtype=bool), shard)

    # ---- lockstep level-descending insert waves (hnsw.rs:160-185) ----
    sched = [
        {int(lv): dp[0][dp[1] == lv] for lv in np.unique(dp[1])} if len(dp[0]) else {}
        for dp in dplans
    ]
    n_active = [int(dp[2].sum()) for dp in dplans]
    W = opts.wave_size
    m0 = graphs[0].m0
    for lv in range(max_level, -1, -1):
        grps = [s.get(lv, np.empty(0, dtype=np.int64)) for s in sched]
        offs = [0] * S
        while any(offs[s] < len(grps[s]) for s in range(S)):
            if opts.cancel():
                raise BuildCancelled()
            # the single-chip wave ramp, gated on the SLOWEST shard (a
            # wave is blind to its own members; see builder.build_graph)
            w_i = min(W, max(16, min(n_active) // 4))
            w_pad = 16
            for b in _builder._WAVE_BUCKETS:
                if b <= w_i:
                    w_pad = b
            w_pad = min(w_pad, W)
            use_flat = min(n_active) <= _builder.FLAT_BOOTSTRAP
            wave = np.full((S, w_pad), -1, dtype=np.int32)
            for s in range(S):
                chunk = grps[s][offs[s] : offs[s] + w_pad]
                wave[s, : len(chunk)] = chunk
                offs[s] += len(chunk)
                n_active[s] += len(chunk)
            with span("spmd_wave", level=lv, width=w_pad, shards=S):
                arrays, dirty = _spmd_insert_wave_jit(
                    mesh,
                    index.metric_name,
                    max_level,
                    arrays,
                    jnp.asarray(wave),
                    node_ok,
                    dirty,
                    lv=lv,
                    ef=opts.ef_construction,
                    cap=m0,
                    alpha=opts.alpha,
                    flat=use_flat,
                )
            for st in statses:
                st.waves += 1

    # ---- reduce slack rows before repair reads them ----
    if slack:
        arrays = _spmd_prune_slack_jit(
            mesh, index.metric_name, max_level, arrays,
            cap=m0, alpha=opts.alpha,
        )

    # ---- lockstep deletion repair (fill_gaps_from_deleted, hnsw.rs:334-415)
    touched_extra: list[set[int]] = [set() for _ in range(S)]
    if any(deleted_sets):
        arrays = _spmd_repair_deletions(
            mesh, index.metric_name, max_level, arrays, graphs,
            deleted_sets, opts, touched_extra,
        )
        del_pad = max(len(d) for d in deleted_sets)
        del_tab = np.full((S, max(del_pad, 1)), -1, dtype=np.int32)
        for s, dset in enumerate(deleted_sets):
            del_tab[s, : len(dset)] = sorted(dset)
        arrays = _spmd_clear_slots_jit(
            mesh, index.metric_name, max_level, arrays, jnp.asarray(del_tab)
        )

    # ---- download: stacked arrays → per-shard host mirrors ----
    links0 = np.asarray(arrays["links0"])
    dists0 = np.asarray(arrays["dists0"])
    up = np.asarray(arrays["upper_links"])
    ud = np.asarray(arrays["upper_dists"])
    dirty_np = np.asarray(jax.device_get(dirty))
    for s, g in enumerate(graphs):
        g.links0 = links0[s][:, : g.m0].copy()
        g.dists0 = dists0[s][:, : g.m0].copy()
        for l in range(len(g.upper_links)):
            rows = g.upper_links[l].shape[0]
            g.upper_links[l] = up[s, l, :rows].copy()
            g.upper_dists[l] = ud[s, l, :rows].copy()
        touched = set(np.nonzero(dirty_np[s])[0].tolist()) | touched_extra[s]
        touched -= deleted_sets[s]
        statses[s].touched = np.asarray(sorted(touched), dtype=np.int64)


@partial(
    jax.jit,
    static_argnames=("mesh", "metric_name", "max_level", "lv", "ef", "cap", "alpha", "flat"),
    donate_argnums=(3, 6),
)
def _spmd_insert_wave_jit(
    mesh: Mesh,
    metric_name: str,
    max_level: int,
    arrays: dict,
    wave_slots: jax.Array,  # [S, W]
    node_ok: jax.Array,  # [S, N_pad]
    dirty: jax.Array,  # [S, N_pad]
    lv: int,
    ef: int,
    cap: int,
    alpha: float,
    flat: bool,
):
    """One lockstep wave with dirty-row tracking: every shard descends and
    inserts its local wave simultaneously (``sharded.sharded_insert_wave``
    plus the dirty accumulator the store-backed flush needs)."""
    from ..ops import beam

    spec_arrays = {name: P(SHARD_AXIS) for name in arrays}

    def per_shard(arrays, waves, ok, dirty):
        g = _local_graph(arrays, metric_name, max_level)
        w = waves[0]
        ok = ok[0]
        dirty = dirty[0]
        if max_level > lv and not flat:
            seeds = beam.descend_for_slots(g, w, max_level, lv + 1, node_ok=ok)
        else:
            seeds = jnp.broadcast_to(
                g.entry_slots[None, :], (w.shape[0], g.entry_slots.shape[0])
            )
        for level in range(min(lv, max_level), -1, -1):
            level_cap = cap if level == 0 else g.upper_links.shape[-1]
            res = wave_ops.wave_insert_level(
                g,
                w,
                seeds,
                ok,
                jnp.int32(level),
                dirty,
                is_level0=(level == 0),
                ef=ef,
                cap=level_cap,
                alpha=alpha,
                flat=flat,
            )
            g, seeds, dirty = res.graph, res.selected, res.dirty
        g2 = wave_ops.activate_wave(g, w)
        return _stack_local(g2), dirty[None]

    return _shard_map(
        per_shard,
        mesh=mesh,
        in_specs=(spec_arrays, P(SHARD_AXIS), P(SHARD_AXIS), P(SHARD_AXIS)),
        out_specs=({name: P(SHARD_AXIS) for name in arrays}, P(SHARD_AXIS)),
    )(arrays, wave_slots, node_ok, dirty)


def _spmd_repair_deletions(
    mesh: Mesh,
    metric_name: str,
    max_level: int,
    arrays: dict,
    graphs: list[HostGraph],
    deleted_sets: list[set[int]],
    opts: _builder.BuildOptions,
    touched_extra: list[set[int]],
) -> dict:
    """Lockstep FreshDiskANN gap fill: the host finds each shard's
    affected rows from the synced link tables (builder._repair_deletions
    host scan), pads the per-shard block lists to a common length, and
    runs ``repair_deleted_rows`` on every shard at once."""
    S = len(graphs)
    cap_full = graphs[0].capacity
    links0 = np.asarray(arrays["links0"])
    up = np.asarray(arrays["upper_links"])

    del_mask = np.zeros((S, cap_full), dtype=bool)
    for s, dset in enumerate(deleted_sets):
        if dset:
            del_mask[s, list(dset)] = True
    deleted_j = jnp.asarray(del_mask)

    # Every stored layer, not just 0..max_level: a height reset can leave
    # survivors' rows above the new max_level and they must be cleansed
    # too (reference hnsw.rs:346-357; see builder._repair_deletions).
    n_layers = max(len(g.upper_links) for g in graphs)
    for level in range(n_layers + 1):
        per_shard_rows: list[np.ndarray] = []
        for s, g in enumerate(graphs):
            if not deleted_sets[s] or (level > 0 and level - 1 >= len(g.upper_links)):
                per_shard_rows.append(np.empty(0, dtype=np.int32))
                continue
            if level == 0:
                table = links0[s][:, : g.m0]
                owners = np.arange(cap_full)
            else:
                table = up[s, level - 1]
                owners = np.full(table.shape[0], -1, dtype=np.int64)
                rows = g.slot_rows[level - 1]
                owner_slots = np.nonzero(rows >= 0)[0]
                owners[rows[owner_slots]] = owner_slots
            has_del = (table >= 0) & del_mask[s][np.maximum(table, 0)]
            affected = np.nonzero(has_del.any(axis=1))[0]
            aff_owners = affected if level == 0 else owners[affected]
            aff_owners = np.asarray(
                [x for x in aff_owners if x >= 0 and x not in deleted_sets[s]],
                dtype=np.int32,
            )
            touched_extra[s].update(int(x) for x in aff_owners)
            per_shard_rows.append(aff_owners)
        n_blocks = max(
            (len(r) + _builder.REPAIR_BLOCK - 1) // _builder.REPAIR_BLOCK
            for r in per_shard_rows
        )
        cap = graphs[0].m0 if level == 0 else graphs[0].m
        for b in range(n_blocks):
            if opts.cancel():
                raise BuildCancelled()
            block = np.full((S, _builder.REPAIR_BLOCK), -1, dtype=np.int32)
            for s, rows_s in enumerate(per_shard_rows):
                chunk = rows_s[b * _builder.REPAIR_BLOCK : (b + 1) * _builder.REPAIR_BLOCK]
                block[s, : len(chunk)] = chunk
            arrays = _spmd_repair_block_jit(
                mesh, metric_name, max_level, arrays,
                jnp.asarray(block), deleted_j, jnp.int32(level),
                is_level0=(level == 0), cap=cap, alpha=opts.alpha,
            )
    return arrays


@partial(
    jax.jit,
    static_argnames=("mesh", "metric_name", "max_level", "is_level0", "cap", "alpha"),
    donate_argnums=(3,),
)
def _spmd_repair_block_jit(
    mesh: Mesh,
    metric_name: str,
    max_level: int,
    arrays: dict,
    block: jax.Array,  # [S, R]
    deleted: jax.Array,  # [S, N_pad]
    level: jax.Array,
    is_level0: bool,
    cap: int,
    alpha: float,
):
    spec_arrays = {name: P(SHARD_AXIS) for name in arrays}

    def per_shard(arrays, block, deleted):
        g = _local_graph(arrays, metric_name, max_level)
        g2 = wave_ops.repair_deleted_rows(
            g, block[0], deleted[0], level, is_level0=is_level0, cap=cap, alpha=alpha
        )
        return _stack_local(g2)

    return _shard_map(
        per_shard,
        mesh=mesh,
        in_specs=(spec_arrays, P(SHARD_AXIS), P(SHARD_AXIS)),
        out_specs={name: P(SHARD_AXIS) for name in arrays},
    )(arrays, block, deleted)


@partial(
    jax.jit,
    static_argnames=("mesh", "metric_name", "max_level"),
    donate_argnums=(3,),
)
def _spmd_clear_slots_jit(
    mesh: Mesh, metric_name: str, max_level: int, arrays: dict, del_tab: jax.Array
):
    spec_arrays = {name: P(SHARD_AXIS) for name in arrays}

    def per_shard(arrays, del_tab):
        g = _local_graph(arrays, metric_name, max_level)
        return _stack_local(wave_ops.clear_slots(g, del_tab[0]))

    return _shard_map(
        per_shard,
        mesh=mesh,
        in_specs=(spec_arrays, P(SHARD_AXIS)),
        out_specs={name: P(SHARD_AXIS) for name in arrays},
    )(arrays, del_tab)


def _stack_local(g) -> dict:
    """A local DeviceGraph back into the [1, ...]-leading stacked dict."""
    return {
        "vectors": g.vectors[None],
        "norms": g.norms[None],
        "links0": g.links0[None],
        "dists0": g.dists0[None],
        "upper_links": g.upper_links[None],
        "upper_dists": g.upper_dists[None],
        "slot_rows": g.slot_rows[None],
        "entry_slots": g.entry_slots[None],
        "valid": g.valid[None],
    }
