"""Sharded index: one sub-HNSW per device, SPMD search + build.

Design (SURVEY §5 long-context / §2.2 distributed-backend rows): items are
partitioned round-robin across S shards; each shard is an *independent*
sub-HNSW living in its device's HBM slice. This is the standard
distributed-ANN decomposition — identical programs per shard (SPMD), no
cross-shard edges, so construction is embarrassingly parallel and a query
is: replicate → per-shard beam search → ``all_gather`` the per-shard top-k
→ global merge. Collectives ride ICI; the only cross-chip traffic is the
k results per shard, not vectors.

Everything runs under one ``jax.shard_map`` over a ``Mesh`` so XLA sees a
single compiled SPMD program (replacing what NCCL/MPI would be in a
CUDA port — SURVEY §2.2 explicitly calls this the new first-class
component).
"""

from __future__ import annotations

from functools import partial
from typing import Optional

import jax
import jax.numpy as jnp
import numpy as np
from jax.sharding import Mesh, NamedSharding, PartitionSpec as P

from ..models.hnsw import INVALID_ID, DeviceGraph, HostGraph, to_device
from ..ops import beam, codecs, distances
from ..ops.topk import INF
from .mesh import SHARD_AXIS, make_mesh


class ShardedIndex:
    """S per-shard graphs stacked on the leading axis and laid out over a
    mesh. Static metadata (metric, max_level, m0) must match across shards
    — the host builder pads all shards to identical shapes."""

    def __init__(self, mesh: Mesh, stacked: dict, ids: jax.Array, metric_name: str, max_level: int):
        self.mesh = mesh
        self.arrays = stacked  # dict of [S, ...] jnp arrays (sharded)
        self.ids = ids  # [S, N_pad] uint32 global item ids per slot
        self.metric_name = metric_name
        self.max_level = max_level

    @property
    def n_shards(self) -> int:
        return self.ids.shape[0]

    @classmethod
    def from_host_graphs(
        cls,
        graphs: list[HostGraph],
        mesh: Optional[Mesh] = None,
        link_slack: int = 0,
    ) -> "ShardedIndex":
        """Stack per-shard host graphs (equal capacity/m0/levels required;
        the sharded builder guarantees this) and lay them over the mesh."""
        mesh = mesh or make_mesh(len(graphs))
        max_level = max(g.max_level for g in graphs)
        # transient uploads (immediately restacked host-side) — don't pin
        # HBM with per-shard vector caches
        devs = [to_device(g, link_slack=link_slack, cache=False) for g in graphs]
        cap_u = max(d.upper_links.shape[1] for d in devs) if max_level else 1
        m = graphs[0].m

        def stack(field, pad_upper=False):
            arrs = []
            for d in devs:
                a = np.asarray(getattr(d, field))
                if pad_upper:
                    full = np.full(
                        (max_level,) + (cap_u,) + a.shape[2:],
                        -1 if a.dtype == np.int32 else np.inf,
                        dtype=a.dtype,
                    )
                    full[: a.shape[0], : a.shape[1]] = a[:max_level]
                    a = full
                arrs.append(a)
            return np.stack(arrs)

        def stack_sr():
            arrs = []
            for d in devs:
                a = np.asarray(d.slot_rows)
                full = np.full((max_level,) + a.shape[1:], -1, dtype=a.dtype)
                full[: a.shape[0]] = a[:max_level]
                arrs.append(a if a.shape[0] == max_level else full)
            return np.stack(arrs)

        e_pad = max(d.entry_slots.shape[0] for d in devs)
        eps = np.full((len(devs), e_pad), -1, dtype=np.int32)
        for i, d in enumerate(devs):
            e = np.asarray(d.entry_slots)
            eps[i, : e.shape[0]] = e

        shard = NamedSharding(mesh, P(SHARD_AXIS))
        stacked = {
            "vectors": stack("vectors"),
            "norms": stack("norms"),
            "links0": stack("links0"),
            "dists0": stack("dists0"),
            "upper_links": stack("upper_links", pad_upper=True),
            "upper_dists": stack("upper_dists", pad_upper=True),
            "slot_rows": stack_sr(),
            "entry_slots": eps,
            "valid": stack("valid"),
        }
        stacked = {k: jax.device_put(jnp.asarray(v), shard) for k, v in stacked.items()}
        ids = jax.device_put(jnp.asarray(np.stack([g.ids for g in graphs])), shard)
        return cls(mesh, stacked, ids, graphs[0].metric.name, max_level)

    def search(self, queries: np.ndarray, k: int, ef: int) -> tuple[np.ndarray, np.ndarray]:
        """Fan-out search → (global item ids [B, k], dists [B, k]).

        Runs the degraded-search completion of the single-chip path
        (reference reader.rs:771-795): query rows whose merged beam results
        came back short (a shard's greedy descent trapped) are re-answered
        exactly with one sharded flat scan — the exact result strictly
        dominates the partial beam result, so it replaces the row.
        """
        metric = distances.by_name(self.metric_name)
        packed = codecs.pack(np.atleast_2d(np.asarray(queries, np.float32)), metric.codec)
        norms = distances.np_norms(metric, packed)
        q = jnp.asarray(packed)
        qn = jnp.asarray(norms)
        n_local = int(np.asarray((self.ids != np.uint32(INVALID_ID)).sum(axis=1)).max())
        ids, d = _sharded_search(
            self.mesh, self.metric_name, self.max_level, self.arrays, self.ids, q, qn, k=k, ef=ef,
            ef_upper=beam.default_ef_upper(n_local, ef),
        )
        ids, d = np.array(ids), np.array(d)  # copies: rows mutated below
        n_items = int(np.asarray((self.ids != np.uint32(INVALID_ID)).sum()))
        want = min(k, n_items)
        found = (ids != np.uint32(INVALID_ID)).sum(axis=1)
        deficient = np.nonzero(found < want)[0]
        if len(deficient):
            f_ids, f_d = _sharded_flat(
                self.mesh,
                self.metric_name,
                self.arrays,
                self.ids,
                q[jnp.asarray(deficient)],
                qn[jnp.asarray(deficient)],
                k=k,
            )
            ids[deficient] = np.asarray(f_ids)
            d[deficient] = np.asarray(f_d)
        return ids, d


@partial(jax.jit, static_argnames=("mesh", "metric_name", "max_level", "k", "ef", "ef_upper"))
def _sharded_search(
    mesh: Mesh,
    metric_name: str,
    max_level: int,
    arrays: dict,
    ids: jax.Array,
    q: jax.Array,
    qn: jax.Array,
    k: int,
    ef: int,
    ef_upper: int = 1,
):
    spec_arrays = {name: P(SHARD_AXIS) for name in arrays}

    def per_shard(arrays, ids_local, q, qn):
        g = _local_graph(arrays, metric_name, max_level)
        res = beam.hnsw_search(g, q, qn, ef, ef_upper=ef_upper)
        top_d = res.dists[:, :k]
        top_slots = res.slots[:, :k]
        gids = ids_local[0][jnp.maximum(top_slots, 0)]
        gids = jnp.where(top_slots >= 0, gids, jnp.uint32(INVALID_ID))
        top_d = jnp.where(top_slots >= 0, top_d, INF)
        # gather every shard's top-k and merge — replicated output
        all_d = jax.lax.all_gather(top_d, SHARD_AXIS, axis=0)  # [S, B, k]
        all_ids = jax.lax.all_gather(gids, SHARD_AXIS, axis=0)
        S = all_d.shape[0]
        flat_d = jnp.swapaxes(all_d, 0, 1).reshape(q.shape[0], S * k)
        flat_i = jnp.swapaxes(all_ids, 0, 1).reshape(q.shape[0], S * k)
        neg, pos = jax.lax.top_k(-flat_d, k)
        merged_i = jnp.take_along_axis(flat_i, pos, axis=-1)
        return merged_i[None], (-neg)[None]

    out_ids, out_d = _shard_map(
        per_shard,
        mesh=mesh,
        in_specs=(spec_arrays, P(SHARD_AXIS), P(), P()),
        out_specs=(P(SHARD_AXIS), P(SHARD_AXIS)),
    )(arrays, ids, q, qn)
    # every shard produced the same merged result; take shard 0's copy
    return out_ids[0], out_d[0]


@partial(jax.jit, static_argnames=("mesh", "metric_name", "k"))
def _sharded_flat(
    mesh: Mesh,
    metric_name: str,
    arrays: dict,
    ids: jax.Array,
    q: jax.Array,
    qn: jax.Array,
    k: int,
):
    """Exact sharded top-k: per-shard flat scan + all_gather merge — the
    distributed brute_force_search (reader.rs:668-711) and the fallback
    that completes degraded sharded beams."""
    metric = distances.by_name(metric_name)
    spec_arrays = {name: P(SHARD_AXIS) for name in arrays}

    def per_shard(arrays, ids_local, q, qn):
        vecs, nrm, valid = arrays["vectors"][0], arrays["norms"][0], arrays["valid"][0]
        d = distances.matrix_distances(metric, q, qn, vecs, nrm)
        d = jnp.where(valid[None, :], d, INF)
        neg, pos = jax.lax.top_k(-d, min(k, d.shape[1]))
        top_d = -neg
        if top_d.shape[1] < k:
            pad = k - top_d.shape[1]
            top_d = jnp.pad(top_d, ((0, 0), (0, pad)), constant_values=INF)
            pos = jnp.pad(pos, ((0, 0), (0, pad)))
        gids = ids_local[0][jnp.maximum(pos, 0)]
        gids = jnp.where(jnp.isfinite(top_d), gids, jnp.uint32(INVALID_ID))
        all_d = jax.lax.all_gather(top_d, SHARD_AXIS, axis=0)  # [S, B, k]
        all_ids = jax.lax.all_gather(gids, SHARD_AXIS, axis=0)
        S = all_d.shape[0]
        flat_d = jnp.swapaxes(all_d, 0, 1).reshape(q.shape[0], S * k)
        flat_i = jnp.swapaxes(all_ids, 0, 1).reshape(q.shape[0], S * k)
        neg, best = jax.lax.top_k(-flat_d, k)
        merged_i = jnp.take_along_axis(flat_i, best, axis=-1)
        return merged_i[None], (-neg)[None]

    out_ids, out_d = _shard_map(
        per_shard,
        mesh=mesh,
        in_specs=(spec_arrays, P(SHARD_AXIS), P(), P()),
        out_specs=(P(SHARD_AXIS), P(SHARD_AXIS)),
    )(arrays, ids, q, qn)
    return out_ids[0], out_d[0]


def _local_graph(arrays: dict, metric_name: str, max_level: int) -> DeviceGraph:
    """Rebuild a (local, squeezed) DeviceGraph inside shard_map."""
    return DeviceGraph(
        vectors=arrays["vectors"][0],
        norms=arrays["norms"][0],
        links0=arrays["links0"][0],
        dists0=arrays["dists0"][0],
        upper_links=arrays["upper_links"][0],
        upper_dists=arrays["upper_dists"][0],
        slot_rows=arrays["slot_rows"][0],
        entry_slots=arrays["entry_slots"][0],
        valid=arrays["valid"][0],
        metric_name=metric_name,
        max_level=max_level,
    )


# --------------------------------------------------------------------------
# Sharded construction
# --------------------------------------------------------------------------


def partition_round_robin(n: int, n_shards: int) -> list[np.ndarray]:
    """Deterministic round-robin item partition (the slot-sharding scheme
    named in BASELINE.json's north star)."""
    return [np.arange(s, n, n_shards) for s in range(n_shards)]


def pad_to_common_shapes(graphs: list[HostGraph]) -> None:
    """Equalise capacities/levels so shards stack into one SPMD layout."""
    cap = max(g.capacity for g in graphs)
    max_level = max(g.max_level for g in graphs)
    for g in graphs:
        g.grow(cap)
        if g.capacity < cap:  # grow() snaps to buckets; force exact match
            raise AssertionError("slot_capacity must align across shards")
        # per-shard max_level stays untouched (single-index semantics);
        # the stacked layout pads shallower shards with empty upper rows,
        # which descent falls through harmlessly
        g.ensure_layers(max_level)
    # upper tables: equal row counts per level
    for l in range(max_level):
        rows = max(
            (g.upper_links[l].shape[0] if l < len(g.upper_links) else 1)
            for g in graphs
        )
        for g in graphs:
            cur = g.upper_links[l].shape[0]
            if cur < rows:
                pad = rows - cur
                g.upper_links[l] = np.concatenate(
                    [g.upper_links[l], np.full((pad, g.m), -1, dtype=np.int32)]
                )
                g.upper_dists[l] = np.concatenate(
                    [g.upper_dists[l], np.full((pad, g.m), np.inf, dtype=np.float32)]
                )


def build_sharded(
    metric: distances.Metric,
    data: np.ndarray,  # [N, D] float32
    item_ids: np.ndarray,
    m: int,
    m0: int,
    n_shards: int,
    opts=None,
    mesh: Optional[Mesh] = None,
) -> ShardedIndex:
    """Build S independent per-shard sub-HNSWs with lockstep SPMD waves.

    The multi-chip form of the reference's one parallel-build mechanism
    (rayon insertion, hnsw.rs:168-185): every device inserts a wave into
    its own sub-graph simultaneously under ``shard_map`` — the host only
    composes the per-shard schedules and drives level-descending wave
    steps; all candidate search / prune / link work happens on all chips
    at once. Sub-graphs are independent, so construction needs no
    cross-chip traffic; search fans out and merges with collectives.
    """
    from ..build import builder as _builder
    from ..build.builder import FLAT_BOOTSTRAP, _WAVE_BUCKETS
    from ..models.hnsw import slot_capacity
    from ..utils.stats import BuildStats

    opts = opts or _builder.BuildOptions()
    n = data.shape[0]
    S = n_shards
    parts = partition_round_robin(n, S)
    cap = slot_capacity(max(len(p) for p in parts))

    # ---- stage per-shard host graphs + host build plans ----
    graphs: list[HostGraph] = []
    plans = []
    for part in parts:
        g = HostGraph.empty(metric, data.shape[1], m, m0, capacity=cap)
        packed = codecs.pack(data[part], metric.codec)
        nrm = distances.np_norms(metric, packed)
        slots = np.empty(len(part), dtype=np.int64)
        for i, row in enumerate(part):
            s = g.alloc_slot(int(item_ids[row]))
            slots[i] = s
            g.vectors[s] = packed[i]
            g.norms[s] = nrm[i]
        plan = _builder.plan_build(g, slots, np.empty(0, dtype=np.int64), opts, BuildStats())
        graphs.append(g)
        plans.append(plan)
    pad_to_common_shapes(graphs)
    max_level = max(g.max_level for g in graphs)
    slack = opts.link_slack

    index = ShardedIndex.from_host_graphs(graphs, mesh=mesh, link_slack=slack)
    mesh = index.mesh
    shard = NamedSharding(mesh, P(SHARD_AXIS))
    index.arrays["valid"] = jax.device_put(
        jnp.asarray(np.stack([p[2] for p in plans])), shard
    )
    node_ok = jax.device_put(jnp.asarray(np.stack([p[3] for p in plans])), shard)

    # ---- lockstep level-descending waves (builder.build_graph shape) ----
    sched = [
        {int(lv): p[0][p[1] == lv] for lv in np.unique(p[1])} for p in plans
    ]
    n_active = [int(p[2].sum()) for p in plans]
    W = opts.wave_size
    for lv in range(max_level, -1, -1):
        grps = [s.get(lv, np.empty(0, dtype=np.int64)) for s in sched]
        offs = [0] * S
        while any(offs[s] < len(grps[s]) for s in range(S)):
            if opts.cancel():
                from ..errors import BuildCancelled

                raise BuildCancelled()
            w_i = min(W, max(16, min(n_active) // 4))
            w_pad = 16
            for b in _WAVE_BUCKETS:
                if b <= w_i:
                    w_pad = b
            w_pad = min(w_pad, W)
            use_flat = min(n_active) <= FLAT_BOOTSTRAP
            wave = np.full((S, w_pad), -1, dtype=np.int32)
            for s in range(S):
                chunk = grps[s][offs[s] : offs[s] + w_pad]
                wave[s, : len(chunk)] = chunk
                offs[s] += len(chunk)
                n_active[s] += len(chunk)
            index = sharded_insert_wave(
                index,
                wave,
                node_ok=node_ok,
                lv=lv,
                ef=opts.ef_construction,
                cap=m0,
                alpha=opts.alpha,
                flat=use_flat,
            )

    # ---- reduce slack rows, download, restack at serving width ----
    if slack:
        index = _spmd_prune_slack(index, cap=m0, alpha=opts.alpha)
    arrays = {k: np.asarray(v) for k, v in index.arrays.items()}
    for s, g in enumerate(graphs):
        g.links0 = arrays["links0"][s][:, :m0].copy()
        g.dists0 = arrays["dists0"][s][:, :m0].copy()
        for l in range(len(g.upper_links)):
            rows = g.upper_links[l].shape[0]
            g.upper_links[l] = arrays["upper_links"][s][l, :rows].copy()
            g.upper_dists[l] = arrays["upper_dists"][s][l, :rows].copy()
    return ShardedIndex.from_host_graphs(graphs, mesh=mesh)


def sharded_insert_wave(
    index: ShardedIndex,
    wave_slots: np.ndarray,  # [S, W] per-shard wave (-1 padded)
    ef: int,
    cap: int,
    alpha: float = 1.0,
    node_ok: Optional[jax.Array] = None,  # [S, N_pad]
    lv: int = 0,
    flat: bool = False,
) -> ShardedIndex:
    """One SPMD construction wave across every shard simultaneously —
    the multi-chip *training step* equivalent: each device descends to the
    wave's level, then runs the per-level beam → α-prune → link chain of
    ``builder._insert_wave`` on its local sub-graph, with no cross-chip
    traffic (sub-graphs are independent).

    The input ``index``'s device arrays are **donated** (updated in place
    on device); use only the returned index afterwards."""
    if node_ok is None:
        node_ok = index.arrays["valid"] | jax.vmap(
            lambda w: _slots_mask(index.arrays["valid"].shape[1], w)
        )(jnp.asarray(wave_slots))
    new_arrays = _sharded_insert_wave_jit(
        index.mesh,
        index.metric_name,
        index.max_level,
        index.arrays,
        jnp.asarray(wave_slots),
        node_ok,
        lv=lv,
        ef=ef,
        cap=cap,
        alpha=alpha,
        flat=flat,
    )
    return ShardedIndex(mesh=index.mesh, stacked=new_arrays, ids=index.ids,
                        metric_name=index.metric_name, max_level=index.max_level)


@partial(
    jax.jit,
    static_argnames=("mesh", "metric_name", "max_level", "lv", "ef", "cap", "alpha", "flat"),
    donate_argnums=(3,),
)
def _sharded_insert_wave_jit(
    mesh: Mesh,
    metric_name: str,
    max_level: int,
    arrays: dict,
    wave_slots: jax.Array,  # [S, W]
    node_ok: jax.Array,  # [S, N_pad]
    lv: int,
    ef: int,
    cap: int,
    alpha: float,
    flat: bool,
):
    from ..build import wave_ops

    spec_arrays = {name: P(SHARD_AXIS) for name in arrays}

    def per_shard(arrays, waves, ok):
        g = _local_graph(arrays, metric_name, max_level)
        w = waves[0]
        ok = ok[0]
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
                is_level0=(level == 0),
                ef=ef,
                cap=level_cap,
                alpha=alpha,
                flat=flat,
            )
            g, seeds = res.graph, res.selected
        g2 = wave_ops.activate_wave(g, w)
        return {
            "vectors": g2.vectors[None],
            "norms": g2.norms[None],
            "links0": g2.links0[None],
            "dists0": g2.dists0[None],
            "upper_links": g2.upper_links[None],
            "upper_dists": g2.upper_dists[None],
            "slot_rows": g2.slot_rows[None],
            "entry_slots": g2.entry_slots[None],
            "valid": g2.valid[None],
        }

    return _shard_map(
        per_shard,
        mesh=mesh,
        in_specs=(spec_arrays, P(SHARD_AXIS), P(SHARD_AXIS)),
        out_specs={name: P(SHARD_AXIS) for name in arrays},
    )(arrays, wave_slots, node_ok)


def _spmd_prune_slack(index: ShardedIndex, cap: int, alpha: float) -> ShardedIndex:
    """Shard-parallel build finalisation: α-prune slack-widened layer-0
    rows back to ``cap`` on every device at once (wave_ops.prune_slack_rows
    per shard)."""
    new_arrays = _spmd_prune_slack_jit(
        index.mesh, index.metric_name, index.max_level, index.arrays, cap=cap, alpha=alpha
    )
    return ShardedIndex(mesh=index.mesh, stacked=new_arrays, ids=index.ids,
                        metric_name=index.metric_name, max_level=index.max_level)


@partial(
    jax.jit,
    static_argnames=("mesh", "metric_name", "max_level", "cap", "alpha"),
    donate_argnums=(3,),
)
def _spmd_prune_slack_jit(
    mesh: Mesh, metric_name: str, max_level: int, arrays: dict, cap: int, alpha: float
):
    from ..build import wave_ops

    spec_arrays = {name: P(SHARD_AXIS) for name in arrays}

    def per_shard(arrays):
        g = _local_graph(arrays, metric_name, max_level)
        dirty = jnp.zeros((g.capacity,), dtype=bool)
        g2, _ = wave_ops.prune_slack_rows(g, dirty, cap=cap, alpha=alpha)
        out = dict(arrays)
        out["links0"] = g2.links0[None]
        out["dists0"] = g2.dists0[None]
        return out

    return _shard_map(
        per_shard,
        mesh=mesh,
        in_specs=(spec_arrays,),
        out_specs={name: P(SHARD_AXIS) for name in arrays},
    )(arrays)


def _slots_mask(capacity: int, slots: jax.Array) -> jax.Array:
    mask = jnp.zeros((capacity,), dtype=bool)
    safe = jnp.where(slots >= 0, slots, capacity)
    return mask.at[safe].set(True, mode="drop")


def _get_shard_map():
    if hasattr(jax, "shard_map"):
        return jax.shard_map
    from jax.experimental.shard_map import shard_map as _sm  # jax < 0.5

    return _sm


_shard_map = _get_shard_map()
