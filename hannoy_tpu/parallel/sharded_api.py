"""Store-backed sharded indexes: durable multi-chip deployments.

Connects the SPMD sharded engine (``sharded.py``) to the host store: shard
``s`` of a sharded index persists as store index ``base_index + s`` —
ordinary per-index records (items, links, metadata, journal), so every
single-index capability (incremental builds, deletes, validity checks,
crash recovery) applies per shard, and a sharded deployment can be opened
shard-by-shard with plain :class:`hannoy_tpu.Reader` for debugging.

This is the Deep-10M-style configuration from BASELINE.json: the vector
store sharded over an ICI mesh, queries fanned out and merged with
collectives.
"""

from __future__ import annotations

from typing import Optional, Sequence

import numpy as np
from jax.sharding import Mesh

from ..api import Database, Reader, Writer
from ..models.hnsw import HostGraph
from ..ops import codecs
from ..store.schema import Key, NodeMode, Prefix, UpdateStatus, encode_update_status, keys_bytes
from .mesh import make_mesh
from .sharded import ShardedIndex, pad_to_common_shapes as _pad_to_common_shapes


def shard_of(item_id: int, n_shards: int) -> int:
    """Deterministic item → shard routing (round-robin by id)."""
    return int(item_id) % n_shards


class ShardedWriter:
    """Routes item CRUD to per-shard Writers and builds every shard.

    ``build()`` drives all shards' journal-pending changes (inserts AND
    deletes) through lockstep SPMD device waves under one ``shard_map``
    (``spmd_build.spmd_store_build``) when the mesh has a device per
    shard; on a smaller device count it falls back to sequential
    single-chip builds per shard (which can use the cluster-blocked bulk
    path — the right mode for one big chip hosting many shards). Either
    way durability flows through each shard's ordinary store epilogue.
    """

    def __init__(
        self,
        database: Database,
        dimensions: int,
        n_shards: int,
        base_index: int = 0,
        m: int = 16,
        ef: int = 96,
        m0: Optional[int] = None,
        mesh: Optional[Mesh] = None,
    ):
        self.n_shards = n_shards
        self.base_index = base_index
        self._writers = [
            database.writer(dimensions, index=base_index + s, m=m, ef=ef, m0=m0)
            for s in range(n_shards)
        ]
        self._database = database
        self._mesh = mesh

    def add_item(self, item: int, vector) -> None:
        self._writers[shard_of(item, self.n_shards)].add_item(item, vector)

    def add_items(self, items: Sequence[int], vectors: np.ndarray) -> None:
        items = np.asarray(list(items), dtype=np.uint32)
        vectors = np.asarray(vectors, dtype=np.float32)
        for s in range(self.n_shards):
            mask = (items % self.n_shards) == s
            if mask.any():
                self._writers[s].add_items(items[mask], vectors[mask])

    def del_item(self, item: int) -> bool:
        return self._writers[shard_of(item, self.n_shards)].del_item(item)

    def build(self, spmd: Optional[bool] = None, opts=None, **kw) -> None:
        """Build every shard's pending changes.

        ``spmd=None`` (auto) uses the lockstep SPMD path when the runtime
        has at least ``n_shards`` devices, sequential single-chip builds
        otherwise. ``opts`` is a shared ``BuildOptions`` for the SPMD
        path; ``**kw`` (m/m0) forwards to the per-shard builders on the
        sequential path."""
        import jax

        if not any(w.need_build() for w in self._writers):
            return
        if spmd is None:
            spmd = self._mesh is not None or len(jax.devices()) >= self.n_shards
        if spmd:
            from .spmd_build import spmd_store_build

            spmd_store_build(self._writers, opts=opts, mesh=self._mesh)
        else:
            for w in self._writers:
                if w.need_build():
                    w.builder().build(**kw)
                    if self.n_shards > 1:
                        # one chip serves the shards sequentially: drop the
                        # finished shard's HBM vector cache so peak HBM is
                        # ~one shard, not S (10M×768 f32 = 30.7 GB total,
                        # far beyond one chip — the >HBM configuration)
                        w.release_device_cache()

    def __enter__(self) -> "ShardedWriter":
        return self

    def __exit__(self, exc_type, exc, tb) -> None:
        if exc_type is None:
            self.build()
            self._database.commit_rw_txn()
        else:
            self._database.abort_rw_txn()


def reshard(
    database: Database,
    old_n_shards: int,
    new_n_shards: int,
    *,
    base_index: int = 0,
    new_base_index: Optional[int] = None,
    dimensions: Optional[int] = None,
    m: int = 16,
    ef: int = 96,
    m0: Optional[int] = None,
    build: bool = True,
    opts=None,
    spmd: Optional[bool] = None,
    mesh: Optional[Mesh] = None,
) -> ShardedWriter:
    """Migrate a sharded deployment to a different shard count.

    The elastic-scaling operation the reference has no analogue for
    (single-host LMDB — README.md:13): when the device mesh grows or
    shrinks, every item must move to the shard its id now routes to
    (``item % new_n_shards``). Item payload records move **verbatim**
    between store indexes (no decode/re-pack — the moved bytes stay
    identical to what ``add_items`` wrote), journal stones mark every
    moved item, and the per-shard graphs are rebuilt fresh (large fresh
    builds take the cluster-blocked bulk path). Everything happens under
    the shared wtxn: a crash mid-reshard rolls back to the old layout.

    ``new_base_index=None`` reshards in place at ``base_index`` (old
    indexes are cleared before the new layout is written). A distinct
    ``new_base_index`` writes the new layout beside the old one, which is
    then cleared; the ranges must not overlap.

    Note there is no separate "rebalance" operation: routing is
    deterministic by id, so shard populations can only skew through the
    id distribution itself, and deletes never un-balance a deployment
    relative to that routing.

    Returns a :class:`ShardedWriter` over the new layout (already built
    when ``build=True``; commit via ``database.commit_rw_txn()``).
    """
    if old_n_shards < 1 or new_n_shards < 1:
        raise ValueError("shard counts must be >= 1")
    in_place = new_base_index is None or new_base_index == base_index
    new_base = base_index if in_place else new_base_index
    if not in_place:
        old_rng = range(base_index, base_index + old_n_shards)
        new_rng = range(new_base, new_base + new_n_shards)
        if max(old_rng.start, new_rng.start) < min(old_rng.stop, new_rng.stop):
            raise ValueError(
                f"old index range {old_rng} overlaps new range {new_rng}"
            )
    wtxn = database._wtxn()
    db = database._db
    metric = database.metric.distance

    # dimensions from the first shard that has been built, else required
    if dimensions is None:
        from ..store.schema import Metadata

        for s in range(old_n_shards):
            md = db.get(wtxn, Key.metadata(base_index + s).to_bytes())
            if md is not None:
                dimensions = Metadata.from_bytes(md).dimensions
                break
        if dimensions is None:
            raise ValueError(
                "no shard has metadata yet - pass dimensions= explicitly"
            )

    vec_bytes = codecs.pack(np.zeros((1, dimensions), np.float32), metric.codec).nbytes
    rec = 7 + vec_bytes  # tag ∥ u16 hdr-len ∥ f32 norm ∥ packed row

    # ---- read every item record of the old layout (vectorized) ----
    all_ids: list[np.ndarray] = []
    all_rows: list[np.ndarray] = []
    scan_fixed = getattr(db, "scan_fixed", None)
    for s in range(old_n_shards):
        idx = base_index + s
        if scan_fixed is not None:
            keys_u64, rows = scan_fixed(wtxn, Prefix.item(idx), rec)
            ids = ((keys_u64 >> np.uint64(8)) & np.uint64(0xFFFFFFFF)).astype(np.uint32)
        else:
            pairs = list(db.prefix_iter(wtxn, Prefix.item(idx)))
            ids = np.asarray(
                [Key.from_bytes(k).item for k, _ in pairs], dtype=np.uint32
            )
            rows = (
                np.frombuffer(b"".join(v for _, v in pairs), dtype=np.uint8).reshape(
                    len(pairs), rec
                )
                if pairs
                else np.empty((0, rec), dtype=np.uint8)
            )
        all_ids.append(ids)
        all_rows.append(rows)
    ids = np.concatenate(all_ids) if all_ids else np.empty(0, dtype=np.uint32)
    rows = (
        np.concatenate(all_rows, axis=0)
        if all_rows
        else np.empty((0, rec), dtype=np.uint8)
    )

    # ---- drop the old layout (links, metadata, journal, items) ----
    for s in range(old_n_shards):
        database.writer(dimensions, index=base_index + s).clear()

    # ---- write the new layout: verbatim item records + journal stones ----
    stone = encode_update_status(UpdateStatus.UPDATED)
    stone_row = np.frombuffer(stone, dtype=np.uint8)
    dest = ids % np.uint32(new_n_shards)
    for t in range(new_n_shards):
        sel = np.nonzero(dest == t)[0]
        if not len(sel):
            continue
        t_idx = new_base + t
        t_ids = ids[sel]
        t_rows = np.ascontiguousarray(rows[sel])
        offs = (np.arange(len(sel) + 1, dtype=np.uint64) * rec).astype(np.uint64)
        db.put_many_raw(
            wtxn,
            keys_bytes(t_idx, NodeMode.ITEM, t_ids).tobytes(),
            t_rows.tobytes(),
            offs,
        )
        soffs = (np.arange(len(sel) + 1, dtype=np.uint64) * len(stone)).astype(np.uint64)
        db.put_many_raw(
            wtxn,
            keys_bytes(t_idx, NodeMode.UPDATED, t_ids).tobytes(),
            np.broadcast_to(stone_row, (len(sel), len(stone))).tobytes(),
            soffs,
        )

    w = ShardedWriter(
        database, dimensions, n_shards=new_n_shards, base_index=new_base,
        m=m, ef=ef, m0=m0, mesh=mesh,
    )
    if build:
        w.build(spmd=spmd, opts=opts)
    return w


class ShardedReader:
    """Opens every shard's graph from the store and serves fan-out search
    over the mesh (per-shard beam + all_gather top-k merge)."""

    def __init__(
        self,
        database: Database,
        n_shards: int,
        base_index: int = 0,
        mesh: Optional[Mesh] = None,
    ):
        self.n_shards = n_shards
        self.base_index = base_index
        self._readers = [
            Reader.open(database, base_index + s) for s in range(n_shards)
        ]
        graphs: list[HostGraph] = [r._graph for r in self._readers]
        _pad_to_common_shapes(graphs)
        self._index = ShardedIndex.from_host_graphs(
            graphs, mesh=mesh or make_mesh(n_shards)
        )

    def n_items(self) -> int:
        return sum(r.n_items() for r in self._readers)

    def dimensions(self) -> int:
        return self._readers[0].dimensions()

    def search(self, queries: np.ndarray, n: int = 10, ef_search: int = 100):
        """→ list per query of (item_id, distance), globally merged."""
        ids, dists = self._index.search(np.atleast_2d(queries), k=n, ef=max(ef_search, n))
        out = []
        for b in range(ids.shape[0]):
            row = [
                (int(i), float(d))
                for i, d in zip(ids[b], dists[b])
                if i != 0xFFFFFFFF and np.isfinite(d)
            ]
            out.append(row)
        return out

    def assert_validity(self) -> None:
        for r in self._readers:
            r.assert_validity()
