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

    def __enter__(self) -> "ShardedWriter":
        return self

    def __exit__(self, exc_type, exc, tb) -> None:
        if exc_type is None:
            self.build()
            self._database.commit_rw_txn()
        else:
            self._database.abort_rw_txn()


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
