"""The HNSW index model: host mirror + device (HBM) arrays.

This is the TPU-native replacement for the reference's LMDB-resident graph
(SURVEY §7 translation table):

* LMDB ``Node::Item`` pages → one packed vector matrix ``[N_pad, D*]`` in
  HBM plus a ``[N_pad]`` header/norm vector.
* RoaringBitmap links per (item, layer) (reference ``src/node.rs:133-174``)
  → fixed-width ``int32`` neighbor tables with sentinel ``-1``: layer 0 is
  slot-indexed ``[N_pad, M0]``; upper layers are compact ``[L, U_pad, M]``
  tables plus a per-level ``slot → row`` map (layer populations shrink
  geometrically, so dense per-slot upper tables would waste HBM).
* Item ids are arbitrary ``u32`` (tests use ``u32::MAX``); device arrays are
  indexed by dense *slots*. The host keeps ``ids[slot]``, ``id ↔ slot``
  maps and a free-slot list for deletes (reference deletes recycle LMDB
  pages; here rows).

Link distances are cached alongside ids (``dists0``/``upper_dists``) during
builds — the analogue of the reference's ``ScoredLink`` (hnsw.rs:30) kept in
``NodeState`` during construction and discarded at flush.
"""

from __future__ import annotations

import dataclasses
from functools import partial

import jax
import jax.numpy as jnp
import numpy as np

from ..ops import codecs, distances
from ..store.env import Database, RoTxn, RwTxn
from ..store.schema import Key, encode_links

INVALID_ID = np.uint32(0xFFFFFFFF)


def slot_capacity(n: int) -> int:
    """Round slot count up to bound jit recompilations as indexes grow."""
    if n <= 256:
        return 256
    cap = 256
    while cap < n:
        cap += max(256, cap // 2)
    return cap


@dataclasses.dataclass
class DeviceVecCache:
    """Device-resident vector/norm handles, reused across builds and opens.

    Vectors dominate the HBM upload (400 MB at 100k×768 f32) and never
    change during a build, yet every ``to_device`` used to re-upload them
    — and through a remote-attached chip the transfer path is
    weather-dependent (the same 400 MB measured anywhere from 0.5 s to
    15 s). The cache keeps the last uploaded handles, keyed by
    (capacity, lane width, host dtype, storage tier), and applies row-wise
    scatter updates for slots staged since the upload (``stale`` —
    populated by ``HostGraph.mark_vectors_stale``).

    Donation discipline: build programs donate the whole DeviceGraph,
    which invalidates these handles mid-build. Callers that feed a
    cache-backed DeviceGraph into donating programs must take the key via
    ``take_key`` first (leaving the cache invalid) and ``restore`` it with
    the final output graph — XLA aliases donated inputs through, so the
    output handles hold the same bytes. An aborted build then leaves the
    cache empty rather than dangling.
    """

    vectors: "jax.Array | None" = None
    norms: "jax.Array | None" = None
    key: tuple | None = None
    stale: set = dataclasses.field(default_factory=set)

    def invalidate(self) -> None:
        self.vectors = None
        self.norms = None
        self.key = None
        self.stale.clear()

    def take_key(self) -> tuple | None:
        """Detach before donating programs consume the handles."""
        key = self.key
        self.vectors = None
        self.norms = None
        self.key = None
        return key

    def restore(self, key: tuple | None, dev: "DeviceGraph") -> None:
        """Re-point at the post-donation output graph (same bytes)."""
        if key is not None:
            self.key = key
            self.vectors = dev.vectors
            self.norms = dev.norms


@dataclasses.dataclass
class HostGraph:
    """Host-side (numpy) mirror of one index's graph.

    The mutable working form used by builders and as the staging area
    between the store and HBM.
    """

    metric: distances.Metric
    dimensions: int
    m: int  # M — max links on layers > 0
    m0: int  # M0 — max links on layer 0
    ids: np.ndarray  # [N_pad] u32, INVALID_ID = free slot
    levels: np.ndarray  # [N_pad] i16, -1 = free slot
    vectors: np.ndarray  # [N_pad, D*]
    norms: np.ndarray  # [N_pad] f32
    links0: np.ndarray  # [N_pad, M0] i32 slots, -1 sentinel
    dists0: np.ndarray  # [N_pad, M0] f32, +inf sentinel
    # upper[l-1] for layer l >= 1:
    upper_links: list[np.ndarray]  # each [U_l, M] i32
    upper_dists: list[np.ndarray]  # each [U_l, M] f32
    slot_rows: list[np.ndarray]  # each [N_pad] i32: slot -> row, -1 absent
    upper_row_count: list[int]  # rows allocated so far per upper layer
    entry_slots: list[int]
    max_level: int
    id_to_slot: dict[int, int] = dataclasses.field(default_factory=dict)
    free_slots: list[int] = dataclasses.field(default_factory=list)
    next_fresh: int = 0  # first never-allocated slot
    #: device vector/norm cache, auto-attached by ``to_device`` (the host
    #: graph is itself cached per (index, generation) by the API layer, so
    #: the handles survive across builds and reader opens)
    dev_cache: "DeviceVecCache | None" = None

    # -- construction ------------------------------------------------------
    @classmethod
    def empty(
        cls,
        metric: distances.Metric,
        dimensions: int,
        m: int,
        m0: int,
        capacity: int = 256,
    ) -> "HostGraph":
        d_star = (
            codecs.n_lanes(dimensions, metric.codec)
            if metric.is_packed
            else dimensions
        )
        vec_dtype = np.uint32 if metric.is_packed else np.float32
        return cls(
            metric=metric,
            dimensions=dimensions,
            m=m,
            m0=m0,
            ids=np.full(capacity, INVALID_ID, dtype=np.uint32),
            levels=np.full(capacity, -1, dtype=np.int16),
            vectors=np.zeros((capacity, d_star), dtype=vec_dtype),
            norms=np.zeros(capacity, dtype=np.float32),
            links0=np.full((capacity, m0), -1, dtype=np.int32),
            dists0=np.full((capacity, m0), np.inf, dtype=np.float32),
            upper_links=[],
            upper_dists=[],
            slot_rows=[],
            upper_row_count=[],
            entry_slots=[],
            max_level=0,
        )

    @property
    def capacity(self) -> int:
        return self.ids.shape[0]

    @property
    def n_items(self) -> int:
        return int((self.levels >= 0).sum())

    def valid_mask(self) -> np.ndarray:
        return self.levels >= 0

    def mark_vectors_stale(self, slots) -> None:
        """Record host-side vector/norm writes so the device cache can
        scatter-update just these rows on the next ``to_device``. Callers
        that write ``g.vectors`` / ``g.norms`` after a ``to_device`` MUST
        call this (the staging paths in api.py / sharded.py do)."""
        if self.dev_cache is not None and self.dev_cache.key is not None:
            arr = np.atleast_1d(np.asarray(slots)).ravel()
            self.dev_cache.stale.update(int(s) for s in arr)

    def reset_links(self) -> None:
        """Drop all link state, keeping staged items — the next build
        relinks every live item (``force_rebuild`` analogue,
        writer.rs:610-638). The device vector cache survives: vectors are
        untouched, which is what makes a rebuild cheaper than a cold
        build on remote-attached chips."""
        self.links0.fill(-1)
        self.dists0.fill(np.inf)
        self.upper_links = []
        self.upper_dists = []
        self.slot_rows = []
        self.upper_row_count = []
        self.entry_slots = []
        self.max_level = 0
        self.levels[self.levels >= 0] = 0

    # -- slot management ---------------------------------------------------
    def grow(self, min_capacity: int) -> None:
        new_cap = slot_capacity(min_capacity)
        if new_cap <= self.capacity:
            return
        extra = new_cap - self.capacity

        def pad(a: np.ndarray, fill) -> np.ndarray:
            shape = (extra,) + a.shape[1:]
            return np.concatenate([a, np.full(shape, fill, dtype=a.dtype)], axis=0)

        self.ids = pad(self.ids, INVALID_ID)
        self.levels = pad(self.levels, -1)
        self.vectors = pad(self.vectors, 0)
        self.norms = pad(self.norms, 0.0)
        self.links0 = pad(self.links0, -1)
        self.dists0 = pad(self.dists0, np.inf)
        self.slot_rows = [pad(sr, -1) for sr in self.slot_rows]
        if self.dev_cache is not None:
            self.dev_cache.invalidate()  # capacity key changed anyway

    def alloc_slot(self, item_id: int) -> int:
        existing = self.id_to_slot.get(item_id)
        if existing is not None:
            return existing
        if self.free_slots:
            slot = self.free_slots.pop()
        else:
            if self.next_fresh >= self.capacity:
                self.grow(self.capacity + 1)
            slot = self.next_fresh
            self.next_fresh += 1
        self.ids[slot] = item_id
        self.id_to_slot[item_id] = slot
        # allocations precede vector writes everywhere (api staging, the
        # sharded/host builders, tests) — marking here keeps the device
        # vector cache safe even for writers that bypass the api staging
        self.mark_vectors_stale(slot)
        return slot

    def release_slot(self, slot: int) -> None:
        item_id = int(self.ids[slot])
        self.id_to_slot.pop(item_id, None)
        self.ids[slot] = INVALID_ID
        self.levels[slot] = -1
        self.links0[slot] = -1
        self.dists0[slot] = np.inf
        for l in range(len(self.slot_rows)):
            row = self.slot_rows[l][slot]
            if row >= 0:
                self.upper_links[l][row] = -1
                self.upper_dists[l][row] = np.inf
                self.slot_rows[l][slot] = -1
        self.free_slots.append(slot)

    def ensure_layers(self, max_level: int, upper_capacity: list[int] | None = None) -> None:
        """Make sure compact tables exist for layers 1..max_level."""
        while len(self.upper_links) < max_level:
            l = len(self.upper_links)
            cap = upper_capacity[l] if upper_capacity and l < len(upper_capacity) else 64
            self.upper_links.append(np.full((cap, self.m), -1, dtype=np.int32))
            self.upper_dists.append(np.full((cap, self.m), np.inf, dtype=np.float32))
            self.slot_rows.append(np.full(self.capacity, -1, dtype=np.int32))
            self.upper_row_count.append(0)

    def upper_row(self, level: int, slot: int) -> int:
        """Row index of ``slot`` in layer ``level`` (>=1), allocating if new."""
        l = level - 1
        self.ensure_layers(level)
        row = int(self.slot_rows[l][slot])
        if row >= 0:
            return row
        row = self.upper_row_count[l]
        if row >= self.upper_links[l].shape[0]:
            extra = max(64, self.upper_links[l].shape[0] // 2)
            self.upper_links[l] = np.concatenate(
                [self.upper_links[l], np.full((extra, self.m), -1, dtype=np.int32)]
            )
            self.upper_dists[l] = np.concatenate(
                [self.upper_dists[l], np.full((extra, self.m), np.inf, dtype=np.float32)]
            )
        self.upper_links[l][row] = -1
        self.upper_dists[l][row] = np.inf
        self.slot_rows[l][slot] = row
        self.upper_row_count[l] = row + 1
        return row

    def links_of(self, slot: int, level: int) -> np.ndarray:
        if level == 0:
            row = self.links0[slot]
        else:
            r = self.slot_rows[level - 1][slot] if level - 1 < len(self.slot_rows) else -1
            if r < 0:
                return np.empty(0, dtype=np.int32)
            row = self.upper_links[level - 1][r]
        return row[row >= 0]

    def set_links(self, slot: int, level: int, link_slots: np.ndarray, link_dists: np.ndarray) -> None:
        cap = self.m0 if level == 0 else self.m
        k = min(len(link_slots), cap)
        if level == 0:
            self.links0[slot] = -1
            self.dists0[slot] = np.inf
            self.links0[slot, :k] = link_slots[:k]
            self.dists0[slot, :k] = link_dists[:k]
        else:
            row = self.upper_row(level, slot)
            self.upper_links[level - 1][row] = -1
            self.upper_dists[level - 1][row] = np.inf
            self.upper_links[level - 1][row, :k] = link_slots[:k]
            self.upper_dists[level - 1][row, :k] = link_dists[:k]

    def permute(self, perm: np.ndarray) -> None:
        """Renumber slots: new slot ``i`` takes old slot ``perm[i]``.

        ``perm`` must be a bijection over the full capacity. Purely an
        in-memory layout change — the store is item-id-keyed (8-byte keys,
        schema.py), so persisted data is unaffected; the point is HBM
        locality (the bulk builder renumbers by cluster so neighboring
        rows are adjacent, build/bulk.py). Link *values* are slots and are
        remapped through the inverse; upper-table row numbers are not
        slots and keep their order (only ``slot_rows`` re-indexes).
        """
        perm = np.asarray(perm, dtype=np.int64)
        assert perm.shape[0] == self.capacity
        inv = np.empty_like(perm)
        inv[perm] = np.arange(self.capacity, dtype=np.int64)

        def remap_vals(table: np.ndarray) -> np.ndarray:
            return np.where(table >= 0, inv[np.maximum(table, 0)], -1).astype(table.dtype)

        self.permute_host_only(perm, inv)
        self.links0 = remap_vals(self.links0)[perm]
        self.dists0 = self.dists0[perm]
        for l in range(len(self.upper_links)):
            self.upper_links[l] = remap_vals(self.upper_links[l])

    def permute_host_only(self, perm: np.ndarray, inv: np.ndarray) -> None:
        """The host-exclusive half of ``permute`` — everything except the
        link tables. Builders that already renumbered the device-resident
        tables (``permute_device``) call this before ``from_device`` pulls
        the permuted links back, so the big link gathers never run on the
        host."""
        self.ids = self.ids[perm]
        self.levels = self.levels[perm]
        self.vectors = self.vectors[perm]
        self.norms = self.norms[perm]
        if self.dev_cache is not None:
            self.dev_cache.invalidate()  # slot order changed
        for l in range(len(self.slot_rows)):
            self.slot_rows[l] = self.slot_rows[l][perm]
        self.entry_slots = [int(inv[e]) for e in self.entry_slots]
        self.id_to_slot = {
            int(self.ids[s]): int(s)
            for s in np.nonzero(self.ids != INVALID_ID)[0]
        }
        self.free_slots = np.nonzero(self.ids == INVALID_ID)[0].tolist()
        self.next_fresh = self.capacity

    # -- store I/O ---------------------------------------------------------
    @classmethod
    def load(
        cls,
        db: Database,
        txn: RoTxn,
        index: int,
        metric: distances.Metric,
        metadata,
    ) -> "HostGraph":
        """Reconstruct the graph mirror from the store (the Reader::open /
        Writer-incremental load path).

        Persisted link rows carry only neighbor ids (like the reference's
        RoaringBitmaps); cached link distances are restored lazily on
        device via ``wave_ops.fill_link_dists``.
        """
        import struct as _struct

        from ..store.schema import Key as _Key
        from ..store.schema import Prefix as _Prefix
        from ..store.schema import decode_item as _decode_item
        from ..store.schema import decode_links as _decode_links

        n = len(metadata.items)
        g = cls.empty(
            metric,
            metadata.dimensions,
            metadata.m,
            metadata.m0,
            capacity=slot_capacity(max(n, 1)),
        )
        if hasattr(db, "bulk_rows") and n and not getattr(txn, "overlay", None):
            # native store, clean snapshot: one C call stages every item's
            # header+vector (value layout: tag u8 ∥ hlen u16 ∥ f32 norm ∥
            # vector bytes). Dirty write txns fall through to the row loop —
            # bulk_rows reads the committed generation only.
            codec = metric.codec
            vec_bytes = (
                metadata.dimensions * 4
                if codec == codecs.F32
                else codecs.padded_dim(metadata.dimensions, codec) // 8
            )
            keys, rows = db.bulk_rows(
                txn, _Prefix.item(index), skip=3, row_bytes=4 + vec_bytes, cap=n
            )
            items = (keys & 0xFFFFFFFF00) >> 8  # u64 key → item field
            for item in items:
                g.alloc_slot(int(item))
            g.norms[: len(keys)] = rows[:, :4].copy().view("<f4")[:, 0]
            vecs = rows[:, 4:]
            if codec == codecs.F32:
                g.vectors[: len(keys)] = vecs.copy().view("<f4")
            else:
                g.vectors[: len(keys)] = vecs.copy().view("<u4")
            g.levels[: len(keys)] = 0
        else:
            for key, val in db.prefix_iter(txn, _Prefix.item(index)):
                item = _Key.from_bytes(key).item
                header, vecb = _decode_item(val)
                s = g.alloc_slot(item)
                g.vectors[s] = codecs.vector_from_bytes(vecb, metric.codec)
                g.norms[s] = _struct.unpack("<f", header)[0]
                g.levels[s] = 0
        g.max_level = metadata.max_level
        g.ensure_layers(g.max_level)
        # Two passes over links rows. A links row whose owner has no item
        # record belongs to a deleted-but-not-yet-rebuilt item (del_item
        # removes the record immediately; its links persist until the next
        # build so the FreshDiskANN repair can splice through them —
        # reference writer.rs:577-580). Such owners get *ghost* slots
        # (zero vector) so survivor rows keep their edges intact and the
        # builder's deletion repair sees the full graph.
        raw_rows: list[tuple[int, int, np.ndarray]] = []
        for key, val in db.prefix_iter(txn, _Prefix.links(index)):
            k = _Key.from_bytes(key)
            ids = _decode_links(val).to_array()
            raw_rows.append((k.item, k.layer, ids))
            if k.item not in g.id_to_slot:
                s = g.alloc_slot(k.item)
                g.levels[s] = 0  # raised as its rows are applied below
        # Vectorized id → slot mapping + batched layer-0 fill: one sorted
        # table + one np.searchsorted over every link of the layer instead
        # of a Python dict probe per link (10M rows × M0 links is 100M+
        # lookups — a per-record loop the reference never pays because
        # LMDB hands it ready B-tree pages). Upper layers are ~1/M of the
        # rows and keep the simple per-row path.
        known_ids = np.fromiter(g.id_to_slot.keys(), dtype=np.int64, count=len(g.id_to_slot))
        known_slots = np.fromiter(g.id_to_slot.values(), dtype=np.int32, count=len(g.id_to_slot))
        order = np.argsort(known_ids)
        known_ids, known_slots = known_ids[order], known_slots[order]

        def map_ids(ids64: np.ndarray) -> tuple[np.ndarray, np.ndarray]:
            """→ (slots for the hits, hit mask) — missing ids dropped."""
            pos = np.searchsorted(known_ids, ids64)
            pos_ok = pos < len(known_ids)
            hit = np.zeros(len(ids64), dtype=bool)
            hit[pos_ok] = known_ids[pos[pos_ok]] == ids64[pos_ok]
            return known_slots[pos[hit]], hit

        l0 = [(item, ids) for item, layer, ids in raw_rows if layer == 0]
        if l0:
            owners = np.asarray([g.id_to_slot[item] for item, _ in l0], dtype=np.int64)
            lens = np.asarray([len(ids) for _, ids in l0], dtype=np.int64)
            flat = (
                np.concatenate([ids for _, ids in l0]).astype(np.int64)
                if lens.sum()
                else np.empty(0, dtype=np.int64)
            )
            slots_flat, hit = map_ids(flat)
            row_of = np.repeat(np.arange(len(l0)), lens)[hit]
            # rank within each row after dropping misses
            rank = np.zeros(len(row_of), dtype=np.int64)
            if len(row_of):
                first = np.concatenate([[True], row_of[1:] != row_of[:-1]])
                idx = np.arange(len(row_of))
                starts = np.maximum.accumulate(np.where(first, idx, 0))
                rank = idx - starts
            keep = rank < g.m0
            g.links0[owners, :] = -1
            g.dists0[owners, :] = np.inf
            g.links0[owners[row_of[keep]], rank[keep]] = slots_flat[keep]
            g.dists0[owners[row_of[keep]], rank[keep]] = np.nan
        for item, layer, ids in raw_rows:
            slot = g.id_to_slot[item]
            g.levels[slot] = max(g.levels[slot], layer)
            if layer == 0:
                continue  # bulk-filled above
            link_slots, _ = map_ids(ids.astype(np.int64))
            # NaN marks "distance unknown, recompute on device"
            g.set_links(
                slot, layer, link_slots, np.full(len(link_slots), np.nan, dtype=np.float32)
            )
        g.entry_slots = [
            g.id_to_slot[e] for e in metadata.entry_points if e in g.id_to_slot
        ]
        return g

    def flush_links(
        self, db: Database, wtxn: RwTxn, index: int, slots=None, chunk: int = 8192
    ) -> None:
        """Persist link rows to the store (reference's single-threaded
        flush, hnsw.rs:192-213: layers → LMDB puts).

        ``slots``: rows to flush — builds pass the touched set
        (``BuildStats.touched``) so an incremental 10-item build into a
        1M-item index issues O(10·M) puts, not O(1M) (the reference flushes
        only nodes in its in-progress maps). ``None`` flushes every valid
        slot (fresh-build / conversion semantics).

        Writes one links row per (item, layer<=level) — including empty
        rows, matching the reference where every inserted node gets a
        ``NodeState`` even if no links were added (hnsw.rs:419-424).

        On the real backends the rows are assembled with the vectorized
        schema codecs (``keys_bytes``/``links_payload``, byte-identical
        to the per-record codecs) and written via one ``put_many_raw``
        per level batch — a fresh 10M flush runs no per-row Python."""
        if slots is None:
            slots = np.nonzero(self.valid_mask())[0]
        slots = np.asarray(slots, dtype=np.int64)
        slots = slots[self.levels[slots] >= 0]  # released since touched
        put_raw = getattr(db, "put_many_raw", None)
        if put_raw is not None and len(slots):
            from ..store.schema import NodeMode, keys_bytes, links_payload

            lvls = self.levels[slots]
            max_lvl = int(lvls.max())
            for level in range(max_lvl + 1):
                sl = slots[lvls >= level]
                if level == 0:
                    table = self.links0[sl]
                else:
                    rows = self.slot_rows[level - 1][sl]
                    table = self.upper_links[level - 1][np.maximum(rows, 0)]
                    table = np.where((rows >= 0)[:, None], table, -1)
                link_ids = np.where(
                    table >= 0,
                    self.ids[np.maximum(table, 0)].astype(np.int64),
                    np.int64(-1),
                )
                for start in range(0, len(sl), 262144):
                    part = slice(start, start + 262144)
                    keys = keys_bytes(
                        index, NodeMode.LINKS,
                        self.ids[sl[part]].astype(np.uint32), layer=level,
                    )
                    vbuf, offs = links_payload(link_ids[part])
                    put_raw(wtxn, keys.tobytes(), vbuf, offs)
            return
        # minimal Database protocol (tests' counting shims)
        keys: list[bytes] = []
        vals: list[bytes] = []
        put_many = getattr(db, "put_many", None)
        for slot in slots:
            item_id = int(self.ids[slot])
            for level in range(int(self.levels[slot]) + 1):
                link_slots = self.links_of(int(slot), level)
                link_ids = self.ids[link_slots].astype(np.uint32)
                keys.append(Key.links(index, item_id, level).to_bytes())
                vals.append(encode_links(link_ids))
                if put_many is not None and len(keys) >= chunk:
                    put_many(wtxn, keys, vals)
                    keys, vals = [], []
        if put_many is not None:
            put_many(wtxn, keys, vals)
        else:
            for k, v in zip(keys, vals):
                db.put(wtxn, k, v)

    # -- invariants --------------------------------------------------------
    def check_validity(self) -> None:
        """Graph invariant checker (reference ``assert_validity``,
        reader.rs:905-948): links point only at live slots; every item has
        a links row at each of its layers; entry slots are live; upper-layer
        membership is consistent with sampled levels."""
        valid = self.valid_mask()
        live = set(np.nonzero(valid)[0].tolist())
        for slot in live:
            lvl = int(self.levels[slot])
            for level in range(lvl + 1):
                for nb in self.links_of(slot, level):
                    assert int(nb) in live, f"slot {slot} level {level} links dead slot {nb}"
                    nb_lvl = int(self.levels[int(nb)])
                    assert nb_lvl >= level, f"slot {slot} links {nb} below its level"
        for ep in self.entry_slots:
            assert ep in live, f"entry slot {ep} is dead"
            assert int(self.levels[ep]) >= self.max_level, "entry point below top layer"
        for l, rows in enumerate(self.slot_rows):
            for slot in np.nonzero(rows >= 0)[0]:
                assert valid[slot], f"dead slot {slot} still owns a layer-{l + 1} row"
        if live:
            assert self.entry_slots, "non-empty graph must have entry points"


# --------------------------------------------------------------------------
# Device form
# --------------------------------------------------------------------------


@jax.tree_util.register_pytree_node_class
@dataclasses.dataclass
class DeviceGraph:
    """HBM-resident search state. A pytree of jnp arrays plus static meta.

    ``upper_links``/``upper_dists`` are stacked ``[L, U_pad, M]``;
    ``slot_rows`` is ``[L, N_pad]``. ``L == 0`` (flat graph) uses zero-size
    leading dims.
    """

    vectors: jax.Array
    norms: jax.Array
    links0: jax.Array
    dists0: jax.Array
    upper_links: jax.Array
    upper_dists: jax.Array
    slot_rows: jax.Array
    entry_slots: jax.Array  # [E_pad] i32, -1 padded
    valid: jax.Array  # [N_pad] bool
    # static:
    metric_name: str = dataclasses.field(metadata={"static": True})
    max_level: int = dataclasses.field(metadata={"static": True})

    def tree_flatten(self):
        children = (
            self.vectors,
            self.norms,
            self.links0,
            self.dists0,
            self.upper_links,
            self.upper_dists,
            self.slot_rows,
            self.entry_slots,
            self.valid,
        )
        return children, (self.metric_name, self.max_level)

    @classmethod
    def tree_unflatten(cls, aux, children):
        return cls(*children, metric_name=aux[0], max_level=aux[1])

    @property
    def metric(self) -> distances.Metric:
        return distances.by_name(self.metric_name)

    @property
    def capacity(self) -> int:
        return self.vectors.shape[0]

    @property
    def m0(self) -> int:
        return self.links0.shape[1]


def ep_pad(n: int) -> int:
    """Entry-point array width for ``n`` entry points: power-of-two padded
    so jit shapes stay bucketed while never truncating seeds — a flat
    (max_level=0) index keeps *every* top-layer item as an entry point
    (reference hnsw.rs:278-287) and dropping any silently degrades recall."""
    p = 32
    while p < n:
        p *= 2
    return p


def to_device(
    g: HostGraph, max_entry_points: int | None = None, link_slack: int = 0,
    cache: bool = True, serve_only: bool = False,
) -> DeviceGraph:
    """Upload a host graph into HBM arrays (the Reader::open / prefetch
    analogue — reference reader.rs:446-543 madvises pages; we materialise
    the whole index in HBM).

    ``link_slack``: extra layer-0 link columns for build-time overflow
    deferral (see wave_ops.prune_slack_rows) — the physical table becomes
    ``[N_pad, M0 + slack]``; host rows land in the first M0 columns.

    ``cache``: reuse / populate the graph's ``DeviceVecCache`` so repeat
    uploads skip the dominant vector transfer (False for transient
    uploads, e.g. per-shard staging that immediately restacks — holding
    those handles would just pin HBM). Env kill-switch:
    HANNOY_TPU_DEV_CACHE=0.

    HBM storage tiers (the single-chip capacity story — the reference
    serves datasets ≫ RAM via LMDB paging, reader.rs:446-543; here the
    index must fit HBM, so smaller dtypes raise the ceiling):

    * HANNOY_TPU_BF16=1 — bfloat16 rows, 2× capacity, recall unchanged
      (measured at 100k: 0.979 vs 0.976). Any f32 metric.
    * HANNOY_TPU_INT8=1 — int8 rows, 4× capacity, any f32 metric. Cosine
      stores ``round(127·v/|v|)`` with the constant 127 folded into the
      norm header (the scale cancels in cos, so formulas are unchanged);
      euclidean/manhattan store ``round(127·v/max|v_i|)`` with the true
      per-row scale ``max|v_i|/127`` in the header (the reference's unused
      ``bias`` slot, euclidean.rs:30-49) and dequantize after each gather
      (``distances._deq``). ~16 GB HBM holds ~5M×768d f32, ~10M bf16,
      ~20M int8 (links0 at M0=32 adds 128 B/row).

    The host/store copy stays f32, so persisted data is unaffected.
    """
    if max_entry_points is None:
        max_entry_points = ep_pad(len(g.entry_slots))
    n_layers = len(g.upper_links)
    if n_layers:
        u_pad = max(a.shape[0] for a in g.upper_links)
        up = np.full((n_layers, u_pad, g.m), -1, dtype=np.int32)
        ud = np.full((n_layers, u_pad, g.m), np.inf, dtype=np.float32)
        sr = np.full((n_layers, g.capacity), -1, dtype=np.int32)
        for l in range(n_layers):
            a = g.upper_links[l]
            up[l, : a.shape[0]] = a
            ud[l, : a.shape[0]] = g.upper_dists[l]
            sr[l] = g.slot_rows[l]
    else:
        up = np.zeros((0, 1, g.m), dtype=np.int32)
        ud = np.zeros((0, 1, g.m), dtype=np.float32)
        sr = np.zeros((0, g.capacity), dtype=np.int32)
    eps = np.full(max_entry_points, -1, dtype=np.int32)
    k = min(len(g.entry_slots), max_entry_points)
    eps[:k] = np.asarray(g.entry_slots[:k], dtype=np.int32)
    import os as _os

    if not g.metric.is_packed and _os.environ.get("HANNOY_TPU_INT8") == "1":
        tier = "int8"
    elif not g.metric.is_packed and _os.environ.get("HANNOY_TPU_BF16") == "1":
        tier = "bf16"
    else:
        tier = "raw"

    def encode(vecs: np.ndarray, norms_host: np.ndarray):
        """Host rows → (device vectors, device norms) for the tier."""
        if tier == "int8" and g.metric.name == "cosine":
            mags = np.linalg.norm(vecs, axis=-1, keepdims=True)
            unit = np.divide(vecs, mags, out=np.zeros_like(vecs), where=mags > 1e-30)
            v = jnp.asarray(np.clip(np.rint(127.0 * unit), -127, 127).astype(np.int8))
            # norm header: |stored| = 127 for live rows (0 rows keep 0 so
            # the cosine eps guard still returns distance 0.0,
            # cosine.rs:40-56)
            n = jnp.asarray(
                np.where(mags[:, 0] > 1e-30, np.float32(127.0), np.float32(0.0))
            )
        elif tier == "int8":
            # euclidean/manhattan: per-row max-abs scale in the norm header
            # (cosine's unit trick generalizes with one extra f32 — the
            # header slot was the reference's unused ``bias``,
            # euclidean.rs:30-49). Stored row = round(127·v/s); every
            # distance path dequantizes via ``distances._deq``.
            mags = np.abs(vecs).max(axis=-1, keepdims=True)
            scaled = np.divide(
                vecs, mags, out=np.zeros_like(vecs), where=mags > 1e-30
            )
            v = jnp.asarray(np.clip(np.rint(127.0 * scaled), -127, 127).astype(np.int8))
            n = jnp.asarray(
                np.where(mags[:, 0] > 1e-30, mags[:, 0] / np.float32(127.0), 0.0).astype(
                    np.float32
                )
            )
        elif tier == "bf16":
            v = jnp.asarray(vecs).astype(jnp.bfloat16)
            n = jnp.asarray(norms_host)
        else:
            v = jnp.asarray(vecs)
            n = jnp.asarray(norms_host)
        return v, n

    use_cache = cache and _os.environ.get("HANNOY_TPU_DEV_CACHE", "1") == "1"
    cache = g.dev_cache
    if cache is None and use_cache:
        cache = g.dev_cache = DeviceVecCache()
    elif not use_cache:
        cache = None
    cache_key = (g.capacity, g.vectors.shape[-1], str(g.vectors.dtype), tier)
    if cache is not None and cache.key == cache_key and cache.vectors is not None:
        if cache.stale:
            rows = np.fromiter(cache.stale, dtype=np.int64)
            rows.sort()
            v_rows, n_rows = encode(g.vectors[rows], g.norms[rows])
            idx = jnp.asarray(rows.astype(np.int32))
            cache.vectors = cache.vectors.at[idx].set(v_rows)
            cache.norms = cache.norms.at[idx].set(n_rows)
            cache.stale.clear()
        vectors_dev, norms_dev = cache.vectors, cache.norms
    else:
        vectors_dev, norms_dev = encode(g.vectors, g.norms)
        if cache is not None:
            cache.key = cache_key
            cache.vectors = vectors_dev
            cache.norms = norms_dev
            cache.stale.clear()
    links0_h, dists0_h = g.links0, g.dists0
    if link_slack:
        links0_h = np.concatenate(
            [links0_h, np.full((g.capacity, link_slack), -1, dtype=np.int32)], axis=1
        )
        dists0_h = np.concatenate(
            [dists0_h, np.full((g.capacity, link_slack), np.inf, dtype=np.float32)], axis=1
        )
    if serve_only:
        # Search never reads link distances: the beam ranks neighbors by
        # freshly computed query distances; dists0/upper_dists exist only
        # for the builders' prune/merge. Readers upload placeholders —
        # at the 10M×768 8-shard serving config that returns ~2 GB of HBM
        # (the >1-chip-HBM story, arroy_hannoy.md:21 parity run).
        dists0_dev = jnp.zeros((1, 1), dtype=jnp.float32)
        ud_dev = jnp.zeros((1, 1, 1), dtype=jnp.float32)
    else:
        dists0_dev = jnp.asarray(dists0_h)
        ud_dev = jnp.asarray(ud)
    return DeviceGraph(
        vectors=vectors_dev,
        norms=norms_dev,
        links0=jnp.asarray(links0_h),
        dists0=dists0_dev,
        upper_links=jnp.asarray(up),
        upper_dists=ud_dev,
        slot_rows=jnp.asarray(sr),
        entry_slots=jnp.asarray(eps),
        valid=jnp.asarray(g.valid_mask()),
        metric_name=g.metric.name,
        max_level=g.max_level,
    )


@partial(jax.jit, donate_argnums=(0,))
def permute_device(dev: DeviceGraph, perm: jax.Array, inv: jax.Array) -> DeviceGraph:
    """Renumber slots of the HBM-resident graph: new slot ``i`` takes old
    slot ``perm[i]``; link *values* (slots) are remapped through ``inv``.

    The device twin of ``HostGraph.permute`` minus the host-only state —
    HBM gathers run at stream bandwidth, so the bulk builder renumbers
    here and lets ``from_device`` pull back already-permuted link tables
    (the host permutes only its host-exclusive arrays,
    ``permute_host_only``). Upper-table row numbers are not slots and
    keep their order; only ``slot_rows`` re-indexes.
    """

    def remap(t: jax.Array) -> jax.Array:
        return jnp.where(t >= 0, inv[jnp.maximum(t, 0)].astype(t.dtype), t.dtype.type(-1))

    return DeviceGraph(
        vectors=dev.vectors[perm],
        norms=dev.norms[perm],
        links0=remap(dev.links0)[perm],
        dists0=dev.dists0[perm],
        upper_links=remap(dev.upper_links),
        upper_dists=dev.upper_dists,
        slot_rows=dev.slot_rows[:, perm],
        entry_slots=remap(dev.entry_slots),
        valid=dev.valid[perm],
        metric_name=dev.metric_name,
        max_level=dev.max_level,
    )


import os as _os2

_SYNC_BF16 = _os2.environ.get("HANNOY_TPU_SYNC_BF16", "1") == "1"


@jax.jit
def _bf16_cast(x: jax.Array) -> jax.Array:
    return x.astype(jnp.bfloat16)


def from_device(g: HostGraph, dev: DeviceGraph) -> None:
    """Download mutated link arrays from HBM back into the host mirror
    (builders donate arrays to device waves and sync back before flush).

    A slack-widened device table is sliced back to M0 — callers must have
    reduced rows to <= M0 live links first (wave_ops.prune_slack_rows);
    rows are distance-sorted so live entries occupy the leading columns."""
    from ..utils.tracing import span

    with span("from_device_links", bytes=int(dev.links0.shape[0]) * g.m0 * 4):
        g.links0 = np.array(dev.links0[:, : g.m0])  # copy: host code mutates these
    with span("from_device_dists", bytes=int(dev.dists0.shape[0]) * g.m0 * 2):
        # The store persists link ids only (schema.encode_links); host-side
        # dists exist to seed the next build's device upload, where they
        # feed merge thresholds against freshly computed HIGHEST-precision
        # distances. Downloading through the axon tunnel runs at
        # ~15-30 MB/s (round-5 measurement), so the cached dists ride down
        # as bf16 (monotone rounding — ascending rows stay ascending, only
        # near-ties can flip a later merge decision, the same tolerance
        # BULK_BF16 documents). HANNOY_TPU_SYNC_BF16=0 restores f32.
        if _SYNC_BF16:
            g.dists0 = np.asarray(
                jax.device_get(_bf16_cast(dev.dists0[:, : g.m0]))
            ).astype(np.float32)
        else:
            g.dists0 = np.array(dev.dists0[:, : g.m0])
    with span("from_device_upper"):
        up = np.asarray(dev.upper_links)
        ud = np.asarray(dev.upper_dists)
    for l in range(up.shape[0]):
        rows = g.upper_links[l].shape[0]
        g.upper_links[l] = up[l, :rows].copy()
        g.upper_dists[l] = ud[l, :rows].copy()
