"""Key/value schema for the host store.

Mirrors the reference's LMDB schema so the on-host persistence layer has the
same addressing model:

* 8-byte keys ``u16 index ∥ u8 mode ∥ u32 item ∥ u8 layer``, big-endian so
  lexicographic byte order equals logical order and prefix scans work
  (reference ``src/key.rs:19-82``).
* ``NodeMode`` discriminants are DB-format-stable: Metadata=0, Updated=1,
  Links=2, Item=3 (reference ``src/node_id.rs:8-21``). Layer sorts *after*
  item so a node's vector and its per-layer links are adjacent
  (``src/node_id.rs:43-45``).
* Values are tagged unions: tag 0 → Item{header, vector-bytes}, tag 1 →
  Links{id set} (reference ``src/node.rs:21-22,133-174``).
* Per-index singleton metadata record (``src/metadata.rs:12-73``) and
  version stamp under metadata-mode items 0 and 1
  (``src/node_id.rs:55-73``).
* Update journal "stones": Updated=0 / Removed=1 under Updated-mode keys
  (``src/update_status.rs:6-33``).
"""

from __future__ import annotations

import enum
import struct
from dataclasses import dataclass

import numpy as np

from ..utils.idset import IdSet
from ..version import Version

KEY_SIZE = 8
_KEY_FMT = ">HBIB"  # index u16, mode u8, item u32, layer u8 — big-endian


class NodeMode(enum.IntEnum):
    """DB-format-stable discriminants (reference src/node_id.rs:8-21)."""

    METADATA = 0
    UPDATED = 1
    LINKS = 2
    ITEM = 3


class UpdateStatus(enum.IntEnum):
    """Journal stone payloads (reference src/update_status.rs:6-33)."""

    UPDATED = 0
    REMOVED = 1


@dataclass(frozen=True, order=True)
class Key:
    """An 8-byte store key. Ordering == serialized byte ordering."""

    index: int
    mode: NodeMode
    item: int
    layer: int = 0

    def to_bytes(self) -> bytes:
        return struct.pack(_KEY_FMT, self.index, int(self.mode), self.item, self.layer)

    @classmethod
    def from_bytes(cls, data: bytes) -> "Key":
        index, mode, item, layer = struct.unpack(_KEY_FMT, data)
        return cls(index, NodeMode(mode), item, layer)

    # Constructors mirroring reference src/node_id.rs:55-73 / src/key.rs:19-49
    @classmethod
    def metadata(cls, index: int) -> "Key":
        return cls(index, NodeMode.METADATA, 0, 0)

    @classmethod
    def version(cls, index: int) -> "Key":
        return cls(index, NodeMode.METADATA, 1, 0)

    @classmethod
    def updated(cls, index: int, item: int) -> "Key":
        return cls(index, NodeMode.UPDATED, item, 0)

    @classmethod
    def links(cls, index: int, item: int, layer: int) -> "Key":
        return cls(index, NodeMode.LINKS, item, layer)

    @classmethod
    def item(cls, index: int, item: int) -> "Key":
        return cls(index, NodeMode.ITEM, item, 0)


class Prefix:
    """Range-scan prefixes (reference src/key.rs:86-127)."""

    @staticmethod
    def all(index: int) -> bytes:
        return struct.pack(">H", index)

    @staticmethod
    def updated(index: int) -> bytes:
        return struct.pack(">HB", index, int(NodeMode.UPDATED))

    @staticmethod
    def links(index: int) -> bytes:
        return struct.pack(">HB", index, int(NodeMode.LINKS))

    @staticmethod
    def item(index: int) -> bytes:
        return struct.pack(">HB", index, int(NodeMode.ITEM))


# --------------------------------------------------------------------------
# Node payload codecs (reference src/node.rs:133-174)
# --------------------------------------------------------------------------

_TAG_ITEM = 0
_TAG_LINKS = 1


def encode_item(header: bytes, vector_bytes: bytes) -> bytes:
    """Item payload: tag 0 ∥ u16 header length ∥ header ∥ raw vector bytes."""
    return struct.pack(">BH", _TAG_ITEM, len(header)) + header + vector_bytes


def decode_item(data: bytes) -> tuple[bytes, bytes]:
    tag, hlen = struct.unpack_from(">BH", data, 0)
    if tag != _TAG_ITEM:
        raise ValueError(f"expected item payload, found tag {tag}")
    header = data[3 : 3 + hlen]
    vector = data[3 + hlen :]
    return header, vector


_TAG_LINKS_RAW = 2


def encode_links(ids: np.ndarray | IdSet) -> bytes:
    """Links payload: tag 2 ∥ raw sorted little-endian u32 ids.

    Neighbor lists are <= M0 arbitrary u32s — run-length coding (the
    roaring analogue used for the dense metadata items set) buys nothing
    there, and builds write one row per (item, layer), so this is the
    store's hottest encoder."""
    if isinstance(ids, IdSet):
        arr = ids.to_array()
    else:
        arr = np.sort(np.asarray(ids, dtype=np.uint32))
    return struct.pack(">B", _TAG_LINKS_RAW) + arr.astype("<u4").tobytes()


def decode_links(data: bytes) -> IdSet:
    (tag,) = struct.unpack_from(">B", data, 0)
    if tag == _TAG_LINKS_RAW:
        arr = np.frombuffer(data, dtype="<u4", offset=1).astype(np.uint32)
        return IdSet._wrap(arr)  # already sorted unique
    if tag != _TAG_LINKS:
        raise ValueError(f"expected links payload, found tag {tag}")
    return IdSet.from_bytes(data[1:])


def payload_tag(data: bytes) -> int:
    return data[0]


# --------------------------------------------------------------------------
# Metadata codec (reference src/metadata.rs:12-73)
# --------------------------------------------------------------------------


@dataclass
class Metadata:
    """Per-index singleton record.

    Fields mirror the reference ``Metadata``: dimensions, items bitmap,
    distance name (string identity used to check the reader's metric,
    ``src/reader.rs:400-405``), entry points, max level — plus the build's
    (m, m0) link capacities, which the reference bakes in as const generics
    (writer.rs:215) but a runtime-shaped engine must persist.
    """

    dimensions: int
    items: IdSet
    distance: str
    entry_points: list[int]
    max_level: int
    m: int = 16
    m0: int = 32

    def to_bytes(self) -> bytes:
        dist_b = self.distance.encode("utf-8")
        eps = np.asarray(self.entry_points, dtype=">u4")
        items_b = self.items.to_bytes()
        return (
            struct.pack(">IBBBH", self.dimensions, self.max_level, self.m, self.m0, len(dist_b))
            + dist_b
            + struct.pack(">I", eps.size)
            + eps.tobytes()
            + items_b
        )

    @classmethod
    def from_bytes(cls, data: bytes) -> "Metadata":
        dims, max_level, m, m0, dlen = struct.unpack_from(">IBBBH", data, 0)
        off = 9
        distance = data[off : off + dlen].decode("utf-8")
        off += dlen
        (n_eps,) = struct.unpack_from(">I", data, off)
        off += 4
        eps = np.frombuffer(data, dtype=">u4", count=n_eps, offset=off)
        off += 4 * n_eps
        items = IdSet.from_bytes(data[off:])
        return cls(
            dimensions=dims,
            items=items,
            distance=distance,
            entry_points=[int(e) for e in eps],
            max_level=max_level,
            m=m,
            m0=m0,
        )


def encode_update_status(status: UpdateStatus) -> bytes:
    return bytes([int(status)])


def decode_update_status(data: bytes) -> UpdateStatus:
    return UpdateStatus(data[0])


def encode_version(v: Version) -> bytes:
    return v.to_bytes()


def decode_version(data: bytes) -> Version:
    return Version.from_bytes(data)
