"""Schema/codec unit tests.

Mirrors the reference's in-module tests: key size and ordering semantics
(src/key.rs:129-162, src/node_id.rs:111-138), node payload roundtrips
(src/node.rs:190-265), metadata roundtrip (src/metadata.rs:75-100), version
roundtrip (src/version.rs:62-79).
"""

import numpy as np
import pytest

from hannoy_tpu.store.schema import (
    Key,
    Metadata,
    NodeMode,
    Prefix,
    UpdateStatus,
    decode_item,
    decode_links,
    decode_update_status,
    decode_version,
    encode_item,
    encode_links,
    encode_update_status,
    encode_version,
)
from hannoy_tpu.utils.idset import IdSet
from hannoy_tpu.version import Version


def test_key_is_8_bytes():
    assert len(Key.item(0, 0).to_bytes()) == 8
    assert len(Key.links(65535, 2**32 - 1, 255).to_bytes()) == 8


def test_key_roundtrip():
    for k in [
        Key.metadata(7),
        Key.version(7),
        Key.updated(3, 2**32 - 1),
        Key.links(1, 42, 5),
        Key.item(65535, 123),
    ]:
        assert Key.from_bytes(k.to_bytes()) == k


def test_metadata_key_is_before_version_key():
    # metadata item 0, version item 1 (reference node_id.rs:55-73)
    assert Key.metadata(0).to_bytes() < Key.version(0).to_bytes()


def test_mode_ordering_is_db_stable():
    # Metadata=0 < Updated=1 < Links=2 < Item=3 (reference node_id.rs:8-21)
    assert NodeMode.METADATA < NodeMode.UPDATED < NodeMode.LINKS < NodeMode.ITEM
    ks = [
        Key.metadata(5).to_bytes(),
        Key.updated(5, 0).to_bytes(),
        Key.links(5, 0, 0).to_bytes(),
        Key.item(5, 0).to_bytes(),
    ]
    assert ks == sorted(ks)


def test_layer_sorts_after_item():
    """(vector, links) co-locality: layers of one item are adjacent
    (reference node_id.rs:43-45)."""
    a = Key.links(0, 10, 0).to_bytes()
    b = Key.links(0, 10, 1).to_bytes()
    c = Key.links(0, 11, 0).to_bytes()
    assert a < b < c


def test_prefix_covers_only_its_mode():
    p = Prefix.updated(9)
    inside = Key.updated(9, 0).to_bytes()
    outside = [
        Key.updated(8, 0).to_bytes(),
        Key.updated(10, 0).to_bytes(),
        Key.item(9, 0).to_bytes(),
        Key.metadata(9).to_bytes(),
    ]
    assert inside.startswith(p)
    for k in outside:
        assert not k.startswith(p)


def test_index_isolation_via_prefix():
    # big-endian u16 index means all of index 1 sorts before all of index 2
    assert Key.item(1, 2**32 - 1).to_bytes() < Key.metadata(2).to_bytes()


def test_item_payload_roundtrip():
    header = np.float32(1.5).tobytes()
    vec = np.arange(4, dtype="<f4").tobytes()
    data = encode_item(header, vec)
    h, v = decode_item(data)
    assert h == header and v == vec


def test_links_payload_roundtrip():
    ids = np.array([5, 1, 9, 2**32 - 1], dtype=np.uint32)
    got = decode_links(encode_links(ids))
    assert got == IdSet(ids)


def test_links_empty_roundtrip():
    assert decode_links(encode_links(np.empty(0, dtype=np.uint32))) == IdSet()


def test_metadata_roundtrip():
    md = Metadata(
        dimensions=768,
        items=IdSet([1, 2, 3, 100, 2**32 - 1]),
        distance="binary quantized cosine",
        entry_points=[100, 3],
        max_level=4,
    )
    got = Metadata.from_bytes(md.to_bytes())
    assert got.dimensions == md.dimensions
    assert got.items == md.items
    assert got.distance == md.distance
    assert got.entry_points == md.entry_points
    assert got.max_level == md.max_level


def test_version_roundtrip():
    v = Version(1, 2, 3)
    assert decode_version(encode_version(v)) == v


def test_update_status_roundtrip():
    for s in (UpdateStatus.UPDATED, UpdateStatus.REMOVED):
        assert decode_update_status(encode_update_status(s)) == s


def test_idset_algebra():
    a = IdSet([1, 2, 3, 4])
    b = IdSet([3, 4, 5])
    assert a | b == IdSet([1, 2, 3, 4, 5])
    assert a & b == IdSet([3, 4])
    assert a - b == IdSet([1, 2])
    assert a ^ b == IdSet([1, 2, 5])
    assert (a & b).intersection_len(a) == 2
    assert 3 in a and 7 not in a


def test_idset_rle_roundtrip_dense_and_sparse():
    dense = IdSet(np.arange(1000, dtype=np.uint32))
    sparse = IdSet([0, 17, 2**31, 2**32 - 1])
    for s in (dense, sparse, IdSet()):
        assert IdSet.from_bytes(s.to_bytes()) == s
    # dense ranges compress to O(1) runs
    assert len(dense.to_bytes()) == 4 + 8


def test_vectorized_keys_match_scalar_codec():
    """schema.keys_bytes row i must be byte-identical to Key.to_bytes()."""
    from hannoy_tpu.store.schema import Key, NodeMode, keys_bytes

    rng = np.random.default_rng(7)
    items = rng.integers(0, 2**32, size=257, dtype=np.uint64).astype(np.uint32)
    items[0] = 0
    items[1] = 2**32 - 1
    for mode in (NodeMode.ITEM, NodeMode.LINKS, NodeMode.UPDATED):
        for layer in (0, 3, 255):
            batch = keys_bytes(41, mode, items, layer=layer)
            for i in (0, 1, 17, 256):
                assert (
                    bytes(batch[i])
                    == Key(41, mode, int(items[i]), layer).to_bytes()
                )


def test_vectorized_items_payload_matches_scalar_codec():
    from hannoy_tpu.store.schema import encode_item, items_payload

    rng = np.random.default_rng(8)
    n, H, B = 33, 4, 24
    headers = rng.integers(0, 256, size=(n, H), dtype=np.uint8)
    rows = rng.integers(0, 256, size=(n, B), dtype=np.uint8)
    vbuf, offs = items_payload(headers, rows)
    for i in (0, 1, 32):
        expect = encode_item(headers[i].tobytes(), rows[i].tobytes())
        assert vbuf[int(offs[i]) : int(offs[i + 1])] == expect


def test_vectorized_links_payload_matches_scalar_codec():
    from hannoy_tpu.store.schema import encode_links, links_payload

    rng = np.random.default_rng(9)
    n, M = 65, 16
    table = rng.integers(0, 2**32, size=(n, M), dtype=np.int64)
    # random empties, one full row, one empty row, u32::MAX ids
    table[rng.random(size=(n, M)) < 0.4] = -1
    table[0] = -1
    table[1] = rng.integers(0, 2**32, size=M, dtype=np.int64)
    table[2, :3] = 2**32 - 1
    vbuf, offs = links_payload(table)
    for i in range(n):
        valid = table[i][table[i] >= 0].astype(np.uint32)
        expect = encode_links(valid)
        assert vbuf[int(offs[i]) : int(offs[i + 1])] == expect
