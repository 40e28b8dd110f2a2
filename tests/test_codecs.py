"""Codec pack/unpack tests.

Mirrors the reference's codec snapshot/property tests
(src/unaligned_vector/binary_test.rs, binary_quantized_test.rs — packing
roundtrips + padding behaviour, issue #78 analogue).
"""

import numpy as np
import pytest

from hannoy_tpu.ops import codecs


def test_padded_dim():
    assert codecs.padded_dim(768, codecs.F32) == 768
    assert codecs.padded_dim(768, codecs.BINARY) == 768
    assert codecs.padded_dim(100, codecs.BINARY) == 128
    assert codecs.padded_dim(1, codecs.BQ) == 64
    assert codecs.padded_dim(65, codecs.BQ) == 128


def test_n_lanes():
    assert codecs.n_lanes(768, codecs.BINARY) == 24
    assert codecs.n_lanes(100, codecs.BQ) == 4  # 128 bits / 32


def test_f32_roundtrip(rng):
    x = rng.standard_normal((3, 17)).astype(np.float32)
    packed = codecs.pack(x, codecs.F32)
    assert np.array_equal(codecs.unpack(packed, 17, codecs.F32), x)


@pytest.mark.parametrize("dim", [1, 63, 64, 65, 100, 768])
def test_binary_roundtrip(rng, dim):
    x = rng.standard_normal((5, dim)).astype(np.float32)
    packed = codecs.pack(x, codecs.BINARY)
    assert packed.dtype == np.uint32
    assert packed.shape == (5, codecs.n_lanes(dim, codecs.BINARY))
    got = codecs.unpack(packed, dim, codecs.BINARY)
    # rule: x > 0.0 → 1 (reference binary.rs)
    assert np.array_equal(got, (x > 0.0).astype(np.float32))


@pytest.mark.parametrize("dim", [1, 64, 100, 768])
def test_bq_roundtrip(rng, dim):
    x = rng.standard_normal((5, dim)).astype(np.float32)
    packed = codecs.pack(x, codecs.BQ)
    got = codecs.unpack(packed, dim, codecs.BQ)
    # rule: x > 0.0 → +1 else -1 (reference binary_quantized.rs)
    assert np.array_equal(got, np.where(x > 0.0, 1.0, -1.0).astype(np.float32))


def test_zero_maps_to_negative():
    x = np.array([[0.0, -0.0, 1e-9, -1e-9]], dtype=np.float32)
    assert np.array_equal(codecs.unpack(codecs.pack(x, codecs.BINARY), 4, codecs.BINARY)[0], [0, 0, 1, 0])
    assert np.array_equal(codecs.unpack(codecs.pack(x, codecs.BQ), 4, codecs.BQ)[0], [-1, -1, 1, -1])


def test_padding_bits_are_zero(rng):
    x = np.ones((1, 65), dtype=np.float32)
    packed = codecs.pack(x, codecs.BINARY)
    # bits 65..128 must be zero → second 64-bit word has exactly 1 bit set
    word1 = int(packed[0, 2]) | (int(packed[0, 3]) << 32)
    assert bin(word1).count("1") == 1


def test_bit_layout_lsb_first():
    x = np.zeros((1, 64), dtype=np.float32)
    x[0, 0] = 1.0  # element 0 → bit 0 of lane 0
    x[0, 33] = 1.0  # element 33 → bit 1 of lane 1
    packed = codecs.pack(x, codecs.BINARY)
    assert packed[0, 0] == 1
    assert packed[0, 1] == 2


def test_vector_bytes_roundtrip(rng):
    v = rng.standard_normal(100).astype(np.float32)
    for codec in (codecs.F32, codecs.BINARY, codecs.BQ):
        b = codecs.vector_to_bytes(v, codec)
        row = codecs.vector_from_bytes(b, codec)
        expect = codecs.pack(v[None, :], codec)[0]
        assert np.array_equal(row, expect)


def test_truncation_of_padding_on_unpack(rng):
    """Issue-#78 analogue: decoded vectors must be truncatable to dims."""
    v = rng.standard_normal((1, 100)).astype(np.float32)
    out = codecs.unpack(codecs.pack(v, codecs.BQ), 100, codecs.BQ)
    assert out.shape == (1, 100)
