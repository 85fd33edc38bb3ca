"""SmallFloat quantization vs a direct scalar port of the reference
semantics (SmallFloat.java:103-167)."""

import numpy as np
import pytest

from lucene_1_spark.functions.smallfloat import (
    LENGTH_TABLE, NUM_FREE_VALUES, byte4_to_int, int_to_byte4,
)


def scalar_long_to_int4(i: int) -> int:
    assert i >= 0
    num_bits = i.bit_length()
    if num_bits < 4:
        return i
    shift = num_bits - 4
    encoded = (i >> shift) & 0x07
    return encoded | ((shift + 1) << 3)


def scalar_int4_to_long(i: int) -> int:
    bits = i & 0x07
    shift = (i >> 3) - 1
    return bits if shift == -1 else (bits | 0x08) << shift


def scalar_int_to_byte4(i: int) -> int:
    if i < NUM_FREE_VALUES:
        return i
    return NUM_FREE_VALUES + scalar_long_to_int4(i - NUM_FREE_VALUES)


def test_free_values_constant():
    # longToInt4(Integer.MAX_VALUE) == 231 => 24 free values
    assert scalar_long_to_int4(2**31 - 1) == 231
    assert NUM_FREE_VALUES == 24


def test_matches_scalar_port_exhaustive():
    xs = np.arange(0, 100_000)
    enc = int_to_byte4(xs)
    expected = np.array([scalar_int_to_byte4(int(x)) for x in range(100_000)])
    np.testing.assert_array_equal(enc, expected.astype(np.uint8))


def test_identity_below_40():
    # values 0..39 survive an encode/decode round-trip exactly
    xs = np.arange(0, 40)
    np.testing.assert_array_equal(byte4_to_int(int_to_byte4(xs)), xs)
    # 40 is exact too; 41 collapses onto 40 (4 significant bits)
    assert byte4_to_int(int_to_byte4(np.array([40])))[0] == 40
    assert byte4_to_int(int_to_byte4(np.array([41])))[0] == 40


def test_monotone_and_bounded():
    xs = np.arange(0, 1_000_000)
    enc = int_to_byte4(xs)
    assert enc.dtype == np.uint8
    assert np.all(np.diff(enc.astype(np.int32)) >= 0)
    dec = byte4_to_int(enc)
    assert np.all(dec <= xs)  # decode never overshoots...
    # length table consistency
    np.testing.assert_array_equal(LENGTH_TABLE[:40], np.arange(40, dtype=np.float32))


def test_e8_boundary_lengths():
    # FIXTURES E8 doc lengths
    for n, exact in [(1, True), (39, True), (40, True), (41, False),
                     (255, False), (256, False), (248, True)]:
        dec = int(byte4_to_int(int_to_byte4(np.array([n])))[0])
        assert (dec == n) == exact, (n, dec)
