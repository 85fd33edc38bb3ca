"""Lossy int->byte norm quantization, rank-compatible with the reference.

Semantics match Lucene's ``SmallFloat.intToByte4`` / ``byte4ToInt``
(``lucene/core/src/java/org/apache/lucene/util/SmallFloat.java:103-167``):
values below NUM_FREE_VALUES (=24) are stored identically; above that, a
float-like encoding keeps 4 significant bits (3 stored + 1 implicit),
so e.g. 40 and 41 collapse to the same byte.  BM25 rank-identity with
the reference depends on reproducing this *exactly* — the 256-entry
norm-inverse cache in :mod:`lucene_1_spark.functions.bm25` is built from
``byte4_to_int``.

Implementation is vectorized numpy (no per-row Python), used both inside
the tokenize/norm pandas UDF and by the pure-Python oracle.
"""

from __future__ import annotations

import numpy as np

# longToInt4(Integer.MAX_VALUE) == 231, so 255 - 231 == 24 byte values
# are free to encode 0..23 losslessly.
_MAX_INT4 = 231
NUM_FREE_VALUES = 255 - _MAX_INT4  # 24


def _long_to_int4(x: np.ndarray) -> np.ndarray:
    """Order-preserving 4-significant-bit encoding of non-negative ints."""
    x = np.asarray(x, dtype=np.int64)
    if np.any(x < 0):
        raise ValueError("only supports positive values")
    # number of significant bits; exact via frexp for x < 2**53 (doc
    # lengths are < 2**31): frexp(x) = (m, e) with x = m * 2**e, so e is
    # the bit length for x > 0 and 0 for x == 0.
    _, num_bits = np.frexp(x.astype(np.float64))
    num_bits = num_bits.astype(np.int64)

    shift = np.maximum(num_bits - 4, 0)
    encoded = np.right_shift(x, shift)
    out = np.where(
        num_bits < 4,
        x,  # subnormal: stored as-is
        np.bitwise_or(np.bitwise_and(encoded, 0x07), np.left_shift(shift + 1, 3)),
    )
    return out.astype(np.int64)


def _int4_to_long(i: np.ndarray) -> np.ndarray:
    i = np.asarray(i, dtype=np.int64)
    bits = np.bitwise_and(i, 0x07)
    shift = np.right_shift(i, 3) - 1
    return np.where(shift == -1, bits,
                    np.left_shift(np.bitwise_or(bits, 0x08), np.maximum(shift, 0)))


def int_to_byte4(x) -> np.ndarray:
    """Vectorized intToByte4: identity below 24, 4-significant-bit float above.

    Returns uint8 array of encoded norm bytes.
    """
    x = np.asarray(x, dtype=np.int64)
    if np.any(x < 0):
        raise ValueError("only supports positive values")
    enc = np.where(x < NUM_FREE_VALUES, x,
                   NUM_FREE_VALUES + _long_to_int4(np.maximum(x - NUM_FREE_VALUES, 0)))
    return enc.astype(np.uint8)


def byte4_to_int(b) -> np.ndarray:
    """Vectorized byte4ToInt inverse (returns the decoded doc length)."""
    i = np.asarray(b, dtype=np.uint8).astype(np.int64)
    return np.where(i < NUM_FREE_VALUES, i,
                    NUM_FREE_VALUES + _int4_to_long(np.maximum(i - NUM_FREE_VALUES, 0)))


# decoded length for every possible norm byte — mirrors BM25Similarity's
# LENGTH_TABLE (BM25Similarity.java:176-182)
LENGTH_TABLE: np.ndarray = byte4_to_int(np.arange(256)).astype(np.float32)
