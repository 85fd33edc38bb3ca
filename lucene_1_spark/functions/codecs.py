"""Vectorized posting-block codecs (numpy) — the role of Lucene's
FOR/PFoR kernels (``codecs/lucene912/ForUtil.java:32`` BLOCK_SIZE=128,
``ForDeltaUtil.java:248-296`` fused delta decode, ``PForUtil.java``).

Storage is NOT byte-identical to the reference (explicit non-goal; only
rank-identical query results are required — SURVEY.md §2.9).  We keep
the same *shape*: 128-doc blocks, docIDs delta-encoded then bit-packed
at the block's minimal fixed width, frequencies likewise; decode fuses
the prefix-sum (``np.cumsum``).

Layout of a packed cell (BinaryType column value):
``[bitwidth: uint8][packed little-endian bitstream]`` — the element
count lives in the block's ``num_docs`` column, so it is not repeated.
"""

from __future__ import annotations

import numpy as np

BLOCK_SIZE = 128  # docs per posting block, as ForUtil.BLOCK_SIZE


def bitpack(values: np.ndarray) -> bytes:
    """Pack non-negative uint32 values at their minimal fixed bit width."""
    v = np.asarray(values, dtype=np.uint64)
    n = len(v)
    if n == 0:
        return bytes([0])
    maxv = int(v.max())
    bw = max(int(maxv).bit_length(), 1)
    # (n, bw) bit matrix, LSB-first, then a little-endian bitstream
    bits = ((v[:, None] >> np.arange(bw, dtype=np.uint64)) & 1).astype(np.uint8)
    return bytes([bw]) + np.packbits(bits.ravel(), bitorder="little").tobytes()


def bitunpack(buf: bytes, n: int) -> np.ndarray:
    """Inverse of :func:`bitpack` given the element count."""
    if n == 0:
        return np.zeros(0, dtype=np.int64)
    bw = buf[0]
    raw = np.frombuffer(buf, dtype=np.uint8, offset=1)
    bits = np.unpackbits(raw, bitorder="little")[: n * bw].reshape(n, bw)
    weights = (np.uint64(1) << np.arange(bw, dtype=np.uint64))
    return (bits.astype(np.uint64) * weights).sum(axis=1).astype(np.int64)


def encode_doc_gaps(doc_ids: np.ndarray) -> bytes:
    """Delta-encode an ascending docID run; first value is kept in the
    block's ``first_doc`` column so only n-1 gaps are stored."""
    d = np.asarray(doc_ids, dtype=np.int64)
    return bitpack(np.diff(d))


def decode_doc_ids(gaps_buf: bytes, first_doc: int, n: int) -> np.ndarray:
    """Fused gap decode + prefix sum (ForDeltaUtil-style)."""
    out = np.empty(n, dtype=np.int64)
    out[0] = first_doc
    if n > 1:
        out[1:] = bitunpack(gaps_buf, n - 1)
    return np.cumsum(out)


def encode_freqs(freqs: np.ndarray) -> bytes:
    # store freq-1: the common all-ones block packs to 1 bit/doc
    return bitpack(np.asarray(freqs, dtype=np.int64) - 1)


def decode_freqs(buf: bytes, n: int) -> np.ndarray:
    return bitunpack(buf, n) + 1
