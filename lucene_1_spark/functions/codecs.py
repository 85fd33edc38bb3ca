"""Vectorized posting-block codecs (numpy) — the role of Lucene's
FOR/PFoR kernels (``codecs/lucene912/ForUtil.java:32`` BLOCK_SIZE=128,
``ForDeltaUtil.java:248-296`` fused delta decode, ``PForUtil.java``).

Storage is NOT byte-identical to the reference (explicit non-goal; only
rank-identical query results are required — SURVEY.md §2.9).  We keep
the same *shape*: 128-doc blocks, docIDs delta-encoded then bit-packed
at the block's minimal fixed width, frequencies likewise; decode fuses
the prefix-sum (``np.cumsum``).

**Patched FOR** (``PForUtil.java:38`` MAX_EXCEPTIONS=7): a cell whose
values are mostly small but contain up to 7 outliers packs at the
width of the largest NON-outlier; the outliers' positions and excess
high bits are stored as patch entries.  The encoder costs each
exception count 0..7 and keeps the smallest encoding, so the classic
PFoR win (one freq=300 in an all-ones block: 30 bytes instead of 145)
is automatic and a cell with no favorable patch stays plain FOR.

Layout of a packed cell (BinaryType column value); the element count
lives in the block's ``num_docs`` column, so it is not repeated:

- plain FOR:  ``[bitwidth: u8 (<= 64)] [packed LE bitstream]``
- patched:    ``[0x80|bitwidth: u8] [n_exc: u8] [exc_idx: u32 LE x n]
  [exc_high: u64 LE x n] [packed low bits LE]`` — the high flag bit
  disambiguates (a plain width never exceeds 64), so both formats
  coexist cell-by-cell and indexes written before patching landed
  decode unchanged.
"""

from __future__ import annotations

import os

import numpy as np

BLOCK_SIZE = 128      # docs per posting block, as ForUtil.BLOCK_SIZE
# patch budget per cell, as PForUtil.MAX_EXCEPTIONS; env knob so
# operators can A/B the encode cost (0 disables patching — decode is
# format-flagged per cell, so mixed indexes are always readable)
MAX_EXCEPTIONS = int(os.environ.get("L1S_PFOR_MAX_EXCEPTIONS", "7"))


def _pack_at(v: np.ndarray, bw: int) -> bytes:
    """(n, bw) bit matrix, LSB-first, as a little-endian bitstream."""
    bits = ((v[:, None] >> np.arange(bw, dtype=np.uint64)) & 1) \
        .astype(np.uint8)
    return np.packbits(bits.ravel(), bitorder="little").tobytes()


def _unpack_at(raw: np.ndarray, n: int, bw: int) -> np.ndarray:
    bits = np.unpackbits(raw, bitorder="little")[: n * bw].reshape(n, bw)
    weights = (np.uint64(1) << np.arange(bw, dtype=np.uint64))
    return (bits.astype(np.uint64) * weights).sum(axis=1)


def bitpack(values: np.ndarray) -> bytes:
    """Pack non-negative values at their minimal fixed bit width, with
    up to :data:`MAX_EXCEPTIONS` patched outliers when that is
    smaller (PFoR)."""
    v = np.asarray(values, dtype=np.uint64)
    n = len(v)
    if n == 0:
        return bytes([0])
    bw_full = max(int(v.max()).bit_length(), 1)
    best_e, best_bw = 0, bw_full
    best_cost = 1 + (n * bw_full + 7) // 8
    k = min(MAX_EXCEPTIONS, n - 1)
    if k > 0 and bw_full > 1:
        m = k + 1
        top = np.sort(np.partition(v, n - m)[n - m:]) if n > m \
            else np.sort(v)
        for e in range(1, len(top)):
            # width of the largest value that is NOT an exception
            bw_e = max(int(top[len(top) - 1 - e]).bit_length(), 1)
            if bw_e >= bw_full or bw_e >= 64:
                continue
            cost = 2 + e * 12 + (n * bw_e + 7) // 8
            if cost < best_cost:
                best_e, best_bw, best_cost = e, bw_e, cost
    if best_e == 0:
        return bytes([bw_full]) + _pack_at(v, bw_full)
    bw = best_bw
    mask = np.uint64((1 << bw) - 1)
    exc = np.nonzero(v > mask)[0]          # ties can make this < best_e
    return (bytes([0x80 | bw, len(exc)])
            + exc.astype("<u4").tobytes()
            + (v[exc] >> np.uint64(bw)).astype("<u8").tobytes()
            + _pack_at(v & mask, bw))


def bitunpack(buf: bytes, n: int) -> np.ndarray:
    """Inverse of :func:`bitpack` given the element count."""
    if n == 0:
        return np.zeros(0, dtype=np.int64)
    b0 = buf[0]
    if b0 & 0x80:                          # patched FOR cell
        bw = b0 & 0x7F
        ne = buf[1]
        idx = np.frombuffer(buf, dtype="<u4", count=ne, offset=2)
        high = np.frombuffer(buf, dtype="<u8", count=ne,
                             offset=2 + 4 * ne)
        raw = np.frombuffer(buf, dtype=np.uint8, offset=2 + 12 * ne)
        out = _unpack_at(raw, n, bw)
        # callers may decode a PREFIX of a longer cell (the plain
        # format truncates naturally); drop patches beyond the prefix
        keep = idx < n
        out[idx[keep]] |= high[keep] << np.uint64(bw)
        return out.astype(np.int64)
    raw = np.frombuffer(buf, dtype=np.uint8, offset=1)
    return _unpack_at(raw, n, b0).astype(np.int64)


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
