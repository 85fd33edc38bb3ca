"""Posting-block codec round-trips (randomized, fixed seeds) — the role
of BasePostingsFormatTestCase's random postings model."""

import numpy as np
from hypothesis import given, settings, strategies as st

from lucene_1_spark.functions import codecs


@given(st.lists(st.integers(min_value=0, max_value=2**31 - 1),
                min_size=0, max_size=300))
@settings(max_examples=200, deadline=None)
def test_bitpack_roundtrip(vals):
    arr = np.array(vals, dtype=np.int64)
    out = codecs.bitunpack(codecs.bitpack(arr), len(arr))
    np.testing.assert_array_equal(out, arr)


@given(st.lists(st.integers(min_value=0, max_value=2**40), min_size=1,
                max_size=codecs.BLOCK_SIZE, unique=True))
@settings(max_examples=200, deadline=None)
def test_doc_gap_roundtrip(doc_ids):
    d = np.array(sorted(doc_ids), dtype=np.int64)
    buf = codecs.encode_doc_gaps(d)
    out = codecs.decode_doc_ids(buf, int(d[0]), len(d))
    np.testing.assert_array_equal(out, d)


@given(st.lists(st.integers(min_value=1, max_value=100_000), min_size=1,
                max_size=codecs.BLOCK_SIZE))
@settings(max_examples=200, deadline=None)
def test_freq_roundtrip(freqs):
    f = np.array(freqs, dtype=np.int64)
    out = codecs.decode_freqs(codecs.encode_freqs(f), len(f))
    np.testing.assert_array_equal(out, f)


def test_all_ones_freq_block_is_tiny():
    f = np.ones(128, dtype=np.int64)
    buf = codecs.encode_freqs(f)
    assert len(buf) <= 1 + 128 // 8  # 1 bit per doc + header
