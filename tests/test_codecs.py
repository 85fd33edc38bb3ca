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


def test_pfor_patches_outliers():
    """PForUtil semantics: a handful of outliers must not inflate the
    whole block's width — they get patched."""
    f = np.ones(128, dtype=np.int64)
    f[17] = 300                      # one outlier
    buf = codecs.encode_freqs(f)
    assert buf[0] & 0x80             # patched format chosen
    assert len(buf) < 40             # vs 145 bytes at full 9-bit width
    np.testing.assert_array_equal(codecs.decode_freqs(buf, 128), f)
    # seven outliers (the budget) still patch; eight of nine distinct
    # magnitudes may not — either way the round-trip is exact
    g = np.ones(128, dtype=np.int64)
    g[:7] = [300, 301, 65000, 2**20, 2**33, 5, 7]
    buf2 = codecs.encode_freqs(g)
    assert len(buf2) < 1 + (128 * 35 + 7) // 8
    np.testing.assert_array_equal(codecs.decode_freqs(buf2, 128), g)


def test_pfor_adversarial_roundtrips():
    cases = [
        np.array([2**62], dtype=np.int64),                # huge single
        np.array([0] * 200 + [2**62, 2**62], dtype=np.int64),  # tied giants
        np.array([1, 2, 4, 8, 16, 32, 64, 128, 256], dtype=np.int64),
        np.arange(3000, dtype=np.int64) % 3 + 1,          # big cell (positions)
        np.concatenate([np.zeros(3000, dtype=np.int64),
                        np.array([2**40] * 7)]),          # exceptions at tail
    ]
    for arr in cases:
        out = codecs.bitunpack(codecs.bitpack(arr), len(arr))
        np.testing.assert_array_equal(out, arr)


def test_pfor_prefix_decode():
    """Callers may decode only the first n values of a longer cell
    (the positions kernel does); patches beyond the prefix must be
    ignored, patches inside it applied."""
    arr = np.ones(500, dtype=np.int64)
    arr[3] = 2**30      # patched, inside the prefix
    arr[450] = 2**35    # patched, beyond the prefix
    buf = codecs.bitpack(arr)
    assert buf[0] & 0x80
    np.testing.assert_array_equal(codecs.bitunpack(buf, 100), arr[:100])
    np.testing.assert_array_equal(codecs.bitunpack(buf, 500), arr)


def test_plain_for_cells_still_decode():
    """Pre-patching cells (width byte <= 64, no flag) decode unchanged —
    indexes written before PFoR landed stay readable."""
    v = np.array([3, 1, 4, 1, 5, 9, 2, 6], dtype=np.uint64)
    bw = 4
    legacy = bytes([bw]) + codecs._pack_at(v, bw)
    np.testing.assert_array_equal(codecs.bitunpack(legacy, len(v)),
                                  v.astype(np.int64))


# ---------------------------------------------------------------------------
# DateTools (document/DateTools.java): sortable UTC date strings
# ---------------------------------------------------------------------------

def test_datetools_roundtrip_and_sortability():
    from datetime import datetime, timezone

    from lucene_1_spark.functions.datetools import (date_to_string,
                                                    round_down,
                                                    string_to_date)
    dt = datetime(2024, 3, 7, 15, 42, 9, 123000, tzinfo=timezone.utc)
    assert date_to_string(dt, "year") == "2024"
    assert date_to_string(dt, "day") == "20240307"
    assert date_to_string(dt, "second") == "20240307154209"
    assert date_to_string(dt, "millisecond") == "20240307154209123"
    # round-trip at every resolution floors the dropped components
    assert string_to_date("2024") == datetime(2024, 1, 1,
                                              tzinfo=timezone.utc)
    assert string_to_date("20240307154209123") == dt
    assert round_down(dt, "hour") == datetime(2024, 3, 7, 15,
                                              tzinfo=timezone.utc)
    # lexicographic order == chronological order
    later = datetime(2024, 3, 7, 15, 42, 10, tzinfo=timezone.utc)
    assert date_to_string(dt, "second") < date_to_string(later, "second")


def test_datetools_spark_column_matches_python(spark):
    from datetime import datetime, timezone

    from lucene_1_spark.functions.datetools import (date_col_to_string,
                                                    date_to_string)
    from pyspark.sql import functions as F
    rows = [(datetime(2023, 12, 31, 23, 59, 59),),
            (datetime(2024, 2, 29, 0, 0, 1),)]
    df = spark.createDataFrame(rows, "ts timestamp")
    for res in ("year", "month", "day", "hour", "minute", "second"):
        got = [r["s"] for r in
               df.select(date_col_to_string(F.col("ts"), res).alias("s"))
               .orderBy("s").collect()]
        want = sorted(date_to_string(ts.replace(tzinfo=timezone.utc), res)
                      for (ts,) in rows)
        assert got == want, res
