"""Interval combinator sources — Intervals.or / Intervals.phrase /
nested ordered (``queries/intervals/Intervals.java:97-134``) verified
on a hand-built corpus with hand-computed minimal intervals."""

import os

import pandas as pd
import pytest

from lucene_1_spark.index import IndexBuilder, IndexReader
from lucene_1_spark.index.builder import IndexConfig
from lucene_1_spark.search import IndexSearcher
from lucene_1_spark.search.intervals import (containment_counts,
                                             or_source, ordered_source,
                                             phrase_source,
                                             source_interval_counts)

DOCS = [  # path order == engine doc_id order
    ("d0", "a x c b c"),
    ("d1", "b c a"),
    ("d2", "x y z"),
    ("d3", "a b c c"),
]


@pytest.fixture(scope="module")
def ivs(spark, tmp_root):
    pdf = pd.DataFrame([("r", p, "c0", "t", content)
                        for p, content in DOCS],
                       columns=["repo", "path", "commit", "lang", "content"])
    d = os.path.join(tmp_root, "idx_ivsrc")
    IndexBuilder(spark, d, IndexConfig(n_buckets=4, n_doc_partitions=2,
                                       positions=True)) \
        .build(spark.createDataFrame(pdf))
    return IndexSearcher(IndexReader(spark, d))


def _counts(searcher, src) -> dict[int, int]:
    return {r["doc_id"]: r["n_intervals"] for r in
            source_interval_counts(searcher, src).collect()}


def test_ordered_over_or(ivs):
    src = ordered_source(or_source("a", "b"), "c", max_gaps=100)
    assert _counts(ivs, src) == {0: 2, 1: 1, 3: 1}


def test_ordered_over_or_maxgaps_zero(ivs):
    src = ordered_source(or_source("a", "b"), "c", max_gaps=0)
    # d0: only (3,4); d1: (0,1); d3: minimal (1,2)
    assert _counts(ivs, src) == {0: 1, 1: 1, 3: 1}


def test_phrase_over_or(ivs):
    src = phrase_source(or_source("a", "b"), "c")
    assert _counts(ivs, src) == {0: 1, 1: 1, 3: 1}


def test_or_of_term_and_phrase(ivs):
    src = or_source("a", phrase_source("b", "c"))
    # d0: a@0 + phrase(b,c)@(3,4) -> 2; d1: phrase(0,1) + a@2 -> 2;
    # d3: a@0 + phrase(1,2) -> 2
    assert _counts(ivs, src) == {0: 2, 1: 2, 3: 2}


def test_nested_ordered(ivs):
    src = ordered_source(ordered_source("a", "b", max_gaps=100), "c",
                         max_gaps=0)
    # d0: ordered(a,b)=(0,3); next c@4 -> (0,4), content (3-0+1)+1=5,
    # gaps 0 -> 1.  d3: (0,1) -> c@2 -> (0,2) content 3, gaps 0 -> 1.
    assert _counts(ivs, src) == {0: 1, 3: 1}


def test_absent_term_in_or_is_dropped(ivs):
    src = ordered_source(or_source("a", "zzz_absent"), "c", max_gaps=100)
    # behaves like ordered(a, c)
    assert _counts(ivs, src) == {0: 1, 1: 0, 3: 1} or \
        _counts(ivs, src) == {0: 1, 3: 1}


def test_absent_term_in_ordered_matches_nothing(ivs):
    src = ordered_source("a", "zzz_absent", max_gaps=100)
    assert _counts(ivs, src) == {}


def test_containment_accepts_source_specs(ivs):
    # ordered(a..c) intervals containing an occurrence of (b OR x)
    got = {r["doc_id"]: r["n_intervals"] for r in containment_counts(
        ivs, ["a", "c"], or_source("b", "x"), "containing",
        outer_gaps=100).collect()}
    # d0: minimal ordered(a,c) = (0,2); contains x@1 -> 1
    # d3: (0,2)? a@0 -> first c after 0 = 2 -> (0,2) contains b@1 -> 1
    assert got == {0: 1, 3: 1}


# -- the filter/positioning combinator tail (Intervals.java:376-587) --------
# DOCS (positions):  d0 = a(0) x(1) c(2) b(3) c(4)
#                    d1 = b(0) c(1) a(2)
#                    d2 = x(0) y(1) z(2)
#                    d3 = a(0) b(1) c(2) c(3)

def test_before_source(ivs):
    from lucene_1_spark.search.intervals import before_source
    # 'a' occurrences before some 'c': d0 a@0 < c@{2,4} yes;
    # d1 a@2, c@1 -> no c after; d3 a@0 < c@2 yes
    assert _counts(ivs, before_source("a", "c")) == {0: 1, 3: 1}


def test_after_source(ivs):
    from lucene_1_spark.search.intervals import after_source
    # 'c' occurrences after some 'b': d0 b@3 -> c@4 only; d1 c@1 > b@0;
    # d3 c@2,c@3 > b@1
    assert _counts(ivs, after_source("c", "b")) == {0: 1, 1: 1, 3: 2}


def test_extend_and_maxwidth(ivs):
    from lucene_1_spark.search.intervals import (extend_source,
                                                 max_width_source,
                                                 ordered_source)
    # ordered(a..b) in d0 = [0,3]; extend(1,1) -> [0,4] (start clips at 0)
    # d3 ordered(a..b) = [0,1] -> extend -> [0,2]
    src = extend_source(ordered_source("a", "b", max_gaps=100), 1, 1)
    assert _counts(ivs, src) == {0: 1, 3: 1}
    # maxwidth 2 keeps only spans of <= 2 positions: d0's [0,3] (w=4)
    # dropped, d3's [0,1] (w=2) kept
    mw = max_width_source(ordered_source("a", "b", max_gaps=100), 2)
    assert _counts(ivs, mw) == {3: 1}


def test_overlapping_and_not_overlapping(ivs):
    from lucene_1_spark.search.intervals import (not_overlapping_source,
                                                 ordered_source,
                                                 overlapping_source)
    # src = ordered(b..c): d0 [3,4]; d1 [0,1]; d3 [1,2] (minimal)
    src = ordered_source("b", "c", max_gaps=100)
    # ref = 'a' width-1 intervals: d0 @0; d1 @2; d3 @0
    assert _counts(ivs, overlapping_source(src, "a")) == {}
    got = _counts(ivs, not_overlapping_source(src, "a"))
    assert got == {0: 1, 1: 1, 3: 1}
    # overlap hit: ordered(a..c) minimal intervals are d0 [0,2],
    # d3 [0,2]; only d3's contains/overlaps b@1 (d0's b is at 3)
    src2 = ordered_source("a", "c", max_gaps=100)
    assert _counts(ivs, overlapping_source(src2, "b")) == {3: 1}


def test_not_within(ivs):
    from lucene_1_spark.search.intervals import not_within_source
    # 'c' occurrences not within 1 position of 'b':
    # d0 c@2 (b@3 within 1 -> dropped), c@4 (b@3 within 1 -> dropped)
    # d1 c@1 (b@0 adjacent -> dropped)
    # d3 c@2 (b@1 adjacent -> dropped), c@3 (b@1 distance 2 -> kept)
    assert _counts(ivs, not_within_source("c", 1, "b")) == {3: 1}


def test_within(ivs):
    from lucene_1_spark.search.intervals import within_source
    # 'a' within 2 of 'z': only d2 has z, no a -> empty;
    # 'a' within 2 of 'c': d0 a@0 c@2 -> yes; d1 a@2 c@1 -> yes;
    # d3 a@0 c@2 -> yes
    assert _counts(ivs, within_source("a", 2, "c")) == {0: 1, 1: 1, 3: 1}
