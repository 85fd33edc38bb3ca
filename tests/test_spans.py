"""Span queries — the queries/spans facade over the intervals algebra
(``lucene/queries/src/java/org/apache/lucene/queries/spans/``)."""

import os

import pandas as pd
import pytest

from lucene_1_spark.index import IndexBuilder, IndexReader
from lucene_1_spark.index.builder import IndexConfig
from lucene_1_spark.search import IndexSearcher
from lucene_1_spark.search.spans import (SpanFirstQuery, SpanNearQuery,
                                         SpanNotQuery, SpanOrQuery,
                                         SpanTermQuery, span_matches)

DOCS = pd.DataFrame([
    ("r", "d0", "c", "x", "quick brown fox jumps over lazy dog"),
    ("r", "d1", "c", "x", "quick red fox sleeps"),
    ("r", "d2", "c", "x", "fox quick brown"),
    ("r", "d3", "c", "x", "quick brown brown fox"),
    ("r", "d4", "c", "x", "lazy quick dog fox"),
], columns=["repo", "path", "commit", "lang", "content"])


@pytest.fixture(scope="module")
def sidx(spark, tmp_root):
    d = os.path.join(tmp_root, "idx_spans")
    IndexBuilder(spark, d, IndexConfig(analyzer="whitespace", n_buckets=4,
                                       n_doc_partitions=2,
                                       positions=True)) \
        .build(spark.createDataFrame(DOCS))
    return IndexSearcher(IndexReader(spark, d))


def _paths(s, q):
    m = span_matches(s, q)
    docs = s.reader.docs().select("doc_id", "path")
    return {r["path"] for r in m.join(docs, "doc_id").collect()}


def test_span_near_ordered(sidx):
    q = SpanNearQuery((SpanTermQuery("quick"), SpanTermQuery("fox")),
                      slop=1, in_order=True)
    # quick _ fox with <=1 gap, ordered: d0 (brown between), d1 (red),
    # d4 (dog between); d3 has TWO browns (2 gaps), d2 wrong order
    assert _paths(sidx, q) == {"d0", "d1", "d4"}
    q0 = SpanNearQuery((SpanTermQuery("quick"), SpanTermQuery("brown")),
                       slop=0, in_order=True)
    assert _paths(sidx, q0) == {"d0", "d2", "d3"}


def test_span_near_unordered(sidx):
    q = SpanNearQuery((SpanTermQuery("quick"), SpanTermQuery("fox")),
                      slop=1, in_order=False)
    # unordered adds d2 (fox quick adjacent); d4 has dog between (1 gap)
    assert _paths(sidx, q) == {"d0", "d1", "d2", "d4"}


def test_span_or_and_not(sidx):
    q = SpanNearQuery(
        (SpanOrQuery((SpanTermQuery("brown"), SpanTermQuery("red"))),
         SpanTermQuery("fox")), slop=0, in_order=True)
    # (brown|red) immediately before fox: d0, d1, d3
    assert _paths(sidx, q) == {"d0", "d1", "d3"}
    # quick spans NOT adjacent to lazy (pre/post window 1)
    qn = SpanNotQuery(SpanTermQuery("quick"), SpanTermQuery("lazy"),
                      pre=1, post=1)
    assert _paths(sidx, qn) == {"d0", "d1", "d2", "d3"}


def test_span_first(sidx):
    # fox within the first 2 positions (end < 2 -> fox at position 0
    # or ... width-1 span at p has end p, so p < 2)
    q = SpanFirstQuery(SpanTermQuery("fox"), end=2)
    assert _paths(sidx, q) == {"d2"}
    q3 = SpanFirstQuery(SpanTermQuery("fox"), end=3)
    assert _paths(sidx, q3) == {"d0", "d1", "d2"}


def test_span_position_range(sidx):
    from lucene_1_spark.search.spans import SpanPositionRangeQuery
    # fox positions: d0@2 d1@2 d2@0 d3@3 d4@3
    q = SpanPositionRangeQuery(SpanTermQuery("fox"), start=1, end=3)
    assert _paths(sidx, q) == {"d0", "d1"}
    q2 = SpanPositionRangeQuery(SpanTermQuery("fox"), start=2, end=4)
    assert _paths(sidx, q2) == {"d0", "d1", "d3", "d4"}
    # start=0 degenerates to SpanFirst
    q0 = SpanPositionRangeQuery(SpanTermQuery("fox"), start=0, end=2)
    assert _paths(sidx, q0) == _paths(
        sidx, SpanFirstQuery(SpanTermQuery("fox"), end=2)) == {"d2"}


def test_span_validation(sidx):
    with pytest.raises(ValueError):
        SpanNearQuery((SpanTermQuery("a"),))
    with pytest.raises(ValueError, match="term clauses only"):
        span_matches(sidx, SpanNearQuery(
            (SpanOrQuery((SpanTermQuery("a"),)), SpanTermQuery("b")),
            slop=1, in_order=False))
