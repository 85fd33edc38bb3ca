"""Span queries — a thin facade over the intervals algebra, the way
the reference's span module relates to intervals
(``lucene/queries/src/java/org/apache/lucene/queries/spans/`` —
SpanTermQuery, SpanNearQuery, SpanOrQuery, SpanNotQuery,
SpanFirstQuery; the reference docs themselves recommend intervals as
the successor API, and every span shape below reduces to an interval
source):

- ``SpanTermQuery(t)``                -> term source
- ``SpanNearQuery(c, slop, in_order)``-> ordered(children, max_gaps=slop)
  (unordered over TERM children routes to the unordered minimal-window
  sweep; unordered over composite children is not supported — the
  documented deviation, matching this repo's intervals surface)
- ``SpanOrQuery(c)``                  -> or(children)
- ``SpanNotQuery(inc, exc, pre, post)``-> not_overlapping(inc,
  extend(exc, pre, post)) (``SpanNotQuery.java`` pre/post exclusion)
- ``SpanFirstQuery(m, end)``          -> intervals of ``m`` ending
  before position ``end`` (``SpanFirstQuery.java`` semantics)

``span_matches`` returns (doc_id, n_spans) for docs with >= 1 match —
the SpanWeight.getSpans + per-doc iteration analog, fully relational.
"""

from __future__ import annotations

from dataclasses import dataclass

from pyspark.sql import DataFrame, functions as F

from lucene_1_spark.search import intervals as iv


class SpanQuery:
    pass


@dataclass(frozen=True)
class SpanTermQuery(SpanQuery):
    term: str


@dataclass(frozen=True)
class SpanNearQuery(SpanQuery):
    clauses: tuple
    slop: int = 0
    in_order: bool = True

    def __post_init__(self):
        if len(self.clauses) < 2:
            raise ValueError("SpanNearQuery needs >= 2 clauses")


@dataclass(frozen=True)
class SpanOrQuery(SpanQuery):
    clauses: tuple

    def __post_init__(self):
        if not self.clauses:
            raise ValueError("SpanOrQuery needs >= 1 clause")


@dataclass(frozen=True)
class SpanNotQuery(SpanQuery):
    include: SpanQuery
    exclude: SpanQuery
    pre: int = 0
    post: int = 0


@dataclass(frozen=True)
class SpanFirstQuery(SpanQuery):
    match: SpanQuery
    end: int  # spans must END before this position (exclusive)


@dataclass(frozen=True)
class SpanPositionRangeQuery(SpanQuery):
    """Spans whose start position is >= ``start`` AND that end before
    ``end`` (``queries/spans/SpanPositionRangeQuery.java``);
    SpanFirstQuery is the start=0 special case."""
    match: SpanQuery
    start: int
    end: int


def to_interval_source(q: SpanQuery):
    """Reduce a span tree to an interval source spec
    (``search.intervals`` combinators)."""
    if isinstance(q, SpanTermQuery):
        return iv.term(q.term)
    if isinstance(q, SpanNearQuery):
        if not q.in_order:
            raise ValueError(
                "unordered SpanNear reduces to the unordered "
                "minimal-window sweep over terms — use span_matches, "
                "which routes it there")
        return iv.ordered_source(*[to_interval_source(c)
                                   for c in q.clauses],
                                 max_gaps=q.slop)
    if isinstance(q, SpanOrQuery):
        return iv.or_source(*[to_interval_source(c) for c in q.clauses])
    if isinstance(q, SpanNotQuery):
        return iv.not_overlapping_source(
            to_interval_source(q.include),
            iv.extend_source(to_interval_source(q.exclude),
                             q.pre, q.post))
    if isinstance(q, (SpanFirstQuery, SpanPositionRangeQuery)):
        # handled by span_matches (needs a position filter the source
        # algebra has no combinator for); reduce the inner part
        return to_interval_source(q.match)
    raise ValueError(f"not a span query: {type(q).__name__}")


def span_matches(searcher, q: SpanQuery) -> DataFrame:
    """(doc_id, n_spans) for every doc with >= 1 matching span.
    Tombstoned docs are masked like every other query path."""
    if isinstance(q, SpanNearQuery) and not q.in_order:
        if not all(isinstance(c, SpanTermQuery) for c in q.clauses):
            raise ValueError(
                "unordered SpanNear supports term clauses only "
                "(documented deviation — the unordered sweep is "
                "term-based)")
        out = iv.unordered_interval_counts(
            searcher, [c.term for c in q.clauses], max_gaps=q.slop)
        out = out.select("doc_id",
                         F.col(out.columns[1]).alias("n_spans"))
    else:
        spans = iv.source_spans(searcher, to_interval_source(q))
        if isinstance(q, (SpanFirstQuery, SpanPositionRangeQuery)):
            start = int(getattr(q, "start", 0))
            ok = F.zip_with(
                "starts", "ends",
                lambda s, e: (s >= F.lit(start))
                & (e < F.lit(int(q.end))))
            spans = spans.select(
                "doc_id",
                F.size(F.filter(ok, lambda x: x)).alias("n_spans"))
        else:
            spans = spans.select(
                "doc_id", F.size("starts").alias("n_spans"))
        out = spans
    out = out.filter(F.col("n_spans") > 0)
    if searcher.reader.has_deletes:
        out = out.join(searcher.reader.tombstones(), "doc_id",
                       "left_anti")
    return out
