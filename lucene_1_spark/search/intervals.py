"""Intervals algebra (subset) — the reference's
``lucene/queries/.../intervals/Intervals.java`` ordered/unordered
sources with ``maxgaps``, re-expressed over the positional index.

Scope:

- **ordered(a, b, max_gaps)** — minimal intervals where `a` precedes
  `b` with at most ``max_gaps`` positions between them.  Minimal
  intervals computed exactly: for each occurrence of `b`, the closest
  preceding `a`; of intervals sharing that `a`, only the shortest is
  minimal (``intervals/OrderedIntervalsSource.java`` semantics).
- **unordered_n(t1..tn, max_gaps)** (:func:`unordered_interval_counts`)
  — minimal unordered n-term windows via the classic smallest-window
  sweep (advance the list holding the window minimum; suffix-min
  minimality filter).
- **unordered(a, b, max_gaps)** — for each `a`, the nearest `b` on
  either side within ``max_gaps`` (a documented simplification of
  UnorderedIntervalsSource's minimal-window walk: windows are deduped
  per `a`, not globally minimized).
- **ordered_n(t1..tn, max_gaps)** (:func:`ordered_interval_counts`) —
  n-term minimal ordered intervals via the greedy leapfrog: from each
  t1 occurrence, chain to the smallest strictly-later t2, then t3, ...;
  of the greedy intervals (ends are monotone in starts) only the
  LAST start per distinct end is minimal.  gaps = (end - start + 1) - n.
- **containment combinators** (:func:`containment_counts`) — the
  ``Intervals.containing`` / ``contained_by`` / ``not_containing``
  algebra (``intervals/ContainedByIntervalsSource.java``,
  ``FilteringIntervalsSource.java``) over two ordered interval sources:
  an outer interval [s,e] contains an inner [s',e'] iff s<=s' and
  e'<=e.  Both sides use this module's minimal-interval semantics; the
  containment test per doc is two searchsorted + a suffix-min (no
  per-interval loop).  A single term is a width-1 interval source.

- **filter/positioning combinators** — ``before`` / ``after`` /
  ``extend`` / ``maxwidth`` / ``overlapping`` / ``nonOverlapping`` /
  ``within`` / ``notWithin`` (``queries/intervals/Intervals.java:
  376-587``) as additional source-spec kinds over the same spans
  representation; ``notWithin`` and ``within`` compose exactly as the
  reference does (extend the subtrahend by ``positions`` on both
  sides, then (non)overlap).

Execution reuses the phrase machinery shape: candidate docs from the
cheap docs-only decode, positions decoded only for candidate-bearing
blocks, one vectorized kernel per doc row."""

from __future__ import annotations

import numpy as np
import pandas as pd
from pyspark.sql import DataFrame, functions as F, types as T


def _pivot_positions(searcher, blocks_all, cand_b,
                     term_lists: list[list[str]]) -> DataFrame:
    """(doc_id, p0..pn) position arrays for candidate docs — ONE
    positions decode over every term's candidate-pruned blocks and one
    per-doc aggregation (the per-term decode + one-join-per-side shape
    cost an exchange and a join per operand).  ``term_lists[i]`` holds
    the member terms feeding ``p{i}``; a single-member list reproduces
    its raw positions verbatim (per-term positions are already sorted
    and distinct), multi-member lists take the sorted distinct union —
    identical to the joined-frames result for candidate docs, which by
    construction hold >=1 member of every list."""
    from lucene_1_spark.search.executor import (POS_COLS,
                                                POSITIONS_TERM_SCHEMA)
    pruned = blocks_all.join(
        cand_b, (F.col("doc_id") >= F.col("first_doc"))
        & (F.col("doc_id") <= F.col("last_doc")), "left_semi")
    dec = (pruned.select("term", *POS_COLS)
           .mapInPandas(searcher._decode_positions_kernel(with_term=True),
                        POSITIONS_TERM_SCHEMA)
           .join(cand_b, "doc_id", "left_semi"))
    aggs = []
    for i, ts in enumerate(term_lists):
        aggs.append(F.sort_array(F.array_distinct(F.flatten(
            F.collect_list(F.when(F.col("term").isin(list(ts)),
                                  F.col("positions")))))).alias(f"p{i}"))
    return dec.groupBy("doc_id").agg(*aggs)


def interval_counts(searcher, term_a: str, term_b: str,
                    mode: str = "ordered", max_gaps: int = 0) -> DataFrame:
    """(doc_id, n_intervals) for docs with >= 1 matching interval."""
    if searcher.reader.cfg.get("positions") is not True:
        raise ValueError("intervals need a positions=True index")
    spark = searcher.spark
    from lucene_1_spark.search.executor import empty_df
    empty = empty_df(spark, "doc_id long, n_intervals long")
    stats = searcher.reader.term_statistics(sorted({term_a, term_b}))
    if term_a not in stats or term_b not in stats:
        return empty

    from lucene_1_spark.search.executor import (DECODED_SCHEMA,
                                                DOCS_ONLY_COLS, POS_COLS,
                                                POSITIONS_SCHEMA)
    blocks_all = searcher._blocks_for(sorted({term_a, term_b}))
    docs_only = blocks_all.select(*DOCS_ONLY_COLS).mapInPandas(
        searcher._decode_kernel({}, want_scores=False), DECODED_SCHEMA)
    cand = (docs_only.groupBy("doc_id")
            .agg(F.count_distinct("term").alias("_nt"))
            .filter(F.col("_nt") == 2).select("doc_id"))
    cand_b = F.broadcast(cand)
    joined = _pivot_positions(searcher, blocks_all, cand_b,
                              [[term_a], [term_b]])

    g = int(max_gaps)
    ordered = mode == "ordered"

    from pyspark.sql.functions import pandas_udf

    @pandas_udf("long")
    def count_intervals(pa: pd.Series, pb: pd.Series) -> pd.Series:
        out = np.zeros(len(pa), dtype=np.int64)
        for r in range(len(pa)):
            A = np.asarray(pa.iloc[r], dtype=np.int64)
            B = np.asarray(pb.iloc[r], dtype=np.int64)
            if ordered:
                idx = np.searchsorted(A, B, side="left") - 1
                ok = idx >= 0
                if not ok.any():
                    continue
                idxv, bv = idx[ok], B[ok]
                first = np.concatenate([[True], idxv[1:] != idxv[:-1]])
                gaps = bv - A[idxv] - 1
                out[r] = int(((gaps <= g) & first).sum())
            else:
                lo = np.searchsorted(B, A, side="left")
                left = np.where(lo > 0, A - B[np.maximum(lo - 1, 0)],
                                np.iinfo(np.int64).max)
                right = np.where(lo < len(B),
                                 B[np.minimum(lo, len(B) - 1)] - A,
                                 np.iinfo(np.int64).max)
                width = np.minimum(left, right) - 1
                out[r] = int((width <= g).sum())
        return pd.Series(out)

    return (joined.withColumn("n_intervals",
                              count_intervals("p0", "p1"))
            .filter(F.col("n_intervals") > 0)
            .select("doc_id", "n_intervals"))


def _ordered_spans(searcher, terms: list[str],
                   max_gaps: int = 0) -> DataFrame:
    """(doc_id, starts, ends): per-doc minimal ordered intervals of the
    term sequence (ascending starts).  A single term yields its
    positions as width-1 intervals."""
    if searcher.reader.cfg.get("positions") is not True:
        raise ValueError("intervals need a positions=True index")
    spark = searcher.spark
    n_terms = len(terms)
    schema = "doc_id long, starts array<long>, ends array<long>"
    from lucene_1_spark.search.executor import empty_df
    empty = empty_df(spark, schema)
    uniq = sorted(set(terms))
    stats = searcher.reader.term_statistics(uniq)
    if any(t not in stats for t in uniq):
        return empty

    from lucene_1_spark.search.executor import (DECODED_SCHEMA,
                                                DOCS_ONLY_COLS, POS_COLS,
                                                POSITIONS_SCHEMA)
    blocks_all = searcher._blocks_for(uniq)
    if n_terms == 1:
        dec = blocks_all.select(*POS_COLS).mapInPandas(searcher._decode_positions_kernel(),
                                     POSITIONS_SCHEMA)
        return dec.select("doc_id",
                          F.col("positions").cast("array<long>")
                          .alias("starts"),
                          F.col("positions").cast("array<long>")
                          .alias("ends"))

    docs_only = blocks_all.select(*DOCS_ONLY_COLS).mapInPandas(
        searcher._decode_kernel({}, want_scores=False), DECODED_SCHEMA)
    cand = (docs_only.groupBy("doc_id")
            .agg(F.count_distinct("term").alias("_nt"))
            .filter(F.col("_nt") == len(uniq)).select("doc_id"))
    cand_b = F.broadcast(cand)
    joined = _pivot_positions(searcher, blocks_all, cand_b,
                              [[t] for t in terms])

    g = int(max_gaps)

    from pyspark.sql.functions import pandas_udf

    @pandas_udf(T.ArrayType(T.ArrayType(T.LongType())))
    def spans(*plists: pd.Series) -> pd.Series:
        out = []
        for r in range(len(plists[0])):
            starts = np.asarray(plists[0].iloc[r], dtype=np.int64)
            ends = starts.copy()
            valid = np.ones(len(starts), dtype=bool)
            for i in range(1, n_terms):
                pi = np.asarray(plists[i].iloc[r], dtype=np.int64)
                idx = np.searchsorted(pi, ends, side="right")
                valid &= idx < len(pi)
                ends = pi[np.minimum(idx, len(pi) - 1)]
            s, e = starts[valid], ends[valid]
            if len(s):
                keep = np.concatenate([e[:-1] != e[1:], [True]])
                keep &= ((e - s + 1) - n_terms) <= g
                s, e = s[keep], e[keep]
            out.append([s.tolist(), e.tolist()])
        return pd.Series(out)

    return (joined.withColumn(
                "_se", spans(*[F.col(f"p{i}") for i in range(n_terms)]))
            .select("doc_id", F.col("_se")[0].alias("starts"),
                    F.col("_se")[1].alias("ends")))


def unordered_interval_counts(searcher, terms: list[str],
                              max_gaps: int = 0) -> DataFrame:
    """(doc_id, n_intervals): minimal unordered n-term windows with at
    most ``max_gaps`` gap positions — ``Intervals.unordered`` for any
    arity (``intervals/UnorderedIntervalsSource.java`` minimal-window
    semantics): the classic smallest-window sweep (advance the list
    holding the window's minimum), then drop windows containing a later
    window (suffix-min filter)."""
    if searcher.reader.cfg.get("positions") is not True:
        raise ValueError("intervals need a positions=True index")
    spark = searcher.spark
    n_terms = len(terms)
    if n_terms < 2:
        raise ValueError("unordered intervals need >= 2 terms")
    if len(set(terms)) != n_terms:
        # Lucene's unordered source requires repeats to occupy DISTINCT
        # positions; this engine has no per-occurrence assignment, so
        # reject instead of silently deduping (which would count every
        # single occurrence as a window)
        raise ValueError("unordered intervals require distinct terms")
    from lucene_1_spark.search.executor import empty_df
    empty = empty_df(spark, "doc_id long, n_intervals long")
    uniq = sorted(set(terms))
    stats = searcher.reader.term_statistics(uniq)
    if any(t not in stats for t in uniq):
        return empty
    # positions per term for candidate docs (same plumbing as ordered)
    joined = None
    from lucene_1_spark.search.executor import (DECODED_SCHEMA,
                                                DOCS_ONLY_COLS, POS_COLS,
                                                POSITIONS_SCHEMA)
    blocks_all = searcher._blocks_for(uniq)
    docs_only = blocks_all.select(*DOCS_ONLY_COLS).mapInPandas(
        searcher._decode_kernel({}, want_scores=False), DECODED_SCHEMA)
    cand = (docs_only.groupBy("doc_id")
            .agg(F.count_distinct("term").alias("_nt"))
            .filter(F.col("_nt") == len(uniq)).select("doc_id"))
    cand_b = F.broadcast(cand)
    joined = _pivot_positions(searcher, blocks_all, cand_b,
                              [[t] for t in uniq])

    g = int(max_gaps)
    k = len(uniq)

    from pyspark.sql.functions import pandas_udf

    @pandas_udf("long")
    def count_windows(*plists: pd.Series) -> pd.Series:
        # Vectorized smallest-window sweep (replaces the former
        # per-position Python heap loop — the last row-at-a-time kernel
        # in the query path).  Derivation: the heap sweep pops positions
        # in sorted order, so when position p is the window minimum,
        # every list's current head is its smallest element >= p and
        # the window end is the max of those heads.  That turns the
        # whole sweep into ONE searchsorted per list over the merged
        # position array — O(k * n log n) numpy, no interpreter loop.
        # (Assumes distinct positions per doc, which single-token-per-
        # position analyzers guarantee; same caveat as the heap had.)
        out = np.zeros(len(plists[0]), dtype=np.int64)
        for r in range(len(plists[0])):
            lists = [np.asarray(plists[i].iloc[r], dtype=np.int64)
                     for i in range(k)]
            P = np.sort(np.concatenate(lists))
            valid = np.ones(len(P), dtype=bool)
            end = np.full(len(P), np.iinfo(np.int64).min)
            for lst in lists:
                idx = np.searchsorted(lst, P, side="left")
                ok = idx < len(lst)
                valid &= ok
                head = lst[np.minimum(idx, len(lst) - 1)]
                end = np.maximum(end, np.where(ok, head, end))
            s, e = P[valid], end[valid]
            if len(s) == 0:
                continue
            # minimal: no later window (start ascending) with e' <= e
            sufmin = np.minimum.accumulate(e[::-1])[::-1]
            keep = np.ones(len(e), dtype=bool)
            keep[:-1] = e[:-1] < sufmin[1:]
            keep &= ((e - s + 1) - k) <= g
            out[r] = int(keep.sum())
        return pd.Series(out)

    return (joined.withColumn(
                "n_intervals",
                count_windows(*[F.col(f"p{i}") for i in range(k)]))
            .filter(F.col("n_intervals") > 0)
            .select("doc_id", "n_intervals"))


def containment_counts(searcher, outer_terms: list[str],
                       inner_terms: list[str], mode: str = "containing",
                       outer_gaps: int = 2, inner_gaps: int = 0) \
        -> DataFrame:
    """(doc_id, n_intervals) of the FIRST source's minimal intervals
    filtered by a containment relation to the second source's:

    - ``containing``     — outer intervals containing >= 1 inner
    - ``not_containing`` — outer intervals containing NO inner
    - ``contained_by``   — outer intervals contained by >= 1 inner

    The per-doc test is vectorized: intervals arrive start-sorted, so
    "contains some inner" is one searchsorted + a suffix-min of inner
    ends, and "contained by some inner" one searchsorted + a prefix-max
    (``intervals/ContainedByIntervalsSource.java`` semantics over this
    module's minimal-interval sources)."""
    if mode not in ("containing", "not_containing", "contained_by"):
        raise ValueError(f"unknown containment mode: {mode}")

    def spans_of(src, gaps):
        # a list of terms keeps the original ordered-terms fast path;
        # a tuple spec routes through the combinator algebra
        # (Intervals.or / phrase / nested ordered)
        if isinstance(src, tuple) and src and isinstance(src[0], str) \
                and src[0] in (("term", "ordered", "or", "phrase")
                               + _UNARY_KINDS + _BINARY_KINDS):
            return source_spans(searcher, src)
        return _ordered_spans(searcher, list(src), gaps)

    outer = spans_of(outer_terms, outer_gaps)
    inner = (spans_of(inner_terms, inner_gaps)
             .select(F.col("doc_id"), F.col("starts").alias("i_starts"),
                     F.col("ends").alias("i_ends")))
    how = "left" if mode == "not_containing" else "inner"
    joined = outer.join(inner, "doc_id", how)
    m = mode

    from pyspark.sql.functions import pandas_udf

    @pandas_udf("long")
    def count_rel(os_, oe_, is_, ie_):
        out = np.zeros(len(os_), dtype=np.int64)
        big = np.int64(1) << 62
        for r in range(len(os_)):
            o_s = np.asarray(os_.iloc[r], dtype=np.int64)
            o_e = np.asarray(oe_.iloc[r], dtype=np.int64)
            iv_s = is_.iloc[r]
            if iv_s is None or len(iv_s) == 0:
                out[r] = len(o_s) if m == "not_containing" else 0
                continue
            i_s = np.asarray(iv_s, dtype=np.int64)
            i_e = np.asarray(ie_.iloc[r], dtype=np.int64)
            if m == "contained_by":
                premax = np.maximum.accumulate(i_e)
                j = np.searchsorted(i_s, o_s, side="right") - 1
                has = (j >= 0) & (premax[np.maximum(j, 0)] >= o_e)
                out[r] = int(has.sum())
            else:
                sufmin = np.minimum.accumulate(i_e[::-1])[::-1]
                i0 = np.searchsorted(i_s, o_s, side="left")
                inb = i0 < len(i_s)
                me = np.where(inb, sufmin[np.minimum(i0, len(i_s) - 1)], big)
                has = inb & (me <= o_e)
                out[r] = int(has.sum() if m == "containing"
                             else (~has).sum())
        return pd.Series(out)

    return (joined.withColumn(
                "n_intervals", count_rel("starts", "ends",
                                         "i_starts", "i_ends"))
            .filter(F.col("n_intervals") > 0)
            .select("doc_id", "n_intervals"))


# ---------------------------------------------------------------------------
# interval SOURCE combinators — the nested-source algebra of
# ``queries/intervals/Intervals.java:97-134`` (ordered / or / phrase
# over arbitrary sources, not just raw term lists).  A source spec is a
# nested tuple:
#
#   "t"                          term source (width-1 intervals)
#   ("ordered", (s1, s2, ...), max_gaps)
#   ("or", (s1, s2, ...))
#   ("phrase", (s1, s2, ...))    exact adjacency (Intervals.phrase)
#
# Every node yields MINIMAL intervals per doc (starts and ends both
# strictly increasing, no interval containing another), which is what
# makes the searchsorted chaining exact.  ``max_gaps`` counts gap
# positions between the CHOSEN child intervals — a child's internal
# gaps belong to the child (IntervalIterator.gaps() semantics).
# ---------------------------------------------------------------------------

def term(t: str):
    return ("term", t)


def ordered_source(*sources, max_gaps: int = 1 << 30):
    return ("ordered", tuple(_norm_source(s) for s in sources),
            int(max_gaps))


def or_source(*sources):
    return ("or", tuple(_norm_source(s) for s in sources))


def phrase_source(*sources):
    return ("phrase", tuple(_norm_source(s) for s in sources))


# -- the filter/positioning combinator tail
#    (``queries/intervals/Intervals.java:376-587``) -----------------------

def extend_source(source, before: int, after: int):
    """``Intervals.extend``: widen each interval by ``before`` positions
    at the start (clipped at 0) and ``after`` at the end
    (``ExtendedIntervalsSource``)."""
    return ("extend", _norm_source(source), int(before), int(after))


def max_width_source(source, width: int):
    """``Intervals.maxwidth``: keep intervals spanning at most ``width``
    positions (``FilteredIntervalsSource.maxWidth``)."""
    return ("maxwidth", _norm_source(source), int(width))


def overlapping_source(source, reference):
    """``Intervals.overlapping``: intervals of ``source`` that overlap
    >= 1 interval of ``reference`` (``OverlappingIntervalsSource``)."""
    return ("overlapping", _norm_source(source), _norm_source(reference))


def not_overlapping_source(minuend, subtrahend):
    """``Intervals.nonOverlapping``: intervals of ``minuend`` that
    overlap NO interval of ``subtrahend``."""
    return ("not_overlapping", _norm_source(minuend),
            _norm_source(subtrahend))


def before_source(source, reference):
    """``Intervals.before`` (Intervals.java:578-581): intervals of
    ``source`` ending before the start of some ``reference`` interval —
    the reference composes contained_by(src, extend(offset(ref,
    before), MAX, 0)), which reduces to ``src.end < max(ref.start)``."""
    return ("before", _norm_source(source), _norm_source(reference))


def after_source(source, reference):
    """``Intervals.after`` (Intervals.java:584-587): intervals of
    ``source`` starting after the end of some ``reference`` interval
    (``src.start > min(ref.end)``)."""
    return ("after", _norm_source(source), _norm_source(reference))


def within_source(source, positions: int, reference):
    """``Intervals.within``: source intervals within ``positions`` of a
    reference interval — overlapping(src, extend(ref, n, n))."""
    return overlapping_source(source,
                              extend_source(reference, positions, positions))


def not_within_source(minuend, positions: int, subtrahend):
    """``Intervals.notWithin`` (Intervals.java:490-494): exactly
    nonOverlapping(minuend, extend(subtrahend, positions, positions))."""
    return not_overlapping_source(
        minuend, extend_source(subtrahend, positions, positions))


def _norm_source(s):
    if isinstance(s, str):
        return ("term", s)
    return s


_UNARY_KINDS = ("extend", "maxwidth")
_BINARY_KINDS = ("overlapping", "not_overlapping", "before", "after")


def _children_of(source) -> tuple:
    kind = source[0]
    if kind == "term":
        return ()
    if kind in _UNARY_KINDS:
        return (source[1],)
    if kind in _BINARY_KINDS:
        return (source[1], source[2])
    return tuple(source[1])


def _source_terms(source) -> set[str]:
    if source[0] == "term":
        return {source[1]}
    out: set[str] = set()
    for c in _children_of(source):
        out |= _source_terms(c)
    return out


_SPANS_SCHEMA = "doc_id long, starts array<long>, ends array<long>"


def _required_terms(source) -> set[str]:
    """Leaf terms that EVERY match of the source must contain: all
    children of ordered/phrase (conjunctive), nothing under an 'or'
    (disjunctive); for positive binary filters (overlapping / before /
    after) both sides are required, for not_overlapping only the
    minuend — the candidate-pruning key set."""
    kind = source[0]
    if kind == "term":
        return {source[1]}
    if kind == "or":
        return set()
    if kind == "not_overlapping":
        return _required_terms(source[1])
    out: set[str] = set()
    for c in _children_of(source):
        out |= _required_terms(c)
    return out


def _term_spans(searcher, t: str, cand_b=None) -> DataFrame:
    """Positions of one term as width-1 intervals; with a broadcast
    candidate set, position blocks decode ONLY where the block's doc
    range holds a candidate (the skip-list hop, same pruning as the
    term-list interval paths)."""
    from lucene_1_spark.search.executor import (POS_COLS,
                                                POSITIONS_SCHEMA)
    stats = searcher.reader.term_statistics([t])
    if t not in stats:
        return searcher.spark.createDataFrame([], _SPANS_SCHEMA)
    blocks = searcher._blocks_for([t])
    if cand_b is not None:
        blocks = blocks.join(
            cand_b, (F.col("doc_id") >= F.col("first_doc"))
            & (F.col("doc_id") <= F.col("last_doc")), "left_semi")
    dec = blocks.select(*POS_COLS).mapInPandas(
        searcher._decode_positions_kernel(), POSITIONS_SCHEMA)
    if cand_b is not None:
        dec = dec.join(cand_b, "doc_id", "left_semi")
    return dec.select(
        "doc_id",
        F.col("positions").cast("array<long>").alias("starts"),
        F.col("positions").cast("array<long>").alias("ends"))


def source_spans(searcher, source) -> DataFrame:
    """(doc_id, starts, ends): the source's minimal intervals per doc —
    recursive evaluation, one inner/outer join per combinator level
    plus a vectorized per-row numpy kernel.

    Candidate pruning: the root's REQUIRED leaf terms (conjunctive
    children only) intersect via a cheap docs-only decode first; every
    leaf's positions decode is then block-range pruned to that
    candidate set — no positions are decoded for docs that cannot
    match."""
    if searcher.reader.cfg.get("positions") is not True:
        raise ValueError("intervals need a positions=True index")
    source = _norm_source(source)
    cand_b = None
    req = sorted(_required_terms(source))
    req = [t for t in req if t in searcher.reader.term_statistics(req)]
    if len(req) >= 2:
        from lucene_1_spark.search.executor import (DECODED_SCHEMA,
                                                    DOCS_ONLY_COLS)
        docs_only = searcher._blocks_for(req).select(*DOCS_ONLY_COLS) \
            .mapInPandas(
            searcher._decode_kernel({}, want_scores=False), DECODED_SCHEMA)
        cand = (docs_only.groupBy("doc_id")
                .agg(F.count_distinct("term").alias("_nt"))
                .filter(F.col("_nt") == len(req)).select("doc_id"))
        cand_b = F.broadcast(cand)
    return _source_spans(searcher, source, cand_b)


def _source_spans(searcher, source, cand_b) -> DataFrame:
    kind = source[0]
    if kind == "term":
        return _term_spans(searcher, source[1], cand_b)
    if kind in _UNARY_KINDS:
        inner = _source_spans(searcher, source[1], cand_b)
        if kind == "extend":
            bef, aft = int(source[2]), int(source[3])
            return inner.select(
                "doc_id",
                F.transform(F.col("starts"),
                            lambda s: F.greatest(s - bef, F.lit(0)))
                .alias("starts"),
                F.transform(F.col("ends"), lambda e: e + aft).alias("ends"))
        w = int(source[2])  # maxwidth
        keep = F.filter(
            F.arrays_zip(F.col("starts").alias("s"),
                         F.col("ends").alias("e")),
            lambda p: (p["e"] - p["s"] + 1) <= w)
        return (inner.select(
                    "doc_id",
                    F.transform(keep, lambda p: p["s"]).alias("starts"),
                    F.transform(keep, lambda p: p["e"]).alias("ends"))
                .filter(F.size("starts") > 0))
    if kind in _BINARY_KINDS:
        return _filtered_spans(searcher, kind, source[1], source[2], cand_b)
    children = [_source_spans(searcher, c, cand_b) for c in source[1]]
    n = len(children)
    if n == 1:
        return children[0]
    how = "outer" if kind == "or" else "inner"
    joined = None
    for i, c in enumerate(children):
        c = c.select("doc_id", F.col("starts").alias(f"s{i}"),
                     F.col("ends").alias(f"e{i}"))
        joined = c if joined is None else joined.join(c, "doc_id", how)
    if kind == "or":  # absent children contribute no intervals
        empty = F.array().cast("array<long>")
        joined = joined.select(
            "doc_id", *[F.coalesce(F.col(f"{p}{i}"), empty)
                        .alias(f"{p}{i}")
                        for i in range(n) for p in ("s", "e")])
    g = int(source[2]) if kind == "ordered" else 0
    mode = kind

    from pyspark.sql.functions import pandas_udf

    @pandas_udf(T.ArrayType(T.ArrayType(T.LongType())))
    def combine(*cols: pd.Series) -> pd.Series:
        out = []
        for r in range(len(cols[0])):
            ch = [(np.asarray(cols[2 * i].iloc[r], dtype=np.int64),
                   np.asarray(cols[2 * i + 1].iloc[r], dtype=np.int64))
                  for i in range(n)]
            if mode == "or":
                s = np.concatenate([c[0] for c in ch])
                e = np.concatenate([c[1] for c in ch])
                if len(s):
                    order = np.lexsort((e, s))
                    s, e = s[order], e[order]
                    first = np.concatenate([[True], s[1:] != s[:-1]])
                    s, e = s[first], e[first]  # same start: keep min end
                    sufmin = np.minimum.accumulate(e[::-1])[::-1]
                    keep = np.ones(len(e), dtype=bool)
                    keep[:-1] = e[:-1] < sufmin[1:]
                    s, e = s[keep], e[keep]
                out.append([s.tolist(), e.tolist()])
                continue
            # ordered / phrase: greedy searchsorted chain over minimal
            # child interval lists (starts AND ends ascending)
            s0, e0 = ch[0]
            starts = s0
            ends = e0.copy()
            content = (e0 - s0 + 1).astype(np.int64)
            valid = np.ones(len(s0), dtype=bool)
            for i in range(1, n):
                cs, ce = ch[i]
                if len(cs) == 0:
                    valid[:] = False
                    break
                if mode == "phrase":
                    idx = np.searchsorted(cs, ends + 1, side="left")
                    idxc = np.minimum(idx, len(cs) - 1)
                    ok = (idx < len(cs)) & (cs[idxc] == ends + 1)
                else:
                    idx = np.searchsorted(cs, ends, side="right")
                    ok = idx < len(cs)
                    idxc = np.minimum(idx, len(cs) - 1)
                valid &= ok
                content = content + (ce[idxc] - cs[idxc] + 1)
                ends = ce[idxc]
            s, e, c = starts[valid], ends[valid], content[valid]
            if len(s):
                # minimal: last start per distinct end
                keep = np.concatenate([e[:-1] != e[1:], [True]])
                if mode == "ordered":
                    keep &= ((e - s + 1) - c) <= g
                s, e = s[keep], e[keep]
            out.append([s.tolist(), e.tolist()])
        return pd.Series(out)

    cols = [F.col(f"{p}{i}") for i in range(n) for p in ("s", "e")]
    return (joined.withColumn("_se", combine(*cols))
            .select("doc_id", F.col("_se")[0].alias("starts"),
                    F.col("_se")[1].alias("ends"))
            .filter(F.size("starts") > 0))


def _filtered_spans(searcher, kind: str, src, ref, cand_b) -> DataFrame:
    """Binary filter combinators over two span sources — per doc, one
    vectorized pass (reference intervals arrive start-sorted with
    ascending ends, so the overlap test is one searchsorted):

    - ``overlapping``      src intervals overlapping >= 1 ref interval
    - ``not_overlapping``  src intervals overlapping NO ref interval
                           (missing ref in a doc keeps ALL src)
    - ``before``           src.end < max(ref.start)
    - ``after``            src.start > min(ref.end)
    """
    left = _source_spans(searcher, src, cand_b)
    right = (_source_spans(searcher, ref, cand_b)
             .select("doc_id", F.col("starts").alias("r_starts"),
                     F.col("ends").alias("r_ends")))
    how = "left" if kind == "not_overlapping" else "inner"
    joined = left.join(right, "doc_id", how)
    k = kind

    from pyspark.sql.functions import pandas_udf

    @pandas_udf(T.ArrayType(T.ArrayType(T.LongType())))
    def filt(ss, es, rs, re_):
        out = []
        for r in range(len(ss)):
            s = np.asarray(ss.iloc[r], dtype=np.int64)
            e = np.asarray(es.iloc[r], dtype=np.int64)
            rv = rs.iloc[r]
            if rv is None or len(rv) == 0:
                if k == "not_overlapping":
                    out.append([s.tolist(), e.tolist()])
                else:
                    out.append([[], []])
                continue
            r_s = np.asarray(rv, dtype=np.int64)
            r_e = np.asarray(re_.iloc[r], dtype=np.int64)
            if k == "before":
                keep = e < r_s.max()
            elif k == "after":
                keep = s > r_e.min()
            else:
                # overlap with some ref [s', e']: s' <= e and e' >= s.
                # refs are start-sorted with ascending ends, so among
                # refs with s' <= e the maximal end is r_e[hi-1]
                hi = np.searchsorted(r_s, e, side="right")
                has = (hi > 0) & (r_e[np.maximum(hi - 1, 0)] >= s)
                keep = has if k == "overlapping" else ~has
            out.append([s[keep].tolist(), e[keep].tolist()])
        return pd.Series(out)

    return (joined.withColumn(
                "_se", filt("starts", "ends", "r_starts", "r_ends"))
            .select("doc_id", F.col("_se")[0].alias("starts"),
                    F.col("_se")[1].alias("ends"))
            .filter(F.size("starts") > 0))


def source_interval_counts(searcher, source) -> DataFrame:
    """(doc_id, n_intervals) for any combinator source spec."""
    return (source_spans(searcher, source)
            .select("doc_id", F.size("starts").cast("long")
                    .alias("n_intervals")))


def ordered_interval_counts(searcher, terms: list[str],
                            max_gaps: int = 0) -> DataFrame:
    """(doc_id, n_intervals): minimal ordered n-term intervals with at
    most ``max_gaps`` total gap positions — the general
    ``Intervals.ordered(...)`` + ``Intervals.maxgaps(...)`` source
    (``intervals/OrderedIntervalsSource.java``, minimal-interval
    semantics via the greedy leapfrog)."""
    if searcher.reader.cfg.get("positions") is not True:
        raise ValueError("intervals need a positions=True index")
    spark = searcher.spark
    n_terms = len(terms)
    if n_terms < 2:
        raise ValueError("ordered intervals need >= 2 terms")
    from lucene_1_spark.search.executor import empty_df
    empty = empty_df(spark, "doc_id long, n_intervals long")
    uniq = sorted(set(terms))
    stats = searcher.reader.term_statistics(uniq)
    if any(t not in stats for t in uniq):
        return empty

    from lucene_1_spark.search.executor import (DECODED_SCHEMA,
                                                DOCS_ONLY_COLS, POS_COLS,
                                                POSITIONS_SCHEMA)
    blocks_all = searcher._blocks_for(uniq)
    docs_only = blocks_all.select(*DOCS_ONLY_COLS).mapInPandas(
        searcher._decode_kernel({}, want_scores=False), DECODED_SCHEMA)
    cand = (docs_only.groupBy("doc_id")
            .agg(F.count_distinct("term").alias("_nt"))
            .filter(F.col("_nt") == len(uniq)).select("doc_id"))
    cand_b = F.broadcast(cand)

    joined = _pivot_positions(searcher, blocks_all, cand_b,
                              [[t] for t in terms])

    g = int(max_gaps)

    from pyspark.sql.functions import pandas_udf

    @pandas_udf("long")
    def count_ordered(*plists: pd.Series) -> pd.Series:
        out = np.zeros(len(plists[0]), dtype=np.int64)
        for r in range(len(plists[0])):
            starts = np.asarray(plists[0].iloc[r], dtype=np.int64)
            ends = starts.copy()
            valid = np.ones(len(starts), dtype=bool)
            for i in range(1, n_terms):
                pi = np.asarray(plists[i].iloc[r], dtype=np.int64)
                idx = np.searchsorted(pi, ends, side="right")
                valid &= idx < len(pi)
                ends = pi[np.minimum(idx, len(pi) - 1)]
            s, e = starts[valid], ends[valid]
            if len(s) == 0:
                continue
            # greedy ends are non-decreasing in start: the minimal
            # interval per distinct end is the LAST (largest start)
            keep = np.concatenate([e[:-1] != e[1:], [True]])
            gaps = (e - s + 1) - n_terms
            out[r] = int(((gaps <= g) & keep).sum())
        return pd.Series(out)

    return (joined.withColumn(
                "n_intervals",
                count_ordered(*[F.col(f"p{i}") for i in range(n_terms)]))
            .filter(F.col("n_intervals") > 0)
            .select("doc_id", "n_intervals"))
