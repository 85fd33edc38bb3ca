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

Execution reuses the phrase machinery shape: candidate docs from the
cheap docs-only decode, positions decoded only for candidate-bearing
blocks, one vectorized kernel per doc row."""

from __future__ import annotations

import numpy as np
import pandas as pd
from pyspark.sql import DataFrame, functions as F, types as T


def interval_counts(searcher, term_a: str, term_b: str,
                    mode: str = "ordered", max_gaps: int = 0) -> DataFrame:
    """(doc_id, n_intervals) for docs with >= 1 matching interval."""
    if searcher.reader.cfg.get("positions") is not True:
        raise ValueError("intervals need a positions=True index")
    spark = searcher.spark
    empty = spark.createDataFrame([], "doc_id long, n_intervals long")
    stats = searcher.reader.term_statistics(sorted({term_a, term_b}))
    if term_a not in stats or term_b not in stats:
        return empty

    from lucene_1_spark.search.executor import (DECODED_SCHEMA,
                                                POSITIONS_SCHEMA)
    blocks_all = searcher._blocks_for(sorted({term_a, term_b}))
    docs_only = blocks_all.mapInPandas(
        searcher._decode_kernel({}, want_scores=False), DECODED_SCHEMA)
    cand = (docs_only.groupBy("doc_id")
            .agg(F.count_distinct("term").alias("_nt"))
            .filter(F.col("_nt") == 2).select("doc_id"))
    cand_b = F.broadcast(cand)

    sides = []
    for i, t in enumerate((term_a, term_b)):
        blocks_t = blocks_all.filter(F.col("term") == t)
        pruned = blocks_t.join(
            cand_b, (F.col("doc_id") >= F.col("first_doc"))
            & (F.col("doc_id") <= F.col("last_doc")), "left_semi")
        dec = (pruned.mapInPandas(searcher._decode_positions_kernel(),
                                  POSITIONS_SCHEMA)
               .join(cand_b, "doc_id", "left_semi")
               .select("doc_id", F.col("positions").alias(f"p{i}")))
        sides.append(dec)
    joined = sides[0].join(sides[1], "doc_id")

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
    empty = spark.createDataFrame([], schema)
    uniq = sorted(set(terms))
    stats = searcher.reader.term_statistics(uniq)
    if any(t not in stats for t in uniq):
        return empty

    from lucene_1_spark.search.executor import (DECODED_SCHEMA,
                                                POSITIONS_SCHEMA)
    blocks_all = searcher._blocks_for(uniq)
    if n_terms == 1:
        dec = blocks_all.mapInPandas(searcher._decode_positions_kernel(),
                                     POSITIONS_SCHEMA)
        return dec.select("doc_id",
                          F.col("positions").cast("array<long>")
                          .alias("starts"),
                          F.col("positions").cast("array<long>")
                          .alias("ends"))

    docs_only = blocks_all.mapInPandas(
        searcher._decode_kernel({}, want_scores=False), DECODED_SCHEMA)
    cand = (docs_only.groupBy("doc_id")
            .agg(F.count_distinct("term").alias("_nt"))
            .filter(F.col("_nt") == len(uniq)).select("doc_id"))
    cand_b = F.broadcast(cand)
    joined = None
    for i, t in enumerate(terms):
        blocks_t = blocks_all.filter(F.col("term") == t)
        pruned = blocks_t.join(
            cand_b, (F.col("doc_id") >= F.col("first_doc"))
            & (F.col("doc_id") <= F.col("last_doc")), "left_semi")
        dec = (pruned.mapInPandas(searcher._decode_positions_kernel(),
                                  POSITIONS_SCHEMA)
               .join(cand_b, "doc_id", "left_semi")
               .select("doc_id", F.col("positions").alias(f"p{i}")))
        joined = dec if joined is None else joined.join(dec, "doc_id")

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
    empty = spark.createDataFrame([], "doc_id long, n_intervals long")
    uniq = sorted(set(terms))
    stats = searcher.reader.term_statistics(uniq)
    if any(t not in stats for t in uniq):
        return empty
    # positions per term for candidate docs (same plumbing as ordered)
    joined = None
    from lucene_1_spark.search.executor import (DECODED_SCHEMA,
                                                POSITIONS_SCHEMA)
    blocks_all = searcher._blocks_for(uniq)
    docs_only = blocks_all.mapInPandas(
        searcher._decode_kernel({}, want_scores=False), DECODED_SCHEMA)
    cand = (docs_only.groupBy("doc_id")
            .agg(F.count_distinct("term").alias("_nt"))
            .filter(F.col("_nt") == len(uniq)).select("doc_id"))
    cand_b = F.broadcast(cand)
    for i, t in enumerate(uniq):
        blocks_t = blocks_all.filter(F.col("term") == t)
        pruned = blocks_t.join(
            cand_b, (F.col("doc_id") >= F.col("first_doc"))
            & (F.col("doc_id") <= F.col("last_doc")), "left_semi")
        dec = (pruned.mapInPandas(searcher._decode_positions_kernel(),
                                  POSITIONS_SCHEMA)
               .join(cand_b, "doc_id", "left_semi")
               .select("doc_id", F.col("positions").alias(f"p{i}")))
        joined = dec if joined is None else joined.join(dec, "doc_id")

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
    outer = _ordered_spans(searcher, outer_terms, outer_gaps)
    inner = (_ordered_spans(searcher, inner_terms, inner_gaps)
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
    empty = spark.createDataFrame([], "doc_id long, n_intervals long")
    uniq = sorted(set(terms))
    stats = searcher.reader.term_statistics(uniq)
    if any(t not in stats for t in uniq):
        return empty

    from lucene_1_spark.search.executor import (DECODED_SCHEMA,
                                                POSITIONS_SCHEMA)
    blocks_all = searcher._blocks_for(uniq)
    docs_only = blocks_all.mapInPandas(
        searcher._decode_kernel({}, want_scores=False), DECODED_SCHEMA)
    cand = (docs_only.groupBy("doc_id")
            .agg(F.count_distinct("term").alias("_nt"))
            .filter(F.col("_nt") == len(uniq)).select("doc_id"))
    cand_b = F.broadcast(cand)

    joined = None
    for i, t in enumerate(terms):
        blocks_t = blocks_all.filter(F.col("term") == t)
        pruned = blocks_t.join(
            cand_b, (F.col("doc_id") >= F.col("first_doc"))
            & (F.col("doc_id") <= F.col("last_doc")), "left_semi")
        dec = (pruned.mapInPandas(searcher._decode_positions_kernel(),
                                  POSITIONS_SCHEMA)
               .join(cand_b, "doc_id", "left_semi")
               .select("doc_id", F.col("positions").alias(f"p{i}")))
        joined = dec if joined is None else joined.join(dec, "doc_id")

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
