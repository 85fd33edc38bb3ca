"""Misc collectors: diversified top-k, doc-values stats, blended terms.

Reference:

- ``misc/search/DiversifiedTopDocsCollector.java:37-120`` — global
  top-N where at most ``maxHitsPerKey`` hits share a key ("IA-Select"
  style result diversification, e.g. max 3 hits per artist).
- ``misc/search/DocValuesStats.java`` / ``DocValuesStatsCollector.java``
  — single-pass min/max/mean/variance/count/missing of a numeric
  doc-values field over a query's matches.
- ``core/search/BlendedTermQuery.java:271-301`` — scores several terms
  (typically the same text across fields) with BLENDED statistics:
  df = max over members, ttf = sum, each member rescored with the
  blended weight, combined by DisjunctionMax (tie 0.01) or Boolean sum.

All three are relational compositions over the existing searcher:

- diversified = window ``row_number() OVER (PARTITION BY key ORDER BY
  score DESC)`` filter + global TakeOrdered — the greedy
  best-first-with-cap set the reference's priority queue converges to
  under a total order (score desc, docID asc).  One extra hash shuffle
  on the key, no driver state.
- stats = one join + one agg (partial aggregation map-side).
- blended = per-member score scaled by blended_weight/actual_weight —
  valid for every similarity whose document-independent factor is
  multiplicative (BM25/classic/DFR/IB-lambda-free/axiomatic); the LM
  kinds put their stats in the per-doc formula, so blending is
  rejected for them like the reference's SynonymQuery-vs-LM caveats.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, functions as F
from pyspark.sql.window import Window as W

from lucene_1_spark.search.query import TermQuery


def diversified_topk(searcher, query, key_field: str, k: int = 10,
                     max_per_key: int = 1) -> DataFrame:
    """``DiversifiedTopDocsCollector`` analog: top-``k`` by score with
    at most ``max_per_key`` hits per value of ``key_field`` (a stored
    column, the NumericDocValues key source of the reference).
    Returns (doc_id, score, <key_field>, rank)."""
    if max_per_key < 1:
        raise ValueError("max_per_key must be >= 1")
    matches = searcher.search_df(query, k=None)
    docs = searcher.reader.docs().select("doc_id", key_field)
    j = matches.join(docs, "doc_id")
    per_key = W.partitionBy(key_field).orderBy(
        F.desc("score"), F.asc("doc_id"))
    kept = (j.withColumn("_rk", F.row_number().over(per_key))
            .filter(F.col("_rk") <= int(max_per_key)).drop("_rk"))
    return (kept.orderBy(F.desc("score"), F.asc("doc_id")).limit(k)
            .withColumn("rank", F.row_number().over(
                W.partitionBy().orderBy(F.desc("score"),
                                        F.asc("doc_id")))))


def doc_values_stats(searcher, query, value_expr: str) -> DataFrame:
    """``DocValuesStatsCollector`` analog: single-pass stats of a
    numeric expression over the query's matches.  ``value_expr`` is
    any SQL expression over the stored docs table (a plain column name
    for the direct DocValuesStats case; NULL values count as
    ``missing``, reference semantics).  Returns one row:
    (count, missing, min, max, mean, variance, stdev) — variance is
    population variance like ``DocValuesStats.variance()``."""
    matches = searcher.search_df(query, k=None).select("doc_id")
    docs = searcher.reader.docs()
    v = F.expr(value_expr).cast("double")
    j = matches.join(docs, "doc_id").select(v.alias("v"))
    return j.agg(
        F.count("v").alias("count"),
        (F.count(F.lit(1)) - F.count("v")).alias("missing"),
        F.min("v").alias("min"),
        F.max("v").alias("max"),
        F.avg("v").alias("mean"),
        F.var_pop("v").alias("variance"),
        F.stddev_pop("v").alias("stdev"),
    )


def blended_term_search(searcher, terms: tuple[str, ...], k: int = 10,
                        boosts: tuple[float, ...] | None = None,
                        combine: str = "dismax",
                        tie_breaker: float = 0.01) -> DataFrame:
    """``BlendedTermQuery`` analog: every member term is scored with
    the BLENDED statistics df = max(df_i), ttf = sum(ttf_i)
    (``BlendedTermQuery.java:282-291`` adjustFrequencies), then
    combined with DisjunctionMax(tie=0.01) — the
    DISJUNCTION_MAX_REWRITE default — or a Boolean SHOULD sum
    (BOOLEAN_REWRITE).  Terms may be composite ``field\\x1fterm`` keys
    (the cross-field use BlendedTermQuery exists for).

    Since every supported similarity factors as
    ``score = weight(stats) * f(freq, len)``, rescoring with blended
    stats is a per-member scalar rescale of the already-computed
    scores: blended_weight / actual_weight."""
    if searcher.score_kind in ("lmd", "lmjm", "indri", "dfi", "ib",
                               "ax3") or (
            searcher.score_kind == "dfr"
            and searcher.dfr_params[0] == "g"):
        raise NotImplementedError(
            "BlendedTermQuery blends doc_freq/ttf into the term WEIGHT;"
            f" the {searcher.similarity} similarity keeps stats in the"
            " per-document formula / aux scalar, so blending does not"
            " factor as a weight rescale")
    boosts = boosts or tuple(1.0 for _ in terms)
    stats = searcher.reader.term_statistics(sorted(set(terms)))
    present = [(t, b) for t, b in zip(terms, boosts) if t in stats]
    empty = searcher.spark.createDataFrame(
        [], "doc_id long, score double")
    if not present:
        return empty
    df_max = max(stats[t][0] for t, _ in present)
    ttf_sum = sum(stats[t][1] for t, _ in present)
    parts = []
    for t, b in present:
        fdc, _ = searcher._field_params(t)
        actual = searcher._idf_weight(1.0, stats[t][0], fdc,
                                      ttf=stats[t][1])
        blended = searcher._idf_weight(b, df_max, fdc, ttf=ttf_sum)
        scale = blended / actual if actual else 0.0
        parts.append(searcher.search_df(TermQuery(t), k=None)
                     .select("doc_id",
                             (F.col("score") * F.lit(scale))
                             .alias("score")))
    out = parts[0]
    for p in parts[1:]:
        out = out.unionByName(p)
    if combine == "boolean":
        out = out.groupBy("doc_id").agg(F.sum("score").alias("score"))
    else:
        out = out.groupBy("doc_id").agg(
            F.max("score").alias("_mx"), F.sum("score").alias("_sm"))
        out = out.select(
            "doc_id",
            (F.col("_mx") + F.lit(float(tie_breaker))
             * (F.col("_sm") - F.col("_mx"))).alias("score"))
    if k is None:
        return out
    return out.orderBy(F.desc("score"), F.asc("doc_id")).limit(k)


def high_freq_terms(reader, n: int = 10, order_by: str = "doc_freq",
                    field: str = "content") -> DataFrame:
    """``misc/HighFreqTerms.java`` analog: the index's top-``n`` terms
    by document frequency or total term frequency (``order_by`` in
    {'doc_freq', 'total_term_freq'}), ties broken by term ascending.
    Multi-field indexes store composite keys ``<field>\\x1fterm``;
    ``field='content'`` selects the plain analyzed field, any other
    name selects (and strips) its prefix.  One aggregate over the
    term-stats dictionary + TakeOrderedAndProject — raw segment stats
    like the reference (deletes are not masked)."""
    if order_by not in ("doc_freq", "total_term_freq"):
        raise ValueError("order_by must be doc_freq or total_term_freq")
    st = reader.term_stats()
    sep = "\x1f"
    if field == "content":
        st = st.filter(~F.col("term").contains(sep))
    else:
        pfx = field + sep
        st = (st.filter(F.col("term").startswith(pfx))
              .withColumn("term", F.expr(
                  f"substring(term, {len(pfx) + 1})")))
    return (st.groupBy("term")
            .agg(F.sum("doc_freq").alias("doc_freq"),
                 F.sum("total_term_freq").alias("total_term_freq"))
            .orderBy(F.desc(order_by), F.asc("term"))
            .limit(n))


def dynamic_range_facets(searcher, query, field: str,
                         topn: int = 4) -> DataFrame:
    """``facet/range/DynamicRangeUtil.computeDynamicNumericRanges``
    (``DynamicRangeUtil.java:204-270``) with unit weights: sort the
    matching docs' ``field`` values, then cut ranges greedily whenever
    the accumulated weight reaches ``totalWeight / min(topN, len)``.
    With weight == 1 per doc the greedy cut is a FIXED block size
    ``ceil(len / min(topN, len))`` over the sorted sequence, so the
    whole computation is one window row_number + one aggregate — no
    driver-side sort.  Returns (range_id, n_docs, min_v, max_v, avg_v)
    — count/min/max/mean per range like the reference's
    DynamicRangeInfo.  Range CONTENTS depend only on the sorted value
    multiset, so the result is deterministic under any tie order.

    Scale shape: the global sort rank is DECOMPOSED as (count of rows
    with a smaller value) + (row_number among the row's own value,
    ordered by doc_id).  The first term comes from the distinct-value
    histogram (distinct values ≪ rows; its cumulative window is over
    that small relation only), the second from a window PARTITIONED by
    value — so no single-partition exchange ever carries the match
    set, unlike a bare ``row_number() OVER (ORDER BY ...)``.  A value
    held by most rows still concentrates its within-value window; cut
    such ties upstream if that is a real workload."""
    import math
    matches = searcher.search_df(query, k=None).select("doc_id")
    vals = matches.join(
        searcher.reader.docs().select("doc_id", field), "doc_id") \
        .filter(F.col(field).isNotNull())
    n = vals.count()
    if n == 0 or topn <= 0:
        return vals.sparkSession.createDataFrame(
            [], "range_id long, n_docs long, min_v double, "
                "max_v double, avg_v double")
    block = math.ceil(n / min(topn, n))
    hist = vals.groupBy(field).agg(F.count("*").alias("_c"))
    w_off = W.orderBy(F.asc(field)) \
        .rowsBetween(W.unboundedPreceding, -1)
    offs = hist.select(
        field, F.coalesce(F.sum("_c").over(w_off), F.lit(0)).alias("_off"))
    w_val = W.partitionBy(field).orderBy(F.asc("doc_id"))
    binned = (vals.join(offs, field)
              .withColumn("range_id", F.floor(
                  (F.col("_off") + F.row_number().over(w_val) - 1) / block)
                  .cast("long")))
    return (binned.groupBy("range_id")
            .agg(F.count("*").alias("n_docs"),
                 F.min(field).cast("double").alias("min_v"),
                 F.max(field).cast("double").alias("max_v"),
                 F.avg(field).alias("avg_v"))
            .orderBy("range_id"))
