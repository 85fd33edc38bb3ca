"""Facets, grouping, and rescoring over query matches — the reference's
collector-side operator families (SURVEY.md §2.3 / §2.5), each a plain
DataFrame composition over the exhaustive match set
(``search_df(k=None)``) joined with stored fields:

- facet counts        FastTaxonomyFacetCounts / StringValueFacetCounts
                      (``lucene/facet/.../StringValueFacetCounts.java``)
- range facets        LongRangeFacetCounts (``facet/range/``)
- sampled facets      RandomSamplingFacetsCollector
- grouping            two-pass grouping -> one window function
                      (``grouping/FirstPassGroupingCollector.java``)
- distinct values     DistinctValuesCollector / AllGroupsCollector
- rescoring           QueryRescorer (``search/QueryRescorer.java``)
"""

from __future__ import annotations

import re

from pyspark.sql import DataFrame, Window as W, functions as F

from lucene_1_spark.search.executor import IndexSearcher


def _matches_with_fields(searcher: IndexSearcher, query,
                         fields: list[str]) -> DataFrame:
    m = searcher.search_df(query, k=None)
    docs = searcher.reader.docs().select("doc_id", *fields)
    return m.join(docs, "doc_id")


def facet_counts(searcher: IndexSearcher, query, facet_field: str) -> DataFrame:
    """(value, n) — count of matching docs per stored-field value."""
    return (_matches_with_fields(searcher, query, [facet_field])
            .groupBy(F.col(facet_field).alias("value"))
            .agg(F.count("*").cast("long").alias("n")))


def range_facet_counts(searcher: IndexSearcher, query, numeric_field: str,
                       bucket_width: float) -> DataFrame:
    """(bucket_lo, n) — fixed-width range buckets over a numeric field."""
    lo = (F.floor(F.col(numeric_field) / bucket_width)
          * bucket_width).cast("double")
    return (_matches_with_fields(searcher, query, [numeric_field])
            .groupBy(lo.alias("bucket_lo"))
            .agg(F.count("*").cast("long").alias("n")))


def taxonomy_facet_counts(matches_with_path: DataFrame, path_col: str,
                          sep: str = "/",
                          max_depth: int | None = None) -> DataFrame:
    """Hierarchical facet counts — FastTaxonomyFacetCounts
    (``facet/taxonomy/FastTaxonomyFacetCounts.java:40``) relationally:
    every doc contributes one count to EVERY prefix of its facet path
    ("a/b/c" -> a, a/b, a/b/c), so one explode+groupBy pass yields the
    whole taxonomy's counts (the per-ordinal count array).  Returns
    (path, depth, n) with depth = number of components.  ``sep`` is
    treated as a LITERAL separator (regex-escaped before F.split, so
    '.' or '|' work)."""
    parts = F.split(F.col(path_col), re.escape(sep))
    depth_cap = F.size(parts) if max_depth is None \
        else F.least(F.size(parts), F.lit(int(max_depth)))
    prefixes = F.transform(
        F.sequence(F.lit(1), depth_cap),
        lambda i: F.struct(
            F.array_join(F.slice(parts, 1, i), sep).alias("path"),
            i.cast("long").alias("depth")))
    return (matches_with_path
            .select(F.explode(prefixes).alias("p"))
            .groupBy(F.col("p.path").alias("path"),
                     F.col("p.depth").alias("depth"))
            .agg(F.count("*").cast("long").alias("n")))


def taxonomy_children(matches_with_path: DataFrame, path_col: str,
                      drill_down: str = "", sep: str = "/",
                      k: int | None = None) -> DataFrame:
    """Drill-down: counts of the IMMEDIATE children under a taxonomy
    prefix (DrillDownQuery + getTopChildren,
    ``facet/DrillDownQuery.java`` / ``FacetResult``).  Empty
    ``drill_down`` lists the roots.  Returns (child, n) ordered by
    (n desc, child asc).  ``sep`` is a LITERAL separator (regex-escaped
    before F.split, matching the Python-side ``drill_down.split``)."""
    parts = F.split(F.col(path_col), re.escape(sep))
    if drill_down:
        prefix_parts = drill_down.split(sep)
        d = len(prefix_parts)
        cond = (F.size(parts) > d) & \
            (F.array_join(F.slice(parts, 1, d), sep) == drill_down)
    else:
        d = 0
        cond = F.size(parts) >= 1
    out = (matches_with_path.filter(cond)
           .groupBy(parts[d].alias("child"))
           .agg(F.count("*").cast("long").alias("n"))
           .orderBy(F.desc("n"), F.asc("child")))
    return out.limit(k) if k is not None else out


def drill_sideways(searcher: IndexSearcher, base_query,
                   dims: dict[str, object],
                   stored: list[str] | None = None,
                   derive: dict[str, "F.Column"] | None = None) \
        -> dict[str, DataFrame]:
    """DrillSideways (``facet/DrillSideways.java:63``): for a base
    query drilled down on several facet dimensions, each dimension's
    facet counts are computed over the docs matching the base query
    PLUS every OTHER dimension's filter — so the UI can show what the
    counts would be if the user changed only that one selection.

    ``dims`` maps a dimension name to its selected value; a dimension
    is either a stored field or a ``derive``d column over stored
    fields (``stored`` lists the columns the derivations need).
    Returns {dim: (value, n) DataFrame} plus the fully-drilled hit set
    under the key ``"__hits__"``.  One base match set, reused: each
    dimension's frame is a different filter over the same joined
    DataFrame (Catalyst shares the scan), exactly the
    one-collector-per-dim shape of the reference."""
    derive = derive or {}
    fields = stored if stored is not None \
        else sorted(d for d in dims if d not in derive)
    m = _matches_with_fields(searcher, base_query, fields)
    for name, col in derive.items():
        m = m.withColumn(name, col)
    # each dimension's frame (and __hits__) is a separate action over
    # the same base match set — materialize it once instead of
    # re-running the search + stored-field join per dimension
    m = m.localCheckpoint(eager=False)
    out: dict[str, DataFrame] = {}
    for dim in sorted(dims):
        others = m
        for f, v in dims.items():
            if f != dim:
                others = others.filter(F.col(f) == v)
        out[dim] = (others.groupBy(F.col(dim).alias("value"))
                    .agg(F.count("*").cast("long").alias("n")))
    hits = m
    for f, v in dims.items():
        hits = hits.filter(F.col(f) == v)
    out["__hits__"] = hits.select("doc_id", "score")
    return out


def association_facet_aggregates(matches_with_assoc: DataFrame,
                                 assoc_col: str = "assoc",
                                 agg: str = "sum") -> DataFrame:
    """Association facets — ``facet/taxonomy/
    TaxonomyFacetIntAssociations.java:38`` (SUM of per-doc int
    associations) and ``TaxonomyFacetFloatAssociations.java`` (SUM or
    MAX of float associations): each matching doc carries (path, value)
    association pairs (``IntAssociationFacetField`` /
    ``FloatAssociationFacetField``), and the facet result aggregates
    the VALUES per label instead of counting docs.

    ``assoc_col`` is an ``array<struct<path:string, value:double>>``
    column on the match set.  Returns (path, total).  One explode +
    groupBy — partial aggregation map-side, same scale shape as the
    count facets."""
    ex = matches_with_assoc.select(F.explode(F.col(assoc_col)).alias("a"))
    g = ex.groupBy(F.col("a.path").alias("path"))
    if agg == "sum":
        return g.agg(F.sum(F.col("a.value")).alias("total"))
    if agg == "max":
        return g.agg(F.max(F.col("a.value")).alias("total"))
    raise ValueError(f"agg must be 'sum' or 'max', got {agg!r}")


def sampled_facet_counts(searcher: IndexSearcher, query, facet_field: str,
                         fraction: float, seed: int = 42) -> DataFrame:
    """Facet counts over a Bernoulli sample of the matches, scaled back
    by 1/fraction (RandomSamplingFacetsCollector's estimate)."""
    return (_matches_with_fields(searcher, query, [facet_field])
            .sample(fraction=fraction, seed=seed)
            .groupBy(F.col(facet_field).alias("value"))
            .agg(F.round(F.count("*") / fraction).cast("long")
                 .alias("n_estimate")))


def group_top_k(searcher: IndexSearcher, query, group_field: str,
                k_per_group: int) -> DataFrame:
    """(group, doc_id, score, rnk) — top-k docs per group by (score
    desc, doc_id asc); Lucene's two collector passes collapse into one
    window function."""
    w = W.partitionBy(group_field).orderBy(F.desc("score"), F.asc("doc_id"))
    return (_matches_with_fields(searcher, query, [group_field])
            .withColumn("rnk", F.row_number().over(w).cast("long"))
            .filter(F.col("rnk") <= k_per_group)
            .select(F.col(group_field).alias("group"), "doc_id",
                    "score", "rnk"))


def distinct_group_values(searcher: IndexSearcher, query,
                          group_field: str) -> DataFrame:
    """(value) — distinct stored-field values among the matches."""
    return (_matches_with_fields(searcher, query, [group_field])
            .select(F.col(group_field).alias("value")).distinct())


def function_score(searcher: IndexSearcher, query, score_fn,
                   fields: list[str] | None = None,
                   k: int | None = None) -> DataFrame:
    """FunctionScoreQuery analog
    (``queries/function/FunctionScoreQuery.java``): REPLACE each hit's
    score with a column expression over the original score and stored
    fields (the DoubleValuesSource surface as a plain Column fn).
    ``score_fn`` receives the joined DataFrame and returns a Column."""
    m = searcher.search_df(query, k=None)
    docs = searcher.reader.docs().select("doc_id", *(fields or []))
    j = m.join(docs, "doc_id") if fields else m
    out = j.select("doc_id", score_fn(j).cast("double").alias("score"))
    out = out.orderBy(F.desc("score"), F.asc("doc_id"))
    return out.limit(k) if k is not None else out


def rescore(searcher: IndexSearcher, first_pass: DataFrame, second_query,
            weight_first: float = 1.0, weight_second: float = 1.0,
            k: int | None = None) -> DataFrame:
    """QueryRescorer: combine first-pass scores with a second query's
    scores over ONLY the first-pass docs (left join; missing second
    score contributes 0), re-rank by the weighted sum."""
    second = searcher.search_df(second_query, k=None) \
        .withColumnRenamed("score", "score2")
    combined = (first_pass.join(second, "doc_id", "left_outer")
                .select("doc_id",
                        (F.col("score") * weight_first
                         + F.coalesce(F.col("score2"), F.lit(0.0))
                         * weight_second).alias("score")))
    out = combined.orderBy(F.desc("score"), F.asc("doc_id"))
    return out.limit(k) if k else out
