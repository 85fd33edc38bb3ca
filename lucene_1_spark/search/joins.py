"""Parent/child joins — the reference join module re-expressed
relationally (``lucene/join/src/java/org/apache/lucene/search/join/``):

- :func:`to_parent_join` — ToParentBlockJoinQuery.java: child hits roll
  up to their parent with a ScoreMode (Max/Total/Avg/Min/None,
  ``join/ScoreMode.java``).  Lucene needs parent/child in one docID
  block (index-time adjacency); relationally a join keyed by parent id
  replaces the docID-ordering walk — one shuffle on the parent key, no
  co-indexing constraint.
- :func:`to_child_join` — ToChildBlockJoinQuery.java: parent hits fan
  out to their children (each child inherits the parent score).
- ``IndexSearcher``-level convenience: group children by a stored field
  (the repo -> file hierarchy in the corpus), see
  :func:`search_parents`.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, functions as F

_SCORE_AGGS = {
    "max": F.max, "min": F.min, "total": F.sum, "avg": F.avg,
}


def to_parent_join(child_hits: DataFrame, child_parent: DataFrame,
                   score_mode: str = "max",
                   parent_col: str = "parent_id") -> DataFrame:
    """(parent_id, score, n_children) from scored child hits and a
    (doc_id, parent_id) mapping.  score_mode 'none' scores parents 0."""
    joined = child_hits.join(child_parent, "doc_id")
    if score_mode == "none":
        agg = F.min(F.lit(0.0)).cast("double").alias("score")
    else:
        agg = _SCORE_AGGS[score_mode]("score").cast("double").alias("score")
    return (joined.groupBy(F.col(parent_col))
            .agg(agg, F.count("*").cast("long").alias("n_children")))


def to_child_join(parent_hits: DataFrame, child_parent: DataFrame,
                  parent_col: str = "parent_id") -> DataFrame:
    """(doc_id, score): every child of a matching parent, inheriting the
    parent's score (ToChildBlockJoinQuery semantics)."""
    p = parent_hits.withColumnRenamed("doc_id", parent_col) \
        if parent_col not in parent_hits.columns else parent_hits
    return child_parent.join(p.select(parent_col, "score"), parent_col) \
        .select("doc_id", "score")


def search_parents(searcher, query, parent_field: str,
                   score_mode: str = "max", k: int | None = 10) -> DataFrame:
    """Roll child matches up to parents identified by a stored field
    (e.g. repo, lang): the corpus-hierarchy form of the block join.
    Returns (parent, score, n_children) ordered (score desc, parent asc)."""
    hits = searcher.search_df(query, k=None)
    mapping = searcher.reader.docs().select(
        "doc_id", F.col(parent_field).alias("parent_id"))
    out = (to_parent_join(hits, mapping, score_mode)
           .withColumnRenamed("parent_id", "parent"))
    out = out.orderBy(F.desc("score"), F.asc("parent"))
    return out.limit(k) if k is not None else out
