"""MultiSimilarity (CombSUM) and PerFieldSimilarityWrapper analogs.

Reference:

- ``search/similarities/MultiSimilarity.java:27-70`` — one SimScorer
  per sub-similarity, the document score is the SUM of the sub-scores
  (the CombSUM evidence-combination method of Shaw & Fox, TREC-2).
- ``search/similarities/PerFieldSimilarityWrapper.java`` — the
  index-wide Similarity delegates ``scorer()`` to a per-FIELD
  similarity (classic per-field relevance tuning: e.g. BM25 on body,
  boolean on exact-match keyword fields).

Both are *composition* wrappers: matching is similarity-independent in
Lucene (a scorer changes scores, never the doc set), so each composes
the existing :class:`~lucene_1_spark.search.executor.IndexSearcher`
over ONE shared :class:`~lucene_1_spark.index.reader.IndexReader`:

- ``multi_similarity_search`` runs the query once per sub-similarity
  (k=None, exhaustive scores) and sums per-doc — N postings passes for
  N sub-similarities.  Lucene shares the postings traversal and pays N
  scorer evaluations per posting instead; relationally the N-pass union
  keeps every pass a pruned one-term-bucket scan, and the groupBy-sum
  shuffles only (doc_id, score) pairs, so the extra cost at scale is
  bounded by the match set, not the index.
- ``PerFieldSimilaritySearcher`` splits a BooleanQuery's scoring
  clauses by the FIELD they touch, executes each group under its
  field's similarity, and sums — after masking to the boolean match
  set computed once (MUST/FILTER/MUST_NOT semantics are score-free).

All double similarities share exact uint32 norms, so any mix is legal
on one ``*_double`` index; mixing in ``bm25_float32`` raises in the
IndexSearcher constructor (different norms encoding).
"""

from __future__ import annotations

from pyspark.sql import DataFrame, functions as F

from lucene_1_spark.search.query import (
    BooleanQuery, Clause, Occur, Query, TermQuery, PhraseQuery,
)


def _sum_scores(parts: list[DataFrame], k: int | None) -> DataFrame:
    out = parts[0]
    for p in parts[1:]:
        out = out.unionByName(p)
    out = out.groupBy("doc_id").agg(F.sum("score").alias("score"))
    if k is None:
        return out
    return out.orderBy(F.desc("score"), F.asc("doc_id")).limit(k)


def multi_similarity_search(reader, similarities: tuple[str, ...],
                            query: Query | str,
                            k: int | None = 10) -> DataFrame:
    """CombSUM over sub-similarities (``MultiSimilarity.java:60-68``):
    score(doc) = sum_i score_i(doc).  Every sub-similarity sees the
    same match set, so the per-doc sum is a union + groupBy — no outer
    join needed."""
    from lucene_1_spark.search.executor import IndexSearcher
    if not similarities:
        raise ValueError("MultiSimilarity needs at least one "
                         "sub-similarity")
    parts = [IndexSearcher(reader, similarity=sim)
             .search_df(query, k=None).select("doc_id", "score")
             for sim in similarities]
    return _sum_scores(parts, k)


def _query_field(q: Query) -> str | None:
    """The single field a leaf scoring query touches, or None if it is
    not a per-field-routable leaf (the wrapper then scores it with the
    default similarity, like PerFieldSimilarityWrapper's fallback
    ``get(field)`` returning the default)."""
    if isinstance(q, (TermQuery, PhraseQuery)):
        return q.field
    return None


class PerFieldSimilaritySearcher:
    """``PerFieldSimilarityWrapper`` analog: route each scoring clause
    to its FIELD's similarity.

    ``field_similarities`` maps field name -> similarity string; any
    field (or non-leaf clause) not in the map scores with
    ``default_similarity``.  Boolean semantics (MUST / SHOULD / FILTER
    / MUST_NOT / minimum_should_match) are evaluated ONCE — they are
    similarity-independent — and per-field scores are summed over the
    surviving docs, exactly Lucene's BooleanScorer sum where each
    sub-scorer was built by the field's similarity."""

    def __init__(self, reader, default_similarity: str,
                 field_similarities: dict[str, str]):
        from lucene_1_spark.search.executor import IndexSearcher
        self.reader = reader
        self._default = IndexSearcher(reader,
                                      similarity=default_similarity)
        self._by_sim: dict[str, object] = {default_similarity:
                                           self._default}
        self.field_similarities = dict(field_similarities)
        for sim in set(field_similarities.values()):
            if sim not in self._by_sim:
                self._by_sim[sim] = IndexSearcher(reader, similarity=sim)

    def _searcher_for(self, q: Query):
        fld = _query_field(q)
        sim = self.field_similarities.get(fld) if fld else None
        return self._by_sim[sim] if sim else self._default

    def search_df(self, query: Query, k: int | None = 10) -> DataFrame:
        if not isinstance(query, BooleanQuery):
            query = BooleanQuery((Clause(query, Occur.SHOULD),))
        scoring = [c.query for c in query.clauses
                   if c.occur in (Occur.MUST, Occur.SHOULD)]
        if not scoring:
            # pure filter query — constant 0 scores, default semantics
            return self._default.search_df(query, k=k)
        # the boolean MATCH SET under full semantics, score-free
        match = (self._default.search_df(query, k=None)
                 .select("doc_id"))
        parts = []
        for q in scoring:
            s = self._searcher_for(q)
            parts.append(s.search_df(q, k=None)
                         .select("doc_id", "score")
                         .join(match, "doc_id", "left_semi"))
        return _sum_scores(parts, k)
