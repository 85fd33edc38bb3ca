"""Query-time join (``join/JoinUtil.createJoinQuery``,
``join/ScoreMode.java``) — brute-force checked against a pandas
recount over the fixture corpus."""

import math
import os

import pytest

from lucene_1_spark import corpus as corpus_mod
from lucene_1_spark.index import IndexBuilder, IndexReader
from lucene_1_spark.index.builder import IndexConfig
from lucene_1_spark.search import IndexSearcher
from lucene_1_spark.search.query import (JoinQuery, MatchNoDocsQuery,
                                         TermQuery, rewrite_fixpoint)


@pytest.fixture(scope="module")
def ctx(spark, tmp_root):
    pdf = corpus_mod.t_small()
    d = os.path.join(tmp_root, "idx_joinq")
    src = spark.createDataFrame(pdf).repartition(8, "repo")
    IndexBuilder(spark, d, IndexConfig(n_buckets=8,
                                       n_doc_partitions=8)).build(src)
    se = IndexSearcher(IndexReader(spark, d))
    docs = {r["doc_id"]: (r["lang"], r["repo"])
            for r in se.reader.docs().select("doc_id", "lang",
                                             "repo").collect()}
    return se, docs


def test_join_none_matches_value_set(ctx):
    se, docs = ctx
    from_hits = {r["doc_id"] for r in
                 se.search_df(TermQuery("tok3"), k=None).collect()}
    langs = {docs[d][0] for d in from_hits}
    q = JoinQuery(TermQuery("tok3"), "lang", "lang", "none", boost=2.0)
    got = {r["doc_id"]: r["score"] for r in se.search_df(q, k=None).collect()}
    want = {d for d, (lg, _) in docs.items() if lg in langs}
    assert set(got) == want
    assert all(s == 2.0 for s in got.values())


@pytest.mark.parametrize("mode", ["max", "total", "avg"])
def test_join_score_modes(ctx, mode):
    se, docs = ctx
    from_scores = {r["doc_id"]: r["score"] for r in
                   se.search_df(TermQuery("tok3"), k=None).collect()}
    per_lang = {}
    for d, s in from_scores.items():
        per_lang.setdefault(docs[d][0], []).append(s)
    agg = {lg: (max(v) if mode == "max" else
                sum(v) if mode == "total" else sum(v) / len(v))
           for lg, v in per_lang.items()}
    q = JoinQuery(TermQuery("tok3"), "lang", "lang", mode)
    got = {r["doc_id"]: r["score"] for r in se.search_df(q, k=None).collect()}
    for d, s in got.items():
        assert math.isclose(s, agg[docs[d][0]], rel_tol=1e-6), d


def test_join_cross_field(ctx):
    """from_field != to_field: docs whose repo matches the LANG of a
    matching doc is nonsense semantically but exercises the shape;
    use repo -> repo instead for a meaningful cross check."""
    se, docs = ctx
    from_hits = {r["doc_id"] for r in
                 se.search_df(TermQuery("tok9"), k=None).collect()}
    repos = {docs[d][1] for d in from_hits}
    q = JoinQuery(TermQuery("tok9"), "repo", "repo")
    got = {r["doc_id"] for r in se.search_df(q, k=None).collect()}
    assert got == {d for d, (_, rp) in docs.items() if rp in repos}


def test_join_guards_and_rewrite(ctx):
    se, _ = ctx
    assert isinstance(
        rewrite_fixpoint(JoinQuery(MatchNoDocsQuery(), "lang", "lang")),
        MatchNoDocsQuery)
    with pytest.raises(ValueError):
        se.search_df(JoinQuery(TermQuery("tok1"), "no_such", "lang"),
                     k=None).collect()
    with pytest.raises(ValueError):
        se.search_df(JoinQuery(TermQuery("tok1"), "lang", "lang",
                               score_mode="bogus"), k=None).collect()


def test_term_vector_matches_analyzer_recount(ctx):
    """TermVectors.get(doc) reconstruction from block-range-pruned
    postings equals a direct re-analysis of the source doc."""
    from collections import Counter

    from lucene_1_spark.analysis import get_analyzer
    se, _ = ctx
    doc = se.reader.docs().filter("doc_id = 5") \
        .select("repo", "path", "commit").collect()[0]
    pdf = corpus_mod.t_small()
    row = pdf[(pdf.repo == doc["repo"]) & (pdf.path == doc["path"])]
    want = Counter(get_analyzer("standard").tokens(row.iloc[0]["content"]))
    got = {r["term"]: r["freq"] for r in se.term_vector(5).collect()}
    assert got == dict(want)


def test_join_from_side_respects_deletes(spark, tmp_root):
    """ADVICE r4: JoinUtil respects liveDocs on the from side — a
    tombstoned from-doc must not project its join value (ghost docs
    matching the to side, or skewing max/total/avg)."""
    from lucene_1_spark.streaming.incremental import IncrementalIndexWriter

    rows = [("r", "d0", "c", "aa", "needle alpha"),
            ("r", "d1", "c", "bb", "needle beta"),
            ("r", "d2", "c", "aa", "other text"),
            ("r", "d3", "c", "bb", "plain words")]
    src = spark.createDataFrame(
        rows, "repo string, path string, commit string, lang string, "
              "content string")
    d = os.path.join(tmp_root, "idx_join_del")
    IndexBuilder(spark, d, IndexConfig(n_buckets=4,
                                       n_doc_partitions=2)).build(src)
    se = IndexSearcher(IndexReader(spark, d))
    q = JoinQuery(TermQuery("needle"), "lang", "lang", "none")
    before = {r["doc_id"] for r in se.search_df(q, k=None).collect()}
    assert len(before) == 4  # both langs matched via d0/d1
    # delete the only 'bb' from-doc: lang=bb must stop matching
    w = IncrementalIndexWriter(spark, d, IndexConfig(n_buckets=4,
                                                     n_doc_partitions=2))
    w.delete_by_term("beta")
    se2 = IndexSearcher(IndexReader(spark, d))
    langs = {r["doc_id"]: r["lang"] for r in
             se2.reader.docs().select("doc_id", "lang").collect()}
    got = {r["doc_id"] for r in se2.search_df(q, k=None).collect()}
    assert got == {i for i, lg in langs.items() if lg == "aa"}
