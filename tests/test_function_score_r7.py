"""FunctionScoreQuery / DocValuesTermsQuery / PrecedenceQueryParser —
round-7 additions.

FunctionScoreQuery (``queries/function/FunctionScoreQuery.java``):
wrapped-query match set preserved, score replaced by the source
expression; boostByValue / boostByQuery factory semantics.
DocValuesTermsQuery (sandbox ``DocValuesTermsQuery.java``): constant
score membership on a stored column.
PrecedenceQueryParser (``queryparser/flexible/precedence/
PrecedenceQueryParser.java``): AND > OR precedence, lenient.
"""

import math
import os
import random
import string

import pytest
from pyspark.sql import functions as F

from lucene_1_spark import corpus as corpus_mod
from lucene_1_spark.index import IndexBuilder, IndexReader
from lucene_1_spark.index.builder import IndexConfig
from lucene_1_spark.search import IndexSearcher
from lucene_1_spark.search.precedence_parser import parse_precedence
from lucene_1_spark.search.query import (
    BooleanQuery, Clause, DocValuesTermsQuery, FunctionScoreQuery,
    MatchNoDocsQuery, Occur, PhraseQuery, TermQuery, boost_by_query,
    boost_by_value, parse_query, query_from_dict, query_to_dict,
)


@pytest.fixture(scope="module")
def se(spark, tmp_root):
    pdf = corpus_mod.generate(150)
    d = os.path.join(tmp_root, "idx_fsq")
    IndexBuilder(spark, d, IndexConfig(
        similarity="bm25_double", n_buckets=4, n_doc_partitions=4)).build(
        spark.createDataFrame(pdf).repartition(4, "repo"))
    return IndexSearcher(IndexReader(spark, d))


def _scores(df):
    return {r["doc_id"]: r["score"] for r in df.collect()}


# ---------------------------------------------------------------- fsq

def test_function_score_replaces_score(se):
    """source ignoring the inner score -> score == the expression."""
    q = FunctionScoreQuery(TermQuery("tok3"), "cast(length as double)")
    got = _scores(se.search_df(q, k=None))
    base = se.search_df(TermQuery("tok3"), k=None)
    lens = {r["doc_id"]: r["length"]
            for r in base.join(se.reader.docs().select("doc_id", "length"),
                               "doc_id").collect()}
    assert set(got) == set(lens)           # same match set
    for d, s in got.items():
        assert s == pytest.approx(float(lens[d]))


def test_boost_by_value(se):
    q = boost_by_value(TermQuery("tok3"), "ln(1.0 + length)")
    got = _scores(se.search_df(q, k=None))
    base = se.search_df(TermQuery("tok3"), k=None)
    exp = {r["doc_id"]: r["score"] * math.log1p(r["length"])
           for r in base.join(se.reader.docs().select("doc_id", "length"),
                              "doc_id").collect()}
    assert got.keys() == exp.keys()
    for d in got:
        assert got[d] == pytest.approx(exp[d], rel=1e-9)


def test_boost_by_query(se):
    q = boost_by_query(TermQuery("tok3"), TermQuery("tok5"), 3.0)
    got = _scores(se.search_df(q, k=None))
    base = _scores(se.search_df(TermQuery("tok3"), k=None))
    boosted = set(_scores(se.search_df(TermQuery("tok5"), k=None)))
    assert got.keys() == base.keys()
    for d in got:
        factor = 3.0 if d in boosted else 1.0
        assert got[d] == pytest.approx(base[d] * factor, rel=1e-9)


def test_function_score_topk_order(se):
    q = boost_by_value(TermQuery("tok3"), "ln(1.0 + length)")
    top = se.search_df(q, k=5).collect()
    full = sorted(_scores(se.search_df(q, k=None)).items(),
                  key=lambda kv: (-kv[1], kv[0]))[:5]
    assert [(r["doc_id"]) for r in top] == [d for d, _ in full]


def test_function_score_rewrite_and_serde():
    q = boost_by_query(TermQuery("tok3"), TermQuery("tok5"), 2.0)
    assert q.rewrite() is q
    rt = query_from_dict(query_to_dict(q))
    assert rt == q
    # MatchNone inner collapses
    assert isinstance(
        FunctionScoreQuery(MatchNoDocsQuery(), "score").rewrite(),
        MatchNoDocsQuery)


# ------------------------------------------------------ dv terms query

def test_dv_terms_query(se):
    docs = se.reader.docs()
    exp = {r["doc_id"] for r in
           docs.filter(F.col("lang").isin(["python", "rust"]))
           .select("doc_id").collect()}
    got = _scores(se.search_df(
        DocValuesTermsQuery("lang", ("python", "rust"), boost=2.0), k=None))
    assert set(got) == exp
    assert all(s == pytest.approx(2.0) for s in got.values())
    # composable as a FILTER clause
    bq = BooleanQuery((
        Clause(TermQuery("tok3"), Occur.MUST),
        Clause(DocValuesTermsQuery("lang", ("python", "rust")),
               Occur.FILTER)))
    both = set(_scores(se.search_df(bq, k=None)))
    tok3 = set(_scores(se.search_df(TermQuery("tok3"), k=None)))
    assert both == tok3 & exp


# ------------------------------------------------------ precedence

def test_precedence_and_binds_tighter():
    q = parse_precedence("alpha OR beta AND gamma")
    assert isinstance(q, BooleanQuery)
    assert [c.occur for c in q.clauses] == [Occur.SHOULD, Occur.SHOULD]
    a, sub = q.clauses[0].query, q.clauses[1].query
    assert a == TermQuery("alpha")
    assert isinstance(sub, BooleanQuery)
    assert {(c.query.term, c.occur) for c in sub.clauses} == {
        ("beta", Occur.MUST), ("gamma", Occur.MUST)}
    # classic parser folds the same string FLAT (no precedence)
    c = parse_query("alpha OR beta AND gamma")
    assert isinstance(c, BooleanQuery)
    assert not any(isinstance(cl.query, BooleanQuery) for cl in c.clauses)


def test_precedence_left_form():
    q = parse_precedence("alpha AND beta OR gamma")
    assert isinstance(q, BooleanQuery)
    sub = q.clauses[0].query
    assert isinstance(sub, BooleanQuery)
    assert all(c.occur == Occur.MUST for c in sub.clauses)
    assert q.clauses[1].query == TermQuery("gamma")


def test_precedence_modifiers_parens_phrases():
    q = parse_precedence('+alpha -beta "gamma delta"~1 (x OR y) AND z')
    assert isinstance(q, BooleanQuery)
    occ = [c.occur for c in q.clauses]
    assert occ[0] == Occur.MUST and occ[1] == Occur.MUST_NOT
    assert any(isinstance(c.query, PhraseQuery) and c.query.slop == 1
               for c in q.clauses)
    # (x OR y) AND z nests under one SHOULD clause
    last = q.clauses[-1].query
    assert isinstance(last, BooleanQuery)
    assert all(c.occur == Occur.MUST for c in last.clauses)


def test_precedence_never_throws_fuzz():
    rng = random.Random(7)
    alphabet = string.ascii_letters + string.digits + ' +-()"[]{}~^:/*?|&!'
    for _ in range(400):
        s = "".join(rng.choice(alphabet)
                    for _ in range(rng.randint(0, 40)))
        parse_precedence(s)            # must not raise
    assert isinstance(parse_precedence(""), MatchNoDocsQuery)
    assert isinstance(parse_precedence("AND OR )("), object)


def test_precedence_end_to_end(se):
    """'tok3 OR tok5 AND tok7': match set == tok3 ∪ (tok5 ∩ tok7)."""
    got = set(_scores(se.search_df(
        parse_precedence("tok3 OR tok5 AND tok7"), k=None)))
    t3 = set(_scores(se.search_df(TermQuery("tok3"), k=None)))
    t5 = set(_scores(se.search_df(TermQuery("tok5"), k=None)))
    t7 = set(_scores(se.search_df(TermQuery("tok7"), k=None)))
    assert got == t3 | (t5 & t7)
    # classic semantics on the same string differ (AND pulls tok3's
    # neighbor tok5 into MUST): sanity that we really changed meaning
    classic = set(_scores(se.search_df(
        parse_query("tok3 OR tok5 AND tok7"), k=None)))
    assert classic != got or (t3 | (t5 & t7)) == (t5 & t7 & t3)
