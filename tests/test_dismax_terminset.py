"""DisjunctionMaxQuery (max + tie_breaker fold,
``search/DisjunctionMaxQuery.java:42-88`` /
``DisjunctionMaxScorer.java:51-64``) and TermInSetQuery
(clause-unlimited constant-score set membership,
``search/TermInSetQuery.java:63-90``) — brute-force checked against
per-term scores from the same searcher."""

import math
import os

import pytest

from lucene_1_spark import corpus as corpus_mod
from lucene_1_spark.index import IndexBuilder, IndexReader
from lucene_1_spark.index.builder import IndexConfig
from lucene_1_spark.search import IndexSearcher
from lucene_1_spark.search.query import (
    BooleanQuery, Clause, DisjunctionMaxQuery, MatchNoDocsQuery, Occur,
    PhraseQuery, TermInSetQuery, TermQuery, rewrite_fixpoint,
)


@pytest.fixture(scope="module")
def searcher(spark, tmp_root):
    pdf = corpus_mod.t_small()
    d = os.path.join(tmp_root, "idx_dismax")
    src = spark.createDataFrame(pdf).repartition(8, "repo")
    IndexBuilder(spark, d, IndexConfig(n_buckets=8, n_doc_partitions=8,
                                       positions=True,
                                       keyword_fields=("lang",))).build(src)
    return IndexSearcher(IndexReader(spark, d))


def _scores(df):
    return {r["doc_id"]: r["score"] for r in df.collect()}


# ---------------------------------------------------------------------------
# DisjunctionMaxQuery
# ---------------------------------------------------------------------------

@pytest.mark.parametrize("tie", [0.0, 0.3, 1.0])
def test_dismax_fold_matches_per_term_scores(searcher, tie):
    a = _scores(searcher.search_df(TermQuery("tok0"), k=None))
    b = _scores(searcher.search_df(TermQuery("def"), k=None))
    q = DisjunctionMaxQuery((TermQuery("tok0"), TermQuery("def")), tie)
    got = _scores(searcher.search_df(q, k=None))
    assert set(got) == set(a) | set(b)
    for d, s in got.items():
        subs = [x for x in (a.get(d), b.get(d)) if x is not None]
        mx, sm = max(subs), sum(subs)
        assert math.isclose(s, mx + tie * (sm - mx), rel_tol=1e-6), d


def test_dismax_tie0_equals_pairwise_max(searcher):
    a = _scores(searcher.search_df(TermQuery("tok1"), k=None))
    b = _scores(searcher.search_df(TermQuery("tok2"), k=None))
    got = _scores(searcher.search_df(
        DisjunctionMaxQuery((TermQuery("tok1"), TermQuery("tok2"))), k=None))
    both = set(a) & set(b)
    assert both, "fixture should have docs matching both terms"
    for d in both:
        assert math.isclose(got[d], max(a[d], b[d]), rel_tol=1e-6)


def test_dismax_with_phrase_disjunct(searcher):
    ph = PhraseQuery(("tok0", "tok1"))
    p = _scores(searcher.search_df(ph, k=None))
    t = _scores(searcher.search_df(TermQuery("tok5"), k=None))
    if not p:
        pytest.skip("no phrase matches in fixture")
    got = _scores(searcher.search_df(
        DisjunctionMaxQuery((ph, TermQuery("tok5")), 0.5), k=None))
    assert set(got) == set(p) | set(t)
    for d, s in got.items():
        subs = [x for x in (p.get(d), t.get(d)) if x is not None]
        mx, sm = max(subs), sum(subs)
        assert math.isclose(s, mx + 0.5 * (sm - mx), rel_tol=1e-6), d


def test_dismax_as_boolean_clause(searcher):
    """A dismax nested under MUST executes via the complex sub-plan
    path and its score adds to the other clause's."""
    dm = DisjunctionMaxQuery((TermQuery("tok3"), TermQuery("tok4")), 0.0)
    dm_s = _scores(searcher.search_df(dm, k=None))
    t_s = _scores(searcher.search_df(TermQuery("tok0"), k=None))
    q = BooleanQuery((Clause(dm, Occur.MUST),
                      Clause(TermQuery("tok0"), Occur.MUST)))
    got = _scores(searcher.search_df(q, k=None))
    assert set(got) == set(dm_s) & set(t_s)
    for d, s in got.items():
        assert math.isclose(s, dm_s[d] + t_s[d], rel_tol=1e-6), d


def test_dismax_rewrites():
    assert isinstance(rewrite_fixpoint(DisjunctionMaxQuery(())),
                      MatchNoDocsQuery)
    assert isinstance(
        rewrite_fixpoint(DisjunctionMaxQuery((MatchNoDocsQuery(),))),
        MatchNoDocsQuery)
    t = TermQuery("x")
    assert rewrite_fixpoint(DisjunctionMaxQuery((t,), 0.7)) == t
    assert rewrite_fixpoint(
        DisjunctionMaxQuery((t, MatchNoDocsQuery()), 0.2)) == t


def test_dismax_boost_scales(searcher):
    base = _scores(searcher.search_df(
        DisjunctionMaxQuery((TermQuery("tok0"), TermQuery("def")), 0.4), k=None))
    boosted = _scores(searcher.search_df(
        DisjunctionMaxQuery((TermQuery("tok0"), TermQuery("def")), 0.4,
                            boost=2.0), k=None))
    assert set(base) == set(boosted)
    for d in base:
        assert math.isclose(boosted[d], 2.0 * base[d], rel_tol=1e-6)


# ---------------------------------------------------------------------------
# TermInSetQuery
# ---------------------------------------------------------------------------

def test_term_in_set_matches_union_constant_score(searcher):
    terms = ("tok7", "tok9", "no_such_term_zzz")
    union = set()
    for t in terms[:2]:
        union |= set(_scores(searcher.search_df(TermQuery(t), k=None)))
    got = _scores(searcher.search_df(
        TermInSetQuery(terms, boost=2.5), k=None))
    assert set(got) == union
    assert all(s == 2.5 for s in got.values())


def test_term_in_set_is_not_clause_limited(searcher):
    """>1024 members would blow BooleanQuery's clause guard; the set
    query runs them as one scan."""
    terms = tuple(f"tok{i}" for i in range(1500))  # most don't exist
    got = searcher.search_df(TermInSetQuery(terms), k=None)
    present = set(_scores(got))
    ref = set(_scores(searcher.search_df(TermQuery("tok0"), k=None)))
    assert ref <= present


def test_term_in_set_keyword_field(searcher):
    got = _scores(searcher.search_df(
        TermInSetQuery(("python", "rust"), field="lang"), k=None))
    docs = searcher.reader.docs().select("doc_id", "lang").collect()
    want = {r["doc_id"] for r in docs if r["lang"] in ("python", "rust")}
    assert set(got) == want


def test_term_in_set_empty_rewrites_to_none(searcher):
    got = searcher.search_df(TermInSetQuery(()), k=None)
    assert got.count() == 0


def test_dismax_explain_matches_search_score(searcher):
    q = DisjunctionMaxQuery((TermQuery("tok0"), TermQuery("def")), 0.3)
    hits = searcher.search_df(q, k=3).collect()
    for h in hits:
        ex = searcher.explain(q, h["doc_id"])
        assert ex["match"] is True
        assert math.isclose(ex["value"], h["score"], rel_tol=1e-6)
        assert ex["description"].startswith("max plus")
        assert len(ex["details"]) >= 1
    assert searcher.explain(q, 10_000_000)["match"] is False
