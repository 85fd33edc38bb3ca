"""explain() — per-hit score breakdown (``search/IndexSearcher.java:919``,
``Weight.explain``): explain totals must equal search_df scores exactly
for term / boolean / phrase / composite queries."""

import os

import numpy as np
import pytest

from lucene_1_spark import corpus as corpus_mod
from lucene_1_spark.index import IndexBuilder, IndexReader
from lucene_1_spark.index.builder import IndexConfig
from lucene_1_spark.search import IndexSearcher
from lucene_1_spark.search.query import PhraseQuery


@pytest.fixture(scope="module")
def exs(spark, tmp_root):
    pdf = corpus_mod.t_small()
    d = os.path.join(tmp_root, "idx_explain")
    src = spark.createDataFrame(pdf).repartition(8, "repo")
    IndexBuilder(spark, d, IndexConfig(n_buckets=8, n_doc_partitions=8,
                                       positions=True)).build(src)
    return IndexSearcher(IndexReader(spark, d))


QUERIES = [
    "tok1",
    "+tok1 tok2 -tok7",
    "+tok0 +tok1",
    '"tok0 tok1"',
    '+tok1 +"tok0 tok1"',
]


@pytest.mark.parametrize("q", QUERIES)
def test_explain_total_equals_search_score(exs, q):
    rows = exs.search_df(q, k=5).collect()
    assert rows, q
    for r in rows:
        ex = exs.explain(q, r["doc_id"])
        assert ex["match"] is True, (q, r["doc_id"])
        assert np.float32(ex["value"]) == np.float32(r["score"]), \
            (q, r["doc_id"], ex)


def test_explain_details_carry_freq_and_weight(exs):
    rows = exs.search_df("+tok0 +tok1", k=1).collect()
    ex = exs.explain("+tok0 +tok1", rows[0]["doc_id"])
    assert len(ex["details"]) == 2
    for d in ex["details"]:
        assert d["freq"] >= 1 and d["weight"] > 0 and d["norm_len"] >= 1
        assert "idf_weight" in d["description"]


def test_explain_non_matching_doc(exs):
    # doc 0 exists; query for a term it cannot contain (absent term)
    ex = exs.explain("zzz_absent_term", 0)
    assert ex["match"] is False and ex["value"] == 0.0


def test_explain_must_not_excluded_doc(exs):
    # find a doc containing both tok1 and tok7: matches 'tok1' but is
    # excluded by '-tok7'
    both = exs.search_df("+tok1 +tok7", k=1).collect()
    if not both:
        pytest.skip("corpus lacks a tok1+tok7 doc")
    did = both[0]["doc_id"]
    ex = exs.explain("tok1 -tok7", did)
    assert ex["match"] is False


def test_explain_filter_clause_not_in_total(exs):
    from lucene_1_spark.search.query import (BooleanQuery, Clause, Occur,
                                             TermQuery)
    q = BooleanQuery((Clause(TermQuery("tok0"), Occur.MUST),
                      Clause(TermQuery("tok1"), Occur.FILTER)))
    rows = exs.search_df(q, k=3).collect()
    for r in rows:
        ex = exs.explain(q, r["doc_id"])
        assert np.float32(ex["value"]) == np.float32(r["score"])
        fil = [d for d in ex["details"] if d["occur"] == "FILTER"]
        assert fil and all("not scored" in d["description"] for d in fil)


def test_explain_phrase_leaf(exs):
    q = PhraseQuery(("tok0", "tok1"))
    rows = exs.search_df(q, k=3).collect()
    for r in rows:
        ex = exs.explain(q, r["doc_id"])
        assert np.float32(ex["value"]) == np.float32(r["score"])
