"""Phrase queries (positions): engine vs brute-force oracle — exact
positional intersection, pseudo-term scoring, tie-breaks."""

import os

import numpy as np
import pytest

from lucene_1_spark import corpus as corpus_mod
from lucene_1_spark import oracle as oracle_mod
from lucene_1_spark.index import IndexBuilder, IndexReader
from lucene_1_spark.index.builder import IndexConfig
from lucene_1_spark.search import IndexSearcher, PhraseQuery


@pytest.fixture(scope="module")
def pos_index(spark, tmp_root):
    pdf = corpus_mod.t_small()
    d = os.path.join(tmp_root, "idx_positions")
    src = spark.createDataFrame(pdf).repartition(8, "repo")
    IndexBuilder(spark, d, IndexConfig(n_buckets=8, n_doc_partitions=8,
                                       positions=True)).build(src)
    return d, pdf


@pytest.fixture(scope="module")
def psearcher(spark, pos_index):
    d, _ = pos_index
    return IndexSearcher(IndexReader(spark, d))


@pytest.fixture(scope="module")
def oidx(pos_index):
    _, pdf = pos_index
    return oracle_mod.build_oracle_index(pdf)


@pytest.mark.parametrize("phrase", [
    '"tok0 tok1"', '"def class"', '"tie tok5"', '"tok5 tok5"',
    '"tok1 tok2 tok3"', '"zzz yyy"',
])
def test_phrase_matches_oracle(psearcher, oidx, phrase):
    exp = oracle_mod.search_oracle(oidx, phrase, k=10)
    got = psearcher.search(phrase, k=10)
    assert [r["doc_id"] for r in got] == [e[0] for e in exp], phrase
    for r, e in zip(got, exp):
        assert np.float32(r["score"]) == np.float32(e[2]), (phrase, r, e)


def test_phrase_requires_positions_index(spark, tmp_root):
    d = os.path.join(tmp_root, "idx_nopos")
    src = spark.createDataFrame(corpus_mod.generate(30)).repartition(2)
    IndexBuilder(spark, d, IndexConfig(n_buckets=4, n_doc_partitions=2)).build(src)
    s = IndexSearcher(IndexReader(spark, d))
    with pytest.raises(ValueError, match="positions"):
        s.search_df(PhraseQuery(("tok0", "tok1")), k=5).collect()


def test_non_phrase_queries_still_match(psearcher, oidx):
    for q in ["tok0", "+tok1 +tok2", "tok3 tok4"]:
        exp = oracle_mod.search_oracle(oidx, q, k=10)
        got = psearcher.search(q, k=10)
        assert [r["doc_id"] for r in got] == [e[0] for e in exp], q


# -- sloppy-phrase repeated-term semantics (SloppyPhraseMatcher.java:52-90:
#    repeat slots must land on DISTINCT positions) -------------------------

@pytest.fixture(scope="module")
def repeat_searcher(spark, tmp_root):
    docs = [
        ("r", "d0", "c", "x", "a b c"),        # one b: "a b b"~N no match
        ("r", "d1", "c", "x", "a b x b"),      # two b's, in-window
        ("r", "d2", "c", "x", "a b b"),        # adjacent b's
        ("r", "d3", "c", "x", "b"),            # one b: "b b"~N no match
        ("r", "d4", "c", "x", "b b"),
        ("r", "d5", "c", "x", "b x x x b"),    # b's too far for slop 1
        ("r", "d6", "c", "x", "a b"),
    ]
    d = os.path.join(tmp_root, "idx_repeat_phrase")
    src = spark.createDataFrame(
        docs, "repo string, path string, commit string, lang string,"
        " content string")
    IndexBuilder(spark, d, IndexConfig(n_buckets=4, n_doc_partitions=2,
                                       positions=True)).build(src)
    return IndexSearcher(IndexReader(spark, d))


def _paths(searcher, hits):
    docs = {r["doc_id"]: r["path"] for r in searcher.reader.docs().collect()}
    return sorted(docs[h["doc_id"]] for h in hits)


def test_sloppy_repeat_needs_distinct_occurrences(repeat_searcher):
    """("a","b","b") with slop: a doc with a single 'b' must NOT match
    — both b-slots may not reuse one occurrence."""
    hits = repeat_searcher.search(PhraseQuery(("a", "b", "b"), slop=1), k=10)
    assert _paths(repeat_searcher, hits) == ["d1", "d2"]
    # d0 ("a b c") and d6 ("a b") have one b each: excluded


def test_sloppy_two_term_repeat(repeat_searcher):
    """("b","b")~1: only docs with two b's within the window match."""
    hits = repeat_searcher.search(PhraseQuery(("b", "b"), slop=1), k=10)
    assert _paths(repeat_searcher, hits) == ["d1", "d2", "d4"]
    # d3 has one b; d5's b's are 4 apart (> slop+1)


def test_sloppy_repeat_exact_still_works(repeat_searcher):
    """slop=0 adjacency with repeats: "b b" exact."""
    hits = repeat_searcher.search(PhraseQuery(("b", "b"), slop=0), k=10)
    assert _paths(repeat_searcher, hits) == ["d2", "d4"]
