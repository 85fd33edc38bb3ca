"""End-to-end: build the index over the t-small fixture corpus and
require rank-identical, float32-score-identical top-10 vs the
pure-Python oracle on all 30 reference queries (the CheckHits
brute-force cross-check, SURVEY.md §5)."""

import os

import numpy as np
import pytest
from pyspark.sql import functions as F

from lucene_1_spark import corpus as corpus_mod
from lucene_1_spark import oracle as oracle_mod
from lucene_1_spark.index import IndexBuilder, IndexReader
from lucene_1_spark.index.builder import IndexConfig
from lucene_1_spark.search import IndexSearcher


@pytest.fixture(scope="module")
def small_corpus():
    return corpus_mod.t_small()


@pytest.fixture(scope="module")
def index_dir(spark, tmp_root, small_corpus):
    d = os.path.join(tmp_root, "idx_small")
    src = spark.createDataFrame(small_corpus).repartition(8, "repo")
    IndexBuilder(spark, d, IndexConfig(n_buckets=8, n_doc_partitions=8)).build(src)
    return d


@pytest.fixture(scope="module")
def searcher(spark, index_dir):
    return IndexSearcher(IndexReader(spark, index_dir))


@pytest.fixture(scope="module")
def oidx(small_corpus):
    return oracle_mod.build_oracle_index(small_corpus)


def test_collection_stats_match_oracle(searcher, oidx):
    st = searcher.reader.stats
    assert st["doc_count"] == oidx.doc_count
    assert st["sum_total_term_freq"] == oidx.sum_total_term_freq
    assert st["n_docs"] == oidx.n_docs


def test_doc_ids_are_lexicographic_rank(spark, index_dir, small_corpus):
    docs = spark.read.parquet(os.path.join(index_dir, "docs")) \
        .select("doc_id", "repo", "path", "commit").toPandas() \
        .sort_values("doc_id").reset_index(drop=True)
    expected = small_corpus.sort_values(["repo", "path", "commit"],
                                        kind="mergesort").reset_index(drop=True)
    assert list(docs["doc_id"]) == list(range(len(expected)))
    assert list(docs["repo"]) == list(expected["repo"])
    assert list(docs["path"]) == list(expected["path"])


def test_sha256_invariant(spark, index_dir, small_corpus):
    """Per-row invariant vs the source table (input_hint)."""
    src = spark.createDataFrame(small_corpus) \
        .select("repo", "path", "commit",
                F.sha2(F.coalesce(F.col("content"), F.lit("")), 256).alias("expect_sha"))
    docs = spark.read.parquet(os.path.join(index_dir, "docs")) \
        .select("repo", "path", "commit", "content_sha256")
    bad = docs.join(src, ["repo", "path", "commit"]) \
        .filter(F.col("content_sha256") != F.col("expect_sha")).count()
    assert bad == 0


@pytest.mark.parametrize("prune", [False, True])
def test_all_reference_queries_match_oracle(searcher, oidx, prune):
    for qid, qtext, qtype in corpus_mod.reference_queries():
        expected = oracle_mod.search_oracle(oidx, qtext, k=10)
        got = searcher.search(qtext, k=10, prune=prune)
        got_ids = [r["doc_id"] for r in got]
        exp_ids = [d for d, _, _ in expected]
        assert got_ids == exp_ids, (
            f"q{qid} [{qtype}] '{qtext}' prune={prune}:\n"
            f" got {got_ids}\n exp {exp_ids}")
        for r, (_, key, score) in zip(got, expected):
            assert r["doc_key"] == key
            assert np.float32(r["score"]) == np.float32(score), (
                f"q{qid} '{qtext}' doc {r['doc_id']}: "
                f"{r['score']} != {score}")


def test_tie_break_lower_doc_id_first(searcher, oidx):
    # E6/E7 have identical content in different repos/partitions
    res = oracle_mod.search_oracle(oidx, "tie", k=10)
    assert len(res) == 2
    assert res[0][0] < res[1][0]
    assert res[0][2] == res[1][2]
    got = searcher.search("tie", k=10)
    assert [r["doc_id"] for r in got] == [res[0][0], res[1][0]]


def test_search_after_pagination(searcher, oidx):
    full = oracle_mod.search_oracle(oidx, "tok1 tok2", k=20)
    page1 = searcher.search("tok1 tok2", k=5)
    cursor = (page1[-1]["score"], page1[-1]["doc_id"])
    page2 = searcher.search("tok1 tok2", k=5, after=cursor)
    ids = [r["doc_id"] for r in page1 + page2]
    assert ids == [d for d, _, _ in full[:10]]


def test_count_matches_oracle(searcher, oidx):
    for q in ["tok0", "tok1 tok2", "+tok0 +tok1"]:
        exp = len(oracle_mod.search_oracle(oidx, q, k=10**9))
        assert searcher.count(q) == exp


def test_absent_term_queries(searcher):
    assert searcher.search("zzz_definitely_absent", k=10) == []
    assert searcher.search("+tok1 +zzz_definitely_absent", k=10) == []
    # absent SHOULD term degrades to the present term only
    assert len(searcher.search("zzz_definitely_absent tok5", k=10)) == 10
