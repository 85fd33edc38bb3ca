"""Incremental (segment-append) indexing: appended batches must yield
the same index state as a single full build when batches arrive in key
order, and query results must stay oracle-identical."""

import os

import pytest
from pyspark.sql import functions as F

from lucene_1_spark import corpus as corpus_mod
from lucene_1_spark import oracle as oracle_mod
from lucene_1_spark.index import IndexReader
from lucene_1_spark.index.builder import IndexConfig
from lucene_1_spark.search import IndexSearcher
from lucene_1_spark.streaming import IncrementalIndexWriter


@pytest.fixture(scope="module")
def incr_index(spark, tmp_root):
    pdf = corpus_mod.t_small().sort_values(
        ["repo", "path", "commit"], kind="mergesort").reset_index(drop=True)
    half = len(pdf) // 2
    d = os.path.join(tmp_root, "idx_incr")
    cfg = IndexConfig(n_buckets=8, n_doc_partitions=4)
    w = IncrementalIndexWriter(spark, d, cfg)
    w.append(spark.createDataFrame(pdf.iloc[:half]))      # bootstrap build
    w.append(spark.createDataFrame(pdf.iloc[half:]))      # segment append
    return d, pdf


def test_append_matches_oracle(spark, incr_index):
    d, pdf = incr_index
    searcher = IndexSearcher(IndexReader(spark, d))
    oidx = oracle_mod.build_oracle_index(pdf)
    assert searcher.reader.stats["n_docs"] == oidx.n_docs
    assert searcher.reader.stats["sum_total_term_freq"] == oidx.sum_total_term_freq
    for q in ["tok0", "tok1 tok2", "+tok0 +tok1", "tie", "def class return"]:
        exp = oracle_mod.search_oracle(oidx, q, k=10)
        got = searcher.search(q, k=10)
        assert [r["doc_id"] for r in got] == [e[0] for e in exp], q
        for r, e in zip(got, exp):
            import numpy as np
            assert np.float32(r["score"]) == np.float32(e[2]), (q, r, e)


def test_segments_recorded(spark, incr_index):
    d, _ = incr_index
    import json
    with open(os.path.join(d, "manifest.json")) as fh:
        m = json.load(fh)
    assert m.get("n_segments", 1) == 2
    cp = spark.read.parquet(os.path.join(d, "checkpoints"))
    stages = {r["stage"] for r in cp.collect()}
    assert "append_1" in stages


def test_term_spanning_segments(spark, incr_index):
    """A term present in both halves has block runs from two segments;
    doc_freq must still aggregate across them."""
    d, pdf = incr_index
    reader = IndexReader(spark, d)
    stats = reader.term_statistics(["tok0"])
    oidx = oracle_mod.build_oracle_index(pdf)
    assert stats["tok0"][0] == len(oidx.postings["tok0"])
    assert stats["tok0"][1] == sum(oidx.postings["tok0"].values())


def test_foreach_batch_handler(spark, tmp_root):
    d = os.path.join(tmp_root, "idx_stream")
    w = IncrementalIndexWriter(spark, d,
                               IndexConfig(n_buckets=4, n_doc_partitions=2))
    handler = w.foreach_batch()
    pdf = corpus_mod.generate(60)
    handler(spark.createDataFrame(pdf.iloc[:30]), 0)
    handler(spark.createDataFrame(pdf.iloc[30:]), 1)
    schema = "repo string, path string, commit string, lang string, content string"
    handler(spark.createDataFrame(pdf.iloc[:0], schema=schema), 2)  # empty: no-op
    searcher = IndexSearcher(IndexReader(spark, d))
    assert searcher.reader.stats["n_docs"] == 60
    assert len(searcher.search("tok0", k=5)) > 0


def test_monitor_percolation(spark):
    """Reverse search: registered queries matched against a doc batch."""
    from lucene_1_spark.streaming.monitor import Monitor
    m = Monitor(spark, analyzer="whitespace")
    m.register("q_and", "+spark +merge")
    m.register("q_not", "window -batch")
    m.register("q_term", "dup")
    m.register("q_exact", '"spark merge"')
    m.register("q_slop", '"spark window"~1')
    m.register("q_bp", '+dup +"spark merge"')  # phrase inside boolean
    m.register("q_notph", 'dup -"spark merge"')  # MUST_NOT phrase
    m.register("q_orph", '"spark merge" window')  # SHOULD phrase (msm 1)
    docs = spark.createDataFrame([
        (0, "spark merge window"),        # q_and, q_not, q_exact, q_slop(gap1)
        (1, "spark window batch"),        # q_slop only (q_not killed by batch)
        (2, "merge dup"),                 # q_term
        (3, "nothing relevant"),          # none
        (4, "spark merge dup batch"),     # q_and, q_term, q_exact
        (5, "merge spark"),               # q_and only (phrase order wrong)
        (6, "spark gap gap window"),      # q_not (no q_slop: gap 2 > slop 1)
    ], "doc_id long, text string")
    got = {(r["doc_id"], r["query_id"])
           for r in m.match_batch(docs).collect()}
    assert got == {(0, "q_and"), (0, "q_not"), (2, "q_term"),
                   (4, "q_and"), (4, "q_term"),
                   (0, "q_exact"), (4, "q_exact"), (5, "q_and"),
                   (0, "q_slop"), (1, "q_slop"), (6, "q_not"),
                   (4, "q_bp"),
                   # dup present, phrase absent -> q_notph; doc 4 has
                   # the phrase so its dup match is killed
                   (2, "q_notph"),
                   # phrase OR window (pure disjunction, msm 1)
                   (0, "q_orph"), (1, "q_orph"), (4, "q_orph"),
                   (6, "q_orph")}


def test_monitor_standard_analyzer_path(spark):
    from lucene_1_spark.streaming.monitor import Monitor
    m = Monitor(spark, analyzer="standard")
    m.register("q", "+foo +bar")
    docs = spark.createDataFrame([(0, "Foo,Bar!"), (1, "foo only")],
                                 "doc_id long, text string")
    got = {(r["doc_id"], r["query_id"])
           for r in m.match_batch(docs).collect()}
    assert got == {(0, "q")}


def test_monitor_complex_trees(spark):
    """Arbitrary query trees percolate: nested booleans, prefix,
    wildcard, fuzzy, range — presearched by extracted term sets (or
    ANYTOKEN) then verified by full tree evaluation."""
    from lucene_1_spark.streaming.monitor import Monitor
    m = Monitor(spark, analyzer="whitespace")
    m.register("q_nested", "+spark +(merge || window)")     # nested boolean
    m.register("q_prefix", "win*")                          # ANYTOKEN path
    m.register("q_bool_prefix", "+dup +win*")               # required term + prefix
    m.register("q_fuzzy", "sprak~1")                        # fuzzy, ANYTOKEN
    m.register("q_range", "[m TO n]")                       # term range
    m.register("q_not_nested", "spark -(merge window)")     # nested MUST_NOT
    docs = spark.createDataFrame([
        (0, "spark merge fast"),
        (1, "spark window"),
        (2, "dup window stuff"),
        (3, "spark alone"),
        (4, "dup merge"),
        (5, "sprak typo"),
    ], "doc_id long, text string")
    got = {(r["doc_id"], r["query_id"])
           for r in m.match_batch(docs).collect()}
    assert got == {
        (0, "q_nested"), (1, "q_nested"),
        (1, "q_prefix"), (2, "q_prefix"),
        (2, "q_bool_prefix"),
        (5, "q_fuzzy"),
        (0, "q_range"), (4, "q_range"),   # 'merge' in [m, n]
        (3, "q_not_nested"),
    }


def test_monitor_complex_save_load(spark, tmp_root):
    import os
    from lucene_1_spark.streaming.monitor import Monitor
    m = Monitor(spark, analyzer="whitespace")
    m.register("q1", "+spark +(merge || window)")
    m.register("q2", "win*")
    p = os.path.join(tmp_root, "mon_complex")
    m.save(p)
    m2 = Monitor.load(spark, p)
    docs = spark.createDataFrame([(0, "spark window"), (1, "plain")],
                                 "doc_id long, text string")
    got = {(r["doc_id"], r["query_id"])
           for r in m2.match_batch(docs).collect()}
    assert got == {(0, "q1"), (0, "q2")}


def test_monitor_phrase_repeated_terms(spark):
    """Percolated sloppy phrases with repeats need distinct positions
    (same fix as the executor)."""
    from lucene_1_spark.streaming.monitor import Monitor
    m = Monitor(spark, analyzer="whitespace")
    m.register("q_rep", '"a b b"~1')
    docs = spark.createDataFrame([
        (0, "a b c"),          # single b -> no match
        (1, "a b x b"),        # two b's -> match
    ], "doc_id long, text string")
    got = {(r["doc_id"], r["query_id"])
           for r in m.match_batch(docs).collect()}
    assert got == {(1, "q_rep")}


def test_monitor_register_query_objects(spark):
    """Register-by-Query-object: dismax and term-in-set (not
    parser-expressible) percolate through the serialized complex path,
    and survive save/load."""
    import os
    import tempfile

    from lucene_1_spark.search.query import (DisjunctionMaxQuery,
                                             PhraseQuery, TermInSetQuery,
                                             TermQuery)
    from lucene_1_spark.streaming.monitor import Monitor
    m = Monitor(spark)
    m.register("dm", DisjunctionMaxQuery(
        (TermQuery("alpha"), PhraseQuery(("big", "data"))), 0.5))
    m.register("tis", TermInSetQuery(("beta", "gamma")))
    docs = spark.createDataFrame(
        [(0, "alpha zeta"), (1, "big data lake"), (2, "gamma rays"),
         (3, "nothing relevant"), (4, "data big")],
        "doc_id long, text string")
    got = {(r["doc_id"], r["query_id"])
           for r in m.match_batch(docs).collect()}
    assert got == {(0, "dm"), (1, "dm"), (2, "tis")}
    # persistence round-trip keeps the serialized registrations
    p = os.path.join(tempfile.mkdtemp(), "monitor_state.json")
    m.save(p)
    m2 = Monitor.load(spark, p)
    got2 = {(r["doc_id"], r["query_id"])
            for r in m2.match_batch(docs).collect()}
    assert got2 == got
