"""Hierarchical taxonomy facets (FastTaxonomyFacetCounts analog) and
the LRU filter cache (LRUQueryCache analog)."""

import os

import pytest

from lucene_1_spark import corpus as corpus_mod
from lucene_1_spark.index import IndexBuilder, IndexReader
from lucene_1_spark.index.builder import IndexConfig
from lucene_1_spark.search import IndexSearcher
from lucene_1_spark.search.facets import (taxonomy_children,
                                          taxonomy_facet_counts)
from lucene_1_spark.search.query import (BooleanQuery, Clause, Occur,
                                         PhraseQuery, TermQuery)


@pytest.fixture(scope="module")
def paths_df(spark):
    return spark.createDataFrame(
        [("a/b/c",), ("a/b",), ("a/x",), ("d",)], "fpath string")


def test_taxonomy_counts_all_prefixes(paths_df):
    got = {(r["path"], r["depth"]): r["n"]
           for r in taxonomy_facet_counts(paths_df, "fpath").collect()}
    assert got == {("a", 1): 3, ("a/b", 2): 2, ("a/b/c", 3): 1,
                   ("a/x", 2): 1, ("d", 1): 1}


def test_taxonomy_counts_max_depth(paths_df):
    got = {(r["path"], r["depth"]): r["n"]
           for r in taxonomy_facet_counts(paths_df, "fpath",
                                          max_depth=2).collect()}
    assert got == {("a", 1): 3, ("a/b", 2): 2, ("a/x", 2): 1, ("d", 1): 1}


def test_taxonomy_children_drilldown(paths_df):
    roots = [(r["child"], r["n"])
             for r in taxonomy_children(paths_df, "fpath").collect()]
    assert roots == [("a", 3), ("d", 1)]
    under_a = [(r["child"], r["n"])
               for r in taxonomy_children(paths_df, "fpath", "a").collect()]
    assert under_a == [("b", 2), ("x", 1)]
    under_ab = [(r["child"], r["n"])
                for r in taxonomy_children(paths_df, "fpath",
                                           "a/b").collect()]
    assert under_ab == [("c", 1)]


@pytest.fixture(scope="module")
def qc_searcher(spark, tmp_root):
    d = os.path.join(tmp_root, "idx_qcache")
    IndexBuilder(spark, d, IndexConfig(n_buckets=4, n_doc_partitions=2,
                                       positions=True)) \
        .build(spark.createDataFrame(corpus_mod.generate(120))
               .repartition(2, "repo"))
    return IndexSearcher(IndexReader(spark, d))


def test_query_cache_identical_results_and_hits(qc_searcher):
    s = qc_searcher
    q = BooleanQuery((Clause(TermQuery("tok1"), Occur.MUST),
                      Clause(PhraseQuery(("tok0", "tok1")), Occur.FILTER)))
    baseline = sorted((r["doc_id"], r["score"])
                      for r in s.search_df(q, k=None).collect())
    cache = s.set_query_cache(max_entries=4)
    try:
        r1 = sorted((r["doc_id"], r["score"])
                    for r in s.search_df(q, k=None).collect())
        r2 = sorted((r["doc_id"], r["score"])
                    for r in s.search_df(q, k=None).collect())
        assert r1 == r2 == baseline and baseline
        assert cache.misses == 1 and cache.hits >= 1
    finally:
        cache.clear()
        s.query_cache = None


def test_query_cache_lru_eviction(qc_searcher):
    s = qc_searcher
    cache = s.set_query_cache(max_entries=2)
    try:
        for t in ("tok0", "tok1", "tok2"):
            cache.docs_for(TermQuery(t))
        assert len(cache._entries) == 2
        # oldest (tok0) evicted: asking again is a miss
        m0 = cache.misses
        cache.docs_for(TermQuery("tok0"))
        assert cache.misses == m0 + 1
        # tok2 still resident: hit
        h0 = cache.hits
        cache.docs_for(TermQuery("tok2"))
        assert cache.hits == h0 + 1
    finally:
        cache.clear()
        s.query_cache = None


def test_monitor_save_load_roundtrip(spark, tmp_root):
    """Monitor persistence (the reference Monitor's durable query
    index): saved + loaded state percolates identically."""
    from lucene_1_spark.streaming.monitor import Monitor
    m = Monitor(spark, analyzer="whitespace")
    m.register("q1", "+a +b")
    m.register("q2", '"x y" -z')
    m.register("q3", 'c "p q"')
    path = os.path.join(tmp_root, "monitor_state")
    m.save(path)
    m2 = Monitor.load(spark, path)
    docs = spark.createDataFrame([
        (0, "a b c"), (1, "x y w"), (2, "x y z"), (3, "p q"),
    ], "doc_id long, text string")
    a = sorted((r["doc_id"], r["query_id"])
               for r in m.match_batch(docs).collect())
    b = sorted((r["doc_id"], r["query_id"])
               for r in m2.match_batch(docs).collect())
    assert a == b and a


def test_check_index_field_stats(spark, tmp_root):
    """check_index validates manifest field_stats on multi-field
    indexes and keeps doc-length agreement content-only."""
    from pyspark.sql import functions as FF

    from lucene_1_spark.index import IndexBuilder, IndexReader
    from lucene_1_spark.index.builder import IndexConfig
    from lucene_1_spark.index.check import check_index
    d = os.path.join(tmp_root, "idx_check_fields")
    src = (spark.createDataFrame(corpus_mod.generate(80))
           .withColumn("title", FF.substring("content", 1, 40))
           .repartition(2, "repo"))
    IndexBuilder(spark, d, IndexConfig(
        n_buckets=4, n_doc_partitions=2, keyword_fields=("lang",),
        text_fields=("title",))).build(src)
    out = check_index(IndexReader(spark, d))
    for name, (ok, msg) in out.items():
        assert ok, (name, msg)
    assert "field_stats" in out


def test_drill_sideways(qc_searcher):
    """DrillSideways: each dimension's counts apply every OTHER dim's
    filter; __hits__ applies all of them."""
    from pyspark.sql import functions as FF

    from lucene_1_spark.search.facets import drill_sideways
    s = qc_searcher
    docs = {r["doc_id"]: (r["lang"], r["length"])
            for r in s.reader.docs().select("doc_id", "lang",
                                            "length").collect()}
    base = {r["doc_id"] for r in s.search_df("tok1", k=None).collect()}
    sel_lang = "python"
    sel_bucket = 100
    out = drill_sideways(
        s, "tok1", {"lang": sel_lang, "len_bucket": sel_bucket},
        stored=["lang", "length"],
        derive={"len_bucket":
                (FF.floor(FF.col("length") / 100) * 100).cast("long")})
    got_lang = {r["value"]: r["n"] for r in out["lang"].collect()}
    exp_lang = {}
    for d in base:
        lang, ln = docs[d]
        if (ln // 100) * 100 == sel_bucket:
            exp_lang[lang] = exp_lang.get(lang, 0) + 1
    assert got_lang == exp_lang and exp_lang
    got_b = {int(r["value"]): r["n"] for r in out["len_bucket"].collect()}
    exp_b = {}
    for d in base:
        lang, ln = docs[d]
        if lang == sel_lang:
            b = (ln // 100) * 100
            exp_b[b] = exp_b.get(b, 0) + 1
    assert got_b == exp_b and exp_b
    hits = {r["doc_id"] for r in out["__hits__"].collect()}
    assert hits == {d for d in base
                    if docs[d][0] == sel_lang
                    and (docs[d][1] // 100) * 100 == sel_bucket}
