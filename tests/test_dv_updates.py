"""In-place doc-values updates
(``IndexWriter.updateNumericDocValue`` / ``updateBinaryDocValue``;
fold = ``ReadersAndUpdates.writeFieldUpdates``): delta-table overlay
with latest-generation-wins, scoring untouched, fold materializes."""

import os

import pytest
from pyspark.sql import functions as F

from lucene_1_spark.index import IndexBuilder, IndexReader
from lucene_1_spark.index.builder import IndexConfig
from lucene_1_spark.index.maintenance import fold_doc_values
from lucene_1_spark.search import IndexSearcher
from lucene_1_spark.streaming.incremental import IncrementalIndexWriter


@pytest.fixture()
def idx(spark, tmp_root, request):
    rows = [("r", f"d{i}", "c", "x", t) for i, t in enumerate([
        "alpha beta gamma", "alpha delta", "beta delta epsilon",
        "gamma gamma", "epsilon zeta"])]
    src = spark.createDataFrame(
        rows, "repo string, path string, commit string, lang string, "
              "content string")
    d = os.path.join(tmp_root, f"idx_dv_{request.node.name}")
    IndexBuilder(spark, d, IndexConfig(n_buckets=4,
                                       n_doc_partitions=2)).build(src)
    return d


def _lengths(spark, d):
    r = IndexReader(spark, d)
    return {x["doc_id"]: x["length"] for x in
            r.docs().select("doc_id", "length").collect()}


def test_numeric_update_overlays_and_scoring_unchanged(spark, idx):
    before_scores = IndexSearcher(IndexReader(spark, idx)) \
        .search_df("beta", k=None).collect()
    base = _lengths(spark, idx)
    w = IncrementalIndexWriter(spark, idx, IndexConfig(n_buckets=4,
                                                       n_doc_partitions=2))
    n = w.update_numeric_doc_value("alpha", "length", 999)
    assert n == 2  # d0, d1 contain alpha
    got = _lengths(spark, idx)
    se = IndexSearcher(IndexReader(spark, idx))
    alpha_ids = {r["doc_id"] for r in
                 se.search_df("alpha", k=None).collect()}
    for d_id, ln in got.items():
        assert ln == (999 if d_id in alpha_ids else base[d_id]), d_id
    # postings/norms untouched: identical scores
    after_scores = se.search_df("beta", k=None).collect()
    assert sorted((r["doc_id"], r["score"]) for r in before_scores) == \
        sorted((r["doc_id"], r["score"]) for r in after_scores)


def test_latest_generation_wins_and_string_update(spark, idx):
    w = IncrementalIndexWriter(spark, idx, IndexConfig(n_buckets=4,
                                                       n_doc_partitions=2))
    w.update_numeric_doc_value("alpha", "length", 111)
    w.update_numeric_doc_value("alpha", "length", 222)
    got = _lengths(spark, idx)
    se = IndexSearcher(IndexReader(spark, idx))
    alpha_ids = {r["doc_id"] for r in se.search_df("alpha", k=None).collect()}
    assert all(got[i] == 222 for i in alpha_ids)
    # binary (string) update on a different field
    w.update_binary_doc_value("zeta", "lang", "zz")
    langs = {r["doc_id"]: r["lang"] for r in
             IndexReader(spark, idx).docs().select("doc_id", "lang").collect()}
    zeta_ids = {r["doc_id"] for r in se.search_df("zeta", k=None).collect()}
    for d_id, lg in langs.items():
        assert lg == ("zz" if d_id in zeta_ids else "x"), d_id


def test_new_field_appears_only_on_updated_docs(spark, idx):
    w = IncrementalIndexWriter(spark, idx, IndexConfig(n_buckets=4,
                                                       n_doc_partitions=2))
    w.update_numeric_doc_value("gamma", "stars", 5.0)
    rows = {r["doc_id"]: r["stars"] for r in
            IndexReader(spark, idx).docs().select("doc_id", "stars").collect()}
    se = IndexSearcher(IndexReader(spark, idx))
    gamma_ids = {r["doc_id"] for r in se.search_df("gamma", k=None).collect()}
    for d_id, v in rows.items():
        assert (v == 5.0) if d_id in gamma_ids else (v is None), d_id
    # DocValuesRangeQuery sees the new field through docs()
    from lucene_1_spark.search.query import DocValuesRangeQuery
    hits = {r["doc_id"] for r in
            se.search_df(DocValuesRangeQuery("stars", 1.0, 9.0),
                         k=None).collect()}
    assert hits == gamma_ids


def test_fold_materializes_and_clears_delta(spark, idx):
    w = IncrementalIndexWriter(spark, idx, IndexConfig(n_buckets=4,
                                                       n_doc_partitions=2))
    w.update_numeric_doc_value("alpha", "length", 777)
    before = _lengths(spark, idx)
    n_fields = fold_doc_values(spark, idx)
    assert n_fields == 1
    r = IndexReader(spark, idx)
    assert "dv_fields" not in r.manifest
    assert not os.path.exists(os.path.join(idx, "dv_updates"))
    assert _lengths(spark, idx) == before
    # a later update starts a fresh delta over the folded generation
    w2 = IncrementalIndexWriter(spark, idx, IndexConfig(n_buckets=4,
                                                        n_doc_partitions=2))
    w2.update_numeric_doc_value("zeta", "length", 5)
    got = _lengths(spark, idx)
    se = IndexSearcher(IndexReader(spark, idx))
    zeta_ids = {x["doc_id"] for x in se.search_df("zeta", k=None).collect()}
    for d_id, ln in got.items():
        assert ln == (5 if d_id in zeta_ids else before[d_id]), d_id
    assert fold_doc_values(spark, idx) == 1
    assert fold_doc_values(spark, idx) == 0  # nothing pending


def test_compact_folds_updates(spark, idx):
    w = IncrementalIndexWriter(spark, idx, IndexConfig(n_buckets=4,
                                                       n_doc_partitions=2))
    w.update_numeric_doc_value("alpha", "length", 321)
    before = _lengths(spark, idx)
    w.delete_by_term("epsilon")
    w.compact()
    r = IndexReader(spark, idx)
    assert "dv_fields" not in r.manifest
    got = _lengths(spark, idx)
    # deleted docs gone; surviving docs keep the updated values
    assert all(v == before[k] for k, v in got.items())
    assert len(got) < len(before)
    assert 321 in got.values()
