"""In-place doc-values updates
(``IndexWriter.updateNumericDocValue`` / ``updateBinaryDocValue``;
fold = ``ReadersAndUpdates.writeFieldUpdates``): delta-table overlay
with latest-generation-wins, scoring untouched, fold materializes.
Internal columns (norms / stats inputs like ``length``) are rejected —
the Lucene analog of updateNumericDocValue's non-dv-field
IllegalArgumentException."""

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


def _col(spark, d, col):
    r = IndexReader(spark, d)
    return {x["doc_id"]: x[col] for x in
            r.docs().select("doc_id", col).collect()}


def _writer(spark, d):
    return IncrementalIndexWriter(spark, d, IndexConfig(n_buckets=4,
                                                        n_doc_partitions=2))


def test_numeric_update_overlays_and_scoring_unchanged(spark, idx):
    before_scores = IndexSearcher(IndexReader(spark, idx)) \
        .search_df("beta", k=None).collect()
    w = _writer(spark, idx)
    n = w.update_numeric_doc_value("alpha", "stars", 999)
    assert n == 2  # d0, d1 contain alpha
    got = _col(spark, idx, "stars")
    se = IndexSearcher(IndexReader(spark, idx))
    alpha_ids = {r["doc_id"] for r in
                 se.search_df("alpha", k=None).collect()}
    for d_id, v in got.items():
        assert (v == 999) if d_id in alpha_ids else (v is None), d_id
    # postings/norms untouched: identical scores
    after_scores = se.search_df("beta", k=None).collect()
    assert sorted((r["doc_id"], r["score"]) for r in before_scores) == \
        sorted((r["doc_id"], r["score"]) for r in after_scores)
    # DocValuesRangeQuery sees the new field through docs()
    from lucene_1_spark.search.query import DocValuesRangeQuery
    hits = {r["doc_id"] for r in
            se.search_df(DocValuesRangeQuery("stars", 1.0, 9999.0),
                         k=None).collect()}
    assert hits == alpha_ids


def test_latest_generation_wins_and_string_update(spark, idx):
    w = _writer(spark, idx)
    w.update_numeric_doc_value("alpha", "stars", 111)
    w.update_numeric_doc_value("alpha", "stars", 222)
    got = _col(spark, idx, "stars")
    se = IndexSearcher(IndexReader(spark, idx))
    alpha_ids = {r["doc_id"] for r in se.search_df("alpha", k=None).collect()}
    assert all(got[i] == 222 for i in alpha_ids)
    # binary (string) update on an existing string field
    w.update_binary_doc_value("zeta", "lang", "zz")
    langs = _col(spark, idx, "lang")
    zeta_ids = {r["doc_id"] for r in se.search_df("zeta", k=None).collect()}
    for d_id, lg in langs.items():
        assert lg == ("zz" if d_id in zeta_ids else "x"), d_id


def test_binary_update_creates_string_field(spark, idx):
    """ADVICE r4: a binary update to a BRAND-NEW field must materialize
    value_str, not an all-null numeric column."""
    w = _writer(spark, idx)
    n = w.update_binary_doc_value("gamma", "tag", "hot")
    assert n == 2  # d0, d3 contain gamma
    got = _col(spark, idx, "tag")
    se = IndexSearcher(IndexReader(spark, idx))
    gamma_ids = {r["doc_id"] for r in se.search_df("gamma", k=None).collect()}
    for d_id, v in got.items():
        assert (v == "hot") if d_id in gamma_ids else (v is None), d_id
    # survives the fold as a string column
    assert fold_doc_values(spark, idx) == 1
    assert _col(spark, idx, "tag") == got


def test_reserved_and_mismatched_fields_rejected(spark, idx):
    w = _writer(spark, idx)
    for f in ("length", "doc_id", "content_sha256", "repo", "norm_byte"):
        with pytest.raises(ValueError, match="internal index column"):
            w.update_numeric_doc_value("alpha", f, 1.0)
    with pytest.raises(ValueError, match="string field"):
        w.update_numeric_doc_value("alpha", "lang", 3.0)
    w.update_binary_doc_value("alpha", "tag", "x")
    with pytest.raises(ValueError, match="mix"):
        w.update_numeric_doc_value("beta", "tag", 1.0)
    # after the fold the field has a concrete string type: numeric
    # updates still rejected, now by the schema check
    fold_doc_values(spark, idx)
    with pytest.raises(ValueError, match="string field"):
        w.update_numeric_doc_value("beta", "tag", 1.0)


def test_fold_materializes_and_clears_delta(spark, idx):
    w = _writer(spark, idx)
    w.update_numeric_doc_value("alpha", "stars", 777)
    before = _col(spark, idx, "stars")
    n_fields = fold_doc_values(spark, idx)
    assert n_fields == 1
    r = IndexReader(spark, idx)
    assert "dv_fields" not in r.manifest
    assert "dv_field_kinds" not in r.manifest
    assert not os.path.exists(os.path.join(idx, "dv_updates"))
    assert _col(spark, idx, "stars") == before
    # a later update overlays the NOW-EXISTING materialized column
    w2 = _writer(spark, idx)
    w2.update_numeric_doc_value("zeta", "stars", 5)
    got = _col(spark, idx, "stars")
    se = IndexSearcher(IndexReader(spark, idx))
    zeta_ids = {x["doc_id"] for x in se.search_df("zeta", k=None).collect()}
    for d_id, v in got.items():
        assert v == (5 if d_id in zeta_ids else before[d_id]), d_id
    assert fold_doc_values(spark, idx) == 1
    assert fold_doc_values(spark, idx) == 0  # nothing pending


def test_compact_folds_updates(spark, idx):
    w = _writer(spark, idx)
    w.update_numeric_doc_value("alpha", "stars", 321)
    before = _col(spark, idx, "stars")
    w.delete_by_term("epsilon")
    w.compact()
    r = IndexReader(spark, idx)
    assert "dv_fields" not in r.manifest
    got = _col(spark, idx, "stars")
    # deleted docs gone; surviving docs keep the updated values
    assert all(v == before[k] for k, v in got.items())
    assert len(got) < len(before)


def test_expression_sort_binds_score_and_dv(spark, idx):
    """Expressions-module sort (ExpressionRescorer/SimpleBindings
    analog): hits ordered by an arbitrary SQL expression mixing score
    and a dv-UPDATED field — the binding must see the latest dv
    generation, and the ordering must match a brute-force recompute."""
    import math
    w = _writer(spark, idx)
    w.update_numeric_doc_value("beta", "priority", 5)
    w.update_numeric_doc_value("delta", "priority", 50)   # d1,d2 bump
    se = IndexSearcher(IndexReader(spark, idx))
    expr = "0.3*score + 0.7*log(1 + priority)"
    got = se.search_sorted_expr("beta delta", expr, k=10).collect()
    assert [c in got[0].asDict() for c in
            ("doc_id", "score", "sort_key", "priority")]
    base = {r["doc_id"]: r["score"] for r in
            se.search_df("beta delta", k=None).collect()}
    prio = _col(spark, idx, "priority")
    want = sorted(
        ((0.3 * s + 0.7 * math.log(1 + prio[d]), d)
         for d, s in base.items() if prio.get(d) is not None),
        key=lambda x: (-x[0], x[1]))
    assert [r["doc_id"] for r in got] == [d for _, d in want]
    for r, (key, _) in zip(got, want):
        assert abs(r["sort_key"] - key) < 1e-9
    # expression referencing only score: no doc join needed, still works
    got2 = se.search_sorted_expr("beta", "score * score", k=3).collect()
    b = sorted(((r["score"], r["doc_id"]) for r in
                se.search_df("beta", k=None).collect()),
               key=lambda x: (-x[0] * x[0], x[1]))
    assert [r["doc_id"] for r in got2] == [d for _, d in b][:3]
