"""FeatureField / FeatureQuery — static ranking features
(``document/FeatureField.java:217-229,240-470``): tf-encoding
quantization (independently reproduced with struct bit-twiddling),
the four monotonic scoring functions in float32, the default
saturation pivot, and composition as a SHOULD clause next to BM25."""

import math
import os
import struct

import numpy as np
import pytest
from pyspark.sql import functions as F

from lucene_1_spark import corpus as corpus_mod
from lucene_1_spark.functions import feature as feat
from lucene_1_spark.index import IndexBuilder, IndexReader
from lucene_1_spark.index.builder import IndexConfig
from lucene_1_spark.search import IndexSearcher
from lucene_1_spark.search.query import (BooleanQuery, Clause, FeatureQuery,
                                         Occur, TermQuery)


def _ref_quantize(v: float) -> float:
    """Independent bit-for-bit reimplementation via struct:
    decode(encode(v)) = intBitsToFloat((floatToIntBits(v) >>> 15) << 15)."""
    bits = struct.unpack(">I", struct.pack(">f", v))[0]
    return struct.unpack(">f", struct.pack(">I", (bits >> 15) << 15))[0]


def test_quantization_bit_exact():
    vals = [1.0, 3.14159, 0.001, 42.0, 123456.789, 1e-6, 7.5, 255.9]
    got = feat.quantize(np.array(vals, dtype=np.float32))
    for v, g in zip(vals, got):
        assert float(g) == _ref_quantize(v), v
    # values with <= 8 significand bits survive exactly
    for v in [1.0, 2.0, 0.5, 96.0, 3.0, 1.25]:
        assert float(feat.quantize(np.array([v]))[0]) == v


def test_encode_rejects_non_positive():
    with pytest.raises(ValueError):
        feat.encode_feature_value(np.array([0.0]))
    with pytest.raises(ValueError):
        feat.encode_feature_value(np.array([-1.0]))
    with pytest.raises(ValueError):
        feat.encode_feature_value(np.array([np.nan]))


def test_function_formulas_float32():
    s = feat.quantize(np.array([3.0, 10.0, 0.5], dtype=np.float32))
    w = 2.0
    assert np.array_equal(
        feat.score_linear(s, w),
        (np.float32(w) * s).astype(np.float32))
    exp_log = np.array([np.float32(w * math.log(1.5 + float(x)))
                        for x in s], dtype=np.float32)
    assert np.array_equal(feat.score_log(s, w, 1.5), exp_log)
    p = np.float32(4.0)
    exp_sat = (np.float32(w) * (np.float32(1.0) - p / (s + p))
               ).astype(np.float32)
    assert np.array_equal(feat.score_saturation(s, w, 4.0), exp_sat)
    exp_sig = np.array(
        [np.float32(w * (1.0 - 8.0 / (float(x) ** 3 + 8.0))) for x in s],
        dtype=np.float32)
    assert np.array_equal(feat.score_sigmoid(s, w, 2.0, 3.0), exp_sig)


def test_query_validation():
    with pytest.raises(ValueError):
        FeatureQuery("f", function="cube")
    with pytest.raises(ValueError):
        FeatureQuery("f", function="sigmoid")  # pivot required
    with pytest.raises(ValueError):
        FeatureQuery("f", weight=0.0)


@pytest.fixture(scope="module")
def feat_index(spark, tmp_root):
    pdf = corpus_mod.generate(120)
    d = os.path.join(tmp_root, "idx_feature")
    IndexBuilder(spark, d, IndexConfig(n_buckets=4, n_doc_partitions=2)) \
        .build(spark.createDataFrame(pdf).repartition(2, "repo"))
    # deterministic positive feature, exactly quantizable ints, plus
    # doc 0-mod-17 holding NULL (feature not indexed for that doc)
    from lucene_1_spark.index.maintenance import attach_features
    docs = IndexReader(spark, d).docs().select("doc_id")
    feats = docs.withColumn("rankf", F.when(
        F.col("doc_id") % 17 == 0, F.lit(None)).otherwise(
        ((F.col("doc_id") * 37) % 31 + 1).cast("double")))
    attach_features(spark, d, feats)
    return d, pdf


@pytest.fixture(scope="module")
def fts(spark, feat_index):
    d, _ = feat_index
    return IndexSearcher(IndexReader(spark, d))


def _stored(fts):
    return {r["doc_id"]: r["rankf"] for r in
            fts.reader.features().select("doc_id", "rankf").collect()}


def test_feature_query_standalone_saturation(fts):
    stored = _stored(fts)
    rows = fts.search_df(
        FeatureQuery("rankf", "saturation", weight=2.0, pivot=8.0),
        k=None).collect()
    got = {r["doc_id"]: np.float32(r["score"]) for r in rows}
    exp_docs = {d for d, v in stored.items() if v is not None and v > 0}
    assert set(got) == exp_docs and exp_docs
    for d in exp_docs:
        s = feat.quantize(np.array([stored[d]], dtype=np.float32))
        assert got[d] == np.float32(
            feat.score_saturation(s, 2.0, 8.0)[0]), d


def test_feature_query_default_pivot(fts):
    stored = _stored(fts)
    tfs = feat.encode_feature_value(np.array(
        [v for v in stored.values() if v is not None and v > 0],
        dtype=np.float32))
    pivot = feat.default_pivot(tfs)
    explicit = {r["doc_id"]: np.float32(r["score"]) for r in fts.search_df(
        FeatureQuery("rankf", "saturation", pivot=pivot), k=None).collect()}
    implicit = {r["doc_id"]: np.float32(r["score"]) for r in fts.search_df(
        FeatureQuery("rankf", "saturation"), k=None).collect()}
    assert implicit == explicit and implicit


def test_feature_query_log_and_sigmoid(fts):
    stored = _stored(fts)
    for q, ref in [
        (FeatureQuery("rankf", "log", weight=1.5, exp=2.0),
         lambda s: feat.score_log(s, 1.5, 2.0)),
        (FeatureQuery("rankf", "sigmoid", weight=1.5, pivot=6.0, exp=2.0),
         lambda s: feat.score_sigmoid(s, 1.5, 6.0, 2.0)),
        (FeatureQuery("rankf", "linear", weight=0.25),
         lambda s: feat.score_linear(s, 0.25)),
    ]:
        got = {r["doc_id"]: np.float32(r["score"])
               for r in fts.search_df(q, k=None).collect()}
        for d, v in stored.items():
            if v is None or v <= 0:
                assert d not in got
                continue
            s = feat.quantize(np.array([v], dtype=np.float32))
            assert got[d] == np.float32(ref(s)[0]), (d, q.function)


def test_feature_as_should_clause_adds_to_bm25(fts):
    """The canonical pattern: bm25(text) + w*fn(feature) via SHOULD."""
    text_q = TermQuery("tok0")
    f_q = FeatureQuery("rankf", "saturation", weight=3.0, pivot=8.0)
    text = {r["doc_id"]: np.float32(r["score"])
            for r in fts.search_df(text_q, k=None).collect()}
    boost = {r["doc_id"]: np.float32(r["score"])
             for r in fts.search_df(f_q, k=None).collect()}
    combined = {r["doc_id"]: np.float32(r["score"]) for r in fts.search_df(
        BooleanQuery((Clause(text_q, Occur.MUST),
                      Clause(f_q, Occur.SHOULD))), k=None).collect()}
    assert set(combined) == set(text) and combined
    for d in combined:
        exp = np.float32(np.float32(text[d])
                         + np.float32(boost.get(d, np.float32(0.0))))
        assert abs(float(combined[d]) - float(exp)) < 1e-5, d


def test_unknown_feature_column_raises(fts):
    with pytest.raises(ValueError):
        fts.search_df(FeatureQuery("nope"), k=5)


def test_attach_features_merge_refresh(spark, tmp_root):
    """A feature refresh (the operation the reference needs a full
    re-index for): merge adds new columns and newer values win."""
    from lucene_1_spark.index.maintenance import attach_features
    pdf = corpus_mod.generate(40)
    d = os.path.join(tmp_root, "idx_feature_merge")
    IndexBuilder(spark, d, IndexConfig(n_buckets=4, n_doc_partitions=2)) \
        .build(spark.createDataFrame(pdf).repartition(2, "repo"))
    r = IndexReader(spark, d)
    ids = r.docs().select("doc_id")
    attach_features(spark, d, ids.withColumn(
        "pr", (F.col("doc_id") % 5 + 1).cast("double")))
    # refresh pr for even docs only; add a second feature
    attach_features(spark, d, ids.filter(F.col("doc_id") % 2 == 0)
                    .withColumn("pr", F.lit(9.0))
                    .withColumn("rec", (F.col("doc_id") + 1.0)))
    feats = {r2["doc_id"]: (r2["pr"], r2["rec"]) for r2 in
             IndexReader(spark, d).features().collect()}
    for did, (pr, rec) in feats.items():
        if did % 2 == 0:
            assert pr == 9.0 and rec == did + 1.0
        else:
            assert pr == did % 5 + 1 and rec is None

    def test_rejects():
        with pytest.raises(ValueError):
            attach_features(spark, d, ids)  # no value column
        with pytest.raises(ValueError):
            attach_features(spark, d, ids.withColumn("lang", F.lit(1.0)))
    test_rejects()


def test_feature_no_ghosts_after_reclaim(spark, tmp_root):
    """After compact/merge reclaims tombstones (mask gone), the
    features side table must not resurface deleted docs as ghost
    FeatureQuery hits — compaction rewrites the table dropping
    reclaimed doc_ids."""
    from lucene_1_spark.index.maintenance import (attach_features,
                                                  compact_index)
    from lucene_1_spark.streaming.incremental import IncrementalIndexWriter
    pdf = corpus_mod.generate(90)
    d = os.path.join(tmp_root, "idx_feature_ghost")
    cfg = IndexConfig(n_buckets=4, n_doc_partitions=2)
    IndexBuilder(spark, d, cfg).build(spark.createDataFrame(pdf))
    docs = IndexReader(spark, d).docs().select("doc_id")
    attach_features(spark, d, docs.withColumn(
        "rankf", ((F.col("doc_id") % 7) + 1).cast("double")))

    w = IncrementalIndexWriter(spark, d, cfg)
    n_del = w.delete_by_term("tok3")
    assert n_del > 0
    # pending deletes: already masked by the tombstone anti-join
    s = IndexSearcher(IndexReader(spark, d))
    live_pending = {r["doc_id"] for r in
                    s.search_df(FeatureQuery("rankf", "linear"),
                                k=None).collect()}
    compact_index(spark, d)
    r2 = IndexReader(spark, d)
    assert not r2.has_deletes
    live_ids = {r["doc_id"] for r in
                r2.docs().select("doc_id").collect()}
    # the features table itself holds no reclaimed rows
    feat_ids = {r["doc_id"] for r in
                r2.features().select("doc_id").collect()}
    assert feat_ids <= live_ids
    hits = {r["doc_id"] for r in
            IndexSearcher(r2).search_df(FeatureQuery("rankf", "linear"),
                                        k=None).collect()}
    assert hits <= live_ids            # no ghosts
    assert hits == live_pending        # same matches as the masked view
