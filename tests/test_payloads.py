"""Per-position payloads — PayloadScoreQuery + attach_payloads +
DelimitedPayloadTokenFilter analog
(``queries/payloads/PayloadScoreQuery.java``, ``PayloadFunction.java``,
``analysis/common/.../payloads/DelimitedPayloadTokenFilter.java``)."""

import os

import pandas as pd
import pytest
from pyspark.sql import functions as F

from lucene_1_spark.index import IndexBuilder, IndexReader
from lucene_1_spark.index.builder import IndexConfig
from lucene_1_spark.index.maintenance import (attach_payloads,
                                              split_delimited_payloads)
from lucene_1_spark.search import IndexSearcher
from lucene_1_spark.search.query import PayloadScoreQuery, TermQuery

DOCS = pd.DataFrame([
    ("r", "d0", "c", "x", "cat|1.0 dog|2.0 cat|5.0 bird"),
    ("r", "d1", "c", "x", "dog|3.0 dog cat|0.5"),
    ("r", "d2", "c", "x", "bird|4.0 fish"),
], columns=["repo", "path", "commit", "lang", "content"])


@pytest.fixture(scope="module")
def pidx(spark, tmp_root):
    d = os.path.join(tmp_root, "idx_payloads")
    clean, prow = split_delimited_payloads(spark.createDataFrame(DOCS))
    cfg = IndexConfig(analyzer="whitespace", n_buckets=4,
                      n_doc_partitions=2, positions=True)
    IndexBuilder(spark, d, cfg).build(clean)
    r = IndexReader(spark, d)
    keyed = r.docs().select("doc_id", "repo", "path", "commit")
    attach_payloads(spark, d,
                    prow.join(keyed, ["repo", "path", "commit"])
                    .select("doc_id", "position", "payload"))
    return IndexSearcher(IndexReader(spark, d))


def _doc_key(s):
    return {r["doc_id"]: r["path"] for r in
            s.reader.docs().select("doc_id", "path").collect()}


def test_split_delimited_payloads(spark):
    clean, prow = split_delimited_payloads(spark.createDataFrame(DOCS))
    got = {r["path"]: r["content"] for r in clean.collect()}
    assert got["d0"] == "cat dog cat bird"
    assert got["d1"] == "dog dog cat"
    rows = {(r["path"], r["position"]): r["payload"]
            for r in prow.collect()}
    assert rows[("d0", 0)] == 1.0 and rows[("d0", 2)] == 5.0
    assert ("d0", 3) not in rows          # bird carries no payload
    assert rows[("d1", 0)] == 3.0 and ("d1", 1) not in rows


def test_payload_functions(pidx):
    key = _doc_key(pidx)

    def scores(q):
        return {key[r["doc_id"]]: round(float(r["score"]), 4)
                for r in pidx.search_df(q, k=None).collect()}

    # cat @ d0 positions 0,2 payloads (1,5); d1 position 2 payload 0.5
    assert scores(PayloadScoreQuery("cat", "max")) == \
        {"d0": 5.0, "d1": 0.5}
    assert scores(PayloadScoreQuery("cat", "min")) == \
        {"d0": 1.0, "d1": 0.5}
    assert scores(PayloadScoreQuery("cat", "sum")) == \
        {"d0": 6.0, "d1": 0.5}
    assert scores(PayloadScoreQuery("cat", "first")) == \
        {"d0": 1.0, "d1": 0.5}
    # avg = AveragePayloadFunction: mean over payloads SEEN
    assert scores(PayloadScoreQuery("cat", "avg")) == \
        {"d0": 3.0, "d1": 0.5}
    # dog @ d1 positions 0(3.0), 1(no payload): missing payloads are
    # skipped, not zero-filled (PayloadFunction ignores absent payloads)
    assert scores(PayloadScoreQuery("dog", "min")) == \
        {"d0": 2.0, "d1": 3.0}
    # a matched doc whose positions carry NO payloads scores 0
    # (docScore with zero payloads seen): bird @ d0 pos 3
    assert scores(PayloadScoreQuery("bird", "max")) == \
        {"d0": 0.0, "d2": 4.0}


def test_payload_include_span_score(pidx):
    key = _doc_key(pidx)
    bm25 = {key[r["doc_id"]]: float(r["score"]) for r in
            pidx.search_df(TermQuery("cat"), k=None).collect()}
    combined = {key[r["doc_id"]]: float(r["score"]) for r in
                pidx.search_df(
                    PayloadScoreQuery("cat", "max",
                                      include_span_score=True),
                    k=None).collect()}
    for p, s in combined.items():
        expected = bm25[p] * (5.0 if p == "d0" else 0.5)
        assert abs(s - expected) < 1e-5, (p, s, expected)


def test_payload_requires_positions_and_table(spark, tmp_root, pidx):
    d = os.path.join(tmp_root, "idx_pay_nopos")
    IndexBuilder(spark, d, IndexConfig(analyzer="whitespace", n_buckets=2,
                                       n_doc_partitions=1)) \
        .build(spark.createDataFrame(DOCS))
    s = IndexSearcher(IndexReader(spark, d))
    with pytest.raises(ValueError, match="positions"):
        s.search_df(PayloadScoreQuery("cat"), k=5)
    with pytest.raises(ValueError):
        PayloadScoreQuery("cat", "median")
    # missing term -> empty, unknown payload table -> error
    assert pidx.search_df(PayloadScoreQuery("zzz"), k=5).count() == 0


def test_payload_no_ghosts_after_compaction(spark, tmp_root):
    from lucene_1_spark.streaming.incremental import IncrementalIndexWriter
    d = os.path.join(tmp_root, "idx_pay_ghost")
    clean, prow = split_delimited_payloads(spark.createDataFrame(DOCS))
    cfg = IndexConfig(analyzer="whitespace", n_buckets=2,
                      n_doc_partitions=1, positions=True)
    IndexBuilder(spark, d, cfg).build(clean)
    r = IndexReader(spark, d)
    keyed = r.docs().select("doc_id", "repo", "path", "commit")
    attach_payloads(spark, d,
                    prow.join(keyed, ["repo", "path", "commit"])
                    .select("doc_id", "position", "payload"))
    w = IncrementalIndexWriter(spark, d, cfg)
    assert w.delete_by_term("fish") == 1      # kills d2
    w.compact()
    r2 = IndexReader(spark, d)
    live = {row["doc_id"] for row in
            r2.docs().select("doc_id").collect()}
    pay_ids = {row["doc_id"] for row in
               r2.payloads().select("doc_id").distinct().collect()}
    assert pay_ids <= live                    # reclaimed rows dropped
    s = IndexSearcher(r2)
    hits = {row["doc_id"] for row in
            s.search_df(PayloadScoreQuery("bird", "max"),
                        k=None).collect()}
    assert hits <= live                       # no ghost from d2
