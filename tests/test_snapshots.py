"""Commit snapshots — SnapshotDeletionPolicy + DirectoryReader.open(
IndexCommit) (``index/SnapshotDeletionPolicy.java:40-90``,
``index/DirectoryReader.java:90``): a retained snapshot stays readable
and point-in-time-exact through later deletes, doc-values updates, and
compaction; release makes its data eligible for cleanup."""

import os

import pytest

from lucene_1_spark.index import IndexBuilder, IndexReader
from lucene_1_spark.index.builder import IndexConfig
from lucene_1_spark.index.maintenance import (list_snapshots,
                                              release_snapshot,
                                              snapshot_index)
from lucene_1_spark.search import IndexSearcher
from lucene_1_spark.streaming.incremental import IncrementalIndexWriter

CFG = dict(n_buckets=4, n_doc_partitions=2)


@pytest.fixture()
def idx(spark, tmp_root, request):
    rows = [("r", f"d{i}", "c", "x", t) for i, t in enumerate([
        "alpha beta", "alpha gamma", "beta gamma delta",
        "delta epsilon", "epsilon alpha"])]
    src = spark.createDataFrame(
        rows, "repo string, path string, commit string, lang string, "
              "content string")
    d = os.path.join(tmp_root, f"idx_snap_{request.node.name}")
    IndexBuilder(spark, d, IndexConfig(**CFG)).build(src)
    return d


def _hits(spark, d, q, snapshot=None):
    se = IndexSearcher(IndexReader(spark, d, snapshot=snapshot))
    return {r["doc_id"] for r in se.search_df(q, k=None).collect()}


def test_snapshot_is_point_in_time_for_deletes(spark, idx):
    before = _hits(spark, idx, "alpha")
    snap = snapshot_index(idx)
    assert snap in list_snapshots(idx)
    w = IncrementalIndexWriter(spark, idx, IndexConfig(**CFG))
    w.delete_by_term("beta")
    # current reader sees the deletes; snapshot reader does not
    assert _hits(spark, idx, "alpha") < before
    assert _hits(spark, idx, "alpha", snapshot=snap) == before


def test_snapshot_is_point_in_time_for_dv_updates(spark, idx):
    snap = snapshot_index(idx)
    w = IncrementalIndexWriter(spark, idx, IndexConfig(**CFG))
    w.update_numeric_doc_value("alpha", "stars", 999)
    cur = {r["doc_id"]: r["stars"] for r in
           IndexReader(spark, idx).docs().select("doc_id",
                                                 "stars").collect()}
    assert 999 in cur.values()
    # the pre-update snapshot never saw the dv field at all
    old_docs = IndexReader(spark, idx, snapshot=snap).docs()
    assert "stars" not in old_docs.columns


def test_snapshot_survives_compaction_and_release_frees(spark, idx):
    before = _hits(spark, idx, "alpha")
    snap = snapshot_index(idx)
    w = IncrementalIndexWriter(spark, idx, IndexConfig(**CFG))
    w.delete_by_term("alpha")
    w.compact()   # would normally drop old generations + tombstones
    # snapshot still readable, still sees the pre-delete corpus
    assert _hits(spark, idx, "alpha", snapshot=snap) == before
    assert _hits(spark, idx, "alpha") == set()
    # release, then another cycle of mutation+compaction cleans up
    assert release_snapshot(idx, snap)
    assert snap not in list_snapshots(idx)
    w.delete_by_term("gamma")
    w.compact()
    assert _hits(spark, idx, "delta") != set()


def test_dv_generation_window_after_fold(spark, idx):
    """Updates after a fold don't leak into a snapshot taken before
    them, even though the delta dir is shared."""
    w = IncrementalIndexWriter(spark, idx, IndexConfig(**CFG))
    w.update_numeric_doc_value("alpha", "stars", 111)
    snap = snapshot_index(idx)
    from lucene_1_spark.index.maintenance import fold_doc_values
    fold_doc_values(spark, idx)
    w2 = IncrementalIndexWriter(spark, idx, IndexConfig(**CFG))
    w2.update_numeric_doc_value("delta", "stars", 222)
    cur = {r["doc_id"]: r["stars"] for r in
           IndexReader(spark, idx).docs().select("doc_id",
                                                 "stars").collect()}
    old = {r["doc_id"]: r["stars"] for r in
           IndexReader(spark, idx, snapshot=snap).docs()
           .select("doc_id", "stars").collect()}
    assert 222 in cur.values() and 111 in cur.values()
    assert 111 in old.values() and 222 not in old.values()
