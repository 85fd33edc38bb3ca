"""Incremental index append + mutation — the NRT-refresh / segment-append
analog (``SearcherManager.maybeRefresh`` + new-segment flush,
``search/SearcherManager.java:52``; SURVEY.md §2.10) plus the
IndexWriter mutation surface (``index/IndexWriter.java:1837``
deleteDocuments/updateDocument).

Each appended batch becomes a new "segment": its docs get docIDs after
all existing docs (insertion order, exactly Lucene's
earlier-segment-=-lower-docID rule, ``TopDocs.java:71-117``), its
posting blocks are packed with the SAME kernels as the full build
(:func:`docs_meta_df` / :func:`pack_blocks_df`) and *appended*
to the postings table — a term's postings may then span several block
runs with disjoint doc ranges, which the decode kernel tolerates
(compaction later merges the runs, ``index/maintenance.py``).
Term stats are re-aggregated from blocks, collection stats and the
manifest are rewritten last — the manifest rewrite is the snapshot
commit (on Iceberg: an atomic snapshot; parquet-dir + manifest.json is
the sandbox stand-in).  A reader opened before the commit still sees a
consistent older index.

Structured Streaming: ``writer.foreach_batch()`` plugs into
``df.writeStream.foreachBatch(...)`` so a document stream continuously
extends the index, one micro-batch per segment.  Replayed micro-batches
(Structured Streaming redelivers after failure) are detected by
batch_id in the checkpoint table and skipped, so the append is
idempotent at the batch level.

Deletes are tombstones (query-time liveDocs masking); updates are
delete-by-key + append — Lucene's updateDocument contract: the new
version gets a NEW docID in a later segment (``IndexWriter.java:1837``).
"""

from __future__ import annotations

import json
import os
import time

from pyspark.sql import DataFrame, SparkSession, functions as F

from lucene_1_spark.index.builder import (DOC_KEY_COLS, IndexBuilder,
                                          IndexConfig, docs_meta_df,
                                          pack_blocks_df, range_partition)
from lucene_1_spark.index.maintenance import append_tombstones, compact_index


class IncrementalIndexWriter:
    def __init__(self, spark: SparkSession, index_dir: str,
                 config: IndexConfig | None = None):
        self.spark = spark
        self.dir = index_dir
        self.cfg = config or IndexConfig()

    def _manifest_path(self) -> str:
        return os.path.join(self.dir, "manifest.json")

    def _read_manifest(self) -> dict:
        with open(self._manifest_path()) as fh:
            return json.load(fh)

    def _table(self, name: str) -> str:
        """Current physical path of a logical table (follows compaction
        generation pointers in the manifest)."""
        m = self._read_manifest() if os.path.exists(self._manifest_path()) \
            else {}
        return os.path.join(self.dir, m.get(f"{name}_path", name))

    # -- append ------------------------------------------------------------
    def append(self, docs_df: DataFrame, batch_id: int | None = None) -> None:
        """Append a batch of (repo, path, commit, lang, content) docs as
        a new segment; bootstraps the index on first call.  With a
        ``batch_id``, a replayed batch (same id already checkpointed) is
        skipped — the foreachBatch idempotency contract."""
        if not os.path.exists(self._manifest_path()):
            IndexBuilder(self.spark, self.dir, self.cfg).build(docs_df)
            if batch_id is not None:
                IndexBuilder(self.spark, self.dir, self.cfg) \
                    ._write_checkpoint(int(batch_id), "stream_batch",
                                       "done", 0)
            return
        b = IndexBuilder(self.spark, self.dir, self.cfg)
        if batch_id is not None:
            cp = b._checkpoint_rows()
            hit = cp[(cp.stage == "stream_batch")
                     & (cp.partition_id == int(batch_id))
                     & (cp.status == "done")]
            if len(hit) > 0:
                return  # replayed micro-batch: already committed
        manifest = self._read_manifest()
        base = manifest["collection_stats"]["n_docs"]
        seg_id = int(manifest.get("n_segments", 1))

        # new segment: doc_ids [base, base+n) in key order; the written
        # docs table is meta-only (term maps never leave the kernels)
        keyed, offsets = range_partition(docs_df, self.cfg, base=base)
        docs_meta_df(keyed, offsets, self.cfg) \
            .write.mode("append").parquet(self._table("docs"))
        pack_blocks_df(keyed, offsets, self.cfg).write.mode("append") \
            .partitionBy("bucket").parquet(self._table("postings"))
        keyed.unpersist()

        # stats merge + snapshot commit (manifest last)
        blocks = self.spark.read.parquet(self._table("postings"))
        (blocks.groupBy("bucket", "term")
         .agg(F.sum("num_docs").alias("doc_freq"),
              F.sum("sum_freq").alias("total_term_freq"))
         .sortWithinPartitions("term")
         .write.mode("overwrite").partitionBy("bucket")
         .parquet(self._table("term_stats")))
        docs_all = self.spark.read.parquet(self._table("docs"))
        row = docs_all.agg(
            F.count("*").alias("n_docs"),
            F.sum(F.when(F.col("length") > 0, 1).otherwise(0)).alias("doc_count"),
            F.sum("length").alias("sum_total_term_freq")).collect()[0]
        sum_df = self.spark.read.parquet(self._table("term_stats")) \
            .agg(F.sum("doc_freq")).collect()[0][0]
        manifest["collection_stats"] = {
            "n_docs": int(row["n_docs"]), "doc_count": int(row["doc_count"]),
            "sum_total_term_freq": int(row["sum_total_term_freq"]),
            "sum_doc_freq": int(sum_df or 0),
        }
        # keep the stage staging files coherent for later resumes
        b._write_json("docs_stats.json", {
            k: manifest["collection_stats"][k]
            for k in ("n_docs", "doc_count", "sum_total_term_freq")})
        b._write_json("postings_stats.json",
                      {"sum_doc_freq": int(sum_df or 0)})
        manifest["n_segments"] = seg_id + 1
        manifest["committed_at"] = time.time()
        with open(self._manifest_path(), "w") as fh:
            json.dump(manifest, fh, indent=2)
        b._write_checkpoint(-1, f"append_{seg_id}", "done",
                            int(row["n_docs"]) - base)
        if batch_id is not None:
            b._write_checkpoint(int(batch_id), "stream_batch", "done",
                                int(row["n_docs"]) - base)

    def foreach_batch(self):
        """Handler for ``df.writeStream.foreachBatch(...)`` — idempotent
        under micro-batch redelivery (batch_id checkpointing)."""
        def handle(batch_df: DataFrame, batch_id: int):
            if batch_df.take(1):
                self.append(batch_df, batch_id=batch_id)
        return handle

    # -- deletes / updates (IndexWriter.java:1837) ---------------------------
    def delete_docs(self, doc_ids: DataFrame) -> int:
        """Tombstone explicit doc_ids; stats stay stale until
        :func:`compact` (Lucene's deleted-docs-still-count-in-df)."""
        return append_tombstones(self.spark, self.dir, doc_ids)

    def delete_by_key(self, keys: DataFrame) -> int:
        """deleteDocuments(exact stored key): keys = (repo, path,
        commit) rows; matching docs are tombstoned."""
        docs = self.spark.read.parquet(self._table("docs")) \
            .select("doc_id", *DOC_KEY_COLS)
        ids = docs.join(keys.select(*DOC_KEY_COLS).distinct(), DOC_KEY_COLS) \
            .select("doc_id")
        return self.delete_docs(ids)

    def delete_by_term(self, term: str) -> int:
        """deleteDocuments(Term): every doc whose content contains the
        analyzed term (the postings themselves find the victims)."""
        from lucene_1_spark.index.reader import IndexReader
        from lucene_1_spark.search.executor import IndexSearcher
        s = IndexSearcher(IndexReader(self.spark, self.dir))
        return self.delete_docs(s.docs_for_terms([term]))

    def update_documents(self, docs_df: DataFrame,
                         batch_id: int | None = None) -> None:
        """updateDocument: atomically-ordered delete-by-key + append of
        the new versions (they receive NEW docIDs in a fresh segment)."""
        self.delete_by_key(docs_df)
        self.append(docs_df, batch_id=batch_id)

    def compact(self) -> dict:
        """Reclaim tombstones + defragment block runs (SegmentMerger)."""
        return compact_index(self.spark, self.dir)

    def maybe_compact(self, max_segments: int = 10) -> dict | None:
        """TieredMergePolicy-style trigger (~10 segments/tier,
        ``index/TieredMergePolicy.java:89-93``): compact when the number
        of segments appended since the last compaction reaches
        ``max_segments``, so a term's block runs — one per segment —
        stay bounded under continuous streaming append.  Returns the new
        stats when a compaction ran, else None."""
        m = self._read_manifest()
        appended = int(m.get("n_segments", 1)) \
            - int(m.get("compacted_at_segment", 0))
        if appended < max_segments and not m.get("has_deletes"):
            return None
        stats = compact_index(self.spark, self.dir)
        m = self._read_manifest()
        m["compacted_at_segment"] = int(m.get("n_segments", 1))
        from lucene_1_spark.index.maintenance import _write_manifest
        _write_manifest(self.dir, m)
        return stats
