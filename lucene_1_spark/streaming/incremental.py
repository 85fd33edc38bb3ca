"""Incremental index append — the NRT-refresh / segment-append analog
(``SearcherManager.maybeRefresh`` + new-segment flush,
``search/SearcherManager.java:52``; SURVEY.md §2.10).

Each appended batch becomes a new "segment": its docs get docIDs after
all existing docs (insertion order, exactly Lucene's
earlier-segment-=-lower-docID rule, ``TopDocs.java:71-117``), its
posting blocks are packed with the SAME kernels as the full build
(:func:`docs_meta_df` / :func:`pack_blocks_df`) and *appended*
to the postings table — a term's postings may then span several block
runs with disjoint doc ranges, which the decode kernel tolerates.
Term stats are re-aggregated from blocks, collection stats and the
manifest are rewritten last — the manifest rewrite is the snapshot
commit (on Iceberg: an atomic snapshot; parquet-dir + manifest.json is
the sandbox stand-in).  A reader opened before the commit still sees a
consistent older index.

Structured Streaming: ``writer.foreach_batch()`` plugs into
``df.writeStream.foreachBatch(...)`` so a document stream continuously
extends the index, one micro-batch per segment.
"""

from __future__ import annotations

import json
import os
import time

from pyspark.sql import DataFrame, SparkSession, functions as F

from lucene_1_spark.index.builder import (IndexBuilder, IndexConfig,
                                          docs_meta_df, pack_blocks_df,
                                          range_partition)


class IncrementalIndexWriter:
    def __init__(self, spark: SparkSession, index_dir: str,
                 config: IndexConfig | None = None):
        self.spark = spark
        self.dir = index_dir
        self.cfg = config or IndexConfig()

    def _manifest_path(self) -> str:
        return os.path.join(self.dir, "manifest.json")

    def append(self, docs_df: DataFrame) -> None:
        """Append a batch of (repo, path, commit, lang, content) docs as
        a new segment; bootstraps the index on first call."""
        if not os.path.exists(self._manifest_path()):
            IndexBuilder(self.spark, self.dir, self.cfg).build(docs_df)
            return
        b = IndexBuilder(self.spark, self.dir, self.cfg)
        with open(self._manifest_path()) as fh:
            manifest = json.load(fh)
        base = manifest["collection_stats"]["n_docs"]
        batch_id = int(manifest.get("n_segments", 1))

        # new segment: doc_ids [base, base+n) in key order; the written
        # docs table is meta-only (term maps never leave the kernels)
        keyed, offsets = range_partition(docs_df, self.cfg, base=base)
        docs_meta_df(keyed, offsets, self.cfg) \
            .write.mode("append").parquet(b.path("docs"))
        pack_blocks_df(keyed, offsets, self.cfg).write.mode("append") \
            .partitionBy("bucket").parquet(b.path("postings"))
        keyed.unpersist()

        # stats merge + snapshot commit (manifest last)
        blocks = self.spark.read.parquet(b.path("postings"))
        (blocks.groupBy("bucket", "term")
         .agg(F.sum("num_docs").alias("doc_freq"),
              F.sum("sum_freq").alias("total_term_freq"))
         .write.mode("overwrite").partitionBy("bucket")
         .parquet(b.path("term_stats")))
        docs_all = self.spark.read.parquet(b.path("docs"))
        row = docs_all.agg(
            F.count("*").alias("n_docs"),
            F.sum(F.when(F.col("length") > 0, 1).otherwise(0)).alias("doc_count"),
            F.sum("length").alias("sum_total_term_freq")).collect()[0]
        sum_df = self.spark.read.parquet(b.path("term_stats")) \
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
        manifest["n_segments"] = batch_id + 1
        manifest["committed_at"] = time.time()
        with open(self._manifest_path(), "w") as fh:
            json.dump(manifest, fh, indent=2)
        b._write_checkpoint(-1, f"append_{batch_id}", "done",
                            int(row["n_docs"]) - base)

    def foreach_batch(self):
        """Handler for ``df.writeStream.foreachBatch(...)``."""
        def handle(batch_df: DataFrame, batch_id: int):
            if batch_df.take(1):
                self.append(batch_df)
        return handle
