"""Incremental index append + mutation — the NRT-refresh / segment-append
analog (``SearcherManager.maybeRefresh`` + new-segment flush,
``search/SearcherManager.java:52``; SURVEY.md §2.10) plus the
IndexWriter mutation surface (``index/IndexWriter.java:1837``
deleteDocuments/updateDocument).

Each appended batch becomes a new "segment": its docs get docIDs after
all existing docs (insertion order, exactly Lucene's
earlier-segment-=-lower-docID rule, ``TopDocs.java:71-117``), its
posting blocks are packed with the SAME fused single-tokenize kernel as
the full build (:func:`pack_blocks_df` ``emit_docs=True``) — a term's
postings may then span several block runs with disjoint doc ranges,
which the decode kernel tolerates (compaction later merges the runs,
``index/maintenance.py``).

**Staged, crash-safe, O(segment) commit** (the IndexWriter
prepareCommit/commit two-phase shape, ``index/IndexWriter.java:
3310-3470``):

1. STAGE — the fused kernel writes the segment's blocks, a
   column-pruned docs slice, and a PER-SEGMENT term-stats delta into
   ``append_staging``; segment-local stat deltas land in a JSON; a
   durable ``append_staged_<seg>`` checkpoint seals the stage.  A crash
   before the checkpoint discards the staging wholesale on replay —
   the live tables were never touched, so nothing duplicates (the
   round-2 design raw-appended before checkpointing and could double
   docs on a mid-append crash).
2. PROMOTE — staged files MOVE (``os.replace``) into the live tables
   under ``seg<id>-`` names; replay just continues remaining moves.
3. COMMIT — collection stats advance by the JSON deltas and the
   manifest swaps atomically; ``manifest.n_segments`` is the commit
   marker, so a replay that finds it advanced skips the stat update
   (no double-count).  The ``stream_batch`` checkpoint is written
   last; a redelivered batch that finds it is a pure no-op.

Every Spark job in the append reads ONLY the new batch / its staged
output — term stats are per-segment parquet rows summed at read by
``IndexReader.term_statistics`` (the ``TermStates.build`` accumulation,
``index/TermStates.java:96-160``); the round-2 design re-aggregated the
ENTIRE postings table per micro-batch, an O(index) scan per append.

Structured Streaming: ``writer.foreach_batch()`` plugs into
``df.writeStream.foreachBatch(...)`` so a document stream continuously
extends the index, one micro-batch per segment.  Replay correlation is
by batch_id at every stage, so redelivery after a crash anywhere in
1-3 resumes exactly where it stopped.  Manual ``append()`` calls
without a batch_id correlate by a CONTENT hash of the batch instead:
a retried identical batch resumes its staged segment, while a new
batch arriving after an earlier manual append crashed mid-way first
FINISHES the crashed append's sealed segment (promote + commit — its
stage checkpoint guarantees the staged data is complete) and then
appends itself as the next segment, so no batch is ever silently
swapped for a stale staging or duplicated by orphaned promote files.
(Only a caller re-invoking append after a COMPLETED commit re-adds the
batch — streaming always passes batch_id and is exactly-once.)

Deletes are tombstones (query-time liveDocs masking); updates are
delete-by-key + append — Lucene's updateDocument contract: the new
version gets a NEW docID in a later segment (``IndexWriter.java:1837``).
"""

from __future__ import annotations

import json
import os
import shutil
import time

from pyspark.sql import DataFrame, SparkSession, functions as F

from lucene_1_spark.index.builder import (DOC_KEY_COLS, DOCS_SCHEMA,
                                          FIELD_SEP, IndexBuilder,
                                          IndexConfig, pack_blocks_df,
                                          range_partition)
from lucene_1_spark.index.maintenance import (_write_manifest,
                                              append_tombstones,
                                              compact_index)

# Internal docs-table columns doc-values updates must never touch:
# norms / collection stats / doc identity are derived from them
# (compact_index recomputes avgdl as sum(length)), so an update would
# silently corrupt scoring after the next fold.  Lucene likewise
# rejects doc-values updates to fields not indexed as doc values
# (``index/IndexWriter.java`` updateNumericDocValue -> IllegalArgument).
RESERVED_DOC_COLS = frozenset(
    {"doc_id", "length", "norm_byte", "content_sha256",
     "build_partition", "field_lengths", "term_freqs", "term_positions",
     *DOC_KEY_COLS})


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
        a new segment; bootstraps the index on first call.  Staged +
        promoted + committed as described in the module docstring —
        crash-safe at every point (batch-identified appends correlate
        by batch_id, manual appends by a content hash of the batch),
        and O(segment) (no job touches pre-existing table data)."""
        if not os.path.exists(self._manifest_path()):
            IndexBuilder(self.spark, self.dir, self.cfg).build(docs_df)
            if batch_id is not None:
                IndexBuilder(self.spark, self.dir, self.cfg) \
                    ._write_checkpoint(int(batch_id), "stream_batch",
                                       "done", 0)
            return
        b = IndexBuilder(self.spark, self.dir, self.cfg)
        cp = b._checkpoint_rows()
        if batch_id is not None:
            hit = cp[(cp.stage == "stream_batch")
                     & (cp.partition_id == int(batch_id))
                     & (cp.status == "done")]
            if len(hit) > 0:
                return  # replayed micro-batch: already committed
        if batch_id is None:
            # manual appends correlate by CONTENT, not by caller-supplied
            # id: a stable hash of the batch becomes the checkpoint
            # partition_id, so a retried identical batch resumes its
            # staged segment while a DIFFERENT batch can never be
            # silently swapped for a stale staged one (the old fixed
            # cp_id=-1 scheme could promote a crashed earlier batch's
            # staging and drop the new docs while returning success)
            h = docs_df.select(
                F.sum(F.pmod(F.xxhash64(*docs_df.columns),
                             F.lit(2147483629))).alias("h")) \
                .collect()[0]["h"] or 0
            cp_id = int(h) % 2147483645 + 1   # positive int32, never -1
        else:
            cp_id = int(batch_id)
        manifest = self._read_manifest()
        seg_id = int(manifest.get("n_segments", 1))
        # replay correlation: a crashed run may have staged (or even
        # promoted+committed part of) this batch under an earlier
        # seg_id — resume THAT segment instead of staging a new one
        prev = cp[cp.stage.str.startswith("append_staged_")
                  & (cp.partition_id == cp_id)
                  & (cp.status == "done")]
        if len(prev) > 0:
            seg_id = int(prev.stage.iloc[0].rsplit("_", 1)[1])
        staging = os.path.join(self.dir, "append_staging")
        stage_name = f"append_staged_{seg_id}"
        seg_json = f"append_seg_{seg_id}.json"

        # a DIFFERENT batch staged this segment but crashed before its
        # commit: its stage is durably sealed, so FINISH it (promote +
        # commit preserves its data and its doc_id range), then restart
        # this append against the advanced manifest.  Discarding it
        # instead could orphan partially-promoted files that share this
        # segment's doc_id base — silent duplication.
        pending = cp[(cp.stage == stage_name) & (cp.status == "done")]
        if len(pending) > 0 and not (pending.partition_id == cp_id).any() \
                and int(manifest.get("n_segments", 1)) <= seg_id:
            self._promote_segment(seg_id, staging)
            self._commit_segment(b, seg_id, seg_json)
            shutil.rmtree(staging, ignore_errors=True)
            return self.append(docs_df, batch_id=batch_id)

        if not b._stage_done(stage_name, cp_id):
            # ---- 1. STAGE (a crashed partial staging is discarded) ----
            shutil.rmtree(staging, ignore_errors=True)
            # id high-water mark, NOT n_docs: after a reclaiming
            # compact/merge n_docs lags max(doc_id)+1 and would
            # collide new ids with surviving docs
            from lucene_1_spark.index.maintenance import next_doc_id
            base = next_doc_id(manifest)
            keyed, offsets = range_partition(docs_df, self.cfg, base=base)
            pack_blocks_df(keyed, offsets, self.cfg, emit_docs=True) \
                .write.mode("overwrite").partitionBy("kind", "bucket") \
                .parquet(staging)
            keyed.unpersist()
            from pyspark.sql import Observation

            # doc-count / length / per-field stat deltas are OBSERVED
            # during the docs rewrite — one job instead of three
            # (rewrite + stats agg + field-stats agg)
            kw = tuple(self.cfg.keyword_fields or ())
            tf = tuple(self.cfg.text_fields or ())
            doc_metrics = [
                F.count(F.lit(1)).alias("n"),
                F.sum(F.when(F.col("length") > 0, 1).otherwise(0))
                .alias("nonempty"),
                F.sum("length").alias("len")]
            for fld in kw:
                doc_metrics.append(
                    F.sum(F.when(F.col(fld).isNotNull()
                                 & (F.col(fld) != ""), 1).otherwise(0))
                    .alias(f"kw_{fld}"))
            for fld in tf:
                v = F.element_at(F.col("field_lengths"), fld)
                doc_metrics.append(F.sum(F.when(v > 0, 1).otherwise(0))
                                   .alias(f"dc_{fld}"))
                doc_metrics.append(F.sum(F.coalesce(v, F.lit(0)))
                                   .alias(f"ttf_{fld}"))
            obs_docs = Observation(f"seg_docs_{seg_id}")
            doc_cols = [f.name for f in DOCS_SCHEMA.fields]
            (self.spark.read.parquet(os.path.join(staging, "kind=doc"))
             .select(*doc_cols).observe(obs_docs, *doc_metrics)
             .write.mode("overwrite")
             .parquet(os.path.join(staging, "docs_seg")))
            drow = obs_docs.get
            block_dir = os.path.join(staging, "kind=block")
            sum_df_delta = 0
            if os.path.isdir(block_dir):
                # PER-SEGMENT term-stats delta: summed at read with the
                # other segments' rows (TermStates.build accumulation);
                # the content doc_freq total is observed in the same job
                obs_ts = Observation(f"seg_stats_{seg_id}")
                seg_stats = (self.spark.read.parquet(block_dir)
                             .groupBy("bucket", "term")
                             .agg(F.sum("num_docs").alias("doc_freq"),
                                  F.sum("sum_freq").alias("total_term_freq"))
                             .sortWithinPartitions("term")
                             .observe(obs_ts, F.sum(F.when(
                                 ~F.col("term").contains(FIELD_SEP),
                                 F.col("doc_freq")).otherwise(0))
                                 .alias("df_sum")))
                seg_stats.write.mode("overwrite").partitionBy("bucket") \
                    .parquet(os.path.join(staging, "stats_seg"))
                sum_df_delta = int(obs_ts.get["df_sum"] or 0)
            fs_delta = {f: {"doc_count": int(drow[f"kw_{f}"] or 0),
                            "sum_total_term_freq": int(drow[f"kw_{f}"] or 0)}
                        for f in kw}
            for f_ in tf:
                fs_delta[f_] = {
                    "doc_count": int(drow[f"dc_{f_}"] or 0),
                    "sum_total_term_freq": int(drow[f"ttf_{f_}"] or 0)}
            b._write_json(seg_json, {
                "n_docs": int(drow["n"]),
                "doc_count": int(drow["nonempty"] or 0),
                "sum_total_term_freq": int(drow["len"] or 0),
                "sum_doc_freq": sum_df_delta,
                "field_stats_delta": fs_delta,
                "next_doc_id_after": base + int(drow["n"]),
            })
            b._write_checkpoint(cp_id, stage_name, "done", int(drow["n"]))

        # ---- 2. PROMOTE (idempotent os.replace moves) ----
        self._promote_segment(seg_id, staging)

        # ---- 3. COMMIT (manifest swap; n_segments is the marker) ----
        self._commit_segment(b, seg_id, seg_json, cp_id)
        shutil.rmtree(staging, ignore_errors=True)
        if batch_id is not None:
            b._write_checkpoint(int(batch_id), "stream_batch", "done",
                                (b._read_json(seg_json) or {})
                                .get("n_docs", 0))

    def _commit_segment(self, b: IndexBuilder, seg_id: int, seg_json: str,
                        cp_id: int = -1) -> None:
        """Advance collection stats by the staged segment's JSON deltas
        and swap the manifest atomically; ``manifest.n_segments`` is the
        commit marker, so a replay that finds it advanced skips the stat
        update (no double-count)."""
        manifest = self._read_manifest()
        if int(manifest.get("n_segments", 1)) > seg_id:
            return  # already committed
        deltas = b._read_json(seg_json) or {}
        from lucene_1_spark.index.maintenance import next_doc_id
        manifest["next_doc_id"] = int(deltas.get(
            "next_doc_id_after",
            next_doc_id(manifest) + deltas.get("n_docs", 0)))
        cs = manifest["collection_stats"]
        cs = {
            "n_docs": int(cs["n_docs"]) + deltas.get("n_docs", 0),
            "doc_count": int(cs["doc_count"])
            + deltas.get("doc_count", 0),
            "sum_total_term_freq": int(cs["sum_total_term_freq"])
            + deltas.get("sum_total_term_freq", 0),
            "sum_doc_freq": int(cs["sum_doc_freq"])
            + deltas.get("sum_doc_freq", 0),
        }
        manifest["collection_stats"] = cs
        if deltas.get("field_stats_delta"):
            fs = manifest.get("field_stats", {})
            for f, d in deltas["field_stats_delta"].items():
                cur = fs.get(f, {"doc_count": 0,
                                 "sum_total_term_freq": 0})
                fs[f] = {
                    "doc_count": cur["doc_count"] + d["doc_count"],
                    "sum_total_term_freq":
                        cur["sum_total_term_freq"]
                        + d["sum_total_term_freq"],
                }
            manifest["field_stats"] = fs
        manifest["n_segments"] = seg_id + 1
        manifest["committed_at"] = time.time()
        # keep the builder's stage stats coherent for later resumes
        b._write_json("docs_stats.json", {
            k: cs[k] for k in ("n_docs", "doc_count",
                               "sum_total_term_freq")})
        b._write_json("postings_stats.json",
                      {"sum_doc_freq": cs["sum_doc_freq"]})
        _write_manifest(self.dir, manifest)  # atomic commit
        b._write_checkpoint(
            cp_id, f"append_{seg_id}", "done",
            (b._read_json(seg_json) or {}).get("n_docs", 0))

    def _promote_segment(self, seg_id: int, staging: str) -> None:
        """Move staged segment files into the live tables.  os.replace
        removes each file from staging atomically, so a crashed promote
        just continues on replay; the ``seg<id>-`` prefix keeps names
        unique across segments."""
        def move_files(src_dir: str, dst_dir: str) -> None:
            os.makedirs(dst_dir, exist_ok=True)
            for fn in sorted(os.listdir(src_dir)):
                if fn.endswith(".parquet"):
                    os.replace(os.path.join(src_dir, fn),
                               os.path.join(dst_dir, f"seg{seg_id}-{fn}"))

        docs_src = os.path.join(staging, "docs_seg")
        if os.path.isdir(docs_src):
            move_files(docs_src, self._table("docs"))
        for sub, table in (("stats_seg", "term_stats"),
                           ("kind=block", "postings")):
            root = os.path.join(staging, sub)
            if not os.path.isdir(root):
                continue
            for entry in sorted(os.listdir(root)):
                src = os.path.join(root, entry)
                if entry.startswith("bucket=") and os.path.isdir(src):
                    move_files(src, os.path.join(self._table(table), entry))

    def foreach_batch(self, auto_merge: bool = False,
                      segs_per_tier: int = 10):
        """Handler for ``df.writeStream.foreachBatch(...)`` — idempotent
        under micro-batch redelivery (batch_id checkpointing).

        ``auto_merge=True`` runs :meth:`maybe_merge` after each
        committed batch — the ConcurrentMergeScheduler analog
        (``index/ConcurrentMergeScheduler.java:54``: merges triggered
        as segments accumulate), inline rather than on background
        threads since a micro-batch boundary IS the natural merge
        point here.  The merge is itself atomic and O(merged bytes),
        so a crash mid-merge never loses the committed append."""
        def handle(batch_df: DataFrame, batch_id: int):
            if batch_df.take(1):
                self.append(batch_df, batch_id=batch_id)
                if auto_merge:
                    self.maybe_merge(segs_per_tier=segs_per_tier)
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

    def update_numeric_doc_value(self, term: str, field: str,
                                 value: float) -> int:
        """``IndexWriter.updateNumericDocValue(term, field, value)``:
        set a stored numeric field for EVERY live doc containing the
        term WITHOUT re-indexing postings (in-place doc-values update).
        Writes one generation of a ``dv_updates`` delta table; readers
        overlay latest-generation-wins (``IndexReader.docs``), and
        ``fold_doc_values`` / ``compact`` materialize it.  Returns the
        number of docs updated."""
        return self._update_doc_value(term, field, num=float(value),
                                      s=None)

    def update_binary_doc_value(self, term: str, field: str,
                                value: str) -> int:
        """``IndexWriter.updateBinaryDocValue`` analog for string
        stored fields."""
        return self._update_doc_value(term, field, num=None,
                                      s=str(value))

    def _update_doc_value(self, term: str, field: str,
                          num: float | None, s: str | None) -> int:
        import time as _time

        from pyspark.sql import functions as F
        from pyspark.sql import types as T

        from lucene_1_spark.index.maintenance import _write_manifest
        from lucene_1_spark.index.reader import IndexReader
        from lucene_1_spark.search.executor import IndexSearcher

        kind = "str" if s is not None else "num"
        if field in RESERVED_DOC_COLS:
            raise ValueError(
                f"'{field}' is an internal index column, not a doc-values "
                f"field — updates would corrupt derived state (norms / "
                f"collection stats); Lucene likewise rejects doc-values "
                f"updates to non-dv fields")
        reader = IndexReader(self.spark, self.dir)
        dt = {f.name: f.dataType for f in
              self.spark.read.parquet(reader.table_path("docs"))
              .schema.fields}.get(field)
        if dt is not None:
            is_str_col = isinstance(dt, T.StringType)
            if is_str_col and kind == "num":
                raise ValueError(
                    f"numeric doc-values update on string field "
                    f"'{field}' — use update_binary_doc_value")
            if not is_str_col and kind == "str":
                raise ValueError(
                    f"binary doc-values update on {dt.simpleString()} "
                    f"field '{field}' — use update_numeric_doc_value")
        # value kind (num/str) per field so the reader overlay picks the
        # right value column even for brand-new fields absent from the
        # docs schema (a string update to a new field must NOT silently
        # materialize an all-null numeric column)
        kinds = dict(self._read_manifest().get("dv_field_kinds", {}))
        prev = kinds.get(field)
        if prev is not None and prev != kind:
            raise ValueError(
                f"pending doc-values updates for new field '{field}' mix "
                f"numeric and binary kinds")
        kinds[field] = kind
        se = IndexSearcher(reader)
        victims = se.docs_for_terms([term])
        if reader.has_deletes:
            victims = victims.join(reader.tombstones(), "doc_id",
                                   "left_anti")
        manifest = self._read_manifest()
        gen = int(manifest.get("dv_generation", 0)) + 1
        rows = victims.select(
            "doc_id", F.lit(field).alias("field"),
            F.lit(num).cast("double").alias("value_num"),
            F.lit(s).cast("string").alias("value_str"),
            F.lit(gen).cast("long").alias("gen"))
        out = os.path.join(self.dir, "dv_updates", f"gen={gen}")
        rows.write.mode("overwrite").parquet(out)
        n = self.spark.read.parquet(out).count()
        fields = sorted(set(manifest.get("dv_fields", [])) | {field})
        manifest["dv_fields"] = fields
        manifest["dv_field_kinds"] = kinds
        manifest["dv_generation"] = gen
        manifest["committed_at"] = _time.time()
        _write_manifest(self.dir, manifest)
        return n

    def update_documents(self, docs_df: DataFrame,
                         batch_id: int | None = None) -> None:
        """updateDocument: atomically-ordered delete-by-key + append of
        the new versions (they receive NEW docIDs in a fresh segment)."""
        self.delete_by_key(docs_df)
        self.append(docs_df, batch_id=batch_id)

    def compact(self) -> dict:
        """Reclaim tombstones + defragment block runs (SegmentMerger);
        pending doc-values updates fold into the new docs generation
        (the merge-time writeFieldUpdates fold)."""
        out = compact_index(self.spark, self.dir)
        from lucene_1_spark.index.maintenance import fold_doc_values
        fold_doc_values(self.spark, self.dir)
        return out

    def add_indexes(self, source_dirs: list[str]) -> dict:
        """``IndexWriter.addIndexes(Directory...)``: absorb
        independently-built compatible indexes as new segments without
        re-analysis (docID rebase is pure column arithmetic) — see
        ``index.maintenance.add_indexes``."""
        from lucene_1_spark.index.maintenance import add_indexes
        return add_indexes(self.spark, self.dir, source_dirs)

    def merge(self, segments: list[str] | None = None,
              **kw) -> dict | None:
        """Selective segment merge (TieredMergePolicy +
        ``index/SegmentMerger.java:113-244``): merge ONLY the chosen
        (or policy-selected smallest) segments' files into one new
        segment — O(merged bytes), never O(index), unlike
        :func:`compact` (the forceMerge(1) analog).  See
        ``index.maintenance.merge_segments``."""
        from lucene_1_spark.index.maintenance import merge_segments
        return merge_segments(self.spark, self.dir, segments=segments,
                              **kw)

    def maybe_merge(self, segs_per_tier: int = 10,
                    max_merge_at_once: int = 10) -> dict | None:
        """The IndexWriter.maybeMerge hook
        (``index/IndexWriter.java:2230`` + TieredMergePolicy
        findMerges): when the segment count exceeds the tier budget,
        merge the smallest segments; otherwise no-op.  Call after
        appends (e.g. inside a foreachBatch handler) to keep
        block-run counts bounded under continuous streaming ingestion
        without ever paying a full rewrite."""
        return self.merge(segs_per_tier=segs_per_tier,
                          max_merge_at_once=max_merge_at_once)

    def force_merge(self, max_num_segments: int = 1,
                    max_merge_at_once: int = 10) -> dict | None:
        """``IndexWriter.forceMerge(maxNumSegments)``
        (``index/IndexWriter.java:2075``): cascade selective merges
        until at most ``max_num_segments`` remain.  Each pass merges up
        to ``max_merge_at_once`` of the smallest segments (size caps
        waived — forceMerge merges giants too), so the cascade is
        logarithmic in segment count and each pass stays O(merged
        bytes).  Returns the last pass's summary (None if already at
        or under the target)."""
        from lucene_1_spark.index.maintenance import (merge_segments,
                                                      segment_sizes)
        out = None
        while True:
            sizes = segment_sizes(self.dir)
            n = len(sizes)
            if n <= max(1, int(max_num_segments)):
                return out
            # merge enough smallest to hit the target in this pass if
            # possible, else the per-pass cap
            take = min(max_merge_at_once, n - int(max_num_segments) + 1)
            pick = sorted(sizes, key=sizes.get)[:take]
            res = merge_segments(self.spark, self.dir, segments=pick)
            if res is None:
                return out
            out = res

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
