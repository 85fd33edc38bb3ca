"""Index maintenance: tombstone writes and compaction — the roles of
``IndexWriter.deleteDocuments`` / ``updateDocument``
(``index/IndexWriter.java:1837``) and the merge machinery
(``index/SegmentMerger.java:113-244``, TieredMergePolicy) re-expressed
relationally.

**Deletes** are tombstones: an appended ``tombstones`` parquet of
doc_ids.  Queries mask hits against it (liveDocs,
``search/IndexSearcher.java:826``); doc_freq / collection stats stay
STALE until compaction — exactly Lucene's deleted-docs-still-count
semantics (df shrinks only when segments merge).

**Compaction** is the SegmentMerger analog and serves two needs:

1. reclaim deleted docs (drop tombstoned rows from docs + postings,
   recompute exact stats);
2. defragment postings: segment-local packing leaves a term's postings
   as one short block run per build partition — at 10^5+ partitions a
   rare term fragments into thousands of tiny blocks.  Compaction
   groups each term's blocks (one shuffle keyed by (bucket, term) —
   partition count scales with executors), decodes, drops dead docs,
   and repacks into FULL 128-doc blocks.

Each compaction writes new table generations (``postings_v<g>`` etc.)
and atomically swaps the manifest pointers — readers opened before the
swap keep a consistent older view (the Iceberg-snapshot analog).

Scale note: the tombstone set is collected and broadcast into the
repack kernel (fine to ~10^7 ids).  Beyond that, run the decode as an
exploded (term, doc_id) anti-join before repacking — one extra shuffle,
same output; the kernel below is the common path.
"""

from __future__ import annotations

import json
import os
import shutil
import time

import numpy as np
import pandas as pd
from pyspark.sql import DataFrame, SparkSession, functions as F

from lucene_1_spark.functions import codecs
from lucene_1_spark.functions.smallfloat import LENGTH_TABLE
from lucene_1_spark.index.builder import BLOCKS_SCHEMA, FIELD_SEP
from lucene_1_spark.index.reader import IndexReader


def _manifest(index_dir: str) -> dict:
    with open(os.path.join(index_dir, "manifest.json")) as fh:
        return json.load(fh)


def _write_manifest(index_dir: str, manifest: dict) -> None:
    """Atomic snapshot commit: write-new + rename."""
    tmp = os.path.join(index_dir, "manifest.json.tmp")
    with open(tmp, "w") as fh:
        json.dump(manifest, fh, indent=2)
    os.replace(tmp, os.path.join(index_dir, "manifest.json"))


def snapshot_index(index_dir: str) -> str:
    """Retain the current commit point — ``SnapshotDeletionPolicy.
    snapshot()`` (``index/SnapshotDeletionPolicy.java:40-90``): copies
    the manifest into ``snapshots/`` and returns a snapshot id.  While
    any snapshot exists, compaction/folding keep every data directory
    a retained manifest references (plus tombstones / dv deltas), so
    the snapshot stays readable — the Iceberg-snapshot-retention
    analog.  Open one with ``IndexReader(spark, dir, snapshot=id)``
    (``DirectoryReader.open(IndexCommit)``)."""
    snap_dir = os.path.join(index_dir, "snapshots")
    os.makedirs(snap_dir, exist_ok=True)
    # monotonic id persisted in the manifest: a count-of-files scheme
    # can reuse an index after release_snapshot and silently overwrite
    # an earlier retained commit taken in the same epoch second
    m = _manifest(index_dir)
    counter = int(m.get("snapshot_counter", 0)) + 1
    m["snapshot_counter"] = counter
    _write_manifest(index_dir, m)
    snap_id = f"snap_{counter:06d}"
    dst = os.path.join(snap_dir, f"{snap_id}.json")
    if os.path.exists(dst):
        raise FileExistsError(f"snapshot {snap_id} already exists")
    shutil.copyfile(os.path.join(index_dir, "manifest.json"), dst)
    return snap_id


def release_snapshot(index_dir: str, snapshot_id: str) -> bool:
    """``SnapshotDeletionPolicy.release``: drop the retained commit.
    Data dirs it referenced become eligible for cleanup at the NEXT
    compaction/fold (deletion policies are lazy in the reference
    too)."""
    p = os.path.join(index_dir, "snapshots", f"{snapshot_id}.json")
    if os.path.exists(p):
        os.remove(p)
        return True
    return False


def list_snapshots(index_dir: str) -> list[str]:
    snap_dir = os.path.join(index_dir, "snapshots")
    if not os.path.isdir(snap_dir):
        return []
    return sorted(f[:-5] for f in os.listdir(snap_dir)
                  if f.endswith(".json"))


def _snapshot_protected(index_dir: str) -> set[str]:
    """Relative data paths some retained snapshot still references."""
    out: set[str] = set()
    snap_dir = os.path.join(index_dir, "snapshots")
    if not os.path.isdir(snap_dir):
        return out
    for f in os.listdir(snap_dir):
        if not f.endswith(".json"):
            continue
        with open(os.path.join(snap_dir, f)) as fh:
            m = json.load(fh)
        for name in ("postings", "docs", "term_stats"):
            out.add(m.get(f"{name}_path", name))
        if m.get("has_deletes"):
            out.add("tombstones")
        if m.get("dv_fields"):
            out.add("dv_updates")
    return out


def fold_doc_values(spark: SparkSession, index_dir: str,
                    drop_old: bool = True) -> int:
    """Materialize pending doc-values updates into a new docs-table
    generation and clear the delta — the merge-time fold of Lucene's
    per-segment doc-values update files (``index/ReadersAndUpdates.java``
    writeFieldUpdates).  Atomic: the new generation is fully written
    before the manifest swap; a crash in between leaves the previous
    snapshot (base + delta overlay) intact.  Returns the number of
    fields folded (0 = nothing pending)."""
    m = _manifest(index_dir)
    dvf = m.get("dv_fields")
    if not dvf:
        return 0
    reader = IndexReader(spark, index_dir)
    # fold over the FULL physical schema (docs() drops term_freqs)
    full = spark.read.parquet(reader.table_path("docs"))
    folded = reader._overlay_doc_values(full)
    gen = int(m.get("generation", 0)) + 1
    docs_name = f"docs_gen{gen}"
    folded.write.mode("overwrite") \
        .parquet(os.path.join(index_dir, docs_name))
    old_docs = m.get("docs_path", "docs")
    m["docs_path"] = docs_name
    m["generation"] = gen
    m.pop("dv_fields", None)
    m.pop("dv_field_kinds", None)
    # dv_generation stays monotonic across folds; dv_folded_gen marks
    # the materialized floor so the overlay filter and retained
    # snapshots (which read the delta dir at THEIR generation window)
    # never double-apply or lose updates
    m["dv_folded_gen"] = int(m.get("dv_generation", 0))
    m["committed_at"] = time.time()
    _write_manifest(index_dir, m)
    protected = _snapshot_protected(index_dir)
    if "dv_updates" not in protected:
        shutil.rmtree(os.path.join(index_dir, "dv_updates"),
                      ignore_errors=True)
    if drop_old and old_docs != docs_name and old_docs not in protected:
        full_old = os.path.join(index_dir, old_docs)
        if os.path.exists(full_old):
            shutil.rmtree(full_old, ignore_errors=True)
    return len(dvf)


def append_tombstones(spark: SparkSession, index_dir: str,
                      doc_ids: DataFrame) -> int:
    """Record deletions (doc_id rows).  Returns the number appended.
    The parquet append is durable before the manifest flags deletes, so
    a reader never sees the flag without the data."""
    rows = doc_ids.select(F.col("doc_id").cast("long")).distinct()
    n = rows.count()
    if n == 0:
        return 0
    m = _manifest(index_dir)
    gen = int(m.get("tombstone_gen", 0)) + 1
    rows.withColumn("gen", F.lit(gen).cast("long")).coalesce(1) \
        .write.mode("append") \
        .parquet(os.path.join(index_dir, "tombstones"))
    m["has_deletes"] = True
    m["tombstone_gen"] = gen
    m["committed_at"] = time.time()
    _write_manifest(index_dir, m)
    return n


def compact_index(spark: SparkSession, index_dir: str,
                  drop_old: bool = True,
                  salt_docs: int | None = None) -> dict:
    """Merge every term's block runs into full blocks, dropping
    tombstoned docs; rewrite docs/term_stats; recompute exact
    collection stats; swap manifest pointers atomically.

    ``salt_docs``: EXPLICIT hot-term skew salting for the repack
    shuffle.  The default (None) keys the shuffle by (bucket, term) —
    one task per term, which at 10^9-posting terms becomes the skewed
    straggler.  With ``salt_docs=N`` the key gains
    ``floor(first_doc / N)``: a hot term's runs split into salt groups
    repacked in parallel.  A block run is assigned wholesale to one
    salt group by its ``first_doc``, so a run straddling a salt
    boundary can make adjacent groups' repacked blocks have OVERLAPPING
    ``[first_doc, last_doc]`` ranges for the same term — tolerated, not
    disjoint: each doc still posts exactly once per term (runs
    partition the postings), and the decode kernel never assumes
    disjoint block ranges (block pruning uses range CONTAINMENT, which
    stays sound over overlaps).  Each salt group may end in one tail
    block (<128 docs), so blocks-per-term is bounded by
    ceil(df/128) + (groups with a straddling run) + groups-1 rather
    than the unsalted exact ceil(df/128); query results are identical.
    Returns the new collection stats."""
    reader = IndexReader(spark, index_dir)
    cfg = reader.cfg
    gen = int(reader.manifest.get("generation", 0)) + 1
    block_size = int(cfg["block_size"])
    exact_norms = cfg.get("norms_encoding", "byte4") == "exact32"
    want_positions = bool(cfg.get("positions", False))

    tomb_path = os.path.join(index_dir, "tombstones")
    if reader.has_deletes:
        dead = np.sort(np.array(
            [r["doc_id"] for r in reader.tombstones().collect()],
            dtype=np.int64))
    else:
        dead = np.zeros(0, dtype=np.int64)

    length_table = LENGTH_TABLE
    block_cols = [f.name for f in BLOCKS_SCHEMA.fields]

    def repack(key: tuple, pdf: pd.DataFrame) -> pd.DataFrame:
        bucket, term = int(key[0]), key[1]  # salt key (if any) unused
        pdf = pdf.sort_values("first_doc")
        dids_l, freqs_l, norms_l, possegs = [], [], [], []
        for row in pdf.itertuples(index=False):
            n = int(row.num_docs)
            dids = codecs.decode_doc_ids(bytes(row.doc_gaps),
                                         int(row.first_doc), n)
            freqs = codecs.decode_freqs(bytes(row.freqs), n)
            norms = np.frombuffer(bytes(row.norms),
                                  dtype="<u4" if exact_norms else np.uint8)
            keep = np.ones(n, dtype=bool)
            if len(dead):
                pos = np.searchsorted(dead, dids)
                pos[pos >= len(dead)] = len(dead) - 1
                keep = dead[pos] != dids
            if want_positions:
                # per-doc delta segments are unchanged by doc removal:
                # slice the flat delta stream at freq boundaries
                total = int(freqs.sum())
                deltas = codecs.bitunpack(bytes(row.positions), total)
                ends = np.cumsum(freqs)
                starts = np.concatenate([[0], ends[:-1]])
                possegs.extend(deltas[s:e] for s, e, k2
                               in zip(starts, ends, keep) if k2)
            dids_l.append(dids[keep])
            freqs_l.append(freqs[keep])
            norms_l.append(norms[keep])
        dids = np.concatenate(dids_l)
        if len(dids) == 0:
            return pd.DataFrame(columns=block_cols)
        freqs = np.concatenate(freqs_l)
        norms = np.concatenate(norms_l)
        rows = []
        for seq, st in enumerate(range(0, len(dids), block_size)):
            d = dids[st:st + block_size]
            f = freqs[st:st + block_size]
            nv = norms[st:st + block_size]
            if exact_norms:
                lens = nv.astype(np.float64)
                norm_buf = nv.astype("<u4").tobytes()
                min_byte = 0
            else:
                lens = length_table[nv]
                norm_buf = nv.astype(np.uint8).tobytes()
                min_byte = int(nv[int(np.argmin(lens))])
            if want_positions:
                pos_buf = codecs.bitpack(np.concatenate(
                    possegs[st:st + block_size]) if len(d) else
                    np.zeros(0, dtype=np.int64))
            else:
                pos_buf = None
            rows.append((term, seq, len(d), int(d[0]), int(d[-1]),
                         int(f.max()), int(lens.min()), min_byte,
                         int(f.sum()), codecs.encode_doc_gaps(d),
                         codecs.encode_freqs(f), norm_buf, pos_buf, bucket))
        return pd.DataFrame(rows, columns=block_cols)

    group_keys = ["bucket", "term"]
    posts = reader.postings()
    if salt_docs is not None:
        posts = posts.withColumn(
            "_salt", (F.col("first_doc") / int(salt_docs)).cast("long"))
        group_keys.append("_salt")
    new_postings = posts.groupBy(*group_keys) \
        .applyInPandas(repack, BLOCKS_SCHEMA)
    postings_name = f"postings_v{gen}"
    new_postings.write.mode("overwrite").partitionBy("bucket") \
        .parquet(os.path.join(index_dir, postings_name))

    # docs: drop tombstoned rows (anti-join, no driver materialization)
    docs = reader.docs()
    if reader.has_deletes:
        docs = docs.join(reader.tombstones(), "doc_id", "left_anti")
    docs_name = f"docs_v{gen}"
    docs.write.mode("overwrite").parquet(os.path.join(index_dir, docs_name))

    # term stats from the compacted postings (term-sorted within files
    # so the dictionary scan gets row-group min/max pruning)
    blocks = spark.read.parquet(os.path.join(index_dir, postings_name))
    ts_name = f"term_stats_v{gen}"
    (blocks.groupBy("bucket", "term")
     .agg(F.sum("num_docs").alias("doc_freq"),
          F.sum("sum_freq").alias("total_term_freq"))
     .sortWithinPartitions("term")
     .write.mode("overwrite").partitionBy("bucket")
     .parquet(os.path.join(index_dir, ts_name)))

    # exact stats over the survivors
    drow = (spark.read.parquet(os.path.join(index_dir, docs_name))
            .agg(F.count("*").alias("n_docs"),
                 F.sum(F.when(F.col("length") > 0, 1).otherwise(0))
                 .alias("doc_count"),
                 F.sum("length").alias("sum_total_term_freq"))
            .collect()[0])
    sum_df = (spark.read.parquet(os.path.join(index_dir, ts_name))
              .filter(~F.col("term").contains(FIELD_SEP))
              .agg(F.sum("doc_freq")).collect()[0][0])
    stats = {"n_docs": int(drow["n_docs"]),
             "doc_count": int(drow["doc_count"] or 0),
             "sum_total_term_freq": int(drow["sum_total_term_freq"] or 0),
             "sum_doc_freq": int(sum_df or 0)}

    # per-field stats over the survivors (keyword + analyzed fields)
    from lucene_1_spark.index.builder import _field_stats_of_docs
    field_stats = _field_stats_of_docs(
        spark.read.parquet(os.path.join(index_dir, docs_name)),
        cfg.get("keyword_fields"), cfg.get("text_fields"))

    m = _manifest(index_dir)
    old = {name: m.get(f"{name}_path", name)
           for name in ("postings", "docs", "term_stats")}
    m["postings_path"] = postings_name
    m["docs_path"] = docs_name
    m["term_stats_path"] = ts_name
    m["generation"] = gen
    m["collection_stats"] = stats
    if field_stats:
        m["field_stats"] = field_stats
    m["has_deletes"] = False
    m["committed_at"] = time.time()
    _write_manifest(index_dir, m)  # the atomic snapshot swap

    # post-commit cleanup (crash-safe: manifest no longer references
    # these; anything a retained snapshot references stays — the
    # SnapshotDeletionPolicy keep-set)
    protected = _snapshot_protected(index_dir)
    if os.path.exists(tomb_path) and "tombstones" not in protected:
        shutil.rmtree(tomb_path, ignore_errors=True)
    if drop_old:
        for name, path in old.items():
            full = os.path.join(index_dir, path)
            if path != m[f"{name}_path"] and path not in protected \
                    and os.path.exists(full):
                shutil.rmtree(full, ignore_errors=True)
    # keep the builder's stage stats coherent for later appends/resumes
    with open(os.path.join(index_dir, "docs_stats.json"), "w") as fh:
        json.dump({k: stats[k] for k in
                   ("n_docs", "doc_count", "sum_total_term_freq")}, fh)
    with open(os.path.join(index_dir, "postings_stats.json"), "w") as fh:
        json.dump({"sum_doc_freq": stats["sum_doc_freq"]}, fh)
    return stats


def attach_features(spark: SparkSession, index_dir: str,
                    features: DataFrame, mode: str = "merge") -> list[str]:
    """Bulk-load static ranking features — the loading side of the
    FeatureField analog (``document/FeatureField.java:60-97``; see
    ``search.query.FeatureQuery``).  The reference encodes features
    into term frequencies at index time, so refreshing them means
    re-indexing; here they live in a doc_id-keyed side table beside
    the index (the doc-values strategy), so a pagerank refresh is one
    table swap and the join stays co-located at any scale.

    ``features`` must carry ``doc_id`` plus >= 1 numeric column.
    ``mode='merge'`` outer-joins onto the existing feature table (new
    columns added; overlapping columns take the new value where the
    new table has one); ``'overwrite'`` replaces the table.  Atomic:
    a new generation is fully written before the manifest swap."""
    from pyspark.sql import types as T
    cols = [f for f in features.schema.fields if f.name != "doc_id"]
    if "doc_id" not in features.columns or not cols:
        raise ValueError("features needs doc_id + >= 1 value column")
    for f in cols:
        if not isinstance(f.dataType, (T.NumericType,)):
            raise ValueError(f"feature column '{f.name}' must be "
                             f"numeric, got {f.dataType.simpleString()}")
        if f.name in ("repo", "path", "commit", "lang", "length",
                      "norm_byte", "content_sha256", "build_partition",
                      "field_lengths", "term_freqs", "score"):
            raise ValueError(f"'{f.name}' collides with an index column")
    m = _manifest(index_dir)
    new = features.select(
        "doc_id", *[F.col(f.name).cast("double") for f in cols])
    old_path = m.get("features_path")
    if mode == "merge" and old_path is not None:
        old = spark.read.parquet(os.path.join(index_dir, old_path))
        renamed = new.select(
            "doc_id", *[F.col(f.name).alias(f"_new_{f.name}")
                        for f in cols])
        merged = old.join(renamed, "doc_id", "full_outer")
        for f in cols:
            nc = f"_new_{f.name}"
            if f.name in old.columns:
                # overlap: new value wins where the new table has one
                merged = merged.withColumn(
                    f.name, F.coalesce(F.col(nc), F.col(f.name))).drop(nc)
            else:
                merged = merged.withColumnRenamed(nc, f.name)
    elif mode in ("merge", "overwrite"):
        merged = new
    else:
        raise ValueError(f"unknown mode {mode!r}")
    gen = int(m.get("features_generation", 0)) + 1
    name = f"features_gen{gen}"
    merged.write.mode("overwrite") \
        .parquet(os.path.join(index_dir, name))
    m["features_path"] = name
    m["features_generation"] = gen
    m["committed_at"] = time.time()
    _write_manifest(index_dir, m)
    if old_path and old_path != name \
            and old_path not in _snapshot_protected(index_dir):
        shutil.rmtree(os.path.join(index_dir, old_path),
                      ignore_errors=True)
    return [f.name for f in cols]
