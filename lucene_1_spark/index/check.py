"""Index integrity verification — the CheckIndex analog
(``index/CheckIndex.java:105,533,2512``): re-derive every statistic
from the posting blocks and assert it against the stored metadata, the
docs table, and (optionally) the source table.

Checks:
1. term_stats == re-aggregation of posting blocks (doc_freq,
   total_term_freq per term);
2. collection_stats (manifest) == re-aggregation of the docs table;
3. block invariants: num_docs == decoded docID count, first/last_doc
   match, docIDs strictly ascending, freqs >= 1, max_freq/sum_freq
   consistent, norm buffer length == num_docs;
4. per-doc length == sum of its freqs across all terms (norm
   consistency, the postings <-> norms agreement CheckIndex verifies);
5. per-row sha256(content) equality against the source table
   (input_hint invariant), when a source is provided;
6. checkpoints complete for every stage; lineage rows present.

Returns a dict of check name -> (ok, detail).  Raises nothing — the
caller decides severity (mirrors CheckIndex's report-then-exit shape).
"""

from __future__ import annotations

from typing import Iterator

import numpy as np
import pandas as pd
from pyspark.sql import DataFrame, functions as F, types as T

from lucene_1_spark.functions import codecs
from lucene_1_spark.index.reader import IndexReader

_BLOCK_CHECK_SCHEMA = T.StructType([
    T.StructField("bad_blocks", T.LongType()),
    T.StructField("blocks", T.LongType()),
])

_DOCLEN_SCHEMA = T.StructType([
    T.StructField("doc_id", T.LongType()),
    T.StructField("freq_sum", T.LongType()),
])


def check_index(reader: IndexReader, source: DataFrame | None = None) -> dict:
    spark = reader.spark
    out: dict[str, tuple[bool, str]] = {}
    blocks = reader.postings()

    # 1. term stats agreement
    derived = (blocks.groupBy("term")
               .agg(F.sum("num_docs").alias("df2"),
                    F.sum("sum_freq").alias("ttf2")))
    stored = reader.term_stats().select("term", "doc_freq", "total_term_freq")
    bad = (stored.join(derived, "term", "full_outer")
           .filter((F.col("doc_freq") != F.col("df2"))
                   | (F.col("total_term_freq") != F.col("ttf2"))
                   | F.col("doc_freq").isNull() | F.col("df2").isNull())
           .count())
    out["term_stats"] = (bad == 0, f"{bad} mismatched terms")

    # 2. collection stats agreement
    docs = reader.docs()
    row = docs.agg(
        F.count("*").alias("n_docs"),
        F.sum(F.when(F.col("length") > 0, 1).otherwise(0)).alias("doc_count"),
        F.sum("length").alias("sttf")).collect()[0]
    st = reader.stats
    ok = (int(row["n_docs"]) == st["n_docs"]
          and int(row["doc_count"]) == st["doc_count"]
          and int(row["sttf"]) == st["sum_total_term_freq"])
    out["collection_stats"] = (ok, f"manifest={st} derived={dict(row.asDict())}")

    # 3. block invariants (distributed decode pass)
    def verify(it: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        bad = total = 0
        for pdf in it:
            for r in pdf.itertuples(index=False):
                total += 1
                try:
                    n = int(r.num_docs)
                    dids = codecs.decode_doc_ids(bytes(r.doc_gaps),
                                                 int(r.first_doc), n)
                    freqs = codecs.decode_freqs(bytes(r.freqs), n)
                    ok = (len(dids) == n and dids[0] == r.first_doc
                          and dids[-1] == r.last_doc)
                    if n > 1:
                        ok = ok and bool((np.diff(dids) > 0).all())
                    ok = ok and (freqs >= 1).all() \
                        and int(freqs.max()) == r.max_freq \
                        and int(freqs.sum()) == r.sum_freq
                    nb = bytes(r.norms)
                    width = 4 if len(nb) == 4 * n else 1
                    ok = ok and len(nb) == width * n
                    if not ok:
                        bad += 1
                except Exception:
                    bad += 1
        yield pd.DataFrame({"bad_blocks": [bad], "blocks": [total]})

    agg = blocks.mapInPandas(verify, _BLOCK_CHECK_SCHEMA) \
        .agg(F.sum("bad_blocks"), F.sum("blocks")).collect()[0]
    out["block_invariants"] = (int(agg[0] or 0) == 0,
                               f"{agg[0]} bad of {agg[1]} blocks")

    # 4. per-doc length == sum of freqs (norms <-> postings agreement)
    def doc_freq_sums(it: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        for pdf in it:
            parts = []
            for r in pdf.itertuples(index=False):
                n = int(r.num_docs)
                dids = codecs.decode_doc_ids(bytes(r.doc_gaps),
                                             int(r.first_doc), n)
                freqs = codecs.decode_freqs(bytes(r.freqs), n)
                parts.append(pd.DataFrame({"doc_id": dids, "freq_sum": freqs}))
            yield (pd.concat(parts) if parts
                   else pd.DataFrame({"doc_id": [], "freq_sum": []}))

    from lucene_1_spark.index.builder import FIELD_SEP
    content_blocks = blocks.filter(~F.col("term").contains(FIELD_SEP))
    per_doc = (content_blocks.mapInPandas(doc_freq_sums, _DOCLEN_SCHEMA)
               .groupBy("doc_id").agg(F.sum("freq_sum").alias("fsum")))
    bad = (docs.join(per_doc, "doc_id", "left_outer")
           .filter(F.col("length") != F.coalesce(F.col("fsum"), F.lit(0)))
           .count())
    out["doc_length_vs_postings"] = (bad == 0, f"{bad} docs disagree")

    # 4b. per-field stats agreement (multi-field indexes): the manifest
    # field_stats must equal a recompute from the docs table
    cfg = reader.cfg
    if cfg.get("keyword_fields") or cfg.get("text_fields"):
        from lucene_1_spark.index.builder import _field_stats_of_docs
        derived_fs = _field_stats_of_docs(
            reader.spark.read.parquet(reader.table_path("docs")),
            cfg.get("keyword_fields"), cfg.get("text_fields"))
        stored_fs = reader.manifest.get("field_stats", {})
        out["field_stats"] = (derived_fs == stored_fs,
                              f"manifest={stored_fs} derived={derived_fs}")

    # 5. sha256 invariant vs source
    if source is not None:
        src = source.select(
            "repo", "path", "commit",
            F.sha2(F.coalesce(F.col("content"), F.lit("")), 256).alias("sha"))
        bad = (docs.join(src, ["repo", "path", "commit"])
               .filter(F.col("content_sha256") != F.col("sha")).count())
        out["content_sha256"] = (bad == 0, f"{bad} rows differ")

    # 6. checkpoints / lineage presence
    import os
    cp_ok = os.path.exists(os.path.join(reader.dir, "checkpoints"))
    lm_ok = os.path.exists(os.path.join(reader.dir, "lineage_metrics"))
    if cp_ok:
        cp = spark.read.parquet(os.path.join(reader.dir, "checkpoints"))
        stages = {r["stage"] for r in cp.select("stage").distinct().collect()}
        cp_ok = {"docs", "stats"} <= stages and any(
            s == "postings" for s in stages)
    out["checkpoints"] = (bool(cp_ok), "docs/postings/stats checkpoints present")
    out["lineage"] = (bool(lm_ok), "lineage_metrics table present")

    # 7. doc-values delta consistency (when updates are pending):
    # every generation in the manifest window exists, fields match the
    # manifest's pending list, values typed per kind
    dvf = reader.manifest.get("dv_fields")
    if dvf:
        dv_path = os.path.join(reader.dir, "dv_updates")
        if not os.path.exists(dv_path):
            out["dv_updates"] = (False, "manifest lists dv_fields but "
                                        "dv_updates table is missing")
        else:
            upd = spark.read.parquet(dv_path)
            floor = int(reader.manifest.get("dv_folded_gen", 0))
            ceil = int(reader.manifest.get("dv_generation", 0))
            win = upd.filter((F.col("gen") > floor)
                             & (F.col("gen") <= ceil))
            stray = win.filter(~F.col("field").isin(list(dvf))).count()
            untyped = win.filter(F.col("value_num").isNull()
                                 & F.col("value_str").isNull()).count()
            ok = stray == 0 and untyped == 0
            out["dv_updates"] = (
                ok, f"{stray} rows with unlisted fields, "
                    f"{untyped} rows with no value")

    # 8. retained snapshots: manifests parse and every data dir they
    # reference still exists (the SnapshotDeletionPolicy keep-set held)
    snap_dir = os.path.join(reader.dir, "snapshots")
    if os.path.isdir(snap_dir):
        import json as _json
        missing = []
        for f in sorted(os.listdir(snap_dir)):
            if not f.endswith(".json"):
                continue
            try:
                with open(os.path.join(snap_dir, f)) as fh:
                    sm = _json.load(fh)
            except ValueError:
                missing.append(f"{f}: unparseable")
                continue
            for name in ("postings", "docs", "term_stats"):
                rel = sm.get(f"{name}_path", name)
                if not os.path.exists(os.path.join(reader.dir, rel)):
                    missing.append(f"{f}:{rel}")
            if sm.get("has_deletes"):
                tomb_rel = sm.get("tombstones_path", "tombstones")
                if not os.path.exists(
                        os.path.join(reader.dir, tomb_rel)):
                    missing.append(f"{f}:{tomb_rel}")
        out["snapshots"] = (not missing,
                            f"{len(missing)} dangling refs: "
                            f"{missing[:5]}")
    return out
