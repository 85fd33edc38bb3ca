"""Deletes (tombstones + liveDocs masking), updates (delete+append),
compaction (SegmentMerger analog), materialized-source builds, staged
postings commit resume, and streaming batch idempotency."""

import os

import numpy as np
import pytest
from pyspark.sql import functions as F

from lucene_1_spark import corpus as corpus_mod
from lucene_1_spark.index import IndexBuilder, IndexReader
from lucene_1_spark.index.builder import IndexConfig, pack_blocks_df
from lucene_1_spark.index.maintenance import compact_index
from lucene_1_spark.search import IndexSearcher
from lucene_1_spark.streaming.incremental import IncrementalIndexWriter

CFG = dict(n_buckets=4, n_doc_partitions=4, positions=True)


def _tokens(text: str) -> set[str]:
    from lucene_1_spark.analysis import get_analyzer
    return set(get_analyzer("standard").tokens(text))


def _hits(searcher, q) -> dict[str, float]:
    """{doc_key: float32 score} over the exhaustive match set."""
    m = searcher.search_df(q, k=None)
    docs = searcher.reader.docs()
    rows = (m.join(docs, "doc_id")
            .select(F.concat_ws("/", "repo", "path").alias("key"), "score")
            .collect())
    return {r["key"]: float(np.float32(r["score"])) for r in rows}


@pytest.fixture(scope="module")
def corpus():
    return corpus_mod.generate(300)


@pytest.fixture(scope="module")
def mut_index(spark, tmp_root, corpus):
    """build -> update 3 docs -> delete_by_term('tok9') (pre-compaction
    state, exercised by the delete tests)."""
    d = os.path.join(tmp_root, "idx_mut")
    src = spark.createDataFrame(corpus).repartition(4, "repo")
    w = IncrementalIndexWriter(spark, d, IndexConfig(**CFG))
    w.append(src)
    upd_keys = corpus.sort_values(["repo", "path", "commit"]).iloc[:3]
    updated = spark.createDataFrame(upd_keys).withColumn(
        "content", F.lit("updatedmarker tok1 tok1 tok2"))
    w.update_documents(updated)
    w.delete_by_term("tok9")
    return d, w, upd_keys


def test_delete_masks_hits_and_keeps_stale_stats(spark, tmp_root, corpus,
                                                 mut_index):
    d, w, upd_keys = mut_index
    s = IndexSearcher(IndexReader(spark, d))
    assert s.reader.has_deletes
    upd_key_set = {f"{r.repo}/{r.path}" for r in upd_keys.itertuples()}
    # no hit may contain tok9 (deleted); updated docs judged on NEW text
    hits = _hits(s, "tok1")
    dead_keys = {f"{r.repo}/{r.path}" for r in corpus.itertuples()
                 if "tok9" in _tokens(r.content)} - upd_key_set
    assert hits and not (set(hits) & dead_keys)
    assert s.count("tok9") == 0
    # updated docs match their NEW content (exactly once per key)
    upd = _hits(s, "updatedmarker")
    assert set(upd) == upd_key_set and len(upd) == 3
    # match-all count reflects live docs
    n_tomb = s.reader.tombstones().count()
    from lucene_1_spark.search.query import MatchAllDocsQuery
    assert s.count(MatchAllDocsQuery()) == s.reader.stats["n_docs"] - n_tomb


def test_compaction_equals_fresh_build(spark, tmp_root, corpus, mut_index):
    d, w, upd_keys = mut_index
    stats = w.compact()
    s = IndexSearcher(IndexReader(spark, d))
    assert not s.reader.has_deletes

    # reference: a fresh build over the equivalent mutated corpus
    ref = corpus.copy()
    upd_idx = ref.sort_values(["repo", "path", "commit"]).index[:3]
    ref.loc[upd_idx, "content"] = "updatedmarker tok1 tok1 tok2"
    keep = [i for i in ref.index if "tok9" not in _tokens(ref.loc[i, "content"])]
    ref = ref.loc[keep]
    d2 = os.path.join(tmp_root, "idx_mut_ref")
    IndexBuilder(spark, d2, IndexConfig(**CFG)).build(
        spark.createDataFrame(ref).repartition(4, "repo"))
    s2 = IndexSearcher(IndexReader(spark, d2))

    for k in ("n_docs", "doc_count", "sum_total_term_freq", "sum_doc_freq"):
        assert s.reader.stats[k] == s2.reader.stats[k], k
    for q in ["tok1", "+tok2 +tok3", "updatedmarker", '"tok0 tok1"']:
        assert _hits(s, q) == _hits(s2, q), q


def test_compaction_bounds_blocks_per_term(spark, mut_index):
    d, w, _ = mut_index  # compacted by the previous test
    r = IndexReader(spark, d)
    bad = (r.postings().groupBy("term")
           .agg(F.count("*").alias("nb"), F.sum("num_docs").alias("df"))
           .filter(F.col("nb") != F.ceil(F.col("df") / 128)).count())
    assert bad == 0


def test_materialized_source_build_identical(spark, tmp_root, corpus):
    pdf = corpus.iloc[:250]
    src = spark.createDataFrame(pdf).repartition(4, "repo")
    cfg_p = IndexConfig(n_buckets=4, n_doc_partitions=4)
    cfg_m = IndexConfig(n_buckets=4, n_doc_partitions=4,
                        source_mode="materialize")
    dp = os.path.join(tmp_root, "idx_src_persist")
    dm = os.path.join(tmp_root, "idx_src_mat")
    IndexBuilder(spark, dp, cfg_p).build(src)
    IndexBuilder(spark, dm, cfg_m).build(src)
    assert not os.path.exists(os.path.join(dm, "keyed_source"))

    cols = ["doc_id", "repo", "path", "commit", "length", "norm_byte",
            "content_sha256"]
    a = sorted(map(tuple, spark.read.parquet(os.path.join(dp, "docs"))
                   .select(cols).collect()))
    b = sorted(map(tuple, spark.read.parquet(os.path.join(dm, "docs"))
                   .select(cols).collect()))
    assert a == b
    sa = IndexSearcher(IndexReader(spark, dp))
    sb = IndexSearcher(IndexReader(spark, dm))
    for q in ["tok0", "tok1 tok2", "+tok3 +tok4"]:
        assert _hits(sa, q) == _hits(sb, q), q


def test_staged_postings_resume_completes_commit(spark, tmp_root, corpus):
    """Simulate a driver crash after the staging write + staged
    checkpoints but before the rename-commit: the next build() must
    promote the staged files without re-packing (no doubled doc_freq)."""
    pdf = corpus.iloc[:200]
    src = spark.createDataFrame(pdf).repartition(4, "repo")
    cfg = IndexConfig(n_buckets=4, n_doc_partitions=4)
    d_ref = os.path.join(tmp_root, "idx_stage_ref")
    IndexBuilder(spark, d_ref, cfg).build(src)

    d = os.path.join(tmp_root, "idx_stage_crash")
    b = IndexBuilder(spark, d, cfg)
    os.makedirs(d, exist_ok=True)
    b.build_docs(src)
    keyed, offsets = b._keyed_offsets(src)
    pack_blocks_df(keyed, offsets, cfg).write.mode("overwrite") \
        .partitionBy("bucket").parquet(b.path("postings_staging"))
    staged = (spark.read.parquet(b.path("postings_staging"))
              .groupBy("bucket").count().collect())
    b._write_checkpoints([(int(r["bucket"]), "postings_staged", "done",
                           r["count"]) for r in staged])
    b._release()
    # --- crash; resume from scratch ---
    IndexBuilder(spark, d, cfg).build(src)
    ts_a = sorted(map(tuple, spark.read.parquet(
        os.path.join(d_ref, "term_stats")).collect()))
    ts_b = sorted(map(tuple, spark.read.parquet(
        os.path.join(d, "term_stats")).collect()))
    assert ts_a == ts_b


def test_sparse_vocab_build_resume_terminates(spark, tmp_root):
    """A corpus whose distinct terms hash into FEWER buckets than
    n_buckets leaves some buckets legitimately empty; a re-invoked
    build (resume path) must recognize them as done instead of
    re-packing forever and crashing on the empty staging read."""
    import pandas as pd
    pdf = pd.DataFrame({
        "repo": [f"r{i % 3}" for i in range(60)],
        "path": [f"p{i}" for i in range(60)],
        "commit": ["c0"] * 60,
        "lang": ["py"] * 60,
        # 3 distinct terms only -> most of the 16 buckets stay empty
        "content": ["alpha beta", "beta gamma", "alpha gamma"] * 20,
    })
    d = os.path.join(tmp_root, "idx_sparse_resume")
    src = spark.createDataFrame(pdf)
    cfg = IndexConfig(n_buckets=16, n_doc_partitions=2)
    IndexBuilder(spark, d, cfg).build(src)
    # resume in a fresh builder (the cross-process re-open path)
    IndexBuilder(spark, d, cfg).build(src)
    s = IndexSearcher(IndexReader(spark, d))
    assert s.count("alpha") == 40
    assert s.count("beta") == 40
    docs = spark.read.parquet(os.path.join(d, "docs"))
    assert docs.count() == 60
    assert docs.groupBy("doc_id").count().filter("count > 1").count() == 0


def test_streaming_batch_replay_is_idempotent(spark, tmp_root, corpus):
    d = os.path.join(tmp_root, "idx_replay")
    w = IncrementalIndexWriter(spark, d,
                               IndexConfig(n_buckets=4, n_doc_partitions=2))
    b0 = spark.createDataFrame(corpus.iloc[:100])
    b1 = spark.createDataFrame(corpus.iloc[100:150])
    w.append(b0, batch_id=0)
    w.append(b1, batch_id=1)
    n1 = IndexReader(spark, d).stats["n_docs"]
    w.append(b1, batch_id=1)  # redelivered micro-batch
    r = IndexReader(spark, d)
    assert r.stats["n_docs"] == n1 == 150
    w.append(spark.createDataFrame(corpus.iloc[150:170]), batch_id=2)
    assert IndexReader(spark, d).stats["n_docs"] == 170


def test_maybe_compact_policy(spark, tmp_root, corpus):
    """TieredMergePolicy-style trigger: compaction fires once the
    appended-segment count reaches the threshold."""
    d = os.path.join(tmp_root, "idx_policy")
    w = IncrementalIndexWriter(spark, d,
                               IndexConfig(n_buckets=4, n_doc_partitions=2))
    w.append(spark.createDataFrame(corpus.iloc[:80]))
    assert w.maybe_compact(max_segments=3) is None  # 1 segment: no-op
    w.append(spark.createDataFrame(corpus.iloc[80:120]))
    assert w.maybe_compact(max_segments=3) is None  # 2 segments
    w.append(spark.createDataFrame(corpus.iloc[120:160]))
    stats = w.maybe_compact(max_segments=3)          # 3 segments: compact
    assert stats is not None and stats["n_docs"] == 160
    assert w.maybe_compact(max_segments=3) is None   # counter reset
    r = IndexReader(spark, d)
    assert r.manifest["generation"] == 1
    bad = (r.postings().groupBy("term")
           .agg(F.count("*").alias("nb"), F.sum("num_docs").alias("df"))
           .filter(F.col("nb") != F.ceil(F.col("df") / 128)).count())
    assert bad == 0


def test_fused_build_resume_after_staging_crash(spark, tmp_root, corpus):
    """Crash right after the fused staging write, before ANY checkpoint:
    resume must discard the orphan staging and rebuild to a state
    identical to an uninterrupted build."""
    from lucene_1_spark.index.builder import pack_blocks_df, range_partition
    pdf = corpus.iloc[:200]
    src = spark.createDataFrame(pdf).repartition(4, "repo")
    cfg = IndexConfig(n_buckets=4, n_doc_partitions=4)
    d_ref = os.path.join(tmp_root, "idx_fused_ref")
    IndexBuilder(spark, d_ref, cfg).build(src)

    d = os.path.join(tmp_root, "idx_fused_crash1")
    b = IndexBuilder(spark, d, cfg)
    os.makedirs(d, exist_ok=True)
    keyed, offsets = range_partition(src, cfg)
    pack_blocks_df(keyed, offsets, cfg, emit_docs=True) \
        .write.mode("overwrite").partitionBy("kind", "bucket") \
        .parquet(b.path("postings_staging"))
    keyed.unpersist()
    # --- crash (no checkpoints, no docs, orphan staging); resume ---
    IndexBuilder(spark, d, cfg).build(src)
    assert not os.path.exists(os.path.join(d, "postings_staging"))
    for tbl in ("term_stats",):
        a = sorted(map(tuple, spark.read.parquet(
            os.path.join(d_ref, tbl)).collect()))
        bb = sorted(map(tuple, spark.read.parquet(
            os.path.join(d, tbl)).collect()))
        assert a == bb
    sa = IndexSearcher(IndexReader(spark, d_ref))
    sb = IndexSearcher(IndexReader(spark, d))
    for q in ["tok0", "tok1 tok2", "+tok3 +tok4"]:
        assert _hits(sa, q) == _hits(sb, q), q


def test_fused_build_resume_after_docs_commit(spark, tmp_root, corpus):
    """Crash after the docs table committed but before staged postings
    checkpoints: the resume re-packs blocks WITHOUT re-emitting docs
    (emit_docs=False path) and finishes to a correct index."""
    pdf = corpus.iloc[:200]
    src = spark.createDataFrame(pdf).repartition(4, "repo")
    cfg = IndexConfig(n_buckets=4, n_doc_partitions=4)
    d_ref = os.path.join(tmp_root, "idx_fused_ref2")
    IndexBuilder(spark, d_ref, cfg).build(src)

    d = os.path.join(tmp_root, "idx_fused_crash2")
    b = IndexBuilder(spark, d, cfg)
    os.makedirs(d, exist_ok=True)
    b.build_docs(src)   # docs committed the two-pass way
    b._release()
    assert b._stage_done("docs")
    # --- crash before any postings work; resume via fused build ---
    IndexBuilder(spark, d, cfg).build(src)
    docs = spark.read.parquet(os.path.join(d, "docs"))
    assert docs.count() == 200
    assert docs.groupBy("doc_id").count().filter("count > 1").count() == 0
    a = sorted(map(tuple, spark.read.parquet(
        os.path.join(d_ref, "term_stats")).collect()))
    bb = sorted(map(tuple, spark.read.parquet(
        os.path.join(d, "term_stats")).collect()))
    assert a == bb


# ---------------------------------------------------------------------------
# round-3: staged append — crash safety + O(segment) commits
# ---------------------------------------------------------------------------

def _file_census(root):
    """{relpath: size} of every parquet file under root."""
    out = {}
    for dirpath, _, files in os.walk(root):
        for fn in files:
            if fn.endswith(".parquet"):
                p = os.path.join(dirpath, fn)
                out[os.path.relpath(p, root)] = os.path.getsize(p)
    return out


def _probe_df(corpus_pdf, term):
    from lucene_1_spark.analysis import get_analyzer
    an = get_analyzer("standard")
    return sum(1 for c in corpus_pdf["content"] if term in set(an.tokens(c)))


def test_append_crash_mid_staging_no_duplicates(spark, tmp_root, corpus):
    """Crash AFTER staging files land but BEFORE the staged checkpoint:
    the replay discards the orphan staging and re-runs; no duplicate
    doc_ids, doc_freq exact (the round-2 crash-duplication window)."""
    d = os.path.join(tmp_root, "idx_append_crash1")
    cfg = IndexConfig(n_buckets=4, n_doc_partitions=2)
    w = IncrementalIndexWriter(spark, d, cfg)
    w.append(spark.createDataFrame(corpus.iloc[:100]), batch_id=0)
    batch = spark.createDataFrame(corpus.iloc[100:150])
    # simulate the crashed first attempt: staging written, no checkpoint
    from lucene_1_spark.index.builder import pack_blocks_df, range_partition
    keyed, offsets = range_partition(batch, cfg, base=100)
    pack_blocks_df(keyed, offsets, cfg, emit_docs=True) \
        .write.mode("overwrite").partitionBy("kind", "bucket") \
        .parquet(os.path.join(d, "append_staging"))
    keyed.unpersist()
    # --- replay the redelivered micro-batch ---
    w.append(batch, batch_id=1)
    r = IndexReader(spark, d)
    assert r.stats["n_docs"] == 150
    docs = spark.read.parquet(os.path.join(d, "docs"))
    assert docs.count() == 150
    assert docs.groupBy("doc_id").count().filter("count > 1").count() == 0
    exp_df = _probe_df(corpus.iloc[:150], "tok0")
    assert r.term_statistics(["tok0"])["tok0"][0] == exp_df


def test_append_crash_before_promote_and_before_commit(spark, tmp_root,
                                                       corpus, monkeypatch):
    """Two deeper crash points: (a) after the staged checkpoint but
    before any promote move; (b) after promote but before the manifest
    commit.  Replaying the same batch_id must finish the append exactly
    once each time."""
    import lucene_1_spark.streaming.incremental as inc
    d = os.path.join(tmp_root, "idx_append_crash2")
    cfg = IndexConfig(n_buckets=4, n_doc_partitions=2)
    w = IncrementalIndexWriter(spark, d, cfg)
    w.append(spark.createDataFrame(corpus.iloc[:100]), batch_id=0)

    # (a) crash before promote
    batch1 = spark.createDataFrame(corpus.iloc[100:140])
    orig_promote = IncrementalIndexWriter._promote_segment

    def boom(self, seg_id, staging):
        raise RuntimeError("crash-before-promote")
    monkeypatch.setattr(IncrementalIndexWriter, "_promote_segment", boom)
    with pytest.raises(RuntimeError):
        w.append(batch1, batch_id=1)
    monkeypatch.setattr(IncrementalIndexWriter, "_promote_segment",
                        orig_promote)
    w.append(batch1, batch_id=1)  # replay
    assert IndexReader(spark, d).stats["n_docs"] == 140

    # (b) crash after promote, before the manifest commit
    batch2 = spark.createDataFrame(corpus.iloc[140:170])
    orig_commit = inc._write_manifest

    def boom2(index_dir, manifest):
        raise RuntimeError("crash-before-commit")
    monkeypatch.setattr(inc, "_write_manifest", boom2)
    with pytest.raises(RuntimeError):
        w.append(batch2, batch_id=2)
    monkeypatch.setattr(inc, "_write_manifest", orig_commit)
    w.append(batch2, batch_id=2)  # replay
    r = IndexReader(spark, d)
    assert r.stats["n_docs"] == 170
    docs = spark.read.parquet(os.path.join(d, "docs"))
    assert docs.count() == 170
    assert docs.groupBy("doc_id").count().filter("count > 1").count() == 0
    exp_df = _probe_df(corpus.iloc[:170], "tok0")
    assert r.term_statistics(["tok0"])["tok0"][0] == exp_df


def test_append_is_o_segment_not_o_index(spark, tmp_root, corpus):
    """The append touches ONLY the new segment's data: every
    pre-existing docs/postings/term_stats file survives byte-for-byte
    (same path, same size) — the O(index) term-stats rewrite of the
    round-2 design is gone — and per-segment stats sum correctly."""
    d = os.path.join(tmp_root, "idx_append_oseg")
    cfg = IndexConfig(n_buckets=4, n_doc_partitions=2)
    w = IncrementalIndexWriter(spark, d, cfg)
    w.append(spark.createDataFrame(corpus.iloc[:150]), batch_id=0)
    before = {t: _file_census(os.path.join(d, t))
              for t in ("docs", "postings", "term_stats")}
    w.append(spark.createDataFrame(corpus.iloc[150:200]), batch_id=1)
    after = {t: _file_census(os.path.join(d, t))
             for t in ("docs", "postings", "term_stats")}
    for t in before:
        missing = set(before[t]) - set(after[t])
        assert not missing, (t, missing)
        changed = {p for p in before[t] if after[t][p] != before[t][p]}
        assert not changed, (t, changed)
        assert len(after[t]) > len(before[t]), t  # new segment files exist
    r = IndexReader(spark, d)
    exp_df = _probe_df(corpus.iloc[:200], "tok1")
    assert r.term_statistics(["tok1"])["tok1"][0] == exp_df
    # the aggregated dictionary view shows ONE row per term
    from pyspark.sql import functions as FF
    dup = (r.term_stats().groupBy("term").count()
           .filter("count > 1").count())
    assert dup == 0


def test_salted_compaction_identical_results(spark, tmp_root, corpus):
    """Explicit hot-term skew salting: compaction keyed by
    (bucket, term, first_doc // salt_docs) splits a hot term's repack
    across tasks; results stay byte-identical and blocks-per-term is
    bounded by ceil(df/128) + ranges-1."""
    import shutil

    from lucene_1_spark.index.builder import IndexConfig as IC
    from lucene_1_spark.streaming.incremental import IncrementalIndexWriter
    d = os.path.join(tmp_root, "idx_salt")
    w = IncrementalIndexWriter(spark, d, IC(n_buckets=4,
                                            n_doc_partitions=4))
    w.append(spark.createDataFrame(corpus.iloc[:150]), batch_id=0)
    w.append(spark.createDataFrame(corpus.iloc[150:300]), batch_id=1)
    d2 = d + "_ref"
    shutil.rmtree(d2, ignore_errors=True)
    shutil.copytree(d, d2)

    compact_index(spark, d, salt_docs=64)   # salted
    compact_index(spark, d2)                # exact
    sa = IndexSearcher(IndexReader(spark, d))
    sb = IndexSearcher(IndexReader(spark, d2))
    for q in ["tok0", "tok1 tok2", "+tok0 +tok3", "tok4 -tok0"]:
        assert _hits(sa, q) == _hits(sb, q), q
    # bound: ceil(df/128) + (n_salt_ranges - 1); 300 docs / 64 => <= 5
    bad = (sa.reader.postings().groupBy("term")
           .agg(F.count("*").alias("nb"), F.sum("num_docs").alias("df"))
           .filter(F.col("nb") > F.ceil(F.col("df") / 128) + 4).count())
    assert bad == 0
    assert sa.reader.stats == sb.reader.stats


def test_manual_append_crash_then_new_batch_preserves_both(
        spark, tmp_root, corpus, monkeypatch):
    """Manual appends (batch_id=None) crashed after the STAGE checkpoint
    but before commit: a LATER manual append with DIFFERENT docs must
    not silently promote the stale staged segment and drop its own
    batch — it finishes the crashed segment's commit AND appends
    itself, so both batches land exactly once."""
    import lucene_1_spark.streaming.incremental as inc
    d = os.path.join(tmp_root, "idx_manual_crash")
    cfg = IndexConfig(n_buckets=4, n_doc_partitions=2)
    w = IncrementalIndexWriter(spark, d, cfg)
    w.append(spark.createDataFrame(corpus.iloc[:100]))  # bootstrap

    # batch A stages + checkpoints, crashes before promote
    batchA = spark.createDataFrame(corpus.iloc[100:140])
    orig_promote = IncrementalIndexWriter._promote_segment

    def boom(self, seg_id, staging):
        raise RuntimeError("crash-before-promote")
    monkeypatch.setattr(IncrementalIndexWriter, "_promote_segment", boom)
    with pytest.raises(RuntimeError):
        w.append(batchA)
    monkeypatch.setattr(IncrementalIndexWriter, "_promote_segment",
                        orig_promote)

    # batch B: different docs, manual append — must adopt A then add B
    batchB = spark.createDataFrame(corpus.iloc[140:170])
    w.append(batchB)
    r = IndexReader(spark, d)
    assert r.stats["n_docs"] == 170
    docs = spark.read.parquet(os.path.join(d, "docs"))
    assert docs.count() == 170
    assert docs.groupBy("doc_id").count().filter("count > 1").count() == 0
    exp_df = _probe_df(corpus.iloc[:170], "tok0")
    assert r.term_statistics(["tok0"])["tok0"][0] == exp_df


def test_manual_append_identical_retry_resumes_staged(
        spark, tmp_root, corpus, monkeypatch):
    """A retried IDENTICAL manual batch (content-hash correlation)
    resumes its own staged segment instead of double-adding."""
    d = os.path.join(tmp_root, "idx_manual_retry")
    cfg = IndexConfig(n_buckets=4, n_doc_partitions=2)
    w = IncrementalIndexWriter(spark, d, cfg)
    w.append(spark.createDataFrame(corpus.iloc[:100]))

    batch = spark.createDataFrame(corpus.iloc[100:130])
    orig_promote = IncrementalIndexWriter._promote_segment

    def boom(self, seg_id, staging):
        raise RuntimeError("crash-before-promote")
    monkeypatch.setattr(IncrementalIndexWriter, "_promote_segment", boom)
    with pytest.raises(RuntimeError):
        w.append(batch)
    monkeypatch.setattr(IncrementalIndexWriter, "_promote_segment",
                        orig_promote)
    w.append(batch)  # identical retry: same content hash -> resume
    r = IndexReader(spark, d)
    assert r.stats["n_docs"] == 130
    docs = spark.read.parquet(os.path.join(d, "docs"))
    assert docs.count() == 130
    assert docs.groupBy("doc_id").count().filter("count > 1").count() == 0
