"""Distributed inverted-index build — the role of Lucene's write path
(``IndexWriter.addDocument`` -> DWPT -> flush -> ``SegmentMerger``,
SURVEY.md §3.1) re-expressed as a DataFrame pipeline:

stage ``docs``      deterministic docID assignment + tokenize + norms
                    -> meta-only docs table
stage ``postings``  per-term 128-doc blocks, delta+FOR packed, with
                    block-max metadata; packed SEGMENT-LOCALLY (zero
                    shuffle) — each doc partition is a Lucene-style
                    segment emitting doc-ordered block runs
stage ``stats``     term_stats + collection_stats (whole-index — BM25
                    idf/avgdl are global, ``IndexSearcher.java:1110-1123``)

Scale design (100 TB / 10^12 files):

- **docIDs** are the lexicographic rank of ``(repo, path, commit)``:
  one ``repartitionByRange`` + ``sortWithinPartitions`` of the source
  (persisted, shared by both kernel passes) + per-partition offsets
  (one tiny driver collect).  Range boundaries may vary run-to-run, but
  the assignment is a pure function of the key set, so builds are
  deterministic — required for Lucene-style (score desc, docID asc)
  tie-breaks.  Never ``monotonically_increasing_id``.
- **nothing bulky crosses the wire**: the ONLY shuffle is the range
  partition of the raw source.  Posting blocks are packed inside the
  kernel that tokenizes (per-doc term-frequency maps never cross
  Arrow, never hit the persist cache, never hit parquet); the docs
  table stores meta only.  Tokenization runs once per stage (twice
  total) — trading ~2x a cheap vectorized pass for gigabytes of map
  serialization was measured 30-40% faster end-to-end and far less
  memory-bandwidth-bound.
- **no postings shuffle, no skew**: one doc partition = one segment;
  a hot term's postings split naturally across segments as doc-ordered
  runs with disjoint docID ranges — no per-term hot task to salt.
  Boundary blocks may hold <128 docs, which the format permits
  (Lucene's tail blocks likewise).
- **partition-pruned term lookup**: postings + term stats are written
  ``partitionBy(bucket)`` with ``bucket = pmod(xxhash64(term), B)`` —
  a query for k terms touches at most k of B directories (the Spark
  analog of the term-dictionary seek).
- **resumability**: each stage writes a checkpoint row (FIXTURES.md §4)
  after its output is durable; a re-run skips completed stages (the
  postings stage re-derives term frequencies by re-tokenizing the
  source — cheaper than persisting them).
- **lineage/metrics**: docs/terms/postings/bytes per partition.

Parquet + a JSON manifest stand in for Iceberg tables + snapshot
commits — the sandbox ships no Iceberg jars; on a real cluster every
table write below becomes an Iceberg commit (documented deviation).
"""

from __future__ import annotations

import json
import os
import time
from dataclasses import dataclass
from typing import Iterator

import numpy as np
import pandas as pd
from pyspark.sql import DataFrame, SparkSession, functions as F, types as T

from lucene_1_spark.analysis import get_analyzer
from lucene_1_spark.functions import codecs
from lucene_1_spark.functions.smallfloat import LENGTH_TABLE, int_to_byte4
from lucene_1_spark.functions.xxhash import bucket_of_term

DOC_KEY_COLS = ["repo", "path", "commit"]

# multi-field postings share ONE physical term column: a non-content
# field's term is stored as "<field>\x1f<value>" (\x1f = ASCII unit
# separator, which no analyzer ever emits), so bucketing, compaction,
# per-segment stats, and the decode kernels all work unchanged — the
# per-field postings of IndexingChain (``index/IndexingChain.java:561``)
# keyed relationally instead of by a per-field FieldInfo.
FIELD_SEP = "\x1f"

DOCS_SCHEMA = T.StructType([
    T.StructField("doc_id", T.LongType()),
    T.StructField("repo", T.StringType()),
    T.StructField("path", T.StringType()),
    T.StructField("commit", T.StringType()),
    T.StructField("lang", T.StringType()),
    T.StructField("length", T.LongType()),
    T.StructField("norm_byte", T.IntegerType()),
    T.StructField("content_sha256", T.StringType()),
    T.StructField("build_partition", T.IntegerType()),
    # per-extra-text-field token counts ({} when none configured) —
    # the per-field norms source for collection stats (FieldInvertState
    # length per field, ``index/IndexingChain.java:561``)
    T.StructField("field_lengths", T.MapType(T.StringType(), T.LongType())),
])

BLOCKS_SCHEMA = T.StructType([
    T.StructField("term", T.StringType()),
    T.StructField("block_seq", T.IntegerType()),
    T.StructField("num_docs", T.IntegerType()),
    T.StructField("first_doc", T.LongType()),
    T.StructField("last_doc", T.LongType()),
    T.StructField("max_freq", T.IntegerType()),
    T.StructField("min_norm_len", T.IntegerType()),
    T.StructField("min_norm_byte", T.IntegerType()),
    T.StructField("sum_freq", T.LongType()),
    T.StructField("doc_gaps", T.BinaryType()),
    T.StructField("freqs", T.BinaryType()),
    T.StructField("norms", T.BinaryType()),
    T.StructField("positions", T.BinaryType()),
    T.StructField("bucket", T.IntegerType()),
])

# single-tokenize fused build: the pack kernel emits BOTH posting-block
# rows (kind='block') and doc-meta rows (kind='doc', bucket=-1) through
# one union schema — the corpus is analyzed ONCE instead of once per
# stage.  Null columns cost nothing in parquet; the docs table is then
# committed via a JVM-only column-pruned rewrite of the kind=doc slice.
FUSED_SCHEMA = T.StructType(
    list(BLOCKS_SCHEMA.fields)
    + [T.StructField("kind", T.StringType()),
       T.StructField("doc_id", T.LongType()),
       T.StructField("repo", T.StringType()),
       T.StructField("path", T.StringType()),
       T.StructField("commit", T.StringType()),
       T.StructField("lang", T.StringType()),
       T.StructField("length", T.LongType()),
       T.StructField("norm_byte", T.IntegerType()),
       T.StructField("content_sha256", T.StringType()),
       T.StructField("build_partition", T.IntegerType()),
       T.StructField("field_lengths",
                     T.MapType(T.StringType(), T.LongType()))])


@dataclass
class IndexConfig:
    analyzer: str = "standard"
    k1: float = 1.2
    b: float = 0.75
    n_buckets: int = 16          # term-hash partitions of the postings table
    n_doc_partitions: int = 32   # range partitions for docID assignment
    block_size: int = codecs.BLOCK_SIZE
    # index positions for phrase queries (DOCS_AND_FREQS_AND_POSITIONS)
    positions: bool = False
    # "bm25_float32"   = Lucene-exact float32 + byte4-quantized norms;
    # "bm25_double"    = double precision + exact uint32 lengths (the
    #                    SQL-oracle-reproducible similarity);
    # "classic_double" = ClassicSimilarity (TF-IDF: sqrt(tf) * idf^2 *
    #                    1/sqrt(len)) in double precision — the third
    #                    pluggable Similarity (SURVEY.md §2.11);
    # "lm_dirichlet_double" = LMDirichletSimilarity (query-likelihood
    #                    LM with Dirichlet smoothing, mu=2000 —
    #                    ``similarities/LMDirichletSimilarity.java``);
    # "boolean_double" = BooleanSimilarity (score == query boost,
    #                    ``similarities/BooleanSimilarity.java``)
    similarity: str = "bm25_float32"
    # how the range-shuffled source is shared by the two kernel passes:
    # "persist"     — cache executor-side (MEMORY_AND_DISK).  Right for
    #                 sources that fit the cluster's cache tier.
    # "materialize" — write the keyed source (with baked docIDs) to
    #                 storage once and column-prune the two re-reads.
    #                 Right at 100 TB: no cache pressure, and a driver
    #                 failure between passes resumes WITHOUT redoing the
    #                 range shuffle (the materialized table freezes the
    #                 nondeterministic range-sampling boundaries).
    source_mode: str = "persist"
    # stored source columns ALSO indexed as untokenized keyword fields
    # (e.g. ("lang",)): each non-null value becomes one posting under
    # the composite term "<field>\x1f<value>" with freq=1, field
    # length 1 (per-field norms, ``Similarity.java:152``) and position
    # 0.  Queried via TermQuery(field=...) / the parser's field:value.
    keyword_fields: tuple[str, ...] = ()
    # extra ANALYZED text source columns, each a full per-field postings
    # space: terms stored as "<field>\x1f<term>" with the FIELD's
    # per-doc length as the norm, field-local positions, and per-field
    # collection stats (doc_count / sum_ttf from the docs table's
    # field_lengths map) — multi-field indexing at Lucene grade
    # (``index/IndexingChain.java:561``; per-field norms
    # ``Similarity.java:152``).  Indexed, not stored.
    text_fields: tuple[str, ...] = ()

    @property
    def norms_encoding(self) -> str:
        return "byte4" if self.similarity == "bm25_float32" else "exact32"


def range_partition(source: DataFrame, cfg: IndexConfig, base: int = 0):
    """Range-shuffle + sort the source by doc key; returns the PERSISTED
    keyed DataFrame and the per-partition docID offsets (base + rank).
    Shared by the docs and postings kernel passes so the shuffle runs
    once.  Partition count is exactly ``cfg.n_doc_partitions`` — sized
    by the caller from input bytes (no hidden clamp; at 10^12 files you
    want 10^5-10^6 partitions, one Lucene-style segment each)."""
    n_part = cfg.n_doc_partitions
    keyed = (source.repartitionByRange(n_part, *DOC_KEY_COLS)
             .sortWithinPartitions(*DOC_KEY_COLS)).persist()
    counts = (keyed.select(F.spark_partition_id().alias("pid"))
              .groupBy("pid").count().collect())
    sizes = {r["pid"]: r["count"] for r in counts}
    offsets, acc = {}, base
    for pid in range(n_part):
        offsets[pid] = acc
        acc += sizes.get(pid, 0)
    return keyed, offsets


def materialize_keyed_source(spark: SparkSession, source: DataFrame,
                             cfg: IndexConfig, staging_path: str,
                             base: int = 0) -> DataFrame:
    """The 100-TB alternative to :func:`range_partition`: range-shuffle
    once, bake the docID into a materialized parquet copy, and let both
    kernel passes re-read it column-pruned.

    docID = base + global lexicographic rank of (repo, path, commit),
    assembled as offset[pid] + seq: the shuffle's (pid, seq) pair is
    frozen by the write, so the assignment is deterministic even though
    RangePartitioner samples boundaries nondeterministically.  Kernel
    passes then consume the explicit ``doc_id`` column (offsets=None
    mode) — correctness does not depend on read-back task alignment
    because the pack kernel doc-sorts per term and the decode tolerates
    overlapping block runs."""
    n_part = cfg.n_doc_partitions
    keyed = (source.repartitionByRange(n_part, *DOC_KEY_COLS)
             .sortWithinPartitions(*DOC_KEY_COLS))
    src_cols = source.columns

    tag_schema = T.StructType(
        [T.StructField("_pid", T.IntegerType()),
         T.StructField("_seq", T.LongType())]
        + [f for f in source.schema.fields])

    def tag(it: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        from pyspark import TaskContext
        pid = TaskContext.get().partitionId()
        seen = 0
        for pdf in it:
            n = len(pdf)
            out = pdf.copy()
            out.insert(0, "_seq", seen + np.arange(n, dtype=np.int64))
            out.insert(0, "_pid", np.full(n, pid, dtype=np.int32))
            seen += n
            yield out

    keyed.mapInPandas(tag, tag_schema) \
        .write.mode("overwrite").parquet(staging_path)

    staged = spark.read.parquet(staging_path)
    counts = (staged.groupBy("_pid").count().collect())
    sizes = {r["_pid"]: r["count"] for r in counts}
    offsets, acc = {}, base
    for pid in range(n_part):
        offsets[pid] = acc
        acc += sizes.get(pid, 0)
    off_df = spark.createDataFrame(
        [(int(p), int(o)) for p, o in offsets.items()],
        "_pid int, _off long")
    return (staged.join(F.broadcast(off_df), "_pid")
            .withColumn("doc_id", F.col("_off") + F.col("_seq"))
            .select("doc_id", *src_cols))




def _field_stats_of_docs(docs: DataFrame, keyword_fields, text_fields) \
        -> dict:
    """Per-field collection stats from the docs table: keyword fields
    (one length-1 value per doc with a NON-EMPTY value => sum_ttf ==
    doc_count, avgdl == 1) and analyzed text fields (doc_count over
    docs with >=1 emitted token, sum_ttf from the ``field_lengths``
    map).  The keyword predicate mirrors the posting-emission predicate
    in ``pack_blocks_df`` (which skips ``v == ""``), so manifest
    field_stats never drift from the actual postings on corpora with
    empty-string keyword values."""
    kw = tuple(keyword_fields or ())
    tf = tuple(text_fields or ())
    if not kw and not tf:
        return {}
    aggs = [F.sum(F.when(F.col(f).isNotNull() & (F.col(f) != ""), 1)
                  .otherwise(0)).alias(f"kw_{f}") for f in kw]
    for f in tf:
        v = F.element_at(F.col("field_lengths"), f)
        aggs.append(F.sum(F.when(v > 0, 1).otherwise(0)).alias(f"dc_{f}"))
        aggs.append(F.sum(F.coalesce(v, F.lit(0))).alias(f"ttf_{f}"))
    row = docs.agg(*aggs).collect()[0]
    out = {f: {"doc_count": int(row[f"kw_{f}"] or 0),
               "sum_total_term_freq": int(row[f"kw_{f}"] or 0)} for f in kw}
    for f in tf:
        out[f] = {"doc_count": int(row[f"dc_{f}"] or 0),
                  "sum_total_term_freq": int(row[f"ttf_{f}"] or 0)}
    return out


def docs_meta_df(keyed: DataFrame, offsets: dict[int, int] | None,
                 cfg: IndexConfig) -> DataFrame:
    """Tokenize + assign docIDs, emitting META ONLY (no term maps).
    ``offsets=None`` means ``keyed`` already carries an explicit
    ``doc_id`` column (the materialized-source mode).  sha256 is a JVM
    column expression (``F.sha2``), not Python — only tokenization runs
    in the Arrow kernel."""
    analyzer_name = cfg.analyzer
    text_fields = tuple(cfg.text_fields or ())
    explicit_ids = offsets is None
    withsha = keyed.withColumn(
        "_sha", F.sha2(F.coalesce(F.col("content"), F.lit("")), 256))

    def assign(it: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        from pyspark import TaskContext
        pid = TaskContext.get().partitionId()
        off = (offsets or {}).get(pid, 0)
        an = get_analyzer(analyzer_name)
        seen = 0
        for pdf in it:
            n = len(pdf)
            content = pdf["content"].fillna("")
            lengths = content.map(lambda c: len(an.tokens(c))) \
                .to_numpy(dtype=np.int64)
            ext = {f: pdf[f].fillna("").map(lambda c: len(an.tokens(c)))
                   .to_numpy(dtype=np.int64) for f in text_fields}
            if explicit_ids:
                ids = pdf["doc_id"].to_numpy(dtype=np.int64)
            else:
                ids = off + seen + np.arange(n, dtype=np.int64)
            yield pd.DataFrame({
                "doc_id": ids,
                "repo": pdf["repo"].values,
                "path": pdf["path"].values,
                "commit": pdf["commit"].values,
                "lang": pdf["lang"].values,
                "length": lengths,
                "norm_byte": int_to_byte4(lengths).astype(np.int32),
                "content_sha256": pdf["_sha"].values,
                "build_partition": np.full(n, pid, dtype=np.int32),
                "field_lengths": [
                    {f: int(ext[f][j]) for f in text_fields}
                    for j in range(n)],
            })
            seen += n

    return withsha.mapInPandas(assign, schema=DOCS_SCHEMA)


def pack_blocks_df(keyed: DataFrame, offsets: dict[int, int] | None,
                   cfg: IndexConfig,
                   exclude_buckets: set[int] | None = None,
                   flush_docs: int = 250_000,
                   emit_docs: bool = False) -> DataFrame:
    """Segment-local tokenize + posting-block pack — ZERO extra shuffle
    and no bulky intermediates: term frequencies are computed and packed
    inside the same kernel.  Each persisted range partition is a
    Lucene-style segment emitting doc-ordered block runs.

    ``emit_docs=True`` is the single-tokenize fused build: the same
    kernel ALSO emits one doc-meta row per document (kind='doc',
    bucket=-1) through :data:`FUSED_SCHEMA`, so the corpus is analyzed
    once total instead of once per stage.  sha256 stays a JVM column
    expression (computed before the kernel, passed through).  With the
    default ``emit_docs=False`` the output schema is exactly
    :data:`BLOCKS_SCHEMA` (backward-compatible)."""
    exclude = set(exclude_buckets or ())
    block_size = cfg.block_size
    exact_norms = cfg.norms_encoding == "exact32"
    want_positions = cfg.positions
    n_buckets = cfg.n_buckets
    analyzer_name = cfg.analyzer
    kw_fields = tuple(cfg.keyword_fields or ())
    text_fields = tuple(cfg.text_fields or ())
    # keyword postings carry the FIELD's norm: length 1 per value
    kw_norm = 1 if exact_norms else int(int_to_byte4(np.array([1]))[0])
    block_cols = [fld.name for fld in BLOCKS_SCHEMA.fields]
    fused_cols = [fld.name for fld in FUSED_SCHEMA.fields]
    doc_cols = fused_cols[len(block_cols) + 1:]  # after 'kind'

    def pack_group(doc_ids, norm_vals, tfs, tps):
        """Explode dicts -> term-major at C speed, then pack blocks."""
        from itertools import chain
        n_per_doc = np.fromiter((len(d) for d in tfs), dtype=np.int64,
                                count=len(tfs))
        total = int(n_per_doc.sum())
        if total == 0:
            return []
        t_term = list(chain.from_iterable(tfs))  # dict iteration = keys
        t_freq = np.fromiter(chain.from_iterable(d.values() for d in tfs),
                             dtype=np.int64, count=total)
        t_doc = np.repeat(np.asarray(doc_ids, dtype=np.int64), n_per_doc)
        t_norm = np.repeat(np.asarray(norm_vals, dtype=np.int64), n_per_doc)
        if want_positions:
            t_plist = [tp[k] for tp, d in zip(tps, tfs) for k in d]
        else:
            t_plist = None
        codes, uniques = pd.factorize(np.asarray(t_term, dtype=object),
                                      sort=True)
        order = np.lexsort((t_doc, codes))
        codes = codes[order]
        d_arr = t_doc[order]
        f_arr = t_freq[order]
        n_arr = t_norm[order]
        bounds = np.flatnonzero(np.diff(codes)) + 1
        starts = np.concatenate([[0], bounds])
        ends = np.concatenate([bounds, [len(codes)]])
        rows = []
        for gs, ge in zip(starts, ends):
            term = uniques[codes[gs]]
            bucket = bucket_of_term(term, n_buckets)
            if bucket in exclude:
                continue
            dids, freqs, nvals = d_arr[gs:ge], f_arr[gs:ge], n_arr[gs:ge]
            for seq, st in enumerate(range(0, len(dids), block_size)):
                d = dids[st:st + block_size]
                f = freqs[st:st + block_size]
                nv = nvals[st:st + block_size]
                if exact_norms:
                    lens = nv.astype(np.float64)
                    norm_buf = nv.astype("<u4").tobytes()
                    min_byte = 0
                else:
                    lens = LENGTH_TABLE[nv.astype(np.uint8)]
                    norm_buf = nv.astype(np.uint8).tobytes()
                    min_byte = int(nv[int(np.argmin(lens))])
                if want_positions:
                    idx = order[gs + st:gs + st + block_size]
                    deltas = np.concatenate([
                        np.diff(np.asarray(t_plist[j], dtype=np.int64),
                                prepend=0) for j in idx])
                    pos_buf = codecs.bitpack(deltas)
                else:
                    pos_buf = None
                rows.append((
                    str(term), seq, len(d), int(d[0]), int(d[-1]),
                    int(f.max()), int(lens.min()), min_byte, int(f.sum()),
                    codecs.encode_doc_gaps(d), codecs.encode_freqs(f),
                    norm_buf, pos_buf, bucket,
                ))
        return rows

    explicit_ids = offsets is None

    def pack_partition(it: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        from collections import Counter

        from pyspark import TaskContext
        pid = TaskContext.get().partitionId()
        off = (offsets or {}).get(pid, 0)
        an = get_analyzer(analyzer_name)
        seen = 0
        acc_docs, acc_norms, acc_tfs, acc_tps = [], [], [], []
        acc_kw: list[dict] = []
        # per-extra-text-field accumulators: norms/tfs/tps per doc
        acc_ext = {f: ([], [], []) for f in text_fields}
        n_acc = 0

        def flush():
            nonlocal acc_docs, acc_norms, acc_tfs, acc_tps, acc_kw, \
                acc_ext, n_acc
            rows = pack_group(acc_docs, acc_norms, acc_tfs, acc_tps)
            if kw_fields:
                kw_tps = ([{t: [0] for t in d} for d in acc_kw]
                          if want_positions else None)
                rows = rows + pack_group(
                    acc_docs, [kw_norm] * len(acc_docs), acc_kw, kw_tps)
            for f in text_fields:
                nrm, tfs, tps = acc_ext[f]
                rows = rows + pack_group(
                    acc_docs, nrm, tfs, tps if want_positions else None)
            acc_docs, acc_norms, acc_tfs, acc_tps = [], [], [], []
            acc_kw = []
            acc_ext = {f: ([], [], []) for f in text_fields}
            n_acc = 0
            out = pd.DataFrame(rows, columns=block_cols)
            if emit_docs:  # widen to the union schema (kind='block')
                out["kind"] = "block"
                for c in doc_cols:
                    out[c] = None
            return out

        for pdf in it:
            n = len(pdf)
            content = pdf["content"].fillna("")
            if want_positions:
                def pos_map(ps):
                    d: dict = {}
                    for t, p in ps:
                        d.setdefault(t, []).append(p)
                    return d

                twp = content.map(an.tokens_with_positions)
                toks = twp.map(lambda ps: [t for t, _ in ps])
                acc_tps.extend(twp.map(pos_map).tolist())
            else:
                toks = content.map(an.tokens)
            lengths = toks.map(len).to_numpy(dtype=np.int64)
            if exact_norms:
                acc_norms.extend(lengths.tolist())
            else:
                acc_norms.extend(int_to_byte4(lengths).tolist())
            acc_tfs.extend(toks.map(lambda ts: dict(Counter(ts))).tolist())
            if kw_fields:  # one freq-1 composite term per non-null value
                cols = {f: pdf[f].tolist() for f in kw_fields}
                for j in range(n):
                    d: dict = {}
                    for f in kw_fields:
                        v = cols[f][j]
                        if v is not None and v == v and v != "":
                            d[f"{f}{FIELD_SEP}{v}"] = 1
                    acc_kw.append(d)
            ext_lengths = {}
            for f in text_fields:
                # full per-field analysis: composite terms, the FIELD's
                # token count as the norm, field-local positions
                fcontent = pdf[f].fillna("")
                pre = f + FIELD_SEP
                if want_positions:
                    ftwp = fcontent.map(an.tokens_with_positions)

                    def fpos_map(ps):
                        d2: dict = {}
                        for t, p2 in ps:
                            d2.setdefault(pre + t, []).append(p2)
                        return d2

                    ftoks = ftwp.map(lambda ps: [t for t, _ in ps])
                    acc_ext[f][2].extend(ftwp.map(fpos_map).tolist())
                else:
                    ftoks = fcontent.map(an.tokens)
                flen = ftoks.map(len).to_numpy(dtype=np.int64)
                ext_lengths[f] = flen
                if exact_norms:
                    acc_ext[f][0].extend(flen.tolist())
                else:
                    acc_ext[f][0].extend(int_to_byte4(flen).tolist())
                acc_ext[f][1].extend(
                    ftoks.map(lambda ts: dict(
                        Counter(pre + t for t in ts))).tolist())
            if explicit_ids:
                ids = pdf["doc_id"].to_numpy(dtype=np.int64)
            else:
                ids = off + seen + np.arange(n, dtype=np.int64)
            acc_docs.extend(ids.tolist())
            if emit_docs:  # one doc-meta row per document, same analysis
                dm = pd.DataFrame({c: None for c in block_cols},
                                  index=np.arange(n))
                dm["bucket"] = -1
                dm["kind"] = "doc"
                dm["doc_id"] = ids
                for c in ("repo", "path", "commit", "lang"):
                    dm[c] = pdf[c].values
                dm["length"] = lengths
                dm["norm_byte"] = int_to_byte4(lengths).astype(np.int32)
                dm["content_sha256"] = pdf["_sha"].values
                dm["build_partition"] = np.full(n, pid, dtype=np.int32)
                dm["field_lengths"] = [
                    {f: int(ext_lengths[f][j]) for f in text_fields}
                    for j in range(n)]
                yield dm[fused_cols]
            seen += n
            n_acc += n
            if n_acc >= flush_docs:
                yield flush()
        if n_acc:
            yield flush()

    if emit_docs:
        withsha = keyed.withColumn(
            "_sha", F.sha2(F.coalesce(F.col("content"), F.lit("")), 256))
        return withsha.mapInPandas(pack_partition, FUSED_SCHEMA)
    return keyed.mapInPandas(pack_partition, BLOCKS_SCHEMA)


class IndexBuilder:
    def __init__(self, spark: SparkSession, index_dir: str,
                 config: IndexConfig | None = None):
        self.spark = spark
        self.dir = index_dir
        self.cfg = config or IndexConfig()
        self._keyed: DataFrame | None = None
        self._offsets: dict[int, int] | None = None

    # -- paths ------------------------------------------------------------
    def path(self, name: str) -> str:
        return os.path.join(self.dir, name)

    # -- checkpoints (FIXTURES.md §4) -------------------------------------
    # Checkpoint + lineage rows are DRIVER metadata (a handful of rows
    # per stage), written as plain parquet files via pyarrow directly —
    # the tables stay spark.read.parquet-compatible, but the write costs
    # ~1 ms instead of the 1.5-3 s a createDataFrame -> parquet Spark
    # job was measured to cost (Python-worker-backed single-row jobs;
    # six of them added ~11 s of pure overhead to a 20k-doc build).
    def _append_meta_parquet(self, dirname: str, table) -> None:
        import uuid

        import pyarrow.parquet as pq
        d = self.path(dirname)
        os.makedirs(d, exist_ok=True)
        final = os.path.join(d, f"part-{uuid.uuid4().hex}.parquet")
        tmp = final + ".inprogress"
        pq.write_table(table, tmp)
        os.replace(tmp, final)  # atomic visibility, like a job commit

    def _checkpoint_rows(self) -> pd.DataFrame:
        p = self.path("checkpoints")
        if not os.path.exists(p):
            return pd.DataFrame(columns=["partition_id", "stage", "status",
                                         "rows", "ts"])
        import pyarrow.parquet as pq
        files = [os.path.join(p, f) for f in sorted(os.listdir(p))
                 if f.endswith(".parquet")]
        if not files:
            return pd.DataFrame(columns=["partition_id", "stage", "status",
                                         "rows", "ts"])
        import pyarrow as pa
        cols = ["partition_id", "stage", "status", "rows"]
        return pa.concat_tables(
            [pq.read_table(f, columns=cols) for f in files]).to_pandas()

    def _write_checkpoints(self, rows: list[tuple[int, str, str, int]]):
        """One batched driver-side parquet append for any number of
        checkpoint rows."""
        from datetime import datetime, timezone

        import pyarrow as pa
        now = datetime.now(timezone.utc)
        self._append_meta_parquet("checkpoints", pa.table({
            "partition_id": pa.array([int(r[0]) for r in rows], pa.int32()),
            "stage": pa.array([r[1] for r in rows], pa.string()),
            "status": pa.array([r[2] for r in rows], pa.string()),
            "rows": pa.array([int(r[3]) for r in rows], pa.int64()),
            "ts": pa.array([now] * len(rows), pa.timestamp("us", tz="UTC")),
        }))

    def _write_lineage(self, rows: list[tuple], stage: str) -> None:
        """Per-partition lineage/metrics rows (docs/terms/postings/bytes),
        driver-side parquet append: (partition_id, docs, terms, postings,
        bytes) tuples; None = not applicable for the stage."""
        import pyarrow as pa
        self._append_meta_parquet("lineage_metrics", pa.table({
            "partition_id": pa.array([int(r[0]) for r in rows], pa.int32()),
            "docs": pa.array([r[1] for r in rows], pa.int64()),
            "terms": pa.array([r[2] for r in rows], pa.int64()),
            "postings": pa.array([r[3] for r in rows], pa.int64()),
            "bytes": pa.array([r[4] for r in rows], pa.int64()),
            "stage": pa.array([stage] * len(rows), pa.string()),
        }))

    def _write_checkpoint(self, partition_id: int, stage: str, status: str,
                          rows: int):
        self._write_checkpoints([(partition_id, stage, status, rows)])

    def _stage_done(self, stage: str, partition_id: int = -1) -> bool:
        cp = self._checkpoint_rows()
        hit = cp[(cp.stage == stage) & (cp.partition_id == partition_id)
                 & (cp.status == "done")]
        return len(hit) > 0

    def _write_json(self, name: str, obj: dict) -> None:
        with open(self.path(name), "w") as fh:
            json.dump(obj, fh)

    def _read_json(self, name: str) -> dict | None:
        p = self.path(name)
        if not os.path.exists(p):
            return None
        with open(p) as fh:
            return json.load(fh)

    def _keyed_offsets(self, source: DataFrame):
        if self._keyed is None:
            if self.cfg.source_mode == "materialize":
                self._keyed = materialize_keyed_source(
                    self.spark, source, self.cfg, self.path("keyed_source"))
                self._offsets = None
            else:
                self._keyed, self._offsets = range_partition(source, self.cfg)
        return self._keyed, self._offsets

    def _release(self):
        if self._keyed is not None:
            if self.cfg.source_mode == "materialize":
                import shutil
                shutil.rmtree(self.path("keyed_source"), ignore_errors=True)
            else:
                self._keyed.unpersist()
            self._keyed = None
            self._offsets = None

    # -- stage 1: docID assignment + tokenize -> meta ----------------------
    def build_docs(self, source: DataFrame) -> None:
        """Tokenize; assign deterministic dense docIDs; write meta."""
        if self._stage_done("docs"):
            return
        keyed, offsets = self._keyed_offsets(source)
        docs_meta_df(keyed, offsets, self.cfg) \
            .write.mode("overwrite").parquet(self.path("docs"))
        # one read-back job feeds lineage, the checkpoint count, AND the
        # collection stats consumed later by build_stats (no re-reads)
        lineage_rows = (self.spark.read.parquet(self.path("docs"))
                        .groupBy("build_partition")
                        .agg(F.count("*").alias("docs"),
                             F.sum("length").alias("postings"),
                             F.sum(F.when(F.col("length") > 0, 1)
                                   .otherwise(0)).alias("nonempty"))
                        .collect())
        n_docs = sum(r["docs"] for r in lineage_rows)
        self._write_json("docs_stats.json", {
            "n_docs": n_docs,
            "doc_count": int(sum(r["nonempty"] for r in lineage_rows)),
            "sum_total_term_freq": int(sum(r["postings"]
                                           for r in lineage_rows)),
        })
        self._write_lineage(
            [(int(r["build_partition"]), r["docs"], None, r["postings"], None)
             for r in lineage_rows], "docs")
        self._write_checkpoint(-1, "docs", "done", n_docs)

    # -- stage 2: posting blocks -------------------------------------------
    def _promote_staged_postings(self, buckets: set[int]) -> None:
        """Move staged bucket files into the live postings table and mark
        them done.  Idempotent under replay: os.rename removes a file
        from staging atomically, so a crashed move just continues."""
        staging = self.path("postings_staging")
        # fused builds stage blocks under kind=block/bucket=*
        fused_staging = os.path.join(staging, "kind=block")
        if os.path.isdir(fused_staging):
            staging = fused_staging
        final = self.path("postings")
        if os.path.exists(staging):
            for entry in sorted(os.listdir(staging)):
                src = os.path.join(staging, entry)
                if not (entry.startswith("bucket=") and os.path.isdir(src)):
                    continue
                dst = os.path.join(final, entry)
                os.makedirs(dst, exist_ok=True)
                for fn in os.listdir(src):
                    if fn.endswith(".parquet"):
                        os.replace(os.path.join(src, fn),
                                   os.path.join(dst, fn))
        cp = self._checkpoint_rows()
        already = set(cp[(cp.stage == "postings")
                         & (cp.status == "done")]["partition_id"])
        pending = sorted(b for b in buckets if b not in already)
        if pending:
            self._write_checkpoints(
                [(int(b), "postings", "done", -1) for b in pending])
        root = self.path("postings_staging")
        if os.path.exists(root):
            import shutil
            shutil.rmtree(root, ignore_errors=True)

    def build_postings(self, source: DataFrame) -> None:
        """Pack + commit posting blocks with a staged, resumable commit:
        blocks land in ``postings_staging`` first, a ``postings_staged``
        checkpoint records the durable intent, files are renamed into
        the live table, then per-bucket ``postings`` checkpoints commit.
        A driver failure at ANY point replays without duplicating rows
        (the raw re-append of the previous design doubled doc_freq if
        the crash hit between the parquet commit and the checkpoint)."""
        cfg = self.cfg
        cp = self._checkpoint_rows()
        done_buckets = set(
            cp[(cp.stage == "postings") & (cp.status == "done")]["partition_id"])
        staged_buckets = set(
            cp[(cp.stage == "postings_staged")
               & (cp.status == "done")]["partition_id"])
        pending = staged_buckets - done_buckets
        if pending:  # crashed between staging and commit: finish the move
            self._promote_staged_postings(pending)
            done_buckets |= pending
        elif os.path.exists(self.path("postings_staging")):
            import shutil  # crashed mid-staging-write: discard, redo
            shutil.rmtree(self.path("postings_staging"), ignore_errors=True)
        todo = [b for b in range(cfg.n_buckets) if b not in done_buckets]
        if not todo:
            return
        keyed, offsets = self._keyed_offsets(source)
        blocks = pack_blocks_df(keyed, offsets, cfg,
                                exclude_buckets=done_buckets)
        staging = self.path("postings_staging")
        blocks.write.mode("overwrite").partitionBy("bucket").parquet(staging)

        # ONE read-back agg over the staged files feeds lineage and the
        # per-bucket staged checkpoints
        if not any(fn.endswith(".parquet")
                   for _r, _d, fns in os.walk(staging) for fn in fns):
            # every remaining bucket holds no terms (sparse vocabulary /
            # empty corpus): checkpoint them done so resumes terminate
            self._write_checkpoints([
                (int(b), "postings_staged", "done", 0) for b in todo])
            self._write_checkpoints([
                (int(b), "postings", "done", 0) for b in todo])
            import shutil
            shutil.rmtree(staging, ignore_errors=True)
            return
        agg_rows = (self.spark.read.parquet(staging).groupBy("bucket")
                    .agg(F.count("*").alias("blocks"),
                         F.approx_count_distinct("term").alias("terms"),
                         F.sum("num_docs").alias("postings"),
                         F.sum(F.when(~F.col("term").contains(FIELD_SEP),
                                      F.col("num_docs")).otherwise(0))
                         .alias("content_postings"),
                         (F.sum(F.length("doc_gaps")) + F.sum(F.length("freqs"))
                          + F.sum(F.length("norms"))).alias("bytes"))
                    .collect())
        self._write_checkpoints([
            (int(r["bucket"]), "postings_staged", "done", r["blocks"])
            for r in agg_rows])
        self._write_lineage(
            [(int(r["bucket"]), None, r["terms"], r["postings"], r["bytes"])
             for r in agg_rows], "postings")
        # clean one-shot build (every bucket staged in this run): the
        # collection-level sum_doc_freq is just the sum of the per-bucket
        # postings counts — record it so build_stats skips its read-back
        # job.  Resumed/partial builds leave it absent (safe fallback).
        if not done_buckets:  # empty buckets contribute 0 — sum still total
            self._write_json("postings_stats.json", {
                "sum_doc_freq": int(sum(r["content_postings"]
                                        for r in agg_rows))})
        self._promote_staged_postings({int(r["bucket"]) for r in agg_rows})
        # buckets in this pass that produced NO blocks are still done --
        # without a checkpoint they are re-packed on every resume
        packed = {int(r["bucket"]) for r in agg_rows}
        empty = set(int(b) for b in todo) - packed
        if empty:
            self._write_checkpoints([
                (b, "postings_staged", "done", 0) for b in sorted(empty)])
            self._write_checkpoints([
                (b, "postings", "done", 0) for b in sorted(empty)])

    # -- stage 3: stats ------------------------------------------------------
    def build_stats(self) -> None:
        if self._stage_done("stats"):
            return
        blocks = self.spark.read.parquet(self.path("postings"))
        term_stats = (
            blocks.groupBy("bucket", "term")
            .agg(F.sum("num_docs").alias("doc_freq"),
                 F.sum("sum_freq").alias("total_term_freq"))
            # term-sorted files: parquet row-group min/max stats prune
            # the dictionary scan for prefix/range multi-term rewrites
            .sortWithinPartitions("term")
        )
        term_stats.write.mode("overwrite").partitionBy("bucket") \
            .parquet(self.path("term_stats"))

        ds = self._read_json("docs_stats.json")
        ps = self._read_json("postings_stats.json")
        if ds is None:  # older index layout: derive with jobs
            docs = self.spark.read.parquet(self.path("docs"))
            row = docs.agg(
                F.count("*").alias("n_docs"),
                F.sum(F.when(F.col("length") > 0, 1).otherwise(0))
                .alias("doc_count"),
                F.sum("length").alias("sum_total_term_freq")).collect()[0]
            ds = {"n_docs": int(row["n_docs"]),
                  "doc_count": int(row["doc_count"]),
                  "sum_total_term_freq": int(row["sum_total_term_freq"])}
        if ps is None:  # derived from term_stats (one tiny agg)
            ps = {"sum_doc_freq": int(
                self.spark.read.parquet(self.path("term_stats"))
                .filter(~F.col("term").contains(FIELD_SEP))
                .agg(F.sum("doc_freq")).collect()[0][0] or 0)}
            self._write_json("postings_stats.json", ps)
        stats = {**ds, "sum_doc_freq": int(ps["sum_doc_freq"])}
        field_stats = _field_stats_of_docs(
            self.spark.read.parquet(self.path("docs")),
            self.cfg.keyword_fields, self.cfg.text_fields)
        manifest = {
            "format_version": 1,
            "config": {
                "analyzer": self.cfg.analyzer, "k1": self.cfg.k1,
                "b": self.cfg.b,
                "similarity": self.cfg.similarity,
                "norms_encoding": self.cfg.norms_encoding,
                "n_buckets": self.cfg.n_buckets,
                "block_size": self.cfg.block_size,
                "positions": self.cfg.positions,
                "keyword_fields": list(self.cfg.keyword_fields),
                "text_fields": list(self.cfg.text_fields),
            },
            "collection_stats": stats,
            "field_stats": field_stats,
            # id high-water mark (max assigned + 1): the append /
            # addIndexes rebase base, preserved by reclaiming
            # compactions/merges where n_docs would under-count
            "next_doc_id": stats["n_docs"],
            "committed_at": time.time(),
        }
        with open(self.path("manifest.json"), "w") as fh:
            json.dump(manifest, fh, indent=2)
        self._write_checkpoint(-1, "stats", "done", stats["n_docs"])

    # -- fused single-tokenize build ----------------------------------------
    def build_fused(self, source: DataFrame) -> None:
        """docs + postings in ONE analysis pass: the pack kernel emits
        doc-meta rows alongside posting blocks (``FUSED_SCHEMA``), the
        union lands in staging partitioned by (kind, bucket), then the
        docs table is committed via a JVM-only column-pruned rewrite of
        the kind=doc slice and blocks are promoted as usual.  Tokenizing
        is the dominant build cost, so this nearly halves the wall clock
        vs the two-pass path; commit order (docs -> staged checkpoints ->
        promote -> postings checkpoints) preserves every resume invariant
        of the staged design."""
        cfg = self.cfg
        cp = self._checkpoint_rows()
        docs_done = self._stage_done("docs")
        done_buckets = set(
            cp[(cp.stage == "postings") & (cp.status == "done")]["partition_id"])
        staged_buckets = set(
            cp[(cp.stage == "postings_staged")
               & (cp.status == "done")]["partition_id"])
        pending = staged_buckets - done_buckets
        if pending and docs_done:
            # crashed between staging and commit: finish the move
            self._promote_staged_postings(pending)
            done_buckets |= pending
        elif os.path.exists(self.path("postings_staging")):
            import shutil  # crashed mid-staging-write: discard, redo
            shutil.rmtree(self.path("postings_staging"), ignore_errors=True)
        todo = [b for b in range(cfg.n_buckets) if b not in done_buckets]
        if docs_done and not todo:
            return
        if not todo:  # old-layout resume: docs remain, blocks all done
            self.build_docs(source)
            return

        keyed, offsets = self._keyed_offsets(source)
        fused = pack_blocks_df(keyed, offsets, cfg,
                               exclude_buckets=done_buckets,
                               emit_docs=not docs_done)
        staging = self.path("postings_staging")
        # blocks-only resume output has no 'kind' column (BLOCKS_SCHEMA)
        part_cols = ["kind", "bucket"] if not docs_done else ["bucket"]
        fused.write.mode("overwrite").partitionBy(*part_cols).parquet(staging)

        if not docs_done:
            # commit docs first (column-pruned JVM rewrite, no Python)
            doc_cols = [fld.name for fld in DOCS_SCHEMA.fields]
            staged_docs = self.spark.read.parquet(
                os.path.join(staging, "kind=doc"))
            staged_docs.select(*doc_cols) \
                .write.mode("overwrite").parquet(self.path("docs"))
            lineage_rows = (self.spark.read.parquet(self.path("docs"))
                            .groupBy("build_partition")
                            .agg(F.count("*").alias("docs"),
                                 F.sum("length").alias("postings"),
                                 F.sum(F.when(F.col("length") > 0, 1)
                                       .otherwise(0)).alias("nonempty"))
                            .collect())
            n_docs = sum(r["docs"] for r in lineage_rows)
            self._write_json("docs_stats.json", {
                "n_docs": n_docs,
                "doc_count": int(sum(r["nonempty"] for r in lineage_rows)),
                "sum_total_term_freq": int(sum(r["postings"]
                                               for r in lineage_rows)),
            })
            self._write_lineage(
                [(int(r["build_partition"]), r["docs"], None,
                  r["postings"], None) for r in lineage_rows], "docs")
            self._write_checkpoint(-1, "docs", "done", n_docs)

        block_staging = os.path.join(staging, "kind=block") \
            if not docs_done else staging
        has_blocks = os.path.isdir(block_staging) and any(
            fn.endswith(".parquet")
            for _r, _d, fns in os.walk(block_staging) for fn in fns)
        if not has_blocks:
            # no blocks produced — empty corpus, or a resume where every
            # remaining bucket legitimately holds no terms (sparse
            # vocabulary): checkpoint those buckets as done (0 blocks)
            # so the next resume doesn't re-pack forever
            if todo:
                self._write_checkpoints([
                    (int(b), "postings_staged", "done", 0) for b in todo])
                self._write_checkpoints([
                    (int(b), "postings", "done", 0) for b in todo])
            import shutil
            shutil.rmtree(staging, ignore_errors=True)
            return
        agg_rows = (self.spark.read.parquet(block_staging).groupBy("bucket")
                    .agg(F.count("*").alias("blocks"),
                         F.approx_count_distinct("term").alias("terms"),
                         F.sum("num_docs").alias("postings"),
                         F.sum(F.when(~F.col("term").contains(FIELD_SEP),
                                      F.col("num_docs")).otherwise(0))
                         .alias("content_postings"),
                         (F.sum(F.length("doc_gaps")) + F.sum(F.length("freqs"))
                          + F.sum(F.length("norms"))).alias("bytes"))
                    .collect())
        self._write_checkpoints([
            (int(r["bucket"]), "postings_staged", "done", r["blocks"])
            for r in agg_rows])
        self._write_lineage(
            [(int(r["bucket"]), None, r["terms"], r["postings"], r["bytes"])
             for r in agg_rows], "postings")
        if not done_buckets:  # clean one-shot build: record sum_doc_freq
            self._write_json("postings_stats.json", {
                "sum_doc_freq": int(sum(r["content_postings"]
                                        for r in agg_rows))})
        self._promote_staged_postings({int(r["bucket"]) for r in agg_rows})
        # buckets in this pass that produced NO blocks are still done --
        # without a checkpoint they are re-packed on every resume
        packed = {int(r["bucket"]) for r in agg_rows}
        empty = set(int(b) for b in todo) - packed
        if empty:
            self._write_checkpoints([
                (b, "postings_staged", "done", 0) for b in sorted(empty)])
            self._write_checkpoints([
                (b, "postings", "done", 0) for b in sorted(empty)])

    # -- orchestration -------------------------------------------------------
    def build(self, source: DataFrame) -> None:
        os.makedirs(self.dir, exist_ok=True)
        try:
            self.build_fused(source)
            self.build_stats()
        finally:
            self._release()


def build_index(spark: SparkSession, source: DataFrame, index_dir: str,
                config: IndexConfig | None = None) -> "IndexBuilder":
    b = IndexBuilder(spark, index_dir, config)
    b.build(source)
    return b
