"""Driver contract for the spark-graft builder (PySpark target).

``queries()`` exposes the engine's operator surface over the driver's
parquet tables (``documents`` / ``embeddings`` / ``events``), each with
a DuckDB-runnable ``oracle_sql()`` twin.  The full-text entries run the
REAL engine — they build the block-packed inverted index over
``documents`` (cached per sf_dir) and execute through
``lucene_1_spark.search.IndexSearcher``; the index uses the
``whitespace`` analyzer + ``bm25_double`` similarity so the scores are
reproducible by ANSI-SQL doubles (the Lucene-exact float32 +
SmallFloat-quantized mode is validated separately by
``tests/test_index_and_search.py`` against a brute-force oracle).

Column-name and arithmetic parity rules used throughout:
- every computed column aliased identically on both sides;
- doubles rounded (4 decimals for BM25, 6 for ratios/cosines) AFTER
  identical double-precision formulas;
- hashes are md5-prefix integers (portable: ``F.conv(substring(md5))``
  == DuckDB ``('0x'||substr(md5(x),1,12))::BIGINT``).
"""

from __future__ import annotations

import hashlib
import os
import tempfile
from collections.abc import Callable

from pyspark.sql import DataFrame, SparkSession, functions as F, Window as W

K1, B = 1.2, 0.75

# ---------------------------------------------------------------------------
# helpers
# ---------------------------------------------------------------------------

def _docs(spark: SparkSession, sf_dir: str) -> DataFrame:
    return spark.read.parquet(os.path.join(sf_dir, "documents.parquet"))


def _emb(spark: SparkSession, sf_dir: str) -> DataFrame:
    return spark.read.parquet(os.path.join(sf_dir, "embeddings.parquet"))


def _docs2(spark: SparkSession, sf_dir: str) -> DataFrame:
    """documents unioned with a doc_id-shifted copy — guarantees known
    duplicate pairs so dedup operators are genuinely exercised."""
    d = _docs(spark, sf_dir).select("doc_id", "text")
    return d.unionByName(d.select((F.col("doc_id") + 1_000_000).alias("doc_id"),
                                  "text"))


_SEARCHERS: dict[str, object] = {}


def _searcher(spark: SparkSession, sf_dir: str):
    """Build (once per sf_dir) the inverted index over ``documents`` and
    return an IndexSearcher.  repo/commit are constants and
    path=lpad(doc_id) so the engine's lexicographic docID order equals
    the original doc_id order (tie-break parity with ORDER BY doc_id)."""
    from lucene_1_spark.index import IndexReader, build_index
    from lucene_1_spark.index.builder import IndexConfig
    from lucene_1_spark.search import IndexSearcher

    key = os.path.abspath(sf_dir)
    if key in _SEARCHERS:
        return _SEARCHERS[key]
    idx_dir = os.path.join(
        tempfile.gettempdir(), "l1s_driver_idx_v4",
        hashlib.md5(key.encode()).hexdigest()[:12])
    corpus = _docs(spark, sf_dir).select(
        F.lit("docs").alias("repo"),
        F.lpad(F.col("doc_id").cast("string"), 12, "0").alias("path"),
        F.lit("c0").alias("commit"),
        F.col("lang"),
        F.coalesce(F.col("text"), F.lit("")).alias("content"),
        # second ANALYZED text field: the document head (first 80 chars)
        F.substring(F.coalesce(F.col("text"), F.lit("")), 1, 80)
        .alias("head"),
    )
    cfg = IndexConfig(analyzer="whitespace", similarity="bm25_double",
                      n_buckets=8, n_doc_partitions=8, positions=True,
                      keyword_fields=("lang",), text_fields=("head",))
    build_index(spark, corpus, idx_dir, cfg)   # resumes if already built
    s = IndexSearcher(IndexReader(spark, idx_dir))
    _SEARCHERS[key] = s
    return s


_CLASSIC_SEARCHERS: dict[str, object] = {}


def _classic_searcher(spark: SparkSession, sf_dir: str):
    """A second index over ``documents`` built with the
    ClassicSimilarity (TF-IDF) — the pluggable-Similarity extension
    point exercised end-to-end (cached per sf_dir)."""
    from lucene_1_spark.index import IndexReader, build_index
    from lucene_1_spark.index.builder import IndexConfig
    from lucene_1_spark.search import IndexSearcher

    key = os.path.abspath(sf_dir)
    if key in _CLASSIC_SEARCHERS:
        return _CLASSIC_SEARCHERS[key]
    idx_dir = os.path.join(
        tempfile.gettempdir(), "l1s_driver_classic_v1",
        hashlib.md5(key.encode()).hexdigest()[:12])
    corpus = _docs(spark, sf_dir).select(
        F.lit("docs").alias("repo"),
        F.lpad(F.col("doc_id").cast("string"), 12, "0").alias("path"),
        F.lit("c0").alias("commit"),
        F.col("lang"),
        F.coalesce(F.col("text"), F.lit("")).alias("content"),
    )
    cfg = IndexConfig(analyzer="whitespace", similarity="classic_double",
                      n_buckets=8, n_doc_partitions=8)
    build_index(spark, corpus, idx_dir, cfg)
    s = IndexSearcher(IndexReader(spark, idx_dir))
    _CLASSIC_SEARCHERS[key] = s
    return s


_LMD_SEARCHERS: dict[str, object] = {}
_PHON_SEARCHERS: dict[str, object] = {}


def _lmd_searcher(spark: SparkSession, sf_dir: str, similarity: str):
    """One extra index built with lm_dirichlet_double, served under any
    requested double similarity via the searcher-level override (the
    ``IndexSearcher.setSimilarity`` analog — all double similarities
    share exact32 norms, so one index feeds both the LMDirichlet and
    the BooleanSimilarity entries).  Cached per (sf_dir, similarity)."""
    from lucene_1_spark.index import IndexReader, build_index
    from lucene_1_spark.index.builder import IndexConfig
    from lucene_1_spark.search import IndexSearcher

    key = (os.path.abspath(sf_dir), similarity)
    if key in _LMD_SEARCHERS:
        return _LMD_SEARCHERS[key]
    idx_dir = os.path.join(
        tempfile.gettempdir(), "l1s_driver_lmd_v1",
        hashlib.md5(key[0].encode()).hexdigest()[:12])
    corpus = _docs(spark, sf_dir).select(
        F.lit("docs").alias("repo"),
        F.lpad(F.col("doc_id").cast("string"), 12, "0").alias("path"),
        F.lit("c0").alias("commit"),
        F.col("lang"),
        F.coalesce(F.col("text"), F.lit("")).alias("content"),
    )
    cfg = IndexConfig(analyzer="whitespace",
                      similarity="lm_dirichlet_double",
                      n_buckets=8, n_doc_partitions=8)
    build_index(spark, corpus, idx_dir, cfg)
    s = IndexSearcher(IndexReader(spark, idx_dir), similarity=similarity)
    _LMD_SEARCHERS[key] = s
    return s


_MUT_SEARCHERS: dict[str, object] = {}


def _mut_searcher(spark: SparkSession, sf_dir: str):
    """The mutable-index scenario (IndexWriter.java:1837 semantics):
    bootstrap over ``documents``, update_documents() every doc with
    doc_id % 10 == 3 (text + ' graftmarker'), delete_by_term('window'),
    then compact (SegmentMerger analog) so stats are exact.  Cached per
    sf_dir; a MUTATION_DONE marker makes cross-process reuse safe."""
    import shutil

    from lucene_1_spark.index import IndexReader
    from lucene_1_spark.index.builder import IndexConfig
    from lucene_1_spark.search import IndexSearcher
    from lucene_1_spark.streaming.incremental import IncrementalIndexWriter

    key = os.path.abspath(sf_dir)
    if key in _MUT_SEARCHERS:
        return _MUT_SEARCHERS[key]
    idx_dir = os.path.join(
        tempfile.gettempdir(), "l1s_driver_mut_v2",
        hashlib.md5(key.encode()).hexdigest()[:12])
    marker = os.path.join(idx_dir, "MUTATION_DONE")
    if not os.path.exists(marker):
        shutil.rmtree(idx_dir, ignore_errors=True)
        corpus = _docs(spark, sf_dir).select(
            F.lit("docs").alias("repo"),
            F.lpad(F.col("doc_id").cast("string"), 12, "0").alias("path"),
            F.lit("c0").alias("commit"),
            F.col("lang"),
            F.coalesce(F.col("text"), F.lit("")).alias("content"),
        )
        cfg = IndexConfig(analyzer="whitespace", similarity="bm25_double",
                          n_buckets=8, n_doc_partitions=8)
        w = IncrementalIndexWriter(spark, idx_dir, cfg)
        w.append(corpus)
        updated = (corpus
                   .filter(F.pmod(F.col("path").cast("bigint"), F.lit(10)) == 3)
                   .withColumn("content", F.concat(F.col("content"),
                                                   F.lit(" graftmarker"))))
        w.update_documents(updated)
        w.delete_by_term("window")
        w.compact()
        with open(marker, "w") as fh:
            fh.write("ok")
    s = IndexSearcher(IndexReader(spark, idx_dir))
    _MUT_SEARCHERS[key] = s
    return s


def _mut_topk(spark, sf_dir, qtext: str, k: int = 10) -> DataFrame:
    se = _mut_searcher(spark, sf_dir)
    top = se.search_df(qtext, k=k).withColumn(
        "rank", F.row_number().over(
            W.orderBy(F.desc("score"), F.asc("doc_id"))).cast("long"))
    docs = se.reader.docs().select(
        "doc_id", F.col("path").cast("bigint").alias("orig_id"))
    return (top.join(docs, "doc_id")
            .select(F.col("orig_id").alias("doc_id"),
                    F.round("score", 4).alias("score"), "rank"))


# oracle twin of the mutated corpus: updated text, minus docs whose
# (updated) text contains 'window'.  Engine tie-break reproduced: the
# re-added updated docs sort AFTER all originals (new docIDs in a later
# segment), each group in original-id order.
_MUT_CTES = """corpus AS (
  SELECT doc_id,
         CASE WHEN doc_id % 10 = 3
              THEN coalesce(text, '') || ' graftmarker'
              ELSE text END AS text
  FROM documents),
toks0 AS (
  SELECT doc_id, term FROM (
    SELECT doc_id, lower(unnest(string_split_regex(trim(text), '\\s+'))) AS term
    FROM corpus WHERE text IS NOT NULL AND trim(text) <> ''
  ) WHERE term <> ''),
toks AS (
  SELECT * FROM toks0 WHERE doc_id NOT IN
    (SELECT DISTINCT doc_id FROM toks0 WHERE term = 'window')),
tf AS (SELECT doc_id, term, count(*)::DOUBLE AS freq FROM toks GROUP BY 1, 2),
dl AS (SELECT doc_id, count(*)::DOUBLE AS len FROM toks GROUP BY 1),
st AS (SELECT count(*)::DOUBLE AS n, sum(len)::DOUBLE AS tot FROM dl),
df AS (SELECT term, count(*)::DOUBLE AS dfreq FROM tf GROUP BY 1)"""


def _mut_bm25_sql(terms: list[str], k: int = 10) -> str:
    tl = ", ".join(f"'{t}'" for t in terms)
    return f"""
WITH {_MUT_CTES},
sc AS (
  SELECT tf.doc_id, sum({_score_expr()}) AS s
  FROM tf
  JOIN dl ON tf.doc_id = dl.doc_id
  JOIN df ON tf.term = df.term
  CROSS JOIN st
  WHERE tf.term IN ({tl})
  GROUP BY tf.doc_id
)
SELECT doc_id, round(s, 4) AS score, rank FROM (
  SELECT doc_id, s,
         row_number() OVER (
           ORDER BY s DESC,
                    (CASE WHEN doc_id % 10 = 3 THEN 1 ELSE 0 END) ASC,
                    doc_id ASC) AS rank
  FROM sc
) WHERE rank <= {k}
"""


_MERGE_SEARCHERS: dict[str, object] = {}


def _merge_searcher(spark: SparkSession, sf_dir: str):
    """The tiered-merge scenario (TieredMergePolicy +
    ``index/SegmentMerger.java:113-244``): the corpus arrives as THREE
    appended segments (doc_id % 3 == 1, then 2, then 0 — so engine
    docID order is the batch order), 'window' docs are deleted, and
    ``merge_segments`` merges every segment into one — reclaiming the
    tombstones segment-locally (O(merged bytes), no forceMerge-style
    full rewrite API used).  Stats are then exact, so a plain BM25
    oracle over the live corpus reproduces the scores."""
    import shutil

    from lucene_1_spark.index import IndexReader
    from lucene_1_spark.index.builder import IndexConfig
    from lucene_1_spark.index.maintenance import segment_sizes
    from lucene_1_spark.search import IndexSearcher
    from lucene_1_spark.streaming.incremental import IncrementalIndexWriter

    key = os.path.abspath(sf_dir)
    if key in _MERGE_SEARCHERS:
        return _MERGE_SEARCHERS[key]
    idx_dir = os.path.join(
        tempfile.gettempdir(), "l1s_driver_merge_v1",
        hashlib.md5(key.encode()).hexdigest()[:12])
    marker = os.path.join(idx_dir, "MERGE_DONE")
    if not os.path.exists(marker):
        shutil.rmtree(idx_dir, ignore_errors=True)
        corpus = _docs(spark, sf_dir).select(
            F.lit("docs").alias("repo"),
            F.lpad(F.col("doc_id").cast("string"), 12, "0").alias("path"),
            F.lit("c0").alias("commit"),
            F.col("lang"),
            F.coalesce(F.col("text"), F.lit("")).alias("content"),
            F.pmod(F.col("doc_id"), F.lit(3)).alias("_m"),
        )
        cfg = IndexConfig(analyzer="whitespace", similarity="bm25_double",
                          n_buckets=8, n_doc_partitions=8)
        w = IncrementalIndexWriter(spark, idx_dir, cfg)
        for i, mod in enumerate((1, 2, 0)):
            w.append(corpus.filter(F.col("_m") == mod).drop("_m"),
                     batch_id=i)
        w.delete_by_term("window")
        out = w.merge(segments=sorted(segment_sizes(idx_dir)))
        assert out is not None and out["remaining_tombstones"] == 0
        with open(marker, "w") as fh:
            fh.write("ok")
    s = IndexSearcher(IndexReader(spark, idx_dir))
    _MERGE_SEARCHERS[key] = s
    return s


_ADDIDX_SEARCHERS: dict[str, object] = {}


def _addidx_searcher(spark: SparkSession, sf_dir: str):
    """The addIndexes scenario (``index/IndexWriter.java:2931``): two
    shard indexes built INDEPENDENTLY over doc_id %% 2 == 0 / 1, then
    composed with ``add_indexes`` (docID rebase only, no re-analysis)
    — the build-shards-in-parallel-then-combine path.  Engine docID
    order is shard order (evens in doc_id order, then odds)."""
    import shutil

    from lucene_1_spark.index import IndexReader, build_index
    from lucene_1_spark.index.builder import IndexConfig
    from lucene_1_spark.search import IndexSearcher
    from lucene_1_spark.streaming.incremental import IncrementalIndexWriter

    key = os.path.abspath(sf_dir)
    if key in _ADDIDX_SEARCHERS:
        return _ADDIDX_SEARCHERS[key]
    root = os.path.join(
        tempfile.gettempdir(), "l1s_driver_addidx_v1",
        hashlib.md5(key.encode()).hexdigest()[:12])
    dest = os.path.join(root, "dest")
    marker = os.path.join(dest, "ADDIDX_DONE")
    if not os.path.exists(marker):
        shutil.rmtree(root, ignore_errors=True)
        corpus = _docs(spark, sf_dir).select(
            F.lit("docs").alias("repo"),
            F.lpad(F.col("doc_id").cast("string"), 12, "0").alias("path"),
            F.lit("c0").alias("commit"),
            F.col("lang"),
            F.coalesce(F.col("text"), F.lit("")).alias("content"),
            F.pmod(F.col("doc_id"), F.lit(2)).alias("_m"),
        )
        cfg = IndexConfig(analyzer="whitespace", similarity="bm25_double",
                          n_buckets=8, n_doc_partitions=4)
        other = os.path.join(root, "shard1")
        build_index(spark, corpus.filter(F.col("_m") == 0).drop("_m"),
                    dest, cfg)
        build_index(spark, corpus.filter(F.col("_m") == 1).drop("_m"),
                    other, cfg)
        IncrementalIndexWriter(spark, dest, cfg).add_indexes([other])
        with open(marker, "w") as fh:
            fh.write("ok")
    s = IndexSearcher(IndexReader(spark, dest))
    _ADDIDX_SEARCHERS[key] = s
    return s


def _merge_topk(spark, sf_dir, qtext: str, k: int = 10) -> DataFrame:
    se = _merge_searcher(spark, sf_dir)
    top = se.search_df(qtext, k=k).withColumn(
        "rank", F.row_number().over(
            W.orderBy(F.desc("score"), F.asc("doc_id"))).cast("long"))
    docs = se.reader.docs().select(
        "doc_id", F.col("path").cast("bigint").alias("orig_id"))
    return (top.join(docs, "doc_id")
            .select(F.col("orig_id").alias("doc_id"),
                    F.round("score", 4).alias("score"), "rank"))


def _merge_bm25_sql(terms: list[str], k: int = 10) -> str:
    """Oracle twin of the merged index: live docs = those whose text
    lacks the 'window' token; engine docID order is batch order
    (doc_id % 3 == 1, then 2, then 0), each batch in doc_id order."""
    tl = ", ".join(f"'{t}'" for t in terms)
    return f"""
WITH toks0 AS (
  SELECT doc_id, term FROM (
    SELECT doc_id, lower(unnest(string_split_regex(trim(text), '\\s+'))) AS term
    FROM documents WHERE text IS NOT NULL AND trim(text) <> ''
  ) WHERE term <> ''),
toks AS (
  SELECT * FROM toks0 WHERE doc_id NOT IN
    (SELECT DISTINCT doc_id FROM toks0 WHERE term = 'window')),
tf AS (SELECT doc_id, term, count(*)::DOUBLE AS freq FROM toks GROUP BY 1, 2),
dl AS (SELECT doc_id, count(*)::DOUBLE AS len FROM toks GROUP BY 1),
st AS (SELECT count(*)::DOUBLE AS n, sum(len)::DOUBLE AS tot FROM dl),
df AS (SELECT term, count(*)::DOUBLE AS dfreq FROM tf GROUP BY 1),
sc AS (
  SELECT tf.doc_id, sum({_score_expr()}) AS s
  FROM tf
  JOIN dl ON tf.doc_id = dl.doc_id
  JOIN df ON tf.term = df.term
  CROSS JOIN st
  WHERE tf.term IN ({tl})
  GROUP BY tf.doc_id
)
SELECT doc_id, round(s, 4) AS score, rank FROM (
  SELECT doc_id, s,
         row_number() OVER (
           ORDER BY s DESC,
                    (CASE doc_id % 3 WHEN 1 THEN 0
                          WHEN 2 THEN 1 ELSE 2 END) ASC,
                    doc_id ASC) AS rank
  FROM sc
) WHERE rank <= {k}
"""


def _orig_id(df: DataFrame, searcher) -> DataFrame:
    """Map engine doc_ids back to the original ``documents.doc_id``
    (stored-field retrieval: join the docs table, parse the path)."""
    docs = searcher.reader.docs().select(
        "doc_id", F.col("path").cast("bigint").alias("orig_id"), "lang")
    return df.join(docs, "doc_id")


def _topk(spark, sf_dir, qtext: str, k: int = 10) -> DataFrame:
    s = _searcher(spark, sf_dir)
    top = s.search_df(qtext, k=k)
    ranked = top.withColumn(
        "rank", F.row_number().over(
            W.orderBy(F.desc("score"), F.asc("doc_id"))).cast("long"))
    return (_orig_id(ranked, s)
            .select(F.col("orig_id").alias("doc_id"),
                    F.round("score", 4).alias("score"), "rank"))


def _all_matches(spark, sf_dir, qtext: str) -> DataFrame:
    s = _searcher(spark, sf_dir)
    return _orig_id(s.search_df(qtext, k=None), s)


def _topk_query(spark, sf_dir, query, k: int = 10) -> DataFrame:
    """Top-k for a Query object, ranked and mapped to original doc ids."""
    se = _searcher(spark, sf_dir)
    top = se.search_df(query, k=k).withColumn(
        "rank", F.row_number().over(
            W.orderBy(F.desc("score"), F.asc("doc_id"))).cast("long"))
    return (_orig_id(top, se)
            .select(F.col("orig_id").alias("doc_id"),
                    F.round("score", 4).alias("score"), "rank"))


# shared oracle CTE: whitespace-tokenized lowercase terms
_TOKS = """toks AS (
  SELECT doc_id, term FROM (
    SELECT doc_id, lower(unnest(string_split_regex(trim(text), '\\s+'))) AS term
    FROM documents WHERE text IS NOT NULL AND trim(text) <> ''
  ) WHERE term <> ''
)"""

_BM25_CTES = _TOKS + """,
tf AS (SELECT doc_id, term, count(*)::DOUBLE AS freq FROM toks GROUP BY 1, 2),
dl AS (SELECT doc_id, count(*)::DOUBLE AS len FROM toks GROUP BY 1),
st AS (SELECT count(*)::DOUBLE AS n, sum(len)::DOUBLE AS tot FROM dl),
df AS (SELECT term, count(*)::DOUBLE AS dfreq FROM tf GROUP BY 1)"""


def _score_expr(k1: float = K1, b: float = B) -> str:
    return (f"ln(1 + (st.n - df.dfreq + 0.5) / (df.dfreq + 0.5)) * tf.freq"
            f" / (tf.freq + {k1} * (1 - {b} + {b} * dl.len / (st.tot / st.n)))")


def _bm25_sql(terms: list[str] | None, extra_having: str = "",
              exclude_term: str | None = None, k: int = 10,
              rank_lo: int = 1, term_pred: str | None = None,
              require_term: str | None = None,
              weight_factor: str = "1.0") -> str:
    """BM25 top-k oracle.  ``term_pred`` (SQL over ``tf.term``) replaces
    the IN-list for multi-term expansions; ``require_term`` adds a
    non-scoring FILTER (doc must contain it); ``weight_factor`` scales
    each term's contribution (fuzzy similarity boosts)."""
    pred = term_pred or ("tf.term IN ("
                         + ", ".join(f"'{t}'" for t in terms) + ")")
    excl = (f"AND tf.doc_id NOT IN (SELECT doc_id FROM toks WHERE term = "
            f"'{exclude_term}')" if exclude_term else "")
    req = (f"AND tf.doc_id IN (SELECT doc_id FROM toks WHERE term = "
           f"'{require_term}')" if require_term else "")
    having = f"HAVING {extra_having}" if extra_having else ""
    return f"""
WITH {_BM25_CTES},
sc AS (
  SELECT tf.doc_id, sum(({weight_factor}) * {_score_expr()}) AS s
  FROM tf
  JOIN dl ON tf.doc_id = dl.doc_id
  JOIN df ON tf.term = df.term
  CROSS JOIN st
  WHERE ({pred}) {excl} {req}
  GROUP BY tf.doc_id
  {having}
)
SELECT doc_id, round(s, 4) AS score, rank FROM (
  SELECT doc_id, s, row_number() OVER (ORDER BY s DESC, doc_id ASC) AS rank
  FROM sc
) WHERE rank BETWEEN {rank_lo} AND {rank_lo + k - 1}
"""


_SHINGLE_CTES = """docs2 AS (
  SELECT doc_id, text FROM documents
  UNION ALL
  SELECT doc_id + 1000000 AS doc_id, text FROM documents
),
ordered AS (
  SELECT doc_id, tok, ord FROM (
    SELECT doc_id,
           unnest(list_filter(string_split_regex(lower(text), '\\s+'),
                              x -> x <> '')) AS tok,
           generate_subscripts(list_filter(string_split_regex(lower(text), '\\s+'),
                                           x -> x <> ''), 1) AS ord
    FROM docs2 WHERE text IS NOT NULL
  )
),
sh AS (
  SELECT DISTINCT doc_id, tok || ' ' || t2 || ' ' || t3 AS shingle FROM (
    SELECT doc_id, tok,
           lead(tok, 1) OVER (PARTITION BY doc_id ORDER BY ord) AS t2,
           lead(tok, 2) OVER (PARTITION BY doc_id ORDER BY ord) AS t3
    FROM ordered)
  WHERE t2 IS NOT NULL AND t3 IS NOT NULL
)"""


def _minhash_cols_sql(num_perm: int = 8) -> str:
    prime = 281474976710597
    cols = []
    for i in range(num_perm):
        a_i = 2 * i + 1
        b_i = 0x9E3779B9 * (i + 1) & ((1 << 32) - 1)
        cols.append(
            f"min((('0x' || substr(md5(shingle), 1, 12))::BIGINT * {a_i}"
            f" + {b_i}) % {prime}) AS m{i}")
    return ", ".join(cols)


# deterministic CJK-ified corpus: lowercase letters of the first 60
# chars map 1:1 onto 26 Han codepoints (U+4E00..U+4E19), everything
# else becomes a space — reproducible in ANSI SQL with the same
# translate/regexp_replace, so the CJK bigram analyzer's postings have
# an exact DuckDB twin
_HAN26 = "".join(chr(0x4E00 + i) for i in range(26))

_CJK_SEARCHERS: dict[str, object] = {}

# deterministic Cyrillic-ified corpus: a-z maps 1:1 onto 26 Russian
# letters so the russian analyzer chain (stop filter + light stemmer)
# has an exact DuckDB twin (stop list inlined, stemmer generated as a
# longest-suffix CASE chain)
_RU26 = "абвгдежзиклмнопрстуфхцчшыю"
_RU_TRANS = str.maketrans("abcdefghijklmnopqrstuvwxyz", _RU26)

# deterministic Arabic-ified corpus: the mapping is chosen so real
# chain stages fire (w->و = the conjunction prefix, "…an"->…ان a
# strippable suffix, y->ة exercising ta-marbuta normalization)
_AR26 = "ابتدحفغخيزكلمنعصقرسطذضوشةج"
_AR_TRANS = str.maketrans("abcdefghijklmnopqrstuvwxyz", _AR26)

# deterministic Bulgarian-ified corpus (natural transliteration): the
# bulgarian chain's multi-STAGE stemmer (article -> plural with к/г/х
# alternations -> final vowels -> ен -> fleeting ъ, Savoy BUIR /
# BulgarianStemmer.java:33-170) gets an exact DuckDB twin built as one
# staged CASE pipeline; common English endings map onto real rules
# (-te -> -те article strip, final -a/-e -> vowel strip)
_BG26 = "абцдефгхийклмнопчрстувшжяз"
_BG_TRANS = str.maketrans("abcdefghijklmnopqrstuvwxyz", _BG26)

# deterministic Latvian-ified corpus (mostly-identity mapping into the
# Latvian alphabet, chosen so real chain stages fire: h->i makes
# 'the'->'tie' a genuine stop word and 'hash'->'iaši' exercises
# suffix-strip + š->s unpalatalization; w->ū / y->ī give strippable
# vowel endings; 'stream'->'štream' fires the two-char 'am' strip)
_LV26 = "abcdefgiijklmnopķrštuvūļīž"
_LV_TRANS = str.maketrans("abcdefghijklmnopqrstuvwxyz", _LV26)


def _cjk_searcher(spark: SparkSession, sf_dir: str):
    """Index the CJK-ified documents with the ``cjk`` bigram analyzer
    (``analysis/cjk/CJKAnalyzer.java:92-99`` chain) — cached per
    sf_dir."""
    from lucene_1_spark.index import IndexReader, build_index
    from lucene_1_spark.index.builder import IndexConfig
    from lucene_1_spark.search import IndexSearcher

    key = os.path.abspath(sf_dir)
    if key in _CJK_SEARCHERS:
        return _CJK_SEARCHERS[key]
    idx_dir = os.path.join(
        tempfile.gettempdir(), "l1s_driver_cjk_v1",
        hashlib.md5(key.encode()).hexdigest()[:12])
    cjk = F.translate(
        F.regexp_replace(
            F.lower(F.substring(F.coalesce(F.col("text"), F.lit("")), 1, 60)),
            "[^a-z ]", " "),
        "abcdefghijklmnopqrstuvwxyz", _HAN26)
    corpus = _docs(spark, sf_dir).select(
        F.lit("docs").alias("repo"),
        F.lpad(F.col("doc_id").cast("string"), 12, "0").alias("path"),
        F.lit("c0").alias("commit"),
        F.col("lang"),
        cjk.alias("content"),
    )
    cfg = IndexConfig(analyzer="cjk", similarity="bm25_double",
                      n_buckets=8, n_doc_partitions=8)
    build_index(spark, corpus, idx_dir, cfg)
    s = IndexSearcher(IndexReader(spark, idx_dir))
    _CJK_SEARCHERS[key] = s
    return s


# deterministic Thai-ified corpus for the dictionary segmenter
# (analysis/segment.py, the ThaiAnalyzer/Kuromoji analog): every a-z
# token maps to a Thai word = initial-class char (first letter) +
# trailing-class chars (rest), words concatenated WITHOUT spaces (Thai
# writes no word boundaries).  The two disjoint alphabets make greedy
# longest-match provably recover the generative segmentation
# (tests/test_segment.py property test), so DuckDB can compute term
# stats generatively while Spark must actually segment.
_TH_A26 = "กขคงจฉชซฌญฎฏฐฑฒณดตถทธนบปผฝ"
_TH_B26 = "พฟภมยรลวศษสหฬอฮะาิีึืุูเแโใไ"[:26]
_ABC = "abcdefghijklmnopqrstuvwxyz"
_TH_A = str.maketrans(_ABC, _TH_A26)
_TH_B = str.maketrans(_ABC, _TH_B26)


def _thai_word(tok: str) -> str:
    return tok[0].translate(_TH_A) + tok[1:].translate(_TH_B)


_THAI_SEARCHERS: dict[str, object] = {}


def _thai_searcher(spark: SparkSession, sf_dir: str):
    """Index the Thai-ified documents with the dictionary segmenter
    (``dictseg:thai:<dict-file>``): the corpus vocabulary becomes the
    dictionary (one word per line, executor-readable — the Kuromoji
    dictionary-resource deployment shape), and the index build must
    segment the unspaced concatenations back into words."""
    from lucene_1_spark.index import IndexReader, build_index
    from lucene_1_spark.index.builder import IndexConfig
    from lucene_1_spark.search import IndexSearcher

    key = os.path.abspath(sf_dir)
    if key in _THAI_SEARCHERS:
        return _THAI_SEARCHERS[key]
    base = os.path.join(tempfile.gettempdir(), "l1s_driver_thai_v1",
                        hashlib.md5(key.encode()).hexdigest()[:12])
    os.makedirs(base, exist_ok=True)

    toks = F.filter(
        F.split(F.regexp_replace(
            F.lower(F.substring(F.coalesce(F.col("text"), F.lit("")), 1, 60)),
            "[^a-z ]", " "), " +"),
        lambda x: x != F.lit(""))
    words = F.transform(
        toks,
        lambda t: F.concat(
            F.translate(F.substring(t, 1, 1), _ABC, _TH_A26),
            F.translate(F.substring(t, 2, 255), _ABC, _TH_B26)))
    docs = _docs(spark, sf_dir)

    # corpus vocabulary -> dictionary file (bounded: distinct a-z
    # tokens of the synthetic corpus; production passes its own file)
    vocab = (docs.select(F.explode(toks).alias("t")).distinct().collect())
    dict_path = os.path.join(base, "thai_words.txt")
    with open(dict_path, "w", encoding="utf-8") as fh:
        for r in sorted(set(x["t"] for x in vocab)):
            fh.write(_thai_word(r) + "\n")

    corpus = docs.select(
        F.lit("docs").alias("repo"),
        F.lpad(F.col("doc_id").cast("string"), 12, "0").alias("path"),
        F.lit("c0").alias("commit"),
        F.col("lang"),
        F.array_join(words, "").alias("content"),
    )
    idx_dir = os.path.join(base, "idx")
    cfg = IndexConfig(analyzer=f"dictseg:thai:{dict_path}",
                      similarity="bm25_double",
                      n_buckets=8, n_doc_partitions=8)
    build_index(spark, corpus, idx_dir, cfg)
    s = IndexSearcher(IndexReader(spark, idx_dir))
    _THAI_SEARCHERS[key] = s
    return s


_AUX_SEARCHERS: dict[tuple, object] = {}


def _aux_searcher(spark: SparkSession, sf_dir: str, tag: str,
                  analyzer: str, content_col):
    """Build-and-cache a documents-table index with an arbitrary
    analyzer and content expression (the shared shape of the
    analyzer-spec driver entries)."""
    from lucene_1_spark.index import IndexReader, build_index
    from lucene_1_spark.index.builder import IndexConfig
    from lucene_1_spark.search import IndexSearcher

    key = (os.path.abspath(sf_dir), tag)
    if key in _AUX_SEARCHERS:
        return _AUX_SEARCHERS[key]
    idx_dir = os.path.join(
        tempfile.gettempdir(), f"l1s_driver_{tag}_v1",
        hashlib.md5(key[0].encode()).hexdigest()[:12])
    corpus = _docs(spark, sf_dir).select(
        F.lit("docs").alias("repo"),
        F.lpad(F.col("doc_id").cast("string"), 12, "0").alias("path"),
        F.lit("c0").alias("commit"),
        F.col("lang"),
        content_col.alias("content"))
    cfg = IndexConfig(analyzer=analyzer, similarity="bm25_double",
                      n_buckets=8, n_doc_partitions=8)
    build_index(spark, corpus, idx_dir, cfg)
    s = IndexSearcher(IndexReader(spark, idx_dir))
    _AUX_SEARCHERS[key] = s
    return s


_THAI_SQL_DOCS = f"""thdocs AS (
  SELECT doc_id,
         list_transform(
           list_filter(
             string_split_regex(
               regexp_replace(lower(substr(coalesce(text,''),1,60)),
                              '[^a-z ]', ' ', 'g'), ' +'),
             x -> x <> ''),
           t -> translate(substr(t,1,1), '{_ABC}', '{_TH_A26}') ||
                translate(substr(t,2), '{_ABC}', '{_TH_B26}')) AS words
  FROM documents),
toks AS (SELECT doc_id, unnest(words) AS term FROM thdocs),
tf AS (SELECT doc_id, term, count(*)::DOUBLE AS freq FROM toks GROUP BY 1, 2),
dl AS (SELECT doc_id, count(*)::DOUBLE AS len FROM toks GROUP BY 1),
st AS (SELECT count(*)::DOUBLE AS n, sum(len)::DOUBLE AS tot FROM dl),
df AS (SELECT term, count(*)::DOUBLE AS dfreq FROM tf GROUP BY 1)"""


_CJK_SQL_DOCS = f"""cjkdocs AS (
  SELECT doc_id,
         translate(regexp_replace(lower(substr(coalesce(text,''),1,60)),
                                  '[^a-z ]', ' ', 'g'),
                   'abcdefghijklmnopqrstuvwxyz', '{_HAN26}') AS cjk
  FROM documents),
runs AS (
  SELECT doc_id, r FROM (
    SELECT doc_id, unnest(string_split_regex(cjk, ' +')) AS r FROM cjkdocs
  ) WHERE r <> ''),
toks AS (
  SELECT doc_id, substr(r, CAST(i AS INT), 2) AS term
  FROM runs, unnest(generate_series(1, len(r) - 1)) AS t(i)
  WHERE len(r) >= 2
  UNION ALL
  SELECT doc_id, r AS term FROM runs WHERE len(r) = 1),
tf AS (SELECT doc_id, term, count(*)::DOUBLE AS freq FROM toks GROUP BY 1, 2),
dl AS (SELECT doc_id, count(*)::DOUBLE AS len FROM toks GROUP BY 1),
st AS (SELECT count(*)::DOUBLE AS n, sum(len)::DOUBLE AS tot FROM dl),
df AS (SELECT term, count(*)::DOUBLE AS dfreq FROM tf GROUP BY 1)"""


# ---------------------------------------------------------------------------
# entry — flagship query, smoke-checked by the driver at sf0.001
# ---------------------------------------------------------------------------

def entry(spark: SparkSession) -> DataFrame:
    """Index /root/testdata/sf0.001 documents, run a BM25 top-10
    disjunction through the block-max engine."""
    return _topk(spark, "/root/testdata/sf0.001", "spark merge window", k=10)


# ---------------------------------------------------------------------------
# queries + oracles
# ---------------------------------------------------------------------------

def queries() -> dict[str, Callable[[SparkSession, str], DataFrame]]:
    q: dict[str, Callable] = {}

    # ---- full-text: term / boolean / top-k (SURVEY §2.2, §2.4, §2.5) ----
    q["ft_term_topk"] = lambda s, d: _topk(s, d, "spark")
    q["ft_rare_term_topk"] = lambda s, d: _topk(s, d, "dup")
    q["ft_or_topk"] = lambda s, d: _topk(s, d, "spark merge window")
    q["ft_and_topk"] = lambda s, d: _topk(s, d, "+spark +merge")
    q["ft_mixed_topk"] = lambda s, d: _topk(s, d, "+spark window")
    q["ft_must_not_topk"] = lambda s, d: _topk(s, d, "spark -merge")

    def ft_msm(s, d):
        from lucene_1_spark.search.query import (BooleanQuery, Clause, Occur,
                                                 TermQuery)
        bq = BooleanQuery(tuple(
            Clause(TermQuery(t), Occur.SHOULD)
            for t in ["spark", "merge", "window"]), minimum_should_match=2)
        se = _searcher(s, d)
        top = se.search_df(bq, k=10).withColumn(
            "rank", F.row_number().over(
                W.orderBy(F.desc("score"), F.asc("doc_id"))).cast("long"))
        return _orig_id(top, se).select(
            F.col("orig_id").alias("doc_id"),
            F.round("score", 4).alias("score"), "rank")
    q["ft_msm_topk"] = ft_msm

    q["ft_phrase_topk"] = lambda s, d: _topk(s, d, '"sort merge"')

    def ft_dismax_topk(s, d):
        """DisjunctionMaxQuery (DisjunctionMaxQuery.java:42-88): score =
        max(disjunct scores) + tie_breaker * (sum - max).  Disjunct 2 is
        itself a disjunction — its sub-plan score is the BM25 sum over
        its members."""
        from lucene_1_spark.search.query import (BooleanQuery, Clause,
                                                 DisjunctionMaxQuery, Occur,
                                                 TermQuery)
        se = _searcher(s, d)
        dm = DisjunctionMaxQuery((
            TermQuery("spark"),
            BooleanQuery((Clause(TermQuery("merge"), Occur.SHOULD),
                          Clause(TermQuery("window"), Occur.SHOULD)))),
            tie_breaker=0.3)
        top = se.search_df(dm, k=10).withColumn(
            "rank", F.row_number().over(
                W.orderBy(F.desc("score"), F.asc("doc_id"))).cast("long"))
        return _orig_id(top, se).select(
            F.col("orig_id").alias("doc_id"),
            F.round("score", 4).alias("score"), "rank")
    q["ft_dismax_topk"] = ft_dismax_topk

    def ft_term_in_set(s, d):
        """TermInSetQuery (TermInSetQuery.java:63-90): constant-score
        membership in a term set, clause-count-unlimited, one postings
        scan.  First 10 matches in doc order + constant score."""
        from lucene_1_spark.search.query import TermInSetQuery
        se = _searcher(s, d)
        res = se.search_df(
            TermInSetQuery(("vector", "stream", "qqq_no_such_term"),
                           boost=2.5), k=10)
        return _orig_id(res, se).select(
            F.col("orig_id").alias("doc_id"),
            F.round("score", 4).alias("score")).orderBy("doc_id")
    q["ft_term_in_set"] = ft_term_in_set

    def ft_more_like_this(s, d):
        """MoreLikeThis (queries/mlt/MoreLikeThis.java:733-800): seed =
        doc 7's text; interesting terms = tf*classic-idf top-10 over
        tf>=2, df>=5; the resulting SHOULD-disjunction ranks the corpus
        (seed excluded) by BM25."""
        from lucene_1_spark.search.morelikethis import more_like_this_query
        se = _searcher(s, d)
        seed = _docs(s, d).filter(F.col("doc_id") == 7) \
            .select("text").first()["text"]
        mq = more_like_this_query(se, seed, max_query_terms=10,
                                  min_term_freq=2, min_doc_freq=5)
        res = _orig_id(se.search_df(mq, k=None), se) \
            .filter(F.col("orig_id") != 7)
        ranked = res.withColumn(
            "rank", F.row_number().over(
                W.orderBy(F.desc("score"), F.asc("orig_id"))).cast("long"))
        return ranked.filter(F.col("rank") <= 10).select(
            F.col("orig_id").alias("doc_id"),
            F.round("score", 4).alias("score"), "rank")
    q["ft_more_like_this"] = ft_more_like_this

    def ft_spell_suggest(s, d):
        """DirectSpellChecker (search/spell/DirectSpellChecker.java):
        dictionary terms within 2 edits of 'bat', ranked similarity
        desc, doc_freq desc, term asc."""
        from lucene_1_spark.search.spell import suggest_similar
        se = _searcher(s, d)
        return suggest_similar(se, "bat", num_suggestions=5, max_edits=2,
                               prefix_length=0)
    q["ft_spell_suggest"] = ft_spell_suggest

    # deterministic synthetic coordinates per doc — identical modular
    # arithmetic on both sides, so geo queries have exact SQL twins
    def _geo_docs(s, d):
        return _docs(s, d).select(
            "doc_id",
            ((F.col("doc_id") * 7919 % 18000) / 100.0 - 90.0).alias("lat"),
            ((F.col("doc_id") * 104729 % 36000) / 100.0 - 180.0).alias("lon"))

    def geo_distance_topk(s, d):
        """LatLonPoint.nearest analog: 10 nearest docs to a center by
        haversine on the GeoUtils mean-radius sphere; km rounded to 3
        decimals (meter granularity) for cross-engine float stability."""
        from lucene_1_spark.functions.geo import haversine_meters
        pts = _geo_docs(s, d)
        dist = haversine_meters(F.col("lat"), F.col("lon"), 12.34, 56.78)
        ranked = (pts.withColumn("dist_km", F.round(dist / 1000.0, 3))
                  .withColumn("rank", F.row_number().over(
                      W.orderBy(F.asc("dist_km"), F.asc("doc_id")))
                      .cast("long")))
        return ranked.filter(F.col("rank") <= 10).select(
            "doc_id", "dist_km", "rank")
    q["geo_distance_topk"] = geo_distance_topk

    def geo_bbox_count(s, d):
        """LatLonPoint.newBoxQuery analog incl. a dateline-crossing box
        (min_lon > max_lon = union of the two lon ranges)."""
        from lucene_1_spark.functions.geo import box_predicate
        pts = _geo_docs(s, d)
        plain = pts.filter(box_predicate(
            F.col("lat"), F.col("lon"), -30.0, 30.0, 0.0, 90.0)).count()
        crossing = pts.filter(box_predicate(
            F.col("lat"), F.col("lon"), -60.0, 60.0, 150.0, -150.0)).count()
        return s.createDataFrame([(plain, crossing)],
                                 "plain_n long, crossing_n long")
    q["geo_bbox_count"] = geo_bbox_count

    def geo_radius_count(s, d):
        """LatLonPoint.newDistanceQuery analog: two-phase box-prefilter
        + exact haversine; count within 3000 km of the center."""
        from lucene_1_spark.functions.geo import distance_query
        pts = _geo_docs(s, d)
        n = distance_query(pts, center_lat=12.34, center_lon=56.78,
                           radius_m=3_000_000.0).count()
        return s.createDataFrame([(n,)], "n long")
    q["geo_radius_count"] = geo_radius_count

    # polygon ring shared by the entry and its generated SQL twin
    _POLY = [(-20.0, -30.0), (30.0, -30.0), (30.0, 30.0),
             (0.0, 0.0), (-20.0, 30.0)]

    def geo_polygon_count(s, d):
        """LatLonPoint.newPolygonQuery analog: even-odd ray cast over a
        concave ring, bbox prefilter pushed to the scan."""
        from lucene_1_spark.functions.geo import polygon_query
        pts = _geo_docs(s, d)
        n = polygon_query(pts, vertices=_POLY).count()
        return s.createDataFrame([(n,)], "n long")
    q["geo_polygon_count"] = geo_polygon_count

    def geo_path_distance_count(s, d):
        """spatial3d GeoStandardPath analog (functions/geo3d.py):
        docs within 1500 km of a geodesic polyline — 3D unit-sphere
        cross-track/endpoint arc math as pure JVM columns, expanded
        bbox conjunct pushed to the scan; the SQL twin is GENERATED
        from the same segment constants (path_distance_sql), so the
        formula itself is cross-checked, not just the rows."""
        from lucene_1_spark.functions.geo3d import path_distance_query
        pts = _geo_docs(s, d)
        n = path_distance_query(
            pts, [(10.0, 40.0), (25.0, 55.0), (40.0, 45.0)],
            radius_m=1_500_000.0).count()
        return s.createDataFrame([(n,)], "n long")
    q["geo_path_distance_count"] = geo_path_distance_count

    # deterministic synthetic triangle ring per doc — same trig on
    # both sides (the geo-point precedent), so LatLonShape relations
    # have exact SQL twins
    def _shape_docs(s, d):
        from lucene_1_spark.functions.shapes import index_shapes
        base = _docs(s, d).select(
            "doc_id",
            ((F.col("doc_id") * 7919 % 14000) / 100.0 - 70.0).alias("clat"),
            ((F.col("doc_id") * 104729 % 32000) / 100.0 - 160.0)
            .alias("clon"),
            ((F.col("doc_id") * 31 % 500) / 100.0 + 0.5).alias("r"),
            (F.col("doc_id") * 17 % 360).cast("double").alias("rot"))
        for j in range(3):
            ang = F.radians(F.col("rot") + F.lit(120.0 * j))
            base = (base
                    .withColumn(f"lat{j}",
                                F.col("clat") + F.col("r") * F.sin(ang))
                    .withColumn(f"lon{j}",
                                F.col("clon") + F.col("r") * F.cos(ang)))
        tri = base.select(
            "doc_id",
            F.array("lat0", "lat1", "lat2").alias("ring_lats"),
            F.array("lon0", "lon1", "lon2").alias("ring_lons"))
        return index_shapes(tri)

    def geo_shape_box_counts(s, d):
        """LatLonShape.newBoxQuery (document/LatLonShape.java:79-98)
        under QueryRelation INTERSECTS / WITHIN / DISJOINT
        (document/ShapeField.java): per-doc triangle rings vs one
        query box, all three relation counts in one pass."""
        from lucene_1_spark.functions.shapes import (box_disjoint,
                                                     box_intersects,
                                                     box_within)
        tri = _shape_docs(s, d)
        box = (-15.0, 20.0, -25.0, 30.0)
        return tri.agg(
            F.sum(F.when(box_intersects(tri, *box), 1).otherwise(0))
            .cast("long").alias("intersects_n"),
            F.sum(F.when(box_within(tri, *box), 1).otherwise(0))
            .cast("long").alias("within_n"),
            F.sum(F.when(box_disjoint(tri, *box), 1).otherwise(0))
            .cast("long").alias("disjoint_n"))
    q["geo_shape_box_counts"] = geo_shape_box_counts

    # query ring shared by the entry and its generated SQL twin
    _SHAPE_QPOLY = [(-30.0, -40.0), (25.0, -35.0), (40.0, 10.0),
                    (0.0, 5.0), (-20.0, 45.0)]

    def geo_shape_polygon_count(s, d):
        """LatLonShape.newPolygonQuery INTERSECTS: triangle rings vs a
        concave query pentagon — vertex containment both ways plus
        proper edge-edge crossings, bbox prefilter first."""
        from lucene_1_spark.functions.shapes import polygon_intersects
        tri = _shape_docs(s, d)
        n = tri.filter(polygon_intersects(tri, _SHAPE_QPOLY)).count()
        return s.createDataFrame([(n,)], "n long")
    q["geo_shape_polygon_count"] = geo_shape_polygon_count

    def ft_multifield_dismax(s, d):
        """MultiFieldQueryParser shape (queryparser/classic/
        MultiFieldQueryParser.java:62-89): one user term searched
        across fields (content + the analyzed 'head' field), per-field
        scores combined DisMax with tie_breaker=0.1 — a doc matching
        one field well beats a doc matching both weakly."""
        from lucene_1_spark.search.query import (DisjunctionMaxQuery,
                                                 TermQuery)
        se = _searcher(s, d)
        dm = DisjunctionMaxQuery(
            (TermQuery("spark"), TermQuery("spark", field="head")),
            tie_breaker=0.1)
        top = se.search_df(dm, k=10).withColumn(
            "rank", F.row_number().over(
                W.orderBy(F.desc("score"), F.asc("doc_id"))).cast("long"))
        return _orig_id(top, se).select(
            F.col("orig_id").alias("doc_id"),
            F.round("score", 4).alias("score"), "rank")
    q["ft_multifield_dismax"] = ft_multifield_dismax

    def classify_naive_bayes(s, d):
        """SimpleNaiveBayesClassifier (classification/
        SimpleNaiveBayesClassifier.java:44-250): multinomial NB with
        add-one smoothing, trained on the whole documents table
        (label = lang), classifying docs 0..49; absent-(term,class)
        smoothing folds into the per-class closed form so the join
        only touches existing counts."""
        from lucene_1_spark.pipeline.classify import (naive_bayes_classify,
                                                      naive_bayes_train)
        docs = _docs(s, d).select("doc_id", "text", "lang")
        model = naive_bayes_train(docs, text_col="text", label_col="lang")
        return naive_bayes_classify(
            model, docs.filter(F.col("doc_id") < 50), text_col="text")
    q["classify_naive_bayes"] = classify_naive_bayes

    def _dv_index(s, d) -> str:
        """Shared cached documents index with the ``priority`` dv field
        (7 on 'data' docs, then 99999 on 'window' docs, latest
        generation wins) — built once per sf dir, reused by the dv and
        expression-sort entries."""
        import shutil

        from lucene_1_spark.index.builder import IndexConfig
        from lucene_1_spark.streaming.incremental import IncrementalIndexWriter

        key = os.path.abspath(d)
        # v2: versioned cache key — v1 indexes predate the reserved-
        # column rejection and the priority-field entry, and a stale
        # DV_DONE must never mask a behavior change again
        idx_dir = os.path.join(
            tempfile.gettempdir(), "l1s_driver_dv_v2",
            hashlib.md5(key.encode()).hexdigest()[:12])
        marker = os.path.join(idx_dir, "DV_DONE")
        if not os.path.exists(marker):
            shutil.rmtree(idx_dir, ignore_errors=True)
            corpus = _docs(s, d).select(
                F.lit("docs").alias("repo"),
                F.lpad(F.col("doc_id").cast("string"), 12, "0")
                .alias("path"),
                F.lit("c0").alias("commit"), F.col("lang"),
                F.coalesce(F.col("text"), F.lit("")).alias("content"))
            cfg = IndexConfig(analyzer="whitespace",
                              similarity="bm25_double",
                              n_buckets=8, n_doc_partitions=8)
            w = IncrementalIndexWriter(s, idx_dir, cfg)
            w.append(corpus)
            w.update_numeric_doc_value("data", "priority", 7)
            w.update_numeric_doc_value("window", "priority", 99999)
            with open(marker, "w") as fh:
                fh.write("ok")
        return idx_dir

    def dv_update_range_count(s, d):
        """In-place doc-values update (IndexWriter.updateNumericDocValue):
        bootstrap an index over documents, then set a brand-new numeric
        field ``priority`` in two generations WITHOUT re-indexing
        postings — 7 for every doc containing 'data', then 99999 for
        every doc containing 'window' (latest generation wins on the
        overlap) — and count through DocValuesRangeQuery.  Updating a
        RESERVED index column (e.g. ``length``) is correctly refused
        (round-5 RESERVED_DOC_COLS guard), so the entry exercises the
        supported path: dv updates to a real doc-values field."""
        from lucene_1_spark.index import IndexReader
        from lucene_1_spark.search import IndexSearcher
        from lucene_1_spark.search.query import DocValuesRangeQuery

        idx_dir = _dv_index(s, d)
        se = IndexSearcher(IndexReader(s, idx_dir))
        hi = se.search_df(DocValuesRangeQuery("priority", 99999, None),
                          k=None).count()
        lo = se.search_df(DocValuesRangeQuery("priority", None, 50),
                          k=None).count()
        return s.createDataFrame([(hi, lo)], "updated_n long, small_n long")
    q["dv_update_range_count"] = dv_update_range_count

    def ft_expr_sort_topk(s, d):
        """Expressions-module sort (lucene/expressions/.../
        ExpressionRescorer.java, SimpleBindings): hits for
        'data stream' ordered by ``0.3*score + 0.7*ln(1+priority)``
        where ``priority`` is the dv-UPDATED field — the binding sees
        the latest dv generation, and Catalyst compiles the expression
        into whole-stage codegen (the reference JITs expressions to
        bytecode).  Docs without a priority value sort last and are
        dropped below top-k."""
        from lucene_1_spark.index import IndexReader
        from lucene_1_spark.search import IndexSearcher

        idx_dir = _dv_index(s, d)
        se = IndexSearcher(IndexReader(s, idx_dir))
        out = se.search_sorted_expr(
            "data stream", "0.3*score + 0.7*ln(1 + priority)", k=10)
        return (_orig_id(out.filter(F.col("sort_key").isNotNull()), se)
                .select(F.col("orig_id").alias("doc_id"),
                        F.round("sort_key", 4).alias("sort_key")))
    q["ft_expr_sort_topk"] = ft_expr_sort_topk

    def ft_function_score_topk(s, d):
        """FunctionScoreQuery.boostByValue (queries/function/
        FunctionScoreQuery.java:40-120): hits of 'data stream' with
        score REPLACED by score * ln(1 + priority), priority = the
        dv-updated field (missing reads as 0 -> factor ln(1) = 0, the
        reference's missing-value DoubleValues contract).  Catalyst
        compiles the source expression into whole-stage codegen where
        the reference JITs a DoubleValuesSource tree."""
        from lucene_1_spark.index import IndexReader
        from lucene_1_spark.search import IndexSearcher
        from lucene_1_spark.search.query import boost_by_value, parse_query

        idx_dir = _dv_index(s, d)
        se = IndexSearcher(IndexReader(s, idx_dir))
        fq = boost_by_value(parse_query("data stream", "whitespace"),
                            "ln(1.0 + coalesce(priority, 0.0))")
        top = se.search_df(fq, k=10)
        return (_orig_id(top, se)
                .select(F.col("orig_id").alias("doc_id"),
                        F.round("score", 4).alias("score")))
    q["ft_function_score_topk"] = ft_function_score_topk

    def ft_boost_by_query_topk(s, d):
        """FunctionScoreQuery.boostByQuery (FunctionScoreQuery.java
        static factory): 'spark merge' BM25, tripled for docs that ALSO
        match 'window' — the match set is unchanged (boost-query
        membership only scales, never filters)."""
        from lucene_1_spark.search.query import (TermQuery, boost_by_query,
                                                 parse_query)
        se = _searcher(s, d)
        fq = boost_by_query(parse_query("spark merge", "whitespace"),
                            TermQuery("window"), 3.0)
        top = se.search_df(fq, k=10).withColumn(
            "rank", F.row_number().over(
                W.orderBy(F.desc("score"), F.asc("doc_id"))).cast("long"))
        return (_orig_id(top, se)
                .select(F.col("orig_id").alias("doc_id"),
                        F.round("score", 4).alias("score"), "rank"))
    q["ft_boost_by_query_topk"] = ft_boost_by_query_topk

    def ft_precedence_parse_topk(s, d):
        """PrecedenceQueryParser (queryparser/flexible/precedence/
        PrecedenceQueryParser.java:38-60): 'spark OR merge AND window'
        parses as spark OR (merge AND window) — AND binds tighter — so
        a doc matches via spark alone or via BOTH merge and window, and
        the nested conjunction contributes its BM25 sum only when it
        matches (the classic parser folds the same string flat)."""
        from lucene_1_spark.search.precedence_parser import parse_precedence
        se = _searcher(s, d)
        pq = parse_precedence("spark OR merge AND window", "whitespace")
        top = se.search_df(pq, k=10).withColumn(
            "rank", F.row_number().over(
                W.orderBy(F.desc("score"), F.asc("doc_id"))).cast("long"))
        return (_orig_id(top, se)
                .select(F.col("orig_id").alias("doc_id"),
                        F.round("score", 4).alias("score"), "rank"))
    q["ft_precedence_parse_topk"] = ft_precedence_parse_topk

    def dv_terms_count(s, d):
        """DocValuesTermsQuery (sandbox/search/DocValuesTermsQuery.java:
        58-90): set membership evaluated on the stored ``lang`` column
        (constant score), composed with a scored MUST term — counts
        docs matching 'spark' restricted to lang in (en, fr) vs the
        unrestricted count."""
        from lucene_1_spark.search.query import (BooleanQuery, Clause,
                                                 DocValuesTermsQuery, Occur,
                                                 TermQuery)
        se = _searcher(s, d)
        bq = BooleanQuery((
            Clause(TermQuery("spark"), Occur.MUST),
            Clause(DocValuesTermsQuery("lang", ("en", "fr")),
                   Occur.FILTER)))
        n_filtered = se.search_df(bq, k=None).count()
        n_set = se.search_df(
            DocValuesTermsQuery("lang", ("en", "fr")), k=None).count()
        return s.createDataFrame([(n_filtered, n_set)],
                                 "n_filtered long, n_set long")
    q["dv_terms_count"] = dv_terms_count

    def ft_diversified_topk(s, d):
        """DiversifiedTopDocsCollector analog (misc/search/
        DiversifiedTopDocsCollector.java:37-120): global top-10 for
        'spark merge' with at most 3 hits per lang — window
        row_number per key + global TakeOrdered."""
        from lucene_1_spark.search.collectors import diversified_topk
        se = _searcher(s, d)
        top = diversified_topk(se, "spark merge", "lang", k=10,
                               max_per_key=3).select(
            "doc_id", "score", "rank")
        return (_orig_id(top, se)
                .select(F.col("orig_id").alias("doc_id"),
                        F.round("score", 4).alias("score"),
                        F.col("rank").cast("long").alias("rank")))
    q["ft_diversified_topk"] = ft_diversified_topk

    def dv_stats_length(s, d):
        """DocValuesStatsCollector analog (misc/search/
        DocValuesStats.java): single-pass count/min/max/mean/variance
        of the stored token-length dv over the matches of 'spark'."""
        from lucene_1_spark.search.collectors import doc_values_stats
        se = _searcher(s, d)
        st = doc_values_stats(se, "spark", "length")
        return st.select(
            F.col("count").cast("long").alias("cnt"),
            F.col("missing").cast("long").alias("missing"),
            F.col("min").cast("long").alias("min_len"),
            F.col("max").cast("long").alias("max_len"),
            F.round("mean", 4).alias("mean_len"),
            F.round("variance", 2).alias("var_len"))
    q["dv_stats_length"] = dv_stats_length

    def ft_high_freq_terms(s, d):
        """HighFreqTerms (misc/HighFreqTerms.java): the index's top-10
        terms by document frequency (ties by term asc) straight off
        the term-stats dictionary — one aggregate +
        TakeOrderedAndProject, no postings touched."""
        from lucene_1_spark.search.collectors import high_freq_terms
        se = _searcher(s, d)
        return (high_freq_terms(se.reader, n=10, order_by="doc_freq")
                .select("term", F.col("doc_freq").cast("long"),
                        F.col("total_term_freq").cast("long")))
    q["ft_high_freq_terms"] = ft_high_freq_terms

    def ft_dynamic_range_facets(s, d):
        """DynamicRangeUtil.computeDynamicNumericRanges
        (facet/range/DynamicRangeUtil.java:204-270), unit weights:
        equal-weight ranges over the token-length dv of docs matching
        'spark' — greedy cuts over the sorted values == fixed blocks
        of ceil(len/topN), one window + one aggregate."""
        from lucene_1_spark.search.collectors import dynamic_range_facets
        se = _searcher(s, d)
        out = dynamic_range_facets(se, "spark", "length", topn=4)
        return out.select("range_id",
                          F.col("n_docs").cast("long"),
                          "min_v", "max_v",
                          F.round("avg_v", 4).alias("avg_v"))
    q["ft_dynamic_range_facets"] = ft_dynamic_range_facets

    def suggest_free_text(s, d):
        """FreeTextSuggester (suggest/analyzing/FreeTextSuggester.java:
        93-126,527-702): bigram stupid-backoff LM over the corpus text
        — candidates after context 'data' score cnt(c,w)/cnt(c) when
        the bigram was seen else 0.4 * cnt(w)/total (ALPHA backoff);
        top-10 by score desc, word asc."""
        from lucene_1_spark.search.suggest import (build_free_text_model,
                                                   free_text_lookup)
        model = build_free_text_model(
            _docs(s, d).select("doc_id", "text"), "text",
            analyzer="whitespace")
        out = free_text_lookup(model, "data", k=10,
                               analyzer="whitespace")
        return out.select("word", F.round("score", 6).alias("score"))
    q["suggest_free_text"] = suggest_free_text

    def repl_search_topk(s, d):
        """NRT replication (replicator/nrt/PrimaryNode.java,
        ReplicaNode.java, CopyJob.java): copy the primary's immutable
        segment files to a replica dir (missing-only, manifest written
        LAST as the activation barrier), open the replica with a plain
        IndexReader and run the reference query — results must be
        byte-identical to the primary's, i.e. match the same BM25
        oracle."""
        import tempfile as _tf

        from lucene_1_spark.index import IndexReader
        from lucene_1_spark.index.replicator import sync_replica
        from lucene_1_spark.search import IndexSearcher

        se = _searcher(s, d)           # ensures the primary exists
        primary = se.reader.dir
        replica = os.path.join(
            _tf.gettempdir(), "l1s_driver_replica_v1",
            hashlib.md5(os.path.abspath(d).encode()).hexdigest()[:12])
        sync_replica(primary, replica)
        rse = IndexSearcher(IndexReader(s, replica))
        top = rse.search_df("spark", k=10).withColumn(
            "rank", F.row_number().over(
                W.orderBy(F.desc("score"), F.asc("doc_id"))).cast("long"))
        return (_orig_id(top, rse)
                .select(F.col("orig_id").alias("doc_id"),
                        F.round("score", 4).alias("score"), "rank"))
    q["repl_search_topk"] = repl_search_topk

    def snap_point_in_time(s, d):
        """SnapshotDeletionPolicy + DirectoryReader.open(IndexCommit):
        snapshot the commit, delete every doc containing 'window', then
        count 'spark' docs through BOTH readers — the snapshot still
        sees the pre-delete corpus."""
        import shutil

        from lucene_1_spark.index import IndexReader
        from lucene_1_spark.index.builder import IndexConfig
        from lucene_1_spark.index.maintenance import snapshot_index
        from lucene_1_spark.search import IndexSearcher
        from lucene_1_spark.streaming.incremental import IncrementalIndexWriter

        key = os.path.abspath(d)
        idx_dir = os.path.join(
            tempfile.gettempdir(), "l1s_driver_snap_v1",
            hashlib.md5(key.encode()).hexdigest()[:12])
        marker = os.path.join(idx_dir, "SNAP_DONE")
        if not os.path.exists(marker):
            shutil.rmtree(idx_dir, ignore_errors=True)
            corpus = _docs(s, d).select(
                F.lit("docs").alias("repo"),
                F.lpad(F.col("doc_id").cast("string"), 12, "0")
                .alias("path"),
                F.lit("c0").alias("commit"), F.col("lang"),
                F.coalesce(F.col("text"), F.lit("")).alias("content"))
            cfg = IndexConfig(analyzer="whitespace",
                              similarity="bm25_double",
                              n_buckets=8, n_doc_partitions=8)
            w = IncrementalIndexWriter(s, idx_dir, cfg)
            w.append(corpus)
            snap = snapshot_index(idx_dir)
            with open(os.path.join(idx_dir, "SNAP_ID"), "w") as fh:
                fh.write(snap)
            w.delete_by_term("window")
            with open(marker, "w") as fh:
                fh.write("ok")
        with open(os.path.join(idx_dir, "SNAP_ID")) as fh:
            snap = fh.read().strip()
        cur = IndexSearcher(IndexReader(s, idx_dir)).count("spark")
        old = IndexSearcher(IndexReader(s, idx_dir,
                                        snapshot=snap)).count("spark")
        return s.createDataFrame([(cur, old)],
                                 "current_n long, snapshot_n long")
    q["snap_point_in_time"] = snap_point_in_time

    def ft_join_query(s, d):
        """JoinUtil.createJoinQuery (join/JoinUtil.java:60-120) with
        ScoreMode.Total: docs matching 'window' aggregate their BM25
        scores per lang; every doc of a matching lang scores that
        total."""
        from lucene_1_spark.search.query import JoinQuery, TermQuery
        se = _searcher(s, d)
        q_ = JoinQuery(TermQuery("window"), "lang", "lang",
                       score_mode="total")
        top = se.search_df(q_, k=10).withColumn(
            "rank", F.row_number().over(
                W.orderBy(F.desc("score"), F.asc("doc_id"))).cast("long"))
        return _orig_id(top, se).select(
            F.col("orig_id").alias("doc_id"),
            F.round("score", 4).alias("score"), "rank")
    q["ft_join_query"] = ft_join_query

    def ft_term_vector(s, d):
        """TermVectors.get(doc) (index/TermVectors.java): doc 7's
        (term, freq) pairs reconstructed from block-range-pruned
        postings — no stored per-doc vector."""
        se = _searcher(s, d)
        return se.term_vector(7).select(
            "term", F.col("freq").cast("long").alias("freq"))
    q["ft_term_vector"] = ft_term_vector

    def mon_object_batch(s, d):
        """Monitor with register-by-Query-OBJECT (serialized complex
        registrations): a dismax and a term-in-set — shapes the classic
        parser cannot express — percolate the documents stream."""
        from lucene_1_spark.search.query import (DisjunctionMaxQuery,
                                                 PhraseQuery,
                                                 TermInSetQuery, TermQuery)
        from lucene_1_spark.streaming.monitor import Monitor
        m = Monitor(s)
        m.register("q_dm", DisjunctionMaxQuery(
            (TermQuery("spark"), PhraseQuery(("sort", "merge"))), 0.5))
        m.register("q_tis", TermInSetQuery(("vector", "stream")))
        docs = _docs(s, d).select("doc_id", "text").filter(
            F.col("doc_id") < 200)
        out = m.match_batch(docs)
        return (out.groupBy("query_id")
                .agg(F.count("*").cast("long").alias("n_matches"),
                     F.sum("doc_id").cast("long").alias("sum_doc_ids"))
                .orderBy("query_id"))
    q["mon_object_batch"] = mon_object_batch

    def text_perplexity(s, d):
        """CCNet-style LM quality filter (documented simplification:
        add-one bigram LM instead of a KenLM 5-gram), trained on the
        whole corpus, scoring docs 0..29."""
        from lucene_1_spark.pipeline.textstats import lm_perplexity
        docs = _docs(s, d).select("doc_id", "text")
        return lm_perplexity(docs.filter(F.col("doc_id") < 30),
                             lm_docs=docs)
    q["text_perplexity"] = text_perplexity

    _EDGE_SEARCHERS: dict = {}

    def ft_edge_autocomplete_count(s, d):
        """Search-as-you-type END TO END: the documents table indexed
        with edge_ngram:whitespace:2:4 (EdgeNGramTokenFilter.java), a
        typed prefix is ONE TermQuery against the gram postings.  The
        gram 'spar' exists exactly for tokens of length >= 4 starting
        with it, 'st' for tokens of length >= 2 — both reproduced in
        SQL."""
        from lucene_1_spark.index import IndexReader, build_index
        from lucene_1_spark.index.builder import IndexConfig
        from lucene_1_spark.search import IndexSearcher

        key = os.path.abspath(d)
        if key not in _EDGE_SEARCHERS:
            idx_dir = os.path.join(
                tempfile.gettempdir(), "l1s_driver_edge_v1",
                hashlib.md5(key.encode()).hexdigest()[:12])
            corpus = _docs(s, d).select(
                F.lit("docs").alias("repo"),
                F.lpad(F.col("doc_id").cast("string"), 12, "0")
                .alias("path"),
                F.lit("c0").alias("commit"), F.col("lang"),
                F.coalesce(F.col("text"), F.lit("")).alias("content"))
            cfg = IndexConfig(analyzer="edge_ngram:whitespace:2:4",
                              similarity="bm25_double",
                              n_buckets=8, n_doc_partitions=8)
            build_index(s, corpus, idx_dir, cfg)
            _EDGE_SEARCHERS[key] = IndexSearcher(IndexReader(s, idx_dir))
        from lucene_1_spark.search.query import TermQuery
        se = _EDGE_SEARCHERS[key]
        # the typed prefix is a RAW term against the gram postings
        # (query side is not re-analyzed — SearchAsYouType convention)
        n_spar = se.count(TermQuery("spar"))
        n_st = se.count(TermQuery("st"))
        return s.createDataFrame([(n_spar, n_st)],
                                 "n_spar long, n_st long")
    q["ft_edge_autocomplete_count"] = ft_edge_autocomplete_count

    _RU_SEARCHERS: dict = {}
    _BG_SEARCHERS: dict = {}

    def ft_ru_stem_topk(s, d):
        """Russian analyzer chain END TO END with an exact SQL twin
        (the CJK-entry pattern): lowercase a-z maps 1:1 onto 26
        Cyrillic letters, the index runs the ``russian`` chain
        (stop filter + light stemmer), and the oracle reproduces the
        stemmer as a generated longest-suffix CASE chain.  Query =
        the mapped form of 'scan' (ends in a strippable suffix, so
        stemming is genuinely exercised)."""
        from lucene_1_spark.index import IndexReader, build_index
        from lucene_1_spark.index.builder import IndexConfig
        from lucene_1_spark.search import IndexSearcher

        key = os.path.abspath(d)
        if key not in _RU_SEARCHERS:
            idx_dir = os.path.join(
                tempfile.gettempdir(), "l1s_driver_ru_v2",
                hashlib.md5(key.encode()).hexdigest()[:12])
            ru = F.translate(
                F.regexp_replace(
                    F.lower(F.substring(F.coalesce(F.col("text"),
                                                   F.lit("")), 1, 120)),
                    "[^a-z ]", " "),
                "abcdefghijklmnopqrstuvwxyz", _RU26)
            corpus = _docs(s, d).select(
                F.lit("docs").alias("repo"),
                F.lpad(F.col("doc_id").cast("string"), 12, "0")
                .alias("path"),
                F.lit("c0").alias("commit"), F.col("lang"),
                ru.alias("content"))
            cfg = IndexConfig(analyzer="russian",
                              similarity="bm25_double",
                              n_buckets=8, n_doc_partitions=8)
            build_index(s, corpus, idx_dir, cfg)
            _RU_SEARCHERS[key] = IndexSearcher(IndexReader(s, idx_dir))
        se = _RU_SEARCHERS[key]
        qtext = "scan".translate(_RU_TRANS)
        top = se.search_df(qtext, k=10).withColumn(
            "rank", F.row_number().over(
                W.orderBy(F.desc("score"), F.asc("doc_id"))).cast("long"))
        docs = se.reader.docs().select(
            "doc_id", F.col("path").cast("bigint").alias("orig_id"))
        return (top.join(docs, "doc_id")
                .select(F.col("orig_id").alias("doc_id"),
                        F.round("score", 4).alias("score"), "rank"))
    q["ft_ru_stem_topk"] = ft_ru_stem_topk

    def ft_bg_stem_topk(s, d):
        """Bulgarian analyzer chain END TO END with an exact SQL twin
        (the ft_ru_stem pattern, round 5): a-z transliterates 1:1 onto
        26 Cyrillic letters, the index runs the ``bulgarian`` chain,
        and the oracle reproduces the MULTI-STAGE stemmer (article ->
        plural alternations -> final vowels -> ен -> fleeting ъ,
        BulgarianStemmer.java:33-170) as a staged CASE pipeline.
        Query = transliterated 'data' (final-vowel strip fires)."""
        from lucene_1_spark.index import IndexReader, build_index
        from lucene_1_spark.index.builder import IndexConfig
        from lucene_1_spark.search import IndexSearcher

        key = os.path.abspath(d)
        if key not in _BG_SEARCHERS:
            idx_dir = os.path.join(
                tempfile.gettempdir(), "l1s_driver_bg_v1",
                hashlib.md5(key.encode()).hexdigest()[:12])
            bg = F.translate(
                F.regexp_replace(
                    F.lower(F.substring(F.coalesce(F.col("text"),
                                                   F.lit("")), 1, 120)),
                    "[^a-z ]", " "),
                "abcdefghijklmnopqrstuvwxyz", _BG26)
            corpus = _docs(s, d).select(
                F.lit("docs").alias("repo"),
                F.lpad(F.col("doc_id").cast("string"), 12, "0")
                .alias("path"),
                F.lit("c0").alias("commit"), F.col("lang"),
                bg.alias("content"))
            cfg = IndexConfig(analyzer="bulgarian",
                              similarity="bm25_double",
                              n_buckets=8, n_doc_partitions=8)
            build_index(s, corpus, idx_dir, cfg)
            _BG_SEARCHERS[key] = IndexSearcher(IndexReader(s, idx_dir))
        se = _BG_SEARCHERS[key]
        qtext = "data".translate(_BG_TRANS)
        top = se.search_df(qtext, k=10).withColumn(
            "rank", F.row_number().over(
                W.orderBy(F.desc("score"), F.asc("doc_id"))).cast("long"))
        docs = se.reader.docs().select(
            "doc_id", F.col("path").cast("bigint").alias("orig_id"))
        return (top.join(docs, "doc_id")
                .select(F.col("orig_id").alias("doc_id"),
                        F.round("score", 4).alias("score"), "rank"))
    q["ft_bg_stem_topk"] = ft_bg_stem_topk

    _ICU_SEARCHERS: dict = {}

    def ft_icu_fold_topk(s, d):
        """ICU folding chain END TO END (ICUFoldingFilter analog,
        ``lucene/analysis/icu/.../ICUFoldingFilter.java``): the corpus
        is deterministically DE-normalized — every a/e/o becomes a
        precomposed umlaut Ä, an accented é, a full-width Ｏ — then
        indexed with the ``icu_fold`` analyzer (NFKD + strip marks +
        casefold + NFKC).  The fold maps every decorated token back to
        its plain-ASCII form, so the exact SQL twin is plain BM25 over
        the UNDECORATED lowercase tokens; without the fold the decorated
        terms would never match the plain query."""
        from lucene_1_spark.index import IndexReader, build_index
        from lucene_1_spark.index.builder import IndexConfig
        from lucene_1_spark.search import IndexSearcher

        key = os.path.abspath(d)
        if key not in _ICU_SEARCHERS:
            idx_dir = os.path.join(
                tempfile.gettempdir(), "l1s_driver_icu_v1",
                hashlib.md5(key.encode()).hexdigest()[:12])
            mixed = F.translate(
                F.regexp_replace(
                    F.lower(F.substring(F.coalesce(F.col("text"),
                                                   F.lit("")), 1, 120)),
                    "[^a-z ]", " "),
                "aeo", "ÄéＯ")
            corpus = _docs(s, d).select(
                F.lit("docs").alias("repo"),
                F.lpad(F.col("doc_id").cast("string"), 12, "0")
                .alias("path"),
                F.lit("c0").alias("commit"), F.col("lang"),
                mixed.alias("content"))
            cfg = IndexConfig(analyzer="icu_fold",
                              similarity="bm25_double",
                              n_buckets=8, n_doc_partitions=8)
            build_index(s, corpus, idx_dir, cfg)
            _ICU_SEARCHERS[key] = IndexSearcher(IndexReader(s, idx_dir))
        se = _ICU_SEARCHERS[key]
        top = se.search_df("window", k=10).withColumn(
            "rank", F.row_number().over(
                W.orderBy(F.desc("score"), F.asc("doc_id"))).cast("long"))
        docs = se.reader.docs().select(
            "doc_id", F.col("path").cast("bigint").alias("orig_id"))
        return (top.join(docs, "doc_id")
                .select(F.col("orig_id").alias("doc_id"),
                        F.round("score", 4).alias("score"), "rank"))
    q["ft_icu_fold_topk"] = ft_icu_fold_topk

    _PAY_SEARCHERS: dict = {}

    def _pos_ws_searcher(s, d):
        """Shared bootstrap: whitespace positions=True index over the
        200-char cleaned text with per-token payloads attached (used by
        ft_payload_score_topk and ft_complex_phrase_count)."""
        from lucene_1_spark.index import IndexReader, build_index
        from lucene_1_spark.index.builder import IndexConfig
        from lucene_1_spark.index.maintenance import attach_payloads
        from lucene_1_spark.search import IndexSearcher

        key = os.path.abspath(d)
        if key not in _PAY_SEARCHERS:
            idx_dir = os.path.join(
                tempfile.gettempdir(), "l1s_driver_pay_v1",
                hashlib.md5(key.encode()).hexdigest()[:12])
            clean = F.regexp_replace(
                F.lower(F.substring(F.coalesce(F.col("text"),
                                               F.lit("")), 1, 200)),
                "[^a-z ]", " ")
            corpus = _docs(s, d).select(
                F.lit("docs").alias("repo"),
                F.lpad(F.col("doc_id").cast("string"), 12, "0")
                .alias("path"),
                F.lit("c0").alias("commit"), F.col("lang"),
                clean.alias("content"))
            cfg = IndexConfig(analyzer="whitespace",
                              similarity="bm25_double",
                              n_buckets=8, n_doc_partitions=8,
                              positions=True)
            build_index(s, corpus, idx_dir, cfg)
            r = IndexReader(s, idx_dir)
            toks = (corpus
                    .select("path",
                            F.posexplode(F.split("content", r"\s+"))
                            .alias("_i", "_t"))
                    .filter(F.col("_t") != ""))
            from pyspark.sql import Window as _W
            pos = F.row_number().over(
                _W.partitionBy("path").orderBy("_i")).cast("long") - 1
            prow = toks.withColumn("position", pos).select(
                "path", "position",
                ((F.col("position") % 5) + 1).cast("double")
                .alias("payload"))
            keyed = r.docs().select("doc_id", "path")
            attach_payloads(s, idx_dir,
                            prow.join(keyed, "path")
                            .select("doc_id", "position", "payload"))
            _PAY_SEARCHERS[key] = IndexSearcher(IndexReader(s, idx_dir))
        return _PAY_SEARCHERS[key]

    def ft_payload_score_topk(s, d):
        """Per-position payload scoring END TO END
        (``queries/payloads/PayloadScoreQuery.java`` — the .pay-file
        slice): every token of the cleaned corpus gets the
        deterministic payload (position % 5 + 1) via attach_payloads,
        and the query scores docs containing 'window' by the MAX
        payload over the term's matching positions.  Exact SQL twin:
        positions are 0-based ordinals over the nonempty whitespace
        tokens."""
        from lucene_1_spark.search.query import PayloadScoreQuery

        se = _pos_ws_searcher(s, d)
        top = se.search_df(PayloadScoreQuery("window", "max"), k=10) \
            .withColumn("rank", F.row_number().over(
                W.orderBy(F.desc("score"), F.asc("doc_id"))).cast("long"))
        docs = se.reader.docs().select(
            "doc_id", F.col("path").cast("bigint").alias("orig_id"))
        return (top.join(docs, "doc_id")
                .select(F.col("orig_id").alias("doc_id"),
                        F.round("score", 4).alias("score"), "rank"))
    q["ft_payload_score_topk"] = ft_payload_score_topk

    def ft_complex_phrase_count(s, d):
        """ComplexPhraseQueryParser analog END TO END
        (``queryparser/complexPhrase/ComplexPhraseQueryParser.java``):
        wildcard atoms inside quoted phrases expand against the term
        dictionary and run as MultiPhraseQuery adjacency.  Counts docs
        matching '"wi* table"' and '"da* hash"'; the SQL twin checks
        LIKE-prefixed term at position p and the literal at p+1."""
        from lucene_1_spark.search.query import parse_complex_phrase

        se = _pos_ws_searcher(s, d)
        n1 = se.search_df(parse_complex_phrase(
            '"wi* table"', analyzer="whitespace"), k=None).count()
        n2 = se.search_df(parse_complex_phrase(
            '"da* hash"', analyzer="whitespace"), k=None).count()
        return s.createDataFrame([(n1, n2)],
                                 "n_wi_table long, n_da_hash long")
    q["ft_complex_phrase_count"] = ft_complex_phrase_count

    def ft_span_near_count(s, d):
        """Span queries END TO END (queries/spans facade over the
        intervals algebra, ``queries/spans/SpanNearQuery.java``):
        ordered near (window .. table, slop 2) + unordered near
        (data .. hash, slop 1) doc counts; the SQL twin checks pair
        existence over ordinal token positions (for two terms,
        a minimal interval with <= slop gaps exists iff some position
        pair is within slop+1)."""
        from lucene_1_spark.search.spans import (SpanNearQuery,
                                                 SpanTermQuery,
                                                 span_matches)
        se = _pos_ws_searcher(s, d)
        n1 = span_matches(se, SpanNearQuery(
            (SpanTermQuery("window"), SpanTermQuery("table")),
            slop=2, in_order=True)).count()
        n2 = span_matches(se, SpanNearQuery(
            (SpanTermQuery("data"), SpanTermQuery("hash")),
            slop=1, in_order=False)).count()
        return s.createDataFrame([(n1, n2)],
                                 "n_ordered long, n_unordered long")
    q["ft_span_near_count"] = ft_span_near_count

    def ft_surround_count(s, d):
        """Surround query language END TO END (``queryparser/surround/``
        grammar + DistanceQuery/OrQuery/NotQuery doc-set model,
        ``search/surround_parser.py``): counts docs matching
        'sort 3w merge' (ordered distance 3), '(data or hash) not
        window' (boolean algebra) and 'ha* and sort' (truncation).
        The SQL twin checks ordered position pairs within distance,
        set algebra over doc ids, and LIKE-prefix term matches."""
        from concurrent.futures import ThreadPoolExecutor

        from lucene_1_spark.search.surround_parser import surround_search

        se = _pos_ws_searcher(s, d)
        # the three probe queries are independent Spark jobs — overlap
        # them so one query's stage tail back-fills the executors
        # (driver threads; FIFO scheduling)
        with ThreadPoolExecutor(max_workers=3) as pool:
            n1, n2, n3 = pool.map(
                lambda t: surround_search(se, t).count(),
                ["sort 3w merge", "(data or hash) not window",
                 "ha* and sort"])
        return s.createDataFrame(
            [(n1, n2, n3)],
            "n_dist long, n_boolean long, n_trunc long")
    q["ft_surround_count"] = ft_surround_count

    def ft_xml_parse_count(s, d):
        """XML query syntax END TO END (``queryparser/xml/CoreParser``
        element vocabulary, ``search/xml_parser.py``): a BooleanQuery
        with must/mustNot clauses, a SpanNear proximity element, and a
        RangeQuery (term range) — each parsed from XML and counted.
        The SQL twin checks doc-set algebra, ordered position pairs
        (slop=2 -> gap<=2 -> delta<=3), and a term BETWEEN range."""
        from lucene_1_spark.search.xml_parser import parse_xml_query

        se = _pos_ws_searcher(s, d)
        n1 = se.count(parse_xml_query(
            '<BooleanQuery fieldName="content">'
            '<Clause occurs="must"><TermQuery>sort</TermQuery></Clause>'
            '<Clause occurs="mustNot"><TermQuery>window</TermQuery>'
            "</Clause></BooleanQuery>"))
        from lucene_1_spark.search.spans import span_matches
        n2 = span_matches(se, parse_xml_query(
            '<SpanNear slop="2" inOrder="true">'
            "<SpanTerm>data</SpanTerm><SpanTerm>merge</SpanTerm>"
            "</SpanNear>")).count()
        n3 = se.count(parse_xml_query(
            '<RangeQuery fieldName="content" lowerTerm="ha"'
            ' upperTerm="hz"/>'))
        return s.createDataFrame(
            [(n1, n2, n3)], "n_bool long, n_span long, n_range long")
    q["ft_xml_parse_count"] = ft_xml_parse_count

    _LV_SEARCHERS: dict = {}

    def ft_lv_stem_topk(s, d):
        """Latvian analyzer chain END TO END with an exact SQL twin
        (the ft_ru_stem pattern, round-5 batch 4): a-z maps into the
        Latvian alphabet, the index runs the ``latvian`` chain (stop
        filter + LatvianStemmer.java-lineage light stemmer with
        unpalatalization), and the oracle reproduces the stemmer as a
        generated longest-suffix CASE chain + an unpalatalization
        stage.  Query = mapped 'slow' (ū-suffix strip fires)."""
        from lucene_1_spark.index import IndexReader, build_index
        from lucene_1_spark.index.builder import IndexConfig
        from lucene_1_spark.search import IndexSearcher

        key = os.path.abspath(d)
        if key not in _LV_SEARCHERS:
            idx_dir = os.path.join(
                tempfile.gettempdir(), "l1s_driver_lv_v1",
                hashlib.md5(key.encode()).hexdigest()[:12])
            lv = F.translate(
                F.regexp_replace(
                    F.lower(F.substring(F.coalesce(F.col("text"),
                                                   F.lit("")), 1, 120)),
                    "[^a-z ]", " "),
                "abcdefghijklmnopqrstuvwxyz", _LV26)
            corpus = _docs(s, d).select(
                F.lit("docs").alias("repo"),
                F.lpad(F.col("doc_id").cast("string"), 12, "0")
                .alias("path"),
                F.lit("c0").alias("commit"), F.col("lang"),
                lv.alias("content"))
            cfg = IndexConfig(analyzer="latvian",
                              similarity="bm25_double",
                              n_buckets=8, n_doc_partitions=8)
            build_index(s, corpus, idx_dir, cfg)
            _LV_SEARCHERS[key] = IndexSearcher(IndexReader(s, idx_dir))
        se = _LV_SEARCHERS[key]
        qtext = "slow".translate(_LV_TRANS)
        top = se.search_df(qtext, k=10).withColumn(
            "rank", F.row_number().over(
                W.orderBy(F.desc("score"), F.asc("doc_id"))).cast("long"))
        docs = se.reader.docs().select(
            "doc_id", F.col("path").cast("bigint").alias("orig_id"))
        return (top.join(docs, "doc_id")
                .select(F.col("orig_id").alias("doc_id"),
                        F.round("score", 4).alias("score"), "rank"))
    q["ft_lv_stem_topk"] = ft_lv_stem_topk

    _FOLD_SEARCHERS: dict = {}

    def ft_folded_topk(s, d):
        """ASCIIFoldingFilter end to end: the corpus's vowels become
        accented (a->á, e->é, ...), the index runs folded:whitespace,
        and the fold restores the original terms EXACTLY — so the
        accented index answers the plain-text BM25 oracle for 'spark'
        rank- and score-identically."""
        from lucene_1_spark.index import IndexReader, build_index
        from lucene_1_spark.index.builder import IndexConfig
        from lucene_1_spark.search import IndexSearcher

        key = os.path.abspath(d)
        if key not in _FOLD_SEARCHERS:
            idx_dir = os.path.join(
                tempfile.gettempdir(), "l1s_driver_fold_v1",
                hashlib.md5(key.encode()).hexdigest()[:12])
            acc = F.translate(F.coalesce(F.col("text"), F.lit("")),
                              "aeiou", "áéíóú")
            corpus = _docs(s, d).select(
                F.lit("docs").alias("repo"),
                F.lpad(F.col("doc_id").cast("string"), 12, "0")
                .alias("path"),
                F.lit("c0").alias("commit"), F.col("lang"),
                acc.alias("content"))
            cfg = IndexConfig(analyzer="folded:whitespace",
                              similarity="bm25_double",
                              n_buckets=8, n_doc_partitions=8)
            build_index(s, corpus, idx_dir, cfg)
            _FOLD_SEARCHERS[key] = IndexSearcher(IndexReader(s, idx_dir))
        se = _FOLD_SEARCHERS[key]
        top = se.search_df("spark", k=10).withColumn(
            "rank", F.row_number().over(
                W.orderBy(F.desc("score"), F.asc("doc_id"))).cast("long"))
        docs = se.reader.docs().select(
            "doc_id", F.col("path").cast("bigint").alias("orig_id"))
        return (top.join(docs, "doc_id")
                .select(F.col("orig_id").alias("doc_id"),
                        F.round("score", 4).alias("score"), "rank"))
    q["ft_folded_topk"] = ft_folded_topk

    _AR_SEARCHERS: dict = {}

    def ft_ar_stem_topk(s, d):
        """Arabic chain END TO END (normalization + light10-family
        prefix/suffix stemming) with an exact SQL twin: a-z maps onto
        26 Arabic letters such that the w->و conjunction prefix, the
        ...ان suffix, and ta-marbuta normalization all genuinely fire;
        query = mapped 'window' (loses its و prefix both sides)."""
        from lucene_1_spark.index import IndexReader, build_index
        from lucene_1_spark.index.builder import IndexConfig
        from lucene_1_spark.search import IndexSearcher

        key = os.path.abspath(d)
        if key not in _AR_SEARCHERS:
            idx_dir = os.path.join(
                tempfile.gettempdir(), "l1s_driver_ar_v1",
                hashlib.md5(key.encode()).hexdigest()[:12])
            ar = F.translate(
                F.regexp_replace(
                    F.lower(F.substring(F.coalesce(F.col("text"),
                                                   F.lit("")), 1, 120)),
                    "[^a-z ]", " "),
                "abcdefghijklmnopqrstuvwxyz", _AR26)
            corpus = _docs(s, d).select(
                F.lit("docs").alias("repo"),
                F.lpad(F.col("doc_id").cast("string"), 12, "0")
                .alias("path"),
                F.lit("c0").alias("commit"), F.col("lang"),
                ar.alias("content"))
            cfg = IndexConfig(analyzer="arabic",
                              similarity="bm25_double",
                              n_buckets=8, n_doc_partitions=8)
            build_index(s, corpus, idx_dir, cfg)
            _AR_SEARCHERS[key] = IndexSearcher(IndexReader(s, idx_dir))
        se = _AR_SEARCHERS[key]
        qtext = "window".translate(_AR_TRANS)
        top = se.search_df(qtext, k=10).withColumn(
            "rank", F.row_number().over(
                W.orderBy(F.desc("score"), F.asc("doc_id"))).cast("long"))
        docs = se.reader.docs().select(
            "doc_id", F.col("path").cast("bigint").alias("orig_id"))
        return (top.join(docs, "doc_id")
                .select(F.col("orig_id").alias("doc_id"),
                        F.round("score", 4).alias("score"), "rank"))
    q["ft_ar_stem_topk"] = ft_ar_stem_topk

    def ft_synonym_topk(s, d):
        from lucene_1_spark.search.query import SynonymQuery
        se = _searcher(s, d)
        top = se.search_df(SynonymQuery(("spark", "merge")), k=10) \
            .withColumn("rank", F.row_number().over(
                W.orderBy(F.desc("score"), F.asc("doc_id"))).cast("long"))
        return _orig_id(top, se).select(
            F.col("orig_id").alias("doc_id"),
            F.round("score", 4).alias("score"), "rank")
    q["ft_synonym_topk"] = ft_synonym_topk

    def ft_const_score(s, d):
        from lucene_1_spark.search.query import (ConstantScoreQuery,
                                                 TermQuery)
        se = _searcher(s, d)
        top = se.search_df(ConstantScoreQuery(TermQuery("window"), 2.5), k=10)
        return _orig_id(top, se).select(
            F.col("orig_id").alias("doc_id"),
            F.round("score", 4).alias("score"))
    q["ft_const_score"] = ft_const_score

    def ft_search_after(s, d):
        se = _searcher(s, d)
        page1 = se.search_df("spark merge window", k=10).collect()
        cursor = (page1[-1]["score"], page1[-1]["doc_id"])
        page2 = se.search_df("spark merge window", k=10, after=cursor)
        ranked = page2.withColumn(
            "rank", (F.row_number().over(
                W.orderBy(F.desc("score"), F.asc("doc_id"))) + 10).cast("long"))
        return _orig_id(ranked, se).select(
            F.col("orig_id").alias("doc_id"),
            F.round("score", 4).alias("score"), "rank")
    q["ft_search_after"] = ft_search_after

    def ft_filter_topk(s, d):
        """FILTER clause: required, never scored (BooleanQuery.java:120)."""
        from lucene_1_spark.search.query import (BooleanQuery, Clause, Occur,
                                                 TermQuery)
        q = BooleanQuery((Clause(TermQuery("spark"), Occur.MUST),
                          Clause(TermQuery("merge"), Occur.FILTER)))
        return _topk_query(s, d, q)
    q["ft_filter_topk"] = ft_filter_topk

    def ft_prefix_topk(s, d):
        """Scored prefix expansion (ScoringRewrite, MultiTermQuery.java)."""
        from lucene_1_spark.search.query import PrefixQuery
        return _topk_query(s, d, PrefixQuery("s"))
    q["ft_prefix_topk"] = ft_prefix_topk

    def ft_wildcard_topk(s, d):
        from lucene_1_spark.search.query import WildcardQuery
        return _topk_query(s, d, WildcardQuery("s?a*"))
    q["ft_wildcard_topk"] = ft_wildcard_topk

    def ft_fuzzy_topk(s, d):
        """Fuzzy with similarity-scaled member boosts (FuzzyTermsEnum)."""
        from lucene_1_spark.search.query import FuzzyQuery
        return _topk_query(s, d, FuzzyQuery("bigg", max_edits=2))
    q["ft_fuzzy_topk"] = ft_fuzzy_topk

    def ft_sloppy_phrase_topk(s, d):
        """slop=2 phrase: in-slop pairs weighted 1/(1+displacement)."""
        from lucene_1_spark.search.query import PhraseQuery
        return _topk_query(s, d, PhraseQuery(("sort", "merge"), slop=2))
    q["ft_sloppy_phrase_topk"] = ft_sloppy_phrase_topk

    def ft_sloppy_phrase3_topk(s, d):
        """n-term sloppy phrase (n=3, slop=3): anchored on the first
        term, weight 1/(1 + sum of per-slot min displacements)."""
        from lucene_1_spark.search.query import PhraseQuery
        return _topk_query(s, d,
                           PhraseQuery(("sort", "merge", "query"), slop=3))
    q["ft_sloppy_phrase3_topk"] = ft_sloppy_phrase3_topk

    def ft_multiphrase_topk(s, d):
        """MultiPhraseQuery (MultiPhraseQuery.java:53-120): each slot
        accepts ANY member term — positional union per slot
        (UnionPostingsEnum), then exact adjacency; weight = sum of idf
        over all present member terms."""
        from lucene_1_spark.search.query import MultiPhraseQuery
        return _topk_query(s, d, MultiPhraseQuery(
            (("sort", "hash"), ("merge", "join"))))
    q["ft_multiphrase_topk"] = ft_multiphrase_topk

    def ft_multiphrase_sloppy_topk(s, d):
        """Sloppy (slop=2) two-slot MultiPhraseQuery: in-slop union
        position pairs weighted 1/(1+|displacement|)."""
        from lucene_1_spark.search.query import MultiPhraseQuery
        return _topk_query(s, d, MultiPhraseQuery(
            (("sort", "hash"), ("merge", "join")), slop=2))
    q["ft_multiphrase_sloppy_topk"] = ft_multiphrase_sloppy_topk

    # ---- multi-field: keyword field postings (IndexingChain.java:561) ----
    def ft_textfield_topk(s, d):
        """Second ANALYZED text field ('head' = first 80 chars): BM25
        scored with the FIELD's own docCount/avgdl/norms."""
        from lucene_1_spark.search.query import TermQuery
        return _topk_query(s, d, TermQuery("spark", field="head"))
    q["ft_textfield_topk"] = ft_textfield_topk

    def ft_textfield_phrase(s, d):
        """Exact phrase WITHIN the head field (field-local positions)."""
        from lucene_1_spark.search.query import PhraseQuery
        return _topk_query(s, d, PhraseQuery(("sort", "merge"),
                                             field="head"))
    q["ft_textfield_phrase"] = ft_textfield_phrase

    q["ft_field_term_topk"] = lambda s, d: _topk(s, d, "lang:de")

    def ft_field_filter_topk(s, d):
        """lang keyword field as a FILTER clause: restricts to lang=de,
        scores by bm25('spark') alone."""
        from lucene_1_spark.search.query import (BooleanQuery, Clause,
                                                 Occur, TermQuery)
        bq = BooleanQuery((
            Clause(TermQuery("spark"), Occur.MUST),
            Clause(TermQuery("de", field="lang"), Occur.FILTER)))
        return _topk_query(s, d, bq)
    q["ft_field_filter_topk"] = ft_field_filter_topk

    def ft_batch_queries(s, d):
        """Batched multi-query execution (search_many): THREE queries
        in one postings pass — every block decoded once for all of
        them; per-query boolean semantics replayed relationally."""
        se = _searcher(s, d)
        out = se.search_many({"qa": "spark", "qb": "+spark +merge",
                              "qc": "window -batch"}, k=5)
        docs = se.reader.docs().select(
            "doc_id", F.col("path").cast("bigint").alias("orig_id"))
        return (out.join(docs, "doc_id")
                .select("query_id", F.col("orig_id").alias("doc_id"),
                        F.round("score", 4).alias("score"), "rank"))
    q["ft_batch_queries"] = ft_batch_queries

    def ft_classic_topk(s, d):
        """ClassicSimilarity (TF-IDF) top-10: sqrt(tf) * idf^2 /
        sqrt(len), idf = ln((N+1)/(df+1)) + 1."""
        se = _classic_searcher(s, d)
        top = se.search_df("spark merge window", k=10).withColumn(
            "rank", F.row_number().over(
                W.orderBy(F.desc("score"), F.asc("doc_id"))).cast("long"))
        return (_orig_id(top, se)
                .select(F.col("orig_id").alias("doc_id"),
                        F.round("score", 4).alias("score"), "rank"))
    q["ft_classic_topk"] = ft_classic_topk

    def ft_lmd_topk(s, d):
        """LMDirichletSimilarity top-10 (similarities/
        LMDirichletSimilarity.java:60-90): per term
        max(0, ln(1 + tf/(mu*P(t|C))) + ln(mu/(len+mu))), mu=2000,
        P(t|C) = (ttf+1)/(sumTotalTermFreq+1), summed over terms."""
        se = _lmd_searcher(s, d, "lm_dirichlet_double")
        top = se.search_df("spark merge window", k=10).withColumn(
            "rank", F.row_number().over(
                W.orderBy(F.desc("score"), F.asc("doc_id"))).cast("long"))
        return (_orig_id(top, se)
                .select(F.col("orig_id").alias("doc_id"),
                        F.round("score", 4).alias("score"), "rank"))
    q["ft_lmd_topk"] = ft_lmd_topk

    def ft_boolean_sim_topk(s, d):
        """BooleanSimilarity (similarities/BooleanSimilarity.java):
        each matching clause scores exactly its boost — served from the
        SAME index as ft_lmd_topk via the searcher-level similarity
        override (setSimilarity analog; exact32 norms are shared)."""
        se = _lmd_searcher(s, d, "boolean_double")
        top = se.search_df("spark merge^2 window", k=10).withColumn(
            "rank", F.row_number().over(
                W.orderBy(F.desc("score"), F.asc("doc_id"))).cast("long"))
        return (_orig_id(top, se)
                .select(F.col("orig_id").alias("doc_id"),
                        F.round("score", 4).alias("score"), "rank"))
    q["ft_boolean_sim_topk"] = ft_boolean_sim_topk

    def ft_sweet_spot_topk(s, d):
        """SweetSpotSimilarity top-10 (misc/SweetSpotSimilarity.java):
        ClassicSimilarity weight (idf^2) with plateau lengthNorm
        1/sqrt(0.5*(|len-5|+|len-40|-35)+1) — exactly 1.0 for len in
        [5,40] — and baselineTf (base=1, min=2: freq<=2 scores 1, else
        sqrt(freq-1)).  Served from the shared double-norms index via
        the searcher-level override + sim_params (the setter analog)."""
        from lucene_1_spark.search import IndexSearcher
        base = _lmd_searcher(s, d, "lm_dirichlet_double")
        se = IndexSearcher(base.reader, similarity="sweet_spot_double",
                           sim_params={"ss_ln_min": 5, "ss_ln_max": 40,
                                       "ss_steep": 0.5, "ss_tf_base": 1.0,
                                       "ss_tf_min": 2.0})
        top = se.search_df("spark merge window", k=10).withColumn(
            "rank", F.row_number().over(
                W.orderBy(F.desc("score"), F.asc("doc_id"))).cast("long"))
        return (_orig_id(top, se)
                .select(F.col("orig_id").alias("doc_id"),
                        F.round("score", 4).alias("score"), "rank"))
    q["ft_sweet_spot_topk"] = ft_sweet_spot_topk

    def ft_common_terms_topk(s, d):
        """CommonTermsQuery top-10 (queries/CommonTermsQuery.java:
        62-120,146-206): terms (dup, spark, merge) split at
        max_term_frequency=0.5 of maxDoc — 'dup' (~5% df) drives the
        match as the required low-freq group; 'spark'/'merge' (~78%)
        only add score.  BM25-double scoring on the shared index."""
        from lucene_1_spark.search.query import CommonTermsQuery
        se = _searcher(s, d)
        qy = CommonTermsQuery(("dup", "spark", "merge"),
                              max_term_frequency=0.5)
        top = se.search_df(qy, k=10).withColumn(
            "rank", F.row_number().over(
                W.orderBy(F.desc("score"), F.asc("doc_id"))).cast("long"))
        return (_orig_id(top, se)
                .select(F.col("orig_id").alias("doc_id"),
                        F.round("score", 4).alias("score"), "rank"))
    q["ft_common_terms_topk"] = ft_common_terms_topk

    def ft_phonetic_topk(s, d):
        """Phonetic search (analysis/phonetic PhoneticFilter + Soundex):
        the index stores Soundex codes of whitespace tokens, so the
        MISSPELLED query 'spork marge' (codes S162 M620) ranks docs
        containing spark/merge by BM25 over the code terms.  The SQL
        twin re-implements the ENCODER itself (translate + regexp
        algebra from the same constants)."""
        from lucene_1_spark.index import IndexReader, build_index
        from lucene_1_spark.index.builder import IndexConfig
        from lucene_1_spark.search import IndexSearcher

        key = os.path.abspath(d)
        se = _PHON_SEARCHERS.get(key)
        if se is None:
            idx_dir = os.path.join(
                tempfile.gettempdir(), "l1s_driver_phon_v1",
                hashlib.md5(key.encode()).hexdigest()[:12])
            corpus = _docs(s, d).select(
                F.lit("docs").alias("repo"),
                F.lpad(F.col("doc_id").cast("string"), 12, "0")
                .alias("path"),
                F.lit("c0").alias("commit"),
                F.col("lang"),
                F.coalesce(F.col("text"), F.lit("")).alias("content"))
            cfg = IndexConfig(analyzer="phonetic:whitespace",
                              similarity="bm25_double",
                              n_buckets=8, n_doc_partitions=8)
            build_index(s, corpus, idx_dir, cfg)
            se = IndexSearcher(IndexReader(s, idx_dir))
            _PHON_SEARCHERS[key] = se
        top = se.search_df("spork marge", k=10).withColumn(
            "rank", F.row_number().over(
                W.orderBy(F.desc("score"), F.asc("doc_id"))).cast("long"))
        return (_orig_id(top, se)
                .select(F.col("orig_id").alias("doc_id"),
                        F.round("score", 4).alias("score"), "rank"))
    q["ft_phonetic_topk"] = ft_phonetic_topk

    def ft_memory_percolate_count(s, d):
        """MemoryIndex percolation (memory/MemoryIndex.java): one
        single-doc in-memory index PER ROW inside mapInPandas — the
        reference's per-document query-evaluation pattern, distributed;
        nothing but the per-partition match counts leaves the
        executors.  Query: "sort merge" exact phrase OR
        (window AND NOT batch)."""
        import pandas as pd
        from lucene_1_spark.index.memory import MemoryIndex
        from lucene_1_spark.search.query import (BooleanQuery, Clause,
                                                 Occur, PhraseQuery,
                                                 TermQuery)
        query = BooleanQuery((
            Clause(PhraseQuery(("sort", "merge")), Occur.SHOULD),
            Clause(BooleanQuery((
                Clause(TermQuery("window"), Occur.MUST),
                Clause(TermQuery("batch"), Occur.MUST_NOT))),
                Occur.SHOULD)))
        docs = _docs(s, d).select(
            "doc_id", F.coalesce(F.col("text"), F.lit("")).alias("text"))

        def kernel(it):
            for b in it:
                yield pd.DataFrame({
                    "doc_id": b["doc_id"],
                    "m": [MemoryIndex(t, "whitespace").matches(query)
                          for t in b["text"]]})

        m = docs.mapInPandas(kernel, "doc_id long, m boolean")
        return m.filter(F.col("m")).agg(
            F.count("*").cast("long").alias("n_docs"))
    q["ft_memory_percolate_count"] = ft_memory_percolate_count

    def _sim_topk(s, d, similarity, qtext="spark merge window"):
        se = _lmd_searcher(s, d, similarity)
        top = se.search_df(qtext, k=10).withColumn(
            "rank", F.row_number().over(
                W.orderBy(F.desc("score"), F.asc("doc_id"))).cast("long"))
        return (_orig_id(top, se)
                .select(F.col("orig_id").alias("doc_id"),
                        F.round("score", 4).alias("score"), "rank"))

    def ft_lmjm_topk(s, d):
        """LMJelinekMercerSimilarity top-10 (similarities/
        LMJelinekMercerSimilarity.java:55-75): per term
        ln(1 + ((1-lambda)*tf/len)/(lambda*P(t|C))), lambda=0.1,
        summed over terms — 6th pluggable similarity, served from the
        shared exact32 index via the setSimilarity analog."""
        return _sim_topk(s, d, "lm_jelinek_mercer_double")
    q["ft_lmjm_topk"] = ft_lmjm_topk

    def ft_dfi_topk(s, d):
        """DFISimilarity(IndependenceChiSquared) top-10
        (similarities/DFISimilarity.java:58-69): expected =
        (F+1)*len/(T+1); freq <= expected scores 0, else
        log2((freq-expected)^2/expected + 1), summed over terms."""
        return _sim_topk(s, d, "dfi_chi2_double")
    q["ft_dfi_topk"] = ft_dfi_topk

    def ft_dfr_topk(s, d):
        """DFRSimilarity(BasicModelIF, AfterEffectL, NormalizationH2)
        top-10 (similarities/DFRSimilarity.java; Amati & van
        Rijsbergen 2002): tfn = tf*log2(1 + avgdl/len), per term
        log2(1+(N+1)/(F+0.5)) * tfn/(1+tfn), summed."""
        return _sim_topk(s, d, "dfr_if_l_h2_double")
    q["ft_dfr_topk"] = ft_dfr_topk

    def ft_ib_topk(s, d):
        """IBSimilarity(DistributionLL, LambdaDF, NormalizationH2)
        top-10 (similarities/IBSimilarity.java; Clinchant & Gaussier
        2010): lambda = (n+1)/(N+1), per term ln(1 + tfn/lambda),
        summed."""
        return _sim_topk(s, d, "ib_ll_df_h2_double")
    q["ft_ib_topk"] = ft_ib_topk

    def ft_axiomatic_topk(s, d):
        """AxiomaticF2EXP top-10 (similarities/AxiomaticF2EXP.java;
        Fang & Zhai 2005): per term ((N+1)/n)^0.35 *
        tf/(tf + s + s*len/avgdl), s=0.5 — executed through the
        BM25-double pipeline with k1=2s, b=0.5 (identical tf curve),
        so block-max pruning stays on."""
        return _sim_topk(s, d, "axiomatic_f2exp_double")
    q["ft_axiomatic_topk"] = ft_axiomatic_topk

    def ft_indri_topk(s, d):
        """IndriDirichletSimilarity top-10 (similarities/
        IndriDirichletSimilarity.java:62-66): per term
        ln((tf + mu*P(t|C)) / (len + mu)), mu=2000, P(t|C) = ttf/T
        UNSMOOTHED (IndriCollectionModel) — a log-probability, so
        every score is negative and ranking is closest-to-zero
        first."""
        return _sim_topk(s, d, "indri_dirichlet_double")
    q["ft_indri_topk"] = ft_indri_topk

    def ft_ax_f1log_topk(s, d):
        """AxiomaticF1LOG top-10 (similarities/AxiomaticF1LOG.java:
        50-70): per term ln((N+1)/n) * (1 + ln(1 + ln(tf)))
        * (avgdl + s)/(avgdl + len*s), s=0.5 — tf and length norm are
        separate factors (F1), log-form idf."""
        return _sim_topk(s, d, "axiomatic_f1log_double")
    q["ft_ax_f1log_topk"] = ft_ax_f1log_topk

    def ft_dfr_g_topk(s, d):
        """DFRSimilarity(BasicModelG, AfterEffectL, NormalizationH2)
        top-10 (similarities/BasicModelG.java:36-50): lambda =
        F/(N+F) with F=ttf+1, A=log2(1+lambda), B=log2((1+lambda)/
        lambda), per term B - (B-A)/(1+tfn) — the geometric basic
        model, affine in 1/(1+tfn)."""
        return _sim_topk(s, d, "dfr_g_l_h2_double")
    q["ft_dfr_g_topk"] = ft_dfr_g_topk

    def ft_rawtf_topk(s, d):
        """RawTFSimilarity top-10 (similarities/RawTFSimilarity.java:
        40-42): score = summed raw term frequency — no idf, no length
        norm (the feature-engineering similarity)."""
        return _sim_topk(s, d, "raw_tf_double")
    q["ft_rawtf_topk"] = ft_rawtf_topk

    def ft_multi_sim_topk(s, d):
        """MultiSimilarity (similarities/MultiSimilarity.java:27-70):
        CombSUM of bm25_double + classic_double sub-scorers — per-doc
        score is the SUM of the two similarities' scores over the same
        match set."""
        from lucene_1_spark.search.multisim import multi_similarity_search
        se = _lmd_searcher(s, d, "bm25_double")
        top = multi_similarity_search(
            se.reader, ("bm25_double", "classic_double"),
            "spark merge window", k=10).withColumn(
            "rank", F.row_number().over(
                W.orderBy(F.desc("score"), F.asc("doc_id"))).cast("long"))
        return (_orig_id(top, se)
                .select(F.col("orig_id").alias("doc_id"),
                        F.round("score", 4).alias("score"), "rank"))
    q["ft_multi_sim_topk"] = ft_multi_sim_topk

    def ft_simple_parse_topk(s, d):
        """SimpleQueryParser analog (queryparser/simple/
        SimpleQueryParser.java): lenient grammar, never throws.
        'spark + merge window' parses to (spark AND merge) OR window
        (infix +, implicit default-OR), scored as summed BM25 of the
        matching disjuncts."""
        from lucene_1_spark.search.simple_parser import parse_simple
        se = _searcher(s, d)
        qq = parse_simple("spark + merge window", analyzer="whitespace")
        top = se.search_df(qq, k=10).withColumn(
            "rank", F.row_number().over(
                W.orderBy(F.desc("score"), F.asc("doc_id"))).cast("long"))
        return (_orig_id(top, se)
                .select(F.col("orig_id").alias("doc_id"),
                        F.round("score", 4).alias("score"), "rank"))
    q["ft_simple_parse_topk"] = ft_simple_parse_topk

    def ft_dv_range_filter(s, d):
        """Doc-values numeric range as a FILTER clause: bm25('spark')
        restricted to docs with 100 <= token length <= 300."""
        from lucene_1_spark.search.query import (BooleanQuery, Clause,
                                                 DocValuesRangeQuery,
                                                 Occur, TermQuery)
        bq = BooleanQuery((
            Clause(TermQuery("spark"), Occur.MUST),
            Clause(DocValuesRangeQuery("length", 100, 300), Occur.FILTER)))
        return _topk_query(s, d, bq)
    q["ft_dv_range_filter"] = ft_dv_range_filter

    # ---- composite booleans: non-term clauses (BooleanClause.java) ----
    q["ft_bool_phrase_topk"] = lambda s, d: _topk(s, d, '+spark +"sort merge"')
    q["ft_bool_phrase_not"] = lambda s, d: _topk(s, d, '"sort merge" -window')

    def ft_bool_constscore(s, d):
        """ConstantScoreQuery as a MUST clause: bm25(spark) + 0.5."""
        from lucene_1_spark.search.query import (BooleanQuery, Clause,
                                                 ConstantScoreQuery, Occur,
                                                 TermQuery)
        bq = BooleanQuery((
            Clause(TermQuery("spark"), Occur.MUST),
            Clause(ConstantScoreQuery(TermQuery("merge"), 0.5), Occur.MUST)))
        return _topk_query(s, d, bq)
    q["ft_bool_constscore"] = ft_bool_constscore

    def ft_explain_topk(s, d):
        """explain() totals for the top-5 hits — must reproduce the
        search scores exactly (Weight.explain contract)."""
        se = _searcher(s, d)
        top = se.search_df("spark merge", k=5).collect()
        docs = {r["doc_id"]: int(r["orig_id"]) for r in
                se.reader.docs().select(
                    "doc_id", F.col("path").cast("bigint").alias("orig_id"))
                .join(s.createDataFrame(
                    [(r["doc_id"],) for r in top], "doc_id long"), "doc_id")
                .collect()}
        rows = []
        for rank, r in enumerate(sorted(
                top, key=lambda r: (-r["score"], r["doc_id"])), start=1):
            ex = se.explain("spark merge", r["doc_id"])
            rows.append((docs[r["doc_id"]], round(ex["value"], 4), rank))
        return s.createDataFrame(rows, "doc_id long, score double, rank long")
    q["ft_explain_topk"] = ft_explain_topk

    def ft_suggest_prefix(s, d):
        """Weighted prefix completion from the term dictionary."""
        from lucene_1_spark.search.highlight import suggest_terms
        se = _searcher(s, d)
        return suggest_terms(se.reader, "s", k=5)
    q["ft_suggest_prefix"] = ft_suggest_prefix

    def ft_suggest_infix(s, d):
        """Infix completion (AnalyzingInfixSuggester analog)."""
        from lucene_1_spark.search.highlight import suggest_terms_infix
        se = _searcher(s, d)
        return suggest_terms_infix(se.reader, "ue", k=5)
    q["ft_suggest_infix"] = ft_suggest_infix

    def _pair_suggestions(s, d):
        """Suggestion corpus for the analyzing/fuzzy suggesters: the
        leading 2-token phrase of each document, weight = #docs that
        start with it."""
        from lucene_1_spark.search.suggest import build_suggestions
        toks = F.filter(
            F.split(F.lower(F.col("text")), r"\s+"),
            lambda x: x != F.lit(""))
        pairs = (_docs(s, d)
                 .filter(F.col("text").isNotNull())
                 .select(toks.alias("l"))
                 .filter(F.size("l") >= 2)
                 .select(F.concat_ws(
                     " ", F.element_at("l", 1),
                     F.element_at("l", 2)).alias("sugg"))
                 .groupBy("sugg").agg(F.count("*").alias("w")))
        return build_suggestions(pairs, "sugg", "w")

    def ft_suggest_analyzing(s, d):
        """AnalyzingSuggester (suggest/analyzing/
        AnalyzingSuggester.java:81): weighted phrase completions whose
        ANALYZED key extends the analyzed typed text."""
        from lucene_1_spark.search.suggest import lookup
        return lookup(_pair_suggestions(s, d), "sp", k=5)
    q["ft_suggest_analyzing"] = ft_suggest_analyzing

    def ft_suggest_fuzzy_phrase(s, d):
        """FuzzySuggester (suggest/analyzing/FuzzySuggester.java:66):
        'spork' completes the 'spark …' phrases within one edit; the
        non-fuzzy first char + length-window prefilters are pushed to
        the scan before levenshtein."""
        from lucene_1_spark.search.suggest import lookup_fuzzy
        return lookup_fuzzy(_pair_suggestions(s, d), "spork", k=5,
                            max_edits=1)
    q["ft_suggest_fuzzy_phrase"] = ft_suggest_fuzzy_phrase

    def ft_highlight(s, d):  # rows-only: snippet strings have no SQL twin
        """UnifiedHighlighter analog over the documents table."""
        from lucene_1_spark.search.highlight import highlight
        texts = _docs(s, d).select("doc_id", "text")
        return (highlight(texts, {"spark", "merge"}, analyzer="whitespace")
                .orderBy(F.desc("n_matches"), F.asc("doc_id")).limit(10))
    q["ft_highlight"] = ft_highlight

    def ft_parent_join_topk(s, d):
        """ToParentBlockJoinQuery analog: child hits roll up to their
        lang 'parent' with ScoreMode.Max."""
        from lucene_1_spark.search.joins import search_parents
        se = _searcher(s, d)
        return (search_parents(se, "spark merge", "lang", "max", k=10)
                .select("parent", F.round("score", 4).alias("score"),
                        "n_children"))
    q["ft_parent_join_topk"] = ft_parent_join_topk

    def ft_sort_by_field(s, d):
        """TopFieldCollector analog: hits ordered by stored fields."""
        se = _searcher(s, d)
        res = se.search_sorted("dup", by=[("lang", "asc"),
                                          ("length", "desc")], k=10)
        docs = se.reader.docs().select(
            "doc_id", F.col("path").cast("bigint").alias("orig_id"))
        return (res.join(docs, "doc_id")
                .select(F.col("orig_id").alias("doc_id"), "lang",
                        F.col("length").cast("long").alias("length")))
    q["ft_sort_by_field"] = ft_sort_by_field

    # ---- mutable index: upsert + delete + compaction (§2.1, §2.10) ----
    q["ft_upsert_topk"] = lambda s, d: _mut_topk(s, d, "graftmarker merge")
    q["ft_delete_topk"] = lambda s, d: _mut_topk(s, d, "spark merge")
    # tiered segment merge (TieredMergePolicy / SegmentMerger):
    # 3 appended segments + deletes, merged selectively, queried
    q["ft_merge_topk"] = lambda s, d: _merge_topk(s, d, "spark merge")

    def ft_add_indexes_topk(s, d, k: int = 10):
        """addIndexes: two independently-built shard indexes composed
        without re-analysis; BM25 over the combined index."""
        se = _addidx_searcher(s, d)
        top = se.search_df("spark merge", k=k).withColumn(
            "rank", F.row_number().over(
                W.orderBy(F.desc("score"), F.asc("doc_id"))).cast("long"))
        docs = se.reader.docs().select(
            "doc_id", F.col("path").cast("bigint").alias("orig_id"))
        return (top.join(docs, "doc_id")
                .select(F.col("orig_id").alias("doc_id"),
                        F.round("score", 4).alias("score"), "rank"))
    q["ft_add_indexes_topk"] = ft_add_indexes_topk

    def ft_live_doc_count(s, d):
        from lucene_1_spark.search.query import MatchAllDocsQuery
        se = _mut_searcher(s, d)
        return s.createDataFrame([(se.count(MatchAllDocsQuery()),)], "n long")
    q["ft_live_doc_count"] = ft_live_doc_count

    def ft_function_score(s, d):
        """FunctionScoreQuery: score := bm25 * ln(1 + field length)."""
        from lucene_1_spark.search.facets import function_score
        se = _searcher(s, d)
        out = function_score(
            se, "spark",
            lambda j: F.col("score") * F.log(F.lit(1.0) + F.col("length")),
            fields=["length"], k=10)
        docs = se.reader.docs().select(
            "doc_id", F.col("path").cast("bigint").alias("orig_id"))
        ranked = out.withColumn("rank", F.row_number().over(
            W.orderBy(F.desc("score"), F.asc("doc_id"))).cast("long"))
        return (ranked.join(docs, "doc_id")
                .select(F.col("orig_id").alias("doc_id"),
                        F.round("score", 4).alias("score"), "rank"))
    q["ft_function_score"] = ft_function_score

    def ft_intervals_ordered(s, d):
        """Ordered interval source with maxgaps (Intervals.ordered)."""
        from lucene_1_spark.search.intervals import interval_counts
        se = _searcher(s, d)
        out = interval_counts(se, "sort", "merge", "ordered", max_gaps=3)
        docs = se.reader.docs().select(
            "doc_id", F.col("path").cast("bigint").alias("orig_id"))
        return (out.join(docs, "doc_id")
                .select(F.col("orig_id").alias("doc_id"), "n_intervals"))
    q["ft_intervals_ordered"] = ft_intervals_ordered

    def ft_intervals_ordered3(s, d):
        """n-term ordered interval source (greedy minimal leapfrog)."""
        from lucene_1_spark.search.intervals import ordered_interval_counts
        se = _searcher(s, d)
        out = ordered_interval_counts(se, ["sort", "merge", "query"],
                                      max_gaps=6)
        docs = se.reader.docs().select(
            "doc_id", F.col("path").cast("bigint").alias("orig_id"))
        return (out.join(docs, "doc_id")
                .select(F.col("orig_id").alias("doc_id"), "n_intervals"))
    q["ft_intervals_ordered3"] = ft_intervals_ordered3

    def ft_intervals_unordered(s, d):
        """Unordered n-term minimal windows (Intervals.unordered +
        maxgaps) — vectorized smallest-window sweep."""
        from lucene_1_spark.search.intervals import unordered_interval_counts
        se = _searcher(s, d)
        out = unordered_interval_counts(se, ["sort", "merge", "query"],
                                        max_gaps=8)
        docs = se.reader.docs().select(
            "doc_id", F.col("path").cast("bigint").alias("orig_id"))
        return (out.join(docs, "doc_id")
                .select(F.col("orig_id").alias("doc_id"), "n_intervals"))
    q["ft_intervals_unordered"] = ft_intervals_unordered

    def ft_intervals_containing(s, d):
        """Intervals.containing: ordered(sort..merge) intervals that
        hold an occurrence of 'a'."""
        from lucene_1_spark.search.intervals import containment_counts
        se = _searcher(s, d)
        out = containment_counts(se, ["sort", "merge"], ["a"],
                                 "containing", outer_gaps=3)
        docs = se.reader.docs().select(
            "doc_id", F.col("path").cast("bigint").alias("orig_id"))
        return (out.join(docs, "doc_id")
                .select(F.col("orig_id").alias("doc_id"), "n_intervals"))
    q["ft_intervals_containing"] = ft_intervals_containing

    def ft_intervals_or_containing(s, d):
        """Combinator sources (Intervals.java:97-134): minimal ordered
        (sort..merge) intervals containing an occurrence of
        Intervals.or('query', 'window')."""
        from lucene_1_spark.search.intervals import (containment_counts,
                                                     or_source)
        se = _searcher(s, d)
        out = containment_counts(se, ["sort", "merge"],
                                 or_source("query", "window"),
                                 "containing", outer_gaps=3)
        docs = se.reader.docs().select(
            "doc_id", F.col("path").cast("bigint").alias("orig_id"))
        return (out.join(docs, "doc_id")
                .select(F.col("orig_id").alias("doc_id"), "n_intervals"))
    q["ft_intervals_or_containing"] = ft_intervals_or_containing

    def ft_intervals_not_within(s, d):
        """Intervals.notWithin (Intervals.java:490-494): 'merge'
        occurrences NOT within 2 positions of any 'sort'."""
        from lucene_1_spark.search.intervals import (not_within_source,
                                                     source_interval_counts)
        se = _searcher(s, d)
        out = source_interval_counts(se, not_within_source("merge", 2,
                                                           "sort"))
        docs = se.reader.docs().select(
            "doc_id", F.col("path").cast("bigint").alias("orig_id"))
        return (out.join(docs, "doc_id")
                .select(F.col("orig_id").alias("doc_id"), "n_intervals"))
    q["ft_intervals_not_within"] = ft_intervals_not_within

    def ft_intervals_before(s, d):
        """Intervals.before (Intervals.java:578-581): 'sort'
        occurrences ending before some 'merge' start."""
        from lucene_1_spark.search.intervals import (before_source,
                                                     source_interval_counts)
        se = _searcher(s, d)
        out = source_interval_counts(se, before_source("sort", "merge"))
        docs = se.reader.docs().select(
            "doc_id", F.col("path").cast("bigint").alias("orig_id"))
        return (out.join(docs, "doc_id")
                .select(F.col("orig_id").alias("doc_id"), "n_intervals"))
    q["ft_intervals_before"] = ft_intervals_before

    def mon_match_batch(s, d):
        """Monitor/percolator: registered queries vs the documents batch."""
        from lucene_1_spark.streaming.monitor import Monitor
        m = Monitor(s, analyzer="whitespace")
        m.register("q_and", "+spark +merge")
        m.register("q_not", "window -batch")
        m.register("q_term", "dup")
        m.register("q_phrase", '"sort merge"~1')  # verified on candidates
        m.register("q_notph", 'dup -"sort merge"')   # MUST_NOT phrase
        m.register("q_orph", '"sort merge" window')  # SHOULD phrase
        return m.match_batch(_docs(s, d))
    q["mon_match_batch"] = mon_match_batch

    def mon_complex_batch(s, d):
        """Percolation of ARBITRARY query trees (nested boolean,
        prefix, range): presearcher extracts the conjunctive /
        disjunctive term sets, candidates verified by full tree
        evaluation (TermFilteredPresearcher -> CandidateMatcher)."""
        from lucene_1_spark.streaming.monitor import Monitor
        m = Monitor(s, analyzer="whitespace")
        m.register("q_nested", "+spark +(merge || window)")
        m.register("q_prefix", "win*")              # ANYTOKEN path
        m.register("q_boolpfx", "+dup +win*")
        m.register("q_range", "[merge TO part]")
        return m.match_batch(_docs(s, d))
    q["mon_complex_batch"] = mon_complex_batch

    # ---- counting collectors (§2.3) ----
    q["ft_term_count"] = lambda s, d: (
        _all_matches(s, d, "batch").agg(F.count("*").cast("long").alias("n")))
    q["ft_match_all_count"] = lambda s, d: (
        s.createDataFrame([(int(_searcher(s, d).reader.stats["n_docs"]),)],
                          "n long"))

    def ft_collection_stats(s, d):
        st = _searcher(s, d).reader.stats
        return s.createDataFrame(
            [(st["n_docs"], st["doc_count"], st["sum_total_term_freq"],
              st["sum_doc_freq"])],
            "n_docs long, doc_count long, sum_total_term_freq long, sum_doc_freq long")
    q["ft_collection_stats"] = ft_collection_stats

    # ---- multi-term expansion: prefix/wildcard/fuzzy/range (§2.2) ----
    def _docs_count_for(s, d, predicate) -> DataFrame:
        se = _searcher(s, d)
        terms = se.expand_terms(predicate)
        return se.docs_for_terms(terms).agg(F.count("*").cast("long").alias("n"))

    q["ft_prefix_count"] = lambda s, d: _docs_count_for(
        s, d, F.col("term").startswith("s"))
    q["ft_wildcard_count"] = lambda s, d: _docs_count_for(
        s, d, F.col("term").like("s%t"))
    q["ft_fuzzy_count"] = lambda s, d: _docs_count_for(
        s, d, F.levenshtein(F.col("term"), F.lit("spark")) <= 1)

    def ft_term_range_stats(s, d):
        se = _searcher(s, d)
        return (se.reader.term_stats()
                .filter((F.col("term") >= "m") & (F.col("term") < "t"))
                .select("term", F.col("doc_freq").cast("long").alias("doc_freq"),
                        F.col("total_term_freq").cast("long")
                        .alias("total_term_freq")))
    q["ft_term_range_stats"] = ft_term_range_stats

    def ft_regexp_stats(s, d):
        se = _searcher(s, d)
        return (se.reader.term_stats().filter(F.col("term").rlike("^s.*t$"))
                .select("term", F.col("doc_freq").cast("long").alias("doc_freq")))
    q["ft_regexp_stats"] = ft_regexp_stats

    # ---- facets & grouping (§2.3, §2.5) ----
    def ft_facet_lang(s, d):
        return (_all_matches(s, d, "spark")
                .groupBy("lang").agg(F.count("*").cast("long").alias("n")))
    q["ft_facet_lang"] = ft_facet_lang

    def ft_facet_range_nchars(s, d):
        m = _all_matches(s, d, "spark").select(F.col("orig_id").alias("doc_id"))
        docs = _docs(s, d).select("doc_id", "n_chars")
        return (m.join(docs, "doc_id")
                .groupBy((F.floor(F.col("n_chars") / 100) * 100).cast("long")
                         .alias("bucket_lo"))
                .agg(F.count("*").cast("long").alias("n")))
    q["ft_facet_range_nchars"] = ft_facet_range_nchars

    def ft_taxonomy_facets(s, d):
        """Hierarchical taxonomy counts (FastTaxonomyFacetCounts): docs
        matching 'spark' counted at every prefix of the 2-level facet
        path lang/<n_chars bucket>."""
        from lucene_1_spark.search.facets import taxonomy_facet_counts
        m = _all_matches(s, d, "spark").select(
            F.col("orig_id").alias("doc_id"))
        docs = _docs(s, d).select("doc_id", "lang", "n_chars")
        j = m.join(docs, "doc_id").withColumn(
            "fpath", F.concat_ws(
                "/", F.col("lang"),
                (F.floor(F.col("n_chars") / 200) * 200).cast("long")
                .cast("string")))
        return taxonomy_facet_counts(j, "fpath")
    q["ft_taxonomy_facets"] = ft_taxonomy_facets

    def ft_taxonomy_children(s, d):
        """Drill-down: child buckets under the 'en' taxonomy node."""
        from lucene_1_spark.search.facets import taxonomy_children
        m = _all_matches(s, d, "spark").select(
            F.col("orig_id").alias("doc_id"))
        docs = _docs(s, d).select("doc_id", "lang", "n_chars")
        j = m.join(docs, "doc_id").withColumn(
            "fpath", F.concat_ws(
                "/", F.col("lang"),
                (F.floor(F.col("n_chars") / 200) * 200).cast("long")
                .cast("string")))
        return taxonomy_children(j, "fpath", "en")
    q["ft_taxonomy_children"] = ft_taxonomy_children

    def ft_assoc_facet_sums(s, d):
        """Association facets (facet/taxonomy/
        TaxonomyFacetIntAssociations.java:38 /
        TaxonomyFacetFloatAssociations.java): docs matching 'spark'
        carry (path, value) associations — lang/<lang> weighted by
        n_chars, source/<source> weighted 1 — and the facet result is
        the per-label SUM and MAX of the values, not the doc count."""
        from lucene_1_spark.search.facets import association_facet_aggregates
        m = _all_matches(s, d, "spark").select(
            F.col("orig_id").alias("doc_id"))
        docs = _docs(s, d).select("doc_id", "lang", "source", "n_chars")
        j = m.join(docs, "doc_id").withColumn(
            "assoc", F.array(
                F.struct(
                    F.concat(F.lit("lang/"), F.col("lang")).alias("path"),
                    F.col("n_chars").cast("double").alias("value")),
                F.struct(
                    F.concat(F.lit("source/"),
                             F.col("source")).alias("path"),
                    F.lit(1.0).alias("value"))))
        sums = association_facet_aggregates(j, "assoc", "sum") \
            .withColumnRenamed("total", "total_sum")
        maxs = association_facet_aggregates(j, "assoc", "max") \
            .withColumnRenamed("total", "total_max")
        return sums.join(maxs, "path").select("path", "total_sum",
                                              "total_max")
    q["ft_assoc_facet_sums"] = ft_assoc_facet_sums

    def ft_drill_sideways(s, d):
        """DrillSideways (facet/DrillSideways.java): base 'spark'
        drilled on lang='en' and len_bucket=200 — each dim's counts
        computed with the OTHER dim's filter applied."""
        from lucene_1_spark.search.facets import drill_sideways
        se = _searcher(s, d)
        out = drill_sideways(
            se, "spark", {"lang": "en", "len_bucket": 200},
            stored=["lang", "length"],
            derive={"len_bucket":
                    (F.floor(F.col("length") / 100) * 100).cast("long")})
        frames = []
        for dim in ("lang", "len_bucket"):
            frames.append(out[dim].select(
                F.lit(dim).alias("dim"),
                F.col("value").cast("string").alias("value"), "n"))
        return frames[0].unionByName(frames[1])
    q["ft_drill_sideways"] = ft_drill_sideways

    def ft_group_top2_per_lang(s, d):
        m = _all_matches(s, d, "spark merge window")
        w = W.partitionBy("lang").orderBy(F.desc("score"), F.asc("orig_id"))
        return (m.withColumn("rnk", F.row_number().over(w).cast("long"))
                .filter(F.col("rnk") <= 2)
                .select("lang", F.col("orig_id").alias("doc_id"),
                        F.round("score", 4).alias("score"), "rnk"))
    q["ft_group_top2_per_lang"] = ft_group_top2_per_lang

    # ---- dedup suite over the doubled corpus ----
    def dedup_exact_groups(s, d):
        from lucene_1_spark.pipeline.dedup import exact_duplicates
        return (exact_duplicates(_docs2(s, d))
                .select("digest", F.col("n_dups").cast("long").alias("n_dups"),
                        "keep_doc_id"))
    q["dedup_exact_groups"] = dedup_exact_groups

    def dedup_ngram_jaccard(s, d):
        """Hot-shingle cap active (the 100-TB stop-shingle mitigation):
        shingles shared by > 10k docs leave the universe — chosen far
        above the sf0.1 max shingle df, so results here are unchanged
        while the wired path can no longer go quadratic on boilerplate."""
        from lucene_1_spark.pipeline.dedup import ngram_jaccard_pairs
        return ngram_jaccard_pairs(_docs2(s, d), n=3, threshold=0.9,
                                   max_shingle_df=10_000)
    q["dedup_ngram_jaccard"] = dedup_ngram_jaccard

    def pipe_decontamination(s, d):
        """Train/eval 8-gram overlap (benchmark-leakage check): eval =
        the first 50 docs doc_id-shifted, so every eval doc's twin (and
        any cross-doc boilerplate) must surface."""
        from lucene_1_spark.pipeline.dedup import contamination_overlap
        train = _docs(s, d).select("doc_id", "text")
        evalset = (train.filter(F.col("doc_id") < 50)
                   .select((F.col("doc_id") + 1_000_000).alias("doc_id"),
                           "text"))
        return contamination_overlap(train, evalset, n=8)
    q["pipe_decontamination"] = pipe_decontamination

    def text_repetition(s, d):
        """Intra-doc repeated-3-gram signals (Gopher-style quality
        filter): duplicated-ngram ratio + top-ngram share."""
        from lucene_1_spark.pipeline.textstats import repetition_stats
        return repetition_stats(_docs(s, d), n=3)
    q["text_repetition"] = text_repetition

    def dedup_minhash_lsh(s, d):
        from lucene_1_spark.pipeline.dedup import minhash_lsh_candidates
        return minhash_lsh_candidates(_docs2(s, d), n=3, num_perm=8, bands=4)
    q["dedup_minhash_lsh"] = dedup_minhash_lsh

    def dedup_simhash(s, d):
        from lucene_1_spark.pipeline.dedup import simhash64
        return simhash64(_docs2(s, d))
    q["dedup_simhash"] = dedup_simhash

    # ---- similarity search over embeddings ----
    def sim_cosine_topk(s, d):
        from lucene_1_spark.pipeline.similarity import cosine_topk
        e = _emb(s, d).select("vec_id", F.col("embedding")
                              .cast("array<double>").alias("embedding"))
        qv = [float(x) for x in
              e.filter(F.col("vec_id") == 0).first()["embedding"]]
        return cosine_topk(e, qv, k=10)
    q["sim_cosine_topk"] = sim_cosine_topk

    def sim_near_dup_pairs(s, d):
        """LSH-bucketed near-dup pairs — the 100-TB path (one self-join
        keyed by bucket, not all-pairs); verified against the exact
        O(n^2) baseline by the SQL oracle AND by
        tests/test_pipeline.py."""
        from lucene_1_spark.pipeline.similarity import embedding_near_dup_pairs
        e = _emb(s, d).select("vec_id", "embedding")
        e2 = e.unionByName(e.select((F.col("vec_id") + 1_000_000)
                                    .alias("vec_id"), "embedding"))
        return embedding_near_dup_pairs(e2, threshold=0.98, dim=64)
    q["sim_near_dup_pairs"] = sim_near_dup_pairs

    def sim_semdedup_count(s, d):
        """SemDeDup (Abbas et al. 2023, arXiv:2303.09540), one-pass
        keep-first rule: drop every vector with a LOWER-id near-
        duplicate (cosine >= 0.98); candidates from the LSH-bucketed
        self-join (the 100-TB path).  Runs on the doubled embeddings
        (known duplicates), returns corpus-level audit counts."""
        from lucene_1_spark.pipeline.similarity import semdedup
        e = _emb(s, d).select("vec_id", "embedding")
        e2 = e.unionByName(e.select((F.col("vec_id") + 1_000_000)
                                    .alias("vec_id"), "embedding"))
        kept = semdedup(e2, threshold=0.98, dim=64).count()
        total = e2.count()
        return s.createDataFrame([(total, kept, total - kept)],
                                 "n_total long, n_kept long, n_dropped long")
    q["sim_semdedup_count"] = sim_semdedup_count

    def pii_scrub_totals(s, d):
        """PII scrubbing audit (the C4/CCNet/Dolma-style pre-filter):
        deterministic synthetic PII is injected into documents (doc_id
        % 7 == 0 -> an email, % 11 == 0 -> an IPv4, % 13 == 0 -> a
        phone; both sides of the oracle inject identically), then
        pii_summary counts redactions per kind + docs touched in ONE
        JVM-regex aggregation pass — no Python, no shuffle."""
        from lucene_1_spark.pipeline.scrub import pii_summary
        docs = _docs(s, d).select(
            "doc_id",
            F.concat(
                F.coalesce(F.col("text"), F.lit("")),
                F.when(F.col("doc_id") % 7 == 0,
                       F.concat(F.lit(" contact user"),
                                F.col("doc_id").cast("string"),
                                F.lit("@example.com")))
                .otherwise(F.lit("")),
                F.when(F.col("doc_id") % 11 == 0,
                       F.concat(F.lit(" host 10.0."),
                                (F.col("doc_id") % 256).cast("string"),
                                F.lit(".1"))).otherwise(F.lit("")),
                F.when(F.col("doc_id") % 13 == 0,
                       F.lit(" call +1 555 123 4567")).otherwise(F.lit("")),
            ).alias("text"))
        return pii_summary(docs)
    q["pii_scrub_totals"] = pii_scrub_totals

    def sample_stratified_counts(s, d):
        """Deterministic stratified sampling (domain-mixture control):
        keep en at 50%, fr at 25%, zh at 100%, everything else at 10%,
        decided by a salted md5 hash of doc_id — reproducible on any
        cluster size / partitioning (rand() is neither).  Returns
        per-lang kept counts; the decision is a pushed-down filter."""
        from lucene_1_spark.pipeline.sampling import stratified_sample
        docs = _docs(s, d).select("doc_id", "lang")
        kept = stratified_sample(docs, "lang",
                                 {"en": 0.5, "fr": 0.25, "zh": 1.0},
                                 default_rate=0.1)
        return (kept.groupBy("lang").agg(F.count("*").alias("n_kept"))
                .orderBy("lang"))
    q["sample_stratified_counts"] = sample_stratified_counts

    def pack_sequences_stats(s, d):
        """GPT-style sequence packing: documents in doc_id order are
        concatenated into a token stream cut every 512 tokens; a doc
        belongs to the sequence where it STARTS (one window prefix-sum,
        per-shard parallel at scale via shard_col).  Returns the first
        15 sequences' fill stats + is deterministic by construction."""
        from lucene_1_spark.pipeline.sampling import pack_summary
        docs = _docs(s, d).select("doc_id", "text")
        return (pack_summary(docs, capacity=512)
                .orderBy("seq_id").limit(15)
                .select(F.col("seq_id").cast("long"),
                        F.col("n_docs").cast("long"),
                        F.col("n_tokens").cast("long")))
    q["pack_sequences_stats"] = pack_sequences_stats

    def sim_ann_topk(s, d):  # approximate — rows-only check (no oracle)
        """Auto recall policy: bits from N (expected bucket ~64),
        8 tables x multiprobe 2 (see ann_topk docstring); recall@10 is
        quantified per-round in BENCH (clustered AND random fixtures)."""
        from lucene_1_spark.pipeline.similarity import ann_topk
        e = _emb(s, d).select("vec_id", F.col("embedding")
                              .cast("array<double>").alias("embedding"))
        qv = [float(x) for x in
              e.filter(F.col("vec_id") == 0).first()["embedding"]]
        return ann_topk(e, qv, k=10)
    q["sim_ann_topk"] = sim_ann_topk

    def sim_hnsw_topk(s, d):  # approximate — rows-only check (no oracle)
        """Per-partition HNSW graphs (Lucene99HnswVectorsFormat's
        per-segment model): deterministic hash-level graphs built via
        applyInPandas, beam search per graph + TakeOrdered merge;
        recall@10 quantified per-round in BENCH on the clustered AND
        random fixtures."""
        from lucene_1_spark.pipeline.hnsw import hnsw_build, hnsw_search
        e = _emb(s, d).select("vec_id", F.col("embedding")
                              .cast("array<double>").alias("embedding"))
        qv = [float(x) for x in
              e.filter(F.col("vec_id") == 0).first()["embedding"]]
        g = hnsw_build(e, m=8, ef_construction=64, n_partitions=4)
        return hnsw_search(g, qv, k=10, ef=64)
    q["sim_hnsw_topk"] = sim_hnsw_topk

    def sim_hnsw_quant_topk(s, d):  # approximate — rows-only (no oracle)
        """int8 scalar-quantized HNSW + full-precision rescore
        (Lucene99HnswScalarQuantizedVectorsFormat.java analog,
        pipeline/quantize.py): the graph table stores array<tinyint>
        vectors (~8x smaller), beam distances run on dequantized
        approximations, and the global top k*3 candidates are
        re-scored with exact cosine against the base table."""
        from lucene_1_spark.pipeline.hnsw import hnsw_build, hnsw_search
        from lucene_1_spark.pipeline.quantize import scalar_quantize_fit
        e = _emb(s, d).select("vec_id", F.col("embedding")
                              .cast("array<double>").alias("embedding"))
        qv = [float(x) for x in
              e.filter(F.col("vec_id") == 0).first()["embedding"]]
        mn, mx = scalar_quantize_fit(e)
        g = hnsw_build(e, m=8, ef_construction=64, n_partitions=4,
                       quant=(mn, mx))
        return hnsw_search(g, qv, k=10, ef=64, quant=(mn, mx), rescore=e)
    q["sim_hnsw_quant_topk"] = sim_hnsw_quant_topk

    def knn_filtered_topk(s, d):
        """Pre-filtered kNN (KnnFloatVectorQuery.java:46): exact cosine
        top-k among docs whose text contains 'spark' (vec_id == doc_id
        in the test tables) — the filter restricts BEFORE top-k."""
        from lucene_1_spark.pipeline.similarity import knn_filtered_topk
        e = _emb(s, d).select("vec_id", F.col("embedding")
                              .cast("array<double>").alias("embedding"))
        qv = [float(x) for x in
              e.filter(F.col("vec_id") == 0).first()["embedding"]]
        allowed = _all_matches(s, d, "spark").select(
            F.col("orig_id").alias("vec_id"))
        return knn_filtered_topk(e, qv, k=10, allowed=allowed)
    q["knn_filtered_topk"] = knn_filtered_topk

    def sim_ivf_full_probe(s, d):
        """IVF with nprobe = n_centroids scans every list — must equal
        the exact cosine top-k (same oracle as sim_cosine_topk)."""
        from lucene_1_spark.pipeline.similarity import ivf_ann_topk, ivf_fit
        e = _emb(s, d).select("vec_id", F.col("embedding")
                              .cast("array<double>").alias("embedding"))
        qv = [float(x) for x in
              e.filter(F.col("vec_id") == 0).first()["embedding"]]
        cents = ivf_fit(e, n_centroids=8, iters=2)
        return ivf_ann_topk(e, qv, cents, k=10, nprobe=8)
    q["sim_ivf_full_probe"] = sim_ivf_full_probe

    def sim_lsh_index_topk(s, d):
        """Persisted-bucket LSH serving (lsh_assign -> lsh_index_topk,
        the partition-pruned L-table layout): probing ALL 2^bits
        buckets makes the candidate set exhaustive, so the result must
        equal the exact cosine top-k — proving the index/probe plumbing
        end-to-end in the oracle gate (partial-probe pruning is plan-
        audited in tools/explain_audit.py + pytest)."""
        from lucene_1_spark.pipeline.similarity import (lsh_assign,
                                                        lsh_index_topk)
        e = _emb(s, d).select("vec_id", F.col("embedding")
                              .cast("array<double>").alias("embedding"))
        qv = [float(x) for x in
              e.filter(F.col("vec_id") == 0).first()["embedding"]]
        dim = len(qv)
        idx = lsh_assign(e, dim=dim, bits=4, tables=2)
        return lsh_index_topk(idx, qv, k=10, bits=4, tables=2,
                              multiprobe=15)  # all 16 buckets probed
    q["sim_lsh_index_topk"] = sim_lsh_index_topk

    def sim_ivf_ann_topk(s, d):  # approximate — rows-only (no oracle)
        """IVF partial probe (nprobe=2 of 8 lists, ~1/4 scan)."""
        from lucene_1_spark.pipeline.similarity import ivf_ann_topk, ivf_fit
        e = _emb(s, d).select("vec_id", F.col("embedding")
                              .cast("array<double>").alias("embedding"))
        qv = [float(x) for x in
              e.filter(F.col("vec_id") == 0).first()["embedding"]]
        cents = ivf_fit(e, n_centroids=8, iters=2)
        return ivf_ann_topk(e, qv, cents, k=10, nprobe=2)
    q["sim_ivf_ann_topk"] = sim_ivf_ann_topk

    # ---- text analysis ----
    def text_token_count(s, d):
        from lucene_1_spark.pipeline.textstats import token_count
        return (token_count(_docs(s, d))
                .select("doc_id", F.col("n_tokens").cast("long").alias("n_tokens"),
                        F.col("n_chars_computed").cast("long")
                        .alias("n_chars_computed")))
    q["text_token_count"] = text_token_count

    def text_quality(s, d):
        from lucene_1_spark.pipeline.textstats import quality_score
        return quality_score(_docs(s, d))
    q["text_quality"] = text_quality

    def text_language_id(s, d):
        from lucene_1_spark.pipeline.textstats import language_id
        return language_id(_docs(s, d))
    q["text_language_id"] = text_language_id

    def text_fingerprint(s, d):
        from lucene_1_spark.pipeline.textstats import fingerprint
        return fingerprint(_docs(s, d)).select("doc_id", "fingerprint")
    q["text_fingerprint"] = text_fingerprint

    # ---- points/range predicate over events (§2.2 PointRangeQuery) ----
    q["points_range_count"] = lambda s, d: (
        s.read.parquet(os.path.join(d, "events.parquet"))
        .filter(F.col("value").between(10.0, 50.0))
        .agg(F.count("*").cast("long").alias("n")))

    # ---- multimodal plumbing (decode stubbed) — rows-only check ----
    def mm_image_features(s, d):
        from lucene_1_spark.pipeline.multimodal import (image_features,
                                                        synthetic_media)
        return image_features(synthetic_media(s, n=32), fake=True)
    q["mm_image_features"] = mm_image_features

    def mm_audio_features(s, d):
        from lucene_1_spark.pipeline.multimodal import (audio_features,
                                                        synthetic_media)
        return audio_features(synthetic_media(s, n=32), fake=True)
    q["mm_audio_features"] = mm_audio_features

    # ---- CJK bigram analyzer end-to-end (§2.8; CJKAnalyzer.java:92) ----
    def ft_cjk_term_topk(s, d):
        """BM25 top-10 for one Han BIGRAM term over the CJK-ified
        corpus — exercises the full CJKAnalyzer chain (width fold,
        per-codepoint Han tokens, bigramming) in the index build."""
        se = _cjk_searcher(s, d)
        top = se.search_df("与世", k=10).withColumn(
            "rank", F.row_number().over(
                W.orderBy(F.desc("score"), F.asc("doc_id"))).cast("long"))
        docs = se.reader.docs().select(
            "doc_id", F.col("path").cast("bigint").alias("orig_id"))
        return (top.join(docs, "doc_id")
                .select(F.col("orig_id").alias("doc_id"),
                        F.round("score", 4).alias("score"), "rank"))
    q["ft_cjk_term_topk"] = ft_cjk_term_topk

    def ft_cjk_unigram_count(s, d):
        """Lone CJK codepoints emit unigrams (CJKBigramFilter
        flushUnigram): docs containing the isolated single-char run
        for 'a' (-> U+4E00)."""
        se = _cjk_searcher(s, d)
        return s.createDataFrame(
            [(se.count("一"),)], "n long")
    q["ft_cjk_unigram_count"] = ft_cjk_unigram_count

    def ft_thai_seg_topk(s, d):
        """BM25 top-10 for one Thai word over the Thai-ified corpus —
        the dictionary segmenter (analysis/segment.py, the
        ThaiAnalyzer.java:38 / Kuromoji JapaneseAnalyzer.java:43
        analog) must recover word boundaries from unspaced text; the
        oracle scores the generative segmentation."""
        se = _thai_searcher(s, d)
        top = se.search_df(_thai_word("spark"), k=10).withColumn(
            "rank", F.row_number().over(
                W.orderBy(F.desc("score"), F.asc("doc_id"))).cast("long"))
        docs = se.reader.docs().select(
            "doc_id", F.col("path").cast("bigint").alias("orig_id"))
        return (top.join(docs, "doc_id")
                .select(F.col("orig_id").alias("doc_id"),
                        F.round("score", 4).alias("score"), "rank"))
    q["ft_thai_seg_topk"] = ft_thai_seg_topk

    def ft_thai_seg_count(s, d):
        """Docs containing the segmented word for 'data' — counts are
        only right if every unspaced run segments exactly."""
        se = _thai_searcher(s, d)
        return s.createDataFrame([(se.count(_thai_word("data")),)], "n long")
    q["ft_thai_seg_count"] = ft_thai_seg_count

    # ----- analysis/common extras: HTML strip, path hierarchy,
    # pattern tokenizer, reverse (leading wildcard), common grams,
    # compound-word decomposition (analysis/extras.py) -----

    def ft_html_strip_count(s, d):
        """HTMLStripCharFilter end to end (HTMLStripCharFilter.java):
        documents wrapped in markup with a script body, a comment and
        an encoded entity; the index must drop tag/script/comment
        content ('zzhidden' count 0), keep the post-tag text ('tail'
        count = all docs), decode entities ('kept' count = all docs),
        and tokenize the real text identically to the raw oracle."""
        from lucene_1_spark.search.query import TermQuery
        content = F.concat(
            F.lit('<div class="x">'),
            F.substring(F.coalesce(F.col("text"), F.lit("")), 1, 80),
            F.lit('</div><script>alert("zzhidden")</script>'
                  '<!-- zzcomment --> &lt;kept&gt; tail'))
        se = _aux_searcher(s, d, "html", "html:standard", content)
        return s.createDataFrame(
            [(se.count(TermQuery("zzhidden")), se.count(TermQuery("tail")),
              se.count(TermQuery("kept")), se.count(TermQuery("spark")))],
            "n_hidden long, n_tail long, n_kept long, n_spark long")
    q["ft_html_strip_count"] = ft_html_strip_count

    def ft_path_hierarchy_count(s, d):
        """PathHierarchyTokenizer (PathHierarchyTokenizer.java:31):
        each doc's synthetic path emits every prefix as a term, so a
        drill-down to any level is ONE TermQuery."""
        from lucene_1_spark.search.query import TermQuery
        content = F.concat(
            F.lit("/r"), (F.col("doc_id") % 3).cast("string"),
            F.lit("/s"), (F.col("doc_id") % 5).cast("string"),
            F.lit("/f"), F.col("doc_id").cast("string"))
        se = _aux_searcher(s, d, "path", "path", content)
        return s.createDataFrame(
            [(se.count(TermQuery("/r1")), se.count(TermQuery("/r2/s3")))],
            "n_r1 long, n_r2_s3 long")
    q["ft_path_hierarchy_count"] = ft_path_hierarchy_count

    def ft_reverse_wildcard_count(s, d):
        """ReverseStringFilter leading-wildcard trick
        (ReverseStringFilter.java:36): the index stores reversed
        terms, so '*ream' rewrites to PrefixQuery('maer') — a
        dictionary range scan instead of a full-vocabulary regex."""
        from lucene_1_spark.search.query import PrefixQuery, TermQuery
        content = F.substring(F.coalesce(F.col("text"), F.lit("")), 1, 120)
        se = _aux_searcher(s, d, "rev", "reverse:standard", content)
        return s.createDataFrame(
            [(se.count(PrefixQuery("maer")), se.count(TermQuery("kraps")))],
            "n_suffix_ream long, n_spark long")
    q["ft_reverse_wildcard_count"] = ft_reverse_wildcard_count

    def ft_commongrams_count(s, d):
        """CommonGramsFilter (CommonGramsFilter.java:42): pairs
        touching a classic stopword also index as one joined bigram
        term, so a stopword phrase is a single-term lookup."""
        from lucene_1_spark.search.query import TermQuery
        content = F.substring(F.coalesce(F.col("text"), F.lit("")), 1, 120)
        se = _aux_searcher(s, d, "cg", "commongrams:standard", content)
        return s.createDataFrame(
            [(se.count(TermQuery("the_customer")),
              se.count(TermQuery("a_small")))],
            "n_the_customer long, n_a_small long")
    q["ft_commongrams_count"] = ft_commongrams_count

    def ft_compound_split_count(s, d):
        """DictionaryCompoundWordTokenFilter
        (DictionaryCompoundWordTokenFilter.java:38): compounds keep
        the original AND index every dictionary subword at the same
        position, so TermQuery('ball') finds both softball and
        basketball docs."""
        from lucene_1_spark.search.query import TermQuery
        base = os.path.join(tempfile.gettempdir(), "l1s_driver_comp_v1")
        os.makedirs(base, exist_ok=True)
        dict_path = os.path.join(base, "words.txt")
        if not os.path.exists(dict_path):
            with open(dict_path, "w", encoding="utf-8") as fh:
                fh.write("soft\nball\nbasket\ncat\nfish\n")
        content = (F.when(F.col("doc_id") % 3 == 0,
                          F.lit("softball practice"))
                   .when(F.col("doc_id") % 3 == 1,
                         F.lit("basketball game"))
                   .otherwise(F.lit("catfish pond")))
        se = _aux_searcher(s, d, "comp",
                           f"compound:standard:{dict_path}", content)
        return s.createDataFrame(
            [(se.count(TermQuery("ball")), se.count(TermQuery("softball")),
              se.count(TermQuery("fish")))],
            "n_ball long, n_softball long, n_fish long")
    q["ft_compound_split_count"] = ft_compound_split_count

    def ft_pattern_token_count(s, d):
        """PatternTokenizer match mode (PatternTokenizer.java:43,
        group 0): only regex matches become terms — hashtag extraction
        over synthetic tags, case-folded at index time."""
        from lucene_1_spark.search.query import TermQuery
        content = F.concat(
            F.lit("#t"), (F.col("doc_id") % 7).cast("string"),
            F.lit(" filler words #T"),
            (F.col("doc_id") % 11).cast("string"))
        se = _aux_searcher(s, d, "pat", r"pattern:#\w+", content)
        return s.createDataFrame(
            [(se.count(TermQuery("#t3")), se.count(TermQuery("#t10")))],
            "n_t3 long, n_t10 long")
    q["ft_pattern_token_count"] = ft_pattern_token_count

    def ft_combined_field_topk(s, d):
        """CombinedFieldQuery / BM25F-simplified (sandbox/search/
        CombinedFieldQuery.java:74-88,303-352): 'spark' scored against
        the synthetic combination of content (w=1) and head (w=2) —
        weighted tf sum, weighted length norm, max doc_freq,
        weight-merged collection stats, ONE BM25 evaluation."""
        from lucene_1_spark.search.query import CombinedFieldQuery
        se = _searcher(s, d)
        qy = CombinedFieldQuery(("spark",),
                                (("content", 1.0), ("head", 2.0)))
        top = se.search_df(qy, k=10).withColumn(
            "rank", F.row_number().over(
                W.orderBy(F.desc("score"), F.asc("doc_id"))).cast("long"))
        return _orig_id(top, se).select(
            F.col("orig_id").alias("doc_id"),
            F.round("score", 4).alias("score"), "rank")
    q["ft_combined_field_topk"] = ft_combined_field_topk

    def ft_feature_rank_topk(s, d):
        """FeatureField / FeatureQuery (document/FeatureField.java:
        240-470): a static rank feature (deterministic in doc_id,
        attached as a doc_id-keyed side table) folded into the text
        score as a SHOULD clause — score = bm25('spark') +
        2*saturation(rankf, pivot=8).  Feature values are integers
        <= 32 so the reference's tf-encoding quantization is the
        identity and the oracle is closed-form."""
        from lucene_1_spark.index import IndexReader
        from lucene_1_spark.index.maintenance import attach_features
        from lucene_1_spark.search import IndexSearcher
        from lucene_1_spark.search.query import (BooleanQuery, Clause,
                                                 FeatureQuery, Occur,
                                                 TermQuery)
        se = _searcher(s, d)
        feats = se.reader.features()
        if feats is None or "rankf" not in feats.columns:
            ids = se.reader.docs().select(
                "doc_id",
                ((F.col("path").cast("bigint") % 31) + 1)
                .cast("double").alias("rankf"))
            attach_features(s, se.reader.dir, ids)
            se = IndexSearcher(IndexReader(s, se.reader.dir))
            _SEARCHERS[os.path.abspath(d)] = se
        qy = BooleanQuery((
            Clause(TermQuery("spark"), Occur.MUST),
            Clause(FeatureQuery("rankf", "saturation", weight=2.0,
                                pivot=8.0), Occur.SHOULD)))
        top = se.search_df(qy, k=10).withColumn(
            "rank", F.row_number().over(
                W.orderBy(F.desc("score"), F.asc("doc_id"))).cast("long"))
        return _orig_id(top, se).select(
            F.col("orig_id").alias("doc_id"),
            F.round("score", 4).alias("score"), "rank")
    q["ft_feature_rank_topk"] = ft_feature_rank_topk

    # The driver's oracle checks at most ~50 entries per round, in
    # registry order: lead with (a) entries NEW this round and (b) the
    # entries no driver round had checked before round 3's judge ran
    # them manually, so every entry gets driver coverage across rounds.
    priority = [
        "ft_combined_field_topk", "ft_feature_rank_topk",  # new r5
        "ft_html_strip_count", "ft_path_hierarchy_count",   # new r5
        "ft_reverse_wildcard_count", "ft_commongrams_count",  # new r5
        "ft_compound_split_count", "ft_pattern_token_count",  # new r5
        "ft_multiphrase_topk", "ft_multiphrase_sloppy_topk",  # new r5
        "ft_bg_stem_topk",                                 # new r5
        "geo_shape_box_counts", "geo_shape_polygon_count",  # new r5
        "ft_assoc_facet_sums",                             # new r5
        "ft_thai_seg_topk", "ft_thai_seg_count",           # new r5
        "ft_suggest_analyzing", "ft_suggest_fuzzy_phrase",  # new r5
        "ft_lv_stem_topk",                                 # new r5
        "ft_dismax_topk", "ft_term_in_set",                # new r4
        "ft_more_like_this", "ft_spell_suggest",           # new r4
        "geo_distance_topk", "geo_bbox_count",             # new r4
        "geo_radius_count", "geo_polygon_count",           # new r4
        "ft_multifield_dismax", "classify_naive_bayes",    # new r4
        "dv_update_range_count", "snap_point_in_time",     # new r4
        "ft_join_query", "ft_term_vector",                 # new r4
        "mon_object_batch", "text_perplexity",             # new r4
        "ft_edge_autocomplete_count", "ft_ru_stem_topk",   # new r4
        "ft_folded_topk", "ft_ar_stem_topk",               # new r4
        "ft_cjk_term_topk", "ft_cjk_unigram_count",        # new r4
        "mon_complex_batch",                               # new r4
        "ft_intervals_not_within", "ft_intervals_before",  # new r4
        "ft_taxonomy_facets", "ft_taxonomy_children",      # unchecked <r3
        "ft_drill_sideways", "pipe_decontamination",
        "text_repetition", "knn_filtered_topk", "mm_audio_features",
        "sim_ann_topk",
    ]
    ordered = {k: q[k] for k in priority if k in q}
    ordered.update({k: v for k, v in q.items() if k not in ordered})
    return ordered


def oracle_sql() -> dict[str, str]:
    o: dict[str, str] = {}

    o["ft_term_topk"] = _bm25_sql(["spark"])
    # folding round-trip: the accented index answers the PLAIN oracle
    o["ft_folded_topk"] = _bm25_sql(["spark"])
    o["ft_rare_term_topk"] = _bm25_sql(["dup"])
    o["ft_or_topk"] = _bm25_sql(["spark", "merge", "window"])
    o["ft_and_topk"] = _bm25_sql(["spark", "merge"],
                                 extra_having="count(DISTINCT tf.term) = 2")
    o["ft_mixed_topk"] = _bm25_sql(
        ["spark", "window"],
        extra_having="max(CASE WHEN tf.term = 'spark' THEN 1 ELSE 0 END) = 1")
    o["ft_must_not_topk"] = _bm25_sql(["spark"], exclude_term="merge")
    o["ft_msm_topk"] = _bm25_sql(["spark", "merge", "window"],
                                 extra_having="count(DISTINCT tf.term) >= 2")
    o["ft_search_after"] = _bm25_sql(["spark", "merge", "window"], rank_lo=11)

    # FILTER: doc must contain 'merge', but only 'spark' scores
    o["ft_filter_topk"] = _bm25_sql(["spark"], require_term="merge")
    # scored multi-term expansions
    o["ft_prefix_topk"] = _bm25_sql(None, term_pred="tf.term LIKE 's%'")
    o["ft_wildcard_topk"] = _bm25_sql(None, term_pred="tf.term LIKE 's_a%'")
    o["ft_fuzzy_topk"] = _bm25_sql(
        None, term_pred="levenshtein(tf.term, 'bigg') <= 2",
        weight_factor=("greatest(0.0, 1.0 - levenshtein(tf.term, 'bigg')"
                       " / least(length(tf.term), 4))"))

    # sloppy phrase (slop=2): pairs within displacement 2, each weighted
    # 1/(1+|displacement|); scored as one pseudo-term
    o["ft_sloppy_phrase_topk"] = f"""
WITH {_BM25_CTES},
ordered AS (
  SELECT doc_id, term, ord FROM (
    SELECT doc_id,
           unnest(list_filter(string_split_regex(lower(text), '\\s+'),
                              x -> x <> '')) AS term,
           generate_subscripts(list_filter(string_split_regex(lower(text),
                              '\\s+'), x -> x <> ''), 1) AS ord
    FROM documents WHERE text IS NOT NULL)),
pairs AS (
  SELECT sp.doc_id, (mp.ord - sp.ord - 1) AS e
  FROM (SELECT doc_id, ord FROM ordered WHERE term = 'sort') sp
  JOIN (SELECT doc_id, ord FROM ordered WHERE term = 'merge') mp
    ON sp.doc_id = mp.doc_id
  WHERE abs(mp.ord - sp.ord - 1) <= 2),
pf AS (SELECT doc_id, sum(1.0 / (1 + abs(e))) AS pfreq
       FROM pairs GROUP BY doc_id),
w AS (
  SELECT sum(ln(1 + (st.n - df.dfreq + 0.5) / (df.dfreq + 0.5))) AS wt
  FROM df CROSS JOIN st WHERE df.term IN ('sort', 'merge')),
sc AS (
  SELECT pf.doc_id,
         w.wt * pf.pfreq
         / (pf.pfreq + {K1} * (1 - {B} + {B} * dl.len / (st.tot / st.n))) AS s
  FROM pf JOIN dl ON pf.doc_id = dl.doc_id CROSS JOIN st CROSS JOIN w)
SELECT doc_id, round(s, 4) AS score, rank FROM (
  SELECT doc_id, s, row_number() OVER (ORDER BY s DESC, doc_id ASC) AS rank
  FROM sc) WHERE rank <= 10"""

    # MultiPhraseQuery: slot unions (sort|hash) -> (merge|join);
    # exact: pf = count of anchor positions with a slot-1 member at +1;
    # weight = sum of idf over ALL member terms
    o["ft_multiphrase_topk"] = f"""
WITH {_BM25_CTES},
ordered AS (
  SELECT doc_id, term, ord FROM (
    SELECT doc_id,
           unnest(list_filter(string_split_regex(lower(text), '\\s+'),
                              x -> x <> '')) AS term,
           generate_subscripts(list_filter(string_split_regex(lower(text),
                              '\\s+'), x -> x <> ''), 1) AS ord
    FROM documents WHERE text IS NOT NULL)),
s0 AS (SELECT DISTINCT doc_id, ord FROM ordered
       WHERE term IN ('sort', 'hash')),
s1 AS (SELECT DISTINCT doc_id, ord FROM ordered
       WHERE term IN ('merge', 'join')),
pf AS (SELECT s0.doc_id, count(*)::DOUBLE AS pfreq
       FROM s0 JOIN s1 ON s1.doc_id = s0.doc_id AND s1.ord = s0.ord + 1
       GROUP BY s0.doc_id),
w AS (
  SELECT sum(ln(1 + (st.n - df.dfreq + 0.5) / (df.dfreq + 0.5))) AS wt
  FROM df CROSS JOIN st WHERE df.term IN ('sort', 'hash', 'merge', 'join')),
sc AS (
  SELECT pf.doc_id,
         w.wt * pf.pfreq
         / (pf.pfreq + {K1} * (1 - {B} + {B} * dl.len / (st.tot / st.n))) AS s
  FROM pf JOIN dl ON pf.doc_id = dl.doc_id CROSS JOIN st CROSS JOIN w)
SELECT doc_id, round(s, 4) AS score, rank FROM (
  SELECT doc_id, s, row_number() OVER (ORDER BY s DESC, doc_id ASC) AS rank
  FROM sc) WHERE rank <= 10"""

    # sloppy (slop=2) two-slot multiphrase: all in-slop union-position
    # pairs, each weighted 1/(1+|displacement|)
    o["ft_multiphrase_sloppy_topk"] = f"""
WITH {_BM25_CTES},
ordered AS (
  SELECT doc_id, term, ord FROM (
    SELECT doc_id,
           unnest(list_filter(string_split_regex(lower(text), '\\s+'),
                              x -> x <> '')) AS term,
           generate_subscripts(list_filter(string_split_regex(lower(text),
                              '\\s+'), x -> x <> ''), 1) AS ord
    FROM documents WHERE text IS NOT NULL)),
s0 AS (SELECT DISTINCT doc_id, ord FROM ordered
       WHERE term IN ('sort', 'hash')),
s1 AS (SELECT DISTINCT doc_id, ord FROM ordered
       WHERE term IN ('merge', 'join')),
pairs AS (
  SELECT s0.doc_id, (s1.ord - s0.ord - 1) AS e
  FROM s0 JOIN s1 ON s1.doc_id = s0.doc_id
  WHERE abs(s1.ord - s0.ord - 1) <= 2),
pf AS (SELECT doc_id, sum(1.0 / (1 + abs(e))) AS pfreq
       FROM pairs GROUP BY doc_id),
w AS (
  SELECT sum(ln(1 + (st.n - df.dfreq + 0.5) / (df.dfreq + 0.5))) AS wt
  FROM df CROSS JOIN st WHERE df.term IN ('sort', 'hash', 'merge', 'join')),
sc AS (
  SELECT pf.doc_id,
         w.wt * pf.pfreq
         / (pf.pfreq + {K1} * (1 - {B} + {B} * dl.len / (st.tot / st.n))) AS s
  FROM pf JOIN dl ON pf.doc_id = dl.doc_id CROSS JOIN st CROSS JOIN w)
SELECT doc_id, round(s, 4) AS score, rank FROM (
  SELECT doc_id, s, row_number() OVER (ORDER BY s DESC, doc_id ASC) AS rank
  FROM sc) WHERE rank <= 10"""

    # n-term sloppy phrase (slop=3): each 'sort' occurrence anchors at
    # most one match; slots 'merge' (+1) and 'query' (+2) take their
    # minimal in-slop |displacement|; weight 1/(1 + d1 + d2)
    o["ft_sloppy_phrase3_topk"] = f"""
WITH {_BM25_CTES},
ordered AS (
  SELECT doc_id, term, ord FROM (
    SELECT doc_id,
           unnest(list_filter(string_split_regex(lower(text), '\\s+'),
                              x -> x <> '')) AS term,
           generate_subscripts(list_filter(string_split_regex(lower(text),
                              '\\s+'), x -> x <> ''), 1) AS ord
    FROM documents WHERE text IS NOT NULL)),
anch AS (SELECT doc_id, ord FROM ordered WHERE term = 'sort'),
d1 AS (SELECT a.doc_id, a.ord, min(abs(m.ord - a.ord - 1)) AS d
       FROM anch a JOIN ordered m
         ON m.doc_id = a.doc_id AND m.term = 'merge'
        AND abs(m.ord - a.ord - 1) <= 3 GROUP BY 1, 2),
d2 AS (SELECT a.doc_id, a.ord, min(abs(m.ord - a.ord - 2)) AS d
       FROM anch a JOIN ordered m
         ON m.doc_id = a.doc_id AND m.term = 'query'
        AND abs(m.ord - a.ord - 2) <= 3 GROUP BY 1, 2),
pf AS (SELECT a.doc_id, sum(1.0 / (1 + d1.d + d2.d)) AS pfreq
       FROM anch a
       JOIN d1 ON a.doc_id = d1.doc_id AND a.ord = d1.ord
       JOIN d2 ON a.doc_id = d2.doc_id AND a.ord = d2.ord
       GROUP BY a.doc_id),
w AS (
  SELECT sum(ln(1 + (st.n - df.dfreq + 0.5) / (df.dfreq + 0.5))) AS wt
  FROM df CROSS JOIN st WHERE df.term IN ('sort', 'merge', 'query')),
sc AS (
  SELECT pf.doc_id,
         w.wt * pf.pfreq
         / (pf.pfreq + {K1} * (1 - {B} + {B} * dl.len / (st.tot / st.n))) AS s
  FROM pf JOIN dl ON pf.doc_id = dl.doc_id CROSS JOIN st CROSS JOIN w)
SELECT doc_id, round(s, 4) AS score, rank FROM (
  SELECT doc_id, s, row_number() OVER (ORDER BY s DESC, doc_id ASC) AS rank
  FROM sc) WHERE rank <= 10"""

    # function score: bm25('spark') * ln(1 + token length)
    o["ft_function_score"] = f"""
WITH {_BM25_CTES},
sc AS (
  SELECT tf.doc_id, sum({_score_expr()}) * ln(1 + dl.len) AS s
  FROM tf JOIN dl ON tf.doc_id = dl.doc_id
  JOIN df ON tf.term = df.term CROSS JOIN st
  WHERE tf.term = 'spark'
  GROUP BY tf.doc_id, dl.len
)
SELECT doc_id, round(s, 4) AS score, rank FROM (
  SELECT doc_id, s, row_number() OVER (ORDER BY s DESC, doc_id ASC) AS rank
  FROM sc) WHERE rank <= 10"""

    # ordered minimal intervals (sort ... merge, <=3 gaps): for each
    # 'merge' the closest preceding 'sort'; per 'sort' keep the shortest
    o["ft_intervals_ordered"] = """
WITH ordered AS (
  SELECT doc_id, term, ord FROM (
    SELECT doc_id,
           unnest(list_filter(string_split_regex(lower(text), '\\s+'),
                              x -> x <> '')) AS term,
           generate_subscripts(list_filter(string_split_regex(lower(text),
                              '\\s+'), x -> x <> ''), 1) AS ord
    FROM documents WHERE text IS NOT NULL)),
A AS (SELECT doc_id, ord FROM ordered WHERE term = 'sort'),
B AS (SELECT doc_id, ord FROM ordered WHERE term = 'merge'),
pairs AS (
  SELECT B.doc_id, B.ord AS b, max(A.ord) AS a
  FROM B JOIN A ON A.doc_id = B.doc_id AND A.ord < B.ord
  GROUP BY B.doc_id, B.ord),
minimal AS (SELECT doc_id, a, min(b) AS b FROM pairs GROUP BY doc_id, a)
SELECT doc_id, count(*)::BIGINT AS n_intervals
FROM minimal WHERE b - a - 1 <= 3 GROUP BY doc_id"""

    # n-term ordered intervals: greedy chain start -> smallest later
    # 'merge' -> smallest later 'query'; minimal = last start per
    # distinct end; gaps = (end - start + 1) - 3
    o["ft_intervals_ordered3"] = """
WITH ordered AS (
  SELECT doc_id, term, ord FROM (
    SELECT doc_id,
           unnest(list_filter(string_split_regex(lower(text), '\\s+'),
                              x -> x <> '')) AS term,
           generate_subscripts(list_filter(string_split_regex(lower(text),
                              '\\s+'), x -> x <> ''), 1) AS ord
    FROM documents WHERE text IS NOT NULL)),
anch AS (SELECT doc_id, ord AS s FROM ordered WHERE term = 'sort'),
c1 AS (SELECT a.doc_id, a.s, min(m.ord) AS p1
       FROM anch a JOIN ordered m
         ON m.doc_id = a.doc_id AND m.term = 'merge' AND m.ord > a.s
       GROUP BY 1, 2),
c2 AS (SELECT c1.doc_id, c1.s, min(m.ord) AS e
       FROM c1 JOIN ordered m
         ON m.doc_id = c1.doc_id AND m.term = 'query' AND m.ord > c1.p1
       GROUP BY 1, 2),
minimal AS (
  SELECT doc_id, s, e FROM (
    SELECT doc_id, s, e,
           lead(e) OVER (PARTITION BY doc_id ORDER BY s) AS ne
    FROM c2) WHERE ne IS NULL OR ne <> e)
SELECT doc_id, count(*)::BIGINT AS n_intervals
FROM minimal WHERE (e - s + 1) - 3 <= 6 GROUP BY doc_id"""

    # unordered minimal 3-term windows (<=8 gaps): the smallest-window
    # sweep relationally — when position s is a window minimum, each
    # term's head is its smallest position >= s; window end = max of
    # heads; minimal = no later window with e' <= e (strict suffix-min)
    o["ft_intervals_unordered"] = """
WITH ordered AS (
  SELECT doc_id, term, ord FROM (
    SELECT doc_id,
           unnest(list_filter(string_split_regex(lower(text), '\\s+'),
                              x -> x <> '')) AS term,
           generate_subscripts(list_filter(string_split_regex(lower(text),
                              '\\s+'), x -> x <> ''), 1) AS ord
    FROM documents WHERE text IS NOT NULL)),
P AS (SELECT doc_id, ord FROM ordered
      WHERE term IN ('sort', 'merge', 'query')),
nxt AS (
  SELECT p.doc_id, p.ord AS s, o.term, min(o.ord) AS nx
  FROM P p JOIN ordered o
    ON o.doc_id = p.doc_id AND o.ord >= p.ord
   AND o.term IN ('sort', 'merge', 'query')
  GROUP BY 1, 2, 3),
w AS (SELECT doc_id, s, max(nx) AS e FROM nxt GROUP BY 1, 2
      HAVING count(*) = 3),
mn AS (SELECT doc_id, s, e,
        min(e) OVER (PARTITION BY doc_id ORDER BY s
                     ROWS BETWEEN 1 FOLLOWING AND UNBOUNDED FOLLOWING)
        AS later_min
       FROM w)
SELECT doc_id, count(*)::BIGINT AS n_intervals
FROM mn
WHERE (later_min IS NULL OR e < later_min) AND (e - s + 1) - 3 <= 8
GROUP BY doc_id"""

    # Intervals.containing: minimal ordered(sort..merge) intervals
    # (gaps <= 3) holding an 'a' occurrence
    o["ft_intervals_containing"] = """
WITH ordered AS (
  SELECT doc_id, term, ord FROM (
    SELECT doc_id,
           unnest(list_filter(string_split_regex(lower(text), '\\s+'),
                              x -> x <> '')) AS term,
           generate_subscripts(list_filter(string_split_regex(lower(text),
                              '\\s+'), x -> x <> ''), 1) AS ord
    FROM documents WHERE text IS NOT NULL)),
A AS (SELECT doc_id, ord FROM ordered WHERE term = 'sort'),
B AS (SELECT doc_id, ord FROM ordered WHERE term = 'merge'),
pairs AS (
  SELECT B.doc_id, B.ord AS b, max(A.ord) AS a
  FROM B JOIN A ON A.doc_id = B.doc_id AND A.ord < B.ord
  GROUP BY B.doc_id, B.ord),
minimal AS (SELECT doc_id, a, min(b) AS b FROM pairs GROUP BY doc_id, a),
iv AS (SELECT doc_id, a, b FROM minimal WHERE (b - a + 1) - 2 <= 3),
hit AS (
  SELECT iv.doc_id, iv.a, iv.b FROM iv
  WHERE EXISTS (SELECT 1 FROM ordered p
                WHERE p.doc_id = iv.doc_id AND p.term = 'a'
                  AND p.ord BETWEEN iv.a AND iv.b))
SELECT doc_id, count(*)::BIGINT AS n_intervals
FROM hit GROUP BY doc_id"""

    # Intervals.containing over an Intervals.or inner source: minimal
    # ordered(sort..merge) intervals (gaps <= 3) holding 'query' OR
    # 'window'
    o["ft_intervals_or_containing"] = """
WITH ordered AS (
  SELECT doc_id, term, ord FROM (
    SELECT doc_id,
           unnest(list_filter(string_split_regex(lower(text), '\\s+'),
                              x -> x <> '')) AS term,
           generate_subscripts(list_filter(string_split_regex(lower(text),
                              '\\s+'), x -> x <> ''), 1) AS ord
    FROM documents WHERE text IS NOT NULL)),
A AS (SELECT doc_id, ord FROM ordered WHERE term = 'sort'),
B AS (SELECT doc_id, ord FROM ordered WHERE term = 'merge'),
pairs AS (
  SELECT B.doc_id, B.ord AS b, max(A.ord) AS a
  FROM B JOIN A ON A.doc_id = B.doc_id AND A.ord < B.ord
  GROUP BY B.doc_id, B.ord),
minimal AS (SELECT doc_id, a, min(b) AS b FROM pairs GROUP BY doc_id, a),
iv AS (SELECT doc_id, a, b FROM minimal WHERE (b - a + 1) - 2 <= 3),
hit AS (
  SELECT iv.doc_id, iv.a, iv.b FROM iv
  WHERE EXISTS (SELECT 1 FROM ordered p
                WHERE p.doc_id = iv.doc_id
                  AND p.term IN ('query', 'window')
                  AND p.ord BETWEEN iv.a AND iv.b))
SELECT doc_id, count(*)::BIGINT AS n_intervals
FROM hit GROUP BY doc_id"""

    # monitor/percolator: each registered query's match set (the phrase
    # query percolates positionally: any in-slop pair, slop=1)
    o["mon_match_batch"] = f"""WITH {_TOKS},
ordered AS (
  SELECT doc_id, term, ord FROM (
    SELECT doc_id,
           unnest(list_filter(string_split_regex(lower(text), '\\s+'),
                              x -> x <> '')) AS term,
           generate_subscripts(list_filter(string_split_regex(lower(text),
                              '\\s+'), x -> x <> ''), 1) AS ord
    FROM documents WHERE text IS NOT NULL))
SELECT doc_id, 'q_and' AS query_id FROM (
  SELECT doc_id FROM toks WHERE term IN ('spark', 'merge')
  GROUP BY doc_id HAVING count(DISTINCT term) = 2)
UNION ALL
SELECT doc_id, 'q_not' FROM (
  SELECT doc_id FROM toks GROUP BY doc_id
  HAVING max(CASE WHEN term = 'window' THEN 1 ELSE 0 END) = 1
     AND max(CASE WHEN term = 'batch' THEN 1 ELSE 0 END) = 0)
UNION ALL
SELECT DISTINCT doc_id, 'q_term' FROM toks WHERE term = 'dup'
UNION ALL
SELECT DISTINCT sp.doc_id, 'q_phrase'
FROM (SELECT doc_id, ord FROM ordered WHERE term = 'sort') sp
JOIN (SELECT doc_id, ord FROM ordered WHERE term = 'merge') mp
  ON sp.doc_id = mp.doc_id AND abs(mp.ord - sp.ord - 1) <= 1
UNION ALL
-- MUST_NOT phrase: dup docs without an exact 'sort merge' adjacency
SELECT doc_id, 'q_notph' FROM (
  SELECT DISTINCT doc_id FROM toks WHERE term = 'dup')
WHERE doc_id NOT IN (
  SELECT sp.doc_id
  FROM (SELECT doc_id, ord FROM ordered WHERE term = 'sort') sp
  JOIN (SELECT doc_id, ord FROM ordered WHERE term = 'merge') mp
    ON sp.doc_id = mp.doc_id AND mp.ord = sp.ord + 1)
UNION ALL
-- SHOULD phrase in a pure disjunction: phrase OR 'window'
SELECT DISTINCT doc_id, 'q_orph' FROM (
  SELECT sp.doc_id
  FROM (SELECT doc_id, ord FROM ordered WHERE term = 'sort') sp
  JOIN (SELECT doc_id, ord FROM ordered WHERE term = 'merge') mp
    ON sp.doc_id = mp.doc_id AND mp.ord = sp.ord + 1
  UNION ALL
  SELECT doc_id FROM toks WHERE term = 'window')"""

    _ORD_CTE = """ordered AS (
  SELECT doc_id, term, ord FROM (
    SELECT doc_id,
           unnest(list_filter(string_split_regex(lower(text), '\\s+'),
                              x -> x <> '')) AS term,
           generate_subscripts(list_filter(string_split_regex(lower(text),
                              '\\s+'), x -> x <> ''), 1) AS ord
    FROM documents WHERE text IS NOT NULL))"""

    # notWithin == nonOverlapping(m, extend(s, 2, 2)): width-1 'merge'
    # survives iff no 'sort' within |2| positions
    o["ft_intervals_not_within"] = f"""
WITH {_ORD_CTE}
SELECT doc_id, count(*)::BIGINT AS n_intervals
FROM (SELECT doc_id, ord FROM ordered WHERE term = 'merge') m
WHERE NOT EXISTS (
  SELECT 1 FROM ordered s
  WHERE s.doc_id = m.doc_id AND s.term = 'sort'
    AND abs(s.ord - m.ord) <= 2)
GROUP BY doc_id"""

    # before(src, ref): src interval ends before some ref start
    o["ft_intervals_before"] = f"""
WITH {_ORD_CTE}
SELECT doc_id, count(*)::BIGINT AS n_intervals
FROM (SELECT doc_id, ord FROM ordered WHERE term = 'sort') s
WHERE EXISTS (
  SELECT 1 FROM ordered m
  WHERE m.doc_id = s.doc_id AND m.term = 'merge' AND m.ord > s.ord)
GROUP BY doc_id"""

    o["mon_complex_batch"] = f"""WITH {_TOKS}
SELECT doc_id, 'q_nested' AS query_id FROM (
  SELECT doc_id FROM toks GROUP BY doc_id
  HAVING max(CASE WHEN term = 'spark' THEN 1 ELSE 0 END) = 1
     AND max(CASE WHEN term IN ('merge', 'window') THEN 1 ELSE 0 END) = 1)
UNION ALL
SELECT DISTINCT doc_id, 'q_prefix' FROM toks WHERE term LIKE 'win%'
UNION ALL
SELECT doc_id, 'q_boolpfx' FROM (
  SELECT doc_id FROM toks GROUP BY doc_id
  HAVING max(CASE WHEN term = 'dup' THEN 1 ELSE 0 END) = 1
     AND max(CASE WHEN term LIKE 'win%' THEN 1 ELSE 0 END) = 1)
UNION ALL
SELECT DISTINCT doc_id, 'q_range' FROM toks
WHERE term >= 'merge' AND term <= 'part'"""

    # mutable-index scenario: upsert + delete-by-term + compaction
    o["ft_upsert_topk"] = _mut_bm25_sql(["graftmarker", "merge"])
    o["ft_delete_topk"] = _mut_bm25_sql(["spark", "merge"])
    o["ft_merge_topk"] = _merge_bm25_sql(["spark", "merge"])
    # addIndexes oracle: full corpus BM25; engine docID order is shard
    # order (doc_id % 2 == 0 first, each shard in doc_id order)
    o["ft_add_indexes_topk"] = f"""
WITH {_BM25_CTES},
sc AS (
  SELECT tf.doc_id, sum({_score_expr()}) AS s
  FROM tf
  JOIN dl ON tf.doc_id = dl.doc_id
  JOIN df ON tf.term = df.term
  CROSS JOIN st
  WHERE tf.term IN ('spark', 'merge')
  GROUP BY tf.doc_id
)
SELECT doc_id, round(s, 4) AS score, rank FROM (
  SELECT doc_id, s,
         row_number() OVER (
           ORDER BY s DESC, (doc_id % 2) ASC, doc_id ASC) AS rank
  FROM sc
) WHERE rank <= 10
"""
    o["ft_live_doc_count"] = f"""
WITH {_MUT_CTES}
SELECT count(*)::BIGINT AS n FROM corpus
WHERE doc_id NOT IN (SELECT DISTINCT doc_id FROM toks0 WHERE term = 'window')"""

    o["ft_suggest_prefix"] = f"""WITH {_TOKS}
SELECT term, count(DISTINCT doc_id)::BIGINT AS weight
FROM toks WHERE term LIKE 's%'
GROUP BY term ORDER BY weight DESC, term ASC LIMIT 5"""

    o["ft_suggest_infix"] = f"""WITH {_TOKS}
SELECT term, count(DISTINCT doc_id)::BIGINT AS weight
FROM toks WHERE term LIKE '%ue%'
GROUP BY term ORDER BY weight DESC, term ASC LIMIT 5"""

    _PAIR_SUGG = r"""psugg AS (
  SELECT sugg AS suggestion, count(*)::BIGINT AS weight FROM (
    SELECT l[1] || ' ' || l[2] AS sugg FROM (
      SELECT list_filter(string_split_regex(lower(text), '\s+'),
                         x -> x <> '') AS l
      FROM documents WHERE text IS NOT NULL)
    WHERE len(l) >= 2)
  GROUP BY sugg)"""

    o["ft_suggest_analyzing"] = f"""WITH {_PAIR_SUGG}
SELECT suggestion, weight, rank FROM (
  SELECT suggestion, weight,
         row_number() OVER (
           ORDER BY (suggestion = 'sp')::INT DESC, weight DESC,
                    suggestion ASC)::BIGINT AS rank
  FROM psugg WHERE starts_with(suggestion, 'sp'))
WHERE rank <= 5"""

    o["ft_suggest_fuzzy_phrase"] = f"""WITH {_PAIR_SUGG}
SELECT suggestion, weight, rank FROM (
  SELECT suggestion, weight,
         row_number() OVER (
           ORDER BY weight DESC, suggestion ASC)::BIGINT AS rank
  FROM psugg
  WHERE len(suggestion) >= 4 AND starts_with(suggestion, 's')
    AND least(levenshtein(substr(suggestion, 1, 4), 'spork'),
              levenshtein(substr(suggestion, 1, 5), 'spork'),
              levenshtein(substr(suggestion, 1, 6), 'spork')) <= 1)
WHERE rank <= 5"""
    # ft_highlight: intentionally no oracle (snippet extraction is not
    # SQL-expressible) -> rows-only check

    # parent/child roll-up: max child BM25 per lang parent
    o["ft_parent_join_topk"] = f"""
WITH {_BM25_CTES},
sc AS (
  SELECT tf.doc_id, sum({_score_expr()}) AS s
  FROM tf JOIN dl ON tf.doc_id = dl.doc_id
  JOIN df ON tf.term = df.term CROSS JOIN st
  WHERE tf.term IN ('spark', 'merge')
  GROUP BY tf.doc_id)
SELECT d.lang AS parent, round(max(sc.s), 4) AS score,
       count(*)::BIGINT AS n_children
FROM sc JOIN documents d USING (doc_id)
GROUP BY d.lang
ORDER BY max(sc.s) DESC, d.lang ASC LIMIT 10"""

    # sort-by-field: docs matching 'dup' ordered by (lang asc, token
    # length desc, doc_id asc)
    o["ft_sort_by_field"] = f"""
WITH {_TOKS},
dl AS (SELECT doc_id, count(*) AS len FROM toks GROUP BY 1),
m AS (SELECT DISTINCT doc_id FROM toks WHERE term = 'dup')
SELECT d.doc_id, d.lang AS lang, dl.len::BIGINT AS length
FROM m JOIN documents d USING (doc_id) JOIN dl USING (doc_id)
ORDER BY d.lang ASC, dl.len DESC, d.doc_id ASC LIMIT 10"""

    # exact phrase: occurrence count via adjacent-token window, scored
    # as one pseudo-term with weight = sum of member idfs
    # dismax: per-disjunct BM25 sub-scores folded max + 0.3*(sum-max)
    o["ft_dismax_topk"] = f"""
WITH {_BM25_CTES},
base AS (
  SELECT tf.doc_id, tf.term, {_score_expr()} AS s
  FROM tf
  JOIN dl ON tf.doc_id = dl.doc_id
  JOIN df ON tf.term = df.term
  CROSS JOIN st
  WHERE tf.term IN ('spark', 'merge', 'window')
),
d1 AS (SELECT doc_id, sum(s) AS s FROM base WHERE term = 'spark'
       GROUP BY doc_id),
d2 AS (SELECT doc_id, sum(s) AS s FROM base WHERE term IN ('merge', 'window')
       GROUP BY doc_id),
u AS (SELECT * FROM d1 UNION ALL SELECT * FROM d2),
agg AS (SELECT doc_id, max(s) + 0.3 * (sum(s) - max(s)) AS s FROM u
        GROUP BY doc_id)
SELECT doc_id, round(s, 4) AS score, rank FROM (
  SELECT doc_id, s,
         row_number() OVER (ORDER BY s DESC, doc_id ASC) AS rank
  FROM agg
) WHERE rank <= 10
"""

    o["ft_term_in_set"] = f"""
WITH {_TOKS}
SELECT doc_id, 2.5 AS score
FROM (SELECT DISTINCT doc_id FROM toks
      WHERE term IN ('vector', 'stream', 'qqq_no_such_term'))
ORDER BY doc_id LIMIT 10
"""

    # MoreLikeThis: seed doc 7 -> top-10 interesting terms by
    # tf * (ln((n+1)/(df+1)) + 1) with tf>=2, df>=5, ties term-asc;
    # then BM25 over the selected set, seed excluded
    o["ft_more_like_this"] = f"""
WITH {_BM25_CTES},
seedtf AS (SELECT term, count(*)::DOUBLE AS f FROM toks
           WHERE doc_id = 7 GROUP BY 1),
mlt AS (
  SELECT seedtf.term,
         seedtf.f * (ln((st.n + 1) / (df.dfreq + 1)) + 1) AS msc
  FROM seedtf JOIN df ON seedtf.term = df.term CROSS JOIN st
  WHERE seedtf.f >= 2 AND df.dfreq >= 5
),
sel AS (SELECT term FROM (
  SELECT term, row_number() OVER (ORDER BY msc DESC, term ASC) AS r
  FROM mlt) WHERE r <= 10),
sc AS (
  SELECT tf.doc_id, sum({_score_expr()}) AS s
  FROM tf
  JOIN dl ON tf.doc_id = dl.doc_id
  JOIN df ON tf.term = df.term
  CROSS JOIN st
  WHERE tf.term IN (SELECT term FROM sel) AND tf.doc_id <> 7
  GROUP BY tf.doc_id
)
SELECT doc_id, round(s, 4) AS score, rank FROM (
  SELECT doc_id, s,
         row_number() OVER (ORDER BY s DESC, doc_id ASC) AS rank
  FROM sc
) WHERE rank <= 10
"""

    # DirectSpellChecker: similarity = 1 - dist/min(len), rounded like
    # the engine BEFORE ranking; ties doc_freq desc then term asc
    o["ft_spell_suggest"] = f"""
WITH {_TOKS},
dfq AS (SELECT term, count(DISTINCT doc_id)::BIGINT AS doc_freq
        FROM toks GROUP BY 1),
cand AS (
  SELECT term AS suggestion, doc_freq,
         round(1.0 - levenshtein(term, 'bat')
               / least(length(term), 3)::DOUBLE, 6) AS similarity
  FROM dfq
  WHERE length(term) BETWEEN 1 AND 5
    AND term <> 'bat'
    AND levenshtein(term, 'bat') <= 2
)
SELECT suggestion, doc_freq, similarity, rank FROM (
  SELECT suggestion, doc_freq, similarity,
         row_number() OVER (ORDER BY similarity DESC, doc_freq DESC,
                            suggestion ASC) AS rank
  FROM cand
) WHERE rank <= 5
"""

    # geo: identical double-precision haversine (GeoUtils mean radius)
    # over the same derived coordinates, same operand order
    _GEO = """geo AS (
  SELECT doc_id,
         (doc_id * 7919 % 18000) / 100.0 - 90.0 AS lat,
         (doc_id * 104729 % 36000) / 100.0 - 180.0 AS lon
  FROM documents)"""
    _HAV = ("2.0 * 6371008.7714150598::DOUBLE * asin(sqrt("
            "sin(radians(12.34 - lat) / 2.0) * sin(radians(12.34 - lat) / 2.0)"
            " + cos(radians(lat)) * cos(radians(12.34))"
            " * sin(radians(56.78 - lon) / 2.0)"
            " * sin(radians(56.78 - lon) / 2.0)))")

    o["geo_distance_topk"] = f"""
WITH {_GEO},
d AS (SELECT doc_id, round({_HAV} / 1000.0, 3) AS dist_km FROM geo)
SELECT doc_id, dist_km, rank FROM (
  SELECT doc_id, dist_km,
         row_number() OVER (ORDER BY dist_km ASC, doc_id ASC) AS rank
  FROM d
) WHERE rank <= 10
"""

    o["geo_bbox_count"] = f"""
WITH {_GEO}
SELECT
  sum(CASE WHEN lat >= -30.0 AND lat <= 30.0
            AND lon >= 0.0 AND lon <= 90.0 THEN 1 ELSE 0 END)::BIGINT
    AS plain_n,
  sum(CASE WHEN lat >= -60.0 AND lat <= 60.0
            AND (lon >= 150.0 OR lon <= -150.0) THEN 1 ELSE 0 END)::BIGINT
    AS crossing_n
FROM geo
"""

    o["geo_radius_count"] = f"""
WITH {_GEO}
SELECT count(*)::BIGINT AS n FROM geo WHERE {_HAV} <= 3000000.0
"""

    # polygon: the same even-odd crossing sum generated edge-by-edge
    _POLY = [(-20.0, -30.0), (30.0, -30.0), (30.0, 30.0),
             (0.0, 0.0), (-20.0, 30.0)]
    _edges = []
    for _i in range(len(_POLY)):
        _y1, _x1 = _POLY[_i]
        _y2, _x2 = _POLY[(_i + 1) % len(_POLY)]
        if _y1 == _y2:
            continue
        _edges.append(
            f"(CASE WHEN (({_y1} > lat) <> ({_y2} > lat)) AND "
            f"(lon < ({_x2} - {_x1}) * (lat - {_y1}) / ({_y2} - {_y1})"
            f" + {_x1}) THEN 1 ELSE 0 END)")
    o["geo_polygon_count"] = f"""
WITH {_GEO}
SELECT count(*)::BIGINT AS n FROM geo
WHERE ({" + ".join(_edges)}) % 2 = 1
"""

    # spatial3d path twin: the SQL expression is GENERATED from the
    # same segment constants as the Spark plan (geo3d.path_distance_sql)
    from lucene_1_spark.functions.geo3d import path_distance_sql
    _PATH_EXPR = path_distance_sql(
        "lat", "lon", [(10.0, 40.0), (25.0, 55.0), (40.0, 45.0)])
    o["geo_path_distance_count"] = f"""
WITH {_GEO}
SELECT count(*)::BIGINT AS n FROM geo
WHERE {_PATH_EXPR} <= 1500000.0
"""

    # LatLonShape twins: the same synthetic triangles (identical trig,
    # identical operand order) and the same strict geometric predicates
    # generated edge-by-edge as SQL
    _SHP = """shp AS (
  SELECT doc_id,
         (doc_id * 7919 % 14000) / 100.0 - 70.0 AS clat,
         (doc_id * 104729 % 32000) / 100.0 - 160.0 AS clon,
         (doc_id * 31 % 500) / 100.0 + 0.5 AS r,
         (doc_id * 17 % 360)::DOUBLE AS rot
  FROM documents),
tri AS (
  SELECT doc_id,
         clat + r * sin(radians(rot + 0.0)) AS lat0,
         clon + r * cos(radians(rot + 0.0)) AS lon0,
         clat + r * sin(radians(rot + 120.0)) AS lat1,
         clon + r * cos(radians(rot + 120.0)) AS lon1,
         clat + r * sin(radians(rot + 240.0)) AS lat2,
         clon + r * cos(radians(rot + 240.0)) AS lon2
  FROM shp)"""
    _TRI_EDGES = [("lat0", "lon0", "lat1", "lon1"),
                  ("lat1", "lon1", "lat2", "lon2"),
                  ("lat2", "lon2", "lat0", "lon0")]

    def _sql_pip_tri(cy: str, cx: str) -> str:
        """Point (cy, cx) inside the doc triangle — even-odd crossing
        sum, mirroring shapes._point_in_ring operand order."""
        terms = []
        for (y1, x1, y2, x2) in _TRI_EDGES:
            terms.append(
                f"(CASE WHEN (({y1} > {cy}) <> ({y2} > {cy})) AND "
                f"({cx} < ({x2} - {x1}) * ({cy} - {y1}) / ({y2} - {y1})"
                f" + {x1}) THEN 1 ELSE 0 END)")
        return f"(({' + '.join(terms)}) % 2 = 1)"

    def _sql_orient(ax, ay, bx, by, cx, cy) -> str:
        return (f"(({bx} - {ax}) * ({cy} - {ay})"
                f" - ({by} - {ay}) * ({cx} - {ax}))")

    def _sql_seg_cross(edge, seg) -> str:
        """Proper crossing of a doc edge with a constant segment,
        mirroring shapes._seg_cross."""
        (y1, x1, y2, x2) = edge
        (cx1, cy1, cx2, cy2) = [repr(v) for v in seg]
        o1 = _sql_orient(x1, y1, x2, y2, cx1, cy1)
        o2 = _sql_orient(x1, y1, x2, y2, cx2, cy2)
        o3 = _sql_orient(cx1, cy1, cx2, cy2, x1, y1)
        o4 = _sql_orient(cx1, cy1, cx2, cy2, x2, y2)
        return f"({o1} * {o2} < 0 AND {o3} * {o4} < 0)"

    def _sql_box_relations(mn_lat, mx_lat, mn_lon, mx_lon):
        bb_lat_mn = "least(lat0, lat1, lat2)"
        bb_lat_mx = "greatest(lat0, lat1, lat2)"
        bb_lon_mn = "least(lon0, lon1, lon2)"
        bb_lon_mx = "greatest(lon0, lon1, lon2)"
        overlap = (f"({bb_lat_mn} <= {mx_lat} AND {bb_lat_mx} >= {mn_lat}"
                   f" AND {bb_lon_mn} <= {mx_lon}"
                   f" AND {bb_lon_mx} >= {mn_lon})")
        within = (f"({bb_lat_mn} >= {mn_lat} AND {bb_lat_mx} <= {mx_lat}"
                  f" AND {bb_lon_mn} >= {mn_lon}"
                  f" AND {bb_lon_mx} <= {mx_lon})")
        vert_in_box = " OR ".join(
            f"(lat{j} >= {mn_lat} AND lat{j} <= {mx_lat}"
            f" AND lon{j} >= {mn_lon} AND lon{j} <= {mx_lon})"
            for j in range(3))
        corners = [(mn_lat, mn_lon), (mn_lat, mx_lon),
                   (mx_lat, mx_lon), (mx_lat, mn_lon)]
        corner_in = " OR ".join(
            _sql_pip_tri(repr(cy), repr(cx)) for (cy, cx) in corners)
        box_segs = [(corners[i][1], corners[i][0],
                     corners[(i + 1) % 4][1], corners[(i + 1) % 4][0])
                    for i in range(4)]
        cross = " OR ".join(_sql_seg_cross(e, s)
                            for s in box_segs for e in _TRI_EDGES)
        inter = (f"({overlap} AND (({vert_in_box})"
                 f" OR ({corner_in}) OR ({cross})))")
        return inter, within

    _inter, _within = _sql_box_relations(-15.0, 20.0, -25.0, 30.0)
    o["geo_shape_box_counts"] = f"""
WITH {_SHP},
rel AS (SELECT {_inter} AS inter, {_within} AS within FROM tri)
SELECT sum(CASE WHEN inter THEN 1 ELSE 0 END)::BIGINT AS intersects_n,
       sum(CASE WHEN within THEN 1 ELSE 0 END)::BIGINT AS within_n,
       sum(CASE WHEN NOT inter THEN 1 ELSE 0 END)::BIGINT AS disjoint_n
FROM rel
"""

    _QP = [(-30.0, -40.0), (25.0, -35.0), (40.0, 10.0),
           (0.0, 5.0), (-20.0, 45.0)]
    _nq = len(_QP)
    # doc vertex inside the constant query ring: constant edge slopes
    # precomputed exactly as shapes.polygon_intersects does
    _docv_terms = []
    for _j in range(3):
        _cterms = []
        for _i in range(_nq):
            _qy1, _qx1 = _QP[_i]
            _qy2, _qx2 = _QP[(_i + 1) % _nq]
            if _qy1 == _qy2:
                continue
            _cterms.append(
                f"(CASE WHEN (({_qy1!r} > lat{_j}) <> ({_qy2!r} > lat{_j}))"
                f" AND (lon{_j} < {_qx2 - _qx1!r} * (lat{_j} - {_qy1!r})"
                f" / {_qy2 - _qy1!r} + {_qx1!r}) THEN 1 ELSE 0 END)")
        _docv_terms.append(f"(({' + '.join(_cterms)}) % 2 = 1)")
    _qv_terms = [_sql_pip_tri(repr(_qy), repr(_qx)) for (_qy, _qx) in _QP]
    _qsegs = [(_QP[_i][1], _QP[_i][0],
               _QP[(_i + 1) % _nq][1], _QP[(_i + 1) % _nq][0])
              for _i in range(_nq)]
    _qcross = " OR ".join(_sql_seg_cross(_e, _s)
                          for _s in _qsegs for _e in _TRI_EDGES)
    _q_lats = [v[0] for v in _QP]
    _q_lons = [v[1] for v in _QP]
    _qpre = (f"(least(lat0, lat1, lat2) <= {max(_q_lats)!r}"
             f" AND greatest(lat0, lat1, lat2) >= {min(_q_lats)!r}"
             f" AND least(lon0, lon1, lon2) <= {max(_q_lons)!r}"
             f" AND greatest(lon0, lon1, lon2) >= {min(_q_lons)!r})")
    o["geo_shape_polygon_count"] = f"""
WITH {_SHP}
SELECT count(*)::BIGINT AS n FROM tri
WHERE {_qpre} AND (({" OR ".join(_docv_terms)})
  OR ({" OR ".join(_qv_terms)}) OR ({_qcross}))
"""

    o["ft_phrase_topk"] = f"""
WITH {_BM25_CTES},
ordered AS (
  SELECT doc_id, term, ord FROM (
    SELECT doc_id,
           unnest(list_filter(string_split_regex(lower(text), '\\s+'),
                              x -> x <> '')) AS term,
           generate_subscripts(list_filter(string_split_regex(lower(text),
                              '\\s+'), x -> x <> ''), 1) AS ord
    FROM documents WHERE text IS NOT NULL)),
pf AS (
  SELECT doc_id, count(*)::DOUBLE AS pfreq FROM (
    SELECT doc_id, term,
           lead(term) OVER (PARTITION BY doc_id ORDER BY ord) AS nxt
    FROM ordered)
  WHERE term = 'sort' AND nxt = 'merge' GROUP BY doc_id),
w AS (
  SELECT sum(ln(1 + (st.n - df.dfreq + 0.5) / (df.dfreq + 0.5))) AS wt
  FROM df CROSS JOIN st WHERE df.term IN ('sort', 'merge')),
sc AS (
  SELECT pf.doc_id,
         w.wt * pf.pfreq
         / (pf.pfreq + {K1} * (1 - {B} + {B} * dl.len / (st.tot / st.n))) AS s
  FROM pf JOIN dl ON pf.doc_id = dl.doc_id CROSS JOIN st CROSS JOIN w)
SELECT doc_id, round(s, 4) AS score, rank FROM (
  SELECT doc_id, s, row_number() OVER (ORDER BY s DESC, doc_id ASC) AS rank
  FROM sc) WHERE rank <= 10"""

    _HEAD_CTES = """h AS (SELECT doc_id, substr(coalesce(text, ''), 1, 80)
       AS head FROM documents),
htoks AS (
  SELECT doc_id, term FROM (
    SELECT doc_id, lower(unnest(string_split_regex(trim(head), '\\s+')))
           AS term
    FROM h WHERE trim(head) <> ''
  ) WHERE term <> ''),
htf AS (SELECT doc_id, term, count(*)::DOUBLE AS freq
        FROM htoks GROUP BY 1, 2),
hdl AS (SELECT doc_id, count(*)::DOUBLE AS len FROM htoks GROUP BY 1),
hst AS (SELECT count(*)::DOUBLE AS n, sum(len)::DOUBLE AS tot FROM hdl),
hdf AS (SELECT term, count(*)::DOUBLE AS dfreq FROM htf GROUP BY 1)"""

    # multi-field dismax: content-field and head-field BM25 for the
    # same term, folded max + 0.1*(sum-max)
    o["ft_multifield_dismax"] = f"""
WITH {_BM25_CTES},
{_HEAD_CTES},
s1 AS (
  SELECT tf.doc_id, {_score_expr()} AS s
  FROM tf
  JOIN dl ON tf.doc_id = dl.doc_id
  JOIN df ON tf.term = df.term
  CROSS JOIN st
  WHERE tf.term = 'spark'),
s2 AS (
  SELECT htf.doc_id,
         ln(1 + (hst.n - hdf.dfreq + 0.5) / (hdf.dfreq + 0.5)) * htf.freq
         / (htf.freq + {K1} * (1 - {B} + {B} * hdl.len / (hst.tot / hst.n)))
           AS s
  FROM htf JOIN hdl ON htf.doc_id = hdl.doc_id
  JOIN hdf ON htf.term = hdf.term CROSS JOIN hst
  WHERE htf.term = 'spark'),
u AS (SELECT * FROM s1 UNION ALL SELECT * FROM s2),
agg AS (SELECT doc_id, max(s) + 0.1 * (sum(s) - max(s)) AS s FROM u
        GROUP BY doc_id)
SELECT doc_id, round(s, 4) AS score, rank FROM (
  SELECT doc_id, s,
         row_number() OVER (ORDER BY s DESC, doc_id ASC) AS rank
  FROM agg
) WHERE rank <= 10
"""

    # DV update, latest generation wins: priority=7 for docs with
    # 'data' then 99999 for docs with 'window'; high range == window
    # docs, low range == data docs that are NOT window docs
    o["dv_update_range_count"] = f"""
WITH {_TOKS},
win AS (SELECT DISTINCT doc_id FROM toks WHERE term = 'window'),
dat AS (SELECT DISTINCT doc_id FROM toks WHERE term = 'data')
SELECT
  (SELECT count(*) FROM win)::BIGINT AS updated_n,
  (SELECT count(*) FROM dat
   WHERE doc_id NOT IN (SELECT doc_id FROM win))::BIGINT AS small_n
"""

    # expression sort over the dv index: BM25(bm25_double) for
    # 'data stream' + the two-generation priority overlay (window wins)
    # -> key = 0.3*score + 0.7*ln(1+priority), nulls drop below top-k
    o["ft_expr_sort_topk"] = f"""
WITH {_BM25_CTES},
sc AS (
  SELECT tf.doc_id, sum({_score_expr()}) AS s
  FROM tf
  JOIN dl ON tf.doc_id = dl.doc_id
  JOIN df ON tf.term = df.term
  CROSS JOIN st
  WHERE tf.term IN ('data', 'stream')
  GROUP BY tf.doc_id
),
pri AS (
  SELECT doc_id,
         CASE WHEN doc_id IN (SELECT doc_id FROM toks
                              WHERE term = 'window') THEN 99999
              WHEN doc_id IN (SELECT doc_id FROM toks
                              WHERE term = 'data') THEN 7
         END AS priority
  FROM (SELECT DISTINCT doc_id FROM toks)
)
SELECT sc.doc_id,
       round(0.3 * sc.s + 0.7 * ln(1 + pri.priority), 4) AS sort_key
FROM sc JOIN pri ON sc.doc_id = pri.doc_id
WHERE pri.priority IS NOT NULL
ORDER BY 0.3 * sc.s + 0.7 * ln(1 + pri.priority) DESC, sc.doc_id ASC
LIMIT 10
"""

    # FunctionScoreQuery.boostByValue over the dv index: every match of
    # data|stream, score replaced by s * ln(1 + priority) with the dv
    # two-generation overlay (window wins); missing priority -> 0
    o["ft_function_score_topk"] = f"""
WITH {_BM25_CTES},
sc AS (
  SELECT tf.doc_id, sum({_score_expr()}) AS s
  FROM tf
  JOIN dl ON tf.doc_id = dl.doc_id
  JOIN df ON tf.term = df.term
  CROSS JOIN st
  WHERE tf.term IN ('data', 'stream')
  GROUP BY tf.doc_id
),
pri AS (
  SELECT doc_id,
         CASE WHEN doc_id IN (SELECT doc_id FROM toks
                              WHERE term = 'window') THEN 99999
              WHEN doc_id IN (SELECT doc_id FROM toks
                              WHERE term = 'data') THEN 7
         END AS priority
  FROM (SELECT DISTINCT doc_id FROM toks)
),
fs AS (
  SELECT sc.doc_id,
         sc.s * ln(1.0 + coalesce(pri.priority, 0)) AS fscore
  FROM sc LEFT JOIN pri ON sc.doc_id = pri.doc_id
)
SELECT doc_id, round(fscore, 4) AS score
FROM fs ORDER BY fscore DESC, doc_id ASC LIMIT 10
"""

    # boostByQuery: 'spark merge' BM25 tripled where the doc also
    # contains 'window' (match set unchanged)
    o["ft_boost_by_query_topk"] = f"""
WITH {_BM25_CTES},
sc AS (
  SELECT tf.doc_id, sum({_score_expr()}) AS s
  FROM tf
  JOIN dl ON tf.doc_id = dl.doc_id
  JOIN df ON tf.term = df.term
  CROSS JOIN st
  WHERE tf.term IN ('spark', 'merge')
  GROUP BY tf.doc_id
),
fs AS (
  SELECT doc_id,
         s * (CASE WHEN doc_id IN (SELECT doc_id FROM toks
                                   WHERE term = 'window')
              THEN 3.0 ELSE 1.0 END) AS fscore
  FROM sc
)
SELECT doc_id, round(fscore, 4) AS score,
       row_number() OVER (ORDER BY fscore DESC, doc_id ASC) AS rank
FROM fs ORDER BY fscore DESC, doc_id ASC LIMIT 10
"""

    # PrecedenceQueryParser: spark OR (merge AND window) — the nested
    # conjunction scores only when BOTH members are present
    o["ft_precedence_parse_topk"] = f"""
WITH {_BM25_CTES},
per AS (
  SELECT tf.doc_id, tf.term, {_score_expr()} AS s
  FROM tf
  JOIN dl ON tf.doc_id = dl.doc_id
  JOIN df ON tf.term = df.term
  CROSS JOIN st
  WHERE tf.term IN ('spark', 'merge', 'window')
),
agg AS (
  SELECT doc_id,
         sum(CASE WHEN term = 'spark' THEN s ELSE 0 END) AS s_spark,
         sum(CASE WHEN term IN ('merge', 'window') THEN s ELSE 0 END)
           AS s_mw,
         max(CASE WHEN term = 'spark' THEN 1 ELSE 0 END) AS has_s,
         max(CASE WHEN term = 'merge' THEN 1 ELSE 0 END) AS has_m,
         max(CASE WHEN term = 'window' THEN 1 ELSE 0 END) AS has_w
  FROM per GROUP BY doc_id
),
fs AS (
  SELECT doc_id,
         (CASE WHEN has_s = 1 THEN s_spark ELSE 0 END)
         + (CASE WHEN has_m = 1 AND has_w = 1 THEN s_mw ELSE 0 END)
           AS fscore
  FROM agg
  WHERE has_s = 1 OR (has_m = 1 AND has_w = 1)
)
SELECT doc_id, round(fscore, 4) AS score,
       row_number() OVER (ORDER BY fscore DESC, doc_id ASC) AS rank
FROM fs ORDER BY fscore DESC, doc_id ASC LIMIT 10
"""

    # DocValuesTermsQuery: lang-set membership on the stored column
    o["dv_terms_count"] = f"""
WITH {_TOKS}
SELECT
  (SELECT count(*) FROM documents
   WHERE lang IN ('en', 'fr')
     AND doc_id IN (SELECT doc_id FROM toks WHERE term = 'spark')
  )::BIGINT AS n_filtered,
  (SELECT count(*) FROM documents
   WHERE lang IN ('en', 'fr'))::BIGINT AS n_set
"""

    o["ft_term_vector"] = f"""
WITH {_TOKS}
SELECT term, count(*)::BIGINT AS freq FROM toks
WHERE doc_id = 7 GROUP BY term
"""

    # edge-ngram autocomplete: gram 'spar' <=> a token with that
    # 4-char prefix; gram 'st' <=> a token starting 'st'
    o["ft_edge_autocomplete_count"] = f"""
WITH {_TOKS}
SELECT
  (SELECT count(DISTINCT doc_id) FROM toks
   WHERE term LIKE 'spar%')::BIGINT AS n_spar,
  (SELECT count(DISTINCT doc_id) FROM toks
   WHERE term LIKE 'st%')::BIGINT AS n_st
"""

    # russian chain: stop filter inlined, the SNOWBALL stemmer (the
    # reference default since r6 — ru/RussianAnalyzer.java:114)
    # generated as a CTE chain of region-windowed suffix CASEs that
    # mirrors analysis/snowball.py step by step
    from lucene_1_spark.analysis.languages import RUSSIAN_STOP
    from lucene_1_spark.analysis import snowball as _sb
    _ru_stops = ", ".join(f"'{w}'" for w in sorted(RUSSIAN_STOP))
    _ru_qstem = _sb.russian_snowball_stem("scan".translate(_RU_TRANS))

    _RUV = "аеиоуыэюя"

    def _sb_chain(w: str, entries) -> str:
        """find_among_b as a CASE: longest suffix (inside the RV
        window) first; a group-1 entry whose preceding-а/я condition
        fails yields NULL (class fails, NO shorter-suffix fallback)."""
        parts = []
        for suf, kind in sorted(entries, key=lambda e: (-len(e[0]), e[0])):
            n = len(suf)
            match = f"ends_with({w},'{suf}') AND length({w})-{n} >= pv"
            strip = f"substr({w},1,length({w})-{n})"
            if kind == "g1":
                prec = f"substr({w},length({w})-{n},1)"
                parts.append(
                    f"WHEN {match} THEN (CASE WHEN length({w})-{n}-1 >= pv"
                    f" AND {prec} IN ('а','я') THEN {strip} END)")
            else:
                parts.append(f"WHEN {match} THEN {strip}")
        return "(CASE " + " ".join(parts) + " END)"

    def _sb_mixed(g1, g2):
        return [(s, "g1") for s in g1] + [(s, "del") for s in g2]

    def _sb_undouble_nn(expr: str, length: str) -> str:
        return (f"CASE WHEN ends_with({expr},'нн') AND {length}-2 >= pv"
                f" THEN substr({expr},1,{length}-1) ELSE {expr} END")

    _ru_pg = _sb_chain("w", _sb_mixed(_sb._RU_PG1, _sb._RU_PG2))
    _ru_refl = ("CASE WHEN (ends_with(w,'ся') OR ends_with(w,'сь'))"
                " AND length(w)-2 >= pv THEN substr(w,1,length(w)-2)"
                " ELSE w END")
    _ru_adj = _sb_chain("wr", [(s, "del") for s in _sb._RU_ADJ])
    _ru_verb = _sb_chain("wr", _sb_mixed(_sb._RU_VERB1, _sb._RU_VERB2))
    _ru_noun = _sb_chain("wr", [(s, "del") for s in _sb._RU_NOUN])
    _ru_part = _sb_chain("adj", _sb_mixed(_sb._RU_PART1, _sb._RU_PART2))
    _ru_tidy = (
        "CASE"
        " WHEN ends_with(w,'ейше') AND length(w)-4 >= pv THEN "
        + _sb_undouble_nn("substr(w,1,length(w)-4)", "length(w)-4")
        + " WHEN ends_with(w,'ейш') AND length(w)-3 >= pv THEN "
        + _sb_undouble_nn("substr(w,1,length(w)-3)", "length(w)-3")
        + " WHEN ends_with(w,'н') AND length(w)-1 >= pv THEN"
        "  (CASE WHEN ends_with(w,'нн') AND length(w)-2 >= pv"
        "   THEN substr(w,1,length(w)-1) ELSE w END)"
        " WHEN ends_with(w,'ь') AND length(w)-1 >= pv"
        "  THEN substr(w,1,length(w)-1)"
        " ELSE w END")
    # region markers (0-based: pv = after first vowel; p2 = after the
    # first non-vowel following a vowel inside R1); prefix indices
    # survive suffix slicing so they are computed once on the token
    _ru_snowball_ctes = f"""
sn0 AS (SELECT doc_id, replace(term,'ё','е') AS w FROM toks0),
sn1 AS (SELECT doc_id, w,
  CASE WHEN regexp_matches(w,'[{_RUV}]')
       THEN length(regexp_extract(w,'^[^{_RUV}]*[{_RUV}]'))
       ELSE 9999 END AS pv,
  CASE WHEN regexp_matches(w,'^[^{_RUV}]*[{_RUV}]+[^{_RUV}]')
       THEN length(regexp_extract(w,'^[^{_RUV}]*[{_RUV}]+[^{_RUV}]'))
       ELSE 9999 END AS p1
  FROM sn0),
sn2 AS (SELECT doc_id, w, pv,
  CASE WHEN p1 < 9999
        AND regexp_matches(substr(w,p1+1),'^[^{_RUV}]*[{_RUV}]+[^{_RUV}]')
       THEN p1 + length(regexp_extract(substr(w,p1+1),
                                       '^[^{_RUV}]*[{_RUV}]+[^{_RUV}]'))
       ELSE 9999 END AS p2
  FROM sn1),
sn3 AS (SELECT doc_id, pv, p2, {_ru_pg} AS pg, {_ru_refl} AS wr
        FROM sn2),
sn4 AS (SELECT doc_id, pv, p2, pg, wr, {_ru_adj} AS adj,
        {_ru_verb} AS vrb, {_ru_noun} AS nn FROM sn3),
sn5 AS (SELECT doc_id, pv, p2,
        COALESCE(pg, CASE WHEN adj IS NOT NULL
                          THEN COALESCE({_ru_part}, adj)
                          ELSE COALESCE(vrb, nn, wr) END) AS w FROM sn4),
sn6 AS (SELECT doc_id, pv, p2,
        CASE WHEN ends_with(w,'и') AND length(w)-1 >= pv
             THEN substr(w,1,length(w)-1) ELSE w END AS w FROM sn5),
sn7 AS (SELECT doc_id, pv,
  CASE WHEN ends_with(w,'ость') AND length(w)-4 >= pv
            AND length(w)-4 >= p2 THEN substr(w,1,length(w)-4)
       WHEN ends_with(w,'ост') AND length(w)-3 >= pv
            AND length(w)-3 >= p2 THEN substr(w,1,length(w)-3)
       ELSE w END AS w FROM sn6),
stems AS MATERIALIZED (SELECT doc_id, {_ru_tidy} AS term FROM sn7)"""
    # MATERIALIZED stops DuckDB inlining the whole sn-chain into every
    # consumer (tf + dl) — without it the expression tree duplication
    # makes planning/execution blow up from 0.5 s to minutes
    o["ft_ru_stem_topk"] = f"""
WITH rudocs AS (
  SELECT doc_id,
         translate(regexp_replace(lower(substr(coalesce(text,''),1,120)),
                                  '[^a-z ]', ' ', 'g'),
                   'abcdefghijklmnopqrstuvwxyz', '{_RU26}') AS ru
  FROM documents),
toks0 AS (
  SELECT doc_id, t AS term FROM (
    SELECT doc_id, unnest(string_split_regex(ru, ' +')) AS t FROM rudocs
  ) WHERE t <> '' AND t NOT IN ({_ru_stops})),
{_ru_snowball_ctes},
tf AS (SELECT doc_id, term, count(*)::DOUBLE AS freq FROM stems
       GROUP BY 1, 2),
dl AS (SELECT doc_id, count(*)::DOUBLE AS len FROM stems GROUP BY 1),
st AS (SELECT count(*)::DOUBLE AS n, sum(len)::DOUBLE AS tot FROM dl),
df AS (SELECT term, count(*)::DOUBLE AS dfreq FROM tf GROUP BY 1),
sc AS (
  SELECT tf.doc_id, {_score_expr()} AS s
  FROM tf
  JOIN dl ON tf.doc_id = dl.doc_id
  JOIN df ON tf.term = df.term
  CROSS JOIN st
  WHERE tf.term = '{_ru_qstem}')
SELECT doc_id, round(s, 4) AS score, rank FROM (
  SELECT doc_id, s,
         row_number() OVER (ORDER BY s DESC, doc_id ASC) AS rank
  FROM sc
) WHERE rank <= 10
"""

    # icu fold: the engine indexes the a/e/o -> Ä/é/Ｏ DE-normalized
    # corpus through the fold; folding inverts the decoration exactly,
    # so the twin is plain BM25 over the UNDECORATED lowercase tokens
    o["ft_icu_fold_topk"] = f"""
WITH cdocs AS (
  SELECT doc_id,
         regexp_replace(lower(substr(coalesce(text,''),1,120)),
                        '[^a-z ]', ' ', 'g') AS c
  FROM documents),
toks AS (
  SELECT doc_id, t AS term FROM (
    SELECT doc_id, unnest(string_split_regex(c, ' +')) AS t FROM cdocs
  ) WHERE t <> ''),
tf AS (SELECT doc_id, term, count(*)::DOUBLE AS freq FROM toks
       GROUP BY 1, 2),
dl AS (SELECT doc_id, count(*)::DOUBLE AS len FROM toks GROUP BY 1),
st AS (SELECT count(*)::DOUBLE AS n, sum(len)::DOUBLE AS tot FROM dl),
df AS (SELECT term, count(*)::DOUBLE AS dfreq FROM tf GROUP BY 1),
sc AS (
  SELECT tf.doc_id, {_score_expr()} AS s
  FROM tf
  JOIN dl ON tf.doc_id = dl.doc_id
  JOIN df ON tf.term = df.term
  CROSS JOIN st
  WHERE tf.term = 'window')
SELECT doc_id, round(s, 4) AS score, rank FROM (
  SELECT doc_id, s,
         row_number() OVER (ORDER BY s DESC, doc_id ASC) AS rank
  FROM sc
) WHERE rank <= 10
"""

    # payload score: per-position payload (pos % 5 + 1), max over the
    # positions where the term matches; positions are 0-based ordinals
    # over nonempty whitespace tokens of the cleaned text
    o["ft_payload_score_topk"] = """
WITH cdocs AS (
  SELECT doc_id,
         regexp_replace(lower(substr(coalesce(text,''),1,200)),
                        '[^a-z ]', ' ', 'g') AS c
  FROM documents),
raw AS (
  SELECT doc_id, unnest(string_split_regex(c, ' ')) AS term,
         generate_subscripts(string_split_regex(c, ' '), 1) AS i
  FROM cdocs),
toks AS (
  SELECT doc_id, term,
         row_number() OVER (PARTITION BY doc_id ORDER BY i) - 1
           AS position
  FROM raw WHERE term <> ''),
sc AS (
  SELECT doc_id, max((position % 5) + 1)::DOUBLE AS s
  FROM toks WHERE term = 'window' GROUP BY doc_id)
SELECT doc_id, round(s, 4) AS score, rank FROM (
  SELECT doc_id, s,
         row_number() OVER (ORDER BY s DESC, doc_id ASC) AS rank
  FROM sc
) WHERE rank <= 10
"""

    # complex phrase: prefix-expanded slot at position p, literal at
    # p+1 (exact adjacency, positions = nonempty-token ordinals)
    o["ft_complex_phrase_count"] = """
WITH cdocs AS (
  SELECT doc_id,
         regexp_replace(lower(substr(coalesce(text,''),1,200)),
                        '[^a-z ]', ' ', 'g') AS c
  FROM documents),
raw AS (
  SELECT doc_id, unnest(string_split_regex(c, ' ')) AS term,
         generate_subscripts(string_split_regex(c, ' '), 1) AS i
  FROM cdocs),
toks AS (
  SELECT doc_id, term,
         row_number() OVER (PARTITION BY doc_id ORDER BY i) - 1 AS p
  FROM raw WHERE term <> '')
SELECT
  (SELECT count(DISTINCT a.doc_id) FROM toks a JOIN toks b
    ON a.doc_id = b.doc_id AND b.p = a.p + 1
   WHERE a.term LIKE 'wi%' AND b.term = 'table')::BIGINT AS n_wi_table,
  (SELECT count(DISTINCT a.doc_id) FROM toks a JOIN toks b
    ON a.doc_id = b.doc_id AND b.p = a.p + 1
   WHERE a.term LIKE 'da%' AND b.term = 'hash')::BIGINT AS n_da_hash
"""

    # span near: pair-existence over ordinal token positions
    o["ft_span_near_count"] = """
WITH cdocs AS (
  SELECT doc_id,
         regexp_replace(lower(substr(coalesce(text,''),1,200)),
                        '[^a-z ]', ' ', 'g') AS c
  FROM documents),
raw AS (
  SELECT doc_id, unnest(string_split_regex(c, ' ')) AS term,
         generate_subscripts(string_split_regex(c, ' '), 1) AS i
  FROM cdocs),
toks AS (
  SELECT doc_id, term,
         row_number() OVER (PARTITION BY doc_id ORDER BY i) - 1 AS p
  FROM raw WHERE term <> '')
SELECT
  (SELECT count(DISTINCT a.doc_id) FROM toks a JOIN toks b
    ON a.doc_id = b.doc_id
   WHERE a.term = 'window' AND b.term = 'table'
     AND b.p > a.p AND b.p - a.p <= 3)::BIGINT AS n_ordered,
  (SELECT count(DISTINCT a.doc_id) FROM toks a JOIN toks b
    ON a.doc_id = b.doc_id
   WHERE a.term = 'data' AND b.term = 'hash'
     AND a.p <> b.p AND abs(a.p - b.p) <= 2)::BIGINT AS n_unordered
"""

    o["ft_surround_count"] = """
WITH cdocs AS MATERIALIZED (
  SELECT doc_id,
         regexp_replace(lower(substr(coalesce(text,''),1,200)),
                        '[^a-z ]', ' ', 'g') AS c
  FROM documents),
raw AS (
  SELECT doc_id, unnest(string_split_regex(c, ' ')) AS term,
         generate_subscripts(string_split_regex(c, ' '), 1) AS i
  FROM cdocs),
toks AS MATERIALIZED (
  SELECT doc_id, term,
         row_number() OVER (PARTITION BY doc_id ORDER BY i) - 1 AS p
  FROM raw WHERE term <> '')
SELECT
  (SELECT count(DISTINCT a.doc_id) FROM toks a JOIN toks b
    ON a.doc_id = b.doc_id
   WHERE a.term = 'sort' AND b.term = 'merge'
     AND b.p > a.p AND b.p - a.p <= 3)::BIGINT AS n_dist,
  (SELECT count(*) FROM (
     SELECT DISTINCT doc_id FROM toks
      WHERE term IN ('data', 'hash')
        AND doc_id NOT IN (SELECT doc_id FROM toks
                            WHERE term = 'window')))::BIGINT AS n_boolean,
  (SELECT count(*) FROM (
     SELECT DISTINCT doc_id FROM toks WHERE term LIKE 'ha%'
     INTERSECT
     SELECT DISTINCT doc_id FROM toks WHERE term = 'sort'))::BIGINT
    AS n_trunc
"""

    # XML parser twin: same toks CTE vocabulary as the surround twin
    o["ft_xml_parse_count"] = """
WITH cdocs AS MATERIALIZED (
  SELECT doc_id,
         regexp_replace(lower(substr(coalesce(text,''),1,200)),
                        '[^a-z ]', ' ', 'g') AS c
  FROM documents),
raw AS (
  SELECT doc_id, unnest(string_split_regex(c, ' ')) AS term,
         generate_subscripts(string_split_regex(c, ' '), 1) AS i
  FROM cdocs),
toks AS MATERIALIZED (
  SELECT doc_id, term,
         row_number() OVER (PARTITION BY doc_id ORDER BY i) - 1 AS p
  FROM raw WHERE term <> '')
SELECT
  (SELECT count(*) FROM (
     SELECT DISTINCT doc_id FROM toks WHERE term = 'sort'
       AND doc_id NOT IN (SELECT doc_id FROM toks
                           WHERE term = 'window')))::BIGINT AS n_bool,
  (SELECT count(DISTINCT a.doc_id) FROM toks a JOIN toks b
    ON a.doc_id = b.doc_id
   WHERE a.term = 'data' AND b.term = 'merge'
     AND b.p > a.p AND b.p - a.p <= 3)::BIGINT AS n_span,
  (SELECT count(*) FROM (
     SELECT DISTINCT doc_id FROM toks
      WHERE term >= 'ha' AND term <= 'hz'))::BIGINT AS n_range
"""

    # arabic chain: normalize (translate) then prefix CASE then suffix
    # CASE, each generated from the analyzer's own rule tables
    from lucene_1_spark.analysis.languages import (ARABIC_STOP, _AR_PREF,
                                                   _AR_SUF, arabic_stem)
    _ar_pref_case = "CASE " + " ".join(
        f"WHEN starts_with(term, '{p}') AND length(term) - {len(p)} >= 2"
        f" THEN substr(term, {len(p) + 1})"
        for p in _AR_PREF) + " ELSE term END"
    _seen = set()
    _ar_sufs = [x for x in _AR_SUF
                if not (x in _seen or _seen.add(x))]
    _ar_suf_case = "CASE " + " ".join(
        f"WHEN ends_with(term, '{suf}') AND length(term) - {len(suf)} >= 2"
        f" THEN substr(term, 1, length(term) - {len(suf)})"
        for suf in _ar_sufs) + " ELSE term END"
    _ar_stops = ", ".join(f"'{w}'" for w in sorted(ARABIC_STOP))
    _ar_qstem = arabic_stem("window".translate(_AR_TRANS))
    o["ft_ar_stem_topk"] = f"""
WITH ardocs AS (
  SELECT doc_id,
         translate(regexp_replace(lower(substr(coalesce(text,''),1,120)),
                                  '[^a-z ]', ' ', 'g'),
                   'abcdefghijklmnopqrstuvwxyz', '{_AR26}') AS ar
  FROM documents),
toks0 AS (
  SELECT doc_id, t AS term FROM (
    SELECT doc_id, unnest(string_split_regex(ar, ' +')) AS t FROM ardocs
  ) WHERE t <> '' AND t NOT IN ({_ar_stops})),
norm AS (SELECT doc_id,
                translate(term, 'أإآىة', 'ااايه') AS term FROM toks0),
pref AS (SELECT doc_id, {_ar_pref_case} AS term FROM norm),
stems AS (SELECT doc_id, {_ar_suf_case} AS term FROM pref),
tf AS (SELECT doc_id, term, count(*)::DOUBLE AS freq FROM stems
       GROUP BY 1, 2),
dl AS (SELECT doc_id, count(*)::DOUBLE AS len FROM stems GROUP BY 1),
st AS (SELECT count(*)::DOUBLE AS n, sum(len)::DOUBLE AS tot FROM dl),
df AS (SELECT term, count(*)::DOUBLE AS dfreq FROM tf GROUP BY 1),
sc AS (
  SELECT tf.doc_id, {_score_expr()} AS s
  FROM tf
  JOIN dl ON tf.doc_id = dl.doc_id
  JOIN df ON tf.term = df.term
  CROSS JOIN st
  WHERE tf.term = '{_ar_qstem}')
SELECT doc_id, round(s, 4) AS score, rank FROM (
  SELECT doc_id, s,
         row_number() OVER (ORDER BY s DESC, doc_id ASC) AS rank
  FROM sc
) WHERE rank <= 10
"""

    # bulgarian chain (round 5): the multi-stage stemmer
    # (BulgarianStemmer.java:33-170) as a staged CASE pipeline — each
    # CTE mirrors one Python stage, with the ища/short-word early
    # return carried as a `done` flag
    from lucene_1_spark.analysis.languages import (BULGARIAN_STOP,
                                                   bulgarian_stem)
    _bg_stops = ", ".join(f"'{w}'" for w in sorted(BULGARIAN_STOP))
    _bg_qstem = bulgarian_stem("data".translate(_BG_TRANS))
    o["ft_bg_stem_topk"] = f"""
WITH bgdocs AS (
  SELECT doc_id,
         translate(regexp_replace(lower(substr(coalesce(text,''),1,120)),
                                  '[^a-z ]', ' ', 'g'),
                   'abcdefghijklmnopqrstuvwxyz', '{_BG26}') AS bg
  FROM documents),
toks0 AS MATERIALIZED (
  SELECT doc_id, t AS term FROM (
    SELECT doc_id, unnest(string_split_regex(bg, ' +')) AS t FROM bgdocs
  ) WHERE t <> '' AND t NOT IN ({_bg_stops})),
s1 AS MATERIALIZED (  -- len<4 / ища early returns -> done flag
  SELECT doc_id,
         CASE WHEN length(term) > 5 AND ends_with(term, 'ища')
              THEN substr(term, 1, length(term) - 3) ELSE term END AS term,
         (length(term) < 4
          OR (length(term) > 5 AND ends_with(term, 'ища'))) AS done
  FROM toks0),
s2 AS MATERIALIZED (  -- definite article
  SELECT doc_id, done, CASE
    WHEN done THEN term
    WHEN length(term) > 6 AND ends_with(term, 'ият')
      THEN substr(term, 1, length(term) - 3)
    WHEN length(term) > 5 AND (ends_with(term, 'ът') OR
         ends_with(term, 'то') OR ends_with(term, 'те') OR
         ends_with(term, 'та') OR ends_with(term, 'ия'))
      THEN substr(term, 1, length(term) - 2)
    WHEN length(term) > 4 AND ends_with(term, 'ят')
      THEN substr(term, 1, length(term) - 2)
    ELSE term END AS term FROM s1),
s3 AS MATERIALIZED (  -- plural with к/г/х and е->я alternations
  SELECT doc_id, done, CASE
    WHEN done THEN term
    WHEN length(term) > 6 AND ends_with(term, 'овци')
      THEN substr(term, 1, length(term) - 3)
    WHEN length(term) > 6 AND ends_with(term, 'ове')
      THEN substr(term, 1, length(term) - 3)
    WHEN length(term) > 6 AND ends_with(term, 'еве')
      THEN substr(term, 1, length(term) - 3) || 'й'
    WHEN length(term) > 5 AND ends_with(term, 'ища')
      THEN substr(term, 1, length(term) - 3)
    WHEN length(term) > 5 AND ends_with(term, 'та')
      THEN substr(term, 1, length(term) - 2)
    WHEN length(term) > 5 AND ends_with(term, 'ци')
      THEN substr(term, 1, length(term) - 2) || 'к'
    WHEN length(term) > 5 AND ends_with(term, 'зи')
      THEN substr(term, 1, length(term) - 2) || 'г'
    WHEN length(term) > 5 AND substr(term, length(term) - 2, 1) = 'е'
         AND ends_with(term, 'и')
      THEN substr(term, 1, length(term) - 3) || 'я'
           || substr(term, length(term) - 1, 1)
    WHEN length(term) > 4 AND ends_with(term, 'си')
      THEN substr(term, 1, length(term) - 2) || 'х'
    WHEN length(term) > 4 AND ends_with(term, 'и')
      THEN substr(term, 1, length(term) - 1)
    ELSE term END AS term FROM s2),
s4 AS MATERIALIZED (  -- final я, then final а/о/е (two sequential strips)
  SELECT doc_id, done,
    CASE WHEN NOT done AND length(term) > 3 AND ends_with(term, 'я')
         THEN substr(term, 1, length(term) - 1) ELSE term END AS term
  FROM s3),
s5 AS MATERIALIZED (
  SELECT doc_id, done,
    CASE WHEN NOT done AND length(term) > 3 AND
              (ends_with(term, 'а') OR ends_with(term, 'о') OR
               ends_with(term, 'е'))
         THEN substr(term, 1, length(term) - 1) ELSE term END AS term
  FROM s4),
s6 AS MATERIALIZED (  -- ен -> н
  SELECT doc_id, done,
    CASE WHEN NOT done AND length(term) > 4 AND ends_with(term, 'ен')
         THEN substr(term, 1, length(term) - 2) || 'н'
         ELSE term END AS term
  FROM s5),
stems AS MATERIALIZED (  -- fleeting ъ: ъN -> N
  SELECT doc_id,
    CASE WHEN NOT done AND length(term) > 5
              AND substr(term, length(term) - 1, 1) = 'ъ'
         THEN substr(term, 1, length(term) - 2)
              || substr(term, length(term), 1)
         ELSE term END AS term
  FROM s6),
tf AS (SELECT doc_id, term, count(*)::DOUBLE AS freq FROM stems
       GROUP BY 1, 2),
dl AS (SELECT doc_id, count(*)::DOUBLE AS len FROM stems GROUP BY 1),
st AS (SELECT count(*)::DOUBLE AS n, sum(len)::DOUBLE AS tot FROM dl),
df AS (SELECT term, count(*)::DOUBLE AS dfreq FROM tf GROUP BY 1),
sc AS (
  SELECT tf.doc_id, {_score_expr()} AS s
  FROM tf
  JOIN dl ON tf.doc_id = dl.doc_id
  JOIN df ON tf.term = df.term
  CROSS JOIN st
  WHERE tf.term = '{_bg_qstem}')
SELECT doc_id, round(s, 4) AS score, rank FROM (
  SELECT doc_id, s,
         row_number() OVER (ORDER BY s DESC, doc_id ASC) AS rank
  FROM sc
) WHERE rank <= 10
"""

    # Latvian chain: stop filter + generated longest-suffix CASE
    # (LatvianStemmer light rules) + unpalatalization stage
    from lucene_1_spark.analysis.languages import (LATVIAN_STOP, _LV_SUF,
                                                   latvian_stem)
    _lv_stops = ", ".join(f"'{w}'" for w in sorted(LATVIAN_STOP))
    _lv_qstem = latvian_stem("slow".translate(_LV_TRANS))
    _lv_strip = "\n    ".join(
        f"WHEN length(term) - {len(suf)} >= 3 AND ends_with(term, '{suf}') "
        f"THEN substr(term, 1, length(term) - {len(suf)})"
        for suf in _LV_SUF)
    o["ft_lv_stem_topk"] = f"""
WITH lvdocs AS (
  SELECT doc_id,
         translate(regexp_replace(lower(substr(coalesce(text,''),1,120)),
                                  '[^a-z ]', ' ', 'g'),
                   'abcdefghijklmnopqrstuvwxyz', '{_LV26}') AS lv
  FROM documents),
toks0 AS MATERIALIZED (
  SELECT doc_id, t AS term FROM (
    SELECT doc_id, unnest(string_split_regex(lv, ' +')) AS t FROM lvdocs
  ) WHERE t <> '' AND t NOT IN ({_lv_stops})),
s1 AS MATERIALIZED (
  SELECT doc_id, CASE
    {_lv_strip}
    ELSE term END AS term
  FROM toks0),
stems AS MATERIALIZED (
  SELECT doc_id, CASE
    WHEN ends_with(term, 'š')
      THEN substr(term, 1, length(term) - 1) || 's'
    WHEN ends_with(term, 'ž')
      THEN substr(term, 1, length(term) - 1) || 'z'
    WHEN ends_with(term, 'č')
      THEN substr(term, 1, length(term) - 1) || 'c'
    ELSE term END AS term
  FROM s1),
tf AS (SELECT doc_id, term, count(*)::DOUBLE AS freq FROM stems
       GROUP BY 1, 2),
dl AS (SELECT doc_id, count(*)::DOUBLE AS len FROM stems GROUP BY 1),
st AS (SELECT count(*)::DOUBLE AS n, sum(len)::DOUBLE AS tot FROM dl),
df AS (SELECT term, count(*)::DOUBLE AS dfreq FROM tf GROUP BY 1),
sc AS (
  SELECT tf.doc_id, {_score_expr()} AS s
  FROM tf
  JOIN dl ON tf.doc_id = dl.doc_id
  JOIN df ON tf.term = df.term
  CROSS JOIN st
  WHERE tf.term = '{_lv_qstem}')
SELECT doc_id, round(s, 4) AS score, rank FROM (
  SELECT doc_id, s,
         row_number() OVER (ORDER BY s DESC, doc_id ASC) AS rank
  FROM sc
) WHERE rank <= 10
"""

    # bigram LM perplexity: identical add-one arithmetic in SQL
    o["text_perplexity"] = """
WITH ordered AS (
  SELECT doc_id, tok, ord FROM (
    SELECT doc_id,
           unnest(list_filter(string_split_regex(lower(text), '\\s+'),
                              x -> x <> '')) AS tok,
           generate_subscripts(list_filter(string_split_regex(lower(text),
                              '\\s+'), x -> x <> ''), 1) AS ord
    FROM documents WHERE text IS NOT NULL)),
big AS (
  SELECT doc_id, tok, nxt FROM (
    SELECT doc_id, tok,
           lead(tok) OVER (PARTITION BY doc_id ORDER BY ord) AS nxt
    FROM ordered) WHERE nxt IS NOT NULL),
uni AS (SELECT tok, count(*)::DOUBLE AS c1 FROM big GROUP BY 1),
bi AS (SELECT tok, nxt, count(*)::DOUBLE AS c2 FROM big GROUP BY 1, 2),
v AS (SELECT count(DISTINCT tok)::DOUBLE AS vs FROM big),
sc AS (
  SELECT b.doc_id,
         ln((coalesce(bi.c2, 0) + 1.0) / (coalesce(uni.c1, 0) + v.vs))
           AS lp
  FROM big b
  LEFT JOIN bi ON b.tok = bi.tok AND b.nxt = bi.nxt
  LEFT JOIN uni ON b.tok = uni.tok
  CROSS JOIN v
  WHERE b.doc_id < 30)
SELECT doc_id, round(exp(-avg(lp)), 4) AS perplexity
FROM sc GROUP BY doc_id
"""

    # object-registered monitor: dismax = spark-docs UNION exact
    # "sort merge" adjacency docs; term-in-set = any-of member docs
    o["mon_object_batch"] = f"""
WITH {_TOKS},
sub AS (SELECT doc_id, term FROM toks WHERE doc_id < 200),
ordered AS (
  SELECT doc_id, tok, ord FROM (
    SELECT doc_id,
           unnest(list_filter(string_split_regex(lower(text), '\\s+'),
                              x -> x <> '')) AS tok,
           generate_subscripts(list_filter(string_split_regex(lower(text),
                              '\\s+'), x -> x <> ''), 1) AS ord
    FROM documents WHERE text IS NOT NULL AND doc_id < 200)),
ph AS (SELECT DISTINCT doc_id FROM (
  SELECT doc_id, tok,
         lead(tok) OVER (PARTITION BY doc_id ORDER BY ord) AS nxt
  FROM ordered) WHERE tok = 'sort' AND nxt = 'merge'),
dm AS (SELECT DISTINCT doc_id FROM (
  SELECT doc_id FROM sub WHERE term = 'spark'
  UNION ALL SELECT doc_id FROM ph)),
tis AS (SELECT DISTINCT doc_id FROM sub
        WHERE term IN ('vector', 'stream'))
SELECT * FROM (
  SELECT 'q_dm' AS query_id, count(*)::BIGINT AS n_matches,
         sum(doc_id)::BIGINT AS sum_doc_ids FROM dm
  UNION ALL
  SELECT 'q_tis', count(*)::BIGINT, sum(doc_id)::BIGINT FROM tis
) ORDER BY query_id
"""

    # query-time join: window-doc BM25 totals per lang, assigned to
    # every doc of that lang
    o["ft_join_query"] = f"""
WITH {_BM25_CTES},
ws AS (
  SELECT tf.doc_id, {_score_expr()} AS s
  FROM tf
  JOIN dl ON tf.doc_id = dl.doc_id
  JOIN df ON tf.term = df.term
  CROSS JOIN st
  WHERE tf.term = 'window'),
wl AS (SELECT d.lang, sum(ws.s) AS js
       FROM ws JOIN documents d ON ws.doc_id = d.doc_id GROUP BY 1),
outj AS (SELECT d.doc_id, wl.js FROM documents d
         JOIN wl ON d.lang = wl.lang)
SELECT doc_id, round(js, 4) AS score, rank FROM (
  SELECT doc_id, js,
         row_number() OVER (ORDER BY js DESC, doc_id ASC) AS rank
  FROM outj
) WHERE rank <= 10
"""

    # snapshot: current reader = spark-docs minus window-docs; the
    # retained snapshot still counts every spark doc
    o["snap_point_in_time"] = f"""
WITH {_TOKS},
sp AS (SELECT DISTINCT doc_id FROM toks WHERE term = 'spark'),
win AS (SELECT DISTINCT doc_id FROM toks WHERE term = 'window')
SELECT
  (SELECT count(*) FROM sp
   WHERE doc_id NOT IN (SELECT doc_id FROM win))::BIGINT AS current_n,
  (SELECT count(*) FROM sp)::BIGINT AS snapshot_n
"""

    # Naive Bayes: same closed-form smoothing arithmetic in SQL
    o["classify_naive_bayes"] = f"""
WITH {_TOKS},
tf AS (SELECT doc_id, term, count(*)::DOUBLE AS tf FROM toks
       GROUP BY 1, 2),
labels AS (SELECT doc_id, lang AS label FROM documents),
tl AS (SELECT tf.doc_id, tf.term, tf.tf, labels.label
       FROM tf JOIN labels ON tf.doc_id = labels.doc_id),
cs AS (SELECT label, count(DISTINCT doc_id)::DOUBLE AS n_docs,
              sum(tf) AS n_tokens FROM tl GROUP BY 1),
tc AS (SELECT term, label, sum(tf) AS cnt FROM tl GROUP BY 1, 2),
v AS (SELECT count(DISTINCT term)::DOUBLE AS vs FROM tf),
nt AS (SELECT sum(n_docs) AS ntot FROM cs),
tfq AS (SELECT * FROM tf WHERE doc_id < 50),
dl AS (SELECT doc_id, sum(tf) AS len FROM tfq GROUP BY 1),
base AS (
  SELECT dl.doc_id, cs.label,
         ln(cs.n_docs / nt.ntot) - dl.len * ln(cs.n_tokens + v.vs) AS b
  FROM dl CROSS JOIN cs CROSS JOIN nt CROSS JOIN v),
hits AS (
  SELECT tfq.doc_id, tc.label, sum(tfq.tf * ln(tc.cnt + 1.0)) AS hs
  FROM tfq JOIN tc ON tfq.term = tc.term GROUP BY 1, 2),
scored AS (
  SELECT base.doc_id, base.label, base.b + coalesce(hits.hs, 0) AS s
  FROM base LEFT JOIN hits
    ON base.doc_id = hits.doc_id AND base.label = hits.label)
SELECT doc_id, label, round(s, 6) AS log_score FROM (
  SELECT doc_id, label, s,
         row_number() OVER (PARTITION BY doc_id
                            ORDER BY s DESC, label ASC) AS rn
  FROM scored
) WHERE rn = 1
"""

    # analyzed text field: BM25 entirely over the head field's stats
    o["ft_textfield_topk"] = f"""
WITH {_HEAD_CTES},
sc AS (
  SELECT htf.doc_id,
         ln(1 + (hst.n - hdf.dfreq + 0.5) / (hdf.dfreq + 0.5)) * htf.freq
         / (htf.freq + {K1} * (1 - {B} + {B} * hdl.len / (hst.tot / hst.n)))
           AS s
  FROM htf JOIN hdl ON htf.doc_id = hdl.doc_id
  JOIN hdf ON htf.term = hdf.term CROSS JOIN hst
  WHERE htf.term = 'spark')
SELECT doc_id, round(s, 4) AS score, rank FROM (
  SELECT doc_id, s, row_number() OVER (ORDER BY s DESC, doc_id ASC) AS rank
  FROM sc) WHERE rank <= 10"""

    # phrase inside the head field: field-local adjacency + field stats
    o["ft_textfield_phrase"] = f"""
WITH {_HEAD_CTES},
hordered AS (
  SELECT doc_id, term, ord FROM (
    SELECT doc_id,
           unnest(list_filter(string_split_regex(lower(head), '\\s+'),
                              x -> x <> '')) AS term,
           generate_subscripts(list_filter(string_split_regex(lower(head),
                              '\\s+'), x -> x <> ''), 1) AS ord
    FROM h WHERE head IS NOT NULL)),
pf AS (
  SELECT doc_id, count(*)::DOUBLE AS pfreq FROM (
    SELECT doc_id, term,
           lead(term) OVER (PARTITION BY doc_id ORDER BY ord) AS nxt
    FROM hordered)
  WHERE term = 'sort' AND nxt = 'merge' GROUP BY doc_id),
pw AS (
  SELECT sum(ln(1 + (hst.n - hdf.dfreq + 0.5) / (hdf.dfreq + 0.5))) AS wt
  FROM hdf CROSS JOIN hst WHERE hdf.term IN ('sort', 'merge')),
sc AS (
  SELECT pf.doc_id,
         pw.wt * pf.pfreq
         / (pf.pfreq + {K1} * (1 - {B} + {B} * hdl.len / (hst.tot / hst.n)))
           AS s
  FROM pf JOIN hdl ON pf.doc_id = hdl.doc_id
  CROSS JOIN hst CROSS JOIN pw)
SELECT doc_id, round(s, 4) AS score, rank FROM (
  SELECT doc_id, s, row_number() OVER (ORDER BY s DESC, doc_id ASC) AS rank
  FROM sc) WHERE rank <= 10"""

    # batched multi-query: three per-query BM25 top-5 lists in one
    # result set keyed by query_id
    o["ft_batch_queries"] = f"""
WITH {_BM25_CTES},
qa AS (
  SELECT 'qa' AS query_id, tf.doc_id, sum({_score_expr()}) AS s
  FROM tf JOIN dl ON tf.doc_id = dl.doc_id
  JOIN df ON tf.term = df.term CROSS JOIN st
  WHERE tf.term = 'spark' GROUP BY tf.doc_id),
qb AS (
  SELECT 'qb' AS query_id, tf.doc_id, sum({_score_expr()}) AS s
  FROM tf JOIN dl ON tf.doc_id = dl.doc_id
  JOIN df ON tf.term = df.term CROSS JOIN st
  WHERE tf.term IN ('spark', 'merge')
  GROUP BY tf.doc_id HAVING count(DISTINCT tf.term) = 2),
qc AS (
  SELECT 'qc' AS query_id, tf.doc_id, sum({_score_expr()}) AS s
  FROM tf JOIN dl ON tf.doc_id = dl.doc_id
  JOIN df ON tf.term = df.term CROSS JOIN st
  WHERE tf.term = 'window'
    AND tf.doc_id NOT IN (SELECT doc_id FROM toks WHERE term = 'batch')
  GROUP BY tf.doc_id),
uni AS (SELECT * FROM qa UNION ALL SELECT * FROM qb
        UNION ALL SELECT * FROM qc)
SELECT query_id, doc_id, round(s, 4) AS score, rank FROM (
  SELECT query_id, doc_id, s,
         row_number() OVER (PARTITION BY query_id
                            ORDER BY s DESC, doc_id ASC) AS rank
  FROM uni) WHERE rank <= 5"""

    # ClassicSimilarity: sqrt(tf) * (ln((N+1)/(df+1))+1)^2 / sqrt(len)
    o["ft_classic_topk"] = f"""
WITH {_TOKS},
tf AS (SELECT doc_id, term, count(*)::DOUBLE AS freq FROM toks GROUP BY 1, 2),
dl AS (SELECT doc_id, count(*)::DOUBLE AS len FROM toks GROUP BY 1),
st AS (SELECT count(*)::DOUBLE AS n FROM dl),
df AS (SELECT term, count(*)::DOUBLE AS dfreq FROM tf GROUP BY 1),
sc AS (
  SELECT tf.doc_id,
         sum(sqrt(tf.freq)
             * pow(ln((st.n + 1) / (df.dfreq + 1)) + 1, 2)
             / sqrt(greatest(dl.len, 1))) AS s
  FROM tf JOIN dl ON tf.doc_id = dl.doc_id
  JOIN df ON tf.term = df.term CROSS JOIN st
  WHERE tf.term IN ('spark', 'merge', 'window')
  GROUP BY tf.doc_id)
SELECT doc_id, round(s, 4) AS score, rank FROM (
  SELECT doc_id, s, row_number() OVER (ORDER BY s DESC, doc_id ASC) AS rank
  FROM sc) WHERE rank <= 10"""

    # LMDirichlet: sum over terms of
    # max(0, ln(1 + tf/(mu*P(t|C))) + ln(mu/(len+mu))), mu=2000,
    # P(t|C) = (ttf+1)/(sumTotalTermFreq+1)
    o["ft_lmd_topk"] = f"""
WITH {_TOKS},
tf AS (SELECT doc_id, term, count(*)::DOUBLE AS freq FROM toks GROUP BY 1, 2),
dl AS (SELECT doc_id, count(*)::DOUBLE AS len FROM toks GROUP BY 1),
st AS (SELECT sum(len)::DOUBLE AS tot FROM dl),
cf AS (SELECT term, sum(freq)::DOUBLE AS ttf FROM tf GROUP BY 1),
sc AS (
  SELECT tf.doc_id,
         sum(greatest(0.0,
             ln(1 + tf.freq / (2000.0 * ((cf.ttf + 1) / (st.tot + 1))))
             + ln(2000.0 / (dl.len + 2000.0)))) AS s
  FROM tf JOIN dl ON tf.doc_id = dl.doc_id
  JOIN cf ON tf.term = cf.term CROSS JOIN st
  WHERE tf.term IN ('spark', 'merge', 'window')
  GROUP BY tf.doc_id)
SELECT doc_id, round(s, 4) AS score, rank FROM (
  SELECT doc_id, s, row_number() OVER (ORDER BY s DESC, doc_id ASC) AS rank
  FROM sc) WHERE rank <= 10"""

    # BooleanSimilarity: each matched clause scores its boost
    # (spark^1, merge^2, window^1)
    o["ft_boolean_sim_topk"] = f"""
WITH {_TOKS},
pres AS (SELECT DISTINCT doc_id, term FROM toks
         WHERE term IN ('spark', 'merge', 'window')),
sc AS (SELECT doc_id,
              sum(CASE WHEN term = 'merge' THEN 2.0 ELSE 1.0
                  END)::DOUBLE AS s
       FROM pres GROUP BY doc_id)
SELECT doc_id, round(s, 4) AS score, rank FROM (
  SELECT doc_id, s, row_number() OVER (ORDER BY s DESC, doc_id ASC) AS rank
  FROM sc) WHERE rank <= 10"""

    # SweetSpotSimilarity (misc/SweetSpotSimilarity.java): idf_classic^2
    # weight, baselineTf (base=1, min=2), plateau lengthNorm over [5,40]
    o["ft_sweet_spot_topk"] = f"""
WITH {_TOKS},
tf AS (SELECT doc_id, term, count(*)::DOUBLE AS freq FROM toks GROUP BY 1, 2),
dl AS (SELECT doc_id, count(*)::DOUBLE AS len FROM toks GROUP BY 1),
st AS (SELECT count(*)::DOUBLE AS n FROM dl),
df AS (SELECT term, count(*)::DOUBLE AS dfreq FROM tf GROUP BY 1),
sc AS (
  SELECT tf.doc_id,
         sum(pow(ln((st.n + 1) / (df.dfreq + 1)) + 1, 2)
             * (CASE WHEN tf.freq <= 2.0 THEN 1.0
                     ELSE sqrt(tf.freq + 1.0 - 2.0) END)
             / sqrt(0.5 * (abs(dl.len - 5.0) + abs(dl.len - 40.0)
                           - 35.0) + 1.0)) AS s
  FROM tf JOIN dl ON tf.doc_id = dl.doc_id
  JOIN df ON tf.term = df.term CROSS JOIN st
  WHERE tf.term IN ('spark', 'merge', 'window')
  GROUP BY tf.doc_id)
SELECT doc_id, round(s, 4) AS score, rank FROM (
  SELECT doc_id, s, row_number() OVER (ORDER BY s DESC, doc_id ASC) AS rank
  FROM sc) WHERE rank <= 10"""

    # CommonTermsQuery: df-split at ceil(0.5 * maxDoc) — low group
    # ('dup') is required, high group ('spark','merge') only scores;
    # per-term BM25-double contributions summed over matched terms
    o["ft_common_terms_topk"] = f"""
WITH {_BM25_CTES},
cls AS (
  SELECT qt.term,
         CASE WHEN coalesce(df.dfreq, 0) > ceil(0.5 * st.n)
              THEN 1 ELSE 0 END AS is_high
  FROM (SELECT unnest(['dup', 'spark', 'merge']) AS term) qt
  LEFT JOIN df ON qt.term = df.term CROSS JOIN st),
msc AS (
  SELECT tf.doc_id, cls.is_high, {_score_expr()} AS s
  FROM tf JOIN cls ON tf.term = cls.term
  JOIN dl ON tf.doc_id = dl.doc_id
  JOIN df ON tf.term = df.term CROSS JOIN st),
agg AS (
  SELECT doc_id, sum(s) AS s,
         max(CASE WHEN is_high = 0 THEN 1 ELSE 0 END) AS has_low
  FROM msc GROUP BY doc_id)
SELECT doc_id, round(s, 4) AS score, rank FROM (
  SELECT doc_id, s, row_number() OVER (ORDER BY s DESC, doc_id ASC) AS rank
  FROM agg WHERE has_low = 1) WHERE rank <= 10"""

    # Phonetic search: tokens ENCODED to Soundex in SQL (the twin
    # re-derives the encoder from the same constants via
    # analysis.phonetic.soundex_sql), then plain BM25-double over the
    # code terms; query codes computed from the misspelled literals
    from lucene_1_spark.analysis.phonetic import soundex_sql as _sx
    o["ft_phonetic_topk"] = f"""
WITH {_TOKS},
enc AS (SELECT doc_id, {_sx('term')} AS term FROM toks),
tf AS (SELECT doc_id, term, count(*)::DOUBLE AS freq FROM enc GROUP BY 1, 2),
dl AS (SELECT doc_id, count(*)::DOUBLE AS len FROM enc GROUP BY 1),
st AS (SELECT count(*)::DOUBLE AS n, sum(len)::DOUBLE AS tot FROM dl),
df AS (SELECT term, count(*)::DOUBLE AS dfreq FROM tf GROUP BY 1),
qc AS (SELECT {_sx("'spork'")} AS term UNION ALL SELECT {_sx("'marge'")}),
sc AS (
  SELECT tf.doc_id, sum({_score_expr()}) AS s
  FROM tf JOIN dl ON tf.doc_id = dl.doc_id
  JOIN df ON tf.term = df.term CROSS JOIN st
  WHERE tf.term IN (SELECT term FROM qc)
  GROUP BY tf.doc_id)
SELECT doc_id, round(s, 4) AS score, rank FROM (
  SELECT doc_id, s, row_number() OVER (ORDER BY s DESC, doc_id ASC) AS rank
  FROM sc) WHERE rank <= 10"""

    # MemoryIndex percolation: phrase(sort merge) OR (window AND NOT
    # batch) — adjacency via lead() over token ordinals
    o["ft_memory_percolate_count"] = """
WITH ordered AS (
  SELECT doc_id, term, ord FROM (
    SELECT doc_id,
           unnest(list_filter(string_split_regex(lower(text), '\\s+'),
                              x -> x <> '')) AS term,
           generate_subscripts(list_filter(string_split_regex(lower(text),
                              '\\s+'), x -> x <> ''), 1) AS ord
    FROM documents WHERE text IS NOT NULL)),
ph AS (
  SELECT DISTINCT doc_id FROM (
    SELECT doc_id, term,
           lead(term) OVER (PARTITION BY doc_id ORDER BY ord) AS nxt
    FROM ordered)
  WHERE term = 'sort' AND nxt = 'merge'),
wb AS (
  SELECT doc_id FROM ordered GROUP BY doc_id
  HAVING max(CASE WHEN term = 'window' THEN 1 ELSE 0 END) = 1
     AND max(CASE WHEN term = 'batch' THEN 1 ELSE 0 END) = 0)
SELECT count(*)::BIGINT AS n_docs FROM (
  SELECT doc_id FROM ph UNION SELECT doc_id FROM wb)"""

    # round-7 similarity family — all over the same whitespace-token
    # corpus stats as ft_lmd_topk
    _LM_STATS = """
tf AS (SELECT doc_id, term, count(*)::DOUBLE AS freq FROM toks GROUP BY 1, 2),
dl AS (SELECT doc_id, count(*)::DOUBLE AS len FROM toks GROUP BY 1),
st AS (SELECT count(*)::DOUBLE AS n, sum(len)::DOUBLE AS tot FROM dl),
cf AS (SELECT term, sum(freq)::DOUBLE AS ttf,
              count(*)::DOUBLE AS dfreq FROM tf GROUP BY 1)"""

    def _sim_oracle(score_sql: str) -> str:
        return f"""
WITH {_TOKS},{_LM_STATS},
sc AS (
  SELECT tf.doc_id, sum({score_sql}) AS s
  FROM tf JOIN dl ON tf.doc_id = dl.doc_id
  JOIN cf ON tf.term = cf.term CROSS JOIN st
  WHERE tf.term IN ('spark', 'merge', 'window')
  GROUP BY tf.doc_id)
SELECT doc_id, round(s, 4) AS score, rank FROM (
  SELECT doc_id, s, row_number() OVER (ORDER BY s DESC, doc_id ASC) AS rank
  FROM sc) WHERE rank <= 10"""

    o["ft_lmjm_topk"] = _sim_oracle(
        "ln(1 + (0.9 * tf.freq / greatest(dl.len, 1.0))"
        " / (0.1 * ((cf.ttf + 1) / (st.tot + 1))))")
    _DFI_E = "(((cf.ttf + 1) / (st.tot + 1)) * dl.len)"
    o["ft_dfi_topk"] = _sim_oracle(
        f"CASE WHEN tf.freq > {_DFI_E} THEN "
        f"log2((tf.freq - {_DFI_E}) * (tf.freq - {_DFI_E}) / {_DFI_E}"
        f" + 1.0) ELSE 0.0 END")
    _TFN_H2 = "(tf.freq * log2(1 + (st.tot / st.n) / greatest(dl.len, 1.0)))"
    o["ft_dfr_topk"] = _sim_oracle(
        f"log2(1 + (st.n + 1) / (cf.ttf + 0.5))"
        f" * {_TFN_H2} / (1 + {_TFN_H2})")
    o["ft_ib_topk"] = _sim_oracle(
        f"ln(1 + {_TFN_H2} / ((cf.dfreq + 1) / (st.n + 1)))")
    o["ft_axiomatic_topk"] = _sim_oracle(
        "pow((st.n + 1) / cf.dfreq, 0.35) * tf.freq"
        " / (tf.freq + 0.5 + 0.5 * dl.len / (st.tot / st.n))")
    # IndriDirichlet: ln((tf + mu*ttf/T)/(len + mu)), mu=2000
    o["ft_indri_topk"] = _sim_oracle(
        "ln((tf.freq + 2000.0 * cf.ttf / st.tot) / (dl.len + 2000.0))")
    # AxiomaticF1LOG: ln((N+1)/n) * (1+ln(1+ln(tf))) * (avgdl+s)/(avgdl+len*s)
    o["ft_ax_f1log_topk"] = _sim_oracle(
        "ln((st.n + 1) / cf.dfreq) * (1 + ln(1 + ln(tf.freq)))"
        " * ((st.tot / st.n) + 0.5)"
        " / ((st.tot / st.n) + dl.len * 0.5)")
    # DFR BasicModelG + AfterEffectL + H2: lambda = (ttf+1)/(N+ttf+1),
    # score = B - (B-A)/(1+tfn)
    _G_LAM = "((cf.ttf + 1) / (st.n + cf.ttf + 1))"
    o["ft_dfr_g_topk"] = _sim_oracle(
        f"log2((1 + {_G_LAM}) / {_G_LAM})"
        f" - (log2((1 + {_G_LAM}) / {_G_LAM}) - log2({_G_LAM} + 1))"
        f" / (1 + {_TFN_H2})")
    # RawTF: summed raw term frequency
    o["ft_rawtf_topk"] = _sim_oracle("tf.freq")

    # DiversifiedTopDocsCollector: global top-10, max 3 hits per lang
    o["ft_diversified_topk"] = f"""
WITH {_BM25_CTES},
sc AS (
  SELECT tf.doc_id, sum({_score_expr()}) AS s
  FROM tf JOIN dl ON tf.doc_id = dl.doc_id
  JOIN df ON tf.term = df.term CROSS JOIN st
  WHERE tf.term IN ('spark', 'merge')
  GROUP BY tf.doc_id),
keyed AS (
  SELECT sc.doc_id, sc.s,
         row_number() OVER (PARTITION BY doc.lang
                            ORDER BY sc.s DESC, sc.doc_id ASC) AS rk
  FROM sc JOIN documents doc ON sc.doc_id = doc.doc_id)
SELECT doc_id, round(s, 4) AS score, rank FROM (
  SELECT doc_id, s,
         row_number() OVER (ORDER BY s DESC, doc_id ASC) AS rank
  FROM keyed WHERE rk <= 3) WHERE rank <= 10"""

    # DocValuesStats over the matches of 'spark': stats of the
    # token-count length column (count/missing/min/max/mean/var_pop)
    o["dv_stats_length"] = f"""
WITH {_TOKS},
dl AS (SELECT doc_id, count(*) AS len FROM toks GROUP BY 1),
m AS (SELECT DISTINCT doc_id FROM toks WHERE term = 'spark')
SELECT count(dl.len)::BIGINT AS cnt,
       0::BIGINT AS missing,
       min(dl.len)::BIGINT AS min_len,
       max(dl.len)::BIGINT AS max_len,
       round(avg(dl.len::DOUBLE), 4) AS mean_len,
       round(var_pop(dl.len::DOUBLE), 2) AS var_len
FROM m JOIN dl ON m.doc_id = dl.doc_id"""
    # HighFreqTerms: top-10 content terms by doc freq, ties term asc
    o["ft_high_freq_terms"] = f"""
WITH {_TOKS},
stats AS (
  SELECT term, count(DISTINCT doc_id) AS doc_freq,
         count(*) AS total_term_freq
  FROM toks GROUP BY term)
SELECT term, doc_freq::BIGINT AS doc_freq,
       total_term_freq::BIGINT AS total_term_freq
FROM stats ORDER BY doc_freq DESC, term ASC LIMIT 10
"""

    # DynamicRangeUtil unit-weight ranges over token length of 'spark'
    # matches: sorted values cut into blocks of ceil(n / min(4, n))
    o["ft_dynamic_range_facets"] = f"""
WITH {_TOKS},
dl AS (SELECT doc_id, count(*) AS len FROM toks GROUP BY 1),
m AS (SELECT DISTINCT doc_id FROM toks WHERE term = 'spark'),
v AS (SELECT dl.doc_id, dl.len FROM m JOIN dl ON m.doc_id = dl.doc_id),
p AS (SELECT len,
             row_number() OVER (ORDER BY len ASC, doc_id ASC) AS rn,
             (SELECT count(*) FROM v) AS n
      FROM v)
SELECT floor((rn - 1) / ceil(n / least(4.0, n)))::BIGINT AS range_id,
       count(*)::BIGINT AS n_docs,
       min(len)::DOUBLE AS min_v,
       max(len)::DOUBLE AS max_v,
       round(avg(len::DOUBLE), 4) AS avg_v
FROM p GROUP BY 1 ORDER BY range_id
"""

    # FreeTextSuggester stupid backoff: bigram ratio when seen, else
    # ALPHA(0.4) * unigram ratio; context = 'data'
    o["suggest_free_text"] = """
WITH ordered AS MATERIALIZED (
  SELECT doc_id, tok, ord FROM (
    SELECT doc_id,
           unnest(list_filter(string_split_regex(lower(text), '\\s+'),
                              x -> x <> '')) AS tok,
           generate_subscripts(list_filter(string_split_regex(lower(text),
                              '\\s+'), x -> x <> ''), 1) AS ord
    FROM documents WHERE text IS NOT NULL)),
uni AS MATERIALIZED (
  SELECT tok AS w, count(*) AS cnt FROM ordered GROUP BY 1),
bi AS (
  SELECT t2 AS w, count(*) AS bcnt FROM (
    SELECT tok, lead(tok) OVER (PARTITION BY doc_id ORDER BY ord) AS t2
    FROM ordered)
  WHERE tok = 'data' AND t2 IS NOT NULL GROUP BY 1)
SELECT u.w AS word,
       round(CASE WHEN b.bcnt IS NOT NULL
                  THEN b.bcnt::DOUBLE / (SELECT cnt FROM uni
                                         WHERE w = 'data')
                  ELSE 0.4 * u.cnt::DOUBLE / (SELECT sum(cnt) FROM uni)
             END, 6) AS score
FROM uni u LEFT JOIN bi b ON u.w = b.w
WHERE u.w <> 'data'
ORDER BY CASE WHEN b.bcnt IS NOT NULL
              THEN b.bcnt::DOUBLE / (SELECT cnt FROM uni WHERE w = 'data')
              ELSE 0.4 * u.cnt::DOUBLE / (SELECT sum(cnt) FROM uni)
         END DESC, word ASC
LIMIT 10
"""

    # replica search == primary search == the plain BM25 oracle
    o["repl_search_topk"] = _bm25_sql(["spark"])

    # MultiSimilarity CombSUM: bm25_double + classic_double
    o["ft_multi_sim_topk"] = _sim_oracle(
        "ln(1 + (st.n - cf.dfreq + 0.5) / (cf.dfreq + 0.5))"
        " * tf.freq / (tf.freq + 1.2 * (0.25 + 0.75 * dl.len"
        " / (st.tot / st.n)))"
        " + pow(ln((st.n + 1) / (cf.dfreq + 1)) + 1, 2)"
        " * sqrt(tf.freq) / sqrt(greatest(dl.len, 1.0))")

    # SimpleQueryParser 'spark + merge window' ==
    # (spark AND merge) OR window; matching disjuncts' BM25 sums
    o["ft_simple_parse_topk"] = f"""
WITH {_BM25_CTES},
sm AS (SELECT doc_id FROM tf WHERE term = 'spark'
       INTERSECT SELECT doc_id FROM tf WHERE term = 'merge'),
sc AS (
  SELECT tf.doc_id,
         sum(CASE WHEN tf.term = 'window' THEN {_score_expr()}
                  WHEN tf.doc_id IN (SELECT doc_id FROM sm)
                       THEN {_score_expr()}
                  ELSE 0 END) AS s,
         max(CASE WHEN tf.term = 'window' THEN 1 ELSE 0 END) AS hw
  FROM tf JOIN dl ON tf.doc_id = dl.doc_id
  JOIN df ON tf.term = df.term CROSS JOIN st
  WHERE tf.term IN ('spark', 'merge', 'window')
  GROUP BY tf.doc_id)
SELECT doc_id, round(s, 4) AS score, rank FROM (
  SELECT doc_id, s, row_number() OVER (ORDER BY s DESC, doc_id ASC) AS rank
  FROM sc WHERE hw = 1 OR doc_id IN (SELECT doc_id FROM sm))
WHERE rank <= 10"""

    # doc-values range FILTER: bm25(spark) over docs with 100<=len<=300
    o["ft_dv_range_filter"] = f"""
WITH {_BM25_CTES},
sc AS (
  SELECT tf.doc_id, sum({_score_expr()}) AS s
  FROM tf JOIN dl ON tf.doc_id = dl.doc_id
  JOIN df ON tf.term = df.term CROSS JOIN st
  WHERE tf.term = 'spark'
    AND tf.doc_id IN (SELECT doc_id FROM dl WHERE len BETWEEN 100 AND 300)
  GROUP BY tf.doc_id)
SELECT doc_id, round(s, 4) AS score, rank FROM (
  SELECT doc_id, s, row_number() OVER (ORDER BY s DESC, doc_id ASC) AS rank
  FROM sc) WHERE rank <= 10"""

    # explain() totals == the search's own BM25 scores
    o["ft_explain_topk"] = _bm25_sql(["spark", "merge"], k=5)

    # keyword field term query: every lang=de doc matches with the same
    # per-field BM25 score — freq=1, field length 1, field avgdl 1, idf
    # over the FIELD's doc_count => w / (1 + k1)
    o["ft_field_term_topk"] = f"""
WITH f AS (SELECT doc_id FROM documents WHERE lang IS NOT NULL),
st AS (SELECT count(*)::DOUBLE AS n FROM f),
df AS (SELECT count(*)::DOUBLE AS d FROM documents WHERE lang = 'de')
SELECT doc_id,
       round(ln(1 + (st.n - df.d + 0.5) / (df.d + 0.5)) / (1 + {K1}), 4)
         AS score,
       row_number() OVER (ORDER BY doc_id ASC) AS rank
FROM documents, st, df WHERE lang = 'de'
ORDER BY doc_id ASC LIMIT 10"""

    # keyword FILTER: lang=de restricts, only 'spark' scores
    o["ft_field_filter_topk"] = f"""
WITH {_BM25_CTES},
sc AS (
  SELECT tf.doc_id, sum({_score_expr()}) AS s
  FROM tf JOIN dl ON tf.doc_id = dl.doc_id
  JOIN df ON tf.term = df.term CROSS JOIN st
  WHERE tf.term = 'spark'
    AND tf.doc_id IN (SELECT doc_id FROM documents WHERE lang = 'de')
  GROUP BY tf.doc_id)
SELECT doc_id, round(s, 4) AS score, rank FROM (
  SELECT doc_id, s, row_number() OVER (ORDER BY s DESC, doc_id ASC) AS rank
  FROM sc) WHERE rank <= 10"""

    # composite boolean: MUST term + MUST exact phrase — doc needs both,
    # score = bm25(spark) + phrase pseudo-term score (sub-plan join)
    _ORDERED_CTE = """ordered AS (
  SELECT doc_id, term, ord FROM (
    SELECT doc_id,
           unnest(list_filter(string_split_regex(lower(text), '\\s+'),
                              x -> x <> '')) AS term,
           generate_subscripts(list_filter(string_split_regex(lower(text),
                              '\\s+'), x -> x <> ''), 1) AS ord
    FROM documents WHERE text IS NOT NULL))"""
    _PHRASE_PF = """pf AS (
  SELECT doc_id, count(*)::DOUBLE AS pfreq FROM (
    SELECT doc_id, term,
           lead(term) OVER (PARTITION BY doc_id ORDER BY ord) AS nxt
    FROM ordered)
  WHERE term = 'sort' AND nxt = 'merge' GROUP BY doc_id),
pw AS (
  SELECT sum(ln(1 + (st.n - df.dfreq + 0.5) / (df.dfreq + 0.5))) AS wt
  FROM df CROSS JOIN st WHERE df.term IN ('sort', 'merge')),
psc AS (
  SELECT pf.doc_id,
         pw.wt * pf.pfreq
         / (pf.pfreq + {k1} * (1 - {b} + {b} * dl.len / (st.tot / st.n))) AS s
  FROM pf JOIN dl ON pf.doc_id = dl.doc_id CROSS JOIN st CROSS JOIN pw)""" \
        .format(k1=K1, b=B)
    o["ft_bool_phrase_topk"] = f"""
WITH {_BM25_CTES},
{_ORDERED_CTE},
{_PHRASE_PF},
tsc AS (
  SELECT tf.doc_id, sum({_score_expr()}) AS s
  FROM tf JOIN dl ON tf.doc_id = dl.doc_id
  JOIN df ON tf.term = df.term CROSS JOIN st
  WHERE tf.term = 'spark' GROUP BY tf.doc_id)
SELECT doc_id, round(s, 4) AS score, rank FROM (
  SELECT t.doc_id, t.s + p.s AS s,
         row_number() OVER (ORDER BY (t.s + p.s) DESC, t.doc_id ASC) AS rank
  FROM tsc t JOIN psc p ON t.doc_id = p.doc_id) WHERE rank <= 10"""

    # phrase SHOULD + MUST_NOT term: phrase score, 'window' docs excluded
    o["ft_bool_phrase_not"] = f"""
WITH {_BM25_CTES},
{_ORDERED_CTE},
{_PHRASE_PF}
SELECT doc_id, round(s, 4) AS score, rank FROM (
  SELECT doc_id, s, row_number() OVER (ORDER BY s DESC, doc_id ASC) AS rank
  FROM psc
  WHERE doc_id NOT IN (SELECT doc_id FROM toks WHERE term = 'window')
) WHERE rank <= 10"""

    # ConstantScore(merge, 0.5) AND spark: bm25(spark) + 0.5
    o["ft_bool_constscore"] = f"""
WITH {_BM25_CTES},
tsc AS (
  SELECT tf.doc_id, sum({_score_expr()}) AS s
  FROM tf JOIN dl ON tf.doc_id = dl.doc_id
  JOIN df ON tf.term = df.term CROSS JOIN st
  WHERE tf.term = 'spark' GROUP BY tf.doc_id)
SELECT doc_id, round(s, 4) AS score, rank FROM (
  SELECT doc_id, s + 0.5 AS s,
         row_number() OVER (ORDER BY (s + 0.5) DESC, doc_id ASC) AS rank
  FROM tsc
  WHERE doc_id IN (SELECT doc_id FROM toks WHERE term = 'merge')
) WHERE rank <= 10"""

    # synonym: one pseudo-term with df = max over members, freq = sum
    o["ft_synonym_topk"] = f"""
WITH {_BM25_CTES},
members AS (SELECT * FROM tf WHERE term IN ('spark', 'merge')),
mdf AS (SELECT max(dfreq) AS dfm FROM df WHERE term IN ('spark', 'merge')),
merged AS (SELECT doc_id, sum(freq) AS freq FROM members GROUP BY doc_id),
sc AS (
  SELECT m.doc_id,
         ln(1 + (st.n - mdf.dfm + 0.5) / (mdf.dfm + 0.5)) * m.freq
         / (m.freq + {K1} * (1 - {B} + {B} * dl.len / (st.tot / st.n))) AS s
  FROM merged m JOIN dl ON m.doc_id = dl.doc_id
  CROSS JOIN st CROSS JOIN mdf)
SELECT doc_id, round(s, 4) AS score, rank FROM (
  SELECT doc_id, s, row_number() OVER (ORDER BY s DESC, doc_id ASC) AS rank
  FROM sc) WHERE rank <= 10"""

    o["ft_const_score"] = f"""WITH {_TOKS}
SELECT doc_id, 2.5 AS score FROM (
  SELECT DISTINCT doc_id FROM toks WHERE term = 'window')
ORDER BY doc_id LIMIT 10"""

    o["ft_term_count"] = f"""WITH {_TOKS}
SELECT count(DISTINCT doc_id)::BIGINT AS n FROM toks WHERE term = 'batch'"""
    o["ft_match_all_count"] = "SELECT count(*)::BIGINT AS n FROM documents"
    o["ft_collection_stats"] = f"""WITH {_BM25_CTES}
SELECT (SELECT count(*) FROM documents)::BIGINT AS n_docs,
       (SELECT count(*) FROM dl)::BIGINT AS doc_count,
       (SELECT sum(len) FROM dl)::BIGINT AS sum_total_term_freq,
       (SELECT count(*) FROM tf)::BIGINT AS sum_doc_freq"""

    o["ft_prefix_count"] = f"""WITH {_TOKS}
SELECT count(DISTINCT doc_id)::BIGINT AS n FROM toks WHERE term LIKE 's%'"""
    o["ft_wildcard_count"] = f"""WITH {_TOKS}
SELECT count(DISTINCT doc_id)::BIGINT AS n FROM toks WHERE term LIKE 's%t'"""
    o["ft_fuzzy_count"] = f"""WITH {_TOKS}
SELECT count(DISTINCT doc_id)::BIGINT AS n FROM toks
WHERE levenshtein(term, 'spark') <= 1"""
    o["ft_term_range_stats"] = f"""WITH {_TOKS}
SELECT term, count(DISTINCT doc_id)::BIGINT AS doc_freq,
       count(*)::BIGINT AS total_term_freq
FROM toks WHERE term >= 'm' AND term < 't' GROUP BY term"""
    o["ft_regexp_stats"] = f"""WITH {_TOKS}
SELECT term, count(DISTINCT doc_id)::BIGINT AS doc_freq
FROM toks WHERE regexp_matches(term, '^s.*t$') GROUP BY term"""

    o["ft_facet_lang"] = f"""WITH {_TOKS}
SELECT d.lang AS lang, count(DISTINCT t.doc_id)::BIGINT AS n
FROM toks t JOIN documents d USING (doc_id)
WHERE t.term = 'spark' GROUP BY 1"""
    o["ft_facet_range_nchars"] = f"""WITH {_TOKS}
SELECT (floor(d.n_chars / 100) * 100)::BIGINT AS bucket_lo,
       count(DISTINCT t.doc_id)::BIGINT AS n
FROM toks t JOIN documents d USING (doc_id)
WHERE t.term = 'spark' GROUP BY 1"""
    # DrillSideways: per-dim counts with the OTHER dim's filter applied
    # (token length = whitespace token count = dl.len)
    o["ft_drill_sideways"] = f"""WITH {_TOKS},
dl AS (SELECT doc_id, count(*)::DOUBLE AS len FROM toks GROUP BY 1),
m AS (SELECT DISTINCT t.doc_id FROM toks t WHERE t.term = 'spark'),
j AS (SELECT m.doc_id, d.lang,
             (floor(dl.len / 100) * 100)::BIGINT AS len_bucket
      FROM m JOIN documents d USING (doc_id) JOIN dl USING (doc_id))
SELECT 'lang' AS dim, lang AS value, count(*)::BIGINT AS n
FROM j WHERE len_bucket = 200 GROUP BY lang
UNION ALL
SELECT 'len_bucket', len_bucket::VARCHAR, count(*)::BIGINT
FROM j WHERE lang = 'en' GROUP BY len_bucket"""

    # hierarchical taxonomy counts: every prefix of lang/<bucket>
    o["ft_taxonomy_facets"] = f"""WITH {_TOKS},
m AS (SELECT DISTINCT doc_id FROM toks WHERE term = 'spark'),
j AS (SELECT d.lang, (floor(d.n_chars / 200) * 200)::BIGINT AS b
      FROM m JOIN documents d USING (doc_id))
SELECT lang AS path, 1::BIGINT AS depth, count(*)::BIGINT AS n
FROM j GROUP BY lang
UNION ALL
SELECT lang || '/' || b::VARCHAR AS path, 2::BIGINT AS depth,
       count(*)::BIGINT AS n
FROM j GROUP BY lang || '/' || b::VARCHAR"""

    o["ft_assoc_facet_sums"] = f"""WITH {_TOKS},
m AS (SELECT DISTINCT doc_id FROM toks WHERE term = 'spark'),
j AS (SELECT d.lang, d.source, d.n_chars
      FROM m JOIN documents d USING (doc_id)),
a AS (
  SELECT 'lang/' || lang AS path, n_chars::DOUBLE AS value FROM j
  UNION ALL
  SELECT 'source/' || source AS path, 1.0 AS value FROM j)
SELECT path, sum(value) AS total_sum, max(value) AS total_max
FROM a GROUP BY path"""

    o["ft_taxonomy_children"] = f"""WITH {_TOKS},
m AS (SELECT DISTINCT doc_id FROM toks WHERE term = 'spark'),
j AS (SELECT d.lang, (floor(d.n_chars / 200) * 200)::BIGINT AS b
      FROM m JOIN documents d USING (doc_id))
SELECT b::VARCHAR AS child, count(*)::BIGINT AS n
FROM j WHERE lang = 'en' GROUP BY b
ORDER BY n DESC, child ASC"""

    o["ft_group_top2_per_lang"] = f"""
WITH {_BM25_CTES},
sc AS (
  SELECT tf.doc_id, sum({_score_expr()}) AS s
  FROM tf JOIN dl ON tf.doc_id = dl.doc_id
  JOIN df ON tf.term = df.term CROSS JOIN st
  WHERE tf.term IN ('spark', 'merge', 'window')
  GROUP BY tf.doc_id
)
SELECT lang, doc_id, round(s, 4) AS score, rnk FROM (
  SELECT d.lang, sc.doc_id, sc.s,
         row_number() OVER (PARTITION BY d.lang
                            ORDER BY sc.s DESC, sc.doc_id ASC) AS rnk
  FROM sc JOIN documents d USING (doc_id)
) WHERE rnk <= 2"""

    o["dedup_exact_groups"] = """
WITH docs2 AS (
  SELECT doc_id, text FROM documents
  UNION ALL SELECT doc_id + 1000000, text FROM documents)
SELECT md5(text) AS digest, count(*)::BIGINT AS n_dups,
       min(doc_id) AS keep_doc_id
FROM docs2 GROUP BY 1 HAVING count(*) > 1"""

    # mirrors the engine's max_shingle_df=10000 stop-shingle cap: hot
    # shingles leave the universe before sizes AND intersections
    o["dedup_ngram_jaccard"] = f"""
WITH {_SHINGLE_CTES},
sh2 AS (
  SELECT * FROM sh WHERE shingle IN (
    SELECT shingle FROM sh GROUP BY shingle HAVING count(*) <= 10000)),
sizes AS (SELECT doc_id, count(*) AS n FROM sh2 GROUP BY 1),
inter AS (
  SELECT a.doc_id AS doc_a, b.doc_id AS doc_b, count(*) AS i
  FROM sh2 a JOIN sh2 b ON a.shingle = b.shingle AND a.doc_id < b.doc_id
  GROUP BY 1, 2)
SELECT doc_a, doc_b, round(i / (sa.n + sb.n - i), 6) AS jaccard
FROM inter
JOIN sizes sa ON sa.doc_id = doc_a
JOIN sizes sb ON sb.doc_id = doc_b
WHERE i / (sa.n + sb.n - i) >= 0.9"""

    # decontamination: distinct 8-grams per side, inverted-index join
    # (no 8-gram at this scale exceeds the engine's 10k hot cap, so the
    # cap is a no-op here and the SQL mirrors the uncapped semantics)
    o["pipe_decontamination"] = """
WITH ordered AS (
  SELECT doc_id, tok, ord FROM (
    SELECT doc_id,
           unnest(list_filter(string_split_regex(lower(text), '\\s+'),
                              x -> x <> '')) AS tok,
           generate_subscripts(list_filter(string_split_regex(lower(text),
                              '\\s+'), x -> x <> ''), 1) AS ord
    FROM documents WHERE text IS NOT NULL)),
g AS (
  SELECT doc_id, tok || ' ' || t2 || ' ' || t3 || ' ' || t4 || ' ' || t5
         || ' ' || t6 || ' ' || t7 || ' ' || t8 AS shingle FROM (
    SELECT doc_id, tok,
           lead(tok, 1) OVER w AS t2, lead(tok, 2) OVER w AS t3,
           lead(tok, 3) OVER w AS t4, lead(tok, 4) OVER w AS t5,
           lead(tok, 5) OVER w AS t6, lead(tok, 6) OVER w AS t7,
           lead(tok, 7) OVER w AS t8
    FROM ordered WINDOW w AS (PARTITION BY doc_id ORDER BY ord))
  WHERE t8 IS NOT NULL),
sh AS (SELECT DISTINCT doc_id, shingle FROM g),
tr AS (SELECT doc_id AS train_doc, shingle FROM sh),
ev AS (SELECT doc_id + 1000000 AS eval_doc, shingle FROM sh
       WHERE doc_id < 50)
SELECT train_doc, eval_doc, count(*)::BIGINT AS n_shared
FROM tr JOIN ev USING (shingle) GROUP BY 1, 2"""

    # intra-doc 3-gram repetition signals
    o["text_repetition"] = """
WITH ordered AS (
  SELECT doc_id, tok, ord FROM (
    SELECT doc_id,
           unnest(list_filter(string_split_regex(lower(coalesce(text, '')),
                              '\\s+'), x -> x <> '')) AS tok,
           generate_subscripts(list_filter(string_split_regex(
                              lower(coalesce(text, '')), '\\s+'),
                              x -> x <> ''), 1) AS ord
    FROM documents)),
g AS (
  SELECT doc_id, tok || ' ' || t2 || ' ' || t3 AS gram FROM (
    SELECT doc_id, tok,
           lead(tok, 1) OVER w AS t2, lead(tok, 2) OVER w AS t3
    FROM ordered WINDOW w AS (PARTITION BY doc_id ORDER BY ord))
  WHERE t3 IS NOT NULL),
pg AS (SELECT doc_id, gram, count(*)::DOUBLE AS c FROM g GROUP BY 1, 2)
SELECT doc_id, sum(c)::BIGINT AS n_ngrams,
       round((sum(c) - count(*)) / greatest(sum(c), 1), 6)
         AS dup_ngram_ratio,
       round(max(c) / greatest(sum(c), 1), 6) AS top_ngram_ratio
FROM pg GROUP BY doc_id"""

    o["dedup_minhash_lsh"] = f"""
WITH {_SHINGLE_CTES},
sig AS (SELECT doc_id, {_minhash_cols_sql(8)} FROM sh GROUP BY doc_id),
bands AS (
  SELECT doc_id, 0 AS band, m0::VARCHAR || ',' || m1::VARCHAR AS bval FROM sig
  UNION ALL
  SELECT doc_id, 1, m2::VARCHAR || ',' || m3::VARCHAR FROM sig
  UNION ALL
  SELECT doc_id, 2, m4::VARCHAR || ',' || m5::VARCHAR FROM sig
  UNION ALL
  SELECT doc_id, 3, m6::VARCHAR || ',' || m7::VARCHAR FROM sig)
SELECT DISTINCT a.doc_id AS doc_a, b.doc_id AS doc_b
FROM bands a JOIN bands b
  ON a.band = b.band AND a.bval = b.bval AND a.doc_id < b.doc_id"""

    o["dedup_simhash"] = """
WITH docs2 AS (
  SELECT doc_id, text FROM documents
  UNION ALL SELECT doc_id + 1000000, text FROM documents),
ordered AS (
  SELECT doc_id, tok FROM (
    SELECT doc_id,
           unnest(list_filter(string_split_regex(lower(text), '\\s+'),
                              x -> x <> '')) AS tok
    FROM docs2 WHERE text IS NOT NULL)
),
tok48 AS (SELECT doc_id,
                 ('0x' || substr(md5(tok), 1, 12))::BIGINT AS h FROM ordered),
votes AS (
  SELECT doc_id, i,
         sum(CASE WHEN (h >> i) & 1 = 1 THEN 1 ELSE -1 END) AS v
  FROM tok48 CROSS JOIN (SELECT unnest(generate_series(0, 47)) AS i) bits
  GROUP BY doc_id, i)
SELECT doc_id,
       sum(CASE WHEN v > 0 THEN (1::BIGINT << i) ELSE 0 END)::BIGINT AS simhash
FROM votes GROUP BY doc_id"""

    o["sim_cosine_topk"] = """
WITH q AS (SELECT embedding::DOUBLE[] AS v FROM embeddings WHERE vec_id = 0),
pairs AS (
  SELECT e.vec_id, e.embedding[t.i]::DOUBLE AS a, q.v[t.i] AS b
  FROM embeddings e, q,
       (SELECT unnest(generate_series(1, (SELECT len(v) FROM q))) AS i) t),
cos AS (
  SELECT vec_id,
         sum(a * b) / (sqrt(sum(a * a)) * sqrt(sum(b * b))) AS c
  FROM pairs GROUP BY vec_id)
SELECT vec_id, round(c, 6) AS cosine FROM cos
ORDER BY c DESC, vec_id ASC LIMIT 10"""

    # IVF at full probe scans every inverted list == exact cosine
    o["sim_ivf_full_probe"] = o["sim_cosine_topk"]

    # LSH index probed at ALL buckets == exhaustive candidates == exact
    o["sim_lsh_index_topk"] = o["sim_cosine_topk"]

    # pre-filtered kNN: exact top-k among docs containing 'spark'
    o["knn_filtered_topk"] = f"""
WITH {_TOKS},
q AS (SELECT embedding::DOUBLE[] AS v FROM embeddings WHERE vec_id = 0),
allowed AS (SELECT DISTINCT doc_id FROM toks WHERE term = 'spark'),
pairs AS (
  SELECT e.vec_id, e.embedding[t.i]::DOUBLE AS a, q.v[t.i] AS b
  FROM embeddings e, q,
       (SELECT unnest(generate_series(1, (SELECT len(v) FROM q))) AS i) t
  WHERE e.vec_id IN (SELECT doc_id FROM allowed)),
cos AS (
  SELECT vec_id,
         sum(a * b) / (sqrt(sum(a * a)) * sqrt(sum(b * b))) AS c
  FROM pairs GROUP BY vec_id)
SELECT vec_id, round(c, 6) AS cosine FROM cos
ORDER BY c DESC, vec_id ASC LIMIT 10"""

    o["sim_near_dup_pairs"] = """
WITH e2 AS (
  SELECT vec_id, embedding::DOUBLE[] AS v FROM embeddings
  UNION ALL
  SELECT vec_id + 1000000, embedding::DOUBLE[] FROM embeddings),
pairs AS (
  SELECT a.vec_id AS id_a, b.vec_id AS id_b, a.v AS va, b.v AS vb
  FROM e2 a JOIN e2 b ON a.vec_id < b.vec_id),
flat AS (
  SELECT id_a, id_b, va[t.i] AS x, vb[t.i] AS y
  FROM pairs, (SELECT unnest(generate_series(1,
       (SELECT len(v) FROM e2 LIMIT 1))) AS i) t),
cos AS (
  SELECT id_a, id_b,
         sum(x * y) / (sqrt(sum(x * x)) * sqrt(sum(y * y))) AS c
  FROM flat GROUP BY id_a, id_b)
SELECT id_a, id_b, round(c, 6) AS cosine FROM cos WHERE c >= 0.98"""

    # SemDeDup keep-first audit: drops = vecs with a lower-id
    # near-duplicate (exact all-pairs baseline; the engine's LSH
    # buckets are exhaustive for these fixtures, same as
    # sim_near_dup_pairs)
    o["sim_semdedup_count"] = """
WITH e2 AS MATERIALIZED (
  SELECT vec_id, embedding::DOUBLE[] AS v FROM embeddings
  UNION ALL
  SELECT vec_id + 1000000, embedding::DOUBLE[] FROM embeddings),
pairs AS (
  SELECT a.vec_id AS id_a, b.vec_id AS id_b, a.v AS va, b.v AS vb
  FROM e2 a JOIN e2 b ON a.vec_id < b.vec_id),
flat AS (
  SELECT id_a, id_b, va[t.i] AS x, vb[t.i] AS y
  FROM pairs, (SELECT unnest(generate_series(1,
       (SELECT len(v) FROM e2 LIMIT 1))) AS i) t),
cos AS (
  SELECT id_a, id_b,
         sum(x * y) / (sqrt(sum(x * x)) * sqrt(sum(y * y))) AS c
  FROM flat GROUP BY id_a, id_b),
drops AS MATERIALIZED (
  SELECT DISTINCT id_b FROM cos WHERE c >= 0.98)
SELECT (SELECT count(*) FROM e2)::BIGINT AS n_total,
       ((SELECT count(*) FROM e2)
        - (SELECT count(*) FROM drops))::BIGINT AS n_kept,
       (SELECT count(*) FROM drops)::BIGINT AS n_dropped
"""

    # PII scrub audit: identical deterministic injection, then counts
    # with each kind counted on the text with earlier kinds redacted
    _PII_EMAIL = "[A-Za-z0-9._%+-]+@[A-Za-z0-9.-]+\\.[A-Za-z]{2,}"
    _PII_IPV4 = "\\b(\\d{1,3}\\.){3}\\d{1,3}\\b"
    _PII_PHONE = "\\b\\+?\\d[\\d -]{7,14}\\d\\b"
    o["pii_scrub_totals"] = f"""
WITH base AS MATERIALIZED (
  SELECT doc_id,
         coalesce(text, '')
         || CASE WHEN doc_id % 7 = 0
                 THEN ' contact user' || doc_id::VARCHAR || '@example.com'
                 ELSE '' END
         || CASE WHEN doc_id % 11 = 0
                 THEN ' host 10.0.' || (doc_id % 256)::VARCHAR || '.1'
                 ELSE '' END
         || CASE WHEN doc_id % 13 = 0
                 THEN ' call +1 555 123 4567' ELSE '' END AS text
  FROM documents),
s1 AS MATERIALIZED (
  SELECT doc_id,
         len(regexp_extract_all(text, '{_PII_EMAIL}')) AS email_n,
         regexp_replace(text, '{_PII_EMAIL}', '<email>', 'g') AS t1
  FROM base),
s2 AS MATERIALIZED (
  SELECT doc_id, email_n,
         len(regexp_extract_all(t1, '{_PII_IPV4}')) AS ipv4_n,
         regexp_replace(t1, '{_PII_IPV4}', '<ipv4>', 'g') AS t2
  FROM s1),
s3 AS (
  SELECT doc_id, email_n, ipv4_n,
         len(regexp_extract_all(t2, '{_PII_PHONE}')) AS phone_n
  FROM s2)
SELECT sum(email_n)::BIGINT AS email_total,
       sum(ipv4_n)::BIGINT AS ipv4_total,
       sum(phone_n)::BIGINT AS phone_total,
       sum(CASE WHEN email_n > 0 OR ipv4_n > 0 OR phone_n > 0
            THEN 1 ELSE 0 END)::BIGINT AS docs_touched
FROM s3
"""

    # stratified sample: salted-md5 keep decision, per-lang counts
    o["sample_stratified_counts"] = """
SELECT lang, count(*)::BIGINT AS n_kept
FROM documents
WHERE (('0x' || substr(md5('l1s' || doc_id::VARCHAR), 1, 12))::BIGINT
       % 1000000) / 1000000.0
      < CASE lang WHEN 'en' THEN 0.5 WHEN 'fr' THEN 0.25
                  WHEN 'zh' THEN 1.0 ELSE 0.1 END
GROUP BY lang ORDER BY lang
"""

    # sequence packing: global prefix-sum of whitespace token counts,
    # seq = floor(start / 512)
    o["pack_sequences_stats"] = """
WITH tc AS (
  SELECT doc_id,
         CASE WHEN text IS NULL THEN 0
              ELSE len(list_filter(string_split_regex(text, '\\s+'),
                                   x -> x <> '')) END AS n_tokens
  FROM documents),
cum AS (
  SELECT doc_id, n_tokens,
         sum(n_tokens) OVER (ORDER BY doc_id
           ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW)
         - n_tokens AS tok_start
  FROM tc)
SELECT floor(tok_start / 512.0)::BIGINT AS seq_id,
       count(*)::BIGINT AS n_docs,
       sum(n_tokens)::BIGINT AS n_tokens
FROM cum GROUP BY 1 ORDER BY seq_id LIMIT 15
"""

    o["text_token_count"] = """
SELECT doc_id,
       len(list_filter(string_split_regex(lower(coalesce(text, '')), '\\s+'),
                       x -> x <> ''))::BIGINT AS n_tokens,
       length(text)::BIGINT AS n_chars_computed
FROM documents"""

    _sw = "'the', 'a', 'of', 'and', 'to', 'in', 'is', 'that', 'it', 'for'"
    o["text_quality"] = f"""
WITH base AS (
  SELECT doc_id, text,
         list_filter(string_split_regex(lower(text), '\\s+'),
                     x -> x <> '') AS toks,
         length(text) AS n_chars
  FROM documents),
m AS (
  SELECT doc_id,
         len(toks) AS n_tok,
         len(list_filter(toks, x -> x IN ({_sw}))) AS n_stop,
         length(regexp_replace(text, '[^A-Za-z]', '', 'g')) AS n_alpha,
         n_chars
  FROM base),
r AS (
  SELECT doc_id,
         CASE WHEN n_tok > 0
              THEN (n_chars - (n_tok - 1)) / n_tok ELSE 0.0 END AS mean_wl,
         CASE WHEN n_tok > 0 THEN n_stop / n_tok ELSE 0.0 END AS stop_r,
         CASE WHEN n_chars > 0 THEN n_alpha / n_chars ELSE 0.0 END AS alpha_r
  FROM m)
SELECT doc_id,
       round(mean_wl, 6) AS mean_word_len,
       round(stop_r, 6) AS stopword_ratio,
       round(alpha_r, 6) AS alpha_ratio,
       round(least(stop_r * 2.0, 1.0) * 0.4 + alpha_r * 0.4
             + CASE WHEN mean_wl >= 3 AND mean_wl <= 10
                    THEN 0.2 ELSE 0.0 END, 6) AS quality
FROM r"""

    lang_cases = []
    from lucene_1_spark.pipeline.textstats import STOPWORDS
    for lang, words in STOPWORDS.items():
        wl = ", ".join(f"'{w}'" for w in words)
        lang_cases.append((lang, f"len(list_filter(toks, x -> x IN ({wl})))"
                                 " / greatest(len(toks), 1)"))
    ratio_cols = ",\n         ".join(f"{expr} AS r_{lang}"
                                     for lang, expr in lang_cases)
    best = "greatest(" + ", ".join(f"r_{lang}" for lang, _ in lang_cases) + ")"
    pred = "'und'"
    for lang, _ in reversed(lang_cases):
        pred = (f"CASE WHEN best > 0 AND r_{lang} = best THEN '{lang}' "
                f"ELSE {pred} END")
    o["text_language_id"] = f"""
WITH base AS (
  SELECT doc_id,
         list_filter(string_split_regex(lower(text), '\\s+'),
                     x -> x <> '') AS toks
  FROM documents),
r AS (
  SELECT doc_id,
         {ratio_cols}
  FROM base),
b AS (SELECT doc_id, r_en, r_de, r_fr, r_es, {best} AS best FROM r)
SELECT doc_id, {pred} AS pred_lang, round(best, 6) AS lang_score FROM b"""

    o["text_fingerprint"] = """
SELECT doc_id,
       md5(array_to_string(list_filter(string_split_regex(lower(text), '\\s+'),
                                       x -> x <> ''), ' ')) AS fingerprint
FROM documents"""

    o["points_range_count"] = ("SELECT count(*)::BIGINT AS n FROM events "
                               "WHERE value BETWEEN 10.0 AND 50.0")

    # CJK bigram analyzer: the SQL twin re-derives the same CJK-ified
    # corpus and tokenizes per CJKBigramFilter semantics — bigrams
    # within each space-separated Han run, lone single-char runs as
    # unigrams — then scores standard BM25
    o["ft_cjk_term_topk"] = f"""
WITH {_CJK_SQL_DOCS},
sc AS (
  SELECT tf.doc_id, sum({_score_expr()}) AS s
  FROM tf
  JOIN dl ON tf.doc_id = dl.doc_id
  JOIN df ON tf.term = df.term
  CROSS JOIN st
  WHERE tf.term = '与世'
  GROUP BY tf.doc_id)
SELECT doc_id, round(s, 4) AS score, rank FROM (
  SELECT doc_id, s,
         row_number() OVER (ORDER BY s DESC, doc_id ASC) AS rank
  FROM sc) WHERE rank <= 10"""

    o["ft_cjk_unigram_count"] = f"""
WITH {_CJK_SQL_DOCS}
SELECT count(DISTINCT doc_id)::BIGINT AS n FROM toks WHERE term = '一'"""

    # dictionary segmenter: the SQL twin never segments — it maps each
    # a-z token straight to its Thai word (the generative truth the
    # two-alphabet construction guarantees longest-match recovers) and
    # scores standard BM25
    o["ft_thai_seg_topk"] = f"""
WITH {_THAI_SQL_DOCS},
sc AS (
  SELECT tf.doc_id, sum({_score_expr()}) AS s
  FROM tf
  JOIN dl ON tf.doc_id = dl.doc_id
  JOIN df ON tf.term = df.term
  CROSS JOIN st
  WHERE tf.term = '{_thai_word("spark")}'
  GROUP BY tf.doc_id)
SELECT doc_id, round(s, 4) AS score, rank FROM (
  SELECT doc_id, s,
         row_number() OVER (ORDER BY s DESC, doc_id ASC) AS rank
  FROM sc) WHERE rank <= 10"""

    o["ft_thai_seg_count"] = f"""
WITH {_THAI_SQL_DOCS}
SELECT count(DISTINCT doc_id)::BIGINT AS n
FROM toks WHERE term = '{_thai_word("data")}'"""

    # feature rank: bm25('spark') + 2*saturation((doc_id%31)+1, pivot 8)
    # — integer features <= 32 make the tf-encode quantization identity
    o["ft_feature_rank_topk"] = f"""
WITH {_BM25_CTES},
base AS (
  SELECT tf.doc_id, {_score_expr()} AS s
  FROM tf JOIN dl ON tf.doc_id = dl.doc_id
  JOIN df ON tf.term = df.term CROSS JOIN st
  WHERE tf.term = 'spark'),
tot AS (
  SELECT doc_id,
         s + 2.0 * (1 - 8.0 / (((doc_id % 31) + 1) + 8.0)) AS s
  FROM base)
SELECT doc_id, round(s, 4) AS score, rank FROM (
  SELECT doc_id, s,
         row_number() OVER (ORDER BY s DESC, doc_id ASC) AS rank
  FROM tot
) WHERE rank <= 10"""

    # combined-field BM25F: weighted tf sum over content(w=1)+head(w=2),
    # weighted length norm, max df, weight-merged collection stats
    # (long-truncating sum_ttf fold), one BM25 evaluation
    o["ft_combined_field_topk"] = f"""
WITH {_BM25_CTES},
{_HEAD_CTES},
cfreq AS (
  SELECT doc_id, sum(f) AS freq FROM (
    SELECT doc_id, 1.0 * freq AS f FROM tf WHERE term = 'spark'
    UNION ALL
    SELECT doc_id, 2.0 * freq AS f FROM htf WHERE term = 'spark')
  GROUP BY doc_id),
cdl AS (
  SELECT dl.doc_id, dl.len + 2.0 * coalesce(hdl.len, 0) AS len
  FROM dl LEFT JOIN hdl ON dl.doc_id = hdl.doc_id),
cstats AS (
  SELECT greatest(st.n, hst.n) AS n,
         floor(st.tot + 2.0 * hst.tot) AS tot
  FROM st CROSS JOIN hst),
cdf AS (
  SELECT greatest(
    coalesce((SELECT dfreq FROM df WHERE term = 'spark'), 0),
    coalesce((SELECT dfreq FROM hdf WHERE term = 'spark'), 0)) AS dfreq)
SELECT doc_id, round(s, 4) AS score, rank FROM (
  SELECT cfreq.doc_id,
         ln(1 + (cstats.n - cdf.dfreq + 0.5) / (cdf.dfreq + 0.5))
           * cfreq.freq
           / (cfreq.freq + {K1} * (1 - {B} + {B} * cdl.len
                                   / (cstats.tot / cstats.n))) AS s,
         row_number() OVER (ORDER BY
           ln(1 + (cstats.n - cdf.dfreq + 0.5) / (cdf.dfreq + 0.5))
             * cfreq.freq
             / (cfreq.freq + {K1} * (1 - {B} + {B} * cdl.len
                                     / (cstats.tot / cstats.n))) DESC,
           cfreq.doc_id ASC) AS rank
  FROM cfreq
  JOIN cdl ON cfreq.doc_id = cdl.doc_id
  CROSS JOIN cstats CROSS JOIN cdf
) WHERE rank <= 10"""

    # analysis/common extras: the synthetic content is deterministic
    # in doc_id / raw text, so every count has a closed-form oracle
    o["ft_html_strip_count"] = """
SELECT 0::BIGINT AS n_hidden,
       (SELECT count(*) FROM documents)::BIGINT AS n_tail,
       (SELECT count(*) FROM documents)::BIGINT AS n_kept,
       (SELECT count(*) FROM documents
        WHERE list_contains(
            string_split(substr(coalesce(text, ''), 1, 80), ' '),
            'spark'))::BIGINT AS n_spark"""

    o["ft_path_hierarchy_count"] = """
SELECT (SELECT count(*) FROM documents WHERE doc_id % 3 = 1)::BIGINT
           AS n_r1,
       (SELECT count(*) FROM documents
        WHERE doc_id % 3 = 2 AND doc_id % 5 = 3)::BIGINT AS n_r2_s3"""

    o["ft_reverse_wildcard_count"] = """
SELECT (SELECT count(*) FROM documents
        WHERE len(list_filter(
            string_split(substr(coalesce(text, ''), 1, 120), ' '),
            x -> x LIKE '%ream')) > 0)::BIGINT AS n_suffix_ream,
       (SELECT count(*) FROM documents
        WHERE list_contains(
            string_split(substr(coalesce(text, ''), 1, 120), ' '),
            'spark'))::BIGINT AS n_spark"""

    o["ft_commongrams_count"] = """
WITH toks AS (
  SELECT doc_id,
         string_split(substr(coalesce(text, ''), 1, 120), ' ') AS ts
  FROM documents)
SELECT (SELECT count(*) FROM toks
        WHERE len(list_filter(range(1, len(ts)),
                  i -> ts[i] = 'the' AND ts[i + 1] = 'customer')) > 0
       )::BIGINT AS n_the_customer,
       (SELECT count(*) FROM toks
        WHERE len(list_filter(range(1, len(ts)),
                  i -> ts[i] = 'a' AND ts[i + 1] = 'small')) > 0
       )::BIGINT AS n_a_small"""

    o["ft_compound_split_count"] = """
SELECT (SELECT count(*) FROM documents WHERE doc_id % 3 IN (0, 1))::BIGINT
           AS n_ball,
       (SELECT count(*) FROM documents WHERE doc_id % 3 = 0)::BIGINT
           AS n_softball,
       (SELECT count(*) FROM documents WHERE doc_id % 3 = 2)::BIGINT
           AS n_fish"""

    o["ft_pattern_token_count"] = """
SELECT (SELECT count(*) FROM documents
        WHERE doc_id % 7 = 3 OR doc_id % 11 = 3)::BIGINT AS n_t3,
       (SELECT count(*) FROM documents
        WHERE doc_id % 11 = 10)::BIGINT AS n_t10"""

    # sim_ann_topk, mm_image_features, mm_audio_features: no oracle
    # (approximate / stubbed-media ops -> rows-only check)
    return o
