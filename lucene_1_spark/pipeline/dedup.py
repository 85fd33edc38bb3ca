"""Deduplication operators for large-scale training-data pipelines.

All operators take the ``documents`` table shape ``(doc_id, text, ...)``
and are pure DataFrame compositions (shuffle on content hash / band
bucket) so they scale linearly with executors:

- **exact**: hash-groupBy on md5(text) — one shuffle keyed by digest.
- **ngram Jaccard**: token n-gram sets, exploded + self-joined on
  shared shingles (inverted-index join — only docs sharing >=1 shingle
  are compared), Jaccard >= threshold.
- **MinHash + LSH**: per-doc minhash signature over shingle hashes
  (vectorized via md5-prefix arithmetic so an external SQL oracle can
  reproduce it), banded into buckets; candidate pairs share a band
  bucket — the classic band-join, one shuffle keyed by (band, value).
- **SimHash**: 64-bit weighted-bit fingerprint; near-dups share all but
  <= h Hamming bits, bucketed by 16-bit chunks (pigeonhole: hamming<=3
  over 4 chunks => >=1 identical chunk).
- **embedding cosine**: see :mod:`lucene_1_spark.pipeline.similarity`.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, functions as F

# 48-bit value from the md5 hex prefix: portable to any SQL engine
# (the DuckDB oracle uses `('0x'||substr(md5(x),1,12))::BIGINT`), and
# small enough that a*h with a <= 31 stays below 2^53 — exact in BIGINT
# *and* in double, so no engine-dependent overflow behavior.
def _md5_48(col: F.Column) -> F.Column:
    return F.conv(F.substring(F.md5(col), 1, 12), 16, 10).cast("long")


MINHASH_PRIME = 281474976710597  # largest prime < 2^48


def exact_duplicates(docs: DataFrame, text_col: str = "text",
                     max_listed: int = 1000) -> DataFrame:
    """Groups of byte-identical docs: (digest, n_dups, keep_doc_id,
    dup_doc_ids) for groups with n>1; keep = lowest doc_id.
    ``dup_doc_ids`` is capped at ``max_listed`` ids (``n_dups`` stays
    exact) so one degenerate group — billions of identical docs — can
    never blow a single task's memory at 100 TB."""
    return (
        docs.select("doc_id", F.md5(F.col(text_col)).alias("digest"))
        .groupBy("digest")
        .agg(F.count("*").alias("n_dups"),
             F.min("doc_id").alias("keep_doc_id"),
             F.slice(F.sort_array(F.collect_list("doc_id")), 1, max_listed)
             .alias("dup_doc_ids"))
        .filter(F.col("n_dups") > 1)
    )


def dedup_exact(docs: DataFrame, text_col: str = "text") -> DataFrame:
    """Keep the lowest doc_id per identical text (one shuffle)."""
    from pyspark.sql import Window as W
    w = W.partitionBy(F.md5(F.col(text_col))).orderBy("doc_id")
    return (docs.withColumn("_rn", F.row_number().over(w))
            .filter(F.col("_rn") == 1).drop("_rn"))


def _shingles(docs: DataFrame, text_col: str, n: int) -> DataFrame:
    """(doc_id, shingle) distinct token n-grams, built relationally:
    split -> posexplode -> self-align via array slicing."""
    toks = docs.select(
        "doc_id",
        F.filter(F.split(F.lower(F.col(text_col)), r"\s+"),
                 lambda t: t != "").alias("toks"))
    # n-gram i = toks[i..i+n); docs shorter than n yield no shingles
    # (guarded: F.sequence(0, -1) would DESCEND, not be empty)
    idx = F.when(F.size("toks") >= n,
                 F.sequence(F.lit(0), F.size("toks") - n)) \
           .otherwise(F.array().cast("array<int>"))
    return (
        toks.select(
            "doc_id",
            F.explode(
                F.transform(idx, lambda i: F.concat_ws(" ", F.slice("toks", i + 1, n)))
            ).alias("shingle"))
        .distinct()
    )


def ngram_jaccard_pairs(docs: DataFrame, text_col: str = "text", n: int = 3,
                        threshold: float = 0.8,
                        max_shingle_df: int | None = 10_000) -> DataFrame:
    """Exact n-gram Jaccard over candidate pairs that share >= 1 shingle
    (inverted-index join). Returns (doc_a, doc_b, jaccard) with
    doc_a < doc_b and jaccard >= threshold.

    ``max_shingle_df`` removes shingles shared by more than that many
    docs from the shingle universe (sizes AND intersections — Jaccard
    stays internally exact over the restricted universe): a hot shingle
    (a boilerplate 3-gram) makes the self-join quadratic in its doc
    count, so the cap DEFAULTS ON (10_000) — the standard stop-shingle
    mitigation for inverted-index joins; pass ``None`` only for small
    corpora where exact full-universe Jaccard is wanted.  Pairs similar
    ONLY through ultra-hot shingles are the documented recall loss.
    Run :func:`dedup_exact` FIRST — a cluster of byte-identical docs
    shares every shingle, and no per-shingle cap bounds that."""
    sh = _shingles(docs, text_col, n)
    # materialize once: the hot census, the per-doc sizes, and both
    # self-join branches otherwise each re-run split + explode +
    # distinct (disk-backed, scoped to this query's lineage)
    sh = sh.localCheckpoint(eager=False)
    if max_shingle_df is not None:
        hot = (sh.groupBy("shingle").agg(F.count("*").alias("_df"))
               .filter(F.col("_df") > max_shingle_df).select("shingle"))
        sh = sh.join(hot, "shingle", "left_anti")
    sizes = sh.groupBy("doc_id").agg(F.count("*").alias("n_sh"))
    a = sh.alias("a")
    b = sh.alias("b")
    inter = (
        a.join(b, (F.col("a.shingle") == F.col("b.shingle"))
               & (F.col("a.doc_id") < F.col("b.doc_id")))
        .groupBy(F.col("a.doc_id").alias("doc_a"),
                 F.col("b.doc_id").alias("doc_b"))
        .agg(F.count("*").alias("inter"))
    )
    sa = sizes.select(F.col("doc_id").alias("doc_a"), F.col("n_sh").alias("na"))
    sb = sizes.select(F.col("doc_id").alias("doc_b"), F.col("n_sh").alias("nb"))
    return (
        inter.join(sa, "doc_a").join(sb, "doc_b")
        .withColumn("jaccard",
                    F.col("inter") / (F.col("na") + F.col("nb") - F.col("inter")))
        .filter(F.col("jaccard") >= threshold)
        .select("doc_a", "doc_b", F.round("jaccard", 6).alias("jaccard"))
    )


def contamination_overlap(train: DataFrame, evalset: DataFrame,
                          text_col: str = "text", n: int = 8,
                          max_shingle_df: int | None = 10_000) -> DataFrame:
    """Train/eval DECONTAMINATION: (train_doc, eval_doc, n_shared)
    pairs sharing >= 1 token n-gram — the standard benchmark-leakage
    check for training corpora (13-gram overlap in GPT-3's
    decontamination, 8+ grams common since).  Inverted-index join keyed
    by shingle (only docs sharing an n-gram are ever compared), with
    the same hot-shingle cap as :func:`ngram_jaccard_pairs` so a
    boilerplate n-gram cannot go quadratic at 100 TB.  Flag or drop
    training docs appearing here."""
    tr = _shingles(train, text_col, n).withColumnRenamed("doc_id", "train_doc")
    ev = _shingles(evalset, text_col, n).withColumnRenamed("doc_id", "eval_doc")
    if max_shingle_df is not None:
        # materialize the train shingles ONCE: the hot census and the
        # overlap join would otherwise each re-run split + explode +
        # distinct over the whole train side (guide: truncate a plan
        # reused by several consumers; the distinct's shuffle output is
        # the same order of bytes this stores, disk-backed)
        tr = tr.localCheckpoint(eager=False)
        hot = (tr.groupBy("shingle").agg(F.count("*").alias("_df"))
               .filter(F.col("_df") > max_shingle_df).select("shingle"))
        tr = tr.join(hot, "shingle", "left_anti")
        ev = ev.join(hot, "shingle", "left_anti")
    return (tr.join(ev, "shingle")
            .groupBy("train_doc", "eval_doc")
            .agg(F.count("*").cast("long").alias("n_shared")))


def minhash_signatures(docs: DataFrame, text_col: str = "text", n: int = 3,
                       num_perm: int = 16) -> DataFrame:
    """(doc_id, sig: array<long>) — minhash over shingle md5-48 values
    with universal hashing h_i(x) = (a_i*x + b_i) mod P (P prime <2^48).
    Pure relational min-aggregation: one shuffle on doc_id."""
    sh = _shingles(docs, text_col, n).withColumn("h", _md5_48(F.col("shingle")))
    # deterministic per-permutation coefficients (any fixed odd a works)
    aggs = []
    for i in range(num_perm):
        a_i = 2 * i + 1
        b_i = 0x9E3779B9 * (i + 1) & ((1 << 32) - 1)
        hp = F.pmod(F.col("h") * F.lit(a_i) + F.lit(b_i), F.lit(MINHASH_PRIME))
        aggs.append(F.min(hp).alias(f"m{i}"))
    sig = sh.groupBy("doc_id").agg(*aggs)
    return sig.select("doc_id",
                      F.array(*[F.col(f"m{i}") for i in range(num_perm)]).alias("sig"))


def minhash_lsh_candidates(docs: DataFrame, text_col: str = "text", n: int = 3,
                           num_perm: int = 16, bands: int = 4) -> DataFrame:
    """Candidate near-dup pairs sharing >= 1 LSH band: shuffle keyed by
    (band_id, band_value) — the band join. (doc_a < doc_b, distinct)."""
    rows_per_band = num_perm // bands
    sig = minhash_signatures(docs, text_col, n, num_perm)
    banded = sig.select(
        "doc_id",
        F.explode(F.array(*[
            F.struct(F.lit(bi).alias("band"),
                     F.concat_ws(",", *[
                         F.col("sig")[bi * rows_per_band + r].cast("string")
                         for r in range(rows_per_band)]).alias("bval"))
            for bi in range(bands)])).alias("bb"))
    # materialize the band keys ONCE: the self-join would otherwise run
    # the whole shingle+minhash pipeline (explode, distinct, min-agg)
    # once per branch.  Tiny rows (id, band, band-hash string) — bands
    # rows per doc, disk-backed, scoped to this query's lineage.
    bkey = banded.select("doc_id", "bb.band", "bb.bval") \
        .localCheckpoint(eager=False)
    a, b = bkey.alias("a"), bkey.alias("b")
    return (a.join(b, (F.col("a.band") == F.col("b.band"))
                   & (F.col("a.bval") == F.col("b.bval"))
                   & (F.col("a.doc_id") < F.col("b.doc_id")))
            .select(F.col("a.doc_id").alias("doc_a"),
                    F.col("b.doc_id").alias("doc_b"))
            .distinct())


def simhash64(docs: DataFrame, text_col: str = "text") -> DataFrame:
    """(doc_id, simhash: long) — 48-bit SimHash over token md5-48 hashes
    (unweighted).  Relational: explode tokens, per-bit majority vote."""
    toks = (docs.select("doc_id",
                        F.explode(F.split(F.lower(F.col(text_col)), r"\s+"))
                        .alias("tok"))
            .filter(F.col("tok") != "")
            .withColumn("h", _md5_48(F.col("tok"))))
    # vote per bit: sum(+1/-1); 48 usable bits from md5-48
    votes = toks.groupBy("doc_id").agg(*[
        F.sum(F.when(F.shiftright(F.col("h"), i).bitwiseAND(F.lit(1)) == 1, 1)
              .otherwise(-1)).alias(f"b{i}")
        for i in range(48)])
    expr = None
    for i in range(48):
        bit = F.when(F.col(f"b{i}") > 0, F.lit(1).cast("long")).otherwise(F.lit(0).cast("long"))
        contrib = F.shiftleft(bit, i)
        expr = contrib if expr is None else expr.bitwiseOR(contrib)
    return votes.select("doc_id", expr.alias("simhash"))


def simhash_near_dups(docs: DataFrame, text_col: str = "text",
                      max_hamming: int = 3,
                      max_bucket_size: int | None = 10_000) -> DataFrame:
    """Near-dup pairs with Hamming(simhash) <= max_hamming, bucketed by
    12-bit chunks (pigeonhole over 4 chunks covers hamming <= 3).

    ``max_bucket_size`` (DEFAULT ON) drops (chunk, value) buckets with
    more members than the cap before the self-join: one cluster of a
    million near-identical docs otherwise lands in a single bucket and
    makes the candidate join quadratic in its size.  The documented
    recall loss is pairs matchable ONLY through a dropped bucket — in
    practice byte-identical boilerplate, which :func:`dedup_exact`
    should collapse FIRST (the intended pipeline order)."""
    sh = simhash64(docs, text_col)
    chunks = sh.select(
        "doc_id", "simhash",
        F.explode(F.array(*[
            F.struct(F.lit(c).alias("chunk"),
                     F.shiftright("simhash", c * 12).bitwiseAND(F.lit((1 << 12) - 1))
                     .alias("cval"))
            for c in range(4)])).alias("cc")
    ).select("doc_id", "simhash", "cc.chunk", "cc.cval")
    # materialize once (4 small rows per doc): the census and both
    # self-join branches would otherwise each recompute the full
    # simhash vote aggregation
    chunks = chunks.localCheckpoint(eager=False)
    if max_bucket_size is not None:
        # eager hot-bucket census (one tiny count-agg job -> driver
        # list -> plain predicate): a lazy anti-join re-runs the census
        # inside BOTH self-join branches and adds a shuffle per branch
        hot = [(r["chunk"], r["cval"]) for r in
               (chunks.groupBy("chunk", "cval")
                .agg(F.count("*").alias("_n"))
                .filter(F.col("_n") > max_bucket_size)
                .select("chunk", "cval").collect())]
        if hot:
            from functools import reduce as _reduce
            bad = _reduce(lambda x, y: x | y,
                          [(F.col("chunk") == c) & (F.col("cval") == v)
                           for c, v in hot])
            chunks = chunks.filter(~bad)
    a, b = chunks.alias("a"), chunks.alias("b")
    cand = (a.join(b, (F.col("a.chunk") == F.col("b.chunk"))
                   & (F.col("a.cval") == F.col("b.cval"))
                   & (F.col("a.doc_id") < F.col("b.doc_id")))
            .select(F.col("a.doc_id").alias("doc_a"),
                    F.col("b.doc_id").alias("doc_b"),
                    F.col("a.simhash").alias("sh_a"),
                    F.col("b.simhash").alias("sh_b"))
            .distinct())
    hamming = F.bit_count(F.col("sh_a").bitwiseXOR(F.col("sh_b")))
    return (cand.withColumn("hamming", hamming)
            .filter(F.col("hamming") <= max_hamming)
            .select("doc_a", "doc_b", "hamming"))
