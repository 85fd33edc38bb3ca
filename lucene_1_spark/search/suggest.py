"""Analyzing / fuzzy suggesters — weighted full-suggestion lookup over
ANALYZED keys (the reference's ``suggest/src/java/org/apache/lucene/
search/suggest/analyzing/AnalyzingSuggester.java:81`` and
``FuzzySuggester.java:66``).

Unlike the term-dictionary completions in ``search/highlight.py``
(prefix / infix / fuzzy over single index terms), these operate on a
user-supplied suggestion corpus — (suggestion, weight) rows — and match
the typed text against the suggestion's ANALYZED form, so stop words,
case, and tokenization differences don't break completion (the
reference's headline example: "mane" completes "The Ghost of the
Mohican" variants because the analyzer strips "the").

Spark shape: the suggestion table is a DataFrame with a precomputed
``analyzed_key`` column (built once, stored/cached like the reference's
side-car suggest index).  An analyzing lookup pushes
``startswith(analyzed_prefix)`` into the scan; a fuzzy lookup prunes
with the non-fuzzy literal prefix + a key length window BEFORE the JVM
``levenshtein`` — the FuzzySuggester Levenshtein-automaton prefilter in
relational form.  No collects, no UDF in the lookup path.

Documented deviations:
- exact-first then weight ordering (exactFirst=true default) is kept;
  the reference's FST cost arithmetic (weight encoded as cost) isn't —
  ordering by (exact desc, weight desc, suggestion asc) is equivalent.
- FuzzySuggester's ``transpositions=true`` automaton counts a swap as
  one edit; ``levenshtein`` counts two (documented; the reference can
  disable transpositions too).
- fuzzy prefix matching compares the typed prefix against key prefixes
  of length |p|-max_edits .. |p|+max_edits (edits can shift length) —
  the automaton's exact length accounting collapsed to a window.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, functions as F, Window as W

DEFAULT_NON_FUZZY_PREFIX = 1    # FuzzySuggester.DEFAULT_NON_FUZZY_PREFIX
DEFAULT_MIN_FUZZY_LENGTH = 3    # FuzzySuggester.DEFAULT_MIN_FUZZY_LENGTH


def _analyzed_key_col(col, analyzer_name: str):
    """lowercase + whitespace-split + single-space join, entirely JVM.
    For non-trivial analyzers fall back to the batch tokenizer UDF."""
    if analyzer_name == "whitespace":
        return F.array_join(
            F.filter(F.split(F.lower(col), r"\s+"), lambda x: x != F.lit("")),
            " ")
    from lucene_1_spark.analysis.standard import tokenize_udf_factory
    return F.array_join(tokenize_udf_factory(analyzer_name)(col), " ")


def build_suggestions(df: DataFrame, suggestion_col: str, weight_col: str,
                      analyzer: str = "whitespace") -> DataFrame:
    """``AnalyzingSuggester.build`` analog: attach the analyzed key.
    Persist the result (parquet sorted by analyzed_key) to get
    row-group pruning on the prefix filter at serving time."""
    an = _analyzed_key_col(F.col(suggestion_col), analyzer)
    return df.select(
        F.col(suggestion_col).alias("suggestion"),
        F.col(weight_col).cast("long").alias("weight"),
        an.alias("analyzed_key"))


def _analyze_text(text: str, analyzer_name: str) -> str:
    if analyzer_name == "whitespace":
        return " ".join(text.lower().split())
    from lucene_1_spark.analysis.standard import get_analyzer
    return " ".join(get_analyzer(analyzer_name).tokens(text))


def lookup(suggestions: DataFrame, text: str, k: int = 5,
           analyzer: str = "whitespace",
           exact_first: bool = True) -> DataFrame:
    """``AnalyzingSuggester.lookup``: suggestions whose analyzed key
    starts with the analyzed typed text; exact analyzed matches first
    (exactFirst), then weight desc.  Returns
    (suggestion, weight, rank)."""
    p = _analyze_text(text, analyzer)
    cand = suggestions.filter(F.col("analyzed_key").startswith(p))
    exact = (F.col("analyzed_key") == p).cast("int") \
        if exact_first else F.lit(0)
    # top-k via orderBy().limit(k) — TakeOrderedAndProject, a per-
    # partition heap + tiny driver merge; a global row_number window
    # would funnel EVERY candidate of a broad 1-2 char prefix through
    # one task.  rank is then assigned over the k survivors only.
    top = (cand.withColumn("_exact", exact)
           .orderBy(F.desc("_exact"), F.desc("weight"),
                    F.asc("suggestion"))
           .limit(k))
    ranked = top.withColumn(
        "rank", F.row_number().over(
            W.orderBy(F.desc("_exact"), F.desc("weight"),
                      F.asc("suggestion"))).cast("long"))
    return ranked.select("suggestion", "weight", "rank")


def lookup_fuzzy(suggestions: DataFrame, text: str, k: int = 5,
                 analyzer: str = "whitespace", max_edits: int = 1,
                 non_fuzzy_prefix: int = DEFAULT_NON_FUZZY_PREFIX,
                 min_fuzzy_length: int = DEFAULT_MIN_FUZZY_LENGTH) -> DataFrame:
    """``FuzzySuggester.lookup``: like :func:`lookup` but the analyzed
    prefix may differ by up to ``max_edits`` Levenshtein edits, the
    first ``non_fuzzy_prefix`` chars must match literally, and typed
    text shorter than ``min_fuzzy_length`` matches exactly
    (``FuzzySuggester.java:66-101`` knobs).  Ordering: weight desc
    (the reference adds no proximity bonus either)."""
    if max_edits < 0 or max_edits > 2:
        raise ValueError("max_edits must be 0..2 "
                         "(LevenshteinAutomata.MAXIMUM_SUPPORTED_DISTANCE)")
    p = _analyze_text(text, analyzer)
    if max_edits == 0 or len(p) < min_fuzzy_length:
        return lookup(suggestions, text, k, analyzer)
    key = F.col("analyzed_key")
    # pushed prefilters: literal non-fuzzy prefix + key length >= |p| - e
    pred = (F.length(key) >= len(p) - max_edits)
    if non_fuzzy_prefix > 0:
        pred = pred & key.startswith(p[:non_fuzzy_prefix])
    # edits shift length: best distance over key prefixes of length
    # |p| - max_edits .. |p| + max_edits
    dist = F.least(*[
        F.levenshtein(F.substring(key, 1, n), F.lit(p))
        for n in range(max(1, len(p) - max_edits), len(p) + max_edits + 1)])
    cand = (suggestions.filter(pred)
            .withColumn("dist", dist)
            .filter(F.col("dist") <= max_edits))
    # TakeOrderedAndProject (see lookup) — never a global window
    top = cand.orderBy(F.desc("weight"), F.asc("suggestion")).limit(k)
    ranked = top.withColumn(
        "rank", F.row_number().over(
            W.orderBy(F.desc("weight"), F.asc("suggestion"))).cast("long"))
    return ranked.select("suggestion", "weight", "rank")


# ---------------------------------------------------------------------------
# FreeTextSuggester analog
# (``suggest/analyzing/FreeTextSuggester.java:93-126,527-702``): an
# n-gram language model over the CORPUS TEXT (not a curated suggestion
# list) ranked with "stupid backoff" (Brants et al. 2007): the score of
# candidate word w after context c is count(c,w)/count(c) when the
# bigram was seen, else ALPHA * count(w)/total — each backoff level
# multiplies by ALPHA = 0.4 (FreeTextSuggester.ALPHA).  The reference
# compiles the counts into an FST; relationally the model is two
# aggregate tables (unigrams, bigrams) built in one pass over the
# tokenized corpus, and a lookup is two broadcast-size filters + a
# left join — no Python in either path.
# ---------------------------------------------------------------------------

def build_free_text_model(docs: DataFrame, text_col: str = "text",
                          analyzer: str = "standard",
                          materialize: bool = True) -> DataFrame:
    """One model row per gram: (w1, w2, cnt) for bigrams (within-doc
    adjacent positions) plus (w1=NULL, w2=word, cnt) unigram rows —
    the two FST levels of the reference in one union table.  Persist
    it partitioned by w1 for serving (bucket pruning per context)."""
    an_name = analyzer

    # bigrams via array slicing in the tokenizing projection — no
    # per-doc window shuffle (lead() shuffled every token by doc id)
    base = docs.select(
        F.filter(F.split(_analyzed_text_col(F.col(text_col), an_name),
                         r"\s+"), lambda x: x != "").alias("_toks"))
    t = F.col("_toks")
    uni = (base.select(F.explode(t).alias("w"))
           .groupBy("w").agg(F.count("*").alias("cnt"))
           .select(F.lit(None).cast("string").alias("w1"),
                   F.col("w").alias("w2"), "cnt"))
    idx = F.when(F.size(t) >= 2, F.sequence(F.lit(0), F.size(t) - 2)) \
           .otherwise(F.array().cast("array<int>"))
    bi = (base.select(F.explode(F.transform(idx, lambda i: F.struct(
            F.element_at(t, i + 1).alias("w1"),
            F.element_at(t, i + 2).alias("w2")))).alias("_bg"))
          .select("_bg.w1", "_bg.w2")
          .groupBy("w1", "w2").agg(F.count("*").alias("cnt")))
    # materialized once by default: a lookup reads the model four ways
    # (total, context count, bigram slice, unigram candidates).  Pass
    # materialize=False when the model is only being WRITTEN to its
    # serving table (one action — the checkpoint would be a pure extra
    # copy of the largest relation).
    model = uni.unionByName(bi)
    return model.localCheckpoint(eager=False) if materialize else model


def _analyzed_text_col(col, analyzer_name: str):
    """Tokenize a text column to a space-joined analyzed string (the
    same JVM-side normalization the suggester key column uses)."""
    return _analyzed_key_col(col, analyzer_name)


def free_text_lookup(model: DataFrame, context: str, k: int = 5,
                     alpha: float = 0.4,
                     analyzer: str = "standard") -> DataFrame:
    """Rank next-word candidates after ``context`` (its LAST analyzed
    token is the bigram context, as in FreeTextSuggester.lookup):
    score = cnt(c,w)/cnt(c) if seen else alpha * cnt(w)/total.
    Returns (word, score) top-k, score desc / word asc."""
    ctx_toks = _analyze_text(context, analyzer).split()
    if not ctx_toks:
        return model.sparkSession.createDataFrame(
            [], "word string, score double")
    ctx = ctx_toks[-1]
    uni = model.filter(F.col("w1").isNull())
    total = uni.agg(F.sum("cnt")).collect()[0][0] or 1
    ctx_cnt_rows = (model.filter(F.col("w1").isNull()
                                 & (F.col("w2") == ctx))
                    .select("cnt").collect())
    ctx_cnt = int(ctx_cnt_rows[0]["cnt"]) if ctx_cnt_rows else 0
    bi = (model.filter(F.col("w1") == ctx)
          .select(F.col("w2").alias("word"),
                  F.col("cnt").alias("bi_cnt")))
    cand = (uni.select(F.col("w2").alias("word"),
                       F.col("cnt").alias("uni_cnt"))
            .join(bi, "word", "left"))
    score = F.when(
        F.col("bi_cnt").isNotNull() & F.lit(ctx_cnt > 0),
        F.col("bi_cnt") / F.lit(float(ctx_cnt))).otherwise(
        F.lit(float(alpha)) * F.col("uni_cnt") / F.lit(float(total)))
    return (cand.select("word", score.alias("score"))
            .filter(F.col("word") != ctx)
            .orderBy(F.desc("score"), F.asc("word")).limit(k))
