"""Text analysis for training-data pipelines: language ID, quality
scoring, token counting, document fingerprinting.

Everything is built from JVM-side ``pyspark.sql.functions`` (regex,
array ops) — no Python in the hot path — so each operator is a single
codegen'd projection over the scan, with predicate/column pruning free.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, functions as F

# tiny per-language stopword lists for the n-gram/stopword-ratio heuristic
STOPWORDS = {
    "en": ["the", "a", "of", "and", "to", "in", "is", "that", "it", "for"],
    "de": ["der", "die", "das", "und", "ist", "nicht", "ein", "mit", "auf", "zu"],
    "fr": ["le", "la", "les", "et", "est", "un", "une", "des", "que", "pour"],
    "es": ["el", "la", "los", "de", "y", "es", "un", "una", "que", "por"],
}


def _tokens(text_col: str) -> F.Column:
    return F.filter(F.split(F.lower(F.col(text_col)), r"\s+"), lambda t: t != "")


def token_count(docs: DataFrame, text_col: str = "text",
                id_col: str = "doc_id") -> DataFrame:
    """Whitespace tokens + a BPE-ish subword ESTIMATE.  ``n_subwords``
    is a word-piece proxy (runs of letters / digits / single
    punctuation), NOT a real BPE vocabulary count: it has no merges
    table, so it over-counts long words a trained tokenizer would keep
    whole and under-counts rare words BPE would split further.  Use it
    for relative corpus sizing / filtering, not billing-grade token
    accounting."""
    toks = _tokens(text_col)
    bpe_pieces = F.filter(
        F.split(F.lower(F.col(text_col)), r"(?=[^A-Za-z0-9])|(?<=[^A-Za-z0-9])"),
        lambda t: (t != "") & (t != " "))
    return docs.select(
        F.col(id_col),
        F.size(toks).alias("n_tokens"),
        F.size(bpe_pieces).alias("n_subwords"),
        F.length(F.col(text_col)).alias("n_chars_computed"),
    )


def quality_score(docs: DataFrame, text_col: str = "text",
                  id_col: str = "doc_id") -> DataFrame:
    """Deterministic quality heuristics: mean word length, stopword
    ratio, alpha ratio, and a composite score — plain column
    expressions (one shuffle-free projection pair).  The token array
    is materialized in its own projection first so each consuming
    expression reads the column instead of re-running the split
    (same expression-reuse fix as :func:`repetition_stats`)."""
    base = docs.select(F.col(id_col), F.col(text_col),
                       _tokens(text_col).alias("_toks"))
    toks = F.col("_toks")
    n_tok = F.size(toks)
    sw = STOPWORDS["en"]
    n_stop = F.size(F.filter(toks, lambda t: t.isin(sw)))
    n_alpha = F.length(F.regexp_replace(F.col(text_col), r"[^A-Za-z]", ""))
    n_chars = F.length(F.col(text_col))
    mean_wl = F.when(n_tok > 0, (n_chars - (n_tok - 1)) / n_tok).otherwise(0.0)
    stop_ratio = F.when(n_tok > 0, n_stop / n_tok).otherwise(0.0)
    alpha_ratio = F.when(n_chars > 0, n_alpha / n_chars).otherwise(0.0)
    composite = (F.least(stop_ratio * 2.0, F.lit(1.0)) * 0.4
                 + alpha_ratio * 0.4
                 + F.when((mean_wl >= 3) & (mean_wl <= 10), 0.2).otherwise(0.0))
    return base.select(
        F.col(id_col),
        F.round(mean_wl, 6).alias("mean_word_len"),
        F.round(stop_ratio, 6).alias("stopword_ratio"),
        F.round(alpha_ratio, 6).alias("alpha_ratio"),
        F.round(composite, 6).alias("quality"),
    )


def language_id(docs: DataFrame, text_col: str = "text",
                id_col: str = "doc_id") -> DataFrame:
    """Stopword-ratio language heuristic: argmax over per-language
    stopword hit ratios; 'und' (undetermined) when all are zero.
    Tokens materialize once (see :func:`quality_score`)."""
    base = docs.select(F.col(id_col), _tokens(text_col).alias("_toks"))
    toks = F.col("_toks")
    n_tok = F.greatest(F.size(toks), F.lit(1))
    ratios = [(lang, F.size(F.filter(toks, lambda t: t.isin(words))) / n_tok)
              for lang, words in STOPWORDS.items()]
    best = F.greatest(*[r for _, r in ratios])
    pred = F.lit("und")
    for lang, r in reversed(ratios):  # earlier langs win ties
        pred = F.when((best > 0) & (r == best), F.lit(lang)).otherwise(pred)
    out = base.select(F.col(id_col), pred.alias("pred_lang"),
                      F.round(best, 6).alias("lang_score"))
    return out


def fingerprint(docs: DataFrame, text_col: str = "text",
                id_col: str = "doc_id") -> DataFrame:
    """Normalized document fingerprint: md5 over the
    whitespace-normalized lowercase text (stable under reflow), plus
    a 60-bit numeric form for compact joins."""
    normalized = F.concat_ws(" ", _tokens(text_col))
    digest = F.md5(normalized)
    return docs.select(
        F.col(id_col), digest.alias("fingerprint"),
        F.conv(F.substring(digest, 1, 15), 16, 10).cast("long").alias("fp60"),
    )


def repetition_stats(docs: DataFrame, text_col: str = "text",
                     id_col: str = "doc_id", n: int = 3) -> DataFrame:
    """Intra-document repetition signals (the Gopher/MassiveText
    quality-filter family: fraction of duplicated n-grams and the most
    repeated n-gram's share): (doc_id, n_ngrams, dup_ngram_ratio,
    top_ngram_ratio).  Pure relational — n-grams via array slicing,
    one explode + per-doc aggregation; high values flag boilerplate /
    degenerate generations for dropping at 100 TB scale."""
    # materialize the token array in its own projection FIRST: inlining
    # the split expression into the transform lambda makes Catalyst
    # re-evaluate the full split per n-gram index — O(tokens^2) work per
    # document (measured 4x slower on the sf0.1 entry)
    toks_expr = F.filter(
        F.split(F.lower(F.coalesce(F.col(text_col), F.lit(""))), r"\s+"),
        lambda t: t != "")
    base = docs.select(F.col(id_col), toks_expr.alias("_toks"))
    toks = F.col("_toks")
    idx = F.when(F.size(toks) >= n,
                 F.sequence(F.lit(0), F.size(toks) - n)) \
           .otherwise(F.array().cast("array<int>"))
    grams = base.select(
        F.col(id_col),
        F.explode(F.transform(
            idx, lambda i: F.concat_ws(" ", F.slice(toks, i + 1, n))))
        .alias("gram"))
    per_gram = grams.groupBy(id_col, "gram").agg(
        F.count("*").alias("c"))
    return (per_gram.groupBy(id_col)
            .agg(F.sum("c").cast("long").alias("n_ngrams"),
                 F.round((F.sum("c") - F.count("*"))
                         / F.greatest(F.sum("c"), F.lit(1)), 6)
                 .alias("dup_ngram_ratio"),
                 F.round(F.max("c") / F.greatest(F.sum("c"), F.lit(1)), 6)
                 .alias("top_ngram_ratio")))


def lm_perplexity(docs: DataFrame, text_col: str = "text",
                  id_col: str = "doc_id",
                  lm_docs: DataFrame | None = None) -> DataFrame:
    """Per-doc bigram language-model perplexity — the CCNet-style
    LM-quality filter (Wenzek et al. 2020 score documents with a KenLM
    5-gram; this is the same pipeline shape with a DOCUMENTED
    SIMPLIFICATION to an add-one-smoothed bigram model trained
    relationally on ``lm_docs``, default: the corpus itself).

    ``P(t2|t1) = (c(t1,t2) + 1) / (c(t1) + V)``;
    ``ppl(doc) = exp(-mean ln P)`` over the doc's bigrams (docs with
    < 2 tokens get NULL).  Low perplexity = looks like the training
    distribution; the filter drops the high tail.

    Spark shape: train = two aggregations over exploded bigrams
    (shuffles keyed by the n-gram — the scalable shape); score = one
    bigram join + per-doc mean.  All JVM arithmetic, exactly
    reproducible in SQL.  Bigrams come from array slicing in the same
    projection as the tokenization (no per-doc window shuffle), the
    exploded bigram table is materialized once for its three consumers
    (unigram counts, bigram counts, vocabulary size), and when the LM
    corpus IS the scored corpus the same table feeds scoring too."""
    lm = lm_docs if lm_docs is not None else docs

    def bigrams(df):
        base = df.select(F.col(id_col), _tokens(text_col).alias("_toks"))
        t = F.col("_toks")
        idx = F.when(F.size(t) >= 2,
                     F.sequence(F.lit(0), F.size(t) - 2)) \
               .otherwise(F.array().cast("array<int>"))
        return (base
                .select(F.col(id_col), F.explode(F.transform(
                    idx, lambda i: F.struct(
                        F.element_at(t, i + 1).alias("tok"),
                        F.element_at(t, i + 2).alias("nxt")))).alias("_bg"))
                .select(F.col(id_col), "_bg.tok", "_bg.nxt"))
    big_lm = bigrams(lm).localCheckpoint(eager=False)
    uni = big_lm.groupBy("tok").agg(F.count("*").alias("c1")) \
        .localCheckpoint(eager=False)
    bi = big_lm.groupBy("tok", "nxt").agg(F.count("*").alias("c2"))
    # |vocabulary| == number of distinct first-tokens == |uni|
    v = uni.count()
    big_doc = big_lm if lm_docs is None else bigrams(docs)
    scored = (big_doc
              .join(bi, ["tok", "nxt"], "left")
              .join(uni, ["tok"], "left")
              .select(F.col(id_col),
                      (F.log((F.coalesce(F.col("c2"), F.lit(0)) + 1.0)
                             / (F.coalesce(F.col("c1"), F.lit(0))
                                + float(v))).alias("lp"))))
    return (scored.groupBy(id_col)
            .agg(F.round(F.exp(-F.avg("lp")), 4).alias("perplexity")))
