"""Spell correction over the term dictionary — the DirectSpellChecker
analog (``lucene/suggest/src/java/org/apache/lucene/search/spell/
DirectSpellChecker.java``).

Candidates come straight from the index's term dictionary (no separate
spell index — the "direct" in the name): terms within ``max_edits``
Levenshtein edits of the misspelling, sharing a literal prefix of
``prefix_length`` chars (``DirectSpellChecker.java:63-74``), with
length bounds ``min_query_length`` / skip-exact semantics.  Suggestions
are ranked by string similarity then doc_freq then term — the
``scoreComparator`` ordering (``DirectSpellChecker.java:478-497``,
SuggestWordScoreComparator), with
``similarity = 1 - distance / min(|term|, |query|)``
(``LuceneLevenshteinDistance``-style normalization).

Spark shape: ONE term-dictionary scan (bucket files, column-pruned to
(term, doc_freq)) with the length window and prefix pushed as parquet
filters before the JVM ``levenshtein`` — the same prefilter the fuzzy
query uses, so at 10^12-doc scale the scan touches the dictionary, not
the postings."""

from __future__ import annotations

from pyspark.sql import DataFrame, functions as F, Window as W

from lucene_1_spark.index.builder import FIELD_SEP


def suggest_similar(searcher, term: str, *,
                    num_suggestions: int = 5,
                    max_edits: int = 2,
                    prefix_length: int = 1,
                    min_doc_freq: int = 1,
                    include_exact: bool = False) -> DataFrame:
    """Top suggestions for a (mis)spelled term as a DataFrame
    ``(suggestion, doc_freq, similarity, rank)``.

    ``include_exact=False`` drops the query term itself — the
    DirectSpellChecker "more popular / suggest always" modes both
    exclude the exact match by default."""
    if max_edits < 1 or max_edits > 2:
        raise ValueError("max_edits must be 1 or 2 "
                         "(LevenshteinAutomata.MAXIMUM_SUPPORTED_DISTANCE)")
    t = term
    col = F.col("term")
    # length window + literal prefix: pushed to the dictionary scan
    # BEFORE levenshtein (FuzzyTermsEnum's automaton prefilter, in
    # relational form)
    pred = (F.length(col) >= F.lit(max(1, len(t) - max_edits))) & \
           (F.length(col) <= F.lit(len(t) + max_edits)) & \
           (~col.contains(FIELD_SEP))
    if prefix_length > 0:
        pred = pred & col.startswith(t[:prefix_length])
    cand = (searcher.reader.term_stats()
            .filter(pred)
            .select("term", "doc_freq")
            .withColumn("dist", F.levenshtein(col, F.lit(t)))
            .filter(F.col("dist") <= max_edits))
    if not include_exact:
        cand = cand.filter(col != t)
    if min_doc_freq > 1:
        cand = cand.filter(F.col("doc_freq") >= min_doc_freq)
    scored = cand.select(
        F.col("term").alias("suggestion"),
        F.col("doc_freq").cast("long").alias("doc_freq"),
        F.round(1.0 - F.col("dist")
                / F.least(F.length(col), F.lit(len(t))).cast("double"), 6)
        .alias("similarity"))
    # top-n via orderBy().limit() — TakeOrderedAndProject (per-partition
    # heap + driver merge); the global row_number window funneled every
    # candidate term through one task.  rank is assigned over the n
    # survivors only — identical rows, identical ranks (the order is a
    # total order, suggestion asc breaks all ties).
    top = scored.orderBy(F.desc("similarity"), F.desc("doc_freq"),
                         F.asc("suggestion")).limit(int(num_suggestions))
    return top.withColumn(
        "rank", F.row_number().over(
            W.orderBy(F.desc("similarity"), F.desc("doc_freq"),
                      F.asc("suggestion"))).cast("long"))
