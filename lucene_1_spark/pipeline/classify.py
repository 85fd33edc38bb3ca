"""Document classification over corpus statistics — the
``lucene/classification`` module re-expressed relationally.

Reference semantics:
- ``classification/SimpleNaiveBayesClassifier.java:44-250`` —
  multinomial Naive Bayes whose statistics come straight from the
  index (class priors from doc counts, per-class term likelihoods from
  term frequencies with add-one smoothing over the vocabulary);
- ``classification/KNearestNeighborClassifier.java:40-150`` — the
  class of a document is the (score-weighted) majority label of its
  top-k MoreLikeThis neighbors.

Spark shape (Naive Bayes): training is two aggregations (class stats +
per-(term, class) counts); classification is one tokens-to-likelihood
left join + per-(doc, class) sum + argmax window.  The add-one
smoothing term for ABSENT (term, class) pairs folds into a per-class
closed form, so the join only touches counts that exist:

    score(d, c) = ln prior_c
                  - len_d * ln(tokens_c + |V|)
                  + sum_t tf(t, d) * ln(cnt(t, c) + 1)

(absent terms contribute ln(1) = 0 to the last sum).  Everything is
JVM column arithmetic — no UDFs — and both aggregations shuffle on
their natural keys, so the pipeline survives a 100-TB corpus.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, functions as F, Window as W


def _tokens(docs: DataFrame, text_col: str) -> DataFrame:
    """Whitespace-lowercase tokens (the SQL-parity analyzer) with one
    row per (doc_id, term) occurrence kept as counts."""
    toks = (docs
            .filter(F.col(text_col).isNotNull()
                    & (F.trim(F.col(text_col)) != ""))
            .select("doc_id",
                    F.explode(F.split(F.trim(F.col(text_col)), r"\s+"))
                    .alias("term"))
            .filter(F.col("term") != "")
            .withColumn("term", F.lower(F.col("term"))))
    return toks.groupBy("doc_id", "term").agg(
        F.count("*").cast("double").alias("tf"))


def naive_bayes_train(docs: DataFrame, text_col: str = "text",
                      label_col: str = "lang") -> dict:
    """Train the multinomial NB model
    (``SimpleNaiveBayesClassifier.java`` reads the same statistics
    lazily from the index; here they materialize as two small
    DataFrames).  Returns {"class_stats", "term_counts", "vocab_size"}.
    """
    tf = _tokens(docs, text_col)
    labels = docs.select("doc_id", F.col(label_col).alias("label"))
    # materialize the labeled term frequencies once: class stats, the
    # (term, label) counts, and the vocabulary size would otherwise
    # each re-run the full tokenize + explode over the corpus
    tl = tf.join(labels, "doc_id").localCheckpoint(eager=False)
    class_stats = (tl.groupBy("label")
                   .agg(F.countDistinct("doc_id").cast("double")
                        .alias("n_docs"),
                        F.sum("tf").alias("n_tokens"))
                   .localCheckpoint(eager=False))
    term_counts = (tl.groupBy("term", "label")
                   .agg(F.sum("tf").alias("cnt"))
                   .localCheckpoint(eager=False))
    # every tf term carries >=1 label row, so the distinct terms of
    # term_counts ARE the vocabulary (no extra pass over the corpus)
    vocab_size = term_counts.select("term").distinct().count()
    return {"class_stats": class_stats, "term_counts": term_counts,
            "vocab_size": int(vocab_size)}


def naive_bayes_classify(model: dict, docs: DataFrame,
                         text_col: str = "text") -> DataFrame:
    """Predict a label per doc: ``(doc_id, label, log_score)`` of the
    argmax class (ties break label-asc, deterministic).  One left join
    on (term, label-cross), one groupBy, one window."""
    tf = _tokens(docs, text_col)
    dl = tf.groupBy("doc_id").agg(F.sum("tf").alias("len"))
    cs = model["class_stats"]
    n_total = cs.agg(F.sum("n_docs")).first()[0]
    v = float(model["vocab_size"])
    # cross every doc with every class, then add the existing-count sum
    per_class = (dl.crossJoin(cs)
                 .select("doc_id", "label", "len",
                         (F.log(F.col("n_docs") / float(n_total))
                          - F.col("len")
                          * F.log(F.col("n_tokens") + v)).alias("base")))
    hits = (tf.join(model["term_counts"], "term")
            .groupBy("doc_id", "label")
            .agg(F.sum(F.col("tf") * F.log(F.col("cnt") + 1.0))
                 .alias("hit_sum")))
    scored = (per_class.join(hits, ["doc_id", "label"], "left")
              .select("doc_id", "label",
                      (F.col("base") + F.coalesce(F.col("hit_sum"),
                                                  F.lit(0.0)))
                      .alias("log_score")))
    ranked = scored.withColumn(
        "rn", F.row_number().over(
            W.partitionBy("doc_id").orderBy(F.desc("log_score"),
                                            F.asc("label"))))
    return (ranked.filter(F.col("rn") == 1)
            .select("doc_id", "label", F.round("log_score", 6)
                    .alias("log_score")))


def knn_classify(searcher, labeled_docs: DataFrame, text: str, *,
                 k: int = 10, label_col: str = "label",
                 id_col: str = "doc_id",
                 min_term_freq: int = 1, min_doc_freq: int = 1) -> str | None:
    """Class of a text by score-weighted vote of its top-k BM25
    MoreLikeThis neighbors (``KNearestNeighborClassifier.java:40-150``;
    the reference sums per-class scores of the top docs and takes the
    max).  Ties break label-asc.  Returns None when nothing matches."""
    from lucene_1_spark.search.morelikethis import more_like_this_query
    from lucene_1_spark.search.query import MatchNoDocsQuery

    q = more_like_this_query(searcher, text, min_term_freq=min_term_freq,
                             min_doc_freq=min_doc_freq)
    if isinstance(q, MatchNoDocsQuery):
        return None
    top = searcher.search_df(q, k=k)
    votes = (top.join(labeled_docs.select(F.col(id_col).alias("doc_id"),
                                          F.col(label_col).alias("label")),
                      "doc_id")
             .groupBy("label").agg(F.sum("score").alias("vote"))
             .orderBy(F.desc("vote"), F.asc("label"))
             .limit(1).collect())
    return votes[0]["label"] if votes else None
