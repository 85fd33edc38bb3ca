"""Classification module (``lucene/classification``):
SimpleNaiveBayesClassifier semantics brute-forced in pure Python;
KNearestNeighborClassifier smoke over a real index."""

import math
from collections import Counter, defaultdict

import pytest

from lucene_1_spark.pipeline.classify import (knn_classify,
                                              naive_bayes_classify,
                                              naive_bayes_train)


@pytest.fixture(scope="module")
def corpus(spark):
    import pandas as pd
    rows = []
    py = ["def self return import class yield lambda"] * 6
    java = ["public static void final interface extends new"] * 6
    rust = ["fn let mut impl trait match struct"] * 6
    for i, t in enumerate(py + java + rust):
        lang = ("python" if i < 6 else "java" if i < 12 else "rust")
        # make docs distinguishable but class-consistent
        rows.append((i, f"{t} tok{i % 4}", lang))
    pdf = pd.DataFrame(rows, columns=["doc_id", "text", "lang"])
    return spark.createDataFrame(pdf), pdf


def _brute_nb(pdf):
    toks = {r.doc_id: [t for t in r.text.lower().split() if t]
            for r in pdf.itertuples()}
    labels = {r.doc_id: r.lang for r in pdf.itertuples()}
    classes = sorted(set(labels.values()))
    n_docs = Counter(labels.values())
    n_total = len(pdf)
    tokens_c = Counter()
    cnt = defaultdict(float)
    vocab = set()
    for d, ts in toks.items():
        c = labels[d]
        tokens_c[c] += len(ts)
        for t in ts:
            cnt[(t, c)] += 1
            vocab.add(t)
    v = len(vocab)
    preds = {}
    for d, ts in toks.items():
        best = None
        for c in classes:
            s = math.log(n_docs[c] / n_total) \
                - len(ts) * math.log(tokens_c[c] + v)
            for t in ts:
                s += math.log(cnt.get((t, c), 0.0) + 1.0)
            if best is None or s > best[1] + 1e-12:
                best = (c, s)
        preds[d] = best
    return preds


def test_naive_bayes_matches_brute_force(corpus):
    df, pdf = corpus
    model = naive_bayes_train(df, text_col="text", label_col="lang")
    got = {r["doc_id"]: (r["label"], r["log_score"])
           for r in naive_bayes_classify(model, df).collect()}
    want = _brute_nb(pdf)
    assert set(got) == set(want)
    for d in want:
        assert got[d][0] == want[d][0], d
        # engine rounds log_score to 6 decimals
        assert math.isclose(got[d][1], round(want[d][1], 6),
                            abs_tol=2e-6), d


def test_naive_bayes_predicts_training_labels(corpus):
    """On this cleanly-separated corpus NB must recover every label."""
    df, pdf = corpus
    model = naive_bayes_train(df, text_col="text", label_col="lang")
    got = {r["doc_id"]: r["label"]
           for r in naive_bayes_classify(model, df).collect()}
    for r in pdf.itertuples():
        assert got[r.doc_id] == r.lang


def test_knn_classifier_over_index(spark, tmp_root, corpus):
    import os

    from lucene_1_spark.index import IndexBuilder, IndexReader
    from lucene_1_spark.index.builder import IndexConfig
    from lucene_1_spark.search import IndexSearcher
    from pyspark.sql import functions as F
    df, pdf = corpus
    src = df.select(
        F.lit("r").alias("repo"),
        F.lpad(F.col("doc_id").cast("string"), 6, "0").alias("path"),
        F.lit("c").alias("commit"), F.col("lang"),
        F.col("text").alias("content"))
    d = os.path.join(tmp_root, "idx_knncls")
    IndexBuilder(spark, d, IndexConfig(n_buckets=4,
                                       n_doc_partitions=2)).build(src)
    se = IndexSearcher(IndexReader(spark, d))
    labeled = se.reader.docs().select(
        "doc_id", F.col("lang").alias("label"))
    got = knn_classify(se, labeled, "public static void interface",
                       k=5, min_term_freq=1, min_doc_freq=1)
    assert got == "java"
    got2 = knn_classify(se, labeled, "fn impl trait", k=5,
                        min_term_freq=1, min_doc_freq=1)
    assert got2 == "rust"
    assert knn_classify(se, labeled, "zzz qqq", k=5,
                        min_term_freq=1, min_doc_freq=1) is None
