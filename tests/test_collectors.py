"""Diversified top-k, doc-values stats, blended terms
(``misc/search/DiversifiedTopDocsCollector.java``,
``misc/search/DocValuesStats.java``,
``core/search/BlendedTermQuery.java``) vs brute-force python."""

import math
import os
from collections import Counter

import pytest
from pyspark.sql import functions as F

from lucene_1_spark import corpus as corpus_mod
from lucene_1_spark.analysis import get_analyzer
from lucene_1_spark.index import IndexBuilder, IndexReader
from lucene_1_spark.index.builder import IndexConfig
from lucene_1_spark.search import IndexSearcher
from lucene_1_spark.search.collectors import (
    blended_term_search, diversified_topk, doc_values_stats)

# the searcher casts cfg k1 through float32 (shared with the
# quantized-norms path), so double scoring uses this exact value
K1E = float(__import__("numpy").float32(1.2))


@pytest.fixture(scope="module")
def base(spark, tmp_root):
    pdf = corpus_mod.generate(200)
    d = os.path.join(tmp_root, "idx_collectors")
    src = spark.createDataFrame(pdf).repartition(4, "repo")
    IndexBuilder(spark, d, IndexConfig(
        similarity="bm25_double", n_buckets=4,
        n_doc_partitions=4)).build(src)
    an = get_analyzer("standard")
    ordered = pdf.sort_values(["repo", "path", "commit"],
                              kind="mergesort").reset_index(drop=True)
    toks = [an.tokens(c) for c in ordered["content"]]
    s = IndexSearcher(IndexReader(spark, d))
    return s, toks, ordered


def test_diversified_topk_caps_per_key(base):
    """Greedy best-first-with-cap == window rank filter + global
    top-k: compare against brute-force over exhaustive scores."""
    s, _, ordered = base
    q = "tok0 tok1 tok2"
    cap, k = 2, 8
    got = diversified_topk(s, q, "lang", k=k,
                           max_per_key=cap).collect()
    allrows = s.search_df(q, k=None).collect()
    lang = dict(zip(range(len(ordered)), ordered["lang"]))
    ranked = sorted(((r["doc_id"], r["score"]) for r in allrows),
                    key=lambda x: (-x[1], x[0]))
    seen: Counter = Counter()
    exp = []
    for d, sc in ranked:
        if seen[lang[d]] < cap:
            seen[lang[d]] += 1
            exp.append((d, sc))
        if len(exp) == k:
            break
    assert [(r["doc_id"], r["score"]) for r in got] == \
        [(d, pytest.approx(sc)) for d, sc in exp]
    per_key = Counter(r["lang"] for r in got)
    assert max(per_key.values()) <= cap
    assert [r["rank"] for r in got] == list(range(1, len(got) + 1))


def test_doc_values_stats_matches_pandas(base):
    s, toks, ordered = base
    got = doc_values_stats(s, "tok0", "length").collect()[0]
    vals = [len(doc) for doc in toks if "tok0" in doc]
    assert vals
    n = len(vals)
    mean = sum(vals) / n
    var = sum((v - mean) ** 2 for v in vals) / n
    assert got["count"] == n and got["missing"] == 0
    assert got["min"] == min(vals) and got["max"] == max(vals)
    assert got["mean"] == pytest.approx(mean, rel=1e-12)
    assert got["variance"] == pytest.approx(var, rel=1e-9)
    assert got["stdev"] == pytest.approx(math.sqrt(var), rel=1e-9)


def test_doc_values_stats_counts_missing(base):
    """NULL values land in `missing`, not `count` (DocValuesStats
    semantics)."""
    s, _, _ = base
    got = doc_values_stats(
        s, "tok0",
        "CASE WHEN lang = 'python' THEN NULL ELSE length END"
    ).collect()[0]
    assert got["missing"] > 0
    assert got["count"] + got["missing"] == \
        s.count("tok0")


def test_blended_terms_rescore_with_merged_stats(base):
    """df = max, ttf = sum; member scores scale by
    blended_weight/actual_weight; DisMax(0.01) combine."""
    s, toks, _ = base
    tf = [Counter(doc) for doc in toks]
    lens = [len(doc) for doc in toks]
    N = len(toks)
    avgdl = sum(lens) / N
    terms = ("tok0", "tok7")
    dfs = {t: sum(1 for c in tf if t in c) for t in terms}
    df_max = max(dfs.values())
    w_blend = math.log(1 + (N - df_max + 0.5) / (df_max + 0.5))
    exp = {}
    for t in terms:
        for d, c in enumerate(tf):
            f = c.get(t)
            if f:
                sc = w_blend * f / (f + K1E * (0.25 + 0.75
                                               * lens[d] / avgdl))
                mx, sm = exp.get(d, (0.0, 0.0))
                exp[d] = (max(mx, sc), sm + sc)
    exp = {d: mx + 0.01 * (sm - mx) for d, (mx, sm) in exp.items()}
    got = {r["doc_id"]: r["score"]
           for r in blended_term_search(s, terms, k=None).collect()}
    assert set(got) == set(exp) and got
    for d in got:
        assert got[d] == pytest.approx(exp[d], rel=1e-10), d


def test_blended_terms_boolean_combine_and_lm_rejection(base):
    s, _, _ = base
    dm = blended_term_search(s, ("tok0", "tok7"), k=5).collect()
    bl = blended_term_search(s, ("tok0", "tok7"), k=5,
                             combine="boolean").collect()
    assert dm and bl
    lm = IndexSearcher(s.reader, similarity="lm_dirichlet_double")
    with pytest.raises(NotImplementedError):
        blended_term_search(lm, ("tok0", "tok7"))
