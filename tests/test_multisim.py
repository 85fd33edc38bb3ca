"""MultiSimilarity (CombSUM) + PerFieldSimilarityWrapper analogs
(``search/similarities/MultiSimilarity.java:27-70``,
``PerFieldSimilarityWrapper.java``): engine scores vs brute-force
python, and per-field routing vs single-searcher recomposition."""

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
from lucene_1_spark.search.multisim import (
    PerFieldSimilaritySearcher, multi_similarity_search)
from lucene_1_spark.search.query import (
    BooleanQuery, Clause, Occur, TermQuery)

# the searcher casts cfg k1 through float32 (shared with the
# quantized-norms path), so double scoring uses this exact value
K1E = float(__import__("numpy").float32(1.2))


@pytest.fixture(scope="module")
def base(spark, tmp_root):
    pdf = corpus_mod.generate(150)
    d = os.path.join(tmp_root, "idx_multisim")
    src = (spark.createDataFrame(pdf)
           .withColumn("title", F.substring("content", 1, 60))
           .repartition(4, "repo"))
    IndexBuilder(spark, d, IndexConfig(
        similarity="bm25_double", n_buckets=4, n_doc_partitions=4,
        positions=True, text_fields=("title",),
        keyword_fields=("lang",))).build(src)
    an = get_analyzer("standard")
    ordered = pdf.sort_values(["repo", "path", "commit"],
                              kind="mergesort").reset_index(drop=True)
    toks = [an.tokens(c) for c in ordered["content"]]
    return IndexReader(spark, d), toks, ordered


def test_multi_similarity_is_combsum_bruteforce(base):
    """CombSUM of bm25_double + classic_double matches a brute-force
    python sum of the two closed forms."""
    reader, toks, _ = base
    got = {r["doc_id"]: r["score"] for r in multi_similarity_search(
        reader, ("bm25_double", "classic_double"),
        "tok0 tok5", k=None).collect()}
    tf = [Counter(t for t in doc) for doc in toks]
    lens = [len(doc) for doc in toks]
    N = len(toks)
    avgdl = sum(lens) / N
    exp = {}
    for term in ("tok0", "tok5"):
        n = sum(1 for c in tf if term in c)
        if n == 0:
            continue
        idf_b = math.log(1 + (N - n + 0.5) / (n + 0.5))
        idf_c = math.log((N + 1.0) / (n + 1.0)) + 1.0
        for d, c in enumerate(tf):
            f = c.get(term)
            if f:
                bm = idf_b * f / (f + K1E * (0.25 + 0.75
                                             * lens[d] / avgdl))
                cl = (math.sqrt(f) * idf_c ** 2
                      / math.sqrt(max(lens[d], 1)))
                exp[d] = exp.get(d, 0.0) + bm + cl
    assert set(got) == set(exp) and got
    for d in got:
        assert got[d] == pytest.approx(exp[d], rel=1e-9), d


def test_multi_similarity_topk_order(base):
    reader, _, _ = base
    top = multi_similarity_search(
        reader, ("bm25_double", "raw_tf_double"), "tok0 tok1",
        k=5).collect()
    assert len(top) == 5
    scores = [r["score"] for r in top]
    assert scores == sorted(scores, reverse=True)


def test_per_field_similarity_routes_by_field(base):
    """content scores BM25, title scores BooleanSimilarity (constant
    boost): the combined score equals the content-only BM25 score plus
    1.0 for docs whose title matches."""
    reader, _, ordered = base
    an = get_analyzer("standard")
    title_match = {i for i, c in enumerate(ordered["content"])
                   if "tok0" in an.tokens(c[:60])}
    assert title_match
    pf = PerFieldSimilaritySearcher(
        reader, "bm25_double", {"title": "boolean_double"})
    q = BooleanQuery((
        Clause(TermQuery("tok1"), Occur.SHOULD),
        Clause(TermQuery("tok0", field="title"), Occur.SHOULD),
    ))
    got = {r["doc_id"]: r["score"]
           for r in pf.search_df(q, k=None).collect()}
    base_s = IndexSearcher(reader, similarity="bm25_double")
    content = {r["doc_id"]: r["score"]
               for r in base_s.search_df("tok1", k=None).collect()}
    exp = dict(content)
    for d in title_match:
        exp[d] = exp.get(d, 0.0) + 1.0
    assert set(got) == set(exp) and got
    for d in got:
        assert got[d] == pytest.approx(exp[d], rel=1e-9), d


def test_per_field_respects_boolean_semantics(base):
    """MUST_NOT and MUST constraints mask the per-field sums."""
    reader, _, _ = base
    pf = PerFieldSimilaritySearcher(
        reader, "bm25_double", {"title": "boolean_double"})
    q = BooleanQuery((
        Clause(TermQuery("tok1"), Occur.MUST),
        Clause(TermQuery("tok0", field="title"), Occur.SHOULD),
        Clause(TermQuery("tok3"), Occur.MUST_NOT),
    ))
    got = {r["doc_id"] for r in pf.search_df(q, k=None).collect()}
    base_s = IndexSearcher(reader, similarity="bm25_double")
    must = {r["doc_id"]
            for r in base_s.search_df("tok1", k=None).collect()}
    banned = {r["doc_id"]
              for r in base_s.search_df("tok3", k=None).collect()}
    assert got == must - banned and got


def test_per_field_default_fallback_unmapped_field(base):
    """A field not in the map scores with the default similarity —
    PerFieldSimilarityWrapper.get() fallback."""
    reader, _, _ = base
    pf = PerFieldSimilaritySearcher(
        reader, "bm25_double", {"title": "boolean_double"})
    q = TermQuery("python", field="lang")
    got = {r["doc_id"]: r["score"]
           for r in pf.search_df(q, k=None).collect()}
    base_s = IndexSearcher(reader, similarity="bm25_double")
    exp = {r["doc_id"]: r["score"]
           for r in base_s.search_df(q, k=None).collect()}
    assert got.keys() == exp.keys() and got
    for d in got:
        assert got[d] == pytest.approx(exp[d], rel=1e-9)
