"""CombinedFieldQuery — BM25F-simplified multi-field scoring against a
brute-force reconstruction of the reference semantics
(``sandbox/search/CombinedFieldQuery.java:74-88,303-352``,
``MultiNormsLeafSimScorer.java:140-153``): weighted tf sum, weighted
field-length norm re-encoded through SmallFloat byte4, max doc_freq,
weight-merged collection stats."""

import os

import numpy as np
import pytest
from pyspark.sql import functions as F

from lucene_1_spark import corpus as corpus_mod
from lucene_1_spark.functions import bm25
from lucene_1_spark.functions.smallfloat import LENGTH_TABLE, int_to_byte4
from lucene_1_spark.index import IndexBuilder, IndexReader
from lucene_1_spark.index.builder import IndexConfig
from lucene_1_spark.search import IndexSearcher
from lucene_1_spark.search.query import (CombinedFieldQuery, query_from_dict,
                                         query_to_dict)

K1, B = np.float32(1.2), np.float32(0.75)


@pytest.fixture(scope="module")
def cf_index(spark, tmp_root):
    pdf = corpus_mod.generate(200)
    d = os.path.join(tmp_root, "idx_combined")
    src = (spark.createDataFrame(pdf)
           .withColumn("title", F.substring("content", 1, 60))
           .repartition(4, "repo"))
    IndexBuilder(spark, d, IndexConfig(
        n_buckets=8, n_doc_partitions=4, positions=True,
        text_fields=("title",))).build(src)
    return d, pdf


@pytest.fixture(scope="module")
def cfs(spark, cf_index):
    d, _ = cf_index
    return IndexSearcher(IndexReader(spark, d))


def _tokens(pdf):
    """{doc_id: (content_tokens, title_tokens)} in engine docID order."""
    from lucene_1_spark.analysis import get_analyzer
    an = get_analyzer("standard")
    out = {}
    for did, row in enumerate(
            pdf.sort_values(["repo", "path", "commit"],
                            kind="mergesort").itertuples(index=False)):
        out[did] = (an.tokens(row.content), an.tokens(row.content[:60]))
    return out


def _expected(pdf, terms, w_content, w_title):
    """Brute-force reference scores: {doc_id: float32 score}."""
    toks = _tokens(pdf)
    # per-(field, term) doc freqs
    df_max = 0
    for t in terms:
        for fi in (0, 1):
            df = sum(1 for c in toks.values() if t in c[fi])
            df_max = max(df_max, df)
    # collection stats: docCount maxed, sum_ttf weight-merged with the
    # reference's long-truncating fold
    dc_content = sum(1 for c in toks.values() if c[0])
    dc_title = sum(1 for c in toks.values() if c[1])
    doc_count = max(dc_content, dc_title)
    sum_ttf = 0
    for w, fi in ((w_content, 0), (w_title, 1)):
        sum_ttf = int(sum_ttf + float(w)
                      * sum(len(c[fi]) for c in toks.values()))
    avgdl = np.float32(np.float64(sum_ttf) / doc_count)
    weight = bm25.term_weight(df_max, doc_count)
    cache = bm25.norm_inverse_cache(avgdl, K1, B)
    out = {}
    for d, (ct, tt) in toks.items():
        freq = np.float32(0.0)
        for t in terms:
            freq += np.float32(w_content * ct.count(t)
                               + w_title * tt.count(t))
        if freq == 0:
            continue
        norm = np.float32(0.0)
        for w, ln in ((w_content, len(ct)), (w_title, len(tt))):
            dec = LENGTH_TABLE[int_to_byte4(np.array([ln]))[0]]
            norm = np.float32(norm + np.float32(w) * dec)
        nb = int_to_byte4(np.array(
            [int(np.floor(np.float32(norm + np.float32(0.5))))]))
        out[d] = np.float32(bm25.score_term(
            np.array([freq]), nb, weight, cache)[0])
    return out


def test_combined_field_matches_bruteforce(cfs, cf_index):
    _, pdf = cf_index
    exp = _expected(pdf, ["tok0"], 1.0, 2.0)
    rows = cfs.search_df(
        CombinedFieldQuery(("tok0",),
                           (("content", 1.0), ("title", 2.0))),
        k=None).collect()
    got = {r["doc_id"]: np.float32(r["score"]) for r in rows}
    assert set(got) == set(exp) and exp
    for d in exp:
        assert got[d] == exp[d], d


def test_combined_field_multi_term(cfs, cf_index):
    """All (field, term) postings fold into ONE pseudo-term freq."""
    _, pdf = cf_index
    exp = _expected(pdf, ["tok0", "tok1"], 1.0, 3.0)
    rows = cfs.search_df(
        CombinedFieldQuery(("tok0", "tok1"),
                           (("content", 1.0), ("title", 3.0))),
        k=None).collect()
    got = {r["doc_id"]: np.float32(r["score"]) for r in rows}
    assert set(got) == set(exp)
    for d in exp:
        assert got[d] == exp[d], d


def test_combined_single_field_equals_unit_weight(cfs, cf_index):
    """content-only combined query == plain semantics at weight 1."""
    _, pdf = cf_index
    exp = _expected(pdf, ["tok2"], 1.0, 0.0)  # w_title=0 drops the field
    # note: brute force with w_title=0 keeps title in collection stats
    # at weight 0 -> identical to content-only stats
    rows = cfs.search_df(
        CombinedFieldQuery(("tok2",), (("content", 1.0),)),
        k=None).collect()
    got = {r["doc_id"]: np.float32(r["score"]) for r in rows}
    assert set(got) == set(exp)
    for d in exp:
        assert got[d] == exp[d], d


def test_combined_field_topk_ordering(cfs):
    top = cfs.search_df(
        CombinedFieldQuery(("tok0",), (("content", 1.0), ("title", 2.0))),
        k=10).collect()
    assert len(top) == 10
    pairs = [(float(r["score"]), r["doc_id"]) for r in top]
    assert pairs == sorted(pairs, key=lambda p: (-p[0], p[1]))


def test_weight_below_one_rejected():
    with pytest.raises(ValueError):
        CombinedFieldQuery(("x",), (("content", 0.5),))


def test_unknown_field_rejected(cfs):
    with pytest.raises(ValueError):
        cfs.search_df(
            CombinedFieldQuery(("x",), (("nope", 1.0),)), k=5)


def test_serializer_roundtrip():
    q = CombinedFieldQuery(("a", "b"), (("content", 1.0), ("title", 2.5)),
                           boost=1.5)
    assert query_from_dict(query_to_dict(q)) == q
