"""ClassicSimilarity (TF-IDF) — the third pluggable similarity
(``search/similarities/ClassicSimilarity.java``): sqrt(tf) * idf^2 *
1/sqrt(len) in double precision, engine vs brute-force python."""

import math
import os
from collections import Counter

import pytest

from lucene_1_spark import corpus as corpus_mod
from lucene_1_spark.analysis import get_analyzer
from lucene_1_spark.index import IndexBuilder, IndexReader
from lucene_1_spark.index.builder import IndexConfig
from lucene_1_spark.search import IndexSearcher
from lucene_1_spark.search.query import PhraseQuery


@pytest.fixture(scope="module")
def classic(spark, tmp_root):
    pdf = corpus_mod.generate(150)
    d = os.path.join(tmp_root, "idx_classic")
    IndexBuilder(spark, d, IndexConfig(
        similarity="classic_double", n_buckets=4, n_doc_partitions=4,
        positions=True)).build(
        spark.createDataFrame(pdf).repartition(4, "repo"))
    an = get_analyzer("standard")
    ordered = pdf.sort_values(["repo", "path", "commit"],
                              kind="mergesort").reset_index(drop=True)
    toks = [an.tokens_with_positions(c) for c in ordered["content"]]
    return IndexSearcher(IndexReader(spark, d)), toks


def _brute(toks, terms):
    """{doc_id: classic score} for an OR query over ``terms``."""
    n = sum(1 for t in toks if t)
    tf = [Counter(t for t, _ in doc) for doc in toks]
    lens = [len(doc) for doc in toks]
    out = {}
    for term in set(terms):
        df = sum(1 for c in tf if term in c)
        if df == 0:
            continue
        w = (math.log((n + 1) / (df + 1)) + 1.0) ** 2
        for d, c in enumerate(tf):
            f = c.get(term)
            if f:
                out[d] = out.get(d, 0.0) + \
                    w * math.sqrt(f) / math.sqrt(max(lens[d], 1))
    return out


@pytest.mark.parametrize("q,terms", [
    ("tok1", ["tok1"]),
    ("tok0 tok5 tok123", ["tok0", "tok5", "tok123"]),
])
def test_classic_scores_match_bruteforce(classic, q, terms):
    s, toks = classic
    exp = _brute(toks, terms)
    got = {r["doc_id"]: r["score"]
           for r in s.search_df(q, k=None).collect()}
    assert set(got) == set(exp) and got
    for d in got:
        assert got[d] == pytest.approx(exp[d], rel=1e-12), d


def test_classic_conjunction_and_ranking(classic):
    s, toks = classic
    exp = _brute(toks, ["tok0", "tok1"])
    both = {d for d in exp
            if all(any(t == w for w, _ in toks[d])
                   for t in ("tok0", "tok1"))}
    got = s.search_df("+tok0 +tok1", k=10).collect()
    exp_rank = sorted(((d, exp[d]) for d in both),
                      key=lambda r: (-r[1], r[0]))[:10]
    assert [(r["doc_id"]) for r in got] == [d for d, _ in exp_rank]
    for r, (d, v) in zip(got, exp_rank):
        assert r["score"] == pytest.approx(v, rel=1e-12)


def test_classic_phrase(classic):
    s, toks = classic
    n = sum(1 for t in toks if t)
    tf = [Counter(t for t, _ in doc) for doc in toks]
    lens = [len(doc) for doc in toks]
    exp = {}
    for d, doc in enumerate(toks):
        pos = {}
        for t, p in doc:
            pos.setdefault(t, []).append(p)
        a, b = pos.get("tok0", []), set(pos.get("tok1", []))
        pf = sum(1 for p in a if p + 1 in b)
        if pf:
            idfs = 0.0
            for t in ("tok0", "tok1"):
                df = sum(1 for c in tf if t in c)
                idfs += math.log((n + 1) / (df + 1)) + 1.0
            exp[d] = idfs ** 2 * math.sqrt(pf) / math.sqrt(max(lens[d], 1))
    got = {r["doc_id"]: r["score"] for r in
           s.search_df(PhraseQuery(("tok0", "tok1")), k=None).collect()}
    assert set(got) == set(exp) and got
    for d in got:
        assert got[d] == pytest.approx(exp[d], rel=1e-12), d


def test_classic_explain_matches_search(classic):
    s, _ = classic
    rows = s.search_df("tok0 tok5", k=5).collect()
    for r in rows:
        ex = s.explain("tok0 tok5", r["doc_id"])
        assert ex["value"] == pytest.approx(r["score"], rel=1e-12)
