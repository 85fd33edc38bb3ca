"""LMDirichletSimilarity + BooleanSimilarity — the 4th/5th pluggable
similarities (``search/similarities/LMDirichletSimilarity.java:60-90``,
``search/similarities/BooleanSimilarity.java``): engine scores vs
brute-force python over the same corpus."""

import math
import os
from collections import Counter

import pytest

from lucene_1_spark import corpus as corpus_mod
from lucene_1_spark.analysis import get_analyzer
from lucene_1_spark.index import IndexBuilder, IndexReader
from lucene_1_spark.index.builder import IndexConfig
from lucene_1_spark.search import IndexSearcher
from lucene_1_spark.search.query import PhraseQuery, SynonymQuery

MU = 2000.0


def _build(spark, tmp_root, sim, name):
    pdf = corpus_mod.generate(150)
    d = os.path.join(tmp_root, name)
    IndexBuilder(spark, d, IndexConfig(
        similarity=sim, n_buckets=4, n_doc_partitions=4,
        positions=True)).build(
        spark.createDataFrame(pdf).repartition(4, "repo"))
    an = get_analyzer("standard")
    ordered = pdf.sort_values(["repo", "path", "commit"],
                              kind="mergesort").reset_index(drop=True)
    toks = [an.tokens_with_positions(c) for c in ordered["content"]]
    return IndexSearcher(IndexReader(spark, d)), toks


@pytest.fixture(scope="module")
def lmd(spark, tmp_root):
    return _build(spark, tmp_root, "lm_dirichlet_double", "idx_lmd")


@pytest.fixture(scope="module")
def boolsim(spark, tmp_root):
    return _build(spark, tmp_root, "boolean_double", "idx_boolsim")


def _lmd_brute(toks, terms):
    """{doc_id: LMD score} for an OR query over ``terms`` (boost 1)."""
    tf = [Counter(t for t, _ in doc) for doc in toks]
    lens = [len(doc) for doc in toks]
    sttf = sum(lens)
    out = {}
    for term in set(terms):
        ttf = sum(c.get(term, 0) for c in tf)
        if ttf == 0:
            continue
        p = (ttf + 1.0) / (sttf + 1.0)
        for d, c in enumerate(tf):
            f = c.get(term)
            if f:
                s = math.log1p(f / (MU * p)) + math.log(MU / (lens[d] + MU))
                out[d] = out.get(d, 0.0) + max(s, 0.0)
    return {d: v for d, v in out.items() if v != 0.0 or d in out}


def test_lmd_scores_match_bruteforce(lmd):
    s, toks = lmd
    for q, terms in [("tok1", ["tok1"]),
                     ("tok0 tok5 tok123", ["tok0", "tok5", "tok123"])]:
        exp = _lmd_brute(toks, terms)
        got = {r["doc_id"]: r["score"]
               for r in s.search_df(q, k=None).collect()}
        assert set(got) == set(exp) and got
        for d in got:
            assert got[d] == pytest.approx(exp[d], rel=1e-12,
                                           abs=1e-12), (q, d)


def test_lmd_conjunction_and_ranking(lmd):
    s, toks = lmd
    exp = _lmd_brute(toks, ["tok0", "tok1"])
    both = {d for d in exp
            if all(any(t == w for w, _ in toks[d])
                   for t in ("tok0", "tok1"))}
    got = s.search_df("+tok0 +tok1", k=10).collect()
    exp_rank = sorted(((d, exp[d]) for d in both),
                      key=lambda r: (-r[1], r[0]))[:10]
    assert [r["doc_id"] for r in got] == [d for d, _ in exp_rank]
    for r, (d, v) in zip(got, exp_rank):
        assert r["score"] == pytest.approx(v, rel=1e-12, abs=1e-12)


def test_lmd_phrase(lmd):
    """Phrase under LMD: one BasicStats per member term, SAME phrase
    freq scored per stat and summed (SimilarityBase MultiSimScorer),
    each component clamped at 0."""
    s, toks = lmd
    tf = [Counter(t for t, _ in doc) for doc in toks]
    lens = [len(doc) for doc in toks]
    sttf = sum(lens)
    exp = {}
    for d, doc in enumerate(toks):
        pos = {}
        for t, p in doc:
            pos.setdefault(t, []).append(p)
        a, b = pos.get("tok0", []), set(pos.get("tok1", []))
        pf = sum(1 for p in a if p + 1 in b)
        if pf:
            total = 0.0
            for t in ("tok0", "tok1"):
                ttf = sum(c.get(t, 0) for c in tf)
                p_c = (ttf + 1.0) / (sttf + 1.0)
                comp = math.log1p(pf / (MU * p_c)) \
                    + math.log(MU / (lens[d] + MU))
                total += max(comp, 0.0)
            exp[d] = total
    got = {r["doc_id"]: r["score"] for r in
           s.search_df(PhraseQuery(("tok0", "tok1")), k=None).collect()}
    assert set(got) == set(exp) and got
    for d in got:
        assert got[d] == pytest.approx(exp[d], rel=1e-12, abs=1e-12), d


def test_lmd_synonym_merged_stats(lmd):
    """SynonymQuery under LMD: per-doc freq summed, ttf merged by SUM
    (SynonymQuery.java:212-228) -> one pseudo-term score."""
    s, toks = lmd
    tf = [Counter(t for t, _ in doc) for doc in toks]
    lens = [len(doc) for doc in toks]
    sttf = sum(lens)
    ttf = sum(c.get("tok0", 0) + c.get("tok1", 0) for c in tf)
    p = (ttf + 1.0) / (sttf + 1.0)
    exp = {}
    for d, c in enumerate(tf):
        f = c.get("tok0", 0) + c.get("tok1", 0)
        if f:
            exp[d] = max(math.log1p(f / (MU * p))
                         + math.log(MU / (lens[d] + MU)), 0.0)
    got = {r["doc_id"]: r["score"] for r in
           s.search_df(SynonymQuery(("tok0", "tok1")), k=None).collect()}
    assert set(got) == set(exp) and got
    for d in got:
        assert got[d] == pytest.approx(exp[d], rel=1e-12, abs=1e-12), d


def test_lmd_explain_matches_search(lmd):
    s, _ = lmd
    rows = s.search_df("tok0 tok5", k=5).collect()
    assert rows
    for r in rows:
        ex = s.explain("tok0 tok5", r["doc_id"])
        assert ex["value"] == pytest.approx(r["score"], rel=1e-12)


def test_boolean_similarity_scores(boolsim):
    """BooleanSimilarity: every matching clause contributes exactly its
    boost — freq and length are ignored."""
    s, toks = boolsim
    has = [set(t for t, _ in doc) for doc in toks]
    got = {r["doc_id"]: r["score"]
           for r in s.search_df("tok0 tok1", k=None).collect()}
    exp = {d: float(("tok0" in h) + ("tok1" in h))
           for d, h in enumerate(has) if ("tok0" in h) or ("tok1" in h)}
    assert got == exp and got
    # boost scales linearly
    got2 = {r["doc_id"]: r["score"]
            for r in s.search_df("tok0^2.5", k=None).collect()}
    exp2 = {d: 2.5 for d, h in enumerate(has) if "tok0" in h}
    assert got2 == exp2
    # phrase scores the boost, constant
    pg = {r["doc_id"]: r["score"] for r in
          s.search_df(PhraseQuery(("tok0", "tok1")), k=None).collect()}
    assert pg and all(v == 1.0 for v in pg.values())
    # explain parity
    d0 = next(iter(got))
    assert s.explain("tok0 tok1", d0)["value"] == \
        pytest.approx(got[d0], rel=1e-12)


def test_similarity_override_at_search_time(lmd, boolsim):
    """IndexSearcher(reader, similarity=...) — the setSimilarity
    analog: the double similarities share exact32 norms, so an index
    built with lm_dirichlet_double serves boolean_double queries with
    scores identical to a natively-built boolean index; crossing into
    byte4 (bm25_float32) raises."""
    s_lmd, _ = lmd
    s_bool, _ = boolsim
    import pytest as _pt

    from lucene_1_spark.search import IndexSearcher
    over = IndexSearcher(s_lmd.reader, similarity="boolean_double")
    a = [(r["doc_id"], r["score"])
         for r in over.search_df("tok0 tok1", k=None)
         .orderBy("doc_id").collect()]
    b = [(r["doc_id"], r["score"])
         for r in s_bool.search_df("tok0 tok1", k=None)
         .orderBy("doc_id").collect()]
    assert a == b and a
    with _pt.raises(ValueError, match="norms encodings differ"):
        IndexSearcher(s_lmd.reader, similarity="bm25_float32")


def test_unknown_similarity_rejected(spark, tmp_root, lmd):
    s, _ = lmd
    s.reader.cfg["similarity"] = "nope_double"
    try:
        with pytest.raises(ValueError, match="unknown similarity"):
            IndexSearcher(s.reader)
    finally:
        s.reader.cfg["similarity"] = "lm_dirichlet_double"
