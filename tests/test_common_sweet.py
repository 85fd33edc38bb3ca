"""Round-7 batch 3: SweetSpotSimilarity (``misc/SweetSpotSimilarity
.java``) and CommonTermsQuery (``queries/CommonTermsQuery.java``) —
engine scores vs brute-force python / reference-shaped expectations
over the same corpus."""

import math
import os
from collections import Counter

import pytest

from lucene_1_spark import corpus as corpus_mod
from lucene_1_spark.analysis import get_analyzer
from lucene_1_spark.index import IndexBuilder, IndexReader
from lucene_1_spark.index.builder import IndexConfig
from lucene_1_spark.search import (BooleanQuery, Clause, CommonTermsQuery,
                                   IndexSearcher, Occur, TermQuery)
from lucene_1_spark.search.query import PhraseQuery

SS_PARAMS = {"ss_ln_min": 3, "ss_ln_max": 9, "ss_steep": 0.5,
             "ss_tf_base": 1.0, "ss_tf_min": 2.0}


@pytest.fixture(scope="module")
def built(spark, tmp_root):
    pdf = corpus_mod.generate(150)
    d = os.path.join(tmp_root, "idx_common_sweet")
    IndexBuilder(spark, d, IndexConfig(
        similarity="sweet_spot_double", n_buckets=4, n_doc_partitions=4,
        positions=True)).build(
        spark.createDataFrame(pdf).repartition(4, "repo"))
    an = get_analyzer("standard")
    ordered = pdf.sort_values(["repo", "path", "commit"],
                              kind="mergesort").reset_index(drop=True)
    toks = [an.tokens(c) for c in ordered["content"]]
    reader = IndexReader(spark, d)
    return reader, toks


def _sweet_brute(toks, terms, p=None):
    """{doc_id: score} for an OR query under SweetSpotSimilarity."""
    p = p or SS_PARAMS
    lmin, lmax = float(p["ss_ln_min"]), float(p["ss_ln_max"])
    steep = float(p["ss_steep"])
    tbase, tmin = float(p["ss_tf_base"]), float(p["ss_tf_min"])
    tf = [Counter(doc) for doc in toks]
    lens = [len(doc) for doc in toks]
    n_docs = len(toks)
    out = {}
    for term in set(terms):
        df = sum(1 for c in tf if term in c)
        if df == 0:
            continue
        w = (math.log((n_docs + 1.0) / (df + 1.0)) + 1.0) ** 2
        for d, c in enumerate(tf):
            f = c.get(term)
            if not f:
                continue
            t = tbase if f <= tmin else math.sqrt(f + tbase ** 2 - tmin)
            ln = float(lens[d])
            norm = 1.0 / math.sqrt(
                steep * (abs(ln - lmin) + abs(ln - lmax)
                         - (lmax - lmin)) + 1.0)
            out[d] = out.get(d, 0.0) + w * t * norm
    return out


# ------------------------------------------------------------ sweet spot

def test_sweet_spot_matches_bruteforce(built):
    reader, toks = built
    s = IndexSearcher(reader, sim_params=SS_PARAMS)
    for q, terms in [("tok1", ["tok1"]),
                     ("tok0 tok5 tok123", ["tok0", "tok5", "tok123"])]:
        exp = _sweet_brute(toks, terms)
        got = {r["doc_id"]: r["score"]
               for r in s.search_df(q, k=None).collect()}
        assert set(got) == set(exp) and got
        for d in got:
            assert got[d] == pytest.approx(exp[d], rel=1e-12,
                                           abs=1e-12), (q, d)


def test_sweet_spot_defaults_degrade_to_classic(built):
    """min=max=1, steep=0.5, base=min=0 is EXACTLY ClassicSimilarity
    (the reference's documented degradation) — same scores to the last
    ULP (reciprocal-multiply vs divide) under the searcher-level
    similarity override."""
    reader, _ = built
    sweet = IndexSearcher(reader)                 # built-in defaults
    classic = IndexSearcher(reader, similarity="classic_double")
    a = {r["doc_id"]: r["score"]
         for r in sweet.search_df("tok0 tok3", k=None).collect()}
    b = {r["doc_id"]: r["score"]
         for r in classic.search_df("tok0 tok3", k=None).collect()}
    assert set(a) == set(b) and a
    for d in a:
        assert a[d] == pytest.approx(b[d], rel=1e-14), d


def test_sweet_spot_plateau_is_flat(built):
    """Docs whose length is inside [ln_min, ln_max] get lengthNorm
    exactly 1.0: their single-occurrence score equals the raw
    weight * baselineTf."""
    reader, toks = built
    s = IndexSearcher(reader, sim_params=SS_PARAMS)
    lens = [len(doc) for doc in toks]
    term = "tok0"
    tf = [Counter(doc) for doc in toks]
    df = sum(1 for c in tf if term in c)
    w = (math.log((len(toks) + 1.0) / (df + 1.0)) + 1.0) ** 2
    got = {r["doc_id"]: r["score"]
           for r in s.search_df(term, k=None).collect()}
    plateau = [d for d in got
               if SS_PARAMS["ss_ln_min"] <= lens[d] <= SS_PARAMS["ss_ln_max"]]
    assert plateau, "fixture needs docs inside the plateau"
    for d in plateau:
        f = tf[d][term]
        t = (SS_PARAMS["ss_tf_base"] if f <= SS_PARAMS["ss_tf_min"]
             else math.sqrt(f + SS_PARAMS["ss_tf_base"] ** 2
                            - SS_PARAMS["ss_tf_min"]))
        assert got[d] == pytest.approx(w * t, rel=1e-12)


def test_sweet_spot_phrase(built):
    """Phrase scoring under SweetSpot exercises the codegen'd column
    branch: tf = baselineTf(phrase_freq), norm = plateau(len)."""
    reader, toks = built
    s = IndexSearcher(reader, sim_params=SS_PARAMS)
    an = get_analyzer("standard")
    # find a phrase that occurs somewhere: first adjacent pair of doc 0
    pairs = Counter()
    for doc in toks:
        for a, b in zip(doc, doc[1:]):
            pairs[(a, b)] += 1
    (w1, w2), _ = pairs.most_common(1)[0]
    got = {r["doc_id"]: r["score"]
           for r in s.search_df(PhraseQuery((w1, w2)), k=None).collect()}
    assert got
    # brute: idf^2 weight summed over BOTH phrase terms, baselineTf of
    # the exact-phrase count, plateau norm
    n_docs = len(toks)
    tf = [Counter(doc) for doc in toks]
    w = 0.0
    for term in (w1, w2):
        df = sum(1 for c in tf if term in c)
        w += math.log((n_docs + 1.0) / (df + 1.0)) + 1.0
    w = w ** 2
    p = SS_PARAMS
    for d, doc in enumerate(toks):
        pf = sum(1 for a, b in zip(doc, doc[1:]) if (a, b) == (w1, w2))
        if pf == 0:
            assert d not in got
            continue
        t = (p["ss_tf_base"] if pf <= p["ss_tf_min"]
             else math.sqrt(pf + p["ss_tf_base"] ** 2 - p["ss_tf_min"]))
        ln = float(len(doc))
        norm = 1.0 / math.sqrt(
            p["ss_steep"] * (abs(ln - p["ss_ln_min"])
                             + abs(ln - p["ss_ln_max"])
                             - (p["ss_ln_max"] - p["ss_ln_min"])) + 1.0)
        assert got[d] == pytest.approx(w * t * norm, rel=1e-12), d


# ----------------------------------------------------- common terms query

@pytest.fixture(scope="module")
def cterms(built):
    """(searcher, toks, dfs, high_term, low_terms, cutoff_frac): a
    fractional cutoff that puts exactly the most frequent query term in
    the high group."""
    reader, toks = built
    s = IndexSearcher(reader)
    dfs = Counter()
    for doc in toks:
        dfs.update(set(doc))
    ranked = [t for t, _ in dfs.most_common()]
    high_term = ranked[0]
    low_terms = [t for t in ranked if 3 <= dfs[t] < dfs[high_term] * 0.5][:2]
    assert len(low_terms) == 2, "fixture needs midfreq terms"
    # cutoff between the low terms' dfs and the high term's df
    cut = (max(dfs[t] for t in low_terms) + 0.5) / len(toks)
    assert math.ceil(cut * len(toks)) < dfs[high_term]
    return s, toks, dfs, high_term, low_terms, cut


def test_common_terms_split_and_scores(cterms):
    """Default SHOULD/SHOULD with both groups non-empty: match set =
    docs containing >=1 LOW term; scores equal the reference-shaped
    expected boolean tree run through the same engine."""
    s, toks, dfs, high, low, cut = cterms
    q = CommonTermsQuery(tuple([high] + low), max_term_frequency=cut)
    got = {r["doc_id"]: r["score"]
           for r in s.search_df(q, k=None).collect()}
    exp_docs = {d for d, doc in enumerate(toks)
                if set(low) & set(doc)}
    assert set(got) == exp_docs and got
    expected_tree = BooleanQuery((
        Clause(BooleanQuery(tuple(Clause(TermQuery(t), Occur.SHOULD)
                                  for t in low)), Occur.MUST),
        Clause(BooleanQuery((Clause(TermQuery(high), Occur.SHOULD),)),
               Occur.SHOULD)))
    ref = {r["doc_id"]: r["score"]
           for r in s.search_df(expected_tree, k=None).collect()}
    assert got == ref


def test_common_terms_all_high_promotes_to_conjunction(cterms):
    """No low terms -> the high group becomes a conjunction
    (CommonTermsQuery.java:178-183)."""
    s, toks, dfs, high, low, _ = cterms
    second = max((t for t in dfs if t != high), key=lambda t: dfs[t])
    q = CommonTermsQuery((high, second), max_term_frequency=2.0 / len(toks))
    got = {r["doc_id"] for r in s.search_df(q, k=None).collect()}
    exp = {d for d, doc in enumerate(toks)
           if high in doc and second in doc}
    assert got == exp and got


def test_common_terms_absolute_cutoff(cterms):
    """max_term_frequency >= 1 is an absolute df bound."""
    s, toks, dfs, high, low, _ = cterms
    q = CommonTermsQuery(tuple([high] + low),
                         max_term_frequency=float(max(dfs[t] for t in low)))
    got = {r["doc_id"] for r in s.search_df(q, k=None).collect()}
    exp = {d for d, doc in enumerate(toks) if set(low) & set(doc)}
    assert got == exp


def test_common_terms_low_must_and_msm(cterms):
    """low_freq_occur=MUST requires ALL low terms; fractional msm
    rounds against the optional count (minNrShouldMatch encoding)."""
    s, toks, dfs, high, low, cut = cterms
    q = CommonTermsQuery(tuple([high] + low), max_term_frequency=cut,
                         low_freq_occur=Occur.MUST)
    got = {r["doc_id"] for r in s.search_df(q, k=None).collect()}
    exp = {d for d, doc in enumerate(toks)
           if all(t in doc for t in low)}
    assert got == exp
    # fractional msm: 0.9 over 2 optional low terms -> round(1.8) = 2
    q2 = CommonTermsQuery(tuple([high] + low), max_term_frequency=cut,
                          low_freq_msm=0.9)
    got2 = {r["doc_id"] for r in s.search_df(q2, k=None).collect()}
    assert got2 == exp


def test_common_terms_must_not_rejected():
    with pytest.raises(ValueError):
        CommonTermsQuery(("a",), low_freq_occur=Occur.MUST_NOT)
