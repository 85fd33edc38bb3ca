"""Round-7 pluggable similarities — LMJelinekMercer, DFR, IB,
AxiomaticF2EXP (``search/similarities/LMJelinekMercerSimilarity.java``,
``DFRSimilarity.java`` + BasicModel*/AfterEffect*/Normalization*,
``IBSimilarity.java`` + Distribution*/Lambda*, ``AxiomaticF2EXP.java``):
engine scores vs brute-force python over the same corpus, all served
from ONE exact32-norms index via the searcher-level override."""

import math
import os
from collections import Counter

import pytest

from lucene_1_spark import corpus as corpus_mod
from lucene_1_spark.analysis import get_analyzer
from lucene_1_spark.index import IndexBuilder, IndexReader
from lucene_1_spark.search import IndexSearcher
from lucene_1_spark.index.builder import IndexConfig

LAM_JM = 0.1


@pytest.fixture(scope="module")
def base(spark, tmp_root):
    pdf = corpus_mod.generate(150)
    d = os.path.join(tmp_root, "idx_sims_r7")
    IndexBuilder(spark, d, IndexConfig(
        similarity="bm25_double", n_buckets=4, n_doc_partitions=4,
        positions=True)).build(
        spark.createDataFrame(pdf).repartition(4, "repo"))
    an = get_analyzer("standard")
    ordered = pdf.sort_values(["repo", "path", "commit"],
                              kind="mergesort").reset_index(drop=True)
    toks = [an.tokens_with_positions(c) for c in ordered["content"]]
    reader = IndexReader(spark, d)
    return reader, toks


def _stats(toks):
    tf = [Counter(t for t, _ in doc) for doc in toks]
    lens = [len(doc) for doc in toks]
    N = len(toks)
    avgdl = sum(lens) / N
    return tf, lens, N, avgdl


def _tfn(f, ln, avgdl, c=1.0, norm="h2"):
    if norm == "h1":
        return c * f * avgdl / max(ln, 1)
    return f * math.log2(1.0 + c * avgdl / max(ln, 1))


def _check(searcher, exp, q):
    got = {r["doc_id"]: r["score"]
           for r in searcher.search_df(q, k=None).collect()}
    assert set(got) == set(exp) and got
    for d in got:
        assert got[d] == pytest.approx(exp[d], rel=1e-12, abs=1e-12), d


def test_lmjm_matches_bruteforce(base):
    reader, toks = base
    s = IndexSearcher(reader, similarity="lm_jelinek_mercer_double")
    tf, lens, N, _ = _stats(toks)
    sttf = sum(lens)
    terms = ["tok0", "tok5", "tok123"]
    exp = {}
    for term in terms:
        ttf = sum(c.get(term, 0) for c in tf)
        if ttf == 0:
            continue
        p = (ttf + 1.0) / (sttf + 1.0)
        for d, c in enumerate(tf):
            f = c.get(term)
            if f:
                sc = math.log1p((1 - LAM_JM) * f / max(lens[d], 1)
                                / (LAM_JM * p))
                exp[d] = exp.get(d, 0.0) + sc
    _check(s, exp, " ".join(terms))


@pytest.mark.parametrize("bm,ae,nrm", [
    ("if", "l", "h2"), ("in", "b", "h1"), ("ine", "l", "h2")])
def test_dfr_matches_bruteforce(base, bm, ae, nrm):
    reader, toks = base
    s = IndexSearcher(reader, similarity=f"dfr_{bm}_{ae}_{nrm}_double")
    tf, lens, N, avgdl = _stats(toks)
    terms = ["tok1", "tok7"]
    exp = {}
    for term in terms:
        n = sum(1 for c in tf if term in c)
        Fq = sum(c.get(term, 0) for c in tf)
        if n == 0:
            continue
        if bm == "if":
            a = math.log2(1 + (N + 1) / (Fq + 0.5))
        elif bm == "in":
            a = math.log2((N + 1) / (n + 0.5))
        else:
            ne = N * (1 - ((N - 1) / N) ** Fq)
            a = math.log2((N + 1) / (ne + 0.5))
        w = a * (1.0 if ae == "l" else (Fq + 1.0) / n)
        for d, c in enumerate(tf):
            f = c.get(term)
            if f:
                tfn = _tfn(f, lens[d], avgdl, 1.0, nrm)
                exp[d] = exp.get(d, 0.0) + w * tfn / (1 + tfn)
    _check(s, exp, " ".join(terms))


@pytest.mark.parametrize("dist,lk", [("ll", "df"), ("spl", "ttf")])
def test_ib_matches_bruteforce(base, dist, lk):
    reader, toks = base
    s = IndexSearcher(reader, similarity=f"ib_{dist}_{lk}_h2_double")
    tf, lens, N, avgdl = _stats(toks)
    terms = ["tok2", "tok11"]
    exp = {}
    for term in terms:
        n = sum(1 for c in tf if term in c)
        Fq = sum(c.get(term, 0) for c in tf)
        if n == 0:
            continue
        lam = ((n if lk == "df" else Fq) + 1.0) / (N + 1.0)
        lam = min(max(lam, 1e-12), 1 - 1e-9)
        for d, c in enumerate(tf):
            f = c.get(term)
            if f:
                tfn = _tfn(f, lens[d], avgdl)
                if dist == "ll":
                    sc = math.log1p(tfn / lam)
                else:
                    # same cancellation-stable algebra as the kernel
                    eps = 1 - lam
                    x = tfn / (tfn + 1)
                    sc = -math.log(
                        (math.expm1(x * math.log1p(-eps)) + eps) / eps)
                exp[d] = exp.get(d, 0.0) + sc
    _check(s, exp, " ".join(terms))


def test_axiomatic_matches_bruteforce(base):
    reader, toks = base
    s = IndexSearcher(reader, similarity="axiomatic_f2exp_double")
    tf, lens, N, avgdl = _stats(toks)
    K, S = 0.35, 0.5
    terms = ["tok0", "tok9"]
    exp = {}
    for term in terms:
        n = sum(1 for c in tf if term in c)
        if n == 0:
            continue
        w = ((N + 1.0) / n) ** K
        for d, c in enumerate(tf):
            f = c.get(term)
            if f:
                sc = w * f / (f + S + S * lens[d] / avgdl)
                exp[d] = exp.get(d, 0.0) + sc
    _check(s, exp, " ".join(terms))


def test_axiomatic_pruned_topk_matches_exhaustive(base):
    """F2EXP reuses the BM25 block-max pruning (same functional form,
    k1=2s, b=0.5): pruned top-10 == exhaustive top-10."""
    reader, _ = base
    s = IndexSearcher(reader, similarity="axiomatic_f2exp_double")
    q = "tok0 tok1 tok2"
    pruned = [(r["doc_id"], r["score"])
              for r in s.search_df(q, k=10, prune=True).collect()]
    allr = sorted(((r["doc_id"], r["score"])
                   for r in s.search_df(q, k=None).collect()),
                  key=lambda x: (-x[1], x[0]))[:10]
    assert pruned == allr


def test_new_sims_phrase_and_synonym_and_explain(base):
    """Phrase (MultiSimScorer sum at the shared phrase freq), synonym
    (merged stats) and explain() totals under the new similarities."""
    from lucene_1_spark.search.query import PhraseQuery, SynonymQuery
    reader, toks = base
    for sim in ("lm_jelinek_mercer_double", "dfr_if_l_h2_double",
                "ib_ll_df_h2_double", "axiomatic_f2exp_double"):
        s = IndexSearcher(reader, similarity=sim)
        for q in (PhraseQuery(("tok0", "tok1")),
                  SynonymQuery(("tok3", "tok4"))):
            rows = s.search_df(q, k=5).collect()
            for r in rows:
                assert r["score"] > 0.0
        # explain totals equal search_df scores on a term query
        top = s.search_df("tok0 tok5", k=3).collect()
        for r in top:
            e = s.explain("tok0 tok5", r["doc_id"])
            assert e["value"] == pytest.approx(r["score"], rel=1e-9)


@pytest.mark.parametrize("meas,fn", [
    ("chi2", lambda f, e: (f - e) * (f - e) / e),
    ("sat", lambda f, e: (f - e) / e),
    ("std", lambda f, e: (f - e) / math.sqrt(e)),
])
def test_dfi_matches_bruteforce(base, meas, fn):
    """DFISimilarity.java:58-69 with the three Independence measures:
    expected = (F+1) * dl / (T+1); freq <= expected scores 0, else
    boost * log2(measure + 1)."""
    reader, toks = base
    s = IndexSearcher(reader, similarity=f"dfi_{meas}_double")
    tf, lens, N, _ = _stats(toks)
    sttf = sum(lens)
    terms = ["tok0", "tok3", "tok42"]
    exp = {}
    for term in terms:
        ttf = sum(c.get(term, 0) for c in tf)
        if ttf == 0:
            continue
        rate = (ttf + 1.0) / (sttf + 1.0)
        for d, c in enumerate(tf):
            f = c.get(term)
            if f:
                e = rate * lens[d]
                sc = math.log2(fn(f, e) + 1.0) if f > e else 0.0
                exp[d] = exp.get(d, 0.0) + sc
    # freq <= expected keeps the doc as a MATCH at score 0 (the
    # reference's "return zero", not a non-match) — keep zeros
    _check(s, exp, " ".join(terms))


def test_dfi_phrase_synonym_explain(base):
    from lucene_1_spark.search.query import PhraseQuery, SynonymQuery
    reader, toks = base
    s = IndexSearcher(reader, similarity="dfi_chi2_double")
    for q in (PhraseQuery(("tok0", "tok1")), SynonymQuery(("tok3", "tok4"))):
        rows = s.search_df(q, k=5).collect()
        # DFI legitimately scores 0 when freq <= expected — matches
        # stay matches; require well-formed non-negative scores
        assert rows
        for r in rows:
            assert r["score"] >= 0.0 and not math.isnan(r["score"])
    top = s.search_df("tok0 tok5", k=3).collect()
    for r in top:
        e = s.explain("tok0 tok5", r["doc_id"])
        assert e["value"] == pytest.approx(r["score"], rel=1e-9)


# ---------------------------------------------------------------------------
# Round-7 second half: the REST of the reference's pluggable-similarity
# registry — AxiomaticF1EXP/F1LOG/F2LOG/F3EXP/F3LOG (Axiomatic.java:96-105),
# IndriDirichletSimilarity.java:62-66, RawTFSimilarity.java:40-42,
# BasicModelG.java:36-50, NormalizationH3.java:48-51, NormalizationZ.java:49-51
# ---------------------------------------------------------------------------

AX_K, AX_S = 0.35, 0.5
NORM_MU, NORM_Z = 800.0, 0.30


def _ax_tf(f):
    return 1.0 + math.log(1.0 + math.log(f))


@pytest.mark.parametrize("var", ["exp", "log"])
def test_axiomatic_f1_matches_bruteforce(base, var):
    reader, toks = base
    s = IndexSearcher(reader, similarity=f"axiomatic_f1{var}_double")
    tf, lens, N, avgdl = _stats(toks)
    terms = ["tok0", "tok9"]
    exp = {}
    for term in terms:
        n = sum(1 for c in tf if term in c)
        if n == 0:
            continue
        idf = ((N + 1.0) / n) ** AX_K if var == "exp" \
            else math.log((N + 1.0) / n)
        for d, c in enumerate(tf):
            f = c.get(term)
            if f:
                sc = idf * _ax_tf(f) * (avgdl + AX_S) \
                    / (avgdl + lens[d] * AX_S)
                exp[d] = exp.get(d, 0.0) + sc
    _check(s, exp, " ".join(terms))


def test_axiomatic_f2log_matches_bruteforce_and_prunes(base):
    reader, toks = base
    s = IndexSearcher(reader, similarity="axiomatic_f2log_double")
    tf, lens, N, avgdl = _stats(toks)
    terms = ["tok0", "tok9"]
    exp = {}
    for term in terms:
        n = sum(1 for c in tf if term in c)
        if n == 0:
            continue
        w = math.log((N + 1.0) / n)
        for d, c in enumerate(tf):
            f = c.get(term)
            if f:
                exp[d] = exp.get(d, 0.0) + \
                    w * f / (f + AX_S + AX_S * lens[d] / avgdl)
    _check(s, exp, " ".join(terms))
    # F2LOG reuses BM25 block-max pruning like F2EXP
    q = "tok0 tok1 tok2"
    pruned = [(r["doc_id"], r["score"])
              for r in s.search_df(q, k=10, prune=True).collect()]
    allr = sorted(((r["doc_id"], r["score"])
                   for r in s.search_df(q, k=None).collect()),
                  key=lambda x: (-x[1], x[0]))[:10]
    assert pruned == allr


@pytest.mark.parametrize("var", ["exp", "log"])
def test_axiomatic_f3_matches_bruteforce(base, var):
    """F3's gamma = (docLen - queryLen)*s*queryLen/avgdl penalizes long
    docs; scores clamp at 0 per term (Axiomatic.java:104)."""
    reader, toks = base
    s = IndexSearcher(reader, similarity=f"axiomatic_f3{var}_double")
    qlen = 2
    s.ax_query_len = qlen
    tf, lens, N, avgdl = _stats(toks)
    terms = ["tok0", "tok9"]
    exp = {}
    for term in terms:
        n = sum(1 for c in tf if term in c)
        if n == 0:
            continue
        idf = ((N + 1.0) / n) ** AX_K if var == "exp" \
            else math.log((N + 1.0) / n)
        for d, c in enumerate(tf):
            f = c.get(term)
            if f:
                gamma = (lens[d] - qlen) * AX_S * qlen / avgdl
                sc = max(0.0, _ax_tf(f) * idf - gamma)
                exp[d] = exp.get(d, 0.0) + sc
    _check(s, exp, " ".join(terms))


def test_indri_dirichlet_matches_bruteforce(base):
    """Indri's scores are log-probabilities (always negative) with the
    UNSMOOTHED F/T collection model."""
    reader, toks = base
    s = IndexSearcher(reader, similarity="indri_dirichlet_double")
    tf, lens, N, _ = _stats(toks)
    sttf = sum(lens)
    mu = 2000.0
    terms = ["tok0", "tok5"]
    exp = {}
    for term in terms:
        ttf = sum(c.get(term, 0) for c in tf)
        if ttf == 0:
            continue
        p = ttf / sttf
        for d, c in enumerate(tf):
            f = c.get(term)
            if f:
                exp[d] = exp.get(d, 0.0) + \
                    math.log((f + mu * p) / (lens[d] + mu))
    _check(s, exp, " ".join(terms))
    assert all(v < 0 for v in exp.values())


def test_raw_tf_matches_bruteforce(base):
    reader, toks = base
    s = IndexSearcher(reader, similarity="raw_tf_double")
    tf, lens, N, _ = _stats(toks)
    terms = ["tok0", "tok3"]
    exp = {}
    for term in terms:
        for d, c in enumerate(tf):
            f = c.get(term)
            if f:
                exp[d] = exp.get(d, 0.0) + float(f)
    _check(s, exp, " ".join(terms))


def _tfn_full(f, ln, avgdl, norm, pivot=0.0):
    ln = max(ln, 1)
    if norm == "h1":
        return f * avgdl / ln
    if norm == "h2":
        return f * math.log2(1.0 + avgdl / ln)
    if norm == "h3":
        return NORM_MU * (f + NORM_MU * pivot) / (ln + NORM_MU)
    return f * (avgdl / ln) ** NORM_Z        # z


@pytest.mark.parametrize("ae,nrm", [("l", "h2"), ("b", "h1"),
                                    ("l", "z"), ("b", "h3")])
def test_dfr_g_matches_bruteforce(base, ae, nrm):
    """BasicModelG (geometric): score = aeT*(B - (B-A)/(1+tfn)) with
    lambda = F/(N+F), F = ttf+1 — affine in 1/(1+tfn), non-decreasing
    in tfn (BasicModelG.java:36-50)."""
    reader, toks = base
    s = IndexSearcher(reader, similarity=f"dfr_g_{ae}_{nrm}_double")
    tf, lens, N, avgdl = _stats(toks)
    sttf = sum(lens)
    terms = ["tok1", "tok7"]
    exp = {}
    for term in terms:
        n = sum(1 for c in tf if term in c)
        Fq = sum(c.get(term, 0) for c in tf)
        if n == 0:
            continue
        lam = (Fq + 1.0) / (N + Fq + 1.0)
        A = math.log2(lam + 1.0)
        B = math.log2((1.0 + lam) / lam)
        aeT = 1.0 if ae == "l" else (Fq + 1.0) / n
        pivot = (Fq + 1.0) / (sttf + 1.0)
        for d, c in enumerate(tf):
            f = c.get(term)
            if f:
                tfn = _tfn_full(f, lens[d], avgdl, nrm, pivot)
                exp[d] = exp.get(d, 0.0) + \
                    aeT * (B - (B - A) / (1.0 + tfn))
    _check(s, exp, " ".join(terms))


@pytest.mark.parametrize("bm,nrm", [("in", "h3"), ("ine", "z")])
def test_dfr_h3_z_norms_match_bruteforce(base, bm, nrm):
    reader, toks = base
    s = IndexSearcher(reader, similarity=f"dfr_{bm}_l_{nrm}_double")
    tf, lens, N, avgdl = _stats(toks)
    sttf = sum(lens)
    terms = ["tok2", "tok11"]
    exp = {}
    for term in terms:
        n = sum(1 for c in tf if term in c)
        Fq = sum(c.get(term, 0) for c in tf)
        if n == 0:
            continue
        if bm == "in":
            w = math.log2((N + 1) / (n + 0.5))
        else:
            ne = N * (1 - ((N - 1) / N) ** Fq)
            w = math.log2((N + 1) / (ne + 0.5))
        pivot = (Fq + 1.0) / (sttf + 1.0)
        for d, c in enumerate(tf):
            f = c.get(term)
            if f:
                tfn = _tfn_full(f, lens[d], avgdl, nrm, pivot)
                exp[d] = exp.get(d, 0.0) + w * tfn / (1 + tfn)
    _check(s, exp, " ".join(terms))


@pytest.mark.parametrize("dist,nrm", [("ll", "h3"), ("spl", "z")])
def test_ib_h3_z_norms_match_bruteforce(base, dist, nrm):
    reader, toks = base
    s = IndexSearcher(reader, similarity=f"ib_{dist}_df_{nrm}_double")
    tf, lens, N, avgdl = _stats(toks)
    sttf = sum(lens)
    terms = ["tok2", "tok11"]
    exp = {}
    for term in terms:
        n = sum(1 for c in tf if term in c)
        Fq = sum(c.get(term, 0) for c in tf)
        if n == 0:
            continue
        lam = min(max((n + 1.0) / (N + 1.0), 1e-12), 1 - 1e-9)
        pivot = (Fq + 1.0) / (sttf + 1.0)
        for d, c in enumerate(tf):
            f = c.get(term)
            if f:
                tfn = _tfn_full(f, lens[d], avgdl, nrm, pivot)
                if dist == "ll":
                    sc = math.log1p(tfn / lam)
                else:
                    eps = 1 - lam
                    x = tfn / (tfn + 1)
                    sc = -math.log(
                        (math.expm1(x * math.log1p(-eps)) + eps) / eps)
                exp[d] = exp.get(d, 0.0) + sc
    _check(s, exp, " ".join(terms))


def test_new_sims_phrase_synonym_explain_r7b(base):
    """Phrase + synonym + explain() consistency across the second-half
    similarities (every kind routes the same kernels)."""
    from lucene_1_spark.search.query import PhraseQuery, SynonymQuery
    reader, toks = base
    for sim in ("axiomatic_f1exp_double", "axiomatic_f2log_double",
                "axiomatic_f3log_double", "indri_dirichlet_double",
                "raw_tf_double", "dfr_g_b_h2_double",
                "dfr_in_l_h3_double", "ib_ll_df_h3_double",
                "ib_spl_ttf_z_double"):
        s = IndexSearcher(reader, similarity=sim)
        for q in (PhraseQuery(("tok0", "tok1")),
                  SynonymQuery(("tok3", "tok4"))):
            rows = s.search_df(q, k=5).collect()
            assert rows, sim
            for r in rows:
                assert not math.isnan(r["score"]), (sim, q)
        top = s.search_df("tok0 tok5", k=3).collect()
        for r in top:
            e = s.explain("tok0 tok5", r["doc_id"])
            assert e["value"] == pytest.approx(r["score"], rel=1e-9), sim


def test_phrase_scores_match_manual_for_new_sims(base):
    """Exact phrase-score parity for the non-factorable new kinds
    (indri / ax3 / dfr h3) — MultiSimScorer sums per-member scores of
    the SAME phrase freq."""
    from lucene_1_spark.search.query import PhraseQuery
    reader, toks = base
    tf, lens, N, avgdl = _stats(toks)
    sttf = sum(lens)
    pair = ("tok0", "tok1")
    # manual phrase freqs (exact, slop 0): count adjacent positions
    pf = {}
    for d, doc in enumerate(toks):
        pos0 = {p for t, p in doc if t == pair[0]}
        pos1 = {p for t, p in doc if t == pair[1]}
        n = sum(1 for p in pos0 if p + 1 in pos1)
        if n:
            pf[d] = float(n)
    assert pf

    def member_stats(term):
        n = sum(1 for c in tf if term in c)
        Fq = sum(c.get(term, 0) for c in tf)
        return n, Fq

    # indri
    s = IndexSearcher(reader, similarity="indri_dirichlet_double")
    exp = {}
    for d, f in pf.items():
        tot = 0.0
        for t in pair:
            _, Fq = member_stats(t)
            p = Fq / sttf
            tot += math.log((f + 2000.0 * p) / (lens[d] + 2000.0))
        exp[d] = tot
    got = {r["doc_id"]: r["score"]
           for r in s.search_df(PhraseQuery(pair), k=None).collect()}
    assert set(got) == set(exp)
    for d in got:
        assert got[d] == pytest.approx(exp[d], rel=1e-12), d

    # ax3 (exp variant, qlen=1 default)
    s = IndexSearcher(reader, similarity="axiomatic_f3exp_double")
    exp = {}
    for d, f in pf.items():
        tot = 0.0
        gamma = (lens[d] - 1) * AX_S * 1 / avgdl
        for t in pair:
            n, _ = member_stats(t)
            idf = ((N + 1.0) / n) ** AX_K
            tot += max(0.0, _ax_tf(f) * idf - gamma)
        exp[d] = tot
    got = {r["doc_id"]: r["score"]
           for r in s.search_df(PhraseQuery(pair), k=None).collect()}
    assert set(got) == set(exp)
    for d in got:
        assert got[d] == pytest.approx(exp[d], rel=1e-12), d

    # dfr_in_l_h3
    s = IndexSearcher(reader, similarity="dfr_in_l_h3_double")
    exp = {}
    for d, f in pf.items():
        tot = 0.0
        for t in pair:
            n, Fq = member_stats(t)
            w = math.log2((N + 1) / (n + 0.5))
            pivot = (Fq + 1.0) / (sttf + 1.0)
            tfn = _tfn_full(f, lens[d], avgdl, "h3", pivot)
            tot += w * tfn / (1 + tfn)
        exp[d] = tot
    got = {r["doc_id"]: r["score"]
           for r in s.search_df(PhraseQuery(pair), k=None).collect()}
    assert set(got) == set(exp)
    for d in got:
        assert got[d] == pytest.approx(exp[d], rel=1e-12), d
