"""MoreLikeThis term selection / query building
(``queries/mlt/MoreLikeThis.java:121-180,733-800``) and
DirectSpellChecker suggestions
(``search/spell/DirectSpellChecker.java:63-74,478-497``) — brute-force
checked against a pure-Python recount of the same corpus."""

import math
import os
from collections import Counter

import pytest

from lucene_1_spark import corpus as corpus_mod
from lucene_1_spark.index import IndexBuilder, IndexReader
from lucene_1_spark.index.builder import IndexConfig
from lucene_1_spark.search import IndexSearcher
from lucene_1_spark.search.morelikethis import (interesting_terms,
                                                more_like_this_query)
from lucene_1_spark.search.query import (BooleanQuery, MatchNoDocsQuery,
                                         TermQuery)
from lucene_1_spark.search.spell import suggest_similar


@pytest.fixture(scope="module")
def ctx(spark, tmp_root):
    pdf = corpus_mod.t_small()
    d = os.path.join(tmp_root, "idx_mlt")
    src = spark.createDataFrame(pdf).repartition(8, "repo")
    IndexBuilder(spark, d, IndexConfig(n_buckets=8,
                                       n_doc_partitions=8)).build(src)
    return IndexSearcher(IndexReader(spark, d)), pdf


def _brute_stats(pdf):
    # tokenization through the SAME analyzer (edge docs in t_small
    # contain punctuation/overlong tokens where a naive split diverges);
    # tf/df/ranking math stays independently recomputed
    from lucene_1_spark.analysis import get_analyzer
    an = get_analyzer("standard")
    tf_by_doc, df = {}, Counter()
    for _, row in pdf.iterrows():
        toks = an.tokens(row["content"])
        key = f"{row['repo']}/{row['path']}@{row['commit']}"
        tf_by_doc[key] = Counter(toks)
        df.update(set(toks))
    return tf_by_doc, df


# ---------------------------------------------------------------------------
# MoreLikeThis
# ---------------------------------------------------------------------------

def test_interesting_terms_match_brute_force(ctx):
    se, pdf = ctx
    text = pdf.iloc[0]["content"]
    tf_by_doc, df = _brute_stats(pdf)
    # idf uses the index's docCount (empty edge docs aren't indexed, so
    # it can be < len(pdf)) — same source MoreLikeThis.java reads via
    # IndexReader.numDocs()
    n = se.doc_count
    got = interesting_terms(se, text, max_query_terms=10,
                            min_term_freq=2, min_doc_freq=3)
    from lucene_1_spark.analysis import get_analyzer
    tf = Counter(get_analyzer("standard").tokens(text))
    want = []
    for t, f in tf.items():
        if f < 2 or df[t] < 3:
            continue
        want.append((t, f * (math.log((n + 1) / (df[t] + 1)) + 1), df[t]))
    want.sort(key=lambda r: (-r[1], r[0]))
    want = want[:10]
    assert [w[0] for w in want] == [g[0] for g in got]
    for w, g in zip(want, got):
        assert math.isclose(w[1], g[1], rel_tol=1e-9)
        assert w[2] == g[2]


def test_mlt_query_runs_and_finds_similar_docs(ctx):
    se, pdf = ctx
    text = pdf.iloc[0]["content"]
    q = more_like_this_query(se, text, max_query_terms=8,
                             min_term_freq=2, min_doc_freq=3)
    assert isinstance(q, BooleanQuery)
    hits = se.search_df(q, k=5).collect()
    assert len(hits) == 5
    # the seed document itself should be among the best matches
    top_ids = {h["doc_id"] for h in hits}
    docs = se.reader.docs()
    seed = docs.filter(
        (docs["repo"] == pdf.iloc[0]["repo"])
        & (docs["path"] == pdf.iloc[0]["path"])).collect()
    assert len(seed) == 1
    assert seed[0]["doc_id"] in top_ids


def test_mlt_boost_mode_scales_by_best(ctx):
    se, pdf = ctx
    text = pdf.iloc[0]["content"]
    rows = interesting_terms(se, text, max_query_terms=5,
                             min_term_freq=2, min_doc_freq=3)
    q = more_like_this_query(se, text, boost=True, max_query_terms=5,
                             min_term_freq=2, min_doc_freq=3)
    best = rows[0][1]
    boosts = {c.query.term: c.query.boost for c in q.clauses}
    for t, sc, _ in rows:
        assert math.isclose(boosts[t], sc / best, rel_tol=1e-12)
    assert math.isclose(max(boosts.values()), 1.0)


def test_mlt_empty_text_is_match_none(ctx):
    se, _ = ctx
    assert isinstance(more_like_this_query(se, ""), MatchNoDocsQuery)
    assert isinstance(more_like_this_query(se, None), MatchNoDocsQuery)
    # all terms filtered out by an impossible threshold
    assert isinstance(
        more_like_this_query(se, "tok0 tok0", min_term_freq=99),
        MatchNoDocsQuery)


# ---------------------------------------------------------------------------
# DirectSpellChecker
# ---------------------------------------------------------------------------

def _lev(a, b):
    m, n = len(a), len(b)
    dp = list(range(n + 1))
    for i in range(1, m + 1):
        prev, dp[0] = dp[0], i
        for j in range(1, n + 1):
            cur = dp[j]
            dp[j] = min(dp[j] + 1, dp[j - 1] + 1,
                        prev + (a[i - 1] != b[j - 1]))
            prev = cur
    return dp[n]


def test_spell_suggestions_match_brute_force(ctx):
    se, pdf = ctx
    _, df = _brute_stats(pdf)
    query = "tok00"  # misspelling of tok0 / tok10 / ...
    got = suggest_similar(se, query, num_suggestions=5,
                          max_edits=2, prefix_length=1).collect()
    want = []
    for t, d in df.items():
        if t == query or not t.startswith("t"):
            continue
        dist = _lev(t, query)
        if dist <= 2:
            want.append((round(1.0 - dist / min(len(t), len(query)), 6),
                         d, t))
    want.sort(key=lambda r: (-r[0], -r[1], r[2]))
    want = want[:5]
    assert [(w[2], w[1], w[0]) for w in want] == \
        [(g["suggestion"], g["doc_freq"], g["similarity"]) for g in got]
    assert [g["rank"] for g in got] == list(range(1, len(want) + 1))


def test_spell_excludes_exact_and_respects_prefix(ctx):
    se, _ = ctx
    got = suggest_similar(se, "tok1", num_suggestions=20,
                          max_edits=1, prefix_length=3).collect()
    assert all(g["suggestion"] != "tok1" for g in got)
    assert all(g["suggestion"].startswith("tok") for g in got)
    assert all(1.0 - g["similarity"] <= 1 / 4 + 1e-9 for g in got)


def test_spell_max_edits_guard(ctx):
    se, _ = ctx
    with pytest.raises(ValueError):
        suggest_similar(se, "tok1", max_edits=3)
