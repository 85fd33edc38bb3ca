"""Round-2 operator semantics: FILTER (required, non-scoring), scored
multi-term queries (prefix/wildcard/fuzzy/range), sloppy phrase,
count() on all query types, MatchAll k=None, conjunction block pruning,
and sort-by-field."""

import os

import pytest
from pyspark.sql import functions as F

from lucene_1_spark import corpus as corpus_mod
from lucene_1_spark.index import IndexBuilder, IndexReader
from lucene_1_spark.index.builder import IndexConfig
from lucene_1_spark.search import IndexSearcher
from lucene_1_spark.search.query import (
    BooleanQuery, Clause, ConstantScoreQuery, FuzzyQuery,
    MatchAllDocsQuery, Occur, PhraseQuery, PrefixQuery, SynonymQuery,
    TermQuery, TermRangeQuery, WildcardQuery,
)


@pytest.fixture(scope="module")
def ops_index(spark, tmp_root):
    pdf = corpus_mod.t_small()
    d = os.path.join(tmp_root, "idx_ops")
    src = spark.createDataFrame(pdf).repartition(8, "repo")
    IndexBuilder(spark, d, IndexConfig(n_buckets=8, n_doc_partitions=8,
                                       positions=True)).build(src)
    return d, pdf


@pytest.fixture(scope="module")
def searcher(spark, ops_index):
    d, _ = ops_index
    return IndexSearcher(IndexReader(spark, d))


def _scores(df):
    return {r["doc_id"]: r["score"] for r in df.collect()}


# ---------------------------------------------------------------------------
# FILTER: required but NON-scoring (BooleanQuery.java:120-126)
# ---------------------------------------------------------------------------

def test_filter_clause_is_required_but_not_scored(searcher):
    q_filter = BooleanQuery((Clause(TermQuery("tok0"), Occur.MUST),
                             Clause(TermQuery("tok1"), Occur.FILTER)))
    q_must = BooleanQuery((Clause(TermQuery("tok0"), Occur.MUST),
                           Clause(TermQuery("tok1"), Occur.MUST)))
    got = _scores(searcher.search_df(q_filter, k=None))
    both = _scores(searcher.search_df(q_must, k=None))
    only_tok0 = _scores(searcher.search_df(TermQuery("tok0"), k=None))
    # same match set as the fully-scored conjunction ...
    assert set(got) == set(both)
    assert len(got) > 0
    for d, s in got.items():
        # ... but scored by tok0 alone (FILTER never contributes)
        assert s == only_tok0[d], d
        assert s < both[d], d


def test_filter_only_query_scores_zero(searcher):
    q = BooleanQuery((Clause(TermQuery("tok0"), Occur.FILTER),))
    got = _scores(searcher.search_df(q, k=None))
    assert set(got) == set(_scores(searcher.search_df(TermQuery("tok0"),
                                                      k=None)))
    assert all(s == 0.0 for s in got.values())


def test_should_with_filter(searcher):
    # SHOULD is optional when a FILTER is present; non-matching SHOULD
    # docs score 0 but still match the filter
    q = BooleanQuery((Clause(TermQuery("tok3"), Occur.SHOULD),
                      Clause(TermQuery("tok0"), Occur.FILTER)))
    got = _scores(searcher.search_df(q, k=None))
    tok0_docs = set(_scores(searcher.search_df(TermQuery("tok0"), k=None)))
    tok3 = _scores(searcher.search_df(TermQuery("tok3"), k=None))
    assert set(got) == tok0_docs
    for d, s in got.items():
        assert s == (tok3.get(d, 0.0)), d


# ---------------------------------------------------------------------------
# count() on every query type (regression: crashed on phrase/syn/const)
# ---------------------------------------------------------------------------

def test_count_all_query_types(searcher):
    n_phrase = searcher.count(PhraseQuery(("tok0", "tok1")))
    n_syn = searcher.count(SynonymQuery(("tok0", "tok1")))
    n_const = searcher.count(ConstantScoreQuery(TermQuery("tok0"), 2.0))
    n_term = searcher.count(TermQuery("tok0"))
    assert n_const == n_term > 0
    assert n_syn >= n_term
    assert 0 < n_phrase <= n_term


def test_field_exists_query(searcher):
    from lucene_1_spark.search.query import FieldExistsQuery
    n = searcher.search_df(FieldExistsQuery("lang"), k=None).count()
    assert n == searcher.reader.stats["n_docs"]
    top = searcher.search_df(FieldExistsQuery("lang", 2.0), k=3).collect()
    assert [r["score"] for r in top] == [2.0, 2.0, 2.0]


def test_match_all_k_none_and_facets(searcher):
    from lucene_1_spark.search.facets import facet_counts
    n = searcher.search_df(MatchAllDocsQuery(), k=None).count()
    assert n == searcher.reader.stats["n_docs"]
    fc = {r["value"]: r["n"]
          for r in facet_counts(searcher, MatchAllDocsQuery(), "lang").collect()}
    assert sum(fc.values()) == n


# ---------------------------------------------------------------------------
# scored multi-term queries (MultiTermQuery.java:86-119 rewrites)
# ---------------------------------------------------------------------------

def test_prefix_query_scored_equals_manual_disjunction(searcher):
    q = PrefixQuery("tok1")  # tok1, tok10..tok19, tok100..tok199 ...
    expanded = searcher.rewrite_multi_term(q)
    got = _scores(searcher.search_df(q, k=None))
    manual = _scores(searcher.search_df(expanded, k=None))
    assert got == manual and len(got) > 0


def test_prefix_query_composable_under_must(searcher):
    # +tok499* +tok0 — the multi-term expansion nested as a MUST group
    q = BooleanQuery((Clause(PrefixQuery("tok49"), Occur.MUST),
                      Clause(TermQuery("tok0"), Occur.MUST)))
    got = _scores(searcher.search_df(q, k=None))
    tok0 = _scores(searcher.search_df(TermQuery("tok0"), k=None))
    pref = _scores(searcher.search_df(PrefixQuery("tok49"), k=None))
    assert set(got) == set(tok0) & set(pref)
    for d, s in got.items():
        assert abs(s - (tok0[d] + pref[d])) <= 1e-3, d


def test_prefix_filter_group_not_scored(searcher):
    # FILTER(prefix) constrains but never scores
    q = BooleanQuery((Clause(TermQuery("tok0"), Occur.MUST),
                      Clause(PrefixQuery("tok49"), Occur.FILTER)))
    got = _scores(searcher.search_df(q, k=None))
    tok0 = _scores(searcher.search_df(TermQuery("tok0"), k=None))
    pref = set(_scores(searcher.search_df(PrefixQuery("tok49"), k=None)))
    assert set(got) == set(tok0) & pref
    for d, s in got.items():
        assert s == tok0[d], d


def test_wildcard_and_constant_score_rewrite(searcher):
    qs = WildcardQuery("tok4?")
    scored = _scores(searcher.search_df(qs, k=None))
    qc = WildcardQuery("tok4?", rewrite_method="constant_score")
    const = _scores(searcher.search_df(qc, k=None))
    assert set(scored) == set(const) and len(const) > 0
    assert all(s == 1.0 for s in const.values())


def test_fuzzy_query_similarity_boost(searcher):
    # 'tok1' within 1 edit: tok1 itself (boost 1.0) + tok0..tok9, tok11..
    q = FuzzyQuery("tok1", max_edits=1)
    expanded = searcher.rewrite_multi_term(q)
    terms = {c.query.term: c.query.boost for c in expanded.clauses}
    assert terms["tok1"] == 1.0
    assert 0.0 < terms["tok2"] < 1.0  # one edit away -> downweighted
    got = searcher.search_df(q, k=5).collect()
    assert len(got) == 5


def test_top_terms_rewrite_caps_expansion(searcher):
    q = PrefixQuery("tok", rewrite_method="top_terms_5")
    expanded = searcher.rewrite_multi_term(q)
    assert len(expanded.clauses) == 5


def test_term_range_constant_score(searcher):
    q = TermRangeQuery("tok10", "tok19", rewrite_method="constant_score")
    n = searcher.count(q)
    exp_terms = searcher.expand_terms(F.col("term").between("tok10", "tok19"))
    assert n == searcher.docs_for_terms(exp_terms).count() > 0


def test_multi_term_absent_expansion_is_no_docs(searcher):
    assert searcher.search_df(PrefixQuery("zzznope"), k=10).count() == 0


# ---------------------------------------------------------------------------
# sloppy phrase
# ---------------------------------------------------------------------------

@pytest.fixture(scope="module")
def slop_searcher(spark, tmp_root):
    rows = [
        ("r", "d1", "c", "x", "alpha beta"),          # exact, e=0
        ("r", "d2", "c", "x", "alpha gap beta"),      # e=1
        ("r", "d3", "c", "x", "beta alpha"),          # transposed, e=2
        ("r", "d4", "c", "x", "alpha gap gap beta"),  # e=2
        ("r", "d5", "c", "x", "beta gap alpha"),      # e=3
        ("r", "d6", "c", "x", "alpha only here"),
    ]
    src = spark.createDataFrame(rows, "repo string, path string, "
                                      "commit string, lang string, "
                                      "content string")
    d = os.path.join(tmp_root, "idx_slop")
    IndexBuilder(spark, d, IndexConfig(
        n_buckets=4, n_doc_partitions=2, positions=True,
        analyzer="whitespace", similarity="bm25_double")).build(src)
    return IndexSearcher(IndexReader(spark, d))


@pytest.mark.parametrize("slop,expected_paths", [
    (0, {"d1"}),
    (1, {"d1", "d2"}),
    (2, {"d1", "d2", "d3", "d4"}),
    (3, {"d1", "d2", "d3", "d4", "d5"}),
])
def test_sloppy_phrase_match_sets(slop_searcher, slop, expected_paths):
    q = PhraseQuery(("alpha", "beta"), slop=slop)
    hits = slop_searcher.search(q, k=10)
    assert {h["path"] for h in hits} == expected_paths
    if slop >= 1:
        # exact occurrence (weight 1) outranks displaced (weight 1/2)
        assert hits[0]["path"] == "d1"


@pytest.fixture(scope="module")
def slop3_searcher(spark, tmp_root):
    rows = [
        ("r", "e1", "c", "x", "one two three"),          # exact
        ("r", "e2", "c", "x", "one two gap three"),      # slot2 disp 1
        ("r", "e3", "c", "x", "one gap two gap three"),  # disps 1+2
        ("r", "e4", "c", "x", "three two one"),          # disps 2+4
        ("r", "e5", "c", "x", "one two only"),           # no 'three'
        ("r", "e6", "c", "x", "one two three one two three"),  # 2 anchors
    ]
    src = spark.createDataFrame(rows, "repo string, path string, "
                                      "commit string, lang string, "
                                      "content string")
    d = os.path.join(tmp_root, "idx_slop3")
    IndexBuilder(spark, d, IndexConfig(
        n_buckets=4, n_doc_partitions=2, positions=True,
        analyzer="whitespace", similarity="bm25_double")).build(src)
    return IndexSearcher(IndexReader(spark, d))


@pytest.mark.parametrize("slop,expected_paths", [
    (0, {"e1", "e6"}),
    (1, {"e1", "e2", "e6"}),
    (2, {"e1", "e2", "e3", "e6"}),
    (3, {"e1", "e2", "e3", "e6"}),
    (4, {"e1", "e2", "e3", "e4", "e6"}),
])
def test_sloppy_phrase_three_terms_match_sets(slop3_searcher, slop,
                                              expected_paths):
    """n>=3 sloppy phrase: anchored per-slot min-displacement semantics
    (documented deviation from SloppyPhraseMatcher's greedy walk)."""
    q = PhraseQuery(("one", "two", "three"), slop=slop)
    hits = slop3_searcher.search(q, k=10)
    assert {h["path"] for h in hits} == expected_paths
    if slop >= 1:
        # two exact anchors (pf=2) outrank one exact (pf=1) outranks
        # displaced matches (pf=1/2, 1/4, 1/7)
        ordered = [h["path"] for h in hits]
        assert ordered[:2] == ["e6", "e1"]
        assert ordered.index("e1") < ordered.index("e2")
        if slop >= 2:
            assert ordered.index("e2") < ordered.index("e3")
        if slop >= 4:
            assert ordered.index("e3") < ordered.index("e4")


@pytest.mark.parametrize("gaps,expected", [
    (0, {"e1": 1, "e6": 2}),
    (1, {"e1": 1, "e2": 1, "e6": 2}),
    (2, {"e1": 1, "e2": 1, "e3": 1, "e6": 2}),
])
def test_ordered_interval_counts_n_terms(slop3_searcher, gaps, expected):
    from lucene_1_spark.search.intervals import ordered_interval_counts
    out = ordered_interval_counts(slop3_searcher,
                                  ["one", "two", "three"], max_gaps=gaps)
    docs = slop3_searcher.reader.docs().select("doc_id", "path")
    got = {r["path"]: r["n_intervals"]
           for r in out.join(docs, "doc_id").collect()}
    assert got == expected


@pytest.mark.parametrize("gaps,expected", [
    # windows over (one,two,three): e1 [0,2]; e4 "three two one" [0,2]
    # (unordered!); e6 four overlapping minimal [i,i+2] windows
    (0, {"e1": 1, "e4": 1, "e6": 4}),
    (1, {"e1": 1, "e2": 1, "e4": 1, "e6": 4}),
    (2, {"e1": 1, "e2": 1, "e3": 1, "e4": 1, "e6": 4}),
])
def test_unordered_interval_counts_n_terms(slop3_searcher, gaps, expected):
    from lucene_1_spark.search.intervals import unordered_interval_counts
    out = unordered_interval_counts(slop3_searcher,
                                    ["one", "two", "three"], max_gaps=gaps)
    docs = slop3_searcher.reader.docs().select("doc_id", "path")
    got = {r["path"]: r["n_intervals"]
           for r in out.join(docs, "doc_id").collect()}
    assert got == expected


@pytest.mark.parametrize("mode,outer,inner,og,ig,expected", [
    # ordered(one..three) spans: e1 (0,2); e2 (0,3); e3 (0,4);
    # e6 (0,2) and (3,5)
    ("containing", ["one", "three"], ["two"], 3, 0,
     {"e1": 1, "e2": 1, "e3": 1, "e6": 2}),
    ("not_containing", ["one", "three"], ["gap"], 3, 0,
     {"e1": 1, "e6": 2}),              # e2 (0,3) holds gap@2; e3 too
    ("contained_by", ["two"], ["one", "three"], 0, 3,
     {"e1": 1, "e2": 1, "e3": 1, "e6": 2}),
])
def test_containment_combinators(slop3_searcher, mode, outer, inner,
                                 og, ig, expected):
    from lucene_1_spark.search.intervals import containment_counts
    out = containment_counts(slop3_searcher, outer, inner, mode,
                             outer_gaps=og, inner_gaps=ig)
    docs = slop3_searcher.reader.docs().select("doc_id", "path")
    got = {r["path"]: r["n_intervals"]
           for r in out.join(docs, "doc_id").collect()}
    assert got == expected


@pytest.mark.parametrize("mode,gaps,expected", [
    ("ordered", 0, {"d1": 1}),
    ("ordered", 2, {"d1": 1, "d2": 1, "d4": 1}),
    ("unordered", 0, {"d1": 1, "d3": 1}),
    ("unordered", 2, {"d1": 1, "d2": 1, "d3": 1, "d4": 1, "d5": 1}),
])
def test_interval_counts(slop_searcher, mode, gaps, expected):
    from lucene_1_spark.search.intervals import interval_counts
    out = interval_counts(slop_searcher, "alpha", "beta", mode, gaps)
    docs = slop_searcher.reader.docs().select("doc_id", "path")
    got = {r["path"]: r["n_intervals"]
           for r in out.join(docs, "doc_id").collect()}
    assert got == expected, (mode, gaps)


def test_sloppy_phrase_multi_term_runs(slop_searcher):
    # 3-term sloppy phrase is supported (anchored min-displacement);
    # "alpha beta gap" occurs contiguously only in d2/d4's texts
    hits = slop_searcher.search_df(
        PhraseQuery(("alpha", "gap", "beta"), slop=0), k=5).collect()
    assert len(hits) == 1  # d2: "alpha gap beta"


# ---------------------------------------------------------------------------
# conjunction block pruning (BlockMaxConjunctionBulkScorer analog)
# ---------------------------------------------------------------------------

def test_conjunction_pruning_decodes_fewer_blocks(searcher):
    # tok400+ are rare under zipf; tok0 is the hottest term
    rare = "tok499"
    stats = searcher.reader.term_statistics(["tok0", rare])
    if rare not in stats:
        pytest.skip("rare term absent from fixture corpus")
    blocks = searcher._blocks_for(["tok0", rare])
    pruned = searcher._prune_by_driver_ranges(blocks, rare)
    n_all, n_pruned = blocks.count(), pruned.count()
    assert n_pruned < n_all
    # and the pruned plan is results-identical
    q = BooleanQuery((Clause(TermQuery("tok0"), Occur.MUST),
                      Clause(TermQuery(rare), Occur.MUST)))
    a = [(r["doc_id"], r["score"])
         for r in searcher.search_df(q, k=20, prune=True).collect()]
    b = [(r["doc_id"], r["score"])
         for r in searcher.search_df(q, k=20, prune=False).collect()]
    assert a == b


def test_conjunction_pruning_collect_is_capped(searcher, monkeypatch):
    """A hot driver term with more blocks than DRIVER_RANGE_CAP must
    NOT be pruned — and (the 100-TB fix) the metadata collect itself
    is limited to CAP+1 rows, never the full block list."""
    blocks = searcher._blocks_for(["tok0"])
    n0 = blocks.filter(F.col("term") == "tok0").count()
    assert n0 > 2  # fixture sanity
    monkeypatch.setattr(type(searcher), "DRIVER_RANGE_CAP", n0 - 1)
    out = searcher._prune_by_driver_ranges(blocks, "tok0")
    assert out is blocks  # declined: driver term too hot to prune
    # and the collect path is capped: a limit(CAP+1) precedes it, so
    # even a pathologically hot term transfers at most CAP+1 rows
    capped = (blocks.filter(F.col("term") == "tok0")
              .select("first_doc", "last_doc")
              .limit(searcher.DRIVER_RANGE_CAP + 1).collect())
    assert len(capped) == searcher.DRIVER_RANGE_CAP + 1 < n0 + 1


# ---------------------------------------------------------------------------
# parent/child block join (lucene/join module analog)
# ---------------------------------------------------------------------------

def test_to_parent_and_child_join(searcher):
    from lucene_1_spark.search.joins import (search_parents, to_child_join,
                                             to_parent_join)
    hits = searcher.search_df("tok0 tok1", k=None)
    docs = searcher.reader.docs().select(
        "doc_id", F.col("repo").alias("parent_id"))
    # parent score == max child score per repo (ScoreMode.Max)
    parents = {r["parent_id"]: (r["score"], r["n_children"])
               for r in to_parent_join(hits, docs, "max").collect()}
    manual: dict = {}
    for r in hits.join(docs, "doc_id").collect():
        s, n = manual.get(r["parent_id"], (0.0, 0))
        manual[r["parent_id"]] = (max(s, r["score"]), n + 1)
    assert {k: (round(v[0], 5), v[1]) for k, v in parents.items()} \
        == {k: (round(v[0], 5), v[1]) for k, v in manual.items()}
    # total mode sums; none mode zeroes
    tot = {r["parent_id"]: r["score"]
           for r in to_parent_join(hits, docs, "total").collect()}
    assert all(tot[k] >= parents[k][0] for k in parents)
    none = to_parent_join(hits, docs, "none").collect()
    assert all(r["score"] == 0.0 for r in none)
    # child join fans parents back out to ALL their docs
    top_parent = search_parents(searcher, "tok0 tok1", "repo", "max", k=1)
    kids = to_child_join(
        top_parent.select(F.col("parent").alias("parent_id"), "score"),
        docs).count()
    n_in_repo = docs.filter(
        F.col("parent_id") == top_parent.collect()[0]["parent"]).count()
    assert kids == n_in_repo


# ---------------------------------------------------------------------------
# batched multi-query execution (one postings pass for many queries)
# ---------------------------------------------------------------------------

def test_search_many_parity(searcher):
    qs = {
        "q_term": "tok0",
        "q_and": "+tok0 +tok1",
        "q_mixed": "tok2 tok3 -tok0",
        "q_phrase": '"tok0 tok1"',        # falls back, unions in
        "q_msm": BooleanQuery(tuple(
            Clause(TermQuery(t), Occur.SHOULD)
            for t in ("tok0", "tok1", "tok2")), minimum_should_match=2),
        "q_filter": BooleanQuery((Clause(TermQuery("tok0"), Occur.MUST),
                                  Clause(TermQuery("tok1"), Occur.FILTER))),
        "q_absent": "+tok0 +zzz_definitely_absent",
    }
    batch = searcher.search_many(qs, k=10).collect()
    by_q: dict = {}
    for r in sorted(batch, key=lambda r: r["rank"]):
        by_q.setdefault(r["query_id"], []).append((r["doc_id"], r["score"]))
    for qid, q in qs.items():
        single = [(r["doc_id"], r["score"])
                  for r in searcher.search_df(q, k=10).collect()]
        assert by_q.get(qid, []) == single, qid


# ---------------------------------------------------------------------------
# highlighter + suggester (lucene/highlighter, lucene/suggest analogs)
# ---------------------------------------------------------------------------

def test_highlight_passages(spark, ops_index):
    from lucene_1_spark.search.highlight import highlight, query_terms
    from lucene_1_spark.search.query import parse_query
    _, pdf = ops_index
    texts = spark.createDataFrame(
        [(i, t) for i, t in enumerate(pdf["content"])],
        "doc_id long, text string")
    q = parse_query("tok0 tok1")
    assert query_terms(q) == {"tok0", "tok1"}
    out = highlight(texts, q, analyzer="standard").collect()
    assert out
    for r in out:
        assert r["n_matches"] >= 1
        assert "<b>tok0</b>" in r["snippet"] or "<b>tok1</b>" in r["snippet"]
    # docs without either term never appear
    with_term = {i for i, t in enumerate(pdf["content"])
                 if "tok0" in t.split() or "tok1" in t.split()}
    assert {r["doc_id"] for r in out} <= with_term


def test_highlight_exact_offsets_preserve_case(spark):
    """Offsets-based wrapping marks the exact source span — original
    case survives inside the tags (the regex fallback would too, but
    offsets also survive punctuation-adjacent tokens exactly)."""
    from lucene_1_spark.search.highlight import highlight
    texts = spark.createDataFrame(
        [(0, "Spark, SPARK! and spark."), (1, "no match here")],
        "doc_id long, text string")
    out = highlight(texts, {"spark"}, analyzer="standard").collect()
    assert len(out) == 1 and out[0]["doc_id"] == 0
    assert out[0]["n_matches"] == 3
    assert out[0]["snippet"] == \
        "<b>Spark</b>, <b>SPARK</b>! and <b>spark</b>"


def test_suggest_prefix_and_fuzzy(searcher):
    from lucene_1_spark.search.highlight import (suggest_terms,
                                                 suggest_terms_fuzzy)
    got = [(r["term"], r["weight"])
           for r in suggest_terms(searcher.reader, "tok1", k=5).collect()]
    assert len(got) == 5 and all(t.startswith("tok1") for t, _ in got)
    assert got == sorted(got, key=lambda x: (-x[1], x[0]))
    fz = [r["term"] for r in
          suggest_terms_fuzzy(searcher.reader, "tok1", 1, k=5).collect()]
    assert "tok1" in fz
    from lucene_1_spark.search.highlight import suggest_terms_infix
    inf = [r["term"] for r in
           suggest_terms_infix(searcher.reader, "ok1", k=5).collect()]
    assert inf and all("ok1" in t for t in inf)


# ---------------------------------------------------------------------------
# sort-by-field (TopFieldCollector analog)
# ---------------------------------------------------------------------------

def test_search_sorted_by_field(searcher):
    got = searcher.search_sorted("tok0", by=[("lang", "asc"),
                                             ("length", "desc")], k=15)
    rows = [(r["lang"], r["length"], r["doc_id"]) for r in got.collect()]
    manual = sorted(rows, key=lambda t: (t[0], -t[1], t[2]))
    assert rows == manual and len(rows) == 15


# ---------------------------------------------------------------------------
# round-3: expansion fail-fast + fuzzy dictionary prefilters
# ---------------------------------------------------------------------------

def test_over_expansion_fails_fast_without_materialization(searcher,
                                                           monkeypatch):
    """PrefixQuery('tok')-style over-expansion raises after collecting
    at most MAX_CLAUSE_COUNT+1 dictionary rows (the .limit guard), not
    the whole expansion."""
    from lucene_1_spark.search import query as query_mod
    monkeypatch.setattr(query_mod, "MAX_CLAUSE_COUNT", 3)
    with pytest.raises(ValueError, match="too large"):
        searcher.rewrite_multi_term(PrefixQuery("tok"))
    with pytest.raises(ValueError, match="too large"):
        searcher.expand_terms(F.col("term").startswith("tok"))


def test_fuzzy_prefilter_matches_bruteforce_dictionary(searcher):
    """The length-window prefilter loses no matches: the pruned scan
    expands to exactly the brute-force edit-distance set."""
    from lucene_1_spark.search.executor import _levenshtein
    q = FuzzyQuery("tok42", max_edits=1, boost_by_similarity=False)
    expanded = searcher.rewrite_multi_term(q)
    got = sorted(c.query.term for c in expanded.clauses)
    all_terms = [r["term"] for r in
                 searcher.reader.term_stats().select("term").collect()]
    want = sorted(t for t in set(all_terms)
                  if _levenshtein(t, "tok42") <= 1)
    assert got == want and len(want) > 1


def test_count_term_shortcut_equals_exhaustive(searcher):
    """count(TermQuery) on a delete-free index short-circuits to the
    dictionary docFreq (IndexSearcher.java count()) — must equal the
    exhaustive collector."""
    for t in ["tok0", "tok1", "tok123", "def"]:
        exhaustive = searcher.search_df(TermQuery(t), k=None,
                                        prune=False).count()
        assert searcher.count(TermQuery(t)) == exhaustive, t
    assert searcher.count(TermQuery("zzz_absent")) == 0


def test_highlight_bm25_passage_order(spark):
    """PassageScorer analog (uhighlight/PassageScorer.java): a passage
    holding a RARE query term must outrank one stuffed with a term
    frequent elsewhere in the document — BM25-weighted passage
    ranking, not match counting.  The legacy count scorer picks the
    stuffed passage; bm25 picks the rare-term one."""
    from lucene_1_spark.search.highlight import highlight
    filler = ["alpha beta gamma delta epsilon zeta eta theta"] * 3
    head = "intro words then rare appears once right here okay " \
           + " ".join(filler)
    tail = " ".join(["common common common common pad pad pad pad"] * 6)
    text = head + " " + tail
    texts = spark.createDataFrame([(0, text)], "doc_id long, text string")
    bm = highlight(texts, {"rare", "common"}, analyzer="whitespace",
                   window=12, scorer="bm25").collect()[0]
    cnt = highlight(texts, {"rare", "common"}, analyzer="whitespace",
                    window=12, scorer="count").collect()[0]
    assert "<b>rare</b>" in bm["snippet"], bm["snippet"]
    assert "<b>common</b>" in cnt["snippet"], cnt["snippet"]
    assert "<b>common</b>" not in bm["snippet"]
    # earlier-passage tie-break: two identical windows -> first wins
    t2 = "pick me now " + " ".join(filler) + " pick me now"
    out = highlight(spark.createDataFrame([(0, t2)],
                                          "doc_id long, text string"),
                    {"pick"}, analyzer="whitespace", window=8).collect()[0]
    assert out["snippet"].startswith("<b>pick</b> me now")


def test_highlight_phrase_aware(spark):
    """A slop-0 PhraseQuery highlights only FULL consecutive
    occurrences — wrapped as one span — never isolated member terms
    (the UnifiedHighlighter phrase-interval contract)."""
    from lucene_1_spark.search.highlight import highlight, query_phrases
    from lucene_1_spark.search.query import PhraseQuery, parse_query
    q = PhraseQuery(("quick", "fox"))
    assert query_phrases(q) == {("quick", "fox")}
    texts = spark.createDataFrame(
        [(0, "the quick dog ran while the quick fox slept"),
         (1, "a quick start and a lone fox"),
         (2, "no members at all")],
        "doc_id long, text string")
    out = {r["doc_id"]: r for r in
           highlight(texts, q, analyzer="standard").collect()}
    assert set(out) == {0}                      # doc 1 has no phrase
    assert out[0]["n_matches"] == 1
    assert "<b>quick fox</b>" in out[0]["snippet"]
    assert "<b>quick</b> dog" not in out[0]["snippet"]
    # parsed quoted phrase + loose term mix
    q2 = parse_query('"quick fox" slept')
    r2 = highlight(texts, q2, analyzer="standard").collect()
    d0 = [r for r in r2 if r["doc_id"] == 0][0]
    assert "<b>quick fox</b>" in d0["snippet"]
    assert "<b>slept</b>" in d0["snippet"]
