"""Non-term clauses inside BooleanQuery — the relational BooleanWeight
over arbitrary sub-scorers (``search/BooleanQuery.java:105-130``,
``BooleanClause.java``): PhraseQuery / SynonymQuery /
ConstantScoreQuery / nested mixed booleans compose as MUST / SHOULD /
FILTER / MUST_NOT clauses, verified against the brute-force oracle."""

import os

import numpy as np
import pytest

from lucene_1_spark import corpus as corpus_mod
from lucene_1_spark import oracle as oracle_mod
from lucene_1_spark.functions import bm25
from lucene_1_spark.index import IndexBuilder, IndexReader
from lucene_1_spark.index.builder import IndexConfig
from lucene_1_spark.search import IndexSearcher
from lucene_1_spark.search.query import (BooleanQuery, Clause,
                                         ConstantScoreQuery, Occur,
                                         PhraseQuery, PrefixQuery,
                                         SynonymQuery, TermQuery,
                                         parse_query)


@pytest.fixture(scope="module")
def cidx(spark, tmp_root):
    pdf = corpus_mod.t_small()
    d = os.path.join(tmp_root, "idx_composite")
    src = spark.createDataFrame(pdf).repartition(8, "repo")
    IndexBuilder(spark, d, IndexConfig(n_buckets=8, n_doc_partitions=8,
                                       positions=True)).build(src)
    return IndexSearcher(IndexReader(spark, d)), \
        oracle_mod.build_oracle_index(pdf)


def _cache(idx):
    avgdl = bm25.avg_field_length(idx.sum_total_term_freq, idx.doc_count)
    return bm25.norm_inverse_cache(avgdl, np.float32(idx.k1),
                                   np.float32(idx.b))


def _term_score(idx, cache, t, did) -> float:
    pl = idx.postings.get(t, {})
    freq = pl.get(did)
    if freq is None:
        return 0.0
    w = bm25.term_weight(len(pl), idx.doc_count)
    s = bm25.score_term(np.array([freq]), idx.norm_bytes[did:did + 1],
                        w, cache)
    return float(s[0])


def _phrase_scores(idx, terms) -> dict[int, float]:
    return {d: s for d, _, s in
            oracle_mod.search_oracle_phrase(idx, terms, k=10 ** 9)}


def _syn_scores(idx, cache, terms) -> dict[int, float]:
    """SynonymQuery oracle: df = max over members, freq = sum."""
    dfm = max(len(idx.postings.get(t, {})) for t in terms)
    w = np.float32(bm25.idf(dfm, idx.doc_count))
    freqs: dict[int, int] = {}
    for t in terms:
        for d, f in idx.postings.get(t, {}).items():
            freqs[d] = freqs.get(d, 0) + f
    return {d: float(bm25.score_term(np.array([f]),
                                     idx.norm_bytes[d:d + 1], w, cache)[0])
            for d, f in freqs.items()}


def _run(searcher, q, k=10):
    rows = searcher.search_df(q, k=k).collect()
    return [(r["doc_id"], np.float32(r["score"])) for r in rows]


def _expect(score_map: dict[int, float], k=10):
    exp = sorted(((d, np.float32(s)) for d, s in score_map.items()),
                 key=lambda r: (-r[1], r[0]))
    return exp[:k]


def test_must_term_plus_must_phrase(cidx):
    """'+tok1 +"tok0 tok1"' — the round-2 NotImplementedError case."""
    s, idx = cidx
    cache = _cache(idx)
    ph = _phrase_scores(idx, ["tok0", "tok1"])
    docs = set(idx.postings["tok1"]) & set(ph)
    exp = _expect({d: _term_score(idx, cache, "tok1", d) + ph[d]
                   for d in docs})
    got = _run(s, '+tok1 +"tok0 tok1"')
    assert got == exp


def test_should_phrase_with_must_not_term(cidx):
    """'"tok0 tok1" -tok7' — phrase score, tok7 docs excluded."""
    s, idx = cidx
    ph = _phrase_scores(idx, ["tok0", "tok1"])
    excl = set(idx.postings.get("tok7", {}))
    exp = _expect({d: v for d, v in ph.items() if d not in excl})
    got = _run(s, '"tok0 tok1" -tok7')
    assert got == exp


def test_constant_score_prefix_clause(cidx):
    """ConstantScore(prefix) AND term: score = bm25(term) + boost."""
    s, idx = cidx
    cache = _cache(idx)
    q = BooleanQuery((
        Clause(TermQuery("tok1"), Occur.MUST),
        Clause(ConstantScoreQuery(PrefixQuery("de"), 0.5), Occur.MUST)))
    pre_docs = set()
    for t, pl in idx.postings.items():
        if t.startswith("de"):
            pre_docs |= set(pl)
    docs = set(idx.postings["tok1"]) & pre_docs
    exp = _expect({d: _term_score(idx, cache, "tok1", d) + 0.5
                   for d in docs})
    got = _run(s, q)
    assert got == exp


def test_phrase_as_filter_clause(cidx):
    """FILTER phrase: required, contributes NO score."""
    s, idx = cidx
    cache = _cache(idx)
    ph = _phrase_scores(idx, ["tok0", "tok1"])
    q = BooleanQuery((
        Clause(TermQuery("tok2"), Occur.MUST),
        Clause(PhraseQuery(("tok0", "tok1")), Occur.FILTER)))
    docs = set(idx.postings["tok2"]) & set(ph)
    exp = _expect({d: _term_score(idx, cache, "tok2", d) for d in docs})
    got = _run(s, q)
    assert got == exp


def test_synonym_clause_in_boolean(cidx):
    s, idx = cidx
    cache = _cache(idx)
    syn = _syn_scores(idx, cache, ("tok2", "tok3"))
    q = BooleanQuery((
        Clause(TermQuery("tok1"), Occur.MUST),
        Clause(SynonymQuery(("tok2", "tok3")), Occur.SHOULD)))
    docs = set(idx.postings["tok1"])
    exp = _expect({d: _term_score(idx, cache, "tok1", d) + syn.get(d, 0.0)
                   for d in docs})
    got = _run(s, q)
    assert got == exp


def test_msm_counts_complex_clause(cidx):
    """minimumNumberShouldMatch counts a phrase SHOULD clause."""
    s, idx = cidx
    cache = _cache(idx)
    ph = _phrase_scores(idx, ["tok0", "tok1"])
    q = BooleanQuery((
        Clause(TermQuery("tok2"), Occur.SHOULD),
        Clause(PhraseQuery(("tok0", "tok1")), Occur.SHOULD)),
        minimum_should_match=2)
    docs = set(idx.postings["tok2"]) & set(ph)
    exp = _expect({d: _term_score(idx, cache, "tok2", d) + ph[d]
                   for d in docs})
    got = _run(s, q)
    assert got == exp


def test_nested_mixed_boolean_clause(cidx):
    """(a AND b) OR c — a nested conjunction as a SHOULD clause."""
    s, idx = cidx
    cache = _cache(idx)
    inner_docs = set(idx.postings["tok5"]) & set(idx.postings["tok9"])
    inner = {d: np.float32(_term_score(idx, cache, "tok5", d)
                           + _term_score(idx, cache, "tok9", d))
             for d in inner_docs}
    outer = set(idx.postings["tok123"]) | inner_docs
    exp = _expect({d: float(inner.get(d, 0.0))
                   + _term_score(idx, cache, "tok123", d) for d in outer})
    got = _run(s, "(+tok5 +tok9) tok123")
    assert got == exp


def test_parser_roundtrip_produces_composite(cidx):
    q = parse_query('+tok1 +"tok0 tok1"', "standard")
    assert isinstance(q, BooleanQuery)
    kinds = {type(c.query) for c in q.clauses}
    assert PhraseQuery in kinds and TermQuery in kinds
    s, _ = cidx
    assert len(_run(s, q, k=5)) > 0  # executes, no NotImplementedError


def test_count_with_composite(cidx):
    s, idx = cidx
    ph = _phrase_scores(idx, ["tok0", "tok1"])
    expected = len(set(idx.postings["tok1"]) & set(ph))
    assert s.count('+tok1 +"tok0 tok1"') == expected


def test_doc_values_range_filter_clause(cidx):
    """DocValuesRangeQuery as a FILTER clause: restricts by a stored
    numeric column, contributes no score."""
    from lucene_1_spark.search.query import DocValuesRangeQuery
    s, idx = cidx
    cache = _cache(idx)
    q = BooleanQuery((
        Clause(TermQuery("tok1"), Occur.MUST),
        Clause(DocValuesRangeQuery("length", 50, 200), Occur.FILTER)))
    lengths = {r["doc_id"]: r["length"]
               for r in s.reader.docs().select("doc_id", "length").collect()}
    docs = {d for d in idx.postings["tok1"] if 50 <= lengths[d] <= 200}
    exp = _expect({d: _term_score(idx, cache, "tok1", d) for d in docs})
    got = _run(s, q)
    assert got == exp and got


def test_doc_values_range_standalone(cidx):
    from lucene_1_spark.search.query import DocValuesRangeQuery
    s, idx = cidx
    lengths = {r["doc_id"]: r["length"]
               for r in s.reader.docs().select("doc_id", "length").collect()}
    got = {r["doc_id"] for r in
           s.search_df(DocValuesRangeQuery("length", 300, None),
                       k=None).collect()}
    assert got == {d for d, ln in lengths.items() if ln >= 300} and got
