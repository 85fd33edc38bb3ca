"""Classic query-parser syntax (QueryParser.jj analog) — pure unit
tests, no Spark session."""

import pytest

from lucene_1_spark.search.query import (
    BooleanQuery, Clause, FuzzyQuery, MatchAllDocsQuery, MatchNoDocsQuery,
    Occur, PhraseQuery, PrefixQuery, RegexpQuery, TermQuery, TermRangeQuery,
    WildcardQuery, parse_query,
)


def _clauses(q):
    assert isinstance(q, BooleanQuery)
    return [(c.occur, c.query) for c in q.clauses]


def test_legacy_syntax_unchanged():
    q = parse_query('+tok0 -tok1 tok2 "a b"')
    cl = _clauses(q)
    assert (Occur.MUST, TermQuery("tok0")) in cl
    assert (Occur.MUST_NOT, TermQuery("tok1")) in cl
    assert (Occur.SHOULD, TermQuery("tok2")) in cl
    assert (Occur.SHOULD, PhraseQuery(("a", "b"))) in cl
    assert parse_query("tok0") == TermQuery("tok0")
    assert parse_query("") == MatchNoDocsQuery()


def test_and_or_not_operators():
    assert _clauses(parse_query("a AND b")) == [
        (Occur.MUST, TermQuery("a")), (Occur.MUST, TermQuery("b"))]
    assert _clauses(parse_query("a OR b")) == [
        (Occur.SHOULD, TermQuery("a")), (Occur.SHOULD, TermQuery("b"))]
    assert _clauses(parse_query("a AND NOT b")) == [
        (Occur.MUST, TermQuery("a")), (Occur.MUST_NOT, TermQuery("b"))]
    assert _clauses(parse_query("a && b || c")) == [
        (Occur.MUST, TermQuery("a")), (Occur.MUST, TermQuery("b")),
        (Occur.SHOULD, TermQuery("c"))]
    assert _clauses(parse_query("NOT a b")) == [
        (Occur.MUST_NOT, TermQuery("a")), (Occur.SHOULD, TermQuery("b"))]


def test_boost_fuzzy_suffixes():
    assert parse_query("spark^2.5") == TermQuery("spark", 2.5)
    assert parse_query("spark~") == FuzzyQuery("spark", max_edits=2)
    assert parse_query("spark~1") == FuzzyQuery("spark", max_edits=1)
    assert parse_query("spark~1^3") == FuzzyQuery("spark", max_edits=1,
                                                  boost=3.0)


def test_wildcard_prefix_regexp():
    assert parse_query("spar*") == PrefixQuery("spar")
    assert parse_query("Sp?rk*") == WildcardQuery("sp?rk*")
    assert parse_query("/s.*k/") == RegexpQuery("s.*k")
    assert parse_query("*:*") == MatchAllDocsQuery()


def test_ranges():
    assert parse_query("[aaa TO bbb]") == TermRangeQuery("aaa", "bbb",
                                                         True, True)
    assert parse_query("{aaa TO bbb}") == TermRangeQuery("aaa", "bbb",
                                                         False, False)
    assert parse_query("[aaa TO *]") == TermRangeQuery("aaa", None,
                                                       True, True)


def test_phrases_and_slop():
    assert parse_query('"sort merge"') == PhraseQuery(("sort", "merge"))
    assert parse_query('"sort merge"~2') == PhraseQuery(("sort", "merge"),
                                                        slop=2)
    assert parse_query('"sort merge"~2^1.5') == PhraseQuery(
        ("sort", "merge"), boost=1.5, slop=2)


def test_parens_and_group_boost():
    q = parse_query("+a +(b OR c)^2")
    cl = _clauses(q)
    assert (Occur.MUST, TermQuery("a")) in cl
    group = [c for o, c in cl if o == Occur.MUST and c != TermQuery("a")][0]
    assert _clauses(group) == [(Occur.SHOULD, TermQuery("b", 2.0)),
                               (Occur.SHOULD, TermQuery("c", 2.0))]


def test_field_validation():
    assert parse_query("content:spark") == TermQuery("spark")
    assert parse_query("text:spark^2") == TermQuery("spark", 2.0)
    with pytest.raises(ValueError, match="unknown field"):
        parse_query("title:spark")


def test_analyzer_applied_to_terms():
    # standard analyzer lowercases; '.' is MidNumLet (one UAX#29 token)
    assert parse_query("Foo.Bar", analyzer="standard") \
        == TermQuery("foo.bar")
    # ',' is a real word break -> the atom analyzes into a disjunction
    q = parse_query("Foo,Bar", analyzer="standard")
    assert _clauses(q) == [(Occur.SHOULD, TermQuery("foo")),
                           (Occur.SHOULD, TermQuery("bar"))]
