"""SimpleQueryParser analog (``queryparser/simple/SimpleQueryParser.
java``): lenient grammar, never throws; behavior + fuzz + end-to-end
search."""

import os
import string

import pytest
from hypothesis import given, settings
from hypothesis import strategies as st

from lucene_1_spark import corpus as corpus_mod
from lucene_1_spark.index import IndexBuilder, IndexReader
from lucene_1_spark.index.builder import IndexConfig
from lucene_1_spark.search import IndexSearcher


@pytest.fixture(scope="module")
def searcher(spark, tmp_root):
    pdf = corpus_mod.t_small()
    d = os.path.join(tmp_root, "idx_simpleqp")
    src = spark.createDataFrame(pdf).repartition(8, "repo")
    IndexBuilder(spark, d, IndexConfig(n_buckets=8,
                                       n_doc_partitions=8)).build(src)
    return IndexSearcher(IndexReader(spark, d))

from lucene_1_spark.search.query import (BooleanQuery, Clause, FuzzyQuery,
                                         MatchAllDocsQuery,
                                         MatchNoDocsQuery, Occur,
                                         PhraseQuery, PrefixQuery, Query,
                                         TermQuery)
from lucene_1_spark.search.simple_parser import ALL_FLAGS, parse_simple


def _should(*terms):
    return BooleanQuery(tuple(Clause(TermQuery(t), Occur.SHOULD)
                              for t in terms))


def test_basic_operators():
    assert parse_simple("foo") == TermQuery("foo")
    assert parse_simple("foo bar") == _should("foo", "bar")
    assert parse_simple("foo + bar") == BooleanQuery((
        Clause(TermQuery("foo"), Occur.MUST),
        Clause(TermQuery("bar"), Occur.MUST)))
    assert parse_simple("foo | bar") == _should("foo", "bar")
    assert parse_simple("foo -bar") == BooleanQuery((
        Clause(TermQuery("foo"), Occur.SHOULD),
        Clause(BooleanQuery((
            Clause(MatchAllDocsQuery(), Occur.MUST),
            Clause(TermQuery("bar"), Occur.MUST_NOT))), Occur.SHOULD)))
    assert parse_simple("foo + -bar") == BooleanQuery((
        Clause(TermQuery("foo"), Occur.MUST),
        Clause(TermQuery("bar"), Occur.MUST_NOT)))


def test_precedence_and_groups():
    # AND binds tighter than OR
    assert parse_simple("a + b | c") == BooleanQuery((
        Clause(BooleanQuery((Clause(TermQuery("a"), Occur.MUST),
                             Clause(TermQuery("b"), Occur.MUST))),
               Occur.SHOULD),
        Clause(TermQuery("c"), Occur.SHOULD)))
    assert parse_simple("a + (b | c)") == BooleanQuery((
        Clause(TermQuery("a"), Occur.MUST),
        Clause(_should("b", "c"), Occur.MUST)))


def test_phrase_prefix_fuzzy():
    assert parse_simple('"foo bar"') == PhraseQuery(("foo", "bar"))
    assert parse_simple('"foo bar"~2') == PhraseQuery(("foo", "bar"),
                                                      slop=2)
    assert parse_simple("fo*") == PrefixQuery("fo")
    assert parse_simple("foo~1") == FuzzyQuery("foo", max_edits=1)
    assert parse_simple("foo~") == FuzzyQuery("foo", max_edits=2)
    # fuzzy edits clamp to the reference's LevenshteinAutomata max (2)
    assert parse_simple("foo~7") == FuzzyQuery("foo", max_edits=2)


def test_escape_and_flags():
    # escaped '+' reaches the analyzer as literal text (the standard
    # analyzer would then split on it — UAX#29 — so assert with the
    # whitespace analyzer, where the escaped char survives)
    assert parse_simple(r"foo\+bar", analyzer="whitespace") \
        == TermQuery("foo+bar")
    # disabled operator chars become literal text (whitespace analyzer
    # so the literal char survives analysis)
    assert parse_simple("fo*", analyzer="whitespace",
                        flags=ALL_FLAGS - {"PREFIX_OPERATOR"}) \
        == TermQuery("fo*")
    assert parse_simple("a | b", analyzer="whitespace",
                        flags=ALL_FLAGS - {"OR_OPERATOR"}) \
        == _should("a", "|", "b")
    # with the standard analyzer the disabled char is simply analyzed
    # away — still never a parse error
    assert parse_simple("fo*", flags=ALL_FLAGS - {"PREFIX_OPERATOR"}) \
        == TermQuery("fo")


def test_default_operator_must():
    assert parse_simple("foo bar", default_operator="must") == \
        BooleanQuery((Clause(TermQuery("foo"), Occur.MUST),
                      Clause(TermQuery("bar"), Occur.MUST)))


@pytest.mark.parametrize("garbage", [
    "", "   ", '"', '"""', "(((", ")))", "()", "+", "-", "|", "~",
    "~3", "+ + +", "- | + ( \" ~", "a + ", "| a", "-(a", 'a)b"c(',
    "***", "\\", "a \\", '"unterminated phrase', "((a | b) + c",
])
def test_lenient_never_raises(garbage):
    q = parse_simple(garbage)
    assert isinstance(q, Query)


@settings(max_examples=300, deadline=None)
@given(st.text(alphabet=string.ascii_lowercase + '+|-"()*~\\ ',
               max_size=40))
def test_fuzz_never_raises(s):
    assert isinstance(parse_simple(s), Query)


@settings(max_examples=100, deadline=None)
@given(st.text(max_size=40))
def test_fuzz_unicode_never_raises(s):
    assert isinstance(parse_simple(s), Query)


def test_empty_is_match_no_docs():
    assert parse_simple("") == MatchNoDocsQuery()
    assert parse_simple("+ | -") == MatchNoDocsQuery()


def test_end_to_end_search(searcher):
    """The parsed tree runs through search_df; malformed input still
    returns a DataFrame (MatchNoDocs -> 0 rows)."""
    hits = searcher.search_df(parse_simple("tok1 + tok2"), k=5).collect()
    manual = searcher.search_df("+tok1 +tok2", k=5).collect()
    assert [(r["doc_id"], r["score"]) for r in hits] == \
        [(r["doc_id"], r["score"]) for r in manual]
    assert searcher.search_df(parse_simple('"((('), k=5).collect() == []
