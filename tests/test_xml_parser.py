"""XML query parser — the CoreParser element vocabulary
(``lucene/queryparser/src/java/org/apache/lucene/queryparser/xml/
CoreParser.java`` + ``builders/*.java`` attribute conventions)."""

import os

import pandas as pd
import pytest

from lucene_1_spark.index import IndexBuilder, IndexReader
from lucene_1_spark.index.builder import IndexConfig
from lucene_1_spark.search import IndexSearcher
from lucene_1_spark.search.query import (BooleanQuery, Clause,
                                         ConstantScoreQuery,
                                         DisjunctionMaxQuery,
                                         DocValuesRangeQuery,
                                         MatchAllDocsQuery, Occur,
                                         TermQuery, TermRangeQuery,
                                         parse_query)
from lucene_1_spark.search.spans import (SpanNearQuery, SpanOrQuery,
                                         SpanTermQuery, span_matches)
from lucene_1_spark.search.xml_parser import (XmlParserException,
                                              parse_xml_query, xml_search)

DOCS = pd.DataFrame([
    ("r", "d0", "c", "x", "quick brown fox jumps over lazy dog"),
    ("r", "d1", "c", "x", "quick red fox sleeps"),
    ("r", "d2", "c", "x", "fox quick brown"),
    ("r", "d3", "c", "x", "quick brown brown fox"),
    ("r", "d4", "c", "x", "lazy quick dog fox"),
    ("r", "d5", "c", "x", "brown bear brown den"),
], columns=["repo", "path", "commit", "lang", "content"])


@pytest.fixture(scope="module")
def xidx(spark, tmp_root):
    d = os.path.join(tmp_root, "idx_xmlq")
    IndexBuilder(spark, d, IndexConfig(analyzer="whitespace", n_buckets=4,
                                       n_doc_partitions=2,
                                       positions=True)) \
        .build(spark.createDataFrame(DOCS))
    return IndexSearcher(IndexReader(spark, d))


# ---------------------------------------------------------------- parsing

def test_boolean_clause_shapes_and_field_inheritance():
    q = parse_xml_query("""
      <BooleanQuery fieldName="content" minimumNumberShouldMatch="1">
        <Clause occurs="must"><TermQuery>quick</TermQuery></Clause>
        <Clause occurs="mustNot"><TermQuery>bear</TermQuery></Clause>
        <Clause occurs="should"><TermQuery>dog</TermQuery></Clause>
        <Clause occurs="filter"><TermQuery>fox</TermQuery></Clause>
      </BooleanQuery>""")
    assert isinstance(q, BooleanQuery)
    assert q.minimum_should_match == 1
    occ = [c.occur for c in q.clauses]
    assert occ == [Occur.MUST, Occur.MUST_NOT, Occur.SHOULD, Occur.FILTER]
    # fieldName inherited from the enclosing BooleanQuery element
    assert all(c.query.field == "content" for c in q.clauses)


def test_boost_on_dataclass_vs_wrapper():
    t = parse_xml_query('<TermQuery fieldName="content" boost="2.5">'
                        "fox</TermQuery>")
    assert t == TermQuery("fox", 2.5, "content")
    b = parse_xml_query("""
      <BooleanQuery fieldName="content" boost="3">
        <Clause occurs="must"><TermQuery>fox</TermQuery></Clause>
      </BooleanQuery>""")
    # BooleanQuery has no boost field -> 1-disjunct DisMax wrapper
    assert isinstance(b, DisjunctionMaxQuery) and b.boost == 3.0
    assert isinstance(b.disjuncts[0], BooleanQuery)


def test_range_constant_matchall_terms():
    r = parse_xml_query('<RangeQuery fieldName="content" lowerTerm="b"'
                        ' upperTerm="c" includeUpper="false"/>')
    assert r == TermRangeQuery("b", "c", True, False)
    p = parse_xml_query('<PointRangeQuery fieldName="stars"'
                        ' lowerTerm="3" upperTerm="7" type="long"/>')
    assert p == DocValuesRangeQuery("stars", 3, 7)
    m = parse_xml_query("<MatchAllDocsQuery/>")
    assert m == MatchAllDocsQuery()
    c = parse_xml_query('<ConstantScoreQuery boost="0.5">'
                        '<TermQuery fieldName="content">fox</TermQuery>'
                        "</ConstantScoreQuery>")
    assert isinstance(c, ConstantScoreQuery) and c.boost == 0.5
    ts = parse_xml_query('<TermsQuery fieldName="content">'
                         "quick BROWN</TermsQuery>")
    assert isinstance(ts, BooleanQuery)
    assert {c.query.term for c in ts.clauses} == {"quick", "brown"}


def test_user_query_equals_classic_parser():
    q = parse_xml_query("<UserQuery>quick AND bro*</UserQuery>")
    assert q == parse_query("quick AND bro*")


def test_span_tree():
    q = parse_xml_query("""
      <SpanNear slop="2" inOrder="false">
        <SpanTerm>quick</SpanTerm>
        <SpanOrTerms>fox dog</SpanOrTerms>
      </SpanNear>""")
    assert q == SpanNearQuery(
        (SpanTermQuery("quick"),
         SpanOrQuery((SpanTermQuery("fox"), SpanTermQuery("dog")))),
        slop=2, in_order=False)


def test_span_position_range_parse():
    from lucene_1_spark.search.spans import SpanPositionRangeQuery
    q = parse_xml_query('<SpanPositionRange start="1" end="4">'
                        "<SpanTerm>fox</SpanTerm></SpanPositionRange>")
    assert q == SpanPositionRangeQuery(SpanTermQuery("fox"), 1, 4)
    with pytest.raises(XmlParserException):
        parse_xml_query("<SpanPositionRange start='1'>"
                        "<SpanTerm>a</SpanTerm></SpanPositionRange>")


def test_errors():
    for bad in ("<NoSuchQuery/>",
                "not xml at all <",
                "<TermQuery fieldName='f'></TermQuery>",      # blank text
                "<TermQuery>fox</TermQuery>",                  # no field
                "<BooleanQuery fieldName='f'/>",               # no clauses
                "<BooleanQuery fieldName='f'><Clause occurs='bogus'>"
                "<TermQuery>a</TermQuery></Clause></BooleanQuery>",
                "<PointRangeQuery fieldName='f' lowerTerm='x'/>",
                "<SpanFirst><SpanTerm>a</SpanTerm></SpanFirst>",  # no end
                # span element as a scored boolean clause
                "<BooleanQuery fieldName='f'><Clause occurs='must'>"
                "<SpanTerm>a</SpanTerm></Clause></BooleanQuery>"):
        with pytest.raises(XmlParserException):
            parse_xml_query(bad)


# ------------------------------------------------------------- execution

def _ranked(df):
    return [(r["doc_id"], round(r["score"], 6))
            for r in df.orderBy("score", ascending=False).collect()]


def test_xml_boolean_equals_hand_built(xidx):
    xml = """
      <BooleanQuery fieldName="content">
        <Clause occurs="must"><TermQuery>quick</TermQuery></Clause>
        <Clause occurs="mustNot"><TermQuery>sleeps</TermQuery></Clause>
        <Clause occurs="should"><TermQuery boost="2">dog</TermQuery></Clause>
      </BooleanQuery>"""
    hand = BooleanQuery((
        Clause(TermQuery("quick"), Occur.MUST),
        Clause(TermQuery("sleeps"), Occur.MUST_NOT),
        Clause(TermQuery("dog", 2.0), Occur.SHOULD)))
    got = _ranked(xml_search(xidx, xml, k=10))
    want = _ranked(xidx.search_df(hand, k=10))
    assert got == want and len(got) > 0


def test_xml_dismax_and_user_query(xidx):
    xml = """
      <DisjunctionMaxQuery fieldName="content" tieBreaker="0.3">
        <TermQuery>bear</TermQuery>
        <UserQuery>quick fox</UserQuery>
      </DisjunctionMaxQuery>"""
    hand = DisjunctionMaxQuery(
        (TermQuery("bear"), parse_query("quick fox")), 0.3)
    assert _ranked(xml_search(xidx, xml, k=10)) == \
        _ranked(xidx.search_df(hand, k=10))


def test_xml_span_executes(xidx):
    xml = """
      <SpanNear slop="1" inOrder="true">
        <SpanTerm>quick</SpanTerm><SpanTerm>fox</SpanTerm>
      </SpanNear>"""
    got = xml_search(xidx, xml)
    want = span_matches(xidx, SpanNearQuery(
        (SpanTermQuery("quick"), SpanTermQuery("fox")), slop=1))
    assert sorted(r["doc_id"] for r in got.collect()) == \
        sorted(r["doc_id"] for r in want.collect())
    assert got.count() > 0
