"""Surround query language — parser + doc-set execution
(``lucene/queryparser/src/java/org/apache/lucene/queryparser/surround/``
grammar and query model)."""

import os

import pandas as pd
import pytest

from lucene_1_spark.index import IndexBuilder, IndexReader
from lucene_1_spark.index.builder import IndexConfig
from lucene_1_spark.search import IndexSearcher
from lucene_1_spark.search.surround_parser import (SrndBool, SrndDistance,
                                                   SrndTerm,
                                                   SurroundParseError,
                                                   parse_surround,
                                                   surround_search)

DOCS = pd.DataFrame([
    ("r", "d0", "c", "x", "quick brown fox jumps over lazy dog"),
    ("r", "d1", "c", "x", "quick red fox sleeps"),
    ("r", "d2", "c", "x", "fox quick brown"),
    ("r", "d3", "c", "x", "quick brown brown fox"),
    ("r", "d4", "c", "x", "lazy quick dog fox"),
    ("r", "d5", "c", "x", "brown bear brown den"),
], columns=["repo", "path", "commit", "lang", "content"])


@pytest.fixture(scope="module")
def sidx(spark, tmp_root):
    d = os.path.join(tmp_root, "idx_surround")
    IndexBuilder(spark, d, IndexConfig(analyzer="whitespace", n_buckets=4,
                                       n_doc_partitions=2,
                                       positions=True)) \
        .build(spark.createDataFrame(DOCS))
    return IndexSearcher(IndexReader(spark, d))


def _paths(s, text):
    m = surround_search(s, text)
    docs = s.reader.docs().select("doc_id", "path")
    return {r["path"] for r in m.join(docs, "doc_id").collect()}


# ---------------------------------------------------------------- parser

def test_precedence_or_and_not_w():
    # W binds tightest, then NOT, AND, OR loosest
    n = parse_surround("a or b and c not d w e")
    assert isinstance(n, SrndBool) and n.op == "or"
    rhs = n.operands[1]
    assert isinstance(rhs, SrndBool) and rhs.op == "and"
    nt = rhs.operands[1]
    assert isinstance(nt, SrndBool) and nt.op == "not"
    w = nt.operands[1]
    assert isinstance(w, SrndDistance) and w.ordered and w.distance == 1
    assert w.operands == (SrndTerm("d"), SrndTerm("e"))


def test_nary_chains():
    w = parse_surround("a 3w b 3w c")
    assert isinstance(w, SrndDistance) and len(w.operands) == 3 \
        and w.distance == 3 and w.ordered
    o = parse_surround("a or b or c")
    assert isinstance(o, SrndBool) and len(o.operands) == 3


def test_prefix_forms():
    d = parse_surround("3w(a, b, c)")
    assert d == SrndDistance(3, True, (SrndTerm("a"), SrndTerm("b"),
                                       SrndTerm("c")))
    nn = parse_surround("5N(a, b)")
    assert nn.distance == 5 and not nn.ordered
    b = parse_surround("AND(a, or(b, c))")
    assert b.op == "and" and isinstance(b.operands[1], SrndBool)


def test_boost_ignored_and_case_insensitive():
    assert parse_surround("a^2 AND b^0.5") == \
        parse_surround("a and b")


def test_malformed_raises():
    for bad in ("", "a and", "(a or b", "and(a)", "w", "a , b",
                "3w(a)", "not"):
        with pytest.raises(SurroundParseError):
            parse_surround(bad)


# ------------------------------------------------------------- execution

def test_ordered_distance_docs(sidx):
    # quick 2w fox: ordered within distance 2 (<=1 gap)
    assert _paths(sidx, "quick 2w fox") == {"d0", "d1", "d4"}
    assert _paths(sidx, "quick w brown") == {"d0", "d2", "d3"}


def test_unordered_distance_docs(sidx):
    assert _paths(sidx, "quick 2n fox") == {"d0", "d1", "d2", "d4"}


def test_boolean_algebra(sidx):
    assert _paths(sidx, "quick and dog") == {"d0", "d4"}
    assert _paths(sidx, "bear or sleeps") == {"d1", "d5"}
    assert _paths(sidx, "brown not fox") == {"d5"}
    # composition: (quick w brown) not dog
    assert _paths(sidx, "(quick w brown) not dog") == {"d2", "d3"}


def test_truncation_inside_distance(sidx):
    # bro* expands {brown}; sl?eps doesn't match, sle* does
    assert _paths(sidx, "quick w bro*") == {"d0", "d2", "d3"}
    assert _paths(sidx, "red 2w sle*") == {"d1"}
    assert _paths(sidx, "fox w sle*") == {"d1"}
    # no dictionary hit -> empty, not an error
    assert _paths(sidx, "quick w zzz*") == set()


def test_truncation_top_level(sidx):
    assert _paths(sidx, "be?r") == {"d5"}
    assert _paths(sidx, "la* and do*") == {"d0", "d4"}


def test_nested_ordered_inside_ordered(sidx):
    # (quick w brown) then fox within 2 — d3: quick brown brown fox
    assert _paths(sidx, "(quick w brown) 2w fox") == {"d0", "d3"}


def test_unordered_composite_rejected(sidx):
    with pytest.raises(SurroundParseError):
        surround_search(sidx, "(a w b) 3n c")
    with pytest.raises(SurroundParseError):
        surround_search(sidx, "qui* 2n fox")
