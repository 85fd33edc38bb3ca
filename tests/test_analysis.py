"""Analyzer goldens — pin the UAX#29-for-ASCII + lowercase + max-length
semantics (StandardTokenizer.java:152-175, StandardAnalyzer.java:34-39)."""

from lucene_1_spark.analysis import StandardAnalyzer, get_analyzer


AN = StandardAnalyzer()


def test_e5_uax29_golden():
    assert AN.tokens("a1b2 3.14 foo_bar foo-bar x+y") == [
        "a1b2", "3.14", "foo_bar", "foo", "bar", "x", "y",
    ]


def test_lowercase_folding():
    assert AN.tokens("Foo FOO foo fOO") == ["foo"] * 4


def test_empty_and_whitespace():
    assert AN.tokens("") == []
    assert AN.tokens("   \n\t ") == []


def test_max_token_length_drop_with_position_gap():
    text = "aaa " + "x" * 300 + " bbb"
    assert AN.tokens(text) == ["aaa", "bbb"]
    # the dropped token still consumed a position
    assert AN.tokens_with_positions(text) == [("aaa", 0), ("bbb", 2)]


def test_midnumlet_joins():
    assert AN.tokens("don't stop") == ["don't", "stop"]
    assert AN.tokens("1,000 items") == ["1,000", "items"]
    assert AN.tokens("ver1.2.3") == ["ver1.2.3"]
    # trailing punctuation never joins
    assert AN.tokens("end. next") == ["end", "next"]
    assert AN.tokens("3.x") == ["3", "x"]  # digit '.' letter does not join


def test_code_identifiers():
    assert AN.tokens("def foo_bar(self, x): return x+1") == [
        "def", "foo_bar", "self", "x", "return", "x", "1",
    ]


def test_whitespace_analyzer():
    wa = get_analyzer("whitespace")
    assert wa.tokens("Key AGG row") == ["key", "agg", "row"]
