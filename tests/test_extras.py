"""Non-language analysis/common machinery (``analysis/extras.py``):
compound decomposition, HTML strip, path hierarchy, pattern tokenizer,
reverse filter, common grams."""

import pytest

from lucene_1_spark.analysis.extras import (
    CLASSIC_STOP, decompound, html_strip, resolve_extra)
from lucene_1_spark.analysis.standard import get_analyzer


@pytest.fixture(scope="module")
def dict_file(tmp_path_factory):
    p = tmp_path_factory.mktemp("cw") / "words.txt"
    p.write_text("spark\nwindow\ndata\npart\ntable\n", encoding="utf-8")
    return str(p)


def test_decompound_semantics(dict_file):
    words = frozenset(["spark", "window", "data", "part", "table"])
    # every dictionary subword at any offset, original kept by analyzer
    assert decompound("sparkwindow", words) == ["spark", "window"]
    # substring matches across member boundaries are found too
    # (DictionaryCompoundWordTokenFilter tries every offset)
    assert "table" in decompound("partable", words)
    # below min_word_size: no decompounding
    assert decompound("data", words) == []
    # only_longest: one match per offset
    assert decompound("sparkwindowdata", words, only_longest=True) == \
        ["spark", "window", "data"]


def test_compound_analyzer_positions(dict_file):
    an = get_analyzer(f"compound:whitespace:{dict_file}")
    got = an.tokens_with_positions("sparkwindow scan")
    # original + subwords share position 0 (posInc-0 twins)
    assert got == [("sparkwindow", 0), ("spark", 0), ("window", 0),
                   ("scan", 1)]


def test_html_strip():
    assert html_strip("<p>a <b>b</b></p>") == " a  b  "
    # script/style CONTENT dropped, comments dropped
    assert "x=1" not in html_strip("<script>var x=1;</script>ok")
    assert "red" not in html_strip("<style>.a{color:red}</style>ok")
    assert "hidden" not in html_strip("a <!-- hidden --> b")
    # entities decode LAST: &lt;b&gt; must NOT become a stripped tag
    assert html_strip("a &lt;b&gt; b &amp; c") == "a <b> b & c"
    an = get_analyzer("html:standard")
    assert an.tokens("<p>Hello <b>World</b> &amp; more</p>") == \
        ["hello", "world", "more"]


def test_path_hierarchy():
    an = get_analyzer("path")
    assert an.tokens("/usr/local/bin") == ["/usr", "/usr/local",
                                           "/usr/local/bin"]
    # leading-slash normalized; all tokens share one position
    assert an.tokens_with_positions("en/web") == [("/en", 0),
                                                  ("/en/web", 0)]
    assert an.tokens("") == []


def test_pattern_tokenizer():
    an = get_analyzer(r"pattern:[A-Z][a-z]+")
    assert an.tokens("CamelCase FooBar baz") == ["camel", "case", "foo",
                                                 "bar"]
    # the regex tail may contain colons
    an2 = get_analyzer(r"pattern:[a-z:]+")
    assert an2.tokens("a:b c") == ["a:b", "c"]


def test_reverse_filter():
    an = get_analyzer("reverse:whitespace")
    assert an.tokens("slow window") == ["wols", "wodniw"]
    # leading-wildcard rewrite: *ow == prefix 'wo' over reversed terms
    assert all(t.startswith("wo") for t in an.tokens("slow row"))


def test_commongrams():
    an = get_analyzer("commongrams:whitespace")
    got = an.tokens_with_positions("the value of data")
    assert ("the_value", 0) in got and ("of_data", 2) in got
    # bigram emitted only when a member is common
    assert ("value_of", 1) in got
    assert all(t != "data_x" for t, _ in got)
    got2 = an.tokens_with_positions("big data")
    assert got2 == [("big", 0), ("data", 1)]  # no common member
    assert "the" in CLASSIC_STOP


def test_unknown_spec():
    assert resolve_extra("nosuch:standard") is None
