"""Analyzing / fuzzy suggesters (``search/suggest.py`` — the
AnalyzingSuggester.java:81 / FuzzySuggester.java:66 analogs): analyzed
keys, exact-first ordering, fuzzy prefix knobs."""

import pytest

from lucene_1_spark.search.suggest import (
    build_suggestions, lookup, lookup_fuzzy)

ROWS = [
    ("The Ghost of the Mohican", 10),
    ("ghost stories", 20),
    ("Ghosts of Mars", 5),
    ("spark window", 7),
    ("spark windows update", 3),
    ("stark contrast", 9),
]


@pytest.fixture(scope="module")
def sugg(spark):
    df = spark.createDataFrame(ROWS, "s string, w long")
    return build_suggestions(df, "s", "w").cache()


def test_analyzed_keys(sugg):
    keys = {r["suggestion"]: r["analyzed_key"] for r in sugg.collect()}
    assert keys["The Ghost of the Mohican"] == "the ghost of the mohican"
    assert keys["spark window"] == "spark window"


def test_lookup_prefix_and_weight_order(sugg):
    got = [(r["suggestion"], r["rank"]) for r in
           lookup(sugg, "spark", k=5).collect()]
    assert got == [("spark window", 1), ("spark windows update", 2)]
    # multi-token typed text: the last-token prefix completes
    got = [r["suggestion"] for r in lookup(sugg, "spark windows", k=5)
           .collect()]
    assert got == ["spark windows update"]


def test_exact_first(sugg):
    # "ghost stories" (w=20) would outrank by weight alone; the exact
    # analyzed match ranks first when the typed text IS a full key
    got = [r["suggestion"] for r in lookup(sugg, "ghost stories").collect()]
    assert got[0] == "ghost stories"


def test_analyzing_strips_stopwords(spark):
    # the headline AnalyzingSuggester behavior: an english-analyzed key
    # drops "the"/"of", so typing without them still completes
    df = spark.createDataFrame(ROWS, "s string, w long")
    s_en = build_suggestions(df, "s", "w", analyzer="english")
    got = [r["suggestion"] for r in
           lookup(s_en, "ghost mohican", k=5, analyzer="english").collect()]
    assert got == ["The Ghost of the Mohican"]


def test_fuzzy_edit_and_non_fuzzy_prefix(sugg):
    # one edit: spork -> spark...
    got = [r["suggestion"] for r in
           lookup_fuzzy(sugg, "spork", k=5, max_edits=1).collect()]
    assert got == ["spark window", "spark windows update"]
    # the first non_fuzzy_prefix char must match literally
    assert lookup_fuzzy(sugg, "zpark", k=5, max_edits=1).count() == 0
    # stark is 2 edits from spork -> excluded at max_edits=1
    assert "stark contrast" not in got


def test_fuzzy_short_text_is_exact(sugg):
    # below min_fuzzy_length the lookup degrades to exact prefix
    got = [r["suggestion"] for r in
           lookup_fuzzy(sugg, "sp", k=5, max_edits=1).collect()]
    assert got == ["spark window", "spark windows update"]
    assert lookup_fuzzy(sugg, "zp", k=5, max_edits=1).count() == 0


def test_fuzzy_max_edits_bounds(sugg):
    with pytest.raises(ValueError):
        lookup_fuzzy(sugg, "spork", max_edits=3)
