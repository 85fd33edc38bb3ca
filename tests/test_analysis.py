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


def test_porter_stemmer_goldens():
    from lucene_1_spark.analysis.english import porter_stem
    goldens = {
        "caresses": "caress", "ponies": "poni", "ties": "ti",
        "caress": "caress", "cats": "cat", "feed": "feed",
        "agreed": "agre", "plastered": "plaster", "motoring": "motor",
        "sing": "sing", "conflated": "conflat", "happy": "happi",
        "sky": "sky", "relational": "relat", "conditional": "condit",
        "rational": "ration", "oscillators": "oscil",
        "connection": "connect", "connections": "connect",
        "connected": "connect", "connecting": "connect",
        "connects": "connect", "generalizations": "gener",
        "adjustable": "adjust", "dependent": "depend",
        "effective": "effect", "formalize": "formal",
    }
    for w, exp in goldens.items():
        assert porter_stem(w) == exp, (w, porter_stem(w), exp)


def test_english_analyzer_chain():
    from lucene_1_spark.analysis import get_analyzer
    an = get_analyzer("english")
    # stopwords dropped (with position gaps), possessives stripped, stemmed
    assert an.tokens("The Connected systems of a user's design") == \
        ["connect", "system", "user", "design"]
    pos = dict(an.tokens_with_positions("the happy dog"))
    assert pos == {"happi": 1, "dog": 2}  # 'the' leaves a gap at 0


def test_shingle_and_ngram_filters():
    from lucene_1_spark.analysis import get_analyzer
    sh = get_analyzer("shingle:whitespace:2:2")
    assert sh.tokens("a b c") == ["a", "a b", "b", "b c", "c"]
    ng = get_analyzer("ngram:whitespace:3:3")
    assert ng.tokens("spark") == ["spa", "par", "ark"]


def test_edge_ngram_filter():
    from lucene_1_spark.analysis import get_analyzer
    eg = get_analyzer("edge_ngram:whitespace:2:4")
    # spark -> sp spa spar + original (longer than max_n)
    assert eg.tokens("spark") == ["sp", "spa", "spar", "spark"]
    # token exactly max_n long: full token IS the last gram, no dup
    assert eg.tokens("park") == ["pa", "par", "park"]
    # shorter than min_n: original only
    assert eg.tokens("a") == ["a"]
    # grams share the source token's position
    got = eg.tokens_with_positions("go spark")
    assert ("go", 0) in got and ("sp", 1) in got and ("spark", 1) in got


def test_synonym_analyzer_same_position():
    from lucene_1_spark.analysis.filters import SynonymAnalyzer
    an = SynonymAnalyzer("whitespace", (("fast", ("quick", "rapid")),))
    toks = an.tokens_with_positions("fast car")
    assert ("fast", 0) in toks and ("quick", 0) in toks \
        and ("rapid", 0) in toks and ("car", 1) in toks


def test_english_index_end_to_end(spark, tmp_root):
    """Stemmed index: a query for 'connection' must hit docs that only
    contain morphological variants."""
    import os
    from lucene_1_spark.index import IndexBuilder, IndexReader
    from lucene_1_spark.index.builder import IndexConfig
    from lucene_1_spark.search import IndexSearcher
    rows = [("r", f"d{i}", "c", "x", t) for i, t in enumerate([
        "the connected pipeline", "connecting services", "connection pool",
        "a totally unrelated document", "disconnected graphs"])]
    src = spark.createDataFrame(
        rows, "repo string, path string, commit string, lang string, "
              "content string")
    d = os.path.join(tmp_root, "idx_english")
    IndexBuilder(spark, d, IndexConfig(analyzer="english", n_buckets=4,
                                       n_doc_partitions=2)).build(src)
    s = IndexSearcher(IndexReader(spark, d))
    hits = {h["path"] for h in s.search("connection", k=10)}
    assert hits == {"d0", "d1", "d2"}


def test_offsets_attribute_standard():
    """OffsetAttribute analog: spans index the ORIGINAL text (case
    preserved at the source, term lowercased), positions advance past
    filtered tokens."""
    from lucene_1_spark.analysis import get_analyzer
    an = get_analyzer("standard")
    text = "Hello, World's  end"
    out = an.tokens_with_offsets(text)
    assert out == [("hello", 0, 0, 5), ("world's", 1, 7, 14),
                   ("end", 2, 16, 19)]
    for term, _, s, e in out:
        assert text[s:e].lower() == term
    # consistency with the positions attribute
    assert [(t, p) for t, p, _, _ in out] == an.tokens_with_positions(text)


def test_offsets_attribute_whitespace():
    from lucene_1_spark.analysis import get_analyzer
    an = get_analyzer("whitespace")
    text = " Spark  SQL "
    assert an.tokens_with_offsets(text) == [("spark", 0, 1, 6),
                                            ("sql", 1, 8, 11)]


def test_ascii_folding_analyzer():
    from lucene_1_spark.analysis import get_analyzer
    fa = get_analyzer("folded:whitespace")
    assert fa.tokens("café naïve øre straße æsir łódź") == \
        ["cafe", "naive", "ore", "strasse", "aesir", "lodz"]
    # positions preserved through the fold
    assert fa.tokens_with_positions("crème brûlée") == \
        [("creme", 0), ("brulee", 1)]


def test_icu_fold():
    """ICUFoldingFilter analog (lucene/analysis/icu/ICUFoldingFilter
    .java): width + ligature + accent + case + normalization-form
    folding through NFKD -> strip Mn -> casefold -> NFKC."""
    from lucene_1_spark.analysis import get_analyzer
    from lucene_1_spark.analysis.icu import icu_fold
    assert icu_fold("CAFÉ") == "cafe"          # precomposed É
    assert icu_fold("café") == "cafe"         # combining acute
    assert icu_fold("ｃａｆé") == "cafe"  # full-width
    assert icu_fold("ﬁle") == "file"           # ﬁ ligature
    assert icu_fold("straße") == "strasse"     # ß casefold
    assert icu_fold("İstanbul") == "i̇stanbul" or \
        icu_fold("İstanbul").startswith("i")   # dotted capital I
    a = get_analyzer("icu_fold")
    # mixed normalization forms of the same word land on ONE term
    assert a.tokens("CAFÉ café ｃａｆé") \
        == ["cafe", "cafe", "cafe"]
    assert a.tokens("Ärger Ärger") == ["arger", "arger"]
