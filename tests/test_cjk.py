"""CJK bigram analyzer — golden tests against the reference's
``TestCJKAnalyzer`` / ``TestCJKBigramFilter`` expectations
(``lucene/analysis/common/src/test/.../cjk/TestCJKAnalyzer.java``,
``TestCJKBigramFilter.java``), plus an end-to-end index/search pass on
a CJK fixture corpus."""

import os

import numpy as np
import pytest
from pyspark.sql import functions as F

from lucene_1_spark.analysis import get_analyzer
from lucene_1_spark.analysis.cjk import (ALL_SCRIPTS, HAN, CJKAnalyzer,
                                         cjk_width_fold)

RAW = CJKAnalyzer(stop_words=frozenset())


# -- goldens from TestCJKAnalyzer.java ---------------------------------------

@pytest.mark.parametrize("text,expected", [
    # testJa1: Han run -> overlapping bigrams
    ("一二三四五六七八九十",
     ["一二", "二三", "三四", "四五", "五六", "六七", "七八", "八九", "九十"]),
    # testJa2: spaces break bigram chains; lone chars emit unigrams
    ("一 二三四 五六七八九 十",
     ["一", "二三", "三四", "五六", "六七", "七八", "八九", "十"]),
    # testC: pure latin passes through the word rules
    ("abc defgh ijklmn opqrstu vwxy z",
     ["abc", "defgh", "ijklmn", "opqrstu", "vwxy", "z"]),
    # testMix: latin between kana runs
    ("あいうえおabcかきくけこ",
     ["あい", "いう", "うえ", "えお", "abc", "かき", "きく", "くけ", "けこ"]),
    # testMix2: isolated ん between latin letters -> unigram
    ("あいうえおabんcかきくけ こ",
     ["あい", "いう", "うえ", "えお", "ab", "ん", "c",
      "かき", "きく", "くけ", "こ"]),
    # testNonIdeographic(+NonLetter): Arabic (with nonspacing mark)
    ("一 روبرت موير", ["一", "روبرت", "موير"]),
    ("一 رُوبرت موير", ["一", "رُوبرت", "موير"]),
    # testSurrogates: supplementary-plane Han bigrams
    ("𩬅艱鍟䇹愯瀛", ["𩬅艱", "艱鍟", "鍟䇹", "䇹愯", "愯瀛"]),
    # testAllScripts (TestCJKBigramFilter)
    ("多くの学生が試験に落ちた。",
     ["多く", "くの", "の学", "学生", "生が", "が試", "試験", "験に",
      "に落", "落ち", "ちた"]),
    # testFinalOffset shapes
    ("あい", ["あい"]),
    ("testあい    ", ["test", "あい"]),
    # Hangul runs
    ("한국어 처리", ["한국", "국어", "처리"]),
])
def test_reference_goldens(text, expected):
    assert RAW.tokens(text) == expected


def test_han_only_flags():
    """TestCJKBigramFilter.testHanOnly: non-selected scripts pass
    through un-bigrammed; Han pairs still bigram."""
    a = CJKAnalyzer(flags=HAN, stop_words=frozenset())
    assert a.tokens("多くの学生が試験に落ちた。") == \
        ["多", "く", "の", "学生", "が", "試験", "に", "落", "ち", "た"]


def test_unigram_bigram_mode_positions():
    """testUnigramsAndBigramsAllScripts: A + AB(posInc 0) + B + ..."""
    ub = CJKAnalyzer(output_unigrams=True, stop_words=frozenset())
    got = ub.tokens_with_positions("多くの学生が試験に落ちた。")
    terms = ["多", "多く", "く", "くの", "の", "の学", "学", "学生", "生",
             "生が", "が", "が試", "試", "試験", "験", "験に", "に", "に落",
             "落", "落ち", "ち", "ちた", "た"]
    pos = [0, 0, 1, 1, 2, 2, 3, 3, 4, 4, 5, 5, 6, 6, 7, 7, 8, 8,
           9, 9, 10, 10, 11]
    assert got == list(zip(terms, pos))


def test_width_folding():
    """CJKWidthFilter: fullwidth ASCII + halfwidth (voiced) katakana."""
    assert cjk_width_fold("Ｔｅｓｔ　１２３４") == "Test　1234"
    assert cjk_width_fold("ｶﾀｶﾅ") == "カタカナ"
    assert cjk_width_fold("ｳﾞｨｯﾂ") == "ヴィッツ"   # voiced mark combines
    assert RAW.tokens("Ｔｅｓｔ") == ["test"]
    assert RAW.tokens("ｶﾞｷﾞｸﾞ") == ["ガギ", "ギグ"]


def test_offsets_index_folded_text():
    got = RAW.tokens_with_offsets("一 二三四 五六七八九 十")
    assert got == [("一", 0, 0, 1), ("二三", 1, 2, 4), ("三四", 2, 3, 5),
                   ("五六", 3, 6, 8), ("六七", 4, 7, 9), ("七八", 5, 8, 10),
                   ("八九", 6, 9, 11), ("十", 7, 12, 13)]


def test_default_stop_set_and_positions():
    """Registry analyzer drops the reference's default (English) stop
    words, leaving position gaps."""
    an = get_analyzer("cjk")
    assert an.tokens("the 学生 and more") == ["学生", "more"]
    # 'the'(0) dropped, 学生 bigram at 1, 'and'(2) dropped, more at 3
    assert an.tokens_with_positions("the 学生 and more") == \
        [("学生", 1), ("more", 3)]


def test_registry_names():
    assert get_analyzer("cjk").output_unigrams is False
    assert get_analyzer("cjk_unigram").output_unigrams is True
    assert get_analyzer("cjk").flags == ALL_SCRIPTS


# -- end-to-end: index + BM25 search over a CJK corpus -----------------------

_CJK_DOCS = [
    ("r0", "a.txt", "c0", "ja", "多くの学生が試験に落ちた"),
    ("r0", "b.txt", "c0", "ja", "学生 は 試験 に 合格"),
    ("r0", "c.txt", "c0", "zh", "中文信息检索系统"),
    ("r0", "d.txt", "c0", "ko", "한국어 정보 검색"),
    ("r0", "e.txt", "c0", "ja", "試験 試験 試験"),
    ("r0", "f.txt", "c0", "en", "plain english text only"),
]


@pytest.fixture(scope="module")
def cjk_searcher(spark, tmp_root):
    from lucene_1_spark.index import IndexBuilder, IndexReader
    from lucene_1_spark.index.builder import IndexConfig
    from lucene_1_spark.search import IndexSearcher
    d = os.path.join(tmp_root, "idx_cjk")
    src = spark.createDataFrame(
        _CJK_DOCS, "repo string, path string, commit string, lang string,"
        " content string")
    IndexBuilder(spark, d, IndexConfig(
        analyzer="cjk", n_buckets=4, n_doc_partitions=2,
        positions=True)).build(src)
    return IndexSearcher(IndexReader(spark, d))


def _brute_bm25(searcher, term):
    """Float32 BM25 by hand (modern Lucene curve, no (k1+1) numerator —
    ``BM25Similarity.java`` since LUCENE-8563), mirroring
    ``functions/bm25.py`` arithmetic exactly."""
    from lucene_1_spark.functions import bm25
    from lucene_1_spark.functions.smallfloat import int_to_byte4
    an = get_analyzer("cjk")
    docs = {(r, p): an.tokens(c) for r, p, _, _, c in _CJK_DOCS}
    N = len(docs)
    dfreq = sum(1 for t in docs.values() if term in t)
    avgdl = bm25.avg_field_length(
        sum(len(t) for t in docs.values()), N)
    w = bm25.idf(dfreq, N)
    inv = bm25.norm_inverse_cache(avgdl)
    out = {}
    for key, toks in docs.items():
        f = toks.count(term)
        if not f:
            continue
        i = inv[int_to_byte4(len(toks)) & 0xFF]
        out[key] = float(np.float32(
            w - w / (np.float32(1.0) + np.float32(f) * i)))
    return out


def test_cjk_index_search_bigram_term(spark, cjk_searcher):
    """A bigram term query ranks by Lucene-float32 BM25."""
    hits = cjk_searcher.search("試験", k=10)
    docs = {r["doc_id"]: r for r in
            cjk_searcher.reader.docs().collect()}
    got = {(docs[h["doc_id"]]["repo"], docs[h["doc_id"]]["path"]):
           float(np.float32(h["score"])) for h in hits}
    exp = _brute_bm25(cjk_searcher, "試験")
    assert set(got) == set(exp)
    for key in exp:
        assert got[key] == pytest.approx(exp[key], rel=1e-6), key


def test_cjk_phrase_search(cjk_searcher):
    """Adjacent bigrams form a phrase: 中文信息 matches as the bigram
    sequence 中文,文信 at consecutive positions."""
    from lucene_1_spark.search.query import PhraseQuery
    hits = cjk_searcher.search(PhraseQuery(("中文", "文信")), k=10)
    assert len(hits) == 1
    hits2 = cjk_searcher.search(PhraseQuery(("中文", "信息")), k=10)
    assert len(hits2) == 0  # not adjacent in bigram space


def test_mixed_hangul_latin_runs_match_reference():
    """VERDICT r4 item: Hangul is WB:ALetter, so mixed Hangul+Latin
    runs join into ONE <ALPHANUM> token passed through un-bigrammed
    (StandardTokenizerImpl.jflex:219-221 "subset ... for typing
    purposes only"; CJKBigramFilter.java:44-49); only pure-Hangul runs
    type <HANGUL> and bigram.  Goldens adapted from the reference's
    TestCJKAnalyzer (testMix/testMix2/testNonIdeographic/
    testSurrogates) plus the mixed-Hangul cases."""
    from lucene_1_spark.analysis.cjk import CJKAnalyzer
    a = CJKAnalyzer()
    cases = [
        ("あいうえおabcかきくけこ",
         ["あい", "いう", "うえ", "えお", "abc",
          "かき", "きく", "くけ", "けこ"]),
        ("あいうえおabんcかきくけ こ",
         ["あい", "いう", "うえ", "えお", "ab", "ん", "c",
          "かき", "きく", "くけ", "こ"]),
        ("一 روبرت موير", ["一", "روبرت", "موير"]),
        ("𩬅艱鍟䇹愯瀛", ["𩬅艱", "艱鍟", "鍟䇹", "䇹愯", "愯瀛"]),
        ("한국abc", ["한국abc"]),
        ("abc한국", ["abc한국"]),
        ("한국123", ["한국123"]),
        ("한국 abc", ["한국", "abc"]),
        ("한국어 형태소", ["한국", "국어", "형태", "태소"]),
        ("あいtest", ["あい", "test"]),
        ("testあい", ["test", "あい"]),
    ]
    for text, want in cases:
        assert a.tokens(text) == want, text
