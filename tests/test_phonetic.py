"""Phonetic analysis (``lucene/analysis/phonetic`` PhoneticFilter +
Soundex encoder analog): published golden vectors, SQL-twin identity,
inject positions, and end-to-end misspelling recall."""

import os

import duckdb
import pytest

from lucene_1_spark import corpus as corpus_mod
from lucene_1_spark.analysis import get_analyzer
from lucene_1_spark.analysis.phonetic import soundex, soundex_sql
from lucene_1_spark.index import IndexBuilder, IndexReader
from lucene_1_spark.index.builder import IndexConfig
from lucene_1_spark.search import IndexSearcher

# NARA / commons-codec published examples (Soundex.US_ENGLISH)
GOLD = {"Robert": "R163", "Rupert": "R163", "Ashcraft": "A261",
        "Ashcroft": "A261", "Tymczak": "T522", "Pfister": "P236",
        "Honeyman": "H555", "Washington": "W252", "Lee": "L000",
        "Gutierrez": "G362", "Jackson": "J250"}


def test_soundex_golden_vectors():
    for w, code in GOLD.items():
        assert soundex(w) == code, w
    # case/garbage-insensitive; all-non-alpha passes through
    assert soundex("ROBERT") == soundex("robert") == "R163"
    assert soundex("r0b-ert") == "R163"
    assert soundex("123") == "123"


def test_soundex_sql_twin_identity():
    con = duckdb.connect()
    for w in list(GOLD) + ["spark", "spork", "w17", "123", "a", "hw"]:
        got = con.execute(f"SELECT {soundex_sql(repr(w))}").fetchone()[0]
        assert got == soundex(w), w


def test_phonetic_analyzer_modes():
    rep = get_analyzer("phonetic:whitespace")
    inj = get_analyzer("phonetic_inject:whitespace")
    assert rep.tokens("Robert rupert 123") == ["R163", "R163", "123"]
    # inject: original + code as a same-position twin (posInc=0)
    assert inj.tokens_with_positions("Robert 123") == [
        ("robert", 0), ("R163", 0), ("123", 1)]


def test_phonetic_end_to_end(spark, tmp_root):
    pdf = corpus_mod.generate(80)
    d = os.path.join(tmp_root, "idx_phonetic")
    IndexBuilder(spark, d, IndexConfig(
        analyzer="phonetic:standard", n_buckets=4,
        n_doc_partitions=4)).build(
        spark.createDataFrame(pdf).repartition(4, "repo"))
    s = IndexSearcher(IndexReader(spark, d))
    base = get_analyzer("standard")
    ordered = pdf.sort_values(["repo", "path", "commit"],
                              kind="mergesort").reset_index(drop=True)
    toks = [base.tokens(c) for c in ordered["content"]]
    # pick a real corpus token and misspell it phonetically: swap the
    # vowels for different ones (soundex is vowel-blind after pos 1)
    target = next(t for doc in toks for t in doc if t.isalpha()
                  and len(t) >= 4 and t[1] in "aeiou")
    missp = target[0] + {"a": "o", "e": "a", "i": "o", "o": "u",
                         "u": "i"}[target[1]] + target[2:]
    assert soundex(missp) == soundex(target) and missp != target
    got = {r["doc_id"] for r in s.search_df(missp, k=None).collect()}
    exp = {i for i, doc in enumerate(toks)
           if any(soundex(t) == soundex(target) for t in doc)}
    assert got == exp and got


def test_unknown_phonetic_spec():
    with pytest.raises(KeyError):
        get_analyzer("phonetics:standard")
