"""Multi-field indexing: keyword fields as composite postings
(``index/IndexingChain.java:561`` per-field postings; per-field norms
``Similarity.java:152``) — field-scoped TermQuery, parser ``field:``,
per-field BM25 stats, content stats unpolluted, compaction-safe."""

import os

import numpy as np
import pytest
from pyspark.sql import functions as F

from lucene_1_spark import corpus as corpus_mod
from lucene_1_spark.functions import bm25
from lucene_1_spark.functions.smallfloat import int_to_byte4
from lucene_1_spark.index import IndexBuilder, IndexReader
from lucene_1_spark.index.builder import IndexConfig
from lucene_1_spark.search import IndexSearcher
from lucene_1_spark.search.query import (BooleanQuery, Clause, Occur,
                                         TermQuery, parse_query)

CFG = dict(n_buckets=8, n_doc_partitions=4, positions=True,
           keyword_fields=("lang",))


@pytest.fixture(scope="module")
def kw_index(spark, tmp_root):
    pdf = corpus_mod.generate(250)
    d = os.path.join(tmp_root, "idx_kwfields")
    src = spark.createDataFrame(pdf).repartition(4, "repo")
    IndexBuilder(spark, d, IndexConfig(**CFG)).build(src)
    return d, pdf


@pytest.fixture(scope="module")
def kws(spark, kw_index):
    d, _ = kw_index
    return IndexSearcher(IndexReader(spark, d))


def _keyword_score(searcher, value: str) -> float:
    """Expected float32 BM25 for a keyword-field match: freq=1, field
    length 1, field avgdl 1, idf over the FIELD's doc_count."""
    fs = searcher.reader.manifest["field_stats"]["lang"]
    stats = searcher.reader.term_statistics([f"lang\x1f{value}"])
    df = stats[f"lang\x1f{value}"][0]
    w = bm25.term_weight(df, fs["doc_count"])
    cache = bm25.norm_inverse_cache(np.float32(1.0), np.float32(1.2),
                                    np.float32(0.75))
    nb = int_to_byte4(np.array([1]))
    return float(bm25.score_term(np.array([1]), nb, w, cache)[0])


def _lang_docs(searcher, value: str) -> set[int]:
    return {r["doc_id"] for r in searcher.reader.docs()
            .filter(F.col("lang") == value).select("doc_id").collect()}


def test_keyword_term_query_matches_and_scores(kws, kw_index):
    _, pdf = kw_index
    expect_docs = _lang_docs(kws, "python")
    assert len(expect_docs) > 0
    rows = kws.search_df(TermQuery("python", field="lang"), k=None).collect()
    got = {r["doc_id"]: float(np.float32(r["score"])) for r in rows}
    assert set(got) == expect_docs
    exp = np.float32(_keyword_score(kws, "python"))
    assert all(np.float32(s) == exp for s in got.values())


def test_parser_field_colon_routes_to_keyword_field(kws):
    q = parse_query("lang:python", "standard", frozenset({"lang"}))
    assert q == TermQuery("python", 1.0, "lang")
    via_parser = {r["doc_id"] for r in
                  kws.search_df("lang:python", k=None).collect()}
    via_query = {r["doc_id"] for r in
                 kws.search_df(TermQuery("python", field="lang"),
                               k=None).collect()}
    assert via_parser == via_query and via_parser


def test_keyword_field_composes_in_boolean(kws):
    """+tok1 +lang:java — mixed content + keyword conjunction; the
    keyword MUST clause both restricts and contributes its score."""
    only = {r["doc_id"]: r["score"] for r in
            kws.search_df("tok1", k=None).collect()}
    mixed = {r["doc_id"]: r["score"] for r in
             kws.search_df("+tok1 +lang:java", k=None).collect()}
    java_docs = _lang_docs(kws, "java")
    assert set(mixed) == set(only) & java_docs and mixed
    kw_s = _keyword_score(kws, "java")
    for d, s in mixed.items():
        assert np.float32(s) == np.float32(float(only[d]) + kw_s), d


def test_keyword_filter_clause_not_scored(kws):
    q = BooleanQuery((Clause(TermQuery("tok1"), Occur.MUST),
                      Clause(TermQuery("rust", field="lang"), Occur.FILTER)))
    only = {r["doc_id"]: r["score"] for r in
            kws.search_df("tok1", k=None).collect()}
    got = {r["doc_id"]: r["score"] for r in kws.search_df(q, k=None).collect()}
    rust_docs = _lang_docs(kws, "rust")
    assert set(got) == set(only) & rust_docs and got
    for d, s in got.items():
        assert s == only[d], d


def test_content_stats_unpolluted_by_keyword_postings(spark, tmp_root,
                                                      kw_index):
    """sum_doc_freq / collection stats count CONTENT postings only —
    identical to a build without keyword fields."""
    d, pdf = kw_index
    d2 = os.path.join(tmp_root, "idx_kwfields_ref")
    cfg = {**CFG, "keyword_fields": ()}
    IndexBuilder(spark, d2, IndexConfig(**cfg)).build(
        spark.createDataFrame(pdf).repartition(4, "repo"))
    a = IndexReader(spark, d).stats
    b = IndexReader(spark, d2).stats
    assert a == b


def test_content_queries_unchanged_by_keyword_fields(spark, kw_index,
                                                     tmp_root, kws):
    d2 = os.path.join(tmp_root, "idx_kwfields_ref")  # built above
    s2 = IndexSearcher(IndexReader(spark, d2))
    for q in ["tok0", "+tok1 +tok2", '"tok0 tok1"', "tok3 tok4"]:
        a = sorted((r["doc_id"], np.float32(r["score"]))
                   for r in kws.search_df(q, k=None).collect())
        b = sorted((r["doc_id"], np.float32(r["score"]))
                   for r in s2.search_df(q, k=None).collect())
        assert a == b, q


def test_keyword_fields_survive_append_and_compaction(spark, tmp_root):
    from lucene_1_spark.streaming.incremental import IncrementalIndexWriter
    pdf = corpus_mod.generate(120)
    d = os.path.join(tmp_root, "idx_kw_incr")
    w = IncrementalIndexWriter(spark, d, IndexConfig(
        n_buckets=4, n_doc_partitions=2, keyword_fields=("lang",)))
    w.append(spark.createDataFrame(pdf.iloc[:80]), batch_id=0)
    w.append(spark.createDataFrame(pdf.iloc[80:]), batch_id=1)
    s = IndexSearcher(IndexReader(spark, d))
    fs = s.reader.manifest["field_stats"]["lang"]
    assert fs["doc_count"] == 120
    n_py = len(_lang_docs(s, "python"))
    got = s.search_df(TermQuery("python", field="lang"), k=None).count()
    assert got == n_py > 0
    w.compact()
    s = IndexSearcher(IndexReader(spark, d))
    assert s.reader.manifest["field_stats"]["lang"]["doc_count"] == 120
    assert s.search_df(TermQuery("python", field="lang"),
                       k=None).count() == n_py


def test_unknown_field_raises(kws):
    with pytest.raises(ValueError, match="not indexed"):
        kws.search_df(TermQuery("x", field="nope"), k=5).collect()
    with pytest.raises(ValueError, match="unknown field"):
        parse_query("nope:x", "standard", frozenset({"lang"}))


# ---------------------------------------------------------------------------
# analyzed text fields (full per-field postings, norms, positions)
# ---------------------------------------------------------------------------

@pytest.fixture(scope="module")
def txt_index(spark, tmp_root):
    pdf = corpus_mod.generate(200)
    d = os.path.join(tmp_root, "idx_textfields")
    src = (spark.createDataFrame(pdf)
           .withColumn("title", F.substring("content", 1, 60))
           .repartition(4, "repo"))
    IndexBuilder(spark, d, IndexConfig(
        n_buckets=8, n_doc_partitions=4, positions=True,
        text_fields=("title",))).build(src)
    return d, pdf


@pytest.fixture(scope="module")
def txts(spark, txt_index):
    d, _ = txt_index
    return IndexSearcher(IndexReader(spark, d))


def _title_tokens(pdf):
    from lucene_1_spark.analysis import get_analyzer
    an = get_analyzer("standard")
    out = {}
    for did, row in enumerate(
            pdf.sort_values(["repo", "path", "commit"],
                            kind="mergesort").itertuples(index=False)):
        out[did] = an.tokens_with_positions(row.content[:60])
    return out


def test_text_field_term_query_scores_with_field_stats(txts, txt_index):
    _, pdf = txt_index
    titles = _title_tokens(pdf)
    probe = "tok0"
    freqs = {d: sum(1 for t, _ in toks if t == probe)
             for d, toks in titles.items()}
    match_docs = {d for d, f in freqs.items() if f > 0}
    lens = {d: len(toks) for d, toks in titles.items()}
    fs = txts.reader.manifest["field_stats"]["title"]
    assert fs["doc_count"] == sum(1 for v in lens.values() if v > 0)
    assert fs["sum_total_term_freq"] == sum(lens.values())
    avgdl = np.float32(fs["sum_total_term_freq"]) / np.float32(
        max(fs["doc_count"], 1))
    from lucene_1_spark.functions.smallfloat import int_to_byte4
    cache = bm25.norm_inverse_cache(
        bm25.avg_field_length(fs["sum_total_term_freq"], fs["doc_count"]),
        np.float32(1.2), np.float32(0.75))
    w = bm25.term_weight(len(match_docs), fs["doc_count"])
    rows = txts.search_df(TermQuery(probe, field="title"),
                          k=None).collect()
    got = {r["doc_id"]: np.float32(r["score"]) for r in rows}
    assert set(got) == match_docs and match_docs
    for d in match_docs:
        nb = int_to_byte4(np.array([lens[d]]))
        exp = np.float32(bm25.score_term(
            np.array([freqs[d]]), nb, w, cache)[0])
        assert got[d] == exp, d


def test_text_field_phrase_query(txts, txt_index):
    _, pdf = txt_index
    titles = _title_tokens(pdf)
    # expected: docs whose title holds an adjacent (tok0, tok1) pair
    exp_docs = set()
    for d, toks in titles.items():
        pos = {}
        for t, p in toks:
            pos.setdefault(t, []).append(p)
        a = pos.get("tok0", [])
        b = set(pos.get("tok1", []))
        if any(p + 1 in b for p in a):
            exp_docs.add(d)
    from lucene_1_spark.search.query import PhraseQuery
    got = {r["doc_id"] for r in txts.search_df(
        PhraseQuery(("tok0", "tok1"), field="title"), k=None).collect()}
    assert got == exp_docs and exp_docs


def test_text_field_parser_and_content_isolation(spark, txts, txt_index,
                                                 tmp_root):
    # parser routes title:xyz to the field; content stats unpolluted
    via_parser = {r["doc_id"] for r in
                  txts.search_df("title:tok0", k=None).collect()}
    via_query = {r["doc_id"] for r in
                 txts.search_df(TermQuery("tok0", field="title"),
                                k=None).collect()}
    assert via_parser == via_query and via_parser
    d2 = os.path.join(tmp_root, "idx_textfields_ref")
    _, pdf = txt_index
    IndexBuilder(spark, d2, IndexConfig(
        n_buckets=8, n_doc_partitions=4, positions=True)).build(
        spark.createDataFrame(pdf).repartition(4, "repo"))
    assert IndexReader(spark, d2).stats == txts.reader.stats
    s2 = IndexSearcher(IndexReader(spark, d2))
    for q in ["tok0", "+tok1 +tok2", '"tok0 tok1"']:
        a = sorted((r["doc_id"], np.float32(r["score"]))
                   for r in txts.search_df(q, k=None).collect())
        b = sorted((r["doc_id"], np.float32(r["score"]))
                   for r in s2.search_df(q, k=None).collect())
        assert a == b, q


def test_text_field_survives_compaction(spark, txt_index):
    import shutil
    d, pdf = txt_index
    d3 = d + "_compact"
    shutil.rmtree(d3, ignore_errors=True)
    shutil.copytree(d, d3)
    from lucene_1_spark.index.maintenance import compact_index
    compact_index(spark, d3)
    s3 = IndexSearcher(IndexReader(spark, d3))
    assert s3.reader.manifest["field_stats"]["title"]["doc_count"] > 0
    before = {r["doc_id"] for r in IndexSearcher(IndexReader(spark, d))
              .search_df(TermQuery("tok0", field="title"), k=None).collect()}
    after = {r["doc_id"] for r in
             s3.search_df(TermQuery("tok0", field="title"),
                          k=None).collect()}
    assert before == after and before


def test_text_fields_survive_incremental_append(spark, tmp_root):
    """Per-segment appends accumulate text-field stats via the
    field_stats_delta path; fielded queries see both segments."""
    from lucene_1_spark.streaming.incremental import IncrementalIndexWriter
    pdf = corpus_mod.generate(120)
    d = os.path.join(tmp_root, "idx_txt_incr")
    w = IncrementalIndexWriter(spark, d, IndexConfig(
        n_buckets=4, n_doc_partitions=2, text_fields=("title",)))

    def src(lo, hi):
        return (spark.createDataFrame(pdf.iloc[lo:hi])
                .withColumn("title", F.substring("content", 1, 50)))

    w.append(src(0, 70), batch_id=0)
    w.append(src(70, 120), batch_id=1)
    s = IndexSearcher(IndexReader(spark, d))
    fs = s.reader.manifest["field_stats"]["title"]
    # expected field stats from a direct re-tokenize
    from lucene_1_spark.analysis import get_analyzer
    an = get_analyzer("standard")
    lens = [len(an.tokens(c[:50])) for c in pdf["content"]]
    assert fs["doc_count"] == sum(1 for x in lens if x > 0)
    assert fs["sum_total_term_freq"] == sum(lens)
    hits = s.search_df(TermQuery("tok0", field="title"), k=None).count()
    ordered = pdf.sort_values(["repo", "path", "commit"],
                              kind="mergesort").reset_index(drop=True)
    exp = sum(1 for c in ordered["content"]
              if "tok0" in an.tokens(c[:50]))
    assert hits == exp > 0
