"""Round-7 batch 2: HighFreqTerms, DynamicRangeUtil facets,
FreeTextSuggester stupid backoff, NRT replicator."""

import math
import os
from collections import Counter

import pytest
from pyspark.sql import functions as F

from lucene_1_spark import corpus as corpus_mod
from lucene_1_spark.analysis import get_analyzer
from lucene_1_spark.index import IndexBuilder, IndexReader
from lucene_1_spark.index.builder import IndexConfig
from lucene_1_spark.index.replicator import (cleanup_replica, copy_state,
                                             sync_replica)
from lucene_1_spark.search import IndexSearcher
from lucene_1_spark.search.collectors import (dynamic_range_facets,
                                              high_freq_terms)
from lucene_1_spark.search.suggest import (build_free_text_model,
                                           free_text_lookup)


@pytest.fixture(scope="module")
def built(spark, tmp_root):
    pdf = corpus_mod.generate(120)
    d = os.path.join(tmp_root, "idx_misc_r7")
    IndexBuilder(spark, d, IndexConfig(
        n_buckets=4, n_doc_partitions=4,
        keyword_fields=("lang",))).build(
        spark.createDataFrame(pdf).repartition(4, "repo"))
    an = get_analyzer("standard")
    ordered = pdf.sort_values(["repo", "path", "commit"],
                              kind="mergesort").reset_index(drop=True)
    toks = [an.tokens(c) for c in ordered["content"]]
    return IndexSearcher(IndexReader(spark, d)), toks, ordered


# ------------------------------------------------------- high freq terms

def test_high_freq_terms_matches_brute(built):
    se, toks, _ = built
    df_brute = Counter()
    ttf_brute = Counter()
    for doc in toks:
        ttf_brute.update(doc)
        df_brute.update(set(doc))
    got = high_freq_terms(se.reader, n=10, order_by="doc_freq").collect()
    exp = sorted(df_brute.items(), key=lambda kv: (-kv[1], kv[0]))[:10]
    assert [(r["term"], r["doc_freq"]) for r in got] == exp
    for r in got:
        assert r["total_term_freq"] == ttf_brute[r["term"]]
    # ttf ordering variant
    got2 = high_freq_terms(se.reader, n=5,
                           order_by="total_term_freq").collect()
    exp2 = sorted(ttf_brute.items(), key=lambda kv: (-kv[1], kv[0]))[:5]
    assert [(r["term"], r["total_term_freq"]) for r in got2] == exp2


def test_high_freq_terms_keyword_field(built):
    se, _, ordered = built
    got = {r["term"]: r["doc_freq"]
           for r in high_freq_terms(se.reader, n=10,
                                    field="lang").collect()}
    exp = Counter(ordered["lang"])
    assert got == dict(exp)


# --------------------------------------------------------- dynamic ranges

def test_dynamic_range_facets_matches_reference_algo(built):
    se, toks, _ = built
    from lucene_1_spark.search.query import TermQuery
    match_ids = sorted(r["doc_id"] for r in
                       se.search_df(TermQuery("tok3"), k=None).collect())
    lens = {r["doc_id"]: r["length"] for r in
            se.reader.docs().select("doc_id", "length").collect()}
    values = sorted(lens[d] for d in match_ids)
    topn = 4
    n = len(values)
    # reference greedy (unit weights), DynamicRangeUtil.java:204-270
    target = n / min(topn, n)
    ranges, acc, cnt, mn, vsum = [], 0, 0, None, 0
    for v in values:
        if mn is None:
            mn = v
        acc += 1
        cnt += 1
        vsum += v
        if acc >= target:
            ranges.append((cnt, mn, v, vsum / cnt))
            acc, cnt, mn, vsum = 0, 0, None, 0
    if cnt:
        ranges.append((cnt, mn, values[-1], vsum / cnt))
    got = dynamic_range_facets(se, TermQuery("tok3"), "length",
                               topn=topn).collect()
    assert len(got) == len(ranges)
    for r, (c, lo, hi, avg) in zip(got, ranges):
        assert r["n_docs"] == c
        assert r["min_v"] == float(lo) and r["max_v"] == float(hi)
        assert r["avg_v"] == pytest.approx(avg)


# ----------------------------------------------------------- free text

def test_free_text_stupid_backoff(spark):
    df = spark.createDataFrame(
        [(0, "a b a b a c"), (1, "a b x")],
        "doc_id long, text string")
    model = build_free_text_model(df, analyzer="whitespace")
    got = {r["word"]: r["score"]
           for r in free_text_lookup(model, "a", k=10,
                                     analyzer="whitespace").collect()}
    # counts: uni a=4 b=3 c=1 x=1 (total 9); bigrams from 'a': b=3, c=1
    assert got["b"] == pytest.approx(3 / 4)
    assert got["c"] == pytest.approx(1 / 4)
    assert got["x"] == pytest.approx(0.4 * 1 / 9)   # backoff
    # unseen context -> pure backoff over unigrams
    got2 = {r["word"]: r["score"]
            for r in free_text_lookup(model, "x", k=10,
                                      analyzer="whitespace").collect()}
    assert got2["a"] == pytest.approx(0.4 * 4 / 9)
    # last analyzed token is the context ("b a" -> context 'a')
    got3 = free_text_lookup(model, "b a", k=1,
                            analyzer="whitespace").collect()
    assert got3[0]["word"] == "b"


# ----------------------------------------------------------- replicator

def test_replicator_sync_resume_cleanup(spark, tmp_root, built):
    se, _, _ = built
    primary = se.reader.dir
    replica = os.path.join(tmp_root, "replica_r7")
    st = copy_state(primary)
    assert "manifest.json" not in st["files"] and st["files"]

    r1 = sync_replica(primary, replica)
    assert r1["copied"] == len(st["files"]) and r1["skipped"] == 0
    # replica searches == primary searches
    rse = IndexSearcher(IndexReader(spark, replica))
    p = [(r["doc_id"], r["score"]) for r in
         se.search_df("tok3 tok5", k=10).collect()]
    q = [(r["doc_id"], r["score"]) for r in
         rse.search_df("tok3 tok5", k=10).collect()]
    assert p == q

    # resume: second sync copies nothing
    r2 = sync_replica(primary, replica)
    assert r2["copied"] == 0 and r2["skipped"] == len(st["files"])

    # partial-failure resume: drop one file, re-sync restores only it
    victim = os.path.join(replica, st["files"][0])
    os.remove(victim)
    r3 = sync_replica(primary, replica)
    assert r3["copied"] == 1

    # cleanup: a stale generation dir vanishes once the manifest points
    # elsewhere
    import json
    stale = os.path.join(replica, "postings_g99")
    os.makedirs(stale, exist_ok=True)
    with open(os.path.join(stale, "part-0.parquet"), "w") as fh:
        fh.write("x")
    man = os.path.join(replica, "manifest.json")
    with open(man) as fh:
        m = json.load(fh)
    m["postings_path"] = m.get("postings_path", "postings")
    with open(man, "w") as fh:
        json.dump(m, fh)
    removed = cleanup_replica(replica)
    assert removed == 1 and not os.path.exists(stale)
    # live tables untouched
    assert IndexSearcher(IndexReader(spark, replica)) \
        .search_df("tok3", k=1).count() == 1
