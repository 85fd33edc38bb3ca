"""SynonymQuery merged-stats scoring and ConstantScoreQuery."""

import os

import numpy as np
import pytest

from lucene_1_spark import corpus as corpus_mod
from lucene_1_spark import oracle as oracle_mod
from lucene_1_spark.functions import bm25
from lucene_1_spark.index import IndexBuilder, IndexReader
from lucene_1_spark.index.builder import IndexConfig
from lucene_1_spark.search import IndexSearcher
from lucene_1_spark.search.query import (ConstantScoreQuery, SynonymQuery,
                                         TermQuery)


@pytest.fixture(scope="module")
def ctx(spark, tmp_root):
    pdf = corpus_mod.t_small()
    d = os.path.join(tmp_root, "idx_syn")
    src = spark.createDataFrame(pdf).repartition(8, "repo")
    IndexBuilder(spark, d, IndexConfig(n_buckets=8, n_doc_partitions=8)) \
        .build(src)
    return IndexSearcher(IndexReader(spark, d)), \
        oracle_mod.build_oracle_index(pdf)


def oracle_synonym(oidx, terms, k=10):
    """Reference semantics: df=max over members, freq=sum per doc."""
    present = [t for t in terms if t in oidx.postings]
    if not present:
        return []
    merged_df = max(len(oidx.postings[t]) for t in present)
    weight = np.float32(bm25.idf(merged_df, oidx.doc_count))
    avgdl = bm25.avg_field_length(oidx.sum_total_term_freq, oidx.doc_count)
    cache = bm25.norm_inverse_cache(avgdl)
    freqs: dict[int, int] = {}
    for t in present:
        for d, f in oidx.postings[t].items():
            freqs[d] = freqs.get(d, 0) + f
    out = []
    for d, f in freqs.items():
        s = bm25.score_term(np.array([f]), oidx.norm_bytes[d:d + 1],
                            weight, cache)
        out.append((d, float(s[0])))
    out.sort(key=lambda r: (-r[1], r[0]))
    return out[:k]


def test_synonym_matches_reference_semantics(ctx):
    searcher, oidx = ctx
    for terms in [("tok3", "tok33"), ("def", "class", "fn"),
                  ("tok0", "zzz_absent")]:
        exp = oracle_synonym(oidx, list(terms))
        got = searcher.search_df(SynonymQuery(terms), k=10).collect()
        assert [r["doc_id"] for r in got] == [d for d, _ in exp[:10]], terms
        for r, (_, s) in zip(got, exp):
            assert np.float32(r["score"]) == np.float32(s), (terms, r, s)


def test_synonym_all_absent(ctx):
    searcher, _ = ctx
    assert searcher.search_df(SynonymQuery(("zzz", "qqq")), k=5).count() == 0


def test_constant_score(ctx):
    searcher, oidx = ctx
    q = ConstantScoreQuery(TermQuery("tok1"), boost=2.5)
    got = searcher.search_df(q, k=5).collect()
    matching = sorted(oidx.postings["tok1"])
    assert [r["doc_id"] for r in got] == matching[:5]
    assert all(abs(r["score"] - 2.5) < 1e-6 for r in got)
