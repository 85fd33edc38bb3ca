"""Facets/grouping/rescoring collectors + CheckIndex integrity pass."""

import os

import pytest
from pyspark.sql import functions as F

from lucene_1_spark import corpus as corpus_mod
from lucene_1_spark import oracle as oracle_mod
from lucene_1_spark.index import IndexBuilder, IndexReader
from lucene_1_spark.index.builder import IndexConfig
from lucene_1_spark.index.check import check_index
from lucene_1_spark.search import IndexSearcher
from lucene_1_spark.search import facets as FX


@pytest.fixture(scope="module")
def ctx(spark, tmp_root):
    pdf = corpus_mod.t_small()
    d = os.path.join(tmp_root, "idx_facets")
    src = spark.createDataFrame(pdf).repartition(8, "repo")
    IndexBuilder(spark, d, IndexConfig(n_buckets=8, n_doc_partitions=8)) \
        .build(src)
    searcher = IndexSearcher(IndexReader(spark, d))
    oidx = oracle_mod.build_oracle_index(pdf)
    return searcher, oidx, src


def test_facet_counts_match_oracle(ctx):
    searcher, oidx, _ = ctx
    got = {r["value"]: r["n"]
           for r in FX.facet_counts(searcher, "tok0", "lang").collect()}
    # oracle: langs of matching docs
    matches = [d for d, _, _ in oracle_mod.search_oracle(oidx, "tok0", k=10**9)]
    docs = searcher.reader.docs().select("doc_id", "lang").toPandas() \
        .set_index("doc_id")["lang"]
    exp = docs.loc[matches].value_counts().to_dict()
    assert got == exp


def test_sampled_facets_shape(ctx):
    searcher, _, _ = ctx
    rows = FX.sampled_facet_counts(searcher, "tok0", "lang", 0.5).collect()
    assert all(r["n_estimate"] >= 0 for r in rows)


def test_group_top_k(ctx):
    searcher, oidx, _ = ctx
    rows = FX.group_top_k(searcher, "tok1 tok2", "lang", 2).collect()
    per_group = {}
    for r in rows:
        per_group.setdefault(r["group"], []).append(r)
    for g, rs in per_group.items():
        assert [r["rnk"] for r in sorted(rs, key=lambda x: x["rnk"])] \
            == list(range(1, len(rs) + 1))
        assert len(rs) <= 2
    # top-1 overall appears as rank 1 of its group
    top = oracle_mod.search_oracle(oidx, "tok1 tok2", k=1)[0]
    lang = searcher.reader.docs().filter(F.col("doc_id") == top[0]) \
        .collect()[0]["lang"]
    assert any(r["doc_id"] == top[0] and r["rnk"] == 1
               for r in per_group[lang])


def test_distinct_values(ctx):
    searcher, _, _ = ctx
    vals = {r["value"] for r in
            FX.distinct_group_values(searcher, "tok0", "lang").collect()}
    assert vals <= {"python", "java", "rust", "markdown", "text"}
    assert len(vals) >= 2


def test_rescore(ctx):
    searcher, oidx, _ = ctx
    first = searcher.search_df("tok1", k=20)
    res = FX.rescore(searcher, first, "tok2", 1.0, 1.0, k=10).collect()
    assert len(res) > 0
    # weighted-sum equals oracle combination for the surviving docs
    o1 = dict((d, s) for d, _, s in oracle_mod.search_oracle(oidx, "tok1", k=10**9))
    o2 = dict((d, s) for d, _, s in oracle_mod.search_oracle(oidx, "tok2", k=10**9))
    for r in res:
        exp = o1[r["doc_id"]] + o2.get(r["doc_id"], 0.0)
        assert abs(r["score"] - exp) < 1e-5


def test_check_index_clean(ctx):
    searcher, _, src = ctx
    report = check_index(searcher.reader, source=src)
    assert all(ok for ok, _ in report.values()), report


def test_check_index_detects_corruption(spark, tmp_root, ctx):
    """Tamper with a copied index's manifest stats -> check must fail."""
    import json
    import shutil
    searcher, _, _ = ctx
    src_dir = searcher.reader.dir
    bad = os.path.join(tmp_root, "idx_corrupt")
    shutil.copytree(src_dir, bad)
    mp = os.path.join(bad, "manifest.json")
    with open(mp) as fh:
        m = json.load(fh)
    m["collection_stats"]["sum_total_term_freq"] += 1
    with open(mp, "w") as fh:
        json.dump(m, fh)
    report = check_index(IndexReader(spark, bad))
    assert not report["collection_stats"][0]


def test_association_facet_aggregates(ctx):
    """TaxonomyFacetIntAssociations.sum / FloatAssociations.max: the
    per-label aggregate of association VALUES (not doc counts), checked
    against a pandas brute force over the oracle match set."""
    searcher, oidx, _ = ctx
    matches = [d for d, _, _ in
               oracle_mod.search_oracle(oidx, "tok0", k=10**9)]
    docs_pd = (searcher.reader.docs().select("doc_id", "lang", "length")
               .toPandas().set_index("doc_id"))
    m = searcher.search_df("tok0", k=None).select("doc_id")
    j = m.join(searcher.reader.docs().select("doc_id", "lang", "length"),
               "doc_id").withColumn(
        "assoc", F.array(F.struct(
            F.concat(F.lit("lang/"), F.col("lang")).alias("path"),
            F.col("length").cast("double").alias("value"))))
    got_sum = {r["path"]: r["total"] for r in
               FX.association_facet_aggregates(j, "assoc", "sum").collect()}
    got_max = {r["path"]: r["total"] for r in
               FX.association_facet_aggregates(j, "assoc", "max").collect()}
    exp_sum, exp_max = {}, {}
    for d in matches:
        p = "lang/" + docs_pd.loc[d, "lang"]
        v = float(docs_pd.loc[d, "length"])
        exp_sum[p] = exp_sum.get(p, 0.0) + v
        exp_max[p] = max(exp_max.get(p, float("-inf")), v)
    assert set(got_sum) == set(exp_sum)
    for p in exp_sum:
        assert abs(got_sum[p] - exp_sum[p]) < 1e-6
    assert got_max == exp_max
    with pytest.raises(ValueError):
        FX.association_facet_aggregates(j, "assoc", "median")
