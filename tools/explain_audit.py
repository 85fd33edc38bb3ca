"""Physical-plan audit: assert the plans Catalyst produces are the ones
we designed for 100 TB:

1. postings term lookup -> parquet PartitionFilters on `bucket`
   (partition pruning = the term-dictionary seek) + PushedFilters on
   `term`;
2. top-k -> TakeOrderedAndProject (per-partition top-k + driver merge,
   never a global sort);
3. stored-field retrieval join of k rows -> BroadcastHashJoin;
4. docs scan for facets -> only the needed columns in ReadSchema.

Run: python tools/explain_audit.py  (exits 1 on any audit failure)
"""

from __future__ import annotations

import os
import shutil
import sys
import tempfile

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

from pyspark.sql import functions as F  # noqa: E402

from lucene_1_spark import corpus as corpus_mod  # noqa: E402
from lucene_1_spark.index import IndexReader, build_index  # noqa: E402
from lucene_1_spark.index.builder import IndexConfig  # noqa: E402
from lucene_1_spark.search import IndexSearcher  # noqa: E402
from lucene_1_spark.session import get_spark  # noqa: E402


def plan_of(df) -> str:
    return df._sc._jvm.PythonSQLUtils.explainString(
        df._jdf.queryExecution(), "formatted")


def audit(name: str, plan: str, must_contain: list[str],
          must_not: list[str] = ()) -> bool:
    ok = True
    for s in must_contain:
        if s not in plan:
            print(f"FAIL {name}: plan missing {s!r}")
            ok = False
    for s in must_not:
        if s in plan:
            print(f"FAIL {name}: plan contains {s!r}")
            ok = False
    if ok:
        print(f"PASS {name}")
    return ok


def main() -> int:
    spark = get_spark("explain-audit", cores=8, shuffle_partitions=8)
    spark.sparkContext.setLogLevel("ERROR")
    idx_dir = os.path.join(tempfile.gettempdir(), "l1s_audit_idx")
    if not os.path.exists(os.path.join(idx_dir, "manifest.json")):
        shutil.rmtree(idx_dir, ignore_errors=True)
        src = spark.createDataFrame(corpus_mod.t_small()).repartition(8, "repo")
        build_index(spark, src, idx_dir,
                    IndexConfig(n_buckets=8, n_doc_partitions=8))
    reader = IndexReader(spark, idx_dir)
    searcher = IndexSearcher(reader)
    ok = True

    # 1. term lookup: partition pruning on bucket + term pushdown
    terms = ["tok1", "tok7"]
    buckets = sorted(set(reader.buckets_of(terms).values()))
    lookup = (reader.postings()
              .filter(F.col("bucket").isin(buckets))
              .filter(F.col("term").isin(terms)))
    p = plan_of(lookup)
    ok &= audit("term_lookup_partition_pruning", p,
                ["PartitionFilters: [bucket", "PushedFilters: [In(term"])

    # 2. top-k compiles to TakeOrderedAndProject, not a global Sort+Limit
    top = searcher.search_df("tok1 tok2", k=10, prune=False)
    p = plan_of(top)
    ok &= audit("topk_take_ordered", p, ["TakeOrderedAndProject"])

    # 3. stored-field retrieval: broadcast join of the k hits
    hits = searcher.search_df("tok1", k=10)
    joined = F.broadcast(hits).join(reader.docs(), "doc_id")
    p = plan_of(joined)
    ok &= audit("stored_fields_broadcast", p, ["BroadcastHashJoin"])

    # 4. column pruning: a 2-column projection reads a 2-3 column schema
    docs2col = reader.docs().select("doc_id", "lang")
    p = plan_of(docs2col)
    ok &= audit("docs_column_pruning", p, ["ReadSchema: struct<doc_id:bigint,lang:string>"])

    # 5. multi-term dictionary scan: prefix predicate pushed to parquet
    from lucene_1_spark.search.query import PrefixQuery
    dict_scan = reader.term_stats().filter(
        searcher._multi_term_predicate(PrefixQuery("tok1")))
    p = plan_of(dict_scan)
    ok &= audit("dictionary_prefix_pushdown", p,
                ["PushedFilters: [IsNotNull(term), StringStartsWith(term"])

    # 6. sort-by-field top-k also compiles to TakeOrderedAndProject
    p = plan_of(searcher.search_sorted("tok1", by=[("lang", "asc")], k=10))
    ok &= audit("sort_by_field_take_ordered", p, ["TakeOrderedAndProject"])

    # 7. doc-values range FILTER: predicate pushed to the docs scan
    from lucene_1_spark.search.query import (BooleanQuery, Clause,
                                             DocValuesRangeQuery, Occur,
                                             TermQuery)
    q = BooleanQuery((Clause(TermQuery("tok1"), Occur.MUST),
                      Clause(DocValuesRangeQuery("length", 50, 200),
                             Occur.FILTER)))
    p = plan_of(searcher.search_df(q, k=10))
    ok &= audit("dv_range_pushdown", p,
                ["GreaterThanOrEqual(length,50"])
    ok &= audit("composite_topk_take_ordered", p, ["TakeOrderedAndProject"])

    # 8. filtered kNN: the allowed-id set joins BEFORE cosine top-k
    import numpy as np

    from lucene_1_spark.search.query import KnnVectorQuery
    n = searcher.reader.stats["n_docs"]
    vecs = np.random.RandomState(5).normal(size=(min(n, 64), 4))
    emb = searcher.spark.createDataFrame(
        [(i, [float(x) for x in vecs[i]]) for i in range(len(vecs))],
        "doc_id long, embedding array<double>")
    p = plan_of(searcher.knn_search(
        emb, KnnVectorQuery(tuple(float(x) for x in vecs[0]), k=5,
                            filter=TermQuery("tok1"))))
    ok &= audit("knn_prefilter_semi_join", p, ["LeftSemi"])
    ok &= audit("knn_topk_take_ordered", p, ["TakeOrderedAndProject"])

    # 9. dismax: final fold is one hash aggregate + TakeOrdered (no
    # global sort, no cartesian)
    from lucene_1_spark.search.query import DisjunctionMaxQuery
    dm = DisjunctionMaxQuery((TermQuery("tok1"), TermQuery("tok2")), 0.3)
    p = plan_of(searcher.search_df(dm, k=10))
    ok &= audit("dismax_take_ordered", p, ["TakeOrderedAndProject"],
                must_not=["CartesianProduct"])

    # 10. term-in-set: single scan with the IN-set pushed to bucket
    # partition pruning + term predicate
    from lucene_1_spark.search.query import TermInSetQuery
    p = plan_of(searcher.search_df(
        TermInSetQuery(("tok1", "tok2", "tok3")), k=None))
    ok &= audit("term_in_set_pushdown", p,
                ["PartitionFilters: [bucket", "PushedFilters: [In(term"])

    # 11. geo distance: box ranges reach the scan as pushable filters
    from lucene_1_spark.functions.geo import distance_query
    pts_dir = os.path.join(tempfile.gettempdir(), "l1s_audit_geo")
    if not os.path.exists(os.path.join(pts_dir, "_SUCCESS")):
        spark.range(2000).select(
            F.col("id").alias("doc_id"),
            ((F.col("id") * 7919 % 18000) / 100.0 - 90.0).alias("lat"),
            ((F.col("id") * 104729 % 36000) / 100.0 - 180.0).alias("lon")) \
            .write.mode("overwrite").parquet(pts_dir)
    pts = spark.read.parquet(pts_dir)
    p = plan_of(distance_query(pts, center_lat=12.3, center_lon=45.6,
                               radius_m=1e6))
    ok &= audit("geo_box_pushdown", p,
                ["GreaterThanOrEqual(lat", "LessThanOrEqual(lon"])

    # 12. suggester lookup: top-k is TakeOrderedAndProject over the
    # prefix candidates — a broad 1-2 char prefix must NOT funnel every
    # candidate through a single global-window task (the final
    # row_number over the k survivors is bounded and fine)
    from lucene_1_spark.search.suggest import build_suggestions, lookup
    sugg_src = spark.range(2000).select(
        F.concat(F.lit("to"), (F.col("id") % 97).cast("string"))
        .alias("term"),
        (F.col("id") % 53 + 1).alias("weight"))
    sugg = build_suggestions(sugg_src, "term", "weight")
    p = plan_of(lookup(sugg, "to", k=5))
    ok &= audit("suggest_take_ordered", p, ["TakeOrderedAndProject"])

    # 13. persisted LSH index probe: the (table,bucket) disjunction is
    # all-partition-column, so the scan partition-prunes to the probed
    # buckets — the steady-state ANN serving shape (no signature scan)
    from lucene_1_spark.pipeline.similarity import lsh_assign, lsh_index_topk
    lsh_dir = os.path.join(tempfile.gettempdir(), "l1s_audit_lsh")
    if not os.path.exists(os.path.join(lsh_dir, "_SUCCESS")):
        emb2 = spark.range(500).select(
            F.col("id").alias("vec_id"),
            F.array(*[((F.col("id") * p % 1000) / 500.0 - 1.0)
                      for p in (7919, 104729, 1299709, 15485863)])
            .alias("embedding"))
        lsh_assign(emb2, dim=4, bits=4, tables=2) \
            .write.mode("overwrite").partitionBy("table", "bucket") \
            .parquet(lsh_dir)
    lsh_idx = spark.read.parquet(lsh_dir)
    p = plan_of(lsh_index_topk(lsh_idx, [0.1, -0.2, 0.3, 0.4], k=5,
                               bits=4, tables=2, multiprobe=2))
    ok &= audit("lsh_index_partition_pruning", p,
                ["PartitionFilters: [", "TakeOrderedAndProject"])

    print("ALL PASS" if ok else "AUDIT FAILURES")
    return 0 if ok else 1


if __name__ == "__main__":
    sys.exit(main())
