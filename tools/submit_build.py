"""Cluster entry point: the full index build as a spark-submit job.

At 10^12-file scale this is how the build runs (north rule: "via
spark-submit --py-files on a multi-executor cluster"):

    cd /root/repo && zip -qr /tmp/lucene_1_spark.zip lucene_1_spark
    spark-submit \\
        --master <cluster-master> \\
        --py-files /tmp/lucene_1_spark.zip \\
        tools/submit_build.py \\
        --source  <parquet/iceberg path: (repo,path,commit,lang,content)> \\
        --index-dir <output index path> \\
        --n-doc-partitions 200000 --n-buckets 1024 \\
        --source-mode materialize --positions

Local smoke (no cluster needed):

    python tools/submit_build.py --source /tmp/l1s_bench_corpus_20000 \\
        --index-dir /tmp/l1s_submit_idx --n-doc-partitions 16 --local 8

Sizing at 10^12 files: one doc partition ~= one Lucene segment; target
0.5-2 GB of content per partition (n_doc_partitions ~ total_bytes /
1 GB).  n_buckets bounds per-query dictionary partitions — 1024 keeps a
bucket's term_stats to parquet-row-group scale at trillion-file corpora.
``--source-mode materialize`` avoids cache pressure and survives driver
restarts without redoing the range shuffle.  The build is resumable:
re-submitting with the same --index-dir continues from the per-stage /
per-bucket checkpoints (staged postings commits are replay-safe).
"""

from __future__ import annotations

import argparse
import os
import sys

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))


def main() -> int:
    ap = argparse.ArgumentParser(description=__doc__)
    ap.add_argument("--source", required=True)
    ap.add_argument("--index-dir", required=True)
    ap.add_argument("--analyzer", default="standard")
    ap.add_argument("--similarity", default="bm25_float32")
    ap.add_argument("--n-doc-partitions", type=int, default=32)
    ap.add_argument("--n-buckets", type=int, default=16)
    ap.add_argument("--source-mode", choices=["persist", "materialize"],
                    default="persist")
    ap.add_argument("--positions", action="store_true")
    ap.add_argument("--keyword-fields", default="",
                    help="comma-separated stored columns indexed as "
                         "exact keyword fields (e.g. lang)")
    ap.add_argument("--text-fields", default="",
                    help="comma-separated extra ANALYZED text columns "
                         "(full per-field postings/norms/positions)")
    ap.add_argument("--local", type=int, default=0,
                    help="run on local[N] instead of the configured master")
    args = ap.parse_args()

    from pyspark.sql import SparkSession

    from lucene_1_spark.index import IndexReader, build_index
    from lucene_1_spark.index.builder import IndexConfig

    if args.local:
        from lucene_1_spark.session import get_spark
        spark = get_spark("submit-build", cores=args.local,
                          shuffle_partitions=args.local)
    else:
        spark = SparkSession.builder.appName("lucene_1_spark-build") \
            .getOrCreate()
    spark.sparkContext.setLogLevel("WARN")

    src = spark.read.parquet(args.source)
    cfg = IndexConfig(analyzer=args.analyzer, similarity=args.similarity,
                      n_doc_partitions=args.n_doc_partitions,
                      n_buckets=args.n_buckets,
                      source_mode=args.source_mode,
                      positions=args.positions,
                      keyword_fields=tuple(
                          f for f in args.keyword_fields.split(",") if f),
                      text_fields=tuple(
                          f for f in args.text_fields.split(",") if f))
    build_index(spark, src, args.index_dir, cfg)
    stats = IndexReader(spark, args.index_dir).stats
    print({"index_dir": args.index_dir, **stats})
    return 0


if __name__ == "__main__":
    sys.exit(main())
