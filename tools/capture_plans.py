"""Capture .explain('formatted') output for a set of queries() entries.

Usage: python tools/capture_plans.py <out_dir> <suffix> [entry,entry,...]

Writes <out_dir>/<entry>_<suffix>.txt for each entry.  Entries whose
callables collect internally (count-style) still produce the plan of
the RETURNED DataFrame; where that is a local relation the file notes
it and, when the entry exposes an inner DataFrame path, the inner plan
is captured via the library API instead (see INNER below).

Run from the repo whose plans you want (the round-start worktree for
the *_before.txt files, the working tree for *_after.txt).
"""

from __future__ import annotations

import contextlib
import io
import os
import sys

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

DEFAULT = [
    "ft_term_topk", "ft_or_topk", "ft_and_topk", "ft_mixed_topk",
    "ft_sloppy_phrase_topk", "ft_intervals_or_containing",
    "ft_bool_phrase_topk", "ft_batch_queries",
    "text_repetition", "text_perplexity", "pipe_decontamination",
    "dedup_minhash_lsh", "dedup_simhash", "sim_near_dup_pairs",
    "classify_naive_bayes", "suggest_free_text",
    "ft_dynamic_range_facets", "pack_sequences_stats",
    "ft_spell_suggest",
]

# entries whose returned frame is a driver-local relation: capture the
# inner DataFrame that actually does the work
INNER = {
    "sim_semdedup_count": lambda spark, d: _semdedup_inner(spark, d),
    "ft_surround_count": lambda spark, d: _surround_inner(spark, d),
}


def _semdedup_inner(spark, d):
    from pyspark.sql import functions as F

    from lucene_1_spark.pipeline.similarity import semdedup
    e = spark.read.parquet(os.path.join(d, "embeddings.parquet")) \
        .select("vec_id", "embedding")
    e2 = e.unionByName(e.select((F.col("vec_id") + 1_000_000)
                                .alias("vec_id"), "embedding"))
    return semdedup(e2, threshold=0.98, dim=64)


def _surround_inner(spark, d):
    import __spark_entry__ as entrymod
    from lucene_1_spark.search.surround_parser import surround_search
    se = entrymod._pos_ws_searcher(spark, d)
    return surround_search(se, "sort 3w merge")


def plan_text(df) -> str:
    buf = io.StringIO()
    with contextlib.redirect_stdout(buf):
        df.explain("formatted")
    return buf.getvalue()


def main():
    out_dir = sys.argv[1]
    suffix = sys.argv[2]
    names = (sys.argv[3].split(",") if len(sys.argv) > 3 else
             DEFAULT + sorted(INNER))
    sf_dir = os.environ.get("SPARK_GRAFT_SF_DIR", "/root/testdata/sf0.01")

    import __spark_entry__ as entrymod
    from lucene_1_spark.session import get_spark

    spark = get_spark("plan-capture", cores=8, shuffle_partitions=8)
    spark.sparkContext.setLogLevel("ERROR")
    os.makedirs(out_dir, exist_ok=True)
    qs = entrymod.queries()
    for name in names:
        try:
            if name in INNER:
                df = INNER[name](spark, sf_dir)
                note = ("# inner DataFrame plan (the entry returns a "
                        "driver-local count row)\n")
            else:
                df = qs[name](spark, sf_dir)
                note = ""
            txt = note + plan_text(df)
        except Exception as exc:  # keep going; record the failure
            txt = f"# plan capture failed: {exc!r}\n"
        with open(os.path.join(out_dir, f"{name}_{suffix}.txt"), "w") as fh:
            fh.write(txt)
        print(f"captured {name}_{suffix}")
    spark.stop()


if __name__ == "__main__":
    main()
