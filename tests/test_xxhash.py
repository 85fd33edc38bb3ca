"""Driver-side XXH64 must be bit-identical to Spark's xxhash64 — bucket
routing correctness (a mismatch would silently return empty postings)."""

from pyspark.sql import functions as F

from lucene_1_spark.functions.xxhash import spark_xxhash64, xxh64


def test_published_vectors():
    assert xxh64(b"", 0) == 0xEF46DB3751D8E999
    assert xxh64(b"a", 0) == 0xD24EC4F1A98C6E5B
    assert xxh64(b"abc", 0) == 0x44BC2CF5AD770999


def test_matches_spark_xxhash64(spark):
    terms = (["tok%d" % i for i in range(50)]
             + ["def", "class", "", "a", "üñïçødé", "x" * 31, "y" * 32,
                "z" * 33, "w" * 100, "3.14", "foo_bar", "don't"])
    df = spark.createDataFrame([(t,) for t in terms], "term string")
    rows = df.select("term", F.xxhash64("term").alias("h")).collect()
    for r in rows:
        assert spark_xxhash64(r["term"]) == r["h"], r["term"]
