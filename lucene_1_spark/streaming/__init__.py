from lucene_1_spark.streaming.incremental import IncrementalIndexWriter  # noqa: F401
