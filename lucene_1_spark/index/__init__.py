from lucene_1_spark.index.builder import IndexBuilder, build_index  # noqa: F401
from lucene_1_spark.index.reader import IndexReader  # noqa: F401
