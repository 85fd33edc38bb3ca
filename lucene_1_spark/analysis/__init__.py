from lucene_1_spark.analysis.standard import (  # noqa: F401
    StandardAnalyzer,
    analyze_batch,
    get_analyzer,
    tokenize_udf_factory,
)
