"""lucene_1_spark — a PySpark-native inverted-index + BM25 top-k engine.

A from-scratch Spark engine with the query capabilities of the Apache
Lucene reference (see SURVEY.md): StandardAnalyzer-style tokenization,
inverted-index build (delta+FOR-packed 128-doc posting blocks with
block-max metadata), segment merge via repartition-by-term-hash,
BM25 (k1=1.2, b=0.75) top-k with Lucene-exact float32 arithmetic and
SmallFloat byte-quantized norms, plus the training-data pipeline ops
(dedup, similarity search, text stats) over generic document tables.

Everything is DataFrame-first; Python only appears as vectorized
pandas/Arrow UDFs (tokenize, block pack/unpack, scoring kernels).
"""

__version__ = "0.1.0"

from lucene_1_spark.session import get_spark  # noqa: F401
