from lucene_1_spark.search.query import (  # noqa: F401
    BooleanQuery, Clause, MatchAllDocsQuery, MatchNoDocsQuery, Occur,
    PhraseQuery, Query, TermQuery, parse_query,
)
from lucene_1_spark.search.executor import IndexSearcher  # noqa: F401
