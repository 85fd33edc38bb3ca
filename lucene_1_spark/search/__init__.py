from lucene_1_spark.search.query import (  # noqa: F401
    BooleanQuery, Clause, CommonTermsQuery, ConstantScoreQuery,
    DisjunctionMaxQuery,
    DocValuesRangeQuery, FieldExistsQuery, FuzzyQuery,
    JoinQuery, KnnVectorQuery, MatchAllDocsQuery, MatchNoDocsQuery,
    MultiPhraseQuery, MultiTermQuery,
    Occur, PhraseQuery, PrefixQuery, Query, RegexpQuery, SynonymQuery,
    TermInSetQuery, TermQuery, TermRangeQuery, WildcardQuery, parse_query,
)
from lucene_1_spark.search.executor import IndexSearcher  # noqa: F401
