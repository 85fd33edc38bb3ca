"""Query model + logical rewrites — the role of Lucene's ``Query`` tree
and ``BooleanQuery.rewrite`` (``search/BooleanQuery.java:250-470``,
``search/IndexSearcher.java:849-861``).

The rewrite rules ported (those relevant to term/boolean queries):
- rewrite children to fixpoint;
- 1-clause unwrap (a lone MUST/SHOULD clause becomes the inner query);
- empty boolean / pure-MUST_NOT boolean -> MatchNoDocs;
- duplicate SHOULD/MUST clause dedup with boost summing;
- MUST ∧ MUST_NOT of the same subquery -> MatchNoDocs;
- clause-count guard (1024, ``IndexSearcher.java:80``).
"""

from __future__ import annotations

from dataclasses import dataclass, field
from enum import Enum

from lucene_1_spark.analysis import get_analyzer

MAX_CLAUSE_COUNT = 1024


class Occur(Enum):
    MUST = "MUST"
    SHOULD = "SHOULD"
    MUST_NOT = "MUST_NOT"
    FILTER = "FILTER"  # required, non-scoring (BooleanQuery.java:120-126)


class Query:
    def rewrite(self) -> "Query":
        return self


@dataclass(frozen=True)
class TermQuery(Query):
    term: str
    boost: float = 1.0


@dataclass(frozen=True)
class MatchAllDocsQuery(Query):
    boost: float = 1.0


@dataclass(frozen=True)
class ConstantScoreQuery(Query):
    """Strip scoring from the inner query: every match scores ``boost``
    (``search/ConstantScoreQuery.java``)."""
    query: "Query"
    boost: float = 1.0

    def rewrite(self) -> "Query":
        inner = self.query.rewrite()
        if isinstance(inner, MatchNoDocsQuery):
            return inner
        if inner is self.query:
            return self
        return ConstantScoreQuery(inner, self.boost)


@dataclass(frozen=True)
class SynonymQuery(Query):
    """OR over synonym terms scored as a SINGLE pseudo-term
    (``search/SynonymQuery.java:52,212-228``): doc_freq = max over
    members, per-doc freq = sum over members."""
    terms: tuple[str, ...]
    boost: float = 1.0


@dataclass(frozen=True)
class PhraseQuery(Query):
    """Phrase query (``PhraseQuery.java:71-143``).

    ``slop=0``: exact phrase — consecutive positions required
    (``search/ExactPhraseMatcher.java:109-153``).  Scored as one
    pseudo-term: weight = boost * sum of member idfs, freq = number of
    phrase occurrences.

    ``slop>0``: sloppy phrase (``PhraseQuery.java:76-93`` setSlop,
    ``search/SloppyPhraseMatcher.java``).  freq = sum over in-slop
    occurrence pairs of ``1/(1+editDistance)`` where editDistance is the
    positional displacement from the exact phrase (transposition costs
    2, as in Lucene).  DOCUMENTED DEVIATION: Lucene's matcher greedily
    advances past consumed positions (non-overlapping matches); this
    engine weights ALL in-slop pairs — order-insensitive and exactly
    reproducible by a relational oracle.  v2 supports slop>0 for
    two-term phrases."""
    terms: tuple[str, ...]
    boost: float = 1.0
    slop: int = 0


class MultiTermQuery(Query):
    """Marker base for term-dictionary-expanded queries
    (``search/MultiTermQuery.java:86-119``).  The executor rewrites a
    MultiTermQuery into an executable tree via the term dictionary:

    - ``rewrite_method='scoring_boolean'`` (default): a BooleanQuery of
      SHOULD :class:`TermQuery` clauses, each scored with its own
      idf/freq — ``ScoringRewrite.SCORING_BOOLEAN_QUERY_REWRITE``;
    - ``'constant_score'``: :class:`ConstantScoreQuery` over that
      disjunction — ``MultiTermQuery.CONSTANT_SCORE_REWRITE``;
    - ``'top_terms_<N>'``: keep only the N highest-doc_freq expansions
      (``search/TopTermsRewrite.java:56-103``).

    Expansion is capped at ``MAX_CLAUSE_COUNT`` (1024) like the
    reference (``IndexSearcher.java:80``)."""


@dataclass(frozen=True)
class PrefixQuery(MultiTermQuery):
    """All terms starting with ``prefix`` (``search/PrefixQuery.java``)."""
    prefix: str
    boost: float = 1.0
    rewrite_method: str = "scoring_boolean"


@dataclass(frozen=True)
class WildcardQuery(MultiTermQuery):
    """``*`` = any run, ``?`` = one char (``search/WildcardQuery.java``)."""
    pattern: str
    boost: float = 1.0
    rewrite_method: str = "scoring_boolean"


@dataclass(frozen=True)
class RegexpQuery(MultiTermQuery):
    """Whole-term regexp match (``search/RegexpQuery.java``)."""
    regex: str
    boost: float = 1.0
    rewrite_method: str = "scoring_boolean"


@dataclass(frozen=True)
class FuzzyQuery(MultiTermQuery):
    """Terms within ``max_edits`` Levenshtein edits
    (``search/FuzzyQuery.java:52-67``).  With ``boost_by_similarity``
    each expanded term's boost is scaled by
    ``1 - edits / min(|term|, |query|)`` — the FuzzyTermsEnum boost
    attribute (``search/FuzzyTermsEnum.java``), so closer terms rank
    higher.  ``prefix_length`` requires a shared literal prefix."""
    term: str
    max_edits: int = 2
    prefix_length: int = 0
    boost: float = 1.0
    boost_by_similarity: bool = True
    rewrite_method: str = "scoring_boolean"


@dataclass(frozen=True)
class TermRangeQuery(MultiTermQuery):
    """Terms in the lexicographic range [lower, upper]
    (``search/TermRangeQuery.java``); ``None`` bound = open."""
    lower: str | None
    upper: str | None
    include_lower: bool = True
    include_upper: bool = True
    boost: float = 1.0
    rewrite_method: str = "constant_score"


@dataclass(frozen=True)
class MatchNoDocsQuery(Query):
    pass


@dataclass(frozen=True)
class Clause:
    query: Query
    occur: Occur


@dataclass(frozen=True)
class BooleanQuery(Query):
    clauses: tuple[Clause, ...]
    minimum_should_match: int = 0

    def __post_init__(self):
        if len(self.clauses) > MAX_CLAUSE_COUNT:
            raise ValueError(f"too many clauses: {len(self.clauses)} > {MAX_CLAUSE_COUNT}")

    def rewrite(self) -> Query:
        clauses = [Clause(c.query.rewrite(), c.occur) for c in self.clauses]
        # drop MatchNone SHOULDs; MatchNone MUST/FILTER kills the query
        kept: list[Clause] = []
        for c in clauses:
            if isinstance(c.query, MatchNoDocsQuery):
                if c.occur in (Occur.MUST, Occur.FILTER):
                    return MatchNoDocsQuery()
                continue  # SHOULD/MUST_NOT of nothing is a no-op
            kept.append(c)
        # duplicate term dedup with boost summing (BooleanQuery.java:322-470)
        merged: dict[tuple, Clause] = {}
        out: list[Clause] = []
        for c in kept:
            if isinstance(c.query, TermQuery) and c.occur in (Occur.SHOULD, Occur.MUST):
                k = (c.occur, c.query.term)
                if k in merged:
                    prev = merged[k]
                    merged[k] = Clause(
                        TermQuery(c.query.term, prev.query.boost + c.query.boost),
                        c.occur)
                    continue
                merged[k] = c
            out.append(c)
        out = [merged.get((c.occur, c.query.term), c)
               if isinstance(c.query, TermQuery) and c.occur in (Occur.SHOULD, Occur.MUST)
               else c for c in out]
        # dedup identical (occur, query) pairs entirely
        seen, uniq = set(), []
        for c in out:
            k = (c.occur, c.query)
            if k in seen:
                continue
            seen.add(k)
            uniq.append(c)
        # MUST ∧ MUST_NOT contradiction
        must_set = {c.query for c in uniq if c.occur in (Occur.MUST, Occur.FILTER)}
        if any(c.query in must_set for c in uniq if c.occur == Occur.MUST_NOT):
            return MatchNoDocsQuery()
        if not uniq:
            return MatchNoDocsQuery()
        if all(c.occur == Occur.MUST_NOT for c in uniq):
            return MatchNoDocsQuery()
        if len(uniq) == 1 and uniq[0].occur in (Occur.MUST, Occur.SHOULD) \
                and self.minimum_should_match <= 1:
            return uniq[0].query
        return BooleanQuery(tuple(uniq), self.minimum_should_match)


def rewrite_fixpoint(q: Query, max_iter: int = 16) -> Query:
    """Rewrite to fixpoint (IndexSearcher.java:849-858)."""
    for _ in range(max_iter):
        r = q.rewrite()
        if r == q:
            return r
        q = r
    return q


import re as _re

_CLAUSE_RE = _re.compile(r'([+-]?)("[^"]*"|\S+)')


def parse_query(text: str, analyzer: str = "standard") -> Query:
    """FIXTURES.md §2 syntax: whitespace clauses, ``+t``=MUST,
    ``-t``=MUST_NOT, bare=SHOULD, ``"a b"``=exact phrase; clause text
    analyzed with the same analyzer as indexing
    (demo/SearchFiles.java:109-120)."""
    an = get_analyzer(analyzer)
    clauses: list[Clause] = []
    for sign, raw in _CLAUSE_RE.findall(text):
        occur = {"+": Occur.MUST, "-": Occur.MUST_NOT}.get(sign, Occur.SHOULD)
        if raw.startswith('"') and raw.endswith('"'):
            terms = tuple(an.tokens(raw[1:-1]))
            if len(terms) >= 2:
                clauses.append(Clause(PhraseQuery(terms), occur))
            elif terms:
                clauses.append(Clause(TermQuery(terms[0]), occur))
            continue
        for term in an.tokens(raw):
            clauses.append(Clause(TermQuery(term), occur))
    if not clauses:
        return MatchNoDocsQuery()
    if len(clauses) == 1 and clauses[0].occur != Occur.MUST_NOT:
        return clauses[0].query
    return BooleanQuery(tuple(clauses))
