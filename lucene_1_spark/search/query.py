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
    """Single-term query.  ``field`` defaults to the analyzed text
    field; a keyword field (``IndexConfig.keyword_fields``) matches the
    exact stored value (``index/Term.java`` carries (field, bytes) the
    same way).  The executor maps non-content fields onto the composite
    term key ``<field>\\x1f<term>``."""
    term: str
    boost: float = 1.0
    field: str = "content"


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
class FeatureQuery(Query):
    """Static per-doc ranking feature folded into the score —
    ``document/FeatureField.java:240-470`` + ``FeatureQuery.java:42``.
    The feature lives in a stored numeric doc column; its value is
    quantized exactly like the reference's tf encoding
    (``floatToIntBits >>> 15``) and scored through one of the four
    monotonic functions.  Matches every doc with a positive feature
    value; the classic use is a SHOULD clause next to a text query
    (score = bm25 + w*fn(feature)).

    ``function``: ``linear`` | ``log`` | ``saturation`` | ``sigmoid``.
    ``pivot``: required for sigmoid; for saturation ``None`` computes
    the reference's default (decoded average encoded freq).  ``exp``
    is sigmoid's ``a``; for log it is the additive scaling factor
    (``scalingFactor`` in ``newLogQuery``, default 1)."""
    feature: str
    function: str = "saturation"
    weight: float = 1.0
    pivot: float | None = None
    exp: float = 1.0
    boost: float = 1.0

    def __post_init__(self):
        if self.function not in ("linear", "log", "saturation", "sigmoid"):
            raise ValueError(f"unknown feature function {self.function!r}")
        if self.function == "sigmoid" and self.pivot is None:
            raise ValueError("sigmoid requires an explicit pivot "
                             "(FeatureField.newSigmoidQuery)")
        if self.weight <= 0:
            raise ValueError("weight must be > 0 (FeatureField.java:247)")


@dataclass(frozen=True)
class PayloadScoreQuery(Query):
    """Per-position payload scoring —
    ``queries/payloads/PayloadScoreQuery.java`` +
    ``PayloadFunction.java`` (Min/Max/Sum + first): the term's matching
    positions look up their payload values (attached as a (doc_id,
    position, payload) side table — ``maintenance.attach_payloads``,
    the ``.pay``-file analog), the chosen function folds them per doc,
    and the score is the payload score alone or multiplied into the
    term's BM25 score (``include_span_score``, the reference's
    includeSpanScore flag).  Docs whose matched positions carry no
    payloads score 0, as ``PayloadFunction.docScore`` does with zero
    payloads seen.

    ``function``: ``min`` | ``max`` | ``sum`` | ``avg``
    (AveragePayloadFunction) | ``first`` (payload at the earliest
    matching position)."""
    term: str
    function: str = "max"
    include_span_score: bool = False
    field: str = "content"
    boost: float = 1.0

    def __post_init__(self):
        if self.function not in ("min", "max", "sum", "avg", "first"):
            raise ValueError(
                f"unknown payload function {self.function!r} "
                f"(min|max|sum|avg|first)")


@dataclass(frozen=True)
class CombinedFieldQuery(Query):
    """BM25F-style multi-field scoring — the terms are scored against
    a SYNTHETIC combined field (``sandbox/search/CombinedFieldQuery.
    java:74-88,309-352`` + ``MultiNormsLeafSimScorer.java:140-153``):

    - per-doc freq   = sum over (field, term) matches of w_f * tf
    - per-doc length = sum over fields of w_f * field_length
    - doc_freq       = MAX over every (field, term) pair
    - collection     = docCount/maxDoc/sumDocFreq maxed across fields,
                       sum_total_term_freq = sum of w_f * per-field sums

    so ``avgdl`` and the norm live in the combined space and one BM25
    evaluation scores the doc.  ``fields`` maps field name -> weight;
    weights must be >= 1 (reference Builder.addField precondition).
    ``"content"`` names the primary analyzed field."""
    terms: tuple[str, ...]
    fields: tuple[tuple[str, float], ...] = (("content", 1.0),)
    boost: float = 1.0

    def __post_init__(self):
        for _, w in self.fields:
            if w < 1.0:
                raise ValueError("field weight must be >= 1 "
                                 "(CombinedFieldQuery.java:123)")

    def rewrite(self) -> "Query":
        if not self.terms or not self.fields:
            return MatchNoDocsQuery()
        return self


@dataclass(frozen=True)
class DisjunctionMaxQuery(Query):
    """Disjunction scored by the MAXIMUM sub-score instead of the sum
    (``search/DisjunctionMaxQuery.java:42-88``): for each matching doc,
    ``score = max(sub) + tie_breaker * (sum(sub) - max(sub))``.  The
    classic use is multi-field search where a doc matching one field
    well should beat a doc matching several fields poorly.  Any Query
    may be a disjunct; each executes as its own scored sub-plan and the
    max/sum fold is a single relational aggregation."""
    disjuncts: tuple["Query", ...]
    tie_breaker: float = 0.0
    boost: float = 1.0

    def rewrite(self) -> "Query":
        kids = [d.rewrite() for d in self.disjuncts]
        kept = tuple(k for k in kids if not isinstance(k, MatchNoDocsQuery))
        if not kept:
            return MatchNoDocsQuery()
        if len(kept) == 1:
            # singleton dismax == the disjunct (DisjunctionMaxQuery.java
            # rewrite); distribute the outer boost
            inner = kept[0]
            if self.boost == 1.0:
                return inner
            return DisjunctionMaxQuery((inner,), 0.0, self.boost)
        if kept == self.disjuncts:
            return self
        return DisjunctionMaxQuery(kept, self.tie_breaker, self.boost)


@dataclass(frozen=True)
class TermInSetQuery(Query):
    """Constant-score membership in a (possibly large) term set —
    ``search/TermInSetQuery.java:63-90``.  Unlike a SHOULD-of-terms
    BooleanQuery it is NOT subject to the 1024-clause limit and never
    scores per-term: a doc matches iff it contains >=1 set member, and
    every match scores ``boost``.  Executed as a single postings scan
    with the IN-set pushed into the term-dictionary/bucket filters
    (the relational TermsEnum seek-per-term loop)."""
    terms: tuple[str, ...]
    field: str = "content"
    boost: float = 1.0

    def rewrite(self) -> "Query":
        if not self.terms:
            return MatchNoDocsQuery()
        return self


@dataclass(frozen=True)
class CommonTermsQuery(Query):
    """Frequency-adaptive boolean — ``queries/CommonTermsQuery.java:
    62-120,146-206``: query terms are split at rewrite time by their
    document frequency into a LOW-freq group (selective, drives the
    match) and a HIGH-freq group (stopword-like, only refines
    scoring).  A term is high-frequency when ``df > max_term_frequency``
    (absolute form, >= 1) or ``df > ceil(max_term_frequency * maxDoc)``
    (fractional form) — the reference's exact cutoff test.

    Rewrite (``buildQuery``): low terms form a BooleanQuery under
    ``low_freq_occur`` (msm applied when SHOULD) added as MUST; high
    terms form one under ``high_freq_occur`` added as SHOULD.  With no
    low terms the high group is promoted to a conjunction (``if
    highFreqMinShouldMatch == 0 && highFreqOccur != MUST -> MUST``) to
    prevent a slow all-stopword disjunction.  Group boosts distribute
    onto member terms (sum-of-scores makes that exact).

    ``low_freq_msm`` / ``high_freq_msm`` follow the reference's
    ``minNrShouldMatch`` encoding: values >= 1 (or <= 0) are absolute
    counts, fractions in (0, 1) mean round(frac * n_optional)."""
    terms: tuple[str, ...]
    max_term_frequency: float = 0.01
    high_freq_occur: Occur = Occur.SHOULD
    low_freq_occur: Occur = Occur.SHOULD
    low_freq_msm: float = 0.0
    high_freq_msm: float = 0.0
    low_freq_boost: float = 1.0
    high_freq_boost: float = 1.0
    field: str = "content"
    boost: float = 1.0

    def __post_init__(self):
        if Occur.MUST_NOT in (self.high_freq_occur, self.low_freq_occur):
            raise ValueError("CommonTermsQuery occur must be MUST or "
                             "SHOULD, not MUST_NOT "
                             "(CommonTermsQuery.java:81-86)")

    def rewrite(self) -> "Query":
        if not self.terms:
            return MatchNoDocsQuery()
        return self


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
    reproducible by a relational oracle.  For n>=3 terms each occurrence
    of the FIRST term anchors at most one match: every later slot i must
    hold some position within slop of (anchor+i), weighted
    ``1/(1 + sum of per-slot minimal |displacement|s)``.

    REPEATED-TERM CAVEAT (part of the same documented deviation): for
    ``slop>0`` with n>=3 each slot is checked independently, so a
    repeated term's slots may be satisfied by ONE occurrence —
    ``("a","b","b")`` with slop>=1 matches a doc holding a single
    ``b``.  Lucene's SloppyPhraseMatcher assigns repeats to distinct
    positions (``search/SloppyPhraseMatcher.java:219-267``
    checkDistinctPositions); this engine trades that for the
    set-based formula the SQL oracle reproduces exactly."""
    terms: tuple[str, ...]
    boost: float = 1.0
    slop: int = 0
    field: str = "content"  # phrases match WITHIN one field's positions


@dataclass(frozen=True)
class MultiPhraseQuery(Query):
    """Phrase whose slots each accept ANY of several terms
    (``search/MultiPhraseQuery.java:53-120``) — the bridge between
    PhraseQuery and SynonymQuery used for wildcard/synonym expansion
    inside a phrase.  Slot i matches at position p when any member term
    occurs there (UnionPostingsEnum, ``MultiPhraseQuery.java:350-420``);
    exact/sloppy adjacency then runs over the unioned slot streams with
    PhraseQuery's slop semantics (and the same documented deviations).
    Scored as one pseudo-term: weight = boost * sum of member idfs over
    every present term in every slot (MultiPhraseWeight collects all
    member TermStatistics; docFreq-0 members are skipped).

    ``positions``: optional explicit per-slot positions — ascending,
    one per slot (``MultiPhraseQuery.Builder.add(Term[], int)`` allows
    gaps, e.g. stop-word holes).  Default consecutive 0..n-1."""
    slots: tuple[tuple[str, ...], ...]
    boost: float = 1.0
    slop: int = 0
    field: str = "content"
    positions: tuple[int, ...] | None = None

    def rewrite(self) -> "Query":
        if not self.slots or any(not s for s in self.slots):
            return MatchNoDocsQuery()
        if len(self.slots) == 1:
            # Lucene's one-position optimization
            # (``MultiPhraseQuery.java`` rewrite): a single slot is a
            # SHOULD-disjunction of its member TermQueries
            if len(self.slots[0]) == 1:
                return TermQuery(self.slots[0][0], self.boost, self.field)
            return BooleanQuery(tuple(
                Clause(TermQuery(t, self.boost, self.field), Occur.SHOULD)
                for t in self.slots[0]))
        if all(len(s) == 1 for s in self.slots) and self.positions is None:
            return PhraseQuery(tuple(s[0] for s in self.slots),
                               self.boost, self.slop, self.field)
        return self


@dataclass(frozen=True)
class ComplexPhraseQuery(Query):
    """A phrase whose positions may hold UNEXPANDED multi-term atoms
    (wildcard / prefix / fuzzy) — the
    ``queryparser/complexPhrase/ComplexPhraseQueryParser.java`` query
    shape (``"ja* smith"~2``).  The executor expands each pattern slot
    against the term dictionary at rewrite time (bounded by
    MAX_CLAUSE_COUNT, like every MultiTermQuery rewrite) and executes
    the result as a MultiPhraseQuery; a slot whose pattern matches no
    indexed term makes the whole phrase match nothing (the reference's
    rewrite yields an empty disjunction there too).

    ``slots``: one TermQuery or MultiTermQuery per phrase position."""
    slots: tuple  # tuple[TermQuery | MultiTermQuery, ...]
    slop: int = 0
    boost: float = 1.0
    field: str = "content"

    def __post_init__(self):
        if not self.slots:
            raise ValueError("ComplexPhraseQuery needs >= 1 slot")
        for s in self.slots:
            if not isinstance(s, (TermQuery, MultiTermQuery)):
                raise ValueError(
                    f"slot must be TermQuery or a multi-term query, "
                    f"got {type(s).__name__}")


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
class KnnVectorQuery(Query):
    """k-nearest-neighbour query over an embedding column with an
    optional PRE-filter (``search/KnnFloatVectorQuery.java:46``): the
    filter restricts candidates BEFORE top-k selection, so the result
    is the true top-k among matching docs.  Executed by
    :meth:`IndexSearcher.knn_search` against a vectors table whose id
    column holds engine doc_ids; ``k`` nearest by cosine.  Exact scan
    by default; pass IVF centroids at execution for the partial-probe
    approximate path."""
    query_vec: tuple[float, ...]
    k: int = 10
    filter: "Query | None" = None


@dataclass(frozen=True)
class JoinQuery(Query):
    """Query-time join (``join/JoinUtil.createJoinQuery``,
    ``join/JoinUtil.java:60-120``): matches every doc whose
    ``to_field`` stored value appears among the ``from_field`` values
    of docs matching ``from_query``.  ``score_mode`` follows the
    reference's ScoreMode: 'none' (constant ``boost``), 'max', 'total',
    or 'avg' of the from-side scores per join value
    (``join/ScoreMode.java``).  Relationally: the from-side match set
    aggregates per join value, then one equi-join against the docs
    table — no global-ordinal build needed."""
    from_query: "Query"
    from_field: str
    to_field: str
    score_mode: str = "none"
    boost: float = 1.0

    def rewrite(self) -> "Query":
        inner = self.from_query.rewrite()
        if isinstance(inner, MatchNoDocsQuery):
            return inner
        if inner is self.from_query:
            return self
        return JoinQuery(inner, self.from_field, self.to_field,
                         self.score_mode, self.boost)


@dataclass(frozen=True)
class DocValuesRangeQuery(Query):
    """Numeric range over a STORED doc column — the
    ``SortedNumericDocValuesField.newSlowRangeQuery`` /
    PointRangeQuery-on-doc-values analog
    (``document/SortedNumericDocValuesField.java:120``,
    ``search/PointRangeQuery.java``): constant-score ``boost`` for docs
    whose value lies in [lower, upper]; ``None`` = open bound.
    Composable as any BooleanQuery clause (typically FILTER) — the
    relational IndexOrDocValuesQuery: Spark pushes the predicate to the
    parquet scan of the docs table (row-group min/max pruning)."""
    field: str
    lower: float | None = None
    upper: float | None = None
    include_lower: bool = True
    include_upper: bool = True
    boost: float = 1.0


@dataclass(frozen=True)
class FieldExistsQuery(Query):
    """Docs with a non-null value for a stored field
    (``search/FieldExistsQuery.java``); constant score ``boost``."""
    field: str
    boost: float = 1.0


@dataclass(frozen=True)
class DocValuesTermsQuery(Query):
    """Set membership evaluated on a STORED doc column instead of
    postings — the ``SortedSetDocValuesField.newSlowSetQuery`` /
    sandbox ``DocValuesTermsQuery.java:58-90`` analog: constant-score
    ``boost`` for docs whose ``field`` value is in ``values``.
    Relationally an IN-predicate on the docs table, so Spark pushes it
    into the parquet scan (dictionary/row-group pruning) — the same
    index-vs-docvalues trade IndexOrDocValuesQuery arbitrates."""
    field: str
    values: tuple[str, ...]
    boost: float = 1.0


@dataclass(frozen=True)
class FunctionScoreQuery(Query):
    """Score replacement by a DoubleValuesSource
    (``queries/function/FunctionScoreQuery.java:40-120``): matches
    exactly the docs the wrapped ``query`` matches, but each hit's
    score is ``source`` — an arbitrary SQL expression over the bound
    variables ``score`` (the wrapped query's score), any stored /
    doc-values column of the docs table (latest dv generation), and
    ``boosted`` (1.0 when the doc also matches ``boost_query``, else
    0.0).  The reference JITs a DoubleValuesSource tree; here
    ``F.expr`` hands the expression to Catalyst, which compiles it
    into whole-stage codegen.  Missing dv values read as NULL — wrap
    with ``coalesce`` in the source for Lucene's missing-==-0 reads.
    Use :func:`boost_by_value` / :func:`boost_by_query` for the
    reference's static factory semantics."""
    query: "Query"
    source: str
    boost_query: "Query | None" = None

    def rewrite(self) -> "Query":
        inner = self.query.rewrite()
        if isinstance(inner, MatchNoDocsQuery):
            return inner
        if inner is self.query:
            return self
        return FunctionScoreQuery(inner, self.source, self.boost_query)


def boost_by_value(query: "Query", value_expr: str) -> FunctionScoreQuery:
    """``FunctionScoreQuery.boostByValue`` — multiply the wrapped
    query's score by a per-doc expression (e.g. a feature column)."""
    return FunctionScoreQuery(query, f"score * ({value_expr})")


def boost_by_query(query: "Query", boost_query: "Query",
                   boost: float) -> FunctionScoreQuery:
    """``FunctionScoreQuery.boostByQuery`` — multiply the score by
    ``boost`` for docs that ALSO match ``boost_query`` (non-matching
    docs keep their original score)."""
    return FunctionScoreQuery(
        query, f"score * (1.0 + ({boost} - 1.0) * boosted)", boost_query)


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
                k = (c.occur, c.query.field, c.query.term)
                if k in merged:
                    prev = merged[k]
                    merged[k] = Clause(
                        TermQuery(c.query.term,
                                  prev.query.boost + c.query.boost,
                                  c.query.field),
                        c.occur)
                    continue
                merged[k] = c
            out.append(c)
        out = [merged.get((c.occur, c.query.field, c.query.term), c)
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

_VALID_FIELDS = {"content", "text"}  # the engine's single indexed field
_SUFFIX_RE = _re.compile(
    r"^(?P<body>.+?)(?:~(?P<fuzz>\d*))?(?:\^(?P<boost>[\d.]+))?$")
_BOOST_RE = _re.compile(r"\^([\d.]+)")


def _apply_boost(q: Query, b: float) -> Query:
    """Distribute a boost onto a parsed subtree (BoostQuery analog —
    BM25 contributions are linear in the weight, so distributing over a
    disjunction/boolean is score-identical to an outer multiplier)."""
    if b == 1.0:
        return q
    if isinstance(q, TermQuery):
        return TermQuery(q.term, q.boost * b, q.field)
    if isinstance(q, PhraseQuery):
        return PhraseQuery(q.terms, q.boost * b, q.slop, q.field)
    if isinstance(q, MultiPhraseQuery):
        return MultiPhraseQuery(q.slots, q.boost * b, q.slop, q.field,
                                q.positions)
    if isinstance(q, ComplexPhraseQuery):
        return ComplexPhraseQuery(q.slots, q.slop, q.boost * b, q.field)
    if isinstance(q, SynonymQuery):
        return SynonymQuery(q.terms, q.boost * b)
    if isinstance(q, ConstantScoreQuery):
        return ConstantScoreQuery(q.query, q.boost * b)
    if isinstance(q, MatchAllDocsQuery):
        return MatchAllDocsQuery(q.boost * b)
    if isinstance(q, PrefixQuery):
        return PrefixQuery(q.prefix, q.boost * b, q.rewrite_method)
    if isinstance(q, WildcardQuery):
        return WildcardQuery(q.pattern, q.boost * b, q.rewrite_method)
    if isinstance(q, RegexpQuery):
        return RegexpQuery(q.regex, q.boost * b, q.rewrite_method)
    if isinstance(q, FuzzyQuery):
        return FuzzyQuery(q.term, q.max_edits, q.prefix_length, q.boost * b,
                          q.boost_by_similarity, q.rewrite_method)
    if isinstance(q, TermRangeQuery):
        return TermRangeQuery(q.lower, q.upper, q.include_lower,
                              q.include_upper, q.boost * b, q.rewrite_method)
    if isinstance(q, BooleanQuery):
        return BooleanQuery(tuple(Clause(_apply_boost(c.query, b), c.occur)
                                  for c in q.clauses),
                            q.minimum_should_match)
    return q


class _Scanner:
    def __init__(self, s: str):
        self.s = s
        self.i = 0

    def peek(self) -> str:
        return self.s[self.i] if self.i < len(self.s) else ""

    def next(self) -> str:
        ch = self.peek()
        self.i += 1
        return ch

    def skip_ws(self) -> None:
        while self.i < len(self.s) and self.s[self.i].isspace():
            self.i += 1

    def read_until(self, stop: str) -> str:
        j = self.s.find(stop, self.i)
        if j < 0:
            out, self.i = self.s[self.i:], len(self.s)
            return out
        out = self.s[self.i:j]
        self.i = j + len(stop)
        return out

    def read_word(self) -> str:
        j = self.i
        while j < len(self.s) and not self.s[j].isspace() \
                and self.s[j] not in '()"':
            j += 1
        out = self.s[self.i:j]
        self.i = j
        return out

    def read_boost(self) -> float:
        m = _BOOST_RE.match(self.s[self.i:])
        if not m:
            return 1.0
        self.i += m.end()
        return float(m.group(1))

    def read_suffix(self) -> tuple[int | None, float]:
        """Optional ~slop/~fuzz then optional ^boost after a closing
        quote/bracket."""
        tilde = None
        if self.peek() == "~":
            self.next()
            digits = ""
            while self.peek().isdigit():
                digits += self.next()
            tilde = int(digits) if digits else -1
        return tilde, self.read_boost()


def _word_atom(word: str, an, kw_fields: frozenset = frozenset(),
               text_fields: frozenset = frozenset()) -> Query | None:
    """One bare word -> Term/Prefix/Wildcard/Fuzzy query with optional
    ``field:``, ``~fuzz`` and ``^boost`` suffixes.  ``field:`` names
    the analyzed content field, a registered keyword field (exact,
    unanalyzed value match), or a registered analyzed text field (the
    word runs through the analyzer and matches in that field)."""
    if ":" in word:
        field, rest = word.split(":", 1)
        if field in kw_fields:
            if not rest:
                return None
            m = _SUFFIX_RE.match(rest)
            boost = float(m.group("boost")) if m and m.group("boost") else 1.0
            value = m.group("body") if m else rest
            return TermQuery(value, boost, field)
        if field in text_fields:
            if not rest:
                return None
            m = _SUFFIX_RE.match(rest)
            boost = float(m.group("boost")) if m and m.group("boost") else 1.0
            body = m.group("body") if m else rest
            terms = an.tokens(body)
            if not terms:
                return None
            if len(terms) == 1:
                return TermQuery(terms[0], boost, field)
            return BooleanQuery(tuple(
                Clause(TermQuery(t, boost, field), Occur.SHOULD)
                for t in terms))
        if field not in _VALID_FIELDS:
            raise ValueError(
                f"unknown field '{field}' (indexed fields: "
                f"{sorted(_VALID_FIELDS | kw_fields | text_fields)})")
        word = rest
        if not word:
            return None
    m = _SUFFIX_RE.match(word)
    if not m:
        return None
    body = m.group("body")
    boost = float(m.group("boost")) if m.group("boost") else 1.0
    if m.group("fuzz") is not None:
        edits = int(m.group("fuzz")) if m.group("fuzz") else 2
        return FuzzyQuery(body.lower(), max_edits=edits, boost=boost)
    if "*" in body or "?" in body:
        # multi-term atoms are normalized (lowercased), NOT analyzed —
        # QueryParserBase.getWildcardQuery
        if body.endswith("*") and len(body) > 1 \
                and not any(c in body[:-1] for c in "*?"):
            return PrefixQuery(body[:-1].lower(), boost=boost)
        return WildcardQuery(body.lower(), boost=boost)
    terms = an.tokens(body)
    if not terms:
        return None
    if len(terms) == 1:
        return TermQuery(terms[0], boost)
    return BooleanQuery(tuple(Clause(TermQuery(t, boost), Occur.SHOULD)
                              for t in terms))


def _parse_clauses(sc: _Scanner, an,
                   kw_fields: frozenset = frozenset(),
                   text_fields: frozenset = frozenset(),
                   complex_phrases: bool = False) -> Query:
    clauses: list[Clause] = []
    pending: Occur | None = None
    last_op: str | None = None

    def push(q: Query | None) -> None:
        nonlocal pending, last_op
        if q is not None:
            occur = pending if pending is not None else Occur.SHOULD
            if last_op == "AND":
                # a AND b / a AND NOT b -> previous clause is required too
                if clauses and clauses[-1].occur == Occur.SHOULD:
                    clauses[-1] = Clause(clauses[-1].query, Occur.MUST)
                if pending is None:
                    occur = Occur.MUST
            clauses.append(Clause(q, occur))
        pending, last_op = None, None

    while True:
        sc.skip_ws()
        ch = sc.peek()
        if ch == "" or ch == ")":
            break
        if ch == "(":
            sc.next()
            sub = _parse_clauses(sc, an, kw_fields, text_fields,
                                 complex_phrases)
            if sc.peek() == ")":
                sc.next()
            _, boost = sc.read_suffix()
            push(_apply_boost(sub, boost))
            continue
        if ch == '"':
            sc.next()
            raw = sc.read_until('"')
            tilde, boost = sc.read_suffix()
            slop = max(tilde, 0) if tilde is not None else 0
            if complex_phrases:
                # ComplexPhraseQueryParser.java: each phrase word may
                # be a wildcard/prefix/fuzzy atom; per-word boosts are
                # ignored (slots carry no boost, as in MultiPhrase)
                slots: list[Query] = []
                for w in raw.split():
                    a = _word_atom(w, an)
                    if a is None:
                        continue
                    if isinstance(a, (TermQuery, MultiTermQuery)):
                        slots.append(a)
                    elif isinstance(a, BooleanQuery):
                        slots.extend(c.query for c in a.clauses)
                if any(isinstance(a, MultiTermQuery) for a in slots):
                    push(ComplexPhraseQuery(tuple(slots), slop, boost))
                elif len(slots) >= 2:
                    push(PhraseQuery(
                        tuple(t.term for t in slots), boost, slop))
                elif slots:
                    push(TermQuery(slots[0].term, boost))
                else:
                    push(None)
                continue
            terms = an.tokens(raw)
            if len(terms) >= 2:
                push(PhraseQuery(tuple(terms), boost, slop))
            elif terms:
                push(TermQuery(terms[0], boost))
            else:
                push(None)
            continue
        if ch in "[{":
            inc_lo = sc.next() == "["
            ends = [j for j in (sc.s.find("]", sc.i), sc.s.find("}", sc.i))
                    if j >= 0]
            if ends:
                j = min(ends)
                raw, inc_hi = sc.s[sc.i:j], sc.s[j] == "]"
                sc.i = j + 1
            else:
                raw, inc_hi = sc.s[sc.i:], True
                sc.i = len(sc.s)
            parts = raw.split()
            if len(parts) == 3 and parts[1].upper() == "TO":
                lo = None if parts[0] == "*" else parts[0].lower()
                hi = None if parts[2] == "*" else parts[2].lower()
                _, boost = sc.read_suffix()
                push(TermRangeQuery(lo, hi, inc_lo, inc_hi, boost=boost))
            else:
                push(None)
            continue
        if ch == "/":
            sc.next()
            raw = sc.read_until("/")
            _, boost = sc.read_suffix()
            push(RegexpQuery(raw, boost=boost))
            continue
        if ch == "+":
            sc.next()
            pending = Occur.MUST
            continue
        if ch == "-":
            sc.next()
            pending = Occur.MUST_NOT
            continue
        word = sc.read_word()
        if word in ("AND", "&&"):
            last_op = "AND"
            continue
        if word in ("OR", "||"):
            last_op = "OR"
            continue
        if word in ("NOT", "!"):
            pending = Occur.MUST_NOT
            continue
        if word == "*" or word == "*:*":
            push(MatchAllDocsQuery())
            continue
        push(_word_atom(word, an, kw_fields, text_fields))

    if not clauses:
        return MatchNoDocsQuery()
    if len(clauses) == 1 and clauses[0].occur != Occur.MUST_NOT:
        return clauses[0].query
    return BooleanQuery(tuple(clauses))


def parse_query(text: str, analyzer: str = "standard",
                keyword_fields: frozenset | set | tuple = (),
                text_fields: frozenset | set | tuple = (),
                complex_phrases: bool = False) -> Query:
    """Classic-syntax query parser — the role of
    ``queryparser/classic/QueryParser.jj:196-320`` (the reference's
    user-facing entry point, ``demo/SearchFiles.java:109-120``):

    - bare terms (default operator OR), ``+must``, ``-not``, ``NOT``;
    - ``AND``/``OR`` (also ``&&``/``||``) — ``a AND b`` requires both;
    - parentheses for grouping, ``^boost`` on any atom or group;
    - ``"a b"`` exact phrase, ``"a b"~n`` sloppy phrase;
    - ``term~`` / ``term~1`` fuzzy (default 2 edits);
    - ``pre*`` prefix, ``wi?ld*`` wildcard, ``/regexp/``;
    - ``[a TO b]`` / ``{a TO b}`` term ranges (``*`` = open bound);
    - ``field:atom`` — validated against the single indexed field;
    - ``*:*`` MatchAllDocs.

    Analyzed atoms (terms, phrases) run through the same analyzer as
    indexing; multi-term atoms (wildcard/fuzzy/range/regexp) are only
    lowercase-normalized, as in QueryParserBase.
    With ``complex_phrases=True`` quoted phrases may embed wildcard /
    prefix / fuzzy atoms per position
    (``queryparser/complexPhrase/ComplexPhraseQueryParser.java`` —
    ``"ja* smith"~2``), expanded against the term dictionary at
    executor rewrite time into a MultiPhraseQuery."""
    return _parse_clauses(_Scanner(text), get_analyzer(analyzer),
                          frozenset(keyword_fields),
                          frozenset(text_fields), complex_phrases)


def parse_complex_phrase(text: str, analyzer: str = "standard",
                         keyword_fields: frozenset | set | tuple = (),
                         text_fields: frozenset | set | tuple = ()) -> Query:
    """The ComplexPhraseQueryParser entry point: classic syntax with
    wildcard/prefix/fuzzy atoms allowed INSIDE quoted phrases."""
    return parse_query(text, analyzer, keyword_fields, text_fields,
                       complex_phrases=True)


# ---------------------------------------------------------------------------
# Query-tree serialization — the role of the Monitor's durable
# MonitorQuery representation (``monitor/MonitorQuerySerializer.java``):
# every Query node is a frozen dataclass of primitives / Queries /
# tuples, so a generic encoder round-trips the whole surface (used by
# the Monitor to persist and worker-ship non-parser-expressible
# queries; also a plain public utility).
# ---------------------------------------------------------------------------

import dataclasses as _dc

_SERIALIZABLE = (TermQuery, BooleanQuery, Clause, MatchAllDocsQuery,
                 MatchNoDocsQuery, ConstantScoreQuery, SynonymQuery,
                 CombinedFieldQuery, FeatureQuery,
                 DisjunctionMaxQuery, TermInSetQuery, PhraseQuery,
                 MultiPhraseQuery,
                 PrefixQuery, WildcardQuery, RegexpQuery, FuzzyQuery,
                 TermRangeQuery, KnnVectorQuery, DocValuesRangeQuery,
                 FieldExistsQuery, JoinQuery, DocValuesTermsQuery,
                 FunctionScoreQuery)
_TYPE_BY_NAME = {c.__name__: c for c in _SERIALIZABLE}


def _enc(v):
    if isinstance(v, Occur):
        return {"__t__": "Occur", "value": v.value}
    if isinstance(v, _SERIALIZABLE):
        return query_to_dict(v)
    if isinstance(v, tuple):
        return [_enc(x) for x in v]
    return v


def _dec(v):
    if isinstance(v, dict):
        if v.get("__t__") == "Occur":
            return Occur(v["value"])
        return query_from_dict(v)
    if isinstance(v, list):
        return tuple(_dec(x) for x in v)
    return v


def query_to_dict(q: "Query | Clause") -> dict:
    """JSON-safe dict for any query tree (round-trips via
    :func:`query_from_dict`)."""
    if type(q).__name__ not in _TYPE_BY_NAME:
        raise TypeError(f"not a serializable query node: {type(q)}")
    d = {"__t__": type(q).__name__}
    for f in _dc.fields(q):
        d[f.name] = _enc(getattr(q, f.name))
    return d


def query_from_dict(d: dict) -> "Query | Clause":
    cls = _TYPE_BY_NAME.get(d.get("__t__", ""))
    if cls is None:
        raise ValueError(f"unknown query type {d.get('__t__')!r}")
    kwargs = {f.name: _dec(d[f.name]) for f in _dc.fields(cls)
              if f.name in d}
    return cls(**kwargs)
