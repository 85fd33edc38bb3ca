"""MemoryIndex — the ``lucene/memory`` module analog
(``index/memory/MemoryIndex.java``): a single-document in-memory index
that evaluates arbitrary queries against ONE document with no cluster
round-trip, the reference's workhorse for percolation and per-document
query testing.

Design: pure driver/worker-side Python (a one-document evaluation must
never schedule a Spark job — the distributed use is a MemoryIndex PER
ROW inside a ``mapInPandas`` kernel, which is exactly how the
reference's Monitor wraps MemoryIndex per document).  Scoring is
bm25_double with the SAME single-document statistics Lucene's
MemoryIndex exposes through its reader (``MemoryIndex.java:
MemoryIndexReader`` — docCount=1, df=1 per present term, sumTotalTermFreq
= field length), so a MemoryIndex score is IDENTICAL to searching a
real one-document index built by this engine's ``IndexBuilder`` with
``similarity="bm25_double"`` — pinned by the oracle-identity tests in
``tests/test_memory_index.py``.

Scope (all parity-tested): Term / Synonym / Boolean (all occurs + msm)
/ ConstantScore / TermInSet / DisjunctionMax / MatchAll / phrase exact
(slop=0, any arity) and two-term sloppy (the 1/(1+|displacement|)
accumulation of ``SloppyPhraseMatcher``) / Prefix / Wildcard / Regexp /
TermRange / Fuzzy (with similarity member boosts) expanded against the
document's own term dictionary, plus keyword fields via the engine's
composite-term scheme.  n>=3 sloppy phrases raise (use the full
index path).
"""

from __future__ import annotations

import re

import numpy as np

from lucene_1_spark.functions import bm25
from lucene_1_spark.search.query import (
    BooleanQuery, ConstantScoreQuery, DisjunctionMaxQuery, FuzzyQuery,
    MatchAllDocsQuery, MatchNoDocsQuery, MultiTermQuery, Occur,
    PhraseQuery, PrefixQuery, Query, RegexpQuery, SynonymQuery,
    TermInSetQuery, TermQuery, TermRangeQuery, WildcardQuery,
    parse_query)

FIELD_SEP = "\x1f"


def _levenshtein(a: str, b: str) -> int:
    prev = list(range(len(b) + 1))
    for i, ca in enumerate(a, 1):
        cur = [i]
        for j, cb in enumerate(b, 1):
            cur.append(min(prev[j] + 1, cur[-1] + 1,
                           prev[j - 1] + (ca != cb)))
        prev = cur
    return prev[-1]


class MemoryIndex:
    """One document, fully inverted in a dict.  ``fields`` adds
    keyword fields (exact-match stored values, per-field length 1 —
    the engine's ``IndexConfig.keyword_fields`` scheme)."""

    def __init__(self, content: str, analyzer: str = "standard",
                 fields: dict[str, str] | None = None,
                 k1: float = 1.2, b: float = 0.75):
        from lucene_1_spark.analysis import get_analyzer
        # the engine stores k1/b as float32 (IndexSearcher.__init__)
        # and widens them in the kernels — same round-trip here so a
        # MemoryIndex score is bit-identical to the 1-doc index score
        self.k1 = float(np.float32(k1))
        self.b = float(np.float32(b))
        self.analyzer = analyzer
        self.positions: dict[str, list[int]] = {}
        for t, p in get_analyzer(analyzer).tokens_with_positions(
                content or ""):
            self.positions.setdefault(t, []).append(p)
        self.length = sum(len(v) for v in self.positions.values())
        self.keyword_fields = frozenset(fields or ())
        for fld, val in (fields or {}).items():
            if val is not None:
                self.positions.setdefault(
                    f"{fld}{FIELD_SEP}{val}", []).append(0)

    # -- single-doc statistics ------------------------------------------
    def _idf(self) -> float:
        # docCount=1, df=1 for every present term
        return bm25.idf_double(1, 1)

    def _tfn(self, tf: float, field: str | None) -> float:
        # field length == avgdl for the one doc, so len/avgdl == 1
        return tf / (tf + self.k1) if tf > 0 else 0.0

    def _key(self, term: str, field: str) -> str:
        return term if field == "content" else f"{field}{FIELD_SEP}{term}"

    # -- public API ------------------------------------------------------
    def search(self, query: "Query | str") -> float:
        """Score of the document for ``query`` (0.0 when it does not
        match) — ``MemoryIndex.search(Query)``."""
        if isinstance(query, str):
            query = parse_query(query, self.analyzer,
                                self.keyword_fields, frozenset())
        m, s = self._eval(query.rewrite())
        return float(s) if m else 0.0

    def matches(self, query: "Query | str") -> bool:
        if isinstance(query, str):
            query = parse_query(query, self.analyzer,
                                self.keyword_fields, frozenset())
        return self._eval(query.rewrite())[0]

    # -- evaluation ------------------------------------------------------
    def _eval(self, q: Query) -> tuple[bool, float]:
        if isinstance(q, MatchNoDocsQuery):
            return False, 0.0
        if isinstance(q, MatchAllDocsQuery):
            return True, float(q.boost)
        if isinstance(q, TermQuery):
            tf = len(self.positions.get(self._key(q.term, q.field), ()))
            if tf == 0:
                return False, 0.0
            return True, q.boost * self._idf() * self._tfn(tf, q.field)
        if isinstance(q, SynonymQuery):
            # combined pseudo-term: freq = sum over members
            tf = sum(len(self.positions.get(t, ())) for t in q.terms)
            if tf == 0:
                return False, 0.0
            return True, q.boost * self._idf() * self._tfn(tf, "content")
        if isinstance(q, ConstantScoreQuery):
            m, _ = self._eval(q.query)
            return m, (q.boost if m else 0.0)
        if isinstance(q, TermInSetQuery):
            m = any(self.positions.get(self._key(t, q.field))
                    for t in q.terms)
            return m, (q.boost if m else 0.0)
        if isinstance(q, DisjunctionMaxQuery):
            parts = [self._eval(d) for d in q.disjuncts]
            hits = [s for m, s in parts if m]
            if not hits:
                return False, 0.0
            best = max(hits)
            return True, q.boost * (
                best + q.tie_breaker * (sum(hits) - best))
        if isinstance(q, PhraseQuery):
            return self._eval_phrase(q)
        if isinstance(q, MultiTermQuery):
            return self._eval(self._rewrite_multi_term(q))
        if isinstance(q, BooleanQuery):
            return self._eval_boolean(q)
        raise NotImplementedError(
            f"MemoryIndex does not evaluate {type(q).__name__}")

    def _eval_boolean(self, q: BooleanQuery) -> tuple[bool, float]:
        score = 0.0
        n_should = 0
        any_positive = False
        for c in q.clauses:
            m, s = self._eval(c.query)
            if c.occur == Occur.MUST_NOT:
                if m:
                    return False, 0.0
                continue
            any_positive = True
            if c.occur in (Occur.MUST, Occur.FILTER):
                if not m:
                    return False, 0.0
                if c.occur == Occur.MUST:
                    score += s
            else:  # SHOULD
                if m:
                    n_should += 1
                    score += s
        if not any_positive:
            return False, 0.0      # pure-negation query never matches
        has_required = any(c.occur in (Occur.MUST, Occur.FILTER)
                           for c in q.clauses)
        n_opt = sum(1 for c in q.clauses if c.occur == Occur.SHOULD)
        msm = max(q.minimum_should_match, 0 if has_required else
                  (1 if n_opt else 0))
        if n_should < msm:
            return False, 0.0
        return True, score

    def _eval_phrase(self, q: PhraseQuery) -> tuple[bool, float]:
        keys = [self._key(t, q.field) for t in q.terms]
        plists = [self.positions.get(t) for t in keys]
        if any(p is None for p in plists):
            return False, 0.0
        p0 = np.asarray(plists[0], dtype=np.int64)
        if q.slop == 0:
            mask = np.ones(len(p0), dtype=bool)
            for i in range(1, len(plists)):
                mask &= np.isin(p0 + i, np.asarray(plists[i],
                                                   dtype=np.int64))
            pf = float(mask.sum())
        elif len(plists) == 2:
            # SloppyPhraseMatcher weight: 1/(1+|displacement|) per match
            p1 = np.asarray(plists[1], dtype=np.int64)
            pf = 0.0
            for e in range(-q.slop, q.slop + 1):
                pf += float(np.isin(p0 + 1 + e, p1).sum()) / (1.0 + abs(e))
        else:
            raise NotImplementedError(
                "MemoryIndex sloppy phrases support 2 terms; use the "
                "full index path for wider sloppy phrases")
        if pf <= 0.0:
            return False, 0.0
        w = q.boost * self._idf() * len(keys)   # summed per-term idf
        return True, w * pf / (pf + self.k1)

    def _rewrite_multi_term(self, q: MultiTermQuery) -> Query:
        """The ``rewrite_multi_term`` shape against THIS document's
        term dictionary (df=1 everywhere, so top-terms ordering is
        term-ascending like the engine's tie-break).  The same
        MAX_CLAUSE_COUNT cap as the engine's rewrite applies
        (``executor.py`` rewrite_multi_term): a pattern whose expansion
        exceeds it raises here exactly as it would on the full index —
        the score-identity contract includes failure behavior."""
        from lucene_1_spark.search.query import MAX_CLAUSE_COUNT, Clause
        terms = sorted(t for t in self.positions
                       if FIELD_SEP not in t and self._mt_match(q, t))
        method = q.rewrite_method
        if method.startswith("top_terms_"):
            terms = terms[:int(method.rsplit("_", 1)[1])]
        if len(terms) > MAX_CLAUSE_COUNT:
            raise ValueError(
                f"multi-term expansion too large: > {MAX_CLAUSE_COUNT}")
        if not terms:
            return MatchNoDocsQuery()

        def member_boost(term: str) -> float:
            if isinstance(q, FuzzyQuery) and q.boost_by_similarity:
                dist = _levenshtein(term, q.term)
                denom = min(len(term), len(q.term)) or 1
                return max(0.0, 1.0 - dist / denom)
            return 1.0

        if method == "constant_score":
            inner = BooleanQuery(tuple(
                Clause(TermQuery(t), Occur.SHOULD) for t in terms))
            return ConstantScoreQuery(inner, q.boost)
        return BooleanQuery(tuple(
            Clause(TermQuery(t, q.boost * member_boost(t)), Occur.SHOULD)
            for t in terms))

    def _mt_match(self, q: MultiTermQuery, term: str) -> bool:
        if isinstance(q, PrefixQuery):
            return term.startswith(q.prefix)
        if isinstance(q, WildcardQuery):
            rx = "".join(".*" if ch == "*" else "." if ch == "?"
                         else re.escape(ch) for ch in q.pattern)
            return re.fullmatch(rx, term) is not None
        if isinstance(q, RegexpQuery):
            # DOCUMENTED DIALECT CAVEAT: the engine expands regexes via
            # Spark's rlike (Java regex); this in-memory path uses
            # Python re.  The dialects agree on the grammar both
            # support, but Java-only syntax (\p{Lower} classes,
            # possessive quantifiers) or Python-only syntax (named
            # groups) matches differently — the score-identity contract
            # holds for dialect-portable patterns only.
            return re.fullmatch(q.regex, term) is not None
        if isinstance(q, FuzzyQuery):
            if q.prefix_length > 0 and \
                    not term.startswith(q.term[:q.prefix_length]):
                return False
            if abs(len(term) - len(q.term)) > q.max_edits:
                return False
            return _levenshtein(term, q.term) <= q.max_edits
        if isinstance(q, TermRangeQuery):
            if q.lower is not None and (
                    term < q.lower if q.include_lower else term <= q.lower):
                return False
            if q.upper is not None and (
                    term > q.upper if q.include_upper else term >= q.upper):
                return False
            return True
        raise NotImplementedError(f"multi-term query {type(q)}")
