"""PrecedenceQueryParser analog — classic syntax with REAL operator
precedence.

The reference's classic parser famously has no precedence: ``a OR b
AND c`` is folded left-to-right over one clause list
(``queryparser/classic/QueryParser.jj:196-320``).  The flexible-module
PrecedenceQueryParser (``queryparser/flexible/precedence/
PrecedenceQueryParser.java:38-60`` + ``processors/
BooleanQuery2ModifierNodeProcessor``) re-parses the same surface
grammar with AND binding tighter than OR, so ``a OR b AND c`` means
``a OR (b AND c)``.  This module implements that grammar by recursive
descent over the SAME scanner and atom vocabulary as the classic
parser (terms, phrases + slop, fuzzy/prefix/wildcard/regexp, term
ranges, ``field:``, ``^boost``, ``(...)``):

    query  := ([+|-|NOT] disj)+        juxtaposition = default OR
    disj   := conj (OR conj)*          -> BooleanQuery of SHOULDs
    conj   := prim (AND prim)*         -> BooleanQuery of MUSTs
    prim   := '(' query ')' suffix | atom

Like the reference's flexible pipeline it is lenient where leniency is
safe: an operator with nothing to bind degrades to a term, and empty
analysis yields MatchNoDocs rather than raising.
"""

from __future__ import annotations

from lucene_1_spark.analysis import get_analyzer
from lucene_1_spark.search.query import (
    BooleanQuery, Clause, MatchAllDocsQuery, MatchNoDocsQuery, Occur,
    Query, _apply_boost, _Scanner, _word_atom,
)


def _consume_op(sc: _Scanner, names: tuple[str, ...]) -> bool:
    save = sc.i
    sc.skip_ws()
    w = sc.read_word()
    if w in names:
        return True
    sc.i = save
    return False


def _primary(sc: _Scanner, an, kw: frozenset, tf: frozenset) -> Query | None:
    sc.skip_ws()
    ch = sc.peek()
    if ch == "" or ch == ")":
        return None
    if ch == "(":
        sc.next()
        sub = _parse_precedence_seq(sc, an, kw, tf)
        if sc.peek() == ")":
            sc.next()
        _, boost = sc.read_suffix()
        return _apply_boost(sub, boost) if sub is not None else None
    # quoted phrases / ranges / regexps share the classic clause
    # parser's atom code exactly: delegate one atom by slicing the
    # scanner at the atom boundary is fragile, so re-use the proven
    # branch logic inline for the two stateful atoms and fall back to
    # _word_atom for bare words.
    if ch == '"':
        sc.next()
        raw = sc.read_until('"')
        tilde, boost = sc.read_suffix()
        slop = max(tilde, 0) if tilde is not None else 0
        from lucene_1_spark.search.query import PhraseQuery, TermQuery
        terms = an.tokens(raw)
        if len(terms) >= 2:
            return PhraseQuery(tuple(terms), boost, slop)
        if terms:
            return TermQuery(terms[0], boost)
        return None
    if ch in "[{":
        from lucene_1_spark.search.query import TermRangeQuery
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
            return TermRangeQuery(lo, hi, inc_lo, inc_hi, boost=boost)
        return None
    if ch == "/":
        from lucene_1_spark.search.query import RegexpQuery
        sc.next()
        raw = sc.read_until("/")
        _, boost = sc.read_suffix()
        return RegexpQuery(raw, boost=boost)
    word = sc.read_word()
    if not word:           # stray structural char: consume, stay lenient
        sc.next()
        return None
    if word == "*" or word == "*:*":
        return MatchAllDocsQuery()
    try:
        return _word_atom(word, an, kw, tf)
    except ValueError:
        # classic parser throws on unknown field: — lenient contract
        # degrades to analyzed terms of the raw word instead
        toks = an.tokens(word.replace(":", " "))
        if not toks:
            return None
        if len(toks) == 1:
            from lucene_1_spark.search.query import TermQuery
            return TermQuery(toks[0])
        from lucene_1_spark.search.query import TermQuery
        return BooleanQuery(tuple(
            Clause(TermQuery(t), Occur.SHOULD) for t in toks))


def _parse_conj(sc: _Scanner, an, kw: frozenset, tf: frozenset) -> Query | None:
    parts = []
    p = _primary(sc, an, kw, tf)
    if p is not None:
        parts.append(p)
    while _consume_op(sc, ("AND", "&&")):
        before = sc.i
        p = _primary(sc, an, kw, tf)
        if p is not None:
            parts.append(p)
        elif sc.i == before:      # dangling AND at end of input
            break
    if not parts:
        return None
    if len(parts) == 1:
        return parts[0]
    return BooleanQuery(tuple(Clause(p, Occur.MUST) for p in parts))


def _parse_disj(sc: _Scanner, an, kw: frozenset, tf: frozenset) -> Query | None:
    parts = []
    p = _parse_conj(sc, an, kw, tf)
    if p is not None:
        parts.append(p)
    while _consume_op(sc, ("OR", "||")):
        before = sc.i
        p = _parse_conj(sc, an, kw, tf)
        if p is not None:
            parts.append(p)
        elif sc.i == before:
            break
    if not parts:
        return None
    if len(parts) == 1:
        return parts[0]
    return BooleanQuery(tuple(Clause(p, Occur.SHOULD) for p in parts))


def _parse_precedence_seq(sc: _Scanner, an, kw: frozenset,
                          tf: frozenset) -> Query | None:
    clauses: list[Clause] = []
    while True:
        sc.skip_ws()
        ch = sc.peek()
        if ch == "" or ch == ")":
            break
        occur = Occur.SHOULD
        if ch == "+":
            sc.next()
            occur = Occur.MUST
        elif ch == "-":
            sc.next()
            occur = Occur.MUST_NOT
        else:
            save = sc.i
            w = sc.read_word()
            if w in ("NOT", "!"):
                occur = Occur.MUST_NOT
            else:
                sc.i = save
        before = sc.i
        q = _parse_disj(sc, an, kw, tf)
        if q is not None:
            clauses.append(Clause(q, occur))
        elif sc.i == before:
            sc.next()              # guarantee progress on garbage
    if not clauses:
        return None
    if len(clauses) == 1 and clauses[0].occur != Occur.MUST_NOT:
        return clauses[0].query
    return BooleanQuery(tuple(clauses))


def parse_precedence(text: str, analyzer: str = "standard",
                     keyword_fields: frozenset | set | tuple = (),
                     text_fields: frozenset | set | tuple = ()) -> Query:
    """Parse ``text`` with AND > OR precedence (PrecedenceQueryParser).

    Never raises on user input: unparseable fragments degrade to terms
    or are skipped, and an empty/garbage-only query parses to
    MatchNoDocsQuery — the flexible pipeline's lenient contract.
    """
    q = _parse_precedence_seq(_Scanner(text), get_analyzer(analyzer),
                              frozenset(keyword_fields),
                              frozenset(text_fields))
    return q if q is not None else MatchNoDocsQuery()
