"""SimpleQueryParser analog — the lenient end-user query syntax
(``lucene/queryparser/src/java/org/apache/lucene/queryparser/simple/
SimpleQueryParser.java:120-180`` operator set):

- ``+`` AND, ``|`` OR, ``-`` NOT (at clause start)
- ``"..."`` phrase, optionally ``"..."~N`` (slop)
- trailing ``*`` prefix, ``term~N`` fuzzy
- ``( )`` grouping, ``\\`` escapes any operator char
- bare whitespace applies the default operator (SHOULD, like the
  reference's default)

The CONTRACT is the reference's: this parser **never throws** — any
malformed input (unbalanced quotes or parens, dangling operators,
random garbage) degrades to the nearest sensible query instead of
raising, because it parses human search-box input.  Leniency choices:
an unterminated quote runs to end-of-input; an unmatched ``)`` is
skipped; an unmatched ``(`` groups to end-of-input; a clause of only
negations matches everything-except (MatchAll + MUST_NOT).

``flags`` mirrors the reference's enable bits (AND_OPERATOR,
OR_OPERATOR, NOT_OPERATOR, PHRASE_OPERATOR, PRECEDENCE_OPERATORS,
PREFIX_OPERATOR, ESCAPE_OPERATOR, FUZZY_OPERATOR, NEAR_OPERATOR) —
a disabled operator's character is treated as literal term text.

Precedence is NOT > AND > OR with left-to-right association (the
documented behavior of the reference's linear state machine for
non-pathological inputs); the implementation is clean-room.
"""

from __future__ import annotations

import re

from lucene_1_spark.analysis import get_analyzer
from lucene_1_spark.search.query import (BooleanQuery, Clause, FuzzyQuery,
                                         MatchAllDocsQuery,
                                         MatchNoDocsQuery, Occur,
                                         PhraseQuery, PrefixQuery, Query,
                                         TermQuery)

ALL_FLAGS = frozenset({
    "AND_OPERATOR", "OR_OPERATOR", "NOT_OPERATOR", "PHRASE_OPERATOR",
    "PRECEDENCE_OPERATORS", "PREFIX_OPERATOR", "ESCAPE_OPERATOR",
    "FUZZY_OPERATOR", "NEAR_OPERATOR",
})

_NUM = re.compile(r"\d+")


def _lex(text: str, flags: frozenset) -> list[tuple]:
    """Tokens: ("AND",) ("OR",) ("NOT",) ("LP",) ("RP",)
    ("PHRASE", text, slop) ("TERM", text, kind, n) where kind is
    "plain" | "prefix" | "fuzzy"."""
    toks: list[tuple] = []
    i, n = 0, len(text)
    while i < n:
        c = text[i]
        if c.isspace():
            i += 1
            continue
        if c == '"' and "PHRASE_OPERATOR" in flags:
            j, buf = i + 1, []
            while j < n and text[j] != '"':
                if text[j] == "\\" and j + 1 < n \
                        and "ESCAPE_OPERATOR" in flags:
                    buf.append(text[j + 1])
                    j += 2
                else:
                    buf.append(text[j])
                    j += 1
            i = j + 1 if j < n else j  # unterminated quote: lenient
            slop = 0
            if i < n and text[i] == "~" and "NEAR_OPERATOR" in flags:
                m = _NUM.match(text, i + 1)
                if m:
                    slop = int(m.group())
                    i = m.end()
                else:
                    i += 1
            toks.append(("PHRASE", "".join(buf), slop))
            continue
        if c == "(" and "PRECEDENCE_OPERATORS" in flags:
            toks.append(("LP",))
            i += 1
            continue
        if c == ")" and "PRECEDENCE_OPERATORS" in flags:
            toks.append(("RP",))
            i += 1
            continue
        if c == "+" and "AND_OPERATOR" in flags:
            toks.append(("AND",))
            i += 1
            continue
        if c == "|" and "OR_OPERATOR" in flags:
            toks.append(("OR",))
            i += 1
            continue
        if c == "-" and "NOT_OPERATOR" in flags:
            toks.append(("NOT",))
            i += 1
            continue
        # term: runs to whitespace or an ENABLED operator boundary
        stop = set()
        if "PHRASE_OPERATOR" in flags:
            stop.add('"')
        if "PRECEDENCE_OPERATORS" in flags:
            stop.update("()")
        if "AND_OPERATOR" in flags:
            stop.add("+")
        if "OR_OPERATOR" in flags:
            stop.add("|")
        buf = []
        kind, edits = "plain", 0
        while i < n and not text[i].isspace() and text[i] not in stop:
            ch = text[i]
            if ch == "\\" and i + 1 < n and "ESCAPE_OPERATOR" in flags:
                buf.append(text[i + 1])
                i += 2
                continue
            if ch == "~" and "FUZZY_OPERATOR" in flags:
                m = _NUM.match(text, i + 1)
                edits = int(m.group()) if m else 2
                i = m.end() if m else i + 1
                kind = "fuzzy"
                break
            buf.append(ch)
            i += 1
        word = "".join(buf)
        if kind == "plain" and word.endswith("*") \
                and "PREFIX_OPERATOR" in flags:
            word, kind = word.rstrip("*"), "prefix"
        if word:
            toks.append(("TERM", word, kind, edits))
        # a bare operator-suffix with no word (e.g. lone "~3") drops
    return toks


class _P:
    """Recursive-descent over the token list with full recovery."""

    def __init__(self, toks: list[tuple], an, default_operator: str):
        self.toks = toks
        self.i = 0
        self.an = an
        self.implicit_or = default_operator != "must"

    def peek(self):
        return self.toks[self.i][0] if self.i < len(self.toks) else None

    def _starts_clause(self) -> bool:
        return self.peek() in ("TERM", "PHRASE", "LP", "NOT")

    # ---- atoms -------------------------------------------------------
    def atom(self) -> Query | None:
        t = self.toks[self.i]
        if t[0] == "LP":
            self.i += 1
            q = self.or_level(stop_rp=True)
            if self.peek() == "RP":
                self.i += 1
            return q
        if t[0] == "RP":     # unmatched ) — skip it
            self.i += 1
            return None
        if t[0] == "PHRASE":
            self.i += 1
            words = self.an.tokens(t[1])
            if not words:
                return None
            if len(words) == 1:
                return TermQuery(words[0])
            return PhraseQuery(tuple(words), slop=int(t[2]))
        if t[0] == "TERM":
            self.i += 1
            _, word, kind, edits = t
            if kind == "prefix":
                norm = self.an.tokens(word)
                return PrefixQuery(norm[0]) if norm else None
            if kind == "fuzzy":
                norm = self.an.tokens(word)
                if not norm:
                    return None
                return FuzzyQuery(norm[0], max_edits=max(0, min(edits, 2)))
            words = self.an.tokens(word)
            if not words:
                return None
            if len(words) == 1:
                return TermQuery(words[0])
            # one whitespace chunk analyzed to several tokens:
            # createBooleanQuery(SHOULD) — the reference's default fold
            return BooleanQuery(tuple(
                Clause(TermQuery(w), Occur.SHOULD) for w in words))
        # dangling AND/OR — consumed by the levels; here = skip
        self.i += 1
        return None

    def not_level(self) -> tuple[Query | None, bool]:
        neg = False
        while self.peek() == "NOT":
            self.i += 1
            neg = not neg
        p = self.peek()
        if p is None or p in ("AND", "OR", "RP"):
            # dangling '-' (or bare operator): drop the negation,
            # leave the operator for the enclosing level
            return None, False
        return self.atom(), neg

    def and_level(self, stop_rp: bool) -> Query | None:
        pos: list[Query] = []
        negs: list[Query] = []

        def take():
            q, neg = self.not_level()
            if q is not None:
                (negs if neg else pos).append(q)

        take()
        while True:
            p = self.peek()
            if p == "AND":
                self.i += 1
                if self._starts_clause():
                    take()
                continue
            if not self.implicit_or and self._starts_clause():
                take()
                continue
            if stop_rp and p == "RP":
                break
            if p == "RP" and not stop_rp:   # stray ) — skip
                self.i += 1
                continue
            break
        if not pos and not negs:
            return None
        if not negs and len(pos) == 1:
            return pos[0]
        clauses = [Clause(q, Occur.MUST) for q in pos]
        if not pos:
            clauses.append(Clause(MatchAllDocsQuery(), Occur.MUST))
        clauses += [Clause(q, Occur.MUST_NOT) for q in negs]
        return BooleanQuery(tuple(clauses))

    def or_level(self, stop_rp: bool = False) -> Query | None:
        parts: list[Query] = []

        def take():
            q = self.and_level(stop_rp)
            if q is not None:
                parts.append(q)

        take()
        while True:
            p = self.peek()
            if p == "OR":
                self.i += 1
                if self._starts_clause():
                    take()
                continue
            if self.implicit_or and self._starts_clause():
                take()
                continue
            if stop_rp and p == "RP":
                break
            if p == "RP" and not stop_rp:
                self.i += 1
                continue
            if p is None or stop_rp:
                break
            # anything unconsumed (defensive): skip one token
            self.i += 1
        if not parts:
            return None
        if len(parts) == 1:
            return parts[0]
        return BooleanQuery(tuple(Clause(q, Occur.SHOULD) for q in parts))


def parse_simple(text: str, analyzer: str = "standard",
                 default_operator: str = "should",
                 flags: frozenset | set | None = None) -> Query:
    """Parse ``text`` with the lenient simple grammar; NEVER raises.
    Empty / all-garbage input returns :class:`MatchNoDocsQuery`."""
    fl = frozenset(flags) if flags is not None else ALL_FLAGS
    an = get_analyzer(analyzer)
    try:
        q = _P(_lex(str(text or ""), fl), an, default_operator).or_level()
        return q if q is not None else MatchNoDocsQuery()
    except Exception:
        # absolute backstop: strip every operator char, OR the tokens
        try:
            words = an.tokens(re.sub(r'[+|\-"()\\~*]', " ",
                                     str(text or "")))
            if not words:
                return MatchNoDocsQuery()
            if len(words) == 1:
                return TermQuery(words[0])
            return BooleanQuery(tuple(
                Clause(TermQuery(w), Occur.SHOULD) for w in words))
        except Exception:
            return MatchNoDocsQuery()
