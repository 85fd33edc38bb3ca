"""Surround query language — proximity-first end-user syntax.

Analog of the reference's surround parser
(``lucene/queryparser/src/java/org/apache/lucene/queryparser/surround/``
— ``parser/QueryParser.jj`` grammar, ``query/DistanceQuery.java``,
``query/OrQuery.java`` / ``AndQuery.java`` / ``NotQuery.java``,
``query/SrndTruncQuery.java`` / ``SrndPrefixQuery.java``).  The
surround language exposes span proximity directly to end users:

- infix distance: ``a 3w b`` (ordered, within distance 3),
  ``a 5n b`` (unordered, within distance 5); bare ``w`` / ``n`` mean
  distance 1 (adjacent)
- prefix distance: ``3w(a, b, c)`` / ``5n(a, b)`` — n-ary
- booleans: infix ``a and b`` / ``a or b`` / ``a not b`` and prefix
  ``and(a, b)`` / ``or(a, b, c)`` / ``not(a, b)`` (all
  case-insensitive, per the reference grammar's <AND|OR|NOT|W|N>
  token definitions)
- truncation: ``pre*`` (SrndPrefixQuery) and ``?`` single-char
  (SrndTruncQuery) — expanded against the term dictionary at execute
  time via the MultiTermQuery rewrite (``expand_terms``)
- grouping parens; ``^boost`` suffix accepted and ignored (surround
  matching here is constant-score doc-set algebra, like the
  reference's BasicQueryFactory default usage for filtering)

Distance nodes reduce onto the intervals algebra (the same reduction
as ``search/spans.py``): ordered -> ``ordered_source(max_gaps=d-1)``
with OR-composite children allowed (so truncations work inside
``w``); unordered -> the minimal-window term sweep, term-only
operands (the repo's documented intervals deviation).  Boolean nodes
execute as doc-set joins: AND = inner join, OR = union distinct,
NOT = left anti — all distributed, no driver materialization.

Like the reference parser, outermost distance/bool operators
associate n-ary ("a w b w c" is one 3-operand W node, matching the
grammar's operator-list production), and malformed input raises
``SurroundParseError`` (the reference's ParseException analog — the
surround language is strict, unlike SimpleQueryParser).
"""

from __future__ import annotations

import re
from dataclasses import dataclass

from pyspark.sql import DataFrame, functions as F

from lucene_1_spark.search import intervals as iv


class SurroundParseError(ValueError):
    """ParseException analog."""


class SrndNode:
    pass


@dataclass(frozen=True)
class SrndTerm(SrndNode):
    text: str

    @property
    def truncated(self) -> bool:
        return "*" in self.text or "?" in self.text


@dataclass(frozen=True)
class SrndDistance(SrndNode):
    distance: int
    ordered: bool           # True = W, False = N
    operands: tuple

    def __post_init__(self):
        if self.distance < 1:
            raise SurroundParseError("distance must be >= 1")
        if len(self.operands) < 2:
            raise SurroundParseError("distance op needs >= 2 operands")


@dataclass(frozen=True)
class SrndBool(SrndNode):
    op: str                 # 'and' | 'or' | 'not'
    operands: tuple

    def __post_init__(self):
        if len(self.operands) < 2:
            raise SurroundParseError(f"{self.op} needs >= 2 operands")


_TOKEN_RE = re.compile(r"""
    (?P<lparen>\()
  | (?P<rparen>\))
  | (?P<comma>,)
  | (?P<boost>\^\d+(\.\d+)?)
  | (?P<word>[^\s(),^]+)
""", re.VERBOSE)

_DIST_RE = re.compile(r"(?i)^(\d*)([wn])$")
_BOOL_WORDS = {"and", "or", "not"}


def _lex(text: str) -> list[tuple[str, str]]:
    toks = []
    pos = 0
    for m in _TOKEN_RE.finditer(text):
        if text[pos:m.start()].strip():
            raise SurroundParseError(
                f"unexpected input at {pos}: {text[pos:m.start()]!r}")
        pos = m.end()
        kind = m.lastgroup
        if kind == "boost":
            continue            # accepted, ignored (constant score)
        toks.append((kind, m.group()))
    if text[pos:].strip():
        raise SurroundParseError(f"unexpected trailing input: {text[pos:]!r}")
    return toks


class _Parser:
    """Recursive descent over the surround grammar: OR < AND < NOT <
    distance (W/N) < primary — the precedence order of the reference
    grammar's FieldsQuery -> OrQuery -> AndQuery -> NotQuery ->
    NQuery -> WQuery -> PrimaryQuery productions."""

    def __init__(self, toks: list[tuple[str, str]]):
        self.toks = toks
        self.i = 0

    def peek(self):
        return self.toks[self.i] if self.i < len(self.toks) else (None, None)

    def take(self):
        t = self.peek()
        self.i += 1
        return t

    def expect(self, kind: str):
        k, v = self.take()
        if k != kind:
            raise SurroundParseError(f"expected {kind}, got {v!r}")
        return v

    # -- infix levels (each n-ary, like the grammar's operator lists) --
    def parse(self) -> SrndNode:
        node = self.or_level()
        if self.peek()[0] is not None:
            raise SurroundParseError(
                f"unexpected token {self.peek()[1]!r}")
        return node

    def _infix(self, sub, match, make):
        ops = [sub()]
        kinds = []
        while True:
            k, v = self.peek()
            key = match(k, v)
            if key is None:
                break
            self.take()
            kinds.append(key)
            ops.append(sub())
        if len(ops) == 1:
            return ops[0]
        return make(kinds, ops)

    def or_level(self):
        return self._infix(
            self.and_level,
            lambda k, v: "or" if k == "word" and v.lower() == "or" else None,
            lambda kinds, ops: SrndBool("or", tuple(ops)))

    def and_level(self):
        return self._infix(
            self.not_level,
            lambda k, v: "and" if k == "word" and v.lower() == "and" else None,
            lambda kinds, ops: SrndBool("and", tuple(ops)))

    def not_level(self):
        # NOT is left-assoc binary-chained: a not b not c
        node = self.dist_level()
        while True:
            k, v = self.peek()
            if k == "word" and v.lower() == "not":
                self.take()
                rhs = self.dist_level()
                node = SrndBool("not", (node, rhs))
            else:
                break
        return node

    def dist_level(self):
        # n-ary same-op distance chain: "a w b w c" -> one W node; a
        # MIXED chain (w then n) nests left like the reference grammar
        # (W binds tighter than N).
        node = self.primary()
        while True:
            k, v = self.peek()
            m = _DIST_RE.match(v) if k == "word" else None
            if not m:
                break
            dist = int(m.group(1) or 1)
            ordered = m.group(2).lower() == "w"
            ops = [node]
            while True:
                k2, v2 = self.peek()
                m2 = _DIST_RE.match(v2) if k2 == "word" else None
                if not m2 or int(m2.group(1) or 1) != dist or \
                        (m2.group(2).lower() == "w") != ordered:
                    break
                self.take()
                ops.append(self.primary())
            node = SrndDistance(dist, ordered, tuple(ops)) \
                if len(ops) > 1 else node
        return node

    def primary(self):
        k, v = self.take()
        if k == "lparen":
            node = self.or_level()
            self.expect("rparen")
            return node
        if k != "word":
            raise SurroundParseError(f"unexpected {v!r}")
        low = v.lower()
        # prefix operator form: and(...) / or(...) / not(...) / 3w(...)
        m = _DIST_RE.match(v)
        if self.peek()[0] == "lparen" and (low in _BOOL_WORDS or m):
            self.take()
            ops = [self.or_level()]
            while self.peek()[0] == "comma":
                self.take()
                ops.append(self.or_level())
            self.expect("rparen")
            if m:
                return SrndDistance(int(m.group(1) or 1),
                                    m.group(2).lower() == "w", tuple(ops))
            return SrndBool(low, tuple(ops))
        if low in _BOOL_WORDS or m:
            raise SurroundParseError(
                f"operator {v!r} in term position")
        return SrndTerm(low)


def parse_surround(text: str) -> SrndNode:
    """Parse surround syntax to an AST; raises SurroundParseError on
    malformed input (the reference parser is strict)."""
    toks = _lex(text)
    if not toks:
        raise SurroundParseError("empty query")
    return _Parser(toks).parse()


# ---------------------------------------------------------------------------
# execution: AST -> doc-id DataFrame
# ---------------------------------------------------------------------------

def _expand(searcher, t: SrndTerm) -> list[str]:
    if not t.truncated:
        return [t.text]
    pat = "^" + re.escape(t.text).replace(r"\*", ".*") \
                                 .replace(r"\?", ".") + "$"
    terms = searcher.expand_terms(F.col("term").rlike(pat))
    return terms


def _to_source(searcher, node: SrndNode):
    """Reduce a node INSIDE a distance op to an interval source."""
    if isinstance(node, SrndTerm):
        terms = _expand(searcher, node)
        if not terms:
            return None
        if len(terms) == 1:
            return iv.term(terms[0])
        return iv.or_source(*[iv.term(t) for t in terms])
    if isinstance(node, SrndDistance):
        if not node.ordered:
            raise SurroundParseError(
                "unordered N nested inside a distance op is not "
                "supported (documented intervals deviation)")
        subs = [_to_source(searcher, o) for o in node.operands]
        if any(s is None for s in subs):
            return None
        return iv.ordered_source(*subs, max_gaps=node.distance - 1)
    raise SurroundParseError(
        "boolean operators are not allowed inside distance ops "
        "(the reference grammar has the same restriction)")


def surround_docs(searcher, node: SrndNode) -> DataFrame:
    """Distinct (doc_id) matching the surround AST — constant-score
    doc-set algebra, tombstone-masked like every query path."""
    spark = searcher.spark
    if isinstance(node, SrndTerm):
        terms = _expand(searcher, node)
        if not terms:
            return spark.createDataFrame([], "doc_id long")
        return searcher.docs_for_terms(terms).select("doc_id").distinct()
    if isinstance(node, SrndDistance):
        if node.ordered:
            src = _to_source(searcher, node)
            if src is None:
                return spark.createDataFrame([], "doc_id long")
            return (iv.source_spans(searcher, src)
                    .filter(F.size("starts") > 0)
                    .select("doc_id").distinct())
        # unordered: minimal-window sweep over plain terms
        flat: list[str] = []
        for o in node.operands:
            if not isinstance(o, SrndTerm) or o.truncated:
                raise SurroundParseError(
                    "unordered N supports plain-term operands only "
                    "(documented deviation)")
            flat.append(o.text)
        return (iv.unordered_interval_counts(
                    searcher, flat, max_gaps=node.distance - 1)
                .select("doc_id").distinct())
    if isinstance(node, SrndBool):
        sets = [surround_docs(searcher, o) for o in node.operands]
        out = sets[0]
        for s in sets[1:]:
            if node.op == "and":
                out = out.join(s, "doc_id", "inner")
            elif node.op == "or":
                out = out.unionByName(s)
            else:
                out = out.join(s, "doc_id", "left_anti")
        if node.op == "or":
            out = out.distinct()
        return out
    raise SurroundParseError(f"not a surround node: {type(node).__name__}")


def surround_search(searcher, text: str) -> DataFrame:
    """Parse + execute in one call: distinct matching doc_ids."""
    return surround_docs(searcher, parse_surround(text))
