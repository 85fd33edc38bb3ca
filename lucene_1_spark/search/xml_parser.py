"""XML query parser — the CoreParser element vocabulary.

Analog of the reference's XML query syntax
(``lucene/queryparser/src/java/org/apache/lucene/queryparser/xml/
CoreParser.java`` — element-name -> QueryBuilder registry;
``builders/*.java`` for per-element attribute conventions).  An XML
document describes a query tree declaratively: element names pick the
query type, ``fieldName`` is INHERITED from enclosing elements
(``DOMUtils.getAttributeWithInheritanceOrFail``), and ``boost``
composes anywhere.

Supported elements (the CoreParser registry):

- ``TermQuery`` / ``TermsQuery`` (text analyzed into SHOULD terms)
- ``MatchAllDocsQuery``
- ``BooleanQuery`` with ``Clause occurs="must|mustNot|should|filter"``
  children and ``minimumNumberShouldMatch``
- ``RangeQuery`` (TermRangeQuery: ``lowerTerm``/``upperTerm``,
  ``includeLower``/``includeUpper``)
- ``PointRangeQuery`` (numeric doc-values range; ``type`` int/long/
  float/double sets bound parsing, bounds inclusive like the
  reference's PointRangeQueryBuilder)
- ``DisjunctionMaxQuery`` (``tieBreaker``)
- ``ConstantScoreQuery``
- ``UserQuery`` — classic parser syntax embedded in XML
  (UserInputQueryBuilder)
- ``BoostingTermQuery`` -> PayloadScoreQuery with the ``avg`` fold +
  includeSpanScore=True, exactly BoostingTermBuilder's
  AveragePayloadFunction construction
- spans: ``SpanTerm`` / ``SpanNear`` (``slop``, ``inOrder``) /
  ``SpanOr`` / ``SpanOrTerms`` / ``SpanFirst`` (``end``) /
  ``SpanPositionRange`` (``start``/``end``) /
  ``SpanNot`` (``Include``/``Exclude`` children)

Span elements produce a ``spans.SpanQuery`` (position algebra, not a
scored Query) — valid at top level or inside other span elements;
embedding one as a BooleanQuery clause raises (documented deviation:
the repo keeps span matching as a separate facade).

Boost: set on the dataclass when it has a ``boost`` field; otherwise
(BooleanQuery) wrapped as a single-disjunct DisjunctionMaxQuery — the
repo's BoostQuery idiom (``query.py`` boost distribution).

Malformed XML or unknown elements raise ``XmlParserException`` (the
reference's ParserException; the XML syntax is strict, unlike
SimpleQueryParser).
"""

from __future__ import annotations

import xml.etree.ElementTree as ET

from lucene_1_spark.search.query import (BooleanQuery, Clause,
                                         ConstantScoreQuery,
                                         DisjunctionMaxQuery,
                                         DocValuesRangeQuery,
                                         MatchAllDocsQuery, Occur,
                                         PayloadScoreQuery, Query,
                                         TermQuery, TermRangeQuery,
                                         parse_query)
from lucene_1_spark.search.spans import (SpanFirstQuery, SpanNearQuery,
                                         SpanNotQuery, SpanOrQuery,
                                         SpanQuery, SpanTermQuery)


class XmlParserException(ValueError):
    """ParserException analog (``xml/ParserException.java``)."""


_OCCURS = {"must": Occur.MUST, "mustnot": Occur.MUST_NOT,
           "should": Occur.SHOULD, "filter": Occur.FILTER, "": Occur.SHOULD}

_NUM_TYPES = {"int": int, "long": int, "float": float, "double": float}


def _boost(el: ET.Element) -> float:
    try:
        return float(el.get("boost", "1.0"))
    except ValueError as exc:
        raise XmlParserException(f"bad boost {el.get('boost')!r}") from exc


def _apply_boost(q: Query, b: float) -> Query:
    if b == 1.0:
        return q
    try:
        return type(q)(**{**q.__dict__, "boost": q.boost * b})
    except (AttributeError, TypeError):
        # BoostQuery wrapper idiom: 1-disjunct DisMax multiplies boost
        return DisjunctionMaxQuery((q,), 0.0, b)


def _text(el: ET.Element) -> str:
    t = (el.text or "").strip()
    if not t:
        raise XmlParserException(f"<{el.tag}> needs non-blank text")
    return t


def _field(el: ET.Element, inherited: str | None) -> str:
    f = el.get("fieldName") or inherited
    if not f:
        raise XmlParserException(f"<{el.tag}> needs fieldName "
                                 "(own or inherited)")
    return f


def _children(el: ET.Element) -> list[ET.Element]:
    return list(el)


class XmlQueryParser:
    """CoreParser analog: ``parse`` turns an XML string into a Query
    (or a span facade query for Span* roots)."""

    def __init__(self, default_field: str = "content",
                 analyzer: str = "standard",
                 keyword_fields: tuple = (), text_fields: tuple = ()):
        self.default_field = default_field
        self.analyzer = analyzer
        self.keyword_fields = tuple(keyword_fields)
        self.text_fields = tuple(text_fields)
        from lucene_1_spark.analysis import get_analyzer
        self._an = get_analyzer(analyzer)

    # -- public ---------------------------------------------------------

    def parse(self, xml: str) -> Query | SpanQuery:
        try:
            root = ET.fromstring(xml)
        except ET.ParseError as exc:
            raise XmlParserException(f"malformed XML: {exc}") from exc
        return self._query(root, None)

    # -- dispatch ---------------------------------------------------------

    def _query(self, el: ET.Element, field: str | None) -> Query | SpanQuery:
        tag = el.tag
        fn = getattr(self, f"_el_{tag}", None)
        if fn is None:
            raise XmlParserException(f"unknown query element <{tag}>")
        return fn(el, field)

    def _scored(self, el: ET.Element, field: str | None) -> Query:
        q = self._query(el, field)
        if isinstance(q, SpanQuery):
            raise XmlParserException(
                f"<{el.tag}> is a span element — valid at top level or "
                "inside Span* combinators only (documented deviation)")
        return q

    def _span(self, el: ET.Element, field: str | None) -> SpanQuery:
        q = self._query(el, field)
        if not isinstance(q, SpanQuery):
            raise XmlParserException(
                f"<{el.tag}> is not a span element")
        return q

    # -- core query elements ----------------------------------------------

    def _el_TermQuery(self, el, field):
        f = _field(el, field)
        return TermQuery(_text(el), _boost(el), f)

    def _el_TermsQuery(self, el, field):
        f = _field(el, field)
        terms = self._an.tokens(_text(el))
        if not terms:
            raise XmlParserException("<TermsQuery> analyzed to no terms")
        bq = BooleanQuery(tuple(Clause(TermQuery(t, 1.0, f), Occur.SHOULD)
                                for t in terms))
        return _apply_boost(bq, _boost(el))

    def _el_MatchAllDocsQuery(self, el, field):
        return MatchAllDocsQuery(_boost(el))

    def _el_BooleanQuery(self, el, field):
        f = el.get("fieldName") or field
        clauses = []
        for ch in _children(el):
            if ch.tag != "Clause":
                raise XmlParserException(
                    f"<BooleanQuery> child must be <Clause>, got <{ch.tag}>")
            occ = _OCCURS.get(ch.get("occurs", "").lower())
            if occ is None:
                raise XmlParserException(
                    f"bad occurs {ch.get('occurs')!r}")
            kids = _children(ch)
            if len(kids) != 1:
                raise XmlParserException("<Clause> needs exactly one query")
            clauses.append(Clause(self._scored(kids[0], f), occ))
        if not clauses:
            raise XmlParserException("<BooleanQuery> needs >= 1 Clause")
        msm = int(el.get("minimumNumberShouldMatch", "0"))
        bq = BooleanQuery(tuple(clauses), minimum_should_match=msm)
        return _apply_boost(bq, _boost(el))

    def _el_RangeQuery(self, el, field):
        # fieldName required for parity (RangeQueryBuilder.java); the
        # expansion itself runs against the indexed text field, like
        # every MultiTermQuery here
        _field(el, field)
        lo, hi = el.get("lowerTerm"), el.get("upperTerm")
        return TermRangeQuery(
            lower=lo, upper=hi,
            include_lower=el.get("includeLower", "true").lower() == "true",
            include_upper=el.get("includeUpper", "true").lower() == "true",
            boost=_boost(el))

    def _el_PointRangeQuery(self, el, field):
        f = _field(el, field)
        typ = _NUM_TYPES.get(el.get("type", "int"))
        if typ is None:
            raise XmlParserException(f"bad type {el.get('type')!r}")
        try:
            lo = typ(el.get("lowerTerm")) if el.get("lowerTerm") else None
            hi = typ(el.get("upperTerm")) if el.get("upperTerm") else None
        except ValueError as exc:
            raise XmlParserException(f"bad numeric bound: {exc}") from exc
        return DocValuesRangeQuery(f, lo, hi, boost=_boost(el))

    def _el_DisjunctionMaxQuery(self, el, field):
        f = el.get("fieldName") or field
        kids = [self._scored(ch, f) for ch in _children(el)]
        if not kids:
            raise XmlParserException(
                "<DisjunctionMaxQuery> needs >= 1 child")
        tie = float(el.get("tieBreaker", "0.0"))
        return DisjunctionMaxQuery(tuple(kids), tie, _boost(el))

    def _el_ConstantScoreQuery(self, el, field):
        kids = _children(el)
        if len(kids) != 1:
            raise XmlParserException(
                "<ConstantScoreQuery> needs exactly one child")
        return ConstantScoreQuery(
            self._scored(kids[0], el.get("fieldName") or field), _boost(el))

    def _el_UserQuery(self, el, field):
        q = parse_query(_text(el), analyzer=self.analyzer,
                        keyword_fields=self.keyword_fields,
                        text_fields=self.text_fields)
        return _apply_boost(q, _boost(el))

    def _el_BoostingTermQuery(self, el, field):
        f = _field(el, field)
        return PayloadScoreQuery(_text(el), function="avg",
                                 include_span_score=True,
                                 field=f, boost=_boost(el))

    # -- span elements ------------------------------------------------------

    def _el_SpanTerm(self, el, field):
        return SpanTermQuery(_text(el))

    def _el_SpanNear(self, el, field):
        f = el.get("fieldName") or field
        kids = tuple(self._span(ch, f) for ch in _children(el))
        return SpanNearQuery(
            kids, slop=int(el.get("slop", "0")),
            in_order=el.get("inOrder", "true").lower() == "true")

    def _el_SpanOr(self, el, field):
        f = el.get("fieldName") or field
        return SpanOrQuery(tuple(self._span(ch, f) for ch in _children(el)))

    def _el_SpanOrTerms(self, el, field):
        terms = self._an.tokens(_text(el))
        if not terms:
            raise XmlParserException("<SpanOrTerms> analyzed to no terms")
        return SpanOrQuery(tuple(SpanTermQuery(t) for t in terms))

    def _el_SpanFirst(self, el, field):
        kids = _children(el)
        if len(kids) != 1:
            raise XmlParserException("<SpanFirst> needs exactly one child")
        if el.get("end") is None:
            raise XmlParserException("<SpanFirst> needs end attribute")
        return SpanFirstQuery(self._span(kids[0], field),
                              int(el.get("end")))

    def _el_SpanPositionRange(self, el, field):
        kids = _children(el)
        if len(kids) != 1:
            raise XmlParserException(
                "<SpanPositionRange> needs exactly one child")
        if el.get("end") is None:
            raise XmlParserException(
                "<SpanPositionRange> needs end attribute")
        from lucene_1_spark.search.spans import SpanPositionRangeQuery
        return SpanPositionRangeQuery(self._span(kids[0], field),
                                      int(el.get("start", "0")),
                                      int(el.get("end")))

    def _el_SpanNot(self, el, field):
        inc = exc = None
        for ch in _children(el):
            if ch.tag == "Include":
                inc = self._span(_children(ch)[0], field)
            elif ch.tag == "Exclude":
                exc = self._span(_children(ch)[0], field)
            else:
                raise XmlParserException(
                    f"<SpanNot> child must be Include/Exclude, "
                    f"got <{ch.tag}>")
        if inc is None or exc is None:
            raise XmlParserException(
                "<SpanNot> needs <Include> and <Exclude>")
        return SpanNotQuery(inc, exc)


def parse_xml_query(xml: str, default_field: str = "content",
                    analyzer: str = "standard",
                    keyword_fields: tuple = (),
                    text_fields: tuple = ()) -> Query | SpanQuery:
    """One-shot CoreParser.parse analog."""
    return XmlQueryParser(default_field, analyzer, keyword_fields,
                          text_fields).parse(xml)


def xml_search(searcher, xml: str, k: int | None = 10, **parser_kw):
    """Parse and execute: scored queries -> ``search_df`` top-k;
    span roots -> ``span_matches`` (doc_id, n_spans)."""
    q = parse_xml_query(xml, **parser_kw)
    if isinstance(q, SpanQuery):
        from lucene_1_spark.search.spans import span_matches
        return span_matches(searcher, q)
    return searcher.search_df(q, k=k)
