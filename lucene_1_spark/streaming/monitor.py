"""Monitor / percolator — reverse search (``lucene/monitor/src/java/org/
apache/lucene/monitor/Monitor.java``): thousands of REGISTERED queries
are matched against each incoming document batch.

Lucene builds a query index + "presearcher" to prune which queries
could match a document.  Relationally the whole pattern collapses to
ONE join: registered queries decompose into (query_id, term, occur)
rows; a document batch explodes into (doc_id, term) rows; the
term-keyed equi-join IS the presearcher, and per-(doc, query) clause
counting replays the boolean semantics:

- every MUST/FILTER term present,
- >= minimum_should_match SHOULD terms present (>=1 if the query has
  only SHOULD clauses),
- no MUST_NOT term present (counted on the same join, checked = 0).

One shuffle keyed by term; scales with documents x matched-terms, never
documents x queries.  Phrase queries and ARBITRARY query trees (nested
booleans, prefix/wildcard/regexp/fuzzy/range clauses) percolate in two
stages, exactly the reference's presearcher-then-run-the-query design
(``monitor/TermFilteredPresearcher.java`` -> ``CandidateMatcher``):
the term join prunes candidates using the query's conjunctively
required exact terms (or a some-of set for pure disjunctions; queries
with no extractable term set degrade to every-doc candidates, the
reference's ANYTOKEN), then a verification kernel re-analyzes ONLY
candidate docs and evaluates the full query tree against each doc's
term -> positions map (:func:`_eval_query`; phrases use the same
slop/repeat semantics as :class:`PhraseQuery`).

Streaming: wire :meth:`Monitor.match_batch` into
``writeStream.foreachBatch`` for continuous percolation.
"""

from __future__ import annotations

import re

import numpy as np

from pyspark.sql import DataFrame, SparkSession, functions as F

from lucene_1_spark.search.query import (BooleanQuery, ConstantScoreQuery,
                                         DisjunctionMaxQuery, FuzzyQuery,
                                         MatchAllDocsQuery,
                                         MatchNoDocsQuery, MultiTermQuery,
                                         Occur, PhraseQuery, PrefixQuery,
                                         Query, RegexpQuery, SynonymQuery,
                                         TermInSetQuery, TermQuery,
                                         TermRangeQuery, WildcardQuery,
                                         parse_query, query_from_dict,
                                         query_to_dict)

# marker prefix for serialized (non-parser-expressible) registrations;
# \x00 cannot appear in user query text
_JSON_MARK = "\x00json:"


def _parse_registered(stored: str, analyzer: str):
    """A registered query back to its tree: either parser text or the
    serialized form of a register-by-Query-object call."""
    if stored.startswith(_JSON_MARK):
        import json as _json
        return query_from_dict(_json.loads(stored[len(_JSON_MARK):]))
    return parse_query(stored, analyzer)


def _phrase_occurs(pos: dict, terms: tuple, slop: int) -> bool:
    """True iff the phrase matches once in a doc's term->positions map —
    slop=0 consecutive; slop>0 per :class:`PhraseQuery` semantics
    (2 distinct terms: any in-slop pair; otherwise anchored per-slot
    displacement with repeated-term slots forced onto DISTINCT
    occurrences, mirroring the executor's fix of
    ``SloppyPhraseMatcher.java:52-90``)."""
    plists = [pos.get(t) for t in terms]
    if any(p is None for p in plists):
        return False
    a0 = np.asarray(plists[0], dtype=np.int64)
    n_terms = len(terms)
    repeated = {t for t in terms if terms.count(t) > 1}
    if slop == 0:
        ok = np.ones(len(a0), dtype=bool)
        for i in range(1, n_terms):
            ok &= np.isin(a0 + i, np.asarray(plists[i], dtype=np.int64))
        return bool(ok.any())
    if n_terms == 2 and not repeated:
        b = np.asarray(plists[1], dtype=np.int64)
        e = b[None, :] - a0[:, None] - 1
        return bool((np.abs(e) <= slop).any())
    ok = np.ones(len(a0), dtype=bool)
    prev: dict = {}
    if terms[0] in repeated:
        prev[terms[0]] = a0
    for i in range(1, n_terms):
        pi = np.asarray(sorted(plists[i]), dtype=np.int64)
        target = a0 + i
        if terms[i] not in repeated:
            d = np.abs(pi[None, :] - target[:, None])
            ok &= (d <= slop).any(axis=1)
            continue
        p = prev.get(terms[i])
        lb = target - slop if p is None else np.maximum(target - slop, p + 1)
        if len(pi) == 0:
            return False
        idx = np.searchsorted(pi, lb, side="left")
        idxc = np.minimum(idx, len(pi) - 1)
        chosen = pi[idxc]
        good = (idx < len(pi)) & (chosen <= target + slop)
        ok &= good
        prev[terms[i]] = np.where(good, chosen, target)
    return bool(ok.any())


# -- pure-Python query evaluation over a doc's term->positions map ----------
# (the CandidateMatcher stage run on candidates only; the presearcher
# decides WHICH (doc, query) pairs reach this code)

def _term_matches(q: MultiTermQuery, term: str) -> bool:
    """Mirror of IndexSearcher._multi_term_predicate for one term."""
    if isinstance(q, PrefixQuery):
        return term.startswith(q.prefix)
    if isinstance(q, WildcardQuery):
        rx = "".join(".*" if ch == "*" else "." if ch == "?"
                     else re.escape(ch) for ch in q.pattern)
        return re.fullmatch(rx, term) is not None
    if isinstance(q, RegexpQuery):
        return re.fullmatch(f"(?:{q.regex})", term) is not None
    if isinstance(q, FuzzyQuery):
        from lucene_1_spark.search.executor import _levenshtein
        if abs(len(term) - len(q.term)) > q.max_edits:
            return False
        if q.prefix_length > 0 \
                and not term.startswith(q.term[:q.prefix_length]):
            return False
        return _levenshtein(term, q.term) <= q.max_edits
    if isinstance(q, TermRangeQuery):
        if q.lower is not None:
            if term < q.lower or (term == q.lower and not q.include_lower):
                return False
        if q.upper is not None:
            if term > q.upper or (term == q.upper and not q.include_upper):
                return False
        return True
    raise NotImplementedError(f"multi-term query {type(q)}")


def _eval_query(q, pos: dict) -> bool:
    """Does the query tree match a document given its analyzed
    term -> sorted-positions map?  Supports every content-field query
    shape the main searcher executes (term / phrase / boolean at any
    nesting / prefix / wildcard / regexp / fuzzy / range / synonym /
    constant-score / match-all / match-none)."""
    if isinstance(q, TermQuery):
        if q.field != "content":
            raise NotImplementedError(
                "Monitor percolates content-field queries")
        return q.term in pos
    if isinstance(q, SynonymQuery):
        return any(t in pos for t in q.terms)
    if isinstance(q, PhraseQuery):
        return _phrase_occurs(pos, tuple(q.terms), int(q.slop))
    if isinstance(q, ConstantScoreQuery):
        return _eval_query(q.query, pos)
    if isinstance(q, MatchAllDocsQuery):
        return True
    if isinstance(q, MatchNoDocsQuery):
        return False
    if isinstance(q, MultiTermQuery):
        return any(_term_matches(q, t) for t in pos)
    if isinstance(q, DisjunctionMaxQuery):
        return any(_eval_query(d, pos) for d in q.disjuncts)
    if isinstance(q, TermInSetQuery):
        if q.field != "content":
            raise NotImplementedError(
                "Monitor percolates content-field queries")
        return any(t in pos for t in q.terms)
    if isinstance(q, BooleanQuery):
        n_should = 0
        should_hit = 0
        has_req = False
        for c in q.clauses:
            if c.occur in (Occur.MUST, Occur.FILTER):
                has_req = True
                if not _eval_query(c.query, pos):
                    return False
            elif c.occur == Occur.MUST_NOT:
                if _eval_query(c.query, pos):
                    return False
            else:
                n_should += 1
                if _eval_query(c.query, pos):
                    should_hit += 1
        msm = int(q.minimum_should_match)
        if msm == 0 and n_should > 0 and not has_req:
            msm = 1    # pure disjunction needs >= 1 SHOULD hit
        return should_hit >= msm
    raise NotImplementedError(f"Monitor cannot percolate {type(q)}")


def _required_terms_of(q) -> set[str]:
    """Exact content terms EVERY match of the query must contain — the
    conjunctive presearcher key set (TermFilteredPresearcher's term
    extraction).  Empty = no conjunctive exact-term constraint."""
    if isinstance(q, TermQuery) and q.field == "content":
        return {q.term}
    if isinstance(q, PhraseQuery):
        return set(q.terms)
    if isinstance(q, ConstantScoreQuery):
        return _required_terms_of(q.query)
    if isinstance(q, BooleanQuery):
        out: set[str] = set()
        for c in q.clauses:
            if c.occur in (Occur.MUST, Occur.FILTER):
                out |= _required_terms_of(c.query)
        return out
    if isinstance(q, DisjunctionMaxQuery) and q.disjuncts:
        # every match satisfies >=1 disjunct, so only terms required by
        # ALL disjuncts are required by the dismax
        sets = [_required_terms_of(d) for d in q.disjuncts]
        out = sets[0]
        for s_ in sets[1:]:
            out = out & s_
        return out
    if isinstance(q, TermInSetQuery) and q.field == "content" \
            and len(q.terms) == 1:
        return set(q.terms)
    return set()


def _any_terms_of(q) -> set[str] | None:
    """Exact content terms such that EVERY match contains at least one
    of them (the disjunctive presearcher fallback); ``None`` when no
    such finite set is derivable (-> ANYTOKEN: every doc is a
    candidate, ``monitor/TermFilteredPresearcher.java`` semantics for
    un-filterable queries)."""
    if isinstance(q, TermQuery) and q.field == "content":
        return {q.term}
    if isinstance(q, (SynonymQuery, PhraseQuery)):
        return set(q.terms)
    if isinstance(q, ConstantScoreQuery):
        return _any_terms_of(q.query)
    if isinstance(q, BooleanQuery):
        req = [c for c in q.clauses
               if c.occur in (Occur.MUST, Occur.FILTER)]
        if req:
            # any ONE required clause's any-set covers all matches
            for c in req:
                s = _any_terms_of(c.query)
                if s:
                    return s
            return None
        out: set[str] = set()
        for c in q.clauses:
            if c.occur == Occur.SHOULD:
                s = _any_terms_of(c.query)
                if s is None:
                    return None
                out |= s
        return out or None
    if isinstance(q, DisjunctionMaxQuery):
        out = set()
        for d in q.disjuncts:
            s = _any_terms_of(d)
            if s is None:
                return None
            out |= s
        return out or None
    if isinstance(q, TermInSetQuery) and q.field == "content":
        return set(q.terms) or None
    return None


class _NotFlat(Exception):
    """Query shape outside the single-join fast path."""


class Monitor:
    def __init__(self, spark: SparkSession, analyzer: str = "whitespace"):
        self.spark = spark
        self.analyzer = analyzer
        self._rows: list[tuple] = []   # (query_id, term, occur)
        self._meta: list[tuple] = []   # (query_id, n_must, msm)
        # query_id -> list of (phrase terms, slop, occur_name)
        self._phrase_defs: dict[str, list[tuple[tuple, int, str]]] = {}
        # query_id -> query_text for ARBITRARY trees, verified by
        # _eval_query on candidates; parallel _matchall lists complex
        # ids with no presearchable term set (ANYTOKEN)
        self._complex: dict[str, str] = {}
        self._matchall: list[str] = []

    def register(self, query_id: str, query_text: "str | Query") -> None:
        """Register any parseable query — or any Query OBJECT, incl.
        shapes the classic parser cannot express (DisjunctionMax,
        TermInSet, ...), persisted via the query-tree serializer
        (MonitorQuerySerializer analog).

        FLAT term/boolean/phrase trees take the single-join fast path:
        clause rows enter the presearcher join and the per-(doc, query)
        aggregation replays the boolean semantics; phrase clauses are
        verified positionally on candidates.  ANY OTHER tree (nested
        booleans, prefix/wildcard/regexp/fuzzy/range clauses, ...) is
        registered as a COMPLEX query: the presearcher extracts its
        conjunctively-required exact terms (or a some-of set for pure
        disjunctions), and candidates are verified by evaluating the
        full tree against the doc's analyzed term->positions map —
        exactly the reference's TermFilteredPresearcher ->
        CandidateMatcher split, with un-filterable queries degrading to
        every-doc candidates (ANYTOKEN)."""
        if isinstance(query_text, Query):
            import json as _json
            q = query_text
            stored = _JSON_MARK + _json.dumps(query_to_dict(q))
        else:
            q = parse_query(query_text, self.analyzer)
            stored = query_text
        try:
            self._register_flat(query_id, q)
        except _NotFlat:
            self._register_complex(query_id, stored, q)

    def _register_flat(self, query_id: str, q) -> None:
        # phrase clause records: (terms, slop, occur_name)
        phrases: list[tuple[tuple, int, str]] = []
        if isinstance(q, PhraseQuery):
            phrases.append((q.terms, int(q.slop), "MUST"))
            clauses = [(t, Occur.MUST) for t in sorted(set(q.terms))]
            msm = 0
        elif isinstance(q, TermQuery):
            if q.field != "content":
                raise _NotFlat
            clauses = [(q.term, Occur.SHOULD)]
            msm = 0
        elif isinstance(q, BooleanQuery):
            clauses = []
            for c in q.clauses:
                if isinstance(c.query, PhraseQuery):
                    occ = "FILTER" if c.occur == Occur.FILTER                         else c.occur.value
                    phrases.append((c.query.terms, int(c.query.slop), occ))
                    if c.occur in (Occur.MUST, Occur.FILTER):
                        # presearcher: every phrase term must be present
                        for t in sorted(set(c.query.terms)):
                            clauses.append((t, Occur.MUST))
                    else:
                        # SHOULD/MUST_NOT: presence-only rows surface the
                        # doc as a candidate without counting anywhere
                        for t in sorted(set(c.query.terms)):
                            clauses.append((t, "PRESENCE"))
                elif isinstance(c.query, TermQuery) \
                        and c.query.field == "content":
                    clauses.append((c.query.term, c.occur))
                else:
                    raise _NotFlat
            msm = q.minimum_should_match
        else:
            raise _NotFlat
        n_must = sum(1 for _, o in clauses
                     if o in (Occur.MUST, Occur.FILTER))
        n_should = sum(1 for _, o in clauses if o == Occur.SHOULD)             + sum(1 for _, _, o in phrases if o == "SHOULD")
        if n_must == 0 and n_should > 0 and msm == 0:
            msm = 1  # pure disjunction needs >=1 SHOULD hit
        for term, occur in clauses:
            self._rows.append((query_id, term,
                               occur if isinstance(occur, str)
                               else occur.value))
        self._meta.append((query_id, n_must, msm))
        if phrases:
            self._phrase_defs[query_id] = phrases

    def _register_complex(self, query_id: str, query_text: str, q) -> None:
        req = _required_terms_of(q)
        if req:
            rows = [(query_id, t, "MUST") for t in sorted(req)]
            n_must, msm = len(req), 0
        else:
            anyt = _any_terms_of(q)
            if anyt:
                rows = [(query_id, t, "SHOULD") for t in sorted(anyt)]
                n_must, msm = 0, 1
            else:
                # ANYTOKEN: no term filter possible — every doc is a
                # candidate for this query
                rows, n_must, msm = [], 0, 0
                self._matchall.append(query_id)
        self._rows.extend(rows)
        self._meta.append((query_id, n_must, msm))
        self._complex[query_id] = query_text

    # -- persistence (Monitor's durable query index,
    #    ``monitor/Monitor.java`` with an FSDirectory-backed
    #    QueryIndex): registered queries survive a driver restart ----
    def save(self, path: str) -> None:
        """Write the registered-query state as JSON (tiny driver-side
        metadata, same durability class as the index manifest)."""
        import json
        import os
        os.makedirs(path, exist_ok=True)
        state = {
            "analyzer": self.analyzer,
            "rows": self._rows,
            "meta": self._meta,
            "phrase_defs": {qid: [[list(t), s, o] for t, s, o in defs]
                            for qid, defs in self._phrase_defs.items()},
            "complex": self._complex,
            "matchall": self._matchall,
        }
        tmp = os.path.join(path, "monitor.json.tmp")
        with open(tmp, "w") as fh:
            json.dump(state, fh)
        os.replace(tmp, os.path.join(path, "monitor.json"))

    @classmethod
    def load(cls, spark: SparkSession, path: str) -> "Monitor":
        import json
        import os
        with open(os.path.join(path, "monitor.json")) as fh:
            state = json.load(fh)
        m = cls(spark, analyzer=state["analyzer"])
        m._rows = [tuple(r) for r in state["rows"]]
        m._meta = [tuple(r) for r in state["meta"]]
        m._phrase_defs = {qid: [(tuple(t), int(s), o)
                                for t, s, o in defs]
                          for qid, defs in state["phrase_defs"].items()}
        m._complex = dict(state.get("complex", {}))
        m._matchall = list(state.get("matchall", []))
        return m

    def _tables(self) -> tuple[DataFrame, DataFrame]:
        qt = self.spark.createDataFrame(
            self._rows, "query_id string, term string, occur string")
        qm = self.spark.createDataFrame(
            self._meta, "query_id string, n_must long, msm long")
        return qt, qm

    def match_batch(self, docs: DataFrame, id_col: str = "doc_id",
                    text_col: str = "text") -> DataFrame:
        """(doc_id, query_id) for every registered query each doc
        satisfies.  One term-keyed equi-join + one aggregation."""
        from lucene_1_spark.analysis import get_analyzer
        an_name = self.analyzer
        qt, qm = self._tables()

        if an_name == "whitespace":  # JVM-side tokenization fast path
            toks = docs.select(
                F.col(id_col).alias("doc_id"),
                F.explode(F.filter(
                    F.split(F.lower(F.coalesce(F.col(text_col), F.lit(""))),
                            r"\s+"), lambda t: t != "")).alias("term")) \
                .distinct()
        else:
            import pandas as pd

            def tok(it):
                an = get_analyzer(an_name)
                for pdf in it:
                    ids, terms = [], []
                    for rid, txt in zip(pdf[id_col], pdf[text_col]):
                        for t in set(an.tokens(txt or "")):
                            ids.append(rid)
                            terms.append(t)
                    yield pd.DataFrame({"doc_id": ids, "term": terms})

            toks = docs.select(id_col, text_col).mapInPandas(
                tok, "doc_id long, term string")

        hit = toks.join(F.broadcast(qt), "term")
        agg = (hit.groupBy("doc_id", "query_id").agg(
            F.sum(F.when(F.col("occur").isin("MUST", "FILTER"), 1)
                  .otherwise(0)).alias("must_hit"),
            F.sum(F.when(F.col("occur") == "SHOULD", 1)
                  .otherwise(0)).alias("should_hit"),
            F.sum(F.when(F.col("occur") == "MUST_NOT", 1)
                  .otherwise(0)).alias("mnot_hit")))
        base = (agg.join(F.broadcast(qm), "query_id")
                .filter((F.col("must_hit") >= F.col("n_must"))
                        & (F.col("mnot_hit") == 0)))
        phrase_ids = sorted(self._phrase_defs)
        complex_ids = sorted(self._complex)
        defer = set(phrase_ids) | set(complex_ids)
        flat = (base.filter(~F.col("query_id").isin(sorted(defer)))
                .filter(F.col("should_hit") >= F.col("msm"))
                .select("doc_id", "query_id")) if defer else \
            base.filter(F.col("should_hit") >= F.col("msm")) \
                .select("doc_id", "query_id")
        out = flat
        if phrase_ids:
            # phrase-bearing queries: msm is DEFERRED to verification
            # so a verified SHOULD phrase can contribute its should-hit
            cands = (base.filter(F.col("query_id").isin(phrase_ids))
                     .select("doc_id", "query_id", "should_hit", "msm"))
            out = out.unionByName(
                self._verify_phrases(cands, docs, id_col, text_col))
        if complex_ids:
            cand_c = (base.filter(F.col("query_id").isin(complex_ids))
                      .filter(F.col("should_hit") >= F.col("msm"))
                      .select("doc_id", "query_id"))
            if self._matchall:
                # ANYTOKEN queries: every incoming doc is a candidate
                ids_df = self.spark.createDataFrame(
                    [(i,) for i in self._matchall], "query_id string")
                cand_c = cand_c.unionByName(
                    docs.select(F.col(id_col).alias("doc_id"))
                    .crossJoin(F.broadcast(ids_df)))
            out = out.unionByName(
                self._verify_complex(cand_c, docs, id_col, text_col))
        return out

    def _verify_phrases(self, cands: DataFrame, docs: DataFrame,
                        id_col: str, text_col: str) -> DataFrame:
        """Positions pass over candidate (doc, query) pairs only — the
        CandidateMatcher stage: re-analyze each candidate doc once;
        required phrases must ALL occur, a MUST_NOT phrase occurrence
        kills the pair, each verified SHOULD phrase adds one should-hit
        before the deferred minimumShouldMatch check."""
        import pandas as pd

        from lucene_1_spark.analysis import get_analyzer
        defs = dict(self._phrase_defs)
        an_name = self.analyzer
        joined = cands.join(
            docs.select(F.col(id_col).alias("doc_id"),
                        F.coalesce(F.col(text_col), F.lit(""))
                        .alias("_text")), "doc_id")

        def verify(it):
            an = get_analyzer(an_name)
            has_pos = hasattr(an, "tokens_with_positions")
            for pdf in it:
                ids, qids = [], []
                for did, grp in pdf.groupby("doc_id", sort=False):
                    pos: dict = {}
                    text = grp["_text"].iloc[0]
                    if has_pos:
                        pairs = an.tokens_with_positions(text)
                    else:
                        pairs = [(t, p) for p, t
                                 in enumerate(an.tokens(text))]
                    for t, p in pairs:
                        pos.setdefault(t, []).append(p)
                    for qid, should_hit, msm in zip(
                            grp["query_id"], grp["should_hit"],
                            grp["msm"]):
                        req_ok = True
                        extra_should = 0
                        killed = False
                        for terms, slop, occ in defs[qid]:
                            hit = _phrase_occurs(pos, terms, slop)
                            if occ in ("MUST", "FILTER") and not hit:
                                req_ok = False
                                break
                            if occ == "SHOULD" and hit:
                                extra_should += 1
                            if occ == "MUST_NOT" and hit:
                                killed = True
                                break
                        if req_ok and not killed                                 and should_hit + extra_should >= msm:
                            ids.append(did)
                            qids.append(qid)
                yield pd.DataFrame({
                    "doc_id": pd.array(ids, dtype="int64"),
                    "query_id": pd.array(qids, dtype="string"),
                })

        return joined.mapInPandas(verify, "doc_id long, query_id string")

    def _verify_complex(self, cands: DataFrame, docs: DataFrame,
                        id_col: str, text_col: str) -> DataFrame:
        """CandidateMatcher for ARBITRARY query trees: re-analyze each
        candidate doc once (term -> sorted positions), then evaluate
        every candidate query tree with :func:`_eval_query` — the
        reference runs the real query over its candidate docs the same
        way (``monitor/CandidateMatcher.java``)."""
        import pandas as pd

        from lucene_1_spark.analysis import get_analyzer
        texts = dict(self._complex)
        an_name = self.analyzer
        joined = cands.join(
            docs.select(F.col(id_col).alias("doc_id"),
                        F.coalesce(F.col(text_col), F.lit(""))
                        .alias("_text")), "doc_id")

        def verify(it):
            an = get_analyzer(an_name)
            has_pos = hasattr(an, "tokens_with_positions")
            qmap: dict = {}
            for pdf in it:
                ids, qids = [], []
                for did, grp in pdf.groupby("doc_id", sort=False):
                    pos: dict = {}
                    text = grp["_text"].iloc[0]
                    if has_pos:
                        pairs = an.tokens_with_positions(text)
                    else:
                        pairs = [(t, p) for p, t
                                 in enumerate(an.tokens(text))]
                    for t, p in pairs:
                        pos.setdefault(t, []).append(p)
                    for qid in grp["query_id"]:
                        if qid not in qmap:   # parse once per worker
                            qmap[qid] = _parse_registered(texts[qid], an_name)
                        if _eval_query(qmap[qid], pos):
                            ids.append(did)
                            qids.append(qid)
                yield pd.DataFrame({
                    "doc_id": pd.array(ids, dtype="int64"),
                    "query_id": pd.array(qids, dtype="string"),
                })

        return joined.mapInPandas(verify, "doc_id long, query_id string")

    def foreach_batch(self, sink):
        """``writeStream.foreachBatch`` handler: percolate each
        micro-batch and hand (doc_id, query_id) matches to ``sink``."""
        def handle(batch_df: DataFrame, batch_id: int):
            sink(self.match_batch(batch_df), batch_id)
        return handle
