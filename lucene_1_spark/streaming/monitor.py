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
documents x queries.  Phrase queries percolate in two stages, exactly
the reference's presearcher-then-run-the-query design
(``monitor/TermFilteredPresearcher.java`` -> ``CandidateMatcher``):
the term join requires every phrase term present (candidate pruning),
then a positions verification kernel re-analyzes ONLY candidate docs
and keeps (doc, query) pairs where the phrase occurs (exact or within
slop, same semantics as :class:`PhraseQuery`).

Streaming: wire :meth:`Monitor.match_batch` into
``writeStream.foreachBatch`` for continuous percolation.
"""

from __future__ import annotations

import numpy as np

from pyspark.sql import DataFrame, SparkSession, functions as F

from lucene_1_spark.search.query import (BooleanQuery, Occur, PhraseQuery,
                                         TermQuery, parse_query)


def _phrase_occurs(pos: dict, terms: tuple, slop: int) -> bool:
    """True iff the phrase matches once in a doc's term->positions map —
    slop=0 consecutive; slop>0 per :class:`PhraseQuery` semantics
    (2-term: any in-slop pair; n>=3: anchored per-slot displacement)."""
    plists = [pos.get(t) for t in terms]
    if any(p is None for p in plists):
        return False
    a0 = np.asarray(plists[0], dtype=np.int64)
    if slop == 0:
        ok = np.ones(len(a0), dtype=bool)
        for i in range(1, len(terms)):
            ok &= np.isin(a0 + i, np.asarray(plists[i], dtype=np.int64))
        return bool(ok.any())
    if len(terms) == 2:
        b = np.asarray(plists[1], dtype=np.int64)
        e = b[None, :] - a0[:, None] - 1
        return bool((np.abs(e) <= slop).any())
    ok = np.ones(len(a0), dtype=bool)
    for i in range(1, len(terms)):
        pi = np.asarray(plists[i], dtype=np.int64)
        d = np.abs(pi[None, :] - (a0[:, None] + i))
        ok &= (d <= slop).any(axis=1)
    return bool(ok.any())


class Monitor:
    def __init__(self, spark: SparkSession, analyzer: str = "whitespace"):
        self.spark = spark
        self.analyzer = analyzer
        self._rows: list[tuple] = []   # (query_id, term, occur)
        self._meta: list[tuple] = []   # (query_id, n_must, msm)
        # query_id -> list of (phrase terms, slop, occur_name)
        self._phrase_defs: dict[str, list[tuple[tuple, int, str]]] = {}

    def register(self, query_id: str, query_text: str) -> None:
        """Register a term/boolean/phrase query (MonitorQuery analog).
        Phrase clauses percolate under EVERY occur: their terms enter
        the presearcher join (required presence for MUST/FILTER,
        presence-only for SHOULD/MUST_NOT), and a positions kernel
        verifies candidates in match_batch — required phrases must ALL
        occur, each verified SHOULD phrase counts toward
        minimumShouldMatch, a verified MUST_NOT phrase kills the match
        (TermFilteredPresearcher -> CandidateMatcher, the reference
        runs the full query on candidates the same way)."""
        q = parse_query(query_text, self.analyzer)
        # phrase clause records: (terms, slop, occur_name)
        phrases: list[tuple[tuple, int, str]] = []
        if isinstance(q, PhraseQuery):
            phrases.append((q.terms, int(q.slop), "MUST"))
            clauses = [(t, Occur.MUST) for t in sorted(set(q.terms))]
            msm = 0
        elif isinstance(q, TermQuery):
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
                elif isinstance(c.query, TermQuery):
                    clauses.append((c.query.term, c.occur))
                else:
                    raise NotImplementedError(
                        "Monitor percolates flat term/boolean/phrase "
                        "queries")
            msm = q.minimum_should_match
        else:
            raise NotImplementedError(
                "Monitor percolates flat term/boolean/phrase queries")
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
        if not self._phrase_defs:
            return (base.filter(F.col("should_hit") >= F.col("msm"))
                    .select("doc_id", "query_id"))
        phrase_ids = sorted(self._phrase_defs)
        flat = (base.filter(~F.col("query_id").isin(phrase_ids))
                .filter(F.col("should_hit") >= F.col("msm"))
                .select("doc_id", "query_id"))
        # phrase-bearing queries: msm is DEFERRED to verification so a
        # verified SHOULD phrase can contribute its should-hit
        cands = (base.filter(F.col("query_id").isin(phrase_ids))
                 .select("doc_id", "query_id", "should_hit", "msm"))
        verified = self._verify_phrases(cands, docs, id_col, text_col)
        return flat.unionByName(verified)

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

    def foreach_batch(self, sink):
        """``writeStream.foreachBatch`` handler: percolate each
        micro-batch and hand (doc_id, query_id) matches to ``sink``."""
        def handle(batch_df: DataFrame, batch_id: int):
            sink(self.match_batch(batch_df), batch_id)
        return handle
