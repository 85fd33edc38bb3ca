"""Top-k BM25 query execution over the block-packed postings table.

The physical strategy mirrors Lucene's scorer selection
(``search/BooleanScorerSupplier.java:184-346``) re-expressed in Spark:

- **term lookup** — parquet partition pruning on ``bucket`` + predicate
  pushdown on ``term`` (the term-dictionary seek; check
  ``.explain()`` shows PartitionFilters/PushedFilters);
- **block-max pruning** for pure disjunctions / single terms — the
  WAND/MaxScore analog (``search/WANDScorer.java:54``,
  ``MaxScoreCache.java:72-90``): phase 1 scores a handful of
  highest-upper-bound blocks to establish a true lower bound θ on the
  kth score (partial disjunction scores are valid lower bounds), then
  phase 2 decodes only blocks whose relational upper bound
  ``w - w/(1 + max_freq * inv(min_norm_len))`` (+ the other terms'
  global max scores, MaxScore-style) can still beat θ.  Pruning is
  disabled when MUST/MUST_NOT/minShouldMatch would make the bound
  unsound — same spirit as Lucene falling back from WAND;
- **conjunction** — the rarest term (by docFreq) drives; per-term
  scored rows inner-join on ``doc_id`` (the leapfrog analog,
  ``ConjunctionDISI.java:165-217``);
- **MUST_NOT** — ``left_anti`` join (``ReqExclScorer.java:26``);
- **top-k** — ``orderBy(desc(score), asc(doc_id)).limit(k)`` compiles
  to TakeOrderedAndProject: per-partition top-k + driver merge, exactly
  the TopScoreDocCollector/TopDocs.merge shape with Lucene's tie-break
  (``HitQueue.java:78-84``, ``TopDocs.java:202-277``).

Scores are Lucene-exact: per-term float32 BM25 in the decode kernel,
per-doc summation in double, final cast to float32
(``DisjunctionSumScorer.java:39-45``).
"""

from __future__ import annotations

from typing import Iterator

import numpy as np
import pandas as pd
from pyspark.sql import DataFrame, functions as F, types as T

from lucene_1_spark.functions import bm25, codecs
from lucene_1_spark.index.reader import IndexReader
from lucene_1_spark.search.query import (
    BooleanQuery, Clause, ConstantScoreQuery, MatchAllDocsQuery,
    MatchNoDocsQuery, Occur, PhraseQuery, Query, SynonymQuery, TermQuery,
    parse_query, rewrite_fixpoint,
)

DECODED_SCHEMA = T.StructType([
    T.StructField("term", T.StringType()),
    T.StructField("doc_id", T.LongType()),
    T.StructField("score", T.DoubleType()),  # exact float32 widened to double
])

POSITIONS_SCHEMA = T.StructType([
    T.StructField("doc_id", T.LongType()),
    T.StructField("norm_val", T.LongType()),
    T.StructField("positions", T.ArrayType(T.IntegerType())),
])

PRUNE_SAFETY = 1.00001  # relational double ub -> float32 score margin


class IndexSearcher:
    def __init__(self, reader: IndexReader):
        self.reader = reader
        self.spark = reader.spark
        st = reader.stats
        self.similarity = reader.cfg.get("similarity", "bm25_float32")
        self.double_mode = self.similarity == "bm25_double"
        self.k1 = np.float32(reader.cfg["k1"])
        self.b = np.float32(reader.cfg["b"])
        if self.double_mode:
            self.avgdl = st["sum_total_term_freq"] / max(st["doc_count"], 1)
        else:
            self.avgdl = bm25.avg_field_length(
                st["sum_total_term_freq"], max(st["doc_count"], 1))
        self.cache = bm25.norm_inverse_cache(
            np.float32(self.avgdl), self.k1, self.b)
        self.doc_count = st["doc_count"]

    # ------------------------------------------------------------------
    def _flatten(self, q: Query) -> tuple[list[TermQuery], list[TermQuery],
                                          list[TermQuery], int]:
        """-> (must, should, must_not, min_should_match); only flat
        term/boolean trees are supported in v1 (the reference query set)."""
        if isinstance(q, TermQuery):
            return [q], [], [], 0
        if isinstance(q, BooleanQuery):
            must, should, mnot = [], [], []
            for c in q.clauses:
                if not isinstance(c.query, TermQuery):
                    raise NotImplementedError(f"nested query: {c.query}")
                {Occur.MUST: must, Occur.FILTER: must,
                 Occur.SHOULD: should, Occur.MUST_NOT: mnot}[c.occur].append(c.query)
            return must, should, mnot, q.minimum_should_match
        raise NotImplementedError(f"query type {type(q)}")

    def _decode_kernel(self, weights: dict[str, float], want_scores: bool):
        cache = self.cache
        k1, b = float(self.k1), float(self.b)
        avgdl = float(self.avgdl)
        double_mode = self.double_mode

        def decode(it: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
            for pdf in it:
                outs = []
                for row in pdf.itertuples(index=False):
                    n = int(row.num_docs)
                    dids = codecs.decode_doc_ids(bytes(row.doc_gaps),
                                                 int(row.first_doc), n)
                    if want_scores and row.term in weights:
                        freqs = codecs.decode_freqs(bytes(row.freqs), n)
                        if double_mode:
                            lens = np.frombuffer(bytes(row.norms), dtype="<u4")
                            s = bm25.score_term_double(
                                freqs, lens, weights[row.term], avgdl, k1, b)
                        else:
                            norms = np.frombuffer(bytes(row.norms), dtype=np.uint8)
                            w = np.float32(weights[row.term])
                            s = bm25.score_term(freqs, norms, w, cache) \
                                .astype(np.float64)
                    else:
                        s = np.zeros(n, dtype=np.float64)
                    outs.append(pd.DataFrame({
                        "term": row.term, "doc_id": dids, "score": s}))
                yield pd.concat(outs) if outs else pd.DataFrame(
                    {"term": [], "doc_id": [], "score": []})

        return decode

    def _blocks_for(self, terms: list[str]) -> DataFrame:
        buckets = sorted(set(self.reader.buckets_of(terms).values()))
        return (self.reader.postings()
                .filter(F.col("bucket").isin(buckets))
                .filter(F.col("term").isin(terms)))

    def _ub_col(self, weights: dict[str, float]) -> F.Column:
        """Relational per-block score upper bound (double + safety margin):
        w - w/(1 + max_freq / (k1*((1-b) + b*min_norm_len/avgdl)))."""
        wmap = F.create_map(*[x for t, w in weights.items()
                              for x in (F.lit(t), F.lit(float(w)))])
        w = wmap[F.col("term")]
        inv = 1.0 / (float(self.k1) * ((1.0 - float(self.b))
                     + float(self.b) * F.col("min_norm_len") / float(self.avgdl)))
        return (w - w / (1.0 + F.col("max_freq") * inv)) * PRUNE_SAFETY

    # ------------------------------------------------------------------
    def search_df(self, query: Query | str, k: int | None = 10,
                  prune: bool = True,
                  after: tuple[float, int] | None = None) -> DataFrame:
        """Top-k as a DataFrame (doc_id long, score float), rank-ordered.
        ``k=None`` returns ALL matching docs with scores, unsorted (the
        exhaustive-collector mode used by facets/grouping)."""
        if isinstance(query, str):
            query = parse_query(query, self.reader.cfg["analyzer"])
        query = rewrite_fixpoint(query)
        spark = self.spark
        empty = spark.createDataFrame([], "doc_id long, score float")
        if isinstance(query, MatchNoDocsQuery):
            return empty
        if isinstance(query, MatchAllDocsQuery):
            return (self.reader.docs()
                    .select("doc_id", F.lit(float(query.boost)).cast("float")
                            .alias("score"))
                    .orderBy(F.asc("doc_id")).limit(k))
        if isinstance(query, PhraseQuery):
            return self._phrase_search(query, k, after)
        if isinstance(query, ConstantScoreQuery):
            matches = self.search_df(query.query, k=None, prune=False)
            scored = matches.select(
                "doc_id", F.lit(float(query.boost))
                .cast("double" if self.double_mode else "float")
                .alias("score"))
            if k is None:
                return scored
            return scored.orderBy(F.asc("doc_id")).limit(k)
        if isinstance(query, SynonymQuery):
            return self._synonym_search(query, k, after)

        must, should, mnot, msm = self._flatten(query)
        stats = self.reader.term_statistics(
            sorted({t.term for t in must + should + mnot}))
        # a required term absent from the index -> no hits
        if any(t.term not in stats for t in must):
            return empty
        must = [t for t in must if t.term in stats]
        should = [t for t in should if t.term in stats]
        mnot = [t for t in mnot if t.term in stats]
        scoring = must + should
        if not scoring:
            return empty

        if self.double_mode:
            weights = {t.term: t.boost * bm25.idf_double(stats[t.term][0],
                                                         self.doc_count)
                       for t in scoring}
        else:
            weights = {t.term: float(bm25.term_weight(stats[t.term][0],
                                                      self.doc_count, t.boost))
                       for t in scoring}
        all_terms = sorted({t.term for t in scoring + mnot})
        blocks = self._blocks_for(all_terms)

        # Block-max pruning (WAND/MaxScore analog) — only where the bound
        # is sound: pure disjunctions with no pagination cursor.
        use_prune = (prune and k is not None and not must and not mnot
                     and msm == 0 and after is None and len(should) >= 1)
        decoded = None
        if use_prune:
            theta = self._estimate_theta(blocks, weights, k)
            if theta is not None:
                ub = self._ub_col(weights)
                if len(weights) == 1:
                    # single term: survivors' scores are already complete
                    blocks = blocks.filter(ub >= float(theta))
                else:
                    # multi-term: a doc whose EVERY block fails
                    # ub + slack(term) < theta is provably below theta
                    # (its total <= that bound), so the surviving blocks
                    # yield a sound CANDIDATE set; scores of partially
                    # pruned docs would be incomplete, so rescore
                    # candidates exactly against all blocks.
                    other = self._other_max_ubs(blocks, weights)
                    slack = F.create_map(*[x for t, v in other.items()
                                           for x in (F.lit(t), F.lit(float(v)))])
                    surviving = blocks.filter(
                        ub + slack[F.col("term")] >= float(theta))
                    cand = (surviving.mapInPandas(
                        self._decode_kernel(weights, want_scores=False),
                        DECODED_SCHEMA).select("doc_id").distinct())
                    decoded = (blocks.mapInPandas(
                        self._decode_kernel(weights, want_scores=True),
                        DECODED_SCHEMA).join(cand, "doc_id", "left_semi"))

        if decoded is None:
            decoded = blocks.mapInPandas(
                self._decode_kernel(weights, want_scores=True), DECODED_SCHEMA)

        must_terms = [t.term for t in must]
        scoring_terms = [t.term for t in scoring]
        agg = [F.sum(F.when(F.col("term").isin(scoring_terms),
                            F.col("score")).otherwise(0.0)).alias("score_d")]
        if must_terms:
            agg.append(F.sum(F.when(F.col("term").isin(must_terms), 1)
                             .otherwise(0)).alias("n_must"))
        if msm > 0:
            should_terms = [t.term for t in should]
            agg.append(F.sum(F.when(F.col("term").isin(should_terms), 1)
                             .otherwise(0)).alias("n_should"))
        hits = decoded
        if mnot:
            mnot_terms = [t.term for t in mnot]
            excluded = decoded.filter(F.col("term").isin(mnot_terms)) \
                .select("doc_id").distinct()
            hits = hits.filter(~F.col("term").isin(mnot_terms)) \
                .join(excluded, "doc_id", "left_anti")
        per_doc = hits.groupBy("doc_id").agg(*agg)
        if must_terms:
            per_doc = per_doc.filter(F.col("n_must") >= len(set(must_terms)))
        if msm > 0:
            per_doc = per_doc.filter(F.col("n_should") >= msm)
        score_type = "double" if self.double_mode else "float"
        scored = per_doc.select(
            "doc_id", F.col("score_d").cast(score_type).alias("score"))
        if after is not None:
            s, d = after
            scored = scored.filter(
                (F.col("score") < float(s))
                | ((F.col("score") == float(s)) & (F.col("doc_id") > int(d))))
        if k is None:
            return scored
        return scored.orderBy(F.desc("score"), F.asc("doc_id")).limit(k)

    def _other_max_ubs(self, blocks: DataFrame, weights: dict[str, float]) \
            -> dict[str, float]:
        """{term: sum of OTHER terms' global max block ub} (MaxScore)."""
        ub = self._ub_col(weights)
        rows = blocks.groupBy("term").agg(F.max(ub).alias("mx")).collect()
        mx = {r["term"]: float(r["mx"]) for r in rows}
        total = sum(mx.values())
        return {t: total - v for t, v in mx.items()}

    def _estimate_theta(self, blocks: DataFrame, weights: dict[str, float],
                        k: int) -> float | None:
        """True lower bound on the kth score: fully score the docs of the
        highest-upper-bound blocks (a doc's partial disjunction score is
        a lower bound on its total)."""
        ub = self._ub_col(weights)
        probe = (blocks.withColumn("_ub", ub)
                 .orderBy(F.desc("_ub"))
                 .limit(max(4, 2 * ((k // codecs.BLOCK_SIZE) + 1))))
        probe_pd = probe.drop("_ub").toPandas()
        if probe_pd.empty:
            return None
        parts = []
        for row in probe_pd.itertuples(index=False):
            n = int(row.num_docs)
            dids = codecs.decode_doc_ids(bytes(row.doc_gaps), int(row.first_doc), n)
            freqs = codecs.decode_freqs(bytes(row.freqs), n)
            if self.double_mode:
                lens = np.frombuffer(bytes(row.norms), dtype="<u4")
                s = bm25.score_term_double(freqs, lens, weights[row.term],
                                           float(self.avgdl),
                                           float(self.k1), float(self.b))
            else:
                norms = np.frombuffer(bytes(row.norms), dtype=np.uint8)
                w = np.float32(weights[row.term])
                s = bm25.score_term(freqs, norms, w, self.cache).astype(np.float64)
            parts.append(pd.DataFrame({"doc_id": dids, "s": s}))
        per_doc = pd.concat(parts).groupby("doc_id")["s"].sum()
        if len(per_doc) < k:
            return None
        kth = np.sort(per_doc.to_numpy())[-k]
        if not self.double_mode:
            kth = np.float32(kth)
        return float(kth)

    # ------------------------------------------------------------------
    def _decode_positions_kernel(self):
        """Blocks of one term -> (doc_id, norm_val, positions).  Decode
        fuses the segmented prefix-sum over within-doc position deltas."""
        double_mode = self.double_mode

        def decode(it: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
            for pdf in it:
                outs = []
                for row in pdf.itertuples(index=False):
                    n = int(row.num_docs)
                    dids = codecs.decode_doc_ids(bytes(row.doc_gaps),
                                                 int(row.first_doc), n)
                    freqs = codecs.decode_freqs(bytes(row.freqs), n)
                    if double_mode:
                        norms = np.frombuffer(bytes(row.norms), dtype="<u4") \
                            .astype(np.int64)
                    else:
                        norms = np.frombuffer(bytes(row.norms), dtype=np.uint8) \
                            .astype(np.int64)
                    total = int(freqs.sum())
                    deltas = codecs.bitunpack(bytes(row.positions), total)
                    ends = np.cumsum(freqs)
                    g = np.cumsum(deltas)
                    doc_base = np.concatenate(
                        [[0], g[ends[:-1] - 1]]) if n > 1 else np.array([0])
                    pos_abs = (g - np.repeat(doc_base, freqs)).astype(np.int32)
                    outs.append(pd.DataFrame({
                        "doc_id": dids, "norm_val": norms,
                        "positions": np.split(pos_abs, ends[:-1]),
                    }))
                yield pd.concat(outs) if outs else pd.DataFrame(
                    {"doc_id": [], "norm_val": [], "positions": []})

        return decode

    def _phrase_search(self, q: PhraseQuery, k: int | None,
                       after: tuple[float, int] | None) -> DataFrame:
        """Exact phrase: per-term position lists inner-joined on doc_id
        (the positional leapfrog), phrase occurrences counted by
        position intersection, scored as one pseudo-term with
        weight = boost * sum(idf)."""
        empty = self.spark.createDataFrame([], "doc_id long, score float")
        if self.reader.cfg.get("positions") is not True:
            raise ValueError("index was built without positions "
                             "(IndexConfig.positions=True required)")
        stats = self.reader.term_statistics(sorted(set(q.terms)))
        if any(t not in stats for t in q.terms):
            return empty
        if self.double_mode:
            weight = q.boost * sum(
                bm25.idf_double(stats[t][0], self.doc_count) for t in q.terms)
        else:
            acc = 0.0
            for t in q.terms:
                acc += float(bm25.idf(stats[t][0], self.doc_count))
            weight = float(np.float32(np.float32(q.boost) * np.float32(acc)))

        joined = None
        for i, t in enumerate(q.terms):
            blocks_t = self._blocks_for([t]).filter(F.col("term") == t)
            dec = blocks_t.mapInPandas(self._decode_positions_kernel(),
                                       POSITIONS_SCHEMA)
            dec = dec.select("doc_id",
                             *(["norm_val"] if i == 0 else []),
                             F.col("positions").alias(f"p{i}"))
            joined = dec if joined is None else joined.join(dec, "doc_id")

        cache = self.cache
        k1, b = float(self.k1), float(self.b)
        avgdl = float(self.avgdl)
        double_mode = self.double_mode
        n_terms = len(q.terms)

        from pyspark.sql.functions import pandas_udf

        @pandas_udf("double")
        def phrase_score(norm_val: pd.Series, *plists: pd.Series) -> pd.Series:
            out = np.zeros(len(norm_val), dtype=np.float64)
            for r in range(len(norm_val)):
                starts = np.asarray(plists[0].iloc[r], dtype=np.int64)
                for i in range(1, n_terms):
                    nxt = np.asarray(plists[i].iloc[r], dtype=np.int64)
                    starts = starts[np.isin(starts + i, nxt)]
                    if len(starts) == 0:
                        break
                pf = len(starts)
                if pf == 0:
                    continue
                if double_mode:
                    ln = float(norm_val.iloc[r])
                    out[r] = weight * pf / (pf + k1 * ((1 - b) + b * ln / avgdl))
                else:
                    inv = cache[int(norm_val.iloc[r]) & 0xFF]
                    w32 = np.float32(weight)
                    out[r] = float(w32 - w32 / (np.float32(1.0)
                                                + np.float32(pf) * inv))
            return pd.Series(out)

        scored = (joined
                  .withColumn("score_d", phrase_score(
                      F.col("norm_val"),
                      *[F.col(f"p{i}") for i in range(n_terms)]))
                  .filter(F.col("score_d") > 0.0)
                  .select("doc_id", F.col("score_d").cast(
                      "double" if double_mode else "float").alias("score")))
        if after is not None:
            s, d = after
            scored = scored.filter(
                (F.col("score") < float(s))
                | ((F.col("score") == float(s)) & (F.col("doc_id") > int(d))))
        if k is None:
            return scored
        return scored.orderBy(F.desc("score"), F.asc("doc_id")).limit(k)

    # ------------------------------------------------------------------
    def _synonym_search(self, q: SynonymQuery, k: int | None,
                        after: tuple[float, int] | None) -> DataFrame:
        """Members merge into one pseudo-term: doc_freq = max over
        members, per-doc freq = sum over members, scored once
        (``SynonymQuery.java:212-228``)."""
        empty = self.spark.createDataFrame([], "doc_id long, score float")
        stats = self.reader.term_statistics(sorted(set(q.terms)))
        present = [t for t in q.terms if t in stats]
        if not present:
            return empty
        merged_df = max(stats[t][0] for t in present)
        if self.double_mode:
            weight = q.boost * bm25.idf_double(merged_df, self.doc_count)
        else:
            weight = float(np.float32(np.float32(q.boost)
                                      * bm25.idf(merged_df, self.doc_count)))

        # decode raw (doc_id, freq, norm_val) for all member terms
        FREQ_SCHEMA = T.StructType([
            T.StructField("doc_id", T.LongType()),
            T.StructField("freq", T.LongType()),
            T.StructField("norm_val", T.LongType()),
        ])
        double_mode = self.double_mode

        def decode(it: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
            for pdf in it:
                outs = []
                for row in pdf.itertuples(index=False):
                    n = int(row.num_docs)
                    dids = codecs.decode_doc_ids(bytes(row.doc_gaps),
                                                 int(row.first_doc), n)
                    freqs = codecs.decode_freqs(bytes(row.freqs), n)
                    if double_mode:
                        norms = np.frombuffer(bytes(row.norms),
                                              dtype="<u4").astype(np.int64)
                    else:
                        norms = np.frombuffer(bytes(row.norms),
                                              dtype=np.uint8).astype(np.int64)
                    outs.append(pd.DataFrame(
                        {"doc_id": dids, "freq": freqs, "norm_val": norms}))
                yield pd.concat(outs) if outs else pd.DataFrame(
                    {"doc_id": [], "freq": [], "norm_val": []})

        decoded = self._blocks_for(present).mapInPandas(decode, FREQ_SCHEMA)
        merged = decoded.groupBy("doc_id").agg(
            F.sum("freq").alias("freq"), F.max("norm_val").alias("norm_val"))

        cache = self.cache
        k1, b, avgdl = float(self.k1), float(self.b), float(self.avgdl)
        from pyspark.sql.functions import pandas_udf

        @pandas_udf("double")
        def syn_score(freq: pd.Series, norm_val: pd.Series) -> pd.Series:
            f = freq.to_numpy(dtype=np.float64)
            if double_mode:
                ln = norm_val.to_numpy(dtype=np.float64)
                s = weight * f / (f + k1 * ((1 - b) + b * ln / avgdl))
            else:
                s = bm25.score_term(
                    f, norm_val.to_numpy(dtype=np.uint8),
                    np.float32(weight), cache).astype(np.float64)
            return pd.Series(s)

        scored = merged.select(
            "doc_id", syn_score("freq", "norm_val")
            .cast("double" if double_mode else "float").alias("score"))
        if after is not None:
            s, d = after
            scored = scored.filter(
                (F.col("score") < float(s))
                | ((F.col("score") == float(s)) & (F.col("doc_id") > int(d))))
        if k is None:
            return scored
        return scored.orderBy(F.desc("score"), F.asc("doc_id")).limit(k)

    # ------------------------------------------------------------------
    def expand_terms(self, predicate: F.Column) -> list[str]:
        """Multi-term query expansion — the MultiTermQuery rewrite
        (``search/MultiTermQuery.java:86-103``): scan the term
        dictionary with a predicate (startswith/like/rlike/levenshtein/
        between), return matching terms for a disjunction.  Guarded by
        the reference's 1024-clause limit."""
        rows = (self.reader.term_stats().filter(predicate)
                .select("term").collect())
        terms = sorted(r["term"] for r in rows)
        if len(terms) > 1024:
            raise ValueError(f"multi-term expansion too large: {len(terms)}")
        return terms

    def docs_for_terms(self, terms: list[str]) -> DataFrame:
        """Distinct doc_ids containing any of the terms (constant-score
        multi-term execution: no freq decode, no scoring)."""
        if not terms:
            return self.spark.createDataFrame([], "doc_id long")
        blocks = self._blocks_for(sorted(set(terms)))
        decoded = blocks.mapInPandas(
            self._decode_kernel({}, want_scores=False), DECODED_SCHEMA)
        return decoded.select("doc_id").distinct()

    # ------------------------------------------------------------------
    def search(self, query: Query | str, k: int = 10, prune: bool = True,
               after: tuple[float, int] | None = None) -> list[dict]:
        """Top-k with stored fields: [{doc_id, score, repo, path, commit,
        doc_key}] — the stored-field retrieval join (SURVEY.md §2.1)."""
        top = self.search_df(query, k, prune=prune, after=after)
        docs = self.reader.docs()
        out = (F.broadcast(top).join(docs, "doc_id")
               .select("doc_id", "score", "repo", "path", "commit",
                       F.concat_ws("", F.col("repo"), F.lit("/"), F.col("path"),
                                   F.lit("@"), F.col("commit")).alias("doc_key"))
               .orderBy(F.desc("score"), F.asc("doc_id"))
               .collect())
        return [r.asDict() for r in out]

    def count(self, query: Query | str) -> int:
        """TotalHitCountCollector analog."""
        if isinstance(query, str):
            query = parse_query(query, self.reader.cfg["analyzer"])
        query = rewrite_fixpoint(query)
        if isinstance(query, MatchNoDocsQuery):
            return 0
        if isinstance(query, MatchAllDocsQuery):
            return self.reader.stats["n_docs"]
        must, should, mnot, msm = self._flatten(query)
        df = self.search_df(query, k=2**31 - 1, prune=False)
        return df.count()
