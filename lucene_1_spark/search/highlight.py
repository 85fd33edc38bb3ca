"""Highlighting + suggest — compact analogs of the reference's
``lucene/highlighter`` (UnifiedHighlighter) and ``lucene/suggest``
modules, declared in-scope for v2 at "useful subset" depth:

- :func:`highlight` — passage extraction over a (doc_id, text) table:
  re-analyzes stored text (the UnifiedHighlighter ANALYSIS offset
  strategy), scores fixed-size token windows by distinct matched query
  terms then total matches, and wraps matches using the analyzer's
  OffsetAttribute spans (``tokens_with_offsets``) — exact source
  character ranges, original case preserved — falling back to
  approximate word-split passages for analyzers without offsets.
  Runs as one Arrow-batched pandas pass over the texts (string work is
  inherently per-doc; the plan stays a single projection, no shuffle).
- :func:`suggest_terms` — prefix completion from the term dictionary
  ordered by doc_freq (PrefixCompletionQuery over a weighted FST in the
  reference; here the term-sorted, bucket-partitioned term_stats table
  IS the weighted dictionary).
- :func:`suggest_terms_fuzzy` — FuzzyCompletionQuery analog
  (edit-distance-filtered, weight-ordered).
"""

from __future__ import annotations

import re

import pandas as pd
from pyspark.sql import DataFrame, functions as F

from lucene_1_spark.analysis import get_analyzer
from lucene_1_spark.search.query import (BooleanQuery, ConstantScoreQuery,
                                         PhraseQuery, Query, SynonymQuery,
                                         TermQuery)


def query_terms(q: Query) -> set[str]:
    """All positive terms in a (rewritten) query tree — the highlight
    term extraction (UnifiedHighlighter.extractTerms)."""
    if isinstance(q, TermQuery):
        return {q.term}
    if isinstance(q, (PhraseQuery, SynonymQuery)):
        return set(q.terms)
    if isinstance(q, ConstantScoreQuery):
        return query_terms(q.query)
    if isinstance(q, BooleanQuery):
        out: set[str] = set()
        from lucene_1_spark.search.query import Occur
        for c in q.clauses:
            if c.occur != Occur.MUST_NOT:
                out |= query_terms(c.query)
        return out
    return set()


def highlight(texts: DataFrame, terms: set[str] | Query,
              analyzer: str = "standard", window: int = 24,
              max_passages: int = 1, pre: str = "<b>", post: str = "</b>",
              id_col: str = "doc_id", text_col: str = "text") -> DataFrame:
    """(doc_id, n_matches, snippet) for docs with >= 1 matching term.

    Passages are ``window``-token sliding blocks; passages are ranked
    by (distinct matched terms, total matches, -position).  With
    ``max_passages > 1`` the top non-overlapping passages are rendered
    in document order joined by ``" ... "`` — the multi-passage
    UnifiedHighlighter contract (its PassageScorer keeps a
    ``maxPassages`` queue).  ``terms`` may be a query tree (its
    positive terms are extracted) — expand MultiTermQuery nodes with
    ``searcher.rewrite_multi_term`` first if needed."""
    if isinstance(terms, Query):
        terms = query_terms(terms)
    term_set = frozenset(terms)
    an_name = analyzer
    n_passages = max(int(max_passages), 1)

    def run(it):
        an = get_analyzer(an_name)
        has_offsets = hasattr(an, "tokens_with_offsets")

        def render(text, toks, start):
            win = [tk for tk in toks if start <= tk[1] < start + window]
            if has_offsets and win:
                # exact OffsetAttribute spans: slice the source text,
                # wrap each matched span in place (case preserved)
                c0, c1 = win[0][2], win[-1][3]
                parts, cur = [], c0
                for t, _, s, e in win:
                    if t in term_set and s >= cur:
                        parts += [text[cur:s], pre, text[s:e], post]
                        cur = e
                parts.append(text[cur:c1])
                return "".join(parts)
            # approximate fallback: word-split window + regex wrap
            words = text.split()
            lo = max(0, start - 2)
            passage = " ".join(words[lo:lo + window + 4])
            for t in sorted(term_set, key=len, reverse=True):
                passage = re.sub(f"(?i)\\b({re.escape(t)})\\b",
                                 f"{pre}\\1{post}", passage)
            return passage

        for pdf in it:
            ids, counts, snips = [], [], []
            for rid, text in zip(pdf[id_col], pdf[text_col]):
                text = text or ""
                if has_offsets:
                    toks = an.tokens_with_offsets(text)
                else:
                    toks = [(t, p, -1, -1)
                            for t, p in an.tokens_with_positions(text)]
                n_hits = sum(1 for t, _, _, _ in toks if t in term_set)
                if not n_hits:
                    continue
                # score every half-window start, keep the top
                # max_passages non-overlapping windows
                npos = max(p for _, p, _, _ in toks) + 1 if toks else 0
                scored = []
                for start in range(0, max(1, npos), max(window // 2, 1)):
                    inwin = [t for t, p, _, _ in toks
                             if start <= p < start + window and t in term_set]
                    if inwin:
                        scored.append(((len(set(inwin)), len(inwin), -start),
                                       start))
                scored.sort(reverse=True)
                chosen: list[int] = []
                for _, start in scored:
                    if len(chosen) >= n_passages:
                        break
                    if all(abs(start - c) >= window for c in chosen):
                        chosen.append(start)
                chosen.sort()  # render in document order
                passage = " ... ".join(render(text, toks, c)
                                       for c in chosen)
                ids.append(rid)
                counts.append(n_hits)
                snips.append(passage)
            yield pd.DataFrame({"doc_id": ids, "n_matches": counts,
                                "snippet": snips})

    return texts.mapInPandas(
        run, "doc_id long, n_matches long, snippet string")


def suggest_terms(reader, prefix: str, k: int = 5) -> DataFrame:
    """(term, weight): top-k dictionary completions for a prefix,
    ordered by doc_freq desc then term asc (weighted prefix completion;
    the parquet term-sorted files give row-group pruning on the scan)."""
    from lucene_1_spark.index.builder import FIELD_SEP
    return (reader.term_stats()
            .filter(~F.col("term").contains(FIELD_SEP))
            .filter(F.col("term").startswith(prefix))
            .select("term", F.col("doc_freq").cast("long").alias("weight"))
            .orderBy(F.desc("weight"), F.asc("term"))
            .limit(k))


def suggest_terms_infix(reader, fragment: str, k: int = 5) -> DataFrame:
    """AnalyzingInfixSuggester analog (``suggest/analyzing/
    AnalyzingInfixSuggester.java``): completions CONTAINING the typed
    fragment anywhere, weight-ordered.  An infix match can't use the
    term-sorted row-group pruning (full dictionary scan, like the
    reference's separate suggest index does its own search)."""
    from lucene_1_spark.index.builder import FIELD_SEP
    return (reader.term_stats()
            .filter(~F.col("term").contains(FIELD_SEP))
            .filter(F.col("term").contains(fragment))
            .select("term", F.col("doc_freq").cast("long").alias("weight"))
            .orderBy(F.desc("weight"), F.asc("term"))
            .limit(k))


def suggest_terms_fuzzy(reader, text: str, max_edits: int = 1,
                        k: int = 5) -> DataFrame:
    """FuzzyCompletionQuery analog: completions within ``max_edits`` of
    the typed text, weight-ordered."""
    from lucene_1_spark.index.builder import FIELD_SEP
    return (reader.term_stats()
            .filter(~F.col("term").contains(FIELD_SEP))
            .filter(F.levenshtein(F.col("term"), F.lit(text)) <= max_edits)
            .select("term", F.col("doc_freq").cast("long").alias("weight"))
            .orderBy(F.desc("weight"), F.asc("term"))
            .limit(k))
