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


def query_phrases(q: Query) -> set[tuple[str, ...]]:
    """Exact (slop-0) phrases in a query tree — the highlighter's
    phrase extraction (UnifiedHighlighter builds interval automata for
    phrases instead of flattening them to terms).  Sloppy phrases
    degrade to loose terms via :func:`query_terms`."""
    if isinstance(q, PhraseQuery) and getattr(q, "slop", 0) == 0 \
            and len(q.terms) > 1:
        return {tuple(q.terms)}
    if isinstance(q, ConstantScoreQuery):
        return query_phrases(q.query)
    if isinstance(q, BooleanQuery):
        out: set[tuple[str, ...]] = set()
        from lucene_1_spark.search.query import Occur
        for c in q.clauses:
            if c.occur != Occur.MUST_NOT:
                out |= query_phrases(c.query)
        return out
    return set()


def highlight(texts: DataFrame, terms: set[str] | Query,
              analyzer: str = "standard", window: int = 24,
              max_passages: int = 1, pre: str = "<b>", post: str = "</b>",
              id_col: str = "doc_id", text_col: str = "text",
              scorer: str = "bm25", k1: float = 1.2,
              b: float = 0.75) -> DataFrame:
    """(doc_id, n_matches, snippet) for docs with >= 1 matching unit.

    Passages are ``window``-token sliding blocks ranked by the
    UnifiedHighlighter's PassageScorer model
    (``uhighlight/PassageScorer.java:35-110``), ``scorer="bm25"``
    (default)::

        pivot      = window                 # avgPassageLength analog
        numDocs^   = 1 + len_tokens/pivot   # pseudo corpus of passages
        weight(u)  = (k1+1) * ln(1 + (numDocs^ - F_u + .5)/(F_u + .5))
        tf(f,plen) = f / (f + k1*((1-b) + b*plen/pivot))
        score      = (1 + 1/ln(e + start)) * sum_u weight(u)*tf(f_u, plen)

    so a passage holding a RARE query term outranks one stuffed with a
    term frequent elsewhere in the document, and earlier passages win
    ties — BM25-weighted passage ranking, not first-k spans.
    ``scorer="count"`` keeps the legacy (distinct units, total matches,
    -position) ordering.

    With ``max_passages > 1`` the top non-overlapping passages are
    rendered in document order joined by ``" ... "`` (the
    ``maxPassages`` queue contract).  ``terms`` may be a query tree:
    its positive terms AND exact phrases are extracted — a slop-0
    PhraseQuery highlights only full consecutive occurrences (wrapped
    as ONE span), never isolated member terms; expand MultiTermQuery
    nodes with ``searcher.rewrite_multi_term`` first if needed."""
    phrase_set: set[tuple[str, ...]] = set()
    if isinstance(terms, Query):
        phrase_set = query_phrases(terms)
        in_phrases = {t for p in phrase_set for t in p}
        terms = query_terms(terms) - in_phrases
    term_set = frozenset(terms)
    phrases = sorted(phrase_set)
    an_name = analyzer
    n_passages = max(int(max_passages), 1)
    use_bm25 = scorer == "bm25"
    kk1, bb = float(k1), float(b)

    def run(it):
        import math
        an = get_analyzer(an_name)
        has_offsets = hasattr(an, "tokens_with_offsets")

        def find_spans(toks):
            """Hit spans as (pos_start, pos_end, char_s, char_e, unit):
            loose-term occurrences plus full exact-phrase occurrences
            (consecutive positions) — ExactPhraseMatcher semantics."""
            spans = []
            by_pos = {}
            for t, p, s, e in toks:
                by_pos.setdefault(p, []).append((t, s, e))
            for t, p, s, e in toks:
                if t in term_set:
                    spans.append((p, p, s, e, t))
            for ph in phrases:
                L = len(ph)
                for t0, p0, s0, e0 in toks:
                    if t0 != ph[0]:
                        continue
                    chars = [(s0, e0)]
                    ok = True
                    for off in range(1, L):
                        nxt = [(s, e) for t, s, e in by_pos.get(p0 + off, [])
                               if t == ph[off]]
                        if not nxt:
                            ok = False
                            break
                        chars.append(nxt[0])
                    if ok:
                        spans.append((p0, p0 + L - 1, chars[0][0],
                                      chars[-1][1], " ".join(ph)))
            spans.sort()
            return spans

        def render(text, toks, spans, start):
            win = [tk for tk in toks if start <= tk[1] < start + window]
            wspans = [sp for sp in spans
                      if start <= sp[0] and sp[1] < start + window]
            if has_offsets and win:
                # exact OffsetAttribute spans: slice the source text,
                # wrap each matched span in place (case preserved);
                # a phrase wraps as ONE contiguous span
                c0, c1 = win[0][2], win[-1][3]
                parts, cur = [], c0
                for _, _, s, e, _ in wspans:
                    if s >= cur:
                        parts += [text[cur:s], pre, text[s:e], post]
                        cur = max(cur, e)
                parts.append(text[cur:c1])
                return "".join(parts)
            # approximate fallback: word-split window + regex wrap
            words = text.split()
            lo = max(0, start - 2)
            passage = " ".join(words[lo:lo + window + 4])
            units = sorted({sp[4] for sp in wspans}, key=len, reverse=True)
            for u in units:
                pat = "\\s+".join(re.escape(w) for w in u.split())
                passage = re.sub(f"(?i)\\b({pat})\\b",
                                 f"{pre}\\1{post}", passage)
            return passage

        def passage_score(spans_in, start, plen, doc_freq, n_tokens):
            if not use_bm25:
                return (len({sp[4] for sp in spans_in}), len(spans_in),
                        -start)
            pivot = float(window)
            num_docs = 1.0 + n_tokens / pivot
            freq = {}
            for sp in spans_in:
                freq[sp[4]] = freq.get(sp[4], 0) + 1
            tf_norm = kk1 * ((1.0 - bb) + bb * plen / pivot)
            s = 0.0
            for u, f in freq.items():
                x = max((num_docs - doc_freq[u] + 0.5)
                        / (doc_freq[u] + 0.5), 1e-3)
                w = (kk1 + 1.0) * math.log(1.0 + x)
                s += w * f / (f + tf_norm)
            return (s * (1.0 + 1.0 / math.log(math.e + start)), -start)

        for pdf in it:
            ids, counts, snips = [], [], []
            for rid, text in zip(pdf[id_col], pdf[text_col]):
                text = text or ""
                if has_offsets:
                    toks = an.tokens_with_offsets(text)
                else:
                    toks = [(t, p, -1, -1)
                            for t, p in an.tokens_with_positions(text)]
                spans = find_spans(toks)
                if not spans:
                    continue
                doc_freq = {}
                for sp in spans:
                    doc_freq[sp[4]] = doc_freq.get(sp[4], 0) + 1
                # score every half-window start, keep the top
                # max_passages non-overlapping windows
                npos = max(p for _, p, _, _ in toks) + 1 if toks else 0
                scored = []
                for start in range(0, max(1, npos), max(window // 2, 1)):
                    inwin = [sp for sp in spans
                             if start <= sp[0] and sp[1] < start + window]
                    if inwin:
                        plen = sum(1 for _, p, _, _ in toks
                                   if start <= p < start + window)
                        scored.append((passage_score(
                            inwin, start, plen, doc_freq, len(toks)),
                            start))
                scored.sort(key=lambda x: x[0], reverse=True)
                chosen: list[int] = []
                for _, start in scored:
                    if len(chosen) >= n_passages:
                        break
                    if all(abs(start - c) >= window for c in chosen):
                        chosen.append(start)
                chosen.sort()  # render in document order
                passage = " ... ".join(render(text, toks, spans, c)
                                       for c in chosen)
                ids.append(rid)
                counts.append(len(spans))
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
