"""MoreLikeThis — "find documents like this one".

Reference: ``lucene/queries/src/java/org/apache/lucene/queries/mlt/
MoreLikeThis.java`` — seed text is analyzed, per-term frequencies
filtered by ``minTermFreq`` / ``minDocFreq`` / ``maxDocFreq``
(``MoreLikeThis.java:121-180`` knobs), candidate terms ranked by
``tf * idf`` with the classic idf (``createQueue``,
``MoreLikeThis.java:756-800``), and the best ``maxQueryTerms`` become a
SHOULD-disjunction (``createQuery``, ``MoreLikeThis.java:733-754``).
With ``boost=True`` each term's boost is ``score / bestScore``
(``MoreLikeThis.java:741-750``); the default leaves terms unboosted.

Spark shape: term selection touches ONE document (the seed), so it is
driver-side — a Counter over the analyzer's tokens plus one pyarrow
term-dictionary seek for the doc_freqs (no Spark job).  The resulting
query then executes through the searcher's ordinary distributed
disjunction plan, so the expensive part (scoring the corpus) is the
same pruned postings scan as any hand-written query.
"""

from __future__ import annotations

from collections import Counter

from lucene_1_spark.analysis import get_analyzer
from lucene_1_spark.functions import bm25
from lucene_1_spark.search.query import (BooleanQuery, Clause,
                                         MatchNoDocsQuery, Occur, Query,
                                         TermQuery)

DEFAULT_MAX_QUERY_TERMS = 25   # MoreLikeThis.java:167
DEFAULT_MIN_TERM_FREQ = 2      # MoreLikeThis.java:146
DEFAULT_MIN_DOC_FREQ = 5       # MoreLikeThis.java:152


def interesting_terms(searcher, text: str | None, *,
                      max_query_terms: int = DEFAULT_MAX_QUERY_TERMS,
                      min_term_freq: int = DEFAULT_MIN_TERM_FREQ,
                      min_doc_freq: int = DEFAULT_MIN_DOC_FREQ,
                      max_doc_freq: int | None = None,
                      ) -> list[tuple[str, float, int]]:
    """Ranked ``(term, score, doc_freq)`` triples for a seed text —
    ``MoreLikeThis.retrieveInterestingTerms``.  ``score = tf * idf``
    with the classic idf ``ln((docCount+1)/(docFreq+1)) + 1``
    (TFIDFSimilarity's formula the reference ranks with); ties break
    lexicographically so selection is deterministic and SQL-reproducible.
    """
    analyzer = get_analyzer(searcher.reader.cfg["analyzer"])
    tf = Counter(analyzer.tokens(text or ""))
    cand = sorted(t for t, f in tf.items() if f >= min_term_freq)
    if not cand:
        return []
    stats = searcher.reader.term_statistics(cand)
    n = searcher.doc_count
    rows: list[tuple[str, float, int]] = []
    for t in cand:
        if t not in stats:
            continue
        dfreq = stats[t][0]
        if dfreq < min_doc_freq:
            continue
        if max_doc_freq is not None and dfreq > max_doc_freq:
            continue
        rows.append((t, float(tf[t]) * bm25.idf_classic(dfreq, n), dfreq))
    rows.sort(key=lambda r: (-r[1], r[0]))
    return rows[:max_query_terms]


def more_like_this_query(searcher, text: str | None, *,
                         boost: bool = False,
                         max_query_terms: int = DEFAULT_MAX_QUERY_TERMS,
                         min_term_freq: int = DEFAULT_MIN_TERM_FREQ,
                         min_doc_freq: int = DEFAULT_MIN_DOC_FREQ,
                         max_doc_freq: int | None = None) -> Query:
    """The like-this query for a seed text (``MoreLikeThis.like``):
    a SHOULD-disjunction of the interesting terms, executable/composable
    like any other Query.  Returns MatchNoDocsQuery when nothing
    survives the frequency filters."""
    rows = interesting_terms(
        searcher, text, max_query_terms=max_query_terms,
        min_term_freq=min_term_freq, min_doc_freq=min_doc_freq,
        max_doc_freq=max_doc_freq)
    if not rows:
        return MatchNoDocsQuery()
    best = rows[0][1]
    return BooleanQuery(tuple(
        Clause(TermQuery(t, (sc / best) if boost else 1.0), Occur.SHOULD)
        for t, sc, _ in rows))
