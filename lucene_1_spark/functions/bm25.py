"""Exact float32 BM25 scoring, rank- and score-identical to the reference.

Arithmetic mirrors ``BM25Similarity`` (``lucene/core/src/java/org/apache/
lucene/search/similarities/BM25Similarity.java``):

- ``idf = (float) log(1 + (docCount - docFreq + 0.5) / (docFreq + 0.5))``
  computed in double, cast to float32 (``:190-193``).
- ``avgdl = (float)(sumTotalTermFreq / (double) docCount)`` (``:196-198``).
- a 256-entry float32 cache ``1 / (k1 * ((1-b) + b * LENGTH_TABLE[i]/avgdl))``
  indexed by the SmallFloat-encoded norm byte (``:214-217``).
- per-term doc score ``weight - weight / (1 + freq * normInverse)`` in
  float32 (``:255-258``), with ``weight = boost * idf`` float32.
- multi-term scores are summed in DOUBLE then cast to float32, matching
  ``DisjunctionSumScorer.score`` / ``ConjunctionScorer`` (``:39-45``).

All functions are vectorized numpy and shared by the Spark scoring
kernels and the pure-Python oracle, so "engine matches oracle" is a
test of the distributed plumbing, not of two scoring codebases.
"""

from __future__ import annotations

import numpy as np

from lucene_1_spark.functions.smallfloat import LENGTH_TABLE

K1_DEFAULT = np.float32(1.2)
B_DEFAULT = np.float32(0.75)


def idf(doc_freq: int, doc_count: int) -> np.float32:
    """float32(log(1 + (N - n + 0.5)/(n + 0.5))) — double math, float cast."""
    return np.float32(np.log1p((doc_count - doc_freq + 0.5) / (doc_freq + 0.5)))


def avg_field_length(sum_total_term_freq: int, doc_count: int) -> np.float32:
    return np.float32(sum_total_term_freq / float(doc_count))


def norm_inverse_cache(avgdl: np.float32,
                       k1: np.float32 = K1_DEFAULT,
                       b: np.float32 = B_DEFAULT) -> np.ndarray:
    """256-entry float32 cache of 1/(k1*((1-b) + b*len/avgdl)) per norm byte.

    Every step is float32 to match the JVM's float expression evaluation.
    """
    one = np.float32(1.0)
    dl = LENGTH_TABLE  # float32[256], decoded lengths
    denom = (k1 * ((one - b) + b * dl / np.float32(avgdl))).astype(np.float32)
    return (one / denom).astype(np.float32)


def score_term(freq: np.ndarray, norm_byte: np.ndarray, weight: np.float32,
               cache: np.ndarray) -> np.ndarray:
    """Vectorized ``weight - weight / (1 + freq * normInverse)`` in float32."""
    freq = np.asarray(freq, dtype=np.float32)
    inv = cache[np.asarray(norm_byte, dtype=np.uint8)]
    return (weight - weight / (np.float32(1.0) + freq * inv)).astype(np.float32)


def term_weight(doc_freq: int, doc_count: int, boost: float = 1.0) -> np.float32:
    return np.float32(np.float32(boost) * idf(doc_freq, doc_count))


def idf_double(doc_freq: int, doc_count: int) -> float:
    """Double-precision idf for the ``bm25_double`` similarity (the
    pluggable-Similarity extension point, SURVEY.md §2.11): same formula
    as :func:`idf` but without the float32 cast, so an external ANSI-SQL
    oracle can reproduce scores bit-for-bit."""
    return float(np.log1p((doc_count - doc_freq + 0.5) / (doc_freq + 0.5)))


def score_term_double(freq: np.ndarray, lengths: np.ndarray, weight: float,
                      avgdl: float, k1: float = 1.2, b: float = 0.75) -> np.ndarray:
    """Double-precision BM25 with exact (unquantized) field lengths:
    ``idf * freq / (freq + k1*((1-b) + b*len/avgdl))`` — algebraically
    the same curve as :func:`score_term` without quantization."""
    f = np.asarray(freq, dtype=np.float64)
    ln = np.asarray(lengths, dtype=np.float64)
    return weight * f / (f + k1 * ((1.0 - b) + b * ln / avgdl))


def idf_classic(doc_freq: int, doc_count: int) -> float:
    """ClassicSimilarity idf — ``log((docCount+1)/(docFreq+1)) + 1``
    (``search/similarities/ClassicSimilarity.java:59-62``), double
    precision (the classic_double similarity is SQL-oracle exact)."""
    return float(np.log((doc_count + 1.0) / (doc_freq + 1.0)) + 1.0)


def score_term_classic(freq: np.ndarray, lengths: np.ndarray,
                       weight: float) -> np.ndarray:
    """ClassicSimilarity per-term score: ``tf * weight * norm`` with
    ``tf = sqrt(freq)`` (``ClassicSimilarity.java:70-73``),
    ``norm = 1/sqrt(len)`` (lengthNorm, ``:45-48``), and
    ``weight = boost * idf^2`` (TFIDFSimilarity's weight value).
    Double precision with exact field lengths."""
    f = np.asarray(freq, dtype=np.float64)
    ln = np.maximum(np.asarray(lengths, dtype=np.float64), 1.0)
    return weight * np.sqrt(f) / np.sqrt(ln)


MU_DEFAULT = 2000.0


def collection_prob(total_term_freq: int, sum_total_term_freq: int) -> float:
    """LM collection model P(t|C) — ``search/similarities/
    LMSimilarity.java`` DefaultCollectionModel.computeProbability:
    ``(totalTermFreq + 1) / (sumTotalTermFreq + 1)`` (the +1s keep the
    probability nonzero for absent terms).  Double precision — the
    lm_dirichlet_double similarity is SQL-oracle exact."""
    return (float(total_term_freq) + 1.0) / \
        (float(sum_total_term_freq) + 1.0)


def score_term_lm_dirichlet(freq: np.ndarray, lengths: np.ndarray,
                            weight: float, p_c: float,
                            mu: float = MU_DEFAULT) -> np.ndarray:
    """LM with Dirichlet smoothing — ``search/similarities/
    LMDirichletSimilarity.java:60-90``:
    ``boost * (log(1 + freq/(mu * P(t|C))) + log(mu/(docLen + mu)))``,
    clamped at 0 (the reference clamps because a doc shorter than the
    collection expectation can push the smoothed term below the
    background model).  Exact field lengths, double precision."""
    f = np.asarray(freq, dtype=np.float64)
    ln = np.asarray(lengths, dtype=np.float64)
    s = weight * (np.log1p(f / (mu * p_c)) + np.log(mu / (ln + mu)))
    return np.maximum(s, 0.0)


def score_term_boolean(n: int, weight: float) -> np.ndarray:
    """``search/similarities/BooleanSimilarity.java``: every matching
    doc scores exactly the query boost — frequency and length play no
    part (the set-membership similarity)."""
    return np.full(int(n), float(weight), dtype=np.float64)


def sum_scores(per_term_scores: list[np.ndarray]) -> np.ndarray:
    """Sum aligned per-term float32 score arrays in float64, cast to float32."""
    acc = np.zeros(len(per_term_scores[0]), dtype=np.float64)
    for s in per_term_scores:
        acc += s.astype(np.float64)
    return acc.astype(np.float32)
