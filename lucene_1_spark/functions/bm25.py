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


SWEET_SPOT_DEFAULTS = (1, 1, 0.5, 0.0, 0.0)   # ln_min ln_max steep tf_base tf_min


def score_term_sweet_spot(freq: np.ndarray, lengths: np.ndarray,
                          weight: float, ln_min: float = 1,
                          ln_max: float = 1, ln_steep: float = 0.5,
                          tf_base: float = 0.0,
                          tf_min: float = 0.0) -> np.ndarray:
    """SweetSpotSimilarity per-term score —
    ``misc/SweetSpotSimilarity.java``: ClassicSimilarity with

    - baselineTf (``:143-160``): ``0`` if freq == 0, ``tf_base`` if
      freq <= tf_min, else ``sqrt(freq + tf_base^2 - tf_min)`` —
      degrades to ``sqrt(freq)`` at (base=0, min=0);
    - plateau lengthNorm (``:100-120``):
      ``1/sqrt(steep * (|len-min| + |len-max| - (max-min)) + 1)`` —
      exactly 1.0 for len in [ln_min, ln_max], sqrt falloff outside;
      degrades to ``1/sqrt(len)`` at (min=max=1, steep=0.5).

    ``weight = boost * idf_classic^2`` — SweetSpot *extends*
    ClassicSimilarity, so the doc-independent factor is unchanged."""
    f = np.asarray(freq, dtype=np.float64)
    tf = np.where(f <= float(tf_min), float(tf_base),
                  np.sqrt(np.maximum(
                      f + float(tf_base) ** 2 - float(tf_min), 0.0)))
    tf = np.where(f == 0.0, 0.0, tf)
    ln = np.asarray(lengths, dtype=np.float64)
    lo, hi, s = float(ln_min), float(ln_max), float(ln_steep)
    norm = 1.0 / np.sqrt(
        s * (np.abs(ln - lo) + np.abs(ln - hi) - (hi - lo)) + 1.0)
    return weight * tf * norm


def make_classic_scorer(sweet_params: tuple | None = None):
    """The classic-family per-term scorer used by every decode kernel:
    plain ClassicSimilarity when ``sweet_params`` is None, else the
    SweetSpot variant bound to (ln_min, ln_max, steep, tf_base,
    tf_min).  Returned closure is cloudpickle-safe for executors."""
    if sweet_params is None:
        return score_term_classic
    lmin, lmax, steep, tbase, tmin = [float(x) for x in sweet_params]

    def scorer(freq: np.ndarray, lengths: np.ndarray,
               weight: float) -> np.ndarray:
        return score_term_sweet_spot(freq, lengths, weight,
                                     lmin, lmax, steep, tbase, tmin)
    return scorer


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


def score_term_dfi(freq: np.ndarray, lengths: np.ndarray, weight: float,
                   rate: float, measure: str) -> np.ndarray:
    """Divergence-from-independence scoring —
    ``search/similarities/DFISimilarity.java:58-69`` with the three
    Independence measures (``IndependenceChiSquared.java`` /
    ``IndependenceSaturated.java`` / ``IndependenceStandardized.java``):
    ``expected = rate * docLen`` where ``rate`` is the same smoothed
    ``(F + 1) / (T + 1)`` as :func:`collection_prob`; freq <= expected
    scores 0, else ``boost * log2(measure(freq, expected) + 1)``."""
    f = np.asarray(freq, dtype=np.float64)
    e = rate * np.asarray(lengths, dtype=np.float64)
    e = np.maximum(e, 1e-300)
    if measure == "chi2":
        m = (f - e) * (f - e) / e
    elif measure == "sat":
        m = (f - e) / e
    elif measure == "std":
        m = (f - e) / np.sqrt(e)
    else:
        raise ValueError(f"unknown DFI measure {measure!r} "
                         "(chi2|sat|std)")
    with np.errstate(invalid="ignore", divide="ignore"):
        s = weight * np.log2(m + 1.0)
    return np.where(f > e, s, 0.0)


def score_term_boolean(n: int, weight: float) -> np.ndarray:
    """``search/similarities/BooleanSimilarity.java``: every matching
    doc scores exactly the query boost — frequency and length play no
    part (the set-membership similarity)."""
    return np.full(int(n), float(weight), dtype=np.float64)


LMJM_LAMBDA_DEFAULT = 0.1


def score_term_lm_jelinek_mercer(freq: np.ndarray, lengths: np.ndarray,
                                 weight: float, p_c: float,
                                 lam: float = LMJM_LAMBDA_DEFAULT) \
        -> np.ndarray:
    """LM with Jelinek-Mercer smoothing — ``search/similarities/
    LMJelinekMercerSimilarity.java:55-75``:
    ``boost * log(1 + ((1-lambda) * freq/docLen) / (lambda * P(t|C)))``,
    lambda in (0, 1] (reference default 0.1; "close to 0.1 for short
    queries").  freq >= 1 makes the argument positive, so no clamp is
    needed (unlike Dirichlet).  Exact field lengths, double precision
    — SQL-oracle exact."""
    f = np.asarray(freq, dtype=np.float64)
    ln = np.maximum(np.asarray(lengths, dtype=np.float64), 1.0)
    return weight * np.log1p((1.0 - lam) * f / ln / (lam * p_c))


NORM_MU_DEFAULT = 800.0     # NormalizationH3.java Dirichlet prior
NORM_Z_DEFAULT = 0.30       # NormalizationZ.java Pareto-Zipf exponent


def tfn_dfr(freq: np.ndarray, lengths: np.ndarray, avgdl: float,
            c: float = 1.0, norm: str = "h2",
            mu: float = NORM_MU_DEFAULT,
            pivot: float = 0.0) -> np.ndarray:
    """DFR/IB term-frequency normalization (Amati & van Rijsbergen
    2002; ``search/similarities/NormalizationH1.java`` / ``H2.java`` /
    ``H3.java`` / ``Z.java``):

    - H1 ``tfn = c * freq * avgdl/len`` (uniform term distribution)
    - H2 ``tfn = freq * log2(1 + c * avgdl/len)`` (density decreases
      with length)
    - H3 ``tfn = mu * (freq + mu*pivot) / (len + mu)`` with
      ``pivot = (F+1)/(T+1)`` (term-dependent Dirichlet prior,
      ``NormalizationH3.java:48-51``)
    - Z  ``tfn = freq * (avgdl/len)^z`` with ``z = c`` in (0, 0.5)
      (Pareto-Zipf, ``NormalizationZ.java:49-51``)
    """
    f = np.asarray(freq, dtype=np.float64)
    ln = np.maximum(np.asarray(lengths, dtype=np.float64), 1.0)
    if norm == "h1":
        return c * f * avgdl / ln
    if norm == "h3":
        return mu * (f + mu * pivot) / (ln + mu)
    if norm == "z":
        return f * (avgdl / ln) ** c
    return f * np.log2(1.0 + c * avgdl / ln)


def dfr_weight(basic_model: str, after_effect: str, doc_freq: int,
               total_term_freq: int, doc_count: int) -> float:
    """Document-independent DFR factor (divergence-from-randomness,
    Amati & van Rijsbergen 2002; ``search/similarities/
    DFRSimilarity.java`` composes BasicModel x AfterEffect x
    Normalization).  With the first-normalization after-effects L and
    B, the per-doc score factors as ``weight * tfn/(1+tfn)`` where
    weight = boost * Inf1-slope * after-effect-constant:

    - basic model ``if``  (BasicModelIF):  log2(1 + (N+1)/(F+0.5))
    - basic model ``in``  (BasicModelIN):  log2((N+1)/(n+0.5))
    - basic model ``ine`` (BasicModelINE): log2((N+1)/(ne+0.5)),
      ne = N * (1 - ((N-1)/N)^F)  (expected doc-frequency)
    - after-effect ``l`` (Laplace):   1
    - after-effect ``b`` (Bernoulli): (F+1)/n

    with N = docCount, n = docFreq, F = totalTermFreq."""
    N = max(float(doc_count), 1.0)
    n = max(float(doc_freq), 1.0)
    Fq = max(float(total_term_freq), 1.0)
    if basic_model == "if":
        a = np.log2(1.0 + (N + 1.0) / (Fq + 0.5))
    elif basic_model == "in":
        a = np.log2((N + 1.0) / (n + 0.5))
    elif basic_model == "ine":
        ne = N * (1.0 - ((N - 1.0) / N) ** Fq) if N > 1 else Fq
        a = np.log2((N + 1.0) / (ne + 0.5))
    else:
        raise ValueError(f"unknown DFR basic model '{basic_model}'")
    c_ae = 1.0 if after_effect == "l" else (Fq + 1.0) / n
    return float(a * c_ae)


def score_term_dfr(freq: np.ndarray, lengths: np.ndarray, weight: float,
                   avgdl: float, c: float = 1.0,
                   norm: str = "h2", g_ratio: float = 0.0,
                   mu: float = NORM_MU_DEFAULT,
                   pivot: float = 0.0) -> np.ndarray:
    """DFR per-term score: ``weight * tfn/(1+tfn)`` — the Inf1 basic
    models are linear in tfn and the L/B after-effects contribute
    ``const/(1+tfn)``, so everything doc-independent lives in
    ``weight`` (:func:`dfr_weight`).

    Basic model G (geometric; ``BasicModelG.java:36-50``) is AFFINE in
    ``1/(1+tfn)`` rather than linear in tfn: with A = log2(1+lambda),
    B = log2((1+lambda)/lambda), lambda = F/(N+F), the full score is
    ``aeT * (B - (B-A)/(1+tfn))``.  Here ``weight = boost*aeT*B`` (the
    tfn->inf asymptote, :func:`dfr_g_weight`) and ``g_ratio =
    (B-A)/B`` (boost-free, from :func:`dfr_g_weight`), giving
    ``weight * (1 - g_ratio/(1+tfn))`` — non-decreasing in tfn since
    B >= A."""
    tfn = tfn_dfr(freq, lengths, avgdl, c, norm, mu, pivot)
    if g_ratio:
        return weight * (1.0 - g_ratio / (1.0 + tfn))
    return weight * tfn / (1.0 + tfn)


def dfr_g_weight(after_effect: str, doc_freq: int, total_term_freq: int,
                 doc_count: int) -> tuple[float, float]:
    """(aeT*B, (B-A)/B) for DFR basic model G —
    ``BasicModelG.java:36-50``: lambda = F/(N+F) with F = ttf+1,
    A = log2(lambda+1), B = log2((1+lambda)/lambda); after-effect
    constant aeT = 1 (Laplace) or (F'+1)/n (Bernoulli, F' = raw ttf,
    ``AfterEffectB.java:32-35``)."""
    N = max(float(doc_count), 1.0)
    Fq = float(total_term_freq) + 1.0
    lam = Fq / (N + Fq)
    A = float(np.log2(lam + 1.0))
    B = float(np.log2((1.0 + lam) / lam))
    aeT = 1.0 if after_effect == "l" else \
        (float(total_term_freq) + 1.0) / max(float(doc_freq), 1.0)
    return aeT * B, (B - A) / B


def ib_lambda(lambda_kind: str, doc_freq: int, total_term_freq: int,
              doc_count: int) -> float:
    """IB distribution parameter (Clinchant & Gaussier 2010,
    "Information-based models for ad hoc IR"; ``search/similarities/
    LambdaDF.java`` / ``LambdaTTF.java``): ``(n+1)/(N+1)`` (df) or
    ``(F+1)/(N+1)`` (ttf), clamped below 1 (the SPL distribution is
    undefined at lambda = 1)."""
    num = (float(doc_freq) if lambda_kind == "df"
           else float(total_term_freq)) + 1.0
    lam = num / (float(doc_count) + 1.0)
    return float(min(max(lam, 1e-12), 1.0 - 1e-9))


def score_term_ib(freq: np.ndarray, lengths: np.ndarray, weight: float,
                  lam: float, avgdl: float, c: float = 1.0,
                  norm: str = "h2", dist: str = "ll",
                  mu: float = NORM_MU_DEFAULT,
                  pivot: float = 0.0) -> np.ndarray:
    """Information-based per-term score
    (``search/similarities/IBSimilarity.java`` composing Distribution
    x Lambda x Normalization): ``weight * Inf(tfn | lambda)`` with

    - ``ll``  (DistributionLL):  Inf = log(1 + tfn/lambda)
    - ``spl`` (DistributionSPL): Inf =
      -log((lambda^(tfn/(tfn+1)) - lambda) / (1 - lambda))

    tfn from :func:`tfn_dfr` (H1/H2/H3/Z shared with DFR)."""
    tfn = tfn_dfr(freq, lengths, avgdl, c, norm, mu, pivot)
    if dist == "ll":
        return weight * np.log1p(tfn / lam)
    # SPL, cancellation-stable near lambda -> 1 (LambdaTTF exceeds 1
    # for frequent terms and clamps): with eps = 1 - lambda,
    # (lambda^x - lambda)/(1-lambda) = (expm1(x*log1p(-eps)) + eps)/eps
    eps = 1.0 - lam
    x = tfn / (tfn + 1.0)
    inner = (np.expm1(x * np.log1p(-eps)) + eps) / eps
    return weight * -np.log(np.maximum(inner, 1e-300))


AX_K_DEFAULT = 0.35
AX_S_DEFAULT = 0.5


def axiomatic_f2exp_weight(doc_freq: int, doc_count: int,
                           k: float = AX_K_DEFAULT) -> float:
    """Axiomatic F2-EXP document-independent factor (Fang & Zhai 2005,
    "An exploration of axiomatic approaches to IR";
    ``search/similarities/AxiomaticF2EXP.java``):
    ``((N+1)/n)^k``.  The per-doc part,
    ``tf/(tf + s + s*len/avgdl) = tf/(tf + 2s*((1-0.5) + 0.5*len/avgdl))``,
    is EXACTLY the BM25 tf curve with k1 = 2s and b = 0.5 — the
    searcher reuses the whole BM25-double pipeline (incl. block-max
    pruning, whose upper bound is the same functional form)."""
    return float(((float(doc_count) + 1.0) / max(float(doc_freq), 1.0)) ** k)


def axiomatic_f2log_weight(doc_freq: int, doc_count: int) -> float:
    """Axiomatic F2-LOG document-independent factor
    (``search/similarities/AxiomaticF2LOG.java:67-69``):
    ``ln((N+1)/n)``.  The per-doc tfln part is the same BM25 curve as
    F2EXP (k1 = 2s, b = 0.5), so the whole double pipeline including
    block-max pruning is reused."""
    return float(np.log((float(doc_count) + 1.0)
                        / max(float(doc_freq), 1.0)))


def score_term_ax1(freq: np.ndarray, lengths: np.ndarray, weight: float,
                   avgdl: float, s: float = AX_S_DEFAULT) -> np.ndarray:
    """Axiomatic F1-EXP / F1-LOG per-doc score (Fang & Zhai 2005;
    ``search/similarities/AxiomaticF1EXP.java:59-79`` /
    ``AxiomaticF1LOG.java:50-70``): ``weight * (1 + ln(1 + ln(freq)))
    * (avgdl + s) / (avgdl + docLen*s)`` — tf and the length norm are
    separate factors (unlike F2's combined tfln).  ``weight`` carries
    boost x idf (``((N+1)/n)^k`` for EXP, ``ln((N+1)/n)`` for LOG);
    freq >= 1 keeps both logs finite."""
    f = np.asarray(freq, dtype=np.float64)
    ln = np.asarray(lengths, dtype=np.float64)
    tf = 1.0 + np.log1p(np.log(np.maximum(f, 1.0)))
    return weight * tf * (avgdl + s) / (avgdl + ln * s)


def score_term_ax3(freq: np.ndarray, lengths: np.ndarray, weight: float,
                   idf: float, avgdl: float, s: float = AX_S_DEFAULT,
                   query_len: int = 1) -> np.ndarray:
    """Axiomatic F3-EXP / F3-LOG per-doc score
    (``search/similarities/AxiomaticF3EXP.java:59-86`` /
    ``AxiomaticF3LOG.java``, composed by ``Axiomatic.java:96-105``):
    ``max(0, boost * (tf(freq)*idf - gamma(docLen)))`` with
    ``tf = 1 + ln(1 + ln(freq))`` and the query-length penalty
    ``gamma = (docLen - queryLen) * s * queryLen / avgdl`` (the only
    Axiomatic component that can push a score negative — the
    reference clamps at 0 AFTER the boost, which preserves the clamp
    for positive boosts).  ``weight = boost*idf``; ``idf`` is passed
    separately so ``boost = weight/idf`` can scale gamma."""
    f = np.asarray(freq, dtype=np.float64)
    ln = np.asarray(lengths, dtype=np.float64)
    tf = 1.0 + np.log1p(np.log(np.maximum(f, 1.0)))
    gamma = (ln - float(query_len)) * s * float(query_len) / avgdl
    boost = weight / idf if idf else 0.0
    return np.maximum(weight * tf - boost * gamma, 0.0)


def indri_collection_prob(total_term_freq: int,
                          sum_total_term_freq: int) -> float:
    """Indri's collection LM ``F/T`` — UNSMOOTHED, unlike the default
    ``(F+1)/(T+1)`` model (``IndriDirichletSimilarity.java:103-106``
    IndriCollectionModel).  Matched terms always have F >= 1."""
    return float(total_term_freq) / max(float(sum_total_term_freq), 1.0)


def score_term_indri(freq: np.ndarray, lengths: np.ndarray, weight: float,
                     p_c: float, mu: float = MU_DEFAULT) -> np.ndarray:
    """Indri-flavoured Dirichlet LM (``IndriDirichletSimilarity.java:
    62-66``): ``boost * ln((freq + mu*P(t|C)) / (docLen + mu))`` — a
    smoothed log-probability, hence ALWAYS negative (no clamp; ranking
    still orders correctly because every doc pays the same query
    terms).  Block-max pruning stays off for this kind (upper bounds
    of negative scores need the min length, not the max freq)."""
    f = np.asarray(freq, dtype=np.float64)
    ln = np.asarray(lengths, dtype=np.float64)
    return weight * np.log((f + mu * p_c) / (ln + mu))


def score_term_raw_tf(freq: np.ndarray, weight: float) -> np.ndarray:
    """``RawTFSimilarity.java:40-42``: score = boost * freq (no idf,
    no length norm — the feature-engineering similarity)."""
    return weight * np.asarray(freq, dtype=np.float64)


def sum_scores(per_term_scores: list[np.ndarray]) -> np.ndarray:
    """Sum aligned per-term float32 score arrays in float64, cast to float32."""
    acc = np.zeros(len(per_term_scores[0]), dtype=np.float64)
    for s in per_term_scores:
        acc += s.astype(np.float64)
    return acc.astype(np.float32)
