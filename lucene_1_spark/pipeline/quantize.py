"""int8 scalar-quantized vector storage — the
``Lucene99ScalarQuantizedVectorsFormat`` analog
(``lucene/core/src/java/org/apache/lucene/codecs/lucene99/
Lucene99ScalarQuantizedVectorsFormat.java`` /
``Lucene99HnswScalarQuantizedVectorsFormat.java``).

At 10^9 vectors a float64 ``array<double>`` column is 8x the
memory/IO of int8: quantized storage shrinks the HNSW graph table and
IVF assignment table accordingly, with survivors re-scored at full
precision (the reference's two-phase pattern).

Scheme (documented simplification of the reference's
confidence-interval quantile quantizer): vectors are unit-normalized
(cosine metric), then each DIMENSION is linearly mapped from its
observed [min, max] onto the 256 int8 levels::

    step_i = (max_i - min_i) / 255
    q_i    = clamp(round((v_i - min_i) / step_i) - 128, -128, 127)
    v̂_i    = min_i + (q_i + 128) * step_i

Per-dim ranges matter: unit vectors in dimension d concentrate near
±1/sqrt(d), so a fixed [-1, 1] scale would waste ~7 of 8 bits.
The (min, max) parameter arrays are the quantization STATE — held by
the caller and passed to encode/decode, exactly as IVF centroids are
(Lucene stores them in the segment metadata).

Two implementations of the same arithmetic:

- JVM column expressions (:func:`quantize_col` / :func:`dequantize_col`)
  for table-level storage — no Python in the plan;
- numpy mirrors (:func:`quantize_np` / :func:`dequantize_np`) for the
  Arrow-batched HNSW kernels.
"""

from __future__ import annotations

import numpy as np
from pyspark.sql import DataFrame, functions as F


def _unit_rows(m: np.ndarray) -> np.ndarray:
    n = np.linalg.norm(m, axis=1, keepdims=True)
    n[n == 0] = 1.0
    return m / n


def scalar_quantize_fit(embeddings: DataFrame,
                        vec_col: str = "embedding") \
        -> tuple[np.ndarray, np.ndarray]:
    """Per-dimension (min, max) of the UNIT-NORMALIZED vectors — one
    scan (posexplode + groupBy(dim) agg); returns two float64 arrays
    of length dim.  This is the quantizer's training step."""
    v = F.col(vec_col).cast("array<double>")
    nrm = F.sqrt(F.aggregate(
        F.zip_with(v, v, lambda a, b: a * b),
        F.lit(0.0).cast("double"), lambda acc, x: acc + x))
    rows = (embeddings
            .select(F.posexplode(v).alias("_i", "_x"),
                    nrm.alias("_n"))
            .select("_i", (F.col("_x")
                           / F.when(F.col("_n") == 0, 1.0)
                           .otherwise(F.col("_n"))).alias("_u"))
            .groupBy("_i").agg(F.min("_u").alias("mn"),
                               F.max("_u").alias("mx"))
            .collect())
    dim = max(r["_i"] for r in rows) + 1
    mn = np.zeros(dim, dtype=np.float64)
    mx = np.zeros(dim, dtype=np.float64)
    for r in rows:
        mn[r["_i"]], mx[r["_i"]] = float(r["mn"]), float(r["mx"])
    return mn, mx


def _steps(mn: np.ndarray, mx: np.ndarray) -> np.ndarray:
    s = (np.asarray(mx, dtype=np.float64)
         - np.asarray(mn, dtype=np.float64)) / 255.0
    s[s <= 0] = 1e-12   # constant dimension: any level decodes to min
    return s


def quantize_np(vecs: np.ndarray, mn: np.ndarray,
                mx: np.ndarray) -> np.ndarray:
    """UNIT-NORMALIZE rows, then int8-encode (numpy mirror of
    :func:`quantize_col`)."""
    u = _unit_rows(np.asarray(vecs, dtype=np.float64))
    st = _steps(mn, mx)
    q = np.rint((u - np.asarray(mn, dtype=np.float64)) / st) - 128
    return np.clip(q, -128, 127).astype(np.int8)


def dequantize_np(q: np.ndarray, mn: np.ndarray,
                  mx: np.ndarray) -> np.ndarray:
    st = _steps(mn, mx)
    return np.asarray(mn, dtype=np.float64) \
        + (np.asarray(q, dtype=np.float64) + 128.0) * st


def quantize_col(vec_col: str, mn: np.ndarray, mx: np.ndarray) -> F.Column:
    """JVM-side int8 encode of a (unit-normalized-on-the-fly) vector
    column -> ``array<tinyint>`` — pure column expressions, nothing in
    Python at scan time."""
    st = _steps(mn, mx)
    mn_arr = F.array(*[F.lit(float(x)) for x in mn])
    st_arr = F.array(*[F.lit(float(x)) for x in st])
    v = F.col(vec_col).cast("array<double>")
    nrm = F.sqrt(F.aggregate(
        F.zip_with(v, v, lambda a, b: a * b),
        F.lit(0.0).cast("double"), lambda acc, x: acc + x))
    safe = F.when(nrm == 0, 1.0).otherwise(nrm)
    return F.transform(
        v, lambda x, i: F.least(
            F.greatest(
                F.round((x / safe - F.element_at(mn_arr, i + 1))
                        / F.element_at(st_arr, i + 1))
                - F.lit(128), F.lit(-128.0)),
            F.lit(127.0)).cast("tinyint"))


def dequantize_col(q_col: str, mn: np.ndarray, mx: np.ndarray) -> F.Column:
    """JVM-side decode back to ``array<double>`` (approximate unit
    vectors — re-score survivors at full precision for exactness)."""
    st = _steps(mn, mx)
    mn_arr = F.array(*[F.lit(float(x)) for x in mn])
    st_arr = F.array(*[F.lit(float(x)) for x in st])
    return F.transform(
        F.col(q_col),
        lambda b, i: F.element_at(mn_arr, i + 1)
        + (b.cast("double") + F.lit(128.0))
        * F.element_at(st_arr, i + 1))
