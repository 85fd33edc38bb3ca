"""FeatureField / FeatureQuery scoring — static per-document ranking
features (pagerank, url_length, recency...) folded into the relevance
score (``core/.../document/FeatureField.java:217-229,240-470``,
``FeatureQuery.java:42``).

The reference stores a feature as a term whose TERM FREQUENCY is the
float value's top 17 bits (``floatToIntBits(v) >>> 15``), so feature
values are quantized to ~9 significand bits and scored through one of
four monotonic functions.  Here the Spark-first storage is a stored
numeric doc column (the doc-values strategy); the OBSERVABLE semantics
— the quantization and the four scoring functions in float32 — are
reproduced exactly, so scores match the reference bit-for-bit:

- linear:      w * S
- log:         w * ln(a + S)
- saturation:  w * S / (S + k)      (computed ``w * (1 - k/(S+k))``)
- sigmoid:     w * S^a / (S^a + k^a)

with S = decode(encode(value)) the quantized feature value.
"""

from __future__ import annotations

import numpy as np

MAX_FREQ = np.int64(0x7F7FFFFF >> 15)  # floatToIntBits(MAX_VALUE) >>> 15


def encode_feature_value(v) -> np.ndarray:
    """``FeatureField.FeatureTokenStream``: tf = floatToIntBits(v) >>> 15.
    Values must be positive, finite, non-NaN (FeatureField.java:150)."""
    arr = np.asarray(v, dtype=np.float32)
    if np.any(~np.isfinite(arr)) or np.any(arr <= 0):
        raise ValueError("feature values must be positive finite floats")
    bits = arr.view(np.uint32).astype(np.int64)
    return bits >> 15


def decode_feature_value(freq) -> np.ndarray:
    """``FeatureField.decodeFeatureValue``: intBitsToFloat(tf << 15),
    with the > MAX_FREQ guard returning Float.MAX_VALUE."""
    tf = np.asarray(freq, dtype=np.int64)
    out = (np.clip(tf, 0, None).astype(np.uint32) << np.uint32(15)) \
        .view(np.float32).copy()
    out[tf > MAX_FREQ] = np.finfo(np.float32).max
    return out


def quantize(v) -> np.ndarray:
    """decode(encode(v)) — the feature value as scoring sees it."""
    return decode_feature_value(encode_feature_value(v))


# ---------------------------------------------------------------------------
# the four scoring functions, float32 step-for-step (FeatureField.java)
# ---------------------------------------------------------------------------

def score_linear(s: np.ndarray, w: float) -> np.ndarray:
    return (np.float32(w) * s.astype(np.float32)).astype(np.float32)


def score_log(s: np.ndarray, w: float, a: float) -> np.ndarray:
    """(float)(w * Math.log(a + S)) — log in double, one final cast."""
    return (np.float64(w)
            * np.log(np.float64(a) + s.astype(np.float64))
            ).astype(np.float32)


def score_saturation(s: np.ndarray, w: float, pivot: float) -> np.ndarray:
    """w * (1 - pivot/(S + pivot)) — the monotonic-safe form
    (FeatureField.java:390-396)."""
    sf = s.astype(np.float32)
    p = np.float32(pivot)
    return (np.float32(w)
            * (np.float32(1.0) - p / (sf + p))).astype(np.float32)


def score_sigmoid(s: np.ndarray, w: float, pivot: float,
                  a: float) -> np.ndarray:
    """(float)(w * (1 - k^a/(S^a + k^a))) — powers in double
    (FeatureField.java:449-458)."""
    pivot_pa = np.power(np.float64(pivot), np.float64(a))
    sa = np.power(s.astype(np.float64), np.float64(a))
    return (np.float64(w) * (1.0 - pivot_pa / (sa + pivot_pa))) \
        .astype(np.float32)


def default_pivot(encoded_tfs: np.ndarray) -> float:
    """``FeatureField.computePivotFeatureValue``: pivot =
    decode(ttf / df) — the average ENCODED freq (double), truncated to
    int by decode's ``(int) freq`` cast."""
    tfs = np.asarray(encoded_tfs, dtype=np.int64)
    if tfs.size == 0:
        return 1.0
    avg_freq = float(tfs.sum()) / tfs.size
    return float(decode_feature_value(np.array([int(avg_freq)]))[0])
