"""Multimodal column plumbing: image/audio/video as opaque ``binary``
columns with typed metadata, processed batch-wise via ``mapInPandas``.

The Spark-side machinery — schemas, Arrow batch shapes, partition-size
control for large blobs, UDF signatures — is real and tested.  The
actual media decode is STUBBED: the sandbox ships no image/audio
libraries, so ``decode_image`` raises ``NotImplementedError`` unless
``fake=True``, which substitutes a deterministic fake decoder (seeded
by the blob's bytes) so the pipeline shape can be exercised end-to-end.
"""

from __future__ import annotations

import hashlib
from typing import Iterator

import numpy as np
import pandas as pd
from pyspark.sql import DataFrame, functions as F, types as T

MEDIA_SCHEMA = T.StructType([
    T.StructField("media_id", T.LongType()),
    T.StructField("kind", T.StringType()),       # image | audio | video
    T.StructField("mime", T.StringType()),
    T.StructField("payload", T.BinaryType()),    # opaque blob
    T.StructField("meta", T.MapType(T.StringType(), T.StringType())),
])

IMAGE_FEATURES_SCHEMA = T.StructType([
    T.StructField("media_id", T.LongType()),
    T.StructField("width", T.IntegerType()),
    T.StructField("height", T.IntegerType()),
    T.StructField("channels", T.IntegerType()),
    T.StructField("mean_luma", T.FloatType()),
    T.StructField("phash64", T.LongType()),
])


def synthetic_media(spark, n: int = 64, seed: int = 42) -> DataFrame:
    """Deterministic fake media table for tests (no external data)."""
    rng = np.random.RandomState(seed)
    rows = []
    for i in range(n):
        blob = rng.bytes(256 + int(rng.randint(0, 512)))
        kind = ["image", "audio", "video"][i % 3]
        rows.append((i, kind, f"application/x-fake-{kind}", bytearray(blob),
                     {"src": f"synthetic/{i}"}))
    return spark.createDataFrame(rows, MEDIA_SCHEMA)


def _fake_decode_image(payload: bytes) -> np.ndarray:
    """Deterministic stand-in for a real image decoder: derives a small
    'pixel' array from a hash of the bytes."""
    h = hashlib.sha256(payload).digest()
    rng = np.random.RandomState(int.from_bytes(h[:4], "big"))
    w, hgt = 8 + h[4] % 24, 8 + h[5] % 24
    return rng.randint(0, 256, size=(hgt, w, 3), dtype=np.uint8)


def decode_image(payload: bytes, fake: bool = False) -> np.ndarray:
    if fake:
        return _fake_decode_image(payload)
    raise NotImplementedError(
        "real image decoding requires an image library not present in "
        "this environment; pass fake=True for the deterministic stub")


def image_features(media: DataFrame, fake: bool = True) -> DataFrame:
    """Batch feature extraction over image blobs via mapInPandas —
    Arrow-batched, one Python process per partition, no per-row UDF."""

    def extract(it: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        for pdf in it:
            img_rows = pdf[pdf["kind"] == "image"]
            out = []
            for row in img_rows.itertuples(index=False):
                arr = decode_image(bytes(row.payload), fake=fake)
                gray = arr.mean(axis=2)
                # 8x8 average-hash fingerprint
                ys = np.linspace(0, arr.shape[0], 9, dtype=int)
                xs = np.linspace(0, arr.shape[1], 9, dtype=int)
                cells = np.array([[gray[ys[i]:ys[i + 1], xs[j]:xs[j + 1]].mean()
                                   for j in range(8)] for i in range(8)])
                bits = (cells > cells.mean()).ravel()
                phash = int.from_bytes(np.packbits(bits).tobytes(),
                                       "big") & 0x7FFFFFFFFFFFFFFF
                out.append((row.media_id, arr.shape[1], arr.shape[0],
                            arr.shape[2], float(gray.mean()), phash))
            yield pd.DataFrame(out, columns=[f.name for f in
                                             IMAGE_FEATURES_SCHEMA.fields])

    return media.mapInPandas(extract, IMAGE_FEATURES_SCHEMA)


AUDIO_FEATURES_SCHEMA = T.StructType([
    T.StructField("media_id", T.LongType()),
    T.StructField("n_samples", T.IntegerType()),
    T.StructField("rms", T.FloatType()),
    T.StructField("zero_crossing_rate", T.FloatType()),
    T.StructField("peak", T.FloatType()),
])


def resize_image(arr: np.ndarray, out_w: int, out_h: int) -> np.ndarray:
    """Nearest-neighbour resize — REAL numpy plumbing (no media lib
    needed once pixels exist): index-map sampling, the downstream shape
    every thumbnail/tiling pipeline needs."""
    ys = (np.arange(out_h) * arr.shape[0] // out_h).clip(0, arr.shape[0] - 1)
    xs = (np.arange(out_w) * arr.shape[1] // out_w).clip(0, arr.shape[1] - 1)
    return arr[ys][:, xs]


def _fake_decode_audio(payload: bytes) -> np.ndarray:
    """Deterministic stand-in for an audio decoder: int16-ish waveform
    derived from the blob bytes."""
    h = hashlib.sha256(payload).digest()
    rng = np.random.RandomState(int.from_bytes(h[:4], "big"))
    n = 512 + int.from_bytes(h[4:6], "big") % 1024
    return (rng.standard_normal(n) * 8192).astype(np.float32)


def decode_audio(payload: bytes, fake: bool = False) -> np.ndarray:
    if fake:
        return _fake_decode_audio(payload)
    raise NotImplementedError(
        "real audio decoding requires an audio library not present in "
        "this environment; pass fake=True for the deterministic stub")


def audio_features(media: DataFrame, fake: bool = True) -> DataFrame:
    """Waveform feature extraction over audio blobs via mapInPandas:
    RMS energy, zero-crossing rate, peak — the same Arrow-batched
    shape as :func:`image_features` (decode stubbed, features real)."""

    def extract(it: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        for pdf in it:
            rows = pdf[pdf["kind"] == "audio"]
            out = []
            for row in rows.itertuples(index=False):
                w = decode_audio(bytes(row.payload), fake=fake)
                zc = float(np.mean(np.signbit(w[:-1]) != np.signbit(w[1:])))
                out.append((row.media_id, int(len(w)),
                            float(np.sqrt(np.mean(w ** 2))), zc,
                            float(np.abs(w).max())))
            yield pd.DataFrame(out, columns=[f.name for f in
                                             AUDIO_FEATURES_SCHEMA.fields])

    return media.mapInPandas(extract, AUDIO_FEATURES_SCHEMA)


def frame_sample_plan(media: DataFrame, every_n: int = 10) -> DataFrame:
    """Video frame-sampling *plan*: emits (media_id, frame_no) rows
    relationally from metadata (decode stubbed).  Shows the explode
    pattern used to parallelize per-frame work downstream."""
    n_frames = F.coalesce(F.element_at("meta", "n_frames").cast("int"), F.lit(100))
    return (media.filter(F.col("kind") == "video")
            .select("media_id",
                    F.explode(F.sequence(F.lit(0), n_frames - 1, F.lit(every_n)))
                    .alias("frame_no")))
