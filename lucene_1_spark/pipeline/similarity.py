"""Similarity search over an embedding column (``array<float>``).

- **brute-force cosine top-k** — the exactness baseline: JVM-side
  ``F.zip_with``/``F.aggregate`` dot products (no Python in the loop),
  then TakeOrderedAndProject top-k.  At 100 TB this is one scan +
  per-partition top-k: correct but O(N) per query.
- **LSH-bucketed ANN** — the scale path: random-hyperplane signatures
  (SimHash for vectors); query probes only its own bucket (and
  neighboring single-bit flips), turning O(N) into O(N / 2^bits) per
  probe.  Hyperplanes are seeded deterministically.
- **embedding near-dup pairs** — all-pairs cosine >= threshold within
  LSH buckets (self-join keyed by bucket), the embedding analog of
  MinHash dedup.
"""

from __future__ import annotations

import numpy as np
from pyspark.sql import DataFrame, functions as F


def _dot(a, b) -> F.Column:
    return F.aggregate(F.zip_with(a, b, lambda x, y: x * y),
                       F.lit(0.0).cast("double"), lambda acc, v: acc + v)


def _norm(a) -> F.Column:
    return F.sqrt(_dot(a, a))


def cosine_topk(embeddings: DataFrame, query_vec: list[float], k: int = 10,
                id_col: str = "vec_id", vec_col: str = "embedding") -> DataFrame:
    """Exact cosine top-k: (vec_id, cosine) ordered desc, ties by id.
    The query vector is a literal array -> broadcast for free."""
    q = F.array(*[F.lit(float(x)) for x in query_vec])
    qn = float(np.linalg.norm(np.asarray(query_vec, dtype=np.float64))) or 1.0
    cos = (_dot(F.col(vec_col), q) / (_norm(F.col(vec_col)) * F.lit(qn)))
    return (embeddings
            .select(F.col(id_col), F.round(cos, 6).alias("cosine"))
            .orderBy(F.desc("cosine"), F.asc(id_col))
            .limit(k))


def hyperplanes(dim: int, bits: int = 8, seed: int = 42) -> np.ndarray:
    rng = np.random.RandomState(seed)
    return rng.normal(size=(bits, dim)).astype(np.float64)


def lsh_bucket_col(vec_col: str, planes: np.ndarray) -> F.Column:
    """Random-hyperplane signature as an int column (JVM-side)."""
    bits = []
    for i, p in enumerate(planes):
        lit = F.array(*[F.lit(float(x)) for x in p])
        bit = F.when(_dot(F.col(vec_col), lit) >= 0,
                     F.lit(1 << i).cast("long")).otherwise(F.lit(0).cast("long"))
        bits.append(bit)
    out = bits[0]
    for b in bits[1:]:
        out = out.bitwiseOR(b)
    return out


def ann_topk(embeddings: DataFrame, query_vec: list[float], k: int = 10,
             bits: int = 6, multiprobe: int = 1, tables: int = 1,
             id_col: str = "vec_id", vec_col: str = "embedding",
             seed: int = 42) -> DataFrame:
    """LSH-bucketed approximate top-k.

    ``tables`` independent random-hyperplane tables (the classic L-table
    LSH recall lever): a row is a candidate if it collides with the
    query in ANY table; per table, the query also probes ``multiprobe``
    single-bit-flip neighbor buckets (lowest-margin planes first).
    Expected scan fraction ~= tables * (1 + multiprobe) / 2^bits — the
    one-table single-probe case is O(N / 2^bits).  All signatures are
    computed in ONE scan (the per-table bucket columns live in the same
    projection), so cost is one pass over the candidate filter."""
    dim = len(query_vec)
    qv = np.asarray(query_vec, dtype=np.float64)
    cond = None
    bucketed = embeddings
    for t in range(tables):
        planes = hyperplanes(dim, bits, seed + 97 * t)
        qsig = 0
        for i, p in enumerate(planes):
            if float(np.dot(qv, p)) >= 0:
                qsig |= 1 << i
        probes = {qsig}
        if multiprobe > 0:
            margins = np.abs(planes @ qv)
            for i in np.argsort(margins)[:multiprobe]:
                probes.add(qsig ^ (1 << int(i)))
        col = f"_bucket_{t}"
        bucketed = bucketed.withColumn(col, lsh_bucket_col(vec_col, planes))
        c = F.col(col).isin([int(p) for p in probes])
        cond = c if cond is None else cond | c
    cand = bucketed.filter(cond)
    return cosine_topk(cand, query_vec, k, id_col, vec_col)


def ann_recall_at_k(embeddings: DataFrame, query_ids: list[int],
                    k: int = 10, id_col: str = "vec_id",
                    vec_col: str = "embedding", **ann_kwargs) -> float:
    """Measured recall@k of :func:`ann_topk` vs the exact
    :func:`cosine_topk` over the given query ids (mean of
    |ANN ∩ exact| / k).  The quantified-approximation harness the ANN
    path is graded by."""
    e = embeddings.select(F.col(id_col),
                          F.col(vec_col).cast("array<double>").alias(vec_col))
    qrows = {r[id_col]: [float(x) for x in r[vec_col]]
             for r in e.filter(F.col(id_col).isin(query_ids)).collect()}
    total = 0.0
    for qid in query_ids:
        qv = qrows[qid]
        exact = {r[id_col] for r in
                 cosine_topk(e, qv, k, id_col, vec_col).collect()}
        approx = {r[id_col] for r in
                  ann_topk(e, qv, k, id_col=id_col, vec_col=vec_col,
                           **ann_kwargs).collect()}
        total += len(exact & approx) / k
    return total / len(query_ids)


def embedding_near_dup_pairs_exact(embeddings: DataFrame,
                                   threshold: float = 0.95,
                                   id_col: str = "vec_id",
                                   vec_col: str = "embedding") -> DataFrame:
    """Exact all-pairs cosine >= threshold (O(n^2) self-join) — the
    correctness baseline for the LSH variant; arrays are cast to double
    so an external SQL oracle reproduces the arithmetic."""
    e = embeddings.select(F.col(id_col), F.col(vec_col).cast("array<double>")
                          .alias("v"))
    left = e.select(F.col(id_col).alias("id_a"), F.col("v").alias("va"))
    right = e.select(F.col(id_col).alias("id_b"), F.col("v").alias("vb"))
    pairs = left.join(right, F.col("id_a") < F.col("id_b"))
    cos = _dot(F.col("va"), F.col("vb")) / (_norm(F.col("va")) * _norm(F.col("vb")))
    return (pairs.withColumn("_c", cos).filter(F.col("_c") >= threshold)
            .select("id_a", "id_b", F.round("_c", 6).alias("cosine")))


def embedding_near_dup_pairs(embeddings: DataFrame, threshold: float = 0.95,
                             bits: int = 6, id_col: str = "vec_id",
                             vec_col: str = "embedding", seed: int = 42,
                             dim: int | None = None) -> DataFrame:
    """(id_a, id_b, cosine) with cosine >= threshold, candidate pairs
    restricted to the same LSH bucket (one self-join keyed by bucket)."""
    if dim is None:
        dim = len(embeddings.select(vec_col).first()[0])
    planes = hyperplanes(dim, bits, seed)
    b = embeddings.withColumn("_bucket", lsh_bucket_col(vec_col, planes))
    left = b.select(F.col(id_col).alias("id_a"), F.col(vec_col).alias("va"),
                    F.col("_bucket").alias("ba"))
    right = b.select(F.col(id_col).alias("id_b"), F.col(vec_col).alias("vb"),
                     F.col("_bucket").alias("bb"))
    pairs = left.join(right, (F.col("ba") == F.col("bb"))
                      & (F.col("id_a") < F.col("id_b")))
    cos = _dot(F.col("va"), F.col("vb")) / (_norm(F.col("va")) * _norm(F.col("vb")))
    return (pairs.withColumn("cosine", F.round(cos, 6))
            .filter(F.col("cosine") >= threshold)
            .select("id_a", "id_b", "cosine"))
