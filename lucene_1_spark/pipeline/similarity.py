"""Similarity search over an embedding column (``array<float>``).

- **brute-force cosine top-k** — the exactness baseline: JVM-side
  ``F.zip_with``/``F.aggregate`` dot products (no Python in the loop),
  then TakeOrderedAndProject top-k.  At 100 TB this is one scan +
  per-partition top-k: correct but O(N) per query.
- **LSH-bucketed ANN** — the scale path: random-hyperplane signatures
  (SimHash for vectors); query probes only its own bucket (and
  neighboring single-bit flips), turning O(N) into O(N / 2^bits) per
  probe.  Hyperplanes are seeded deterministically.
- **IVF ANN** — the second scale path (FAISS-style inverted-file):
  a deterministic k-means coarse quantizer assigns every vector to its
  nearest centroid (vectorized numpy matmul in an Arrow-batched kernel,
  one scan per Lloyd iteration); a query probes only the ``nprobe``
  nearest centroid lists.  ``nprobe = n_centroids`` degenerates to the
  exact scan, so the approximation is testable against the exact oracle
  at full probe and measurable (recall@k) at partial probe.  At scale
  the assignment table is written ``partitionBy(cluster)`` so a probe
  is a partition-pruned read.
- **embedding near-dup pairs** — all-pairs cosine >= threshold within
  LSH buckets (self-join keyed by bucket), the embedding analog of
  MinHash dedup.
"""

from __future__ import annotations

import math

import numpy as np
import pandas as pd
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
    # single array Literal (one py4j call) instead of a
    # CreateArray of per-element lits — the element-wise form cost
    # one py4j round trip per element at plan-construction time
    q = F.lit([float(x) for x in query_vec])
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
    """Random-hyperplane signature as an int column (JVM-side).

    One ``transform``/``aggregate`` pair over a single nested-array
    plane literal instead of per-plane dot expressions: the per-plane
    fold arithmetic is identical (verified bit-equal), but plan
    CONSTRUCTION costs a handful of py4j lambda registrations rather
    than ~4 per plane (which dominated per-query ANN latency)."""
    pm = F.lit([[float(x) for x in p] for p in planes])
    bits_arr = F.transform(
        pm, lambda p, i: F.when(
            _dot(F.col(vec_col), p) >= 0,
            F.pow(F.lit(2.0), i).cast("long")).otherwise(
            F.lit(0).cast("long")))
    return F.aggregate(bits_arr, F.lit(0).cast("long"),
                       lambda acc, v: acc.bitwiseOR(v))


# Column-AST memo: hyperplane signature Columns are immutable
# expression trees reusable across queries of one session; rebuilding
# them cost ~0.2 s of py4j round trips per (table set) per query.
# Keyed by applicationId so a restarted session never sees stale JVM
# expression handles.
_BUCKET_COL_MEMO: dict = {}


def _bucket_cols(session, vec_col: str, dim: int, bits: int,
                 tables: int, seed: int) -> list:
    key = (session.sparkContext.applicationId, vec_col, int(dim),
           int(bits), int(tables), int(seed))
    hit = _BUCKET_COL_MEMO.get(key)
    if hit is None:
        if len(_BUCKET_COL_MEMO) > 64:
            _BUCKET_COL_MEMO.clear()
        hit = [lsh_bucket_col(vec_col, hyperplanes(dim, bits,
                                                   seed + 97 * t))
               for t in range(int(tables))]
        _BUCKET_COL_MEMO[key] = hit
    return hit


def _perturbation_probes(qsig: int, margins: np.ndarray,
                         budget: int) -> list[int]:
    """The ``budget`` most-likely alternative buckets for a query whose
    per-plane margins are ``margins``: perturbation SETS (which bits to
    flip) in increasing sum-of-squared-margins order — the multi-probe
    LSH probing sequence (Lv et al., VLDB 2007).  Flipping a low-margin
    bit is cheap (the true neighbor plausibly lands on the other side);
    sets may flip several bits, so deep probing reaches Hamming-2+
    buckets that single-bit flipping never visits."""
    import heapq

    order = np.argsort(margins)          # ascending margin
    costs = (margins[order] ** 2).tolist()
    b = len(costs)
    out: list[int] = []
    # heap of (cost, set) where set is a tuple of indices into `order`;
    # start from {0} and generate by the standard shift/expand moves
    heap: list[tuple[float, tuple[int, ...]]] = [(costs[0], (0,))]
    seen = {(0,)}
    while heap and len(out) < budget:
        cost, s = heapq.heappop(heap)
        sig = qsig
        for i in s:
            sig ^= 1 << int(order[i])
        out.append(sig)
        last = s[-1]
        if last + 1 < b:
            shift = s[:-1] + (last + 1,)     # replace deepest element
            if shift not in seen:
                seen.add(shift)
                heapq.heappush(heap, (cost - costs[last] + costs[last + 1],
                                      shift))
            expand = s + (last + 1,)         # grow the set
            if expand not in seen:
                seen.add(expand)
                heapq.heappush(heap, (cost + costs[last + 1], expand))
    return out


def _query_probes(query_vec: list[float], bits: int, tables: int,
                  multiprobe: int, seed: int) -> list[list[int]]:
    """Per-table probe buckets for a query: its own signature plus the
    ``multiprobe`` best perturbation-set flips (shared by the full-scan
    and the persisted-index LSH paths, so both probe IDENTICAL
    buckets)."""
    qv = np.asarray(query_vec, dtype=np.float64)
    dim = len(query_vec)
    out: list[list[int]] = []
    for t in range(tables):
        planes = hyperplanes(dim, bits, seed + 97 * t)
        qsig = 0
        for i, p in enumerate(planes):
            if float(np.dot(qv, p)) >= 0:
                qsig |= 1 << i
        probes = {qsig}
        if multiprobe > 0:
            margins = np.abs(planes @ qv)
            probes.update(_perturbation_probes(qsig, margins, multiprobe))
        out.append(sorted(int(p) for p in probes))
    return out


def ann_topk(embeddings: DataFrame, query_vec: list[float], k: int = 10,
             bits: int | None = None, multiprobe: int = 8,
             tables: int | None = None,
             id_col: str = "vec_id", vec_col: str = "embedding",
             seed: int = 42, n: int | None = None,
             target_bucket: int = 64) -> DataFrame:
    """LSH-bucketed approximate top-k.

    ``tables`` independent random-hyperplane tables (the classic L-table
    LSH recall lever): a row is a candidate if it collides with the
    query in ANY table; per table, the query also probes ``multiprobe``
    extra buckets drawn from the multi-probe perturbation sequence
    (:func:`_perturbation_probes` — lowest summed-squared-margin bit
    sets first, so deep budgets reach multi-bit-flip buckets).
    Expected scan fraction ~= tables * (1 + multiprobe) / 2^bits — the
    one-table single-probe case is O(N / 2^bits).  All signatures are
    computed in ONE scan (the per-table bucket columns live in the same
    projection), so cost is one pass over the candidate filter.

    RECALL POLICY (defaults): ``bits=None`` auto-scales from the table
    size so the EXPECTED bucket population is ``target_bucket``
    (bits = log2(n / target_bucket), clamped to [2, 24]; ``n`` is
    counted once if not supplied — pass it at scale).  ``tables=None``
    defaults to 8 with ``multiprobe=8``: per-bit collision probability
    for true neighbors is 1 - angle/pi, so independent tables and the
    probe budget are the recall levers (cost linear in both, expected
    scan fraction tables*(1+multiprobe)*target_bucket/n).  The default
    policy measures recall@10 >= 0.9 on the adversarial random-vector
    fixture (near-orthogonal "neighbors", the LSH worst case) and 1.0
    on clustered embeddings (BENCH quality section).  For a
    steady-state SERVING path at 100 TB prefer
    :func:`ivf_ann_topk` with a pre-assigned ``partitionBy('cluster')``
    table — each probe is then a partition-pruned read instead of a
    full-scan signature filter."""
    if bits is None:
        if n is None:
            n = embeddings.count()
        bits = int(np.clip(int(np.ceil(np.log2(max(n, 2)
                                               / max(target_bucket, 1)))),
                           2, 24))
    if tables is None:
        tables = 8
    dim = len(query_vec)
    per_table = _query_probes(query_vec, bits, tables, multiprobe, seed)
    bcols = _bucket_cols(embeddings.sparkSession, vec_col, dim, bits,
                         tables, seed)
    cond = None
    bucketed = embeddings.select(
        "*", *[bcols[t].alias(f"_bucket_{t}") for t in range(tables)])
    for t in range(tables):
        c = F.col(f"_bucket_{t}").isin(per_table[t])
        cond = c if cond is None else cond | c
    cand = bucketed.filter(cond)
    return cosine_topk(cand, query_vec, k, id_col, vec_col)


def lsh_assign(embeddings: DataFrame, dim: int | None = None,
               bits: int = 8, tables: int = 8, seed: int = 42,
               id_col: str = "vec_id", vec_col: str = "embedding",
               include_vec: bool = True) -> DataFrame:
    """Persisted LSH bucket index — the :func:`ivf_assign` analog for
    the LSH serving path: LONG-form rows (table, bucket, vec_id[, vec]),
    all ``tables`` signatures computed in ONE scan over the base table
    and exploded.  Write the result ``partitionBy('table', 'bucket')``:
    every probe of every table is then a PARTITION-PRUNED read (the
    classic L-table LSH layout), so steady-state serving never
    full-scans signatures the way per-query :func:`ann_topk` does.

    ``include_vec=True`` stores the vector beside each index row
    (storage x ``tables`` — the classic L-table space/time trade; int8
    quantization claws most of it back) so serving needs no join back
    to the base table; ``False`` keeps an id-only index and serving
    semi-joins the probed candidate ids into ``embeddings``.

    ``bits``/``tables``/``seed`` must match between assign time and
    :func:`lsh_index_topk` probe time — same contract as IVF centroids.
    """
    if dim is None:
        dim = len(embeddings.select(vec_col).first()[0])
    bcols = _bucket_cols(embeddings.sparkSession, vec_col, dim, bits,
                         tables, seed)
    entries = []
    for t in range(tables):
        entries.append(F.struct(
            F.lit(t).cast("int").alias("table"),
            bcols[t].alias("bucket")))
    keep = [F.col(id_col)] + ([F.col(vec_col)] if include_vec else [])
    return (embeddings
            .select(*keep, F.explode(F.array(*entries)).alias("_tb"))
            .select(F.col("_tb.table").alias("table"),
                    F.col("_tb.bucket").alias("bucket"), *[
                        F.col(id_col)] + (
                        [F.col(vec_col)] if include_vec else [])))


def lsh_index_topk(index: DataFrame, query_vec: list[float], k: int = 10,
                   bits: int = 8, tables: int = 8, multiprobe: int = 8,
                   seed: int = 42, id_col: str = "vec_id",
                   vec_col: str = "embedding",
                   embeddings: DataFrame | None = None) -> DataFrame:
    """Approximate top-k over a PERSISTED :func:`lsh_assign` index.

    The probe predicate references ONLY the (table, bucket) partition
    columns — a disjunction of per-table bucket-membership conjuncts —
    so a parquet index written ``partitionBy('table','bucket')`` reads
    just the probed directories (plan shows ``PartitionFilters``), the
    exact analog of :func:`ivf_ann_topk` over a pre-assigned table.
    Probes are computed by the same :func:`_query_probes` as
    :func:`ann_topk`, so the candidate set — and therefore recall — is
    IDENTICAL to the full-scan path at equal (bits, tables, multiprobe,
    seed)."""
    per_table = _query_probes(query_vec, bits, tables, multiprobe, seed)
    cond = None
    for t, probes in enumerate(per_table):
        c = (F.col("table") == t) & F.col("bucket").isin(probes)
        cond = c if cond is None else cond | c
    cand = index.filter(cond)
    if vec_col in index.columns:
        cand = cand.dropDuplicates([id_col]).select(id_col, vec_col)
        return cosine_topk(cand, query_vec, k, id_col, vec_col)
    if embeddings is None:
        raise ValueError("id-only LSH index needs the base `embeddings` "
                         "table to fetch vectors for rescoring")
    ids = cand.select(id_col).distinct()
    # candidate set is ~ tables*(1+multiprobe)*bucket_size — broadcast
    fetched = embeddings.join(F.broadcast(ids), id_col, "left_semi")
    return cosine_topk(fetched, query_vec, k, id_col, vec_col)


def ann_recall_at_k(embeddings: DataFrame, query_ids: list[int],
                    k: int = 10, id_col: str = "vec_id",
                    vec_col: str = "embedding", method: str = "lsh",
                    centroids: np.ndarray | None = None,
                    **ann_kwargs) -> float:
    """Measured recall@k of the approximate path (``method``: "lsh" =
    :func:`ann_topk`, "ivf" = :func:`ivf_ann_topk`) vs the exact
    :func:`cosine_topk` over the given query ids (mean of
    |ANN ∩ exact| / k).  The quantified-approximation harness the ANN
    paths are graded by."""
    from concurrent.futures import ThreadPoolExecutor

    e = embeddings.select(F.col(id_col),
                          F.col(vec_col).cast("array<double>").alias(vec_col))
    qrows = {r[id_col]: [float(x) for x in r[vec_col]]
             for r in e.filter(F.col(id_col).isin(query_ids)).collect()}
    if method == "lsh" and "bits" not in ann_kwargs \
            and "n" not in ann_kwargs:
        # size the LSH auto-policy once — ann_topk would otherwise run
        # one count job PER replayed query for the same number
        ann_kwargs = {**ann_kwargs, "n": e.count()}

    def one(qid: int) -> float:
        qv = qrows[qid]
        exact = {r[id_col] for r in
                 cosine_topk(e, qv, k, id_col, vec_col).collect()}
        if method == "ivf":
            adf = ivf_ann_topk(e, qv, centroids, k, id_col=id_col,
                               vec_col=vec_col, **ann_kwargs)
        else:
            adf = ann_topk(e, qv, k, id_col=id_col, vec_col=vec_col,
                           **ann_kwargs)
        approx = {r[id_col] for r in adf.collect()}
        return len(exact & approx) / k

    # the replayed queries are independent jobs: overlap a few so the
    # tail of one back-fills the executors freed by another (plain
    # driver threads; Spark schedules concurrent jobs FIFO)
    with ThreadPoolExecutor(max_workers=min(4, len(query_ids))) as pool:
        total = sum(pool.map(one, query_ids))
    return total / len(query_ids)


def _unit_rows(m: np.ndarray) -> np.ndarray:
    n = np.linalg.norm(m, axis=1, keepdims=True)
    n[n == 0] = 1.0
    return m / n


def ivf_fit(embeddings: DataFrame, n_centroids: int = 16, iters: int = 3,
            id_col: str = "vec_id", vec_col: str = "embedding",
            seed: int = 42) -> np.ndarray:
    """Deterministic k-means coarse quantizer (the IVF training step).

    Init: the ``n_centroids`` rows with the lowest ``xxhash64(id)`` —
    a seed-stable pseudo-random sample with no RNG in the job.  Each
    Lloyd iteration is ONE scan: an Arrow-batched kernel assigns every
    vector to its nearest centroid by cosine (numpy matmul), then
    per-(cluster, dim) means are aggregated relationally.  Returns the
    (n_centroids, dim) float64 centroid matrix (row-normalized)."""
    from pyspark.sql.functions import pandas_udf

    e = embeddings.select(F.col(id_col).alias("_id"),
                          F.col(vec_col).cast("array<double>").alias("_v"))
    init = (e.withColumn("_h", F.xxhash64(F.col("_id") + F.lit(int(seed))))
            .orderBy("_h", "_id").limit(int(n_centroids)).collect())
    cents = _unit_rows(np.asarray([r["_v"] for r in init], dtype=np.float64))

    for _ in range(int(iters)):
        c_broadcast = cents  # closure capture (small: C x dim)

        @pandas_udf("int")
        def nearest(vs: pd.Series) -> pd.Series:
            if len(vs) == 0:
                return pd.Series(np.zeros(0, dtype=np.int32))
            m = _unit_rows(np.stack(vs.to_numpy()).astype(np.float64))
            return pd.Series(np.argmax(m @ c_broadcast.T, axis=1)
                             .astype(np.int32))

        sums = (e.withColumn("_c", nearest("_v"))
                .select("_c", F.posexplode("_v").alias("_pos", "_x"))
                .groupBy("_c", "_pos").agg(F.avg("_x").alias("_m"))
                .collect())
        new = cents.copy()  # empty clusters keep their old centroid
        for r in sums:
            new[r["_c"], r["_pos"]] = r["_m"]
        cents = _unit_rows(new)
    return cents


def ivf_assign(embeddings: DataFrame, centroids: np.ndarray,
               vec_col: str = "embedding",
               quant: tuple | None = None) -> DataFrame:
    """Add the coarse-quantizer ``cluster`` column (write the result
    ``partitionBy('cluster')`` at scale for partition-pruned probes).

    ``quant=(min, max)`` (from
    :func:`lucene_1_spark.pipeline.quantize.scalar_quantize_fit`)
    additionally REPLACES the float vector column with an int8
    ``vec_q`` column (Lucene99ScalarQuantizedVectorsFormat analog):
    the persisted posting lists are ~8x smaller, and
    :func:`ivf_ann_topk` re-scores survivors at full precision from
    the base table."""
    from pyspark.sql.functions import pandas_udf

    cents = np.asarray(centroids, dtype=np.float64)

    @pandas_udf("int")
    def nearest(vs: pd.Series) -> pd.Series:
        if len(vs) == 0:
            return pd.Series(np.zeros(0, dtype=np.int32))
        m = _unit_rows(np.stack(vs.to_numpy()).astype(np.float64))
        return pd.Series(np.argmax(m @ cents.T, axis=1).astype(np.int32))

    out = embeddings.withColumn(
        "cluster", nearest(F.col(vec_col).cast("array<double>")))
    if quant is not None:
        from lucene_1_spark.pipeline.quantize import quantize_col
        out = (out.withColumn("vec_q",
                              quantize_col(vec_col, quant[0], quant[1]))
               .drop(vec_col))
    return out


def ivf_ann_topk(embeddings: DataFrame, query_vec: list[float],
                 centroids: np.ndarray, k: int = 10, nprobe: int = 2,
                 id_col: str = "vec_id", vec_col: str = "embedding",
                 assigned: DataFrame | None = None,
                 quant: tuple | None = None,
                 rescore: DataFrame | None = None,
                 rescore_factor: int = 3) -> DataFrame:
    """IVF approximate top-k: probe the ``nprobe`` centroid lists
    nearest the query, exact cosine within the probed fraction
    (~nprobe/C of the data).  ``nprobe = len(centroids)`` scans every
    list and equals the exact :func:`cosine_topk`.

    ``assigned`` is a PRE-ASSIGNED table carrying a ``cluster`` column
    (from :func:`ivf_assign`, written ``partitionBy('cluster')`` at
    scale): with it the probe is a plain filter — parquet partition
    pruning makes it read only the ``nprobe`` probed lists.  Without
    it the assignment kernel runs over the full table per query
    (correct, but every probe still scans all vectors — fine for
    one-off queries, wrong as the steady-state serving path)."""
    cents = np.asarray(centroids, dtype=np.float64)
    qv = np.asarray(query_vec, dtype=np.float64)
    qn = np.linalg.norm(qv) or 1.0
    sims = cents @ (qv / qn)
    probes = [int(i) for i in np.argsort(-sims)[:int(nprobe)]]
    base = assigned if assigned is not None \
        else ivf_assign(embeddings, cents, vec_col)
    cand = base.filter(F.col("cluster").isin(probes))
    if quant is not None and "vec_q" in cand.columns:
        # int8 posting lists: rank probed candidates on JVM-dequantized
        # approximations, then (optionally) exact-rescore the top pool
        # against the full-precision base table — two-phase quantized
        # search (Lucene99HnswScalarQuantizedVectorsFormat pattern)
        from lucene_1_spark.pipeline.quantize import dequantize_col
        dec = cand.withColumn("_vd", dequantize_col(
            "vec_q", quant[0], quant[1]))
        if rescore is None:
            return cosine_topk(dec, query_vec, k, id_col, "_vd")
        pool = int(k) * max(int(rescore_factor), 1)
        approx = cosine_topk(dec, query_vec, pool, id_col, "_vd")
        survivors = rescore.join(
            F.broadcast(approx.select(id_col)), id_col)
        return cosine_topk(survivors, query_vec, k, id_col, vec_col)
    return cosine_topk(cand, query_vec, k, id_col, vec_col)


def ivf_quality(embeddings: DataFrame, centroids: np.ndarray,
                vec_col: str = "embedding",
                assigned: DataFrame | None = None) -> float:
    """Quantizer fitness: mean cosine of each vector to its assigned
    centroid (one Arrow kernel pass + one avg).  Clustered embeddings
    score high (~0.9); on unclustered/adversarial vectors k-means
    captures nothing and the score collapses toward ``1/sqrt(dim)`` —
    the regime where IVF probe recall silently degrades (measured
    0.52 random vs 1.0 clustered at sf0.1).  Compute once at fit time
    and store beside the centroids; it prices whether IVF probes can
    be trusted at serving time (:func:`ann_serving_topk`)."""
    from pyspark.sql.functions import pandas_udf

    cents = _unit_rows(np.asarray(centroids, dtype=np.float64))

    @pandas_udf("double")
    def best_sim(vs: pd.Series) -> pd.Series:
        if len(vs) == 0:
            return pd.Series(np.zeros(0, dtype=np.float64))
        m = _unit_rows(np.stack(vs.to_numpy()).astype(np.float64))
        return pd.Series(np.max(m @ cents.T, axis=1))

    row = (embeddings
           .select(best_sim(F.col(vec_col).cast("array<double>"))
                   .alias("_s"))
           .agg(F.avg("_s").alias("q")).collect()[0])
    return float(row["q"] or 0.0)


def ann_serving_topk(embeddings: DataFrame, query_vec: list[float],
                     k: int = 10, centroids: np.ndarray | None = None,
                     assigned: DataFrame | None = None,
                     quality: float | None = None,
                     min_quality: float | None = None,
                     nprobe: int = 2,
                     lsh_index: DataFrame | None = None,
                     id_col: str = "vec_id", vec_col: str = "embedding",
                     **lsh_kwargs) -> DataFrame:
    """SERVING POLICY router over the two ANN paths: IVF probes are
    only trustworthy when the coarse quantizer actually captured
    structure, so the route is picked from :func:`ivf_quality` —
    below ``min_quality`` (or with no centroids at all) the query
    runs the LSH multi-probe path (measured recall@10 1.0 on BOTH the
    random-adversarial and clustered fixtures), otherwise the
    partition-pruned IVF probe.  Pass ``quality`` precomputed at fit
    time to keep serving latency probe-only; without it the score is
    measured once here (a full-scan aggregate — fit-time work leaking
    into the first call, not the steady state).  Pass ``lsh_index`` (a
    persisted :func:`lsh_assign` table, written
    ``partitionBy('table','bucket')``) so the LSH route probes
    partitions instead of full-scanning signatures — the steady-state
    serving shape for the no-structure regime."""
    route = choose_ann_route(embeddings, centroids, quality=quality,
                             min_quality=min_quality, vec_col=vec_col)
    if route == "ivf":
        return ivf_ann_topk(embeddings, query_vec, centroids, k,
                            nprobe=nprobe, id_col=id_col,
                            vec_col=vec_col, assigned=assigned)
    if lsh_index is not None:
        # steady-state serving: partition-pruned probe of the
        # persisted lsh_assign index, never a full signature scan
        return lsh_index_topk(lsh_index, query_vec, k,
                              id_col=id_col, vec_col=vec_col,
                              embeddings=embeddings,
                              **{kk_: v for kk_, v in lsh_kwargs.items()
                                 if kk_ in ("bits", "tables", "multiprobe",
                                            "seed")})
    return ann_topk(embeddings, query_vec, k, id_col=id_col,
                    vec_col=vec_col, **lsh_kwargs)


def choose_ann_route(embeddings: DataFrame,
                     centroids: np.ndarray | None,
                     quality: float | None = None,
                     min_quality: float | None = None,
                     vec_col: str = "embedding") -> str:
    """'ivf' when a quantizer exists and its :func:`ivf_quality`
    clears ``min_quality``, else 'lsh'.

    The default threshold ADAPTS to (C, dim): for RANDOM unit vectors
    the expected best-of-C centroid cosine concentrates around
    ``sqrt(2 ln C / dim)`` (the Gaussian extreme-value bound for C
    near-orthogonal projections), so a quantizer that captured no
    structure measures ≈ that baseline regardless of dimension — a
    fixed absolute cutoff misreads high-dim clustered data as random
    and low-dim random data as clustered.  Default = 1.25 × baseline:
    quality must beat the no-structure expectation by 25% before IVF
    probes are trusted."""
    if centroids is None:
        return "lsh"
    cents = np.asarray(centroids, dtype=np.float64)
    if quality is None:
        quality = ivf_quality(embeddings, centroids, vec_col=vec_col)
    if min_quality is None:
        c, dim = max(cents.shape[0], 2), max(cents.shape[1], 1)
        min_quality = 1.25 * math.sqrt(2.0 * math.log(c) / dim)
    return "ivf" if quality >= float(min_quality) else "lsh"


def knn_filtered_topk(embeddings: DataFrame, query_vec: list[float],
                      k: int = 10, allowed: DataFrame | None = None,
                      id_col: str = "vec_id", vec_col: str = "embedding",
                      centroids: np.ndarray | None = None,
                      nprobe: int = 2,
                      assigned: DataFrame | None = None) -> DataFrame:
    """PRE-filtered kNN — the ``search/KnnFloatVectorQuery.java:46``
    contract: the filter restricts the candidate set BEFORE top-k
    selection, so the result is the true top-k AMONG allowed ids (a
    post-filter would return fewer than k).

    ``allowed``: one-column DataFrame of permitted ids (e.g. the doc
    ids matching an engine query) — semi-joined in, so the scan prunes
    before any cosine arithmetic.  ``centroids=None`` is the exact
    path; with centroids the IVF partial probe runs within the allowed
    set (recall characteristics unchanged by filtering since the
    filter is exact)."""
    e = embeddings
    if allowed is not None:
        ids = allowed.select(F.col(allowed.columns[0]).alias(id_col))
        e = e.join(ids, id_col, "left_semi")
        if assigned is not None:
            assigned = assigned.join(ids, id_col, "left_semi")
    if centroids is not None:
        return ivf_ann_topk(e, query_vec, centroids, k, nprobe,
                            id_col, vec_col, assigned=assigned)
    return cosine_topk(e, query_vec, k, id_col, vec_col)


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


def semdedup(embeddings: DataFrame, threshold: float = 0.95,
             id_col: str = "vec_id", vec_col: str = "embedding",
             exact: bool = False, **lsh_kwargs) -> DataFrame:
    """Semantic deduplication — SemDeDup (Abbas et al. 2023,
    arXiv:2303.09540) with the distributed keep-first rule: drop every
    vector that has a near-duplicate (cosine >= ``threshold``) with a
    SMALLER id; survivors are returned (all columns).

    The paper clusters embeddings and keeps one exemplar per
    near-duplicate group inside each cluster; the iterative greedy
    chain ("b survives because its lower neighbor a was itself
    dropped") is inherently sequential, so this implements the
    one-pass variant — any lower-id near-duplicate disqualifies — which
    is deterministic, order-free, and a single anti-join.  Candidate
    generation reuses :func:`embedding_near_dup_pairs` (LSH-bucketed
    self-join, hot-bucket caps default on) or the exact all-pairs
    baseline with ``exact=True``.  At 100 TB: pairs shuffle once on the
    LSH bucket, the anti-join shuffles once on id — no quadratic path.
    """
    if exact:
        pairs = embedding_near_dup_pairs_exact(
            embeddings, threshold, id_col=id_col, vec_col=vec_col)
    else:
        pairs = embedding_near_dup_pairs(
            embeddings, threshold, id_col=id_col, vec_col=vec_col,
            **lsh_kwargs)
    drops = pairs.select(F.col("id_b").alias(id_col)).distinct()
    return embeddings.join(drops, id_col, "left_anti")


def embedding_near_dup_pairs(embeddings: DataFrame, threshold: float = 0.95,
                             bits: int = 6, id_col: str = "vec_id",
                             vec_col: str = "embedding", seed: int = 42,
                             dim: int | None = None,
                             max_bucket_size: int | None = 10_000) \
        -> DataFrame:
    """(id_a, id_b, cosine) with cosine >= threshold, candidate pairs
    restricted to the same LSH bucket (one self-join keyed by bucket).

    Pass ``dim`` explicitly at scale — ``dim=None`` infers it with a
    driver-side ``.first()`` action (one extra tiny job).
    ``max_bucket_size`` (DEFAULT ON) drops buckets larger than the cap
    before the self-join so a degenerate cluster of identical vectors
    cannot make one bucket quadratic; collapse exact duplicates first
    (``dedup_exact`` on a vector digest) to keep recall.  Size
    ``bits`` so the EXPECTED bucket population N/2^bits stays far
    under the cap."""
    if dim is None:
        dim = len(embeddings.select(vec_col).first()[0])
    planes = hyperplanes(dim, bits, seed)
    b = embeddings.select(F.col(id_col), F.col(vec_col),
                          lsh_bucket_col(vec_col, planes).alias("_bucket"))
    # materialize the bucketed projection ONCE (guide: truncate a plan
    # reused by several consumers): the census and BOTH self-join
    # branches would otherwise each re-run the scan + the bits x dim
    # signature fold — 3x the dominant per-row cost.  Disk-backed
    # (MEMORY_AND_DISK) and scoped to this query's lineage.
    b = b.localCheckpoint(eager=False)
    if max_bucket_size is not None:
        # eager hot-bucket census: ONE count-agg job whose result (the
        # ids of buckets over the cap — few by construction) collects
        # to the driver and becomes a plain NOT-IN predicate on both
        # join branches.  A lazy anti-join or window guard re-executes
        # the census inside each self-join branch and adds shuffles —
        # measured 2-6x slower on the sf0.1 entry; this shape costs one
        # linear pass and nothing in the join plan.
        hot = [r["_bucket"] for r in
               (b.groupBy("_bucket").agg(F.count("*").alias("_n"))
                .filter(F.col("_n") > max_bucket_size)
                .select("_bucket").collect())]
        if hot:
            b = b.filter(~F.col("_bucket").isin(hot))
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
