"""Per-partition HNSW graphs — the Lucene99HnswVectorsFormat analog
(``lucene/core/.../codecs/lucene99/Lucene99HnswVectorsFormat.java``,
``util/hnsw/HnswGraphBuilder.java`` / ``HnswGraphSearcher.java``).

Lucene builds one HNSW graph PER SEGMENT and searches every segment's
graph, merging top-k — the same shape maps directly onto Spark: one
graph per PARTITION, built inside an ``applyInPandas`` kernel, stored
as a parquet table (node rows carry their vector + per-level neighbor
lists), searched by a ``mapInPandas`` beam search per partition with a
global TakeOrdered merge.  Partition count bounds per-graph memory
exactly as Lucene's segment size bounds its graph — at 10^9 vectors,
1000 partitions of ~10^6 nodes each search in parallel, no single
machine ever holds the whole dataset.

Clean-room implementation of the published algorithm (Malkov &
Yashunin, "Efficient and robust approximate nearest neighbor search
using Hierarchical Navigable Small World graphs", 2016):

- level assignment ``floor(-ln(u) * mL)`` with ``mL = 1/ln(M)`` —
  ``u`` derives from a hash of the vector id, NOT an RNG, so the
  graph is deterministic and rebuildable (the repo-wide no-RNG-in-job
  rule);
- insertion: greedy descent from the entry point to ``level+1``, then
  ``ef_construction`` beam search per level, closest-``M`` neighbor
  selection, bidirectional links, degree pruned to ``M`` (``2M`` at
  level 0) keeping closest — the simple-select variant (Lucene's
  diversity heuristic = documented simplification);
- search: greedy descent to level 1, beam of ``ef`` at level 0.

Cosine similarity throughout (vectors normalized once at build).
"""

from __future__ import annotations

import heapq
import math

import numpy as np
import pandas as pd
from pyspark.sql import DataFrame, functions as F, types as T

GRAPH_SCHEMA = T.StructType([
    T.StructField("gpart", T.IntegerType()),
    T.StructField("vec_id", T.LongType()),
    T.StructField("vec", T.ArrayType(T.DoubleType())),
    T.StructField("level", T.IntegerType()),
    # neighbor lists, one per level 0..level (flattened as list of
    # lists; parquet nested arrays)
    T.StructField("nbrs", T.ArrayType(T.ArrayType(T.LongType()))),
])

# int8 scalar-quantized variant (Lucene99HnswScalarQuantizedVectors-
# Format analog): the vector column is 8x smaller; graph construction
# still runs at full precision, only STORAGE is quantized
GRAPH_SCHEMA_Q = T.StructType([
    T.StructField("gpart", T.IntegerType()),
    T.StructField("vec_id", T.LongType()),
    T.StructField("vec_q", T.ArrayType(T.ByteType())),
    T.StructField("level", T.IntegerType()),
    T.StructField("nbrs", T.ArrayType(T.ArrayType(T.LongType()))),
])

_HASH_MOD = 1 << 52


def _hash_u(vid: int) -> float:
    """Deterministic uniform (0,1] from the vector id (splitmix-style
    mix — stable across runs/machines, no RNG in the job)."""
    x = (int(vid) + 0x9E3779B97F4A7C15) & 0xFFFFFFFFFFFFFFFF
    x = ((x ^ (x >> 30)) * 0xBF58476D1CE4E5B9) & 0xFFFFFFFFFFFFFFFF
    x = ((x ^ (x >> 27)) * 0x94D049BB133111EB) & 0xFFFFFFFFFFFFFFFF
    x = x ^ (x >> 31)
    return ((x % _HASH_MOD) + 1) / _HASH_MOD


def _unit(m: np.ndarray) -> np.ndarray:
    n = np.linalg.norm(m, axis=1, keepdims=True)
    n[n == 0] = 1.0
    return m / n


def _build_graph(ids: np.ndarray, vecs: np.ndarray, m: int,
                 ef_construction: int):
    """In-memory HNSW build over one partition's vectors.  Returns
    {local_idx: [nbr_lists per level]} and levels array."""
    ml = 1.0 / math.log(m)
    n = len(ids)
    levels = np.array([int(-math.log(_hash_u(int(v))) * ml)
                       for v in ids], dtype=np.int32)
    nbrs: list[list[list[int]]] = [
        [[] for _ in range(levels[i] + 1)] for i in range(n)]
    max0 = 2 * m

    def sims_to(q: np.ndarray, cand: np.ndarray) -> np.ndarray:
        return vecs[cand] @ q

    entry = -1
    top_level = -1
    for i in range(n):  # insert in deterministic (sorted-id) order
        li = int(levels[i])
        if entry < 0:
            entry, top_level = i, li
            continue
        q = vecs[i]
        ep = entry
        # greedy descent through levels above the new node's level
        for lvl in range(top_level, li, -1):
            changed = True
            while changed:
                changed = False
                cand = np.array(nbrs[ep][lvl], dtype=np.int64)
                if len(cand):
                    s = sims_to(q, cand)
                    j = int(np.argmax(s))
                    if s[j] > float(vecs[ep] @ q):
                        ep = int(cand[j])
                        changed = True
        # beam per level from min(li, top_level) down to 0
        for lvl in range(min(li, top_level), -1, -1):
            cap = max0 if lvl == 0 else m
            # ef_construction beam search at this level
            visited = {ep}
            ep_sim = float(vecs[ep] @ q)
            candidates = [(-ep_sim, ep)]           # max-heap by sim
            best: list[tuple[float, int]] = [(ep_sim, ep)]  # min-heap
            while candidates:
                cs, c = heapq.heappop(candidates)
                if -cs < best[0][0] and len(best) >= ef_construction:
                    break
                for nb in nbrs[c][lvl] if lvl < len(nbrs[c]) else ():
                    if nb in visited:
                        continue
                    visited.add(nb)
                    s = float(vecs[nb] @ q)
                    if len(best) < ef_construction or s > best[0][0]:
                        heapq.heappush(candidates, (-s, nb))
                        heapq.heappush(best, (s, nb))
                        if len(best) > ef_construction:
                            heapq.heappop(best)
            chosen = [b for _, b in sorted(best, reverse=True)[:m]]
            nbrs[i][lvl] = list(chosen)
            for nb in chosen:  # bidirectional + degree prune
                lst = nbrs[nb][lvl]
                lst.append(i)
                limit = max0 if lvl == 0 else m
                if len(lst) > limit:
                    arr = np.array(lst, dtype=np.int64)
                    s = sims_to(vecs[nb], arr)
                    keep = arr[np.argsort(-s)[:limit]]
                    nbrs[nb][lvl] = [int(x) for x in keep]
            ep = chosen[0] if chosen else ep
        if li > top_level:
            entry, top_level = i, li
    return levels, nbrs


def hnsw_build(embeddings: DataFrame, m: int = 8,
               ef_construction: int = 64, n_partitions: int | None = None,
               id_col: str = "vec_id",
               vec_col: str = "embedding",
               quant: tuple | None = None) -> DataFrame:
    """Build the per-partition graph table.  ``n_partitions`` bounds
    each graph's memory (the Lucene segment-size analog) — size it so
    a partition's vectors + links fit one executor; the result is a
    plain DataFrame to persist with ``partitionBy('gpart')`` so a
    search reads all graphs in parallel with partition pruning.

    ``quant=(min, max)`` (from
    :func:`lucene_1_spark.pipeline.quantize.scalar_quantize_fit`)
    stores int8 scalar-quantized vectors instead of float64 — the
    Lucene99HnswScalarQuantizedVectorsFormat analog, ~8x smaller
    vector storage; the graph itself is still CONSTRUCTED at full
    precision, and :func:`hnsw_search` re-scores survivors at full
    precision when given the base table."""
    nparts = int(n_partitions or embeddings.rdd.getNumPartitions() or 4)
    src = embeddings.select(
        F.col(id_col).cast("long").alias("vec_id"),
        F.col(vec_col).cast("array<double>").alias("vec"),
        (F.pmod(F.xxhash64(F.col(id_col)), F.lit(nparts)))
        .cast("int").alias("gpart"))

    mm, efc = int(m), int(ef_construction)
    if quant is not None:
        from lucene_1_spark.pipeline.quantize import quantize_np
        qmn = np.asarray(quant[0], dtype=np.float64)
        qmx = np.asarray(quant[1], dtype=np.float64)

    def build(key: tuple, pdf: pd.DataFrame) -> pd.DataFrame:
        pdf = pdf.sort_values("vec_id").reset_index(drop=True)
        ids = pdf["vec_id"].to_numpy(dtype=np.int64)
        vecs = _unit(np.stack(pdf["vec"].to_numpy()).astype(np.float64))
        levels, nbrs = _build_graph(ids, vecs, mm, efc)
        out = {
            "gpart": np.full(len(ids), int(key[0]), dtype=np.int32),
            "vec_id": ids,
            "level": levels,
            "nbrs": [[[int(ids[x]) for x in lst] for lst in nbrs[i]]
                     for i in range(len(ids))],
        }
        if quant is not None:
            q = quantize_np(vecs, qmn, qmx)
            out["vec_q"] = [[int(b) for b in row] for row in q]
        else:
            out["vec"] = list(pdf["vec"])
        return pd.DataFrame(out)

    schema = GRAPH_SCHEMA_Q if quant is not None else GRAPH_SCHEMA
    return src.groupBy("gpart").applyInPandas(build, schema)


def hnsw_search(graph: DataFrame, query_vec: list[float], k: int = 10,
                ef: int = 64, with_stats: bool = False,
                quant: tuple | None = None,
                rescore: DataFrame | None = None,
                rescore_factor: int = 3,
                id_col: str = "vec_id",
                vec_col: str = "embedding") -> DataFrame:
    """Search every partition graph (one beam search per graph, in
    parallel) and TakeOrdered-merge the per-graph top-k — exactly
    Lucene's per-segment HNSW search + TopDocs.merge
    (``HnswGraphSearcher.java`` + ``TopDocs.merge``).  Returns
    (vec_id, score) with cosine scores, ties broken by vec_id.

    Two scale properties the searcher guarantees (the round-6 fixes):

    - the kernel is ``groupBy('gpart').applyInPandas`` — the WHOLE
      graph arrives in one call regardless of the Arrow batch cap, so
      neighbor ids always resolve (``mapInPandas`` fragmented graphs
      >10k nodes and KeyError'd on cross-fragment edges);
    - distances are evaluated LAZILY, only for nodes the beam search
      actually visits (batched per neighbor-list expansion), so the
      work per graph is O(ef · M · levels), sublinear in graph size —
      the entire point of HNSW.  ``with_stats=True`` exposes
      ``dist_evals``/``graph_size`` per graph so tests can assert
      evaluations ≪ nodes.

    For an int8-quantized graph (built with ``quant``), pass the same
    ``quant=(min, max)`` here — beam distances run on dequantized
    approximations — and optionally ``rescore`` = the full-precision
    base table: the global top ``k * rescore_factor`` quantized
    candidates are then re-scored with exact cosine (the reference's
    two-phase quantized search), so the final scores are exact."""
    q = np.asarray(query_vec, dtype=np.float64)
    q = q / (np.linalg.norm(q) or 1.0)
    kk, eff = int(k), max(int(ef), int(k))
    pool = kk * max(int(rescore_factor), 1) if rescore is not None else kk
    eff = max(eff, pool)
    if quant is not None:
        from lucene_1_spark.pipeline.quantize import dequantize_np
        qmn = np.asarray(quant[0], dtype=np.float64)
        qmx = np.asarray(quant[1], dtype=np.float64)

    out_schema = ("gpart int, vec_id long, score double, "
                  "dist_evals long, graph_size long")

    def search(key: tuple, pdf: pd.DataFrame) -> pd.DataFrame:
        pdf = pdf.sort_values("vec_id").reset_index(drop=True)
        n = len(pdf)
        ids = pdf["vec_id"].to_numpy(dtype=np.int64)
        pos = {int(v): i for i, v in enumerate(ids)}
        raw = pdf["vec_q" if quant is not None else "vec"].to_numpy()
        levels = pdf["level"].to_numpy(dtype=np.int32)
        nbrs = pdf["nbrs"].tolist()
        sims = np.full(n, np.nan, dtype=np.float64)

        def ensure(idxs: list[int]) -> None:
            # lazily score a batch of local indices (one matmul per
            # neighbor-list expansion — never the whole partition)
            todo = [i for i in idxs if np.isnan(sims[i])]
            if todo:
                mat = np.stack([np.asarray(raw[i], dtype=np.float64)
                                for i in todo])
                if quant is not None:
                    mat = dequantize_np(mat, qmn, qmx)
                nrm = np.linalg.norm(mat, axis=1)
                nrm[nrm == 0] = 1.0
                sims[todo] = (mat @ q) / nrm

        entry = int(np.argmax(levels))
        ensure([entry])
        ep = entry
        for lvl in range(int(levels[entry]), 0, -1):
            changed = True
            while changed:
                changed = False
                lst = nbrs[ep]
                cand = ([pos[int(x)] for x in lst[lvl]]
                        if lvl < len(lst) else [])
                if cand:
                    ensure(cand)
                    j = max(cand, key=lambda i: (sims[i], -int(ids[i])))
                    if sims[j] > sims[ep]:
                        ep = int(j)
                        changed = True
        # beam of ef at level 0
        visited = {ep}
        candidates = [(-float(sims[ep]), ep)]
        best = [(float(sims[ep]), ep)]
        while candidates:
            cs, c = heapq.heappop(candidates)
            if -cs < best[0][0] and len(best) >= eff:
                break
            fresh = []
            for x in (nbrs[c][0] if len(nbrs[c]) else ()):
                i = pos[int(x)]
                if i not in visited:
                    visited.add(i)
                    fresh.append(i)
            if not fresh:
                continue
            ensure(fresh)
            for i in fresh:
                s = float(sims[i])
                if len(best) < eff or s > best[0][0]:
                    heapq.heappush(candidates, (-s, i))
                    heapq.heappush(best, (s, i))
                    if len(best) > eff:
                        heapq.heappop(best)
        top = sorted(best, key=lambda b: (-b[0], ids[b[1]]))[:pool]
        evals = int(np.count_nonzero(~np.isnan(sims)))
        return pd.DataFrame({
            "gpart": np.full(len(top), int(key[0]), dtype=np.int32),
            "vec_id": [int(ids[i]) for _, i in top],
            "score": [s for s, _ in top],
            "dist_evals": np.full(len(top), evals, dtype=np.int64),
            "graph_size": np.full(len(top), n, dtype=np.int64),
        })

    out = graph.groupBy("gpart").applyInPandas(search, out_schema)
    if rescore is not None:
        # two-phase quantized search: global top pool by approximate
        # (dequantized) score, then exact full-precision cosine on the
        # survivors only — JVM column math, broadcast candidate join
        cand = (out.orderBy(F.desc("score"), F.asc("vec_id"))
                .limit(pool)
                .select("gpart", "vec_id", "dist_evals", "graph_size"))
        base = rescore.select(
            F.col(id_col).cast("long").alias("vec_id"),
            F.col(vec_col).cast("array<double>").alias("_v"))
        qlit = F.lit([float(x) for x in q])
        dot = F.aggregate(F.zip_with(F.col("_v"), qlit,
                                     lambda a, b: a * b),
                          F.lit(0.0).cast("double"),
                          lambda acc, x: acc + x)
        nrm = F.sqrt(F.aggregate(
            F.zip_with(F.col("_v"), F.col("_v"), lambda a, b: a * b),
            F.lit(0.0).cast("double"), lambda acc, x: acc + x))
        exact = (base.join(F.broadcast(cand), "vec_id")
                 .withColumn("score",
                             dot / F.when(nrm == 0, 1.0).otherwise(nrm))
                 .drop("_v"))
        res = exact.orderBy(F.desc("score"), F.asc("vec_id")).limit(kk)
    else:
        res = out.orderBy(F.desc("score"), F.asc("vec_id")).limit(kk)
    if with_stats:
        return res
    return res.select("vec_id", "score")
