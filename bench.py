"""Benchmark harness — prints ONE JSON line:
{"metric": ..., "value": N, "unit": "sec", "queries": {...}, "sf": ...}

Headline workload (mirrors the reference's benchmark shape,
``lucene/benchmark/conf/indexing.alg`` + SearchTask):

1. **index build throughput** over the deterministic synthetic
   source-code corpus (FIXTURES.md; default 20k docs ~ the reference's
   canonical 20k-doc Reuters workload) — wall-clock + files/sec.
2. **query latency** p50/p99 over the 30-query reference set against
   that index (block-max pruning on).
3. **driver-table queries** at $SPARK_GRAFT_SF_DIR: a representative
   subset of the __spark_entry__ operator suite over documents/
   embeddings.

Env knobs:
  SPARK_GRAFT_SF_DIR   (default /root/testdata/sf0.1)
  SPARK_GRAFT_CPUS     (default 32)
  BENCH_CORPUS_DOCS    (default 20000)
  BENCH_SCALING=1      also run the N vs 4N-core scaling pair
                       (writes results into the JSON under "scaling")
"""

from __future__ import annotations

import json
import os
import shutil
import statistics
import sys
import tempfile
import time

sys.path.insert(0, os.path.dirname(os.path.abspath(__file__)))


def build_and_query(cores: int, n_docs: int, tag: str) -> dict:
    """One full build+query cycle on a fresh Spark session."""
    from pyspark.sql import SparkSession

    from lucene_1_spark import corpus as corpus_mod
    from lucene_1_spark.index import IndexReader, build_index
    from lucene_1_spark.index.builder import IndexConfig
    from lucene_1_spark.search import IndexSearcher
    from lucene_1_spark.session import get_spark

    spark = get_spark(f"bench-{tag}", cores=cores, shuffle_partitions=cores)
    spark.sparkContext.setLogLevel("ERROR")

    # materialize the corpus once per size (generation must not pollute
    # the measured build); generated Spark-parallel, deterministic
    corpus_path = os.path.join(tempfile.gettempdir(),
                               f"l1s_bench_corpus_{n_docs}")
    if not os.path.exists(os.path.join(corpus_path, "_SUCCESS")):
        corpus_mod.write_corpus_parquet(spark, n_docs, corpus_path)
    src = spark.read.parquet(corpus_path)
    src.persist().count()  # warm cache before the clock starts

    idx_dir = os.path.join(tempfile.gettempdir(), f"l1s_bench_idx_{tag}")
    shutil.rmtree(idx_dir, ignore_errors=True)
    t0 = time.time()
    build_index(spark, src, idx_dir,
                IndexConfig(n_buckets=min(cores, 32),
                            n_doc_partitions=cores))
    build_sec = time.time() - t0

    searcher = IndexSearcher(IndexReader(spark, idx_dir))
    lat = []
    queries = corpus_mod.reference_queries()
    t0 = time.time()
    for _, qtext, _ in queries:
        tq = time.time()
        searcher.search_df(qtext, k=10).collect()
        lat.append(time.time() - tq)
    query_total = time.time() - t0
    lat.sort()
    # the same 30 queries as ONE batched pass (search_many)
    t0 = time.time()
    searcher.search_many({f"q{i}": qt for i, (_, qt, _) in
                          enumerate(queries)}, k=10).collect()
    batch_sec = time.time() - t0
    out = {
        "cores": cores,
        "n_docs": n_docs,
        "build_sec": round(build_sec, 2),
        "files_per_sec": round(n_docs / build_sec, 1),
        "query_total_sec": round(query_total, 2),
        "query_p50_sec": round(statistics.median(lat), 3),
        "query_p99_sec": round(lat[max(0, int(len(lat) * 0.99) - 1)], 3),
        "batch_30q_sec": round(batch_sec, 2),
    }
    spark.stop()
    return out


def high_partition_build(n_docs: int, cores: int, n_parts: int = 512) -> dict:
    """VERDICT r1 item 4 evidence: build at n_doc_partitions=512 (the
    10^12-file segment shape), verify query results identical to the
    low-partition index, compact, and confirm blocks-per-term is bounded
    at ceil(df/128) afterward."""
    from pyspark.sql import functions as F

    from lucene_1_spark import corpus as corpus_mod
    from lucene_1_spark.index import IndexReader, build_index
    from lucene_1_spark.index.builder import IndexConfig
    from lucene_1_spark.index.maintenance import compact_index
    from lucene_1_spark.search import IndexSearcher
    from lucene_1_spark.session import get_spark

    spark = get_spark("bench-parts", cores=cores, shuffle_partitions=cores)
    spark.sparkContext.setLogLevel("ERROR")
    corpus_path = os.path.join(tempfile.gettempdir(),
                               f"l1s_bench_corpus_{n_docs}")
    if not os.path.exists(os.path.join(corpus_path, "_SUCCESS")):
        corpus_mod.write_corpus_parquet(spark, n_docs, corpus_path)
    src = spark.read.parquet(corpus_path)

    ref_dir = os.path.join(tempfile.gettempdir(), f"l1s_bench_idx_c{cores}")
    if not os.path.exists(os.path.join(ref_dir, "manifest.json")):
        build_index(spark, src, ref_dir,
                    IndexConfig(n_buckets=min(cores, 32),
                                n_doc_partitions=cores))
    hi_dir = os.path.join(tempfile.gettempdir(), f"l1s_bench_idx_p{n_parts}")
    shutil.rmtree(hi_dir, ignore_errors=True)
    t0 = time.time()
    build_index(spark, src, hi_dir,
                IndexConfig(n_buckets=min(cores, 32),
                            n_doc_partitions=n_parts))
    build_sec = time.time() - t0

    s_ref = IndexSearcher(IndexReader(spark, ref_dir))
    s_hi = IndexSearcher(IndexReader(spark, hi_dir))
    probes = ["tok0", "tok1 tok2", "+tok0 +tok3", "tok4 -tok0", "def class"]
    identical = all(
        [(r["doc_id"], r["score"]) for r in s_ref.search_df(q, 10).collect()]
        == [(r["doc_id"], r["score"]) for r in s_hi.search_df(q, 10).collect()]
        for q in probes)

    t0 = time.time()
    compact_index(spark, hi_dir)
    compact_sec = time.time() - t0
    frag = (IndexReader(spark, hi_dir).postings().groupBy("term")
            .agg(F.count("*").alias("nb"), F.sum("num_docs").alias("df"))
            .filter(F.col("nb") != F.ceil(F.col("df") / 128)).count())
    s_hi2 = IndexSearcher(IndexReader(spark, hi_dir))
    identical_after = all(
        [(r["doc_id"], r["score"]) for r in s_ref.search_df(q, 10).collect()]
        == [(r["doc_id"], r["score"]) for r in s_hi2.search_df(q, 10).collect()]
        for q in probes)
    spark.stop()
    return {
        "n_doc_partitions": n_parts,
        "build_sec": round(build_sec, 2),
        "results_identical_to_low_partition_index": identical,
        "compact_sec": round(compact_sec, 2),
        "fragmented_terms_after_compaction": frag,
        "results_identical_after_compaction": identical_after,
    }


def streaming_maintenance(n_batches: int = 10, batch_docs: int = 2000,
                          cores: int = 8) -> dict:
    """Continuous-ingestion maintenance cost: append ``n_batches``
    micro-batches through the auto-merging foreachBatch handler
    (TieredMergePolicy tier budget 4) and report append+merge
    throughput, the merge pass count, and the final segment count —
    the O(merged bytes) sustainability story, measured."""
    from lucene_1_spark import corpus as corpus_mod
    from lucene_1_spark.index import IndexReader
    from lucene_1_spark.index.builder import IndexConfig
    from lucene_1_spark.index.maintenance import segment_sizes
    from lucene_1_spark.search import IndexSearcher
    from lucene_1_spark.session import get_spark
    from lucene_1_spark.streaming.incremental import IncrementalIndexWriter

    spark = get_spark("bench-stream", cores=cores,
                      shuffle_partitions=cores)
    spark.sparkContext.setLogLevel("ERROR")
    pdf = corpus_mod.generate(n_batches * batch_docs)
    d = os.path.join(tempfile.gettempdir(), "l1s_bench_stream_idx")
    shutil.rmtree(d, ignore_errors=True)
    w = IncrementalIndexWriter(
        spark, d, IndexConfig(n_buckets=min(cores, 32),
                              n_doc_partitions=cores))
    merges = 0
    t0 = time.time()
    for i in range(n_batches):
        w.append(spark.createDataFrame(
            pdf.iloc[i * batch_docs:(i + 1) * batch_docs]), batch_id=i)
        if w.maybe_merge(segs_per_tier=4) is not None:
            merges += 1
    total = time.time() - t0
    n_segs = len(segment_sizes(d))
    s = IndexSearcher(IndexReader(spark, d))
    top = s.search("tok0 tok1", k=10)
    spark.stop()
    return {
        "batches": n_batches,
        "docs_per_batch": batch_docs,
        "append_plus_merge_sec": round(total, 2),
        "docs_per_sec": round(n_batches * batch_docs / total, 1),
        "merge_passes": merges,
        "final_segments": n_segs,
        "query_ok": len(top) == 10,
    }


def driver_table_queries(sf_dir: str, cores: int) -> dict:
    """Timings for a representative subset of the __spark_entry__ suite."""
    import __spark_entry__ as entrymod
    from lucene_1_spark.session import get_spark

    spark = get_spark("bench-tables", cores=cores, shuffle_partitions=cores)
    spark.sparkContext.setLogLevel("ERROR")
    subset = ["ft_term_topk", "ft_or_topk", "ft_and_topk", "ft_filter_topk",
              "ft_prefix_topk", "ft_fuzzy_topk", "ft_sloppy_phrase_topk",
              "ft_sloppy_phrase3_topk", "ft_intervals_ordered3",
              "ft_intervals_unordered", "ft_intervals_or_containing",
              "ft_bool_phrase_topk", "ft_field_filter_topk",
              "ft_parent_join_topk", "ft_facet_lang", "ft_delete_topk",
              "knn_filtered_topk", "ft_classic_topk", "ft_batch_queries",
              "dedup_exact_groups", "dedup_minhash_lsh", "dedup_simhash",
              "pipe_decontamination", "text_repetition",
              "sim_cosine_topk", "sim_near_dup_pairs", "sim_ivf_ann_topk",
              "text_quality", "text_fingerprint",
              # round-4 operators
              "ft_dismax_topk", "ft_term_in_set", "ft_more_like_this",
              "ft_spell_suggest", "geo_distance_topk", "ft_join_query",
              "ft_term_vector", "classify_naive_bayes",
              # round-7 operators: new similarities, lenient parsers,
              # persisted-bucket LSH serving, and the training-pipeline
              # additions (semantic dedup, PII scrub, stratified
              # sampling, sequence packing)
              "ft_lmd_topk", "ft_dfr_topk", "ft_simple_parse_topk",
              "ft_precedence_parse_topk", "ft_surround_count",
              "ft_function_score_topk", "ft_expr_sort_topk",
              "ft_high_freq_terms", "suggest_free_text",
              "sim_lsh_index_topk", "sim_semdedup_count",
              "pii_scrub_totals", "sample_stratified_counts",
              "pack_sequences_stats",
              # round-7 batch 3: SweetSpot/CommonTerms/phonetic/
              # MemoryIndex percolation
              "ft_sweet_spot_topk", "ft_common_terms_topk",
              "ft_phonetic_topk", "ft_memory_percolate_count"]
    qs = entrymod.queries()
    out = {}
    for name in subset:
        t0 = time.time()
        qs[name](spark, sf_dir).collect()
        out[name] = round(time.time() - t0, 3)

    # quantified ANN approximation: recall@10 vs exact cosine.  The LSH
    # path runs the DEFAULT auto policy (bits from N, 8 tables x
    # multi-probe budget 8 incl. multi-bit perturbation sets — the
    # recall levers) on BOTH the driver's random
    # vectors (LSH-adversarial worst case) and a clustered fixture
    # (realistic embeddings with planted neighbors).
    from pyspark.sql import functions as F

    from lucene_1_spark.pipeline.similarity import ann_recall_at_k, ivf_fit
    emb = spark.read.parquet(os.path.join(sf_dir, "embeddings.parquet"))
    t0 = time.time()
    out["ann_recall_at_10_random"] = round(ann_recall_at_k(
        emb, query_ids=[0, 1, 2, 3, 4], k=10), 3)
    out["ann_recall_at_10_clustered"] = round(ann_recall_at_k(
        _clustered_embeddings(spark), query_ids=[0, 1, 2, 3, 4], k=10), 3)
    out["ann_recall_eval_sec"] = round(time.time() - t0, 3)
    t0 = time.time()
    cents = ivf_fit(emb, n_centroids=16, iters=5)
    out["ivf_recall_at_10"] = round(ann_recall_at_k(
        emb, query_ids=[0, 1, 2, 3, 4], k=10,
        method="ivf", centroids=cents, nprobe=4), 3)
    # IVF's design regime: clustered embeddings (random vectors have no
    # cluster structure for the coarse quantizer to exploit — the ~0.5
    # random-vector recall above is the honest adversarial floor;
    # the LSH+multiprobe path is the random-vector serving answer)
    cemb = _clustered_embeddings(spark)
    ccents = ivf_fit(cemb, n_centroids=16, iters=5)
    out["ivf_recall_at_10_clustered"] = round(ann_recall_at_k(
        cemb, query_ids=[0, 1, 2, 3, 4], k=10,
        method="ivf", centroids=ccents, nprobe=4), 3)
    out["ivf_recall_eval_sec"] = round(time.time() - t0, 3)
    # serving policy: the router prices the quantizer (ivf_quality)
    # and must send unclustered vectors to LSH, clustered to IVF
    from lucene_1_spark.pipeline.similarity import (choose_ann_route,
                                                    ivf_quality)
    out["ivf_quality_random"] = round(ivf_quality(emb, cents), 3)
    out["ivf_quality_clustered"] = round(ivf_quality(cemb, ccents), 3)
    out["ann_route_random"] = choose_ann_route(
        emb, cents, quality=out["ivf_quality_random"])
    out["ann_route_clustered"] = choose_ann_route(
        cemb, ccents, quality=out["ivf_quality_clustered"])
    # per-partition HNSW (Lucene's per-segment graph model)
    from lucene_1_spark.pipeline.hnsw import hnsw_build, hnsw_search
    from lucene_1_spark.pipeline.similarity import cosine_topk
    t0 = time.time()
    for tag, e in (("random", emb), ("clustered", cemb)):
        g = hnsw_build(e, m=8, ef_construction=64, n_partitions=4)
        g = g.persist()
        g.count()
        tot = 0.0
        qids = [0, 1, 2, 3, 4]
        qrows = {r["vec_id"]: [float(x) for x in r["embedding"]]
                 for r in e.filter(F.col("vec_id").isin(qids)).collect()}
        for qid in qids:
            qv = qrows[qid]
            exact = {r["vec_id"]
                     for r in cosine_topk(e, qv, 10).collect()}
            approx = {r["vec_id"]
                      for r in hnsw_search(g, qv, 10, ef=64).collect()}
            tot += len(exact & approx) / 10
        g.unpersist()
        out[f"hnsw_recall_at_10_{tag}"] = round(tot / len(qids), 3)
    out["hnsw_recall_eval_sec"] = round(time.time() - t0, 3)

    # int8 scalar-quantized HNSW (Lucene99HnswScalarQuantizedVectors-
    # Format analog): the graph table stores array<tinyint> vectors,
    # beam distances run dequantized, survivors re-score at full
    # precision — recall must hold vs exact, per-round
    from lucene_1_spark.pipeline.quantize import scalar_quantize_fit
    t0 = time.time()
    for tag, e in (("random", emb), ("clustered", cemb)):
        mn, mx = scalar_quantize_fit(e)
        g = hnsw_build(e, m=8, ef_construction=64, n_partitions=4,
                       quant=(mn, mx)).persist()
        g.count()
        tot = 0.0
        qids = [0, 1, 2, 3, 4]
        qrows = {r["vec_id"]: [float(x) for x in r["embedding"]]
                 for r in e.filter(F.col("vec_id").isin(qids)).collect()}
        for qid in qids:
            qv = qrows[qid]
            exact = {r["vec_id"]
                     for r in cosine_topk(e, qv, 10).collect()}
            approx = {r["vec_id"]
                      for r in hnsw_search(g, qv, 10, ef=64,
                                           quant=(mn, mx),
                                           rescore=e).collect()}
            tot += len(exact & approx) / 10
        g.unpersist()
        out[f"hnsw_quant_recall_at_10_{tag}"] = round(tot / len(qids), 3)
    out["hnsw_quant_recall_eval_sec"] = round(time.time() - t0, 3)

    out["quality"] = quality_metrics(spark, sf_dir)
    spark.stop()
    return out


def _clustered_embeddings(spark, n_clusters: int = 40,
                          per_cluster: int = 25, dim: int = 64):
    """Deterministic clustered vectors (planted near-neighbors) — the
    realistic ANN fixture: cluster centers are unit Gaussians, members
    are center + small noise."""
    import numpy as np
    rng = np.random.RandomState(7)
    centers = rng.normal(size=(n_clusters, dim))
    centers /= np.linalg.norm(centers, axis=1, keepdims=True)
    rows = []
    vid = 0
    for c in range(n_clusters):
        for _ in range(per_cluster):
            v = centers[c] + 0.15 * rng.normal(size=dim)
            rows.append((vid, [float(x) for x in v]))
            vid += 1
    return spark.createDataFrame(rows, "vec_id long, embedding array<double>")


def quality_metrics(spark, sf_dir: str, tf_min: int = 6) -> dict:
    """TREC-style retrieval quality (QualityStats.java:25-171 metrics)
    over a deterministic judged fixture: for each single-term query,
    the judged-relevant set is the docs whose whitespace term frequency
    is >= ``tf_min`` — RARE judgments (~0.2% of the corpus at sf0.1),
    so rankings that don't surface high-tf docs early lose MAP.  Each
    query retrieves to 2x its judged-set size (min 10), so recall and
    precision both live strictly inside (0, 1) and the two wired
    similarities produce MEASURABLY different MAP — the harness
    discriminates ranking regressions instead of pinning P@N at 1.0
    (the round-4 fixture retrieved 20 from thousands of judged docs,
    making every metric degenerate)."""
    import __spark_entry__ as entrymod
    from pyspark.sql import functions as F

    from lucene_1_spark.quality import average, judge_run

    qterms = ["spark", "merge", "window", "batch", "value",
              "sort", "query", "fast"]
    docs = spark.read.parquet(os.path.join(sf_dir, "documents.parquet"))
    toks = docs.select(
        "doc_id",
        F.explode(F.filter(
            F.split(F.lower(F.coalesce(F.col("text"), F.lit(""))), r"\s+"),
            lambda t: t != "")).alias("term"))
    rel_rows = (toks.filter(F.col("term").isin(qterms))
                .groupBy("doc_id", "term").count()
                .filter(F.col("count") >= int(tf_min)).collect())
    judged: dict[str, set] = {t: set() for t in qterms}
    for r in rel_rows:
        judged[r["term"]].add(r["doc_id"])

    out = {}
    for sim_name, get_searcher in (
            ("bm25", entrymod._searcher),
            ("classic", entrymod._classic_searcher),
            ("lm_dirichlet", lambda s, d: entrymod._lmd_searcher(
                s, d, "lm_dirichlet_double")),
            ("dfr_ine_l_h2", lambda s, d: entrymod._lmd_searcher(
                s, d, "dfr_ine_l_h2_double")),
            ("dfi_chi2", lambda s, d: entrymod._lmd_searcher(
                s, d, "dfi_chi2_double"))):
        se = get_searcher(spark, sf_dir)
        idmap = {r["doc_id"]: int(r["path"])
                 for r in se.reader.docs().select("doc_id", "path").collect()}
        stats = []
        for t in qterms:
            depth = max(10, 2 * len(judged[t]))
            hits = se.search(t, k=depth)
            ranked = [idmap[h["doc_id"]] for h in hits]
            stats.append(judge_run(ranked, judged[t]))
        out[sim_name] = average(stats, p_at=(1, 5, 10))
    out["map_spread_bm25_vs_classic"] = round(
        abs(out["bm25"]["map"] - out["classic"]["map"]), 4)
    maps = [v["map"] for v in out.values() if isinstance(v, dict)]
    out["map_spread_all_sims"] = round(max(maps) - min(maps), 4)
    return out


def scaling_pair(sc_docs: int, hi_cores: int = 8, reps: int = 2) -> dict:
    """North-rule scaling evidence: the SAME job (same corpus, same
    n_doc_partitions=32 layout — only executor parallelism differs, as
    on a real N-vs-4N cluster) at N and 4N cores, interleaved ``reps``
    times per core count; the estimator is the MIN per core count
    (hypervisor steal only ever inflates a run, so min approximates the
    uncontended cost — single runs on this VM lie by up to 1.7x).

    The pair defaults to N=1 vs 4N=4 — the regime where this sandbox VM
    actually rewards parallelism.  Measured ceilings on this box: the
    identical job DEGRADES per-core from ~8 concurrent Arrow workers on
    (1.2M docs: 103-170s@8c vs 68s best; 274s@32c), a memory-bandwidth /
    steal pathology of the VM, not the dataflow (trivial UDFs and raw
    multiprocessing tokenization DO scale to 32 procs — see BASELINE.md
    "Scaling evidence", which records BOTH the 1v4 and 2v8 pairs).  The
    corpus defaults to 1.2M docs so fixed per-build driver work
    (checkpoints, stats, manifest) amortizes — at 20k docs it dominates
    and the measurement is meaningless."""
    import shutil as _sh

    from lucene_1_spark import corpus as corpus_mod
    from lucene_1_spark.index import build_index
    from lucene_1_spark.index.builder import IndexConfig
    from lucene_1_spark.session import get_spark

    corpus_path = os.path.join(tempfile.gettempdir(),
                               f"l1s_bench_corpus_{sc_docs}")
    if not os.path.exists(os.path.join(corpus_path, "_SUCCESS")):
        s = get_spark("bench-gen", cores=8, shuffle_partitions=8)
        s.sparkContext.setLogLevel("ERROR")
        corpus_mod.write_corpus_parquet(s, sc_docs, corpus_path)
        s.stop()
    lo_cores = max(hi_cores // 4, 1)

    def one(cores: int, rep: int) -> float:
        s = get_spark(f"bench-sc{cores}r{rep}", cores=cores,
                      shuffle_partitions=cores)
        s.sparkContext.setLogLevel("ERROR")
        src = s.read.parquet(corpus_path)
        src.persist().count()
        d = os.path.join(tempfile.gettempdir(), f"l1s_sc_{cores}_{rep}")
        _sh.rmtree(d, ignore_errors=True)
        t0 = time.time()
        build_index(s, src, d, IndexConfig(n_buckets=8,
                                           n_doc_partitions=32))
        dt = time.time() - t0
        _sh.rmtree(d, ignore_errors=True)
        s.stop()
        return dt

    runs: dict[str, list] = {str(lo_cores): [], str(hi_cores): []}
    for rep in range(reps):
        for cores in (hi_cores, lo_cores):
            runs[str(cores)].append(round(one(cores, rep), 1))
    lo_best, hi_best = min(runs[str(lo_cores)]), min(runs[str(hi_cores)])
    speedup = lo_best / hi_best
    return {
        "n_docs": sc_docs, "n_doc_partitions": 32, "runs_sec": runs,
        "estimator": "min of interleaved runs per core count",
        "n_cores": lo_cores, "n_build_sec": lo_best,
        "n_files_per_sec": round(sc_docs / lo_best, 1),
        "four_n_cores": hi_cores, "four_n_build_sec": hi_best,
        "four_n_files_per_sec": round(sc_docs / hi_best, 1),
        "speedup": round(speedup, 3),
        "efficiency": round(speedup / (hi_cores / lo_cores), 3),
    }


def main():
    sf_dir = os.environ.get("SPARK_GRAFT_SF_DIR", "/root/testdata/sf0.1")
    req_cores = int(os.environ.get("SPARK_GRAFT_CPUS", "32"))
    # this sandbox VM degrades beyond ~8 concurrent Arrow workers
    # (measured: identical build 75s@8c, 172s@16c, 274s@32c — see
    # BASELINE.md "Scaling evidence"), so the build benchmark runs at
    # min(requested, 8); both values are recorded below.
    cores = min(req_cores, int(os.environ.get("BENCH_BUILD_CORES", "8")))
    n_docs = int(os.environ.get("BENCH_CORPUS_DOCS", "20000"))

    main_run = build_and_query(cores, n_docs, f"c{cores}")
    main_run["requested_cores"] = req_cores
    table_q = driver_table_queries(sf_dir, cores)
    parts = high_partition_build(n_docs, cores, n_parts=int(
        os.environ.get("BENCH_HI_PARTS", "512")))

    result = {
        "metric": "index_build_plus_query_sec",
        "value": round(main_run["build_sec"] + main_run["query_total_sec"], 2),
        "unit": "sec",
        "sf": sf_dir,
        "index_build": main_run,
        "high_partition_build": parts,
        "queries": table_q,
        "streaming_maintenance": streaming_maintenance(cores=cores),
    }

    if os.environ.get("BENCH_SCALING") == "1":
        result["scaling"] = scaling_pair(
            sc_docs=int(os.environ.get("BENCH_SCALING_DOCS", "1200000")),
            hi_cores=int(os.environ.get("BENCH_SCALING_4N", "4")),
            reps=int(os.environ.get("BENCH_SCALING_REPS", "2")))

    # The driver tail-captures only the LAST ~2000 chars of stdout, so
    # the FINAL line must be a complete, compact JSON headline (the r5
    # full dump overflowed the tail and the round lost its headline).
    # Full detail goes first on stdout AND to a sidecar file.
    with open(os.path.join(os.path.dirname(os.path.abspath(__file__)),
                           "BENCH_DETAIL.json"), "w") as fh:
        json.dump(result, fh, indent=1)
    print(json.dumps(result))
    ib = main_run
    compact = {
        "metric": result["metric"],
        "value": result["value"],
        "unit": "sec",
        "sf": result["sf"],
        "build_sec": ib["build_sec"],
        "files_per_sec": ib["files_per_sec"],
        "query_p50_sec": ib["query_p50_sec"],
        "query_p99_sec": ib["query_p99_sec"],
        "batch_30q_sec": ib["batch_30q_sec"],
        "hi_part_build_sec": parts["build_sec"],
        "queries": {k: v for k, v in table_q.items()
                    if isinstance(v, (int, float))},
        "detail": "BENCH_DETAIL.json",
    }
    if "scaling" in result:
        sc = result["scaling"]
        compact["scaling"] = {k: sc[k] for k in
                              ("n_cores", "n_build_sec", "four_n_cores",
                               "four_n_build_sec", "efficiency") if k in sc}
    line = json.dumps(compact)
    if len(line) > 1800:  # hard guard: never overflow the tail again
        compact.pop("queries", None)
        line = json.dumps(compact)
    print(line)


if __name__ == "__main__":
    main()
