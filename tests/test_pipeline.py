"""Training-data pipeline operators: dedup, similarity, text stats,
multimodal plumbing — correctness on small synthetic frames."""

import pytest
from pyspark.sql import functions as F


@pytest.fixture(scope="module")
def docs(spark):
    rows = [
        (0, "the quick brown fox jumps over the lazy dog"),
        (1, "the quick brown fox jumps over the lazy dog"),       # exact dup of 0
        (2, "the quick brown fox jumps over the lazy cat"),       # near dup
        (3, "completely different content about spark engines"),
        (4, "the quick brown fox jumps over the lazy dog today"), # near dup
        (5, ""),
    ]
    return spark.createDataFrame(rows, "doc_id long, text string")


def test_exact_duplicates(docs):
    from lucene_1_spark.pipeline.dedup import dedup_exact, exact_duplicates
    groups = exact_duplicates(docs).collect()
    assert len(groups) == 1
    assert groups[0]["n_dups"] == 2
    assert groups[0]["keep_doc_id"] == 0
    kept = dedup_exact(docs).select("doc_id").toPandas()["doc_id"].tolist()
    assert sorted(kept) == [0, 2, 3, 4, 5]


def test_ngram_jaccard(docs):
    from lucene_1_spark.pipeline.dedup import ngram_jaccard_pairs
    pairs = {(r["doc_a"], r["doc_b"]): r["jaccard"]
             for r in ngram_jaccard_pairs(docs, n=3, threshold=0.5).collect()}
    assert pairs[(0, 1)] == 1.0          # identical
    assert (0, 2) in pairs               # one-token change
    assert all(3 not in p for p in pairs)


def test_minhash_lsh_candidates(docs):
    from lucene_1_spark.pipeline.dedup import minhash_lsh_candidates
    cand = {(r["doc_a"], r["doc_b"])
            for r in minhash_lsh_candidates(docs, num_perm=8, bands=4).collect()}
    assert (0, 1) in cand                # identical docs always collide
    assert all(3 not in p and 5 not in p for p in cand)


def test_simhash(docs):
    from lucene_1_spark.pipeline.dedup import simhash64, simhash_near_dups
    sh = {r["doc_id"]: r["simhash"] for r in simhash64(docs).collect()}
    assert sh[0] == sh[1]
    assert 0 <= sh[0] < (1 << 48)
    dups = {(r["doc_a"], r["doc_b"]): r["hamming"]
            for r in simhash_near_dups(docs, max_hamming=3).collect()}
    assert dups.get((0, 1)) == 0


def test_cosine_topk(spark):
    from lucene_1_spark.pipeline.similarity import ann_topk, cosine_topk
    import numpy as np
    rng = np.random.RandomState(7)
    vecs = rng.normal(size=(50, 16))
    vecs[13] = vecs[0] * 2.0  # same direction as vec 0
    df = spark.createDataFrame(
        [(i, [float(x) for x in vecs[i]]) for i in range(50)],
        "vec_id long, embedding array<double>")
    q = [float(x) for x in vecs[0]]
    top = cosine_topk(df, q, k=3).collect()
    assert [r["vec_id"] for r in top[:2]] == [0, 13]
    assert top[0]["cosine"] == 1.0
    # LSH ANN finds the same top-1 (same direction => same bucket)
    ann = ann_topk(df, q, k=3, bits=4, multiprobe=1).collect()
    assert ann[0]["vec_id"] in (0, 13)


def _clustered_embeddings(spark, n_clusters=20, per_cluster=10, dim=16,
                          noise=0.05, seed=11):
    """Realistic ANN fixture: tight clusters (planted near-neighbors)."""
    import numpy as np
    rng = np.random.RandomState(seed)
    centers = rng.normal(size=(n_clusters, dim))
    rows = []
    for c in range(n_clusters):
        for j in range(per_cluster):
            v = centers[c] + noise * rng.normal(size=dim)
            rows.append((c * per_cluster + j, [float(x) for x in v]))
    return spark.createDataFrame(rows, "vec_id long, embedding array<double>")


def test_ann_recall_at_k_clustered(spark):
    """Quantified approximation: multi-table LSH must reach recall@10
    >= 0.9 on clustered data (planted neighbors)."""
    from lucene_1_spark.pipeline.similarity import ann_recall_at_k
    e = _clustered_embeddings(spark)
    rec = ann_recall_at_k(e, query_ids=[0, 30, 77, 120, 155], k=10,
                          bits=6, multiprobe=2, tables=4)
    assert rec >= 0.9, rec


def test_ivf_full_probe_equals_exact(spark):
    """IVF with nprobe = n_centroids scans every inverted list, so it
    must reproduce the exact cosine top-k bit-for-bit."""
    from lucene_1_spark.pipeline.similarity import (cosine_topk,
                                                    ivf_ann_topk, ivf_fit)
    e = _clustered_embeddings(spark)
    qv = [float(x)
          for x in e.filter("vec_id = 7").first()["embedding"]]
    cents = ivf_fit(e, n_centroids=8, iters=2)
    assert cents.shape == (8, 16)
    exact = [(r["vec_id"], r["cosine"])
             for r in cosine_topk(e, qv, k=10).collect()]
    full = [(r["vec_id"], r["cosine"])
            for r in ivf_ann_topk(e, qv, cents, k=10, nprobe=8).collect()]
    assert full == exact


def test_ivf_recall_at_k_clustered(spark):
    """IVF partial probe: recall@10 >= 0.9 on planted clusters with a
    quarter of the lists probed; the fit is deterministic."""
    from lucene_1_spark.pipeline.similarity import ann_recall_at_k, ivf_fit
    e = _clustered_embeddings(spark)
    c1 = ivf_fit(e, n_centroids=16, iters=3)
    c2 = ivf_fit(e, n_centroids=16, iters=3)
    import numpy as np
    assert np.array_equal(c1, c2)  # no RNG in the job
    rec = ann_recall_at_k(e, query_ids=[0, 30, 77, 120, 155], k=10,
                          method="ivf", centroids=c1, nprobe=4)
    assert rec >= 0.9, rec


def test_lsh_near_dup_pairs_match_exact(spark):
    from lucene_1_spark.pipeline.similarity import (
        embedding_near_dup_pairs, embedding_near_dup_pairs_exact)
    e = _clustered_embeddings(spark, n_clusters=8, per_cluster=6,
                              noise=0.01)
    exact = {(r["id_a"], r["id_b"]): r["cosine"]
             for r in embedding_near_dup_pairs_exact(e, 0.99).collect()}
    lsh = {(r["id_a"], r["id_b"]): r["cosine"]
           for r in embedding_near_dup_pairs(e, 0.99).collect()}
    assert exact and lsh == exact


def test_exact_duplicates_caps_listed_ids(spark):
    from lucene_1_spark.pipeline.dedup import exact_duplicates
    df = spark.createDataFrame([(i, "same text") for i in range(20)],
                               "doc_id long, text string")
    g = exact_duplicates(df, max_listed=5).collect()[0]
    assert g["n_dups"] == 20            # count stays exact
    assert len(g["dup_doc_ids"]) == 5   # listing is capped
    assert g["keep_doc_id"] == 0


def test_ngram_jaccard_shingle_df_cap(docs):
    from lucene_1_spark.pipeline.dedup import ngram_jaccard_pairs
    # uncapped and generously-capped runs agree on this corpus
    a = {(r["doc_a"], r["doc_b"]) for r in
         ngram_jaccard_pairs(docs, n=3, threshold=0.5).collect()}
    b = {(r["doc_a"], r["doc_b"]) for r in
         ngram_jaccard_pairs(docs, n=3, threshold=0.5,
                             max_shingle_df=100).collect()}
    assert a == b
    # a cap of 1 removes every shared shingle -> no candidate pairs
    c = ngram_jaccard_pairs(docs, n=3, threshold=0.0,
                            max_shingle_df=1).count()
    assert c == 0


def test_textstats(spark):
    from lucene_1_spark.pipeline.textstats import (
        fingerprint, language_id, quality_score, token_count)
    df = spark.createDataFrame(
        [(0, "the cat is in the house and it is big"),
         (1, "der hund ist nicht ein katze und das ist gut"),
         (2, "zzz qqq"),
         (3, "  spaced   out   text  ")],
        "doc_id long, text string")
    tc = {r["doc_id"]: r["n_tokens"] for r in token_count(df).collect()}
    assert tc[0] == 10 and tc[3] == 3
    li = {r["doc_id"]: r["pred_lang"] for r in language_id(df).collect()}
    assert li[0] == "en" and li[1] == "de" and li[2] == "und"
    qs = {r["doc_id"]: r for r in quality_score(df).collect()}
    assert qs[0]["stopword_ratio"] > 0.3
    assert 0.0 <= qs[2]["quality"] <= 1.0
    fp = {r["doc_id"]: r["fingerprint"] for r in fingerprint(df).collect()}
    assert fp[3] == fp[3]  # stable
    # whitespace-normalized: reflowed text maps to the same fingerprint
    df2 = spark.createDataFrame([(9, "spaced out\n text")],
                                "doc_id long, text string")
    assert fingerprint(df2).collect()[0]["fingerprint"] == fp[3]


def test_multimodal_plumbing(spark):
    from lucene_1_spark.pipeline.multimodal import (
        decode_image, frame_sample_plan, image_features, synthetic_media)
    media = synthetic_media(spark, n=12)
    feats = image_features(media, fake=True).collect()
    assert len(feats) == len([r for r in media.collect() if r["kind"] == "image"])
    for r in feats:
        assert r["width"] > 0 and 0 <= r["mean_luma"] <= 255
        assert 0 <= r["phash64"] < (1 << 63)
    # real decode is explicitly stubbed
    with pytest.raises(NotImplementedError):
        decode_image(b"xx", fake=False)
    plan = frame_sample_plan(media, every_n=25)
    assert plan.groupBy("media_id").count().collect()[0]["count"] == 4


def test_knn_vector_query_prefiltered(spark, tmp_root):
    """KnnVectorQuery with a pre-filter (KnnFloatVectorQuery.java:46):
    the engine filter restricts candidates BEFORE top-k, results equal
    brute force over the allowed set."""
    import numpy as np

    from lucene_1_spark import corpus as corpus_mod
    from lucene_1_spark.index import IndexBuilder, IndexReader
    from lucene_1_spark.index.builder import IndexConfig
    from lucene_1_spark.search import (IndexSearcher, KnnVectorQuery,
                                       TermQuery)
    import os
    d = os.path.join(tmp_root, "idx_knn")
    pdf = corpus_mod.generate(40)
    IndexBuilder(spark, d, IndexConfig(n_buckets=4, n_doc_partitions=2)) \
        .build(spark.createDataFrame(pdf).repartition(2, "repo"))
    s = IndexSearcher(IndexReader(spark, d))
    n = s.reader.stats["n_docs"]
    rng = np.random.RandomState(7)
    vecs = rng.normal(size=(n, 8))
    emb = spark.createDataFrame(
        [(i, [float(x) for x in vecs[i]]) for i in range(n)],
        "doc_id long, embedding array<double>")
    qv = tuple(float(x) for x in vecs[0])
    filt = TermQuery("tok42")
    got = s.knn_search(emb, KnnVectorQuery(qv, k=5, filter=filt)).collect()

    allowed = {r["doc_id"] for r in s.search_df(filt, k=None).collect()}
    assert allowed and len(allowed) < n
    qn = np.linalg.norm(vecs[0])
    cos = {i: round(float(vecs[i] @ vecs[0]
                          / (np.linalg.norm(vecs[i]) * qn)), 6)
           for i in allowed}
    top = sorted(cos.items(), key=lambda kv: (-kv[1], kv[0]))[:5]
    assert [r["doc_id"] for r in got] == [i for i, _ in top]
    assert [float(r["cosine"]) for r in got] == \
        pytest.approx([c for _, c in top], abs=1e-6)
    # unfiltered differs (the filter really constrained the set)
    unf = s.knn_search(emb, KnnVectorQuery(qv, k=5)).collect()
    assert {r["doc_id"] for r in unf} != {r["doc_id"] for r in got} or \
        allowed == set(range(n))


def test_multimodal_audio_and_resize(spark):
    import numpy as np

    from lucene_1_spark.pipeline.multimodal import (audio_features,
                                                    decode_audio,
                                                    resize_image,
                                                    synthetic_media)
    rows = audio_features(synthetic_media(spark, n=30), fake=True).collect()
    assert len(rows) == 10  # every 3rd synthetic row is audio
    for r in rows:
        assert r["n_samples"] > 0 and r["rms"] > 0
        assert 0.0 <= r["zero_crossing_rate"] <= 1.0
        assert r["peak"] >= r["rms"]
    # deterministic: same blob -> same features
    again = audio_features(synthetic_media(spark, n=30), fake=True).collect()
    assert sorted(map(tuple, rows)) == sorted(map(tuple, again))
    with pytest.raises(NotImplementedError):
        decode_audio(b"abc", fake=False)
    # resize: real numpy plumbing
    arr = np.arange(6 * 4 * 3, dtype=np.uint8).reshape(6, 4, 3)
    out = resize_image(arr, 8, 3)
    assert out.shape == (3, 8, 3)
    assert (resize_image(arr, 4, 6) == arr).all()


def test_contamination_overlap_and_repetition(spark):
    """Decontamination: only docs sharing an n-gram pair up; repetition
    stats flag degenerate docs."""
    from lucene_1_spark.pipeline.dedup import contamination_overlap
    from lucene_1_spark.pipeline.textstats import repetition_stats
    train = spark.createDataFrame([
        (0, "a b c d e f"),
        (1, "x y z w q r"),
        (2, "totally different content here now ok"),
    ], "doc_id long, text string")
    evalset = spark.createDataFrame([
        (100, "a b c d e f extended"),   # shares 3-grams with doc 0
        (101, "nothing in common at all friend"),
    ], "doc_id long, text string")
    got = {(r["train_doc"], r["eval_doc"]): r["n_shared"]
           for r in contamination_overlap(train, evalset, n=3,
                                          max_shingle_df=None).collect()}
    # doc 0 vs 100 share the 4 distinct 3-grams of "a b c d e f"
    assert got == {(0, 100): 4}

    rep = {r["doc_id"]: r for r in repetition_stats(spark.createDataFrame([
        (0, "a b a b a b a b"),          # degenerate repetition
        (1, "all fresh tokens only here"),
    ], "doc_id long, text string"), n=3).collect()}
    assert rep[0]["dup_ngram_ratio"] > 0.5
    assert rep[1]["dup_ngram_ratio"] == 0.0
    assert rep[0]["top_ngram_ratio"] > rep[1]["top_ngram_ratio"]


def test_degenerate_cluster_bucket_guards(spark):
    """One cluster of identical docs/vectors must not go quadratic:
    the default max_bucket_size caps drop the degenerate bucket (the
    documented pipeline order collapses exact dups first)."""
    from lucene_1_spark.pipeline.dedup import simhash_near_dups
    from lucene_1_spark.pipeline.similarity import embedding_near_dup_pairs

    boiler = [(i, "same boilerplate text repeated everywhere") for i in range(40)]
    base = " ".join(f"w{j}" for j in range(30))
    extra = [(100, base + " tail_one"), (101, base + " tail_two")]
    d = spark.createDataFrame(boiler + extra, "doc_id long, text string")
    # cap smaller than the cluster: its bucket is dropped entirely,
    # the small near-dup pair elsewhere survives
    pairs = simhash_near_dups(d, max_bucket_size=10).collect()
    ids = {i for r in pairs for i in (r["doc_a"], r["doc_b"])}
    assert not (ids & set(range(40)))          # degenerate cluster dropped
    assert (100, 101) in {(r["doc_a"], r["doc_b"]) for r in pairs}
    # uncapped: the cluster pairs quadratically (sanity of the guard)
    n_uncapped = simhash_near_dups(d, max_bucket_size=None).count()
    assert n_uncapped >= 40 * 39 / 2

    vecs = [(i, [1.0, 0.0, 0.0, 0.0]) for i in range(40)] \
        + [(100, [0.0, 1.0, 0.0, 0.0]), (101, [0.0, 0.999, 0.01, 0.0])]
    e = spark.createDataFrame(vecs, "vec_id long, embedding array<double>")
    ep = embedding_near_dup_pairs(e, threshold=0.9, bits=4, dim=4,
                                  max_bucket_size=10).collect()
    eids = {i for r in ep for i in (r["id_a"], r["id_b"])}
    assert not (eids & set(range(40)))
    assert {(r["id_a"], r["id_b"]) for r in ep} == {(100, 101)}


def test_ngram_jaccard_default_cap_on(docs):
    """Library default for max_shingle_df is now the 10k hot-shingle
    cap (no behavior change on small corpora)."""
    import inspect
    from lucene_1_spark.pipeline.dedup import ngram_jaccard_pairs
    sig = inspect.signature(ngram_jaccard_pairs)
    assert sig.parameters["max_shingle_df"].default == 10_000
    assert ngram_jaccard_pairs(docs, n=3, threshold=0.5).count() > 0


def test_lm_perplexity_brute_force(spark):
    """CCNet-style bigram LM perplexity == a pure-Python recount;
    repetitive text scores LOWER perplexity than diverse text."""
    import math
    from collections import Counter

    from lucene_1_spark.pipeline.textstats import lm_perplexity
    rows = [(0, "a b a b a b"), (1, "a b c d e f"), (2, "z z z"), (3, "q")]
    df = spark.createDataFrame(rows, "doc_id long, text string")
    got = {r["doc_id"]: r["perplexity"] for r in lm_perplexity(df).collect()}
    big, uni = Counter(), Counter()
    toks = {i: t.split() for i, t in rows}
    for ts in toks.values():
        for a, b in zip(ts, ts[1:]):
            big[(a, b)] += 1
            uni[a] += 1
    v = len(uni)
    for i, ts in toks.items():
        bs = list(zip(ts, ts[1:]))
        if not bs:
            assert i not in got
            continue
        lps = [math.log((big[(a, b)] + 1) / (uni[a] + v)) for a, b in bs]
        assert abs(got[i] - round(math.exp(-sum(lps) / len(lps)), 4)) < 1e-9
    assert got[0] < got[1]  # repetition -> lower perplexity


def test_perturbation_probe_sequence():
    """Multi-probe LSH perturbation sets (Lv et al., VLDB 2007): the
    generated probe buckets must be the `budget` distinct non-identity
    bit-flip sets with the smallest summed squared margins, in order —
    checked against brute-force subset enumeration."""
    import itertools

    import numpy as np

    from lucene_1_spark.pipeline.similarity import _perturbation_probes

    rng = np.random.RandomState(3)
    for _ in range(20):
        bits = int(rng.randint(3, 9))
        qsig = int(rng.randint(0, 1 << bits))
        margins = rng.uniform(0.01, 2.0, size=bits)
        budget = int(rng.randint(1, min(12, (1 << bits) - 1)))
        got = _perturbation_probes(qsig, margins, budget)
        # brute force: every nonempty subset, by cost
        subsets = []
        for r in range(1, bits + 1):
            for s in itertools.combinations(range(bits), r):
                cost = float(sum(margins[i] ** 2 for i in s))
                sig = qsig
                for i in s:
                    sig ^= 1 << i
                subsets.append((cost, sig))
        subsets.sort()
        want_costs = [c for (c, _) in subsets[:budget]]
        got_costs = []
        cost_of = {}
        for (c, sig) in subsets:
            cost_of.setdefault(sig, c)
        got_costs = [cost_of[sig] for sig in got]
        assert len(got) == budget
        assert len(set(got)) == budget
        assert qsig not in got
        # same multiset of costs as the true budget-cheapest subsets
        assert np.allclose(sorted(got_costs), want_costs)
        # emitted in nondecreasing cost order
        assert all(a <= b + 1e-12 for a, b in zip(got_costs, got_costs[1:]))


def test_ann_serving_policy_router(spark):
    """VERDICT r5 #4: nothing routed callers away from IVF on
    unclustered vectors (0.52 recall, silently).  The serving router
    prices the quantizer via ivf_quality and must pick LSH on
    adversarial/random vectors and IVF on clustered ones."""
    import numpy as np
    from lucene_1_spark.pipeline.similarity import (ann_serving_topk,
                                                    choose_ann_route,
                                                    cosine_topk,
                                                    ivf_fit, ivf_quality)
    # adversarial: unit Gaussians, no cluster structure (64-dim, the
    # bench fixture shape — the adaptive threshold must separate the
    # no-structure baseline sqrt(2 ln C / d) from real clusters)
    rng = np.random.RandomState(11)
    rand = spark.createDataFrame(
        [(i, [float(x) for x in v]) for i, v in
         enumerate(rng.normal(size=(300, 64)))],
        "vec_id long, embedding array<double>")
    clus = _clustered_embeddings(spark, dim=64)
    c_rand = ivf_fit(rand, n_centroids=8, iters=2)
    c_clus = ivf_fit(clus, n_centroids=8, iters=2)
    q_rand = ivf_quality(rand, c_rand)
    q_clus = ivf_quality(clus, c_clus)
    assert q_clus > q_rand
    assert choose_ann_route(rand, c_rand, quality=q_rand) == "lsh"
    assert choose_ann_route(clus, c_clus, quality=q_clus) == "ivf"
    assert choose_ann_route(rand, None) == "lsh"
    # the routed result on the adversarial fixture is the LSH path:
    # recall vs exact must not collapse to IVF's ~0.5 floor
    qv = [float(x) for x in rng.normal(size=32)]
    exact = {r["vec_id"] for r in cosine_topk(rand, qv, 10).collect()}
    served = {r["vec_id"] for r in ann_serving_topk(
        rand, qv, 10, centroids=c_rand, quality=q_rand).collect()}
    assert len(exact & served) / 10 >= 0.9


def test_lsh_persisted_index_serving(spark, tmp_path):
    """lsh_assign (the ivf_assign analog): persisted long-form
    (table, bucket) index, written partitionBy('table','bucket').
    Probing it (1) is PARTITION-PRUNED — the scan plan shows
    PartitionFilters on the probed buckets, no signature full-scan —
    and (2) returns results IDENTICAL to the full-scan ann_topk at
    equal (bits, tables, multiprobe, seed), so recall is unchanged."""
    import numpy as np
    from lucene_1_spark.pipeline.similarity import (
        ann_serving_topk, ann_topk, lsh_assign, lsh_index_topk)

    rng = np.random.RandomState(5)
    emb = spark.createDataFrame(
        [(i, [float(x) for x in v]) for i, v in
         enumerate(rng.normal(size=(400, 16)))],
        "vec_id long, embedding array<double>")
    path = str(tmp_path / "lsh_idx")
    lsh_assign(emb, dim=16, bits=6, tables=4) \
        .write.partitionBy("table", "bucket").parquet(path)
    back = spark.read.parquet(path)
    qv = [float(x) for x in rng.normal(size=16)]
    kw = dict(bits=6, tables=4, multiprobe=4)
    full = [(r["vec_id"], r["cosine"]) for r in
            ann_topk(emb, qv, 10, **kw).collect()]
    served = [(r["vec_id"], r["cosine"]) for r in
              lsh_index_topk(back, qv, 10, **kw).collect()]
    assert served == full and len(full) == 10
    # plan: the probe reads only the probed (table,bucket) partitions
    plan = lsh_index_topk(back, qv, 10, **kw)._jdf.queryExecution() \
        .executedPlan().toString()
    assert "PartitionFilters: [" in plan
    assert "(table" in plan and "(bucket" in plan or \
        "table#" in plan.split("PartitionFilters: [", 1)[1][:400]
    # id-only index: semi-join fetch path gives the same answer
    path2 = str(tmp_path / "lsh_idx_ids")
    lsh_assign(emb, dim=16, bits=6, tables=4, include_vec=False) \
        .write.partitionBy("table", "bucket").parquet(path2)
    back2 = spark.read.parquet(path2)
    served2 = [(r["vec_id"], r["cosine"]) for r in
               lsh_index_topk(back2, qv, 10, embeddings=emb,
                              **kw).collect()]
    assert served2 == full
    # router: no centroids + lsh_index -> the pruned path, same answer
    routed = [(r["vec_id"], r["cosine"]) for r in
              ann_serving_topk(emb, qv, 10, centroids=None,
                               lsh_index=back, **kw).collect()]
    assert routed == full


def test_hnsw_recall_and_determinism(spark):
    """Per-partition HNSW (Lucene99HnswVectorsFormat's per-segment
    model): recall@10 vs exact cosine >= 0.9 on BOTH the clustered
    and the adversarial random fixtures; the hash-derived level
    assignment makes the graph deterministic (two builds identical)."""
    import numpy as np
    from lucene_1_spark.pipeline.hnsw import hnsw_build, hnsw_search
    from lucene_1_spark.pipeline.similarity import cosine_topk

    def recall(emb, n_queries=5):
        g = hnsw_build(emb, m=8, ef_construction=64, n_partitions=4)
        g = g.persist()
        g.count()
        qs = {r["vec_id"]: [float(x) for x in r["embedding"]]
              for r in emb.filter(F.col("vec_id") < n_queries).collect()}
        tot = 0.0
        for qid, qv in qs.items():
            exact = {r["vec_id"] for r in
                     cosine_topk(emb, qv, 10).collect()}
            approx = {r["vec_id"] for r in
                      hnsw_search(g, qv, 10, ef=64).collect()}
            tot += len(exact & approx) / 10
        g.unpersist()
        return tot / len(qs)

    clus = _clustered_embeddings(spark)
    assert recall(clus) >= 0.9
    rng = np.random.RandomState(3)
    rand = spark.createDataFrame(
        [(i, [float(x) for x in v]) for i, v in
         enumerate(rng.normal(size=(400, 24)))],
        "vec_id long, embedding array<double>")
    assert recall(rand) >= 0.9
    # determinism: identical graphs across builds
    g1 = hnsw_build(clus, m=8, ef_construction=32, n_partitions=2) \
        .orderBy("vec_id").collect()
    g2 = hnsw_build(clus, m=8, ef_construction=32, n_partitions=2) \
        .orderBy("vec_id").collect()
    assert [(r["vec_id"], r["level"], r["nbrs"]) for r in g1] == \
           [(r["vec_id"], r["level"], r["nbrs"]) for r in g2]


def test_hnsw_large_graph_and_lazy_distances(spark):
    """The two round-6 search-kernel guarantees: (1) a single-partition
    graph LARGER than the Arrow batch cap (10k rows, session.py) is
    searched whole — the old mapInPandas kernel fragmented it across
    batches and KeyError'd on cross-fragment neighbor ids; (2) distance
    evaluations are lazy: the per-graph dist_evals counter stays far
    below the node count (sublinear work — the point of HNSW)."""
    import numpy as np
    from lucene_1_spark.pipeline.hnsw import hnsw_build, hnsw_search

    rng = np.random.RandomState(7)
    n, dim = 11000, 8
    vecs = rng.normal(size=(n, dim))
    emb = spark.createDataFrame(
        [(i, [float(x) for x in vecs[i]]) for i in range(n)],
        "vec_id long, embedding array<double>")
    g = hnsw_build(emb, m=8, ef_construction=32, n_partitions=1) \
        .persist()
    assert g.count() == n
    qv = [float(x) for x in vecs[42]]
    res = hnsw_search(g, qv, 10, ef=48, with_stats=True).collect()
    assert len(res) == 10
    # the query IS node 42's vector: exact match must surface first
    assert res[0]["vec_id"] == 42 and res[0]["score"] > 0.999
    evals, size = res[0]["dist_evals"], res[0]["graph_size"]
    assert size == n
    # sublinear: beam ef=48 on m=8 visits O(ef*M*levels) nodes
    assert evals < n / 5, f"dist_evals {evals} not << {n}"
    g.unpersist()


def test_scalar_quantize_roundtrip_and_column_parity(spark):
    """int8 scalar quantization (Lucene99ScalarQuantizedVectorsFormat
    analog, pipeline/quantize.py): (1) decode error per dim is bounded
    by half a quantization step; (2) the JVM column encoder produces
    byte-identical codes to the numpy mirror."""
    import numpy as np
    from lucene_1_spark.pipeline.quantize import (
        scalar_quantize_fit, quantize_np, dequantize_np, quantize_col)

    rng = np.random.RandomState(11)
    vecs = rng.normal(size=(200, 16))
    emb = spark.createDataFrame(
        [(i, [float(x) for x in vecs[i]]) for i in range(len(vecs))],
        "vec_id long, embedding array<double>")
    mn, mx = scalar_quantize_fit(emb)
    assert mn.shape == (16,) and np.all(mx >= mn)
    q = quantize_np(vecs, mn, mx)
    assert q.dtype == np.int8
    dec = dequantize_np(q.astype(np.float64), mn, mx)
    unit = vecs / np.linalg.norm(vecs, axis=1, keepdims=True)
    step = (mx - mn) / 255.0
    assert np.all(np.abs(dec - unit) <= step / 2 + 1e-9)
    # JVM column parity with the numpy mirror
    got = (emb.select("vec_id", quantize_col("embedding", mn, mx)
                      .alias("q")).orderBy("vec_id").collect())
    jvm = np.asarray([r["q"] for r in got], dtype=np.int8)
    assert np.array_equal(jvm, q)


def test_hnsw_quantized_recall_and_size(spark, tmp_path):
    """Quantized HNSW (Lucene99HnswScalarQuantizedVectorsFormat
    analog): (1) recall@10 with int8 vectors + full-precision rescore
    >= 0.95x the unquantized recall on BOTH fixtures; (2) the stored
    vector column is >= 4x smaller on disk; (3) with rescore= the
    final scores are EXACT cosine (match the base table to 1e-12)."""
    import numpy as np
    from lucene_1_spark.pipeline.hnsw import hnsw_build, hnsw_search
    from lucene_1_spark.pipeline.quantize import scalar_quantize_fit
    from lucene_1_spark.pipeline.similarity import cosine_topk

    def recalls(emb, n_queries=5):
        mn, mx = scalar_quantize_fit(emb)
        g = hnsw_build(emb, m=8, ef_construction=64,
                       n_partitions=4).persist()
        gq = hnsw_build(emb, m=8, ef_construction=64, n_partitions=4,
                        quant=(mn, mx)).persist()
        g.count(), gq.count()
        qs = {r["vec_id"]: [float(x) for x in r["embedding"]]
              for r in emb.filter(F.col("vec_id") < n_queries).collect()}
        tot_f, tot_q = 0.0, 0.0
        for qid, qv in qs.items():
            exact = {r["vec_id"] for r in cosine_topk(emb, qv, 10).collect()}
            full = {r["vec_id"] for r in hnsw_search(g, qv, 10, ef=64).collect()}
            quant = {r["vec_id"] for r in
                     hnsw_search(gq, qv, 10, ef=64, quant=(mn, mx),
                                 rescore=emb).collect()}
            tot_f += len(exact & full) / 10
            tot_q += len(exact & quant) / 10
        g.unpersist(); gq.unpersist()
        return tot_f / len(qs), tot_q / len(qs), gq, (mn, mx)

    clus = _clustered_embeddings(spark)
    rf, rq, _, _ = recalls(clus)
    assert rq >= 0.95 * rf, f"quantized recall {rq} < 0.95*{rf}"
    rng = np.random.RandomState(5)
    rand = spark.createDataFrame(
        [(i, [float(x) for x in v]) for i, v in
         enumerate(rng.normal(size=(400, 24)))],
        "vec_id long, embedding array<double>")
    rf2, rq2, _, _ = recalls(rand)
    assert rq2 >= 0.95 * rf2, f"quantized recall {rq2} < 0.95*{rf2}"

    # storage: vector column >= 4x smaller on disk (parquet)
    mn, mx = scalar_quantize_fit(rand)
    g = hnsw_build(rand, m=8, ef_construction=32, n_partitions=2)
    gq = hnsw_build(rand, m=8, ef_construction=32, n_partitions=2,
                    quant=(mn, mx))
    pf, pq = str(tmp_path / "full"), str(tmp_path / "quant")
    g.select("vec").write.mode("overwrite").parquet(pf)
    gq.select("vec_q").write.mode("overwrite").parquet(pq)

    def _bytes(p):
        import os
        return sum(os.path.getsize(os.path.join(r, f))
                   for r, _, fs in os.walk(p) for f in fs
                   if f.endswith(".parquet"))
    bf, bq = _bytes(pf), _bytes(pq)
    assert bf >= 4 * bq, f"full {bf}B not >= 4x quantized {bq}B"

    # exact rescore: returned scores == exact cosine from the base table
    qv = [float(x) for x in rand.filter(F.col("vec_id") == 7)
          .first()["embedding"]]
    gqp = gq.persist(); gqp.count()
    got = {r["vec_id"]: r["score"] for r in
           hnsw_search(gqp, qv, 10, ef=64, quant=(mn, mx),
                       rescore=rand).collect()}
    base = {r["vec_id"]: np.asarray(r["embedding"]) for r in rand.collect()}
    qn = np.asarray(qv) / np.linalg.norm(qv)
    for vid, s in got.items():
        exact = float(base[vid] @ qn / np.linalg.norm(base[vid]))
        assert abs(s - exact) < 1e-12
    gqp.unpersist()


def test_ivf_quantized_full_probe_with_rescore_equals_exact(spark):
    """int8-quantized IVF posting lists + full-precision rescore: a
    full probe (nprobe = n_centroids) with rescore= must reproduce the
    exact cosine top-k bit-for-bit, and the assigned table must carry
    NO float vector column (storage actually shrank)."""
    from lucene_1_spark.pipeline.similarity import (
        cosine_topk, ivf_ann_topk, ivf_assign, ivf_fit)
    from lucene_1_spark.pipeline.quantize import scalar_quantize_fit
    e = _clustered_embeddings(spark)
    qv = [float(x) for x in e.filter("vec_id = 7").first()["embedding"]]
    cents = ivf_fit(e, n_centroids=8, iters=2)
    mn, mx = scalar_quantize_fit(e)
    assigned = ivf_assign(e, cents, quant=(mn, mx))
    assert "embedding" not in assigned.columns
    assert "vec_q" in assigned.columns
    assert dict(assigned.dtypes)["vec_q"] == "array<tinyint>"
    exact = [(r["vec_id"], r["cosine"])
             for r in cosine_topk(e, qv, k=10).collect()]
    got = [(r["vec_id"], r["cosine"])
           for r in ivf_ann_topk(e, qv, cents, k=10, nprobe=8,
                                 assigned=assigned, quant=(mn, mx),
                                 rescore=e).collect()]
    assert got == exact
    # without rescore the scores are approximate but ids still overlap
    approx = {r["vec_id"] for r in
              ivf_ann_topk(e, qv, cents, k=10, nprobe=8,
                           assigned=assigned, quant=(mn, mx)).collect()}
    assert len(approx & {i for i, _ in exact}) >= 9
