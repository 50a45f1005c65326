"""Dedup & similarity tests: kernel properties (minhash unbiasedness,
simhash locality, plane determinism) and Spark end-to-end recall/precision on
planted near-duplicates, with the exact n-gram Jaccard as in-test oracle."""

import numpy as np
import pytest

from sgp_sketch import dedup


# ================================================================ kernels

def test_minhash_identical_docs_identical_sigs():
    a = np.arange(50, dtype=np.int64)
    sigs = dedup.minhash_batch([a, a.copy()], k=64)
    np.testing.assert_array_equal(sigs[0], sigs[1])


def test_minhash_estimates_jaccard():
    rng = np.random.default_rng(5)
    for overlap in (0.2, 0.5, 0.8):
        shared = rng.choice(1 << 40, size=int(400 * overlap), replace=False)
        only_a = rng.choice(1 << 40, size=400 - shared.size, replace=False)
        only_b = rng.choice(1 << 40, size=400 - shared.size, replace=False)
        a = np.concatenate([shared, only_a]).astype(np.int64)
        b = np.concatenate([shared, only_b]).astype(np.int64)
        true_j = shared.size / (2 * 400 - shared.size)
        sigs = dedup.minhash_batch([a, b], k=256)
        est = float((sigs[0] == sigs[1]).mean())
        # k=256 ⇒ se = sqrt(j(1-j)/256) ≤ 0.032; 4σ tolerance
        assert abs(est - true_j) < 0.13, (overlap, est, true_j)


def test_minhash_empty_doc():
    sigs = dedup.minhash_batch([np.empty(0, dtype=np.int64),
                                np.arange(3, dtype=np.int64)], k=16)
    assert (sigs[0] == dedup._EMPTY_SENTINEL).all()
    assert not (sigs[1] == dedup._EMPTY_SENTINEL).all()


def test_simhash_locality():
    rng = np.random.default_rng(9)
    base = rng.choice(1 << 40, size=300, replace=False).astype(np.int64)
    near = base.copy()
    near[:15] = rng.choice(1 << 40, size=15)  # 5% token churn
    far = rng.choice(1 << 40, size=300, replace=False).astype(np.int64)
    fps = dedup.simhash_batch([base, near, far, base])
    ham = lambda x, y: bin(int(x) ^ int(y)).count("1")
    assert ham(fps[0], fps[3]) == 0
    assert ham(fps[0], fps[1]) < ham(fps[0], fps[2])
    assert ham(fps[0], fps[1]) <= 10


def test_hyperplane_signature_deterministic():
    v = np.random.default_rng(1).standard_normal((20, 64))
    s1 = dedup.hyperplane_signature(v, 16, seed=7)
    s2 = dedup.hyperplane_signature(v.copy(), 16, seed=7)
    np.testing.assert_array_equal(s1, s2)
    assert (dedup.hyperplane_signature(v, 16, seed=8) != s1).any()


# ================================================================== Spark

@pytest.fixture(scope="module")
def planted_docs(spark):
    """60 random-word docs + 3 near-dup clones of doc 0 + 1 exact clone."""
    rng = np.random.default_rng(17)
    vocab = [f"w{i}" for i in range(500)]
    rows = []
    for i in range(60):
        words = rng.choice(vocab, size=40).tolist()
        rows.append((i, " ".join(words)))
    base = rows[0][1].split(" ")
    for j, churn in enumerate((2, 4, 6)):
        words = list(base)
        for c in range(churn):
            words[5 + 3 * c] = f"alt{j}_{c}"
        rows.append((100 + j, " ".join(words)))
    rows.append((200, rows[0][1]))
    return spark.createDataFrame(rows, "doc_id long, text string")


def test_minhash_finds_planted_near_dups(spark, planted_docs):
    got = dedup.minhash_near_duplicates(planted_docs, threshold=0.5).toPandas()
    pairs = set(map(tuple, got[["doc_a", "doc_b"]].values.tolist()))
    assert (0, 200) in pairs           # exact clone: jaccard 1.0
    assert (0, 100) in pairs           # 2-word churn clone
    # no random-pair false positives at this threshold
    assert all(a in (0, 100, 101, 102, 200) and b in (0, 100, 101, 102, 200)
               for a, b in pairs)


def test_minhash_matches_exact_jaccard_oracle(spark, planted_docs):
    exact = dedup.ngram_jaccard_pairs(planted_docs, min_jaccard=0.6).toPandas()
    est = dedup.minhash_near_duplicates(planted_docs, threshold=0.4).toPandas()
    exact_pairs = set(map(tuple, exact[["doc_a", "doc_b"]].values.tolist()))
    est_pairs = set(map(tuple, est[["doc_a", "doc_b"]].values.tolist()))
    assert exact_pairs <= est_pairs    # full recall of the high-sim pairs
    for _, r in est.iterrows():
        ex = exact[(exact.doc_a == r.doc_a) & (exact.doc_b == r.doc_b)]
        if len(ex):
            assert abs(r.est_jaccard - ex.jaccard.iloc[0]) < 0.2


def test_simhash_finds_exact_clone(spark, planted_docs):
    toks = planted_docs.selectExpr(
        "doc_id", "transform(split(text, ' '), w -> xxhash64(w)) AS tokens")
    got = dedup.simhash_near_duplicates(toks, max_hamming=8).toPandas()
    pairs = set(map(tuple, got[["doc_a", "doc_b"]].values.tolist()))
    assert (0, 200) in pairs
    assert got[(got.doc_a == 0) & (got.doc_b == 200)].hamming.iloc[0] == 0


@pytest.fixture(scope="module")
def planted_vectors(spark):
    rng = np.random.default_rng(23)
    rows = []
    for i in range(80):
        v = rng.standard_normal(32)
        rows.append((i, (v / np.linalg.norm(v)).tolist()))
    base = np.asarray(rows[0][1])
    near = base + 0.05 * rng.standard_normal(32)
    rows.append((500, (near / np.linalg.norm(near)).tolist()))
    return spark.createDataFrame(rows, "vec_id long, embedding array<double>")


def test_embedding_near_duplicates(spark, planted_vectors):
    got = dedup.embedding_near_duplicates(planted_vectors,
                                          threshold=0.95).toPandas()
    pairs = set(map(tuple, got[["id_a", "id_b"]].values.tolist()))
    assert (0, 500) in pairs


def test_ann_lsh_finds_planted_neighbor(spark, planted_vectors):
    q = np.asarray(
        planted_vectors.filter("vec_id = 0").collect()[0]["embedding"])
    got = dedup.ann_topk_lsh(planted_vectors.filter("vec_id <> 0"), q,
                             k=3).toPandas()
    assert got.vec_id.iloc[0] == 500
    assert got.cosine.iloc[0] > 0.95


def test_ivf_ann(spark, planted_vectors):
    from sgp_sketch.dedup import ann_topk_ivf, ivf_assign, ivf_centroids

    C = ivf_centroids(planted_vectors, n_lists=8)
    assert C.shape == (8, 32)
    # assignment covers every vector, deterministic
    a1 = ivf_assign(planted_vectors, C).toPandas()
    a2 = ivf_assign(planted_vectors, C).toPandas()
    assert (a1.sort_values("vec_id").list_id.to_numpy()
            == a2.sort_values("vec_id").list_id.to_numpy()).all()
    q = np.asarray(
        planted_vectors.filter("vec_id = 0").collect()[0]["embedding"])
    got = ann_topk_ivf(planted_vectors.filter("vec_id <> 0"), q, C,
                       k=3, n_probe=3).toPandas()
    assert got.vec_id.iloc[0] == 500          # planted near-duplicate found
    assert got.cosine.iloc[0] > 0.95


def test_simhash_max_hamming_guard():
    """Radii the chunk scheme can't serve with full recall are rejected,
    not silently under-recalled."""
    import pytest

    # validation fires before any Spark work (df may be anything)
    with pytest.raises(ValueError, match="max_hamming"):
        dedup.simhash_near_duplicates(None, max_hamming=16)
    with pytest.raises(ValueError, match="max_hamming"):
        dedup.simhash_near_duplicates(None, max_hamming=-1)


def test_simhash_pigeonhole_recall_radius_5(spark):
    """With max_hamming=5 the derived 6-chunk bucketing must catch a pair
    at hamming exactly 5 — the radius the old fixed 4x16 scheme lost."""
    from pyspark.sql import functions as F

    # two fingerprints differing in exactly 5 bits, one per 12-bit chunk
    # region for 5 of the 6 chunks — no chunk-collision shortcut except
    # the untouched one (pigeonhole's worst case)
    base = np.uint64(0x0123456789ABCDEF)
    flipped = base
    for b in (0, 13, 26, 39, 52):  # five different 12-bit chunks
        flipped = flipped ^ (np.uint64(1) << np.uint64(b))
    fps = spark.createDataFrame(
        [(1, [0], int(np.int64(base.view(np.int64)))),
         (2, [0], int(np.int64(flipped.view(np.int64))))],
        "doc_id long, tokens array<long>, simhash long")
    # drive the bucketing path with crafted fingerprints: bypass the
    # fingerprint stage, keep everything downstream real
    import sgp_sketch.dedup as D

    orig = D.simhash_fingerprints
    try:
        D.simhash_fingerprints = lambda df, *a, **k: fps
        got = D.simhash_near_duplicates(fps, max_hamming=5).collect()
    finally:
        D.simhash_fingerprints = orig
    assert [(r.doc_a, r.doc_b, r.hamming) for r in got] == [(1, 2, 5)]


def test_lsh_dropped_bucket_stats(spark, planted_docs):
    """max_bucket capping reports (dropped_rows, max_bucket_size) through
    the stats dict instead of losing recall silently."""
    m = {}
    dedup.minhash_near_duplicates(planted_docs, threshold=0.4,
                                  max_bucket=1, stats=m)
    assert m["dropped_rows"] > 0          # clone buckets exceed cap=1
    assert m["max_bucket_size"] >= 2


def test_ivf_indexed_matches_inline(spark, planted_vectors):
    """Persisted IVF index (partitionBy list_id) must return the same
    top-k as the inline path, and the probe plan must show PartitionFilters
    (storage-level pruning, not a post-scan filter)."""
    import tempfile

    from pyspark.sql import functions as F

    C = dedup.ivf_centroids(planted_vectors, n_lists=4)
    q = planted_vectors.filter("vec_id = 0").collect()[0]["embedding"]
    base = planted_vectors.filter("vec_id <> 0")
    inline = dedup.ann_topk_ivf(base, q, C, k=5, n_probe=2).collect()

    path = tempfile.mkdtemp(prefix="ivf_idx_") + "/index"
    dedup.ivf_write_index(base, C, path)
    indexed = dedup.ann_topk_ivf_indexed(spark, path, q, C, k=5,
                                         n_probe=2).collect()
    assert [(r.vec_id, r.cosine) for r in indexed] == \
           [(r.vec_id, r.cosine) for r in inline]
    plan = (spark.read.parquet(path).filter(F.col("list_id").isin([0, 1]))
            ._jdf.queryExecution().executedPlan().toString())
    assert "PartitionFilters: [list_id" in plan


def test_pq_encode_shape_and_partition_invariance(spark, planted_vectors):
    from sgp_sketch.dedup import pq_encode, pq_train

    B = pq_train(planted_vectors, m=8, ksub=16)
    assert B.shape == (8, 16, 4)
    a = pq_encode(planted_vectors, B).toPandas().sort_values("vec_id")
    b = (pq_encode(planted_vectors.repartition(7), B)
         .toPandas().sort_values("vec_id"))
    for ca, cb in zip(a.code, b.code):
        assert list(ca) == list(cb)
        assert len(ca) == 8 and all(0 <= c < 16 for c in ca)


def test_pq_train_rejects_indivisible_dim(spark, planted_vectors):
    import pytest

    from sgp_sketch.dedup import pq_train

    with pytest.raises(ValueError):
        pq_train(planted_vectors, m=5)


def test_ann_pq_finds_planted_neighbor(spark, planted_vectors):
    """ADC ranking over 8-byte codes + exact rerank recovers the planted
    near-duplicate of vector 0 at rank 1."""
    from sgp_sketch.dedup import ann_topk_pq, pq_train

    B = pq_train(planted_vectors, m=8, ksub=16)
    q = np.asarray(
        planted_vectors.filter("vec_id = 0").collect()[0]["embedding"])
    got = ann_topk_pq(planted_vectors.filter("vec_id <> 0"), q, B,
                      k=3).toPandas()
    assert got.vec_id.iloc[0] == 500
    assert got.cosine.iloc[0] > 0.95


def test_ann_pq_recall_vs_bruteforce(spark, planted_vectors):
    """Top-5 ADC+rerank vs exact cosine top-5: >=4/5 overlap on the
    80-vector corpus (rerank window absorbs ADC quantization error)."""
    from pyspark.sql import functions as F

    from sgp_sketch.dedup import ann_topk_pq, pq_train

    base = planted_vectors.filter("vec_id <> 0")
    q = np.asarray(
        planted_vectors.filter("vec_id = 0").collect()[0]["embedding"])
    B = pq_train(planted_vectors, m=8, ksub=16)
    approx = set(ann_topk_pq(base, q, B, k=5).toPandas().vec_id)
    qlit = F.array(*[F.lit(float(v)) for v in q])
    dot = F.aggregate(F.zip_with("embedding", qlit, lambda p, qq: p * qq),
                      F.lit(0.0).cast("double"), lambda acc, v: acc + v)
    nrm = F.sqrt(F.aggregate(F.col("embedding"),
                             F.lit(0.0).cast("double"),
                             lambda acc, v: acc + v * v))
    exact = set(base.select("vec_id", (dot / nrm).alias("c"))
                .orderBy(F.desc("c"), "vec_id").limit(5)
                .toPandas().vec_id)
    assert len(approx & exact) >= 4


def test_semantic_dedup_drops_planted_near_duplicate(spark, planted_vectors):
    """Vector 500 (cosine ~0.99 with vector 0) shares 0's cluster and is
    dropped; 0 (the min-id representative) and the unrelated random
    vectors are kept; every input row appears exactly once."""
    from sgp_sketch.dedup import ivf_centroids, semantic_dedup

    C = ivf_centroids(planted_vectors, n_lists=4)
    got = semantic_dedup(planted_vectors, C, threshold=0.95).toPandas()
    assert len(got) == planted_vectors.count()
    by_id = got.set_index("vec_id")
    assert not by_id.loc[500, "is_kept"]
    assert by_id.loc[0, "is_kept"]
    assert by_id.is_kept.sum() == len(got) - 1   # only the plant dropped


def test_semantic_dedup_capped_cluster_keeps_members(spark, planted_vectors):
    """A cluster over max_cluster is exempted from comparison: all its
    members stay kept, and the stats dict records the dropped rows."""
    from sgp_sketch.dedup import ivf_centroids, semantic_dedup

    C = ivf_centroids(planted_vectors, n_lists=1)
    stats = {}
    got = semantic_dedup(planted_vectors, C, threshold=0.95,
                         max_cluster=10, stats=stats).toPandas()
    assert got.is_kept.all()
    assert stats["dropped_rows"] == len(got)
    assert stats["max_bucket_size"] == len(got)


def test_ann_ivfpq_finds_planted_neighbor(spark, planted_vectors, tmp_path):
    """Persisted IVF-PQ index: partition-pruned probe + ADC + rerank
    still puts the planted near-duplicate of vector 0 at rank 1, and the
    probe's scan carries list_id PartitionFilters."""
    from sgp_sketch.dedup import (ann_topk_ivfpq, ivf_centroids,
                                  ivfpq_write_index, pq_train)

    C = ivf_centroids(planted_vectors, n_lists=4)
    B = pq_train(planted_vectors, m=8, ksub=16)
    path = str(tmp_path / "ivfpq")
    ivfpq_write_index(planted_vectors.filter("vec_id <> 0"), C, B, path)
    q = np.asarray(
        planted_vectors.filter("vec_id = 0").collect()[0]["embedding"])
    res = ann_topk_ivfpq(spark, path, q, C, B, k=3, n_probe=2)
    plan = res._jdf.queryExecution().executedPlan().toString()
    assert "PartitionFilters" in plan and "list_id" in plan
    got = res.toPandas()
    assert got.vec_id.iloc[0] == 500
    assert got.cosine.iloc[0] > 0.95


def test_pq_train_shrinks_codebook_below_sample_size(spark):
    """Fewer sampled vectors than ksub: codebooks shrink to the sample
    size instead of crashing (mirrors ivf_centroids' behavior)."""
    from sgp_sketch.dedup import ann_topk_pq, pq_train

    rng = np.random.default_rng(5)
    rows = [(i, rng.standard_normal(16).tolist()) for i in range(6)]
    df = spark.createDataFrame(rows, "vec_id long, embedding array<double>")
    B = pq_train(df, m=4, ksub=16)
    assert B.shape == (4, 6, 4)
    got = ann_topk_pq(df.filter("vec_id <> 0"),
                      np.asarray(rows[0][1]), B, k=2).toPandas()
    assert len(got) == 2


def test_null_embedding_raises_clear_error(spark):
    import pytest

    from sgp_sketch.dedup import ivf_assign, ivf_centroids

    df = spark.createDataFrame(
        [(0, [1.0, 2.0]), (1, None)], "vec_id long, embedding array<double>")
    C = ivf_centroids(df.filter("embedding IS NOT NULL"), n_lists=1)
    with pytest.raises(Exception, match="NULL embedding"):
        ivf_assign(df, C).collect()


def test_dedup_exact_normalized_keeps_min_id(spark):
    from sgp_sketch.dedup import dedup_exact_normalized

    rows = [(3, "Hello, World!"), (1, "hello   world"), (2, "other doc")]
    df = spark.createDataFrame(rows, "doc_id long, text string")
    kept = sorted(r.doc_id for r in dedup_exact_normalized(df).collect())
    assert kept == [1, 2]


def test_dedup_normalized_blank_forms_exempt(spark):
    """Docs with no ASCII alphanumerics (and NULL text) normalize to ''
    and must ALL be kept — not folded into one representative."""
    from sgp_sketch.dedup import dedup_exact_normalized

    rows = [(1, "!!!"), (2, "¿¿¿"), (3, "abc"), (4, None)]
    df = spark.createDataFrame(rows, "doc_id long, text string")
    kept = sorted(r.doc_id for r in dedup_exact_normalized(df).collect())
    assert kept == [1, 2, 3, 4]


def test_ngram_jaccard_thresholds_unrounded_value(spark):
    """jaccard = 2/3 = 0.66667 rounds to 0.6667 >= 0.667 — the filter
    must use the unrounded value and exclude the pair."""
    from sgp_sketch.dedup import ngram_jaccard_pairs

    df = spark.createDataFrame(
        [(1, "a b c d e"), (2, "a b c d")], "doc_id long, text string")
    got = ngram_jaccard_pairs(df, min_jaccard=0.667).collect()
    assert got == []
    got = ngram_jaccard_pairs(df, min_jaccard=0.6).collect()
    assert len(got) == 1 and abs(got[0].jaccard - 0.6667) < 1e-9

def test_duplicate_window_stats_known(spark):
    from sgp_sketch.dedup import duplicate_window_stats

    # w=3: doc1 and doc2 share the window "a b c"; doc3 is unique;
    # doc4 is too short to have any window
    rows = [(1, "s1", "a b c d"), (2, "s1", "x a b c"),
            (3, "s2", "p q r s"), (4, "s2", "t u")]
    df = spark.createDataFrame(rows,
                               "doc_id long, source string, text string")
    out = {r.source: r for r in
           duplicate_window_stats(df, w=3).collect()}
    # doc1 windows: abc,bcd; doc2: xab,abc -> 'abc' duplicated
    assert out["s1"].n_windows == 4
    assert out["s1"].n_dup_windows == 2      # one occurrence in each doc
    assert out["s1"].docs_hit == 2
    assert out["s2"].n_windows == 2           # short doc contributes 0
    assert out["s2"].n_dup_windows == 0 and out["s2"].docs_hit == 0


def test_duplicate_window_stats_within_doc_repeat(spark):
    from sgp_sketch.dedup import duplicate_window_stats

    # repetition INSIDE one document also counts (w=2: "a b" x2)
    df = spark.createDataFrame([(1, "s", "a b a b")],
                               "doc_id long, source string, text string")
    r = duplicate_window_stats(df, w=2).collect()[0]
    assert r.n_windows == 3 and r.n_dup_windows == 2 and r.docs_hit == 1

def test_ann_lsh_multiprobe_recall_dominates_single(spark, planted_vectors):
    """Multi-probe must (a) still find the planted neighbor, (b) never
    probe fewer candidates than the single-probe variant (its probe set
    is a superset), and (c) with a deliberately weak index (1 table,
    many planes) recover neighbors single-probe misses — measured as
    recall vs brute-force top-5 over several query points."""
    from pyspark.sql import functions as F

    data = planted_vectors.filter("vec_id <> 0")
    q0 = np.asarray(
        planted_vectors.filter("vec_id = 0").collect()[0]["embedding"])
    got = dedup.ann_topk_lsh_multiprobe(data, q0, k=3,
                                        n_probes=3).toPandas()
    assert got.vec_id.iloc[0] == 500 and got.cosine.iloc[0] > 0.95

    # weak index: recall comparison over 5 queries
    all_rows = planted_vectors.collect()
    vecs = {r["vec_id"]: np.asarray(r["embedding"]) for r in all_rows}

    def brute_top5(q, exclude):
        sims = sorted(((float(v @ q), i) for i, v in vecs.items()
                       if i != exclude), reverse=True)
        return {i for _, i in sims[:5]}

    single_hits = multi_hits = 0
    for qid in (1, 2, 3, 4, 5):
        q = vecs[qid]
        data_q = planted_vectors.filter(f"vec_id <> {qid}")
        kw = dict(k=5, n_planes=4, n_tables=1, seed=11)
        s = set(dedup.ann_topk_lsh(data_q, q, **kw)
                .toPandas().vec_id)
        m = set(dedup.ann_topk_lsh_multiprobe(data_q, q, n_probes=3, **kw)
                .toPandas().vec_id)
        truth = brute_top5(q, qid)
        single_hits += len(s & truth)
        multi_hits += len(m & truth)
    assert multi_hits >= single_hits        # probe superset ⇒ recall ≥
    assert multi_hits > 0


def test_minhash_short_docs_are_not_universal_duplicates(spark):
    """Docs with zero shingles (short/NULL text) share the all-sentinel
    signature; they must not be reported as perfect duplicate pairs."""
    from sgp_sketch.dedup import minhash_near_duplicates

    df = spark.createDataFrame(
        [("a", "the"), ("b", "ok bye"), ("c", None),
         ("d", "one two three four five six seven eight nine ten"),
         ("e", "one two three four five six seven eight nine ten")],
        "doc_id string, text string")
    pairs = minhash_near_duplicates(df, threshold=0.5).collect()
    got = {(r["doc_a"], r["doc_b"]) for r in pairs}
    assert got == {("d", "e")}


def test_simhash_empty_docs_are_not_duplicates(spark):
    from sgp_sketch.dedup import simhash_near_duplicates

    df = spark.createDataFrame(
        [("a", []), ("b", []), ("c", None),
         ("d", list(range(100))), ("e", list(range(100)))],
        "doc_id string, tokens array<long>")
    pairs = simhash_near_duplicates(df, max_hamming=3).collect()
    got = {(r["doc_a"], r["doc_b"]) for r in pairs}
    assert got == {("d", "e")}


def test_lsh_rejects_indivisible_bands(spark):
    from sgp_sketch.dedup import lsh_candidate_pairs

    sig_df = spark.createDataFrame([("a", [1, 2, 3, 4])],
                                   "doc_id string, sig array<long>")
    with pytest.raises(ValueError, match="multiple of bands"):
        lsh_candidate_pairs(sig_df, bands=3, k=4).collect()
    with pytest.raises(ValueError, match="multiple of bands"):
        lsh_candidate_pairs(sig_df, bands=100, k=64).collect()


def test_exact_cosine_pairs_matches_naive_numpy(spark, planted_vectors):
    """Block matmul over partitions ≡ the naive full-matrix computation:
    same pair set, same rounded values, id_a < id_b upper triangle only."""
    got = (dedup.exact_cosine_pairs(planted_vectors, threshold=0.5)
           .toPandas().sort_values(["id_a", "id_b"]))
    pdf = planted_vectors.toPandas()
    ids = pdf["vec_id"].to_numpy()
    X = np.stack([np.asarray(v, dtype=np.float64) for v in pdf["embedding"]])
    Xn = X / np.linalg.norm(X, axis=1, keepdims=True)
    S = Xn @ Xn.T
    want = sorted((int(ids[i]), int(ids[j]), round(float(np.round(S[i, j], 3)), 6))
                  for i in range(len(ids)) for j in range(len(ids))
                  if ids[i] < ids[j] and S[i, j] >= 0.5)
    have = [(int(a), int(b), round(float(c), 6))
            for a, b, c in got.itertuples(index=False)]
    assert have == want
    assert (0, 500) in {(a, b) for a, b, _ in have}  # the planted near-dup
    assert all(a < b for a, b, _ in have)


def test_exact_cosine_pairs_null_and_zero_vectors(spark):
    """NULL embeddings are filtered, zero-norm vectors drop out as NaN —
    never a crash, never a spurious pair."""
    df = spark.createDataFrame(
        [(1, [1.0, 0.0]), (2, [1.0, 0.0]), (3, [0.0, 0.0]), (4, None)],
        "vec_id long, embedding array<double>")
    got = dedup.exact_cosine_pairs(df, threshold=0.9).toPandas()
    assert sorted(map(tuple, got[["id_a", "id_b"]].values.tolist())) == [(1, 2)]


def test_exact_cosine_pairs_blocked_equals_broadcast(spark, planted_vectors):
    """The O(√R)-replication block-pair scheme must be value-identical to
    the broadcast strategy — including pairs whose lo-block member has
    the larger id (the orientation a naive triangle mask would drop)."""
    a = (dedup.exact_cosine_pairs(planted_vectors, threshold=0.4)
         .toPandas().sort_values(["id_a", "id_b"]).reset_index(drop=True))
    for nb in (1, 3, 8):
        b = (dedup.exact_cosine_pairs_blocked(planted_vectors, threshold=0.4,
                                              n_blocks=nb)
             .toPandas().sort_values(["id_a", "id_b"]).reset_index(drop=True))
        assert len(a) == len(b), nb
        assert (a["id_a"] == b["id_a"]).all() and (a["id_b"] == b["id_b"]).all()
        assert (a["cosine"].round(6) == b["cosine"].round(6)).all()


def test_exact_cosine_pairs_blocked_mostly_empty_blocks(spark):
    """3 rows scattered over 8 blocks: most (lo, hi) groups have an empty
    side — the typed empty-frame early return must not break Arrow
    conversion, and no pair may be lost or duplicated."""
    df = spark.createDataFrame(
        [(1, [1.0, 0.0]), (2, [1.0, 0.0]), (9, [0.6, 0.8])],
        "vec_id long, embedding array<double>")
    got = dedup.exact_cosine_pairs_blocked(df, threshold=0.3,
                                           n_blocks=8).toPandas()
    have = sorted((int(a), int(b), float(c))
                  for a, b, c in got.itertuples(index=False))
    assert have == [(1, 2, 1.0), (1, 9, 0.6), (2, 9, 0.6)]
