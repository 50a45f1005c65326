"""Deduplication & similarity operators for training-data pipelines.

Five families over the `documents` / token tables, each Spark-first:

  exact         content-hash groupBy (declarative; see __spark_entry__
                q_dedup_exact)
  n-gram Jaccard  exact pairwise similarity via shingle explode + self-join
                (fully declarative — Catalyst handles it; DuckDB-oracle-able)
  MinHash+LSH   shingle → k minhashes (vectorized numpy over Arrow batches)
                → banded bucket join → candidate pairs → signature-estimated
                Jaccard (JVM zip_with) — the scale path: no all-pairs join
  SimHash       64-bit fingerprints (vectorized bit-count kernel) → chunk
                bucket join → JVM `bit_count(a^b)` Hamming verify
  embedding     random-hyperplane LSH buckets over `array<float>` columns →
                within-bucket cosine; brute-force cosine as the exact oracle

Scale notes (100 TB): the only all-data python hop is one pandas UDF per doc
batch computing signatures (Arrow, numpy-vectorized); candidate generation
is a shuffle on band/bucket hashes whose fan-in is bounded by banding
parameters, never a cross join. Near-duplicate classes produce skewed
buckets (a 10^6-copy boilerplate page lands in one bucket); `max_bucket`
caps the quadratic blowup, and every capping site takes an optional
`stats` dict eagerly filled with (dropped_rows, max_bucket_size) — recall
loss is surfaced, never silent. The same heavy-key
capping idea as routing.py's salting.

Reference tie-in: bucket-join candidate generation is the reference's
hash-bucket routing (EdgeCutSGP.java:122) applied to similarity; the
minhash/simhash kernels reuse the mergeable-update discipline of the sketch
kernels (kernels/hashing.py primitives).
"""

from __future__ import annotations

import numpy as np

from .kernels.hashing import GOLDEN, hash64, splitmix64

_EMPTY_SENTINEL = np.uint64(0xFFFFFFFFFFFFFFFF)


# ================================================================ kernels

def minhash_batch(shingle_arrays, k: int = 64) -> np.ndarray:
    """(n_docs, k) uint64 minhash matrix from a sequence of shingle-hash
    arrays. One vectorized pass per hash function: h_i = splitmix64(x ^
    mix(i·GOLDEN)), doc-wise min via minimum.reduceat."""
    n = len(shingle_arrays)
    lens = np.fromiter((len(a) for a in shingle_arrays), count=n,
                       dtype=np.int64)
    out = np.full((n, k), _EMPTY_SENTINEL, dtype=np.uint64)
    nonempty = lens > 0
    if not nonempty.any():
        return out
    arrs = [np.asarray(a, dtype=np.int64).view(np.uint64)
            for a, ln in zip(shingle_arrays, lens) if ln]
    flat = np.concatenate(arrs)
    ne_lens = lens[nonempty]
    starts = np.zeros(ne_lens.size, dtype=np.int64)
    np.cumsum(ne_lens[:-1], out=starts[1:])
    seeds = splitmix64(np.arange(1, k + 1, dtype=np.uint64) * GOLDEN)
    mins = np.empty((ne_lens.size, k), dtype=np.uint64)
    for i in range(k):
        h = splitmix64(flat ^ seeds[i])
        mins[:, i] = np.minimum.reduceat(h, starts)
    out[nonempty] = mins
    return out


def simhash_batch(token_arrays) -> np.ndarray:
    """uint64 SimHash per doc: for each of 64 bit positions, majority vote of
    the token hashes' bits (Charikar). Vectorized: 64 reduceat passes."""
    n = len(token_arrays)
    lens = np.fromiter((len(a) for a in token_arrays), count=n,
                       dtype=np.int64)
    out = np.zeros(n, dtype=np.uint64)
    nonempty = lens > 0
    if not nonempty.any():
        return out
    arrs = [np.asarray(a, dtype=np.int64).view(np.uint64)
            for a, ln in zip(token_arrays, lens) if ln]
    flat = hash64(np.concatenate(arrs))
    ne_lens = lens[nonempty]
    starts = np.zeros(ne_lens.size, dtype=np.int64)
    np.cumsum(ne_lens[:-1], out=starts[1:])
    fp = np.zeros(ne_lens.size, dtype=np.uint64)
    one = np.uint64(1)
    for b in range(64):
        bits = (flat >> np.uint64(b)) & one
        ones = np.add.reduceat(bits, starts)
        fp |= ((ones * 2 > ne_lens.astype(np.uint64)).astype(np.uint64)
               << np.uint64(b))
    out[nonempty] = fp
    return out


def hyperplane_signature(vectors: np.ndarray, n_planes: int = 16,
                         seed: int = 7) -> np.ndarray:
    """Random-hyperplane LSH bucket ids for a (n, d) float matrix.

    The plane matrix is derived deterministically from `seed` (PCG64), so
    every executor computes identical planes with no broadcast needed.
    """
    d = vectors.shape[1]
    planes = np.random.default_rng(seed).standard_normal((d, n_planes))
    bits = (vectors @ planes) > 0
    weights = (np.uint64(1) << np.arange(n_planes, dtype=np.uint64))
    return (bits.astype(np.uint64) @ weights).astype(np.int64)


# ============================================================ Spark: shingles

def word_shingles(df, text_col: str = "text", n: int = 3,
                  out_col: str = "shingles", token_fn=None):
    """doc → array<long> of hashed word n-gram shingles, entirely JVM-side
    (split → sliding slice → concat_ws → hash); distinct per doc.

    `token_fn` maps a gram string column to an integer token column —
    default F.xxhash64 (the fast production path); the replay queries
    pass oracle_replay.md5_token_col() so an external engine can
    re-derive the identical shingle set."""
    from pyspark.sql import functions as F

    if token_fn is None:
        token_fn = F.xxhash64
    words = F.split(F.col(text_col), " ")
    idx = F.when(F.size(words) >= n,
                 F.sequence(F.lit(1), F.size(words) - (n - 1))
                 ).otherwise(F.array().cast("array<int>"))
    grams = F.transform(idx, lambda i: token_fn(
        F.concat_ws(" ", F.slice(words, i, n))))
    return df.withColumn(out_col, F.array_distinct(grams))


# ======================================================== MinHash + LSH

def minhash_signatures(df, shingle_col: str = "shingles", k: int = 64,
                       out_col: str = "sig"):
    """array<long> shingles → array<long> k-minhash signature (pandas UDF,
    numpy-vectorized per Arrow batch)."""
    from pyspark.sql.functions import pandas_udf

    @pandas_udf("array<long>")
    def mh(col):
        import pandas as pd

        arrs = [np.asarray(a if a is not None else (), dtype=np.int64)
                for a in col]
        m = minhash_batch(arrs, k=k).view(np.int64)
        return pd.Series(list(m))

    return df.withColumn(out_col, mh(shingle_col))


def _cap_buckets(buckets, keys, max_bucket: int, stats=None):
    """Shared oversized-bucket guard: keep rows whose bucket has ≤
    `max_bucket` members. Sizing is `groupBy(keys).count()` + an equi-join
    back — NOT `count(*).over(Window.partitionBy(keys))`: a degenerate
    10⁸-row boilerplate bucket would land in ONE window task before being
    dropped, while the groupBy partial-aggregates map-side and the join
    spreads the probe normally (AQE broadcasts the size table when small).

    When `stats` (a plain dict) is given, it is filled EAGERLY with
    {"dropped_rows", "max_bucket_size"} via one small aggregate job over
    the size table, so silent recall loss is visible instead of implied.
    (An `observe()`-based variant was rejected: AQE's empty-relation
    propagation can prune the observed node out of the final plan — e.g.
    when every bucket is dropped — and a diagnostic that vanishes exactly
    when it matters most is worse than one extra tiny job.) The stats job
    recomputes the upstream bucket stage once; hot-path callers pass
    stats=None and get zero extra jobs and nothing cached/pinned."""
    from pyspark.sql import functions as F

    keys = list(keys)
    sizes = buckets.groupBy(*keys).agg(F.count("*").alias("bsize"))
    if stats is not None:
        row = sizes.agg(
            F.sum(F.when(F.col("bsize") > max_bucket, F.col("bsize"))
                  .otherwise(0)).alias("dropped_rows"),
            F.max("bsize").alias("max_bucket_size")).first()
        stats["dropped_rows"] = int(row["dropped_rows"] or 0)
        stats["max_bucket_size"] = int(row["max_bucket_size"] or 0)
    kept = sizes.filter(F.col("bsize") <= max_bucket).select(*keys)
    return buckets.join(kept, keys, "inner")


def lsh_candidate_pairs(sig_df, id_col: str = "doc_id", sig_col: str = "sig",
                        bands: int = 16, k: int = 64,
                        max_bucket: int = 1000, stats=None):
    """Banded LSH: equal band-signature ⇒ candidate pair. Pure DataFrame ops:
    posexplode band hashes → groupBy bucket → within-bucket self-join.

    `max_bucket` drops degenerate buckets (boilerplate explosion guard) —
    their members are still caught by other bands unless truly identical,
    and identical docs belong to exact dedup anyway. Pass a dict as
    `stats` to receive (dropped_rows, max_bucket_size) eagerly.
    """
    from pyspark.sql import functions as F

    if bands < 1 or k % bands:
        # r = k//bands = 0 would hash the EMPTY slice identically for
        # every doc (one universal bucket per band); a non-divisible k
        # silently ignores the last k - bands*(k//bands) signature
        # entries and changes the documented recall curve
        raise ValueError(f"k must be a positive multiple of bands "
                         f"(got k={k}, bands={bands})")
    r = k // bands
    band_hash = F.array(*[
        F.xxhash64(F.lit(b), F.concat_ws(",", F.transform(
            F.slice(sig_col, b * r + 1, r), lambda x: x.cast("string"))))
        for b in range(bands)])
    buckets = (sig_df.select(id_col, F.posexplode(band_hash)
                             .alias("band", "bucket")))
    kept = _cap_buckets(buckets, ("band", "bucket"), max_bucket, stats)
    a, b = kept.alias("a"), kept.alias("b")
    pairs = (a.join(b, ["band", "bucket"])
             .filter(F.col(f"a.{id_col}") < F.col(f"b.{id_col}"))
             .select(F.col(f"a.{id_col}").alias("doc_a"),
                     F.col(f"b.{id_col}").alias("doc_b"))
             .distinct())
    return pairs


def minhash_near_duplicates(df, id_col: str = "doc_id",
                            text_col: str = "text", n: int = 3, k: int = 64,
                            bands: int = 16, threshold: float = 0.5,
                            max_bucket: int = 1000,
                            exact_verify: bool = False, stats=None,
                            caches: list | None = None):
    """End-to-end MinHash near-dup: shingle → sign → band → candidates →
    Jaccard ≥ threshold.

    Default scoring is the signature estimate (zip_with agreement fraction,
    JVM-side). `exact_verify=True` switches the verification stage to exact
    shingle-set Jaccard (array_intersect/array_union over the candidates
    only) — the classic LSH architecture: approximate candidate generation
    bounds the pair count, exact verification makes the output
    deterministic and oracle-comparable. Candidate recall at threshold t is
    1−(1−t^(k/bands))^bands (≥ 0.999 for t ≥ 0.8 at 16×4).

    The signature stage is cached (it feeds the candidate join AND both
    sides of the verify join). Pass a list as `caches` to receive the
    cached DataFrame and unpersist it once the result is materialized —
    otherwise it stays pinned for the session (pipeline.curate_corpus
    routes it through its own unpersist handle).

    → DataFrame(doc_a, doc_b, est_jaccard|jaccard double).
    """
    from pyspark.sql import functions as F

    from .session import fan_out

    shingled = word_shingles(fan_out(df.select(id_col, text_col)),
                             text_col, n)
    # docs with NO shingles (NULL/short text) all share the all-sentinel
    # signature: every band would match, reporting unrelated short docs
    # as perfect duplicates (est_jaccard 1.0) and forming one mega-bucket
    # per band — they carry no n-gram evidence either way, so drop them
    shingled = shingled.filter(F.size("shingles") > 0)
    sigs = minhash_signatures(shingled, k=k).select(id_col, "shingles",
                                                    "sig").cache()
    if caches is not None:
        caches.append(sigs)
    pairs = lsh_candidate_pairs(sigs, id_col, "sig", bands, k, max_bucket,
                                stats=stats)
    if exact_verify:
        sa = sigs.select(F.col(id_col).alias("doc_a"),
                         F.col("shingles").alias("sh_a"))
        sb = sigs.select(F.col(id_col).alias("doc_b"),
                         F.col("shingles").alias("sh_b"))
        jac = (F.size(F.array_intersect("sh_a", "sh_b"))
               / F.size(F.array_union("sh_a", "sh_b")))
        # threshold the UNROUNDED value, round only for output — a pair
        # in [thr − 5e-5, thr) must not round its way in (the oracle
        # filters unrounded too)
        return (pairs.join(sa, "doc_a").join(sb, "doc_b")
                .withColumn("_j", jac)
                .filter(F.col("_j") >= threshold)
                .select("doc_a", "doc_b",
                        F.round("_j", 4).alias("jaccard")))
    sa = sigs.select(F.col(id_col).alias("doc_a"), F.col("sig").alias("sig_a"))
    sb = sigs.select(F.col(id_col).alias("doc_b"), F.col("sig").alias("sig_b"))
    est = (F.size(F.filter(F.zip_with("sig_a", "sig_b",
                                      lambda x, y: (x == y).cast("int")),
                           lambda v: v == 1)) / F.lit(float(k)))
    return (pairs.join(sa, "doc_a").join(sb, "doc_b")
            .withColumn("est_jaccard", est)
            .filter(F.col("est_jaccard") >= threshold)
            .select("doc_a", "doc_b", F.round("est_jaccard", 4)
                    .alias("est_jaccard")))


def dedup_exact_normalized(df, id_col: str = "doc_id",
                           text_col: str = "text"):
    """'Fuzzy-exact' dedup: keep one representative (min id) per
    NORMALIZED text (text.normalized_text_expr — lowercase, strip
    punctuation, collapse whitespace). Sits between raw-hash exact dedup
    and MinHash near-dup in the curation ladder.

    The group key is md5(normalized) — 32 bytes shuffled per row instead
    of the full document, the same hash-don't-carry trick as
    dedup_exact; a 128-bit collision is vanishingly less likely than the
    normalization itself merging near-identical docs (by design).
    groupBy-min + left-semi join back, no window over the text key.

    Documents whose canonical form is EMPTY (no ASCII alphanumerics —
    CJK/Cyrillic/emoji-only text) are kept unconditionally: the empty
    key says 'this normalization can't see the document', not 'these
    are all duplicates of each other', and folding a multilingual
    corpus's non-Latin half into one representative would be silent
    mass deletion."""
    from pyspark.sql import functions as F

    from .text import normalized_text_expr

    norm = normalized_text_expr(text_col)
    keyed = df.select(F.col(id_col), F.md5(norm).alias("_k"),
                      (norm.isNull() | (norm == "")).alias("_blank"))
    keep = (keyed.filter(~F.col("_blank"))
            .groupBy("_k").agg(F.min(id_col).alias(id_col))
            .select(id_col)
            .unionByName(keyed.filter(F.col("_blank")).select(id_col)))
    return df.join(keep, id_col, "left_semi")


# ======================================================== exact n-gram Jaccard

def ngram_jaccard_pairs(df, id_col: str = "doc_id", text_col: str = "text",
                        n: int = 3, min_jaccard: float = 0.5):
    """Exact pairwise n-gram Jaccard, fully declarative: distinct shingles →
    co-occurrence self-join → |A∩B| / (|A|+|B|−|A∩B|). The DuckDB-exact
    oracle for the MinHash estimate path.

    At scale the shared-shingle join is the bottleneck for boilerplate-heavy
    corpora — that's precisely why the MinHash path exists; this operator is
    the ground-truth/verification tool.
    """
    from pyspark.sql import functions as F

    from .session import fan_out

    shingled = word_shingles(fan_out(df.select(id_col, text_col)),
                             text_col, n)
    # set size = array length (shingles are array_distinct per doc):
    # a free projection, NOT a second corpus explode + groupBy shuffle
    sizes = shingled.select(id_col, F.size("shingles").alias("sz"))
    grams = shingled.select(id_col, F.explode("shingles").alias("g"))
    a, b = grams.alias("a"), grams.alias("b")
    inter = (a.join(b, "g")
             .filter(F.col(f"a.{id_col}") < F.col(f"b.{id_col}"))
             .groupBy(F.col(f"a.{id_col}").alias("doc_a"),
                      F.col(f"b.{id_col}").alias("doc_b"))
             .agg(F.count("*").alias("inter")))
    sa = sizes.select(F.col(id_col).alias("doc_a"), F.col("sz").alias("sz_a"))
    sb = sizes.select(F.col(id_col).alias("doc_b"), F.col("sz").alias("sz_b"))
    jac = F.col("inter") / (F.col("sz_a") + F.col("sz_b") - F.col("inter"))
    # filter the unrounded value; round only for output (oracle parity —
    # a threshold-edge pair must not round its way past the cut)
    return (inter.join(sa, "doc_a").join(sb, "doc_b")
            .withColumn("_j", jac)
            .filter(F.col("_j") >= min_jaccard)
            .select("doc_a", "doc_b", F.round("_j", 4).alias("jaccard")))


# ================================================================ SimHash

def simhash_fingerprints(df, id_col: str = "doc_id",
                         tokens_col: str = "tokens", out_col: str = "simhash"):
    """token array → 64-bit SimHash (pandas UDF over the vectorized kernel)."""
    from pyspark.sql.functions import pandas_udf

    @pandas_udf("long")
    def sh(col):
        import pandas as pd

        arrs = [np.asarray(a if a is not None else (), dtype=np.int64)
                for a in col]
        return pd.Series(simhash_batch(arrs).view(np.int64))

    return df.withColumn(out_col, sh(tokens_col))


def simhash_near_duplicates(df, id_col: str = "doc_id",
                            tokens_col: str = "tokens", max_hamming: int = 3,
                            max_bucket: int = 10000, stats=None):
    """SimHash near-dup: chunk bucketing with the chunk count DERIVED from
    `max_hamming` (n_chunks = max_hamming + 1; pigeonhole: hamming ≤ h over
    h+1 chunks ⇒ at least one chunk equal — full recall for any requested
    radius, not just 3) → JVM `bit_count(a^b)` verify.

    max_hamming > 15 is rejected: chunks would shrink under 4 bits, bucket
    cardinality collapses, and the candidate join degenerates toward
    all-pairs — use MinHash at that radius instead.

    → DataFrame(doc_a, doc_b, hamming int).
    """
    from pyspark.sql import functions as F

    if not 0 <= max_hamming <= 15:
        raise ValueError(
            f"max_hamming must be in [0, 15], got {max_hamming}: chunk "
            "bucketing needs max_hamming+1 chunks of >= 4 bits each")
    from .session import fan_out

    n_chunks = max_hamming + 1
    width = 64 // n_chunks  # top chunk absorbs the 64 % n_chunks remainder
    # empty/NULL token arrays all fingerprint to 0 and would pairwise
    # match at hamming 0 — no content, no evidence; drop them
    src = df.select(id_col, tokens_col).filter(
        F.col(tokens_col).isNotNull() & (F.size(tokens_col) > 0))
    fps = simhash_fingerprints(fan_out(src),
                               id_col, tokens_col).select(id_col, "simhash")
    def chunk_expr(c):
        bits = 64 - c * width if c == n_chunks - 1 else width
        shifted = F.shiftrightunsigned("simhash", c * width)
        # a full-width (64-bit) chunk needs no mask — and (1<<64)-1
        # wouldn't fit a long literal anyway
        return shifted if bits >= 64 else shifted.bitwiseAND(
            F.lit((1 << bits) - 1))

    chunks = F.array(*[chunk_expr(c) for c in range(n_chunks)])
    buckets = fps.select(id_col, "simhash",
                         F.posexplode(chunks).alias("chunk", "val"))
    kept = _cap_buckets(buckets, ("chunk", "val"), max_bucket, stats)
    a, b = kept.alias("a"), kept.alias("b")
    return (a.join(b, ["chunk", "val"])
            .filter(F.col(f"a.{id_col}") < F.col(f"b.{id_col}"))
            .select(F.col(f"a.{id_col}").alias("doc_a"),
                    F.col(f"b.{id_col}").alias("doc_b"),
                    F.bit_count(F.col("a.simhash")
                                .bitwiseXOR(F.col("b.simhash")))
                    .alias("hamming"))
            .filter(F.col("hamming") <= max_hamming)
            .distinct())


# ========================================================== embeddings / ANN

def embedding_lsh_buckets(df, vec_col: str = "embedding",
                          n_planes: int = 16, seed: int = 7,
                          n_tables: int = 1, out_col: str = "bucket"):
    """Random-hyperplane LSH buckets per vector: `n_tables` independent
    plane sets (seeds seed..seed+T−1), exploded to (table, bucket) rows.
    Multi-table union is what buys recall — one table only catches pairs
    agreeing on all `n_planes` signs. Planes are derived deterministically
    from the seed, recomputed per executor — no broadcast."""
    from pyspark.sql import functions as F
    from pyspark.sql.functions import pandas_udf

    @pandas_udf("array<long>")
    def sig(col):
        import pandas as pd

        if not len(col):
            return pd.Series([], dtype=object)
        mat = _stack_vectors(col)  # NULL embeddings get the clear error
        sigs = np.stack([hyperplane_signature(mat, n_planes, seed + t)
                         for t in range(n_tables)], axis=1)
        return pd.Series(list(sigs))

    return (df.withColumn("_sigs", sig(vec_col))
            .select("*", F.posexplode("_sigs").alias("table", out_col))
            .drop("_sigs"))


def embedding_near_duplicates(df, id_col: str = "vec_id",
                              vec_col: str = "embedding",
                              threshold: float = 0.95, n_planes: int = 6,
                              n_tables: int = 6, seed: int = 7,
                              max_bucket: int = 10000, stats=None):
    """Near-duplicate vector pairs: multi-table LSH bucket join → exact
    within-bucket cosine (JVM zip_with/aggregate — no Python in the verify
    path). Miss probability per pair ≈ (1 − (1−θ/π)^planes)^tables: at
    cosine 0.95 with 6 planes × 6 tables ≈ 0.6%.
    """
    from pyspark.sql import functions as F

    b = embedding_lsh_buckets(df.select(id_col, vec_col), vec_col,
                              n_planes, seed, n_tables)
    kept = _cap_buckets(b, ("table", "bucket"), max_bucket, stats)
    x, y = kept.alias("x"), kept.alias("y")
    dot = F.aggregate(F.zip_with(f"x.{vec_col}", f"y.{vec_col}",
                                 lambda p, q: p * q),
                      F.lit(0.0).cast("double"), lambda acc, v: acc + v)
    nrm = (lambda side: F.sqrt(F.aggregate(
        F.col(f"{side}.{vec_col}"), F.lit(0.0).cast("double"),
        lambda acc, v: acc + v * v)))
    # threshold the unrounded cosine, round only for output (same
    # edge-of-threshold discipline as the Jaccard paths)
    return (x.join(y, ["table", "bucket"])
            .filter(F.col(f"x.{id_col}") < F.col(f"y.{id_col}"))
            .select(F.col(f"x.{id_col}").alias("id_a"),
                    F.col(f"y.{id_col}").alias("id_b"),
                    (dot / (nrm("x") * nrm("y"))).alias("_c"))
            .filter(F.col("_c") >= threshold)
            .select("id_a", "id_b", F.round("_c", 4).alias("cosine"))
            .distinct())


def _stack_vectors(col) -> np.ndarray:
    """Arrow column of array<float/double> → (n, d) float64 matrix.
    NULL embeddings get a clear error (the silent alternative — a
    zero/garbage vector — would corrupt assignments): filter them
    upstream, they carry no geometry."""
    vecs = []
    for v in col:
        if v is None:
            raise ValueError(
                "NULL embedding reached a vector kernel; filter "
                f"{len(vecs)} rows upstream with isNotNull()")
        vecs.append(np.asarray(v, dtype=np.float64))
    return np.stack(vecs)


def _kmeans(X: np.ndarray, k: int, n_iter: int, rng) -> np.ndarray:
    """Lloyd k-means on a driver-side sample: seed with min(k, n) random
    distinct rows (fewer samples than k → a smaller codebook, never a
    crash); empty clusters keep their stale centroid. Shared by the IVF
    coarse quantizer and the PQ subquantizers."""
    idx = rng.choice(X.shape[0], size=min(k, X.shape[0]), replace=False)
    C = X[idx].copy()
    for _ in range(n_iter):
        d2 = ((X[:, None, :] - C[None, :, :]) ** 2).sum(axis=2)
        assign = d2.argmin(axis=1)
        for j in range(C.shape[0]):
            members = X[assign == j]
            if members.size:
                C[j] = members.mean(axis=0)
    return C


def _cosine_to_query(vec_col: str, q: np.ndarray):
    """Column expression: exact cosine(vec_col, q) via JVM
    zip_with/aggregate folds — shared by every single-query ANN ranker.
    A zero-norm stored vector divides by zero → NULL cosine, which
    sorts after every real score under DESC NULLS LAST (Spark default),
    i.e. it simply never ranks."""
    from pyspark.sql import functions as F

    qlit = F.array(*[F.lit(float(v)) for v in q])
    dot = F.aggregate(F.zip_with(vec_col, qlit, lambda p, qq: p * qq),
                      F.lit(0.0).cast("double"), lambda acc, v: acc + v)
    nrm_v = F.sqrt(F.aggregate(F.col(vec_col), F.lit(0.0).cast("double"),
                               lambda acc, v: acc + v * v))
    nrm_q = float(np.sqrt((q * q).sum()))
    return F.round(dot / (nrm_v * F.lit(nrm_q)), 4)


def _adc_udf(lut: np.ndarray):
    """Pandas UDF: PQ code column → asymmetric squared-L2 distance via an
    m-way LUT gather (lut: (m, ksub), rides in the closure)."""
    import pandas as pd
    from pyspark.sql.functions import pandas_udf

    m = lut.shape[0]

    @pandas_udf("double")
    def adc(col):
        if not len(col):
            return pd.Series([], dtype="float64")
        codes = np.stack([np.asarray(c, dtype=np.int64) for c in col])
        return pd.Series(lut[np.arange(m)[None, :], codes].sum(axis=1))

    return adc


def ivf_centroids(df, vec_col: str = "embedding", n_lists: int = 16,
                  n_iter: int = 5, sample: int = 4096, seed: int = 13):
    """IVF coarse quantizer: k-means centroids trained driver-side on a
    deterministic sample (numpy Lloyd iterations, kmeans++-style seeding
    from the sample). At 100 TB the sample is a tiny pushed-down read; the
    expensive part — assignment — stays distributed. Returns (n_lists, d)
    ndarray."""
    rows = (df.select(vec_col).limit(sample).collect())
    X = _stack_vectors([r[0] for r in rows])
    return _kmeans(X, n_lists, n_iter, np.random.default_rng(seed))


def ivf_assign(df, centroids: np.ndarray, vec_col: str = "embedding",
               out_col: str = "list_id"):
    """Assign each vector to its nearest centroid (vectorized pandas UDF;
    centroids ride in the closure — KBs, no broadcast needed)."""
    from pyspark.sql.functions import pandas_udf

    C = np.asarray(centroids, dtype=np.float64)

    @pandas_udf("int")
    def assign(col):
        import pandas as pd

        if not len(col):
            return pd.Series([], dtype="int32")
        X = _stack_vectors(col)
        # argmin ||x-c||² = argmax x·c − ||c||²/2 (one GEMM per batch)
        scores = X @ C.T - 0.5 * (C * C).sum(axis=1)[None, :]
        return pd.Series(scores.argmax(axis=1).astype(np.int32))

    return df.withColumn(out_col, assign(vec_col))


def ivf_write_index(df, centroids: np.ndarray, path: str,
                    id_col: str = "vec_id", vec_col: str = "embedding"):
    """Persist the IVF index: vectors + their list assignment, written
    `partitionBy("list_id")` so probes read only the probed lists'
    directories (storage-level pruning — the layout the ann_topk_ivf
    docstring promises; at 100 TB this is what turns n_probe/n_lists into
    an actual IO reduction instead of a post-scan filter)."""
    assigned = ivf_assign(df.select(id_col, vec_col), centroids, vec_col)
    assigned.write.mode("overwrite").partitionBy("list_id").parquet(path)


def ann_topk_ivf_indexed(spark, index_path: str, query_vec,
                         centroids: np.ndarray, id_col: str = "vec_id",
                         vec_col: str = "embedding", k: int = 5,
                         n_probe: int = 4):
    """IVF search against a persisted `ivf_write_index` layout: rank
    centroids by distance to the query, then read ONLY the n_probe nearest
    list directories (PartitionFilters prune the rest before any IO —
    verify with .explain()); exact cosine within them."""
    from pyspark.sql import functions as F

    q = np.asarray(query_vec, dtype=np.float64)
    C = np.asarray(centroids, dtype=np.float64)
    d2 = ((C - q[None, :]) ** 2).sum(axis=1)
    probe_lists = [int(i) for i in np.argsort(d2)[:n_probe]]
    lists = spark.read.parquet(index_path).filter(
        F.col("list_id").isin(probe_lists))
    return (lists.select(id_col,
                         _cosine_to_query(vec_col, q).alias("cosine"))
            .orderBy(F.desc("cosine"), id_col)
            .limit(k))


def ann_topk_ivf(df, query_vec, centroids: np.ndarray,
                 id_col: str = "vec_id", vec_col: str = "embedding",
                 k: int = 5, n_probe: int = 4):
    """IVF search, inline variant: rank centroids by distance to the
    query, assign + filter in one plan, exact cosine within the `n_probe`
    nearest lists. For repeated queries at scale use `ivf_write_index` +
    `ann_topk_ivf_indexed`: the persisted partitionBy("list_id") layout
    turns the list filter into storage-level partition pruning (R6
    shard-routed point query, README.md:342) instead of a full-scan
    assignment recomputed per query."""
    from pyspark.sql import functions as F

    q = np.asarray(query_vec, dtype=np.float64)
    C = np.asarray(centroids, dtype=np.float64)
    d2 = ((C - q[None, :]) ** 2).sum(axis=1)
    probe_lists = [int(i) for i in np.argsort(d2)[:n_probe]]
    assigned = ivf_assign(df.select(id_col, vec_col), C, vec_col)
    return (assigned.filter(F.col("list_id").isin(probe_lists))
            .select(id_col,
                    _cosine_to_query(vec_col, q).alias("cosine"))
            .orderBy(F.desc("cosine"), id_col)
            .limit(k))


def ann_topk_lsh(df, query_vec, id_col: str = "vec_id",
                 vec_col: str = "embedding", k: int = 5, n_planes: int = 6,
                 n_tables: int = 6, seed: int = 7):
    """Approximate top-k neighbors of one query vector: scan only the
    query's LSH buckets (one per table), rank union by exact cosine — the
    partition-pruned analog of the reference's shard-routed point queries
    (README.md:342).

    → DataFrame(vec_id, cosine) — ties broken by id for determinism.
    """
    from pyspark.sql import functions as F

    q = np.asarray(query_vec, dtype=np.float64)
    qbuckets = [(t, int(hyperplane_signature(q[None, :], n_planes,
                                             seed + t)[0]))
                for t in range(n_tables)]
    b = embedding_lsh_buckets(df.select(id_col, vec_col), vec_col,
                              n_planes, seed, n_tables)
    probe = F.lit(False)
    for t, qb in qbuckets:
        probe = probe | ((F.col("table") == t) & (F.col("bucket") == qb))
    return (b.filter(probe)
            .select(id_col,
                    _cosine_to_query(vec_col, q).alias("cosine"))
            .groupBy(id_col).agg(F.max("cosine").alias("cosine"))
            .orderBy(F.desc("cosine"), id_col)
            .limit(k))


# ================================================== product quantization

def pq_train(df, vec_col: str = "embedding", m: int = 8, ksub: int = 16,
             n_iter: int = 8, sample: int = 4096, seed: int = 29):
    """Product-quantization codebooks (Jégou, Douze & Schmid 2011,
    "Product quantization for nearest neighbor search", IEEE TPAMI):
    split the d dims into `m` subspaces and k-means each subspace on a
    deterministic driver-side sample (same sampling discipline as
    `ivf_centroids`). Returns an (m, ksub, d/m) float64 ndarray.

    At 100 TB the codebooks are KBs trained from a pushed-down LIMIT
    read; the expensive pass — encoding — stays distributed. Fewer
    sampled rows than `ksub` → the codebooks shrink to the sample size
    (matching `_kmeans`), never a crash."""
    rows = df.select(vec_col).limit(sample).collect()
    X = _stack_vectors([r[0] for r in rows])
    d = X.shape[1]
    if d % m:
        raise ValueError(f"dim {d} not divisible by m={m}")
    dsub = d // m
    rng = np.random.default_rng(seed)
    ksub_eff = min(ksub, X.shape[0])
    books = np.empty((m, ksub_eff, dsub))
    for s in range(m):
        books[s] = _kmeans(X[:, s * dsub:(s + 1) * dsub], ksub_eff,
                           n_iter, rng)
    return books


def pq_encode(df, codebooks, vec_col: str = "embedding",
              out_col: str = "code"):
    """Replace each vector with its m-subquantizer code (vectorized
    pandas UDF, one GEMM per subspace per Arrow batch; codebooks ride in
    the closure — KBs). Deterministic and partition-invariant.

    This is the scale lever: a 64-dim float32 vector is 256 B, its m=8
    code is 8 small ints — a ~32× reduction of the column the ranking
    pass must scan, which is what makes exhaustive candidate ranking
    over 10¹²-row embedding tables IO-feasible."""
    import pandas as pd
    from pyspark.sql.functions import pandas_udf

    B = np.asarray(codebooks, dtype=np.float64)
    m, ksub, dsub = B.shape
    # argmin ||x-c||² = argmax x·c − ||c||²/2, per subspace
    half_nrm = 0.5 * (B * B).sum(axis=2)  # (m, ksub)

    @pandas_udf("array<int>")
    def enc(col):
        if not len(col):
            return pd.Series([], dtype=object)
        X = _stack_vectors(col)
        codes = np.empty((X.shape[0], m), dtype=np.int32)
        for s in range(m):
            scores = X[:, s * dsub:(s + 1) * dsub] @ B[s].T \
                - half_nrm[s][None, :]
            codes[:, s] = scores.argmax(axis=1)
        return pd.Series(list(codes))

    return df.withColumn(out_col, enc(vec_col))


def ann_topk_pq(df, query_vec, codebooks, id_col: str = "vec_id",
                vec_col: str = "embedding", k: int = 5, rerank: int = 4):
    """ANN top-k by asymmetric distance computation (ADC): a per-query
    (m × ksub) look-up table of squared L2 distances from the query's
    subvectors to every codebook entry; each row's approximate distance
    is an m-way LUT gather + sum over its CODE alone — the raw vectors
    are touched only to exact-cosine-rerank the top `rerank·k` ADC
    candidates (broadcast semi-join back onto the vector table).

    → DataFrame(vec_id, cosine), ties broken by id."""
    from pyspark.sql import functions as F

    q = np.asarray(query_vec, dtype=np.float64)
    B = np.asarray(codebooks, dtype=np.float64)
    m, ksub, dsub = B.shape
    lut = ((B - q.reshape(m, 1, dsub)) ** 2).sum(axis=2)  # (m, ksub)
    encoded = pq_encode(df.select(id_col, vec_col), B, vec_col)
    cand = (encoded.select(id_col, _adc_udf(lut)("code").alias("_adc"))
            .orderBy("_adc", id_col).limit(rerank * k))
    return (df.join(F.broadcast(cand.select(id_col)), id_col)
            .select(id_col,
                    _cosine_to_query(vec_col, q).alias("cosine"))
            .orderBy(F.desc("cosine"), id_col)
            .limit(k))


# ===================================================== semantic dedup

def semantic_dedup(df, centroids, id_col: str = "vec_id",
                   vec_col: str = "embedding", threshold: float = 0.95,
                   max_cluster: int = 10000, stats=None):
    """SemDeDup (Abbas et al. 2023, "SemDeDup: Data-efficient learning
    at web-scale through semantic deduplication", arXiv:2303.09540):
    coarse k-means clustering (the IVF quantizer, `ivf_centroids`)
    restricts the quadratic cosine comparison to WITHIN each cluster; a
    vector is dropped when a lower-id cluster-mate sits at cosine ≥
    `threshold` (min-id representative — the same keep-lowest rule as
    exact dedup, deterministic under any partitioning).

    → df(id_col, list_id, is_kept boolean).

    Scale shape: the self-join is per-cluster equi-join on list_id
    (expected cluster size n/n_lists — tune n_lists ∝ n so clusters stay
    bounded); `max_cluster` drops degenerate clusters through
    `_cap_buckets` with eager dropped-rows stats (dropped clusters keep
    all members — recall loss surfaced, never silent drops of data).
    Cross-cluster near-dups are missed by design: that is the SemDeDup
    accuracy/cost trade, quantified in the paper."""
    from pyspark.sql import functions as F

    assigned = ivf_assign(df.select(id_col, vec_col), centroids, vec_col)
    capped = _cap_buckets(assigned, ("list_id",), max_cluster, stats)
    x, y = capped.alias("x"), capped.alias("y")
    dot = F.aggregate(F.zip_with(f"x.{vec_col}", f"y.{vec_col}",
                                 lambda p, q: p * q),
                      F.lit(0.0).cast("double"), lambda acc, v: acc + v)
    nrm = (lambda side: F.sqrt(F.aggregate(
        F.col(f"{side}.{vec_col}"), F.lit(0.0).cast("double"),
        lambda acc, v: acc + v * v)))
    dup = (x.join(y, "list_id")
           .filter(F.col(f"y.{id_col}") < F.col(f"x.{id_col}"))
           .filter(dot / (nrm("x") * nrm("y")) >= threshold)
           .select(F.col(f"x.{id_col}").alias(id_col))
           .distinct())
    return (assigned.join(dup.withColumn("_dup", F.lit(True)),
                          id_col, "left")
            .select(id_col, "list_id",
                    F.coalesce(~F.col("_dup"), F.lit(True))
                    .alias("is_kept")))


def ivfpq_write_index(df, centroids, codebooks, path: str,
                      id_col: str = "vec_id", vec_col: str = "embedding"):
    """IVF-PQ index (the FAISS IVFADC layout, Jégou et al. 2011 §IV):
    coarse list assignment persisted `partitionBy("list_id")` + the m-byte
    PQ code per vector + the raw vector (kept here for in-index rerank;
    at 100 TB drop it and rerank against the base table instead, so the
    index is codes-only ≈ m bytes/vector)."""
    assigned = ivf_assign(df.select(id_col, vec_col), centroids, vec_col)
    encoded = pq_encode(assigned, codebooks, vec_col)
    encoded.write.mode("overwrite").partitionBy("list_id").parquet(path)


def ann_topk_ivfpq(spark, index_path: str, query_vec, centroids, codebooks,
                   id_col: str = "vec_id", vec_col: str = "embedding",
                   k: int = 5, n_probe: int = 4, rerank: int = 4):
    """IVF-PQ search: PartitionFilters prune to the `n_probe` nearest
    lists (storage-level IO reduction), ADC LUT ranking over a scan
    that reads ONLY (id, code) — column pruning keeps the raw-vector
    bytes out of the ranking pass, which is PQ's whole point — then an
    exact-cosine rerank that re-reads the probed lists with the
    `rerank·k` candidate ids as a pushed-down IN filter (row-group
    skipping; the candidate set is collected driver-side — it is
    `rerank·k` ids, a point-query-sized list). Combines both scale
    levers: fewer rows (IVF) and fewer bytes per row (PQ)."""
    from pyspark.sql import functions as F

    q = np.asarray(query_vec, dtype=np.float64)
    C = np.asarray(centroids, dtype=np.float64)
    B = np.asarray(codebooks, dtype=np.float64)
    m, ksub, dsub = B.shape
    d2 = ((C - q[None, :]) ** 2).sum(axis=1)
    probe_lists = [int(i) for i in np.argsort(d2)[:n_probe]]
    lut = ((B - q.reshape(m, 1, dsub)) ** 2).sum(axis=2)
    lists = spark.read.parquet(index_path).filter(
        F.col("list_id").isin(probe_lists))
    cand = (lists.select(id_col, _adc_udf(lut)("code").alias("_adc"))
            .orderBy("_adc", id_col).limit(rerank * k))
    cand_ids = [r[id_col] for r in cand.collect()]
    return (lists.filter(F.col(id_col).isin(cand_ids))
            .select(id_col,
                    _cosine_to_query(vec_col, q).alias("cosine"))
            .orderBy(F.desc("cosine"), id_col)
            .limit(k))

def duplicate_window_stats(df, w: int = 8, text_col: str = "text",
                           id_col: str = "doc_id",
                           group_col: str = "source"):
    """ExactSubstr-style duplicated-span detection (Lee et al.,
    "Deduplicating Training Data Makes Language Models Better", 2021):
    every length-`w` token window is keyed, and a window is DUPLICATED
    when its key occurs more than once anywhere in the corpus — the
    signal that drives span-level dedup, where document-level near-dup
    passes miss templated boilerplate embedded in otherwise-unique
    documents.

    Shape (declarative, exact): per-row `transform(sequence, i ->
    md5(array_join(slice(words, i, w))))` builds all window keys JVM-side
    (no UDF, no per-window Python); one explode; one count shuffle keyed
    by the 128-bit window key; a self-semi-join marks duplicated windows;
    one aggregate per group. The corpus expands ~n_tok-fold in the
    exploded column, but each row is (id, key) only — at the 100-TB scale
    this is the same O(total tokens) shuffle ExactSubstr's suffix-array
    pays, distributed instead of in one machine's RAM. The md5 string key
    is what makes the DuckDB oracle byte-reproducible; a production run
    would truncate to 16 hex chars (64 bits) to halve shuffle bytes.

    → per group: (group, n_windows, n_dup_windows, docs_hit) — total
    windows, windows whose key repeats corpus-wide, documents containing
    at least one duplicated window.
    """
    from pyspark.sql import functions as F

    words = F.split(F.col(text_col), " ")
    n_win = F.size(words) - (w - 1)
    # NB sequence(1, 0) is the DESCENDING [1, 0] in Spark, not empty —
    # short documents must produce an empty window list explicitly
    idx = F.when(n_win >= 1, F.sequence(F.lit(1), n_win)) \
        .otherwise(F.array().cast("array<int>"))
    keys = F.transform(
        idx, lambda i: F.md5(F.array_join(F.slice(words, i, w), " ")))
    wins = (df.select(F.col(id_col).alias("_id"),
                      F.col(group_col).alias("_g"),
                      F.explode(keys).alias("_h")))
    dup_keys = (wins.groupBy("_h").count()
                .filter(F.col("count") > 1).select("_h"))
    flagged = wins.join(dup_keys.withColumn("_dup", F.lit(1)), "_h",
                        "left")
    return (flagged.groupBy(F.col("_g").alias(group_col))
            .agg(F.count(F.lit(1)).alias("n_windows"),
                 F.sum(F.coalesce(F.col("_dup"), F.lit(0)).cast("long"))
                  .alias("n_dup_windows"),
                 F.countDistinct(F.when(F.col("_dup").isNotNull(),
                                        F.col("_id"))).alias("docs_hit"))
            .orderBy(group_col))

def ann_topk_lsh_multiprobe(df, query_vec, id_col: str = "vec_id",
                            vec_col: str = "embedding", k: int = 5,
                            n_planes: int = 6, n_tables: int = 6,
                            n_probes: int = 3, seed: int = 7):
    """Multi-probe LSH top-k (Lv, Josephson, Wang, Charikar, Li,
    "Multi-Probe LSH", VLDB'07): besides the query's own bucket, each
    table also probes the `n_probes` single-bit-flip neighbor buckets
    whose hyperplane margin is smallest — the buckets a near-boundary
    neighbor most likely fell into. Recovers the recall that would
    otherwise require ~n_probes× more tables, at zero extra index size:
    the scan predicate just matches (1 + n_probes) buckets per table
    instead of 1, still a constant-bucket pruned read, never a full
    scan.

    → DataFrame(vec_id, cosine), exact-cosine ranked union of all probed
    buckets, ties broken by id.
    """
    from pyspark.sql import functions as F

    q = np.asarray(query_vec, dtype=np.float64)
    d = q.shape[0]
    pairs = []  # (table, bucket) probe set
    for t in range(n_tables):
        planes = np.random.default_rng(seed + t).standard_normal(
            (d, n_planes))
        margins = q @ planes                      # signed distance per plane
        base = int(((margins > 0).astype(np.uint64)
                    @ (np.uint64(1) << np.arange(n_planes,
                                                 dtype=np.uint64))))
        pairs.append((t, base))
        # flip the lowest-|margin| planes first (most likely boundary)
        for j in np.argsort(np.abs(margins))[:n_probes]:
            pairs.append((t, base ^ (1 << int(j))))
    b = embedding_lsh_buckets(df.select(id_col, vec_col), vec_col,
                              n_planes, seed, n_tables)
    probe = F.lit(False)
    for t, qb in pairs:
        probe = probe | ((F.col("table") == t) & (F.col("bucket") == qb))
    return (b.filter(probe)
            .select(id_col,
                    _cosine_to_query(vec_col, q).alias("cosine"))
            .groupBy(id_col).agg(F.max("cosine").alias("cosine"))
            .orderBy(F.desc("cosine"), id_col)
            .limit(k))


def exact_cosine_pairs(df, id_col: str = "vec_id",
                       vec_col: str = "embedding",
                       threshold: float = 0.35, round_to: int = 3):
    """All-pairs exact cosine pairs above `threshold` — the brute-force
    ground truth that the LSH / IVF / PQ approximate paths are validated
    against (reference analog: the exact baselines its experiment grids
    compare engines on, run_experiments.py).

    Block-matmul shape: the full L2-normalized matrix is broadcast once
    (n × d float64 — all-pairs output is O(n²), so this operator is only
    meaningful when one node can hold the matrix; at corpus scale use
    embedding_near_duplicates / the ANN indexes, whose recall THIS
    operator's output gates), and each input partition computes
    `block @ full.T` as one BLAS call inside mapInPandas, emitting the
    (id_a < id_b, cosine ≥ threshold) upper triangle. Replaces an
    interpreted per-element zip_with/aggregate fold that evaluated
    ~n²·d lambda steps on the JVM — the full pair loop now runs in
    vectorized native code.

    Rows with NULL embeddings are filtered (they carry no geometry);
    zero-norm vectors produce NaN cosines, which fail the ≥ threshold
    test and drop out — the same outcome as the SQL fold. Thresholding
    happens on the UNROUNDED value; rounding is output-only (same
    edge-of-threshold discipline as the Jaccard paths).

    → DataFrame(id_a, id_b, cosine double), id_a < id_b.
    """
    import pandas as pd
    from pyspark.sql import functions as F

    rows = df.select(id_col, vec_col).filter(
        F.col(vec_col).isNotNull())
    # the GEMM work is O(rows_in_partition × n): spread the left side
    # over the cluster when the source arrives in few/coarse partitions
    par = rows.sparkSession.sparkContext.defaultParallelism
    if rows.rdd.getNumPartitions() < par:
        rows = rows.repartition(par)
    pdf = rows.toPandas()
    ids_all = pdf[id_col].to_numpy()
    X_all = _stack_vectors(pdf[vec_col])
    with np.errstate(invalid="ignore", divide="ignore"):
        Xn_all = X_all / np.linalg.norm(X_all, axis=1, keepdims=True)
    bc = rows.sparkSession.sparkContext.broadcast((ids_all, Xn_all))
    id_sql_type = dict(df.dtypes)[id_col]

    def blocks(it):
        ids_r, Xn_r = bc.value
        # bound the similarity-matrix intermediate to ~64 MB: an Arrow
        # batch can be 10k rows, and 10k × n doubles (4 GB at n=50k)
        # thrashes memory long before the FLOPs matter
        step = max(1, (8 << 20) // max(len(ids_r), 1))
        for block in it:
            if not len(block):
                continue
            bids = block[id_col].to_numpy()
            Xb = _stack_vectors(block[vec_col])
            with np.errstate(invalid="ignore", divide="ignore"):
                Xb = Xb / np.linalg.norm(Xb, axis=1, keepdims=True)
            for lo in range(0, len(bids), step):
                sl = slice(lo, lo + step)
                with np.errstate(invalid="ignore"):
                    S = Xb[sl] @ Xn_r.T
                    mask = S >= threshold
                mask &= bids[sl, None] < ids_r[None, :]
                r, c = np.nonzero(mask)
                yield pd.DataFrame({"id_a": bids[sl][r], "id_b": ids_r[c],
                                    "cosine": np.round(S[r, c], round_to)})

    return rows.mapInPandas(
        blocks,
        schema=f"id_a {id_sql_type}, id_b {id_sql_type}, cosine double")


def exact_cosine_pairs_blocked(df, id_col: str = "vec_id",
                               vec_col: str = "embedding",
                               threshold: float = 0.35, round_to: int = 3,
                               n_blocks: int = 8):
    """All-pairs exact cosine above `threshold` WITHOUT any driver
    collect or full-matrix broadcast — the genuinely distributed brute
    force for matrices beyond one node's memory.

    Classic O(√R)-replication all-pairs scheme: rows hash into
    `n_blocks` blocks; every row is shipped to the n_blocks block-PAIRS
    that contain its block (an exploded (lo, hi) struct key, so the
    replication is a column op, not a join); each (bi, bj) group gathers
    exactly two blocks and runs ONE BLAS matmul between them inside
    applyInPandas. Replication factor = n_blocks, tasks = C(B, 2) + B, so
    with B ≈ √(2 · parallelism) the shuffle volume is √-replicated rather
    than the n² a naive self-join would carry — the standard tradeoff
    for distributed all-pairs similarity.

    Same output contract and numerics as exact_cosine_pairs (row-wise
    f64 normalize, float64 GEMM, unrounded threshold, round-for-output):
    tests gate value equality between the two strategies.

    → DataFrame(id_a, id_b, cosine double), id_a < id_b.
    """
    import pandas as pd
    from pyspark.sql import functions as F

    rows = df.select(id_col, vec_col).filter(F.col(vec_col).isNotNull())
    id_sql_type = dict(df.dtypes)[id_col]
    b = F.pmod(F.xxhash64(F.col(id_col)), F.lit(n_blocks)).cast("int")
    pair = F.explode(F.transform(
        F.sequence(F.lit(0), F.lit(n_blocks - 1)),
        lambda x: F.struct(F.least(b, x).alias("lo"),
                           F.greatest(b, x).alias("hi"))))
    tagged = rows.withColumn("_b", b).withColumn("_p", pair)

    def gemm(key, block):
        lo, hi = key
        left = block[block["_b"] == lo]
        right = block[block["_b"] == hi] if hi != lo else left
        if not len(left) or not len(right):
            empty_ids = block[id_col].iloc[:0]
            return pd.DataFrame({"id_a": empty_ids, "id_b": empty_ids,
                                 "cosine": np.array([], dtype=np.float64)})
        ids_l = left[id_col].to_numpy()
        ids_r = right[id_col].to_numpy()
        with np.errstate(invalid="ignore", divide="ignore"):
            Xl = _stack_vectors(left[vec_col])
            Xl = Xl / np.linalg.norm(Xl, axis=1, keepdims=True)
            if hi != lo:
                Xr = _stack_vectors(right[vec_col])
                Xr = Xr / np.linalg.norm(Xr, axis=1, keepdims=True)
            else:
                Xr = Xl
            S = Xl @ Xr.T
            if hi == lo:
                # same block on both sides: S holds each unordered pair
                # twice — keep the upper triangle
                mask = (S >= threshold) & (ids_l[:, None] < ids_r[None, :])
            else:
                # cross-block: each unordered pair appears exactly once
                # (ids never collide across hash blocks) — canonicalize
                # the orientation instead of filtering, or pairs whose
                # lo-block member has the LARGER id would be lost
                mask = (S >= threshold) & (ids_l[:, None] != ids_r[None, :])
        r, c = np.nonzero(mask)
        a, bb = ids_l[r], ids_r[c]
        a, bb = np.minimum(a, bb), np.maximum(a, bb)
        return pd.DataFrame({"id_a": a, "id_b": bb,
                             "cosine": np.round(S[r, c], round_to)})

    return (tagged
            .groupBy(F.col("_p.lo"), F.col("_p.hi"))
            .applyInPandas(
                gemm,
                schema=f"id_a {id_sql_type}, id_b {id_sql_type}, "
                       "cosine double"))
