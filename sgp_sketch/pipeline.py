"""End-to-end corpus curation: the composed training-data pipeline a
100-TB corpus goes through before tokenization, built from this library's
operators — every stage deterministic, distributed, and (at test scale)
exactly reproducible by a DuckDB oracle:

  1. exact dedup        keep the lowest doc_id per md5(text) (global)
  2. near-dup removal   MinHash+LSH candidates, EXACT shingle-Jaccard
                        verify (dedup.minhash_near_duplicates
                        exact_verify=True); drop the higher doc_id of
                        every pair at/above the threshold
  3. quality filter     word-count band + chars-per-word cap (declarative
                        predicates — the length/punctuation-style gates);
                        optional Gopher-style repetition gate
                        (max_dup_frac → text.dup_frac_expr, default off)
  4. stratified sample  deterministic hash-rank per source
                        (text.sample_stratified, no rand())

Scale shape: stage 1 is one hash shuffle; stage 2 is the banded LSH join
(never all-pairs); stages 3-4 are a filter and one ranking window. The
funnel (per-source row counts after each stage) is the pipeline's audit
artifact — drops are attributable to a stage, never silent.
"""

from __future__ import annotations


def near_dup_clusters(pairs, id_a: str = "doc_a", id_b: str = "doc_b"):
    """Transitive duplicate clustering: union the verified near-dup PAIRS
    into connected components, so A~B and B~C land in ONE cluster even
    when A~C itself is below threshold — the textbook
    cluster-then-keep-representative dedup, vs. the simpler drop-doc_b
    rule.

    Uses graph.connected_components_bigstar (large-star/small-star,
    SoCC'14): near-dup graphs built at a loose threshold routinely chain
    A~B~C~…, and min-label propagation pays one shuffle round per chain
    link (the diameter) where the star algorithm pays O(log n) rounds —
    the label semantics (cluster = min reachable doc_id) are identical,
    parity-gated in tests/test_graph.py.

    → DataFrame(doc_id, cluster) where cluster = min doc_id reachable in
    the pair graph; only docs that appear in some pair are returned
    (everything else is its own singleton cluster by definition)."""
    from pyspark.sql import functions as F

    from .graph import connected_components_bigstar

    edges = pairs.select(F.col(id_a).alias("src"), F.col(id_b).alias("dst"))
    return (connected_components_bigstar(edges)
            .withColumnRenamed("id", "doc_id")
            .withColumnRenamed("component", "cluster"))


def curate_corpus(docs, jaccard_threshold: float = 0.8,
                  min_words: int = 20, max_words: int = 90,
                  max_chars_per_word: float = 8.0,
                  max_dup_frac: float | None = None,
                  sample_per_source: int = 10, persist: bool = True):
    """documents(doc_id, text, source, n_chars, ...) → dict of stage
    DataFrames: {"exact", "near", "quality", "sampled", "funnel",
    "unpersist"}. `funnel` has one row per source: n_input, n_exact,
    n_near, n_quality, n_sampled.

    With `persist` (default) every stage is persisted MEMORY_AND_DISK
    (lazily — nothing materializes until an action runs), so the funnel's
    five per-source counts each read a cached stage instead of re-deriving
    it: one corpus-wide pass total, where the unpersisted composition would
    re-run the exact-dedup window ~4× and the LSH candidate join ~3× — at
    100 TB that is several redundant passes over the corpus. Call
    `out["unpersist"]()` once the stage DataFrames are consumed to release
    executor storage (or pass persist=False to keep the plan pure, e.g.
    when only ONE stage output will be read exactly once)."""
    from pyspark.sql import functions as F
    from pyspark.sql.window import Window

    from . import dedup
    from .text import sample_stratified

    def _persist(df):
        return df.persist() if persist else df  # default MEMORY_AND_DISK

    # NULL-text docs pass exact dedup unconditionally: md5(NULL) is NULL,
    # so they would all collapse into ONE window partition and be deleted
    # as "duplicates" of each other — same principle as
    # dedup.dedup_exact_normalized's empty-key rule (the key says "the
    # hash can't see this document", not "these are identical"); the
    # quality gate downstream is what legitimately drops them
    w = Window.partitionBy(F.md5("text")).orderBy("doc_id")
    exact = _persist(docs.withColumn(
        "_r", F.when(F.col("text").isNull(), F.lit(1))
               .otherwise(F.row_number().over(w)))
        .filter(F.col("_r") == 1).drop("_r"))

    aux_caches: list = []
    pairs = dedup.minhash_near_duplicates(
        exact, threshold=jaccard_threshold, exact_verify=True,
        caches=aux_caches)
    removed = pairs.select(F.col("doc_b").alias("doc_id")).distinct()
    near = _persist(exact.join(removed, "doc_id", "left_anti"))

    words = F.size(F.split(F.col("text"), " "))
    quality_pred = (words.between(min_words, max_words)
                    & (F.col("n_chars") / words <= max_chars_per_word))
    if max_dup_frac is not None:
        # optional Gopher-style repetition gate (text.dup_frac_expr):
        # pure array math, adds no shuffle to the quality stage
        from .text import dup_frac_expr

        quality_pred = quality_pred & (dup_frac_expr() <= max_dup_frac)
    quality = _persist(near.filter(quality_pred))

    sampled = _persist(sample_stratified(quality, sample_per_source))

    def counts(df, name):
        return df.groupBy("source").agg(F.count("*").alias(name))

    funnel = (counts(docs, "n_input")
              .join(counts(exact, "n_exact"), "source", "left")
              .join(counts(near, "n_near"), "source", "left")
              .join(counts(quality, "n_quality"), "source", "left")
              .join(counts(sampled, "n_sampled"), "source", "left")
              .fillna(0))
    stages = (exact, near, quality, sampled)

    def unpersist():
        if persist:
            for df in stages:
                df.unpersist()
        for df in aux_caches:  # the LSH signature cache
            df.unpersist()

    return {"exact": exact, "near": near, "quality": quality,
            "sampled": sampled, "funnel": funnel, "unpersist": unpersist}
