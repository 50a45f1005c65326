"""Language-ID tests: perfect separation on a corpus with distinct
character distributions; determinism of profiles and predictions."""

import numpy as np
import pytest

from sgp_sketch import text as T


@pytest.fixture(scope="module")
def lang_corpus(spark):
    """Three synthetic 'languages' with disjoint alphabets."""
    rng = np.random.default_rng(31)
    alphabets = {"aa": "abcde", "bb": "klmno", "cc": "uvwxy"}
    rows = []
    i = 0
    for lang, alpha in alphabets.items():
        for _ in range(40):
            words = ["".join(rng.choice(list(alpha), size=5))
                     for _ in range(12)]
            rows.append((i, " ".join(words), lang))
            i += 1
    return spark.createDataFrame(rows, "doc_id long, text string, lang string")


def test_langid_separable(spark, lang_corpus):
    profiles = T.train_language_profiles(lang_corpus, top=80)
    assert set(profiles) == {"aa", "bb", "cc"}
    pred = T.classify_language(lang_corpus, profiles).toPandas()
    assert (pred.lang == pred.pred_lang).mean() == 1.0


def test_langid_deterministic(spark, lang_corpus):
    p1 = T.train_language_profiles(lang_corpus, top=50)
    p2 = T.train_language_profiles(lang_corpus, top=50)
    assert p1 == p2
    a = T.classify_language(lang_corpus, p1).toPandas().sort_values("doc_id")
    b = T.classify_language(lang_corpus, p2).toPandas().sort_values("doc_id")
    assert (a.pred_lang.to_numpy() == b.pred_lang.to_numpy()).all()


def test_langid_handles_short_text(spark):
    df = spark.createDataFrame([(0, "ab", "aa"), (1, "", "bb")],
                               "doc_id long, text string, lang string")
    profiles = {"aa": ["abc", "bcd"], "bb": ["klm"]}
    out = T.classify_language(df, profiles).collect()
    assert all(r["pred_lang"] in ("aa", "bb") for r in out)


def test_stratified_sample_deterministic(spark):
    from sgp_sketch.text import sample_stratified

    rows = [(f"d{i}", f"g{i % 3}") for i in range(100)]
    df = spark.createDataFrame(rows, "doc_id string, source string")
    a = sample_stratified(df, 5).toPandas().sort_values("doc_id")
    b = sample_stratified(df.repartition(13), 5).toPandas().sort_values("doc_id")
    assert a.doc_id.tolist() == b.doc_id.tolist()  # partitioning-invariant
    assert (a.groupby("source").size() == 5).all()
    c = sample_stratified(df, 5, salt=1).toPandas()
    assert set(c.doc_id) != set(a.doc_id)  # salt selects a different draw


def test_stratified_sample_caps_at_group_size(spark):
    from sgp_sketch.text import sample_stratified

    df = spark.createDataFrame([("a", "g"), ("b", "g")],
                               "doc_id string, source string")
    assert sample_stratified(df, 10).count() == 2


def test_curation_pipeline_stages(spark):
    """Composed curation pipeline: funnel counts are monotone, the sample
    is capped and deterministic, and near-dup removal keeps the lower
    doc_id of each removed pair."""
    from sgp_sketch.pipeline import curate_corpus

    docs = spark.read.parquet("/root/testdata/sf0.001/documents.parquet")
    out = curate_corpus(docs, sample_per_source=5)
    funnel = {r["source"]: r for r in out["funnel"].collect()}
    for s, r in funnel.items():
        assert (r["n_input"] >= r["n_exact"] >= r["n_near"]
                >= r["n_quality"] >= r["n_sampled"]), (s, r)
        assert r["n_sampled"] == min(5, r["n_quality"])
    # deterministic: second run samples the same doc_ids
    ids1 = sorted(r["doc_id"] for r in out["sampled"].collect())
    out2 = curate_corpus(docs, sample_per_source=5)
    ids2 = sorted(r["doc_id"] for r in out2["sampled"].collect())
    assert ids1 == ids2
    out["unpersist"]()
    out2["unpersist"]()


def test_curation_funnel_single_pass(spark):
    """The funnel must read PERSISTED stages, not re-derive them: without
    the stage caches the exact-dedup window runs ~3-4x and the LSH
    candidate join ~3x — several redundant corpus passes at 100 TB.
    Evidence: an accumulator-instrumented doc_id column counts how many
    times the exact-dedup stage actually evaluates (plan-string
    inspection can't prove this — executedPlan inlines cached child
    plans under InMemoryTableScan); measured 3x without persist, must be
    exactly 1x with."""
    from pyspark.storagelevel import StorageLevel

    from sgp_sketch.pipeline import curate_corpus

    from pyspark.sql import functions as F
    from pyspark.sql.functions import pandas_udf

    docs = spark.read.parquet("/root/testdata/sf0.001/documents.parquet")
    n_docs = docs.count()
    acc = spark.sparkContext.accumulator(0)

    @pandas_udf("long")
    def tick(c):
        acc.add(len(c))
        return c

    # instrument doc_id: every branch that derives the exact-dedup stage
    # from scratch must evaluate tick once per doc (the n_input count
    # branch prunes doc_id away, so it doesn't tick)
    out = curate_corpus(docs.withColumn("doc_id", tick("doc_id")),
                        sample_per_source=5)
    try:
        for name in ("exact", "near", "quality", "sampled"):
            assert out[name].storageLevel != StorageLevel.NONE, name
        funnel = {r["source"]: r for r in out["funnel"].collect()}
        assert funnel
        assert acc.value == n_docs, (
            f"exact-dedup stage ran {acc.value / n_docs:.1f}x — the "
            "funnel is recomputing stages instead of reading the caches")
    finally:
        out["unpersist"]()


def test_near_dup_clusters_transitive(spark):
    """A~B and B~C (but not directly A~C) must land in ONE cluster."""
    from sgp_sketch.pipeline import near_dup_clusters

    pairs = spark.createDataFrame(
        [(1, 2), (2, 3), (10, 11)], "doc_a long, doc_b long")
    got = {r["doc_id"]: r["cluster"]
           for r in near_dup_clusters(pairs).collect()}
    assert got == {1: 1, 2: 1, 3: 1, 10: 10, 11: 10}


def test_contamination_known_overlap(spark):
    """Known fixture: one corpus doc shares exactly two distinct 3-grams
    with the benchmark set, one shares none (absent from output)."""
    from sgp_sketch.text import contamination_check

    corpus = spark.createDataFrame(
        [("c1", "a b c d e"),    # grams: abc bcd cde — abc+bcd in bench
         ("c2", "x y z w")],     # no overlap
        "doc_id string, text string")
    bench = spark.createDataFrame(
        [("b1", "a b c d q q q")], "doc_id string, text string")
    got = {r.doc_id: r.n_shared for r in
           contamination_check(corpus, bench).collect()}
    assert got == {"c1": 2}


def test_contamination_plan_broadcasts_bench(spark):
    """The benchmark gram set must broadcast — the corpus side is never
    shuffled for the join (decontamination at 100 TB corpus scale)."""
    from sgp_sketch.text import contamination_check

    docs = spark.read.parquet("/root/testdata/sf0.001/documents.parquet")
    from pyspark.sql import functions as F
    df = contamination_check(docs.filter(F.col("source") != "src0"),
                             docs.filter(F.col("source") == "src0"))
    plan = df._jdf.queryExecution().executedPlan().toString()
    assert "BroadcastHashJoin" in plan


def test_tfidf_top_terms_small(spark):
    """tf*ln(N/df) on a 2-doc corpus: a term present in every doc scores
    0 (ln 1); doc-unique terms rank first."""
    import math

    from sgp_sketch.text import tfidf_top_terms

    df = spark.createDataFrame(
        [("d1", "apple apple shared"), ("d2", "banana shared")],
        "doc_id string, text string")
    got = {(r.doc_id, r.rank): (r.term, r.score)
           for r in tfidf_top_terms(df, k=2).collect()}
    assert got[("d1", 1)] == ("apple", round(2 * math.log(2 / 1), 4))
    assert got[("d1", 2)] == ("shared", 0.0)
    assert got[("d2", 1)] == ("banana", round(math.log(2 / 1), 4))


def test_hash_split_deterministic_and_proportional(spark):
    from sgp_sketch.text import hash_split

    df = spark.createDataFrame([(i,) for i in range(4000)], "doc_id long")
    a = hash_split(df).toPandas()
    b = hash_split(df.repartition(7)).toPandas()
    merged = a.merge(b, on="doc_id", suffixes=("_a", "_b"))
    assert (merged.split_a == merged.split_b).all()  # partition-invariant
    frac = a.split.value_counts(normalize=True)
    assert abs(frac["train"] - 0.8) < 0.03
    assert abs(frac["val"] - 0.1) < 0.02
    assert abs(frac["test"] - 0.1) < 0.02
    # salt selects an independent family
    c = hash_split(df, salt="v2").toPandas().merge(a, on="doc_id",
                                                   suffixes=("_c", "_a"))
    assert (c.split_c != c.split_a).any()


def test_build_vocab_ids_and_cutoff(spark):
    from sgp_sketch.text import build_vocab

    df = spark.createDataFrame(
        [("d1", "b b b a a once"), ("d2", "a b")],
        "doc_id string, text string")
    got = {r.term: (r.cnt, r.doc_freq, r.token_id)
           for r in build_vocab(df, min_count=2).collect()}
    # b: cnt 4 in 2 docs -> id 1; a: cnt 3 in 2 docs -> id 2; once dropped
    assert got == {"b": (4, 2, 1), "a": (3, 2, 2)}


def test_repetition_scores_hand_computed(spark):
    """'a b a b a b' has 4 3-grams, 2 distinct -> dup_frac 0.5; an
    all-distinct doc scores 0; a doc shorter than n is dropped."""
    from sgp_sketch.text import repetition_scores

    df = spark.createDataFrame(
        [("d1", "a b a b a b"), ("d2", "one two three four"), ("d3", "x y")],
        "doc_id string, text string")
    got = {r.doc_id: r.dup_frac for r in repetition_scores(df, n=3).collect()}
    assert got == {"d1": 0.5, "d2": 0.0}
    # the scoring pass is a narrow projection: no exchange in the plan
    plan = repetition_scores(df, n=3)._jdf.queryExecution() \
        .executedPlan().toString()
    assert "Exchange" not in plan


def test_unigram_logprob_hand_computed(spark):
    """Corpus 'a a b' (+1-doc 'b'): p(a)=2/4, p(b)=2/4; doc1 logp =
    avg(ln .5, ln .5, ln .5) = ln .5."""
    import math

    from sgp_sketch.text import unigram_logprob

    df = spark.createDataFrame(
        [("d1", "a a b", "s1"), ("d2", "b", "s1")],
        "doc_id string, text string, source string")
    got = {r.doc_id: r.logp for r in unigram_logprob(df).collect()}
    assert abs(got["d1"] - math.log(0.5)) < 1e-12
    assert abs(got["d2"] - math.log(0.5)) < 1e-12


def test_unigram_logprob_broadcasts_freq_table(spark):
    from sgp_sketch.text import unigram_logprob

    df = spark.createDataFrame(
        [("d1", "a a b", "s1"), ("d2", "b c", "s2")],
        "doc_id string, text string, source string")
    plan = unigram_logprob(df)._jdf.queryExecution().executedPlan().toString()
    assert "BroadcastHashJoin" in plan


def test_pack_sequences_chunk_boundaries(spark):
    """budget=5 over docs of 3/3/3 tokens: starts 0,3,6 -> seqs 0,0,1;
    assignment is partition-invariant."""
    from sgp_sketch.text import pack_sequences

    df = spark.createDataFrame(
        [("a", "w w w", "s"), ("b", "w w w", "s"), ("c", "w w w", "s"),
         ("z", "w w", "t")],
        "doc_id string, text string, source string")
    got = pack_sequences(df, budget=5).toPandas().set_index("doc_id")
    assert got.loc["a", "seq_id"] == 0
    assert got.loc["b", "seq_id"] == 0
    assert got.loc["c", "seq_id"] == 1
    assert got.loc["z", "seq_id"] == 0
    rep = (pack_sequences(df.repartition(5), budget=5)
           .toPandas().set_index("doc_id"))
    assert (rep.seq_id == got.seq_id).all()


def test_curation_repetition_gate(spark):
    """max_dup_frac drops the degenerate repeated doc that passes the
    length gates; default (None) keeps the funnel unchanged."""
    from sgp_sketch.pipeline import curate_corpus

    rows = [("good", " ".join(f"w{i}" for i in range(30)), "s", 150),
            ("loop", " ".join(["spam ham"] * 15), "s", 150)]
    docs = spark.createDataFrame(
        rows, "doc_id string, text string, source string, n_chars long")
    base = curate_corpus(docs, jaccard_threshold=0.99, min_words=20,
                         max_words=40, max_chars_per_word=10.0,
                         sample_per_source=5, persist=False)
    kept = {r.doc_id for r in base["quality"].collect()}
    assert kept == {"good", "loop"}
    gated = curate_corpus(docs, jaccard_threshold=0.99, min_words=20,
                          max_words=40, max_chars_per_word=10.0,
                          max_dup_frac=0.2, sample_per_source=5,
                          persist=False)
    kept = {r.doc_id for r in gated["quality"].collect()}
    assert kept == {"good"}


def test_sample_weighted_deterministic_and_biased(spark):
    """Same draw across partitionings; a dominant weight is (essentially)
    always included; group cap respected."""
    from sgp_sketch.text import sample_weighted

    rows = ([("s", i, 10) for i in range(40)]
            + [("s", 999, 10_000_000), ("t", 7, 5)])
    df = spark.createDataFrame(rows, "source string, doc_id long, n_chars long")
    got = sample_weighted(df, 3, "n_chars").toPandas()
    assert len(got[got.source == "s"]) == 3
    assert 999 in set(got.doc_id)          # P(miss) < 1e-4 at this ratio
    assert set(got[got.source == "t"].doc_id) == {7}  # under-full group
    rep = sample_weighted(df.repartition(7), 3, "n_chars").toPandas()
    assert sorted(rep.doc_id) == sorted(got.doc_id)


def test_token_entropy_known_values(spark):
    from sgp_sketch.text import token_entropy

    rows = [(1, "a a a a"), (2, "a b"), (3, "a a b b"), (4, "a b c d")]
    df = spark.createDataFrame(rows, "doc_id long, text string")
    got = dict(token_entropy(df).collect())
    assert abs(got[1] - 0.0) < 1e-9
    assert abs(got[2] - 1.0) < 1e-9
    assert abs(got[3] - 1.0) < 1e-9
    assert abs(got[4] - 2.0) < 1e-9


def test_normalized_text_expr(spark):
    from pyspark.sql import functions as F

    from sgp_sketch.text import normalized_text_expr

    df = spark.createDataFrame(
        [("  Hello,   World!!  ",), ("hello world",)], "text string")
    vals = [r[0] for r in df.select(normalized_text_expr()).collect()]
    assert vals == ["hello world", "hello world"]

def test_redact_terms_counts_and_chars(spark):
    from sgp_sketch.text import redact_terms

    rows = [("s1", "key value keyvalue monkey key"),
            ("s1", "no hits here"),
            ("s2", "hash")]
    df = spark.createDataFrame(rows, "source string, text string")
    out = {r.grp: r for r in
           redact_terms(df, ("hash", "key", "value")).collect()}
    # whole words only: 'keyvalue' and 'monkey' must NOT match
    assert out["s1"].n_redactions == 3 and out["s1"].docs_hit == 1
    assert out["s1"].n_docs == 2
    # each hit swaps len(term) for len('<REDACTED>')=10 chars
    assert out["s1"].chars_removed == (3 + 5 + 3) - 3 * 10
    assert out["s2"].n_redactions == 1 and out["s2"].chars_removed == 4 - 10


def test_source_jaccard_exact_small(spark):
    from sgp_sketch.text import source_jaccard

    rows = [("a", "x y z"), ("a", "x"),       # V_a = {x,y,z}
            ("b", "y z w"),                   # V_b = {y,z,w}
            ("c", "q")]                       # V_c disjoint
    df = spark.createDataFrame(rows, "source string, text string")
    out = {(r.src_a, r.src_b): r for r in source_jaccard(df).collect()}
    ab = out[("a", "b")]
    assert ab.n_common == 2 and ab.n_union == 4 and ab.jaccard == 0.5
    # disjoint pairs produce no row at all (inner join on shared tokens)
    assert ("a", "c") not in out and ("b", "c") not in out

def test_pmi_bigrams_known_values(spark):
    import math

    from sgp_sketch.text import pmi_bigrams

    # corpus: "a b" x 4, "a c" x 2 -> N = 12 unigrams
    rows = [("a b",)] * 4 + [("a c",)] * 2
    df = spark.createDataFrame(rows, "text string")
    out = {(r.w1, r.w2): r for r in
           pmi_bigrams(df, min_count=1, k=10).collect()}
    # c_a=6, c_b=4, c_ab("a","b")=4: pmi = ln(4*12/(6*4))
    assert out[("a", "b")].c_ab == 4
    assert abs(out[("a", "b")].pmi
               - round(math.log(4 * 12 / (6 * 4)), 6)) <= 1e-6
    assert out[("a", "c")].c_ab == 2
    assert abs(out[("a", "c")].pmi
               - round(math.log(2 * 12 / (6 * 2)), 6)) <= 1e-6
    # no pair spans documents; single-word docs produce no bigrams
    assert len(out) == 2


def test_pmi_bigrams_min_count_and_k(spark):
    from sgp_sketch.text import pmi_bigrams

    rows = [("x y x y x y",)] + [("p q",)]  # xy:3 yx:2, pq:1
    df = spark.createDataFrame(rows, "text string")
    out = pmi_bigrams(df, min_count=2, k=1).collect()
    assert len(out) == 1  # k limit after the min_count filter
    assert (out[0].w1, out[0].w2) in {("x", "y"), ("y", "x")}

def test_redact_terms_escapes_metacharacters(spark):
    """Regression: denylist terms are literals — 'c++' must not crash the
    regex compile and 'a.b' must not match 'axb'."""
    from sgp_sketch.text import redact_terms

    rows = [("s", "use c++ today"), ("s", "axb vs a.b c")]
    df = spark.createDataFrame(rows, "source string, text string")
    # must not crash on 'c++' (escaped); 'a.b' must hit the literal only,
    # never 'axb'. ('c++' itself cannot match under \b semantics — its
    # trailing '+' touches a space, not a word char — documented.)
    out = {r.grp: r for r in
           redact_terms(df, ("c++", "a.b")).collect()}
    assert out["s"].n_redactions == 1 and out["s"].docs_hit == 1
    assert out["s"].n_docs == 2


def test_redact_terms_empty_denylist_is_noop(spark):
    """Regression (ADVICE r03): an empty terms iterable must redact
    nothing — the unguarded alternation r"\\b(?:)\\b" matched the empty
    string at every word boundary."""
    from sgp_sketch.text import redact_terms

    df = spark.createDataFrame(
        [("s1", "keep every word intact"), ("s2", "and here too")],
        ["source", "text"])
    out = {r.grp: r for r in redact_terms(df, ()).collect()}
    assert out["s1"].n_redactions == 0 and out["s1"].docs_hit == 0
    assert out["s1"].chars_removed == 0 and out["s1"].n_docs == 1
    assert out["s2"].n_redactions == 0


def test_redact_terms_null_text_counts_zero(spark):
    """size(regexp_extract_all(NULL)) is -1 in non-ANSI Spark: a NULL text
    row must contribute 0 redactions, not subtract one."""
    from sgp_sketch.text import redact_terms

    df = spark.createDataFrame(
        [("s", "the password is secret and secret"), ("s", None)],
        "source string, text string")
    row = redact_terms(df, ["secret"]).first()
    assert row["n_redactions"] == 2
    assert row["docs_hit"] == 1
    assert row["n_docs"] == 2


def test_hash_split_zero_weight_tail(spark):
    """A zero-weight tail split (cum weight reaches 1.0) must not corrupt
    the 6-char hex compare — 'val' keeps its mass, 'test' gets ~none."""
    from sgp_sketch.text import hash_split

    df = spark.range(2000).selectExpr("cast(id as string) doc_id")
    got = {r["split"]: r["n"] for r in
           hash_split(df, {"train": 0.9, "val": 0.1, "test": 0.0})
           .groupBy("split").count().withColumnRenamed("count", "n")
           .collect()}
    assert got.get("test", 0) <= 1
    assert abs(got["train"] - 1800) < 120
    assert abs(got.get("val", 0) - 200) < 80
    import pytest as _pytest
    with _pytest.raises(ValueError, match="sum to 1"):
        hash_split(df, {"a": 0.5, "b": 0.2})


def test_curate_corpus_null_text_not_mass_deduped(spark):
    """NULL-text docs must pass exact dedup unconditionally (md5(NULL)
    would collapse them into one 'duplicate' group) and die at the
    quality gate instead, so the funnel attributes the drop honestly."""
    from sgp_sketch.pipeline import curate_corpus

    long_text = " ".join(f"w{i}" for i in range(40))
    docs = spark.createDataFrame(
        [("a", "s", long_text, len(long_text)),
         ("b", "s", None, 0), ("c", "s", None, 0), ("d", "s", None, 0)],
        "doc_id string, source string, text string, n_chars long")
    out = curate_corpus(docs, min_words=5, max_words=100,
                        sample_per_source=10, persist=False)
    funnel = out["funnel"].collect()[0]
    assert funnel["n_exact"] == 4   # nothing removed as an exact dup
    assert funnel["n_quality"] == 1  # NULLs die at the quality gate


def test_bigram_logprob_hand_computed(spark):
    """Corpus docs 'a b a b' and 'a b': bigrams (a,b)x3, (b,a)x1; prefix
    counts a->3, b->1; V=2 (add-1 smoothing denominator). Doc2's single
    bigram (a,b): P = (3+1)/(3+2) = 0.8; doc1 = avg of ln .8, ln(2/3),
    ln .8."""
    import math

    from sgp_sketch.text import bigram_logprob

    df = spark.createDataFrame(
        [("d1", "a b a b", "s1"), ("d2", "a b", "s1")],
        "doc_id string, text string, source string")
    got = {r.doc_id: r.logp for r in bigram_logprob(df).collect()}
    assert abs(got["d2"] - math.log(0.8)) < 1e-12
    exp_d1 = (2 * math.log(0.8) + math.log((1 + 1) / (1 + 2))) / 3
    assert abs(got["d1"] - exp_d1) < 1e-12


def test_bigram_logprob_short_docs_drop_out(spark):
    from sgp_sketch.text import bigram_logprob

    df = spark.createDataFrame(
        [("d1", "a b", "s1"), ("d2", "solo", "s1")],
        "doc_id string, text string, source string")
    got = {r.doc_id for r in bigram_logprob(df).collect()}
    assert got == {"d1"}


def test_bigram_logprob_broadcasts_count_tables(spark):
    from sgp_sketch.text import bigram_logprob

    df = spark.createDataFrame(
        [("d1", "a b a", "s1"), ("d2", "b c d", "s2")],
        "doc_id string, text string, source string")
    plan = bigram_logprob(df)._jdf.queryExecution().executedPlan().toString()
    assert "BroadcastHashJoin" in plan
