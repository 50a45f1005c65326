"""Text-analysis operators for training-data pipelines: character-n-gram
language identification, plus the quality/statistics helpers the
`__spark_entry__` queries expose declaratively.

Language-ID is the classic n-gram-profile heuristic (Cavnar & Trenkle
style): per label, a profile of the most frequent character trigrams,
trained declaratively (explode → count → rank window); classification
scores a document's trigram set against each profile with
`array_intersect` — everything JVM-side, no Python in either phase. The
profile table is tiny (labels × top_n strings) and rides into the
classifier as literal arrays, the broadcast-small-dim pattern (J3)."""

from __future__ import annotations


def sample_stratified(df, n_per_group: int, group_col: str = "source",
                      key_col: str = "doc_id", salt: int = 0):
    """Deterministic per-group sample: rank rows by `xxhash64(salt, key)`
    within each group, keep the first `n_per_group`. Hash-order ranking is
    a uniform pseudo-random draw that is reproducible across runs and
    cluster sizes — the training-data mixing primitive (no
    `rand()`/`sample()`: those break retry/resume determinism).

    At scale the window ranks within groups after one shuffle on the group
    key; for very hot groups switch to an approximate pre-filter
    (`pmod(hash, K) < K*n/size`) before the exact window.
    """
    from pyspark.sql import functions as F
    from pyspark.sql.window import Window

    h = F.xxhash64(F.lit(salt), F.col(key_col))
    w = Window.partitionBy(group_col).orderBy(h, F.col(key_col))
    return (df.withColumn("_r", F.row_number().over(w))
            .filter(F.col("_r") <= n_per_group).drop("_r"))


def sample_weighted(df, n_per_group: int, weight_col: str,
                    group_col: str = "source", key_col: str = "doc_id",
                    salt: int = 0):
    """Deterministic weighted sample WITHOUT replacement per group
    (Efraimidis & Spirakis 2006, A-ES): each row draws a uniform u from
    a salted md5 of its key and is ranked by ln(u)/w — the top
    `n_per_group` per group win, with inclusion probability
    proportional to `weight_col` (e.g. document length for
    proportional-to-size corpus mixing). Like `sample_stratified`, the
    draw is a hash, not `rand()`: reproducible across runs, retries and
    cluster sizes, and exactly reproducible by any engine with md5.

    One shuffle on the group key; the md5/ln ranking key is computed
    map-side (and Spark plans the rank filter as a partial
    WindowGroupLimit, so only ~n_per_group rows per group per map task
    reach the shuffle — PLANS.md).

    Rows with NULL or non-positive weight are EXCLUDED from the draw —
    they carry no sampling mass, and without the guard a corrupt
    negative weight would flip the key's sign and deterministically win
    every draw."""
    from pyspark.sql import functions as F
    from pyspark.sql.window import Window

    hx = F.substring(F.md5(F.concat_ws(":", F.lit(str(salt)),
                                       F.col(key_col).cast("string"))), 1, 8)
    u = ((F.conv(hx, 16, 10).cast("double") + F.lit(0.5))
         / F.lit(float(1 << 32)))
    es = F.log(u) / F.col(weight_col).cast("double")  # monotone in u^(1/w)
    w = Window.partitionBy(group_col).orderBy(F.desc(es), F.col(key_col))
    return (df.filter(F.col(weight_col) > 0)
            .withColumn("_r", F.row_number().over(w))
            .filter(F.col("_r") <= n_per_group).drop("_r"))


def token_entropy(df, id_col: str = "doc_id", text_col: str = "text",
                  out_col: str = "entropy"):
    """Per-document Shannon entropy (bits) of the word distribution —
    the diversity twin of `repetition_scores` (low entropy = templated /
    repetitive text, a standard corpus-quality gate). Fully declarative:
    explode → per-(doc, word) counts → per-doc aggregate, using
    H = log2(n) − Σ c·log2(c) / n so a single pass over the counts
    suffices (map-side partial aggregation applies to both groupBys).

    → DataFrame(id_col, out_col double)."""
    from pyspark.sql import functions as F

    terms = df.select(id_col, F.explode(F.split(F.col(text_col), " "))
                      .alias("_w"))
    cnt = terms.groupBy(id_col, "_w").agg(F.count("*").alias("_c"))
    n = F.sum("_c").cast("double")
    return cnt.groupBy(id_col).agg(
        (F.log2(n) - F.sum(F.col("_c") * F.log2("_c")) / n).alias(out_col))


def normalized_text_expr(text_col: str = "text"):
    """C4-style canonical form of a document: lowercase, then every run
    of NON-alphanumeric characters (punctuation, newlines, tabs, spaces
    alike) collapses to a single space, trimmed. The 'fuzzy-exact' dedup
    key — catches re-crawls that differ only in case, punctuation or
    spacing, which raw-hash dedup misses (Raffel et al. 2020 §2.2 use
    the three-sentence-span variant of the same idea). Replacing the run
    with a space (not deleting it) keeps 'hello\\nworld' == 'hello world'
    != 'helloworld'. Text with no ASCII alphanumerics at all (CJK,
    emoji-only, …) normalizes to '' — see dedup_exact_normalized for why
    such rows are exempt from dedup."""
    from pyspark.sql import functions as F

    t = F.regexp_replace(F.lower(F.col(text_col)), "[^a-z0-9]+", " ")
    return F.trim(t)


def _char_trigrams(text_col, n: int = 3):
    from pyspark.sql import functions as F

    t = F.lower(text_col)
    idx = F.when(F.length(t) >= n,
                 F.sequence(F.lit(1), F.length(t) - (n - 1))
                 ).otherwise(F.array().cast("array<int>"))
    return F.array_distinct(
        F.transform(idx, lambda i: t.substr(i, F.lit(n))))


def train_language_profiles(df, text_col: str = "text",
                            label_col: str = "lang", n: int = 3,
                            top: int = 150) -> dict:
    """label → list of its `top` most frequent character n-grams
    (document-frequency ranked, deterministic tie-break by gram)."""
    from pyspark.sql import functions as F
    from pyspark.sql.window import Window

    grams = (df.filter(F.col(label_col).isNotNull())
             .select(F.col(label_col).alias("label"),
                     F.explode(_char_trigrams(F.col(text_col), n))
                     .alias("g")))
    counts = grams.groupBy("label", "g").count()
    w = Window.partitionBy("label").orderBy(F.desc("count"), "g")
    ranked = (counts.withColumn("r", F.row_number().over(w))
              .filter(F.col("r") <= top))
    out: dict[str, list] = {}
    for row in ranked.collect():
        out.setdefault(row["label"], []).append(row["g"])
    return out


def classify_language(df, profiles: dict, text_col: str = "text",
                      out_col: str = "pred_lang", n: int = 3):
    """Add `pred_lang`: the label whose profile shares the most n-grams
    with the document (overlap normalized by profile size; deterministic
    lowest-label tie-break via the ordered greatest(...) chain)."""
    from pyspark.sql import functions as F

    doc_grams = _char_trigrams(F.col(text_col), n)
    with_grams = df.withColumn("_g", doc_grams)
    scores = [
        (label,
         F.size(F.array_intersect(
             F.col("_g"),
             F.array(*[F.lit(g) for g in grams]))) / F.lit(len(grams)))
        for label, grams in sorted(profiles.items())
    ]
    # argmax over a fixed label order: fold with strict > so the first
    # (lowest) label wins ties — reproducibility (SURVEY §7.4.2)
    pred = F.lit(sorted(profiles)[0])
    best = scores[0][1]
    for label, sc in scores[1:]:
        pred = F.when(sc > best, F.lit(label)).otherwise(pred)
        best = F.greatest(best, sc)
    return with_grams.withColumn(out_col, pred).drop("_g")


# ---------------------------------------------------- decontamination / tfidf

def word_ngram_strings(df, text_col: str = "text", n: int = 3,
                       out_col: str = "grams"):
    """doc → array<string> of distinct word n-grams in STRING form —
    the cross-engine-comparable twin of dedup.word_shingles (which hashes
    the grams for LSH). Entirely JVM-side: split → sliding slice →
    concat_ws → array_distinct."""
    from pyspark.sql import functions as F

    words = F.split(F.col(text_col), " ")
    idx = F.when(F.size(words) >= n,
                 F.sequence(F.lit(1), F.size(words) - (n - 1))
                 ).otherwise(F.array().cast("array<int>"))
    grams = F.transform(idx, lambda i: F.concat_ws(" ", F.slice(words, i, n)))
    return df.withColumn(out_col, F.array_distinct(grams))


def contamination_check(corpus, bench, id_col: str = "doc_id",
                        text_col: str = "text", n: int = 3):
    """Benchmark decontamination: per corpus document, the number of
    distinct word n-grams it shares with the benchmark set — the standard
    pre-training hygiene pass that catches eval data leaked into the
    corpus (exact n-gram collision, the methodology used for public LLM
    decontamination reports).

    → DataFrame(id_col, n_shared) for documents with ≥ 1 shared gram.

    Scale shape: benchmark suites are MB-sized against a 100-TB corpus,
    so the distinct benchmark gram set is broadcast and the corpus side
    streams through a broadcast hash join — no shuffle of corpus data;
    the aggregation shuffles only the colliding (doc, gram) pairs."""
    from pyspark.sql import functions as F

    from .session import fan_out

    cg = (word_ngram_strings(fan_out(corpus.select(id_col, text_col)),
                             text_col, n)
          .select(id_col, F.explode("grams").alias("g")))
    bg = (word_ngram_strings(bench.select(text_col), text_col, n)
          .select(F.explode("grams").alias("g")).distinct())
    # grams are distinct per doc already (array_distinct) → count(*) is
    # the distinct shared-gram count
    return (cg.join(F.broadcast(bg), "g")
            .groupBy(id_col).agg(F.count("*").alias("n_shared")))


def tfidf_top_terms(df, id_col: str = "doc_id", text_col: str = "text",
                    k: int = 3):
    """Top-k characteristic terms per document by tf·idf
    (idf = ln(N/df), no smoothing), ties broken by term — the classic
    keyword-extraction / quality-signal pass, fully declarative AND
    fully lazy: N is a one-row aggregate broadcast into the plan (the
    scalar-subquery shape), not an eager driver-side count, so building
    this DataFrame runs no job and repeated invocations share the scan.

    → DataFrame(id_col, term, score double, rank int)."""
    from pyspark.sql import functions as F
    from pyspark.sql.window import Window

    n_docs = df.agg(F.countDistinct(id_col).cast("double").alias("_n"))
    terms = (df.select(id_col, F.explode(F.split(F.col(text_col), " "))
                       .alias("term")))
    tf = terms.groupBy(id_col, "term").agg(F.count("*").alias("tf"))
    dfreq = tf.groupBy("term").agg(F.count("*").alias("df"))
    w = Window.partitionBy(id_col).orderBy(F.desc("score"), "term")
    return (tf.join(dfreq, "term").crossJoin(F.broadcast(n_docs))
            .withColumn("score", F.col("tf")
                        * F.log(F.col("_n") / F.col("df")))
            .withColumn("rank", F.row_number().over(w).cast("int"))
            .filter(F.col("rank") <= k)
            .select(id_col, "term", F.round("score", 4).alias("score"),
                    "rank"))


def dup_frac_expr(text_col: str = "text", n: int = 3):
    """Column expression: the duplicate word-n-gram fraction of one
    document (0.0 for documents shorter than n words — nothing repeats).
    Pure per-row array math; shared by `repetition_scores` and the
    pipeline's optional repetition gate."""
    from pyspark.sql import functions as F

    words = F.split(F.col(text_col), " ")
    idx = F.sequence(F.lit(1), F.size(words) - (n - 1))
    grams = F.transform(idx, lambda i: F.concat_ws(" ", F.slice(words, i, n)))
    frac = (F.lit(1.0) - F.size(F.array_distinct(grams))
            / F.size(grams).cast("double"))
    return F.when(F.size(words) >= n, frac).otherwise(F.lit(0.0))


def repetition_scores(df, text_col: str = "text", n: int = 3,
                      out_col: str = "dup_frac"):
    """Gopher-style repetition quality signal (Rae et al. 2021, §A1.1):
    per-document fraction of DUPLICATE word n-grams,
    ``1 − distinct(grams)/total(grams)``. High values flag boilerplate /
    degenerate generations — a standard pre-training filter rule.

    Documents with fewer than `n` words are dropped (no gram exists).

    Scale shape: the score is pure per-row array math (split → sliding
    slice → `size`/`array_distinct`) — a narrow projection with NO
    explode and NO shuffle, so it streams through the corpus scan at
    100 TB; only whatever aggregation the caller adds shuffles."""
    from pyspark.sql import functions as F

    words = F.split(F.col(text_col), " ")
    return (df.filter(F.size(words) >= n)
            .withColumn(out_col, dup_frac_expr(text_col, n)))


def unigram_logprob(df, id_col: str = "doc_id", text_col: str = "text",
                    keep_cols=("source",), out_col: str = "logp"):
    """Per-document mean token log-probability under the corpus's own
    unigram language model — the classic cheap fluency/quality score
    (CCNet-style perplexity filtering with a unigram LM; Wenzek et al.
    2020 use a KenLM, the pipeline shape is identical).

    → df(id_col, *keep_cols, logp) where
      logp = avg over tokens of ln(count(token)/total_tokens).

    Scale shape: one corpus pass builds the frequency table (explode →
    groupBy word — ≪ corpus after aggregation), which is BROADCAST into
    the scoring join so the corpus side never shuffles; the per-doc agg
    shuffles on doc_id only. For vocabularies too big to broadcast
    (≫10⁷ terms) drop the hint and let AQE pick a shuffle join."""
    from pyspark.sql import functions as F

    words = df.select(id_col, *keep_cols,
                      F.explode(F.split(F.col(text_col), " ")).alias("word"))
    freq = words.groupBy("word").agg(F.count("*").alias("cnt"))
    tot = freq.agg(F.sum("cnt").cast("double").alias("_tot"))
    return (words.join(F.broadcast(freq), "word")
            .crossJoin(F.broadcast(tot))
            .groupBy(id_col, *keep_cols)
            .agg(F.avg(F.log(F.col("cnt") / F.col("_tot"))).alias(out_col)))


def bigram_logprob(df, id_col: str = "doc_id", text_col: str = "text",
                   keep_cols=("source",), alpha: float = 1.0,
                   out_col: str = "logp"):
    """Per-document mean CONDITIONAL token log-probability under the
    corpus's own add-α-smoothed bigram language model — the next step up
    from `unigram_logprob` toward the KenLM shape CCNet actually uses
    (Wenzek et al. 2020): a document scores well only if its word
    SEQUENCES are typical, not just its word choices, which is exactly
    what separates fluent text from shuffled-bag-of-words boilerplate.

        P(w₂ | w₁) = (c(w₁w₂) + α) / (c_prefix(w₁) + α·V)

    with c(w₁w₂) the corpus bigram count, c_prefix(w₁) the count of w₁
    as a bigram prefix, and V the corpus vocabulary size (the smoothing
    denominator — every unseen continuation still gets mass α).

    → df(id_col, *keep_cols, logp) where logp = avg over the doc's
    adjacent pairs of ln P(w₂|w₁); docs with < 2 tokens have no bigrams
    and drop out (no sequence evidence either way).

    Scale shape: adjacent pairs come from one arrays_zip(slice, slice) +
    explode (pure JVM, no UDF — same extraction as pmi_bigrams). The
    PREFIX count table and the vocab total are V-bounded and broadcast.
    The bigram count table is NOT vocab-bounded — distinct bigrams grow
    roughly linearly with corpus size — so its join onto the instance
    table is left unhinted: AQE broadcasts it at small scale and falls
    back to a shuffle join on (w1, w2) when it outgrows the broadcast
    limit (the correct plan — both sides are then keyed aggregates, and
    the per-doc final agg still shuffles on doc_id only)."""
    from pyspark.sql import functions as F

    toks = df.select(id_col, *keep_cols,
                     F.split(F.col(text_col), " ").alias("l"))
    z = F.arrays_zip(
        F.slice(F.col("l"), 1, F.greatest(F.size("l") - 1, F.lit(0))),
        F.slice(F.col("l"), 2, F.greatest(F.size("l") - 1, F.lit(0))))
    inst = (toks.select(id_col, *keep_cols, F.explode(z).alias("p"))
            .select(id_col, *keep_cols,
                    F.col("p.0").alias("w1"), F.col("p.1").alias("w2")))
    big = inst.groupBy("w1", "w2").agg(F.count(F.lit(1)).alias("c_ab"))
    pre = big.groupBy("w1").agg(F.sum("c_ab").alias("c_pre"))
    vocab = (df.select(F.explode(F.split(F.col(text_col), " ")).alias("w"))
             .agg(F.countDistinct("w").cast("double").alias("_v")))
    a = F.lit(float(alpha))
    return (inst.join(big, ["w1", "w2"])
            .join(F.broadcast(pre), "w1")
            .crossJoin(F.broadcast(vocab))
            .groupBy(id_col, *keep_cols)
            .agg(F.avg(F.log((F.col("c_ab") + a)
                             / (F.col("c_pre") + a * F.col("_v"))))
                 .alias(out_col)))


def hash_split(df, weights=None, id_col: str = "doc_id", salt: str = "",
               out_col: str = "split"):
    """Deterministic, ENGINE-REPRODUCIBLE train/val/test assignment:
    md5(id || salt) compared lexicographically against cumulative hex
    thresholds — no rand(), no engine-specific hash, so any system with
    md5 (Spark, DuckDB, Presto, pandas) derives the identical split; the
    assignment is a pure projection (no shuffle, no state), stable under
    repartitioning, and new documents never move existing ones between
    splits. `salt` selects an independent split family.

    weights: ordered {name: fraction} (default train/val/test .8/.1/.1;
    fractions must sum to 1)."""
    from pyspark.sql import functions as F

    weights = weights or {"train": 0.8, "val": 0.1, "test": 0.1}
    if abs(sum(weights.values()) - 1.0) > 1e-9:
        raise ValueError(f"split fractions must sum to 1, got {weights}")
    names = list(weights)
    cuts, cum = [], 0.0
    for name in names[:-1]:
        cum += weights[name]
        # clamp: a cumulative weight reaching 1.0 would format to the
        # 7-char "1000000", corrupting the 6-char lexicographic compare
        # (possible with a zero-weight tail split, e.g. test: 0.0)
        cuts.append((name, format(min(int(cum * 16 ** 6), 16 ** 6 - 1),
                                  "06x")))
    prefix = F.substring(
        F.md5(F.concat_ws("", F.col(id_col).cast("string"), F.lit(salt))),
        1, 6)
    expr = F.lit(names[-1])
    for name, cut in reversed(cuts):
        expr = F.when(prefix < F.lit(cut), F.lit(name)).otherwise(expr)
    return df.withColumn(out_col, expr)


def build_vocab(df, id_col: str = "doc_id", text_col: str = "text",
                min_count: int = 2):
    """Tokenizer-style vocabulary construction: term → corpus count,
    document frequency, and a STABLE contiguous token id (rank by count
    desc, term asc — deterministic across runs and partitionings).
    Terms under `min_count` are dropped (the OOV cutoff).

    → DataFrame(term, cnt, doc_freq, token_id int).

    Scale note: the ranking window is a single ordered pass over the
    POST-AGGREGATION vocab table (≪ corpus; low-frequency mass is already
    cut), the standard shape for id assignment — the corpus-sized work
    (explode + two aggregations) is fully distributed."""
    from pyspark.sql import functions as F
    from pyspark.sql.window import Window

    terms = df.select(id_col, F.explode(F.split(F.col(text_col), " "))
                      .alias("term"))
    per_doc = terms.groupBy(id_col, "term").agg(F.count("*").alias("tf"))
    counts = per_doc.groupBy("term").agg(
        F.sum("tf").alias("cnt"), F.count("*").alias("doc_freq"))
    w = Window.orderBy(F.desc("cnt"), "term")
    return (counts.filter(F.col("cnt") >= min_count)
            .withColumn("token_id", F.row_number().over(w).cast("int")))


def pack_sequences(df, budget: int = 2048, id_col: str = "doc_id",
                   group_col: str = "source", text_col: str = "text",
                   out_col: str = "seq_id"):
    """Concat-and-chunk sequence packing — the standard pretraining
    batching step (concatenate documents in a deterministic order, cut
    at every `budget` tokens; GPT-style pipelines split mid-document,
    so a document belongs to the chunk its START offset falls in).

    Adds `n_tok` (whitespace token count) and `out_col` =
    ⌊preceding-tokens-in-group / budget⌋, with documents ordered by
    `id_col` within each `group_col` — deterministic under any
    partitioning.

    Scale shape: one window (running sum) per group partition — the
    same single-shuffle shape as any per-source ordered scan. At 100 TB
    packing runs per (source, shard) so no group outgrows a task; the
    seq ids are then shard-local, exactly how production packers emit
    them."""
    from pyspark.sql import functions as F
    from pyspark.sql.window import Window

    n_tok = F.size(F.split(F.col(text_col), " "))
    w = (Window.partitionBy(group_col).orderBy(id_col)
         .rowsBetween(Window.unboundedPreceding, Window.currentRow))
    with_tok = df.withColumn("n_tok", n_tok)
    start = F.sum("n_tok").over(w) - F.col("n_tok")
    return with_tok.withColumn(
        out_col, F.floor(start / F.lit(budget)).cast("bigint"))

def redact_terms(df, terms, text_col: str = "text",
                 group_col: str = "source", token: str = "<REDACTED>"):
    """Denylist scrubbing — the PII/secret-removal stage of a curation
    pipeline, exercised here with a word denylist (the same regex path
    handles email/phone/key patterns in production): every whole-word
    occurrence of a denylisted term is replaced by `token`, and the
    pass reports how much it touched, per group.

    Shape: pure per-row JVM regex (`regexp_extract_all` to count,
    `regexp_replace` to rewrite — one compiled automaton each, no
    Python), then one map-side-combinable aggregation keyed by the
    group column. Embarrassingly parallel at any scale.

    → per group: (group, n_docs, docs_hit, n_redactions, chars_removed)
    where chars_removed counts characters deleted net of the inserted
    tokens (negative when the token is longer than the matched terms).
    """
    import re as _re

    from pyspark.sql import functions as F

    terms = sorted(terms)
    if not terms:
        # an empty denylist must be a no-op: without this guard the
        # alternation collapses to r"\b(?:)\b", which matches the empty
        # string at every word boundary — n_redactions would count
        # boundaries and regexp_replace would splice the token into
        # every word seam instead of touching nothing
        return (df.groupBy(F.col(group_col).alias("grp"))
                .agg(F.count(F.lit(1)).alias("n_docs"),
                     F.lit(0).cast("long").alias("docs_hit"),
                     F.lit(0).cast("long").alias("n_redactions"),
                     F.lit(0).cast("long").alias("chars_removed"))
                .orderBy("grp"))

    # escape every term: denylists carry literal strings ("c++", "a.b"),
    # not patterns — unescaped metacharacters would crash the executor
    # regex compile or silently over-match. NB: \b is the WORD-boundary
    # assertion, so a term that starts/ends with a non-word character
    # ("c++") only matches where that edge touches a word character —
    # the standard \b-denylist semantics (kept because the DuckDB
    # oracle's RE2 engine has no lookaround alternative)
    pat = r"\b(?:" + "|".join(_re.escape(t) for t in terms) + r")\b"
    # size(NULL array) is -1 under non-ANSI Spark: a NULL text row would
    # SUBTRACT one redaction from the group total — count it as 0 hits
    hits = F.greatest(
        F.size(F.regexp_extract_all(F.col(text_col), F.lit(pat), F.lit(0))),
        F.lit(0))
    red = F.regexp_replace(F.col(text_col), pat, token)
    per_doc = df.select(
        F.col(group_col).alias("grp"),
        hits.alias("_hits"),
        (F.length(F.col(text_col)) - F.length(red)).alias("_removed"))
    return (per_doc.groupBy("grp")
            .agg(F.count(F.lit(1)).alias("n_docs"),
                 F.sum((F.col("_hits") > 0).cast("long")).alias("docs_hit"),
                 F.sum("_hits").alias("n_redactions"),
                 F.sum("_removed").alias("chars_removed"))
            .orderBy("grp"))


def source_jaccard(df, text_col: str = "text", group_col: str = "source"):
    """Exact pairwise vocabulary Jaccard between groups:
    J(a,b) = |V_a ∩ V_b| / |V_a ∪ V_b| over the distinct-token sets —
    the corpus-mixing diagnostic (two sources with J near 1 are the
    same crawl twice; near 0, genuinely disjoint domains).

    Shape: one distinct on (group, token), a self-equi-join keyed by
    TOKEN (never a cross join — co-membership pairs only), one count
    per ordered pair, and a broadcast of the |groups|-row vocabulary
    sizes for the union denominator. Scales with shared-token
    co-occurrence, not |groups|²·|vocab|. For thousands of groups or
    adversarially shared vocabularies, the MinHash/theta sketch paths
    (dedup.py, kernels/theta.py) estimate the same matrix in one pass —
    this is their exact oracle twin, same discipline as
    ngram_jaccard vs minhash_near_duplicates.

    → per pair (src_a < src_b): (src_a, src_b, n_common, n_union,
    jaccard rounded to 6 decimals).
    """
    from pyspark.sql import functions as F

    toks = (df.select(F.col(group_col).alias("g"),
                      F.explode(F.split(F.col(text_col), " ")).alias("w"))
            .filter(F.col("w") != "").distinct())
    sizes = toks.groupBy("g").agg(F.count(F.lit(1)).alias("n"))
    a, b = toks.alias("a"), toks.alias("b")
    inter = (a.join(b, (F.col("a.w") == F.col("b.w"))
                    & (F.col("a.g") < F.col("b.g")))
             .groupBy(F.col("a.g").alias("src_a"),
                      F.col("b.g").alias("src_b"))
             .agg(F.count(F.lit(1)).alias("n_common")))
    sa = F.broadcast(sizes.select(F.col("g").alias("src_a"),
                                  F.col("n").alias("_na")))
    sb = F.broadcast(sizes.select(F.col("g").alias("src_b"),
                                  F.col("n").alias("_nb")))
    return (inter.join(sa, "src_a").join(sb, "src_b")
            .select("src_a", "src_b", "n_common",
                    (F.col("_na") + F.col("_nb") - F.col("n_common"))
                    .alias("n_union"))
            .select("src_a", "src_b", "n_common", "n_union",
                    F.round(F.col("n_common") / F.col("n_union"), 6)
                    .alias("jaccard"))
            .orderBy("src_a", "src_b"))

def pmi_bigrams(df, text_col: str = "text", min_count: int = 5,
                k: int = 20):
    """Top-k bigram collocations by pointwise mutual information:
    pmi(a,b) = ln(c_ab) + ln(N) − ln(c_a) − ln(c_b) with N the unigram
    total — the classic collocation/multi-word-expression extractor a
    tokenizer-construction pipeline runs before deciding merge
    candidates (and a quality signal: boilerplate corpora surface
    abnormally high-PMI templates).

    Shape: adjacent pairs come from one `arrays_zip(slice, slice)` +
    explode (pure JVM, no UDF); bigram and unigram counts are two
    map-side-combinable aggregations; unigram counts join back onto the
    (min_count-filtered) bigram table keyed by the word — AQE broadcasts
    the side that is actually small (both are |vocab|-bounded, so
    neither join ever sees corpus-sized input); the final top-k is
    `orderBy(...).limit(k)` — Spark plans TakeOrderedAndProject, a
    per-partition heap + driver merge of k rows, never a global sort
    materialization.

    → DataFrame(w1, w2, c_ab, pmi) — k rows, pmi rounded to 6 decimals,
    ties broken on (w1, w2).
    """
    from pyspark.sql import functions as F

    toks = df.select(F.split(F.col(text_col), " ").alias("l"))
    z = F.arrays_zip(
        F.slice(F.col("l"), 1, F.greatest(F.size("l") - 1, F.lit(0))),
        F.slice(F.col("l"), 2, F.greatest(F.size("l") - 1, F.lit(0))))
    pairs = (toks.select(F.explode(z).alias("p"))
             .select(F.col("p.0").alias("w1"), F.col("p.1").alias("w2"))
             .filter((F.col("w1") != "") & (F.col("w2") != "")))
    big = (pairs.groupBy("w1", "w2")
           .agg(F.count(F.lit(1)).alias("c_ab"))
           .filter(F.col("c_ab") >= int(min_count)))
    uni = (df.select(F.explode(F.split(F.col(text_col), " ")).alias("w"))
           .filter(F.col("w") != "")
           .groupBy("w").agg(F.count(F.lit(1)).alias("c")))
    n_tokens = uni.agg(F.sum("c").alias("nn"))
    scored = (big
              .join(uni.selectExpr("w AS w1", "c AS c_a"), "w1")
              .join(uni.selectExpr("w AS w2", "c AS c_b"), "w2")
              .crossJoin(F.broadcast(n_tokens))
              .select("w1", "w2", "c_ab",
                      F.round(F.log("c_ab") + F.log(F.col("nn").cast("double"))
                              - F.log("c_a") - F.log("c_b"), 6)
                      .alias("pmi")))
    return (scored.orderBy(F.desc("pmi"), "w1", "w2").limit(int(k)))
