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
