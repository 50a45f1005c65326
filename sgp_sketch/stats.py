"""Distribution statistics over DataFrame columns — the drift /
data-monitoring layer of a training-data pipeline (compare a new corpus
snapshot's length or score distribution against the last one before a
run is allowed to train).

Everything is declarative SQL math: per-value counts, one ordered
cumulative window per group, and an aggregate over the merged value
axis; DuckDB reproduces each result exactly.
"""

from __future__ import annotations


def ks_statistic(df, value_col: str, group_col: str, group_a, group_b,
                 bin_width: float | None = None):
    """Two-sample Kolmogorov–Smirnov distance between the empirical
    distributions of `value_col` in groups a and b:
    KS = max over the merged value axis of |F_a(v) − F_b(v)|.

    Shape: per-value counts (map-side combinable) → ONE ordered
    cumulative-sum window over the distinct-value axis → global max.
    The window orders the distinct values, not the rows, so its input is
    |support| rows. For continuous columns with ~row-cardinality support
    at 100-TB scale pass `bin_width`: values snap to floor(v/w)·w before
    counting, so the window sees at most range/w rows and the reported
    statistic is the KS of the binned distributions — it differs from
    the true KS by at most the largest mass either group places inside
    one bin.

    NULL values carry no distribution information and are dropped.

    → one-row DataFrame(ks double, n_a long, n_b long).

    If EITHER group has no rows (misspelled label, empty snapshot), an
    empirical CDF does not exist and `ks` comes back NULL with the
    corresponding n_* = 0 — and NULL fails every comparison, so a gate
    written as `.filter("ks > 0.1")` would silently never fire. Gate on
    the counts too: `ks > 0.1 OR n_a = 0 OR n_b = 0`.
    """
    from pyspark.sql import functions as F
    from pyspark.sql.window import Window

    is_a = (F.col(group_col) == group_a).cast("long")
    v = F.col(value_col)
    if bin_width is not None:
        v = F.floor(v / F.lit(float(bin_width))) * F.lit(float(bin_width))
    cnt = (df.filter(F.col(group_col).isin([group_a, group_b])
                     & F.col(value_col).isNotNull())
           .groupBy(v.alias("_v"))
           .agg(F.sum(is_a).alias("_ca"),
                F.sum(1 - is_a).alias("_cb")))
    cum = Window.orderBy("_v").rowsBetween(Window.unboundedPreceding,
                                           Window.currentRow)
    tot = Window.rowsBetween(Window.unboundedPreceding,
                             Window.unboundedFollowing)
    d = (F.sum("_ca").over(cum) / F.sum("_ca").over(tot)
         - F.sum("_cb").over(cum) / F.sum("_cb").over(tot))
    return (cnt.select(F.abs(d).alias("_d"),
                       F.sum("_ca").over(tot).alias("_na"),
                       F.sum("_cb").over(tot).alias("_nb"))
            .agg(F.max("_d").alias("ks"),
                 F.max("_na").alias("n_a"), F.max("_nb").alias("n_b")))

def zipf_slope(df, text_col: str = "text", min_count: int = 1):
    """Zipf power-law fit over the corpus token-frequency distribution:
    OLS slope of ln(count) against ln(rank) — a healthy natural-language
    corpus sits near −1; a slope drifting toward 0 flags boilerplate or
    synthetic-text contamination, toward −2 a collapsed vocabulary.

    Shape: token explode → one count shuffle keyed by token (map-side
    combinable) → a single ordered window over the DISTINCT-token axis
    to assign frequency ranks → `regr_slope` aggregate. The window input
    is |vocabulary| rows, not |corpus| rows, so the unpartitioned
    ordering is bounded (≤ a few 10⁷ types even at 100 TB); everything
    upstream of it is fully parallel.

    Ranks tie-break on the token string so the fit is deterministic.
    → one row: (slope double, n_types long, n_tokens long).
    """
    from pyspark.sql import functions as F
    from pyspark.sql.window import Window

    counts = (df.select(F.explode(F.split(F.col(text_col), " "))
                        .alias("_w"))
              .filter(F.col("_w") != "")
              .groupBy("_w").count()
              .filter(F.col("count") >= int(min_count)))
    rnk = Window.orderBy(F.desc("count"), F.asc("_w"))
    ranked = counts.select(F.col("count"),
                           F.row_number().over(rnk).alias("_r"))
    return ranked.agg(
        F.round(F.regr_slope(F.log("count"), F.log("_r")), 6)
         .alias("slope"),
        F.count(F.lit(1)).alias("n_types"),
        F.sum("count").alias("n_tokens"))


def mad_outliers(df, value_col: str = "value", group_col: str = "event_type",
                 k: float = 3.0):
    """Robust per-group outlier accounting via the median absolute
    deviation: med = median(v), mad = median(|v − med|), outlier ⇔
    |v − med| > k·mad. Unlike mean/stddev gates, one huge value cannot
    drag the threshold toward itself — the standard robust filter for
    score/length columns before training.

    Shape: an exact-percentile aggregation per group for the median, a
    broadcast join of the (tiny, |groups|-row) medians back onto the
    rows to form deviations, a second per-group percentile for the MAD,
    then one more broadcast join + aggregation for the flag counts.
    Three shuffles, all keyed by the group column, and the two joins
    broadcast KB-sized per-group tables — the full data is scanned
    twice, never reshuffled by anything but the group key. `percentile`
    is Spark's exact linear-interpolated quantile, bit-equal to DuckDB
    `median`/`mad`.

    → per group: (group, med, mad, n_outliers, n) with med/mad rounded
    to 6 decimals; the outlier compare uses the unrounded MAD.
    """
    from pyspark.sql import functions as F

    g = F.col(group_col)
    v = F.col(value_col)
    rows = df.filter(v.isNotNull()).select(g.alias("_g"), v.alias("_v"))
    meds = (rows.groupBy("_g")
            .agg(F.percentile(F.col("_v"), F.lit(0.5)).alias("_med")))
    dev = (rows.join(F.broadcast(meds), "_g", "inner")
           .select(F.col("_g"), F.abs(F.col("_v") - F.col("_med"))
                   .alias("_dev")))
    mads = (dev.groupBy("_g")
            .agg(F.percentile(F.col("_dev"), F.lit(0.5)).alias("_mad")))
    return (dev.join(F.broadcast(meds), "_g", "inner")
            .join(F.broadcast(mads), "_g", "inner")
            .groupBy(F.col("_g").alias(group_col))
            .agg(F.round(F.max("_med"), 6).alias("med"),
                 F.round(F.max("_mad"), 6).alias("mad"),
                 F.sum((F.col("_dev") > F.lit(float(k)) * F.col("_mad"))
                       .cast("long")).alias("n_outliers"),
                 F.count(F.lit(1)).alias("n")))

def equi_width_histogram(df, value_col: str = "value",
                         lo: float = 0.0, hi: float = 500.0,
                         nbins: int = 10):
    """Fixed-range equi-width histogram: bucket i covers
    [lo + i·w, lo + (i+1)·w) with w = (hi−lo)/nbins; values ≥ hi clamp
    into the last bucket, values < lo into bucket 0. One aggregation
    keyed by the bucket id — map-side combinable, output is nbins rows
    regardless of input size, so the plan is a single partial+final
    hash aggregate at any scale.

    → per bucket: (bucket, lo_edge, n, avg_value) ordered by bucket.

    avg_value accumulates in exact decimal(38,6) so the answer cannot
    vary with partitioning (float partial sums are order-dependent);
    domain: |value| < 10^32 per row and < 10^32 per-bucket total —
    values beyond that raise under ANSI mode rather than skew silently.
    """
    from pyspark.sql import functions as F

    w = (float(hi) - float(lo)) / int(nbins)
    v = F.col(value_col)
    b = F.least(F.greatest(F.floor((v - F.lit(float(lo))) / F.lit(w)),
                           F.lit(0)),
                F.lit(int(nbins) - 1)).cast("bigint")
    # NaN passes isNotNull and floor(NaN) casts to bucket 0, poisoning
    # that bucket's avg — exclude non-finite values like the kernels do
    return (df.filter(v.isNotNull() & ~F.isnan(v.cast("double")))
            .groupBy(b.alias("bucket"))
            .agg(F.round(F.lit(float(lo)) + F.col("bucket") * F.lit(w), 6)
                 .alias("lo_edge"),
                 F.count(F.lit(1)).alias("n"),
                 (F.sum(v.cast("decimal(38,6)")).cast("double")
                  / F.count(F.lit(1))).alias("avg_value"))
            .orderBy("bucket"))


def zscore_day_anomalies(df, ts_col: str = "ts", thresh: float = 1.5):
    """Volume-anomaly detection over the daily event-count series: a day
    is anomalous when its count sits more than `thresh` sample standard
    deviations from the mean daily count. The load-monitoring gate a
    pipeline runs before trusting a day's ingest.

    Shape: one count aggregation keyed by day (map-side combinable),
    then mean/stddev as unpartitioned window aggregates over the DAYS
    axis — bounded at ~365 rows/year no matter the corpus size, so the
    single-partition window is safe by construction.

    The flag is computed from the 6-decimal-rounded z-score so the
    boolean cannot flip on sub-ulp engine differences in the stddev
    accumulation order.

    → per day: (day, n_events, z, is_anomaly) ordered by day.
    """
    from pyspark.sql import functions as F
    from pyspark.sql.window import Window

    days = (df.groupBy(F.to_date(F.col(ts_col)).alias("day"))
            .agg(F.count(F.lit(1)).alias("n_events")))
    tot = Window.rowsBetween(Window.unboundedPreceding,
                             Window.unboundedFollowing)
    sd = F.stddev_samp("n_events").over(tot)
    # constant series (stddev 0) or a single day (stddev NULL) must read
    # as "no anomaly": 0/0 = NaN and Spark orders NaN above every number,
    # so an unguarded z would flag EVERY day of a perfectly steady ingest
    z = F.when(sd > 0,
               F.round((F.col("n_events") - F.avg("n_events").over(tot))
                       / sd, 6)).otherwise(F.lit(0.0))
    return (days.select(F.col("day"), F.col("n_events"), z.alias("z"))
            .select("day", "n_events", "z",
                    (F.abs(F.col("z")) > F.lit(float(thresh)))
                    .cast("int").alias("is_anomaly"))
            .orderBy("day"))

def psi_drift(df, value_col: str, group_col: str, group_a, group_b,
              lo: float, hi: float, nbins: int = 10, eps: float = 1e-6):
    """Population Stability Index between two groups' distributions of
    `value_col` over a fixed equi-width binning:
    PSI = Σ_i (p_i − q_i)·ln(p_i/q_i). The standard production drift
    gate (rule of thumb: < 0.1 stable, 0.1–0.25 drifting, > 0.25 act) —
    the coarse, monotone companion of the exact KS distance
    (ks_statistic): PSI is binned by construction, so it costs one
    aggregation keyed by (bucket) no matter the value support, while KS
    needs the distinct-value axis.

    Bins clamp at [lo, hi) edges like equi_width_histogram; `eps` floors
    empty-bin probabilities so the log stays finite (the conventional
    smoothing — flagged loudly by the bin counts either way).

    → one row: (psi double, n_a long, n_b long), psi rounded to
    6 decimals.
    """
    from pyspark.sql import functions as F
    from pyspark.sql.window import Window

    w = (float(hi) - float(lo)) / int(nbins)
    v = F.col(value_col)
    b = F.least(F.greatest(F.floor((v - F.lit(float(lo))) / F.lit(w)),
                           F.lit(0)), F.lit(int(nbins) - 1))
    is_a = (F.col(group_col) == group_a).cast("long")
    cnt = (df.filter(F.col(group_col).isin([group_a, group_b])
                     & v.isNotNull())
           .groupBy(b.alias("_b"))
           .agg(F.sum(is_a).alias("_ca"), F.sum(1 - is_a).alias("_cb")))
    tot = Window.rowsBetween(Window.unboundedPreceding,
                             Window.unboundedFollowing)
    # an EMPTY group would make the ratio 0/0 — a DIVIDE_BY_ZERO error
    # under ANSI mode, NaN otherwise (and greatest(NaN, eps) is NaN, so a
    # `psi > 0.25` gate would fire spuriously). try_divide yields NULL in
    # both modes; greatest skips NULLs, so the eps floor applies and PSI
    # vs a missing group comes back finite and loud (every bin
    # contributes the eps-vs-p term).
    p = F.greatest(F.try_divide(F.col("_ca"), F.sum("_ca").over(tot)),
                   F.lit(float(eps)))
    q = F.greatest(F.try_divide(F.col("_cb"), F.sum("_cb").over(tot)),
                   F.lit(float(eps)))
    term = (p - q) * F.log(p / q)
    return (cnt.select(term.alias("_t"),
                       F.sum("_ca").over(tot).alias("_na"),
                       F.sum("_cb").over(tot).alias("_nb"))
            .agg(F.round(F.sum("_t"), 6).alias("psi"),
                 F.max("_na").alias("n_a"), F.max("_nb").alias("n_b")))


def moments_drift(df, value_col: str, group_col: str, group_a, group_b):
    """Distribution-shape drift between two groups from EXACT moments
    (kernels/moments.py — arbitrary-precision integer power sums): the
    third drift lens next to KS (exact distance, needs the
    distinct-value axis) and PSI (binned, needs chosen edges). Moments
    need neither — ~64 bytes per group, one scan, merge-by-addition —
    and the three gates it derives are the ones a training-mix monitor
    actually pages on:

      var_ratio      var_a / var_b          (spread blow-up/collapse)
      std_mean_diff  (μa − μb)/√((va+vb)/2) (standardized mean shift,
                                             Cohen's-d-style)
      skew_delta     g1_a − g1_b            (tail direction flip)

    All outputs are pure functions of the exact integer state evaluated
    with IEEE-754 correctly-rounded ops only (+,−,×,÷,sqrt), so the
    DuckDB oracle in `__spark_entry__` reproduces every double
    bit-for-bit from HUGEINT power sums (same contract as
    `moments_profile`; same precondition — each power sum < 2^63,
    see kernels/moments.py — DuckDB's HUGEINT→DOUBLE cast double-rounds
    beyond that and the replay is then ~1-ulp, not bit-exact). Returns one row:
    (n_a, n_b, mean_a, mean_b, var_ratio, std_mean_diff, skew_delta) —
    ratio/smd NULL when a variance is 0 or a group is empty (loud via
    the n columns, never a crash).
    """
    import math

    from . import agg
    from .kernels import registry

    sub = df.filter(df[group_col].isin([group_a, group_b]))
    blobs = {r[group_col]: bytes(r["state"])
             for r in agg.multi_sketch_agg(
                 sub, {"mom": {"kind": "moments", "value_col": value_col}},
                 (group_col,)).collect()}

    def unpack(g):
        if g not in blobs:
            return {"n": 0, "mean": None, "variance": None,
                    "skewness": None}
        return registry.from_bytes(blobs[g]).stats()

    a, b = unpack(group_a), unpack(group_b)
    var_ratio = smd = skew_delta = None
    if a["n"] and b["n"]:
        if b["variance"] is not None and b["variance"] > 0.0 \
                and a["variance"] is not None:
            var_ratio = a["variance"] / b["variance"]
            pooled = (a["variance"] + b["variance"]) / 2.0
            if pooled > 0.0:
                smd = (a["mean"] - b["mean"]) / math.sqrt(pooled)
        if a["skewness"] is not None and b["skewness"] is not None:
            skew_delta = a["skewness"] - b["skewness"]
    spark = df.sparkSession
    return spark.createDataFrame(
        [(a["n"], b["n"], a["mean"], b["mean"],
          var_ratio, smd, skew_delta)],
        "n_a long, n_b long, mean_a double, mean_b double, "
        "var_ratio double, std_mean_diff double, skew_delta double")
