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
