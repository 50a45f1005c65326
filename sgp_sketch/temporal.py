"""Temporal / event-stream operators for training-data pipelines:
sessionization, as-of joins, and windowed range joins — the three
event-table primitives Spark has no built-in operator for, each
re-expressed as a declarative composition so Catalyst plans it (no
Python in any of these paths, no driver loops).

Scale shapes (100 TB of events):

  sessionize          ONE shuffle on the key column (the window partition);
                      per-key data streams through a single sorted pass.
                      A pathological hot key serializes its own partition —
                      the same skew class as routing.py's hot tokens; AQE
                      skew handling does not split window partitions, so
                      shard such keys upstream (e.g. bot traffic) or cap
                      per-key event counts before sessionizing.
  asof_join           the textbook union + last_value(ignorenulls) window:
                      tag both sides, one shuffle on (key), one sorted pass
                      fills each left row with the latest right row at or
                      before it. Never an inequality join (which Spark
                      plans as a broadcast nested loop).
  windowed_range_join binned candidate generation: bin width = the window,
                      right rows exploded to (bin-1, bin, bin+1) → plain
                      equi-join on (key, bin) → exact |Δt| refine. Fan-in
                      is bounded by events-per-bin, never |A|x|B|; the 3x
                      row expansion of the right side is the price of
                      turning an inequality join into a hash join.

Reference tie-in: the reference's workload replays timestamped update
streams in arrival order (`/root/reference/scripts/converters/
csv-converter.scala:36-37` epoch parsing; the LDBC driver's
dependency-time windows) — these operators are the batch analogs of that
event-time machinery, with DuckDB-exact oracles in __spark_entry__.
"""

from __future__ import annotations


def sessionize(events, gap_seconds: int = 1800, key_col: str = "user_id",
               ts_col: str = "ts", order_col: str | None = None,
               out_col: str = "session_idx"):
    """Gap-based sessionization: a new session starts at the first event
    and whenever the gap since the key's previous event exceeds
    `gap_seconds`. Adds `out_col` (1-based session ordinal per key).

    `order_col` breaks ties between equal timestamps deterministically
    (defaults to the timestamp alone — pass the event id column when
    exact-duplicate timestamps are possible)."""
    from pyspark.sql import functions as F
    from pyspark.sql.window import Window

    ts = F.col(ts_col).cast("timestamp")
    order = [ts] + ([F.col(order_col)] if order_col else [])
    w = Window.partitionBy(key_col).orderBy(*order)
    gap_us = int(gap_seconds) * 1_000_000
    prev = F.lag(ts).over(w)
    new_session = F.when(
        prev.isNull()
        | (F.unix_micros(ts) - F.unix_micros(prev) > gap_us), 1).otherwise(0)
    return events.withColumn(
        out_col,
        F.sum(new_session).over(
            w.rowsBetween(Window.unboundedPreceding, Window.currentRow))
        .cast("int"))


def asof_join(left, right, key_col: str = "user_id", ts_col: str = "ts",
              value_cols=("value",), order_col: str | None = None,
              suffix: str = "_asof"):
    """Backward as-of join: for every left row, the `value_cols` of the
    LATEST right row with the same key and right.ts <= left.ts (inclusive;
    NULL when no prior right row exists). Left rows pass through
    unchanged, with one `<col><suffix>` column appended per value col.

    Implementation: union both sides with a side tag, then
    last_value(..., ignorenulls=True) over a (key)-partitioned window
    ordered by (ts, side) — right rows sort BEFORE left rows at equal
    timestamps, which is what makes the match inclusive. One shuffle, one
    sorted pass, fully declarative (the plan is Window over Sort over
    Exchange — no nested-loop join). `order_col` adds a deterministic
    final sort key for exact-duplicate right timestamps — it is carried
    into the union as a dedicated `_ord` column taken from EACH side's
    own `order_col` (NULL where a side lacks the column), so the
    tie-break among duplicate right rows actually sorts on right values,
    not on a nulled-out left-schema column."""
    from pyspark.sql import functions as F
    from pyspark.sql.window import Window

    value_cols = list(value_cols)
    ts = F.col(ts_col).cast("timestamp")
    lcols = [c for c in left.columns]

    def ord_from(df):
        if not order_col:
            return []
        col = (F.col(order_col) if order_col in df.columns
               else F.lit(None))
        return [col.alias("_ord")]

    # the right values ride in ONE struct, non-null exactly for right
    # rows: last(ignorenulls) then skips left rows but never a right row
    # whose individual value is legitimately NULL — per-column last()
    # would mix fields from different right rows (row tearing) and
    # resurrect stale values over a newer NULL
    struct_t = ("struct<" + ",".join(
        f"{c}:{right.schema[c].dataType.simpleString()}"
        for c in value_cols) + ">")
    l = (left.withColumn("_side", F.lit(1))
         .withColumn("_ts", ts)
         .select(*lcols, "_side", "_ts",
                 F.lit(None).cast(struct_t).alias("_r"),
                 *ord_from(left)))
    r = (right.withColumn("_side", F.lit(0))
         .withColumn("_ts", ts)
         .select(*[F.lit(None).cast(left.schema[c].dataType).alias(c)
                   if c != key_col else F.col(key_col) for c in lcols],
                 "_side", "_ts",
                 F.struct(*[F.col(c) for c in value_cols]).alias("_r"),
                 *ord_from(right)))
    order = [F.col("_ts"), F.col("_side")]
    if order_col:
        order.append(F.col("_ord"))
    w = (Window.partitionBy(key_col).orderBy(*order)
         .rowsBetween(Window.unboundedPreceding, Window.currentRow))
    u = (l.unionByName(r)
         .withColumn("_last", F.last("_r", ignorenulls=True).over(w)))
    for c in value_cols:
        u = u.withColumn(f"{c}{suffix}", F.col("_last")[c])
    drop = ["_side", "_ts", "_r", "_last"]
    if order_col:
        drop.append("_ord")
    return u.filter(F.col("_side") == 1).drop(*drop)


def windowed_range_join(left, right, window_seconds: int,
                        key_col: str = "user_id", ts_col: str = "ts",
                        right_cols=()):
    """All (left, right) pairs with the same key whose timestamps differ by
    at most `window_seconds` (strictly: |ts_l − ts_r| ≤ w). Returns the
    left columns plus the requested `right_cols` (prefixed `r_`).

    Binned hash join, never an inequality join: both sides are bucketed
    into w-wide bins; the right side is exploded to its bin and both
    neighbors, so every qualifying pair shares an equi-join key
    (|Δt| ≤ w ⇒ bins differ by ≤ 1), then the exact predicate refines.
    The 3x right-row expansion buys a shuffle-hash/sort-merge plan whose
    fan-in is events-per-(key, bin) — scale-safe where the naive
    BroadcastNestedLoopJoin is |A|x|B|."""
    from pyspark.sql import functions as F

    if int(window_seconds) < 0:
        raise ValueError(f"window_seconds must be >= 0, got {window_seconds}")
    # w = 0 legitimately means "simultaneous events", but the bin width
    # w_us would be 0 (DIVIDE_BY_ZERO under ANSI): bin at 1 µs instead —
    # the |Δt| ≤ 0 refinement below is unchanged and exact
    w_us = int(window_seconds) * 1_000_000
    bin_us = max(w_us, 1)
    lus = F.unix_micros(F.col(ts_col).cast("timestamp"))
    l = left.withColumn("_us", lus).withColumn(
        "_bin", F.floor(F.col("_us") / bin_us))
    r = (right.withColumn("_rus", lus)
         .withColumn("_rbin", F.floor(F.col("_rus") / bin_us))
         .select(F.col(key_col), "_rus",
                 F.explode(F.array(F.col("_rbin") - 1, F.col("_rbin"),
                                   F.col("_rbin") + 1)).alias("_bin"),
                 *[F.col(c).alias(f"r_{c}") for c in right_cols]))
    pairs = (l.join(r, [key_col, "_bin"])
             .filter(F.abs(F.col("_us") - F.col("_rus")) <= w_us))
    return pairs.drop("_us", "_bin", "_rus")
