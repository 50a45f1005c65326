"""Structured Streaming sketch builds: incremental mergeability as the
streaming property (SURVEY.md §2.11).

The reference's "streaming" is one sequential pass with mutable in-heap
state (`/root/reference/src/main/java/ca/uwaterloo/cs/sgp/streaming/
EdgeCutSGP.java:211-246`) plus loader-side micro-batching
(`ADJParser.groovy:107-123`). The property worth preserving at 100 TB is not
record-at-a-time execution but **associative, mergeable state**: each
micro-batch produces partial blobs; the running answer is a merge of all
blobs so far. Two idiomatic Spark surfaces:

  * `foreachBatch` (batch-first, default): readStream → per-batch
    multi_sketch_agg → append blob rows to a parquet state table. The
    current estimate at any time = merge_across(all blob rows) — the same
    kernel merge the batch path uses, so stream results are byte-comparable
    to a batch build over the union of inputs.
  * `applyInPandasWithState` (custom stateful operator): per-group HLL blob
    carried in GroupState, updated per micro-batch, emitting a running
    estimate row. Used where a live per-key running value is wanted instead
    of a state table.

Both run with availableNow triggers in tests (bounded file streams);
processing-time triggers are a config change. Event-time semantics (the
reference has none) are covered by `windowed_stream_agg`: watermarked
tumbling-window aggregation over the events table, state bounded by the
watermark horizon.
"""

from __future__ import annotations

from . import agg


def stream_sketch_build(spark, input_path: str, state_dir: str,
                        specs: dict, group_cols=("source",),
                        checkpoint_dir: str | None = None,
                        schema=None, available_now: bool = True,
                        prepare=None, reader_options: dict | None = None):
    """File-stream → per-micro-batch partial sketch blobs written to a
    parquet state table. Returns the StreamingQuery (caller awaits it).

    Exactly-once: foreachBatch is at-least-once (a crash between the data
    write and the streaming-checkpoint commit replays the batch), so the
    sink must be idempotent, not merely keyed. Each batch overwrites its
    own deterministic `state_dir/batch_id=N` directory — a replay rewrites
    the same path instead of appending duplicate blob rows, so CMS/KLL
    counts and Bloom n_items cannot double under replay.

    `prepare` (optional) maps each raw micro-batch DataFrame to the sketch
    input shape (e.g. documents → tokens) before aggregation, so callers
    can stream directly from a source table without staging a copy.
    `reader_options` (e.g. {"pathGlobFilter": "documents.parquet"}) let a
    stream select one table out of a directory of tables — the file-stream
    source only accepts directory paths.
    """
    opts = reader_options or {}
    if schema is None:
        schema = spark.read.options(**opts).parquet(input_path).schema
    stream = spark.readStream.schema(schema).options(**opts) \
        .parquet(input_path)

    def sink(batch_df, batch_id: int):
        if batch_df.isEmpty():
            return
        if prepare is not None:
            batch_df = prepare(batch_df)
        blobs = agg.multi_sketch_agg(batch_df, specs, group_cols)
        (blobs.write.mode("overwrite")
         .parquet(f"{state_dir}/batch_id={int(batch_id)}"))

    writer = stream.writeStream.foreachBatch(sink)
    if checkpoint_dir:
        writer = writer.option("checkpointLocation", checkpoint_dir)
    if available_now:
        writer = writer.trigger(availableNow=True)
    return writer.start()


_MARKER_PREFIX = "_compaction.v"


def _marker_versions(spark, state_dir: str) -> list[int]:
    from .checkpoint import _fs_path

    fs, root = _fs_path(spark, state_dir)
    if not fs.exists(root):
        return []
    out = []
    for status in fs.listStatus(root):
        name = status.getPath().getName()
        if (name.startswith(_MARKER_PREFIX) and name.endswith(".json")
                and not status.isDirectory()):
            out.append(int(name[len(_MARKER_PREFIX):-len(".json")]))
    return sorted(out)


def _read_marker(spark, state_dir: str):
    """Highest-version compaction pointer {snapshot: negative id,
    upto: M}, or None. Markers are versioned files (`_compaction.v3.json`)
    committed by rename-into-place, so a reader never sees a partial
    marker and there is never a window with no marker visible — a crashed
    writer just leaves two versions and readers take the max. A
    present-but-unparseable marker raises: silently ignoring it would
    drop the snapshot's data."""
    import json

    from .checkpoint import _fs_read_text, _join

    versions = _marker_versions(spark, state_dir)
    if not versions:
        return None
    return json.loads(_fs_read_text(
        spark, _join(state_dir, f"{_MARKER_PREFIX}{versions[-1]}.json")))


def _live_blobs(spark, state_dir: str):
    """State-table rows that are CURRENT under the compaction protocol:
    without a marker, only non-negative batch dirs count (a negative dir
    is an uncommitted snapshot from a crashed compaction); with a marker,
    the named snapshot plus every batch id above `upto`. This rule is what
    makes compact_state crash-safe at every step."""
    from pyspark.sql import functions as F

    blobs = spark.read.parquet(state_dir)
    marker = _read_marker(spark, state_dir)
    if marker is None:
        return blobs.filter(F.col("batch_id") >= 0)
    return blobs.filter((F.col("batch_id") == int(marker["snapshot"]))
                        | (F.col("batch_id") > int(marker["upto"])))


def streamed_estimates(spark, state_dir: str, group_cols=("source",)):
    """Current merged blobs from the streaming state table — one row per
    (group × sketch), identical to a batch build over the same inputs.
    `batch_id` is recovered as a hive-partition column of the state layout
    (one directory per micro-batch — see stream_sketch_build); compacted
    snapshots are resolved through the `_compaction.json` pointer."""
    return agg.merge_across(_live_blobs(spark, state_dir).drop("batch_id"),
                            group_cols=tuple(group_cols) + ("sketch",))


def compact_state(spark, state_dir: str, group_cols=("source",)) -> dict:
    """Fold completed micro-batch blob directories into one snapshot so an
    unbounded stream keeps O(1) state-table size instead of one directory
    per batch forever.

    Crash-safe snapshot-pointer commit (every step leaves
    `streamed_estimates` byte-identical):

      1. merge the live set minus the max non-negative batch id (the only
         batch at-least-once replay can re-emit) into a NEW snapshot dir
         `batch_id=-(M+1)` — negative ⇒ invisible until committed;
      2. commit by renaming a tmp file into the NEXT marker version
         `_compaction.v<k+1>.json` = {snapshot: -(M+1), upto: M} (rename
         to a fresh name is atomic; readers take the highest version, so
         no step ever exposes a missing or partial marker);
      3. garbage-collect the superseded dirs (old snapshot + ids ≤ M) —
         already invisible, so a crash mid-GC only leaves dead files.

    A crash before 2 leaves an orphan negative dir (ignored, rewritten by
    the next run); after 2, the new snapshot is authoritative and the old
    dirs are dead. Kernel merge associativity makes the fold byte-exact.

    Returns {"folded": n_batches_folded, "kept": n_dirs_after, ...}.
    """
    import json

    from pyspark.sql import functions as F

    from .checkpoint import _fs_path, _fs_read_text, _fs_write_text, _join

    fs, root = _fs_path(spark, state_dir)
    ids = []
    for status in fs.listStatus(root):
        name = status.getPath().getName()
        if status.isDirectory() and name.startswith("batch_id="):
            ids.append(int(name.split("=", 1)[1]))
    marker = _read_marker(spark, state_dir)
    if marker is None:
        live = sorted(i for i in ids if i >= 0)
    else:
        live = sorted(i for i in ids
                      if i == int(marker["snapshot"])
                      or i > int(marker["upto"]))
    # GC orphan negative dirs up front: a crash between step 1 and step 2
    # leaves an uncommitted snapshot dir; once new batches advance the
    # fold set, later compactions pick a different snap_id and the orphan
    # would otherwise leak forever (rescanned by every state read)
    for i in ids:
        if i < 0 and i not in live:
            p_fs, p = _fs_path(spark, f"{state_dir}/batch_id={i}")
            p_fs.delete(p, True)
    nonneg = [i for i in live if i >= 0]
    if not nonneg or len(live) <= 2:
        return {"folded": 0, "kept": len(live)}
    keep_max = max(nonneg)
    fold = [i for i in live if i != keep_max]
    if len(fold) < 2:
        return {"folded": 0, "kept": len(live)}
    upto = max(i for i in fold if i >= 0)
    snap_id = -(upto + 1)

    blobs = (spark.read.parquet(state_dir)
             .filter(F.col("batch_id").isin(fold)).drop("batch_id"))
    merged = agg.merge_across(blobs, group_cols=tuple(group_cols)
                              + ("sketch",))
    merged.write.mode("overwrite").parquet(
        f"{state_dir}/batch_id={snap_id}")                       # step 1
    versions = _marker_versions(spark, state_dir)
    next_v = (versions[-1] + 1) if versions else 1
    tmp = _join(state_dir, f"_compaction.tmp.{next_v}")
    _fs_write_text(spark, tmp, json.dumps({"snapshot": snap_id,
                                           "upto": upto}))
    _, tmp_p = _fs_path(spark, tmp)
    dst = _join(state_dir, f"{_MARKER_PREFIX}{next_v}.json")
    _, dst_p = _fs_path(spark, dst)
    # Hadoop FileSystem.rename reports most failures by returning false,
    # not raising; the GC below deletes every old marker and all folded
    # dirs, so proceeding past a failed commit would leave NO committed
    # snapshot pointer. Verify the marker is in place AND parses before
    # destroying anything. (On S3A "rename" is copy+delete, not atomic —
    # the fresh-versioned-name protocol never overwrites, and _read_marker
    # raises on an unparseable marker rather than adopting it, so a
    # half-copied object can abort a read but never silently drop state.)
    if not fs.rename(tmp_p, dst_p):                              # step 2
        raise IOError(f"compaction marker commit failed: {tmp} -> {dst}")
    committed = json.loads(_fs_read_text(spark, dst))
    if int(committed["snapshot"]) != snap_id or int(committed["upto"]) != upto:
        raise IOError(f"compaction marker verify failed: {dst}: {committed}")
    for v in versions:                                           # step 3
        p_fs, p = _fs_path(
            spark, _join(state_dir, f"{_MARKER_PREFIX}{v}.json"))
        p_fs.delete(p, False)
    for b in fold:
        p_fs, p = _fs_path(spark, f"{state_dir}/batch_id={b}")
        p_fs.delete(p, True)
    return {"folded": len(fold), "kept": 2, "snapshot_batch_id": snap_id,
            "live_batch_id": keep_max}


def windowed_stream_agg(spark, input_path: str, window: str = "1 day",
                        watermark: str = "1 day", ts_col: str = "ts",
                        key_col: str = "user_id", schema=None,
                        reader_options: dict | None = None):
    """Event-time tumbling-window aggregation with a watermark for late
    data: per window, event count + approx-distinct keys. Returns the
    streaming DataFrame (caller attaches a sink and trigger).

    The watermark bounds streaming state: windows older than
    (max event time − watermark) are finalized and their state dropped, so
    an unbounded stream holds O(windows inside the horizon) state, not
    O(all history) — the property that makes event-time aggregation viable
    on an infinite 100-TB/day feed. `approx_count_distinct` is Spark's
    built-in HLL++; for mergeable cross-run state use the blob path
    (stream_sketch_build grouped by the window day) instead.
    """
    from pyspark.sql import functions as F

    opts = reader_options or {}
    if schema is None:
        schema = spark.read.options(**opts).parquet(input_path).schema
    stream = spark.readStream.schema(schema).options(**opts) \
        .parquet(input_path)
    # watermarks require TIMESTAMP (with zone); parquet NTZ columns cast
    stream = stream.withColumn(ts_col, F.col(ts_col).cast("timestamp"))
    return (stream.withWatermark(ts_col, watermark)
            .groupBy(F.window(ts_col, window).alias("win"))
            .agg(F.count("*").alias("n_events"),
                 F.approx_count_distinct(key_col).alias("approx_keys")))


def sessionized_stream_agg(spark, input_path: str, gap: str = "30 minutes",
                           watermark: str = "1 day", ts_col: str = "ts",
                           key_col: str = "user_id", schema=None,
                           reader_options: dict | None = None):
    """Streaming gap-session aggregation: `session_window(ts, gap)` under
    a watermark — Spark's dynamic-gap session state machine, the
    streaming twin of temporal.sessionize (same >= gap boundary as the
    batch session_window; q_session_window_counts's oracle encodes it).
    Returns the streaming DataFrame (caller attaches sink + trigger;
    append mode emits a session only once its window can no longer grow,
    i.e. window end < watermark).

    State is bounded by the watermark horizon: a session closes when the
    event-time watermark passes its end, so an unbounded stream holds
    O(open sessions) state, not O(history) — with per-key gap sessions
    this is the operator that makes clickstream sessionization viable on
    an infinite feed.
    """
    from pyspark.sql import functions as F

    opts = reader_options or {}
    if schema is None:
        schema = spark.read.options(**opts).parquet(input_path).schema
    stream = spark.readStream.schema(schema).options(**opts) \
        .parquet(input_path)
    stream = stream.withColumn(ts_col, F.col(ts_col).cast("timestamp"))
    return (stream.withWatermark(ts_col, watermark)
            .groupBy(F.col(key_col),
                     F.session_window(ts_col, gap).alias("win"))
            .agg(F.count("*").alias("n_events"),
                 F.sum("value").alias("sum_value")))


def dedup_stream_agg(spark, input_path: str, dedup_keys=("user_id", "event_type"),
                     ts_col: str = "ts", watermark: str | None = None,
                     group_col: str = "event_type", schema=None,
                     reader_options: dict | None = None):
    """Streaming deduplication: `dropDuplicates` (optionally
    `dropDuplicatesWithinWatermark` when a watermark horizon is given)
    over a file stream, then a per-group count of the surviving rows —
    the streaming twin of the batch exact-dedup stage, and the standard
    guard against replayed/duplicate events in an ingest feed.

    Without a watermark the dedup state grows with the number of DISTINCT
    keys (exact, unbounded history — correct for the finite replay used in
    tests). With `watermark` set, state is bounded to the horizon via
    `dropDuplicatesWithinWatermark`: duplicates separated by more than the
    horizon can both survive, the documented trade for O(horizon) state on
    an infinite feed. Returns the streaming DataFrame (complete-mode
    aggregation; caller attaches sink + trigger). A finite replay must
    equal batch `COUNT(DISTINCT keys)` per group exactly — the
    equivalence the oracle checks.
    """
    from pyspark.sql import functions as F

    opts = reader_options or {}
    if schema is None:
        schema = spark.read.options(**opts).parquet(input_path).schema
    stream = spark.readStream.schema(schema).options(**opts) \
        .parquet(input_path)
    stream = stream.withColumn(ts_col, F.col(ts_col).cast("timestamp"))
    keys = list(dedup_keys)
    if watermark is not None:
        deduped = (stream.withWatermark(ts_col, watermark)
                   .dropDuplicatesWithinWatermark(keys))
    else:
        deduped = stream.dropDuplicates(keys)
    return (deduped.groupBy(group_col)
            .agg(F.count(F.lit(1)).alias("n_distinct")))


def stream_stream_join(spark, input_path: str, left_type: str = "click",
                       right_type: str = "purchase",
                       horizon_seconds: int = 3600, ts_col: str = "ts",
                       key_col: str = "user_id",
                       watermark: str = "2 hours", schema=None,
                       reader_options: dict | None = None):
    """§2.11 stream-stream inner join: correlate two event substreams of
    one feed (e.g. click -> purchase attribution) on key equality plus an
    event-time range `[t_left, t_left + horizon]`.

    Both sides carry a watermark and the join condition bounds event time,
    so Spark can expire buffered rows once the other side's watermark
    passes the horizon — state is O(horizon x arrival rate), not
    O(history); without the time bound a stream-stream join would buffer
    both streams forever. Emits (user, left ts, right ts, seconds between);
    a finite replay must equal the equivalent batch range join exactly.
    Returns the streaming DataFrame (append mode; caller attaches sink).
    """
    from pyspark.sql import functions as F

    opts = reader_options or {}
    if schema is None:
        schema = spark.read.options(**opts).parquet(input_path).schema

    def side(event_type, prefix):
        s = (spark.readStream.schema(schema).options(**opts)
             .parquet(input_path)
             .where(F.col("event_type") == event_type)
             .select(F.col(key_col).alias(f"{prefix}_user"),
                     F.col(ts_col).cast("timestamp")
                     .alias(f"{prefix}_ts"),
                     F.col("event_id").alias(f"{prefix}_id"))
             .withWatermark(f"{prefix}_ts", watermark))
        return s

    lhs, rhs = side(left_type, "l"), side(right_type, "r")
    cond = ((F.col("l_user") == F.col("r_user"))
            & (F.col("r_ts") >= F.col("l_ts"))
            & (F.col("r_ts") <= F.col("l_ts")
               + F.expr(f"INTERVAL {int(horizon_seconds)} SECONDS")))
    return (lhs.join(rhs, cond)
            .select(F.col("l_user").alias("user_id"),
                    "l_id", "r_id",
                    (F.unix_timestamp("r_ts")
                     - F.unix_timestamp("l_ts")).alias("lag_seconds")))


def running_distinct_stream(spark, input_path: str, p: int = 12,
                            group_col: str = "source", schema=None):
    """Custom stateful operator: per-group HLL state blob carried in
    GroupState (applyInPandasWithState), emitting a running distinct-token
    estimate each micro-batch. Returns the streaming DataFrame (caller
    attaches a sink).
    """
    from pyspark.sql.streaming.state import (GroupState,
                                             GroupStateTimeout)

    from .kernels import registry

    if schema is None:
        schema = spark.read.parquet(input_path).schema
    stream = spark.readStream.schema(schema).parquet(input_path)

    out_schema = f"{group_col} string, est_distinct double, n_batches int"
    state_schema = "state binary, n_batches int"

    def update(key, pdfs, state: GroupState):
        import numpy as np

        if state.exists:
            blob, n_batches = state.get
            st = registry.from_bytes(bytes(blob))
        else:
            st, n_batches = registry.make("hll", p=p), 0
        for pdf in pdfs:
            arrs = [np.asarray(t, dtype=np.int64) for t in pdf["tokens"]
                    if t is not None and len(t)]
            if arrs:
                flat = np.concatenate(arrs)
                st.update(flat.view(np.uint64))
        n_batches += 1
        state.update((st.to_bytes(), n_batches))
        import pandas as pd

        yield pd.DataFrame({group_col: [key[0]],
                            "est_distinct": [float(st.estimate())],
                            "n_batches": [n_batches]})

    return (stream.select(group_col, "tokens")
            .groupBy(group_col)
            .applyInPandasWithState(update, out_schema, state_schema,
                                    "update", GroupStateTimeout.NoTimeout))

def _interval_ms(spec: str) -> int:
    """'2 days' / '30 minutes' → milliseconds (the subset of Spark's
    interval grammar the streaming operators accept)."""
    qty, unit = spec.strip().split()
    per = {"second": 1000, "minute": 60000, "hour": 3600000,
           "day": 86400000, "week": 7 * 86400000}
    return int(float(qty) * per[unit.rstrip("s")])


def windowed_heavy_hitters_stream(spark, input_path: str,
                                  window: str = "1 day",
                                  watermark: str = "1 day",
                                  k: int = 64, topk: int = 5,
                                  key_col: str = "event_type",
                                  ts_col: str = "ts",
                                  val_col: str = "user_id",
                                  schema=None):
    """Custom stateful streaming operator: per-(key × event-time window)
    Misra–Gries state carried in GroupState (applyInPandasWithState),
    emitting the current top-k values with their [est, est+dec] bracket
    each micro-batch. State per group is ≤ k (value, count) pairs — the
    bounded-memory form of streaming GROUP BY value COUNT(*) ORDER BY
    count DESC LIMIT k, which an exact implementation cannot bound when
    the value domain is unbounded. An EVENT-time timeout (window end +
    watermark, watermark-driven) retires a group only once the watermark
    proves its window can no longer receive rows — a wall-clock timeout
    would silently reset live state on a paused/backlogged stream and
    break the est_max bracket. Total state is O(active windows × k),
    not O(stream lifetime).

    Returns the streaming DataFrame; the caller attaches a sink.
    """
    from pyspark.sql import functions as F
    from pyspark.sql.streaming.state import (GroupState,
                                             GroupStateTimeout)

    from .kernels import registry
    from .kernels.mg import MG

    wm_ms = _interval_ms(watermark)

    if schema is None:
        schema = spark.read.parquet(input_path).schema
    stream = spark.readStream.schema(schema).parquet(input_path)

    keyed = (stream
             .withWatermark(ts_col, watermark)
             .select(F.col(key_col).alias("k"),
                     F.window(F.col(ts_col), window).start
                     .cast("string").alias("w"),
                     # window end as epoch ms, computed JVM-side so the
                     # event-time timeout is session-timezone-safe
                     (F.window(F.col(ts_col), window).end
                      .cast("long") * 1000).alias("wend_ms"),
                     F.col(val_col).cast("long").alias("v"),
                     # the watermarked column itself must survive the
                     # projection or event-time timeout is rejected
                     F.col(ts_col)))
    out_schema = ("k string, w string, rank int, value long, "
                  "est_min long, est_max long")
    state_schema = "state binary"

    def update(key, pdfs, state: GroupState):
        import numpy as np
        import pandas as pd

        if state.hasTimedOut:
            state.remove()
            return
        if state.exists:
            st = registry.from_bytes(bytes(state.get[0]))
        else:
            st = MG(k=k)
        wend_ms = None
        for pdf in pdfs:
            if wend_ms is None and len(pdf):
                wend_ms = int(pdf["wend_ms"].iloc[0])
            vals = pdf["v"].to_numpy()
            vals = vals[~pd.isna(vals)].astype(np.int64)
            st.update(vals)
        state.update((st.to_bytes(),))
        if wend_ms is not None:
            # retire once the WATERMARK passes window end + lateness —
            # never earlier than the current watermark (Spark rejects
            # timeout timestamps at/behind it)
            state.setTimeoutTimestamp(
                max(wend_ms + wm_ms, state.getCurrentWatermarkMs() + 1))
        keys, cnts = st.heavy_hitters()
        n = min(topk, keys.size)
        yield pd.DataFrame({
            "k": [key[0]] * n, "w": [key[1]] * n,
            "rank": np.arange(1, n + 1, dtype=np.int32),
            "value": keys[:n].astype(np.int64),
            "est_min": cnts[:n].astype(np.int64),
            "est_max": (cnts[:n] + st.dec).astype(np.int64)})

    return (keyed.groupBy("k", "w")
            .applyInPandasWithState(update, out_schema, state_schema,
                                    "update",
                                    GroupStateTimeout.EventTimeTimeout))
