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


def streamed_estimates(spark, state_dir: str, group_cols=("source",)):
    """Current merged blobs from the streaming state table — one row per
    (group × sketch), identical to a batch build over the same inputs.
    `batch_id` is recovered as a hive-partition column of the state layout
    (one directory per micro-batch — see stream_sketch_build)."""
    blobs = spark.read.parquet(state_dir)
    return agg.merge_across(blobs.drop("batch_id"),
                            group_cols=tuple(group_cols) + ("sketch",))


def compact_state(spark, state_dir: str, group_cols=("source",)) -> dict:
    """Fold completed micro-batch blob directories into one snapshot so an
    unbounded stream keeps O(1) state-table size instead of one directory
    per batch forever.

    Safety under at-least-once replay: Spark's offsets checkpoint
    guarantees a COMMITTED batch id is never re-emitted; the only batch
    that can replay after a crash is the latest (possibly-uncommitted)
    one. So the fold covers every batch id EXCEPT the maximum, merges
    their blobs (kernel associativity ⇒ byte-exact), overwrites the
    smallest folded id's directory with the merged rows, and deletes the
    other folded directories. `streamed_estimates` output is byte-identical
    before and after. Run any time; a replayed max-id batch still
    overwrites only its own directory.

    Returns {"folded": n_batches_folded, "kept": n_dirs_after}.
    """
    from pyspark.sql import functions as F

    from .checkpoint import _fs_path

    fs, root = _fs_path(spark, state_dir)
    ids = []
    for status in fs.listStatus(root):
        name = status.getPath().getName()
        if status.isDirectory() and name.startswith("batch_id="):
            ids.append(int(name.split("=", 1)[1]))
    ids.sort()
    if len(ids) <= 2:
        return {"folded": 0, "kept": len(ids)}
    fold, keep_max = ids[:-1], ids[-1]
    blobs = (spark.read.parquet(state_dir)
             .filter(F.col("batch_id").isin(fold)).drop("batch_id"))
    merged = agg.merge_across(blobs, group_cols=tuple(group_cols)
                              + ("sketch",))
    # materialize BEFORE touching directories: merged reads the dirs that
    # are about to be overwritten/deleted
    rows = merged.collect()
    snap_dir = f"{state_dir}/batch_id={fold[0]}"
    spark.createDataFrame(rows, merged.schema).write.mode(
        "overwrite").parquet(snap_dir)
    for b in fold[1:]:
        p_fs, p = _fs_path(spark, f"{state_dir}/batch_id={b}")
        p_fs.delete(p, True)
    return {"folded": len(fold), "kept": 2,
            "snapshot_batch_id": fold[0], "live_batch_id": keep_max}


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
