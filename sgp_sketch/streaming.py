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
processing-time triggers are a config change, watermarks stay unused
(nothing to map from the reference — no event-time semantics there).
"""

from __future__ import annotations

from . import agg


def stream_sketch_build(spark, input_path: str, state_dir: str,
                        specs: dict, group_cols=("source",),
                        checkpoint_dir: str | None = None,
                        schema=None, available_now: bool = True):
    """File-stream → per-micro-batch partial sketch blobs appended to a
    parquet state table. Returns the StreamingQuery (caller awaits it).

    Exactly-once: Spark's streaming checkpoint (offsets) + idempotent blob
    append keyed by batch_id — a restarted query reprocesses no batch
    because foreachBatch batch ids are stable per checkpoint.
    """
    from pyspark.sql import functions as F

    if schema is None:
        schema = spark.read.parquet(input_path).schema
    stream = spark.readStream.schema(schema).parquet(input_path)

    def sink(batch_df, batch_id: int):
        if batch_df.isEmpty():
            return
        blobs = agg.multi_sketch_agg(batch_df, specs, group_cols)
        (blobs.withColumn("batch_id", F.lit(int(batch_id)))
         .write.mode("append").parquet(state_dir))

    writer = stream.writeStream.foreachBatch(sink)
    if checkpoint_dir:
        writer = writer.option("checkpointLocation", checkpoint_dir)
    if available_now:
        writer = writer.trigger(availableNow=True)
    return writer.start()


def streamed_estimates(spark, state_dir: str, group_cols=("source",)):
    """Current merged blobs from the streaming state table — one row per
    (group × sketch), identical to a batch build over the same inputs."""
    blobs = spark.read.parquet(state_dir)
    return agg.merge_across(blobs.drop("batch_id"),
                            group_cols=tuple(group_cols) + ("sketch",))


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
