"""Spark aggregation layer: partial sketch states per partition, tree-wise
merge to one blob per group.

Execution shape (the partial+final split Spark applies to built-in
aggregates, made explicit for our binary states — SURVEY.md §2.4):

  read → [mapInPandas] one partial state per (partition × group)   (map-side
         combine: the analog of the reference's per-partition counters,
         `/root/reference/src/main/java/ca/uwaterloo/cs/sgp/streaming/EdgeCutSGP.java:28-31`)
       → [applyInPandas rounds] binary-tree merge over part_id buckets,
         O(log_fanin P) shuffle rounds of KB-sized blobs
       → one row per (group, sketch_type).

Why not groupBy(group).applyInPandas over raw rows: that shuffles ALL input
bytes to as many tasks as there are groups (8 sources ⇒ 8 tasks for 100 TB).
Partials shuffle only #partitions × #groups blobs — the only full-data pass
is the embarrassingly-parallel scan.

All kernels run vectorized numpy over Arrow batches; no per-row Python in the
scan path (BASELINE.json input_hint).
"""

from __future__ import annotations

import math

import numpy as np

from .kernels import registry

PARTIAL_SCHEMA_TAIL = ("sketch_type string, state binary, n_items long, "
                       "part_id long")

_NUMERIC_KINDS = {"kll", "tdigest"}


def _extract_values(col, numeric: bool) -> np.ndarray:
    """Series of scalars or of token arrays → one flat numpy array."""
    vals = col.to_numpy()
    if vals.dtype == object:  # array<int> column: Arrow gives object ndarray
        nonempty = [v for v in vals if v is not None and len(v)]
        if not nonempty:
            return np.empty(0, dtype=np.float64 if numeric else np.int64)
        flat = np.concatenate(nonempty)
    else:
        flat = vals[~np.isnan(vals)] if vals.dtype.kind == "f" else vals
    return flat.astype(np.float64) if numeric else flat.astype(np.int64)


def _update(state, kind: str, flat: np.ndarray):
    if kind in _NUMERIC_KINDS:
        state.update(flat)
    else:
        state.update(flat.astype(np.int64).view(np.uint64)
                     if flat.dtype == np.int64 else flat)
    return state


def build_partials(df, kind: str, value_col: str, group_cols=("source",),
                   params: dict | None = None):
    """One partial sketch per (input partition × group) via mapInPandas.

    Returns DataFrame: group_cols..., sketch_type, state, n_items, part_id.
    """
    from pyspark import TaskContext

    params = params or {}
    group_cols = list(group_cols)
    numeric = kind in _NUMERIC_KINDS
    in_schema = df.schema
    group_fields = ", ".join(
        f"{c} {in_schema[c].dataType.simpleString()}" for c in group_cols)
    out_schema = (group_fields + ", " if group_fields else "") + PARTIAL_SCHEMA_TAIL

    needed = group_cols + [value_col]

    def acc(iterator):
        import pandas as pd

        states: dict[tuple, object] = {}
        counts: dict[tuple, int] = {}
        for pdf in iterator:
            if group_cols:
                grouped = pdf.groupby(group_cols, sort=False)
            else:
                grouped = [((), pdf)]
            for gkey, sub in grouped:
                if not isinstance(gkey, tuple):
                    gkey = (gkey,)
                flat = _extract_values(sub[value_col], numeric)
                if flat.size == 0:
                    continue
                st = states.get(gkey)
                if st is None:
                    st = registry.make(kind, **params)
                    states[gkey] = st
                    counts[gkey] = 0
                _update(st, kind, flat)
                counts[gkey] += flat.size
        if not states:
            return
        pid = TaskContext.get().partitionId()
        rows = []
        for gkey, st in states.items():
            rows.append((*gkey, kind, st.to_bytes(), counts[gkey], pid))
        yield pd.DataFrame(rows, columns=group_cols + [
            "sketch_type", "state", "n_items", "part_id"])

    return df.select(*needed).mapInPandas(acc, out_schema), out_schema


def _merge_fn(group_cols):
    def merge(key, pdf):
        import pandas as pd

        blob = registry.merge_blobs(list(pdf["state"]))
        row = {c: pdf[c].iloc[0] for c in group_cols}
        row.update(sketch_type=pdf["sketch_type"].iloc[0], state=blob,
                   n_items=int(pdf["n_items"].sum()),
                   part_id=int(pdf["part_id"].iloc[0]))
        return pd.DataFrame([row])
    return merge


def tree_merge(partials, out_schema: str, group_cols=("source",),
               n_parts: int | None = None, fanin: int = 64):
    """Binary-tree (fanin-ary) merge rounds over part_id buckets.

    O(log_fanin P) rounds; every round shuffles only blob rows. `n_parts`
    (the partial count upper bound = input partition count) lets us compute
    the round count driver-side without launching a counting job.
    """
    from pyspark.sql import functions as F

    group_cols = list(group_cols)
    df = partials
    if n_parts is None:
        n_parts = 4096
    rounds = max(1, math.ceil(math.log(max(n_parts, 2), fanin)))
    for _ in range(rounds):
        df = df.withColumn("part_id", (F.col("part_id") / F.lit(fanin)).cast("long"))
        df = df.groupBy(*group_cols, "sketch_type", "part_id").applyInPandas(
            _merge_fn(group_cols), out_schema)
    return df


def sketch_agg(df, kind: str, value_col: str, group_cols=("source",),
               params: dict | None = None, fanin: int = 64):
    """End-to-end: partials → tree merge → one blob row per group."""
    n_parts = df.rdd.getNumPartitions()
    partials, schema = build_partials(df, kind, value_col, group_cols, params)
    return tree_merge(partials, schema, group_cols, n_parts=n_parts,
                      fanin=fanin).drop("part_id")


def merge_across(blobs_df, out_schema: str | None = None, group_cols=()):
    """Re-aggregate existing blobs to a coarser grouping (e.g. per-source →
    global). Associativity of the kernels is exactly what makes this legal —
    the same invariant the reference's `reduceByKey(_ ++ _)` relies on
    (`/root/reference/scripts/analytics/snap2adj.scala:16`)."""
    from pyspark.sql import functions as F

    group_cols = list(group_cols)
    if out_schema is None:
        in_schema = blobs_df.schema
        group_fields = ", ".join(
            f"{c} {in_schema[c].dataType.simpleString()}" for c in group_cols)
        out_schema = (group_fields + ", " if group_fields else "") + PARTIAL_SCHEMA_TAIL
    df = blobs_df
    if "part_id" not in df.columns:
        df = df.withColumn("part_id", F.lit(0))
    return df.groupBy(*group_cols, "sketch_type").applyInPandas(
        _merge_fn(group_cols), out_schema).drop("part_id")
