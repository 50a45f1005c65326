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

Grouping-cardinality tradeoff: the partial model shines for low-cardinality
group keys (sources, days). For high-cardinality keys the partial count is
#partitions × #groups; sparse blob encoding (HLL sparse mode, CMS/Bloom COO)
keeps small per-group states at KBs, but beyond ~10^5 groups per partition
prefer the raw-shuffle groupBy path — at that point each group's data is
small enough that shuffling it raw is the cheaper plan.

All kernels run vectorized numpy over Arrow batches; no per-row Python in the
scan path (BASELINE.json input_hint).
"""

from __future__ import annotations

import math

import numpy as np

from .kernels import registry
from .kernels.hashing import hash64

PARTIAL_SCHEMA_TAIL = ("sketch_type string, state binary, n_items long, "
                       "part_id long")

_NUMERIC_KINDS = {"kll", "tdigest", "dd", "moments"}


def _extract_values(col, numeric: bool) -> np.ndarray:
    """Series of scalars or of token arrays → one flat numpy array.

    Integer token arrays keep their native width (int32 for datagen tables)
    — the batch prep sorts this array, and halving the element size halves
    the dominant memory traffic of the scan path."""
    vals = col.to_numpy()
    if vals.dtype == object:  # array<int> column: Arrow gives object ndarray
        nonempty = [v for v in vals if v is not None and len(v)]
        if not nonempty:
            return np.empty(0, dtype=np.float64 if numeric else np.int64)
        flat = np.concatenate(nonempty)
    else:
        flat = vals[~np.isnan(vals)] if vals.dtype.kind == "f" else vals
    if numeric:
        return flat.astype(np.float64)
    return flat if flat.dtype.kind in "iu" else flat.astype(np.int64)


def _unique_counts(flat: np.ndarray):
    """np.unique(return_counts) with a bincount fast path for dense bounded
    vocabularies (token ids): scatter-increment into a cache-resident count
    array beats a full O(n log n) sort on both CPU and — crucially for
    multi-core scaling — memory bandwidth."""
    if flat.size > 4096 and flat.dtype.kind in "iu":
        lo = int(flat.min())
        if lo >= 0:
            hi = int(flat.max())
            if hi < (1 << 22) and hi + 1 <= flat.size * 8:
                counts = np.bincount(flat, minlength=hi + 1)
                uniq = np.flatnonzero(counts)
                return uniq.astype(flat.dtype, copy=False), counts[uniq]
    return np.unique(flat, return_counts=True)


def _prep_tokens(flat: np.ndarray):
    """Shared batch prep for the hash-sketch kinds: one dedupe pass and one
    hash pass over the *unique* values, reused by every sketch built
    from the same column. Equivalent to per-item updates because HLL/Bloom
    are idempotent and CMS takes (hash, count) deltas."""
    uniq, counts = _unique_counts(flat)
    return uniq, counts, hash64(uniq.astype(np.uint64, copy=False))


def _update(state, kind: str, flat: np.ndarray, prep=None):
    if kind in _NUMERIC_KINDS:
        state.update(flat)
        return state
    if kind in ("hll", "cms", "bloom", "theta", "mg", "cs"):
        uniq, counts, h = prep if prep is not None else _prep_tokens(flat)
        if kind == "mg":
            state.update(uniq, counts)
        elif kind in ("cms", "cs"):
            state.update_hashes(h, counts=counts)
        elif kind == "bloom":
            state.update_hashes(h, assume_unique=True, n_raw=flat.size)
        else:  # hll / theta: idempotent, deduped hash batch
            state.update_hashes(h, assume_unique=True)
        return state
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
                # dropna=False: null group keys get their own sketch slot
                # (matching the Arrow path) instead of silently dropping
                # every row whose key is null
                grouped = pdf.groupby(group_cols, sort=False, dropna=False)
            else:
                grouped = [((), pdf)]
            for gkey, sub in grouped:
                if not isinstance(gkey, tuple):
                    gkey = (gkey,)
                gkey = tuple(None if pd.isna(k) else k for k in gkey)
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
    # intermediate rounds shrink the blob count by `fanin` each; the last
    # round always collapses to part_id=0, so the result is exactly one row
    # per group even if `n_parts` under-estimated the true partition count
    for _ in range(rounds - 1):
        df = df.withColumn("part_id", (F.col("part_id") / F.lit(fanin)).cast("long"))
        df = df.groupBy(*group_cols, "sketch_type", "part_id").applyInPandas(
            _merge_fn(group_cols), out_schema)
    df = df.withColumn("part_id", F.lit(0).cast("long"))
    df = df.groupBy(*group_cols, "sketch_type", "part_id").applyInPandas(
        _merge_fn(group_cols), out_schema)
    return df


def sketch_agg(df, kind: str, value_col: str, group_cols=("source",),
               params: dict | None = None, fanin: int = 64):
    """End-to-end: partials → tree merge → one blob row per group.

    Delegates to the Arrow scan path (build_partials_multi) with a single
    spec; the legacy pandas build_partials stays for callers needing it."""
    merged = multi_sketch_agg(
        df, {kind: {"kind": kind, "value_col": value_col,
                    "params": params or {}}},
        group_cols, fanin=fanin)
    return merged.drop("sketch")


def sketch_agg_bykey(df, kind: str, value_col: str, key_cols=("key",),
                     params: dict | None = None,
                     num_partitions: int | None = None):
    """High-cardinality per-KEY sketch build — the other side of the
    grouping-cardinality tradeoff documented in the module docstring.

    The partial+tree-merge path (multi_sketch_agg) is right for
    low-cardinality group keys (sources, days): partial count =
    #partitions × #groups. For per-user / per-domain state tables with
    10^6–10^9 keys that product explodes, while each key's OWN data is
    tiny — so the cheaper plan is the one Spark's built-in aggregates use:
    ONE hash shuffle of the raw rows on the key, then build each key's
    sketch completely inside its shuffle partition. After
    `repartition(key)` every row of a key sits in exactly one partition,
    so the per-partition partial IS the final state — no merge rounds at
    all, and the output (key, blob) table is itself partitioned by key,
    ready for a co-located point-lookup join or a partitioned write.

    Output: key_cols…, sketch_type, state, n_items — one row per distinct
    key. Merge-freedom is load-bearing for exactness-below-k sketches
    (theta/KMV stores raw hashes while |set| < k, so per-key estimates of
    small sets are EXACT — `per_key_distinct` in `__spark_entry__` is
    oracle-adjudicated against COUNT(DISTINCT) on that basis).

    `num_partitions` defaults to spark.sql.shuffle.partitions; size it so
    (#keys × state bytes) / partitions fits the executor heap — sparse
    states for small sets are O(set) bytes, so the resident cost is about
    the partition's raw data, same as any built-in hash aggregate."""
    rep = (df.repartition(num_partitions, *key_cols) if num_partitions
           else df.repartition(*key_cols))
    # the pandas accumulator beats the Arrow packed-sort path here
    # (measured 2x on 300k keys x 337 tokens, warm): with MANY SMALL
    # groups a hash groupby + per-group vector ops wins over sorting
    # every token by (group, token) per batch — the Arrow path's packed
    # np.unique is tuned for few groups x many tokens, the opposite shape
    partials, _schema = build_partials(rep, kind, value_col,
                                       list(key_cols), params)
    return partials.drop("part_id")


def _batch_columns(batch, group_cols):
    """RecordBatch → (group codes int64[n_rows], code→group-tuple dict).

    Dictionary-encodes each group column Arrow-side; multiple columns are
    combined by radix into one int64 code."""
    import pyarrow.compute as pc

    n = batch.num_rows
    if not group_cols:
        return np.zeros(n, dtype=np.int64), {0: ()}
    codes = np.zeros(n, dtype=np.int64)
    dicts = []
    for c in group_cols:
        enc = pc.dictionary_encode(batch.column(c))
        vals = enc.dictionary.to_pylist()
        indices = enc.indices
        if indices.null_count:  # null group value → its own dictionary slot
            indices = indices.fill_null(len(vals))
            vals = vals + [None]
        idx = indices.to_numpy(zero_copy_only=False).astype(np.int64)
        codes = codes * len(vals) + idx
        dicts.append(vals)
    mapping = {}
    for code in np.unique(codes):
        parts, rem = [], int(code)
        for vals in reversed(dicts):
            parts.append(vals[rem % len(vals)])
            rem //= len(vals)
        mapping[int(code)] = tuple(reversed(parts))
    return codes, mapping


def _flatten_list_column(col):
    """Arrow List/LargeList column → (flat values ndarray, lengths ndarray).
    Zero-copy on the values buffer — no per-row allocation.

    Null slots yield length 0 and contribute no values: lengths from the
    offsets are masked by the validity bitmap, because the Arrow spec
    permits non-degenerate offsets under null slots (Spark emits
    zero-length ones today, but relying on that would attribute garbage
    values to a null row)."""
    import pyarrow as pa

    if isinstance(col, pa.ChunkedArray):
        col = col.combine_chunks()
    off = np.asarray(col.offsets)
    raw_lens = (off[1:] - off[:-1]).astype(np.int64)
    flat = col.values.to_numpy(zero_copy_only=False)[off[0]:off[-1]]
    if col.null_count:
        valid = np.asarray(col.is_valid())
        return flat[np.repeat(valid, raw_lens)], np.where(valid, raw_lens, 0)
    return flat, raw_lens


def _grouped_token_stats(flat, token_gids, codes_present):
    """Per-group (uniq, counts, hashes) with ONE sort for all groups:
    pack (group_code << 32 | token_bits) into a single uint64 key when the
    tokens are 32-bit, else fall back to per-group masks. Replaces
    per-(group × sketch) np.unique — the scan path's dominant cost."""
    out = {}
    if flat.dtype.itemsize <= 4 and token_gids.size:
        packed = (token_gids.astype(np.uint64) << np.uint64(32)) \
            | flat.astype(np.int32).view(np.uint32).astype(np.uint64)
        uniq, counts = np.unique(packed, return_counts=True)
        ugids = (uniq >> np.uint64(32)).astype(np.int64)
        for g in codes_present:
            lo, hi = np.searchsorted(ugids, g), np.searchsorted(ugids, g + 1)
            if lo == hi:
                continue
            toks = (uniq[lo:hi] & np.uint64(0xFFFFFFFF)) \
                .astype(np.uint32).view(np.int32)
            h = hash64(toks.astype(np.uint64, copy=False))
            out[g] = (counts[lo:hi], h, int(counts[lo:hi].sum()),
                      toks.astype(np.int64))
    else:
        for g in codes_present:
            sel = flat[token_gids == g]
            if sel.size == 0:
                continue
            uniq, counts = np.unique(sel, return_counts=True)
            out[g] = (counts, hash64(uniq.astype(np.uint64, copy=False)),
                      int(sel.size), uniq.astype(np.int64))
    return out


def build_partials_multi(df, specs: dict, group_cols=("source",)):
    """One scan, many sketches: per (partition × group × spec) partial state.

    `specs`: {name: {"kind": str, "value_col": str, "params": dict}}.
    Returns (DataFrame, out_schema) with columns group..., sketch (spec
    name), sketch_type, state, n_items, part_id. One mapInArrow pass reads
    each input row once no matter how many sketches are built — at 100 TB
    the scan dominates, so N sketches for the price of one. Token arrays
    stay in Arrow's flat values buffer (zero-copy into numpy: no per-row
    object allocation), and one packed-key sort per batch serves every hash
    sketch of a column across all groups.
    """
    from pyspark import TaskContext

    group_cols = list(group_cols)
    in_schema = df.schema
    group_fields = ", ".join(
        f"{c} {in_schema[c].dataType.simpleString()}" for c in group_cols)
    out_schema = ((group_fields + ", ") if group_fields else "") + \
        "sketch string, " + PARTIAL_SCHEMA_TAIL
    value_cols = sorted({s["value_col"] for s in specs.values()})
    needed = group_cols + value_cols
    hash_kinds = ("hll", "cms", "bloom", "theta", "mg", "cs")

    def acc(batches):
        import pyarrow as pa

        states: dict[tuple, object] = {}   # (gkey-tuple, name) → state
        counts: dict[tuple, int] = {}

        def state_for(gkey, name):
            key = (gkey, name)
            st = states.get(key)
            if st is None:
                st = registry.make(specs[name]["kind"],
                                   **specs[name].get("params") or {})
                states[key] = st
                counts[key] = 0
            return st

        for batch in batches:
            codes, mapping = _batch_columns(batch, group_cols)
            present = sorted(mapping)
            single = len(present) == 1
            col_cache = {}
            for vc in value_cols:
                col = batch.column(vc)
                if pa.types.is_list(col.type) or pa.types.is_large_list(col.type):
                    flat, lens = _flatten_list_column(col)
                    # single-group batches (source-partitioned tables) skip
                    # the per-token group-id expansion entirely — half the
                    # memory traffic of the scan hot loop
                    tg = None if single else np.repeat(codes, lens)
                    col_cache[vc] = ("list", flat, tg)
                else:
                    col_cache[vc] = ("scalar",
                                     col.to_numpy(zero_copy_only=False),
                                     None if single else codes)
            stats_cache = {}
            for name, spec in specs.items():
                vc, kind = spec["value_col"], spec["kind"]
                shape, flat, tg = col_cache[vc]
                if kind in hash_kinds:
                    if flat.dtype.kind == "f":
                        # nullable integer scalar columns arrive as float
                        # (+NaN) from Arrow: drop nulls, restore int64
                        mask = ~np.isnan(flat)
                        flat = flat[mask].astype(np.int64)
                        if tg is not None:
                            tg = tg[mask]
                    if vc not in stats_cache:
                        if single:
                            uniq, ucounts = _unique_counts(flat)
                            h = hash64(uniq.astype(np.uint64, copy=False))
                            stats_cache[vc] = {present[0]: (
                                ucounts, h, int(flat.size),
                                uniq.astype(np.int64))}
                        else:
                            stats_cache[vc] = _grouped_token_stats(
                                flat, tg, present)
                    for g, (gcounts, h, n_raw, toks) \
                            in stats_cache[vc].items():
                        gkey = mapping[g]
                        st = state_for(gkey, name)
                        if kind in ("cms", "cs"):
                            st.update_hashes(h, counts=gcounts)
                        elif kind == "mg":
                            st.update(toks, gcounts)
                        elif kind == "bloom":
                            st.update_hashes(h, assume_unique=True,
                                             n_raw=n_raw)
                        else:  # hll / theta
                            st.update_hashes(h, assume_unique=True)
                        counts[(gkey, name)] += n_raw
                else:  # numeric quantile kinds
                    vals = flat.astype(np.float64)
                    for g in present:
                        sel = vals if single else vals[tg == g]
                        if sel.dtype.kind == "f":
                            sel = sel[~np.isnan(sel)]
                        if sel.size == 0:
                            continue
                        gkey = mapping[g]
                        state_for(gkey, name).update(sel)
                        counts[(gkey, name)] += sel.size

        if not states:
            return
        pid = TaskContext.get().partitionId()
        cols: dict[str, list] = {c: [] for c in group_cols}
        cols.update(sketch=[], sketch_type=[], state=[], n_items=[],
                    part_id=[])
        for (gkey, name), st in states.items():
            for c, v in zip(group_cols, gkey):
                cols[c].append(v)
            cols["sketch"].append(name)
            cols["sketch_type"].append(specs[name]["kind"])
            cols["state"].append(st.to_bytes())
            cols["n_items"].append(counts[(gkey, name)])
            cols["part_id"].append(pid)
        try:
            from pyspark.sql.pandas.types import to_arrow_type
            gtypes = {c: to_arrow_type(in_schema[c].dataType)
                      for c in group_cols}
        except Exception:
            gtypes = {}
        arrays, names = [], []
        for c in group_cols:
            arrays.append(pa.array(cols[c], type=gtypes.get(c)))
            names.append(c)
        arrays += [pa.array(cols["sketch"], pa.string()),
                   pa.array(cols["sketch_type"], pa.string()),
                   pa.array(cols["state"], pa.binary()),
                   pa.array(cols["n_items"], pa.int64()),
                   pa.array(cols["part_id"], pa.int64())]
        names += ["sketch", "sketch_type", "state", "n_items", "part_id"]
        yield pa.RecordBatch.from_arrays(arrays, names=names)

    return df.select(*needed).mapInArrow(acc, out_schema), out_schema


def multi_sketch_agg(df, specs: dict, group_cols=("source",), fanin: int = 64,
                     n_parts: int | None = None):
    """End-to-end single-scan multi-sketch build: partials → tree merge →
    one blob row per (group × spec)."""
    if n_parts is None:
        n_parts = df.sparkSession.sparkContext.defaultParallelism
    partials, schema = build_partials_multi(df, specs, group_cols)
    merged = tree_merge(partials, schema, list(group_cols) + ["sketch"],
                        n_parts=n_parts, fanin=fanin)
    return merged.drop("part_id")


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
