"""User-facing query API over sketch state tables.

The reference's "queries" are partition-quality probes (1-hop/2-hop
traversals routed to the shard owning the start vertex,
`/root/reference/scripts/interactive/gremlin/PartitioningTwoHopTest.groovy:156-169`);
ours are the four sketch queries the north_star names: distinct-token
cardinality (HLL), heavy-hitter frequencies (CMS + top-K candidates),
n_tok quantiles (t-digest / KLL), token membership (Bloom).

Finalization (blob → number) touches one row per group — tiny — so scalar
pandas UDFs over the blob column are fine there; the full-data scan path
stays in agg.build_partials (vectorized numpy only).
"""

from __future__ import annotations

import numpy as np
import pandas as pd

from . import agg
from .kernels import cms as cms_mod
from .kernels import registry
from .kernels.hashing import hash64


# --------------------------------------------------------------- finalizers

def _estimate_udf():
    from pyspark.sql.functions import pandas_udf

    @pandas_udf("double")
    def est(state: pd.Series) -> pd.Series:
        return state.map(lambda b: float(registry.from_bytes(b).estimate()))
    return est


def _quantile_udf(qs):
    from pyspark.sql.functions import pandas_udf

    qs = list(qs)

    @pandas_udf("array<double>")
    def quant(state: pd.Series) -> pd.Series:
        return state.map(lambda b: registry.from_bytes(b).quantiles(qs).tolist())
    return quant


# --------------------------------------------------------------- queries

def distinct_tokens(df, group_cols=("source",), value_col="tokens",
                    p: int = 14, include_global: bool = False):
    """Approximate COUNT(DISTINCT token) per group via HLL++.

    → DataFrame(group_cols..., est_distinct double). The exact counterpart
    is `dropDuplicates().count()` (`/root/reference/scripts/analytics/snap2metis.scala:44`).
    """
    from pyspark.sql import functions as F

    blobs = agg.sketch_agg(df, "hll", value_col, group_cols, {"p": p})
    est = _estimate_udf()
    out = blobs.select(*group_cols, est("state").alias("est_distinct"))
    if include_global:
        from pyspark.sql.types import StringType

        for c in group_cols:
            if not isinstance(df.schema[c].dataType, StringType):
                # the global row injects the string '__all__' into each
                # group column; a non-string column would fail the union
                # (or silently coerce the whole column to string)
                raise TypeError(
                    f"include_global needs string group columns; {c!r} is "
                    f"{df.schema[c].dataType.simpleString()} — cast it or "
                    "call with include_global=False and merge separately")
        gblob = agg.merge_across(blobs, group_cols=())
        gout = gblob.select(est("state").alias("est_distinct"))
        for c in group_cols:
            gout = gout.withColumn(c, F.lit("__all__"))
        out = out.unionByName(gout.select(*group_cols, "est_distinct"))
    return out


def n_tok_quantiles(df, qs=(0.01, 0.25, 0.5, 0.75, 0.99), value_col="n_tok",
                    group_cols=("source",), kind: str = "kll",
                    params: dict | None = None):
    """Approximate quantiles of a numeric column per group (KLL or t-digest).

    → DataFrame(group_cols..., q double, value double) — long form, one row
    per requested quantile, mirroring the reference's percentile rows
    (`/root/reference/containers/analytics/scripts/log_parser.py:134-138`).
    """
    from pyspark.sql import functions as F

    blobs = agg.sketch_agg(df, kind, value_col, group_cols, params or {})
    quant = _quantile_udf(qs)
    wide = blobs.select(*group_cols, quant("state").alias("vals"))
    qlit = F.array(*[F.lit(float(q)) for q in qs])
    return wide.select(
        *group_cols,
        F.explode(F.arrays_zip(qlit.alias("q"), F.col("vals").alias("value")))
        .alias("z")).select(*group_cols, "z.q", "z.value")


def distinct_per_key(df, key_cols, value_col="tokens", kind="theta",
                     params: dict | None = None,
                     num_partitions: int | None = None):
    """Per-KEY approximate distinct — the high-cardinality state-table
    path (agg.sketch_agg_bykey): one raw-row hash shuffle on the key,
    each key's sketch built whole inside its shuffle partition, zero
    merge rounds. The per-source/partial path explodes at 10^6+ keys
    (#partitions × #keys partials); this one costs exactly what a
    built-in hash aggregate costs.

    Default kind is theta/KMV deliberately: it retains raw hashes while
    |set| < k, so per-key estimates of small sets (the overwhelmingly
    common case in per-user / per-domain state tables) are EXACT —
    `per_key_distinct` in `__spark_entry__` adjudicates this against
    COUNT(DISTINCT).

    → DataFrame(key_cols..., est_distinct double).
    """
    blobs = agg.sketch_agg_bykey(df, kind, value_col, key_cols, params,
                                 num_partitions)
    est = _estimate_udf()
    return blobs.select(*key_cols, est("state").alias("est_distinct"))


def quantiles_per_key(df, key_cols, value_col, qs=(0.5,), kind="dd",
                      params: dict | None = None,
                      num_partitions: int | None = None):
    """Per-KEY quantiles on the high-cardinality state-table plan (one
    hash shuffle, zero merge rounds — agg.sketch_agg_bykey). Default kind
    is DDSketch: deterministic bucket assignment makes the per-key
    estimates exactly replayable by an external engine, which is how
    `per_key_quantile` in `__spark_entry__` is adjudicated.

    → DataFrame(key_cols..., q double, value double), long form.
    """
    from pyspark.sql import functions as F

    blobs = agg.sketch_agg_bykey(df, kind, value_col, key_cols, params,
                                 num_partitions)
    quant = _quantile_udf(qs)
    wide = blobs.select(*key_cols, quant("state").alias("vals"))
    qlit = F.array(*[F.lit(float(q)) for q in qs])
    return wide.select(
        *key_cols,
        F.explode(F.arrays_zip(qlit.alias("q"), F.col("vals").alias("value")))
        .alias("z")).select(*key_cols, "z.q", "z.value")


def heavy_hitters(df, k: int = 20, value_col="tokens", group_cols=("source",),
                  depth: int = 4, width: int = 1 << 14,
                  candidates_per_partial: int | None = None):
    """Top-K most frequent tokens per group: CMS for counts + per-partition
    exact candidate heaps, merged tree-wise.

    Per partial: a CMS over all values plus the locally most frequent C
    candidates. Merge: CMS cell-sum + candidate-set union; final estimates
    come from the merged CMS, ranked, top-K kept. Any globally-frequent token
    is locally frequent in at least one partition slice (C >= k x oversample),
    the standard distributed heavy-hitter argument.

    → DataFrame(group_cols..., token long, est_count long, rank int).
    """
    from pyspark import TaskContext
    from pyspark.sql import functions as F
    from pyspark.sql.window import Window

    group_cols = list(group_cols)
    C = candidates_per_partial or max(8 * k, 256)
    in_schema = df.schema
    group_fields = ", ".join(
        f"{c} {in_schema[c].dataType.simpleString()}" for c in group_cols)
    schema = ((group_fields + ", ") if group_fields else "") + \
        "state binary, cands array<long>, n_items long, part_id long"
    params = {"depth": depth, "width": width}

    def partial(batches):
        """Arrow scan: zero-copy flat token buffer + shared dedupe per
        batch (same hot loop as agg.build_partials_multi), plus exact local
        candidate tracking for the distributed heavy-hitter argument."""
        import pyarrow as pa

        states: dict[tuple, cms_mod.CMS] = {}
        acc_u: dict[tuple, list] = {}  # per-batch (uniq, count) arrays
        acc_c: dict[tuple, list] = {}

        def ingest(gkey, uniq, counts):
            st = states.get(gkey)
            if st is None:
                st = cms_mod.CMS(**params)
                states[gkey] = st
                acc_u[gkey], acc_c[gkey] = [], []
            uniq64 = uniq.astype(np.int64, copy=False)
            st.update_hashes(hash64(uniq64.view(np.uint64)), counts=counts)
            acc_u[gkey].append(uniq64)
            acc_c[gkey].append(counts)

        for batch in batches:
            codes, mapping = agg._batch_columns(batch, group_cols)
            col = batch.column(value_col)
            flat, lens = agg._flatten_list_column(col)
            tg = np.repeat(codes, lens) if len(mapping) > 1 else None
            if flat.dtype.kind == "f":
                # element-level nulls arrive as float64+NaN from Arrow:
                # drop them (an astype would turn NaN into a garbage
                # int64 token), same guard as agg.build_partials_multi
                mask = ~np.isnan(flat)
                flat = flat[mask].astype(np.int64)
                if tg is not None:
                    tg = tg[mask]
            if flat.size == 0:
                continue
            if len(mapping) == 1:
                uniq, counts = agg._unique_counts(flat)
                ingest(mapping[min(mapping)], uniq, counts)
            else:
                for g in sorted(mapping):
                    sel = flat[tg == g]
                    if sel.size == 0:
                        continue
                    uniq, counts = agg._unique_counts(sel)
                    ingest(mapping[g], uniq, counts)
        if not states:
            return
        pid = TaskContext.get().partitionId()
        rows = []
        for gkey, st in states.items():
            # exact local counts across batches, vectorized group-sum
            uu = np.concatenate(acc_u[gkey])
            cc = np.concatenate(acc_c[gkey])
            uniq, inv = np.unique(uu, return_inverse=True)
            tot = np.zeros(uniq.size, dtype=np.int64)
            np.add.at(tot, inv, cc)
            order = np.lexsort((uniq, -tot))[:C]
            rows.append((*gkey, st.to_bytes(), uniq[order].tolist(),
                         int(st.n_items), pid))
        pdf = pd.DataFrame(rows, columns=group_cols + [
            "state", "cands", "n_items", "part_id"])
        try:
            from pyspark.sql.pandas.types import to_arrow_type
            gtypes = {c: to_arrow_type(in_schema[c].dataType)
                      for c in group_cols}
        except Exception:
            gtypes = {}
        arrays = [pa.array(pdf[c].tolist(), type=gtypes.get(c))
                  for c in group_cols]
        arrays += [pa.array(pdf["state"].tolist(), pa.binary()),
                   pa.array(pdf["cands"].tolist(), pa.list_(pa.int64())),
                   pa.array(pdf["n_items"].tolist(), pa.int64()),
                   pa.array(pdf["part_id"].tolist(), pa.int64())]
        yield pa.RecordBatch.from_arrays(
            arrays, names=group_cols + ["state", "cands", "n_items",
                                        "part_id"])

    def merge(key, pdf):
        merged = registry.merge_blobs(list(pdf["state"]))
        st = registry.from_bytes(merged)
        cands = np.unique(np.concatenate([np.asarray(c, dtype=np.int64)
                                          for c in pdf["cands"]]))
        est = st.estimate_hashes(hash64(cands.view(np.uint64)))
        order = np.argsort(-est, kind="stable")[:C]
        row = {c: pdf[c].iloc[0] for c in group_cols}
        row.update(state=merged, cands=cands[order].tolist(),
                   n_items=int(pdf["n_items"].sum()),
                   part_id=int(pdf["part_id"].iloc[0]))
        return pd.DataFrame([row])

    import math

    n_parts = df.rdd.getNumPartitions()
    partials = df.select(*group_cols, value_col).mapInArrow(partial, schema)
    fanin = 64
    rounds = max(1, math.ceil(math.log(max(n_parts, 2), fanin)))
    merged = partials
    for _ in range(rounds):
        merged = merged.withColumn(
            "part_id", (F.col("part_id") / F.lit(fanin)).cast("long"))
        merged = merged.groupBy(*group_cols, "part_id").applyInPandas(merge, schema)
    # unconditional final collapse to part_id=0 (same invariant as
    # agg.tree_merge): finalize reads ONE row per group — if the rounds
    # estimate ever under-counted, a silent >1-row group would drop
    # candidate data
    merged = (merged.withColumn("part_id", F.lit(0).cast("long"))
              .groupBy(*group_cols, "part_id").applyInPandas(merge, schema))

    # final: explode candidates, estimate with the merged CMS, rank, top-k
    def finalize(key, pdf):
        st = registry.from_bytes(pdf["state"].iloc[0])
        cands = np.asarray(pdf["cands"].iloc[0], dtype=np.int64)
        est = st.estimate_hashes(hash64(cands.view(np.uint64)))
        order = np.lexsort((cands, -est))[:k]
        row_base = {c: pdf[c].iloc[0] for c in group_cols}
        rows = [dict(row_base, token=int(cands[i]), est_count=int(est[i]),
                     rank=r + 1) for r, i in enumerate(order)]
        return pd.DataFrame(rows)

    out_schema = ((group_fields + ", ") if group_fields else "") + \
        "token long, est_count long, rank int"
    return merged.groupBy(*group_cols).applyInPandas(finalize, out_schema)


def build_membership(df, value_col="tokens", group_cols=("source",),
                     bits_per_item: int | None = None, n_blocks: int = 1 << 14):
    """Per-group blocked Bloom filters over all values → blob table."""
    return agg.sketch_agg(df, "bloom", value_col, group_cols,
                          {"n_blocks": n_blocks})


def vocabulary_overlap(df, group_cols=("source",), value_col="tokens",
                       p: int = 14):
    """Pairwise distinct-token overlap between groups via HLL
    inclusion–exclusion: |A∩B| ≈ est(A) + est(B) − est(A∪B), where A∪B is
    the kernel merge of the two group blobs (no rescan — sketch algebra on
    the per-group states). The U2/U4 set-operation family computed from
    KB-sized summaries instead of data.

    → DataFrame(group_a, group_b, est_a, est_b, est_union, est_overlap,
    jaccard) for every unordered group pair.

    Distributed shape: the KB-sized blob table self-joins on
    `group_a < group_b` (G² *pair rows*, spread over the cluster — never
    collected to the driver) and a pandas UDF merges each pair's two blobs.
    High-cardinality group columns (days, domains) therefore scale like any
    other join, instead of an O(G²) driver loop over collected state.
    """
    import pandas as pd
    from pyspark.sql import functions as F

    from . import agg

    blobs = agg.sketch_agg(df, "hll", value_col, group_cols, {"p": p})
    keyed = blobs.select(
        F.concat_ws("|", *[F.col(c).cast("string") for c in group_cols])
        .alias("group"), "state")

    @F.pandas_udf("array<double>")
    def pair_est(sa: pd.Series, sb: pd.Series) -> pd.Series:
        out = []
        for ba, bb in zip(sa, sb):
            a = registry.from_bytes(bytes(ba))
            b = registry.from_bytes(bytes(bb))
            out.append([float(a.estimate()), float(b.estimate()),
                        float(a.merge(b).estimate())])
        return pd.Series(out)

    a, b = keyed.alias("a"), keyed.alias("b")
    pairs = (a.join(b, F.col("a.group") < F.col("b.group"))
             .select(F.col("a.group").alias("group_a"),
                     F.col("b.group").alias("group_b"),
                     pair_est(F.col("a.state"), F.col("b.state")).alias("e")))
    eu = F.col("e")[2]
    inter = F.greatest(F.lit(0.0), F.col("e")[0] + F.col("e")[1] - eu)
    return pairs.select(
        "group_a", "group_b",
        F.round(F.col("e")[0], 1).alias("est_a"),
        F.round(F.col("e")[1], 1).alias("est_b"),
        F.round(eu, 1).alias("est_union"),
        F.round(inter, 1).alias("est_overlap"),
        F.round(F.when(eu > 0, inter / eu).otherwise(0.0), 4)
        .alias("jaccard"))


def vocabulary_overlap_theta(df, group_cols=("source",),
                             value_col="tokens", k: int = 4096):
    """Pairwise vocabulary set algebra via THETA sketches: per unordered
    group pair, direct estimates of |A∪B|, |A∩B|, |A−B| from the sample
    overlap of the two groups' retained hash sets — NOT inclusion–
    exclusion (that is vocabulary_overlap's HLL path, whose intersection
    error scales with the union size; theta's scales with the sample).

    Same distributed shape as vocabulary_overlap: KB-sized blob table
    self-joined on group_a < group_b, pandas UDF evaluates the set
    expressions per pair row. → DataFrame(group_a, group_b, est_a, est_b,
    est_union, est_inter, est_diff_ab, jaccard).
    """
    import pandas as pd
    from pyspark.sql import functions as F

    from . import agg

    blobs = agg.sketch_agg(df, "theta", value_col, group_cols, {"k": k})
    keyed = blobs.select(
        F.concat_ws("|", *[F.col(c).cast("string") for c in group_cols])
        .alias("group"), "state")

    @F.pandas_udf("array<double>")
    def pair_est(sa: pd.Series, sb: pd.Series) -> pd.Series:
        out = []
        for ba, bb in zip(sa, sb):
            a = registry.from_bytes(bytes(ba))
            b = registry.from_bytes(bytes(bb))
            out.append([float(a.estimate()), float(b.estimate()),
                        float(a.merge(b).estimate()),
                        float(a.intersect(b).estimate()),
                        float(a.a_not_b(b).estimate())])
        return pd.Series(out)

    a, b = keyed.alias("a"), keyed.alias("b")
    pairs = (a.join(b, F.col("a.group") < F.col("b.group"))
             .select(F.col("a.group").alias("group_a"),
                     F.col("b.group").alias("group_b"),
                     pair_est(F.col("a.state"), F.col("b.state"))
                     .alias("e")))
    eu = F.col("e")[2]
    return pairs.select(
        "group_a", "group_b",
        F.round(F.col("e")[0], 1).alias("est_a"),
        F.round(F.col("e")[1], 1).alias("est_b"),
        F.round(eu, 1).alias("est_union"),
        F.round(F.col("e")[3], 1).alias("est_inter"),
        F.round(F.col("e")[4], 1).alias("est_diff_ab"),
        F.round(F.when(eu > 0, F.col("e")[3] / eu).otherwise(0.0), 4)
        .alias("jaccard"))


def build_sharded_membership(df, n_shards: int = 32, value_col: str = "tokens",
                             n_blocks: int = 1 << 10):
    """Token-sharded Bloom filter table: one blob per shard, shard =
    `pmod(xxhash64(token), n_shards)` (R1 hash routing). Written
    `partitionBy("shard")`, a point probe reads exactly one shard directory
    — the reference's partition-aware query routing (R6, README.md:342;
    memcached lookup replaced by storage-level pruning)."""
    from pyspark.sql import functions as F

    from . import agg

    # cast to long BEFORE hashing: xxhash64 hashes the binary width, so an
    # int32 token and the same value as int64 route to different shards —
    # probes (always long) must see the same bytes the build saw
    exploded = df.select(
        F.explode(value_col).alias("t")).select(
        F.col("t").cast("long").alias("token"))
    routed = exploded.withColumn(
        "shard", F.pmod(F.xxhash64("token"), F.lit(n_shards)).cast("int"))
    return agg.sketch_agg(routed, "bloom", "token", ("shard",),
                          {"n_blocks": n_blocks})


def probe_sharded_membership(spark, blob_path: str, tokens, n_shards: int):
    """Point membership probes against a shard-partitioned Bloom table:
    compute each probe's shard (same JVM xxhash64 as the build), read ONLY
    those shard partitions (PartitionFilters prune the rest), probe the
    ≤ |probes| blobs locally. → DataFrame(token long, maybe_present bool)."""
    from pyspark.sql import functions as F

    probes = spark.createDataFrame([(int(t),) for t in tokens], "token long")
    probes = probes.withColumn(
        "shard", F.pmod(F.xxhash64("token"), F.lit(n_shards)).cast("int"))
    plocal = probes.collect()
    shards = sorted({r["shard"] for r in plocal})
    blobs = (spark.read.parquet(blob_path)
             .filter(F.col("shard").isin(shards))
             .select("shard", "state").collect())
    filters = {r["shard"]: registry.from_bytes(bytes(r["state"]))
               for r in blobs}
    out = []
    for r in plocal:
        flt = filters.get(r["shard"])
        tok = np.array([r["token"]], dtype=np.int64)
        hit = bool(flt.contains(tok.view(np.uint64))[0]) if flt else False
        out.append((r["token"], hit))
    return spark.createDataFrame(out, "token long, maybe_present boolean")


def probe_membership(spark, blobs_df, probes, group_cols=("source",)):
    """Probe tokens against per-group Bloom filters.

    `probes`: list[(group..., token)] or DataFrame(group..., token).
    → DataFrame(group..., token long, maybe_present boolean). Approximate
    analog of the reference's memcached point lookups
    (`/root/reference/scripts/interactive/gremlin/ADJParser.groovy:223-242`):
    the filter table is tiny → broadcast, never a per-row RPC.
    """
    from pyspark.sql import functions as F
    from pyspark.sql.functions import pandas_udf

    group_cols = list(group_cols)
    local = {tuple(r[c] for c in group_cols): bytes(r["state"])
             for r in blobs_df.collect()}
    bc = spark.sparkContext.broadcast(local)

    if not hasattr(probes, "columns"):
        probes = spark.createDataFrame(
            [tuple(p) for p in probes], group_cols + ["token"])

    cache: dict = {}  # per-task: deserialize blobs once, not per batch

    @pandas_udf("boolean")
    def probe(token: pd.Series, *gcols: pd.Series) -> pd.Series:
        filters = cache.get("f")
        if filters is None:
            filters = cache["f"] = {g: registry.from_bytes(b)
                                    for g, b in bc.value.items()}
        keys = pd.MultiIndex.from_arrays(list(gcols)) if gcols else None
        out = np.zeros(len(token), dtype=bool)
        toks = token.to_numpy().astype(np.int64)
        if keys is None:
            flt = filters.get(())
            if flt is not None:
                out[:] = flt.contains(toks.view(np.uint64))
        else:
            kdf = pd.DataFrame({i: g.to_numpy() for i, g in enumerate(gcols)})
            for gval, idx in kdf.groupby(list(kdf.columns), sort=False).groups.items():
                gval = gval if isinstance(gval, tuple) else (gval,)
                flt = filters.get(gval)
                if flt is not None:
                    ii = np.asarray(idx)
                    out[ii] = flt.contains(toks[ii].view(np.uint64))
        return pd.Series(out)

    return probes.withColumn(
        "maybe_present", probe(F.col("token"), *[F.col(c) for c in group_cols]))

def mg_heavy_hitters(df, k: int = 10, counters: int = 1024,
                     value_col="tokens", group_cols=("source",)):
    """Top-K most frequent tokens per group via the Misra–Gries summary
    (kernels/mg.py) — the deterministic, one-sided twin of the CMS path
    in `heavy_hitters`: every reported count is a lower bound tight to
    within the summary's decrement total, reported per row as the
    [est_min, est_max] bracket (est_max − est_min = dec ≤ n/(counters+1)).
    When the group's vocabulary fits the counter budget no eviction ever
    happens, dec = 0, and the bracket collapses to the exact count.

    Shape: the shared Arrow scan (`agg.sketch_agg`, one pass, zero-copy
    token buffers) builds per-partition MG states; blobs merge tree-wise
    by the PODS'12 summary-merge; the final per-group blob (KB-sized,
    |groups| rows) is exploded driver-free by one pandas pass.

    → DataFrame(group_cols..., token long, est_min long, est_max long,
    rank int), rank by (count desc, token asc).
    """
    from pyspark.sql import functions as F  # noqa: F401

    group_cols = list(group_cols)
    blobs = agg.sketch_agg(df, "mg", value_col, group_cols,
                           {"k": int(counters)})
    in_schema = blobs.schema
    group_fields = ", ".join(
        f"{c} {in_schema[c].dataType.simpleString()}" for c in group_cols)
    out_schema = ((group_fields + ", ") if group_fields else "") + \
        "token long, est_min long, est_max long, rank int"

    def explode(it):
        for pdf in it:
            rows = []
            for _, r in pdf.iterrows():
                st = registry.from_bytes(r["state"])
                keys, cnts = st.heavy_hitters()
                for i in range(min(int(k), keys.size)):
                    rows.append(tuple(r[c] for c in group_cols)
                                + (int(keys[i]), int(cnts[i]),
                                   int(cnts[i]) + st.dec, i + 1))
            yield pd.DataFrame(
                rows, columns=group_cols + ["token", "est_min",
                                            "est_max", "rank"])

    return blobs.mapInPandas(explode, out_schema)


def f2_moment(df, value_col="tokens", group_cols=("source",),
              depth: int = 5, width: int = 1 << 13,
              include_global: bool = False):
    """Approximate second frequency moment F₂ = Σ f(token)² per group via
    Count-Sketch/AMS (kernels/cs.py) — self-join size / token-skew mass,
    the moment none of the other kernels answers. Relative error
    ≤ √(6/width) w.h.p. (tests + tools/error_report.py gate it).

    Same shape as distinct_tokens: one Arrow scan → per-partition CS
    states → tree merge of KB blobs → one pandas finalize over |groups|
    rows. Because CS merge is exact cell-wise addition, the global row
    (include_global) is derived by merging the per-group blobs — no
    second scan.

    → DataFrame(group_cols..., est_f2 double).
    """
    import pandas as pd
    from pyspark.sql import functions as F
    from pyspark.sql.functions import pandas_udf

    @pandas_udf("double")
    def f2(state: pd.Series) -> pd.Series:
        return state.map(
            lambda b: float(registry.from_bytes(b).f2_estimate()))

    blobs = agg.sketch_agg(df, "cs", value_col, group_cols,
                           {"depth": depth, "width": width})
    out = blobs.select(*group_cols, f2("state").alias("est_f2"))
    if include_global:
        gblob = agg.merge_across(blobs, group_cols=())
        gout = gblob.select(f2("state").alias("est_f2"))
        for c in group_cols:
            gout = gout.withColumn(c, F.lit("__all__"))
        out = out.unionByName(gout.select(*group_cols, "est_f2"))
    return out


# ------------------------------------------------------- state introspection

def hll_register_table(blobs_df, group_cols=("grp",)):
    """Long-form dump of the NONZERO HLL registers in a blob table:
    → DataFrame(group_cols..., idx int, rank int).

    Mode-independent: sparse codes and dense registers decode to the same
    (idx, max-rank) pairs, so the output is a pure function of the
    distinct-hash set — which is what lets an external engine re-derive
    it from the raw table and hash-compare (`hll_register_replay` in
    `__spark_entry__`, via oracle_replay.hll_register_cols). This is the
    sketch-state analog of the reference's partition-assignment dump
    (`EdgeCutSGP.java:247-255` writes the raw id→partition map, not a
    summary of it)."""
    import pandas as pd
    from pyspark.sql import functions as F
    from pyspark.sql.functions import pandas_udf

    @pandas_udf("array<struct<idx:int,rank:int>>")
    def regs(state: pd.Series) -> pd.Series:
        out = []
        for b in state:
            h = registry.from_bytes(bytes(b))
            if h.sparse is not None:
                idx = (h.sparse >> np.uint32(6)).astype(int)
                rank = (h.sparse & np.uint32(63)).astype(int)
            else:
                idx = np.flatnonzero(h.dense)
                rank = h.dense[idx].astype(int)
            out.append([{"idx": int(i), "rank": int(r)}
                        for i, r in zip(idx, rank)])
        return pd.Series(out)

    group_cols = list(group_cols)
    return (blobs_df.select(*group_cols, F.explode(regs("state")).alias("r"))
            .select(*group_cols, F.col("r.idx").alias("idx"),
                    F.col("r.rank").alias("rank")))


def theta_summary_table(blobs_df, group_cols=("grp",)):
    """Theta/KMV state summary per group: retained-sample size, inclusion
    probability and the estimate derived from them —
    → DataFrame(group_cols..., n_retained long, theta_frac double,
    est_distinct double).

    All three are deterministic order statistics of the distinct-hash set
    (kernels/theta.py:_trim keeps the k smallest below the (k+1)-th), so
    an order-statistic window query re-derives them exactly
    (`theta_kmv_replay` oracle)."""
    import pandas as pd
    from pyspark.sql import functions as F
    from pyspark.sql.functions import pandas_udf

    @pandas_udf("struct<n_retained:long,theta_frac:double,est_distinct:double>")
    def summ(state: pd.Series) -> pd.DataFrame:
        out = []
        for b in state:
            t = registry.from_bytes(bytes(b))
            out.append({"n_retained": int(t.retained.size),
                        "theta_frac": float(t._theta_frac()),
                        "est_distinct": float(t.estimate())})
        return pd.DataFrame(out, columns=["n_retained", "theta_frac",
                                          "est_distinct"])

    group_cols = list(group_cols)
    return (blobs_df.select(*group_cols, summ("state").alias("s"))
            .select(*group_cols, "s.n_retained", "s.theta_frac",
                    "s.est_distinct"))
