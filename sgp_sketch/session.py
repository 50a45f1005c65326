"""SparkSession builder with the engine's standard configuration.

Local defaults match the sandbox (local[N], 32 cores); on a real cluster the
same settings apply per-executor and `master` is left to spark-submit.
"""

from __future__ import annotations

import os


def get_spark(app_name: str = "sgp_sketch", master: str | None = None,
              shuffle_partitions: int | None = None, extra_conf: dict | None = None):
    from pyspark.sql import SparkSession

    cpus = int(os.environ.get("SPARK_GRAFT_CPUS", "32"))
    master = master or f"local[{cpus}]"
    shuffle_partitions = shuffle_partitions or cpus
    b = (SparkSession.builder.appName(app_name).master(master)
         .config("spark.sql.shuffle.partitions", str(shuffle_partitions))
         .config("spark.sql.session.timeZone", "UTC")
         .config("spark.sql.adaptive.enabled", "true")
         .config("spark.sql.adaptive.coalescePartitions.enabled", "true")
         # runtime skew-join splitting: the AQE complement to our
         # writer-side salting (routing.route_tokens_salted) — near-dup
         # LSH buckets and token joins are exactly the skew shapes it fixes
         .config("spark.sql.adaptive.skewJoin.enabled", "true")
         .config("spark.sql.execution.arrow.pyspark.enabled", "true")
         .config("spark.sql.execution.arrow.maxRecordsPerBatch", "10000")
         .config("spark.driver.memory",
                 os.environ.get("SPARK_GRAFT_DRIVER_MEM", "16g"))
         .config("spark.ui.enabled", "false"))
    for k, v in (extra_conf or {}).items():
        b = b.config(k, v)
    return b.getOrCreate()


def fan_out(df, min_parts: int | None = None):
    """Raise the parallelism of a CPU-heavy per-row stage when the scan
    offers fewer partitions than the cluster has slots.

    Spark splits parquet by byte ranges, but a file with a single row
    group yields exactly one task no matter the config — and work that
    EXPANDS each row (n-gram explode, shingle hashing, minhash/simhash
    UDFs) then runs serially on one slot while the rest of the cluster
    idles. This helper round-robin repartitions to the default
    parallelism ONLY in that case; at 100-TB scale scans arrive with
    thousands of partitions and it is a no-op, so the shuffle it adds is
    by construction bounded by (cluster slots × small-file size).
    Streaming DataFrames are returned unchanged (their parallelism is
    the source's concern)."""
    if df.isStreaming:
        return df
    target = min_parts or df.sparkSession.sparkContext.defaultParallelism
    if df.rdd.getNumPartitions() >= target:
        return df
    return df.repartition(target)
