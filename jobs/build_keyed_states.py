"""spark-submit entry: per-KEY sketch state table (high-cardinality path).

Usage (cluster):
    spark-submit --py-files sgp_sketch.zip jobs/build_keyed_states.py \
        --input s3://bucket/events --key-cols user_id \
        --sketch theta:tok --output s3://bucket/user_states \
        --buckets 4096

Local smoke:
    python jobs/build_keyed_states.py --input /root/testdata/sf0.001 \
        --table events --key-cols user_id --sketch theta:tok \
        --output /tmp/user_states --master local[4]

Builds one sketch per distinct key via agg.sketch_agg_bykey — ONE raw-row
hash shuffle on the key, each key's state built whole inside its shuffle
partition, zero merge rounds (the plan a built-in hash aggregate uses;
the partial+tree-merge path would emit #partitions × #keys blobs and is
the wrong shape beyond ~10^5 keys). The output state table is written
partitioned by `bucket = pmod(hash(key), --buckets)` so a point lookup
("give me user X's sketch") prunes to one directory, and incremental
re-merges (tomorrow's events → merge_blobs per key) touch one bucket at a
time. Role parallel in the reference: the per-partition vertex→shard
assignment state the streaming partitioners keep
(/root/reference/src/main/java/ca/uwaterloo/cs/sgp/streaming/EdgeCutSGP.java:28-31),
here generalized to a persisted per-key summary-state table.
"""

from __future__ import annotations

import argparse
import json
import os
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

from build_sketches import parse_sketch  # noqa: E402  (same CLI grammar)


def main(argv=None) -> int:
    ap = argparse.ArgumentParser(description=__doc__)
    ap.add_argument("--input", required=True)
    ap.add_argument("--table", default=None,
                    help="subdirectory/table name under --input")
    ap.add_argument("--key-cols", default="user_id")
    ap.add_argument("--sketch", default="theta:tok",
                    help="kind:value_col[:k=v,...] (single spec — one "
                         "state blob per key)")
    ap.add_argument("--output", required=True)
    ap.add_argument("--buckets", type=int, default=256,
                    help="output partition dirs: pmod(hash(key), buckets)")
    ap.add_argument("--num-partitions", type=int, default=None,
                    help="shuffle partitions for the per-key build")
    ap.add_argument("--master", default=None)
    args = ap.parse_args(argv)

    from pyspark.sql import functions as F

    from sgp_sketch import agg
    from sgp_sketch.deploy import ensure_py_files
    from sgp_sketch.session import get_spark

    _name, spec = parse_sketch(args.sketch)
    key_cols = [c for c in args.key_cols.split(",") if c]
    input_path = (os.path.join(args.input, f"{args.table}.parquet")
                  if args.table else args.input)

    spark = get_spark("sgp-build-keyed-states", master=args.master)
    ensure_py_files(spark)
    t0 = time.perf_counter()

    df = spark.read.parquet(input_path)
    # events tables get a token column on the fly (hash of the type
    # string); token tables pass through
    if spec["value_col"] not in df.columns:
        if "event_type" in df.columns:
            df = df.withColumn(spec["value_col"],
                               F.xxhash64("event_type"))
        else:
            raise SystemExit(f"column {spec['value_col']!r} not in input")

    states = agg.sketch_agg_bykey(df, spec["kind"], spec["value_col"],
                                  key_cols, spec["params"],
                                  args.num_partitions)
    out = states.withColumn(
        "bucket", F.pmod(F.xxhash64(*key_cols), F.lit(args.buckets))
        .cast("int"))
    (out.write.mode("overwrite").partitionBy("bucket")
     .parquet(args.output))

    n_keys = spark.read.parquet(args.output).count()
    summary = {
        "seconds": round(time.perf_counter() - t0, 2),
        "n_keys": n_keys,
        "kind": spec["kind"],
        "buckets": args.buckets,
        "output": args.output,
    }
    print(json.dumps(summary))
    spark.stop()
    return 0


if __name__ == "__main__":
    raise SystemExit(main())
