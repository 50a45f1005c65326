"""spark-submit entry: doc→shard assignment with balance/rf metrics.

Usage:
    spark-submit --py-files sgp_sketch.zip jobs/route_tokens.py \
        --input /data/tokens --output /data/assignment \
        --algorithm fennel --shards 64 --slack 0.05

Writes the assignment table (doc_id, shard) partitioned by shard and a
metrics JSON (shard loads, imbalance, replication factor) — the outputs of
the reference's partitioner run (`id,partition` CSV + cut stats,
`/root/reference/src/main/java/ca/uwaterloo/cs/sgp/streaming/EdgeCutSGP.java:247-263`).
"""

from __future__ import annotations

import argparse
import json
import os
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))


def main(argv=None) -> int:
    ap = argparse.ArgumentParser(description=__doc__)
    ap.add_argument("--input", required=True)
    ap.add_argument("--output", required=True)
    ap.add_argument("--algorithm", default="fennel",
                    choices=["hash", "ldg", "fennel"])
    ap.add_argument("--shards", type=int, default=64)
    ap.add_argument("--slack", type=float, default=0.05)
    ap.add_argument("--master", default=None)
    args = ap.parse_args(argv)

    from sgp_sketch.deploy import ensure_py_files
    from sgp_sketch.routing import (assign_shards, balance_metrics,
                                    replication_factor, route_hash)
    from sgp_sketch.session import get_spark

    spark = get_spark("sgp-route-tokens", master=args.master)
    ensure_py_files(spark)
    t0 = time.perf_counter()
    toks = spark.read.parquet(args.input)
    if args.algorithm == "hash":
        assign = route_hash(toks, "doc_id", args.shards).select(
            "doc_id", "shard")
    else:
        assign = assign_shards(toks, n_shards=args.shards,
                               algorithm=args.algorithm, slack=args.slack)
    assign = assign.cache()
    assign.write.mode("overwrite").partitionBy("shard").parquet(
        os.path.join(args.output, "assignment"))
    bm = balance_metrics(assign).collect()[0].asDict()
    rf = replication_factor(toks, assign).collect()[0].asDict()
    metrics = {
        "algorithm": args.algorithm, "n_shards": args.shards,
        "seconds": round(time.perf_counter() - t0, 2),
        "li_max": int(bm["li_max"]), "li_min": int(bm["li_min"]),
        "imbalance": round(float(bm["imbalance"]), 4),
        "rf": round(float(rf["rf"]), 4),
        "n_tokens_distinct": int(rf["n_tokens"]),
    }
    with open(os.path.join(args.output, "metrics.json"), "w") as fh:
        json.dump(metrics, fh, indent=1)
    print(json.dumps(metrics))
    spark.stop()
    return 0


if __name__ == "__main__":
    raise SystemExit(main())
