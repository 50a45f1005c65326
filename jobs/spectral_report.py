"""spark-submit entry: Frequent Directions spectral summary of an
embedding table — the 'is this embedding space collapsing' health check
a pipeline runs per corpus snapshot before clustering / SemDeDup /
ANN-index builds.

Usage (cluster):
    spark-submit --py-files sgp_sketch.zip jobs/spectral_report.py \
        --input s3://bucket/embeddings --vec-col embedding \
        --d 1024 --ell 64 --k 10 --output s3://bucket/spectrum

Local smoke:
    python jobs/spectral_report.py --input /root/testdata/sf0.001 \
        --table embeddings --output /tmp/spectrum --master local[4]

Writes two parquet tables under --output: `blobs/` (the mergeable FD
states, one row per group — reusable as the `state_blobs` input of an
incremental update) and `spectrum/` (rank, sing_value,
gram_error_bound, n_rows per group), and prints a one-line JSON summary.
Config via argparse (the reference drives runs from properties/JSON
grids, /root/reference/containers/analytics/scripts/run_experiments.py:123-149).
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
    ap.add_argument("--table", default=None,
                    help="subdirectory/table name under --input")
    ap.add_argument("--vec-col", default="embedding")
    ap.add_argument("--d", type=int, default=64)
    ap.add_argument("--ell", type=int, default=16)
    ap.add_argument("--k", type=int, default=5)
    ap.add_argument("--group-cols", default="",
                    help="comma-separated; empty = one global sketch")
    ap.add_argument("--output", required=True)
    ap.add_argument("--master", default=None)
    args = ap.parse_args(argv)

    from sgp_sketch.matrix import fd_agg, spectrum_from_blobs
    from sgp_sketch.session import get_spark

    spark = get_spark("spectral-report", master=args.master)
    t0 = time.monotonic()
    try:
        path = args.input
        if args.table:
            path = os.path.join(path, f"{args.table}.parquet")
        df = spark.read.parquet(path)
        groups = tuple(c for c in args.group_cols.split(",") if c)
        # one corpus scan: write the blobs, then derive the spectrum by
        # re-READING the written blob table (KB-sized), never rescanning
        blobs = fd_agg(df, args.vec_col, d=args.d, ell=args.ell,
                       group_cols=groups)
        blobs.write.mode("overwrite").parquet(
            os.path.join(args.output, "blobs"))
        blob_tbl = spark.read.parquet(os.path.join(args.output, "blobs"))
        spec = spectrum_from_blobs(blob_tbl, k=args.k, group_cols=groups)
        spec.write.mode("overwrite").parquet(
            os.path.join(args.output, "spectrum"))
        rows = (spark.read.parquet(os.path.join(args.output, "spectrum"))
                .collect())  # groups x k rows — tiny
        n_groups = (len({tuple(r[c] for c in groups) for r in rows})
                    if groups else 1)
        top = min(rows, key=lambda r: r["rank"]) if rows else None
        print(json.dumps({
            "job": "spectral_report", "n_rows_sketched":
                int(top["n_rows"]) if top else 0,
            "n_groups": n_groups, "ell": args.ell, "k": args.k,
            "top_sing_value": float(top["sing_value"]) if top else None,
            "gram_error_bound":
                float(top["gram_error_bound"]) if top else None,
            "seconds": round(time.monotonic() - t0, 2)}))
        return 0
    finally:
        spark.stop()


if __name__ == "__main__":
    raise SystemExit(main())
