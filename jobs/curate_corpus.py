"""spark-submit entry: end-to-end corpus curation (exact dedup → near-dup
removal → quality filter → stratified sample).

Usage (cluster):
    spark-submit --py-files sgp_sketch.zip jobs/curate_corpus.py \
        --input s3://bucket/documents --output s3://bucket/curated \
        --jaccard 0.8 --min-words 20 --max-words 90 --sample 1000

Local smoke:
    python jobs/curate_corpus.py --input /root/testdata/sf0.001 \
        --table documents --output /tmp/curated --sample 5

Writes the curated documents parquet (partitioned by source) plus a
funnel.json audit (per-source counts after every stage) next to it.
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
    ap.add_argument("--table", default=None)
    ap.add_argument("--output", required=True)
    ap.add_argument("--jaccard", type=float, default=0.8)
    ap.add_argument("--min-words", type=int, default=20)
    ap.add_argument("--max-words", type=int, default=90)
    ap.add_argument("--max-chars-per-word", type=float, default=8.0)
    ap.add_argument("--max-dup-frac", type=float, default=None,
                    help="optional Gopher-style repetition gate: drop docs "
                         "whose duplicate-3-gram fraction exceeds this")
    ap.add_argument("--sample", type=int, default=1000)
    ap.add_argument("--master", default=None)
    args = ap.parse_args(argv)

    from sgp_sketch.checkpoint import _fs_write_text, _join
    from sgp_sketch.deploy import ensure_py_files
    from sgp_sketch.pipeline import curate_corpus
    from sgp_sketch.session import get_spark

    input_path = (f"{args.input.rstrip('/')}/{args.table}.parquet"
                  if args.table else args.input)
    spark = get_spark("sgp-curate-corpus", master=args.master)
    ensure_py_files(spark)
    t0 = time.perf_counter()
    docs = spark.read.parquet(input_path)
    out = curate_corpus(docs, jaccard_threshold=args.jaccard,
                        min_words=args.min_words, max_words=args.max_words,
                        max_chars_per_word=args.max_chars_per_word,
                        max_dup_frac=args.max_dup_frac,
                        sample_per_source=args.sample)
    (out["sampled"].write.mode("overwrite")
     .partitionBy("source").parquet(_join(args.output, "documents")))
    funnel = [r.asDict() for r in out["funnel"].orderBy("source").collect()]
    out["unpersist"]()
    summary = {"stages": ["exact", "near", "quality", "sampled"],
               "funnel": funnel,
               "params": {"jaccard": args.jaccard,
                          "min_words": args.min_words,
                          "max_words": args.max_words,
                          "max_chars_per_word": args.max_chars_per_word,
                          "sample_per_source": args.sample},
               "seconds": round(time.perf_counter() - t0, 2)}
    _fs_write_text(spark, _join(args.output, "funnel.json"),
                   json.dumps(summary, indent=1))
    print(json.dumps({"output": args.output,
                      "n_curated": sum(f["n_sampled"] for f in funnel),
                      "seconds": summary["seconds"]}), flush=True)
    spark.stop()
    return 0


if __name__ == "__main__":
    raise SystemExit(main())
