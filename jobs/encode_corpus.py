"""spark-submit entry: BPE tokenize a document corpus — train (or load) a
merge list, vectorized-encode every document, and write the
input_hint-shaped token table (doc_id, tokens array, n_tok, source).

The corpus pass is the round-4 vectorized path (bpe.encode_with_merges):
distinct words encode once via chained JVM wrapped-string replaces, the
word→subwords map broadcasts as a one-row dimension, and the rewrite is
transform/element_at/flatten — zero Python nodes, zero corpus shuffle.
Here subword strings additionally map to int64 token ids with xxhash64
(JVM, the same id scheme as testdata.doc_tokens_from) so the output is
directly consumable by the sketch-build jobs.

Usage (cluster):
    spark-submit --py-files sgp_sketch.zip jobs/encode_corpus.py \
        --input s3://bucket/documents --output s3://bucket/tokens \
        --merges s3://bucket/merges.json --n-merges 2000

Local smoke:
    python jobs/encode_corpus.py --input /root/testdata/sf0.001 \
        --table documents --output /tmp/bpe_tokens --n-merges 10

Writes the token table partitioned by source, plus merges.json (the
learned/loaded merge list: replayable, engine-agnostic) and an
encode_stats.json audit (doc/word/token counts, throughput) next to it.
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
    ap.add_argument("--merges", default=None,
                    help="JSON file of [[rank, a, b, count], ...] to load "
                         "instead of training (reuse one tokenizer across "
                         "corpus snapshots)")
    ap.add_argument("--n-merges", type=int, default=50)
    ap.add_argument("--text-col", default="text")
    ap.add_argument("--master", default=None)
    args = ap.parse_args(argv)

    from pyspark.sql import functions as F

    from sgp_sketch.bpe import encode_with_merges, train_bpe
    from sgp_sketch.checkpoint import _fs_write_text, _join
    from sgp_sketch.deploy import ensure_py_files
    from sgp_sketch.session import get_spark

    input_path = (f"{args.input.rstrip('/')}/{args.table}.parquet"
                  if args.table else args.input)
    spark = get_spark("sgp-encode-corpus", master=args.master)
    ensure_py_files(spark)
    t0 = time.perf_counter()
    docs = spark.read.parquet(input_path)

    if args.merges:
        # Hadoop FS reader, not builtin open(): --merges may be an
        # object-store URI (the job writes merges.json with the same
        # URI-capable writer, so reuse mode must read it back anywhere)
        from sgp_sketch.checkpoint import _fs_read_text

        merges = [tuple(m)
                  for m in json.loads(_fs_read_text(spark, args.merges))]
    else:
        merges, vocab = train_bpe(docs, n_merges=args.n_merges,
                                  text_col=args.text_col)
        vocab.unpersist()
    train_dt = time.perf_counter() - t0

    t1 = time.perf_counter()
    enc = encode_with_merges(docs, merges, text_col=args.text_col)
    out = enc.select(
        F.col("doc_id").cast("string").alias("doc_id"),
        F.transform("bpe_tokens", lambda s: F.xxhash64(s)).alias("tokens"),
        F.size("bpe_tokens").cast("int").alias("n_tok"),
        "source")
    out.write.mode("overwrite").partitionBy("source") \
        .parquet(_join(args.output, "tokens"))
    stats_row = (spark.read.parquet(_join(args.output, "tokens"))
                 .agg(F.count(F.lit(1)).alias("n_docs"),
                      F.sum("n_tok").alias("n_tokens")).collect()[0])
    encode_dt = time.perf_counter() - t1

    _fs_write_text(spark, _join(args.output, "merges.json"),
                   json.dumps([list(m) for m in merges]))
    stats = {"n_docs": int(stats_row["n_docs"]),
             "n_bpe_tokens": int(stats_row["n_tokens"] or 0),
             "n_merges": len(merges),
             "train_seconds": round(train_dt, 2),
             "encode_seconds": round(encode_dt, 2),
             "tokens_per_sec": round(
                 (stats_row["n_tokens"] or 0) / max(encode_dt, 1e-9), 1)}
    _fs_write_text(spark, _join(args.output, "encode_stats.json"),
                   json.dumps(stats, indent=1))
    print(json.dumps({"output": args.output, **stats}), flush=True)
    spark.stop()
    return 0


if __name__ == "__main__":
    raise SystemExit(main())
