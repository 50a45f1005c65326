"""Adapters from the driver-provided testdata tables
(/root/testdata/sf*/: TPC-H-ish + documents/embeddings/events, TESTDATA.md)
to the engine's input shapes.

The `tokens` view tokenizes `documents.text` by single-space split — exactly
expressible in DuckDB as `unnest(string_split(text, ' '))`, which is what
makes the exact-path oracle queries hash-comparable. Word → int64 token ids
use Spark's built-in `xxhash64` JVM-side (the vectorized slow-path-free way
to get integer tokens from strings). Since round 5 DuckDB CAN reproduce
xxhash64 for the < 32-byte inputs this corpus produces
(oracle_replay.xxh64_str_sql / xxh64_long_sql — XXH64's sub-32-byte tail is
a fixed unrolled chain of wrapping uint64 ops), so the production token ids
themselves are oracle-adjudicated (q_xxhash_token_replay); estimate queries
remain estimate-path by nature.
"""

from __future__ import annotations


def load(spark, sf_dir: str, name: str):
    return spark.read.parquet(f"{sf_dir}/{name}.parquet")


def doc_words(spark, sf_dir: str):
    """documents → exploded (doc_id, source, word) — string tokens, exactly
    reproducible in DuckDB."""
    from pyspark.sql import functions as F

    docs = load(spark, sf_dir, "documents")
    return docs.select(
        "doc_id", "source",
        F.explode(F.split(F.col("text"), " ")).alias("word"))


def doc_tokens_from(docs):
    """documents DataFrame → input_hint-shaped tokens table:
    (doc_id string, tokens array<bigint>, n_tok int, source string), token
    ids from xxhash64(word) — the engine's native input."""
    from pyspark.sql import functions as F

    return docs.select(
        F.col("doc_id").cast("string").alias("doc_id"),
        F.transform(F.split(F.col("text"), " "),
                    lambda w: F.xxhash64(w)).alias("tokens"),
        F.size(F.split(F.col("text"), " ")).cast("int").alias("n_tok"),
        "source")


def doc_tokens(spark, sf_dir: str):
    return doc_tokens_from(load(spark, sf_dir, "documents"))
