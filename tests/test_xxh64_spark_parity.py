"""Spark-parity gate for the xxHash64 oracle replay (oracle_replay.py).

The DuckDB SQL generators are pinned to the scalar Python references in
tests/test_oracle_replay.py (no Spark).  This file closes the chain: the
references equal Spark's own ``F.xxhash64`` (XXH64, seed 42) on the JVM,
for every input class the replay claims — signed longs of all magnitudes
and ASCII strings of every supported byte length 0..31 (covering all
stripe / 4-byte / byte-tail branch combinations).  Together the two gates
make the SQL replay transitively Spark-bit-exact.
"""

import numpy as np
import pytest
from pyspark.sql import functions as F

from sgp_sketch.oracle_replay import xxh64_ascii_const, xxh64_long_const


def _signed(u: int) -> int:
    return u - (1 << 64) if u >= (1 << 63) else u


def test_xxh64_long_const_matches_spark(spark):
    rng = np.random.default_rng(23)
    vals = ([0, 1, -1, 42, 255, 2**31 - 1, -(2**31), 2**32, 2**53,
             2**63 - 1, -(2**63)]
            + [int(v) for v in
               rng.integers(-2**63, 2**63, size=300, dtype=np.int64)])
    rows = (spark.createDataFrame([(v,) for v in vals], "v long")
            .select("v", F.xxhash64("v").alias("h")).collect())
    assert len(rows) == len(vals)
    for r in rows:
        assert r.h == _signed(xxh64_long_const(r.v)), r.v


def test_xxh64_str_const_matches_spark(spark):
    """Byte lengths 0..127 — the tail branches AND the >= 32-byte
    four-accumulator path (which the minhash band-bucket oracle's
    ~83-byte signature strings exercise) are all Spark-gated, so the
    two-gate transitivity claim covers every length the SQL generator
    supports."""
    rng = np.random.default_rng(29)
    chars = np.array(list(
        "abcdefghijklmnopqrstuvwxyzABCDEFGHIJKLMNOPQRSTUVWXYZ"
        "0123456789 _-.!~'|,:/"))
    strs = [""] + ["".join(rng.choice(chars, size=length))
                   for length in range(128) for _ in range(3)]
    rows = (spark.createDataFrame([(s,) for s in strs], "s string")
            .select("s", F.xxhash64("s").alias("h")).collect())
    assert len(rows) == len(strs)
    for r in rows:
        assert r.h == _signed(xxh64_ascii_const(r.s)), repr(r.s)


def test_xxh64_testdata_word_shapes_match_spark(spark):
    """The exact shapes the production tokenizer hashes: testdata corpus
    words (≤ 8 ASCII bytes) and stringified doc ids — the token chain
    xxhash64(word) and the router's doc-id leg."""
    words = ["a", "of", "the", "data", "spark", "stream", "shard", "sketchy",
             "w1", "tok_7", "0", "499", "12345", "99999999"]
    rows = (spark.createDataFrame([(w,) for w in words], "w string")
            .select("w", F.xxhash64("w").alias("h"),
                    F.xxhash64(F.xxhash64("w")).alias("hh")).collect())
    for r in rows:
        u = xxh64_ascii_const(r.w)
        assert r.h == _signed(u), r.w
        # long re-hash: Spark feeds the SIGNED long; the replay's uint64
        # view is the same 64 bits
        assert r.hh == _signed(xxh64_long_const(_signed(u))), r.w
