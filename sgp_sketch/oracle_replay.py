"""Cross-engine EXACT replay of the kernel hash chain in DuckDB SQL.

Every hash sketch in this library consumes ``h = splitmix64(token)``
(agg.py feeds kernels pre-hashed uint64s; seeded lanes are
``splitmix64(h XOR splitmix64(seed))`` — kernels/hashing.py).  splitmix64
is pure wrapping uint64 arithmetic, and DuckDB's HUGEINT is wide enough
to replay it bit-for-bit: add/mod are native, xor works on HUGEINT, a
logical right-shift of a non-negative value is floor-division by a power
of two, and a wrapping 64-bit multiply splits into 32×64-bit partial
products that each fit in 128 bits.

That turns the sketch STATE itself into an oracle-checkable quantity:
an external engine with no knowledge of the Python kernels re-derives
HLL registers, theta retained-hash order statistics, Bloom bit
positions and CMS counter sums from the raw tables, and the driver
hash-compares them row-for-row against the blobs Spark built.  (The
same move as the md5-based `hash_split_counts` oracle, extended from
one modulus to the full hash chain.)

Token ids for these replay queries are md5-derived —
``CAST(conv(substr(md5(x),1,15),16,10) AS BIGINT)`` on the Spark side,
``CAST('0x' || substr(md5(x),1,15) AS UBIGINT)`` in DuckDB — because the
production xxhash64 tokenization (testdata.doc_tokens) has no DuckDB
counterpart.  15 hex chars = 60 bits, so values are non-negative in
BIGINT and the int64→uint64 view inside agg.py is the identity.

Reference tie-in: the reference proves partitioner correctness by
re-deriving assignments from an independent implementation
(`/root/reference/src/main/java/ca/uwaterloo/cs/sgp/streaming/EdgeCutSGP.java:122`
floorMod bucketing checked against the Scala converters); these oracles
are that discipline applied to every hash-sketch kernel.
"""

from __future__ import annotations

M64 = 1 << 64
_C1 = 0x9E3779B97F4A7C15
_C2 = 0xBF58476D1CE4E5B9
_C3 = 0x94D049BB133111EB
GOLDEN_CONST = _C1  # == kernels.hashing.GOLDEN (seed stride, e.g. minhash)


def splitmix64_const(seed: int) -> int:
    """Python-side splitmix64 of a scalar (for precomputing seed lanes)."""
    x = (seed + _C1) % M64
    x ^= x >> 30
    x = (x * _C2) % M64
    x ^= x >> 27
    x = (x * _C3) % M64
    x ^= x >> 31
    return x


def _mulmod(col: str, c: int) -> str:
    """(col * c) mod 2^64 for col in [0, 2^64) HUGEINT, c a 64-bit const.

    Splits c into 32-bit halves so every partial product stays < 2^96.
    """
    ch, cl = c >> 32, c & 0xFFFFFFFF
    return (f"(({col}) * {cl} + (((({col}) % 4294967296) * {ch}) "
            f"% 4294967296) * 4294967296) % {M64}")


def sm64_cols(in_expr: str, out: str, prefix: str) -> str:
    """SELECT-list fragment computing ``splitmix64(in_expr) AS out``.

    Uses DuckDB lateral column aliases (each step names the previous
    step), so the generated SQL stays linear in the 6 steps instead of
    exponentially duplicating subexpressions.  ``in_expr`` must be a
    non-negative HUGEINT expression < 2^64; ``prefix`` must be unique
    within the SELECT.
    """
    p = prefix
    return (f"(({in_expr}) + {_C1}) % {M64} AS {p}1, "
            f"xor({p}1, {p}1 // 1073741824) AS {p}2, "          # >> 30
            f"{_mulmod(p + '2', _C2)} AS {p}3, "
            f"xor({p}3, {p}3 // 134217728) AS {p}4, "           # >> 27
            f"{_mulmod(p + '4', _C3)} AS {p}5, "
            f"xor({p}5, {p}5 // 2147483648) AS {out}")          # >> 31


def seeded_sm64_cols(h_col: str, seed: int, out: str, prefix: str) -> str:
    """``hash64(h, seed) = splitmix64(h XOR splitmix64(seed))`` fragment
    (hashing.py:44 — seed must be non-zero, as in the kernels)."""
    if not seed:
        raise ValueError("seeded lane needs a non-zero seed")
    return sm64_cols(f"xor({h_col}, {splitmix64_const(seed)})", out, prefix)


def md5_token_sql(expr: str) -> str:
    """DuckDB: 60-bit md5-derived token of a string expression, HUGEINT."""
    return (f"CAST(CAST('0x' || substr(md5({expr}), 1, 15) AS UBIGINT) "
            f"AS HUGEINT)")


def hll_register_cols(h_col: str, p: int) -> str:
    """(idx, rank) register coordinates of hash ``h_col`` at precision p —
    the exact convention of kernels/hll.py:_codes_from_hashes:
    idx = h >> (64-p); rank = min(clz64(h << p) + 1, 64-p+1), which for
    rest = h mod 2^(64-p) equals (65-p) - bit_length(rest) including the
    rest == 0 cap (bit_length(0) = 0 → rank = 64-p+1)."""
    rest_div = 1 << (64 - p)
    return (f"CAST(({h_col}) // {rest_div} AS INT) AS idx, "
            f"CAST({65 - p} - (CASE WHEN ({h_col}) % {rest_div} = 0 THEN 0 "
            f"ELSE length(bin(CAST(({h_col}) % {rest_div} AS UBIGINT))) END) "
            f"AS INT) AS rank")


def md5_token_col():
    """Spark: the same 60-bit md5-derived token as md5_token_sql, JVM-side
    (no Python UDF).  Returns a function str-column → long-column."""
    from pyspark.sql import functions as F

    def tok(col):
        return F.conv(F.substring(F.md5(col), 1, 15), 16, 10).cast("long")
    return tok


# ----------------------------------------------------- greedy route replay

def greedy_route_replay_ctes(algorithm: str, n_shards: int = 8,
                             slack: float = 0.3, gamma: float = 1.5,
                             limit: int = 512) -> str:
    """WITH-RECURSIVE body re-deriving `routing.route_stream_sequential`
    assignments from the raw `documents` table — the reference's
    sequential greedy loop (EdgeCutSGP.java:211-246: record i scored
    against state as of i-1) replayed record-by-record in SQL.

    The recursion carries the full assignment prefix and shard sizes;
    per step it rebuilds the doc's neighbor histogram from the
    FIRST-CONTAINING-DOC positions of its token occurrences (token home
    = shard of the first doc, in stream order, that carried it — the
    router's first-writer-wins `_remember`), masks full shards, scores
    with the exact LDG / Fennel formula (routing.py:98-115), and breaks
    score ties with `splitmix64(doc_key) % n_ties` over the tied shards
    in index order (`_tiebreak_argmax`). Every arithmetic step is a
    correctly-rounded IEEE op on identical doubles in both engines
    (division, one multiply, sqrt), so assignments hash-match exactly.

    Ends with CTEs: `docs(pos, doc_id, hkey, fds)`, `occ(pos, tok)`,
    `fp(tok, fd)`, `assignments(pos, shard)`. Caller appends the final
    SELECT. The string starts with 'WITH RECURSIVE'."""
    if algorithm not in ("ldg", "fennel"):
        raise ValueError(f"no replay oracle for algorithm {algorithm!r}")
    k = int(n_shards)
    cap_factor = repr(1.0 + slack)
    if algorithm == "ldg":
        score = "(1.0 - r.sizes[p+1] / c.cap) * hist[p+1]"
    else:
        score = (f"hist[p+1] - ({gamma!r} * c.alpha) "
                 f"* sqrt(CAST(r.sizes[p+1] AS DOUBLE))")
    zeros = "[" + ", ".join("0" for _ in range(k)) + "]::BIGINT[]"
    return f"""WITH RECURSIVE
sel AS (SELECT doc_id, text FROM documents ORDER BY doc_id LIMIT {limit}),
base AS (SELECT doc_id,
                CAST(row_number() OVER (ORDER BY doc_id) - 1 AS INT) AS pos,
                list_transform(string_split(text, ' '),
                               t -> {md5_token_sql('t')}) AS toks
         FROM sel),
hk AS (SELECT pos, doc_id,
              {sm64_cols(md5_token_sql('CAST(doc_id AS VARCHAR)'),
                         'hkey', 'hk')}
       FROM base),
occ AS (SELECT pos, unnest(toks) AS tok FROM base),
fp AS (SELECT tok, MIN(pos) AS fd FROM occ GROUP BY tok),
fdl AS (SELECT o.pos,
               COALESCE(list(f.fd) FILTER (WHERE f.fd < o.pos),
                        CAST([] AS INTEGER[])) AS fds
        FROM occ o JOIN fp f USING (tok) GROUP BY o.pos),
docs AS (SELECT h.pos, h.doc_id, h.hkey,
                COALESCE(d.fds, CAST([] AS INTEGER[])) AS fds
         FROM hk h LEFT JOIN fdl d USING (pos)),
consts AS (SELECT GREATEST(1.0,
                           CAST((SELECT COUNT(*) FROM base) AS DOUBLE)
                           / {k} * {cap_factor}) AS cap,
                  (sqrt(CAST({k} AS DOUBLE))
                   * (SELECT COUNT(*) FROM occ))
                  / ((SELECT COUNT(*) FROM base)
                     * sqrt(CAST(GREATEST((SELECT COUNT(*) FROM base), 1)
                                 AS DOUBLE))) AS alpha),
r AS (
  SELECT -1 AS i, CAST([] AS INTEGER[]) AS assign, {zeros} AS sizes
  UNION ALL
  SELECT i, assign, sizes FROM (
    SELECT d.pos AS i,
           list_transform(range({k}), p ->
             CAST(len(list_filter(d.fds,
                                  fd -> r.assign[fd+1] = p)) AS DOUBLE))
               AS hist,
           list_transform(range({k}), p ->
             CASE WHEN r.sizes[p+1] >= c.cap THEN '-infinity'::DOUBLE
                  ELSE {score} END) AS scores,
           list_filter(range({k}),
                       p -> scores[p+1] = list_max(scores)) AS tied,
           CASE WHEN len(list_filter(range({k}),
                                     p -> r.sizes[p+1] < c.cap)) = 0
                THEN CAST(list_position(r.sizes, list_min(r.sizes)) - 1
                          AS INT)
                ELSE CAST(tied[CAST(d.hkey % len(tied) AS INT) + 1] AS INT)
           END AS choice,
           list_append(r.assign, choice) AS assign,
           list_transform(range({k}), p ->
             r.sizes[p+1] + CASE WHEN p = choice THEN 1 ELSE 0 END)
               AS sizes
    FROM r, docs d, consts c
    WHERE d.pos = r.i + 1
  )
),
assignments AS (SELECT i AS pos, CAST(assign[i+1] AS INT) AS shard
                FROM r WHERE i >= 0)"""
